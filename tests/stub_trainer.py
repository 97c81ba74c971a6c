"""Stub trainer for supervisor tests: emits metrics, then optionally wedges.

Mimics the train CLI surface the supervisor drives (--run-dir,
--num-env-steps, --model-dir) plus a checkpoint file. Behavior: writes one
metrics row per 1000 "steps" every 50 ms; if launched WITHOUT --model-dir
(the first leg) it wedges after 3 rows — alive but silent, like a training
process stuck mid-device-call — and a resumed leg (--model-dir present)
runs its remaining budget to completion.
"""
import argparse
import json
import os
import sys
import time

p = argparse.ArgumentParser()
p.add_argument("--run-dir", required=True)
p.add_argument("--num-env-steps", type=float, required=True)
p.add_argument("--model-dir", default=None)
p.add_argument("--extra", default=None)  # pass-through marker for tests
args, _ = p.parse_known_args()

os.makedirs(os.path.join(args.run_dir, "checkpoints"), exist_ok=True)
steps = int(args.num_env_steps)
wedge = args.model_dir is None

with open(os.path.join(args.run_dir, "metrics.jsonl"), "w") as f:
    done = 0
    row = 0
    while done < steps:
        done += 1000
        row += 1
        f.write(json.dumps({"step": done, "wall_s": row * 0.05,
                            "reward": float(row)}) + "\n")
        f.flush()
        with open(os.path.join(args.run_dir, "checkpoints",
                               "state_latest.pkl"), "w") as c:
            c.write(str(done))
        if wedge and row >= 3:
            time.sleep(3600)  # wedged: alive, no progress
        time.sleep(0.05)
sys.exit(0)
