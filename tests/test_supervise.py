"""Elastic-recovery supervisor tests (scripts/supervise.py).

The reference has no failure detection or resume (SURVEY.md S5: bare
try/except print-and-exit, `scripts/train/train_F16sim.py:117-123`); the
supervisor adds stall detection on metrics progress + exact-pgid kill +
checkpoint resume + leg merging. The integration test uses a stub trainer
(tests/stub_trainer.py) that makes progress, wedges silently (alive, no
metrics), and completes once resumed with --model-dir.
"""
import json
import os

from neuralplane_tpu.scripts.supervise import _strip_arg, main, merge_legs


def test_strip_arg():
    args = ["--a", "1", "--run-dir", "x", "--b", "--run-dir=y"]
    out, val = _strip_arg(args, "--run-dir")
    assert out == ["--a", "1", "--b"]
    assert val == "y"  # last occurrence wins
    out2, val2 = _strip_arg(out, "--missing")
    assert out2 == out and val2 is None


def test_merge_legs(tmp_path):
    legs = []
    for k, rows in enumerate([[1000, 2000, 3000], [1000, 2000]]):
        leg = tmp_path / f"leg_{k}"
        os.makedirs(leg)
        with open(leg / "metrics.jsonl", "w") as f:
            for s in rows:
                f.write(json.dumps({"step": s, "wall_s": s / 1000.0}) + "\n")
        legs.append(str(leg))
    total = merge_legs(str(tmp_path), legs)
    assert total == 5000
    merged = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [r["step"] for r in merged] == [1000, 2000, 3000, 4000, 5000]
    # wall offsets accumulate from the prior leg's last wall_s
    assert merged[-1]["wall_s"] == 3.0 + 2.0


def test_merge_legs_skips_metricless_legs(tmp_path):
    """A leg that died before its first metrics row (relay down through the
    whole stall window - observed in production 2026-08-20) contributes
    nothing and does not break the step/wall offsets of later legs."""
    legs = []
    for k, rows in enumerate([[1000, 2000], [], [], [1000]]):
        leg = tmp_path / f"leg_{k}"
        os.makedirs(leg)
        if rows:
            with open(leg / "metrics.jsonl", "w") as f:
                for s in rows:
                    f.write(json.dumps({"step": s, "wall_s": s / 1000.0})
                            + "\n")
        legs.append(str(leg))
    total = merge_legs(str(tmp_path), legs)
    assert total == 3000
    merged = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [r["step"] for r in merged] == [1000, 2000, 3000]


def test_supervisor_stall_resume(tmp_path):
    """Leg 0 wedges after 3000 steps; the supervisor must kill it, resume
    from its checkpoint with the remaining budget, and merge to the full
    10000 steps."""
    run_dir = str(tmp_path / "run")
    # stall-timeout must exceed child startup latency (~1.5 s python -m
    # cold start here), just as it must exceed compile latency in real use
    rc = main(["--run-dir", run_dir, "--stall-timeout", "5",
               "--poll-interval", "0.2", "--max-restarts", "3",
               "--train-module", "tests.stub_trainer", "--",
               "--num-env-steps", "10000", "--extra", "marker"])
    assert rc == 0
    merged = [json.loads(l) for l in open(os.path.join(run_dir,
                                                       "metrics.jsonl"))]
    assert merged[-1]["step"] == 10000
    # two legs: the wedged one (3 rows) + the resumed one (7 rows)
    assert os.path.isdir(os.path.join(run_dir, "leg_0"))
    assert os.path.isdir(os.path.join(run_dir, "leg_1"))
    assert not os.path.isdir(os.path.join(run_dir, "leg_2"))
    assert len(merged) == 10


def test_supervisor_gives_up_on_config_error(tmp_path):
    """A child that dies instantly with zero progress is a config error,
    not a wedge - the supervisor must not restart-loop it."""
    run_dir = str(tmp_path / "run")
    rc = main(["--run-dir", run_dir, "--stall-timeout", "10",
               "--poll-interval", "0.2", "--max-restarts", "3",
               "--train-module", "tests.no_such_module", "--",
               "--num-env-steps", "10000"])
    assert rc != 0
    assert not os.path.isdir(os.path.join(run_dir, "leg_1"))
