"""Plot learning curves from a run's metrics.jsonl.

Usage: python tools/plot_metrics.py runs/heading_tpu_full2 [out.png]
"""
from __future__ import annotations

import json
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main() -> None:
    run_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else f"{run_dir}/curves.png"
    recs = [json.loads(l) for l in open(f"{run_dir}/metrics.jsonl")]
    recs = [r for r in recs if "average_episode_rewards" in r]
    steps = np.array([r["step"] for r in recs])

    panels = [
        ("average_episode_rewards", "avg episode reward"),
        ("episodes_reached_target", "targets reached / rollout"),
        ("termination/overload", "overload crashes / rollout"),
        ("latest_elo", "ELO vs pool"),
        ("shoot_launches", "missile launches / rollout"),
        ("shoot_hits", "missile hits / rollout"),
        ("value_loss", "value loss"),
        ("policy_entropy_loss", "entropy (neg)"),
        ("fps", "env steps / s"),
    ]
    rows = [(k, label) for k, label in panels if any(k in r for r in recs)]
    fig, axes = plt.subplots(len(rows), 1, figsize=(9, 2.0 * len(rows)),
                             sharex=True)
    if len(rows) == 1:
        axes = [axes]
    for ax, (k, label) in zip(axes, rows):
        xs = [s for s, r in zip(steps, recs) if k in r]
        ys = [r[k] for r in recs if k in r]
        ax.plot(xs, ys, lw=1.0)
        ax.set_ylabel(label, fontsize=8)
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("env steps")
    fig.suptitle(run_dir)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
