"""Training-curve plots for a (possibly multi-leg) run directory.

Produces one curves.png with two panels from metrics.jsonl records:
  - latest_elo over env steps (the in-training rating channel)
  - average_episode_rewards over env steps (raw + rolling mean)

Multi-leg aware: a supervisor run (`runs/x/leg_0, leg_1, ...`) restarts
step counting per leg, so legs are concatenated on a cumulative step
axis with the boundaries marked. Single metrics.jsonl files work too.

Usage:
  python tools/plot_run.py runs/mappo_2v2_evadable_r5 --out curves.png \
      [--offset 1e9]   # cumulative steps already trained before leg 0
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BLUE_400, BLUE_250 = "#3987e5", "#86b6ef"
INK, MUTED, GRID = "#333639", "#6b7075", "#e4e6e8"


def load_legs(path: str):
    """Return (list of leg record-lists, leg label list)."""
    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(glob.glob(os.path.join(path, "leg_*", "metrics.jsonl")))
        if not files:
            files = [os.path.join(path, "metrics.jsonl")]
    legs = []
    for f in files:
        rows = []
        with open(f) as fh:
            for line in fh:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "step" in r:
                    rows.append(r)
        if rows:
            legs.append(rows)
    return legs, files


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--offset", type=float, default=0.0,
                    help="env steps trained before this run's first leg")
    ap.add_argument("--title", default=None)
    args = ap.parse_args()

    legs, _ = load_legs(args.run_dir)
    if not legs:
        raise SystemExit(f"no metrics.jsonl under {args.run_dir}")

    steps, elo, rew, bounds = [], [], [], []
    base = args.offset
    for rows in legs:
        bounds.append(base)
        for r in rows:
            steps.append(base + r["step"])
            elo.append(r.get("latest_elo", np.nan))
            rew.append(r.get("average_episode_rewards", np.nan))
        base = steps[-1]
    steps = np.asarray(steps) / 1e9
    elo, rew = np.asarray(elo), np.asarray(rew)
    bounds = np.asarray(bounds[1:]) / 1e9  # first bound is just the offset

    fig, axes = plt.subplots(2, 1, figsize=(7.2, 5.6), sharex=True,
                             constrained_layout=True)
    for ax in axes:
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.grid(axis="y", color=GRID, linewidth=0.8)
        ax.tick_params(colors=MUTED, labelsize=9)
        ax.set_axisbelow(True)
        for b in bounds:
            ax.axvline(b, color=GRID, linewidth=0.8, linestyle=":")

    axes[0].plot(steps, elo, color=BLUE_400, linewidth=2)
    axes[0].set_ylabel("latest_elo", color=INK, fontsize=10)

    axes[1].plot(steps, rew, color=BLUE_250, linewidth=1)
    ok = np.isfinite(rew)
    rew_f, steps_f = rew[ok], steps[ok]
    k = max(1, len(rew_f) // 25)
    if len(rew_f) > k:
        roll = np.convolve(rew_f, np.ones(k) / k, mode="valid")
        roll_x = steps_f[k - 1:]
        axes[1].plot(roll_x, roll, color=BLUE_400, linewidth=2)
        axes[1].annotate("rolling mean", (roll_x[-1], roll[-1]),
                         textcoords="offset points", xytext=(-4, 8),
                         ha="right", fontsize=8, color=MUTED)
    axes[1].set_ylabel("episode reward", color=INK, fontsize=10)
    axes[1].set_xlabel("env steps (×10⁹, cumulative)", color=INK, fontsize=10)

    title = args.title or os.path.basename(os.path.normpath(args.run_dir))
    axes[0].set_title(title, color=INK, fontsize=11, loc="left")
    out = args.out or os.path.join(
        args.run_dir if os.path.isdir(args.run_dir) else ".", "curves.png")
    fig.savefig(out, dpi=150)
    print(out)


if __name__ == "__main__":
    main()
