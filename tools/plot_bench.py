"""Benchmark comparison figure (the reference's measure_env.pdf equivalent).

Reproduces the reference's log-log time-vs-n comparison artifact
(`envs/measure_env.py:112-175`, committed as `envs/measure_env.pdf`) from:
  - results/bench/sweep.jsonl          — our TPU sweep (bench.py protocol,
                                         500 steps, ControlEnv heading)
  - the reference's committed arrays   — decoded values from
    envs/measure_env/{time_neuralplane,time_jsbsim,gpu_memory_neuralplane}.npy
    (hardcoded below so the figure regenerates without /root/reference)

Panel 1: per-step FDM latency vs agent count (log-log).
Panel 2: device memory vs agent count. The reference reports
torch.cuda.memory_allocated; the axon TPU relay exposes no allocator stats
(device.memory_stats() is None), so our column is the ANALYTIC resident
footprint: sum of nbytes over the persistent env-state pytree + obs + aero
weights, i.e. a lower bound on allocated HBM (labelled as such).

Run:  python tools/plot_bench.py   (writes results/bench/measure_env.{pdf,png})
"""
from __future__ import annotations

import json
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, "results", "bench")

NS = np.array([1, 10, 100, 1_000, 10_000, 100_000, 1_000_000])
# Reference committed results (per 500 steps), decoded from the npy files
# cited in BASELINE.md.
REF_TIME_500 = np.array([19.64528346, 20.34366012, 18.8455255, 18.08587575,
                         18.24933767, 21.1278801, 105.16333628])
REF_MEM_MB = np.array([8.29394531, 8.29541016, 8.31494141, 8.52587891,
                       10.64794922, 32.39257812, 245.50585938])
JSBSIM_TIME_500 = np.array([1.48968697e-02, 1.63599730e-01, 1.74884510e+00,
                            1.79313743e+01, 2.00049586e+02, 1.95565229e+03,
                            2.29212220e+04])

# validated categorical palette, slots 1-3 in canonical order (dataviz
# reference palette: blue=ours, orange=reference GPU, aqua=JSBSim CPU)
C_TPU, C_REF, C_JSB = "#2a78d6", "#eb6834", "#1baf7a"
INK, MUTED, GRID = "#1a1a19", "#6b6a60", "#e5e4dc"


def load_sweep():
    path = os.path.join(BENCH_DIR, "sweep.jsonl")
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows.sort(key=lambda r: r["n"])
    return (np.array([r["n"] for r in rows]),
            np.array([r["s_per_step"] for r in rows]))


def state_footprint_mb(ns) -> np.ndarray:
    """Analytic resident bytes of env state + obs + weights per n (a lower
    bound; the small non-obs StepOutput fields are excluded)."""
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from neuralplane_tpu.envs import ControlEnv
    out = []
    for n in ns:
        env = ControlEnv(num_envs=int(n), config="heading")
        state, obs = env.reset(jax.random.PRNGKey(0))
        leaves = jax.tree_util.tree_leaves(state) + [obs]
        weights = jax.tree_util.tree_leaves(env.model.weights)
        out.append(sum(x.nbytes for x in leaves + weights) / 1024 ** 2)
    return np.array(out)


def load_chip_scaling():
    path = os.path.join(BENCH_DIR, "chip_scaling.jsonl")
    if not os.path.exists(path):
        return None, None
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows.sort(key=lambda r: r["n"])
    b = np.array([r["n"] for r in rows])
    tput = np.array([r["agent_steps_per_s"] for r in rows])
    return b, tput / tput[-1]          # strong-scaling efficiency


def main() -> None:
    ns_tpu, t_tpu = load_sweep()
    mem_tpu = state_footprint_mb(ns_tpu)
    b_eff, eff = load_chip_scaling()

    n_panels = 3 if b_eff is not None else 2
    fig, axes = plt.subplots(1, n_panels, figsize=(5.5 * n_panels, 4.4),
                             dpi=150)
    ax1, ax2 = axes[0], axes[1]
    fig.patch.set_facecolor("white")

    for ax in axes:
        ax.set_facecolor("white")
        ax.grid(True, which="major", color=GRID, linewidth=0.8, zorder=0)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(MUTED)
        ax.tick_params(colors=MUTED, labelsize=9)

    # --- panel 1: per-step latency ---
    ax1.loglog(NS, JSBSIM_TIME_500 / 500, "-o", color=C_JSB, linewidth=2,
               markersize=5, label="JSBSim (serial CPU, reference-measured)",
               zorder=3)
    ax1.loglog(NS, REF_TIME_500 / 500, "-o", color=C_REF, linewidth=2,
               markersize=5, label="NeuralPlane (reference GPU)", zorder=3)
    ax1.loglog(ns_tpu, t_tpu, "-o", color=C_TPU, linewidth=2, markersize=5,
               label="neuralplane_tpu (1 TPU v5e chip)", zorder=4)
    ax1.set_xlabel("aircraft stepped in parallel", color=INK, fontsize=10)
    ax1.set_ylabel("wall time per FDM step (s)", color=INK, fontsize=10)
    ax1.set_title("Per-step latency, heading task (500-step protocol)",
                  color=INK, fontsize=11, loc="left")
    # selective direct labels at the right edge
    ax1.annotate("JSBSim", (NS[-1], JSBSIM_TIME_500[-1] / 500),
                 textcoords="offset points", xytext=(6, -3), color=INK,
                 fontsize=9)
    ax1.annotate("reference", (NS[-1], REF_TIME_500[-1] / 500),
                 textcoords="offset points", xytext=(6, -3), color=INK,
                 fontsize=9)
    ax1.annotate(f"ours ({REF_TIME_500[-1] / 500 / t_tpu[-1]:.0f}x)",
                 (ns_tpu[-1], t_tpu[-1]), textcoords="offset points",
                 xytext=(6, -3), color=INK, fontsize=9)
    ax1.set_xlim(0.7, 3e7)
    ax1.legend(loc="upper left", fontsize=8, frameon=False, labelcolor=INK)

    # --- panel 2: device memory ---
    ax2.loglog(NS, REF_MEM_MB, "-o", color=C_REF, linewidth=2, markersize=5,
               label="reference GPU (torch.cuda.memory_allocated)", zorder=3)
    ax2.loglog(ns_tpu, mem_tpu, "-o", color=C_TPU, linewidth=2, markersize=5,
               label="ours (resident state+obs+weights, analytic)", zorder=4)
    ax2.set_xlabel("aircraft stepped in parallel", color=INK, fontsize=10)
    ax2.set_ylabel("device memory (MB)", color=INK, fontsize=10)
    ax2.set_title("Device memory vs agent count", color=INK, fontsize=11,
                  loc="left")
    ax2.annotate("reference", (NS[-1], REF_MEM_MB[-1]),
                 textcoords="offset points", xytext=(6, 4), color=INK,
                 fontsize=9)
    ax2.annotate("ours", (ns_tpu[-1], mem_tpu[-1]),
                 textcoords="offset points", xytext=(6, -12), color=INK,
                 fontsize=9)
    ax2.set_xlim(0.7, 3e7)
    ax2.legend(loc="upper left", fontsize=8, frameon=False, labelcolor=INK)

    if b_eff is not None:
        ax3 = axes[2]
        ax3.semilogx(b_eff, eff, "-o", color=C_TPU, linewidth=2,
                     markersize=5, label="measured (one v5e chip)", zorder=3)
        ax3.axhline(0.8, color=MUTED, linewidth=1, linestyle="--", zorder=2)
        ax3.annotate("0.8 target", (b_eff[0], 0.8),
                     textcoords="offset points", xytext=(2, 4), color=MUTED,
                     fontsize=8)
        # crossover: interpolate where efficiency hits 0.8
        i = int(np.searchsorted(eff, 0.8))
        x80 = b_eff[i - 1] + (0.8 - eff[i - 1]) / (eff[i] - eff[i - 1]) \
            * (b_eff[i] - b_eff[i - 1])
        ax3.axvline(x80, color=GRID, linewidth=1, zorder=1)
        ax3.annotate(f"crossover ~{x80 / 1e3:.0f}k agents/chip",
                     (x80, 0.35), textcoords="offset points", xytext=(4, 0),
                     color=INK, fontsize=9)
        ax3.set_ylim(0, 1.05)
        ax3.set_xlabel("per-chip batch (agents)", color=INK, fontsize=10)
        ax3.set_ylabel("strong-scaling efficiency T(b)/T(10⁶)",
                       color=INK, fontsize=10)
        ax3.set_title("Splitting the 10⁶-agent workload over chips",
                      color=INK, fontsize=11, loc="left")
        ax3.legend(loc="upper left", fontsize=8, frameon=False,
                   labelcolor=INK)

    fig.tight_layout()
    for ext in ("pdf", "png"):
        out = os.path.join(BENCH_DIR, f"measure_env.{ext}")
        fig.savefig(out, bbox_inches="tight")
        print("wrote", out)


if __name__ == "__main__":
    main()
