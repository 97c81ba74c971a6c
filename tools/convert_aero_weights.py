"""Convert the reference's 43 F-16 aero-surrogate MLPs into ONE stacked weight set.

Reads the torch `.pth` checkpoints + `mean_std.csv` z-scoring table from the
reference tree (read-only) and writes `neuralplane_tpu/data/f16_aero.npz`.

Every net is padded EXACTLY to a common architecture [3 -> 20 -> 20 -> 10 -> 1]:

  * missing raw inputs (beta/el for narrow nets) get zero first-layer columns;
  * depth-2 nets get an identity hidden layer inserted (identity weights +
    zero bias followed by ReLU is exact because post-ReLU activations are
    non-negative);
  * narrower hidden layers are zero-padded (zero rows/cols + zero bias produce
    ReLU(0)=0 activations that feed zero columns downstream - exact).

Per-net input z-scoring (alpha/beta/el mean+std) is folded into layer 1 and
output un-scaling (mean+std) into layer 4, so at runtime the whole 43-net
query is a single batched computation over raw (alpha_deg, beta_deg, el_deg).

Net inventory (name, in_dim, hidden sizes) transcribed from the reference
`envs/models/F16/hifi_F16_AeroData.py:44-129`; normalization semantics from
`:150-166`. 1-input nets consume alpha, except `eta_el` which consumes el.

Run:  python tools/convert_aero_weights.py [--reference /root/reference] [--out ...]
"""
from __future__ import annotations

import argparse
import csv
import os

import numpy as np
import torch

# (name, in_dim, hidden_list) in the canonical coefficient order used by
# neuralplane_tpu.ops.aero (AERO_NAMES must match this order).
NETS = [
    ("Cx", 3, [20, 10]),
    ("Cz", 3, [20, 10]),
    ("Cm", 3, [20, 10]),
    ("Cy", 2, [20, 10]),
    ("Cn", 3, [20, 10]),
    ("Cl", 3, [20, 10]),
    ("Cxq", 1, [20, 10]),
    ("Cyr", 1, [20, 10]),
    ("Cyp", 1, [20, 10]),
    ("Czq", 1, [20, 10]),
    ("Clr", 1, [20, 10]),
    ("Clp", 1, [20, 10]),
    ("Cmq", 1, [20, 10]),
    ("Cnr", 1, [20, 10]),
    ("Cnp", 1, [20, 10]),
    ("delta_Cx_lef", 2, [20, 10]),
    ("delta_Cz_lef", 2, [20, 10, 5]),
    ("delta_Cm_lef", 2, [20, 10, 5]),
    ("delta_Cy_lef", 2, [20, 10, 5]),
    ("delta_Cn_lef", 2, [20, 10, 5]),
    ("delta_Cl_lef", 2, [20, 10]),
    ("delta_Cxq_lef", 1, [20, 10]),
    ("delta_Cyr_lef", 1, [20, 10]),
    ("delta_Cyp_lef", 1, [20, 10, 5]),
    ("delta_Czq_lef", 1, [20, 10]),
    ("delta_Clr_lef", 1, [20, 10]),
    ("delta_Clp_lef", 1, [20, 10]),
    ("delta_Cmq_lef", 1, [20, 10]),
    ("delta_Cnr_lef", 1, [20, 10]),
    ("delta_Cnp_lef", 1, [20, 10]),
    ("delta_Cy_r30", 2, [20, 10, 5]),
    ("delta_Cn_r30", 2, [20, 10, 5]),
    ("delta_Cl_r30", 2, [20, 10, 5]),
    ("delta_Cy_a20", 2, [20, 10, 10]),
    ("delta_Cy_a20_lef", 2, [20, 20, 10]),
    ("delta_Cn_a20", 2, [20, 10, 5]),
    ("delta_Cn_a20_lef", 2, [20, 20, 10]),
    ("delta_Cl_a20", 2, [20, 10]),
    ("delta_Cl_a20_lef", 2, [20, 20, 10]),
    ("delta_Cnbeta", 1, [20, 10]),
    ("delta_Clbeta", 1, [20, 10]),
    ("delta_Cm", 1, [20, 10]),
    ("eta_el", 1, [20, 10]),
]

H1, H2, H3 = 20, 20, 10  # padded common hidden sizes
IN_DIM = 3               # (alpha_deg, beta_deg, el_deg)


def load_mean_std(csv_path: str) -> dict:
    table = {}
    with open(csv_path, "r", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            table[row["name"]] = {k: float(v) for k, v in row.items() if k != "name"}
    return table


def load_net(pth_path: str, in_dim: int, hidden: list) -> list:
    """Return [(W, b), ...] per linear layer, W as [out, in] float64."""
    sd = torch.load(pth_path, map_location="cpu")
    dims = [in_dim] + hidden + [1]
    layers = []
    # torch Sequential indices: Linear at 0, 2, 4, ... (ReLU between)
    for li in range(len(dims) - 1):
        key = li * 2
        W = sd[f"layers.{key}.weight"].double().numpy()
        b = sd[f"layers.{key}.bias"].double().numpy()
        assert W.shape == (dims[li + 1], dims[li]), (pth_path, li, W.shape)
        layers.append((W, b))
    return layers


def pad_net(name: str, in_dim: int, hidden: list, layers: list, stats: dict):
    """Pad to [IN_DIM -> H1 -> H2 -> H3 -> 1], folding input/output scaling."""
    # --- layer 1: fold z-scoring, map columns to raw (alpha, beta, el) slots.
    W1, b1 = layers[0]                      # [h1, in_dim]
    if in_dim == 3:
        cols, mus, sigmas = [0, 1, 2], None, None
        keys = ["alpha", "beta", "el"]
    elif in_dim == 2:
        cols, keys = [0, 1], ["alpha", "beta"]
    elif name == "eta_el":
        cols, keys = [2], ["el"]
    else:
        cols, keys = [0], ["alpha"]
    mus = np.array([stats[f"{k}_mean"] for k in keys])
    sigmas = np.array([stats[f"{k}_std"] for k in keys])
    W1f = np.zeros((H1, IN_DIM))
    W1f[: W1.shape[0], cols] = W1 / sigmas[None, :]
    b1f = np.zeros(H1)
    b1f[: b1.shape[0]] = b1 - W1 @ (mus / sigmas)

    # --- hidden layers: pad to exactly two intermediate linear layers.
    if len(hidden) == 2:                    # [20, 10]: insert identity layer
        W2, b2 = np.eye(H2)[:, :H1], np.zeros(H2)
        W3raw, b3raw = layers[1]            # [10, 20]
        W3 = np.zeros((H3, H2)); W3[: W3raw.shape[0], : W3raw.shape[1]] = W3raw
        b3 = np.zeros(H3); b3[: b3raw.shape[0]] = b3raw
        Wo_raw, bo_raw = layers[2]          # [1, 10]
    else:                                   # 3 hidden layers
        W2raw, b2raw = layers[1]
        W2 = np.zeros((H2, H1)); W2[: W2raw.shape[0], : W2raw.shape[1]] = W2raw
        b2 = np.zeros(H2); b2[: b2raw.shape[0]] = b2raw
        W3raw, b3raw = layers[2]
        W3 = np.zeros((H3, H2)); W3[: W3raw.shape[0], : W3raw.shape[1]] = W3raw
        b3 = np.zeros(H3); b3[: b3raw.shape[0]] = b3raw
        Wo_raw, bo_raw = layers[3]

    # --- output layer: fold un-normalization (y*std + mean).
    mean, std = stats["mean"], stats["std"]
    Wo = np.zeros((1, H3)); Wo[:, : Wo_raw.shape[1]] = Wo_raw * std
    bo = bo_raw * std + mean
    return W1f, b1f, W2, b2, W3, b3, Wo[0], float(bo[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "neuralplane_tpu", "data", "f16_aero.npz"))
    args = ap.parse_args()

    model_dir = os.path.join(args.reference, "envs", "models", "F16", "model")
    stats_table = load_mean_std(os.path.join(model_dir, "mean_std.csv"))

    K = len(NETS)
    W1 = np.zeros((K, IN_DIM, H1)); b1 = np.zeros((K, H1))
    W2 = np.zeros((K, H1, H2)); b2 = np.zeros((K, H2))
    W3 = np.zeros((K, H2, H3)); b3 = np.zeros((K, H3))
    W4 = np.zeros((K, H3)); b4 = np.zeros(K)

    for k, (name, in_dim, hidden) in enumerate(NETS):
        layers = load_net(os.path.join(model_dir, f"{name}.pth"), in_dim, hidden)
        w1, bb1, w2, bb2, w3, bb3, w4, bb4 = pad_net(
            name, in_dim, hidden, layers, stats_table[name])
        # store as [in, out] for right-multiplication x @ W
        W1[k], b1[k] = w1.T, bb1
        W2[k], b2[k] = w2.T, bb2
        W3[k], b3[k] = w3.T, bb3
        W4[k], b4[k] = w4, bb4

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(
        args.out,
        names=np.array([n for n, _, _ in NETS]),
        W1=W1.astype(np.float32), b1=b1.astype(np.float32),
        W2=W2.astype(np.float32), b2=b2.astype(np.float32),
        W3=W3.astype(np.float32), b3=b3.astype(np.float32),
        W4=W4.astype(np.float32), b4=b4.astype(np.float32),
    )
    print(f"wrote {args.out}: K={K} stacked nets, arch [3->20->20->10->1]")


if __name__ == "__main__":
    main()
