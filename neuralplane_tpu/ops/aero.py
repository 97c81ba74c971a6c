"""Stacked F-16 aerodynamic-coefficient surrogate query.

The reference evaluates 43 separate tiny torch MLPs sequentially per dynamics
call (`envs/models/F16/hifi_F16_AeroData.py:748-819`). Here all 43 surrogates
are pre-padded offline (tools/convert_aero_weights.py) to one exact common
architecture [3 -> 20 -> 20 -> 10 -> 1], so the whole aero query is FOUR
batched einsums over a [K=43] stacked weight pytree - one fused XLA
computation that the compiler maps onto the MXU, instead of 43 kernel
launches. Input z-scoring and output un-scaling are folded into the first and
last layers, so the query consumes raw (alpha_deg, beta_deg, el_deg).

A fused Pallas kernel (ops/aero_pallas.py) implements the same contraction
keeping all intermediates in VMEM; this module is the reference path and the
weight container.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_DATA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "f16_aero.npz")

# Canonical coefficient order (must match tools/convert_aero_weights.py NETS).
AERO_NAMES = (
    "Cx", "Cz", "Cm", "Cy", "Cn", "Cl",
    "Cxq", "Cyr", "Cyp", "Czq", "Clr", "Clp", "Cmq", "Cnr", "Cnp",
    "delta_Cx_lef", "delta_Cz_lef", "delta_Cm_lef", "delta_Cy_lef",
    "delta_Cn_lef", "delta_Cl_lef",
    "delta_Cxq_lef", "delta_Cyr_lef", "delta_Cyp_lef", "delta_Czq_lef",
    "delta_Clr_lef", "delta_Clp_lef", "delta_Cmq_lef", "delta_Cnr_lef",
    "delta_Cnp_lef",
    "delta_Cy_r30", "delta_Cn_r30", "delta_Cl_r30",
    "delta_Cy_a20", "delta_Cy_a20_lef", "delta_Cn_a20", "delta_Cn_a20_lef",
    "delta_Cl_a20", "delta_Cl_a20_lef",
    "delta_Cnbeta", "delta_Clbeta", "delta_Cm", "eta_el",
)
IDX = {name: i for i, name in enumerate(AERO_NAMES)}
K = len(AERO_NAMES)


class AeroWeights(NamedTuple):
    """Stacked surrogate weights; all arrays lead with the net axis K=43."""
    W1: jnp.ndarray  # [K, 3, 20]
    b1: jnp.ndarray  # [K, 20]
    W2: jnp.ndarray  # [K, 20, 20]
    b2: jnp.ndarray  # [K, 20]
    W3: jnp.ndarray  # [K, 20, 10]
    b3: jnp.ndarray  # [K, 10]
    W4: jnp.ndarray  # [K, 10]
    b4: jnp.ndarray  # [K]


@functools.lru_cache(maxsize=2)
def _load_np(path: str = _DATA_PATH):
    with np.load(path) as z:
        names = [str(n) for n in z["names"]]
        assert tuple(names) == AERO_NAMES, "f16_aero.npz order mismatch - regenerate"
        return {k: z[k] for k in ("W1", "b1", "W2", "b2", "W3", "b3", "W4", "b4")}


def load_aero_weights(path: str = _DATA_PATH, dtype=jnp.float32) -> AeroWeights:
    raw = _load_np(path)
    return AeroWeights(**{k: jnp.asarray(v, dtype=dtype) for k, v in raw.items()})


def select_aero_weights(w: "AeroWeights", backend: str = "auto"):
    """Pick the aero-query backend: 'stacked' (XLA einsums, any platform,
    autodiff-able), 'pallas' (fused 43-net VMEM kernel, TPU only - returns
    GroupedAeroWeights, which aero_coeffs dispatches on), or 'distilled'
    (consolidated single-trunk surrogate, TPU only; 1.8x faster whole-step,
    fidelity-gated at xdot R^2 >= 0.999 vs the 43-net ensemble - see
    surrogates/distill.py). 'auto' selects distilled on TPU when the
    trained npz ships, else pallas; stacked elsewhere. Override with
    NEURALPLANE_AERO_BACKEND."""
    import jax

    backend = os.environ.get("NEURALPLANE_AERO_BACKEND", backend)
    if backend == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if on_tpu:
            from .aero_pallas import distilled_npz_present
            backend = "distilled" if distilled_npz_present() else "pallas"
        else:
            backend = "stacked"
    if backend == "pallas":
        from .aero_pallas import pack_grouped_t
        return pack_grouped_t(w)
    if backend == "distilled":
        # consolidated single-trunk surrogate (surrogates/distill.py) -
        # xdot-fidelity-gated vs the 43-net ensemble; ~12x less MXU work
        from .aero_pallas import load_distilled_t
        return load_distilled_t()
    return w


def aero_coeffs(w, alpha_deg, beta_deg, el_deg) -> jnp.ndarray:
    """Evaluate all 43 aero coefficients.

    Args:
        w: stacked AeroWeights, or GroupedAeroWeights for the fused Pallas
            TPU path (see ops/aero_pallas.py).
        alpha_deg, beta_deg, el_deg: [n] raw angle-of-attack / sideslip /
            elevator deflection in degrees (matching the reference's query
            units, `envs/models/F16/F16_dynamics.py:85-86,140`).

    Returns:
        [n, K] coefficient matrix, column order = AERO_NAMES.
    """
    if type(w).__name__ == "GroupedAeroWeightsT":
        from .aero_pallas import aero_coeffs_pallas_ft
        return aero_coeffs_pallas_ft(w, alpha_deg, beta_deg, el_deg).T
    if type(w).__name__ == "GroupedAeroWeights":
        from .aero_pallas import aero_coeffs_pallas
        return aero_coeffs_pallas(w, alpha_deg, beta_deg, el_deg)
    x = jnp.stack([alpha_deg, beta_deg, el_deg], axis=-1)        # [n, 3]
    # Layer 1 has no K-dependence on the input, so flatten K into the output
    # feature dim: one [n,3] @ [3, K*20] matmul.
    n = x.shape[0]
    h = jnp.maximum(
        x @ w.W1.transpose(1, 0, 2).reshape(3, K * 20)
        + w.b1.reshape(K * 20), 0.0).reshape(n, K, 20)
    h = jnp.maximum(jnp.einsum("nki,kij->nkj", h, w.W2) + w.b2, 0.0)  # [n,K,20]
    h = jnp.maximum(jnp.einsum("nki,kij->nkj", h, w.W3) + w.b3, 0.0)  # [n,K,10]
    y = jnp.einsum("nki,ki->nk", h, w.W4) + w.b4                      # [n,K]
    return y


def aero_coeffs_t(w, alpha_deg, beta_deg, el_deg) -> jnp.ndarray:
    """Coefficient-major variant: [K, n] rows in AERO_NAMES order.

    The dynamics hot path consumes every coefficient as a separate [n]
    vector; coefficient-major rows make those reads contiguous. With the
    Pallas backend this matters enormously: slicing 43 lane-strided columns
    out of a materialized [n, 43] array re-reads ~43x the buffer (~7.4 GB at
    n=10^6), while one [n,43]->[43,n] transpose plus row reads costs ~0.5 GB.
    """
    tname = type(w).__name__
    if tname == "GroupedAeroWeightsT":
        from .aero_pallas import aero_coeffs_pallas_ft
        return aero_coeffs_pallas_ft(w, alpha_deg, beta_deg, el_deg)
    if tname == "GroupedAeroWeights":
        from .aero_pallas import aero_coeffs_pallas_t
        return aero_coeffs_pallas_t(w, alpha_deg, beta_deg, el_deg)
    if tname == "DistilledAeroWeightsT":
        # XLA eval of the consolidated trunk (portable; exact same bf16
        # arithmetic as the kernel path)
        from ..surrogates.distill import DistilledParams, quantized_coeffs
        p = DistilledParams(W1=w.W1.astype(jnp.float32), b1=w.b1,
                            W2=w.W2.astype(jnp.float32), b2=w.b2,
                            W3=w.W3[:K].astype(jnp.float32), b3=w.b3[:K])
        return quantized_coeffs(p, w.out_mean[:K], w.out_std[:K],
                                alpha_deg, beta_deg, el_deg)
    return aero_coeffs(w, alpha_deg, beta_deg, el_deg).T
