"""Lo-fi F-16 aerodynamics: the Stevens-Lewis reduced tables, batched.

The reference ships these as scalar, CPU-only interpolation routines
(`envs/models/F16/lofi_F16_AeroData.py`) - present as an accuracy baseline
but never wired into the env path. Here the same public Stevens & Lewis
("Aircraft Control and Simulation") table data is evaluated as batched
multilinear interpolation via ops.interp.interpn, so the lo-fi model can run
at the same 10^6-aircraft scale as the hi-fi surrogates.

Grids: alpha in degrees on [-10, 45] step 5 (the reference's s=0.2*alpha
indexing); |beta| on [0, 30] step 5; elevator on [-24, 24] step 12. The
reference's trunc-toward-zero index arithmetic is exactly linear
interpolation on these grids for in-domain queries; out-of-domain queries
clamp to the boundary cell (the reference's k/m clamps do the same one cell
earlier when extrapolating - a documented, intentional simplification).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .interp import interpn

ALPHA_AXIS = np.arange(-10.0, 46.0, 5.0)        # 12 points
BETA_AXIS = np.arange(0.0, 31.0, 5.0)           # 7 points (|beta|)
DELE_AXIS = np.array([-24.0, -12.0, 0.0, 12.0, 24.0])

# damping derivatives vs alpha: rows = (CXq, CYr, CYp, CZq, Clr, Clp, Cmq,
# Cnr, Cnp)  [lofi_F16_AeroData.py damping()]
_DAMP = np.array([
    [-.267, .110, .308, 1.34, 2.08, 2.91, 2.76, 2.05, 1.5, 1.49, 1.83, 1.21],
    [.882, .852, .876, .958, .962, .974, .819, .483, .590, 1.21, -.493, -1.04],
    [-.108, -.108, -.188, .110, .258, .226, .344, .362, .611, .529, .298, -2.27],
    [-8.8, -25.8, -28.9, -31.4, -31.2, -30.7, -27.7, -28.2, -29, -29.8, -38.3, -35.3],
    [-.126, -.026, .063, .113, .208, .230, .319, .437, .680, .1, .447, -.330],
    [-.36, -.359, -.443, -.42, -.383, -.375, -.329, -.294, -.23, -.21, -.12, -.1],
    [-7.21, -.54, -5.23, -5.26, -6.11, -6.64, -5.69, -6, -6.2, -6.4, -6.6, -6],
    [-.38, -.363, -.378, -.386, -.37, -.453, -.55, -.582, -.595, -.637, -1.02, -.84],
    [.061, .052, .052, -.012, -.013, -.024, .05, .15, .13, .158, .24, .15],
])

# control-derivative tables over (|beta|, alpha)  [dmomdcon()]
_DLDA = np.array([
    [-.041, -.052, -.053, -.056, -.050, -.056, -.082, -.059, -.042, -.038, -.027, -.017],
    [-.041, -.053, -.053, -.053, -.050, -.051, -.066, -.043, -.038, -.027, -.023, -.016],
    [-.042, -.053, -.052, -.051, -.049, -.049, -.043, -.035, -.026, -.016, -.018, -.014],
    [-.040, -.052, -.051, -.052, -.048, -.048, -.042, -.037, -.031, -.026, -.017, -.012],
    [-.043, -.049, -.048, -.049, -.043, -.042, -.042, -.036, -.025, -.021, -.016, -.011],
    [-.044, -.048, -.048, -.047, -.042, -.041, -.020, -.028, -.013, -.014, -.011, -.010],
    [-.043, -.049, -.047, -.045, -.042, -.037, -.003, -.013, -.010, -.003, -.007, -.008],
])
_DLDR = np.array([
    [.005, .017, .014, .010, -.005, .009, .019, .005, 0.0, -.005, -.011, .008],
    [.007, .016, .014, .014, .013, .009, .012, .005, 0.0, .004, .009, .007],
    [.013, .013, .011, .012, .011, .009, .008, .005, -.002, .005, .003, .005],
    [.018, .015, .015, .014, .014, .014, .014, .015, .013, .011, .006, .001],
    [.015, .014, .013, .013, .012, .011, .011, .010, .008, .008, .007, .003],
    [.021, .011, .010, .011, .010, .009, .008, .010, .006, .005, 0.0, .001],
    [.023, .010, .011, .011, .011, .010, .008, .010, .006, .014, .020, 0.0],
])
_DNDA = np.array([
    [.001, -.027, -.017, -.013, -.012, -.016, .001, .017, .011, .017, .008, .016],
    [.002, -.014, -.016, -.016, -.014, -.019, -.021, .002, .012, .016, .015, .011],
    [-.006, -.008, -.006, -.006, -.005, -.008, -.005, .007, .004, .007, .006, .006],
    [-.011, -.011, -.010, -.009, -.008, -.006, 0.0, .004, .007, .010, .004, .010],
    [-.015, -.015, -.014, -.012, -.011, -.008, -.002, .002, .006, .012, .011, .011],
    [-.024, -.010, -.004, -.002, -.001, .003, .014, .006, -.001, .004, .004, .006],
    [-.022, .002, -.003, -.005, -.003, -.001, -.009, -.009, -.001, .003, -.002, .001],
])
_DNDR = np.array([
    [-.018, -.052, -.052, -.052, -.054, -.049, -.059, -.051, -.030, -.037, -.026, -.013],
    [-.028, -.051, -.043, -.046, -.045, -.049, -.057, -.052, -.030, -.033, -.030, -.008],
    [-.037, -.041, -.038, -.040, -.040, -.038, -.037, -.030, -.027, -.024, -.019, -.013],
    [-.048, -.045, -.045, -.045, -.044, -.045, -.047, -.048, -.049, -.045, -.033, -.016],
    [-.043, -.044, -.041, -.041, -.040, -.038, -.034, -.035, -.035, -.029, -.022, -.009],
    [-.052, -.034, -.036, -.036, -.035, -.028, -.024, -.023, -.020, -.016, -.010, -.014],
    [-.062, -.034, -.027, -.028, -.027, -.027, -.023, -.023, -.019, -.009, -.025, -.010],
])

# rolling/yawing moment vs (|beta|, alpha), odd in beta  [clcn()]
_CL = np.array([
    [0.0] * 12,
    [-.001, -.004, -.008, -.012, -.016, -.019, -.020, -.020, -.015, -.008, -.013, -.015],
    [-.003, -.009, -.017, -.024, -.030, -.034, -.040, -.037, -.016, -.002, -.010, -.019],
    [-.001, -.010, -.020, -.030, -.039, -.044, -.050, -.049, -.023, -.006, -.014, -.027],
    [0, -.010, -.022, -.034, -.047, -.046, -.059, -.061, -.033, -.036, -.035, -.035],
    [.007, -.010, -.023, -.034, -.049, -.046, -.068, -.071, -.060, -.058, -.062, -.059],
    [.009, -.011, -.023, -.037, -.050, -.047, -.074, -.079, -.091, -.076, -.077, -.076],
])
_CN = np.array([
    [0.0] * 12,
    [.018, .019, .018, .019, .019, .018, .013, .007, .004, -.014, -.017, -.033],
    [.038, .042, .042, .042, .043, .039, .030, .017, .004, -.035, -.047, -.057],
    [.056, .057, .059, .058, .058, .053, .032, .012, .002, -.046, -.071, -.073],
    [.064, .077, .076, .074, .073, .057, .029, .007, .012, -.034, -.065, -.041],
    [.074, .086, .093, .089, .080, .062, .049, .022, .028, -.012, -.002, -.013],
    [.079, .090, .106, .106, .096, .080, .068, .030, .064, .015, .011, -.001],
])

# axial force / pitching moment vs (elevator, alpha)  [cxcm()]
_CX = np.array([
    [-.099, -.081, -.081, -.063, -.025, .044, .097, .113, .145, .167, .174, .166],
    [-.048, -.038, -.040, -.021, .016, .083, .127, .137, .162, .177, .179, .167],
    [-.022, -.020, -.021, -.004, .032, .094, .128, .130, .154, .161, .155, .138],
    [-.040, -.038, -.039, -.025, .006, .062, .087, .085, .100, .110, .104, .091],
    [-.083, -.073, -.076, -.072, -.046, .012, .024, .025, .043, .053, .047, .040],
])
_CM = np.array([
    [.205, .168, .186, .196, .213, .251, .245, .238, .252, .231, .198, .192],
    [.081, .077, .107, .110, .110, .141, .127, .119, .133, .108, .081, .093],
    [-.046, -.020, -.009, -.005, -.006, .010, .006, -.001, .014, 0.0, -.013, .032],
    [-.174, -.145, -.121, -.127, -.129, -.102, -.097, -.113, -.087, -.084, -.069, -.006],
    [-.259, -.202, -.184, -.193, -.199, -.150, -.160, -.167, -.104, -.076, -.041, -.005],
])

# normal force vs alpha  [cz()]
_CZ = np.array([.770, .241, -.100, -.416, -.731, -1.053, -1.366, -1.646,
                -1.917, -2.120, -2.248, -2.229])


def _interp_a(table: np.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return interpn([jnp.asarray(ALPHA_AXIS)], jnp.asarray(table),
                   alpha[:, None])


def _interp_ba(table: np.ndarray, beta_abs: jnp.ndarray,
               alpha: jnp.ndarray) -> jnp.ndarray:
    pts = jnp.stack([beta_abs, alpha], axis=1)
    return interpn([jnp.asarray(BETA_AXIS), jnp.asarray(ALPHA_AXIS)],
                   jnp.asarray(table), pts)


def damping(alpha: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(CXq, CYr, CYp, CZq, Clr, Clp, Cmq, Cnr, Cnp) at alpha [deg]."""
    return tuple(_interp_a(_DAMP[i], alpha) for i in range(9))


def dmomdcon(alpha: jnp.ndarray, beta: jnp.ndarray
             ) -> Tuple[jnp.ndarray, ...]:
    """(dlda, dldr, dnda, dndr) control derivatives."""
    b = jnp.abs(beta)
    return (_interp_ba(_DLDA, b, alpha), _interp_ba(_DLDR, b, alpha),
            _interp_ba(_DNDA, b, alpha), _interp_ba(_DNDR, b, alpha))


def clcn(alpha: jnp.ndarray, beta: jnp.ndarray
         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Cl, Cn) rolling/yawing moments, odd in beta."""
    b = jnp.abs(beta)
    sgn = jnp.sign(beta)
    return (_interp_ba(_CL, b, alpha) * sgn, _interp_ba(_CN, b, alpha) * sgn)


def cxcm(alpha: jnp.ndarray, dele: jnp.ndarray
         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(CX, CM) vs alpha and elevator [deg]."""
    pts = jnp.stack([dele, alpha], axis=1)
    axes = [jnp.asarray(DELE_AXIS), jnp.asarray(ALPHA_AXIS)]
    return (interpn(axes, jnp.asarray(_CX), pts),
            interpn(axes, jnp.asarray(_CM), pts))


def cz(alpha: jnp.ndarray, beta: jnp.ndarray, dele: jnp.ndarray
       ) -> jnp.ndarray:
    """CZ with sideslip and elevator corrections."""
    base = _interp_a(_CZ, alpha)
    return base * (1.0 - (beta / 57.3) ** 2) - 0.19 * dele / 25.0
