from .atmosphere import atmos, eas2tas
from .aero import (AeroWeights, load_aero_weights, aero_coeffs,
                   aero_coeffs_t, select_aero_weights)
from .dynamics import nlplant_f16, nlplant_uav, sixdof_eom
from .linear_aero import C172P, LinearAeroDerivs, nlplant_linear
from .integrators import integrate
from .interp import interpn, load_dat, table_from_flat
from . import lofi
