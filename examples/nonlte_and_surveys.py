"""Non-LTE recombination lines and batched parameter surveys.

Two r4 capabilities the reference has no analogue for:

1. **Non-LTE RRLs from the params alone** — the reference ships the
   Gordon & Sorochenko non-LTE slab scaffolding but raises on
   ``lte=False`` (classes.py:1258-1262) because it has no
   departure-coefficient source.  Here ``ops.departure`` solves the
   case-B hydrogenic statistical-equilibrium problem once and bundles
   b_n(n, T_e, n_e); ``lte=False`` just works, with scalar coefficients
   at the jet's emission-weighted conditions or per-sightline maps.

2. **Batched parameter surveys** (``fit.sweep``) — a Cartesian grid of
   jet models evaluated as ONE vmapped XLA program (sharded across a
   device mesh on pods), where the reference's equivalent is a job
   array of full Python processes.

Runs on CPU (f64) in a couple of minutes:

    JAX_PLATFORM_NAME=cpu python examples/nonlte_and_surveys.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere without installing

import copy
import os
import runpy

import numpy as np

import rajepy_tpu
from rajepy_tpu import JetModel, fit
from rajepy_tpu.ops import departure, rrls

YEAR = 31536000.0

params = runpy.run_path(os.path.join(
    os.path.dirname(rajepy_tpu.__file__), 'data',
    'example-model-params.py'))['params']
p = copy.deepcopy(params)
p['grid'].update(n_x=24, n_y=60, n_z=24, l_z=None)
jm = JetModel(p)
jm.time = 2.0 * YEAR

# --- 1. non-LTE H58a, no user-supplied coefficients ------------------- #
nu0 = rrls.rrl_nu_0('H', 58, 1)
freqs = np.linspace(nu0 - 2e6, nu0 + 2e6, 9)

b1, b2 = jm.departure_coefficients('H58a')
t_c, ne_c = jm.characteristic_conditions()
print(f"jet EM-weighted conditions: T_e = {t_c:.0f} K, "
      f"n_e = {ne_c:.2e} cm^-3")
print(f"auto departure coefficients: b_58 = {b1:.4f}, b_59 = {b2:.4f}")

s_lte = np.nansum(jm.flux_rrl('H58a', freqs), axis=(1, 2))
s_nl = np.nansum(jm.flux_rrl('H58a', freqs, lte=False), axis=(1, 2))
print("line-centre flux: LTE {:.3e} Jy, non-LTE {:.3e} Jy "
      "(ratio {:.3f} — b_n2 > b_n1 drives stimulated amplification)"
      .format(s_lte[4], s_nl[4], s_nl[4] / s_lte[4]))

# per-sightline coefficient maps (the slab composition's granularity)
b1m, b2m = jm.departure_coefficient_maps('H58a')
s_map = np.nansum(jm.flux_rrl('H58a', freqs, lte=False,
                              departure_coeffs=(b1m, b2m)), axis=(1, 2))
print(f"per-sightline maps: b_58 spans "
      f"[{b1m.min():.4f}, {b1m.max():.4f}]; line-centre flux "
      f"{s_map[4]:.3e} Jy")

# the underlying solver is open: inspect b_n at any conditions
b = departure.solve_bn(1e4, 1e6)
print("b_n(T=1e4 K, n_e=1e6): n=58 ->", round(float(b[56]), 4),
      " n=100 ->", round(float(b[98]), 4))

# r5: the table's collisional-rate systematic is quantified — the
# bundled file carries x0.5/x2 rate-scaled edge solutions, and any
# non-LTE fit with table-derived coefficients should propagate it
# (fit.rrl_departure_systematic) on top of the statistical sigmas
s1, s2 = departure.b_n_pair_systematic(58, 1, t_c, ne_c)
print(f"rate-prescription systematic at the jet's conditions: "
      f"b_58 +- {s1:.1e}, b_59 +- {s2:.1e} "
      f"(JetModel.departure_coefficient_systematic('H58a'))")

# --- 2. a 12-model survey in one compiled program --------------------- #
sed_freqs = np.array([6e9, 2.2e10, 1e11, 3e11])
res = fit.sweep(jm, sed_freqs,
                {'properties.mlr_bj': np.geomspace(5e-8, 4e-7, 4),
                 'properties.T_0': np.array([8e3, 1e4, 1.25e4])})
print(f"\nsweep: {res.values.shape[0]} models x "
      f"{sed_freqs.size} channels in one program")
cube = res.reshaped()          # (4 mlr, 3 T_0, n_chan)
alpha = (np.log10(cube[..., 1] / cube[..., 0]) /
         np.log10(sed_freqs[1] / sed_freqs[0]))
print("spectral index alpha(6->22 GHz) vs mlr (rows) x T_0 (cols):")
print(np.array_str(alpha, precision=3))
print("\nOK")
