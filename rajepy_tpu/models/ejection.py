"""Time-dependent ejection (burst) machinery — bursts as data, not closures.

The reference composes nested Python closures per burst
(classes.py:383-463), which is unvectorisable and unpicklable-by-design
(SURVEY §7 step 3).  Here each jet's variable mass-loss rate is a static
array spec evaluated in one fused pass:

    jml(t) = jml_ss + sum_i amp_i * exp(-(t - t0_i)^2 / (2 sigma_i^2))

with ``amp_i = peak_jml_i - jml_ss`` and ``sigma_i = half_life_i * 2 /
(2 sqrt(2 ln 2))`` exactly as classes.py:442-448.  ``t`` may be a scalar or
a whole launch-time grid, so the burst ("chi") factor field
(classes.py:861-870) is a single elementwise kernel.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

YEAR = 31536000.0


class EjectionSpec(NamedTuple):
    """Burst parameters for one jet (red or blue), SI units."""
    ss_jml: float           # steady-state mass-loss rate [kg/s]
    t_0: np.ndarray         # burst peak times [s]
    peak_jml: np.ndarray    # peak mass-loss rates [kg/s]
    half_life: np.ndarray   # burst half-lives [s]

    @property
    def sigma(self) -> np.ndarray:
        # classes.py:446: sigma = half_life * 2 / (2 sqrt(2 ln 2))
        return self.half_life * 2.0 / (2.0 * np.sqrt(2.0 * np.log(2.0)))

    def jml(self, t):
        """Mass-loss rate [kg/s] at time(s) ``t`` [s] (classes.py:442-448)."""
        t = jnp.asarray(t)
        out = jnp.zeros_like(t) + self.ss_jml
        for t0, peak, sig in zip(self.t_0, self.peak_jml, self.sigma):
            amp = peak - self.ss_jml
            out = out + amp * jnp.exp(-(jnp.asarray(t) - t0) ** 2 /
                                      (2.0 * sig ** 2))
        return out

    def chi(self, t):
        """Burst factor jml(t)/jml_ss (classes.py:861-870)."""
        return self.jml(t) / self.ss_jml


def build_ejection_specs(params: Dict, ss_jml_bj: float,
                         ss_jml_rj: float) -> Tuple[EjectionSpec,
                                                    EjectionSpec]:
    """Translate the params['ejection'] arrays (years / chi factors;
    files/example-model-params.py:51-55) into per-jet specs, honouring the
    'which' selector exactly as classes.py:248-264."""
    ej = params['ejection']
    t0 = np.atleast_1d(np.asarray(ej['t_0'], dtype=float)) * YEAR
    hl = np.atleast_1d(np.asarray(ej['hl'], dtype=float)) * YEAR
    chi = np.atleast_1d(np.asarray(ej['chi'], dtype=float))
    which = np.atleast_1d(np.asarray(ej['which']))

    specs = {}
    for side, ss in (('R', ss_jml_rj), ('B', ss_jml_bj)):
        sel = np.array([side in str(w).upper() for w in which], dtype=bool)
        specs[side] = EjectionSpec(
            ss_jml=ss,
            t_0=t0[sel],
            peak_jml=ss * chi[sel],
            half_life=hl[sel])
    return specs['R'], specs['B']


def chi_field(red, launch_time, spec_r: EjectionSpec, spec_b: EjectionSpec):
    """Burst factor per cell: the red spec on the red-jet side (r < 0,
    passed as a boolean mask), blue elsewhere (classes.py:861-870).
    ``launch_time`` [s] is model time minus the cell's travel time
    (classes.py:844-845).

    Implemented as a `lax.scan` over the stacked bursts of both jets: an
    unrolled python loop leaves XLA free to keep every burst's full-grid
    gaussian live simultaneously (observed ~20 x N^3 temporaries at 512^3,
    an HBM OOM); the scan pins the accumulation to two live grids.
    """
    launch_time = jnp.asarray(launch_time)
    n_r, n_b = len(spec_r.t_0), len(spec_b.t_0)
    if n_r + n_b == 0:
        return jnp.ones_like(launch_time)

    t0 = np.concatenate([spec_r.t_0, spec_b.t_0])
    sigma = np.concatenate([spec_r.sigma, spec_b.sigma])
    rel_amp = np.concatenate([
        (spec_r.peak_jml - spec_r.ss_jml) / spec_r.ss_jml,
        (spec_b.peak_jml - spec_b.ss_jml) / spec_b.ss_jml])
    is_red = np.concatenate([np.ones(n_r), np.zeros(n_b)])

    dtype = launch_time.dtype
    bursts = (jnp.asarray(t0, dtype), jnp.asarray(sigma, dtype),
              jnp.asarray(rel_amp, dtype), jnp.asarray(is_red, jnp.bool_))

    def body(chi, burst):
        t0_i, sig_i, amp_i, red_i = burst
        g = amp_i * jnp.exp(-(launch_time - t0_i) ** 2 /
                            (2.0 * sig_i ** 2))
        chi = chi + jnp.where(red == red_i, g, 0.0)
        return chi, None

    chi, _ = lax.scan(body, jnp.ones_like(launch_time), bursts)
    return chi
