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


def chi_field(rr, launch_time, spec_r: EjectionSpec, spec_b: EjectionSpec):
    """Burst factor per cell: the red spec where r < 0, blue elsewhere
    (classes.py:861-870).  ``launch_time`` [s] is model time minus the
    cell's travel time (classes.py:844-845)."""
    return jnp.where(rr < 0, spec_r.chi(launch_time),
                     spec_b.chi(launch_time))
