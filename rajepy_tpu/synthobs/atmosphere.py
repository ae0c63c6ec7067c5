"""Atmosphere-dependent system temperature for the thermal-noise model.

The reference's simobserve runs CASA's ``thermalnoise='tsys-atm'`` mode,
which derives Tsys(nu, elevation, pwv) from the ATM atmospheric model with
``user_pwv`` / ``t_ground`` knobs (/root/reference/casa/tasks.py:196-206).
This module is a compact parametric stand-in (equivalence is statistical,
matching CASA's behaviour in trend, not bitwise): a two-component zenith
opacity — a dry term with the O2 60/118.75 GHz features and a wet term
linear in precipitable water vapour with the 22.235/183.31 GHz H2O lines
plus the mm continuum calibrated to the standard tau_225 ~ 0.0059 +
0.042 pwv[mm] site fit — propagated through the single-slab radiative
Tsys equation referenced above the atmosphere.

The per-telescope catalogue SEFDs (observatories.DEFAULT_SEFD) stay the
calibration anchor: :func:`sefd_scale` returns the ratio of Tsys at the
observing conditions to Tsys at the reference conditions (zenith, 1 mm
pwv), so 'tsys-atm' reduces to the flat radiometer model there and scales
physically away from it.  Valid ~1-350 GHz.
"""
from __future__ import annotations

import numpy as np

T_CMB = 2.725
REF_PWV_MM = 1.0
REF_ELEVATION_DEG = 90.0


def _lorentz(f_ghz, f0_ghz, gamma_ghz):
    return gamma_ghz ** 2 / ((f_ghz - f0_ghz) ** 2 + gamma_ghz ** 2)


def zenith_opacity(freq_hz, pwv_mm: float):
    """Zenith atmospheric opacity tau(nu) [nepers].

    Dry: continuum + O2 complexes at 60 and 118.75 GHz.  Wet (per mm
    pwv): H2O lines at 22.235 and 183.31 GHz + the f^2 mm continuum
    (anchored to tau_225 = 0.0059 + 0.042 pwv).
    """
    f = np.asarray(freq_hz, dtype=float) / 1e9
    # dry continuum tuned so tau_dry(225 GHz) ~ 0.006 (the dry part of
    # the standard tau_225 site fit)
    tau_dry = (0.001 + 5.0e-8 * f ** 2 +
               3.5 * _lorentz(f, 60.0, 4.0) +
               0.70 * _lorentz(f, 118.75, 1.5))
    k_wet = (0.042 * (f / 225.0) ** 2 +
             0.010 * _lorentz(f, 22.235, 2.2) +
             0.70 * _lorentz(f, 183.31, 3.0))
    return tau_dry + float(pwv_mm) * k_wet


def receiver_temperature(freq_hz):
    """Default receiver temperature trend T_rx(nu) ~ 15 K + 0.4 K/GHz —
    the generic LNA scaling; pass an explicit ``t_rx`` to override."""
    return 15.0 + 0.4 * np.asarray(freq_hz, dtype=float) / 1e9


def tsys(freq_hz, elevation_deg: float, pwv_mm: float,
         t_ground: float = 270.0, t_rx=None):
    """System temperature [K] referenced above the atmosphere:

        Tsys = (T_rx + T_atm (1 - e^-tau A) + T_cmb e^-tau A) e^{+tau A}

    with airmass A = 1/sin(el) and the effective atmosphere temperature
    T_atm ~ 0.95 T_ground (single-slab approximation; CASA's ATM
    integrates a profile — tasks.py:196-206).
    """
    el = max(float(elevation_deg), 5.0)  # clamp below 5 deg (model break)
    airmass = 1.0 / np.sin(np.radians(el))
    tau = zenith_opacity(freq_hz, pwv_mm) * airmass
    t = np.exp(-tau)
    t_atm = 0.95 * float(t_ground)
    t_rx = receiver_temperature(freq_hz) if t_rx is None else \
        np.asarray(t_rx, dtype=float)
    return (t_rx + t_atm * (1.0 - t) + T_CMB * t) / t


def sefd_scale(freq_hz, elevation_deg: float, pwv_mm: float,
               t_ground: float = 270.0, t_rx=None):
    """Multiplier on the catalogue SEFD: Tsys at the observing conditions
    over Tsys at the reference conditions (zenith, 1 mm pwv, same
    frequency and receiver).  >= ~1 for el < 90 or pwv > 1 mm."""
    now = tsys(freq_hz, elevation_deg, pwv_mm, t_ground, t_rx)
    ref = tsys(freq_hz, REF_ELEVATION_DEG, REF_PWV_MM, t_ground, t_rx)
    return now / ref
