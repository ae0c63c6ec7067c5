"""Observability geometry: elevation and hour-angle windows.

Replaces the reference's astropy-based maths/astronomy.py (elevation at
astronomy.py:7-47, hour angle at astronomy.py:50-89) with plain
trigonometry on degrees/hours, plus sexagesimal parsing utilities standing
in for astropy.SkyCoord (used by the reference at classes.py:2332-2334).
"""
from __future__ import annotations

import re
from typing import Tuple

import numpy as np


def parse_ra(ra: str) -> float:
    """'HH:MM:SS.SS' (or 'HHhMMmSS.Ss') -> degrees."""
    parts = [float(p) for p in re.split('[:hms ]+', ra.strip()) if p != '']
    h, m, s = (parts + [0.0, 0.0])[:3]
    return (h + m / 60.0 + s / 3600.0) * 15.0


def parse_dec(dec: str) -> float:
    """'+DD:MM:SS.SS' (or 'DDdMMmSS.Ss') -> degrees."""
    neg = dec.strip().startswith('-')
    parts = [float(p) for p in re.split('[:dms ]+', dec.strip().lstrip('+-'))
             if p != '']
    d, m, s = (parts + [0.0, 0.0])[:3]
    val = d + m / 60.0 + s / 3600.0
    return -val if neg else val


def parse_coord(ra: str, dec: str) -> Tuple[float, float]:
    """Sexagesimal (ra, dec) strings -> degrees."""
    return parse_ra(ra), parse_dec(dec)


def _sexagesimal(value: float, s_round: float) -> Tuple[int, int, float]:
    """(units, minutes, seconds) with carry: seconds that would render as
    60 under ``s_round``-decimal formatting roll into minutes (astropy's
    to_string never emits '60' — neither may we; see also
    models.runs.Pointing.ra/dec)."""
    u = int(value)
    m = int((value - u) * 60.0)
    s = (value - u - m / 60.0) * 3600.0
    if round(s, s_round) >= 60.0:
        s = 0.0
        m += 1
    if m == 60:
        m = 0
        u += 1
    return u, m, s


def format_hmsdms(ra_deg: float, dec_deg: float) -> str:
    """Degrees -> 'HHhMMmSS.SSSSSSs +DDdMMmSS.SSSSSSs' (the astropy
    ``to_string('hmsdms')`` style the reference writes into pointing files,
    classes.py:2338-2339)."""
    h, m, s = _sexagesimal(ra_deg / 15.0, 6)
    h %= 24   # the seconds carry can roll 23h59m59.9999995s to 24h
    sign = '-' if dec_deg < 0 else '+'
    dd, dm, ds = _sexagesimal(abs(dec_deg), 6)
    return f"{h:02d}h{m:02d}m{s:09.6f}s {sign}{dd:02d}d{dm:02d}m{ds:09.6f}s"


# --------------------------------------------------------------------- #
# FK4 (B1950) <-> FK5 (J2000) conversion.
#
# The reference's Pointing builds an FK4-frame SkyCoord for
# epoch='B1950' (classes.py:3195-3200) so consumers can obtain
# frame-correct coordinates; astropy is absent here, so we implement the
# standard zero-proper-motion conversion (SLALIB fk45z / Aoki et al.
# 1983): remove the FK4 catalogue's elliptic aberration terms
# (E-terms), then rotate by the combined precession + equinox-correction
# matrix.  The fictitious-proper-motion correction is proportional to
# (observation epoch - B1950) and vanishes for the default B1950
# observation epoch (astropy's FK4 default obstime), so it is omitted.
# Accuracy ~0.01 arcsec, versus the ~0.7 deg error of treating B1950
# coordinates as J2000.
# --------------------------------------------------------------------- #

# E-terms of aberration (radians), SLALIB fk45z A vector
_FK4_ETERMS = np.array([-1.62557e-6, -0.31919e-6, -0.13843e-6])

# B1950 -> J2000 rotation (position part of the fk45z EM matrix)
_FK4_TO_FK5 = np.array([
    [+0.999925678186902, -0.011182059642247, -0.004857946558960],
    [+0.011182059571766, +0.999937478448132, -0.000027176441185],
    [+0.004857946721186, -0.000027147426498, +0.999988199738770]])


def _unit_vec(ra_deg: float, dec_deg: float) -> np.ndarray:
    ra = np.radians(ra_deg)
    dec = np.radians(dec_deg)
    return np.array([np.cos(dec) * np.cos(ra),
                     np.cos(dec) * np.sin(ra),
                     np.sin(dec)])


def _vec_to_radec(v: np.ndarray) -> Tuple[float, float]:
    ra = float(np.degrees(np.arctan2(v[1], v[0]))) % 360.0
    dec = float(np.degrees(np.arcsin(v[2] / np.linalg.norm(v))))
    return ra, dec


def fk4_to_fk5(ra_deg: float, dec_deg: float) -> Tuple[float, float]:
    """B1950/FK4 catalogue place -> J2000/FK5 place, degrees (zero proper
    motion, observation epoch B1950.0)."""
    r0 = _unit_vec(ra_deg, dec_deg)
    # remove E-terms: catalogue place -> mean place
    r1 = r0 - _FK4_ETERMS + np.dot(r0, _FK4_ETERMS) * r0
    r1 /= np.linalg.norm(r1)
    return _vec_to_radec(_FK4_TO_FK5 @ r1)


def fk5_to_fk4(ra_deg: float, dec_deg: float) -> Tuple[float, float]:
    """J2000/FK5 place -> B1950/FK4 catalogue place, degrees (inverse of
    :func:`fk4_to_fk5`; E-terms restored iteratively)."""
    r1 = _FK4_TO_FK5.T @ _unit_vec(ra_deg, dec_deg)
    r0 = r1.copy()
    for _ in range(3):  # converges to <1e-12 rad in 2 iterations
        r0 = r1 + _FK4_ETERMS - np.dot(r0, _FK4_ETERMS) * r0
        r0 /= np.linalg.norm(r0)
    return _vec_to_radec(r0)


def elevation(ra_deg: float, dec_deg: float, lat: float, lst: float) -> float:
    """Elevation [deg] of (ra, dec) for an observer at latitude ``lat`` [deg]
    at local sidereal time ``lst`` [hours] (astronomy.py:7-47)."""
    if lst < 0.0 or lst > 24.0:
        raise ValueError(f"lst must be in range 0 <= lst < 24, not {lst}")
    if lat < -90.0 or lat > 90.0:
        raise ValueError(f"lat must be in range -90 <= lat <= +90, not {lat}")
    ha_rad = np.radians(ra_deg - lst * 15.0)
    lat_rad = np.radians(lat)
    dec_rad = np.radians(dec_deg)
    p1 = np.sin(lat_rad) * np.sin(dec_rad)
    p2 = np.cos(lat_rad) * np.cos(dec_rad) * np.cos(ha_rad)
    return float(np.degrees(np.arcsin(p1 + p2)))


def ha(ra_deg: float, dec_deg: float, lat: float, elev: float) -> float:
    """Hour angle [hours, in [0, 24)] at which (ra, dec) crosses elevation
    ``elev`` [deg] for latitude ``lat`` (astronomy.py:50-89).  NaN if the
    source never reaches that elevation."""
    if elev < -90.0 or elev > 90.0:
        raise ValueError(f"elev must be in range -90 <= el <= +90, not {elev}")
    if lat < -90.0 or lat > 90.0:
        raise ValueError(f"lat must be in range -90 <= lat <= +90, not {lat}")
    lat_rad = np.radians(lat)
    dec_rad = np.radians(dec_deg)
    el_rad = np.radians(elev)
    p1 = np.sin(el_rad) - np.sin(lat_rad) * np.sin(dec_rad)
    p2 = np.cos(lat_rad) * np.cos(dec_rad)
    ha_rad = np.arccos(p1 / p2)
    ha_hours = np.degrees(ha_rad) / 15.0
    return float(ha_hours % 24.0)
