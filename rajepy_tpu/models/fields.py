"""Physical field evaluation on the voxel grid — the grid-fill hot path.

Each function here is a pure, jit-compilable map
``(static params, broadcastable coords) -> field array`` replacing the
reference's lazily cached mutable properties (classes.py:465-1099).

Masking convention: kernels return ``(values, inside)`` where ``inside`` is
the boolean jet-membership mask and ``values`` are finite everywhere
(zero-filled outside).  The reference instead fills NaN outside the jet and
relies on nansum/nanmean with RuntimeWarnings suppressed (classes.py:36-38);
the NaN view is reconstructed only at the JetModel API boundary.

Reference formula sources:
* fill factors / projected areas: 8-vertex inside test, classes.py:639-769
* number density:   classes.py:872-899
* ion fraction:     classes.py:910-936
* temperature:      classes.py:942-996 — with the reference's au->cm slip
  (classes.py:957 converts r to cm but compares/normalises against au
  quantities; harmless for q_T = 0, dimensionally wrong otherwise — SURVEY
  §2.1) corrected: everything in au, like the density/ionisation fields.
* velocity:         classes.py:1009-1099
* travel time ts:   classes.py:838-855 (+ geometry.py:121-178)
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import geometry as geom
from ..ops import physics as phys


class Geometry(NamedTuple):
    """Static geometric/physical scalars extracted from a params dict."""
    w_0: float
    r_0: float
    mod_r_0: float
    epsilon: float
    inc: float
    pa: float
    r_1: float
    r_2: float
    csize: float

    @classmethod
    def from_params(cls, params: Dict) -> "Geometry":
        g, t = params['geometry'], params['target']
        return cls(w_0=g['w_0'], r_0=g['r_0'], mod_r_0=g['mod_r_0'],
                   epsilon=g['epsilon'], inc=g['inc'], pa=g['pa'],
                   r_1=t['R_1'], r_2=t['R_2'],
                   csize=params['grid']['c_size'])


# --------------------------------------------------------------------------- #
# Coordinates
# --------------------------------------------------------------------------- #
def centre_rwp(gm: Geometry, xc, yc, zc):
    """Cell-centre jet-frame coordinates (r, w, phi) (classes.py:515-526)."""
    return geom.xyz_to_rwp(xc, yc, zc, gm.inc, gm.pa)


def effective_radius(gm: Geometry, rr, ww):
    """Disc launch radius r_eff per cell (classes.py:544-557)."""
    return geom.r_eff(ww, gm.r_1, gm.r_2, gm.w_0, jnp.abs(rr), gm.mod_r_0,
                      gm.r_0, gm.epsilon)


def adjusted_r(gm: Geometry, rr):
    """|r|, with cells straddling the launch surface nudged to the mean of
    (r_0, r + csize/2) (classes.py:884-886 et al.)."""
    r = jnp.abs(rr)
    straddles = (r < gm.r_0) & ((r + gm.csize / 2.0) >= gm.r_0)
    return jnp.where(straddles, (gm.r_0 + r + gm.csize / 2.0) / 2.0, r)


# --------------------------------------------------------------------------- #
# Fill factors and projected areas
# --------------------------------------------------------------------------- #
def fill_factor_area(gm: Geometry, xx, yy, zz) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray,
                                                        jnp.ndarray]:
    """Vectorised 8-corner inside/outside test (classes.py:657-669).

    A voxel corner (x+dx, y+dy, z+dz) is inside the jet when its jet-frame
    width coordinate lies within the local jet boundary w(r) and |r| is
    beyond the launch radius.  ff = 1 for 8 corners inside, 0.5 for a
    partial cell, 0 outside; the projected area (on to the sky plane) is 1
    whenever any corner is inside.

    Args are *corner* coordinates (broadcastable).  Returns
    ``(ff, area, inside)`` with zeros (not the reference's NaNs) outside.
    """
    cs = gm.csize
    n_inside = None
    for dx in (0.0, cs):
        for dy in (0.0, cs):
            for dz in (0.0, cs):
                rv, wv, _ = geom.xyz_to_rwp(xx + dx, yy + dy, zz + dz,
                                            gm.inc, gm.pa)
                wrv = geom.w_r(rv, gm.w_0, gm.mod_r_0, gm.r_0, gm.epsilon)
                corner_in = (wrv >= wv) & (jnp.abs(rv) >= gm.r_0)
                n_inside = corner_in.astype(jnp.int32) if n_inside is None \
                    else n_inside + corner_in
    # anchor the literal-valued outputs to the coordinate dtype (all-weak
    # jnp.where(.., 1.0, 0.0) would promote to float64 under x64)
    dt = jnp.result_type(xx, yy, zz)
    ff = jnp.where(n_inside == 8, jnp.asarray(1.0, dt),
                   jnp.where(n_inside > 0, 0.5, 0.0))
    area = jnp.where(n_inside > 0, jnp.asarray(1.0, dt), 0.0)
    inside = n_inside > 0
    return ff, area, inside


# --------------------------------------------------------------------------- #
# Scalar fields
# --------------------------------------------------------------------------- #
def _power_law_field(gm: Geometry, zero_val, q, qd, rr, reff, inside):
    """Shared cell-value power law with launch-surface nudge and masking
    (pattern of classes.py:884-899)."""
    r = adjusted_r(gm, rr)
    vals = geom.cell_value(zero_val, geom.rho(r, gm.r_0, gm.mod_r_0), reff,
                           gm.r_1, q, qd)
    return jnp.where(inside, vals, 0.0)


def number_density(gm: Geometry, params: Dict, rr, reff, inside,
                   rb_frac: float):
    """Static (chi-independent) number density [cm^-3]
    (classes.py:872-899).  Red jet (r < 0) scaled by the red/blue
    steady-state mass-loss ratio."""
    pl = params['power_laws']
    nd = _power_law_field(gm, params['properties']['n_0'], pl['q_n'],
                          pl['q^d_n'], rr, reff, inside)
    return jnp.where(rr < 0, nd * rb_frac, nd)


def ion_fraction(gm: Geometry, params: Dict, rr, reff, inside):
    """Ionisation fraction (classes.py:910-936)."""
    pl = params['power_laws']
    return _power_law_field(gm, params['properties']['x_0'], pl['q_x'],
                            pl['q^d_x'], rr, reff, inside)


def temperature(gm: Geometry, params: Dict, rr, reff, inside):
    """Temperature [K] (classes.py:942-996, with the au/cm slip fixed)."""
    pl = params['power_laws']
    return _power_law_field(gm, params['properties']['T_0'], pl['q_T'],
                            pl['q^d_T'], rr, reff, inside)


def velocity(gm: Geometry, params: Dict, rr, pp, reff, inside):
    """Observer-frame velocity components (vx, vy, vz) [km/s]
    (classes.py:1009-1099): power-law outflow along the jet axis plus
    Keplerian rotation decomposed by azimuth, the whole field rotated by
    (90 - inc, -pa) and v_lsr added along the line of sight (y)."""
    pl = params['power_laws']
    p = params['properties']

    vz_jet = _power_law_field(gm, p['v_0'], pl['q_v'], pl['q^d_v'], rr, reff,
                              inside)
    vz_jet = vz_jet * jnp.sign(rr)

    vr = phys.v_rot(rr, reff, geom.rho(rr, gm.r_0, gm.mod_r_0), gm.epsilon,
                    params['target']['M_star'])
    sense = 1.0 if params['geometry']['rotation'].lower() == 'ccw' else -1.0
    vx_jet = -vr * jnp.sin(pp) * sense
    vy_jet = vr * jnp.cos(pp) * sense

    vx_jet = jnp.where(inside, vx_jet, 0.0)
    vy_jet = jnp.where(inside, vy_jet, 0.0)

    vx, vy, vz = geom.xyz_rotate(vx_jet, vy_jet, vz_jet, 90.0 - gm.inc,
                                 -gm.pa, order='xy')
    vy = vy + params['target']['v_lsr']
    return (jnp.where(inside, vx, 0.0), jnp.where(inside, vy, 0.0),
            jnp.where(inside, vz, 0.0))


def travel_time_years(gm: Geometry, params: Dict, rr, ww):
    """Travel time from launch surface to each cell [years]
    (classes.py:838-855; closed-form integral of geometry.py:121-178,
    evaluated grid-wide through ops.hyp2f1)."""
    r = adjusted_r(gm, rr)
    pl = params['power_laws']
    return geom.t_rw(r, ww, w_0=gm.w_0, r_0=gm.r_0,
                     v_0=params['properties']['v_0'], mr0=gm.mod_r_0,
                     eps=gm.epsilon, r_1=gm.r_1, r_2=gm.r_2,
                     q_v=pl['q_v'], q_vd=pl['q^d_v'])


class StaticFields(NamedTuple):
    """Time-independent grids cached on device (the RT working set).

    Memory note: only what the RT chain consumes is retained — the LOS
    velocity component, and a red-jet boolean instead of the full
    jet-frame r cube (the burst factor only needs sign(r),
    classes.py:866-868).  Full 3-D velocities and coordinates are
    recomputed on demand by the JetModel properties; at 512^3 this keeps
    the resident set ~2 cubes smaller so the RRL chain fits single-chip
    HBM.
    """
    ff: jnp.ndarray        # fill factors (0 outside)
    area: jnp.ndarray      # projected areas (0 outside)
    inside: jnp.ndarray    # bool jet-membership mask
    nd: jnp.ndarray        # number density without burst factor [cm^-3]
    xi: jnp.ndarray        # ionisation fraction
    temp: jnp.ndarray      # temperature [K]
    vy: jnp.ndarray        # LOS velocity component [km/s]
    ts: jnp.ndarray        # travel time since launch [s]
    red: jnp.ndarray       # bool: red-jet side (r < 0)


def compute_static_fields(params: Dict, xx, yy, zz, rb_frac: float,
                          with_time: bool = True) -> StaticFields:
    """Evaluate every time-independent grid in one jit-able program.

    ``xx, yy, zz`` are *corner* coordinate arrays (broadcastable); centre
    coordinates are corner + csize/2 (classes.py:521-523).
    """
    gm = Geometry.from_params(params)
    half = gm.csize / 2.0
    xc, yc, zc = xx + half, yy + half, zz + half

    ff, area, inside = fill_factor_area(gm, xx, yy, zz)
    rr, ww, pp = centre_rwp(gm, xc, yc, zc)
    reff = effective_radius(gm, rr, ww)

    nd = number_density(gm, params, rr, reff, inside, rb_frac)
    xi = ion_fraction(gm, params, rr, reff, inside)
    temp = temperature(gm, params, rr, reff, inside)
    _, vy, _ = velocity(gm, params, rr, pp, reff, inside)
    if with_time:
        # NB: unmasked — the reference evaluates travel time for every cell
        # (classes.py:838-855) and the burst factor field samples it
        # everywhere (classes.py:861-870)
        ts = travel_time_years(gm, params, rr, ww) * 31536000.0
    else:
        ts = jnp.zeros_like(nd)

    shape = jnp.broadcast_shapes(jnp.shape(xx), jnp.shape(yy), jnp.shape(zz))
    return StaticFields(
        ff=jnp.broadcast_to(ff, shape), area=jnp.broadcast_to(area, shape),
        inside=jnp.broadcast_to(inside, shape),
        nd=jnp.broadcast_to(nd, shape), xi=jnp.broadcast_to(xi, shape),
        temp=jnp.broadcast_to(temp, shape),
        vy=jnp.broadcast_to(vy, shape), ts=jnp.broadcast_to(ts, shape),
        red=jnp.broadcast_to(rr < 0, shape))
