"""Static grid construction (host-side — shapes must be static for XLA).

Mirrors the reference's grid logic:
* ``lz_to_grid_dims``  — classes.py:90-122 (golden-tested against the
  reference's hardcoded (80, 40, 20) fixture dims, test/test_classes.py:19)
* corner/centred coordinates — classes.py:465-513 (bottom-left-front cell
  corners in au, 'ij'-indexed, centred on the grid midpoint)

Coordinates are returned as *broadcastable* rank-3 arrays of shapes
(nx, 1, 1), (1, ny, 1), (1, 1, nz): field kernels broadcast them inside a
single fused XLA computation instead of materialising three full (nx, ny,
nz) meshgrids up front (the reference holds six such arrays permanently,
classes.py:465-513).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops import geometry as geom

# Line-of-sight axis: y is numpy axis 1 for 'ij' indexing (classes.py:363-372)
LOS_AXIS = 1


def lz_to_grid_dims(params: Dict) -> Tuple[int, int, int]:
    """Derive (nx, ny, nz) from the plane-of-sky jet length ``l_z`` [arcsec]
    (classes.py:90-122): project l_z into model x/y/z, pad by the jet width
    at the far end, enforce even dims."""
    cs_au = params["grid"]["c_size"]
    inc = params["geometry"]["inc"]
    pa = params["geometry"]["pa"]
    i_rads = np.radians(inc)
    pa_rads = np.radians(pa)
    l_xz_au = params['grid']['l_z'] * params['target']['dist']

    xmax_au = l_xz_au * np.sin(pa_rads)
    ymax_au = l_xz_au * np.tan(1.571 - i_rads)
    zmax_au = l_xz_au * np.cos(pa_rads)

    rmax_au = float(np.asarray(
        geom.xyz_to_rwp(jnp.float64(xmax_au), jnp.float64(ymax_au),
                        jnp.float64(zmax_au), inc, pa)[0]))
    wmax_au = float(np.asarray(geom.w_r(
        jnp.float64(rmax_au), params["geometry"]["w_0"],
        params["geometry"]["mod_r_0"], params["geometry"]["r_0"],
        params["geometry"]["epsilon"])))
    wmax_cells = int(np.ceil(np.abs(wmax_au / cs_au)))

    nx = int(np.ceil(np.abs(xmax_au / cs_au)))
    ny = int(np.ceil(np.abs(ymax_au / cs_au)))
    nz = int(np.ceil(np.abs(zmax_au / cs_au)))

    # Pad by jet width so the jet fits even at inc/pa of 0/90/180/270 deg
    nx, ny, nz = (n + 2 * wmax_cells for n in (nx, ny, nz))

    # Enforce even dims
    return tuple(n if n % 2 == 0 else n + 1 for n in (nx, ny, nz))


def grid_corner_coords(nx: int, ny: int, nz: int, csize: float,
                       dtype=jnp.float64):
    """Bottom-left-front corner coordinates in au as broadcastable arrays
    ((nx,1,1), (1,ny,1), (1,1,nz)); classes.py:489-501."""
    ix = jnp.arange(nx, dtype=dtype).reshape(nx, 1, 1)
    iy = jnp.arange(ny, dtype=dtype).reshape(1, ny, 1)
    iz = jnp.arange(nz, dtype=dtype).reshape(1, 1, nz)
    return (csize * (ix - nx // 2),
            csize * (iy - ny // 2),
            csize * (iz - nz // 2))


def grid_centre_coords(nx: int, ny: int, nz: int, csize: float,
                       dtype=jnp.float64):
    """Cell-centre coordinates (corner + csize/2; classes.py:521-523)."""
    xx, yy, zz = grid_corner_coords(nx, ny, nz, csize, dtype)
    half = csize / 2.0
    return xx + half, yy + half, zz + half
