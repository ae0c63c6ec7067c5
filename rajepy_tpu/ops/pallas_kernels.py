"""Pallas TPU kernels for the line-of-sight radiative-transfer scan.

The ordered transfer integral

    I(x, z) = sum_y S e^{-tau_acc} (1 - e^{-dtau}),   tau_acc = prefix sum

is the BASELINE north-star's "cumulative optical depth + emergent
intensity" scan.  The XLA formulation (ops.radtrans.transfer_scan) flips,
materialises an (nx, ny, nz) exclusive prefix cube and reduces — three full
HBM round trips of the cube.  This kernel streams each (x, z) tile once
through VMEM, carrying the (tau_acc, intensity) running state in registers:
one read of dtau and S, one write of two (nx, nz) maps, ~3x less HBM
traffic and no O(N^3) temporaries.

Grid: (nx / BX, nz / BZ) tiles; each program loops the full y extent over
its (BX, y, BZ) blocks with a `fori_loop`.  Tile sizes keep the two input
blocks within a few MB of VMEM (BX=8, BZ=128 -> 4 MB at ny=512).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(src_ref, dtau_ref, i_ref, tau_ref, *, ny: int):
    bx = src_ref.shape[0]
    bz = src_ref.shape[2]
    tau0 = jnp.zeros((bx, bz), dtype=src_ref.dtype)
    i0 = jnp.zeros((bx, bz), dtype=src_ref.dtype)

    def body(j, carry):
        tau_acc, inten = carry
        d = dtau_ref[:, j, :]
        s = src_ref[:, j, :]
        inten = inten + s * jnp.exp(-tau_acc) * (1.0 - jnp.exp(-d))
        tau_acc = tau_acc + d
        return tau_acc, inten

    tau_acc, inten = lax.fori_loop(jnp.int32(0), jnp.int32(ny), body,
                                   (tau0, i0))
    i_ref[:, :] = inten
    tau_ref[:, :] = tau_acc


@functools.partial(jax.jit,
                   static_argnames=('observer_near_y0', 'block_x',
                                    'block_z', 'interpret'))
def transfer_scan_pallas(source, dtau, observer_near_y0: bool = False,
                         block_x: int = 8, block_z: int = 128,
                         interpret: bool = False):
    """Emergent intensity and total optical depth maps from (nx, ny, nz)
    source-function and per-cell opacity cubes.

    Returns ``(intensity, tau_total)``, both (nx, nz).  Bit-equivalent to
    ``ops.radtrans.transfer_scan`` / summed ``dtau`` (validated in
    tests/test_pallas.py).  ``observer_near_y0`` selects which end of the
    y axis faces the observer (radtrans.transfer_scan convention).
    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests).
    """
    nx, ny, nz = source.shape
    if not observer_near_y0:
        # iterate from the observer-facing end; flipping outside the kernel
        # (fused into the producing computation by XLA) sidesteps Mosaic's
        # i32/i64 loop-index restrictions on reversed dynamic indexing
        source = jnp.flip(source, axis=1)
        dtau = jnp.flip(dtau, axis=1)
    bx = min(block_x, nx)
    bz = min(block_z, nz)
    pad_x = (-nx) % bx
    pad_z = (-nz) % bz
    if pad_x or pad_z:
        pads = ((0, pad_x), (0, 0), (0, pad_z))
        source = jnp.pad(source, pads)
        dtau = jnp.pad(dtau, pads)
    nxp, _, nzp = source.shape

    kernel = functools.partial(_scan_kernel, ny=ny)
    grid = (nxp // bx, nzp // bz)
    out_shape = [jax.ShapeDtypeStruct((nxp, nzp), source.dtype),
                 jax.ShapeDtypeStruct((nxp, nzp), source.dtype)]
    in_spec = pl.BlockSpec((bx, ny, bz), lambda i, j: (i, 0, j),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    out_spec = pl.BlockSpec((bx, bz), lambda i, j: (i, j),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    # x64 mode leaks i64 literals into the Mosaic lowering (index maps /
    # loop bounds), which it refuses; trace the kernel with x64 off — all
    # tensor values are f32 regardless.
    with jax.enable_x64(False):
        inten, tau = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=out_shape,
            in_specs=[in_spec, in_spec],
            out_specs=[out_spec, out_spec],
            interpret=interpret,
        )(source, dtau)
    return inten[:nx, :nz], tau[:nx, :nz]
