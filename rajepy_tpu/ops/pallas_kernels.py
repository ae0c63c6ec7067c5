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
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .voigt import _weideman_coeffs, _SQRT_PI


# Test hook: when True, every kernel wrapper runs in the Pallas
# interpreter regardless of its ``interpret`` argument, and
# JetModel._use_fused_rrl() turns the fused/compacted production paths on
# — so the model-level tile plumbing (compaction caches, launch-time
# packing, segment reassembly) is exercisable in CPU CI, where both real
# round-2 bugs lived.  Toggling clears the wrappers' jit caches (the flag
# is read at trace time and is not part of their cache keys).
_FORCE_INTERPRET = False
_JITTED_WRAPPERS: list = []   # every @jax.jit kernel wrapper registers here


def force_interpret(on: bool) -> None:
    global _FORCE_INTERPRET
    if bool(on) != _FORCE_INTERPRET:
        # the flag is read at trace time but is NOT part of the jit cache
        # key — drop compiled entries so toggling can never silently run
        # the wrong mode for an already-seen shape
        for fn in _JITTED_WRAPPERS:
            fn.clear_cache()
    _FORCE_INTERPRET = bool(on)


def pack_offset_for(ts_min: float) -> float:
    """Packing offset for :func:`pack_launch_time` that keeps the packed
    magnitude |ts + offset| strictly positive IN FLOAT32 for every
    ts >= ts_min: a fixed +1 margin falls below f32 rounding once
    |ts_min| exceeds ~2^24 s, so the margin scales with |ts_min|
    (1e-5 relative, ~2 f32 ulps of headroom)."""
    ts_min = float(ts_min)
    return 1.0 + 1e-5 * abs(ts_min) - min(0.0, ts_min)


def _one_minus_exp_neg(d):
    """Numerically stable 1 - exp(-d) for d >= 0 inside Mosaic kernels
    (expm1 has no Pallas TPU lowering): Taylor below 0.05 where the
    subtraction cancels, exact form elsewhere.  The threshold matters:
    1 - exp(-d) loses eps/d relative digits, so a 1e-3 switch left a
    ~1.2e-4 band just above it (the dominant residual of the r3 emergent
    kernels after the MXU-precision fix); at 0.05 the direct form is
    within 2.4e-6 and the 5-term Taylor within 5e-8."""
    small = d < 0.05
    d_safe = jnp.where(small, 0.0, d)
    taylor = d * (1.0 - d * (0.5 - d * ((1.0 / 6.0) - d *
                                        ((1.0 / 24.0) -
                                         d * (1.0 / 120.0)))))
    return jnp.where(small, taylor, 1.0 - jnp.exp(-d_safe))


def _scan_kernel(src_ref, dtau_ref, i_ref, tau_ref, *, ny: int):
    bx = src_ref.shape[0]
    bz = src_ref.shape[2]
    tau0 = jnp.zeros((bx, bz), dtype=src_ref.dtype)
    i0 = jnp.zeros((bx, bz), dtype=src_ref.dtype)

    def body(j, carry):
        tau_acc, inten = carry
        d = dtau_ref[:, j, :]
        s = src_ref[:, j, :]
        inten = inten + s * jnp.exp(-tau_acc) * _one_minus_exp_neg(d)
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
    interpret = interpret or _FORCE_INTERPRET
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


def _epoch_base_kernel(t_ref, a_ref, tss_ref, out_ref, *, yc: int,
                       bursts: tuple, pack_offset: float):
    """Grid = (x tiles, z tiles, y chunks), y fastest; the (bx, bz) output
    block accumulates across y chunks.  Burst parameters are compile-time
    scalars evaluated in-register on the whole (bx, yc, bz) block at once
    (no per-row loop — the VPU sweeps the block).  Launch time and jet
    side arrive packed in ONE cube (sign(tss) = side, |tss| - 1 = ts), so
    each epoch streams exactly two cubes of HBM."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    tss = tss_ref[...]
    lt = t_ref[0] - (jnp.abs(tss) - pack_offset)
    red = tss < 0.0
    chi = jnp.ones_like(lt)
    for t0, inv2s2, amp, is_red in bursts:
        g = amp * jnp.exp(-(lt - t0) ** 2 * inv2s2)
        sel = red if is_red else jnp.logical_not(red)
        chi = chi + jnp.where(sel, g, 0.0)
    out_ref[...] += jnp.sum(a_ref[...] * chi * chi, axis=1)


def pack_launch_time(ts, red, dtype=jnp.float32, offset=1.0):
    """Pack launch time + jet side into one cube for the epoch kernels:
    +(ts + offset) on the blue side, -(ts + offset) on the red side.

    ``offset`` MUST exceed ``-min(ts)`` so the packed magnitude stays
    positive — travel times from the closed-form integral can be
    NEGATIVE near the launch surface for off-axis geometries, and a
    too-small offset silently corrupts both the side bit and the
    recovered time.  Every kernel takes the SAME offset as its static
    ``pack_offset`` argument and unpacks ``|tss| - pack_offset``
    directly — pass the value used here, with no epoch-time shift."""
    ts1 = jnp.asarray(ts, dtype) + jnp.asarray(offset, dtype)
    return jnp.where(red, -ts1, ts1)


@functools.partial(jax.jit, static_argnames=('bursts', 'block_x', 'block_z',
                                             'y_chunk', 'interpret',
                                             'pack_offset'))
def epoch_base_map_pallas(a, ts_signed, t, bursts: tuple,
                          block_x: int = 8, block_z: int = 128,
                          y_chunk: int = 128, interpret: bool = False,
                          pack_offset: float = 1.0):
    """LOS-collapsed sum_y A * chi(t - ts)^2 in one streaming pass.

    The per-epoch half of the free-free/EM products: ``a`` is any
    epoch-independent per-cell base (opacity tau_ff_base or EM base), and
    chi is the burst factor (models/ejection.chi_field; classes.py:861-870)
    evaluated in-register from the static ``bursts`` tuple of
    (t0, 1/(2 sigma^2), rel_amp, is_red) scalars.  The XLA formulation
    scans bursts through HBM (~1.7 GB/burst at 512^3); this kernel reads
    exactly two cubes per epoch regardless of burst count.

    Args:
      a:         (nx, ny, nz) epoch-independent base, 0 outside the jet
      ts_signed: (nx, ny, nz) launch time + side from
                 :func:`pack_launch_time`
      t:         scalar model time [s] (traced — epochs don't recompile)

    Returns the (nx, nz) collapsed map.
    """
    interpret = interpret or _FORCE_INTERPRET
    nx, ny, nz = a.shape
    bx = min(block_x, nx)
    bz = min(block_z, nz)
    yc = min(y_chunk, ny)
    pad_x = (-nx) % bx
    pad_z = (-nz) % bz
    pad_y = (-ny) % yc
    if pad_x or pad_z or pad_y:
        pads = ((0, pad_x), (0, pad_y), (0, pad_z))
        a = jnp.pad(a, pads)      # zero base kills padded contributions
        ts_signed = jnp.pad(ts_signed, pads, constant_values=1.0)
    nxp, nyp, nzp = a.shape

    kernel = functools.partial(_epoch_base_kernel, yc=yc, bursts=bursts,
                               pack_offset=pack_offset)
    grid = (nxp // bx, nzp // bz, nyp // yc)
    cell_spec = pl.BlockSpec((bx, yc, bz), lambda i, j, k: (i, k, j),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    t_spec = pl.BlockSpec(memory_space=pl.ANY if interpret
                          else pltpu.SMEM)
    out_spec = pl.BlockSpec((bx, bz), lambda i, j, k: (i, j),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    t_arr = jnp.asarray(t, a.dtype).reshape(1)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((nxp, nzp), a.dtype),
            in_specs=[t_spec] + [cell_spec] * 2,
            out_specs=out_spec,
            interpret=interpret,
        )(t_arr, a, ts_signed)
    return out[:nx, :nz]


# --------------------------------------------------------------------------- #
# Block-sparse tile compaction for the epoch kernel
#
# The jet silhouette covers a few percent of the cube (0.6% of cells,
# ~6% of (8, y, 128) tiles for the bundled example jet at 512^3), and the
# epoch kernel is HBM-bandwidth-bound: reading only the tiles that contain
# jet cells cuts per-epoch traffic 15-60x.  The active-tile set depends
# only on the jet geometry (time-independent), so compaction happens once
# per model alongside the other _rt_static precomputations; per epoch the
# kernel streams the compacted (n_act, bx, yc, bz) arrays and the collapsed
# (nx, nz) map is reassembled with one small segment-sum.
# --------------------------------------------------------------------------- #
def _tile_grid(n, b):
    return -(-n // b)


def _pad_to_tiles(cube, bx, yc, bz, fill):
    nx, ny, nz = cube.shape
    pads = ((0, (-nx) % bx), (0, (-ny) % yc), (0, (-nz) % bz))
    if any(p[1] for p in pads):
        cube = jnp.pad(cube, pads, constant_values=fill)
    return cube


@functools.partial(jax.jit, static_argnames=('block_x', 'block_z',
                                              'y_chunk'))
def _tile_activity(inside, block_x: int = 8, block_z: int = 128,
                   y_chunk: int = 64):
    """(nX, nY, nZ) bool: which (block_x, y_chunk, block_z) tiles contain
    any jet cell."""
    p = _pad_to_tiles(inside, block_x, y_chunk, block_z, False)
    nx, ny, nz = p.shape
    return p.reshape(nx // block_x, block_x, ny // y_chunk, y_chunk,
                     nz // block_z, block_z).any(axis=(1, 3, 5))


def active_tiles(inside, block_x: int = 8, block_z: int = 128,
                 y_chunk: int = 64):
    """Host-side one-off: flat ids of jet-occupied tiles plus their
    (x, z)-tile segment ids for the collapsed-map reassembly.

    Returns ``(ids, seg)`` int32 numpy arrays of shape (n_act,); empty
    when the grid holds no jet cells.
    """
    act = np.asarray(_tile_activity(inside, block_x, block_z, y_chunk))
    n_xt, n_yt, n_zt = act.shape
    ids = np.flatnonzero(act.reshape(-1)).astype(np.int32)
    i = ids // (n_yt * n_zt)
    k = ids % n_zt
    seg = (i * n_zt + k).astype(np.int32)
    return ids, seg


@functools.partial(jax.jit, static_argnames=('block_x', 'block_z',
                                              'y_chunk', 'fill'))
def gather_tiles(cube, ids, block_x: int = 8, block_z: int = 128,
                 y_chunk: int = 64, fill: float = 0.0):
    """(n_act, block_x, y_chunk, block_z) compacted copy of ``cube`` at the
    active tile ids (one full-cube shuffle, once per model)."""
    p = _pad_to_tiles(cube, block_x, y_chunk, block_z, fill)
    nx, ny, nz = p.shape
    t = p.reshape(nx // block_x, block_x, ny // y_chunk, y_chunk,
                  nz // block_z, block_z)
    t = t.transpose(0, 2, 4, 1, 3, 5).reshape(-1, block_x, y_chunk,
                                              block_z)
    return t[ids]


def _epoch_tiles_kernel(t_ref, a_ref, tss_ref, out_ref, *, bursts: tuple,
                        pack_offset: float):
    """One active tile per grid step: burst factor in-register (same maths
    as _epoch_base_kernel), partial LOS sum over the tile's y extent."""
    tss = tss_ref[0]
    lt = t_ref[0] - (jnp.abs(tss) - pack_offset)
    red = tss < 0.0
    chi = jnp.ones_like(lt)
    for t0, inv2s2, amp, is_red in bursts:
        g = amp * jnp.exp(-(lt - t0) ** 2 * inv2s2)
        sel = red if is_red else jnp.logical_not(red)
        chi = chi + jnp.where(sel, g, 0.0)
    out_ref[0] = jnp.sum(a_ref[0] * chi * chi, axis=1)


@functools.partial(jax.jit, static_argnames=('bursts', 'nx', 'nz',
                                             'interpret', 'pack_offset'))
def epoch_base_map_tiles(base_t, tss_t, seg, t, bursts: tuple, nx: int,
                         nz: int, interpret: bool = False,
                         pack_offset: float = 1.0):
    """LOS-collapsed sum_y base * chi(t - ts)^2 over COMPACTED tiles.

    Same product as :func:`epoch_base_map_pallas` but reading only the
    jet-occupied tiles (from :func:`gather_tiles`): per epoch the kernel
    streams ``2 * n_act * bx * yc * bz`` floats instead of two full cubes.
    Partial per-tile maps are reassembled into the (nx, nz) collapsed map
    with a segment-sum over the tiles' (x, z) positions.

    Args:
      base_t: (n_act, bx, yc, bz) compacted epoch-independent base
      tss_t:  (n_act, bx, yc, bz) compacted packed launch time/side
              (gather with fill=1.0)
      seg:    (n_act,) int32 x,z-tile segment id (from active_tiles)
      t:      scalar model time [s] (traced)
      bursts: static (t0, 1/(2 sigma^2), rel_amp, is_red) tuple
    """
    interpret = interpret or _FORCE_INTERPRET
    n_act, bx, yc, bz = base_t.shape
    kernel = functools.partial(_epoch_tiles_kernel, bursts=bursts,
                               pack_offset=pack_offset)
    tile_spec = pl.BlockSpec((1, bx, yc, bz), lambda i: (i, 0, 0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    t_spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.SMEM)
    out_spec = pl.BlockSpec((1, bx, bz), lambda i: (i, 0, 0),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    t_arr = jnp.asarray(t, base_t.dtype).reshape(1)
    with jax.enable_x64(False):
        parts = pl.pallas_call(
            kernel,
            grid=(n_act,),
            out_shape=jax.ShapeDtypeStruct((n_act, bx, bz), base_t.dtype),
            in_specs=[t_spec, tile_spec, tile_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(t_arr, base_t, tss_t)
    n_xt = _tile_grid(nx, bx)
    n_zt = _tile_grid(nz, bz)
    m = jax.ops.segment_sum(parts, seg, num_segments=n_xt * n_zt)
    m = m.reshape(n_xt, n_zt, bx, bz).transpose(0, 2, 1, 3)
    return m.reshape(n_xt * bx, n_zt * bz)[:nx, :nz]


def _epoch_tiles2_kernel(t_ref, a_ref, b_ref, tss_ref, oa_ref, ob_ref, *,
                         bursts: tuple, pack_offset: float):
    """Dual-base variant of _epoch_tiles_kernel: one tss stream and one
    chi evaluation serve BOTH collapsed maps (opacity base + EM base)."""
    tss = tss_ref[0]
    lt = t_ref[0] - (jnp.abs(tss) - pack_offset)
    red = tss < 0.0
    chi = jnp.ones_like(lt)
    for t0, inv2s2, amp, is_red in bursts:
        g = amp * jnp.exp(-(lt - t0) ** 2 * inv2s2)
        sel = red if is_red else jnp.logical_not(red)
        chi = chi + jnp.where(sel, g, 0.0)
    chi2 = chi * chi
    oa_ref[0] = jnp.sum(a_ref[0] * chi2, axis=1)
    ob_ref[0] = jnp.sum(b_ref[0] * chi2, axis=1)


@functools.partial(jax.jit, static_argnames=('bursts', 'nx', 'nz',
                                             'interpret', 'pack_offset'))
def epoch_base_maps2_tiles(a_t, b_t, tss_t, seg, t, bursts: tuple, nx: int,
                           nz: int, interpret: bool = False,
                           pack_offset: float = 1.0):
    """Both LOS-collapsed epoch maps (sum_y a*chi^2, sum_y b*chi^2) in ONE
    compacted streaming pass.

    The pipeline needs the EM map AND the opacity base map for every run
    (classes.py:2397-2423: emission_measure + optical_depth_ff + flux_ff);
    computed separately each pass re-reads the packed launch-time tiles
    and re-evaluates the burst factor.  Fusing them reads 3 tile streams
    instead of 4 and pays the per-burst exp once: measured 0.41 ms vs
    0.46 ms for the whole per-run stage as one program on v5e at 512^3
    (bench.py ``run_rt_stage``), and on remote backends the single
    dispatch additionally saves two ~30 ms host round trips per run
    (BASELINE.md roofline table).

    Returns ``(map_a, map_b)``, each (nx, nz).
    """
    interpret = interpret or _FORCE_INTERPRET
    n_act, bx, yc, bz = a_t.shape
    kernel = functools.partial(_epoch_tiles2_kernel, bursts=bursts,
                               pack_offset=pack_offset)
    tile_spec = pl.BlockSpec((1, bx, yc, bz), lambda i: (i, 0, 0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    t_spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.SMEM)
    out_spec = pl.BlockSpec((1, bx, bz), lambda i: (i, 0, 0),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    t_arr = jnp.asarray(t, a_t.dtype).reshape(1)
    out_sh = jax.ShapeDtypeStruct((n_act, bx, bz), a_t.dtype)
    with jax.enable_x64(False):
        parts_a, parts_b = pl.pallas_call(
            kernel,
            grid=(n_act,),
            out_shape=(out_sh, out_sh),
            in_specs=[t_spec, tile_spec, tile_spec, tile_spec],
            out_specs=(out_spec, out_spec),
            interpret=interpret,
        )(t_arr, a_t, b_t, tss_t)
    n_xt = _tile_grid(nx, bx)
    n_zt = _tile_grid(nz, bz)

    def reassemble(parts):
        m = jax.ops.segment_sum(parts, seg, num_segments=n_xt * n_zt)
        m = m.reshape(n_xt, n_zt, bx, bz).transpose(0, 2, 1, 3)
        return m.reshape(n_xt * bx, n_zt * bz)[:nx, :nz]

    return reassemble(parts_a), reassemble(parts_b)


def _expm1_pos(x):
    """Numerically stable exp(x) - 1 for x >= 0 inside Mosaic kernels
    (no expm1 lowering): Taylor below 0.05 (see _one_minus_exp_neg for
    why the wide switch point — exp(x) - 1 loses eps/x digits)."""
    small = x < 0.05
    x_safe = jnp.where(small, 0.0, x)
    taylor = x * (1.0 + x * (0.5 + x * ((1.0 / 6.0) + x *
                                        ((1.0 / 24.0) +
                                         x * (1.0 / 120.0)))))
    return jnp.where(small, taylor, jnp.exp(x_safe) - 1.0)


def _excl_prefix_matrix(yc: int, dtype):
    """Strictly-lower-triangular ones: the exclusive prefix sum along y
    becomes ONE (yc, yc) @ (yc, bz) MXU matmul per (channel, x-row)
    instead of a yc-step serial fori_loop that starves the VPU."""
    row = lax.broadcasted_iota(jnp.int32, (yc, yc), 0)
    col = lax.broadcasted_iota(jnp.int32, (yc, yc), 1)
    return (row > col).astype(dtype)


def _prefix_dot(l_excl, d_row, dt):
    """The tau prefix matmul MUST run at Precision.HIGHEST: Mosaic's
    default f32 MXU dot is a single-bf16-pass product (~8 mantissa bits
    on the dtau operand), which was the whole 4.5e-4 relative error of
    the r3 emergent kernels (measured on-chip: default 7.7e-4, HIGHEST
    6.2e-8 on a (64,64)x(64,128) prefix).  The extra passes are
    pipelined against the much larger VPU exp/select work — no measured
    slowdown (BENCH r4)."""
    return jnp.dot(l_excl, d_row, preferred_element_type=dt,
                   precision=lax.Precision.HIGHEST)


def _emergent_kernel(cnu_ref, hnuk_ref, tscale_ref, temp_ref, dtau_ref,
                     i_ref, tau_ref, tau_acc, *, n_chan: int, yc: int):
    """Grid = (x tiles, z tiles, y chunks), y fastest.  The per-channel
    output block (n_chan, bx, bz) and the tau_acc scratch carry the ordered
    scan state across y chunks; the (bx, yc, bz) temperature and
    frequency-independent opacity slabs stream through VMEM once for the
    WHOLE channel axis.  The blackbody source function is evaluated
    in-register per (cell, channel) from the SMEM per-channel constants
    cnu = 2 h nu^3 / c^2 [cgs] and hnuk = h nu / k_B, so no
    (n_chan, nx, ny, nz) source or opacity cube ever exists in HBM.

    The ordered attenuation inside each y chunk is computed from the
    exclusive prefix sum of dtau along y — an MXU matmul with a
    strictly-lower-triangular matrix (whole chunk in flight) rather than a
    serial per-row loop."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        i_ref[...] = jnp.zeros_like(i_ref)
        tau_ref[...] = jnp.zeros_like(tau_ref)
        tau_acc[...] = jnp.zeros_like(tau_acc)

    dt = temp_ref.dtype
    bx = temp_ref.shape[0]
    l_excl = _excl_prefix_matrix(yc, dt)

    def channel(c, _):
        scale = tscale_ref[c]
        cnu = cnu_ref[c]
        hnuk = hnuk_ref[c]
        d_all = dtau_ref[...] * scale
        emit = (cnu / _expm1_pos(hnuk / temp_ref[...])) * \
            _one_minus_exp_neg(d_all)
        ta = tau_acc[c]                       # (bx, bz) carry
        for i in range(bx):                   # static unroll: LOS rows
            p = _prefix_dot(l_excl, d_all[i], dt)      # (yc, bz)
            w = jnp.exp(-(p + ta[i][None, :]))
            i_ref[c, i, :] += jnp.sum(emit[i] * w, axis=0)
            new_ta = ta[i] + jnp.sum(d_all[i], axis=0)
            tau_acc[c, i, :] = new_ta
            tau_ref[c, i, :] = new_ta
        return 0

    # skip the whole scan for y-chunks with no opacity: contribution and
    # attenuation are both exactly 0 there (outputs/carry already hold
    # the running state from previous chunks)
    @pl.when(jnp.max(dtau_ref[...]) > 0.0)
    def _compute():
        lax.fori_loop(jnp.int32(0), jnp.int32(n_chan), channel, 0)


@functools.partial(jax.jit,
                   static_argnames=('observer_near_y0', 'block_x',
                                    'block_z', 'y_chunk', 'interpret'))
def emergent_ff_pallas(cnu, hnuk, tau_scale, temp, dtau_base,
                       observer_near_y0: bool = False,
                       block_x: int = 8, block_z: int = 128,
                       y_chunk: int = 128, interpret: bool = False):
    """Multi-channel emergent free-free intensity + total optical depth.

    Exploits the continuum factorisation dtau(nu) = tau_scale[nu] *
    dtau_base[cell] (ops.radtrans.tau_ff_cube) so the whole channel axis is
    produced in ONE kernel pass over the grid — O(N^3) HBM traffic instead
    of the O(n_chan N^3) cube the per-channel formulation
    (models/jetmodel.py emergent_intensity_ff) would materialise.

    Args:
      cnu:       (n_chan,) blackbody prefactor 2 h nu^3 / c^2 [cgs]
      hnuk:      (n_chan,) h nu / k_B [K]
      tau_scale: (n_chan,) per-channel opacity multiplier
      temp:      (nx, ny, nz) temperature, safe (>0) outside the jet
      dtau_base: (nx, ny, nz) frequency-independent opacity, 0 outside

    Returns (intensity, tau_total): (n_chan, nx, nz) cgs intensity and
    optical-depth maps.
    """
    interpret = interpret or _FORCE_INTERPRET
    n_chan = int(cnu.shape[0])
    nx, ny, nz = temp.shape
    if not observer_near_y0:
        temp = jnp.flip(temp, axis=1)
        dtau_base = jnp.flip(dtau_base, axis=1)
    bx = min(block_x, nx)
    bz = min(block_z, nz)
    yc = min(y_chunk, ny)
    pad_x = (-nx) % bx
    pad_z = (-nz) % bz
    pad_y = (-ny) % yc
    if pad_x or pad_z or pad_y:
        pads = ((0, pad_x), (0, pad_y), (0, pad_z))
        temp = jnp.pad(temp, pads, constant_values=1.0)
        dtau_base = jnp.pad(dtau_base, pads)  # zero dtau: no contribution
    nxp, nyp, nzp = temp.shape

    kernel = functools.partial(_emergent_kernel, n_chan=n_chan, yc=yc)
    grid = (nxp // bx, nzp // bz, nyp // yc)
    cell_spec = pl.BlockSpec((bx, yc, bz), lambda i, j, k: (i, k, j),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    chan_spec = pl.BlockSpec(memory_space=pl.ANY if interpret
                             else pltpu.SMEM)
    out_spec = pl.BlockSpec((n_chan, bx, bz), lambda i, j, k: (0, i, j),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_chan, nxp, nzp), temp.dtype),
                 jax.ShapeDtypeStruct((n_chan, nxp, nzp), temp.dtype)]
    with jax.enable_x64(False):
        inten, tau = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=out_shape,
            in_specs=[chan_spec] * 3 + [cell_spec] * 2,
            out_specs=[out_spec, out_spec],
            scratch_shapes=[pltpu.VMEM((n_chan, bx, bz), temp.dtype)],
            interpret=interpret,
        )(cnu, hnuk, tau_scale, temp, dtau_base)
    return inten[:, :nx, :nz], tau[:, :nx, :nz]


# --------------------------------------------------------------------------- #
# Compacted ordered emergent scan
#
# The full-grid emergent kernel pays the whole-cube HBM stream, the flip
# copies, and a ~14 us/step grid floor over 1024 mostly-empty tiles.  This
# variant runs ONLY over jet-occupied tiles, sorted by (x,z) segment and
# then by LOS order, carrying the (tau_acc, intensity) scan state across a
# segment's y tiles in VMEM; skipped y ranges have zero opacity so they
# neither emit nor attenuate and the ordered product over present tiles is
# exact.  The epoch burst factor is evaluated in-register (like the epoch
# kernel), so there is no per-epoch full-cube XLA pre-pass at all.
# --------------------------------------------------------------------------- #
def active_tiles_scan_order(inside_flipped, block_x: int = 8,
                            block_z: int = 128, y_chunk: int = 64):
    """Host-side one-off for the compacted ordered scan.

    ``inside_flipped`` must already be flipped along y into observer
    ordering (y=0 nearest the observer).  Tiles are sorted by (x-tile,
    z-tile) segment, then by y — the kernel's carry/reset logic requires
    a segment's tiles to be grid-consecutive and LOS-ordered.

    Returns ``(ids, seg_dense, it, kt)``: flat tile ids into the padded
    tile grid, dense [0, n_seg) segment index per tile, and each
    segment's (x, z) tile coordinates (for scattering the per-segment
    maps back onto the image plane).
    """
    act = np.asarray(_tile_activity(inside_flipped, block_x, block_z,
                                    y_chunk))
    n_xt, n_yt, n_zt = act.shape
    ids = np.flatnonzero(act.reshape(-1)).astype(np.int32)
    i = ids // (n_yt * n_zt)
    j = (ids // n_zt) % n_yt
    k = ids % n_zt
    order = np.lexsort((j, k, i))         # primary i, then k, then j
    ids, i, j, k = ids[order], i[order], j[order], k[order]
    seg_key = i * n_zt + k
    uniq, seg_dense = np.unique(seg_key, return_inverse=True)
    return (ids, seg_dense.astype(np.int32),
            (uniq // n_zt).astype(np.int32), (uniq % n_zt).astype(np.int32))


def _emergent_tiles_kernel(seg_ref, cnu_ref, hnuk_ref, tscale_ref, t_ref,
                           temp_ref, a_ref, tss_ref, i_ref, tau_ref,
                           tau_acc, *, n_chan: int, yc: int,
                           bursts: tuple, pack_offset: float):
    i = pl.program_id(0)
    is_first = jnp.logical_or(
        i == 0, seg_ref[i] != seg_ref[jnp.maximum(i - 1, 0)])

    @pl.when(is_first)
    def _init():
        i_ref[...] = jnp.zeros_like(i_ref)
        tau_ref[...] = jnp.zeros_like(tau_ref)
        tau_acc[...] = jnp.zeros_like(tau_acc)

    dt = temp_ref.dtype
    bx = temp_ref.shape[1]
    l_excl = _excl_prefix_matrix(yc, dt)

    tss = tss_ref[0]
    lt = t_ref[0] - (jnp.abs(tss) - pack_offset)
    red = tss < 0.0
    chi = jnp.ones_like(lt)
    for t0, inv2s2, amp, is_red in bursts:
        g = amp * jnp.exp(-(lt - t0) ** 2 * inv2s2)
        sel = red if is_red else jnp.logical_not(red)
        chi = chi + jnp.where(sel, g, 0.0)
    d_base = a_ref[0] * chi * chi
    temp = temp_ref[0]

    def channel(c, _):
        d = d_base * tscale_ref[c]
        emit = (cnu_ref[c] / _expm1_pos(hnuk_ref[c] / temp)) * \
            _one_minus_exp_neg(d)
        ta = tau_acc[c]
        for ix in range(bx):
            p = _prefix_dot(l_excl, d[ix], dt)
            w = jnp.exp(-(p + ta[ix][None, :]))
            i_ref[0, c, ix, :] += jnp.sum(emit[ix] * w, axis=0)
            new_ta = ta[ix] + jnp.sum(d[ix], axis=0)
            tau_acc[c, ix, :] = new_ta
            tau_ref[0, c, ix, :] = new_ta
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_chan), channel, 0)


@functools.partial(jax.jit, static_argnames=('bursts', 'n_seg',
                                             'interpret', 'pack_offset'))
def emergent_ff_tiles(cnu, hnuk, tau_scale, temp_t, a_t, tss_t, seg, t,
                      bursts: tuple, n_seg: int, interpret: bool = False,
                      pack_offset: float = 1.0):
    """Per-segment emergent intensity / total-optical-depth partial maps
    (n_seg, n_chan, bx, bz) from compacted observer-ordered tiles.

    Tiles MUST come from :func:`active_tiles_scan_order` (same-segment
    tiles consecutive, LOS-ordered); reassemble full maps with
    :func:`scatter_tile_maps`.  The epoch burst factor is evaluated
    in-register from the static ``bursts`` tuple, with ``t`` traced.
    """
    interpret = interpret or _FORCE_INTERPRET
    n_chan = int(cnu.shape[0])
    n_act, bx, yc, bz = temp_t.shape
    kernel = functools.partial(_emergent_tiles_kernel, n_chan=n_chan,
                               yc=yc, bursts=bursts,
                               pack_offset=pack_offset)
    tile_spec = pl.BlockSpec((1, bx, yc, bz), lambda i, seg_ref: (i, 0, 0,
                                                                  0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    sm_spec = pl.BlockSpec(memory_space=pl.ANY if interpret
                           else pltpu.SMEM)
    out_spec = pl.BlockSpec((1, n_chan, bx, bz),
                            lambda i, seg_ref: (seg_ref[i], 0, 0, 0),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_seg, n_chan, bx, bz),
                                      temp_t.dtype)] * 2
    t_arr = jnp.asarray(t, temp_t.dtype).reshape(1)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_act,),
            in_specs=[sm_spec] * 4 + [tile_spec] * 3,
            out_specs=[out_spec, out_spec],
            scratch_shapes=[pltpu.VMEM((n_chan, bx, bz), temp_t.dtype)],
        )
        inten, tau = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(seg, cnu, hnuk, tau_scale, t_arr, temp_t, a_t, tss_t)
    return inten, tau


@functools.partial(jax.jit, static_argnames=('n_xt', 'n_zt', 'nx', 'nz'))
def scatter_tile_maps(parts, it, kt, n_xt: int, n_zt: int, nx: int,
                      nz: int):
    """(n_seg, n_chan, bx, bz) per-segment maps -> (n_chan, nx, nz), zero
    where no segment exists (no jet along that line of sight)."""
    n_seg, n_chan, bx, bz = parts.shape
    grid = jnp.zeros((n_chan, n_xt, n_zt, bx, bz), parts.dtype)
    grid = grid.at[:, it, kt].set(parts.transpose(1, 0, 2, 3))
    m = grid.transpose(0, 1, 3, 2, 4).reshape(n_chan, n_xt * bx,
                                              n_zt * bz)
    return m[:, :nx, :nz]


# --------------------------------------------------------------------------- #
# Fused RRL opacity cube
# --------------------------------------------------------------------------- #
def _voigt_re_far(x, y):
    """Re[w(x + iy)] by the 3-term asymptotic series
    w(z) ~ i/(sqrt(pi) z) sum_k (2k-1)!!/(2 z^2)^k — 4.4e-7 max abs err
    over |x|+y > 8 (vs the f32 floor ~3e-8), ONE division instead of the
    Laplace continued fraction's ten (VPU divisions are the expensive op
    here).  Inputs must already satisfy |x|+y > 8."""
    inv = 1.0 / (x * x + y * y)
    wr2 = 0.5 * (x * x - y * y) * inv * inv   # Re 1/(2 z^2)
    wi2 = -x * y * inv * inv                  # Im 1/(2 z^2)
    sr = wr2 * 15.0 + 3.0
    si = wi2 * 15.0
    sr, si = sr * wr2 - si * wi2 + 1.0, sr * wi2 + si * wr2
    sr, si = sr * wr2 - si * wi2 + 1.0, sr * wi2 + si * wr2
    return (y * sr - x * si) * inv / _SQRT_PI


def _voigt_re_weideman(x, y, *, n_weid: int, ell: float, coeffs: tuple):
    """Re[w(x + iy)] by the Weideman rational alone (valid to 1.2e-7 abs
    for |x| + y <= 8; callers select the asymptotic form beyond).

    The real-coefficient polynomial p(Z) at the complex Z = (L+iz)/(L-iz)
    is evaluated by the GOERTZEL second-order recurrence
    (b_k = c_k + 2 Re(Z) b_{k+1} - |Z|^2 b_{k+2};
    p = b_0 - b_1 conj(Z)) — 2 real FMAs per step instead of the complex
    Horner's 4 mul + 3 add, at identical f32 accuracy (6.3e-7 vs 6.1e-7
    max abs over the domain, both at the N=16 truncation floor).  One
    reciprocal serves every quotient (VPU divisions are the expensive
    op)."""
    dr = ell + y
    di = -x
    nr = ell - y
    ni = x
    inv_den = 1.0 / (dr * dr + di * di)
    zr = (nr * dr + ni * di) * inv_den
    zi = (ni * dr - nr * di) * inv_den
    r = 2.0 * zr
    s = zr * zr + zi * zi
    b1 = jnp.zeros_like(zr)
    b2 = jnp.zeros_like(zr)
    # highest power first — which is exactly the descending coeffs order
    for kk in range(n_weid):
        b1, b2 = coeffs[kk] + r * b1 - s * b2, b1
    pr = b1 - b2 * zr
    pi = b2 * zi
    inv_r = dr * inv_den
    inv_i = -di * inv_den
    inv2_r = inv_r * inv_r - inv_i * inv_i
    inv2_i = 2.0 * inv_r * inv_i
    return 2.0 * (pr * inv2_r - pi * inv2_i) + inv_r / _SQRT_PI


def _voigt_re_mixed(x, y, *, n_weid: int, ell: float, coeffs: tuple):
    """Re[w(x + iy)]: Weideman rational (centre) / asymptotic series
    (wings), per-lane select."""
    w_re = _voigt_re_weideman(x, y, n_weid=n_weid, ell=ell, coeffs=coeffs)
    far = (jnp.abs(x) + y) > 8.0
    xf = jnp.where(far, x, 10.0)   # clamp near lanes out of the
    yf = jnp.where(far, y, 10.0)   # asymptotic's singular region
    return jnp.where(far, _voigt_re_far(xf, yf), w_re)


# Frequencies arrive at these kernels as offsets from the line centre
# nu0 so f32 keeps ~10 Hz resolution (absolute ~1.5e10 Hz quantises at
# ~2 kHz).


def _rrl_kernel(freqs_ref, amp_ref, rest_ref, scale_ref, yv_ref, hkt_ref,
                out_ref, *, n_chan: int, n_weid: int, ell: float,
                coeffs: tuple, nu0: float):
    """Grid = (x tiles, z tiles, y chunks); the output block (all channels
    for this (x, z) tile) stays VMEM-resident across the y chunks, which
    iterate fastest, while (bx, y_chunk, bz) input slabs stream through —
    every HBM element is read exactly once for the whole channel axis."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    amp = amp_ref[...]
    rest = rest_ref[...]
    scale = scale_ref[...]
    yv = yv_ref[...]
    hkt = hkt_ref[...]

    def channel(c, _):
        fo = freqs_ref[c]
        x = (fo - rest) * scale
        stim = _one_minus_exp_neg((fo + nu0) * hkt)

        # channels far from every cell's line centre in this block take
        # the 3-term wing series alone — most (block, channel) pairs in a
        # wide cube are all-far, and the skipped Weideman Horner is ~3x
        # the remaining per-channel arithmetic.  Line-centred cubes are
        # the opposite extreme (|x| <= ~2 across the whole band, r4
        # coverage measurement: 0% all-far even at a threshold of 4):
        # their blocks are mostly all-NEAR, where the mixed evaluator's
        # far series + clamps + second reciprocal are dead weight.
        s = jnp.abs(x) + yv
        all_far = jnp.min(s) > 8.0
        any_far = jnp.max(s) > 8.0

        @pl.when(all_far)
        def _wings():
            out_ref[c, :, :] += jnp.sum(
                amp * _voigt_re_far(x, yv) * stim, axis=1)

        @pl.when(jnp.logical_not(any_far))
        def _core():
            re = _voigt_re_weideman(x, yv, n_weid=n_weid, ell=ell,
                                    coeffs=coeffs)
            out_ref[c, :, :] += jnp.sum(amp * re * stim, axis=1)

        @pl.when(jnp.logical_and(any_far, jnp.logical_not(all_far)))
        def _full():
            re = _voigt_re_mixed(x, yv, n_weid=n_weid, ell=ell,
                                 coeffs=coeffs)
            out_ref[c, :, :] += jnp.sum(amp * re * stim, axis=1)
        return 0

    # the jet silhouette covers a small fraction of the cube: skip the
    # whole (compute-bound) Voigt channel loop for blocks with no jet
    # cells — amp is exactly 0 outside, so skipped blocks contribute 0
    @pl.when(jnp.max(amp) > 0.0)
    def _compute():
        lax.fori_loop(jnp.int32(0), jnp.int32(n_chan), channel, 0)


def _rrl_tiles_kernel(freqs_ref, amp_ref, rest_ref, scale_ref, yv_ref,
                      hkt_ref, out_ref, *, n_chan: int, n_weid: int,
                      ell: float, coeffs: tuple, nu0: float):
    """One jet-occupied tile per grid step (from gather_tiles): every tile
    is active by construction, so there is no skip branch and no empty-
    block HBM traffic at all.  Writes this tile's (n_chan, bx, bz) partial
    LOS sums; reassemble with a segment-sum over x,z-tile ids."""
    amp = amp_ref[0]
    rest = rest_ref[0]
    scale = scale_ref[0]
    yv = yv_ref[0]
    hkt = hkt_ref[0]

    def channel(c, _):
        fo = freqs_ref[c]
        x = (fo - rest) * scale
        stim = _one_minus_exp_neg((fo + nu0) * hkt)
        # block-level wing/core/mixed three-way — see _rrl_kernel
        s = jnp.abs(x) + yv
        all_far = jnp.min(s) > 8.0
        any_far = jnp.max(s) > 8.0

        @pl.when(all_far)
        def _wings():
            out_ref[0, c, :, :] = jnp.sum(
                amp * _voigt_re_far(x, yv) * stim, axis=1)

        @pl.when(jnp.logical_not(any_far))
        def _core():
            re = _voigt_re_weideman(x, yv, n_weid=n_weid, ell=ell,
                                    coeffs=coeffs)
            out_ref[0, c, :, :] = jnp.sum(amp * re * stim, axis=1)

        @pl.when(jnp.logical_and(any_far, jnp.logical_not(all_far)))
        def _full():
            re = _voigt_re_mixed(x, yv, n_weid=n_weid, ell=ell,
                                 coeffs=coeffs)
            out_ref[0, c, :, :] = jnp.sum(amp * re * stim, axis=1)
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n_chan), channel, 0)


@functools.partial(jax.jit, static_argnames=('nu0', 'interpret'))
def rrl_tiles_pallas(freqs_off, amp_t, rest_t, scale_t, yv_t, hkt_t,
                     nu0: float = 0.0, interpret: bool = False):
    """Per-tile partial RRL optical-depth maps (n_act, n_chan, bx, bz)
    from COMPACTED per-cell precomputations (gather_tiles of the
    tau_rrl_precompute factors, f32, rest as offsets from nu0)."""
    interpret = interpret or _FORCE_INTERPRET
    n_chan = int(freqs_off.shape[0])
    n_act, bx, yc, bz = amp_t.shape
    # Weideman N=16: at f32 the N=16 truncation error (1.4e-7 max on
    # |x|<=8, 1e-5<=y<=8 vs scipy wofz) already sits at the f32 roundoff
    # floor — N=32 buys nothing but doubles the Horner loop
    ell, a_np = _weideman_coeffs(16)
    kernel = functools.partial(
        _rrl_tiles_kernel, n_chan=n_chan, n_weid=len(a_np),
        ell=float(ell), coeffs=tuple(float(v) for v in a_np),
        nu0=float(nu0))
    tile_spec = pl.BlockSpec((1, bx, yc, bz), lambda i: (i, 0, 0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    freq_spec = pl.BlockSpec(memory_space=pl.ANY if interpret
                             else pltpu.SMEM)
    out_spec = pl.BlockSpec((1, n_chan, bx, bz), lambda i: (i, 0, 0, 0),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(n_act,),
            out_shape=jax.ShapeDtypeStruct((n_act, n_chan, bx, bz),
                                           amp_t.dtype),
            in_specs=[freq_spec] + [tile_spec] * 5,
            out_specs=out_spec,
            interpret=interpret,
        )(freqs_off, amp_t, rest_t, scale_t, yv_t, hkt_t)


@functools.partial(jax.jit, static_argnames=('nx', 'nz'))
def segment_tile_maps(parts, seg, nx: int, nz: int):
    """(n_act, n_chan, bx, bz) per-tile partials -> (n_chan, nx, nz) via
    segment-sum over the tiles' (x, z) positions (seg from active_tiles)."""
    n_act, n_chan, bx, bz = parts.shape
    n_xt = _tile_grid(nx, bx)
    n_zt = _tile_grid(nz, bz)
    m = jax.ops.segment_sum(parts, seg, num_segments=n_xt * n_zt)
    m = m.reshape(n_xt, n_zt, n_chan, bx, bz).transpose(2, 0, 3, 1, 4)
    return m.reshape(n_chan, n_xt * bx, n_zt * bz)[:, :nx, :nz]


@functools.partial(jax.jit,
                   static_argnames=('nu0', 'block_x', 'block_z', 'y_chunk',
                                    'interpret'))
def rrl_cube_pallas(freqs, amp, rest, scale, y_voigt, hkT,
                    nu0: float = 0.0,
                    block_x: int = 8, block_z: int = 128,
                    y_chunk: int = 128, interpret: bool = False):
    """Collapsed RRL optical-depth maps (n_chan, nx, nz) from per-cell,
    channel-independent precomputations:

        amp    = kappa_L prefactor x ds  (everything but the profile and
                 stimulated-emission factor; see ops.radtrans.tau_rrl_maps)
        rest   = Doppler shift of the line centre per cell, as an OFFSET
                 from nu0 [Hz] (f32 precision)
        scale  = 1/(sigma_G sqrt(2)) per cell [1/Hz], with the
                 1/(sigma_G sqrt(2 pi)) profile normalisation folded into
                 ``amp`` by the caller
        y_voigt= (fwhm_L/2) * scale per cell
        hkT    = h/(k_B T) per cell [1/Hz]

    The XLA channel map re-reads every per-cell array from HBM once per
    channel (O(n_chan N^3) traffic); this kernel holds them in VMEM for the
    whole channel loop (O(N^3) traffic) — the RRL analogue of the
    continuum factorisation.  f32 only (Weideman degree N=16 — the f32
    truncation floor; see the comment at the coefficient setup below).
    """
    interpret = interpret or _FORCE_INTERPRET
    n_chan = int(freqs.shape[0])
    nx, ny, nz = amp.shape
    bx = min(block_x, nx)
    bz = min(block_z, nz)
    yc = min(y_chunk, ny)
    pad_x = (-nx) % bx
    pad_z = (-nz) % bz
    pad_y = (-ny) % yc
    if pad_x or pad_z or pad_y:
        pads = ((0, pad_x), (0, pad_y), (0, pad_z))
        # zero-padded amp kills padded-cell contributions; the other
        # fields pad with safe non-zero values
        amp = jnp.pad(amp, pads)
        rest = jnp.pad(rest, pads)
        scale = jnp.pad(scale, pads, constant_values=1.0)
        y_voigt = jnp.pad(y_voigt, pads, constant_values=1.0)
        hkt = jnp.pad(hkT, pads, constant_values=1.0)
    else:
        hkt = hkT
    nxp, nyp, nzp = amp.shape

    # Weideman N=16: at f32 the N=16 truncation error (1.4e-7 max on
    # |x|<=8, 1e-5<=y<=8 vs scipy wofz) already sits at the f32 roundoff
    # floor — N=32 buys nothing but doubles the Horner loop
    ell, a_np = _weideman_coeffs(16)
    kernel = functools.partial(
        _rrl_kernel, n_chan=n_chan, n_weid=len(a_np), ell=float(ell),
        coeffs=tuple(float(v) for v in a_np), nu0=float(nu0))

    grid = (nxp // bx, nzp // bz, nyp // yc)
    cell_spec = pl.BlockSpec((bx, yc, bz), lambda i, j, k: (i, k, j),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    freq_spec = pl.BlockSpec(memory_space=pl.ANY if interpret
                             else pltpu.SMEM)
    out_spec = pl.BlockSpec((n_chan, bx, bz), lambda i, j, k: (0, i, j),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((n_chan, nxp, nzp), amp.dtype),
            in_specs=[freq_spec] + [cell_spec] * 5,
            out_specs=out_spec,
            interpret=interpret,
        )(freqs, amp, rest, scale, y_voigt, hkt)
    return out[:, :nx, :nz]


# registered for force_interpret cache invalidation (flag read at trace
# time is not part of these functions' jit cache keys)
_JITTED_WRAPPERS.extend([
    transfer_scan_pallas, epoch_base_map_pallas, epoch_base_map_tiles,
    emergent_ff_pallas, emergent_ff_tiles, rrl_cube_pallas,
    rrl_tiles_pallas,
])
