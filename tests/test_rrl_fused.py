"""Fused Pallas RRL cube kernel vs the exact XLA channel map (interpreter
mode on CPU; hardware-validated on v5e at 8.9x the XLA path)."""
import numpy as np
import pytest
import jax.numpy as jnp

from rajepy_tpu.ops import radtrans as rt


def _fields(shape, seed=0):
    rng = np.random.default_rng(seed)
    inside = rng.random(shape) < 0.3
    temp = np.where(inside, 1e4 * (1 + 0.2 * rng.random(shape)), 1.0)
    n_es = np.where(inside, 1e7 * rng.random(shape), 0.0)
    vy = np.where(inside, 40 * rng.standard_normal(shape), 0.0)
    ds = np.where(inside, 7.5e12, 0.0)
    return (jnp.asarray(temp), jnp.asarray(n_es), jnp.asarray(vy),
            jnp.asarray(ds), jnp.asarray(inside))


@pytest.mark.parametrize("shape", [(8, 24, 128), (16, 128, 128)])
def test_fused_matches_xla(shape):
    temp, n_es, vy, ds, inside = _fields(shape)
    coeffs = rt.RRLCoeffs('H58a')
    freqs = np.linspace(coeffs.nu0 - 5e6, coeffs.nu0 + 5e6, 12)
    ref = np.asarray(rt.tau_rrl_maps(coeffs, jnp.asarray(freqs), temp,
                                     n_es, vy, ds, inside))
    got = np.asarray(rt.tau_rrl_maps_fused(coeffs, freqs, temp, n_es, vy,
                                           ds, inside, interpret=True))
    assert got.shape == ref.shape
    # f32 + Weideman N=32 + offset quantisation: ~1e-3 envelope
    denom = np.maximum(np.abs(ref), ref.max() * 1e-6)
    assert np.max(np.abs(got - ref) / denom) < 2e-3


@pytest.mark.parametrize("shape", [(8, 24, 128), (16, 48, 130)])
def test_tiles_matches_xla(shape):
    """The compacted-tile RRL path (precompute + Voigt on jet-occupied
    tiles only, segment-sum reassembly) vs the exact XLA channel map,
    including a padded grid and fully-empty tile rows."""
    from rajepy_tpu.ops.pallas_kernels import active_tiles, gather_tiles

    temp, n_es, vy, ds, inside = _fields(shape, seed=7)
    # empty x-slab: whole tiles inactive
    inside = np.array(inside)
    inside[: shape[0] // 2] = False
    sel = jnp.asarray(inside)
    temp = jnp.where(sel, temp, 1.0)
    n_es = jnp.where(sel, n_es, 0.0)
    vy = jnp.where(sel, vy, 0.0)
    ds = jnp.where(sel, ds, 0.0)

    coeffs = rt.RRLCoeffs('H58a')
    freqs = np.linspace(coeffs.nu0 - 5e6, coeffs.nu0 + 5e6, 6)
    ref = np.asarray(rt.tau_rrl_maps(coeffs, jnp.asarray(freqs), temp,
                                     n_es, vy, ds, sel))

    tile = dict(block_x=8, block_z=128, y_chunk=16)
    ids, seg = active_tiles(sel, **tile)
    assert 0 < ids.size
    ids_d = jnp.asarray(ids)
    f32 = jnp.float32
    got = np.asarray(rt.tau_rrl_maps_tiles(
        coeffs, freqs,
        gather_tiles(temp.astype(f32), ids_d, fill=1.0, **tile),
        gather_tiles(n_es.astype(f32), ids_d, **tile),
        gather_tiles(vy.astype(f32), ids_d, **tile),
        gather_tiles(ds.astype(f32), ids_d, **tile),
        gather_tiles(sel, ids_d, fill=False, **tile),
        jnp.asarray(seg), shape[0], shape[2], interpret=True))
    assert got.shape == ref.shape
    denom = np.maximum(np.abs(ref), ref.max() * 1e-6)
    assert np.max(np.abs(got - ref) / denom) < 2e-3


def test_fused_line_profile_shape():
    # tau spectrum at the brightest pixel is a line profile peaking at the
    # (Doppler-shifted) centre
    temp, n_es, vy, ds, inside = _fields((8, 16, 128), seed=3)
    vy = jnp.zeros_like(vy)  # no shift -> peak at nu0
    coeffs = rt.RRLCoeffs('H58a')
    freqs = np.linspace(coeffs.nu0 - 8e6, coeffs.nu0 + 8e6, 33)
    got = np.asarray(rt.tau_rrl_maps_fused(coeffs, freqs, temp, n_es, vy,
                                           ds, inside, interpret=True))
    ix = np.unravel_index(np.argmax(got[16]), got[16].shape)
    spectrum = got[:, ix[0], ix[1]]
    assert np.argmax(spectrum) == 16  # centre channel
    assert spectrum[0] < 0.5 * spectrum[16]  # wings fall off


def test_wing_fast_path_wide_band():
    """Channels far out in the line wings take the kernels' block-level
    all-far branch (pl.when skip of the Weideman Horner); channels at the
    centre take the mixed branch.  A wide band exercises both in one
    dispatch and must still match the exact XLA channel map — including
    tiles where every cell is far for some channels and near for others
    (the round-2 lesson: dense line-centred tests never take skip
    branches)."""
    from rajepy_tpu.ops.pallas_kernels import active_tiles, gather_tiles

    shape = (8, 24, 128)
    temp, n_es, vy, ds, inside = _fields(shape, seed=11)
    coeffs = rt.RRLCoeffs('H58a')
    # centre channel (mixed branch), near-wing, and channels 30-3,000
    # Doppler widths out (all-far branch everywhere)
    freqs = coeffs.nu0 + np.array([0.0, 1e6, 1e7, 1e8, 1e9])
    ref = np.asarray(rt.tau_rrl_maps(coeffs, jnp.asarray(freqs), temp,
                                     n_es, vy, ds, inside))
    got = np.asarray(rt.tau_rrl_maps_fused(coeffs, freqs, temp, n_es, vy,
                                           ds, inside, interpret=True))
    # the far channels are small but must not be zero (Lorentzian wings)
    assert np.max(ref[-1]) > 0 and np.max(got[-1]) > 0

    tile = dict(block_x=8, block_z=128, y_chunk=8)
    ids, seg = active_tiles(inside, **tile)
    f32 = jnp.float32
    ids_d = jnp.asarray(ids)
    got_t = np.asarray(rt.tau_rrl_maps_tiles(
        coeffs, freqs,
        gather_tiles(temp.astype(f32), ids_d, fill=1.0, **tile),
        gather_tiles(n_es.astype(f32), ids_d, **tile),
        gather_tiles(vy.astype(f32), ids_d, **tile),
        gather_tiles(ds.astype(f32), ids_d, **tile),
        gather_tiles(inside, ids_d, fill=False, **tile),
        jnp.asarray(seg), shape[0], shape[2], interpret=True))

    for g in (got, got_t):
        # per-channel relative envelope: wing channels are tiny in
        # absolute terms, so normalise per channel
        for c in range(len(freqs)):
            denom = np.maximum(np.abs(ref[c]), ref[c].max() * 1e-3)
            assert np.max(np.abs(g[c] - ref[c]) / denom) < 2e-3, c

    # the r4 three-way branch: verify this configuration actually
    # exercises ALL of all-far / all-near (pure Weideman) / mixed at the
    # tile granularity, so the equivalence above covers each branch
    from rajepy_tpu.ops import physics as mphys, rrls as mrrl
    rest = np.asarray(mphys.doppler_shift(jnp.asarray(coeffs.nu0), vy))
    fwhm_g = np.asarray(mrrl.deltanu_g(jnp.asarray(rest), temp,
                                       coeffs.element))
    fwhm_l = np.asarray(mrrl.deltanu_l(jnp.asarray(np.maximum(
        np.asarray(n_es), 1e-10)), coeffs.n, coeffs.dn))
    scale = 1.0 / (fwhm_g / 2 / np.sqrt(2 * np.log(2)) * np.sqrt(2))
    yv = np.where(np.asarray(inside), fwhm_l / 2 * scale, 1.0)
    rest_t = np.asarray(gather_tiles(
        jnp.asarray(rest - coeffs.nu0, f32), ids_d, **tile))
    scale_t = np.asarray(gather_tiles(jnp.asarray(scale, f32), ids_d,
                                      fill=1.0, **tile))
    yv_t = np.asarray(gather_tiles(jnp.asarray(yv, f32), ids_d,
                                   fill=1.0, **tile))
    branches = set()
    for fo in freqs - coeffs.nu0:
        s = np.abs((fo - rest_t) * scale_t) + yv_t
        smin = s.reshape(s.shape[0], -1).min(axis=1)
        smax = s.reshape(s.shape[0], -1).max(axis=1)
        branches |= {'far' for v in smin if v > 8}
        branches |= {'core' for v in smax if v <= 8}
        branches |= {'mixed' for lo, hi in zip(smin, smax)
                     if lo <= 8 < hi}
    assert {'far', 'mixed'} <= branches, branches


def test_all_near_core_branch():
    """The r4 pure-Weideman core branch: a low-density jet (tiny Stark
    y) observed at line-centre channels makes every (tile, channel) pair
    all-near (max |x|+y <= 8), so the fused path runs the branch that
    skips the far series entirely — and must still match the XLA map."""
    shape = (8, 24, 128)
    temp, n_es, vy, ds, inside = _fields(shape, seed=3)
    n_es = n_es * 1e-3          # Stark width down 1e3 -> y ~ 1e-4
    vy = vy * 0.3               # bound the Doppler tail: |x| <= ~4
    coeffs = rt.RRLCoeffs('H58a')
    freqs = coeffs.nu0 + np.array([-5e5, 0.0, 5e5])
    ref = np.asarray(rt.tau_rrl_maps(coeffs, jnp.asarray(freqs), temp,
                                     n_es, vy, ds, inside))
    got = np.asarray(rt.tau_rrl_maps_fused(coeffs, freqs, temp, n_es,
                                           vy, ds, inside,
                                           interpret=True))
    denom = np.maximum(np.abs(ref), np.max(np.abs(ref)) * 1e-3)
    assert np.max(np.abs(got - ref) / denom) < 2e-3
    # every block really is all-near for every channel here
    from rajepy_tpu.ops import physics as mphys, rrls as mrrl
    rest = np.asarray(mphys.doppler_shift(jnp.asarray(coeffs.nu0), vy))
    fwhm_g = np.asarray(mrrl.deltanu_g(jnp.asarray(rest), temp,
                                       coeffs.element))
    fwhm_l = np.asarray(mrrl.deltanu_l(jnp.asarray(np.maximum(
        np.asarray(n_es), 1e-10)), coeffs.n, coeffs.dn))
    scale = 1.0 / (fwhm_g / 2 / np.sqrt(2 * np.log(2)) * np.sqrt(2))
    yv = np.where(np.asarray(inside), fwhm_l / 2 * scale, 1.0)
    for fo in freqs - coeffs.nu0:
        s = np.abs((fo - (rest - coeffs.nu0)) * scale) + yv
        assert np.asarray(s[np.asarray(inside)]).max() <= 8.0
