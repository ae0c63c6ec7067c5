"""The production fused/compacted model paths, driven end-to-end on CPU.

`ops.pallas_kernels.force_interpret(True)` runs every Pallas kernel in
the interpreter and flips JetModel._use_fused_rrl() on, so the model-level
tile plumbing — compaction caches, launch-time packing (including the
off-axis negative-travel-time offset), segment reassembly, the
epoch/RRL/emergent dispatch — is exercised in CI exactly as it runs on
the TPU.  Both real round-2 bugs (negative-ts packing corruption, and a
stale full-grid kernel signature) lived in this glue and were invisible
to kernel-only interpret tests.
"""
import copy

import numpy as np
import pytest
import jax.numpy as jnp

from rajepy_tpu import JetModel
from rajepy_tpu.ops import pallas_kernels as pk


@pytest.fixture()
def forced_interpret():
    pk.force_interpret(True)
    try:
        yield
    finally:
        pk.force_interpret(False)


def _model(params, inc=90.0, pa=0.0, n=(24, 48, 24), dtype=jnp.float32):
    p = copy.deepcopy(params)
    p['grid'].update(n_x=n[0], n_y=n[1], n_z=n[2], l_z=None)
    p['geometry'].update(inc=inc, pa=pa)
    return JetModel(p, dtype=dtype)


@pytest.mark.parametrize("inc,pa", [(90.0, 0.0), (55.0, 30.0)])
def test_fused_products_match_f64_oracle(forced_interpret, model_params,
                                         inc, pa):
    """flux_ff / emission_measure / optical_depth_rrl /
    emergent_intensity_ff through the compacted interpret path vs the
    float64 XLA oracle model — on-axis AND the off-axis geometry whose
    negative travel times broke the original launch-time packing."""
    jm32 = _model(model_params, inc, pa)
    jm64 = _model(model_params, inc, pa, dtype=jnp.float64)
    assert jm32._use_fused_rrl()
    t = 2.2 * 31536000.0
    jm32.time = jm64.time = t

    st = jm32._rt_static()
    assert st.seg is not None, "compaction must be live under the hook"
    if (inc, pa) != (90.0, 0.0):
        assert jm32._ts_pack_offset > 1.0  # negative ts present

    freqs = np.array([6e9, 2.2e10])
    for name, got, want, tol in [
        ('flux_ff', jm32.flux_ff(freqs), jm64.flux_ff(freqs), 2e-4),
        ('em', jm32.emission_measure(), jm64.emission_measure(), 2e-4),
    ]:
        got = np.nan_to_num(np.asarray(got, dtype=float))
        want = np.nan_to_num(np.asarray(want, dtype=float))
        assert want.max() > 0
        err = np.max(np.abs(got - want)) / want.max()
        assert err < tol, f"{name}: rel err {err:.2e} at inc={inc}"

    from rajepy_tpu.ops.radtrans import RRLCoeffs
    nu0 = RRLCoeffs('H58a').nu0
    rrl_f = np.linspace(nu0 * 0.99998, nu0 * 1.00002, 3)
    got = np.nan_to_num(np.asarray(jm32.optical_depth_rrl('H58a', rrl_f),
                                   dtype=float))
    want = np.nan_to_num(np.asarray(jm64.optical_depth_rrl('H58a', rrl_f),
                                    dtype=float))
    assert want.max() > 0
    err = np.max(np.abs(got - want)) / want.max()
    assert err < 3e-3, f"rrl tiles: rel err {err:.2e} at inc={inc}"

    got = np.asarray(jm32.emergent_intensity_ff(freqs), dtype=float)
    want = np.asarray(jm64.emergent_intensity_ff(freqs), dtype=float)
    assert want.max() > 0
    err = np.max(np.abs(got - want)) / want.max()
    assert err < 3e-3, f"emergent tiles: rel err {err:.2e} at inc={inc}"

    # flux_rrl exercises the remaining fused surfaces: the factorised
    # continuum tau (epoch tiles under the RRL intensity) + cached tbar
    got = np.nan_to_num(np.asarray(
        jm32.flux_rrl('H58a', rrl_f, contsub=False), dtype=float))
    want = np.nan_to_num(np.asarray(
        jm64.flux_rrl('H58a', rrl_f, contsub=False), dtype=float))
    assert want.max() > 0
    err = np.max(np.abs(got - want)) / want.max()
    assert err < 3e-3, f"flux_rrl fused: rel err {err:.2e} at inc={inc}"

    # non-LTE tiles path (b_n coefficients traced)
    got = np.nan_to_num(np.asarray(jm32.optical_depth_rrl(
        'H58a', rrl_f, lte=False, departure_coeffs=(0.96, 0.98)),
        dtype=float))
    want = np.nan_to_num(np.asarray(jm64.optical_depth_rrl(
        'H58a', rrl_f, lte=False, departure_coeffs=(0.96, 0.98)),
        dtype=float))
    denom = np.abs(want).max()
    assert denom > 0
    err = np.max(np.abs(got - want)) / denom
    assert err < 3e-3, f"non-LTE tiles: rel err {err:.2e} at inc={inc}"


def test_fused_light_curve_batch_path(forced_interpret, model_params):
    """The lax.map-batched light curve (fused path) vs per-epoch f64."""
    from rajepy_tpu.models import analysis
    jm32 = _model(model_params)
    jm64 = _model(model_params, dtype=jnp.float64)
    times = [0.5, 1.2, 2.0]
    lc32 = analysis.light_curve(jm32, times, [6e9])
    lc64 = analysis.light_curve(jm64, times, [6e9])
    np.testing.assert_allclose(lc32, lc64, rtol=2e-4)
    assert np.ptp(lc64) > 0  # bursts actually vary the curve


@pytest.mark.parametrize("inc,pa", [(90.0, 0.0), (55.0, 30.0)])
def test_fused_continuum_rt_products(forced_interpret, model_params,
                                     inc, pa):
    """The one-pass per-run RT stage (dual-base epoch tiles kernel) vs
    the three separate product calls, through the compacted interpret
    path — on-axis and off-axis."""
    jm32 = _model(model_params, inc, pa)
    jm32.time = 2.2 * 31536000.0
    assert jm32._rt_static().seg is not None
    freqs = np.array([6e9, 2.2e10])
    em, taus, fluxes = jm32.continuum_rt_products(freqs)
    np.testing.assert_allclose(em, np.asarray(jm32.emission_measure()),
                               rtol=1e-6)
    np.testing.assert_allclose(taus,
                               np.asarray(jm32.optical_depth_ff(freqs)),
                               rtol=1e-6)
    np.testing.assert_allclose(fluxes, np.asarray(jm32.flux_ff(freqs)),
                               rtol=1e-6)


@pytest.mark.parametrize("inc,pa", [(90.0, 0.0), (55.0, 30.0)])
def test_fused_rrl_rt_products(forced_interpret, model_params, inc, pa):
    """The one-pass per-run RRL stage vs the separate product calls,
    through the compacted interpret path."""
    jm32 = _model(model_params, inc, pa)
    jm32.time = 2.2 * 31536000.0
    from rajepy_tpu.ops.radtrans import RRLCoeffs
    nu0 = RRLCoeffs('H58a').nu0
    freqs = np.linspace(nu0 * 0.99998, nu0 * 1.00002, 3)
    em, tau_l, fluxes = jm32.rrl_rt_products('H58a', freqs, contsub=False)
    np.testing.assert_allclose(em, np.asarray(jm32.emission_measure()),
                               rtol=1e-5)
    np.testing.assert_allclose(
        tau_l, np.asarray(jm32.optical_depth_rrl('H58a', freqs)),
        rtol=1e-5)
    np.testing.assert_allclose(
        fluxes, np.asarray(jm32.flux_rrl('H58a', freqs, contsub=False)),
        rtol=1e-4)


def test_interpret_toggle_does_not_reuse_stale_kernels(model_params):
    """Model-level jit caches are keyed by the interpret-hook state
    (ADVICE r2): a kernel traced under force_interpret(True) must not be
    reused after the hook is switched off."""
    jm = _model(model_params)
    pk.force_interpret(True)
    try:
        assert jm._use_fused_rrl()
        fl_on = np.asarray(jm.flux_ff(np.array([6e9])))
        key_on = set(jm._jit_cache)
    finally:
        pk.force_interpret(False)
    assert not jm._use_fused_rrl()
    fl_off = np.asarray(jm.flux_ff(np.array([6e9])))
    key_off = set(jm._jit_cache)
    # the off-state trace created NEW cache entries (different key space)
    assert key_off - key_on
    assert all(k[-1] is True for k in key_on)
    np.testing.assert_allclose(np.nan_to_num(fl_on),
                               np.nan_to_num(fl_off), rtol=2e-4,
                               atol=1e-30)
