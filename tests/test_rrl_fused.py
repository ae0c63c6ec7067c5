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
