"""Pallas LOS-scan kernel vs the XLA reference implementation (interpreter
mode on CPU; the same kernel is validated on real TPU hardware by
bench.py/driver runs)."""
import numpy as np
import pytest
import jax.numpy as jnp

from rajepy_tpu.ops import radtrans as rt
from rajepy_tpu.ops.pallas_kernels import transfer_scan_pallas


@pytest.mark.parametrize("shape", [(16, 24, 128), (8, 16, 130)])
@pytest.mark.parametrize("observer_near_y0", [False, True])
def test_matches_xla(shape, observer_near_y0):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random(shape), jnp.float32)
    dtau = jnp.asarray(0.2 * rng.random(shape), jnp.float32)
    i_p, t_p = transfer_scan_pallas(src, dtau,
                                    observer_near_y0=observer_near_y0,
                                    interpret=True)
    i_x = rt.transfer_scan(src, dtau, observer_near_y0=observer_near_y0)
    np.testing.assert_allclose(np.asarray(i_p), np.asarray(i_x), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_p),
                               np.asarray(jnp.sum(dtau, axis=1)),
                               rtol=2e-5)


def test_opaque_limit():
    # an opaque cell near the observer hides everything behind it
    shape = (8, 16, 128)
    src = jnp.ones(shape, jnp.float32)
    dtau = jnp.zeros(shape, jnp.float32)
    # observer at +y (default): cell at y = ny-1 is in front
    dtau = dtau.at[:, -1, :].set(50.0)
    i_p, _ = transfer_scan_pallas(src, dtau, interpret=True)
    np.testing.assert_allclose(np.asarray(i_p), 1.0, rtol=1e-6)


def test_transparent_is_zero():
    shape = (8, 16, 128)
    src = jnp.ones(shape, jnp.float32)
    dtau = jnp.zeros(shape, jnp.float32)
    i_p, t_p = transfer_scan_pallas(src, dtau, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_p), 0.0)
    np.testing.assert_array_equal(np.asarray(t_p), 0.0)
