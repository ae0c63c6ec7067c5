"""Unit tests for the special-function kernels: 2F1, Faddeeva/Voigt, gaunt
factors, and the geometry transforms, against scipy/reference oracles."""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.special import hyp2f1 as sp_hyp2f1, wofz as sp_wofz

from rajepy_tpu.ops.hyp2f1 import hyp2f1_a1_series, hyp2f1_pfaff_product
from rajepy_tpu.ops.voigt import wofz, voigt_profile
from rajepy_tpu.ops import geometry as geom
from rajepy_tpu.ops.gaunt import gff, load_vanhoof_table


class TestHyp2F1:
    @pytest.mark.parametrize("a,b", [(0.0, 9 / 7), (0.5, 9 / 7), (2.0, 0.3),
                                     (-1.3, 2.4), (1.5, 3.7), (-2.0, 1.5),
                                     (0.7, 0.9)])
    def test_vs_scipy(self, a, b):
        rng = np.random.default_rng(0)
        z = -np.abs(rng.lognormal(0, 4, 500))
        u = z / (z - 1)
        ours = np.asarray(hyp2f1_a1_series(a, b + 1.0, jnp.asarray(u)))
        ref = sp_hyp2f1(a, 1.0, b + 1.0, u)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)

    @pytest.mark.parametrize("a,b", [(0.5, 9 / 7), (-1.3, 2.4), (1.5, 3.7)])
    def test_pfaff_product(self, a, b):
        rng = np.random.default_rng(1)
        z = -np.abs(rng.lognormal(0, 3, 300))
        ours = np.asarray(hyp2f1_pfaff_product(a, b, jnp.asarray(z)))
        ref = (1 - z) ** a * sp_hyp2f1(a, b, b + 1.0, z)
        np.testing.assert_allclose(ours, ref, rtol=1e-10)

    def test_a_zero_is_one(self):
        u = jnp.linspace(0.0, 0.999, 50)
        np.testing.assert_array_equal(
            np.asarray(hyp2f1_a1_series(0.0, 2.0, u)), 1.0)


class TestFaddeeva:
    def test_wofz_vs_scipy(self):
        rng = np.random.default_rng(2)
        x = 10 ** rng.uniform(-3, 3, 5000) * rng.choice([-1, 1], 5000)
        y = 10 ** rng.uniform(-8, 3, 5000)
        re, im = wofz(jnp.asarray(x), jnp.asarray(y))
        ref = sp_wofz(x + 1j * y)
        # f64 composite (Weideman-128 + CF-15 + small-y Taylor): <=1e-9
        # relative everywhere, incl. the near-real-axis cancellation band
        np.testing.assert_allclose(np.asarray(re), ref.real, rtol=1e-9,
                                   atol=1e-300)
        np.testing.assert_allclose(np.asarray(im), ref.imag, rtol=1e-9,
                                   atol=1e-300)

    def test_wofz_accuracy_contract_dense(self):
        """Pin the <=1e-9 relative-accuracy contract on a dense grid that
        deliberately covers the historical failure modes: y = 0 exactly
        (Re w = exp(-x^2), exponentially below the rational form's
        roundoff floor), tiny y near the region boundary |x|+y ~ 8-9,
        and the deep continued-fraction wings."""
        xs = np.concatenate([np.linspace(0.0, 12.0, 241),
                             np.geomspace(12.0, 1e3, 60)])
        xs = np.concatenate([-xs[::-1], xs])
        ys = np.concatenate([[0.0], np.geomspace(1e-10, 1e3, 80)])
        X, Y = np.meshgrid(xs, ys)
        re, im = wofz(jnp.asarray(X), jnp.asarray(Y))
        ref = sp_wofz(X + 1j * Y)
        rel_re = np.abs(np.asarray(re) - ref.real) / np.maximum(
            np.abs(ref.real), 1e-300)
        rel_im = np.abs(np.asarray(im) - ref.imag) / np.maximum(
            np.abs(ref.imag), 1e-300)
        assert rel_re.max() <= 1e-9
        assert rel_im.max() <= 1e-9

    def test_voigt_profile_normalisation(self):
        # Area under the profile must be ~1 (it is a normalised pdf)
        fg, fl = 1e6, 3e5
        nu = np.linspace(-6e8, 6e8, 200001)
        phi = np.asarray(voigt_profile(jnp.asarray(nu), fg, fl))
        area = np.trapezoid(phi, nu)
        assert abs(area - 1.0) < 1e-3

    def test_voigt_matches_scipy_formulation(self):
        # reference rrls.py:350-354 formulation via scipy wofz
        rng = np.random.default_rng(3)
        dnu = rng.uniform(-5e7, 5e7, 500)
        fg, fl = 1e6, 3e4
        sigma = fg / 2 / np.sqrt(2 * np.log(2))
        ref = np.real(sp_wofz((dnu + 1j * fl / 2) / sigma / np.sqrt(2))) / \
            sigma / np.sqrt(2 * np.pi)
        ours = np.asarray(voigt_profile(jnp.asarray(dnu), fg, fl))
        np.testing.assert_allclose(ours, ref, rtol=1e-9)


class TestGaunt:
    def test_table_shape(self):
        x0, y0, step, tab = load_vanhoof_table()
        assert tab.shape == (146, 81)
        assert (x0, y0, step) == (-6.0, -16.0, 0.2)

    def test_node_exact(self):
        # interpolant reproduces table values at grid nodes
        from rajepy_tpu import constants as c
        x0, y0, step, tab = load_vanhoof_table()
        ry = c.M_E * c.E_CHARGE ** 4 / (8 * c.EPSILON_0 ** 2 * c.H ** 2)
        for iu, ig in [(70, 40), (100, 20), (30, 60)]:
            lg2 = x0 + ig * step
            lu = y0 + iu * step
            temp = ry / (c.K_B * 10 ** lg2)
            freq = 10 ** lu * c.K_B * temp / c.H
            assert abs(float(gff(freq, temp)) - tab[iu, ig]) < 1e-9

    def test_sane_radio_values(self):
        # g_ff ~ 4-7 for HII-region conditions at cm wavelengths
        val = float(gff(6e9, 1e4))
        assert 4.0 < val < 7.0

    def test_uncertainty_block(self):
        """The companion uncertainty table (reference physics.py:640-641
        parses it into ufloats): node-exact lookup, sane magnitudes, and
        the (value, sigma) pair API."""
        from rajepy_tpu.ops.gaunt import (gff_uncertainty,
                                          gff_with_uncertainty,
                                          load_vanhoof_uncertainties)
        from rajepy_tpu import constants as c
        unc = load_vanhoof_uncertainties()
        assert unc.shape == (146, 81)
        assert (unc > 0).all() and (unc < 0.1).all()
        x0, y0, step, tab = load_vanhoof_table()
        ry = c.M_E * c.E_CHARGE ** 4 / (8 * c.EPSILON_0 ** 2 * c.H ** 2)
        for iu, ig in [(70, 40), (30, 60)]:
            temp = ry / (c.K_B * 10 ** (x0 + ig * step))
            freq = 10 ** (y0 + iu * step) * c.K_B * temp / c.H
            assert float(gff_uncertainty(freq, temp)) == \
                pytest.approx(unc[iu, ig], abs=1e-12)
        v, s = gff_with_uncertainty(6e9, 1e4)
        assert 4.0 < float(v) < 7.0
        assert 0.0 < float(s) < 1e-2 * float(v)


class TestGeometry:
    def test_rotation_roundtrip(self):
        rng = np.random.default_rng(4)
        x, y, z = (jnp.asarray(rng.normal(size=100)) for _ in range(3))
        xr, yr, zr = geom.xyz_rotate(x, y, z, 33.0, -41.0, order='xy')
        xb, yb, zb = geom.xyz_rotate(xr, yr, zr, -33.0, 41.0, order='yx')
        np.testing.assert_allclose(np.asarray(xb), np.asarray(x), atol=1e-12)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(y), atol=1e-12)
        np.testing.assert_allclose(np.asarray(zb), np.asarray(z), atol=1e-12)

    def test_cylindrical_quadrants(self):
        x = jnp.asarray([1.0, -1.0, -1.0, 1.0])
        y = jnp.asarray([1.0, 1.0, -1.0, -1.0])
        z = jnp.zeros(4)
        rho_, phi_, _ = geom.cartesian_to_cylindrical(x, y, z)
        np.testing.assert_allclose(np.asarray(rho_), np.sqrt(2), rtol=1e-14)
        np.testing.assert_allclose(
            np.asarray(phi_),
            [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, -np.pi / 4],
            rtol=1e-12)

    def test_against_reference_geometry(self):
        from .reference_oracle import get_reference
        ref = get_reference()
        if ref is None:
            pytest.skip("reference tree unavailable")
        import RaJePy.maths.geometry as rgeom
        rng = np.random.default_rng(5)
        x, y, z = rng.normal(scale=20, size=(3, 1000))
        for inc, pa in [(90., 0.), (60., 30.), (35., -70.), (0., 0.)]:
            r1, w1, p1 = rgeom.xyz_to_rwp(x, y, z, inc, pa)
            r2, w2, p2 = geom.xyz_to_rwp(jnp.asarray(x), jnp.asarray(y),
                                         jnp.asarray(z), inc, pa)
            np.testing.assert_allclose(np.asarray(r2), r1, rtol=1e-12,
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(w2), w1, rtol=1e-12,
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(p2), p1, rtol=1e-12,
                                       atol=1e-12)

    def test_t_rw_against_reference(self):
        from .reference_oracle import get_reference
        ref = get_reference()
        if ref is None:
            pytest.skip("reference tree unavailable")
        import RaJePy.maths.geometry as rgeom
        params = {'geometry': {'w_0': 1.0, 'r_0': 1.0, 'mod_r_0': 3.5083,
                               'epsilon': 7 / 9},
                  'properties': {'v_0': 150.0},
                  'target': {'R_1': 0.25, 'R_2': 2.5},
                  'power_laws': {'q_v': -0.15, 'q^d_v': 0.3}}
        rng = np.random.default_rng(6)
        r = rng.uniform(1.0, 60.0, 200)
        # w must lie within the jet: w <= w_r(r)
        wmax = 1.0 * ((np.abs(r) + 3.5083 - 1.0) / 3.5083) ** (7 / 9)
        w = rng.uniform(0, 1, 200) * wmax
        w[:5] = 0.0  # exercise the on-axis special case
        ref_t = rgeom.t_rw(r, w, params)
        g = params['geometry']
        ours = np.asarray(geom.t_rw(
            jnp.asarray(r), jnp.asarray(w), w_0=g['w_0'], r_0=g['r_0'],
            v_0=150.0, mr0=g['mod_r_0'], eps=g['epsilon'], r_1=0.25,
            r_2=2.5, q_v=-0.15, q_vd=0.3))
        np.testing.assert_allclose(ours, ref_t, rtol=1e-10)
