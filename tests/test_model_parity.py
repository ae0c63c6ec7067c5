"""Behaviour-parity tests: rajepy_tpu.JetModel vs the reference RaJePy
JetModel run side by side on identical params (float64, CPU).

The reference's van Hoof gaunt lookup uses scipy.interpolate.interp2d,
removed in scipy >= 1.14 — the reference cannot execute that path in this
environment, so it is monkeypatched with this framework's gaunt kernel
(validated independently in test_ops_math.py::TestGaunt); everything else
in the tau/flux chain is then a genuine cross-implementation comparison.
"""
import copy

import numpy as np
import pytest

from rajepy_tpu import JetModel

from .reference_oracle import get_reference, reference_jetmodel


def _need_reference():
    ref = get_reference()
    if ref is None:
        pytest.skip("reference tree unavailable")
    # patch the removed-interp2d gaunt path with ours (scalar use only)
    from rajepy_tpu.ops.gaunt import gff as our_gff
    import RaJePy.classes as rclasses

    def gff_compat(freq, temp, z=1.0):
        return float(our_gff(freq, temp, z))

    rclasses.mphys.gff = gff_compat
    return ref


def small_grid(params, n=(20, 48, 20)):
    p = copy.deepcopy(params)
    p['grid'].update(n_x=n[0], n_y=n[1], n_z=n[2], l_z=None)
    return p


def _nan_allclose(a, b, rtol=1e-9, atol=0.0):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    assert a.shape == b.shape
    assert np.array_equal(np.isnan(a), np.isnan(b)), "NaN masks differ"
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], rtol=rtol, atol=atol)


@pytest.fixture
def pair(model_params):
    """(our model, reference model) on a small identical grid."""
    _need_reference()
    p = small_grid(model_params)
    ours = JetModel(copy.deepcopy(p))
    ref = reference_jetmodel(p)
    return ours, ref


class TestGridParity:
    def test_lz_to_grid_dims(self, model_params):
        ref = _need_reference()
        import RaJePy.maths.geometry as rgeom
        for lz, dist, opang, w0, r0, inc, pa in [
                (0.5, 100., 25., 1., 1., 90., 0.),
                (0.5, 140., 20., 2.5, 2.5, 90., 0.),
                (2.0, 120., 25., 1., 1., 90., 0.),
                (1.0, 120., 25., 1., 1., 60., 30.),
                (1.0, 120., 25., 1., 1., 35., -70.)]:
            p = copy.deepcopy(model_params)
            p['grid']['l_z'] = lz
            p['target']['dist'] = dist
            p['geometry'].update(opang=opang, w_0=w0, r_0=r0, inc=inc,
                                 pa=pa)
            p['geometry']['mod_r_0'] = float(rgeom.mod_r_0(
                opang, p['geometry']['epsilon'], w0))
            assert JetModel.lz_to_grid_dims(p) == \
                ref.classes.JetModel.lz_to_grid_dims(p)

    def test_grid_coords(self, pair):
        ours, ref = pair
        np.testing.assert_array_equal(ours.xx, ref.xx)
        np.testing.assert_array_equal(ours.yy, ref.yy)
        np.testing.assert_array_equal(ours.zz, ref.zz)

    def test_rwp_coords(self, pair):
        ours, ref = pair
        _nan_allclose(ours.rr, ref.rr, rtol=1e-12)
        _nan_allclose(ours.ww, ref.ww, rtol=1e-12)
        _nan_allclose(ours.pp, ref.pp, rtol=1e-12)


class TestFieldParity:
    def test_fill_factor_and_areas(self, pair):
        ours, ref = pair
        _nan_allclose(ours.fill_factor, ref.fill_factor)
        _nan_allclose(ours.areas, ref.areas)

    def test_derived_params(self, pair):
        ours, ref = pair
        for sec, key in [('geometry', 'mod_r_0'), ('power_laws', 'q_n'),
                         ('power_laws', 'q_tau'), ('properties', 'n_0')]:
            assert ours.params[sec][key] == pytest.approx(
                ref.params[sec][key], rel=1e-12)

    def test_number_density(self, pair):
        ours, ref = pair
        _nan_allclose(ours.number_density, ref.number_density, rtol=1e-9)

    def test_ion_fraction(self, pair):
        ours, ref = pair
        _nan_allclose(ours.ion_fraction, ref.ion_fraction, rtol=1e-9)

    def test_temperature_uniform(self, pair):
        # q_T = 0: the reference's au/cm slip is inert -> exact parity
        ours, ref = pair
        _nan_allclose(ours.temperature, ref.temperature, rtol=1e-9)

    def test_velocity(self, pair):
        ours, ref = pair
        for o, r in zip(ours.vel, ref.vel):
            _nan_allclose(o, r, rtol=1e-9, atol=1e-12)

    def test_velocity_midplane_matches_full_field(self, pair):
        # the device-sliced quiver maps equal the full vel property's
        # mid-LOS plane
        ours, _ = pair
        vx, vz = ours.velocity_midplane()
        mid = ours.ny // 2
        _nan_allclose(vx, ours.vel[0][:, mid, :], rtol=1e-12)
        _nan_allclose(vz, ours.vel[2][:, mid, :], rtol=1e-12)

    def test_travel_time_and_chi(self, model_params):
        _need_reference()
        p = small_grid(model_params, n=(12, 24, 12))
        ours = JetModel(copy.deepcopy(p))
        ref = reference_jetmodel(p)
        t = 0.6 * 31536000.0
        ours.time = t
        ref.time = t
        np.testing.assert_allclose(ours.ts, np.asarray(ref.ts, dtype=float),
                                   rtol=1e-8)
        np.testing.assert_allclose(
            np.nan_to_num(ours.chi_xyz, nan=1.0),
            np.nan_to_num(np.asarray(ref.chi_xyz, dtype=float), nan=1.0),
            rtol=1e-8)

    def test_asymmetric_jets(self, model_params):
        # red jet (r < 0) densities scaled by mlr_rj/mlr_bj = 0.5
        # (burst-free model so chi = 1 exactly everywhere)
        p = small_grid(model_params)
        p['ejection'] = {'t_0': np.array([]), 'hl': np.array([]),
                         'chi': np.array([]), 'which': np.array([])}
        ours = JetModel(p)
        nd = ours.number_density
        rr = ours.rr
        blue = np.nanmax(np.where(rr > 0, nd, np.nan))
        red = np.nanmax(np.where(rr < 0, nd, np.nan))
        assert red == pytest.approx(blue * 0.5, rel=1e-6)


class TestRTParity:
    def test_emission_measure(self, pair):
        ours, ref = pair
        em_o = ours.emission_measure()
        em_r = np.nan_to_num(ref.emission_measure(), nan=0.0)
        np.testing.assert_allclose(em_o, em_r, rtol=1e-9, atol=1e-20)

    def test_optical_depth_ff_vanhoof(self, pair):
        ours, ref = pair
        freqs = np.array([1.5e9, 6e9, 4.4e10])
        tau_o = ours.optical_depth_ff(freqs)
        tau_r = np.stack([
            np.nan_to_num(ref.optical_depth_ff(f), nan=0.0) for f in freqs])
        np.testing.assert_allclose(tau_o, tau_r, rtol=1e-9, atol=1e-20)

    def test_flux_ff(self, pair):
        ours, ref = pair
        freqs = np.array([6e9])
        fl_o = ours.flux_ff(freqs)[0]
        fl_r = np.nan_to_num(ref.flux_ff(6e9), nan=0.0)
        np.testing.assert_allclose(fl_o, fl_r, rtol=1e-9, atol=1e-25)
        assert np.nansum(fl_o) > 0

    def test_optical_depth_ff_reynolds_gaunt(self, model_params):
        # q_T != 0 -> Reynolds gaunt approximation branch.  The reference's
        # temperature field has the au/cm unit slip there, so compare the
        # opacity KERNEL on the reference's own temperature values instead:
        # feed tau with a uniform-T model but force the Reynolds branch.
        _need_reference()
        p = small_grid(model_params)
        ours = JetModel(copy.deepcopy(p))
        ref = reference_jetmodel(p)
        f, n_es, ds = ours._rt_inputs()
        from rajepy_tpu.ops import radtrans as rt
        tau_o = np.asarray(rt.tau_ff_maps(
            np.array([6e9]), f.temp, n_es, ds, f.inside,
            p['properties']['T_0'], reynolds_gaunt=True))[0]
        # reference formula with its own fields (q_T=0 so T is uniform)
        n_es_r = ref.number_density * ref.ion_fraction
        gff_r = 11.95 * ref.temperature ** 0.15 * 6e9 ** -0.1
        tau_cells = (0.018 * ref.temperature ** -1.5 * 6e9 ** -2. *
                     n_es_r ** 2. *
                     (ref.csize * 149597870700.0 * 1e2 *
                      (ref.fill_factor / ref.areas)) * gff_r)
        tau_r = np.nan_to_num(np.nansum(tau_cells, axis=1), nan=0.0)
        np.testing.assert_allclose(tau_o, tau_r, rtol=1e-9, atol=1e-20)

    def test_optical_depth_rrl(self, pair):
        ours, ref = pair
        nu0 = float(ref.classes.mrrl.rrl_nu_0('H', 58, 1)) if False else None
        import RaJePy.maths.rrls as rrrl
        freq = rrrl.rrl_nu_0('H', 58, 1)
        tau_o = ours.optical_depth_rrl('H58a', freq)
        tau_r = np.nan_to_num(ref.optical_depth_rrl('H58a', freq), nan=0.0)
        np.testing.assert_allclose(tau_o, tau_r, rtol=1e-6, atol=1e-18)

    def test_flux_rrl(self, pair):
        ours, ref = pair
        import RaJePy.maths.rrls as rrrl
        freq = rrrl.rrl_nu_0('H', 58, 1) * (1.0 - 30e3 / 299792458.0)
        fl_o = ours.flux_rrl('H58a', freq, contsub=True)
        # the reference's intensity_rrl scalar path (classes.py:1279-1282)
        fl_r = np.nan_to_num(ref.flux_rrl('H58a', freq, contsub=True),
                             nan=0.0)
        np.testing.assert_allclose(fl_o, fl_r, rtol=1e-6, atol=1e-30)


class TestDiscWindParity:
    """Non-trivial cross-section power laws (q^d_* != 0, q_v != 0) and an
    off-axis geometry — the disc-wind prescription the reference adds on
    top of Reynolds (1986).  q_T stays 0 (the reference's temperature
    field is dimensionally broken otherwise, SURVEY §2.1)."""

    @pytest.fixture
    def dw_pair(self, disc_wind_params):
        _need_reference()
        p = small_grid(disc_wind_params)
        p['power_laws'] = dict(p['power_laws'])
        p['power_laws']['q_T'] = 0.0
        p['power_laws']['q^d_T'] = 0.0
        ours = JetModel(copy.deepcopy(p))
        ref = reference_jetmodel(p)
        return ours, ref

    def test_fields(self, dw_pair):
        ours, ref = dw_pair
        _nan_allclose(ours.fill_factor, ref.fill_factor)
        _nan_allclose(ours.number_density, ref.number_density, rtol=1e-9)
        _nan_allclose(ours.ion_fraction, ref.ion_fraction, rtol=1e-9)
        for o, r in zip(ours.vel, ref.vel):
            _nan_allclose(o, r, rtol=1e-9, atol=1e-12)

    def test_continuum_rt(self, dw_pair):
        ours, ref = dw_pair
        # q_T = 0 -> van Hoof gaunt branch
        tau_o = ours.optical_depth_ff(np.array([6e9]))[0]
        tau_r = np.nan_to_num(ref.optical_depth_ff(6e9), nan=0.0)
        np.testing.assert_allclose(tau_o, tau_r, rtol=1e-9, atol=1e-20)
        fl_o = ours.flux_ff(np.array([6e9]))[0]
        fl_r = np.nan_to_num(ref.flux_ff(6e9), nan=0.0)
        np.testing.assert_allclose(fl_o, fl_r, rtol=1e-9, atol=1e-25)

    def test_travel_time(self, disc_wind_params):
        # q_v != 0 and q^d_v != 0 exercise the full 2F1 family
        _need_reference()
        p = small_grid(disc_wind_params, n=(10, 20, 10))
        p['power_laws'] = dict(p['power_laws'])
        p['power_laws']['q_T'] = 0.0
        ours = JetModel(copy.deepcopy(p))
        ref = reference_jetmodel(p)
        np.testing.assert_allclose(
            ours.ts, np.asarray(ref.ts, dtype=float), rtol=1e-8)


class TestSaveLoad:
    def test_roundtrip(self, model_params, tmp_path):
        p = small_grid(model_params)
        jm = JetModel(copy.deepcopy(p))
        jm.time = 1.5 * 31536000.0
        _ = jm.fill_factor
        f = str(tmp_path / "model.save")
        jm.save(f)
        jm2 = JetModel.load_model(f)
        assert jm2.time == jm.time
        _nan_allclose(jm2.fill_factor, jm.fill_factor)
        _nan_allclose(jm2.number_density, jm.number_density)

    def test_save_skips_when_unchanged(self, model_params, tmp_path):
        """An up-to-date checkpoint (same params/time/caches) is not
        rewritten — pipeline executes end with a save of an unchanged
        model, and the fill caches cost seconds of disk at 256^3+."""
        import os

        p = small_grid(model_params)
        jm = JetModel(copy.deepcopy(p))
        _ = jm.fill_factor
        f = str(tmp_path / "model.save")
        jm.save(f)
        stat0 = os.stat(f)
        jm.save(f)          # unchanged → must not rewrite
        stat1 = os.stat(f)
        assert (stat1.st_mtime_ns, stat1.st_ino) == \
            (stat0.st_mtime_ns, stat0.st_ino)
        jm.time = 2.0 * 31536000.0
        jm.save(f)          # time changed → must rewrite
        assert os.stat(f).st_mtime_ns != stat0.st_mtime_ns
        jm2 = JetModel.load_model(f)
        assert jm2.time == jm.time
        # a checkpoint without its sidecar is rewritten, not trusted
        os.remove(f + '.sig')
        before = os.stat(f).st_mtime_ns
        jm.save(f)
        assert os.path.exists(f + '.sig')
        assert os.stat(f).st_mtime_ns >= before
