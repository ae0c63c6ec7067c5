"""Antenna-gain corruption + StEFCal self-calibration tests (CPU)."""
import copy
import os

import numpy as np
import pytest

from rajepy_tpu.synthobs import calibration as cal


def _random_vis(rng, n_ant, n_t, n_chan=1):
    """Random 'true sky' visibilities on a full antenna-pair set."""
    pairs = np.stack(np.triu_indices(n_ant, k=1), axis=1)
    n_bl = pairs.shape[0]
    ant1, ant2, t_index = cal.vis_metadata(n_t, pairs)
    # a handful of point sources -> deterministic, well-conditioned
    # model visibilities with structure across baselines
    n_src = 5
    flux = rng.uniform(0.5, 2.0, n_src)
    pos = rng.uniform(-1.0, 1.0, (n_src, 2))
    uv = rng.uniform(-500.0, 500.0, (n_t * n_bl, 2))
    phase = 2 * np.pi * (uv[:, 0][:, None] * pos[None, :, 0] * 1e-3 +
                         uv[:, 1][:, None] * pos[None, :, 1] * 1e-3)
    v = (flux[None, :] * np.exp(1j * phase)).sum(axis=1)
    vr = np.broadcast_to(v.real, (n_chan, v.size)).copy()
    vi = np.broadcast_to(v.imag, (n_chan, v.size)).copy()
    return vr, vi, ant1, ant2, t_index, pairs


class TestApplyGains:
    def test_apply_then_invert_roundtrip(self):
        rng = np.random.default_rng(0)
        n_ant, n_t = 8, 6
        vr, vi, a1, a2, tix, _ = _random_vis(rng, n_ant, n_t, n_chan=3)
        g_re, g_im = cal.simulate_gain_errors(1, n_t, n_ant, amp_rms=0.2,
                                              phase_rms_deg=40.0)
        cr, ci = cal.apply_gains(vr, vi, g_re, g_im, a1, a2, tix)
        rr, ri = cal.apply_gains(cr, ci, g_re, g_im, a1, a2, tix,
                                 invert=True)
        np.testing.assert_allclose(np.asarray(rr), vr, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(ri), vi, rtol=1e-12)

    def test_identity_gains_are_noop(self):
        rng = np.random.default_rng(2)
        vr, vi, a1, a2, tix, _ = _random_vis(rng, 6, 4)
        g = np.ones((4, 6))
        cr, ci = cal.apply_gains(vr, vi, g, np.zeros_like(g), a1, a2, tix)
        np.testing.assert_allclose(np.asarray(cr), vr, rtol=1e-14)
        np.testing.assert_allclose(np.asarray(ci), vi, rtol=1e-14)


class TestGainErrorTracks:
    def test_rms_and_coherence(self):
        n_t, n_ant = 4000, 3
        g_re, g_im = cal.simulate_gain_errors(
            3, n_t, n_ant, amp_rms=0.1, phase_rms_deg=20.0,
            coherence_s=600.0, t_int_s=60.0)
        amp = np.hypot(g_re, g_im)
        phase = np.arctan2(g_im, g_re)
        assert abs(np.std(amp) - 0.1) < 0.02
        assert abs(np.std(np.degrees(phase)) - 20.0) < 3.0
        # AR(1) lag-1 autocorrelation ~ exp(-1/10)
        ph = phase - phase.mean(axis=0)
        r1 = np.mean(ph[1:] * ph[:-1]) / np.mean(ph * ph)
        assert abs(r1 - np.exp(-0.1)) < 0.05

    def test_zero_rms_is_unity(self):
        g_re, g_im = cal.simulate_gain_errors(0, 5, 4)
        np.testing.assert_array_equal(g_re, np.ones((5, 4)))
        np.testing.assert_array_equal(g_im, np.zeros((5, 4)))


class TestStefcal:
    def _corrupt_and_solve(self, mode, n_sol=1, amp_rms=0.15,
                           phase_rms_deg=50.0, noise=0.0, seed=4):
        rng = np.random.default_rng(seed)
        n_ant, n_t = 10, 8
        vr, vi, a1, a2, tix, _ = _random_vis(rng, n_ant, n_t)
        # one true gain per solution interval (piecewise constant so the
        # solver's model is exact)
        gs_re, gs_im = cal.simulate_gain_errors(
            seed + 1, n_sol, n_ant, amp_rms=amp_rms,
            phase_rms_deg=phase_rms_deg)
        if mode == 'phase':
            a = np.hypot(gs_re, gs_im)
            gs_re, gs_im = gs_re / a, gs_im / a
        g_re, g_im = cal.expand_solutions(gs_re, gs_im, n_t)
        cr, ci = cal.apply_gains(vr, vi, g_re, g_im, a1, a2, tix)
        cr = np.asarray(cr) + noise * rng.standard_normal(cr.shape)
        ci = np.asarray(ci) + noise * rng.standard_normal(ci.shape)
        sr, si = cal.solve_gains(cr, ci, vr, vi, a1, a2, tix,
                                 n_ant=n_ant, n_t=n_t, n_sol=n_sol,
                                 mode=mode, n_iter=60)
        sol = np.asarray(sr) + 1j * np.asarray(si)
        true = gs_re + 1j * gs_im
        # the solver fixes antenna-0 phase per interval; re-reference truth
        ref = true[:, :1] / np.abs(true[:, :1])
        true = true * np.conj(ref)
        return sol, true

    def test_recovers_amp_phase_gains(self):
        sol, true = self._corrupt_and_solve('amp+phase')
        np.testing.assert_allclose(sol, true, atol=1e-9)

    def test_phase_only_recovers_phases(self):
        sol, true = self._corrupt_and_solve('phase')
        np.testing.assert_allclose(np.abs(sol), 1.0, atol=1e-9)
        np.testing.assert_allclose(np.angle(sol), np.angle(true),
                                   atol=1e-9)

    def test_solution_intervals(self):
        sol, true = self._corrupt_and_solve('amp+phase', n_sol=4)
        assert sol.shape == (4, 10)
        np.testing.assert_allclose(sol, true, atol=1e-9)

    def test_noisy_solution_close(self):
        sol, true = self._corrupt_and_solve('amp+phase', noise=0.05)
        assert np.max(np.abs(sol - true)) < 0.05

    def test_correct_vis_restores_data(self):
        rng = np.random.default_rng(7)
        n_ant, n_t = 10, 8
        vr, vi, a1, a2, tix, _ = _random_vis(rng, n_ant, n_t)
        gs_re, gs_im = cal.simulate_gain_errors(8, 1, n_ant, amp_rms=0.1,
                                                phase_rms_deg=40.0)
        g_re, g_im = cal.expand_solutions(gs_re, gs_im, n_t)
        cr, ci = cal.apply_gains(vr, vi, g_re, g_im, a1, a2, tix)
        sr, si = cal.solve_gains(np.asarray(cr), np.asarray(ci), vr, vi,
                                 a1, a2, tix, n_ant=n_ant, n_t=n_t,
                                 n_sol=1, n_iter=60)
        fr, fi = cal.correct_vis(np.asarray(cr), np.asarray(ci), sr, si,
                                 a1, a2, tix, n_t)
        # corrected data match the truth up to the (unobservable) global
        # amplitude/phase absorbed by the reference-antenna convention —
        # here the solve is exact so even that cancels
        np.testing.assert_allclose(np.asarray(fr), vr, atol=1e-8)
        np.testing.assert_allclose(np.asarray(fi), vi, atol=1e-8)


class TestSelfcalEndToEnd:
    """corruption + selfcal knobs in simulate_observation."""

    def _run_obs(self, model_params, tmp_path, sub, **kw):
        import rajepy_tpu
        from rajepy_tpu.synthobs import simulate_observation
        pparams = {
            'min_el': 20.,
            'dcys': {'model_dcy': str(tmp_path / sub)},
            'continuum': {'times': np.array([0.]),
                          'freqs': np.array([2.2e10]),
                          't_obs': np.array([1200]),
                          'tscps': np.array([('VLA', 'B')]),
                          't_ints': np.array([60]),
                          'bws': np.array([1e8]),
                          'chanws': np.array([5e7])},
            'rrls': {'times': np.array([]), 'lines': None,
                     't_obs': None, 'tscps': None, 't_ints': None,
                     'bws': None, 'chanws': None},
        }
        p = copy.deepcopy(model_params)
        p['grid'].update(n_x=16, n_y=40, n_z=16)
        jm = rajepy_tpu.JetModel(p)
        pline = rajepy_tpu.Pipeline(jm, pparams)
        pline.execute(simobserve=False, verbose=False, resume=False,
                      clobber=True, plot=False)
        run = pline.runs[0]
        return run, simulate_observation(pline, run, **kw)

    def test_selfcal_recovers_dynamic_range(self, model_params, tmp_path):
        # long-coherence (quasi-static) gain errors, one solint: the
        # solve should remove nearly all of the corruption
        corr = {'amp_rms': 0.15, 'phase_rms_deg': 60.0,
                'coherence_s': 1e5, 'seed': 99}
        run, products = self._run_obs(
            model_params, tmp_path, 'sc', corruption=corr,
            selfcal='amp+phase', selfcal_rounds=2)
        sc = run.results['selfcal']
        assert sc['mode'] == 'amp+phase' and sc['n_sol'] == 1
        # two rounds: phase-only first, then amp+phase against the
        # improved model
        assert len(sc['dynamic_range_rounds']) == 2
        # corruption scatters flux -> low DR; selfcal must recover it
        assert sc['dynamic_range_after'] > 2 * sc['dynamic_range_before']
        assert os.path.exists(products['ms_selfcal'])
        assert run.results.get('imfit') is not None

    def test_selfcal_solint_splitting(self, model_params, tmp_path):
        corr = {'amp_rms': 0.0, 'phase_rms_deg': 40.0,
                'coherence_s': 600.0, 'seed': 5}
        run, _ = self._run_obs(
            model_params, tmp_path, 'sc2', corruption=corr,
            selfcal='phase', selfcal_solint_s=240.0)
        sc = run.results['selfcal']
        assert sc['n_sol'] == 5          # 1200 s track / 240 s solint
        assert sc['dynamic_range_after'] > sc['dynamic_range_before']
        # phase-only mode: solved amplitudes pinned at 1
        assert sc['gain_amp_rms'] < 1e-6

    def test_bad_modes_raise(self, model_params, tmp_path):
        with pytest.raises(ValueError, match='selfcal'):
            self._run_obs(model_params, tmp_path, 'bad',
                          selfcal='bandpass')


class TestBandpass:
    def test_per_channel_solve_recovers_channel_gains(self):
        rng = np.random.default_rng(11)
        n_ant, n_t, n_chan = 10, 8, 3
        vr, vi, a1, a2, tix, _ = _random_vis(rng, n_ant, n_t, n_chan)
        # distinct gains per channel, piecewise-constant over 2 solints
        true = np.empty((n_chan, 2, n_ant), complex)
        gtr = np.empty((n_chan, n_t, n_ant))
        gti = np.empty((n_chan, n_t, n_ant))
        for c in range(n_chan):
            gs_re, gs_im = cal.simulate_gain_errors(
                20 + c, 2, n_ant, amp_rms=0.1, phase_rms_deg=40.0)
            true[c] = gs_re + 1j * gs_im
            gtr[c], gti[c] = cal.expand_solutions(gs_re, gs_im, n_t)
        cr, ci = cal.apply_bandpass(vr, vi, gtr, gti, a1, a2, tix)
        sr, si = cal.solve_gains(np.asarray(cr), np.asarray(ci), vr, vi,
                                 a1, a2, tix, n_ant=n_ant, n_t=n_t,
                                 n_sol=2, n_iter=60, per_channel=True)
        sol = np.asarray(sr) + 1j * np.asarray(si)
        assert sol.shape == (n_chan, 2, n_ant)
        ref = true[..., :1] / np.abs(true[..., :1])
        np.testing.assert_allclose(sol, true * np.conj(ref), atol=1e-9)
        # and correct_vis dispatches on the 3-D solution shape
        fr, fi = cal.correct_vis(np.asarray(cr), np.asarray(ci), sr, si,
                                 a1, a2, tix, n_t)
        np.testing.assert_allclose(np.asarray(fr), vr, atol=1e-8)
        np.testing.assert_allclose(np.asarray(fi), vi, atol=1e-8)

    def test_per_channel_needs_2d(self):
        with pytest.raises(ValueError, match='per_channel'):
            cal.solve_gains(np.zeros(6), np.zeros(6), np.zeros(6),
                            np.zeros(6), np.zeros(6, int),
                            np.ones(6, int), np.zeros(6, int),
                            n_ant=4, n_t=1, per_channel=True)


class TestPipelineSynthobsSection:
    def test_synthobs_params_forwarded(self, model_params, tmp_path):
        """An optional 'synthobs' pipeline-params section reaches
        simulate_observation (corruption + selfcal from a params file)."""
        import rajepy_tpu
        pparams = {
            'min_el': 20.,
            'dcys': {'model_dcy': str(tmp_path / 'pp')},
            'continuum': {'times': np.array([0.]),
                          'freqs': np.array([2.2e10]),
                          't_obs': np.array([1200]),
                          'tscps': np.array([('VLA', 'B')]),
                          't_ints': np.array([60]),
                          'bws': np.array([1e8]),
                          'chanws': np.array([5e7])},
            # a line-cube run in the same pipeline: the selfcal knob
            # must be stripped for it (continuum-only), not crash it
            'rrls': {'times': np.array([0.]),
                     'lines': np.array(['H58a']),
                     't_obs': np.array([1200]),
                     'tscps': np.array([('VLA', 'B')]),
                     't_ints': np.array([60]),
                     'bws': np.array([2e6]),
                     'chanws': np.array([5e5])},
            'synthobs': {'corruption': {'phase_rms_deg': 50.0,
                                        'coherence_s': 1e5},
                         'selfcal': 'phase', 'niter': 50},
        }
        p = copy.deepcopy(model_params)
        p['grid'].update(n_x=16, n_y=40, n_z=16)
        jm = rajepy_tpu.JetModel(p)
        pline = rajepy_tpu.Pipeline(jm, pparams)
        pline.execute(simobserve=True, verbose=False, resume=False,
                      clobber=True, plot=False)
        assert all(r.completed for r in pline.runs)
        cont = next(r for r in pline.runs if r.obs_type == 'continuum')
        cube = next(r for r in pline.runs if r.obs_type != 'continuum')
        sc = cont.results['selfcal']
        assert sc['mode'] == 'phase'
        assert sc['dynamic_range_after'] > sc['dynamic_range_before']
        assert 'ms_selfcal' in cont.products
        # the cube run imaged (selfcal stripped, corruption applied)
        assert 'selfcal' not in cube.results
        assert os.path.exists(cube.products['clean_image'])


class TestClosureQuantities:
    def _setup(self, seed=0, n_ant=8, n_t=5, n_chan=2):
        rng = np.random.default_rng(seed)
        vr, vi, a1, a2, tix, pairs = _random_vis(rng, n_ant, n_t, n_chan)
        return rng, vr, vi, a1, a2, tix, pairs

    def test_closure_phase_is_gain_phase_immune(self):
        rng, vr, vi, a1, a2, tix, _ = self._setup()
        n_ant, n_t = 8, 5
        # harsh iid per-time phase + amplitude gains
        g_re, g_im = cal.simulate_gain_errors(1, n_t, n_ant, amp_rms=0.3,
                                              phase_rms_deg=120.0)
        cr, ci = cal.apply_gains(vr, vi, g_re, g_im, a1, a2, tix)
        cp0 = cal.closure_phases(vr, vi, n_ant, n_t)
        cp1 = cal.closure_phases(np.asarray(cr), np.asarray(ci),
                                 n_ant, n_t)
        # identical phases despite 120-deg corruption
        d = np.angle(np.exp(1j * (cp1 - cp0)))
        assert np.max(np.abs(d)) < 1e-10
        assert cp0.shape == (2, n_t, 56)        # C(8,3) triangles

    def test_log_closure_amplitude_is_gain_amp_immune(self):
        rng, vr, vi, a1, a2, tix, _ = self._setup(seed=3)
        n_ant, n_t = 8, 5
        g_re, g_im = cal.simulate_gain_errors(2, n_t, n_ant, amp_rms=0.5,
                                              phase_rms_deg=90.0)
        cr, ci = cal.apply_gains(vr, vi, g_re, g_im, a1, a2, tix)
        la0 = cal.log_closure_amplitudes(vr, vi, n_ant, n_t)
        la1 = cal.log_closure_amplitudes(np.asarray(cr), np.asarray(ci),
                                         n_ant, n_t)
        np.testing.assert_allclose(la1, la0, atol=1e-9)
        assert la0.shape == (2, n_t, 70)        # C(8,4) quads

    def test_point_source_closures_are_trivial(self):
        # a point source at the phase centre: all closure phases 0,
        # all log closure amplitudes 0
        n_ant, n_t = 6, 3
        pairs = np.stack(np.triu_indices(n_ant, k=1), axis=1)
        n_vis = n_t * pairs.shape[0]
        vr = np.full((1, n_vis), 2.5)
        vi = np.zeros((1, n_vis))
        cp = cal.closure_phases(vr, vi, n_ant, n_t)
        la = cal.log_closure_amplitudes(vr, vi, n_ant, n_t)
        np.testing.assert_allclose(cp, 0.0, atol=1e-12)
        np.testing.assert_allclose(la, 0.0, atol=1e-12)

    def test_bispectrum_matches_direct_product(self):
        rng, vr, vi, a1, a2, tix, pairs = self._setup(seed=5, n_chan=1)
        n_ant, n_t = 8, 5
        br, bi = cal.bispectrum(vr, vi, n_ant, n_t)
        v = (vr + 1j * vi).reshape(1, n_t, -1)
        tab = cal.baseline_index_table(n_ant)
        # spot-check triangle (0, 2, 5)
        tri = cal.closure_triangles(n_ant)
        k = int(np.flatnonzero((tri == (0, 2, 5)).all(axis=1))[0])
        expect = (v[:, :, tab[0, 2]] * v[:, :, tab[2, 5]] *
                  np.conj(v[:, :, tab[0, 5]]))
        np.testing.assert_allclose(np.asarray(br)[:, :, k] +
                                   1j * np.asarray(bi)[:, :, k],
                                   expect, rtol=1e-12)


class TestGainTransfer:
    def test_continuum_gains_fix_a_cube_run(self, model_params, tmp_path):
        """The applycal workflow for line data: solve gains on the
        continuum (selfcal), transfer the gains product to an RRL cube
        run observed through the same (deterministic) gain corruption."""
        import rajepy_tpu
        from rajepy_tpu.synthobs import simulate_observation
        corr = {'phase_rms_deg': 50.0, 'coherence_s': 1e5, 'seed': 77}

        def pparams(sub):
            return {
                'min_el': 20.,
                'dcys': {'model_dcy': str(tmp_path / sub)},
                'continuum': {'times': np.array([0.]),
                              'freqs': np.array([2.2e10]),
                              't_obs': np.array([1200]),
                              'tscps': np.array([('VLA', 'B')]),
                              't_ints': np.array([60]),
                              'bws': np.array([1e8]),
                              'chanws': np.array([5e7])},
                'rrls': {'times': np.array([0.]),
                         'lines': np.array(['H58a']),
                         't_obs': np.array([1200]),
                         'tscps': np.array([('VLA', 'B')]),
                         't_ints': np.array([60]),
                         'bws': np.array([2e6]),
                         'chanws': np.array([5e5])},
            }

        p = copy.deepcopy(model_params)
        p['grid'].update(n_x=16, n_y=40, n_z=16)
        jm = rajepy_tpu.JetModel(p)
        pline = rajepy_tpu.Pipeline(jm, pparams('gt'))
        pline.execute(simobserve=False, verbose=False, resume=False,
                      clobber=True, plot=False)
        cont = next(r for r in pline.runs if r.obs_type == 'continuum')
        cube = next(r for r in pline.runs if r.obs_type != 'continuum')

        # 1) continuum: corrupt + selfcal -> gains product
        prod_c = simulate_observation(pline, cont, corruption=corr,
                                      selfcal='phase')
        assert os.path.exists(prod_c['gains'])

        def read_vis(path):
            # successive runs overwrite the same product path: read
            # eagerly, never hold a lazy NpzFile across runs
            with np.load(path) as z:
                return np.array(z['vis_re']), np.array(z['vis_im'])

        # 2) cube observed through the SAME gain screen, no correction
        prod_raw = simulate_observation(pline, cube, corruption=corr,
                                        niter=50)
        bad = dict(zip(('vis_re', 'vis_im'),
                       read_vis(prod_raw['ms_noisy'])))

        # 3) same cube with the continuum gains transferred
        prod_fix = simulate_observation(pline, cube, corruption=corr,
                                        niter=50,
                                        applycal_gains=prod_c['gains'])
        fixed = dict(zip(('vis_re', 'vis_im'),
                         read_vis(prod_fix['ms_noisy'])))

        # 4) reference: the uncorrupted cube observation
        prod_ref = simulate_observation(pline, cube, niter=50)
        ref = dict(zip(('vis_re', 'vis_im'),
                       read_vis(prod_ref['ms_noisy'])))

        err_bad = np.sqrt(np.mean((bad['vis_re'] - ref['vis_re']) ** 2 +
                                  (bad['vis_im'] - ref['vis_im']) ** 2))
        err_fix = np.sqrt(np.mean(
            (fixed['vis_re'] - ref['vis_re']) ** 2 +
            (fixed['vis_im'] - ref['vis_im']) ** 2))
        assert err_fix < err_bad / 5     # transfer removes the screen

    def test_antenna_mismatch_raises(self, model_params, tmp_path):
        import rajepy_tpu
        from rajepy_tpu.synthobs import simulate_observation
        gains = str(tmp_path / 'g.npz')
        np.savez(gains, g_re=np.ones((1, 5)), g_im=np.zeros((1, 5)))
        pparams = {
            'min_el': 20.,
            'dcys': {'model_dcy': str(tmp_path / 'mm')},
            'continuum': {'times': np.array([0.]),
                          'freqs': np.array([2.2e10]),
                          't_obs': np.array([1200]),
                          'tscps': np.array([('VLA', 'B')]),
                          't_ints': np.array([60]),
                          'bws': np.array([1e8]),
                          'chanws': np.array([5e7])},
            'rrls': {'times': np.array([]), 'lines': None,
                     't_obs': None, 'tscps': None, 't_ints': None,
                     'bws': None, 'chanws': None},
        }
        p = copy.deepcopy(model_params)
        p['grid'].update(n_x=16, n_y=40, n_z=16)
        jm = rajepy_tpu.JetModel(p)
        pline = rajepy_tpu.Pipeline(jm, pparams)
        pline.execute(simobserve=False, verbose=False, resume=False,
                      clobber=True, plot=False)
        with pytest.raises(ValueError, match='antenna'):
            simulate_observation(pline, pline.runs[0],
                                 applycal_gains=gains)


class TestReviewRegressions:
    def test_selfcal_rounds_zero_raises(self, model_params, tmp_path):
        from tests.test_calibration import TestSelfcalEndToEnd  # noqa
        t = TestSelfcalEndToEnd()
        with pytest.raises(ValueError, match='selfcal_rounds'):
            t._run_obs(model_params, tmp_path, 'r0',
                       corruption={'phase_rms_deg': 10.},
                       selfcal='phase', selfcal_rounds=0)

    def test_phase_only_unit_modulus_even_unconverged(self):
        rng = np.random.default_rng(21)
        n_ant, n_t = 10, 4
        vr, vi, a1, a2, tix, _ = _random_vis(rng, n_ant, n_t)
        gs_re, gs_im = cal.simulate_gain_errors(22, 1, n_ant,
                                                phase_rms_deg=60.0)
        a = np.hypot(gs_re, gs_im)
        g_re, g_im = cal.expand_solutions(gs_re / a, gs_im / a, n_t)
        cr, ci = cal.apply_gains(vr, vi, g_re, g_im, a1, a2, tix)
        # deliberately unconverged (7 iterations, odd so the raw ADI
        # average would leave |g| < 1 without the post-average project)
        sr, si = cal.solve_gains(np.asarray(cr), np.asarray(ci), vr, vi,
                                 a1, a2, tix, n_ant=n_ant, n_t=n_t,
                                 mode='phase', n_iter=7)
        np.testing.assert_allclose(np.hypot(np.asarray(sr),
                                            np.asarray(si)),
                                   1.0, atol=1e-12)

    def test_gain_plot_t_sol_rejects_bandpass(self):
        from rajepy_tpu.plotting import functions as pfunc
        g = np.ones((5, 3, 8))
        with pytest.raises(ValueError, match='bandpass'):
            pfunc.gain_plot(g, np.zeros_like(g), t_sol=np.arange(3))
