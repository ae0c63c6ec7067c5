"""Smoke tests: every plotting function renders and writes a file."""
import copy
import os

import numpy as np
import pytest

from rajepy_tpu import JetModel, Pipeline
from rajepy_tpu.plotting import functions as pfunc


@pytest.fixture(scope='module')
def jm(request):
    params = {
        "target": {"name": "plot", "ra": "04:31:34.0",
                   "dec": "+18:08:04.9", "epoch": "J2000", "dist": 120.,
                   "v_lsr": 6.2, "M_star": 0.55, "R_1": .25, "R_2": 2.5},
        "grid": {"n_x": 16, "n_y": 40, "n_z": 16, "l_z": None,
                 "c_size": 0.5},
        "geometry": {"epsilon": 7. / 9., "opang": 25., "w_0": 1.,
                     "r_0": 1., "inc": 90., "pa": 0., "rotation": "CCW"},
        "power_laws": {"q_v": 0., "q_T": 0., "q_x": 0., "q^d_n": 0.,
                       "q^d_T": 0., "q^d_v": 0., "q^d_x": 0.},
        "properties": {"v_0": 150., "x_0": 0.1, "T_0": 1E4, "mu": 1.3,
                       "mlr_bj": 1e-7, "mlr_rj": 5e-8},
        "ejection": {"t_0": np.array([0.5]), "hl": np.array([0.15]),
                     "chi": np.array([5.]), "which": np.array(["B"])},
    }
    return JetModel(params)


def _check(path):
    assert os.path.exists(path)
    assert os.path.getsize(path) > 1000


def test_model_plot(jm, tmp_path):
    f = str(tmp_path / 'model.pdf')
    pfunc.model_plot(jm, savefig=f)
    _check(f)


def test_rt_plot(jm, tmp_path):
    f = str(tmp_path / 'rt.pdf')
    pfunc.rt_plot(jm, 6e9, savefig=f)
    _check(f)


def test_rt_plot_run_object(jm, tmp_path):
    """rt_plot accepts a run object (plots from saved FITS products) and
    (jm, run) (frequency read off the run)."""
    class FakeRun:
        freq = 6e9

    flux_f = str(tmp_path / 'Flux.fits')
    tau_f = str(tmp_path / 'Tau.fits')
    em_f = str(tmp_path / 'EM.fits')
    jm.flux_ff(6e9, savefits=flux_f)
    jm.optical_depth_ff(6e9, savefits=tau_f)
    jm.emission_measure(savefits=em_f)
    run = FakeRun()
    run.fits_flux, run.fits_tau, run.fits_em = flux_f, tau_f, em_f

    f1 = str(tmp_path / 'rt_run.pdf')
    pfunc.rt_plot(run, savefig=f1)
    _check(f1)
    f2 = str(tmp_path / 'rt_jm_run.pdf')
    pfunc.rt_plot(jm, run, savefig=f2)
    _check(f2)
    with pytest.raises(TypeError):
        pfunc.rt_plot(jm)  # no freq, no products


def test_geometry_plot(jm, tmp_path):
    f = str(tmp_path / 'geom.pdf')
    pfunc.geometry_plot(jm, savefig=f)
    _check(f)


def test_jml_profile_plot(jm, tmp_path):
    f = str(tmp_path / 'jml.pdf')
    pfunc.jml_profile_plot(jm, savefig=f)
    _check(f)


def test_diagnostic_plot(jm, tmp_path):
    f = str(tmp_path / 'diag.pdf')
    pfunc.diagnostic_plot(jm, savefig=f)
    _check(f)


def test_conservation_profiles_match_steady_state(jm):
    """The r-binned mass profile behind diagnostic_plot tracks the
    analytic steady-state expectation jml * dr / v(r): mass flux through
    every cross-section is the mass-loss rate, so a csize-thick slice
    holds jml * (crossing time).  The reference's equivalent diagnostic
    is dead at head (functions.py:403-404 reads the commented-out
    JetModel.mass, classes.py:787-835)."""
    import copy
    from rajepy_tpu import constants as cnsts

    params = copy.deepcopy(jm.params)
    params['ejection'] = {'t_0': np.array([]), 'hl': np.array([]),
                          'chi': np.array([]), 'which': np.array([])}
    params['grid'] = {'n_x': 32, 'n_y': 32, 'n_z': 96, 'l_z': None,
                      'c_size': 0.5}
    # an inclined, rotated jet — the configuration the reference's
    # diagnostic refuses (functions.py:391-398)
    params['geometry']['inc'] = 80.0
    params['geometry']['pa'] = 10.0
    m = JetModel(params)
    prof = m.conservation_profiles()
    rs, mass = prof['r'], prof['mass']
    v0 = params['properties']['v_0']  # q_v == 0: constant speed
    for which, sgn in (('B', 1.0), ('R', -1.0)):
        jml = m.ss_jml(which)
        expect = jml * m.csize * cnsts.AU / (v0 * 1e3)
        # bins well inside the grid and away from the launch surface
        sel = (sgn * rs > 3 * params['geometry']['r_0']) & \
              (np.abs(rs) < 96 * 0.5 / 3)
        got = mass[sel]
        assert got.size > 10
        np.testing.assert_allclose(got, expect, rtol=0.15)
    # angular momentum is positive where mass is
    assert np.all(prof['angmom'][mass > 0] > 0)


def test_mass_volume_slices(jm, tmp_path):
    f = str(tmp_path / 'mv.pdf')
    pfunc.plot_mass_volume_slices(jm, savefig=f)
    _check(f)


def test_pipeline_plots_and_timelapse(jm, tmp_path):
    pparams = {
        'min_el': 20.,
        'dcys': {'model_dcy': str(tmp_path / 'out')},
        'continuum': {'times': np.array([0., 0.5]),
                      'freqs': np.array([6e9]),
                      't_obs': None, 'tscps': None, 't_ints': None,
                      'bws': None, 'chanws': None},
        'rrls': {'times': np.array([]), 'lines': None, 't_obs': None,
                 'tscps': None, 't_ints': None, 'bws': None,
                 'chanws': None},
    }
    pline = Pipeline(jm, pparams)
    pline.execute(simobserve=False, verbose=False, dryrun=False,
                  resume=False, clobber=True, plot=True)
    _check(os.path.join(pline.dcy, 'GridPlot.pdf'))
    _check(os.path.join(pline.dcy, 'JMLPlot.pdf'))

    # radio_plot from the run products
    f = str(tmp_path / 'radio.pdf')
    pline.radio_plot(pline.runs[0], savefig=f)
    _check(f)

    # SED plot over completed runs
    f = str(tmp_path / 'sed.png')
    pfunc.sed_plot(pline, 0.0, savefig=f)
    _check(f)

    # timelapse: requesting .mp4 writes mp4 when ffmpeg is available
    # (the reference's format) and degrades to an animated GIF otherwise
    import matplotlib.animation as manim
    f = str(tmp_path / 'movie.mp4')
    pfunc.timelapse_animation(pline, savefig=f)
    if manim.FFMpegWriter.isAvailable():
        assert os.path.exists(f)
    else:
        assert os.path.exists(str(tmp_path / 'movie.gif')) or \
            os.path.isdir(str(tmp_path / 'movie'))
    # explicit .gif request always honours the extension
    f2 = str(tmp_path / 'movie2.gif')
    pfunc.timelapse_animation(pline, savefig=f2)
    assert os.path.exists(f2) or os.path.isdir(str(tmp_path / 'movie2'))
    # writer-selection contract
    w, p = pfunc._movie_writer('/x/y.mp4')
    if manim.FFMpegWriter.isAvailable():
        assert (w, p) == ('ffmpeg', '/x/y.mp4')
    else:
        assert (w, p) == ('pillow', '/x/y.gif')
    assert pfunc._movie_writer('/x/y.gif') == ('pillow', '/x/y.gif')


def test_uv_plot(tmp_path):
    # synthetic visibility set in the SynObs npz product schema
    rng = np.random.default_rng(0)
    n_vis = 600
    uvw = rng.uniform(-3e4, 3e4, (n_vis, 3))
    freqs = np.array([5e9, 6e9])
    re = rng.standard_normal((2, n_vis))
    im = rng.standard_normal((2, n_vis))
    npz = str(tmp_path / 'vis.npz')
    np.savez(npz, uvw=uvw, vis_re=re, vis_im=im, freqs=freqs, sigma=0.1)
    f = str(tmp_path / 'uv.png')
    pfunc.uv_plot(npz, savefig=f)
    _check(f)
    # mapping input + decimation path
    f2 = str(tmp_path / 'uv2.png')
    pfunc.uv_plot({'uvw': uvw, 'vis_re': re, 'vis_im': im,
                   'freqs': freqs}, max_points=100, savefig=f2)
    _check(f2)


def test_gain_plot(tmp_path):
    rng = np.random.default_rng(1)
    n_sol, n_ant = 12, 8
    g_re = 1 + 0.1 * rng.standard_normal((n_sol, n_ant))
    g_im = 0.1 * rng.standard_normal((n_sol, n_ant))
    f = str(tmp_path / 'gains.png')
    pfunc.gain_plot(g_re, g_im, savefig=f)
    _check(f)
    # bandpass-shaped solutions
    f2 = str(tmp_path / 'bp.png')
    pfunc.gain_plot(g_re[None].repeat(5, 0), g_im[None].repeat(5, 0),
                    savefig=f2)
    _check(f2)


def test_equalise_axes_full_signature():
    """2-D/3-D, linear/log, fix_* semantics (reference functions.py:20-103)."""
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    ax.set_xlim(0, 10)
    ax.set_ylim(0, 2)
    xl, yl = pfunc.equalise_axes(ax)
    assert xl[1] - xl[0] == pytest.approx(10)
    assert yl[1] - yl[0] == pytest.approx(10)
    # fix_y imposes the (smaller) y span on x
    ax.set_xlim(0, 10)
    ax.set_ylim(0, 2)
    xl, yl = pfunc.equalise_axes(ax, fix_y=True)
    assert xl[1] - xl[0] == pytest.approx(2)
    assert yl == (0, 2)
    # log axes equalise in decades
    ax2 = fig.add_subplot()
    ax2.set_xscale('log')
    ax2.set_yscale('log')
    ax2.set_xlim(1, 1e4)
    ax2.set_ylim(1, 10)
    xl, yl = pfunc.equalise_axes(ax2)
    assert np.log10(yl[1] / yl[0]) == pytest.approx(4)
    with pytest.raises(ValueError):
        pfunc.equalise_axes(ax, fix_x=True, fix_y=True)
    plt.close(fig)
    # 3-D: returns three lim pairs, linear z must NOT be treated as log
    fig3 = plt.figure()
    ax3 = fig3.add_subplot(projection='3d')
    ax3.set_xlim(0, 4)
    ax3.set_ylim(0, 2)
    ax3.set_zlim(0, 1)
    xl, yl, zl = pfunc.equalise_axes(ax3)
    for lims in (xl, yl, zl):
        assert lims[1] - lims[0] == pytest.approx(4)
    plt.close(fig3)


def test_make_colorbar_full_signature(tmp_path):
    """position/numlevels/maxticks/minticks/tickformat/hidespines are
    honoured (reference functions.py:106-179)."""
    import matplotlib.pyplot as plt
    from matplotlib.colors import LogNorm, SymLogNorm
    from matplotlib.ticker import MultipleLocator
    fig, caxes = plt.subplots(1, 4, figsize=(8, 3))
    axis = pfunc.make_colorbar(caxes[0], 10.0, cmin=0.0, position='left',
                               numlevels=16, colmap='plasma',
                               maxticks=[0, 5, 10], minticks=True,
                               hidespines=True)
    assert list(axis.get_ticklocs()) == [0, 5, 10]
    assert not caxes[0].spines['top'].get_visible()
    assert caxes[0].yaxis.get_ticks_position() == 'left'
    pfunc.make_colorbar(caxes[1], 1e3, cmin=1.0,
                        norm=LogNorm(vmin=1.0, vmax=1e3))
    assert caxes[1].get_yscale() == 'log'
    pfunc.make_colorbar(caxes[2], 5.0, cmin=0.0, orientation='horizontal',
                        position='top', maxticks=MultipleLocator(2.5),
                        tickformat=lambda v, p: f'{v:.1f}x')
    labels = [t.get_text() for t in caxes[2].get_xticklabels()]
    assert any(lb.endswith('x') for lb in labels)
    with pytest.raises(NotImplementedError):
        pfunc.make_colorbar(caxes[3], 1.0,
                            norm=SymLogNorm(linthresh=0.1, vmin=-1, vmax=1))
    with pytest.raises(ValueError):
        pfunc.make_colorbar(caxes[3], 1.0, orientation='diagonal')
    f = str(tmp_path / 'cbar.png')
    fig.savefig(f)
    _check(f)
    plt.close(fig)
