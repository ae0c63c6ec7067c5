"""Gain errors, self-calibration and closure-quantity fitting.

The reference's CASA boundary corrupts synthetic observations with
thermal noise only; this example walks the full calibration story
rajepy_tpu adds on top (``synthobs.calibration``):

1. observe a jet model with antenna-based gain corruption
   (AR(1) phase/amplitude tracks — CASA ``sm.setgain``'s role),
2. recover the image dynamic range by iterative self-calibration
   (StEFCal solves + applycal inside ``simulate_observation``),
3. inspect the solutions and data with ``uv_plot`` / ``gain_plot``,
4. fit jet parameters DIRECTLY to closure observables of the
   uncalibrated visibilities (``fit.fit_closures``) — the VLBI
   workflow for data whose gains cannot be solved at all.

Runs on CPU (f64) in a few minutes:

    JAX_PLATFORM_NAME=cpu python examples/calibration_workflow.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere without installing

import copy
import os
import runpy
import tempfile

import numpy as np

from rajepy_tpu import JetModel, Pipeline
from rajepy_tpu import fit as jfit
from rajepy_tpu.plotting import functions as pfunc
from rajepy_tpu.synthobs import calibration as cal, simulate_observation

out = tempfile.mkdtemp(prefix='rajepy_cal_')
params = runpy.run_path('rajepy_tpu/data/example-model-params.py')['params']
params['grid'].update(n_x=16, n_y=40, n_z=16, l_z=None)

pparams = {
    'min_el': 20.,
    'dcys': {'model_dcy': os.path.join(out, 'pipeline')},
    'continuum': {'times': np.array([0.]), 'freqs': np.array([2.2e10]),
                  't_obs': np.array([3600]),
                  'tscps': np.array([('VLA', 'B')]),
                  't_ints': np.array([60]), 'bws': np.array([1e8]),
                  'chanws': np.array([5e7])},
    'rrls': {'times': np.array([]), 'lines': None, 't_obs': None,
             'tscps': None, 't_ints': None, 'bws': None, 'chanws': None},
}

jm = JetModel(params)
pline = Pipeline(jm, pparams)
pline.execute(simobserve=False, verbose=False, resume=False,
              clobber=True, plot=False)
run = pline.runs[0]

# ---- 1 + 2: corrupt, then self-calibrate ---------------------------- #
products = simulate_observation(
    pline, run,
    corruption={'amp_rms': 0.15, 'phase_rms_deg': 50.,
                'coherence_s': 1800., 'seed': 42},
    selfcal='amp+phase', selfcal_solint_s=600., selfcal_rounds=2)
sc = run.results['selfcal']
print(f"selfcal ({sc['rounds']} rounds, {sc['n_sol']} solints): "
      f"dynamic range {sc['dynamic_range_before']:.1f} -> "
      + ' -> '.join(f"{d:.1f}" for d in sc['dynamic_range_rounds']))

# ---- 3: diagnostics -------------------------------------------------- #
pfunc.uv_plot(products['ms_selfcal'],
              savefig=os.path.join(out, 'uv_diagnostics.png'))
print("wrote", os.path.join(out, 'uv_diagnostics.png'))

# ---- 4: closure-quantity fitting of uncalibrated data ---------------- #
# synthesise uncalibrated visibilities of a 'true' jet and recover its
# mass-loss rate from closure phases + log closure amplitudes alone
p = copy.deepcopy(params)
p['grid'].update(n_x=16, n_y=16, n_z=16)
rng = np.random.default_rng(3)
n_ant, n_t = 8, 6
pairs = np.stack(np.triu_indices(n_ant, k=1), axis=1)
a1, a2, tix = cal.vis_metadata(n_t, pairs)
uvw = rng.normal(0, 2e4, (n_t * pairs.shape[0], 3))
freqs = np.array([5e9, 2.2e10])

true = copy.deepcopy(p)
true['properties'].update(mlr_bj=2e-7)
jm_t = JetModel(true)
jm_t.time = 0.0
fwd, th = jfit.build_vis_forward(jm_t, freqs, uvw,
                                 ('properties.mlr_bj',))
vis = np.asarray(fwd(th))
g_re, g_im = cal.simulate_gain_errors(7, n_t, n_ant, amp_rms=0.3,
                                      phase_rms_deg=80.0)
cr, ci = cal.apply_gains(vis.real, vis.imag, g_re, g_im, a1, a2, tix)
vis_corr = np.asarray(cr) + 1j * np.asarray(ci)

jm_fit = JetModel(p)
jm_fit.time = 0.0
res = jfit.fit_closures(jm_fit, freqs, uvw, vis_corr, n_ant=n_ant,
                        n_t=n_t, free=('properties.mlr_bj',), steps=300)
print(f"closure fit under 80-deg gain errors: mlr_bj = "
      f"{res.values['properties.mlr_bj']:.4e} (truth 2e-07)")
