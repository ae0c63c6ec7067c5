"""Standard-format interchange: UVFITS export, import and file-based
inference.

The reference's synthetic observations live in CASA measurement sets
that any radio package can reprocess.  This framework's native path
keeps visibilities in ``.vis.npz`` sets — and, with
``export_uvfits=True``, ALSO as random-groups UVFITS files (AIPS AN
antenna table included) that real CASA (``importuvfits``), AIPS and
difmap open directly.  This example:

1. runs a quick VLA-B continuum observation with UVFITS export on,
2. reads the exported file back (``synthobs.uvfits.read_uvfits``) and
   summarises it the way a downstream package would see it,
3. fits the jet mass-loss rate STRAIGHT off the file
   (``fit.fit_uvfits`` — the path real observed data would take into
   this framework's differentiable inference).

Runs on CPU (f64) in about a minute:

    JAX_PLATFORM_NAME=cpu python examples/uvfits_interchange.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere without installing

import copy
import runpy
import tempfile

import numpy as np

from rajepy_tpu import JetModel, Pipeline
from rajepy_tpu import fit as jfit
from rajepy_tpu.synthobs import uvfits

HERE = _os.path.dirname(_os.path.abspath(__file__))
PKG = _os.path.join(_os.path.dirname(HERE), 'rajepy_tpu')

params = runpy.run_path(
    _os.path.join(PKG, 'data', 'example-model-params.py'))['params']
params = copy.deepcopy(params)
params['grid'].update(n_x=16, n_y=40, n_z=16, l_z=None)

td = tempfile.mkdtemp(prefix='uvfits_example_')
pipeline_params = {
    'min_el': 20.,
    'dcys': {'model_dcy': _os.path.join(td, 'run')},
    'continuum': {'times': np.array([0.]), 'freqs': np.array([2.2e10]),
                  't_obs': np.array([1200]),
                  'tscps': np.array([('VLA', 'B')]),
                  't_ints': np.array([60]), 'bws': np.array([1e8]),
                  'chanws': np.array([5e7])},
    'rrls': {'times': np.array([]), 'lines': None, 't_obs': None,
             'tscps': None, 't_ints': None, 'bws': None, 'chanws': None},
    # forwarded to every simulate_observation call: write UVFITS copies
    # of the visibility sets; skip CLEAN (we only want the data here)
    'synthobs': {'export_uvfits': True, 'niter': 0},
}

print("== 1. simulate with UVFITS export ==")
pline = Pipeline(JetModel(copy.deepcopy(params)), pipeline_params)
pline.execute(simobserve=True, verbose=False, resume=False, clobber=True,
              plot=False)
run = pline.runs[0]
print("products:")
for key in ('ms_noisy', 'uvfits_clean', 'uvfits_noisy'):
    print(f"  {key}: {_os.path.basename(run.products[key])}")

print("\n== 2. read the standard file back ==")
obs = uvfits.read_uvfits(run.products['uvfits_noisy'])
n_chan, n_vis = obs['vis_re'].shape
print(f"source {obs['source']!r} at RA {obs['ra_deg']:.3f} "
      f"DEC {obs['dec_deg']:+.3f} deg")
print(f"{n_vis} visibilities x {n_chan} channels "
      f"({obs['freqs'][0] / 1e9:.2f}-{obs['freqs'][-1] / 1e9:.2f} GHz), "
      f"{len(obs['ant_names'])} antennas "
      f"({', '.join(obs['ant_names'][:4])}, ...)")
print(f"|uv| range {np.hypot(*obs['uvw'][:, :2].T).min():.0f}-"
      f"{np.hypot(*obs['uvw'][:, :2].T).max():.0f} m; "
      f"weights {obs['weights'].min():.3g}-{obs['weights'].max():.3g} "
      "(1/sigma^2)")

print("\n== 3. fit the mass-loss rate straight off the file ==")
jm = JetModel(copy.deepcopy(params))
jm.time = 0.0
res = jfit.fit_uvfits(jm, run.products['uvfits_noisy'],
                      free=('properties.mlr_bj',), steps=120,
                      learning_rate=0.05)
truth = params['properties']['mlr_bj']
fitted = res.values['properties.mlr_bj']
print(f"mlr_bj: fitted {fitted:.4g}  truth {truth:.4g}  "
      f"({100 * (fitted / truth - 1):+.2f}%)")
print(f"chi-squared/vis: {res.loss[0]:.3f} -> {res.loss[-1]:.3f} "
      "(2.0 = thermal-noise floor)")
