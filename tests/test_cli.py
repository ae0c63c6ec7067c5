"""CLI entry-point tests: python -m rajepy_tpu.main with the reference's
flags (-v -rt -so -r -c), driven in-process via main(argv)."""
import glob
import os

import numpy as np
import pytest

from rajepy_tpu.main import build_parser, main


def _write_params(obj, path):
    """Write a dict as an executable-.py param file (py_to_dict schema).
    repr(np.ndarray) round-trips through the 'array' alias."""
    with open(path, 'w') as f:
        f.write("import numpy as np\n"
                "from numpy import array, float64, int64\n"
                "nan = float('nan')\n"
                f"params = {obj!r}\n")


@pytest.fixture
def param_files(model_params, tmp_path):
    import copy
    p = copy.deepcopy(model_params)
    p['grid'].update(n_x=16, n_y=40, n_z=16)
    pline = {
        'min_el': 20.,
        'dcys': {'model_dcy': str(tmp_path / 'out')},
        'continuum': {'times': np.array([0.]),
                      'freqs': np.array([6e9]),
                      't_obs': np.array([1200]),
                      'tscps': np.array([('VLA', 'B')]),
                      't_ints': np.array([60]),
                      'bws': np.array([1e8]),
                      'chanws': np.array([1e8])},
        'rrls': {'times': np.array([]), 'lines': np.array([]),
                 't_obs': np.array([]), 'tscps': np.array([]),
                 't_ints': np.array([]), 'bws': np.array([]),
                 'chanws': np.array([])},
    }
    mf = str(tmp_path / 'model-params.py')
    pf = str(tmp_path / 'pipeline-params.py')
    _write_params(p, mf)
    _write_params(pline, pf)
    return mf, pf, str(tmp_path / 'out')


def test_parser_flags():
    args = build_parser().parse_args(['-v', '-rt', '-so', '-r', '-c',
                                      'm.py', 'p.py'])
    assert args.verbose and args.radiative_transfer and args.simobserve
    assert args.resume and args.clobber
    assert args.model_param_file == 'm.py'


def test_cli_dryrun_writes_nothing(param_files):
    mf, pf, out = param_files
    pline = main([mf, pf])                 # no -rt: dryrun
    assert len(pline.runs) == 1
    assert not glob.glob(os.path.join(out, 'Day*', '*', '*.fits'))


def test_cli_rt_and_so_end_to_end(param_files):
    mf, pf, out = param_files
    pline = main(['-rt', '-so', '-c', mf, pf])
    run = pline.runs[0]
    assert run.completed
    assert os.path.exists(run.fits_flux)
    assert os.path.exists(run.products['clean_image'])
    # param files copied into the output directory (main.py:79-87)
    assert os.path.exists(os.path.join(out, 'model-params.py'))
    assert os.path.exists(os.path.join(out, 'pipeline-params.py'))
    # the shared log was written
    assert glob.glob(os.path.join(out, 'ModelRun_*.log'))


def test_cli_resume_skips_completed(param_files):
    mf, pf, out = param_files
    pline = main(['-rt', mf, pf])
    # RT-only: the run still owes its configured synthetic observation,
    # so it must NOT be marked completed — the reference sets
    # completed=True even here (classes.py:2853), poisoning a later
    # resume into skipping the synthobs stage forever (PARITY.md)
    assert not pline.runs[0].completed
    flux0 = os.path.getmtime(pline.runs[0].fits_flux)
    # resume with -so: the RT FITS products are reused (not rewritten),
    # synthobs runs, and the run completes
    pline = main(['-rt', '-so', '-r', mf, pf])
    assert pline.runs[0].completed
    assert os.path.getmtime(pline.runs[0].fits_flux) == flux0
    assert os.path.exists(pline.runs[0].products['clean_image'])


def test_param_files_do_not_alias_by_name(model_params, tmp_path):
    """Two different param files with the SAME basename must not alias:
    the old __import__-based loader cached on the module name and
    silently returned the first file's params for the second."""
    import copy
    from rajepy_tpu import JetModel
    d1, d2 = tmp_path / 'a', tmp_path / 'b'
    d1.mkdir(), d2.mkdir()
    p1 = copy.deepcopy(model_params)
    p2 = copy.deepcopy(model_params)
    p2['properties']['T_0'] = 12345.0
    _write_params(p1, str(d1 / 'model-params.py'))
    _write_params(p2, str(d2 / 'model-params.py'))
    r1 = JetModel.py_to_dict(str(d1 / 'model-params.py'))
    r2 = JetModel.py_to_dict(str(d2 / 'model-params.py'))
    assert r1['properties']['T_0'] != r2['properties']['T_0']
    assert r2['properties']['T_0'] == 12345.0
