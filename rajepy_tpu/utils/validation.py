"""Parameter-dict validation (reference: miscellaneous/functions.py:46-190).

Same contract as the reference: validators *return* exceptions (or None)
rather than raising, so callers decide.  Two deliberate fixes over the
reference (SURVEY §2.1 known defects):

* ``properties.n_0`` is optional — it is derived from ``mlr_bj`` by the
  model (the reference's validator demands it at functions.py:159-165 while
  its own example params file omits it);
* ``ejection.which`` follows the current schema, but legacy param files
  using ``properties.mlr``/``properties.n_0`` without ``mlr_bj``/``mlr_rj``
  (the reference's test_cases fixtures) are migrated by
  :func:`migrate_legacy_model_params` instead of rejected.
"""
from __future__ import annotations

from collections.abc import Iterable
from typing import Optional

import numpy as np

from ..ops.astronomy import parse_dec, parse_ra


def _param_key_check(params, keys, optional=()):
    """Structural type check (reference functions.py:46-89)."""
    for section in keys:
        if section not in params:
            return KeyError(f"{section} keyword not found in params dict")
        spec = keys[section]
        is_scalar_spec = isinstance(spec, type) or (
            isinstance(spec, tuple) and
            all(isinstance(t, type) for t in spec))
        if is_scalar_spec:
            if not isinstance(params[section], spec):
                return ValueError(
                    f"value of {section} section of params must be of type "
                    f"{spec}, not {type(params[section])}")
            continue

        for key, typ in keys[section]:
            if key not in params[section]:
                if (section, key) in optional:
                    continue
                return KeyError(f"{key} keyword not found in {section} "
                                "section of params dict")
            val = params[section][key]
            if val is None:
                continue
            is_container_spec = (isinstance(typ, tuple) and len(typ) == 2 and
                                 typ[0] is np.ndarray)
            if not is_container_spec:
                if not isinstance(val, typ):
                    return ValueError(
                        f"{key} value of {section} section of params must "
                        f"be of type {typ}, not {type(val)}")
            else:
                _, elem_t = typ
                if not isinstance(val, Iterable):
                    return ValueError(
                        f"{key} value of {section} section of params must "
                        f"be an array of {elem_t}, not {type(val)}")
                if len(val) != 0:
                    first = (np.asarray(val).flat[0]
                             if isinstance(val, np.ndarray) else val[0])
                    if isinstance(first, np.generic) and \
                            not isinstance(first, np.str_):
                        first = first.item()
                    if elem_t is float:
                        ok = isinstance(first, (float, int))
                    elif elem_t is int:
                        ok = isinstance(first, int)
                    elif elem_t is str:
                        ok = isinstance(first, (str, np.str_))
                    elif elem_t is np.ndarray:
                        ok = (np.asarray(val).ndim >= 2 or
                              isinstance(val[0], (np.ndarray, tuple, list)))
                    else:
                        ok = isinstance(first, elem_t)
                    if not ok:
                        return ValueError(
                            f"{section} section's {key} must contain "
                            f"objects of type {elem_t}, not {type(first)}")
    return None


_FLOATY = (float, int, np.floating, np.integer)
_INTY = (int, np.integer)

_MODEL_KEYS = {
    'target': (('name', str), ('ra', str), ('dec', str), ('epoch', str),
               ('dist', _FLOATY), ('v_lsr', _FLOATY), ('M_star', _FLOATY),
               ('R_1', _FLOATY), ('R_2', _FLOATY)),
    'grid': (('n_x', _INTY), ('n_y', _INTY), ('n_z', _INTY),
             ('l_z', _FLOATY), ('c_size', _FLOATY)),
    'geometry': (('epsilon', _FLOATY), ('opang', _FLOATY), ('w_0', _FLOATY),
                 ('r_0', _FLOATY), ('inc', _FLOATY), ('pa', _FLOATY),
                 ('rotation', str)),
    'power_laws': (('q_v', _FLOATY), ('q_T', _FLOATY), ('q_x', _FLOATY),
                   ('q^d_n', _FLOATY), ('q^d_T', _FLOATY),
                   ('q^d_v', _FLOATY), ('q^d_x', _FLOATY)),
    'properties': (('v_0', _FLOATY), ('x_0', _FLOATY), ('n_0', _FLOATY),
                   ('T_0', _FLOATY), ('mu', _FLOATY), ('mlr_bj', _FLOATY),
                   ('mlr_rj', _FLOATY)),
    'ejection': (('t_0', (np.ndarray, float)), ('hl', (np.ndarray, float)),
                 ('chi', (np.ndarray, float)),
                 ('which', (np.ndarray, str))),
}

# n_0 derived from mlr_bj; l_z/n_* mutually optional at the value level
_MODEL_OPTIONAL = (('properties', 'n_0'),)

_PIPELINE_KEYS = {
    'min_el': _FLOATY,
    'dcys': (('model_dcy', str),),
    'continuum': (('times', (np.ndarray, float)),
                  ('freqs', (np.ndarray, float)),
                  ('t_obs', (np.ndarray, int)),
                  ('tscps', (np.ndarray, np.ndarray)),
                  ('t_ints', (np.ndarray, int)),
                  ('bws', (np.ndarray, float)),
                  ('chanws', (np.ndarray, float))),
    'rrls': (('times', (np.ndarray, float)),
             ('lines', (np.ndarray, str)),
             ('t_obs', (np.ndarray, int)),
             ('tscps', (np.ndarray, np.ndarray)),
             ('t_ints', (np.ndarray, int)),
             ('bws', (np.ndarray, float)),
             ('chanws', (np.ndarray, float))),
}


def check_model_params(params) -> Optional[Exception]:
    """Validate a model params dict (reference functions.py:127-190)."""
    if not isinstance(params, dict):
        return TypeError("model params must be dict")
    err = _param_key_check(params, _MODEL_KEYS, optional=_MODEL_OPTIONAL)
    if isinstance(err, Exception):
        return err
    # _param_key_check waives the type check for None values, so guard
    # the .upper()/parse calls: the module contract is RETURN, not raise
    if not isinstance(params['target']['epoch'], str) or \
            params['target']['epoch'].upper() not in ('J2000', 'B1950'):
        return ValueError("Only epochs B1950 and J2000 are supported as "
                          "values for epoch within model parameters' "
                          "target specifications")
    try:
        parse_ra(params['target']['ra'])
        parse_dec(params['target']['dec'])
    except (ValueError, IndexError, TypeError, AttributeError):
        return ValueError("Please check validity of sexagesimal coordinates "
                          "within ra/dec fields of target section of model "
                          "params")
    return None


def check_pline_params(params) -> Optional[Exception]:
    """Validate a pipeline params dict (reference functions.py:92-124)."""
    if not isinstance(params, dict):
        return TypeError("pipeline params must be dict")
    err = _param_key_check(params, _PIPELINE_KEYS)
    if isinstance(err, Exception):
        return err
    for band in ('continuum', 'rrls'):
        shape = np.shape(params[band]['tscps'])
        if shape not in ((0,), ()) and params[band]['tscps'] is not None:
            if len(shape) != 2 or shape[1] != 2:
                return ValueError(
                    f"np.ndarray of params's section {band}'s value, tscps, "
                    "must be of shape (n, 2)")
    return None


def migrate_legacy_model_params(params: dict) -> dict:
    """Accept the reference's *older* model-params schema (its bundled
    test_cases fixtures use ``properties.mlr`` + ``properties.n_0`` and lack
    ``mlr_bj``/``mlr_rj``/``ejection.which`` — SURVEY §4) and translate to
    the current schema.  Returns a (shallow-copied) migrated dict."""
    p = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}
    props = p.get('properties', {})
    if 'mlr_bj' not in props and 'mlr' in props:
        props['mlr_bj'] = float(props['mlr'])
        props['mlr_rj'] = float(props['mlr'])
    ej = p.get('ejection', {})
    if 'which' not in ej and 't_0' in ej:
        ej['which'] = np.array(['RB'] * len(ej['t_0']))
    return p
