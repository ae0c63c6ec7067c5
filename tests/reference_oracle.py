"""Load the reference RaJePy package (read-only, at /root/reference) as a
float64-numpy oracle for behaviour-parity tests.

The reference is 2021-era Python; shims below bridge numpy 2 / pandas 3 and
stub the astropy/uncertainties imports (none of the numerics under test
depend on them).  Every parity test must call :func:`get_reference` and
skip when it returns None (reference tree not available).
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE_PATH = os.environ.get("RAJEPY_REFERENCE", "/root/reference")

_cached = None
_failed = False


def _make_mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _FakeSkyCoord:
    def __init__(self, ra, dec, unit=None, frame=None):
        self.ra = ra
        self.dec = dec

    def to_string(self, *a, **k):
        return f"{self.ra} {self.dec}"


def get_reference():
    """Return the imported reference package (module ``RaJePy``) or None."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    if not os.path.isdir(REFERENCE_PATH):
        _failed = True
        return None
    try:
        import numpy as np
        import pandas as pd
        # numpy 2 / pandas 3 compatibility for the 2021-era reference
        np.float = float
        np.NaN = np.nan
        np.str = str
        if not hasattr(pd.DataFrame, "applymap"):
            pd.DataFrame.applymap = pd.DataFrame.map

        if "astropy" not in sys.modules:
            _make_mod("astropy")
            _make_mod("astropy.units", hourangle=1, degree=1, deg=1, hour=1)
            _make_mod("astropy.coordinates", SkyCoord=_FakeSkyCoord)
            _make_mod("astropy.coordinates.angles", Longitude=None,
                      Latitude=None, Angle=None)
            _make_mod("astropy.io", fits=None)
            _make_mod("astropy.io.fits")
        if "uncertainties" not in sys.modules:
            _make_mod("uncertainties", ufloat=lambda a, b: a)

        spec = importlib.util.spec_from_file_location(
            "RaJePy", os.path.join(REFERENCE_PATH, "__init__.py"),
            submodule_search_locations=[REFERENCE_PATH])
        mod = importlib.util.module_from_spec(spec)
        sys.modules["RaJePy"] = mod
        spec.loader.exec_module(mod)
        _cached = mod
        return mod
    except Exception:
        _failed = True
        return None


def reference_jetmodel(params):
    """Instantiate the reference JetModel silently from a params dict."""
    ref = get_reference()
    if ref is None:
        return None
    from RaJePy.logger.logger import Log as RefLog
    import tempfile
    log = RefLog(os.path.join(tempfile.mkdtemp(), "ref.log"), verbose=False)
    # deep-copy params: the reference mutates its params dict
    import copy
    return ref.classes.JetModel(copy.deepcopy(params), log=log)
