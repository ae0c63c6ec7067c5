"""The reference's bundled test-case parameter files (older schema) load
through the legacy-schema migration — SURVEY §4's 'schema-migration
fixtures' requirement."""
import os
import sys

import numpy as np
import pytest

from rajepy_tpu import JetModel
from rajepy_tpu.utils.validation import (check_model_params,
                                         migrate_legacy_model_params)

FIXTURE_DIR = os.path.join(
    os.environ.get("RAJEPY_REFERENCE", "/root/reference"), "test",
    "test_cases")


def _load_fixture(name):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip("reference test_cases unavailable")
    sys.path.insert(0, FIXTURE_DIR)
    try:
        mod = __import__(name[:-3])
        return {k: (dict(v) if isinstance(v, dict) else v)
                for k, v in mod.params.items()}
    finally:
        sys.path.remove(FIXTURE_DIR)
        sys.modules.pop(name[:-3], None)


@pytest.mark.parametrize("fixture", ["test1-model-params.py",
                                     "test2-model-params.py"])
def test_legacy_model_fixture_builds(fixture):
    raw = _load_fixture(fixture)
    # the old schema is rejected as-is (no mlr_bj/mlr_rj/which)...
    assert check_model_params(raw) is not None
    # ...and accepted after migration
    migrated = migrate_legacy_model_params(raw)
    assert check_model_params(migrated) is None

    migrated['grid'] = dict(migrated['grid'])
    migrated['grid'].update(n_x=12, n_y=16, n_z=12, l_z=None)
    jm = JetModel(migrated)
    assert jm.params['properties']['n_0'] > 0
    flux = jm.flux_ff(6e9)
    assert np.nansum(flux) > 0
