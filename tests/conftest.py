import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclass_array_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests", cpus="8")


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def assert_np_equal(table, expected: dict[str, np.ndarray], rtol=1e-6):
    """Tree-aware compare of a DcaTable against numpy arrays (shape,
    dtype-kind, values) — analog of reference testing.py:38-86."""
    got = table.to_numpy_fields()
    assert set(got) == set(expected), f"fields {set(got)} != {set(expected)}"
    for k, exp in expected.items():
        g = got[k]
        assert g.shape == exp.shape, f"{k}: shape {g.shape} != {exp.shape}"
        np.testing.assert_allclose(
            g.astype(np.float64, copy=False) if g.dtype.kind in "fiu" else g,
            exp.astype(np.float64, copy=False) if exp.dtype.kind in "fiu" else exp,
            rtol=rtol,
            err_msg=f"field {k}",
        )
