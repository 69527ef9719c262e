"""The correctness harness guards everything else — test its compare
logic directly (mismatch classes must be detected, benign equivalences
must pass)."""

import numpy as np
import pandas as pd

import tools.check_correctness as cc


def test_identical_frames_pass():
    a = pd.DataFrame({"x": [1, 2], "y": [1.5, 2.5]})
    assert cc.compare("t", a.copy(), a.copy()) == []


def test_row_order_insensitive():
    a = pd.DataFrame({"x": [1, 2], "y": [1.5, 2.5]})
    b = a.iloc[[1, 0]].reset_index(drop=True)
    assert cc.compare("t", a, b) == []


def test_column_order_insensitive():
    a = pd.DataFrame({"x": [1], "y": [2.0]})
    b = a[["y", "x"]]
    assert cc.compare("t", a, b) == []


def test_value_mismatch_detected():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1, 3]})
    assert any("MISMATCH" in e for e in cc.compare("t", a, b))


def test_float_ulp_diff_is_close_not_ok():
    a = pd.DataFrame({"x": [0.1 + 0.2]})
    b = pd.DataFrame({"x": [0.3]})
    errs = cc.compare("t", a, b)
    assert errs and all("CLOSE" in e for e in errs)


def test_count_and_column_mismatch():
    a = pd.DataFrame({"x": [1, 2]})
    assert any("row count" in e for e in cc.compare("t", a, pd.DataFrame({"x": [1]})))
    assert any("columns" in e for e in cc.compare("t", a, pd.DataFrame({"z": [1, 2]})))


def test_dtype_kind_mismatch_detected():
    a = pd.DataFrame({"x": ["1", "2"]})
    b = pd.DataFrame({"x": [1, 2]})
    assert any("dtype kind" in e for e in cc.compare("t", a, b))


def test_list_columns_compare_as_tuples():
    a = pd.DataFrame({"x": [[1.0, 2.0]], "k": [1]})
    b = pd.DataFrame({"x": [np.array([1.0, 2.0])], "k": [1]})
    assert cc.compare("t", a, b) == []
