"""Meta-test of the local oracle gate's comparator: the gate is only as
trustworthy as its compare() — prove it actually flags every corruption
class (value drift beyond tolerance, renamed column, missing row, row
swap producing different values) and accepts only genuine equality
(order-insensitive, NaN==NaN, sub-tolerance float noise)."""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from verify_gate import compare  # noqa: E402


def _df(**cols):
    return pd.DataFrame(cols)


def test_compare_accepts_equal_frames_any_row_order():
    a = _df(k=["x", "y"], v=[1.0, 2.0])
    b = _df(k=["y", "x"], v=[2.0, 1.0])
    assert compare(a, b) is None


def test_compare_accepts_nan_pairs_and_sub_tolerance_noise():
    a = _df(k=["x", "y"], v=[float("nan"), 1.0])
    b = _df(k=["x", "y"], v=[float("nan"), 1.0 + 1e-12])
    assert compare(a, b) is None


def test_compare_flags_value_drift_beyond_tolerance():
    a = _df(k=["x"], v=[1.0])
    b = _df(k=["x"], v=[1.001])
    assert compare(a, b) is not None


def test_compare_flags_renamed_column():
    assert compare(_df(k=["x"], v=[1.0]), _df(k=["x"], w=[1.0])) is not None


def test_compare_flags_missing_row():
    a = _df(k=["x", "y"], v=[1.0, 2.0])
    b = _df(k=["x"], v=[1.0])
    assert compare(a, b) is not None


def test_compare_flags_swapped_values_same_multiset_per_column():
    # same value multisets per column but different row associations
    a = _df(k=["x", "y"], v=[1.0, 2.0])
    b = _df(k=["x", "y"], v=[2.0, 1.0])
    assert compare(a, b) is not None


def test_compare_flags_null_vs_value():
    a = _df(k=["x"], v=[None])
    b = _df(k=["x"], v=["z"])
    assert compare(a, b) is not None
