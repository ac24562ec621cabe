"""Unit tests for the local oracle-mirror comparator itself (the gate's
own blind spots, per ADVICE round 1/2): NULL vs NaN must NOT be conflated
in object columns, and int-vs-float dtype divergence is a hard failure."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.oracle_utils import compare_frames


def test_null_vs_nan_object_column_mismatches():
    a = pd.DataFrame({"k": [1, 2], "v": pd.array([None, "x"], dtype=object)})
    b = pd.DataFrame({"k": [1, 2], "v": pd.array([float("nan"), "x"], dtype=object)})
    problems = compare_frames(a, b)
    assert problems, "NULL-vs-NaN divergence in an object column slipped through"


def test_nan_matches_nan_in_float_column():
    # Both engines surface SQL NULL in a float column as NaN after pandas
    # collection — identical NaNs must compare equal.
    a = pd.DataFrame({"v": [1.5, float("nan")]})
    b = pd.DataFrame({"v": [float("nan"), 1.5]})
    assert compare_frames(a, b) == []


def test_int_float_dtype_divergence_is_hard_failure():
    a = pd.DataFrame({"n": np.array([3], dtype=np.int64)})
    b = pd.DataFrame({"n": np.array([3.0], dtype=np.float64)})
    problems = compare_frames(a, b)
    assert any("dtype divergence" in p for p in problems), problems


def test_identical_ints_match():
    a = pd.DataFrame({"n": np.array([3, 4], dtype=np.int64)})
    b = pd.DataFrame({"n": np.array([4, 3], dtype=np.int64)})
    assert compare_frames(a, b) == []
