"""The local oracle harness must be driver-equivalent: dtype-KIND-sensitive
(an int64 engine column vs a float64 oracle column FAILS even when values
are numerically equal — the class of failure that kept doc_repetition_stats
red for a round) while tolerating float noise within rtol=1e-9."""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "check_oracles",
    Path(__file__).resolve().parent.parent / "scripts" / "check_oracles.py")
co = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(co)


def _match(a, b):
    return co._values_match(co._canon(a), co._canon(b))


def test_int_vs_float_dtype_fails_even_when_equal():
    a = pd.DataFrame({"k": [1, 2], "v": pd.array([3, 0], dtype="int64")})
    b = pd.DataFrame({"k": [1, 2], "v": pd.array([3.0, 0.0],
                                                 dtype="float64")})
    ok, why = _match(a, b)
    assert not ok and "dtype" in why


def test_identical_frames_pass_any_row_and_column_order():
    a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    b = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    ok, _ = _match(a, b)
    assert ok


def test_float_noise_within_rtol_passes_but_real_diff_fails():
    a = pd.DataFrame({"v": [1.0, 2.0]})
    ok, _ = _match(a, pd.DataFrame({"v": [1.0 + 1e-12, 2.0]}))
    assert ok
    ok, why = _match(a, pd.DataFrame({"v": [1.001, 2.0]}))
    assert not ok


def test_nan_matches_nan_and_int_values_are_exact():
    a = pd.DataFrame({"v": [np.nan, 1.5]})
    ok, _ = _match(a, pd.DataFrame({"v": [np.nan, 1.5]}))
    assert ok
    a = pd.DataFrame({"v": pd.array([5], dtype="int64")})
    ok, _ = _match(a, pd.DataFrame({"v": pd.array([6], dtype="int64")}))
    assert not ok


def test_row_count_and_schema_mismatches_fail():
    a = pd.DataFrame({"v": [1, 2]})
    ok, why = _match(a, pd.DataFrame({"v": [1]}))
    assert not ok and "rows" in why
    ok, why = _match(a, pd.DataFrame({"w": [1, 2]}))
    assert not ok and "schema" in why


def test_unsigned_and_signed_int_kinds_unify():
    a = pd.DataFrame({"v": pd.array([3], dtype="uint32")})
    b = pd.DataFrame({"v": pd.array([3], dtype="int64")})
    ok, _ = _match(a, b)
    assert ok


def test_duplicate_rows_must_match_in_multiplicity():
    a = pd.DataFrame({"v": [1, 1, 2]})
    b = pd.DataFrame({"v": [1, 2, 2]})
    ok, _ = _match(a, b)
    assert not ok
