"""Gopher-style repetition signals: vectorized batch kernel vs a plain
per-document Python reference, plus edge cases (empty text, nulls, single
token, ties)."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cardinalityestimation_ray.functions.repetition import repetition_features


def _reference(texts: list[str | None]) -> list[dict]:
    out = []
    for text in texts:
        text = text or ""
        toks = [t for t in text.split() if t]
        bigrams = list(zip(toks, toks[1:]))
        n_chars = len(text)
        if not bigrams:
            out.append({"n_bigrams": 0, "top_bigram": "",
                        "top_bigram_count": 0, "top_bigram_char_frac": 0.0,
                        "dup_bigram_frac": 0.0})
            continue
        cnt = Counter(bigrams)
        # tie-break: highest count, then lexicographically smallest pair
        top_count = max(cnt.values())
        tied = sorted(k for k, v in cnt.items() if v == top_count)
        a, b = tied[0]
        cover = top_count * (len(a) + 1 + len(b))
        out.append({
            "n_bigrams": len(bigrams),
            "top_bigram": f"{a} {b}",
            "top_bigram_count": top_count,
            "top_bigram_char_frac": cover / max(n_chars, 1),
            "dup_bigram_frac": (len(bigrams) - len(cnt)) / len(bigrams),
        })
    return out


def _run(texts: list[str | None]) -> list[dict]:
    batch = pa.table({"doc_id": list(range(len(texts))),
                      "text": pa.array(texts, type=pa.string())})
    cols = ["n_bigrams", "top_bigram", "top_bigram_count",
            "top_bigram_char_frac", "dup_bigram_frac"]
    got = repetition_features(batch).to_pandas()
    return got[cols].to_dict("records")


CASES = [
    "a b a b c",          # repeated bigram
    "",                   # empty
    None,                 # null text
    "solo",               # no bigram
    "q q q q",            # overlapping occurrences of the same bigram
    "z a z b z a z b",    # tie between "z a" and "z b" -> pick "z a"
    "  padded   spaces  ",
    "aa bb aa bb aa",
]


def test_reference_parity_handpicked():
    got = _run(CASES)
    want = _reference(CASES)
    for g, w, case in zip(got, want, CASES):
        for k in w:
            if isinstance(w[k], float):
                assert g[k] == pytest.approx(w[k]), (case, k)
            else:
                assert g[k] == w[k], (case, k)


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=30), min_size=1,
    max_size=8))
def test_reference_parity_property(texts):
    got = _run(texts)
    want = _reference(texts)
    for g, w in zip(got, want):
        for k in w:
            if isinstance(w[k], float):
                assert g[k] == pytest.approx(w[k]), (texts, k)
            else:
                assert g[k] == w[k], (texts, k)


def test_batch_append_preserves_input_columns():
    batch = pa.table({"doc_id": [7], "text": ["a b"], "extra": [1.5]})
    out = repetition_features(batch)
    assert out.column_names[:3] == ["doc_id", "text", "extra"]
    assert out["doc_id"].to_pylist() == [7]


def test_gopher_coverage_can_exceed_one():
    # overlapping occurrences ("q q q q" has 3 occurrences of "q q", each
    # covering 3 chars of a 7-char doc) -- matches the published definition,
    # callers clip when they want a [0, 1] filter signal
    (row,) = _run(["q q q q"])
    assert row["top_bigram_char_frac"] == pytest.approx(9 / 7)
