"""Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
Language Models: ... Gopher", §A1.1 repetition filters): the fraction of a
document covered by its most-frequent word n-gram and the fraction of
duplicated n-gram occurrences. Mass boilerplate (headers, navbars, mirrored
pages) shows up as a few dominant n-grams; these two signals are the
standard web-crawl filter for it.

Everything is computed per batch with one whitespace split, one dictionary
encode, and one lexsort over the batch's bigrams — no Python loop over rows
or tokens. Tie-breaks (equal top counts) touch only the tied candidates.

Scale: stateless ``map_batches`` stage; output is one row per input row.
No shuffle, no driver state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import _as_array, doc_bigram_codes, flat_tokens


def repetition_features(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Append per-document bigram-repetition columns to a batch.

    Columns appended:

    - ``n_bigrams``      int64  — token bigram occurrences (max(n_tokens-1, 0))
    - ``top_bigram``     string — most frequent bigram ``"a b"`` (ties: the
      lexicographically smallest pair); ``""`` when the doc has no bigram
    - ``top_bigram_count`` int64
    - ``top_bigram_char_frac`` float64 — characters covered by occurrences of
      the top bigram, ``count * (len(a) + 1 + len(b)) / len(text)`` (the
      joining space counts once per occurrence, matching the Gopher
      "fraction of characters in the most common n-gram" definition)
    - ``dup_bigram_frac`` float64 — fraction of bigram occurrences that are
      repeats of an earlier occurrence, ``(n_bigrams - n_distinct_bigrams)
      / n_bigrams`` (0.0 when the doc has no bigram)
    """
    n = len(batch)
    text = _as_array(batch[text_column])
    if text.null_count:
        text = pc.fill_null(text, "")
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)

    flat, parents = flat_tokens(text)
    _codes, a, b, d, vocab = doc_bigram_codes(flat, parents)

    n_bigrams = np.zeros(n, dtype=np.int64)
    np.add.at(n_bigrams, d, 1)

    top_count = np.zeros(n, dtype=np.int64)
    n_uniq = np.zeros(n, dtype=np.int64)
    top_bigram = np.full(n, "", dtype=object)
    top_cover = np.zeros(n, dtype=np.int64)

    if len(d):
        order = np.lexsort((b, a, d))
        ds_, as_, bs_ = d[order], a[order], b[order]
        boundary = np.r_[True, (np.diff(ds_) != 0) | (np.diff(as_) != 0)
                         | (np.diff(bs_) != 0)]
        starts = np.flatnonzero(boundary)
        cnts = np.diff(np.r_[starts, len(ds_)])
        udoc, ua, ub = ds_[starts], as_[starts], bs_[starts]

        np.add.at(n_uniq, udoc, 1)
        np.maximum.at(top_count, udoc, cnts)

        # only ties for the per-doc max need string comparison
        cand = cnts == top_count[udoc]
        a_str = vocab.take(pa.array(ua[cand])).to_pylist()
        b_str = vocab.take(pa.array(ub[cand])).to_pylist()
        pick = (pd.DataFrame({"doc": udoc[cand], "a": a_str, "b": b_str})
                .sort_values(["doc", "a", "b"], kind="stable")
                .drop_duplicates("doc"))
        rows = pick["doc"].to_numpy()
        a_len = pick["a"].str.len().to_numpy(dtype=np.int64)
        b_len = pick["b"].str.len().to_numpy(dtype=np.int64)
        top_bigram[rows] = (pick["a"] + " " + pick["b"]).to_numpy(dtype=object)
        top_cover[rows] = top_count[rows] * (a_len + 1 + b_len)

    safe_chars = np.maximum(n_chars, 1)
    safe_bigrams = np.maximum(n_bigrams, 1)
    out = batch
    for name, arr in [
        ("n_bigrams", pa.array(n_bigrams)),
        ("top_bigram", pa.array(top_bigram, type=pa.string())),
        ("top_bigram_count", pa.array(top_count)),
        ("top_bigram_char_frac", pa.array(top_cover / safe_chars)),
        ("dup_bigram_frac", pa.array((n_bigrams - n_uniq) / safe_bigrams)),
    ]:
        out = out.append_column(name, arr)
    return out
