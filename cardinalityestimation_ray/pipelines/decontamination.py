"""Eval-set decontamination: flag training documents sharing word n-grams
with a held-out evaluation set (the standard contamination check run
before pretraining — e.g. GPT-3 appendix C / PaLM-style 13-gram overlap).

Ray-Data shape: the EVAL side is tiny (benchmarks are a few MB) — its
distinct n-gram hash set broadcasts once via ``ray.put`` as a SORTED
uint64 array; the corpus side streams through one ``map_batches`` pass
computing per-document distinct gram hashes (the same vectorized
fold-of-token-hashes kernel the exact similarity join uses,
`pipelines/similarity.py:_word_ngram_hashes`) and membership via
``np.searchsorted`` against the broadcast array. No shuffle, no join, no
corpus materialization; the output is one row per document.

Collision note: grams compare by 64-bit fold hash, so a cross-gram
collision could overcount matches with probability ~ (distinct grams)^2 /
2^64 — negligible at eval-set scale and irrelevant for the contaminated
flag's intended use (candidate removal). The SQL oracle at test scale is
collision-free, which the driver check confirms empirically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import hashing
from .similarity import _word_ngram_hashes


def _distinct_grams_per_doc(text: pa.Array, n: int, hash_name: str
                            ) -> tuple[np.ndarray, np.ndarray]:
    """(distinct gram hashes, parents) — occurrences deduped within doc."""
    g, par = _word_ngram_hashes(text, n, hash_name)
    if len(g) == 0:
        return g, par
    # sort by (doc, gram) once; keep first occurrence per (doc, gram)
    order = np.lexsort((g, par))
    gs, ps = g[order], par[order]
    first = np.r_[True, (gs[1:] != gs[:-1]) | (ps[1:] != ps[:-1])]
    return gs[first], ps[first]


def _gram_membership(sorted_grams: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Boolean membership of each gram hash in the SORTED broadcast set
    (searchsorted + sentinel-clamped equality — shared by the report and
    the filtering pass so the idiom lives once)."""
    if len(g) == 0 or len(sorted_grams) == 0:
        return np.zeros(len(g), dtype=bool)
    pos = np.searchsorted(sorted_grams, g)
    pos[pos == len(sorted_grams)] = 0
    return sorted_grams[pos] == g


def eval_gram_set(eval_texts, n: int = 13, *,
                  hash_name: str = hashing.DEFAULT_HASH) -> np.ndarray:
    """Distinct word-n-gram hash set of the eval texts (sorted uint64).

    ``eval_texts`` is a list/array of strings — benchmark eval sets are
    driver-sized; for a parquet-backed eval set read the column first.
    """
    arr = pa.array(list(eval_texts), type=pa.string())
    g, _ = _word_ngram_hashes(arr, n, hash_name)
    return np.unique(g)


def decontaminate(corpus_ds, eval_texts, *, n: int = 13,
                  text_column: str = "text", id_column: str = "doc_id",
                  hash_name: str = hashing.DEFAULT_HASH):
    """Per-document contamination report against an eval set.

    Returns a Dataset with one row per corpus document:
    (id, n_grams, n_matched, contaminated) where ``n_grams`` is the
    document's DISTINCT word-n-gram count, ``n_matched`` how many of those
    occur in the eval set, and ``contaminated`` = n_matched > 0. Filter
    ``contaminated`` rows out (or threshold on n_matched) to produce the
    clean training corpus.
    """
    import ray

    grams = eval_gram_set(eval_texts, n, hash_name=hash_name)
    grams_ref = ray.put(grams)

    class Check:
        def __init__(self):
            self.grams = ray.get(grams_ref)  # fetched once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            text = batch[text_column]
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            g, par = _distinct_grams_per_doc(text, n, hash_name)
            n_rows = len(batch)
            n_grams = np.zeros(n_rows, dtype=np.int64)
            n_matched = np.zeros(n_rows, dtype=np.int64)
            if len(g):
                np.add.at(n_grams, par, 1)
                hit = _gram_membership(self.grams, g)
                np.add.at(n_matched, par[hit], 1)
            return pa.table({
                id_column: batch[id_column],
                "n_grams": pa.array(n_grams),
                "n_matched": pa.array(n_matched),
                "contaminated": pa.array(n_matched > 0),
            })

    return corpus_ds.map_batches(Check, batch_format="pyarrow",
                                 concurrency=(1, 8))


def decontaminated_corpus(corpus_ds, eval_texts, *, n: int = 13,
                          text_column: str = "text",
                          hash_name: str = hashing.DEFAULT_HASH):
    """The clean corpus: drop every contaminated document (semi-join of the
    report back onto the stream via a second pass of the same broadcast
    check — still no shuffle). Explicit keywords (no silent kwargs.get
    defaults — unknown parameters must raise, round-3 review rule)."""
    import ray

    grams = eval_gram_set(eval_texts, n, hash_name=hash_name)
    grams_ref = ray.put(grams)

    class KeepClean:
        def __init__(self):
            self.grams = ray.get(grams_ref)  # fetched once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            text = batch[text_column]
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            g, par = _distinct_grams_per_doc(text, n, hash_name)
            bad = np.zeros(len(batch), dtype=bool)
            hit = _gram_membership(self.grams, g)
            if hit.any():
                bad[np.unique(par[hit])] = True
            return batch.filter(pa.array(~bad))

    return corpus_ds.map_batches(KeepClean, batch_format="pyarrow",
                                 concurrency=(1, 8))
