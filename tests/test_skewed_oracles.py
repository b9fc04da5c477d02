"""Key-skew oracle parity (round-4 session 8).

The driver's testdata is near-uniform — every source holds ~50 docs, every
user a handful of events — so the HOT-KEY code paths (a giant per-key
segmented scan, one group holding ~90% of the rows in a keyed combiner, a
dedup bucket with hundreds of IDENTICAL texts, ANN selection where all
candidates tie on cosine) had been reasoned about but never executed
against the oracles until the round-4 skew sweep
(`scripts/gen_skewed_testdata.py`), which surfaced 2 real divergences:

- `exact_dup_pairs` star-collapsed a 167-doc identical-signature cluster
  above `identical_cap` while its oracle asserts the full SQL self-join —
  the control now pins a test-scale cap (all-pairs), with the capped/star
  production semantics still covered by `minhash_dedup_keep*`.
- `ntok_quantile_rank_errors` measured rank error against the ONE-SIDED
  empirical CDF F(v); with 33% of docs tied at one n_tok a perfectly
  correct quantile sits up to 0.33 rank away from q on F(v). The bound now
  uses the tie-correct distance from q to the CDF step [F(v-), F(v)].

This module regenerates the skewed tables into a tmp dir and runs one
representative query per hot-key class through the same dtype-sensitive
compare the standalone sweep uses. Full-surface skew runs stay in the
script (`--sf /tmp/sf_skew`; expected 88/91 — the 3 reds are per-source
distinct-DOC estimates whose hot source holds 440 >> 100 distinct docs,
past the direct-exact regime the count(DISTINCT) oracles rely on, same
class as the documented sf0.1 matrix).
"""

from __future__ import annotations

import duckdb
import pytest

# skew_dir / skew01_dir / harness fixtures come from tests/conftest.py and
# call the generator scripts' generate() directly — ONE copy of each recipe


@pytest.fixture(scope="module")
def oracle_con(skew_dir, harness):
    con = duckdb.connect()
    for t in harness.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{skew_dir}/{t}.parquet')")
    return con


def test_skew_is_actually_planted(skew_dir):
    """Guard the fixture: the hot-key shapes the classes below rely on."""
    import collections

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{skew_dir}/documents.parquet")
    src = collections.Counter(docs["source"].to_pylist())
    assert src["hot-source"] >= 400          # one source holds ~90%
    assert len(src) == 21                    # every original source survives
    texts = docs["text"].to_pylist()
    assert sum(1 for t in texts if t == texts[0]) == 167  # identical cluster
    events = pq.read_table(f"{skew_dir}/events.parquet")
    uid = collections.Counter(events["user_id"].to_pylist())
    assert uid.most_common(1)[0][1] >= 900   # one user holds ~90% of events
    emb = pq.read_table(f"{skew_dir}/embeddings.parquet")
    vecs = emb["embedding"].to_pylist()
    assert sum(1 for v in vecs if v == vecs[0]) == 250  # identical vectors


#: one query per hot-key class:
#: - exact_dup_pairs: 167-doc identical cluster -> C(167,2) all-pairs at the
#:   control's test-scale identical_cap (the round-4 session-8 fix)
#: - ntok_quantile_rank_errors: 33% of docs tied at one n_tok -> tie-correct
#:   CDF-step rank error (the round-4 session-8 fix)
#: - exact_dedup_stats: keep-first over the giant cluster
#: - token_topk_counts: doc 0's tokens dominate the corpus (hot heavy
#:   hitters with deep tie regions)
#: - rolling_event_value_mean: one user owns a ~900-row ordered segment
#: - top_orders_per_customer: one customer owns ~1350 of 1500 orders
#: - ann_topk: 250 identical vectors -> all candidates tie on cosine; the
#:   (cosine desc, id asc) tie-break keeps the result well-defined
QUERIES = [
    "exact_dup_pairs",
    "ntok_quantile_rank_errors",
    "exact_dedup_stats",
    "token_topk_counts",
    "rolling_event_value_mean",
    "top_orders_per_customer",
    "ann_topk",
    # round 5: the HLL published-bound guarantee stays oracle-green on the
    # very base where the raw per-source distinct-doc VALUES diverge (the
    # hot source's 440 distinct docs are past the ≤100 direct-exact
    # regime) — the bound query is the all-regime twin for that red class
    "distinct_docs_error_bounds",
]


@pytest.mark.parametrize("name", QUERIES)
def test_skewed_oracle_parity(ray_session, skew_dir, harness, oracle_con,
                              name):
    import __ray_entry__ as entry

    mine = harness._canon(harness._to_pandas(entry.queries()[name](skew_dir)))
    ref = harness._canon(oracle_con.execute(entry.oracle_sql()[name]).fetchdf())
    ok, why = harness._values_match(mine, ref)
    assert ok, f"{name}: {why}"
    assert len(mine) > 0


@pytest.mark.parametrize("name", ["ann_topk", "ann_topk_ivf_exact"])
def test_ann_parity_on_10x_skew(ray_session, skew01_dir, harness, name):
    """End-to-end repro of the round-4 session-8 GEMM-tie selection bug:
    on the sf0.01 skew base, one row of the 250-way identical-vector tie
    got a 1-ulp-high float32 GEMM score (sgemm edge-column reduction) and
    raw-GEMM local selection ejected the id the global (exact cosine desc,
    id asc) tie-break prefers. Selection now prefilters with the GEMM and
    re-ranks candidates by the exact per-row float64 cosine."""
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in harness.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{skew01_dir}/{t}.parquet')")
    mine = harness._canon(
        harness._to_pandas(entry.queries()[name](skew01_dir)))
    ref = harness._canon(con.execute(entry.oracle_sql()[name]).fetchdf())
    ok, why = harness._values_match(mine, ref)
    assert ok, f"{name}: {why}"
    assert len(mine) > 0


def test_local_topk_matches_float64_reference():
    """Contract of the ANN local selection: a pure per-row function —
    identical output to brute-force float64 scoring with the
    (exact cosine desc, id asc) tie-break, on inputs with a giant exact
    tie cluster AND near-ties at the k boundary (the regime where raw
    float32 GEMM selection misorders)."""
    import numpy as np

    from cardinalityestimation_ray.pipelines.ann import (
        _exact_cosine,
        _local_topk,
        _normalize,
    )

    rng = np.random.default_rng(42)
    d, k = 64, 5
    base = rng.standard_normal((250, d)).astype(np.float32)
    v0 = base[0:1]
    x = np.concatenate([base, np.repeat(v0, 250, axis=0)])  # 250-way tie
    # near-ties at the boundary: rows within ~1 ulp of each other
    jitter = v0 + np.float32(1e-7) * rng.standard_normal((20, d)).astype(
        np.float32)
    x = _normalize(np.concatenate([x, jitter]))
    ids = rng.permutation(len(x)).astype(np.int64)  # ids not row-ordered
    q_f4 = _normalize(np.concatenate([v0, base[3:5]]))
    q64 = q_f4.astype(np.float64)

    got = {qi: (sel.tolist(), cos.tolist())
           for qi, sel, cos in _local_topk(x, ids, q_f4, q64, k)}
    for qi in range(len(q_f4)):
        exact = _exact_cosine(x, q64[qi])
        order = np.lexsort((ids, -exact))[:k]
        assert got[qi][0] == ids[order].tolist(), f"query {qi}"
        assert got[qi][1] == exact[order].tolist(), f"query {qi}"


def test_exact_dup_pairs_covers_giant_cluster(ray_session, skew_dir):
    """The control emits the FULL C(167,2) pair set (no star collapse at
    the test-scale cap) — the skew sweep's headline catch."""
    import __ray_entry__ as entry

    out = entry.queries()["exact_dup_pairs"](skew_dir)
    assert len(out) >= 167 * 166 // 2
