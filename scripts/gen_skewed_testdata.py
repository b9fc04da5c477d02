"""Generate a KEY-SKEWED twin of the sf0.001 testdata for oracle sweeps.

The clean testdata's keys are near-uniform (each source ~50 docs, each user
a handful of events), so the hot-key code paths — giant per-key session
scans, one group holding most rows in a keyed combiner, a dedup hash bucket
with hundreds of identical texts, massive cosine TIES in ANN selection —
had never been EXECUTED against the oracles, only reasoned about
(`tests/test_dedup_scale.py` covers the minhash bucket bound in isolation).
This script REWRITES key columns of the sf0.001 tables deterministically
(no RNG, pure id arithmetic), preserving every documented input contract
(unique non-null doc_id/event_id/vec_id, non-null text, fixed-dim
embeddings):

- documents: ~90% of docs reassigned to one hot source (doc ids with
  `id % 200 < 20` keep their original source, so ALL original sources
  survive as small groups next to the hot one); every third doc's
  (text, lang, n_chars) replaced by doc 0's — one exact-dup cluster of
  ~167 texts (exact dedup keep-first, minhash identical-signature star
  collapse, heavy-hitter token skew: doc 0's tokens now dominate the
  corpus).
- events: ~90% of events reassigned to one hot user (giant session /
  rolling-window / transition segments under one key); ts/value/type
  untouched so time semantics stay realistic.
- orders: ~90% reassigned to one hot customer (top-k-per-group with one
  group holding ~1350 rows; join fan-out skew onto one build key).
- embeddings: every second vector replaced by vector 0 (a 250-wide
  identical-vector cluster: embedding-LSH degenerate bucket, ANN top-k
  where ALL candidates tie on cosine — the (cosine desc, id asc)
  tie-break is what keeps the result well-defined and oracle-matched).

Usage:
    python scripts/gen_skewed_testdata.py [--src /root/testdata/sf0.001]
        [--out /tmp/sf_skew]

Then:  python scripts/check_oracles.py --sf /tmp/sf_skew --rows-only
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

HOT_SOURCE = "hot-source"


def _replace(tbl: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    i = tbl.schema.get_field_index(name)
    return tbl.set_column(i, tbl.schema.field(i).name,
                          arr.cast(tbl.schema.field(i).type))


def skew_documents(tbl: pa.Table) -> pa.Table:
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    # ~90% of docs to one hot source; sources are assigned round-robin by
    # id, so keep a full id-run per 200-block (`id % 200 < 20`) to let
    # EVERY original source survive as a small group beside the hot one
    src = tbl["source"].to_pylist()
    hot = ids % 200 >= 20
    src = [HOT_SOURCE if h else s for h, s in zip(hot, src)]
    tbl = _replace(tbl, "source", pa.array(src, type=pa.string()))
    # every third doc becomes an exact text-dup of doc 0 (text, lang and
    # n_chars move together so the n_chars == len(text) invariant holds)
    text = tbl["text"].to_pylist()
    lang = tbl["lang"].to_pylist()
    nch = tbl["n_chars"].to_pylist()
    dup = ids % 3 == 0
    # donor selected BY ID (min doc_id = doc 0 on the clean base), not by
    # row position — the generator's output must be a function of the row
    # set so it composes with the row-shuffled sweep
    donor = int(np.argmin(ids))
    t0, l0, n0 = text[donor], lang[donor], nch[donor]
    text = [t0 if d else t for d, t in zip(dup, text)]
    lang = [l0 if d else x for d, x in zip(dup, lang)]
    nch = [n0 if d else x for d, x in zip(dup, nch)]
    tbl = _replace(tbl, "text", pa.array(text, type=pa.string()))
    tbl = _replace(tbl, "lang", pa.array(lang, type=pa.string()))
    return _replace(tbl, "n_chars", pa.array(nch, type=pa.int64()))


def skew_events(tbl: pa.Table) -> pa.Table:
    uid = tbl["user_id"].to_numpy(zero_copy_only=False).copy()
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)
    hot_user = int(uid.min())
    uid[eid % 10 != 0] = hot_user
    return _replace(tbl, "user_id", pa.array(uid, type=pa.int64()))


def skew_orders(tbl: pa.Table) -> pa.Table:
    cust = tbl["o_custkey"].to_numpy(zero_copy_only=False).copy()
    okey = tbl["o_orderkey"].to_numpy(zero_copy_only=False)
    hot_cust = int(cust.min())
    cust[okey % 10 != 0] = hot_cust
    return _replace(tbl, "o_custkey", pa.array(cust, type=pa.int64()))


def skew_embeddings(tbl: pa.Table) -> pa.Table:
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    emb = tbl["embedding"].to_pylist()
    v0 = emb[int(np.argmin(ids))]  # donor by id, not row position
    emb = [v0 if i % 2 == 0 else e for i, e in zip(ids, emb)]
    return _replace(tbl, "embedding",
                    pa.array(emb, type=tbl.schema.field("embedding").type))


SKEW = {
    "documents": skew_documents,
    "events": skew_events,
    "orders": skew_orders,
    "embeddings": skew_embeddings,
}


def generate(src: str, out, *, verbose: bool = False) -> None:
    """Write the skewed twin of ``src`` into ``out`` — the ONE copy of the
    recipe, shared by the CLI and the pytest fixtures."""
    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        fn = SKEW.get(name)
        if fn is not None:
            fn_out = fn(tbl)
            assert len(fn_out) == len(tbl)
            tbl = fn_out
            if verbose:
                print(f"{name}: skewed ({len(tbl)} rows)")
        pq.write_table(tbl, out / f"{name}.parquet")
    if verbose:
        print(f"wrote {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/sf_skew")
    args = ap.parse_args()
    generate(args.src, args.out, verbose=True)


if __name__ == "__main__":
    main()
