"""Generate an ADVERSARIAL twin of the sf0.001 testdata for oracle sweeps.

The driver's tables are clean: no nulls, ascii text, no duplicate texts.
Engine-vs-oracle agreement on nulls / empty strings / unicode has therefore
never been *executed*, only asserted by convention (round-3 ADVICE: "latent
divergence on data with null keys — current testdata has none"). This
script starts from the real sf0.001 tables and APPENDS deterministic
adversarial rows, so every query keeps its expected scale/shape while the
nasty cases ride along:

- documents: empty / whitespace-only / 1-char text, CJK + emoji text (with
  a planted identical pair), an exact duplicate of an existing doc, a
  mass-repetition doc, null lang / null source / null n_chars.
- events: null user_id / ts / value / event_type / props, malformed JSON
  props, float-valued and >int64 numeric props (extract_json_int must
  yield null, not raise or truncate).
- customer / orders / lineitem: null join keys (c_nationkey, o_custkey),
  null measures (acctbal, totalprice, quantity), null group keys
  (mktsegment, returnflag), null timestamps (shipdate, orderdate).
- embeddings: all-zero vector (norm guard), an identical-vector pair,
  extreme magnitudes, null label.

Contract-respecting by design — the engine's DOCUMENTED input contracts
are not violated: doc_id / event_id / vec_id stay unique and non-null
(deterministic_shuffle + packing require it), text is never null (dedup
kernels raise by contract; empty string is the legal "nothing" value),
embeddings are never null/ragged, and text contains no \\x0b (the
tokenizer's ascii_split_whitespace ≡ \\s+ parity is documented for
\\x0b-free corpora).

Usage:
    python scripts/gen_adversarial_testdata.py [--src /root/testdata/sf0.001]
        [--out /tmp/sf_adv]

Then:  python scripts/check_oracles.py --sf /tmp/sf_adv --rows-only
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

CJK = "深度学习模型的训练数据需要大规模去重处理。质量过滤器会删除重复的网页。"
EMOJI = "café naïve résumé \U0001f600\U0001f680 über straße"


def _ts(s: str):
    import pandas as pd

    return pd.Timestamp(s)


def _append(tbl: pa.Table, rows: list[dict]) -> pa.Table:
    """Append rows (dicts; missing keys -> null) preserving the schema."""
    cols = {}
    for field in tbl.schema:
        vals = [r.get(field.name) for r in rows]
        cols[field.name] = pa.array(vals, type=field.type)
    extra = pa.table(cols)
    return pa.concat_tables([tbl, extra])


def adversarial_documents(tbl: pa.Table) -> pa.Table:
    next_id = int(pa.compute.max(tbl["doc_id"]).as_py()) + 1
    # an exact duplicate of an existing doc's text (new id, same content)
    first_text = tbl["text"][0].as_py()
    first_src = tbl["source"][0].as_py()
    rows = [
        dict(doc_id=next_id + 0, text="", lang="en", source="adv",
             n_chars=0),
        dict(doc_id=next_id + 1, text="   \t\n  ", lang="en", source="adv",
             n_chars=7),
        dict(doc_id=next_id + 2, text="x", lang="en", source="adv",
             n_chars=1),
        dict(doc_id=next_id + 3, text=CJK, lang="zh", source="adv",
             n_chars=len(CJK)),
        dict(doc_id=next_id + 4, text=CJK, lang="zh", source="adv",
             n_chars=len(CJK)),  # identical CJK pair (near-dup recall)
        dict(doc_id=next_id + 5, text=EMOJI, lang=None, source="adv",
             n_chars=len(EMOJI)),
        dict(doc_id=next_id + 6, text=first_text, lang="en",
             source=first_src, n_chars=len(first_text)),  # exact dup
        dict(doc_id=next_id + 7, text=("spam " * 400).strip(), lang="en",
             source="adv", n_chars=5 * 400 - 1),  # mass repetition
        dict(doc_id=next_id + 8, text="null source row", lang="en",
             source=None, n_chars=15),
        dict(doc_id=next_id + 9, text="null nchars row", lang="en",
             source="adv", n_chars=None),
        dict(doc_id=next_id + 10, text="tab\tand\nnewline\rand\fformfeed",
             lang="en", source="adv", n_chars=29),
    ]
    return _append(tbl, rows)


def adversarial_events(tbl: pa.Table) -> pa.Table:
    next_id = int(pa.compute.max(tbl["event_id"]).as_py()) + 1
    t0 = _ts("2024-06-01 00:00:00")
    rows = [
        dict(event_id=next_id + 0, ts=t0, user_id=None, event_type="click",
             value=1.0, props='{"k": 3}'),
        dict(event_id=next_id + 1, ts=None, user_id=7, event_type="view",
             value=2.0, props='{"k": 4}'),
        dict(event_id=next_id + 2, ts=t0, user_id=7, event_type=None,
             value=3.0, props='{"k": 5}'),
        dict(event_id=next_id + 3, ts=t0, user_id=8, event_type="click",
             value=None, props='{"k": 6}'),
        dict(event_id=next_id + 4, ts=t0, user_id=8, event_type="view",
             value=4.0, props=None),
        dict(event_id=next_id + 5, ts=t0, user_id=9, event_type="click",
             value=5.0, props="not json at all"),
        dict(event_id=next_id + 6, ts=t0, user_id=9, event_type="view",
             value=6.0, props='{"k": 1.5}'),  # float: int extract -> null
        dict(event_id=next_id + 7, ts=t0, user_id=10, event_type="click",
             value=7.0, props='{"k": 99999999999999999999}'),  # > int64
        dict(event_id=next_id + 8, ts=t0, user_id=10, event_type="view",
             value=8.0, props='{"k": -17}'),
    ]
    return _append(tbl, rows)


def adversarial_customer(tbl: pa.Table) -> pa.Table:
    next_key = int(pa.compute.max(tbl["c_custkey"]).as_py()) + 1
    rows = [
        dict(c_custkey=next_key + 0, c_name="adv null nation",
             c_nationkey=None, c_acctbal=10.0, c_mktsegment="BUILDING"),
        dict(c_custkey=next_key + 1, c_name="adv null bal", c_nationkey=1,
             c_acctbal=None, c_mktsegment="BUILDING"),
        dict(c_custkey=next_key + 2, c_name="adv null seg", c_nationkey=1,
             c_acctbal=20.0, c_mktsegment=None),
    ]
    return _append(tbl, rows)


def adversarial_orders(tbl: pa.Table) -> pa.Table:
    next_key = int(pa.compute.max(tbl["o_orderkey"]).as_py()) + 1
    t0 = _ts("2024-06-01 00:00:00")
    rows = [
        dict(o_orderkey=next_key + 0, o_custkey=None, o_orderstatus="O",
             o_totalprice=100.0, o_orderdate=t0, o_orderpriority="1-URGENT"),
        dict(o_orderkey=next_key + 1, o_custkey=1, o_orderstatus=None,
             o_totalprice=None, o_orderdate=None, o_orderpriority=None),
    ]
    return _append(tbl, rows)


def adversarial_lineitem(tbl: pa.Table) -> pa.Table:
    next_key = int(pa.compute.max(tbl["l_orderkey"]).as_py()) + 1
    rows = [
        dict(l_orderkey=next_key, l_partkey=1, l_suppkey=1, l_linenumber=1,
             l_quantity=None, l_extendedprice=None, l_discount=0.0,
             l_tax=0.0, l_returnflag=None, l_linestatus="O",
             l_shipdate=None),
        dict(l_orderkey=next_key, l_partkey=1, l_suppkey=1, l_linenumber=2,
             l_quantity=3.0, l_extendedprice=30.0, l_discount=0.0,
             l_tax=0.0, l_returnflag="R", l_linestatus="F",
             l_shipdate=_ts("2024-06-02 00:00:00")),
    ]
    return _append(tbl, rows)


def adversarial_embeddings(tbl: pa.Table) -> pa.Table:
    next_id = int(pa.compute.max(tbl["vec_id"]).as_py()) + 1
    dim = len(tbl["embedding"][0].as_py())
    zero = [0.0] * dim
    big = [1e6] * dim
    dup = [0.5] * dim
    rows = [
        dict(vec_id=next_id + 0, embedding=zero, label=0),   # zero norm
        dict(vec_id=next_id + 1, embedding=big, label=1),    # extreme mag
        dict(vec_id=next_id + 2, embedding=dup, label=2),    # identical pair
        dict(vec_id=next_id + 3, embedding=dup, label=2),
        dict(vec_id=next_id + 4, embedding=[0.5] * (dim - 1) + [0.5001],
             label=None),                                    # null label
    ]
    return _append(tbl, rows)


ADVERSARIAL = {
    "documents": adversarial_documents,
    "events": adversarial_events,
    "customer": adversarial_customer,
    "orders": adversarial_orders,
    "lineitem": adversarial_lineitem,
    "embeddings": adversarial_embeddings,
}


def generate(src: str, out, *, verbose: bool = False) -> None:
    """Write the adversarial twin of ``src`` into ``out`` — the ONE copy of
    the recipe, shared by the CLI and the pytest fixtures."""
    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        fn = ADVERSARIAL.get(name)
        if fn is not None:
            n0 = len(tbl)
            tbl = fn(tbl)
            if verbose:
                print(f"{name}: {n0} -> {len(tbl)} rows")
        pq.write_table(tbl, out / f"{name}.parquet")
    if verbose:
        print(f"wrote {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/sf_adv")
    args = ap.parse_args()
    generate(args.src, args.out, verbose=True)


if __name__ == "__main__":
    main()
