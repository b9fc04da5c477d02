"""Self-check harness mirroring the driver's correctness gate: run each
``queries()`` entry AND its ``oracle_sql()`` through DuckDB over the same
parquet tables, then compare row-count, schema (column names sorted), and
values DTYPE-SENSITIVELY (columns sorted by name, rows canonically sorted;
an int64 engine column vs a float64 oracle column FAILS even when values
are numerically equal — this is the class of failure the driver's
hash_match catches and a tolerant numeric compare hides, e.g. a DuckDB
HUGEINT aggregate that pandas renders as float64 against an engine int64).

Usage:
    python scripts/check_oracles.py [--sf /root/testdata/sf0.01] \
        [--rows-only] [q1 q2 ...]

Runs all oracle-backed queries when no names are given; ``--rows-only``
additionally executes the no-oracle queries and checks they return rows.
Exits non-zero on any mismatch. Owns its own Ray session (the driver inits
Ray itself; this script is a CLI entry point).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

#: rows-only queries where an EMPTY result is the expected outcome at the
#: test scales (negative controls) — everything else must return rows
EMPTY_OK: set[str] = set()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by the stringified row key.

    The row sort is dtype-agnostic (string key) so that an engine/oracle
    dtype mismatch still lines rows up for the diagnostic compare; the
    HASH remains dtype-sensitive via _col_tokens.
    """
    df = df[sorted(df.columns)].reset_index(drop=True)
    if len(df) and len(df.columns):
        key = pd.Series([""] * len(df))
        for c in df.columns:
            key = key + "\x1f" + _col_tokens(df[c])
        df = df.iloc[np.argsort(key.to_numpy(), kind="stable")]
    return df.reset_index(drop=True)


def _col_tokens(s: pd.Series) -> pd.Series:
    """Canonical per-value string tokens; dtype KIND is part of the token."""
    if pd.api.types.is_bool_dtype(s):
        return "b:" + s.astype(str)
    if pd.api.types.is_integer_dtype(s):
        return "i:" + s.astype("int64").astype(str)
    if pd.api.types.is_float_dtype(s):
        v = s.astype("float64").to_numpy()
        out = np.empty(len(v), dtype=object)
        nan = np.isnan(v)
        out[nan] = "f:nan"
        if (~nan).any():
            out[~nan] = np.array(
                [f"f:{x:.9e}" for x in v[~nan]], dtype=object)
        # normalize -0.0
        out[out == "f:-0.000000000e+00"] = "f:0.000000000e+00"
        return pd.Series(out, index=s.index).astype(str)
    return "o:" + s.astype(str)


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    """Dtype-KIND-sensitive value compare on canonicalized frames.

    int64 vs float64 is a FAILURE even when values are numerically equal
    (mirrors the driver's dtype-sensitive hash); float values within
    rtol=1e-9 are equal (mirrors the driver tolerating engine float noise
    on queries like doc_unigram_nll that were hash-green in r3).
    """
    if list(a.columns) != list(b.columns):
        return False, f"schema {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        # unify signed/unsigned int kinds; everything else must agree
        ka = "i" if ka == "u" else ka
        kb = "i" if kb == "u" else kb
        if ka != kb:
            return False, f"col {c} dtype kind {a[c].dtype} != {b[c].dtype}"
        if ka == "f":
            av = a[c].astype("float64").to_numpy()
            bv = b[c].astype("float64").to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-12)
            if not np.all(both_nan | close):
                i = int(np.argmin(both_nan | close))
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
        else:
            ta = _col_tokens(a[c]).to_numpy()
            tb = _col_tokens(b[c]).to_numpy()
            ne = ta != tb
            if ne.any():
                i = int(np.argmax(ne))
                return (False,
                        f"col {c} row {i}: "
                        f"{a[c].iloc[i]!r} != {b[c].iloc[i]!r}")
    return True, ""


def _result_hash(df: pd.DataFrame) -> str:
    """Exact content hash of a result frame, independent of row/column
    order and of the block layout that produced it: columns sorted by name,
    rows sorted by an exact per-row token key (float64 columns contribute
    their raw IEEE bytes — finer than _canon's 9-digit tokens, so two runs
    hash equal ONLY if every float bit matches). Used by --dump to compare
    the engine's output across parallelism levels (layout-invariance)."""
    import hashlib

    df = df[sorted(df.columns)].reset_index(drop=True)
    cols = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            v = s.astype("float64").to_numpy().copy()
            v[v == 0.0] = 0.0  # normalize -0.0
            v[np.isnan(v)] = np.nan  # canonical NaN payload
            tok = np.array([x.tobytes().hex() for x in v], dtype=object)
            cols[c] = ("f", tok)
        elif pd.api.types.is_bool_dtype(s):
            cols[c] = ("b", s.astype(str).to_numpy().astype(object))
        elif pd.api.types.is_integer_dtype(s):
            cols[c] = ("i", s.astype("int64").astype(str)
                       .to_numpy().astype(object))
        else:
            cols[c] = ("o", s.astype(str).to_numpy().astype(object))
    if len(df) and len(df.columns):
        key = np.array([""] * len(df), dtype=object)
        for c in df.columns:
            key = key + "\x1f" + cols[c][1]
        order = np.argsort(key, kind="stable")
    else:
        order = np.arange(len(df))
    h = hashlib.sha256()
    for c in df.columns:
        kind, tok = cols[c]
        h.update(f"{c}\x00{kind}\x00".encode())
        h.update("\x1e".join(tok[order]).encode())
        h.update(b"\x1d")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rows-only", action="store_true",
                    help="also execute no-oracle queries (rows>=0 check)")
    ap.add_argument("--allow-empty", action="store_true",
                    help="degenerate-base sweeps (empty/single-row "
                         "tables): an empty rows-only result is OK; the "
                         "criterion is no-crash + oracle match")
    ap.add_argument("--cpus", type=int, default=8,
                    help="num_cpus for the Ray session (layout-invariance "
                         "sweeps run the surface at two values and diff "
                         "--dump files)")
    ap.add_argument("--dump", default=None,
                    help="write {name: {ok, rows, hash}} JSON of the "
                         "ENGINE results (exact content hash, row/col/"
                         "layout-order-independent) for cross-run compare")
    ap.add_argument("--block-bytes", type=int, default=None,
                    help="force DataContext.target_max_block_size to this "
                         "many bytes (e.g. 262144) so reads/maps emit many "
                         "tiny blocks — a block-BOUNDARY invariance sweep "
                         "(batch-local combiners, window segmentation, "
                         "tree merges see far more partials than the "
                         "default 128 MiB layout ever produces)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, ignore_reinit_error=True)
    if args.block_bytes is not None:
        import ray.data
        ray.data.DataContext.get_current().target_max_block_size = (
            args.block_bytes)

    import __ray_entry__ as entry
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = Path(args.sf) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_fail = 0
    results = {}
    dump = {}

    def _record(name, ok, mine):
        results[name] = ok
        if args.dump is not None:
            dump[name] = {
                "ok": bool(ok),
                "rows": None if mine is None else int(len(mine)),
                "hash": None if mine is None else _result_hash(mine),
            }

    for name in names:
        if name not in oracles:
            if args.rows_only:
                try:
                    mine = _to_pandas(qs[name](args.sf))
                    ok = (len(mine) > 0 or name in EMPTY_OK
                          or args.allow_empty)
                    print(f"[{'ok' if ok else 'FAIL'}] {name} "
                          f"(rows-only, {len(mine)} rows)"
                          + ("" if ok else "  EMPTY RESULT"))
                    _record(name, ok, mine)
                    n_fail += (not ok)
                except Exception as e:  # noqa: BLE001
                    print(f"[FAIL] {name} rows-only EXCEPTION: {e}")
                    _record(name, False, None)
                    n_fail += 1
            else:
                print(f"[skip] {name}: no oracle (rows-only)")
            continue
        mine = None
        try:
            mine = _canon(_to_pandas(qs[name](args.sf)))
            ref = _canon(con.execute(oracles[name]).fetchdf())
            ok, why = _values_match(mine, ref)
        except Exception as e:  # noqa: BLE001
            ok, why = False, f"EXCEPTION: {type(e).__name__}: {e}"
        _record(name, ok, mine)
        n_fail += (not ok)
        print(f"[{'ok' if ok else 'FAIL'}] {name}" + ("" if ok else f"  {why}"))

    print(json.dumps({"checked": len(results), "failed": n_fail}))
    if args.dump is not None:
        Path(args.dump).write_text(json.dumps(dump, indent=1, sort_keys=True))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
