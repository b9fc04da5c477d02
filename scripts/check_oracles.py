"""Self-check harness mirroring the driver's correctness gate: run each
``queries()`` entry AND its ``oracle_sql()`` through DuckDB over the same
parquet tables, then compare row-count, schema (column names sorted), and
values (rows sorted by all columns, floats compared with tolerance).

Usage:
    python scripts/check_oracles.py [--sf /root/testdata/sf0.01] [q1 q2 ...]

Runs all oracle-backed queries when no names are given. Exits non-zero on
any mismatch. Owns its own Ray session (the driver inits Ray itself; this
script is a CLI entry point).
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


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
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"schema {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) or \
                pd.api.types.is_float_dtype(b[c]):
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-12)
            if not np.all(both_nan | close):
                i = int(np.argmin(both_nan | close))
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
        else:
            eq = pd.Series(av).astype(str).eq(pd.Series(bv).astype(str))
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
    return True, ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    import __ray_entry__ as entry
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or sorted(oracles)

    con = duckdb.connect()
    for t in TABLES:
        p = Path(args.sf) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_fail = 0
    results = {}
    for name in names:
        if name not in oracles:
            print(f"[skip] {name}: no oracle (rows-only)")
            continue
        try:
            mine = _canon(_to_pandas(qs[name](args.sf)))
            ref = _canon(con.execute(oracles[name]).fetchdf())
            ok, why = _values_match(mine, ref)
        except Exception as e:  # noqa: BLE001
            ok, why = False, f"EXCEPTION: {type(e).__name__}: {e}"
        results[name] = ok
        n_fail += (not ok)
        print(f"[{'ok' if ok else 'FAIL'}] {name}" + ("" if ok else f"  {why}"))

    print(json.dumps({"checked": len(results), "failed": n_fail}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
