"""Generate a ROW-SHUFFLED twin of a testdata dir for oracle sweeps.

Every engine result is claimed to be a deterministic function of the row
SET — nothing may depend on the physical order rows arrive in (keep-first
dedup resolves by min id, windows/sequences sort on explicit (key, ts, id)
keys, sampling uses hash-derived priorities, top-k selection is quantized
with total tie-breaks). That claim had only ever been probed indirectly
(block-layout and parallelism sweeps reorder BLOCKS, but rows inside a
file always arrived in generator order). This script writes a twin of a
testdata dir with every table's rows deterministically permuted (seeded
Generator per table, seed = fnv1a of the table name — no time/global RNG),
so a full `check_oracles.py` sweep over it:

1. re-checks every oracle on the permuted base (DuckDB aggregates are
   order-independent, so a FAIL here means ORDER-DEPENDENT ENGINE output —
   or an oracle whose ``ORDER BY ... LIMIT`` has an underdetermined tie,
   which DuckDB may break by physical row order: both are real bugs), and
2. via ``--dump`` hash-diffing against the clean base's dump, checks the
   stronger claim: engine results are BIT-IDENTICAL across input row
   orders (modulo the documented merge-order-sensitive sketch configs).

Usage:
    python scripts/gen_shuffled_testdata.py [--sf /root/testdata/sf0.01] \
        [--out /tmp/sf_shuffled]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _seed(name: str) -> int:
    h = np.uint64(0xCBF29CE484222325)
    for b in name.encode():
        h = np.uint64((int(h) ^ b) * 0x100000001B3 % (1 << 64))
    return int(h)


def generate(src: str, out, *, verbose: bool = False) -> None:
    """Write the row-shuffled twin of ``src`` into ``out`` — the ONE copy
    of the recipe, shared by the CLI and the pytest fixtures."""
    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        path = Path(src) / f"{t}.parquet"
        if not path.exists():
            continue
        tab = pq.read_table(path)
        perm = np.random.default_rng(_seed(t)).permutation(len(tab))
        pq.write_table(tab.take(perm), out / f"{t}.parquet")
        if verbose:
            print(f"{t}: {len(tab)} rows shuffled")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/sf_shuffled")
    args = ap.parse_args()
    generate(args.sf, args.out, verbose=True)


if __name__ == "__main__":
    main()
