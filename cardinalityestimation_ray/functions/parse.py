"""Per-record parser functions (vectorized): JSON field extraction via RE2
regex on simple payloads — the "per-record parsers" operator family. For
nested JSON use a pandas-based actor stage instead; the events table's props
column is flat key/value."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def extract_json_int(batch: pa.Table, column: str, key: str,
                     out_column: str | None = None) -> pa.Table:
    """Append an int64 column extracted from a flat JSON string column.

    Missing keys / malformed rows yield null (never raise) — parsers must be
    total functions at corpus scale.
    """
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pattern = rf'"{key}":\s*(?P<v>-?\d+)'
    ext = pc.extract_regex(col, pattern)  # struct<v: string> or null
    field = pc.struct_field(ext, "v")
    vals = pc.cast(field, pa.int64())
    return batch.append_column(out_column or key, vals)


def extract_json_str(batch: pa.Table, column: str, key: str,
                     out_column: str | None = None) -> pa.Table:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pattern = rf'"{key}":\s*"(?P<v>(?:[^"\\]|\\.)*)"'
    ext = pc.extract_regex(col, pattern)
    return batch.append_column(out_column or key, pc.struct_field(ext, "v"))
