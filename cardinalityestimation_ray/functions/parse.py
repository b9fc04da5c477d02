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
    # the value must be a PURE integer: RE2 has no lookahead, so capture the
    # full numeric token and null out anything with a fraction/exponent —
    # otherwise {"k": 1.5} would silently extract 1 (round-3 review fix)
    pattern = rf'"{key}":\s*(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)'
    ext = pc.extract_regex(col, pattern)  # struct<v: string> or null
    field = pc.struct_field(ext, "v")
    pure_int = pc.match_substring_regex(field, r"^-?\d+$")
    field = pc.if_else(pc.fill_null(pure_int, False), field,
                       pa.nulls(len(field), type=pa.string()))
    # int64 overflow (>18 digits can exceed the range) must yield null, not
    # raise — parsers are total functions (round-3 review fix)
    digits = pc.utf8_length(pc.utf8_ltrim(field, "-"))
    in_range = pc.fill_null(pc.less_equal(digits, 18), False)
    field = pc.if_else(in_range, field, pa.nulls(len(field),
                                                 type=pa.string()))
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
