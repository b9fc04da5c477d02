"""Per-record parser functions (vectorized): JSON field extraction via RE2
regex on simple payloads — the "per-record parsers" operator family. For
nested JSON use a pandas-based actor stage instead; the events table's props
column is flat key/value."""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc

_INT64_MAX_STR = "9223372036854775807"
_INT64_MIN_MAG = "9223372036854775808"


def extract_json_int(batch: pa.Table, column: str, key: str,
                     out_column: str | None = None) -> pa.Table:
    """Append an int64 column extracted from a flat JSON string column.

    Missing keys / malformed rows yield null (never raise) — parsers must be
    total functions at corpus scale. Values outside int64 range yield null
    (SQL TRY_CAST semantics); in-range 19-digit values are kept (snowflake
    ids are valid int64s — round-4 session-9 review fix).
    """
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # the value must be a PURE integer: RE2 has no lookahead, so capture the
    # full numeric token and null out anything with a fraction/exponent —
    # otherwise {"k": 1.5} would silently extract 1 (round-3 review fix).
    # The key is regex-ESCAPED: a key like "a.b" must not match "aXb"
    pattern = (rf'"{re.escape(key)}":\s*'
               r'(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)')
    ext = pc.extract_regex(col, pattern)  # struct<v: string> or null
    field = pc.struct_field(ext, "v")
    pure_int = pc.match_substring_regex(field, r"^-?\d+$")
    field = pc.if_else(pc.fill_null(pure_int, False), field,
                       pa.nulls(len(field), type=pa.string()))
    # int64 overflow must yield null, not raise. <=18 digits always fits;
    # 19 digits compares lexicographically against the exact bound (equal
    # lengths make string order == numeric order); >19 never fits
    mag = pc.utf8_ltrim(field, "-")
    digits = pc.utf8_length(mag)
    neg = pc.starts_with(field, "-")
    bound = pc.if_else(pc.fill_null(neg, False),
                       pa.scalar(_INT64_MIN_MAG), pa.scalar(_INT64_MAX_STR))
    ok19 = pc.and_(pc.equal(digits, 19), pc.less_equal(mag, bound))
    in_range = pc.fill_null(
        pc.or_(pc.less_equal(digits, 18), ok19), False)
    field = pc.if_else(in_range, field, pa.nulls(len(field),
                                                 type=pa.string()))
    vals = pc.cast(field, pa.int64())
    return batch.append_column(out_column or key, vals)


def extract_json_str(batch: pa.Table, column: str, key: str,
                     out_column: str | None = None) -> pa.Table:
    """Append a string column extracted from a flat JSON string column.

    JSON escapes in the value (\\" \\\\ \\n \\uXXXX ...) are DECODED —
    the raw capture would treat equal logical values as distinct whenever
    one row was escape-encoded (round-4 session-9 review fix). Rows whose
    escape sequence is invalid JSON yield null (total-function contract).
    The fast path (no backslash, the overwhelming norm) stays zero-copy
    Arrow; only rows containing a backslash pay the per-row decode.
    """
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pattern = rf'"{re.escape(key)}":\s*"(?P<v>(?:[^"\\]|\\.)*)"'
    ext = pc.extract_regex(col, pattern)
    field = pc.struct_field(ext, "v")
    escaped = pc.fill_null(pc.match_substring(field, "\\"), False)
    if pc.any(escaped).as_py():
        idx = pc.indices_nonzero(escaped).to_numpy(zero_copy_only=False)
        fixed = []
        for raw in field.take(pa.array(idx)).to_pylist():
            try:
                fixed.append(json.loads(f'"{raw}"'))
            except ValueError:
                fixed.append(None)
        field = field.to_pylist()
        for i, v in zip(idx, fixed):
            field[int(i)] = v
        field = pa.array(field, type=pa.string())
    return batch.append_column(out_column or key, field)
