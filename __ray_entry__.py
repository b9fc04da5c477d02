"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Nothing here (or in the library) calls ray.init()/ray.shutdown(); the
caller owns the session.

Note on the HLL entries: at sf0.01 the relevant per-group cardinalities are
<= 100, where the sketch's direct-counting mode is EXACT by design
(reference semantics, HllConstants.cs:42) — so the approximate pipelines are
legitimately oracle-checkable against COUNT(DISTINCT ...). Large-cardinality
accuracy is covered by the pytest accuracy harness and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# DuckDB's regexp_split_to_array + list_filter mirror of the tokenizer in
# cardinalityestimation_ray/sources/corpus.py:tokenize_documents_batch
_TOK = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"


def _tokens(sf_dir: str):
    from cardinalityestimation_ray.sources.corpus import read_tokens

    return read_tokens(sf_dir)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: per-source + global
    distinct-token estimates over the tokenized corpus."""
    from cardinalityestimation_ray.pipelines.distinct import flagship_summary

    return flagship_summary(_tokens("/root/testdata/sf0.001"), b=14)


# ---------------------------------------------------------------------------
# queries


def _q_hll_distinct_tokens_by_source(sf_dir: str):
    from cardinalityestimation_ray.pipelines.distinct import distinct_tokens_by_source

    return distinct_tokens_by_source(_tokens(sf_dir), b=14)


def _q_hll_distinct_tokens_global(sf_dir: str):
    import pandas as pd

    from cardinalityestimation_ray.pipelines.distinct import global_distinct_tokens

    res = global_distinct_tokens(_tokens(sf_dir), b=14)
    return pd.DataFrame(
        {
            "distinct_tokens": [res["distinct_tokens"]],
            "total_tokens": [res["total_tokens"]],
        }
    )


def _q_hll_distinct_docs_by_source(sf_dir: str):
    from cardinalityestimation_ray.pipelines.distinct import distinct_docs_by_source

    return distinct_docs_by_source(_tokens(sf_dir), b=14)


def _q_hll_distinct_lang_by_source(sf_dir: str):
    import ray.data

    from cardinalityestimation_ray.pipelines.distinct import distinct_column_by_key

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    return distinct_column_by_key(
        docs, "lang", "source", b=14,
        estimate_name="distinct_langs", count_name="n_docs",
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "hll_distinct_tokens_by_source": _q_hll_distinct_tokens_by_source,
        "hll_distinct_tokens_global": _q_hll_distinct_tokens_global,
        "hll_distinct_docs_by_source": _q_hll_distinct_docs_by_source,
        "hll_distinct_lang_by_source": _q_hll_distinct_lang_by_source,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "hll_distinct_tokens_by_source": f"""
            SELECT source,
                   count(DISTINCT t) AS distinct_tokens,
                   count(t) AS total_tokens
            FROM (SELECT source, unnest({_TOK}) AS t FROM documents)
            GROUP BY source
        """,
        "hll_distinct_tokens_global": f"""
            SELECT count(DISTINCT t) AS distinct_tokens,
                   count(t) AS total_tokens
            FROM (SELECT unnest({_TOK}) AS t FROM documents)
        """,
        "hll_distinct_docs_by_source": """
            SELECT source,
                   count(DISTINCT doc_id) AS distinct_docs,
                   count(*) AS n_docs
            FROM documents
            GROUP BY source
        """,
        "hll_distinct_lang_by_source": """
            SELECT source,
                   count(DISTINCT lang) AS distinct_langs,
                   count(*) AS n_docs
            FROM documents
            GROUP BY source
        """,
    }
