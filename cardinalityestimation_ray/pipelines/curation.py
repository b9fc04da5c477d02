"""End-to-end corpus curation: the canonical pretraining data-prep chain
composed from this repo's operators —

    exact dedup (keep min-id per identical text)
      -> length quantile-band filter (thresholds on the DEDUPED corpus)
      -> eval-set n-gram decontamination (broadcast gram set)
      -> seeded deterministic epoch shuffle + round-robin sharding

Every stage is one of the already-oracle-checked operators, so the whole
chain stays SQL-reproducible end-to-end (the driver oracle is one CTE per
stage). The composition itself is what this module pins down: stage ORDER
matters (band thresholds must be computed on the deduped corpus; the
shuffle ranks only survivors) and the oracle catches any drift.

Scale note: each stage is lazy, so a stage that re-consumes its input
(the band filter's two passes) re-executes the upstream lineage. At test
scale that is the right trade; at 100 TB you checkpoint between stages by
writing the survivor id set (or the full rows) to partitioned parquet —
``sources/io.write_partitioned`` — and resuming from it, exactly like the
resumable-jobs path. Documented contract, not an accident.
"""

from __future__ import annotations

from .decontamination import decontaminated_corpus
from .dedup import exact_dedup
from .filtering import filter_by_column_quantile
from .shuffle import deterministic_shuffle


def curate_corpus(docs_ds, eval_texts, *,
                  q_low: float = 0.05, q_high: float = 0.95,
                  ngram: int = 13, seed: int = 0, n_shards: int = 8,
                  text_column: str = "text", id_column: str = "doc_id",
                  length_column: str = "n_chars"):
    """Run the full curation chain; returns a Dataset of
    (id, shuffle_pos, shard) for the surviving documents.

    ``docs_ds`` is a lazy documents Dataset; the one multi-pass stage
    (the band filter's threshold pass) re-executes its upstream lineage,
    which Ray Datasets support natively — no factory ceremony needed.
    ``ngram`` defaults to 13 — the GPT-3/PaLM decontamination standard
    (short n like 3 flags any document sharing a common trigram and is
    only sensible for tiny test corpora).
    """
    deduped = exact_dedup(docs_ds, text_column=text_column,
                          id_column=id_column)
    banded = filter_by_column_quantile(deduped, length_column,
                                       q_low=q_low, q_high=q_high)
    clean = decontaminated_corpus(banded, eval_texts, n=ngram,
                                  text_column=text_column)
    return deterministic_shuffle(clean, id_column=id_column, seed=seed,
                                 n_shards=n_shards)


def _curation_params_fingerprint(eval_texts, kwargs: dict) -> dict:
    """The parameter record stored next to the manifest: every knob that
    changes the output, including a content hash of the eval set.

    Normalized to the FULL resolved parameter set — :func:`curate_corpus`
    defaults are applied before recording, so a rerun that spells out a
    default explicitly (``ngram=13``) fingerprints identically to one that
    omitted it (advisor fix: explicit-default reruns used to raise
    'DIFFERENT curation parameters' despite identical semantics).
    """
    import inspect

    from ..sketches import hashing

    ev = hashing.fnv1a64_mix("\x00".join(sorted(map(str, eval_texts)))
                             .encode()) if len(eval_texts) else 0
    sig = inspect.signature(curate_corpus)
    defaults = {name: p.default for name, p in sig.parameters.items()
                if p.default is not inspect.Parameter.empty}
    unknown = set(kwargs) - set(defaults)
    if unknown:
        raise TypeError(f"unknown curation parameter(s): {sorted(unknown)}")
    resolved = {**defaults, **kwargs}
    rec = {k: resolved[k] for k in sorted(resolved)}
    rec["eval_set_hash"] = f"{ev:016x}"
    rec["n_eval_texts"] = len(eval_texts)
    return rec


def _upgrade_recorded_params(recorded: dict) -> dict:
    """Resolve a pre-normalization ``_PARAMS.json`` record (explicit kwargs
    only) to the full-default shape so old outputs compare correctly."""
    import inspect

    meta = {"eval_set_hash", "n_eval_texts"}
    kw = {k: v for k, v in recorded.items() if k not in meta}
    sig = inspect.signature(curate_corpus)
    defaults = {name: p.default for name, p in sig.parameters.items()
                if p.default is not inspect.Parameter.empty}
    if set(kw) - set(defaults):
        return recorded  # not an old-format record; compare as-is
    resolved = {**defaults, **kw}
    out = {k: resolved[k] for k in sorted(resolved)}
    out.update({k: recorded[k] for k in meta if k in recorded})
    return out


def curate_and_write(docs_ds, eval_texts, out_dir: str, **kwargs):
    """Run :func:`curate_corpus` and persist the shard assignment as
    hive-partitioned parquet (``shard=N/`` directories) with a manifest —
    the resumable-output layout: a rerun with the SAME parameters sees the
    manifest and skips the whole job; a rerun with DIFFERENT parameters
    (including a different eval set) raises instead of silently returning
    stale output (review fix — the parameter record lives in
    ``_PARAMS.json`` next to the manifest).

    Returns the manifest dict (or the existing one when output is already
    complete).
    """
    import json
    import os

    from ..sources.io import is_complete_output, write_partitioned

    params = _curation_params_fingerprint(eval_texts, kwargs)
    params_path = os.path.join(out_dir, "_PARAMS.json")
    if is_complete_output(out_dir):
        recorded = None
        if os.path.exists(params_path):
            with open(params_path) as f:
                recorded = json.load(f)
        if recorded is not None and recorded != params:
            # records written before the defaults-normalization change
            # hold only the EXPLICIT kwargs — upgrade them through the
            # same resolution before declaring a mismatch, so an
            # identical rerun against old output still resumes
            recorded = _upgrade_recorded_params(recorded)
        if recorded != params:
            raise ValueError(
                f"{out_dir} holds complete output for DIFFERENT curation "
                f"parameters ({recorded} != {params}); write to a new "
                f"directory or delete the old output")
        with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
            return json.load(f)
    # params land BEFORE the manifest (the manifest is the completion
    # marker, so a crash in between can never leave a complete-looking
    # directory without its parameter record)
    os.makedirs(out_dir, exist_ok=True)
    with open(params_path, "w") as f:
        json.dump(params, f)
    curated = curate_corpus(docs_ds, eval_texts, **kwargs)
    return write_partitioned(curated, out_dir, partition_cols=["shard"])


def curation_funnel(docs_ds, eval_texts, *,
                    q_low: float = 0.05, q_high: float = 0.95,
                    ngram: int = 13, text_column: str = "text",
                    id_column: str = "doc_id",
                    length_column: str = "n_chars"):
    """Observability for the curation chain: how many documents survive
    each stage — (stage, n_docs) rows in pipeline order. Each count is a
    streaming ``Dataset.count()`` over the corresponding lazy stage (the
    upstream lineage re-executes per count; run it at sample scale or
    accept pass-per-stage cost — this is the audit tool, not the job).
    """
    import pandas as pd

    deduped = exact_dedup(docs_ds, text_column=text_column,
                          id_column=id_column)
    banded = filter_by_column_quantile(deduped, length_column,
                                       q_low=q_low, q_high=q_high)
    clean = decontaminated_corpus(banded, eval_texts, n=ngram,
                                  text_column=text_column)
    return pd.DataFrame({
        "stage": ["input", "dedup", "length_band", "decontaminated"],
        "n_docs": [int(docs_ds.count()), int(deduped.count()),
                   int(banded.count()), int(clean.count())],
    })
