"""CLI job driver — the ``ray job submit`` entry point.

Examples (single node; on a cluster drop ``--num-cpus`` and submit via
``ray job submit -- python -m cardinalityestimation_ray ...``):

    python -m cardinalityestimation_ray distinct \
        --input /root/testdata/sf0.01 --b 14
    python -m cardinalityestimation_ray distinct-by-source \
        --input /root/testdata/sf0.01
    python -m cardinalityestimation_ray resumable \
        --input-glob '/tmp/corpus/*.parquet' --checkpoint /tmp/ckpt
    python -m cardinalityestimation_ray topk --input /root/testdata/sf0.01 -k 20

This is the only module in the package that may call ray.init() (guarded),
because it IS a job script.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if os.environ.get("RAY_ADDRESS", "local") == "local":
            kwargs["address"] = "local"
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="cardinalityestimation_ray")
    p.add_argument("command", choices=[
        "distinct", "distinct-by-source", "topk", "quantiles", "dedup-stats",
        "resumable", "bench-corpus", "curate"])
    p.add_argument("--input", help="sf dir with documents.parquet")
    p.add_argument("--input-glob", help="glob of tokens parquet files")
    p.add_argument("--checkpoint", help="checkpoint dir (resumable)")
    p.add_argument("--b", type=int, default=14)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--output", help="write result parquet/json here")
    p.add_argument("--eval-input",
                   help="curate: parquet file with a text column (the eval "
                        "set to decontaminate against); omit to skip")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--ngram", type=int, default=13,
                   help="curate: decontamination word-n-gram size "
                        "(13 = the GPT-3/PaLM standard)")
    args = p.parse_args(argv)
    if args.command == "curate" and not args.output:
        p.error("curate requires --output (the shard-partitioned out dir)")

    _ensure_ray(args.num_cpus)
    import ray

    from .sources.corpus import read_tokens

    result = None
    if args.command == "distinct":
        from .pipelines.distinct import global_distinct_tokens

        res = global_distinct_tokens(read_tokens(args.input), b=args.b)
        result = {"distinct_tokens": res["distinct_tokens"],
                  "total_tokens": res["total_tokens"]}
    elif args.command == "distinct-by-source":
        from .pipelines.distinct import distinct_tokens_by_source

        result = distinct_tokens_by_source(read_tokens(args.input), b=args.b)
    elif args.command == "topk":
        from .pipelines.frequency import token_topk_exact

        result = token_topk_exact(read_tokens(args.input), k=args.k)
    elif args.command == "quantiles":
        from .pipelines.quantiles import column_quantiles

        result = column_quantiles(read_tokens(args.input), "n_tok")
    elif args.command == "dedup-stats":
        import ray.data

        from .pipelines.dedup import exact_dedup_stats

        docs = ray.data.read_parquet(f"{args.input}/documents.parquet",
                                     columns=["doc_id", "text"])
        result = exact_dedup_stats(docs)
    elif args.command == "resumable":
        from .state.checkpoint import resumable_distinct_tokens

        files = sorted(glob.glob(args.input_glob))
        res = resumable_distinct_tokens(files, args.checkpoint, b=args.b)
        result = {k: v for k, v in res.items() if k != "sketch"}
    elif args.command == "curate":
        import pyarrow.parquet as pq
        import ray.data

        from .pipelines.curation import curate_and_write

        docs = ray.data.read_parquet(
            f"{args.input}/documents.parquet",
            columns=["doc_id", "text", "n_chars"])
        eval_texts = []
        if args.eval_input:
            eval_texts = (pq.read_table(args.eval_input, columns=["text"])
                          ["text"].to_pylist())
        manifest = curate_and_write(docs, eval_texts, args.output,
                                    ngram=args.ngram, seed=args.seed,
                                    n_shards=args.shards)
        result = {"out_dir": args.output, "n_files": manifest["n_files"]}
        args.output = None  # manifest prints; the directory IS the output
    elif args.command == "bench-corpus":
        from .sources.corpus import write_synthetic_corpus

        write_synthetic_corpus(args.output, args.k)
        result = {"written": args.output, "docs": args.k}

    import pandas as pd

    if isinstance(result, pd.DataFrame):
        if args.output:
            result.to_parquet(args.output)
        print(result.to_string(index=False))
    else:
        if args.output:
            with open(args.output, "w") as f:
                json.dump(result, f)
        print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
