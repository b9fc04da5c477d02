"""cardinalityestimation_ray — a Ray-Data-native distributed sketch engine.

A from-scratch reimplementation of the capabilities of
saguiitay/CardinalityEstimation (HyperLogLog cardinality estimation with
direct/sparse/dense modes, mergeable + serializable), lifted onto
ray.data.Dataset pipelines over Parquet corpora of pre-tokenized training
sequences, and extended with count-min, Bloom, t-digest and KLL sketches plus
the data-pipeline operators a large-scale training corpus needs (dedup,
similarity search, text analysis).

Layout:
  sketches/   pure numpy sketch cores (no Ray import)
  functions/  vectorized scalar/batch functions (hashing, text analysis)
  sources/    corpus readers/generators (tokens-table shape per BASELINE.json)
  stages/     map_batches stages + mergeable Ray aggregates
  pipelines/  end-to-end pipelines (the queries() surface)
  state/      checkpoint / lineage store for resumable runs

Nothing in this package calls ray.init(); sessions are owned by bench.py,
tests/conftest.py, and the driver.
"""

__version__ = "0.1.0"
