"""Task-retry resilience: a worker dies mid-scan (os._exit), Ray reschedules
the task, and the merged result is still exact — the sketch UDFs are pure
functions of their block, so retries are safe (SURVEY.md §4 'stragglers /
retries')."""

import os

import numpy as np
import pytest


def test_worker_death_retry_yields_exact_result(ray_session, tmp_path):
    import ray
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from cardinalityestimation_ray.sketches.hll import HyperLogLog
    from cardinalityestimation_ray.stages.sketch_stages import (
        HllTokenPartials,
        tree_merge_partials,
    )

    marker = str(tmp_path / "crashed_once")
    import pyarrow as pa

    stage = HllTokenPartials(b=12)

    def flaky(batch: pa.Table) -> pa.Table:
        # first task to see this marker missing kills its worker process —
        # Ray reschedules the task on another worker
        if not os.path.exists(marker):
            try:
                with open(marker, "x") as f:
                    f.write("x")
                os._exit(1)
            except FileExistsError:
                pass
        return stage(batch)

    tokens = pa.array([list(range(i, i + 50)) for i in range(0, 2000, 50)],
                      type=pa.list_(pa.int32()))
    tbl = pa.table({"tokens": tokens})
    ds = ray.data.from_arrow(tbl).repartition(8).map_batches(
        flaky, batch_format="pyarrow")
    sketch, total = tree_merge_partials(ds, "hll")
    assert total == 40 * 50
    single = HyperLogLog(b=12)
    for row in tbl["tokens"]:
        single.add_values(np.asarray(row.as_py(), dtype=np.int32))
    assert np.array_equal(sketch.registers(), single.registers())
    assert os.path.exists(marker)  # the crash really happened


def test_actor_pool_worker_death_retry_yields_exact_result(ray_session,
                                                           tmp_path):
    """Same resilience for the STATEFUL pattern: a map_batches actor-pool
    worker dies mid-scan, Ray restarts the actor and retries its task, and
    the merged result is register-identical — so per-actor state
    (`__init__`-loaded models/indexes) is safe to combine with retries as
    long as `__call__` stays a pure function of its block."""
    import ray
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa

    from cardinalityestimation_ray.sketches.hll import HyperLogLog
    from cardinalityestimation_ray.stages.sketch_stages import (
        HllTokenPartials,
        tree_merge_partials,
    )

    marker = str(tmp_path / "actor_crashed_once")

    class FlakyStage:
        def __init__(self):
            self.stage = HllTokenPartials(b=12)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                try:
                    with open(marker, "x") as f:
                        f.write("x")
                    os._exit(1)
                except FileExistsError:
                    pass
            return self.stage(batch)

    tokens = pa.array([list(range(i, i + 50)) for i in range(0, 2000, 50)],
                      type=pa.list_(pa.int32()))
    tbl = pa.table({"tokens": tokens})
    ds = ray.data.from_arrow(tbl).repartition(8).map_batches(
        FlakyStage, batch_format="pyarrow", concurrency=2)
    sketch, total = tree_merge_partials(ds, "hll")
    assert total == 40 * 50
    single = HyperLogLog(b=12)
    for row in tbl["tokens"]:
        single.add_values(np.asarray(row.as_py(), dtype=np.int32))
    assert np.array_equal(sketch.registers(), single.registers())
    assert os.path.exists(marker)  # the crash really happened
