"""F6 checkpoint/resume fixtures: kill after j partitions, resume from the
lineage manifest, final merged result must equal the uninterrupted run."""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus_files(ray_session, tmp_path_factory):
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from cardinalityestimation_ray.sources.corpus import write_synthetic_corpus

    path = str(tmp_path_factory.mktemp("ckpt_corpus"))
    write_synthetic_corpus(path, 4000, docs_per_block=500)
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) >= 6
    return files


def test_uninterrupted_run_and_idempotent_rerun(corpus_files, tmp_path):
    from cardinalityestimation_ray.state.checkpoint import (
        resumable_distinct_tokens,
    )

    ckpt = str(tmp_path / "ckpt_a")
    res = resumable_distinct_tokens(corpus_files, ckpt, b=14)
    assert res["n_partitions"] == len(corpus_files)
    assert res["rows"] == 4000
    assert res["n_skipped"] == 0 and not res["aborted"]

    # second run: everything skipped, identical result
    res2 = resumable_distinct_tokens(corpus_files, ckpt, b=14)
    assert res2["n_fresh"] == 0
    assert res2["n_skipped"] == len(corpus_files)
    assert res2["distinct_tokens"] == res["distinct_tokens"]
    assert np.array_equal(res2["sketch"].registers(), res["sketch"].registers())


def test_kill_and_resume_equals_uninterrupted(corpus_files, tmp_path):
    from cardinalityestimation_ray.state.checkpoint import (
        CheckpointStore,
        resumable_distinct_tokens,
    )

    ckpt_full = str(tmp_path / "full")
    full = resumable_distinct_tokens(corpus_files, ckpt_full, b=12)

    ckpt = str(tmp_path / "crash")
    crashed = resumable_distinct_tokens(corpus_files, ckpt, b=12, fail_after=2,
                                        max_in_flight=2)
    assert crashed["aborted"]
    n_done = len(CheckpointStore(ckpt).completed())
    assert 2 <= n_done < len(corpus_files)

    resumed = resumable_distinct_tokens(corpus_files, ckpt, b=12)
    assert not resumed["aborted"]
    assert resumed["n_skipped"] == n_done
    assert resumed["n_partitions"] == len(corpus_files)
    # bit-identical final state vs the uninterrupted run
    assert np.array_equal(resumed["sketch"].registers(),
                          full["sketch"].registers())
    assert resumed["total_tokens"] == full["total_tokens"]
    assert resumed["rows"] == full["rows"]


def test_changed_input_invalidates_partition(corpus_files, tmp_path):
    import shutil

    from cardinalityestimation_ray.state.checkpoint import (
        resumable_distinct_tokens,
    )

    # copy corpus so we can mutate one file
    work = tmp_path / "mutable"
    work.mkdir()
    files = []
    for f in corpus_files:
        dst = str(work / os.path.basename(f))
        shutil.copy(f, dst)
        files.append(dst)
    ckpt = str(tmp_path / "ckpt_m")
    resumable_distinct_tokens(files, ckpt, b=12)

    # rewrite one file with fewer rows -> size changes -> that partition's
    # record is invalidated and exactly that file is reprocessed
    import pyarrow.parquet as pq

    tbl = pq.read_table(files[0])
    pq.write_table(tbl.slice(0, tbl.num_rows // 2), files[0])
    res = resumable_distinct_tokens(files, ckpt, b=12)
    assert res["n_fresh"] == 1
    assert res["n_skipped"] == len(files) - 1


def test_different_b_invalidates(corpus_files, tmp_path):
    from cardinalityestimation_ray.state.checkpoint import (
        resumable_distinct_tokens,
    )

    ckpt = str(tmp_path / "ckpt_b")
    resumable_distinct_tokens(corpus_files[:2], ckpt, b=12)
    res = resumable_distinct_tokens(corpus_files[:2], ckpt, b=14)
    assert res["n_fresh"] == 2  # different precision -> recompute


def test_corrupt_partition_fails_cleanly_then_resumes(corpus_files, tmp_path):
    """A corrupted input partition fails the job loudly; completed partitions
    keep their lineage records, and after restoring the file the rerun only
    processes what is missing."""
    import shutil

    from cardinalityestimation_ray.state.checkpoint import (
        CheckpointStore,
        resumable_distinct_tokens,
    )

    work = tmp_path / "mutable2"
    work.mkdir()
    files = []
    for f in corpus_files:
        dst = str(work / os.path.basename(f))
        shutil.copy(f, dst)
        files.append(dst)

    # the scheduler pops the pending queue from its tail, so corrupt the
    # FIRST (sorted) partition — it is processed last and the rest complete
    backup = files[0] + ".bak"
    shutil.copy(files[0], backup)
    with open(files[0], "wb") as f:
        f.write(b"not a parquet file")

    ckpt = str(tmp_path / "ckpt_corrupt")
    with pytest.raises(Exception):
        resumable_distinct_tokens(files, ckpt, b=12, max_in_flight=1)
    done_after_crash = len(CheckpointStore(ckpt).completed())
    assert 0 < done_after_crash < len(files)

    shutil.copy(backup, files[0])
    res = resumable_distinct_tokens(files, ckpt, b=12)
    assert res["n_partitions"] == len(files)
    assert res["n_skipped"] == done_after_crash
