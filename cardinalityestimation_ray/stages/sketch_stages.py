"""Ray Data stages for sketch building and merging.

The scale pattern (SURVEY.md §3/EP2, §7.3): a stateless-or-actor
``map_batches`` stage turns each Arrow batch into *tiny partial-sketch rows*
(one per key per batch, each <= 2^b bytes), so the only shuffle in the whole
pipeline moves kilobyte-scale partials — never raw tokens. A second, cheap
``groupby(key).aggregate`` (or whole-dataset ``aggregate``) merges partials
associatively, which is safe under Ray's unordered completion because
register-max merge commutes (reference CardinalityEstimator.cs:606-609).

This replaces the reference's Parallel.ForEach + batched PLINQ merge tree
(CardinalityEstimatorExtensions.cs:224-280,
ConcurrentCardinalityEstimator.cs:709-773) with Ray's streaming executor.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import hashing
from ..sketches.base import Sketch
from ..sketches.hll import HyperLogLog


def build_sketch(kind: str, params: dict) -> Sketch:
    """Instantiate a registered sketch kind from a picklable spec."""
    return Sketch.REGISTRY[kind](**params)


def sketch_from_blob(kind: str, blob: bytes) -> Sketch:
    from ..sketches.base import sketch_from_bytes

    return sketch_from_bytes(kind, blob)


def _flatten_list_column(col):
    """(flat Arrow array, parent row indices as numpy) of a list column —
    the ONE owner of the null-element contract.

    Null ELEMENTS inside lists are dropped with parents kept aligned (SQL
    semantics — and critically, a single null would otherwise flip a
    numeric flat array to float64 on to_numpy, making every token in the
    batch hash via the 8-byte image instead of the 4-byte one and silently
    inflating distinct counts). Null LISTS contribute no elements (Arrow
    flatten skips them).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if isinstance(parents, pa.ChunkedArray):
        parents = parents.combine_chunks()
    if flat.null_count:
        valid = pc.is_valid(flat)
        flat = flat.filter(valid)
        parents = parents.filter(valid)
    return flat, parents.to_numpy(zero_copy_only=False)


def _flatten_tokens(batch: pa.Table, token_column: str):
    """(flat int32 numpy values, parent row indices) of a list<int32>
    column — numpy view of :func:`_flatten_list_column` (see its docstring
    for the null contract)."""
    flat, parents = _flatten_list_column(batch[token_column])
    return flat.to_numpy(zero_copy_only=False), parents


def _drop_null_keys(batch: pa.Table, key_column: str) -> pa.Table:
    """Rows with a null key are excluded from keyed sketch partials
    (documented divergence from SQL GROUP BY's null group — a null key
    would otherwise NaN-poison the dictionary-code sort in every keyed
    stage)."""
    col = batch[key_column]
    if col.null_count:
        batch = batch.filter(pc.is_valid(col))
    return batch


def _hash_column(batch: pa.Table, column: str, hash_name: str) -> np.ndarray:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or \
            pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return hashing.hash_arrow_binary(col, hash_name)
    return hashing.hash_fixed_batch(col.to_numpy(zero_copy_only=False), hash_name)


class HllTokenPartials:
    """map_batches stage: tokens batch -> one partial-sketch row per key.

    Emits {key?, sketch: binary, n_added: int64}. With ``key_column=None``
    a single global partial row per batch. Designed as a callable class so
    ``map_batches(HllTokenPartials(...), concurrency=N)`` runs it in an actor
    pool where construction cost (none to speak of, but uniform with heavier
    stages) is paid once per actor.
    """

    def __init__(self, b: int = 14, *, token_column: str = "tokens",
                 key_column: str | None = None,
                 use_direct_counting: bool = True,
                 hash_name: str = hashing.DEFAULT_HASH,
                 progress_actor: str | None = None):
        self.b = b
        self.token_column = token_column
        self.key_column = key_column
        self.use_direct = use_direct_counting
        self.hash_name = hash_name
        # live-progress hook: name of a SharedSketch actor that receives each
        # partial blob fire-and-forget, so a running estimate can be polled
        # mid-scan (the reference's ConcurrentCardinalityEstimator use case)
        self.progress_actor = progress_actor
        self._progress_handle = None

    def _push_progress(self, blob: bytes) -> None:
        if self.progress_actor is None:
            return
        if self._progress_handle is None:
            import ray

            self._progress_handle = ray.get_actor(self.progress_actor)
        self._progress_handle.merge_blob.remote(blob)  # fire-and-forget

    def _new_sketch(self) -> HyperLogLog:
        return HyperLogLog(b=self.b, use_direct_counting=self.use_direct,
                           hash_name=self.hash_name)

    #: chunk size for the hash+add loop — keeps every temporary in L1/L2 so
    #: the bandwidth-bound vectorized passes don't hit DRAM under high
    #: concurrency. Round-2 re-measurement (interleaved best-of-5 to beat
    #: shared-VM noise): 8k wins at b=14 (53 vs 43 M tok/s/core) and b=16
    #: (56 vs 25 — the 64 KB register bank competes with 64k-element
    #: chunk temporaries for L2); whole-batch is ~2x slower than either
    CHUNK = 8192

    #: keyed-path strategy switch: at or below this many distinct keys per
    #: batch, per-key filter + chunked hash/add (L2-resident, no full-batch
    #: temporaries); above it, hash-once + argsort segmentation (per-key
    #: filters would cost O(n_keys * n_rows))
    FILTER_KEYED_MAX_KEYS = 64

    #: above this many tokens, collapse to UNIQUE values before hashing:
    #: duplicate tokens are register no-ops, and the unique sort on the
    #: narrow token dtype is cheaper than hashing + scattering the raw
    #: stream (measured 43-88ms -> 12ms on a driver-shape 958k-token Zipf
    #: int32 block). count_additions is restored to the RAW count after the
    #: adds so blobs stay bit-identical to the undeduped path (reference
    #: CountAdditions semantics count every add). Integer dtypes only.
    TOKEN_DEDUP_THRESHOLD = 1 << 15

    @classmethod
    def _dedup_tokens(cls, values: np.ndarray) -> np.ndarray:
        if (len(values) > cls.TOKEN_DEDUP_THRESHOLD
                and np.issubdtype(values.dtype, np.integer)):
            return np.unique(values)
        return values

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.key_column is not None:
            batch = _drop_null_keys(batch, self.key_column)
        if self.key_column is None:
            values, _ = _flatten_tokens(batch, self.token_column)
            n_raw = len(values)
            values = self._dedup_tokens(values)
            sk = self._new_sketch()
            for lo in range(0, len(values), self.CHUNK):
                sk.add_hashes(
                    hashing.hash_fixed_batch(values[lo:lo + self.CHUNK],
                                             self.hash_name))
            sk.count_additions = n_raw
            blob = sk.to_bytes()
            self._push_progress(blob)
            return pa.table({
                "sketch": pa.array([blob], type=pa.binary()),
                "n_added": pa.array([n_raw], type=pa.int64()),
            })
        keys = batch[self.key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = pc.dictionary_encode(keys)
        key_values = codes.dictionary.to_pylist()
        if len(key_values) <= self.FILTER_KEYED_MAX_KEYS:
            # few keys (the by-source shape): process one key at a time —
            # filter its rows (pyarrow C++ gather of just that key's
            # tokens), then the same chunked hash+add loop the GLOBAL path
            # uses, so every hash temporary stays L2-resident. This skips
            # the full-batch uint64 hash buffer + stable argsort + gather
            # (three extra DRAM passes) of the many-keys path below —
            # which is what made keyed partials 2x slower per token than
            # global under 32-way concurrency on a bandwidth-bound box
            # (measured 58 -> 40 ms per 940k-token block single-core).
            out_keys, out_blobs, out_counts = [], [], []
            idx = codes.indices
            for code in range(len(key_values)):
                sub = batch.filter(pc.equal(idx, code))
                vals, _ = _flatten_tokens(sub, self.token_column)
                n_raw = len(vals)
                vals = self._dedup_tokens(vals)
                sk = self._new_sketch()
                if len(vals) >= sk.m:
                    sk.reserve_dense()
                for lo in range(0, len(vals), self.CHUNK):
                    sk.add_hashes(hashing.hash_fixed_batch(
                        vals[lo:lo + self.CHUNK], self.hash_name))
                sk.count_additions = n_raw
                out_keys.append(key_values[code])
                out_blobs.append(sk.to_bytes())
                out_counts.append(n_raw)
            return pa.table({
                self.key_column: pa.array(out_keys, type=keys.type),
                "sketch": pa.array(out_blobs, type=pa.binary()),
                "n_added": pa.array(out_counts, type=pa.int64()),
            })
        # many keys: per-key row filters would cost O(n_keys * n_rows);
        # group tokens by key with one sort and walk the segments.
        values, parents = _flatten_tokens(batch, self.token_column)
        token_keys = codes.indices.to_numpy(zero_copy_only=False)[parents]
        raw_counts = np.bincount(token_keys, minlength=len(key_values)) \
            .astype(np.int64)
        if (len(values) > self.TOKEN_DEDUP_THRESHOLD
                and np.issubdtype(values.dtype, np.integer)):
            # dedup variant: one (key, value) lexsort replaces the
            # key-argsort AND collapses duplicates, so only unique
            # (key, token) pairs pay the hash pass (blob parity with the
            # raw path: registers unchanged, count_additions restored from
            # raw_counts below)
            order = np.lexsort((values, token_keys))
            tk_sorted = token_keys[order]
            v_sorted = values[order]
            keep = np.r_[True, (tk_sorted[1:] != tk_sorted[:-1])
                         | (v_sorted[1:] != v_sorted[:-1])] \
                if len(tk_sorted) else np.zeros(0, dtype=bool)
            tk_sorted = tk_sorted[keep]
            v_uniq = v_sorted[keep]
            h_sorted = np.empty(len(v_uniq), dtype=np.uint64)
            for lo in range(0, len(v_uniq), self.CHUNK):
                hi = min(lo + self.CHUNK, len(v_uniq))
                h_sorted[lo:hi] = hashing.hash_fixed_batch(
                    v_uniq[lo:hi], self.hash_name)
        else:
            h = np.empty(len(values), dtype=np.uint64)
            for lo in range(0, len(values), self.CHUNK):
                hi = min(lo + self.CHUNK, len(values))
                h[lo:hi] = hashing.hash_fixed_batch(values[lo:hi],
                                                    self.hash_name)
            order = np.argsort(token_keys, kind="stable")
            tk_sorted = token_keys[order]
            h_sorted = h[order]
        out_keys, out_blobs, out_counts = [], [], []
        present = set()
        if len(tk_sorted) == 0:
            bounds = np.array([0])  # no tokens: only the zero-token fill below
        else:
            bounds = np.r_[0, np.flatnonzero(np.diff(tk_sorted)) + 1,
                           len(tk_sorted)]
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            code = int(tk_sorted[lo])
            sk = self._new_sketch()
            if hi - lo >= sk.m:
                # register-bank-sized segment: the sketch would promote to
                # dense within a few chunks anyway — skip the sparse phase's
                # per-chunk dict merge (measured 0.24s -> 0.06s per 940k-token
                # block with 10 keys). `direct` exactness is unaffected.
                sk.reserve_dense()
            for c in range(lo, hi, self.CHUNK):
                sk.add_hashes(h_sorted[c:min(c + self.CHUNK, hi)])
            sk.count_additions = int(raw_counts[code])
            out_keys.append(key_values[code])
            out_blobs.append(sk.to_bytes())
            out_counts.append(int(raw_counts[code]))
            present.add(code)
        # keys whose docs had zero tokens still yield an (empty-sketch) row
        for code, key in enumerate(key_values):
            if code not in present:
                out_keys.append(key)
                out_blobs.append(self._new_sketch().to_bytes())
                out_counts.append(0)
        # key column emitted under the INPUT key type: a python-list
        # round-trip would re-infer int64 for int32 keys while the
        # fully-filtered path kept the original type, and the two block
        # schemas then fail to concatenate (round-3 review fix)
        return pa.table({
            self.key_column: pa.array(out_keys, type=keys.type),
            "sketch": pa.array(out_blobs, type=pa.binary()),
            "n_added": pa.array(out_counts, type=pa.int64()),
        })


class HllColumnPartials:
    """map_batches stage hashing a scalar column (e.g. doc_id) into partials.

    Same output shape as HllTokenPartials; counts distinct *rows* instead of
    distinct tokens.
    """

    def __init__(self, value_column: str, b: int = 14, *,
                 key_column: str | None = None,
                 use_direct_counting: bool = True,
                 hash_name: str = hashing.DEFAULT_HASH):
        self.value_column = value_column
        self.b = b
        self.key_column = key_column
        self.use_direct = use_direct_counting
        self.hash_name = hash_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.key_column is not None:
            batch = _drop_null_keys(batch, self.key_column)
        col = batch[self.value_column]
        if self.key_column is None:
            if col.null_count:
                # SQL COUNT(DISTINCT) semantics: null values are not
                # elements
                batch = batch.filter(pc.is_valid(col))
            if len(batch) == 0:
                return pa.table({
                    "sketch": pa.array([], type=pa.binary()),
                    "n_added": pa.array([], type=pa.int64()),
                })
            h = _hash_column(batch, self.value_column, self.hash_name)
            sk = HyperLogLog(b=self.b, use_direct_counting=self.use_direct,
                             hash_name=self.hash_name)
            sk.add_hashes(h)
            return pa.table({
                "sketch": pa.array([sk.to_bytes()], type=pa.binary()),
                "n_added": pa.array([len(h)], type=pa.int64()),
            })
        keys = batch[self.key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(batch) == 0:
            return pa.table({
                self.key_column: pa.array([], type=keys.type),
                "sketch": pa.array([], type=pa.binary()),
                "n_added": pa.array([], type=pa.int64()),
            })
        # null VALUES are not elements (SQL COUNT(DISTINCT)), but their
        # GROUPS still exist — a key whose values are all null emits an
        # (empty sketch, 0) row like GROUP BY does (round-4 session-9
        # review: this stage dropped such groups while its sibling
        # GenericSketchPartials kept them)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            vmask = pa.array(valid)
            h_valid = _hash_column(batch.filter(vmask), self.value_column,
                                   self.hash_name)
            h_all = np.zeros(len(batch), dtype=np.uint64)
            h_all[np.flatnonzero(valid)] = h_valid
        else:
            valid = np.ones(len(batch), dtype=bool)
            h_all = _hash_column(batch, self.value_column, self.hash_name)
        codes = pc.dictionary_encode(keys)
        key_values = codes.dictionary.to_pylist()
        row_codes = codes.indices.to_numpy(zero_copy_only=False)
        order = np.argsort(row_codes, kind="stable")
        rc_sorted = row_codes[order]
        h_sorted = h_all[order]
        v_sorted = valid[order]
        bounds = np.r_[0, np.flatnonzero(np.diff(rc_sorted)) + 1, len(rc_sorted)]
        out_keys, out_blobs, out_counts = [], [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            m = v_sorted[lo:hi]
            sk = HyperLogLog(b=self.b, use_direct_counting=self.use_direct,
                             hash_name=self.hash_name)
            sk.add_hashes(h_sorted[lo:hi][m])
            out_keys.append(key_values[int(rc_sorted[lo])])
            out_blobs.append(sk.to_bytes())
            out_counts.append(int(m.sum()))
        # typed keys: must match the fully-filtered path's schema exactly
        return pa.table({
            self.key_column: pa.array(out_keys, type=keys.type),
            "sketch": pa.array(out_blobs, type=pa.binary()),
            "n_added": pa.array(out_counts, type=pa.int64()),
        })


def hll_merge_aggregate(b: int = 14, *, blob_column: str = "sketch",
                        hash_name: str = hashing.DEFAULT_HASH,
                        finalize_to: str = "estimate"):
    """Mergeable Ray AggregateFn over partial-sketch blob rows.

    Ray runs accumulate per block and merge across blocks/groups — exactly
    the reference's two-level merge tree (partial combine then final fold,
    ConcurrentCardinalityEstimator.cs:709-773), scheduled by the streaming
    executor. ``finalize_to``: "estimate" (int) or "sketch" (binary blob).
    """
    from ray.data.aggregate import AggregateFn

    def init(_key):
        return HyperLogLog(b=b, hash_name=hash_name).to_bytes()

    def accumulate_block(acc: bytes, block) -> bytes:
        sk = HyperLogLog.from_bytes(acc, hash_name)
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        for blob in tbl[blob_column]:
            sk.merge(HyperLogLog.from_bytes(blob.as_py(), hash_name))
        return sk.to_bytes()

    def merge(a: bytes, bb: bytes) -> bytes:
        sk = HyperLogLog.from_bytes(a, hash_name)
        sk.merge(HyperLogLog.from_bytes(bb, hash_name))
        return sk.to_bytes()

    def finalize(acc: bytes):
        if finalize_to == "sketch":
            return acc
        return HyperLogLog.from_bytes(acc, hash_name).estimate()

    return AggregateFn(
        init=init,
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=finalize,
        name="hll" if finalize_to == "sketch" else "estimate",
    )


def merge_partial_blobs(blobs: Iterable[bytes],
                        hash_name: str = hashing.DEFAULT_HASH) -> HyperLogLog | None:
    """Driver-side fold of a small iterable of partial blobs (tiny inputs only)."""
    return HyperLogLog.merge_many(
        HyperLogLog.from_bytes(b, hash_name) for b in blobs
    )


def sketch_merge_aggregate(kind: str, params: dict | None = None, *,
                           blob_column: str = "sketch",
                           finalize: "str | object" = "sketch",
                           name: str | None = None):
    """Generic mergeable Ray AggregateFn over partial-sketch blob rows for
    ANY registered sketch kind — the north-star's "all sketches as mergeable
    UDAFs" surface: ``ds.groupby(key).aggregate(sketch_merge_aggregate(
    "tdigest", {"delta": 200}, finalize=lambda sk: sk.quantile(0.5)))``.

    Accumulator = the sketch's own wire blob (kilobyte-scale), so Ray's
    groupby-aggregate tree-reduction ships sketches, never raw values —
    the same two-level merge shape the reference builds by hand with
    Parallel.ForEach + PLINQ (ConcurrentCardinalityEstimator.cs:709-773).

    ``finalize``: ``"sketch"`` → the merged wire blob (binary);
    ``"estimate"`` → ``sk.estimate()`` (kinds exposing it: hll, theta);
    or any callable ``sk -> scalar`` (cloudpickled into the reduce tasks).
    Merge-order caveat: hll/theta/countmin/bloom merges are exactly
    order-invariant; tdigest/kll/reservoir are order- or coin-dependent,
    so finalize those to values with published error bounds, not to blobs
    expected to be bit-stable across runs.
    """
    from ray.data.aggregate import AggregateFn

    params = dict(params or {})

    def init(_key):
        return build_sketch(kind, params).to_bytes()

    def accumulate_block(acc: bytes, block) -> bytes:
        sk = sketch_from_blob(kind, acc)
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        for blob in tbl[blob_column]:
            sk.merge(sketch_from_blob(kind, blob.as_py()))
        return sk.to_bytes()

    def merge(a: bytes, bb: bytes) -> bytes:
        sk = sketch_from_blob(kind, a)
        sk.merge(sketch_from_blob(kind, bb))
        return sk.to_bytes()

    def finalize_fn(acc: bytes):
        if finalize == "sketch":
            return acc
        sk = sketch_from_blob(kind, acc)
        if finalize == "estimate":
            return sk.estimate()
        return finalize(sk)

    if name is None:
        name = kind if finalize == "sketch" else "estimate"
    return AggregateFn(
        init=init,
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=finalize_fn,
        name=name,
    )


class GenericSketchPartials:
    """map_batches stage: build one partial sketch (any registered kind) per
    batch over a scalar column or an exploded list<...> column.

    Emits {sketch: binary, n_added: int64} (plus the key column when keyed).
    The sketch spec (kind + constructor params) is plain data, so the stage
    pickles cheaply into Ray tasks/actors.
    """

    CHUNK = 8192
    #: sketches fed whole batches instead of 8k chunks: count-min/bloom
    #: because their per-add state exceeds L2 anyway (chunking only
    #: multiplies passes over it), theta because one whole-batch add is
    #: one value-collapse + one trim instead of ~100 per-chunk re-trims
    #: (measured 34 -> 10 ms per driver-shape 958k-token block;
    #: KMV state is batching-invariant, asserted in tests)
    UNCHUNKED_KINDS = frozenset({"countmin", "bloom", "theta"})

    def __init__(self, kind: str, params: dict | None, value_column: str, *,
                 explode_list: bool = False, key_column: str | None = None):
        self.kind = kind
        self.params = dict(params or {})
        self.value_column = value_column
        self.explode_list = explode_list
        self.key_column = key_column
        if kind in self.UNCHUNKED_KINDS:
            self.CHUNK = 1 << 31

    def _new(self) -> Sketch:
        return build_sketch(self.kind, self.params)

    def _values(self, batch: pa.Table):
        if self.explode_list:
            col = batch[self.value_column]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vt = col.type.value_type
            if pa.types.is_string(vt) or pa.types.is_binary(vt) or \
                    pa.types.is_large_string(vt) or \
                    pa.types.is_large_binary(vt):
                # string/binary elements stay ARROW for the zero-copy hash
                # path (round-3 review fix: .to_numpy() produced an object
                # array that crashed the fixed-width hash kernels)
                return _flatten_list_column(col)
            return _flatten_tokens(batch, self.value_column)
        col = batch[self.value_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_string(t) or pa.types.is_binary(t) or \
                pa.types.is_large_string(t) or pa.types.is_large_binary(t):
            return col, None  # string columns stay Arrow (zero-copy hash path)
        return col.to_numpy(zero_copy_only=False), None

    def _add_chunked(self, sk: Sketch, values) -> None:
        if hasattr(sk, "reserve_dense") and len(values) >= getattr(sk, "m", 0):
            # register-bank-sized stream into a chunked HLL add: pre-promote
            # to dense so each chunk is a vectorized scatter-max, not a
            # sparse dict merge (storage-only hint; direct exactness kept)
            sk.reserve_dense()
        if isinstance(values, pa.Array):
            for lo in range(0, len(values), self.CHUNK):
                sk.add_arrow(values.slice(lo, self.CHUNK))
            return
        for lo in range(0, len(values), self.CHUNK):
            sk.add_values(values[lo:lo + self.CHUNK])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.key_column is not None:
            batch = _drop_null_keys(batch, self.key_column)
        # keys present BEFORE the null-value row filter: a key whose values
        # are ALL null must still emit an (empty-sketch, n_added=0) row —
        # SQL keeps the group with COUNT(DISTINCT v) = 0, and the
        # HllTokenPartials zero-token path already does this (round-4
        # adversarial-sweep consistency fix)
        pre_filter_keys = None
        if self.key_column is not None:
            kc = batch[self.key_column]
            if isinstance(kc, pa.ChunkedArray):
                kc = kc.combine_chunks()
            pre_filter_keys = (kc.unique(), kc.type)
        if not self.explode_list:
            col = batch[self.value_column]
            if col.null_count:
                # SQL semantics: null values are not elements (the numpy
                # conversion would otherwise turn them into counted NaNs).
                # Filter whole rows so key alignment is preserved.
                batch = batch.filter(pc.is_valid(col))
        values, parents = self._values(batch)
        if self.key_column is None:
            sk = self._new()
            self._add_chunked(sk, values)
            return pa.table({
                "sketch": pa.array([sk.to_bytes()], type=pa.binary()),
                "n_added": pa.array([len(values)], type=pa.int64()),
            })
        keys = batch[self.key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = pc.dictionary_encode(keys)
        key_values = codes.dictionary.to_pylist()
        row_codes = codes.indices.to_numpy(zero_copy_only=False)
        value_codes = row_codes if parents is None else row_codes[parents]
        order = np.argsort(value_codes, kind="stable")
        vc_sorted = value_codes[order]
        if isinstance(values, pa.Array):
            v_sorted = values.take(pa.array(order))
        else:
            v_sorted = values[order]
        out_keys, out_blobs, out_counts = [], [], []
        if len(vc_sorted) == 0:
            bounds = np.array([0])
        else:
            bounds = np.r_[0, np.flatnonzero(np.diff(vc_sorted)) + 1,
                           len(vc_sorted)]
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            sk = self._new()
            self._add_chunked(sk, v_sorted[lo:hi])
            out_keys.append(key_values[int(vc_sorted[lo])])
            out_blobs.append(sk.to_bytes())
            out_counts.append(hi - lo)
        # keys seen before the null-value filter but absent from the value
        # segments (all values null / zero list elements) still emit an
        # empty-sketch row — SQL keeps the group at count 0
        if pre_filter_keys is not None:
            seen = set(out_keys)
            for key in pre_filter_keys[0].to_pylist():
                if key not in seen:
                    sk = self._new()
                    out_keys.append(key)
                    out_blobs.append(sk.to_bytes())
                    out_counts.append(0)
        # typed keys: must match the fully-filtered path's schema exactly
        return pa.table({
            self.key_column: pa.array(out_keys, type=keys.type),
            "sketch": pa.array(out_blobs, type=pa.binary()),
            "n_added": pa.array(out_counts, type=pa.int64()),
        })


def _merge_block_fn(kind: str):
    def merge_block(tbl: pa.Table) -> pa.Table:
        acc: Sketch | None = None
        total = 0
        for blob, n in zip(tbl["sketch"].to_pylist(), tbl["n_added"].to_pylist()):
            sk = sketch_from_blob(kind, blob)
            acc = sk if acc is None else acc.merge(sk)
            total += n
        if acc is None:
            return pa.table({"sketch": pa.array([], type=pa.binary()),
                             "n_added": pa.array([], type=pa.int64())})
        return pa.table({"sketch": pa.array([acc.to_bytes()], type=pa.binary()),
                         "n_added": pa.array([total], type=pa.int64())})

    return merge_block


def _tree_levels(ds, merge_fn, fanout: int, levels: int):
    """Chain the combiner-tree merge levels with OPERATOR FUSION disabled.

    Each level must run as its OWN operator: fused onto the upstream stage,
    a merge task only ever sees the single partial row its own block
    produced, so ``batch_size=fanout`` bundling silently becomes a per-block
    no-op and the driver fold degrades from O(blocks / fanout^levels) to
    O(blocks) rows — invisible at test scale, exactly the failure the tree
    exists to prevent at 10^6-block scale. Measured via ``bench.py --stats``
    (round 4): 64 read blocks -> 64 rows reaching the driver fused, 1 row
    unfused. Ray fuses Map operators whose resource requests match, so each
    level asks for a DISTINCT fractional ``num_cpus`` (merge tasks are
    KB-scale/ms-scale — the request value itself is immaterial).
    """
    for level in range(levels):
        # alternating by level parity: ADJACENT levels always differ (which
        # is what blocks fusion), no matter how deep the tree goes
        ds = ds.map_batches(merge_fn, batch_format="pyarrow",
                            batch_size=fanout,
                            num_cpus=0.9 - 0.05 * (level % 2))
    return ds


def tree_merge_partials(partials_ds, kind: str, *, fanout: int = 64,
                        levels: int = 2) -> tuple[Sketch | None, int]:
    """Global combiner tree for any sketch kind — no all-to-all anywhere.

    Each level is a stateless ``map_batches(merge_block, batch_size=fanout)``
    (fusion-broken — see :func:`_tree_levels`): Ray bundles up to ``fanout``
    upstream partial rows per task, so every
    level divides the row count by its bundling factor while streaming with
    the scan (no repartition shuffle, no barrier). The driver then folds the
    surviving rows via streaming ``iter_batches``. Two levels bound the
    driver fold to ~#blocks / bundling^2 rows — at 10^6-block scale add a
    level rather than widening the driver fold.

    Returns (merged sketch | None, total n_added)."""
    merge_block = _merge_block_fn(kind)
    ds = _tree_levels(partials_ds, merge_block, fanout, levels)
    acc: Sketch | None = None
    total = 0
    for batch in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob, n in zip(batch["sketch"].to_pylist(),
                           batch["n_added"].to_pylist()):
            sk = sketch_from_blob(kind, blob)
            acc = sk if acc is None else acc.merge(sk)
            total += n
    return acc, total


def tree_merge_keyed_partials_generic(partials_ds, key_column: str, kind: str, *,
                                      fanout: int = 512, levels: int = 2) -> dict:
    """Keyed combiner tree for any sketch kind (bundled map levels, no
    all-to-all). Returns dict[key, (Sketch, n_added)]. Low-cardinality keys
    only (the driver streams the reduced rows).

    ``fanout`` counts ROWS, and keyed partial stages emit up to one row per
    key per block — so each level's BLOCK-bundling factor is ~fanout/|keys|.
    The keyed default is therefore larger than the global tree's 64
    (512 rows x <=16 KB blobs = <=8 MB per merge task): at 10 keys that is
    ~50 blocks per bundle, ~2500x over two levels."""

    def merge_block(tbl: pa.Table) -> pa.Table:
        acc: dict = {}
        counts: dict = {}
        for k, blob, n in zip(tbl[key_column].to_pylist(),
                              tbl["sketch"].to_pylist(),
                              tbl["n_added"].to_pylist()):
            sk = sketch_from_blob(kind, blob)
            if k in acc:
                acc[k].merge(sk)
                counts[k] += n
            else:
                acc[k] = sk
                counts[k] = n
        ks = list(acc)
        # key column typed from the INPUT (untyped inference gives null for
        # an empty bundle / int64 for int32 keys -> schema mismatch on concat)
        return pa.table({
            key_column: pa.array(ks, type=tbl.schema.field(key_column).type),
            "sketch": pa.array([acc[k].to_bytes() for k in ks], type=pa.binary()),
            "n_added": pa.array([counts[k] for k in ks], type=pa.int64()),
        })

    ds = _tree_levels(partials_ds, merge_block, fanout, levels)
    acc: dict = {}
    counts: dict = {}
    for batch in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for k, blob, n in zip(batch[key_column].to_pylist(),
                              batch["sketch"].to_pylist(),
                              batch["n_added"].to_pylist()):
            sk = sketch_from_blob(kind, blob)
            if k in acc:
                acc[k].merge(sk)
                counts[k] += n
            else:
                acc[k] = sk
                counts[k] = n
    return {k: (acc[k], counts[k]) for k in acc}


def _merge_rows_by_key(tbl: pa.Table, key_column: str,
                       hash_name: str) -> pa.Table:
    """Merge partial-sketch rows within one batch, one output row per key."""
    acc: dict = {}
    counts: dict = {}
    keys = tbl[key_column].to_pylist()
    blobs = tbl["sketch"].to_pylist()
    added = tbl["n_added"].to_pylist()
    for k, blob, n in zip(keys, blobs, added):
        sk = HyperLogLog.from_bytes(blob, hash_name)
        if k in acc:
            acc[k].merge(sk)
            counts[k] += n
        else:
            acc[k] = sk
            counts[k] = n
    ks = list(acc)
    # key column typed from the INPUT (an untyped pa.array(ks) infers null
    # for an empty bundle and int64 for int32 keys — either way the block
    # schema diverges from sibling bundles and concat fails)
    return pa.table({
        key_column: pa.array(ks, type=tbl.schema.field(key_column).type),
        "sketch": pa.array([acc[k].to_bytes() for k in ks], type=pa.binary()),
        "n_added": pa.array([counts[k] for k in ks], type=pa.int64()),
    })


def tree_merge_keyed_partials(partials_ds, key_column: str, *,
                              hash_name: str = hashing.DEFAULT_HASH,
                              fanout: int = 512, levels: int = 2):
    """Combiner tree over keyed partial-sketch rows — no all-to-all.

    Each level is a stateless ``map_batches(batch_size=fanout)`` that merges
    per key within its bundle of upstream rows (Ray's streaming executor
    pipelines it with the scan; no repartition shuffle). The driver then
    streams the surviving <= rows/bundling^levels rows and folds per key —
    the same shape as the reference's batch-of-8 PLINQ merge tree
    (ConcurrentCardinalityEstimator.cs:709-773). ``fanout`` counts ROWS —
    up to one per key per upstream block — so the keyed default is larger
    than the global tree's 64: block-bundling per level ~= fanout/|keys|
    (512 rows x <=16 KB sketches = <=8 MB per merge task).

    Use for LOW-cardinality keys (sources, languages, shards). For
    high-cardinality keys use ``groupby(key).aggregate(hll_merge_aggregate())``
    which hash-partitions the merge itself.

    Returns ``dict[key, (HyperLogLog, n_added)]``.
    """
    ds = _tree_levels(
        partials_ds, lambda t: _merge_rows_by_key(t, key_column, hash_name),
        fanout, levels)
    acc: dict = {}
    counts: dict = {}
    for batch in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for k, blob, n in zip(batch[key_column].to_pylist(),
                              batch["sketch"].to_pylist(),
                              batch["n_added"].to_pylist()):
            sk = HyperLogLog.from_bytes(blob, hash_name)
            if k in acc:
                acc[k].merge(sk)
                counts[k] += n
            else:
                acc[k] = sk
                counts[k] = n
    return {k: (acc[k], counts[k]) for k in acc}
