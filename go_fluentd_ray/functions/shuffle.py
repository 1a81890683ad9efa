"""Bucketed-shuffle primitives shared by the dedup / join / window
operators.

The recurring scale problem: ``groupby(high_cardinality_key)
.map_groups(fn)`` costs one Python call per group — millions of tiny
calls at real key cardinality (the failure mode stages/concat.py was
designed around). The fix, applied uniformly here: group by
``hash(key) % B`` (B ~ a few per core, scaling with data size) and run
ONE vectorized pandas/numpy function per bucket. The documented
partitioning assumption is only that all rows of one key co-locate in
one bucket, which the deterministic hash guarantees.

These helpers also implement the repo's shuffle-native JOIN: instead of
broadcasting a side via take_all()/ray.put (whole-dataset
materialization — forbidden at 100 TB), both sides are bucketed on the
join key, unioned, and merged per-bucket with a vectorized
``pd.merge``. Sort-based shuffle is deliberately used over Ray's hash
shuffle (measured 3-6x faster at 0.5-2 GB block scales, BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def default_buckets(mult: int = 2, floor: int = 32) -> int:
    """B ~ mult x cluster cores (floored): each bucket is a healthy
    block and per-bucket vectorized work dominates scheduling. At data
    scales where a bucket would outgrow worker memory, callers pass
    num_buckets explicitly (B only has to satisfy
    rows_per_key_group << corpus/B << worker heap)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(floor, cpus * mult)


def hash_bucket(*cols: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id from one or more key columns (stable
    across processes — unlike Python's seeded str hash)."""
    h = pd.util.hash_array(np.asarray(cols[0]))
    for c in cols[1:]:
        h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(np.asarray(c))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def add_bucket_col(batch: pa.Table, keys: list[str], num_buckets: int,
                   out: str = "__bkt") -> pa.Table:
    arrs = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
    if batch.schema.metadata:
        # parquet-read blocks carry pandas metadata, which makes their
        # pa.Schema UNHASHABLE and defeats Ray's schema-dedup in every
        # downstream shuffle reduce ("Failed to hash the schemas");
        # this is the chokepoint every bucket shuffle passes through
        batch = batch.replace_schema_metadata(None)
    return batch.append_column(
        out, pa.array(hash_bucket(*arrs, num_buckets=num_buckets)))


def bucketed_distinct(ds, keys: list[str], num_buckets: int | None = None):
    """Global distinct on ``keys`` without per-key map_groups: per-batch
    drop_duplicates combiner, then one drop_duplicates per hash bucket.
    Rows must be identical per key tuple (deterministic payload)."""
    B = num_buckets or default_buckets()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(keys)

    ds = ds.map_batches(combine, batch_format="pandas")
    ds = ds.map_batches(lambda t: add_bucket_col(t, keys, B),
                        batch_format="pyarrow")
    out = ds.groupby("__bkt").map_groups(combine, batch_format="pandas")
    return out.drop_columns(["__bkt"])


def bucketed_attach(pairs_ds, corpus_ds, left_keys: tuple[str, str],
                    corpus_key: str, value_col: str,
                    out_cols: tuple[str, str],
                    num_buckets: int | None = None,
                    dedup_sides: bool = False,
                    finalize=None):
    """Shuffle-native double lookup: for a (a, b) pair table, attach the
    corpus ``value_col`` for BOTH sides in one corpus shuffle.

    1. pairs explode to (key=a, side=0) + (key=b, side=1) rows;
    2. union with corpus rows (key=corpus_key, side=-1, value);
    3. groupby(hash(key) % B): an Arrow hash join attaches value to
       each pair-side row (the corpus moves across the wire ONCE);
    4. groupby(hash(a,b) % B): the two sides of each pair re-co-locate
       and pivot to (a, b, out_cols[0], out_cols[1]).

    Every per-bucket step is Arrow-native (pa.Table.join / group_by) —
    int64 keys and ids NEVER round-trip through a null-padded pandas
    float64 frame, so full-range 64-bit values (content hashes,
    simhashes) survive exactly.

    Contract: ``corpus_key`` must be UNIQUE in corpus_ds (a duplicated
    key would duplicate every pair touching it — both joins here are
    many-to-one by assumption), and pair keys are attached with an
    INNER join: a pair whose key is absent from the corpus is dropped
    rather than emitted with a null value (callers like minhash derive
    pairs from the corpus itself, so nothing is lost there).

    ``dedup_sides=True`` makes duplicate (a, b) pairs in the input
    harmless (side rows are deduped inside the keyed stage — cheaper
    than a standalone distinct shuffle when the payload per key is
    deterministic). ``finalize(df)`` runs INSIDE the pivot stage on the
    joined (a, b, out_cols...) pandas frame (all columns non-null there,
    so the conversion is exact) — fusing the consumer (e.g. a verify
    filter) into the shuffle stage so wide intermediate rows are
    reduced before they are ever written out as blocks. Nothing is
    materialized on the driver."""
    B = num_buckets or default_buckets()
    ka, kb = left_keys

    sides_schema = pa.schema([
        ("__key", pa.int64()), ("a", pa.int64()), ("b", pa.int64()),
        ("__side", pa.int8()), ("__val", pa.string()),
    ])

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = batch[ka].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[kb].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        return pa.table({
            "__key": pa.array(np.concatenate([a, b])),
            "a": pa.array(np.concatenate([a, a])),
            "b": pa.array(np.concatenate([b, b])),
            "__side": pa.array(
                np.repeat(np.array([0, 1], dtype=np.int8), n)),
            "__val": pa.nulls(2 * n, pa.string()),
        }, schema=sides_schema)

    def corpus_rows(batch: pa.Table) -> pa.Table:
        k = batch[corpus_key].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        return pa.table({
            "__key": pa.array(k),
            "a": pa.nulls(n, pa.int64()),
            "b": pa.nulls(n, pa.int64()),
            "__side": pa.array(np.full(n, -1, dtype=np.int8)),
            "__val": batch[value_col].cast(pa.string()),
        }, schema=sides_schema)

    sides = pairs_ds.map_batches(explode_pairs, batch_format="pyarrow")
    corpus = corpus_ds.select_columns([corpus_key, value_col]).map_batches(
        corpus_rows, batch_format="pyarrow")
    unioned = sides.union(corpus).map_batches(
        lambda t: add_bucket_col(t, ["__key"], B), batch_format="pyarrow")

    def attach(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Re-pin the side-row types: when pairs_ds is ALL-empty (zero
        # candidate pairs — routine once exact-duplicate collapse
        # canonicalizes a copy-only corpus) its blocks lose their
        # schema and the union/shuffle can surface null-typed a/b/val
        # columns, which Acero's hash join rejects as non-key fields.
        for name in ("a", "b", "__val"):
            idx = tbl.schema.get_field_index(name)
            want = sides_schema.field(name).type
            if idx >= 0 and tbl.schema.field(idx).type != want:
                tbl = tbl.set_column(idx, name, pc.cast(tbl[name], want))
        side = tbl["__side"]
        vals = tbl.filter(pc.equal(side, -1)).select(["__key", "__val"])
        prs = tbl.filter(pc.greater_equal(side, 0)).select(
            ["__key", "a", "b", "__side"])
        if dedup_sides and prs.num_rows:
            # __key is a pure function of (a, b, __side), so grouping on
            # all four == distinct pair-sides (aggregate([]) = distinct)
            prs = prs.group_by(
                ["__key", "a", "b", "__side"]).aggregate([]).select(
                ["__key", "a", "b", "__side"])
        # INNER: pair keys missing from the corpus drop here (see
        # contract in the docstring)
        m = prs.join(vals, keys="__key", join_type="inner")
        return m.select(["a", "b", "__side", "__val"])

    attached = unioned.groupby("__bkt").map_groups(
        attach, batch_format="pyarrow")
    attached = attached.map_batches(
        lambda t: add_bucket_col(t, ["a", "b"], B), batch_format="pyarrow")

    ca, cb = out_cols

    def pivot(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # same schema-loss guard as attach(): an all-empty attach
        # output arrives here null-typed, and a/b are JOIN KEYS below
        for name in ("a", "b", "__val"):
            idx = tbl.schema.get_field_index(name)
            want = sides_schema.field(name).type
            if idx >= 0 and tbl.schema.field(idx).type != want:
                tbl = tbl.set_column(idx, name, pc.cast(tbl[name], want))
        side = tbl["__side"]
        left = tbl.filter(pc.equal(side, 0)).select(
            ["a", "b", "__val"]).rename_columns(["a", "b", ca])
        right = tbl.filter(pc.equal(side, 1)).select(
            ["a", "b", "__val"]).rename_columns(["a", "b", cb])
        out = left.join(right, keys=["a", "b"], join_type="inner")
        out = out.select(["a", "b", ca, cb])
        if finalize is not None:
            # joined rows have no nulls -> exact pandas conversion
            out = pa.Table.from_pandas(finalize(out.to_pandas()),
                                       preserve_index=False)
        return out

    # pivot's output already excludes __bkt
    return attached.groupby("__bkt").map_groups(pivot, batch_format="pyarrow")


def bucketed_anti_join(ds, key: str, keys_ds, keys_col: str,
                       num_buckets: int | None = None):
    """ds rows whose ``key`` is NOT in keys_ds[keys_col] — the
    distributed anti-join: both sides bucket on hash(key) % B, one
    corpus shuffle, vectorized is_in filter per bucket. Replaces the
    take_all()-the-key-set-and-broadcast pattern, which is unbounded
    when the key set scales with the corpus. The per-bucket filter is
    Arrow-native end to end, so int64 columns (full-range content
    hashes, ids > 2^53) are never promoted to float64 by null-padded
    pandas frames."""
    B = num_buckets or default_buckets()
    base = ds.schema().base_schema
    if not isinstance(base, pa.Schema):
        # pandas-block datasets report a PandasBlockSchema; resolve the
        # Arrow schema from a one-row prefix instead
        import ray

        base = ray.get(ds.limit(1).to_arrow_refs()[0]).schema

    def corpus_rows(batch: pa.Table) -> pa.Table:
        out = batch.append_column(
            "__drop", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))
        return add_bucket_col(out, [key], B)

    def key_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for f in base:
            if f.name == key:
                c = batch[keys_col].cast(f.type)
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                cols.append(c)
            else:
                cols.append(pa.nulls(n, f.type))
        out = pa.Table.from_arrays(cols, schema=base)
        out = out.append_column(
            "__drop", pa.array(np.ones(n, dtype=np.int8)))
        return add_bucket_col(out, [key], B)

    left = ds.map_batches(corpus_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    right = keys_ds.map_batches(key_rows, batch_format="pyarrow")

    def anti(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        drop = tbl["__drop"]
        dropset = tbl.filter(pc.equal(drop, 1))[key]
        if isinstance(dropset, pa.ChunkedArray):
            dropset = dropset.combine_chunks()
        keep = tbl.filter(pc.equal(drop, 0))
        out = keep.filter(pc.invert(pc.is_in(keep[key], value_set=dropset)))
        return out.drop_columns(["__drop", "__bkt"]).select(base.names)

    return left.union(right).groupby("__bkt").map_groups(
        anti, batch_format="pyarrow")
