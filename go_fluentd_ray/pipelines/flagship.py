"""Flagship pipeline: the full go-fluentd dataflow on Ray Data.

    read_parquet(transcripts)
      -> acceptor      (map_batches, pyarrow: window/retag/accept/is_head)
      -> add_bucket    (map_batches, pyarrow: hash(conv_id) % B)
      -> concat        (groupby(bucket).map_groups, pandas: the ONE shuffle)
      -> finish        (map_batches actor pool: parse -> enrich -> truncate -> route)
      -> sinks / aggregates

Reference dataflow being re-expressed: acceptor -> acceptorPipeline ->
journal -> dispatcher -> tagPipeline -> postPipeline -> producer
(reference README.md:130-143). The WAL/journal disappears (lineage +
idempotent sink writes give stronger guarantees, see stages/sinks.py);
backpressure/throttling disappears (streaming executor handles it).

Scale notes (100 TB): every stage is vectorized Arrow; the only
all-to-all exchange is the bucket groupby whose key count B is chosen
~2-4x total cores so each bucket is a healthy block (tens of MB), not
per-conv_id micro-groups. Parse/enrich are actor pools so regex/config
compilation happens once per worker, not per batch.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..oracle import OUTPUT_SCHEMA
from ..stages.acceptor import acceptor_transform
from ..stages.concat import add_bucket, concat_bucket
from ..stages.enrich import Enricher
from ..stages.parse import parse_batch
from ..stages.postfilter import route_batch, truncate_batch


class Finisher:
    """Actor-pool stage fusing parse -> enrich -> truncate -> route.

    One actor pool instead of four task stages: the per-batch Arrow
    tables never leave the worker between sub-steps, and the compiled
    enrich plans live once per actor.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.enrich = Enricher(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = parse_batch(batch, self.cfg)
        out = self.enrich(out)
        out = truncate_batch(out, self.cfg)
        return route_batch(out, self.cfg)


def _cluster_cpus() -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8))
    return 8


def default_num_buckets() -> int:
    # 4x cores, matching the read-block floor: the groupby's sort stage
    # emits one reduce partition per input block, and bucket count must
    # exceed reduce-partition count or range quantization packs several
    # buckets into one partition. 2x cores produced a SINGLE 32-task
    # reduce wave at 32 cpus whose slowest block (4.3x row imbalance)
    # set the whole wall; 4x gives >=4 waves so imbalance amortizes
    # (measured 15.4s -> 11.9s median at 10M turns / 32 cpus).
    return max(8, _cluster_cpus() * 4)


def read_transcripts(path: str) -> "ray.data.Dataset":
    """read_parquet with a block count sized to the input: Ray's default
    splitting yields ~2 MB blocks on many-small-file corpora, and the
    per-block overhead then dominates the shuffle (measured 6x slowdown).
    Target ~32 MB blocks, floored at the core count for parallelism."""
    import os

    import ray.data as rd

    total = 0
    if os.path.isdir(path):
        for f in os.listdir(path):
            total += os.path.getsize(os.path.join(path, f))
    elif os.path.isfile(path):
        total = os.path.getsize(path)
    cpus = _cluster_cpus()
    if total:
        # ~4 MB blocks (not 32 MB): downstream groupby reduce
        # parallelism follows the block count, and a block count == core
        # count runs the reduce as ONE wave where the slowest partition
        # sets the wall (measured 4.3x row imbalance -> a 7.9 s
        # straggler task = the wall at 10M turns / 32 cpus; ~4x blocks
        # per core gives the reduce 4 waves to absorb it, median
        # 15.4 s -> 11.9 s). The floor stays at the core count so small
        # corpora keep >=1 block per core without entering the
        # sub-MB-block regime where per-task overhead dominates.
        nblocks = min(max(cpus, total // (4 << 20)), cpus * 16)
        return rd.read_parquet(path, override_num_blocks=int(nblocks))
    return rd.read_parquet(path)


_FINISHER_CACHE: dict[str, Finisher] = {}


def _cached_finisher_fn(cfg: PipelineConfig):
    """Task-mode finisher: Ray reuses worker processes across tasks, so
    a module-level cache gives actor-style setup amortization without
    pool scheduling constraints (measured ~15% faster end-to-end at 10M
    rows because the stage can use every CPU and pays no pool spawn)."""
    import hashlib
    import pickle

    digest = hashlib.md5(pickle.dumps(cfg)).hexdigest()

    def fn(batch: pa.Table) -> pa.Table:
        f = _FINISHER_CACHE.get(digest)
        if f is None:
            # keep at most one entry: a worker executes one pipeline's
            # tasks at a time, and unbounded per-config growth would
            # pin dead Finishers in long-lived workers
            _FINISHER_CACHE.clear()
            f = _FINISHER_CACHE[digest] = Finisher(cfg)
        return f(batch)

    return fn


def build_pipeline(
    ds: "ray.data.Dataset",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_buckets: int | None = None,
    finisher_concurrency: int | tuple[int, int] | None = None,
    finisher_mode: str = "actors",
) -> "ray.data.Dataset":
    """Compose the lazy Dataset pipeline (no execution happens here).

    finisher_mode: "actors" (default — the stateful actor-pool pattern,
    state built once per actor) or "tasks" (per-worker cached state)."""
    B = num_buckets or default_num_buckets()
    ds = ds.map_batches(lambda t: acceptor_transform(t, cfg),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(lambda t: add_bucket(t, B),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.groupby("bucket").map_groups(
        lambda df: concat_bucket(df, cfg), batch_format="pandas")
    if finisher_mode not in ("actors", "tasks"):
        raise ValueError(f"finisher_mode must be 'actors' or 'tasks', "
                         f"got {finisher_mode!r}")
    if finisher_mode == "tasks":
        return ds.map_batches(_cached_finisher_fn(cfg),
                              batch_format="pyarrow", zero_copy_batch=True)
    # fixed-size pool: autoscaling (1,N) ramps too slowly and leaves the
    # parse stage underparallelized (measured 8.2s vs 5.6s at 3M rows)
    conc = finisher_concurrency or max(2, _cluster_cpus() // 2)
    ds = ds.map_batches(Finisher, fn_constructor_args=(cfg,),
                        batch_format="pyarrow", zero_copy_batch=True,
                        concurrency=conc)
    return ds


def run_local(table: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG,
              num_buckets: int = 8) -> pa.Table:
    """The full pipeline as a pure in-memory function (no Ray) — the
    same stage functions map_batches runs distributed. Used by unit /
    property tests and handy for debugging single batches."""
    from ..stages.postfilter import route_batch, truncate_batch

    t = acceptor_transform(table, cfg)
    t = add_bucket(t, num_buckets)
    parts = []
    df = t.to_pandas()
    for _, g in df.groupby("bucket", sort=True):
        parts.append(concat_bucket(g, cfg))
    merged = pa.concat_tables(parts) if parts else None
    if merged is None or merged.num_rows == 0:
        from ..oracle import OUTPUT_SCHEMA

        return OUTPUT_SCHEMA.empty_table()
    out = parse_batch(merged, cfg)
    out = Enricher(cfg)(out)
    out = truncate_batch(out, cfg)
    out = route_batch(out, cfg)
    idx = pa.compute.sort_indices(
        out, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    return out.take(idx)


def result_table_sorted(ds: "ray.data.Dataset") -> pa.Table:
    import ray

    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows > 0]
    if not parts:
        return OUTPUT_SCHEMA.empty_table()
    tbl = pa.concat_tables([p.select(OUTPUT_SCHEMA.names) for p in parts])
    idx = pa.compute.sort_indices(
        tbl, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    return tbl.take(idx)


def _count_partial(keys: list[str]):
    """Per-batch count combiner: the shuffle moves one row per distinct
    key tuple per batch instead of one per record (pattern of
    events.hourly_partial; measured ~2x on sink_counts at sf0.1)."""
    import pandas as pd

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        return (df.groupby(keys, sort=False, dropna=False).size()
                .rename("n").reset_index())

    return partial


def sink_counts(ds: "ray.data.Dataset"):
    """Per-sink routed-row counts — the reference dispatcher's per-tag
    monitoring counters (dispacher.go:138-141) as a pre-aggregated
    groupby. The projection BEFORE the combiner matters: the pandas
    partial then converts one column, not the whole 25-column batch."""
    from ray.data.aggregate import Sum

    ds = ds.select_columns(["sink"]).map_batches(
        _count_partial(["sink"]), batch_format="pandas")
    return ds.groupby("sink").aggregate(Sum("n", alias_name="n")).sort("sink")


def tool_role_sink_counts(ds: "ray.data.Dataset"):
    from ray.data.aggregate import Sum

    ds = ds.select_columns(["tool", "role", "sink"]).map_batches(
        _count_partial(["tool", "role", "sink"]), batch_format="pandas")
    return (ds.groupby(["tool", "role", "sink"])
            .aggregate(Sum("n", alias_name="n"))
            .sort(["tool", "role", "sink"]))
