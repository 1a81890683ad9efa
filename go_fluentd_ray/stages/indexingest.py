"""Incremental maintenance of the persisted retrieval indexes: the
composition of stages/incremental.py's file-claiming state + O_EXCL
lease with bm25index/annindex appends.

A scheduler pointing run_index_ingest at a growing corpus directory
gets, per tick: claim the parquet files no previous tick ingested
(same _INGESTED.json contract as run_incremental), then either

- first tick: FULL build over the claimed files;
- normal tick: APPEND the new files' docs/vectors into the existing
  shard dirs (one batch-sized pass — postings fold as exact integer
  sums for BM25; vectors encode against the frozen IVF-PQ model);
- staleness tick: once appended volume exceeds the rebuild fraction
  of the last full build (bm25index.STALENESS_REBUILD_FRAC /
  annindex.needs_rebuild), pay a FULL rebuild over the union of every
  claimed file — refreshing BM25 shard-file fragmentation and the
  IVF-PQ centroid fit.

The whole tick runs under the ingest lease, so two overlapping
scheduler invocations serialize and each corpus file is ingested
exactly once (the run_incremental guarantee, now covering the index
sinks too). This is the sink-side analogue of the reference journal's
tailing continuous operation (library/journal/journal.go:495-511):
new data is absorbed incrementally, and a reader sees either the old
or the new index meta, never a torn one.

Rebuilds go through a tmp dir + directory swap so a concurrent reader
never observes a half-rebuilt index: the old index dir is renamed
aside, the new one renamed in, and the old one removed.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from .incremental import _load_state, _save_state, ingest_lease


def _read_sized(paths: "list[str]"):
    import ray
    import ray.data as rd

    total = sum(os.path.getsize(p) for p in paths)
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nblocks = int(max(cpus, total // (32 << 20))) or 1
    return rd.read_parquet(paths, override_num_blocks=nblocks)


def _swap_in(out_root: str, tmp: str, index_dir: str) -> None:
    """Atomic-ish replace: old dir moves aside before the new one
    moves in, so index_dir never holds a mix of both."""
    old = None
    if os.path.isdir(index_dir):
        old = tempfile.mkdtemp(dir=out_root, prefix=".old-")
        os.rename(index_dir, os.path.join(old, "index"))
    os.rename(tmp, index_dir)
    if old:
        shutil.rmtree(old, ignore_errors=True)


def run_index_ingest(corpus_path: str, out_root: str, kind: str = "bm25",
                     rebuild_frac: float | None = None,
                     lease_ttl_sec: float = 900.0,
                     lease_timeout_sec: float | None = 600.0,
                     **index_kwargs) -> dict:
    """One maintenance tick for the index under ``out_root/index``.
    kind: "bm25" (documents: doc_id, text) or "ivfpq" (embeddings:
    vec_id, embedding). index_kwargs pass through to the builder
    (e.g. n_centroids/m/ks for ivfpq). Returns tick metrics."""
    if kind == "bm25":
        from ..functions import bm25index as mod
        build, append = mod.build_bm25_index, mod.append_bm25_index
        if rebuild_frac is None:
            rebuild_frac = mod.STALENESS_REBUILD_FRAC
    elif kind == "ivfpq":
        from ..functions import annindex as mod
        build, append = mod.build_ivfpq_index, mod.append_ivfpq_index
        if rebuild_frac is None:
            rebuild_frac = 0.5
    else:
        raise ValueError(f"unknown index kind {kind!r}")

    os.makedirs(out_root, exist_ok=True)
    index_dir = os.path.join(out_root, "index")
    with ingest_lease(out_root, ttl_sec=lease_ttl_sec,
                      timeout_sec=lease_timeout_sec):
        state = _load_state(out_root)
        claimed = {f for b in state["batches"] for f in b["files"]}
        files = sorted(os.path.basename(f) for f in glob.glob(
            os.path.join(corpus_path, "*.parquet")))
        new = [f for f in files if f not in claimed]
        action = "noop"
        if new:
            new_paths = [os.path.join(corpus_path, f) for f in new]
            has_index = os.path.exists(
                os.path.join(index_dir, "meta.json"))
            if not has_index:
                action = "build"
                tmp = tempfile.mkdtemp(dir=out_root, prefix=".bld-")
                build(_read_sized(new_paths), tmp, **index_kwargs)
                _swap_in(out_root, tmp, index_dir)
            else:
                # decide BEFORE appending: a rebuild tick must not pay
                # a doomed append pass first. The new batch's row count
                # is one cheap metadata read (parquet row counts).
                import json as _json

                import pyarrow.parquet as _pq

                n_new_rows = sum(_pq.ParquetFile(p).metadata.num_rows
                                 for p in new_paths)
                with open(os.path.join(index_dir, "meta.json")) as f:
                    m = _json.load(f)
                base = max(m.get("base_docs", m.get("base_rows", 1)), 1)
                appended = m.get("appended_docs",
                                 m.get("appended_rows", 0))
                if appended + n_new_rows > rebuild_frac * base:
                    action = "rebuild"
                    union = [os.path.join(corpus_path, f)
                             for f in sorted(claimed | set(new))]
                    tmp = tempfile.mkdtemp(dir=out_root, prefix=".bld-")
                    build(_read_sized(union), tmp, **index_kwargs)
                    _swap_in(out_root, tmp, index_dir)
                else:
                    append(index_dir, _read_sized(new_paths))
                    action = "append"
            bid = max((b["id"] for b in state["batches"]), default=-1) + 1
            state["batches"].append({"id": bid, "files": new,
                                     "action": action,
                                     "per_sink": {}, "rows": 0})
            _save_state(out_root, state)
    return {"new_files": len(new), "action": action,
            "files_total": len(claimed) + len(new),
            "index_dir": index_dir}
