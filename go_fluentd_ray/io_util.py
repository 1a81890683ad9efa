"""Size-aware parquet reads shared by all table queries.

Ray's default read splitting targets parallelism, not block size: a
3 MB single-file table splits into 64 near-empty blocks, and every
downstream stage then pays per-task scheduling for nothing (measured:
the minhash pipeline at 5k docs spends ~75% of its wall in fixed
per-stage latency over 64-128 tiny blocks). The flagship read solved
this for transcripts (pipelines/flagship.read_transcripts); this is
the same rule for any parquet table: target ~32 MB blocks, floored at
the core count so wide maps still use every core, capped so huge
inputs keep many blocks (streaming, spillable).
"""

from __future__ import annotations

import os


def _cluster_cpus() -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8))
    return 8


def _path_bytes(path) -> int:
    total = 0
    if isinstance(path, (list, tuple)):
        return sum(os.path.getsize(p) for p in path
                   if os.path.isfile(p))
    if os.path.isdir(path):
        for f in os.listdir(path):
            p = os.path.join(path, f)
            if os.path.isfile(p):
                total += os.path.getsize(p)
    elif os.path.isfile(path):
        total = os.path.getsize(path)
    return total


def sized_read_parquet(path, columns: list[str] | None = None,
                       target_block_bytes: int = 32 << 20):
    """read_parquet with override_num_blocks sized to the input bytes
    (floor = cores for map parallelism, cap = 16x cores so block count
    stays bounded per node while blocks stay ~32 MB). `path` may be a
    directory, a file, or an explicit list of files."""
    import ray.data as rd

    total = _path_bytes(path)
    cpus = _cluster_cpus()
    if total:
        nblocks = int(min(max(cpus, total // target_block_bytes),
                          cpus * 16))
        return rd.read_parquet(path, columns=columns,
                               override_num_blocks=nblocks)
    return rd.read_parquet(path, columns=columns)
