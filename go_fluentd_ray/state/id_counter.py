"""Monotonic ID assignment via a shared-counter actor — the ONE place
the Dataset API genuinely can't express the semantics (a shared mutable
counter), so we drop to a raw @ray.remote actor as SURVEY.md §2
prescribes (reference: the acceptor's rotating WAL id counter,
acceptor.go:74-95 + recvs/fluentd.go:382-387).

Scale design: tasks request id RANGES (one RPC per batch, amortized
over thousands of rows), never per-row RPCs. IDs are unique and dense
across the whole dataset; the assignment order between batches follows
execution order (like the reference's arrival order), so only
uniqueness/density are deterministic, not which row gets which id.
``max_rotate`` mirrors the reference's max_rotate_id wraparound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class IdCounter:
    """Range allocator: alloc(n) -> first id of a fresh block of n."""

    def __init__(self, start: int = 0, max_rotate: int | None = None):
        self.next = start
        self.max_rotate = max_rotate

    def alloc(self, n: int) -> int:
        if self.max_rotate is not None:
            if n > self.max_rotate:
                raise ValueError(f"block {n} exceeds max_rotate "
                                 f"{self.max_rotate}")
            # rotate BEFORE handing out the block so every emitted id
            # stays strictly below the cap (max_rotate_id semantics)
            if self.next + n > self.max_rotate:
                self.next = 0
        first = self.next
        self.next += n
        return first

    def current(self) -> int:
        return self.next


def assign_ids(ds, id_col: str = "msg_id",
               counter: "ray.actor.ActorHandle | None" = None):
    """map_batches stage: one alloc() RPC per batch, consecutive ids
    within the batch.

    The result is MATERIALIZED before returning: allocation is a side
    effect, so re-executing the lazy graph (second consumption, task
    retry lineage recompute) would hand out fresh ranges and break the
    unique-and-dense contract. Materializing pins the assigned blocks
    in the object store; for a deterministic identity that needs no
    pinning, prefer natural keys like (conv_id, turn_idx) — this stage
    exists for reference parity with the WAL id counter."""
    counter = counter or IdCounter.remote()

    def fn(batch: pa.Table) -> pa.Table:
        first = ray.get(counter.alloc.remote(batch.num_rows))
        ids = np.arange(first, first + batch.num_rows, dtype=np.int64)
        return batch.append_column(id_col, pa.array(ids))

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
