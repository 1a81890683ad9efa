"""Connected components over a near-duplicate pair graph — the dedup
endgame: verified pairs (from MinHash / SimHash / embedding cosine)
form an undirected graph; each component keeps ONE representative (the
min node id) and every other member is dropped.

Algorithm: iterative bucketed min-label propagation (the standard
large-graph CC approach when the edge set lives in a distributed
dataset): every node starts labelled min(self, neighbors); each round
pushes labels across edges and takes the per-node min; fixpoint is
reached in <= graph-diameter rounds. Every round is two small bucketed
shuffles over the PAIR graph (bounded by the near-dup count, orders of
magnitude below the corpus) — the corpus itself is touched exactly
once, by the final bucketed anti-join row filter.

Convergence is detected with a cheap global Sum aggregate on the label
dataset (labels only ever decrease, so an unchanged sum IS the
fixpoint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shuffle import add_bucket_col, default_buckets


def _min_label_partial(tbl: pa.Table) -> pa.Table:
    """Per-batch combiner (arrow-native: every block in the label loop
    stays an ArrowBlock, and int64 node ids are never widened)."""
    g = tbl.group_by("n").aggregate([("lab", "min")])
    return g.select(["n", "lab_min"]).rename_columns(["n", "lab"])


SMALL_GRAPH_EDGES = 5_000_000


def _unionfind_table(batch: pa.Table) -> pa.Table:
    """Single-task CC: array-based union-find with path halving over
    the whole (compacted-id) edge list, then a second pass relabels
    every root to the MIN original id of its component. Runs in ONE
    worker task (never on the driver) — the small-graph fast path."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(ids, a)
    cb = np.searchsorted(ids, b)
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for i in range(len(ca)):
        ra, rb = find(ca[i]), find(cb[i])
        if ra != rb:
            # union by smaller ORIGINAL id keeps the min-id invariant
            if ids[ra] < ids[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    # full path compression, vectorized fixpoint
    while True:
        nxt = parent[parent]
        if np.array_equal(nxt, parent):
            break
        parent = nxt
    return pa.table({"n": pa.array(ids),
                     "root": pa.array(ids[parent])})


def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b",
                         num_buckets: int | None = None,
                         max_iters: int = 30,
                         stats: dict | None = None,
                         small_graph_edges: int = SMALL_GRAPH_EDGES):
    """(a, b) pair Dataset -> (n, root) Dataset, root = min node id in
    the component. Nodes not in any pair are absent (their root is
    themselves by definition). When ``stats`` is passed, fills in
    iterations / n_edges / n_nodes (for scaling evidence).

    Two paths, chosen by edge count:
    - pair graphs up to ``small_graph_edges`` run single-task
      union-find in ONE worker (near-dup pair graphs are orders of
      magnitude smaller than the corpus — 0.27M edges from 400k docs
      here — and the iterative path's per-round shuffle latency
      dominates such graphs at ANY cluster size: measured 14 rounds /
      ~126 s iterative vs ~2 s union-find on that graph);
    - larger graphs take the iterative bucketed min-label propagation
      + pointer doubling below, whose per-round work IS distributed.
    The threshold is a worker-heap bound (~16 bytes/edge + id arrays),
    not a driver bound — the edge list never lands on the driver."""
    B = num_buckets or default_buckets()

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    # Pin the pair set ONCE: CC consumes pairs_ds at least twice (the
    # path-choice count plus the chosen path), and callers routinely
    # hand in the LAZY tail of an expensive pipeline (minhash banding +
    # verify) — without this, every consumption re-executes that whole
    # pipeline (measured 3x the minhash wall inside
    # minhash_dedup_keep_best at sf0.1). Pair tables are skinny (2-3
    # int64/float64 columns, orders below the corpus), so holding the
    # blocks in the object store is the cheap side of the trade.
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs <= small_graph_edges:
        if stats is not None:
            stats["iterations"] = 1
            stats["n_edges"] = n_pairs
            stats["path"] = "unionfind"

        def rename_cols(batch: pa.Table) -> pa.Table:
            return pa.table({"a": batch[a_col].cast(pa.int64()),
                             "b": batch[b_col].cast(pa.int64())})

        out = (pairs_ds.map_batches(rename_cols, batch_format="pyarrow")
               .repartition(1)
               .map_batches(_unionfind_table, batch_format="pyarrow",
                            batch_size=None))
        if stats is not None:
            out = out.materialize()
            stats["n_nodes"] = out.count()
        return out

    edges = pairs_ds.map_batches(both_dirs,
                                 batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        return pa.table({"n": pa.array(u),
                         "lab": pa.array(np.minimum(u, v))})

    # exact per-node min label via the bucketed map_groups pattern, NOT
    # Dataset.aggregate: node ids are corpus-cardinality and the
    # sort-based aggregate is the same high-cardinality hazard the Q3
    # join's pre-agg measured at 15.9 s/1.47M keys — a node's partials
    # all land in one hash(n) bucket, so the bucket mins are exact
    def bucket_min(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by("n").aggregate([("lab", "min")])
        return (g.select(["n", "lab_min"])
                .rename_columns(["n", "lab"]))

    def min_by_node(ds_):
        return (ds_.map_batches(lambda t: add_bucket_col(t, ["n"], B),
                                batch_format="pyarrow")
                .groupby("__bkt").map_groups(bucket_min,
                                             batch_format="pyarrow"))

    labels = min_by_node(
        edges.map_batches(init_labels, batch_format="pyarrow")
        .map_batches(_min_label_partial, batch_format="pyarrow")
    ).materialize()
    prev_sum = labels.sum("lab")

    sides_schema = pa.schema([("__key", pa.int64()), ("u", pa.int64()),
                              ("lab", pa.int64()), ("__side", pa.int8())])

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"__key": batch["v"].cast(pa.int64()),
                         "u": batch["u"].cast(pa.int64()),
                         "lab": pa.nulls(n, pa.int64()),
                         "__side": pa.array(np.zeros(n, dtype=np.int8))},
                        schema=sides_schema)

    def label_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"__key": batch["n"].cast(pa.int64()),
                         "u": pa.nulls(n, pa.int64()),
                         "lab": batch["lab"].cast(pa.int64()),
                         "__side": pa.array(np.ones(n, dtype=np.int8))},
                        schema=sides_schema)

    def push(tbl: pa.Table) -> pa.Table:
        # Arrow-native join + grouped min: node ids never ride through a
        # null-padded pandas float64 frame (ids > 2^53 stay exact)
        import pyarrow.compute as pc

        side = tbl["__side"]
        labs = tbl.filter(pc.equal(side, 1)).select(["__key", "lab"])
        es = tbl.filter(pc.equal(side, 0)).select(["__key", "u"])
        if es.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "lab": pa.array([], pa.int64())})
        m = es.join(labs, keys="__key", join_type="inner")
        g = m.group_by("u").aggregate([("lab", "min")])
        return g.select(["u", "lab_min"]).rename_columns(["n", "lab"])

    def hop_rows(batch: pa.Table) -> pa.Table:
        # pointer-doubling request: look up the label OF my label
        n = batch.num_rows
        return pa.table({"__key": batch["lab"].cast(pa.int64()),
                         "u": batch["n"].cast(pa.int64()),
                         "lab": pa.nulls(n, pa.int64()),
                         "__side": pa.array(np.zeros(n, dtype=np.int8))},
                        schema=sides_schema)

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    iters_done = 0
    for _ in range(max_iters):
        iters_done += 1
        # one neighbor-push round + one pointer-doubling round per
        # iteration: push spreads labels one hop, doubling jumps
        # label->label-of-label, so chains converge in O(log diameter).
        # The coalescing repartitions matter: unions inflate block
        # counts and every sort shuffle spawns one reduce task per
        # block (measured ~30s/iter without them, ~1s/iter with).
        e_side = edges.map_batches(edge_rows, batch_format="pyarrow")
        h_side = labels.map_batches(hop_rows, batch_format="pyarrow")
        l_side = labels.map_batches(label_rows, batch_format="pyarrow")
        pushed = (e_side.union(h_side).union(l_side)
                  .repartition(cpus, shuffle=False)
                  .map_batches(lambda t: add_bucket_col(t, ["__key"], B),
                               batch_format="pyarrow")
                  .groupby("__bkt").map_groups(push, batch_format="pyarrow"))
        labels = min_by_node(
            pushed.union(labels)
            .repartition(cpus, shuffle=False)
            .map_batches(_min_label_partial, batch_format="pyarrow")
        ).materialize()
        s = labels.sum("lab")
        if s == prev_sum:  # labels only decrease -> fixpoint
            break
        prev_sum = s

    if stats is not None:
        stats["iterations"] = iters_done
        stats["n_edges"] = edges.count() // 2
        stats["n_nodes"] = labels.count()
        stats["path"] = "iterative"

    def rename(batch: pa.Table) -> pa.Table:
        # empty pandas partials can promote ints to float64 upstream —
        # pin the output dtype
        return pa.table({"n": batch["n"].cast(pa.int64()),
                         "root": batch["lab"].cast(pa.int64())})

    return labels.map_batches(rename, batch_format="pyarrow")


def dedup_rows_by_components(corpus_ds, pairs_ds, id_col: str,
                             num_buckets: int | None = None):
    """Keep one representative (min id) per near-dup component: corpus
    rows minus non-root component members, via a bucketed anti-join
    (ONE corpus shuffle; the drop set never lands on the driver)."""
    from .shuffle import bucketed_anti_join

    comp = connected_components(pairs_ds, num_buckets=num_buckets)

    def non_roots(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(batch["n"], batch["root"])
        return batch.filter(keep).select(["n"])

    drop = comp.map_batches(non_roots, batch_format="pyarrow")
    return bucketed_anti_join(corpus_ds, id_col, drop, "n",
                              num_buckets=num_buckets)


def keep_best_drops(pairs_ds, scores_ds, id_col: str = "doc_id",
                    score_col: str = "score",
                    num_buckets: int | None = None):
    """Drop set for ARG-MAX-score dedup: connected components over the
    pair graph, then per component keep the node with the HIGHEST score
    (tie: min id) and emit every other member as a drop row (n).

    The curation variant of dedup_rows_by_components — real pipelines
    (RefinedWeb / FineWeb style) keep the best-quality copy of a
    near-dup cluster, not the lowest id. Two extra PAIR-GRAPH-sized
    bucket shuffles beyond CC itself: (1) attach each component node's
    score (the score side is corpus-wide but SKINNY — id + one double;
    the inner join restricts it to component members), (2) re-co-locate
    each component by root and pick the argmax. The corpus itself is
    never touched here."""
    import pyarrow.compute as pc

    B = num_buckets or default_buckets()
    comp = connected_components(pairs_ds, num_buckets=num_buckets)

    sides_schema = pa.schema([
        ("__key", pa.int64()), ("root", pa.int64()),
        ("__scr", pa.float64()), ("__side", pa.int8()),
    ])

    def comp_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "__key": batch["n"].cast(pa.int64()),
            "root": batch["root"].cast(pa.int64()),
            "__scr": pa.nulls(n, pa.float64()),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        }, schema=sides_schema)

    def score_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "__key": batch[id_col].cast(pa.int64()),
            "root": pa.nulls(n, pa.int64()),
            "__scr": batch[score_col].cast(pa.float64()),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        }, schema=sides_schema)

    def attach(tbl: pa.Table) -> pa.Table:
        # re-pin types: an all-empty side (e.g. zero pairs) loses its
        # schema inside Ray and surfaces null-typed join columns
        for name in ("__key", "root", "__scr"):
            idx = tbl.schema.get_field_index(name)
            want = sides_schema.field(name).type
            if idx >= 0 and tbl.schema.field(idx).type != want:
                tbl = tbl.set_column(idx, name, pc.cast(tbl[name], want))
        side = tbl["__side"]
        comp_t = tbl.filter(pc.equal(side, 0)).select(["__key", "root"])
        scr_t = tbl.filter(pc.equal(side, 1)).select(["__key", "__scr"])
        if comp_t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "root": pa.array([], pa.int64()),
                             "__scr": pa.array([], pa.float64())})
        m = comp_t.join(scr_t, keys="__key", join_type="inner")
        return (m.select(["__key", "root", "__scr"])
                .rename_columns(["n", "root", "__scr"]))

    unioned = (comp.map_batches(comp_rows, batch_format="pyarrow")
               .union(scores_ds.map_batches(score_rows,
                                            batch_format="pyarrow"))
               .map_batches(lambda t: add_bucket_col(t, ["__key"], B),
                            batch_format="pyarrow"))
    attached = unioned.groupby("__bkt").map_groups(
        attach, batch_format="pyarrow")

    def drops(df) -> "pa.Table":
        if len(df) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        df = df.sort_values(["root", "__scr", "n"],
                            ascending=[True, False, True],
                            kind="mergesort")
        drop = df[df.groupby("root", sort=False).cumcount() > 0]
        return pa.table({"n": pa.array(
            drop["n"].to_numpy(dtype=np.int64), pa.int64())})

    rekeyed = attached.map_batches(
        lambda t: add_bucket_col(t, ["root"], B), batch_format="pyarrow")
    return rekeyed.groupby("__bkt").map_groups(drops, batch_format="pandas")


def dedup_rows_keep_best(corpus_ds, pairs_ds, scores_ds, id_col: str,
                         score_col: str = "score",
                         num_buckets: int | None = None):
    """Keep the HIGHEST-score member of each near-dup component
    (tie: min id); everything outside a component survives untouched.
    One corpus shuffle total (the final bucketed anti-join)."""
    from .shuffle import bucketed_anti_join

    drop = keep_best_drops(pairs_ds, scores_ds, id_col=id_col,
                           score_col=score_col, num_buckets=num_buckets)
    return bucketed_anti_join(corpus_ds, id_col, drop, "n",
                              num_buckets=num_buckets)
