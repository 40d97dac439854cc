"""Distributed graph helpers.

``min_label_components`` is the engine's connected-components kernel
(used by ``operators/dedup.py::d_neardup_components``): iterative
min-label propagation with driver-side convergence detection. The
fixpoint (every node labeled with the min node id reachable from it) is
unique, so results are independent of partitioning and execution order.

Scale notes: each round is one edge⋈labels shuffle join + one
min-aggregate — O(|E|) per round, rounds = graph diameter. Near-dup
graphs are shallow (a handful of rounds even at 100 TB); for adversarial
diameters swap the round body for large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond"), which converges in
O(log²) rounds on the same skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    nodes: DataFrame, edges: DataFrame, *, local_threshold: int = 500_000
) -> DataFrame:
    """Label every node with min reachable node id.

    ``nodes``: one column ``id`` (long). ``edges``: columns ``src``,
    ``dst`` — treated as DIRECTED propagation channels dst→src, so pass
    both orientations for an undirected graph. Returns (id, label).

    When the edge list fits the driver (≤ ``local_threshold`` rows —
    for near-dup graphs the edges are the DUPLICATE pairs, tiny relative
    to the corpus even at 100 TB), the label map is computed with a
    driver-side union-find and broadcast back: one collect + one
    broadcast join instead of diameter-many shuffle rounds. Above the
    threshold, iterative min-label propagation. Both paths reach the
    same unique fixpoint. Callers should persist ``edges`` (it is
    counted, then re-read).

    Iterative path: labels start as own id and only ever decrease (min
    over a set that contains the old label), so Σlabel is strictly
    monotone until the fixpoint — an unchanged sum IS convergence,
    checked without a self-join. Per-round persist + aggregate truncates
    lineage so round N never recomputes rounds 1..N-1.
    """
    if edges.count() <= local_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for row in edges.select("src", "dst").collect():
            ra, rb = find(row[0]), find(row[1])
            if ra != rb:
                # union by label order: root IS the min id of its tree
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        spark = nodes.sparkSession
        pairs = [(x, find(x)) for x in list(parent)]
        if not pairs:
            return nodes.select("id", F.col("id").alias("label"))
        lbl = spark.createDataFrame(pairs, "id long, label long")
        return nodes.join(F.broadcast(lbl), "id", "left").select(
            "id", F.coalesce("label", "id").alias("label")
        )

    labels = nodes.select(F.col("id"), F.col("id").alias("label")).persist()
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    while True:
        neighbor = edges.join(labels, edges.dst == labels.id).select(
            F.col("src").alias("id"), "label"
        )
        new_labels = (
            labels.unionByName(neighbor).groupBy("id").agg(F.min("label").alias("label"))
        ).persist()
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
