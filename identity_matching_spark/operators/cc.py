"""Distributed connected components (SURVEY §2.6 C1–C3).

The reference clusters with an in-core graph (gonum
``topo.ConnectedComponents``, /root/reference/matching.go:211-222) or a
union-find (/root/reference/research/idmatching/people.py:36-110). Neither
survives 10^12 rows, so this is an iterative-join min-label propagation with
pointer-jumping (the standard Spark CC shape; Kiveris et al., "Connected
Components in MapReduce and Beyond").

Scale notes:
* Identity graphs here are built from *star* edges per block
  (operators/blocking.py), so per-block diameter ≤ 2 and chains across
  blocks are bounded by aliases-per-person — convergence in a handful of
  rounds, each round = 2 shuffle joins on the same key layout.
* ``localCheckpoint`` truncates lineage every iteration (north_rule:
  checkpointed CC iterations); on a cluster with a checkpoint dir configured,
  ``reliable=True`` writes to it instead.
* Labels only decrease and are bounded by the component minimum, so the
  total-sum convergence test is exact (no row-level diff join needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected edge list → symmetric, loop-free, deduped (src, dst)."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    store=None,
    stage_prefix: str = "cc",
) -> DataFrame:
    """Compute connected components of an undirected graph.

    Parameters
    ----------
    edges : DataFrame[src: long, dst: long]
    nodes : optional DataFrame[id: long] — include isolated nodes; defaults
        to the nodes present in ``edges``.
    store : optional CheckpointStore — when given, every iteration's labels
        are written durably under ``{stage_prefix}_iter{i}`` (north_rule:
        checkpointed CC iterations; a killed run resumes from the last
        completed iteration instead of restarting the loop).

    Returns DataFrame[id: long, component: long] where ``component`` is the
    minimum node id in the component (reference semantics: merged person id =
    min member id, /root/reference/people.go:332-353).
    """
    e = symmetrize(edges).localCheckpoint(eager=True)
    if nodes is None:
        nodes = e.select(F.col("src").alias("id")).distinct()
    else:
        nodes = nodes.select(F.col("id").cast("long")).distinct()

    labels = nodes.select("id", F.col("id").alias("component")).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    start_iter = 0
    if store is not None:
        # resume from the last durably completed iteration
        for i in range(max_iter - 1, -1, -1):
            if store.exists(f"{stage_prefix}_iter{i}"):
                labels = store.read(f"{stage_prefix}_iter{i}")
                prev_sum = labels.agg(
                    F.sum(F.col("component").cast("decimal(38,0)"))
                ).collect()[0][0]
                start_iter = i + 1
                break

    for _it in range(start_iter, max_iter):
        # propagate: component(u) ← min(component(u), min over neighbors)
        nbr_min = (
            e.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("nbr_comp"))
            .withColumnRenamed("src", "id")
        )
        lbl = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("nbr_comp", "component")).alias(
                    "component"
                ),
            )
        )
        # pointer jumping: component(u) ← component(component(u))
        jump = lbl.select(F.col("id").alias("component"), F.col("component").alias("jumped"))
        # lazy checkpoint: the convergence aggregation below is the single
        # action per iteration — it materializes the checkpoint as it runs
        lbl = (
            lbl.join(jump, "component", "left")
            .select("id", F.least("component", F.coalesce("jumped", "component")).alias("component"))
            .localCheckpoint(eager=False)
        )
        cur_sum = lbl.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]
        labels = lbl
        if cur_sum == prev_sum:
            break
        if store is not None:
            labels = store.write(f"{stage_prefix}_iter{_it}", labels)
        prev_sum = cur_sum
    return labels
