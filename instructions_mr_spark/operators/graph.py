"""Connected components over an edge DataFrame (min-label
propagation) — the clustering kernel behind near-dup dedup
(``dedup_cluster_cc``).  The reference has no graph or even join
operators (SURVEY.md §2.6, verified absence); this is an EXT-mandate
operator for the training-data pipeline (dup *clusters*, not just
pairs, are what a 100 TB dedup pass materializes).

Algorithm (GraphX/Pregel shape, pure DataFrame ops):

  labels <- each node its own id
  repeat: every node takes min(own label, neighbours' labels)
  until SUM(labels) stops decreasing (labels only ever decrease, so
  an unchanged sum IS the fixpoint — one scalar agg per round, no
  row-level diff join).

Scale: O(component diameter) rounds; each round = one shuffle of the
edge list (keyed on src) joined to current labels + one small agg.
Near-dup components are shallow, so rounds stay in the single digits.
Labels are localCheckpoint()ed per round to truncate lineage —
without it, 30 rounds of stacked joins re-run Catalyst on an
ever-growing plan and resubmit the whole chain every action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    directed_input: bool = False,
) -> DataFrame:
    """Return DataFrame[node, component] for every node appearing in
    ``edges``; ``component`` is the minimum node id of its connected
    component.

    ``edges`` is treated as undirected: unless ``directed_input`` is
    True (meaning the caller already provides both orientations), each
    edge is mirrored internally.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not directed_input:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.persist()
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.src == labels.node)
            .groupBy(F.col("dst").alias("nb_node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr_min, labels.node == F.col("nb_node"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    e.unpersist()
    if not converged:
        # Min-label propagation needs O(diameter) rounds; exhausting
        # the loop without hitting the sum fixpoint means some
        # component is still split — returning silently would look
        # valid but be wrong.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (component diameter exceeds it)"
        )
    return labels
