"""Connected components over a similarity graph — near-dup cluster
resolution for corpus dedup.

Pairwise near-dup detection (fuzzy_dedup.py) yields edges; dedup policy needs
*clusters* ("keep one representative per component"), which is transitive:
A~B, B~C puts A,C in one cluster even if A!~C. This operator computes, for
every vertex, the minimum vertex id reachable through the edge set — the
canonical component label.

Physical strategy: iterative min-label propagation as DataFrame joins —
each round every vertex adopts the smallest label among itself and its
neighbors; converges in O(graph diameter) rounds (near-dup clusters are
shallow, typically 2-4 rounds). The driver loop only checks a per-round
convergence counter (an aggregate, not data); all data movement is keyed
shuffles. At web scale the same loop drops in the large-star/small-star
optimization (Kiveris et al., "Connected Components in MapReduce and
Beyond") — the round structure and checkpointing seam are identical, so it
is a swap of the per-round transformation only.

Each round's labels are persisted and the previous round unpersisted;
``max_rounds`` bounds runaway graphs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Return (id, component) where component = min id reachable via edges.

    ``vertices``: one row per vertex (isolated vertices become their own
    component). ``edges``: undirected pairs (one direction suffices).
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # every round MUST truncate lineage (localCheckpoint), not just cache:
    # an iterative join otherwise accumulates one join per round in the
    # logical plan and Catalyst analysis blows up around ~15 rounds. On a
    # cluster swap localCheckpoint for reliable checkpoint(dir) — same seam
    # as Spark's own iterative algorithms (e.g. GraphX Pregel).
    labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("comp")).localCheckpoint(
        eager=True
    )

    changed = 0
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, on=F.col("src") == F.col("id"))
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, on=F.col("id") == F.col("id2"), how="left")
            .select(
                F.col("id"),
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias("comp"),
                (F.coalesce(F.col("nmin"), F.col("comp")) < F.col("comp")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        # partially-converged labels would silently split clusters (and
        # dedup_representatives would keep bogus extra representatives) —
        # refuse to return them as if they were component labels
        raise RuntimeError(
            f"connected_components did not converge within max_rounds={max_rounds} "
            f"({changed} labels still changing); the graph diameter exceeds the "
            "round budget — raise max_rounds or switch to large-star/small-star"
        )
    return labels


def dedup_representatives(
    vertices: DataFrame,
    near_dup_pairs: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Cluster-level dedup decision: (id, component, keep) where keep marks
    the component representative (minimum id). Downstream, `keep` filters
    the corpus to one document per near-dup cluster."""
    comp = connected_components(vertices, near_dup_pairs, id_col=id_col)
    return comp.select(
        F.col("id").alias(id_col),
        F.col("comp").alias("component"),
        (F.col("id") == F.col("comp")).alias("keep"),
    )
