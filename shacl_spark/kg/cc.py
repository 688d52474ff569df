"""Connected-components canonicalization (SURVEY.md §2.A A10).

Hash-to-min label propagation: every vertex starts as its own label
(its IRI); each round every vertex takes the min label among itself
and its neighbors; converges in O(component diameter) rounds — entity
match graphs are near-cliques of name variants, so diameter is tiny.
Each round is one shuffle join + one aggregation; ``localCheckpoint``
truncates lineage per round (GraphFrames-style iterative joins,
BASELINE.json:6).  Deterministic: representative = lexicographic min
IRI, no randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 30, stats: dict | None = None
) -> DataFrame:
    """edges DF[src, dst] (strings) → DF[id, component] where component
    is the min id in the weakly-connected component.

    Pass ``stats={}`` to record convergence observability (SCALING.md):
    ``stats['iterations']`` and ``stats['frontier']`` (labels changed
    per round — a 100× run's convergence is monitorable from the bench
    JSON).  Without it each round pays only a LIMIT-1 emptiness probe,
    not a full changed-count."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.dropDuplicates(["src", "dst"]).localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    if stats is not None:
        stats["iterations"], stats["frontier"] = 0, []
    for i in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["id"], "inner")
            .select(F.col("src").alias("id"), F.col("label"))
            .groupBy("id")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        diff = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
        )
        changed = diff.count() if stats is not None else diff.limit(1).count()
        if stats is not None:
            stats["iterations"] = i + 1
            stats["frontier"].append(changed)
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
