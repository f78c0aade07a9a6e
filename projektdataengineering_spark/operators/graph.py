"""Distributed connected components — the clustering step that turns
near-duplicate candidate PAIRS (MinHash/SimHash output) into dedup
GROUPS, so one canonical document survives per cluster.

The reference's closest analog is its ingest-side sha256 metadata
(/root/reference/dags/ingestion/ingestion.py:65-69) — exact-identity
grouping; this operator is the transitive-closure generalization the
approximate family needs (A~B and B~C must land A,B,C in one group even
when A~C was never emitted as a pair).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the min of its label and
its neighbors' labels; at fixpoint every node in a component carries the
component's minimum id. Rounds needed = graph diameter, which for
near-dup clusters (small, dense clumps) is tiny. Each round is one
join + one groupBy — pure DataFrame ops, no driver-side graph.

Scale notes: lineage is cut every round with localCheckpoint —
without it the plan doubles per iteration and the optimizer chokes by
round ~10. The edge list is checkpointed once and reused. At 100 TB
with adversarial diameters you'd switch to the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) — same primitive ops, O(log²) rounds; the hook is
this function's signature, not its callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 20
) -> DataFrame:
    """Label every node reachable through `edges` (undirected) with the
    smallest node id in its component. Returns (node, component).

    Deterministic: output is a pure function of the edge set. Converges
    in diameter(G) rounds; raises if `max_iter` rounds don't reach the
    fixpoint (a symptom of an adversarial graph that needs the
    large-star variant, not silent wrong answers)."""
    # Symmetrize with ONE pass over `edges` (explode both directions
    # per row). The union-of-two-selects formulation read `edges` twice
    # — and `edges` is typically an expensive LSH candidate pipeline,
    # so the whole upstream executed once per branch (measured 5.0 s →
    # 2.9 s at sf0.1 on the minhash edge list).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("node"), F.col(dst).alias("nbr")),
                    F.struct(F.col(dst).alias("node"), F.col(src).alias("nbr")),
                )
            ).alias("e")
        )
        .select("e.node", "e.nbr")
        .distinct()
        .localCheckpoint()
    )
    # Round 1 fused into initialization: with identity labels the first
    # propagation is just comp = min(node, min(nbr)) — one groupBy on
    # the checkpointed edges, no label join and no change-count job.
    labels = (
        sym.groupBy("node")
        .agg(F.least(F.col("node"), F.min("nbr")).alias("comp"))
        .localCheckpoint()
    )

    for _ in range(max_iter - 1):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("nbr"), F.col("comp").alias("nbr_comp")),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("nbr_comp").alias("min_nbr_comp"))
        )
        upd = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("comp").alias("old_comp"),
                F.least("comp", F.coalesce("min_nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint()  # cut lineage; also materializes for the count
        )
        changed = upd.filter(F.col("comp") != F.col("old_comp")).count()
        labels = upd.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds the bound — use a large-star/small-star pass"
    )
