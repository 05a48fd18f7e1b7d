"""Deduplication operators.

`dedup_first_wins` re-expresses the reference's ordered distinct-on
(`deduplicate_by_id`, /root/reference/main.py:173-181 — keep the FIRST
Document per 채용공고ID in arrival order). Distributed first-wins needs
an explicit, data-derived order column (SURVEY §7 hard-point (a)):
`monotonically_increasing_id` is not stable across retries, so callers
must pass a real column.

The scale-path near-dup family (exact text hash, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine) lives in neardup.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.session import cut_lineage


def dedup_first_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Keep exactly one row per `keys`: the first by `order_col`
    (ties broken by `order_col` only — pass a unique column).

    One shuffle on `keys`; Spark 3.5+ plans the rank filter as
    WindowGroupLimit (partial per-partition top-1 before the shuffle).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_report(df: DataFrame, key: str) -> DataFrame:
    """Group-by-count report of duplicate key values (reference's
    pre-index DQ scan, /root/reference/build_vectorstore.py:260-270)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list by iterative
    min-label propagation: every node converges to the smallest node id
    reachable from it. Returns (node, cluster_id).

    The loop is a driver-gated iteration (converged when no label
    changes); each round is one shuffle join + one aggregate, and a
    per-round lineage cut (session.cut_lineage — localCheckpoint by
    default, reliable checkpoint() under
    spark_graft.checkpoint_mode=reliable) keeps plans from growing
    exponentially. Rounds needed = graph diameter — near-dup graphs are
    shallow (dup clusters are cliques or short chains). At extreme
    scale the large-star/small-star formulation halves rounds; the
    per-round dataflow is identical."""
    # materialize the edge list ONCE — and BEFORE the symmetrizing
    # union, whose two branches would otherwise each evaluate the
    # whole upstream subtree (for LSH edges: tokenize + md5 + 16
    # minhash permutations, twice). Every iteration joins against
    # `sym`; deriving it from the checkpointed relation makes each
    # round a cheap re-read instead of a re-derivation.
    edges0 = cut_lineage(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    sym = edges0.unionByName(
        edges0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # init = min(self, direct neighbors): the same aggregation the
    # plain distinct() would cost, but it bakes the first propagation
    # round into the starting labels — shallow dup graphs (cliques,
    # bucket stars) then converge one driver round earlier
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__nmin"))
        .select("node", F.least(F.col("node"), F.col("__nmin")).alias("label"))
    )
    labels = cut_lineage(labels, allow_persist=False)
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("neighbor_min"))
        )
        # carry the previous label through the checkpoint so the
        # convergence check is a filter+count over the materialized
        # frame — not another join+shuffle per round
        new_labels = (
            labels.join(neigh, labels.node == neigh.a, "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("neighbor_min"), F.col("label"))
                ).alias("label"),
            )
        )
        new_labels = cut_lineage(new_labels, allow_persist=False)
        changed = new_labels.where(F.col("label") != F.col("__old")).count()
        labels = new_labels.drop("__old")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 40,
    rounds_out: list[int] | None = None,
) -> DataFrame:
    """Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC 2014) — the deep-graph SCALE formulation of
    `connected_components`: min-label propagation needs diameter
    rounds, star contraction needs O(log diameter) on chains/paths
    (each round at least halves every node's hop distance to its
    component minimum). Per round: two hash aggregations + two
    equi-joins, all on the slim (u, v) edge relation; per-round lineage
    cuts (session.cut_lineage, mode-configurable) exactly like the
    label loop. Returns (node,
    cluster_id = component-min node id); `rounds_out`, when given,
    receives the number of driver-gated rounds actually run (for the
    convergence property tests).

      large-star(u): every neighbor v > u re-attaches to
                     m = min(Γ(u) ∪ {u})
      small-star(u): over min-canonical edges (u > v), every v ∈
                     Γ(u) ∪ {u} re-attaches to m = min(Γ(u) ∪ {u})

    Both steps preserve connectivity (proof in the paper); the fixed
    point is a forest of depth-1 stars rooted at each component's
    minimum. Convergence is detected by an (edge-count, xxhash64-sum)
    edge-set signature going stationary — one tiny aggregate per round
    instead of a set-difference join."""
    # materialize the input edge relation ONCE: both the node set and
    # the canonical edge set derive from it, and without this boundary
    # each would re-evaluate the full upstream pipeline (for LSH pair
    # graphs: tokenize + md5 + 16 permutations + bucket join + verify)
    # LAZY cut (plan truncation happens at call time): the seed
    # signature collect below is the first action, so edges0 and the
    # canonical edge set materialize together in that one job instead
    # of two sequential eager-cut jobs first
    edges0 = cut_lineage(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d")), eager=False
    )
    # nodes has exactly ONE consumer (the final label join) and derives
    # from the checkpointed relation — no boundary needed
    nodes = (
        edges0.select(F.col("s").alias("node"))
        .unionByName(edges0.select(F.col("d").alias("node")))
        .distinct()
    )
    e = (
        edges0.select(
            F.greatest("s", "d").alias("u"),
            F.least("s", "d").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e = cut_lineage(e, eager=False, allow_persist=False)
    def _sig(df: DataFrame) -> tuple:
        # per-edge hash reduced mod a prime before summing: keeps the
        # signature sum within int64 under ANSI mode out to ~9e9 edges
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v") % 1_000_000_007).alias("s"),
        ).collect()[0]
        return (row["n"], row["s"])

    # seed with the INITIAL edge set's signature: a graph that is
    # already a star forest (e.g. 2-cliques from pair dedup) then
    # certifies convergence after ONE round instead of needing a
    # confirmation round
    prev_sig: tuple | None = _sig(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: symmetric neighborhoods, neighbors ABOVE u attach
        # to the neighborhood minimum (min over Γ(u) ∪ {u})
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: canonical u > v edges; u AND all its (smaller)
        # neighbors attach to the minimum neighbor
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        attach = large.select("u", "v").unionByName(
            smins.select("u", F.col("u").alias("v"))
        )
        e_next = (
            attach.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # LAZY cut: the convergence-signature collect right below is
        # the round's first action, so the checkpoint blocks
        # materialize inside that job — one job per round instead of
        # an eager-cut job followed by the signature job (the plan is
        # truncated at call time either way)
        e_next = cut_lineage(e_next, eager=False, allow_persist=False)
        sig = _sig(e_next)
        e = e_next
        if sig == prev_sig:
            break
        prev_sig = sig
    if rounds_out is not None:
        rounds_out.append(rounds)
    roots = e.groupBy("u").agg(F.min("v").alias("cluster_id"))
    return nodes.join(roots, nodes.node == roots.u, "left").select(
        "node", F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id")
    )
