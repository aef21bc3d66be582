"""Connected components over a pair graph, and near-duplicate cluster
assignment built on top of it.

Why this exists: every near-dup detector in this package
(``ngram_jaccard_pairs``, ``minhash_lsh_pairs``, ``simhash_pairs``,
``embedding_neardup_pairs``) emits *pairs*. Deduplicating a corpus needs
one more step — group the pairs into clusters and keep one canonical
document per cluster. Pair similarity is not transitive, but dedup
policy conventionally treats it as if it were (a~b and b~c ⇒ one
cluster {a,b,c}): that is exactly connected components on the pair
graph.

Algorithm: the alternating large-star / small-star method of Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond" (SoCC 2014) — the standard shared-nothing CC
algorithm. Each round is two shuffle-on-node-id passes (a groupBy for
per-node minima and a join to rewrite edges); the edge set converges to
a star forest in which every node points at the minimum id of its
component, in O(log n) rounds on real graphs (near-dup graphs converge
in 2-4: their components are dense blobs, not paths). Compare a naive
min-label propagation, which needs diameter-many rounds — a pathological
chain of borderline-similar documents would make that unbounded.

Scale shape (100 TB corpus, ~1e9-node pair graph):
- state per round is the edge list only, repartitioned by node id; no
  driver-side structure ever holds nodes or edges.
- per-round cost is two hash shuffles of the current edge list; the
  edge list only shrinks (large-star/small-star never add more edges
  than they consume beyond the star edges themselves).
- high-degree nodes are what the algorithm is FOR: large-star attaches
  a hot node's whole neighborhood directly to the component minimum in
  one round, so hubs accelerate convergence rather than serializing it.
- lineage is truncated per round (``localCheckpoint``); on a real
  cluster configure ``spark.sparkContext.setCheckpointDir`` to durable
  storage and swap for ``checkpoint`` if executor loss matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (min, max) rows, no self-loops."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"),
            F.greatest("u", "v").alias("v"),
        )
        .distinct()
    )


def _edge_stats(edges: DataFrame) -> tuple[int, int]:
    """(count, order-independent hash-sum) fingerprint of an edge set.

    Equal fingerprints on consecutive rounds is the convergence test:
    count equality alone could alias two different same-size sets, the
    xxhash64 sum makes a false stop astronomically unlikely (the
    monotone algorithm cannot oscillate, so a collision would need two
    *adjacent* rounds to collide — one-in-2^64 per run)."""
    # Accumulate in decimal(38,0): a sum of 64-bit hashes overflows
    # BIGINT (an ANSI-mode runtime error) after as few as two edges in
    # the worst case; decimal holds ~10^19 edges' worth of headroom and
    # costs one aggregate row per round.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = mins.select("u", F.least("u", "mn").alias("m"))
    # m <= u < v, so the emitted (v, m) edges are never self-loops.
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Point every not-larger neighborhood at its minimum: for each node
    u over its smaller neighbors N = {v : v < u}, emit (v, min N) and
    (u, min N)."""
    directed = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
        .distinct()
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
    )
    return rewired.filter(F.col("u") != F.col("v")).distinct()


def _cc_round(e: DataFrame) -> DataFrame:
    """One alternation round, row-identical to
    ``_canonical(_small_star(_large_star(e)))`` with two redundant
    full-edge-list shuffles removed (round 14, guide §2.4):

    - ``_large_star`` output is already distinct (u, v) rows with
      u > v and no self-loops — exactly the ``directed`` frame
      ``_small_star`` derives, so its filter/least-greatest/distinct
      re-dedup (one O(E) Exchange) is the identity here;
    - ``_small_star`` output rows are strictly (greater, lesser) and
      distinct, so ``_canonical``'s least/greatest is a plain column
      flip and its filter/distinct (another O(E) Exchange) is the
      identity too — a bijective projection of distinct rows stays
      distinct.

    The standalone ``_large_star`` / ``_small_star`` / ``_canonical``
    keep their defensive normalizations for arbitrary inputs."""
    sym = e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = mins.select("u", F.least("u", "mn").alias("m"))
    ls = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    ss_mins = ls.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        ls.join(ss_mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(ss_mins.select("u", F.col("m").alias("v")))
    )
    ss = rewired.filter(F.col("u") != F.col("v")).distinct()
    return ss.select(F.col("v").alias("u"), F.col("u").alias("v"))


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id of its connected component.

    Input: any DataFrame with two integral id columns (one row per
    edge; duplicates, self-loops and both orientations are tolerated).
    Output: (node, component) — one row per node that appears in at
    least one edge; component = min id in its component. Callers attach
    singletons (nodes with no edges) with a left join + coalesce, which
    keeps this operator pure graph-in/labels-out.

    max_rounds is a safety rail, not a tuning knob: alternation
    converges in O(log n) rounds (SoCC 2014, Thm 1-2), so 25 covers any
    physically storable graph; hitting the rail raises rather than
    returning partial labels."""
    # Lazy localCheckpoint + the stats collect as ITS materializing
    # action: one job computes the round plan, persists the blocks and
    # aggregates the fingerprint, instead of an eager-checkpoint job
    # followed by a second stats job over the cached blocks (round 14,
    # guide §1.2 "fewer jobs"; lineage is truncated after that first
    # job exactly as with eager=True).
    e = _canonical(
        pairs.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
    ).localCheckpoint(eager=False)
    prev = _edge_stats(e)
    from globalweather_etl_spark.operators.ckpt import CheckpointRotator

    rot = CheckpointRotator(pairs.sparkSession)
    for _ in range(max_rounds):
        # rotate: the previous round's edge checkpoint (O(E) blocks)
        # is freed once the new round is materialized and
        # fingerprinted — without this the loop holds one edge-set
        # copy per round (ckpt.py)
        def _round(prev_e=e):
            ne = rot.checkpoint(_cc_round(prev_e), eager=False)
            return ne, _edge_stats(ne)

        e, cur = rot.rotate(_round)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # Converged canonical edges form a star forest: (root, member) with
    # root < member; the roots label themselves.
    members = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    return members.union(roots).distinct()


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for a whole corpus from a near-dup pair list:
    (id, cluster_id, cluster_size, is_canonical), one row per document.

    cluster_id is the minimum doc id in the document's connected
    component of the pair graph (documents in no pair are their own
    singleton cluster); is_canonical=1 marks the one kept document per
    cluster — the min-id policy every dedup operator in this package
    uses. Downstream dedup is then a semi-join on is_canonical=1.

    Plan shape: CC rounds as above, then one left join of the corpus
    ids against the labels (shuffle on doc id) and one groupBy on
    cluster_id for sizes. Nothing is collected; cluster count and sizes
    stay distributed."""
    comp = connected_components(pairs, src=src, dst=dst)
    ids = docs.select(F.col(id_col).cast("long").alias("node"))
    labeled = ids.join(comp, "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce("component", "node").alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )
