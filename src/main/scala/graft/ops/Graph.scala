package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge lists — the second graph primitive
  * next to [[Dedup.duplicateClusters]]' connected components. PageRank
  * ranks nodes by link structure (canonical-document election, crawl
  * frontier prioritization, influence scoring over interaction graphs).
  *
  * Exactness discipline — INTEGER PageRank: the float formulation
  * accumulates `d·Σ s/deg` in doubles, where both the division and the
  * reduce order wobble across engines and partitionings. Here scores live
  * on a 2^40 integer grid, per-edge contributions are exact floor
  * divisions `s DIV deg`, the damping factor is the exact rational
  * `dampNumer/dampDenom` applied as `(num·I) DIV den`, and every sum is a
  * sum of longs — the whole fixpoint iteration is deterministic to the
  * last bit and replays in any engine that has integer division (the
  * oracle unrolls the same iterations as SQL CTEs). Floor-rounding loses
  * mass monotonically (documented: ranks compare, they don't sum to 1).
  *
  * Scale shape: the degree-annotated edge list materializes ONCE
  * (localCheckpoint — edges are the input's own size); each iteration is
  * one broadcast-or-shuffle join of scores into edges plus one
  * partial-agg'd `groupBy(dst)` — the textbook Pregel motion, O(E) per
  * iteration, node-sized state, driver holds only the loop counter.
  *
  * No reference analog — pipeline-extension layer.
  */
object Graph {

  val ScoreScale = 1L << 40

  /** Integer-exact PageRank over a directed edge list `(src, dst)`.
    * Returns `(node, score)` for every node appearing as a source or
    * target; nodes WITHOUT outgoing edges contribute nothing (dangling
    * mass is dropped, the floor-discipline choice). Self-loops count like
    * any edge; duplicate edges are collapsed first.
    */
  def pageRankExact(
      edges: DataFrame,
      iterations: Int,
      dampNumer: Long = 17L,
      dampDenom: Long = 20L): DataFrame =
    pageRankImpl(edges, None, iterations, dampNumer, dampDenom)

  /** PERSONALIZED integer-exact PageRank: the restart mass — both the
    * initial score and the per-iteration base term — lands only on the
    * `seeds` node set (first column of `seeds`, any integral type)
    * instead of uniformly. The standard recommendation / related-items
    * ranking: scores measure proximity to the seed set, unreachable
    * nodes stay at exactly 0. Same integer grid, floor divisions and
    * rational damping as [[pageRankExact]] — the trajectory replays
    * bit-for-bit in the unrolled SQL oracle. Seed sets broadcast (they
    * are small by the restart-set contract).
    */
  def personalizedPageRankExact(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int,
      dampNumer: Long = 17L,
      dampDenom: Long = 20L): DataFrame =
    pageRankImpl(edges, Some(seeds), iterations, dampNumer, dampDenom)

  private def pageRankImpl(
      edges: DataFrame,
      seedsOpt: Option[DataFrame],
      iterations: Int,
      dampNumer: Long,
      dampDenom: Long): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampNumer > 0 && dampDenom > dampNumer, "damping must be in (0,1)")
    val base = (dampDenom - dampNumer) * ScoreScale / dampDenom
    val par = edges.sparkSession.sparkContext.defaultParallelism
    // ONE pinned frame replaces the r12 e/deg/ed trio (three shuffles +
    // three checkpoint jobs): a single explicit src-hash exchange feeds
    // the dedup (distinct over (src,dst) needs only src-clustering), the
    // degree annotation (a count window over the SAME key — no join, no
    // second shuffle) and the checkpoint; the declared layout then makes
    // every iteration's score join exchange-free on the edge side
    // (guide §2.4 — localCheckpoint alone records UnknownPartitioning,
    // which had been re-exchanging the edge list once per round).
    val ed = Partitioning.declarePinnedHash(
      edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .repartition(par, col("src"))
        .distinct()
        .withColumn("__deg",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("src")))
        .localCheckpoint(true),
      "src")
    val allNodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node")))
      .repartition(par, col("node"))
      .distinct()
    // seed flag folded onto the node set (constant true for global
    // PageRank — the optimizer folds the `when` away, so the non-
    // personalized plan is unchanged). The broadcast seed join and the
    // flag projection both preserve the node-hash layout, so the pin's
    // declaration stays truthful.
    val nodes = Partitioning.declarePinnedHash(
      (seedsOpt match {
        case None => allNodes.withColumn("__seed", lit(true))
        case Some(sd) =>
          val s = sd
            .select(col(sd.columns.head).cast("long").as("node"))
            .distinct()
            .withColumn("__m", lit(1))
          allNodes.join(broadcast(s), Seq("node"), "left")
            .withColumn("__seed", col("__m").isNotNull)
            .drop("__m")
      }).localCheckpoint(true),
      "node")
    def restart(c: org.apache.spark.sql.Column) =
      when(col("__seed"), c).otherwise(lit(0L))
    // Iterations COMPOSE lazily: each score set is consumed exactly once
    // (the next iteration's edge join), so no per-iteration barrier is
    // needed — the whole fixpoint runs as ONE job over the checkpointed
    // edge/node sets. Only every 8th iteration checkpoints, bounding plan
    // depth for deep runs without paying a materialization per round
    // (an eager per-iteration checkpoint benched 9× slower at 3 rounds).
    var scores = nodes.select(col("node"), restart(lit(ScoreScale)).as("score"))
    var pinned: Option[DataFrame] = None
    var i = 0
    while (i < iterations) {
      val contrib = ed
        .join(scores.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("score DIV __deg").as("__c"))
        .groupBy("node")
        .agg(sum(col("__c")).as("__in"))
      var next = nodes
        .join(contrib, Seq("node"), "left")
        .select(
          col("node"),
          (restart(lit(base)) +
            expr(s"($dampNumer * coalesce(__in, 0L)) DIV $dampDenom")).as("score"))
      if (i % 8 == 7 && i != iterations - 1) {
        // the score set leaves the nodes⟕contrib join node-hash-placed;
        // re-declaring keeps deep runs' subsequent rounds exchange-free too
        next = Partitioning.declarePinnedHash(next.localCheckpoint(true), "node")
        pinned.foreach(org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint)
        pinned = Some(next)
      }
      scores = next
      i += 1
    }
    scores
  }

  /** Integer-exact Katz centrality (Katz 1953): `x = Σ_k αᵏ·Aᵏ·1` as the
    * fixed-round recurrence `x' = S + α·(Aᵀx)` with the attenuation a
    * RATIONAL `attNumer/attDenom` applied by floor division — every score
    * is an exact long on the 2⁴⁰ grid, so the unrolled SQL oracle replays
    * the trajectory bit-for-bit (the [[pageRankExact]] discipline minus
    * the degree normalization: Katz counts attenuated PATHS, so hubs
    * transmit their full score). α MUST be below 1/λ_max for the infinite
    * series to converge; fixed rounds sidestep the spectral estimate and
    * keep the result deterministic regardless.
    *
    * Scale shape: identical to PageRank — one edge-key join + partial-agg
    * sum per round, rounds COMPOSE lazily into one job, node-sized state.
    * At extreme hub degrees the long headroom shrinks (score ≤ 2⁴⁰·Σdᵏαᵏ);
    * route the contribution sum through decimal(38) there — the IVM
    * aggregate lever.
    */
  def katzExact(
      edges: DataFrame,
      iterations: Int,
      attNumer: Long = 1L,
      attDenom: Long = 5L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(attNumer > 0 && attDenom > attNumer, "attenuation must be in (0,1)")
    val par = edges.sparkSession.sparkContext.defaultParallelism
    // pins declare their hash layout (see pageRankImpl) — the per-round
    // contribution join runs exchange-free on both sides, leaving one
    // shuffle per round (the dst aggregation, the Pregel motion itself)
    val e = Partitioning.declarePinnedHash(
      edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .repartition(par, col("src"))
        .distinct()
        .localCheckpoint(true),
      "src")
    val nodes = Partitioning.declarePinnedHash(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .repartition(par, col("node"))
        .distinct()
        .localCheckpoint(true),
      "node")
    var scores = nodes.select(col("node"), lit(ScoreScale).as("score"))
    var i = 0
    while (i < iterations) {
      val contrib = e
        .join(scores.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("score")).as("__in"))
      scores = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(ScoreScale) +
            expr(s"($attNumer * coalesce(__in, 0L)) DIV $attDenom")).as("score"))
      i += 1
    }
    scores.select(col("node"), col("score").as("katz"))
  }

  /** Canonical undirected edge set from any `(src, dst)` list: both
    * orientations collapse to `(u, v)` with `u < v`, self-loops and
    * duplicates dropped. The shared front door of [[triangles]] and
    * [[labelPropagate]].
    */
  private def undirected(edges: DataFrame): DataFrame =
    edges
      .select(
        least(col("src").cast("long"), col("dst").cast("long")).as("u"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** [[undirected]] pinned `key`-hash-placed in ONE exchange: the explicit
    * repartition doubles as the dedup shuffle (clustering by either
    * endpoint suffices for a (u,v) distinct), the eager checkpoint
    * materializes the layout, and the declaration (see
    * [[Partitioning.declarePinnedHash]]) lets downstream `key`-keyed
    * joins/aggregates skip re-exchanging the edge list.
    */
  private def undirectedPinned(edges: DataFrame, key: String): DataFrame = {
    val par = edges.sparkSession.sparkContext.defaultParallelism
    Partitioning.declarePinnedHash(
      edges
        .select(
          least(col("src").cast("long"), col("dst").cast("long")).as("u"),
          greatest(col("src").cast("long"), col("dst").cast("long")).as("v"))
        .filter(col("u") =!= col("v"))
        .repartition(par, col(key))
        .distinct()
        .localCheckpoint(true),
      key)
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected graph (community density, spam-farm detection, graph
    * quality profiling). Returns `(node, degree, triangles,
    * clustering_ppm)` for every node, where `clustering_ppm` is the exact
    * integer `2·T·10⁶ DIV (deg·(deg−1))` (0 when degree < 2) — the
    * all-integer fraction replays bit-exactly in any engine.
    *
    * Scale shape — the distributed node-iterator with DEGREE ORDERING
    * (Suri & Vassilvitskii's MapReduce formulation): every edge is
    * oriented from its lower to its higher endpoint under the total order
    * `(degree, id)`, which bounds each node's OUT-adjacency by O(√E)
    * regardless of raw degree skew — a celebrity node of degree 10⁶
    * produces no 10¹² wedge blow-up because its edges all point INTO it.
    * Wedges come from one equi-self-join of the oriented list on the apex,
    * the pair is ordered by the same `(degree, id)` order so the closing
    * edge is a plain EQUI-join lookup (no OR-condition nested loop), and
    * each triangle surfaces exactly once at its order-minimal vertex. The
    * oriented list materializes once (localCheckpoint — it is consumed by
    * three plan arms); everything downstream is hash joins + partial-agg
    * counts. Edge-sized motion, zero driver state.
    */
  def triangles(edges: DataFrame): DataFrame = {
    // The edge set feeds the degree table and the orientation; the degree
    // table feeds two orientation joins plus the final report. Pin both
    // ONCE (edge-/node-sized) — an unpinned plan re-derives the caller's
    // edge construction (often a self-join) once per arm. All three pins
    // declare their hash layout (see Partitioning.declarePinnedHash): the
    // u-side orientation join and the wedge self-join then run with ZERO
    // exchange, leaving only the v-side re-key and the closing-edge
    // (lo,hi) join — the motions degree-ordering fundamentally needs.
    val par = edges.sparkSession.sparkContext.defaultParallelism
    val e = undirectedPinned(edges, "u")
    val deg = Partitioning.declarePinnedHash(
      e.select(col("u").as("node")).union(e.select(col("v")))
        .repartition(par, col("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .localCheckpoint(true),
      "node")
    // Orient by (degree, id); carry the head's degree so the wedge join
    // can order its two out-neighbors without a third deg lookup. The pin
    // is s-hash-placed so the wedge self-join co-partitions both sides.
    val o = Partitioning.declarePinnedHash(
      e
        .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
        .select(
          when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
            col("u")).otherwise(col("v")).as("s"),
          when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
            col("v")).otherwise(col("u")).as("t"),
          when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
            col("dv")).otherwise(col("du")).as("dt"))
        .repartition(par, col("s"))
        .localCheckpoint(true),
      "s")
    // Wedge at apex s: out-neighbor pair ordered by (deg, id) ⇒ the
    // closing edge, if present, is oriented exactly lo→hi.
    val w = o.as("a")
      .join(o.as("b"),
        col("a.s") === col("b.s") &&
          (col("a.dt") < col("b.dt") ||
            (col("a.dt") === col("b.dt") && col("a.t") < col("b.t"))))
      .select(col("a.s").as("x"), col("a.t").as("lo"), col("b.t").as("hi"))
    val tri = w.join(
      o.select(col("s").as("lo"), col("t").as("hi")), Seq("lo", "hi"))
    val perNode = tri
      .select(explode(array(col("x"), col("lo"), col("hi"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg
      .join(perNode, Seq("node"), "left")
      .select(
        col("node"),
        col("d").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("d") >= 2,
          expr("(2 * coalesce(triangles, 0L) * 1000000) DIV (d * (d - 1))"))
          .otherwise(lit(0L)).as("clustering_ppm"))
  }

  /** Link prediction candidates by common-neighbor counting: for every
    * non-adjacent pair at distance 2, the number of shared neighbors and
    * the neighborhood-Jaccard score — the "people you may know" /
    * related-item primitive. Returns the top `topK` pairs
    * `(u, v, common_neighbors, jaccard_ppm)` ordered by
    * `(common desc, u, v)`.
    *
    * Scale honesty: common-neighbor counting is the A² wedge sweep, and a
    * degree-10⁶ hub alone would contribute 10¹² wedges. `maxDegree` prunes
    * HUB APEXES (a node's wedges are only enumerated if its degree is
    * within the cap) — the standard industrial mitigation; counts through
    * pruned hubs are forgone, making every reported count a documented
    * LOWER bound (jaccard uses the pruned count over full degrees, same
    * bound direction). The edge/degree tables pin once; the wedge join is
    * an equi-self-join of the hub-pruned adjacency; existing edges leave
    * via one anti-join; the global top-k is a bounded heap
    * (TakeOrderedAndProject), never a full sort.
    */
  def linkCandidates(
      edges: DataFrame,
      maxDegree: Long = 64L,
      topK: Int = 50): DataFrame = {
    // pins declare their hash layout (see Partitioning.declarePinnedHash);
    // the apex table additionally pins so the wedge self-join reads ONE
    // materialized node-hash-placed copy — zero exchange on either side,
    // and the nbrs∪deg construction no longer re-runs per self-join arm
    val par = edges.sparkSession.sparkContext.defaultParallelism
    val e = undirectedPinned(edges, "u")
    val deg = Partitioning.declarePinnedHash(
      e.select(col("u").as("node")).union(e.select(col("v")))
        .repartition(par, col("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .localCheckpoint(true),
      "node")
    val nbrs = e.select(col("u").as("node"), col("v").as("nbr"))
      .union(e.select(col("v"), col("u")))
    val apex = Partitioning.declarePinnedHash(
      nbrs.repartition(par, col("node"))
        .join(deg.filter(col("d") <= maxDegree), Seq("node"))
        .select("node", "nbr")
        .localCheckpoint(true),
      "node")
    val cn = apex.as("a")
      .join(apex.as("b"),
        col("a.node") === col("b.node") && col("a.nbr") < col("b.nbr"))
      .groupBy(col("a.nbr").as("u"), col("b.nbr").as("v"))
      .agg(count(lit(1)).as("common_neighbors"))
    cn.join(e, Seq("u", "v"), "left_anti")
      .join(deg.select(col("node").as("u"), col("d").as("__du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("__dv")), Seq("v"))
      .select(col("u"), col("v"), col("common_neighbors"),
        expr("common_neighbors * 1000000 DIV (__du + __dv - common_neighbors)")
          .as("jaccard_ppm"))
      .orderBy(col("common_neighbors").desc, col("u"), col("v"))
      .limit(topK)
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): candidate pairs
    * score `Σ_z 1/ln(deg z)` over their common neighbors z — rare shared
    * neighbors carry more signal than hubs, the standard upgrade over the
    * raw common-neighbor count of [[linkCandidates]]. Each apex node's
    * weight rides the 2²⁰ grid (`⌊2²⁰/ln d⌋`, one libm call per apex ROW
    * of the node-sized degree table — never per pair), so pair scores are
    * exact integer sums and the (score DESC, u, v) cut replays
    * cross-engine.
    *
    * Scale shape — identical to [[linkCandidates]]: wedges enumerate only
    * through apex nodes with `deg ≤ maxDegree` (the hub-pruning contract:
    * a hub's O(d²) wedge fan-out is the scale-killer, and hubs are the
    * least informative apexes by construction — their weight is the
    * smallest), existing edges leave by anti-join, the top-k is
    * TakeOrdered. Apex nodes in a pair have deg ≥ 2, so `ln d > 0` for
    * every weight that reaches a score.
    */
  def adamicAdar(
      edges: DataFrame,
      maxDegree: Long = 64L,
      topK: Int = 50): DataFrame = {
    // same pinned-and-declared shape as linkCandidates — see there
    val par = edges.sparkSession.sparkContext.defaultParallelism
    val e = undirectedPinned(edges, "u")
    val deg = Partitioning.declarePinnedHash(
      e.select(col("u").as("node")).union(e.select(col("v")))
        .repartition(par, col("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .localCheckpoint(true),
      "node")
    val nbrs = e.select(col("u").as("node"), col("v").as("nbr"))
      .union(e.select(col("v"), col("u")))
    val apex = Partitioning.declarePinnedHash(
      nbrs.repartition(par, col("node"))
        .join(deg.filter(col("d") <= maxDegree && col("d") >= 2), Seq("node"))
        .select(col("node"), col("nbr"),
          floor(lit(1048576.0) / log(col("d").cast("double"))).cast("long").as("__w"))
        .localCheckpoint(true),
      "node")
    val scored = apex.as("a")
      .join(apex.as("b"),
        col("a.node") === col("b.node") && col("a.nbr") < col("b.nbr"))
      .groupBy(col("a.nbr").as("u"), col("b.nbr").as("v"))
      .agg(count(lit(1)).as("common_neighbors"), sum(col("a.__w")).as("aa_grid"))
    scored.join(e, Seq("u", "v"), "left_anti")
      .orderBy(col("aa_grid").desc, col("u"), col("v"))
      .limit(topK)
      .select(col("u"), col("v"), col("common_neighbors"), col("aa_grid"))
  }

  /** Resource-allocation link prediction (Zhou, Lü & Zhang 2009):
    * candidate pairs score `Σ_z 1/deg(z)` over their common neighbors z —
    * the RA index, which penalizes hub apexes HARDER than [[adamicAdar]]'s
    * 1/ln d (the strongest of the classical local indices on most
    * co-occurrence graphs, per the original study). Apex weights are the
    * exact integer `2²⁰ DIV d` — no libm anywhere — so pair scores are
    * exact long sums and the (score DESC, u, v) cut replays cross-engine
    * verbatim.
    *
    * Scale shape: identical to [[adamicAdar]] — hub-pruned wedge
    * enumeration (`deg ≤ maxDegree` apexes only), anti-join against
    * existing edges, TakeOrdered cut. One edge-table checkpoint, one
    * node-sized degree table, wedge volume Σ_apex d² bounded by the
    * pruning contract.
    */
  def resourceAllocation(
      edges: DataFrame,
      maxDegree: Long = 64L,
      topK: Int = 50): DataFrame = {
    // same pinned-and-declared shape as linkCandidates — see there
    val par = edges.sparkSession.sparkContext.defaultParallelism
    val e = undirectedPinned(edges, "u")
    val deg = Partitioning.declarePinnedHash(
      e.select(col("u").as("node")).union(e.select(col("v")))
        .repartition(par, col("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .localCheckpoint(true),
      "node")
    val nbrs = e.select(col("u").as("node"), col("v").as("nbr"))
      .union(e.select(col("v"), col("u")))
    val apex = Partitioning.declarePinnedHash(
      nbrs.repartition(par, col("node"))
        .join(deg.filter(col("d") <= maxDegree && col("d") >= 2), Seq("node"))
        .select(col("node"), col("nbr"), expr("1048576 DIV d").as("__w"))
        .localCheckpoint(true),
      "node")
    val scored = apex.as("a")
      .join(apex.as("b"),
        col("a.node") === col("b.node") && col("a.nbr") < col("b.nbr"))
      .groupBy(col("a.nbr").as("u"), col("b.nbr").as("v"))
      .agg(count(lit(1)).as("common_neighbors"), sum(col("a.__w")).as("ra_grid"))
    scored.join(e, Seq("u", "v"), "left_anti")
      .orderBy(col("ra_grid").desc, col("u"), col("v"))
      .limit(topK)
      .select(col("u"), col("v"), col("common_neighbors"), col("ra_grid"))
  }

  /** Synchronous label propagation (community detection) over an
    * undirected graph: every node starts labeled with its own id; each
    * round, every node adopts the most frequent label among its NEIGHBORS,
    * ties broken toward the SMALLEST label — a deterministic fixed-round
    * variant of Raghavan et al.'s LPA, so `iterations` unrolled SQL CTE
    * rounds replay the result exactly (the oracle does). Returns
    * `(node, label)`.
    *
    * Scale shape: the neighbor list materializes once (localCheckpoint,
    * 2E rows); each round is one join of the node-sized label set into it,
    * one partial-agg'd `(node, label)` count, and one struct-max per node
    * (two-stage agg — no window, no per-node sort). Rounds COMPOSE lazily
    * like [[pageRankExact]]'s: each label set is consumed exactly once, so
    * the fixpoint runs as one job. O(E) per round, node-sized state.
    */
  def labelPropagate(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = undirected(edges)
    val nbrs = e.select(col("u").as("node"), col("v").as("nbr"))
      .union(e.select(col("v"), col("u")))
      .localCheckpoint(true)
    var labels = nbrs.select(col("node")).distinct().withColumn("label", col("node"))
    var i = 0
    while (i < iterations) {
      // max(struct(votes, -label)) = most votes, smallest label on ties.
      // Node ids are non-negative here (undirected() long-casts user ids);
      // negation cannot overflow for any id ≥ -Long.MaxValue.
      labels = nbrs
        .join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
        .groupBy("node", "label")
        .agg(count(lit(1)).as("__votes"))
        .groupBy("node")
        .agg(max(struct(col("__votes"), (-col("label")).as("__nl"))).as("__best"))
        .select(col("node"), (-col("__best.__nl")).as("label"))
      i += 1
    }
    labels
  }

  /** k-core decomposition by ITERATIVE PEELING: delete nodes of degree
    * < k (and their edges), repeat; what survives is the k-core — the
    * dense backbone behind spam-ring detection, community seeding, and
    * graph-robustness profiling. Returns the surviving `(node, degree)`
    * where `degree` counts edges INSIDE the core.
    *
    * `rounds` bounds the peel passes; the round-R result is a monotone
    * SUPERSET of the true core that stabilizes permanently once a round
    * deletes nothing, so the op early-exits there (one count of the
    * already-checkpointed edge list per round — the only driver state is
    * the loop counter). Real graphs peel in a handful of rounds; callers
    * needing a guarantee raise `rounds` and the spec pins convergence on
    * its fixtures. The oracle unrolls identical rounds as SQL CTEs.
    *
    * Scale shape: each round is one degree aggregate + two semi-joins of
    * the edge list on the survivor set — edge-sized motion, no node ever
    * collects; the edge list re-pins per round so lineage stays flat
    * instead of stacking `rounds` deep.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 and rounds >= 1, got k=$k rounds=$rounds")
    var e = undirected(edges).localCheckpoint(true)
    var prev = e.count()
    var stable = prev == 0L
    var i = 0
    while (i < rounds && !stable) {
      val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("node").localCheckpoint(true)
      e = e
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val n = e.count()
      stable = n == prev
      prev = n
      i += 1
    }
    e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }

  /** Multi-source BFS: exact hop distance from the nearest seed, plus a
    * deterministic nearest-seed assignment — "attach every node to its
    * closest labeled hub", the graph half of propagating a small labeled
    * set (trusted domains, curated clusters, seed entities) across a
    * similarity graph. Returns `(node, dist, root)` for every node within
    * `maxHops` of a seed (seeds included at dist 0); `root` is the
    * SMALLEST seed id among all shortest paths — a total-order tie-break,
    * so the assignment is unique and replayable.
    *
    * Frontier discipline: each hop joins only the NEWLY settled frontier
    * into the adjacency list, anti-joins out already-settled nodes, and
    * takes `min(root)` per newly reached node. Min propagates correctly
    * through rounds because every shortest path's predecessor is, by
    * induction, in the previous frontier with ITS minimal root already
    * resolved. Early exit when a round settles nothing (the count is over
    * the checkpointed frontier — one tiny job per hop).
    *
    * Scale shape: per hop, one frontier⋈adjacency equi-join (frontier
    * shrinks as the graph saturates) + one anti-join against the settled
    * set + a partial-agg min — edge-sized motion at worst, no node ever
    * collects; frontier and settled re-pin per round (localCheckpoint) so
    * lineage stays flat instead of stacking `maxHops` deep. The oracle
    * unrolls identical rounds as materialized CTEs.
    */
  /** Bounded-hop weighted shortest paths (multi-source Bellman–Ford with
    * frontier relaxation): cheapest path cost from the nearest seed over
    * non-negative integer edge weights, plus the same min-id nearest-seed
    * assignment as [[bfs]] (smallest seed id among all cheapest paths;
    * on a cost tie the root only ever decreases). Returns `(node, dist,
    * root)` for nodes reachable within `rounds` edges; the round-R result
    * is exactly "cheapest path using ≤ R edges" — a well-defined contract
    * the oracle can unroll even when the fixture hasn't converged
    * (kCore's bounded-rounds discipline).
    *
    * Frontier (SPFA) relaxation is equivalent to full Bellman–Ford round
    * by round: a node that didn't improve last round already made every
    * offer it can make, so re-offering (what the unrolled oracle does)
    * changes no min. Early exit when a round improves nothing.
    *
    * Scale shape: per round, one frontier⋈adjacency join + one
    * lexicographic-min partial agg over (previous ∪ candidates) + one
    * improvement anti-filter — edge-sized motion at worst, shrinking with
    * the frontier; state re-pins per round so lineage stays flat. Weights
    * must be non-negative integers (exactness and the ≤R-edge contract;
    * enforced in-plan with `raise_error`).
    */
  def shortestPaths(
      weightedEdges: DataFrame,
      sources: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"need rounds >= 0, got $rounds")
    val guarded = when(col("w") < 0,
      raise_error(concat(lit("negative edge weight: "), col("w").cast("string"))))
      .otherwise(col("w"))
    // canonical undirected weighted edges; parallel edges keep the min cost
    // the explicit u exchange doubles as the (u,v) min-cost grouping's
    // placement (u-clustering suffices) and pins the pair set once — the
    // symmetric union would otherwise run the grouping per orientation
    // arm; the adjacency pin is a-hash-placed and declared so every
    // round's frontier⋈adjacency join reads the 2E side exchange-free
    val par = weightedEdges.sparkSession.sparkContext.defaultParallelism
    val e = Partitioning.declarePinnedHash(
      weightedEdges
        .select(
          least(col("src").cast("long"), col("dst").cast("long")).as("u"),
          greatest(col("src").cast("long"), col("dst").cast("long")).as("v"),
          guarded.cast("long").as("w"))
        .filter(col("u") =!= col("v"))
        .repartition(par, col("u"))
        .groupBy("u", "v").agg(min(col("w")).as("w"))
        .localCheckpoint(true),
      "u")
    val adj = Partitioning.declarePinnedHash(
      e.select(col("u").as("a"), col("v").as("b"), col("w"))
        .union(e.select(col("v").as("a"), col("u").as("b"), col("w")))
        .repartition(par, col("a"))
        .localCheckpoint(true),
      "a")
    var dist = sources
      .select(col("node").cast("long").as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"), col("node").as("root"))
      .localCheckpoint(true)
    var frontier = dist
    var r = 0
    var active = !frontier.isEmpty
    while (r < rounds && active) {
      val cand = frontier
        .join(adj, frontier("node") === adj("a"))
        .select(col("b").as("node"), (frontier("dist") + col("w")).as("dist"),
          col("root"))
      val merged = dist.union(cand)
        .groupBy("node")
        .agg(min(struct(col("dist"), col("root"))).as("__m"))
        .select(col("node"), col("__m.dist").as("dist"), col("__m.root").as("root"))
        .localCheckpoint(true)
      // frontier admission compares the FULL lexicographic (dist, root)
      // state: a root-only improvement must also re-offer, else the
      // min-id tie-break stops propagating and diverges from full
      // Bellman–Ford (the offer map is lex-monotone, so SPFA ≡ full
      // holds round by round on pairs, not on dist alone)
      val improved = merged
        .join(dist.select(col("node"), col("dist").as("__od"),
          col("root").as("__or")), Seq("node"), "left")
        .filter(col("__od").isNull ||
          struct(col("dist"), col("root")) < struct(col("__od"), col("__or")))
        .select("node", "dist", "root")
        .localCheckpoint(true)
      active = !improved.isEmpty
      dist = merged
      frontier = improved
      r += 1
    }
    dist
  }

  def bfs(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"need maxHops >= 0, got $maxHops")
    val par = edges.sparkSession.sparkContext.defaultParallelism
    // pin unique pairs once (the symmetric union reads them twice), then
    // pin the adjacency a-hash-placed and declared: every hop's
    // frontier⋈adjacency join reads the 2E side exchange-free
    val e = undirectedPinned(edges, "u")
    // both orientations: BFS walks the symmetric closure
    val adj = Partitioning.declarePinnedHash(
      e.select(col("u").as("a"), col("v").as("b"))
        .union(e.select(col("v").as("a"), col("u").as("b")))
        .repartition(par, col("a"))
        .localCheckpoint(true),
      "a")
    var settled = sources
      .select(col("node").cast("long").as("node")).distinct()
      .select(col("node"), lit(0).as("dist"), col("node").as("root"))
      .localCheckpoint(true)
    var frontier = settled
    var h = 1
    var exhausted = frontier.isEmpty
    while (h <= maxHops && !exhausted) {
      val next = frontier
        .join(adj, frontier("node") === adj("a"))
        .select(col("b").as("node"), col("root"))
        .join(settled.select("node"), Seq("node"), "left_anti")
        .groupBy("node")
        .agg(min(col("root")).as("root"))
        .select(col("node"), lit(h).as("dist"), col("root"))
        .localCheckpoint(true)
      exhausted = next.isEmpty
      if (!exhausted) {
        settled = settled.union(next).localCheckpoint(true)
        frontier = next
      }
      h += 1
    }
    settled
  }

  /** Seeded HARMONIC closeness centrality: per node, `Σ_seeds 1/d(node,
    * seed)` over a `maxHops`-bounded multi-source BFS — the centrality
    * that stays finite on disconnected graphs (unreachable seeds
    * contribute 0 instead of poisoning the sum, which is why harmonic
    * beats classic closeness at corpus scale). Distances to EACH seed are
    * tracked independently (settled keyed on (node, root) — [[bfs]]
    * collapses to the nearest root, this one cannot), reciprocals ride
    * the 1e6 integer DIV grid, and the hop bound makes the whole
    * computation `maxHops` join rounds over the checkpointed adjacency —
    * the exact-seeds relaxation of all-pairs closeness, which at 100 TB
    * nobody should compute.
    *
    * Output: `(node, n_reached, harmonic_grid)` for every node within
    * `maxHops` of at least one OTHER seed (dist-0 self rows are excluded
    * from both columns).
    */
  def seededHarmonic(
      edges: DataFrame,
      seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"need maxHops >= 1, got $maxHops")
    val par = edges.sparkSession.sparkContext.defaultParallelism
    // same pinned-and-declared adjacency as [[bfs]]
    val e = undirectedPinned(edges, "u")
    val adj = Partitioning.declarePinnedHash(
      e.select(col("u").as("a"), col("v").as("b"))
        .union(e.select(col("v").as("a"), col("u").as("b")))
        .repartition(par, col("a"))
        .localCheckpoint(true),
      "a")
    var settled = seeds
      .select(col(seeds.columns.head).cast("long").as("node")).distinct()
      .select(col("node"), col("node").as("root"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = settled
    var h = 1
    var exhausted = frontier.isEmpty
    while (h <= maxHops && !exhausted) {
      val next = frontier
        .join(adj, frontier("node") === adj("a"))
        .select(col("b").as("node"), col("root"))
        .distinct()
        .join(settled.select("node", "root"), Seq("node", "root"), "left_anti")
        .select(col("node"), col("root"), lit(h).as("dist"))
        .localCheckpoint(true)
      exhausted = next.isEmpty
      if (!exhausted) {
        settled = settled.union(next).localCheckpoint(true)
        frontier = next
      }
      h += 1
    }
    settled
      .filter(col("dist") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("harmonic_grid"))
  }

  /** Integer-exact HITS (Kleinberg 1999) over a directed edge list:
    * `iterations` rounds of `a ← Eᵀh; h ← E·a` from `h₀ = 1` on every
    * source node, WITHOUT normalization — pure integer path counting
    * (hub score after k rounds = number of alternating forward/backward
    * walks of length 2k from the node), so the trajectory is exact and
    * the oracle unrolls it join for join. Rankings are what HITS is for,
    * and ranking is invariant to the normalization the float formulation
    * spends its precision on; the OVERFLOW contract is the honest cost:
    * scores grow like (mean degree)^(2·iterations) — with int64 headroom
    * callers keep `iterations · log₂(mean degree²)` under 63 (the
    * bipartite order↔part fixture at 3 iterations peaks ~2³³).
    *
    * Scale shape: the deduped edge list pins once; each half-round is one
    * score join into edges + one partial-agg'd groupBy — O(E) per round,
    * node-sized state, same Pregel motion as [[pageRankExact]].
    *
    * @return (node, hub, auth) — hub 0 for pure sinks, auth 0 for pure
    *         sources
    */
  def hitsExact(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val par = edges.sparkSession.sparkContext.defaultParallelism
    // TWO pinned copies of the edge list, one per join orientation: the
    // a-half-round joins scores on src, the h-half-round on dst, and a
    // single layout would re-exchange the edges every other half-round.
    // The second pin costs one edge-sized shuffle ONCE; with the declared
    // layouts every half-round's edge side is then exchange-free for the
    // whole fixpoint (guide §2.4).
    val eSrc = Partitioning.declarePinnedHash(
      edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .repartition(par, col("src"))
        .distinct()
        .localCheckpoint(true),
      "src")
    val eDst = Partitioning.declarePinnedHash(
      eSrc.repartition(par, col("dst")).localCheckpoint(true),
      "dst")
    // src values are already src-clustered, so the h₀ dedup needs no
    // exchange and lands node-hash-placed for the first a-half-round
    var h = Partitioning.declarePinnedHash(
      eSrc.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1L).as("h"))
        .localCheckpoint(true),
      "node")
    var a = eSrc.sparkSession.emptyDataFrame
    var i = 0
    while (i < iterations) {
      // only `a` is ever consumed twice (the h update + the final output
      // join on the last round) — pinning it bounds lineage to one round;
      // the h half-round pipelines into the next a unpinned (half the
      // materialization jobs of pin-everything). a's checkpoint is NOT
      // layout-declared: its exchange is ENSURE_REQUIREMENTS-inserted and
      // AQE may coalesce it, so a hash declaration could be false.
      a = eSrc.join(h.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a"))
        .localCheckpoint(true)
      h = eDst.join(a.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("h"))
      i += 1
    }
    h.join(a, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("auth"))
  }

  /** Weisfeiler–Lehman color refinement (Weisfeiler & Lehman 1968; the
    * 1-WL vertex-refinement pass behind graph-isomorphism sketching and
    * WL graph kernels): round 0 colors every node by its degree; each
    * round recolors `md5(old ‖ '|' ‖ sorted neighbor colors)`. The
    * returned COLOR HISTOGRAM `(wl_color, n_nodes)` after `rounds`
    * rounds is the canonical structural fingerprint — two graphs whose
    * histograms differ are non-isomorphic, and within one graph the
    * classes partition nodes by their radius-`rounds` neighborhood shape
    * (structural-role mining, graph dedup, motif profiling).
    *
    * Exactness: colors are md5 hex strings — the neighbor multiset is
    * serialized SORTED (binary order on ASCII hex/digits, identical in
    * any engine) and comma-joined, so every round replays verbatim in
    * SQL via `string_agg(lab, ',' ORDER BY lab)`.
    *
    * Scale shape: the deduped edge list pins once; each round is one
    * color join into edges + one `collect_list` groupBy whose per-node
    * list is degree-bounded — O(E) shuffle per round, node-sized state,
    * same Pregel motion as [[pageRankExact]]. Hub-degree contract: a
    * degree-d node serializes a d-term string per round; at web-graph
    * skew, cap or hash-chunk the multiset before joining (not needed on
    * bounded-degree fixtures).
    *
    * @param edges directed pairs; pass both orientations for undirected
    *              semantics (every node must appear as a src)
    */
  def wlColors(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one refinement round")
    val par = edges.sparkSession.sparkContext.defaultParallelism
    // the per-round neighbor join probes colors BY DST — pin the edge list
    // dst-hash-placed so every round's edge side is exchange-free; colors
    // are pinned node-hash-placed (node = src by the both-orientations
    // contract), which co-partitions BOTH sides of the round's two joins
    // (see pageRankImpl on why the declaration is needed at all)
    val e = Partitioning.declarePinnedHash(
      edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .repartition(par, col("dst"))
        .distinct()
        .localCheckpoint(true),
      "dst")
    // round-0 color: degree as a decimal string (every node appears as a
    // src by the both-orientations contract, so this covers the node set);
    // the explicit src exchange keeps the pin's declaration truthful
    var lab = Partitioning.declarePinnedHash(
      e.select(col("src"))
        .repartition(par, col("src"))
        .groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("string").as("lab"))
        .localCheckpoint(true),
      "node")
    var i = 0
    while (i < rounds) {
      val nb = e
        .join(lab.select(col("node").as("dst"), col("lab").as("__nl")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(concat_ws(",", array_sort(collect_list(col("__nl")))).as("__m"))
      // each round's colors are consumed twice by the NEXT round (self +
      // neighbor sides of the join) — pin all but the final round, whose
      // colors only the closing histogram reads once. The pin re-asserts
      // the node layout with an explicit exchange (node-sized) so the
      // NEXT round's two joins stay co-partitioned.
      val next = lab.join(nb, Seq("node"))
        .select(col("node"), md5(concat_ws("|", col("lab"), col("__m"))).as("lab"))
      lab =
        if (i < rounds - 1)
          Partitioning.declarePinnedHash(
            next.repartition(par, col("node")).localCheckpoint(true), "node")
        else next
      i += 1
    }
    lab.groupBy(col("lab").as("wl_color")).agg(count(lit(1)).as("n_nodes"))
  }

  /** Newman modularity of a community assignment over an undirected
    * unique-pair edge list: per community
    * `q_num = 4·e_intra·m − deg_sum²` over the common denominator
    * `(2m)²`, so `Q = Σ q_num / 4m²` — the partition-quality score that
    * makes label-propagation's output judgeable. Exact integers up to
    * the single closing division per row; the global Q is the consumer's
    * one sum.
    *
    * Scale shape: two label joins of the edge list (intra count), one
    * degree aggregate, community-sized output; the 1-row edge total
    * broadcasts.
    *
    * @param labels (node, label) — e.g. [[labelPropagate]]'s output
    * @return (community, n_nodes, e_intra, deg_sum, q_num, q_term)
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .distinct()
      .localCheckpoint(true)
    val lab = labels.select(col("node").cast("long").as("node"), col("label"))
    val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("__d"))
    val m = e.agg(count(lit(1)).as("__m"))
    val intra = e
      .join(lab.toDF("node", "__la"), e("u") === col("node")).drop("node")
      .join(lab.toDF("node", "__lb"), e("v") === col("node")).drop("node")
      .filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("community"))
      .agg(count(lit(1)).as("e_intra"))
    lab.join(deg, "node")
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("__d")).as("deg_sum"))
      .join(intra, Seq("community"), "left")
      .withColumn("e_intra", coalesce(col("e_intra"), lit(0L)))
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"), col("e_intra"), col("deg_sum"),
        (lit(4L) * col("e_intra") * col("__m") - col("deg_sum") * col("deg_sum"))
          .as("q_num"),
        ((lit(4L) * col("e_intra") * col("__m") -
          col("deg_sum") * col("deg_sum")).cast("double") /
          (lit(4.0) * col("__m").cast("double") * col("__m").cast("double")))
          .as("q_term"))
  }

}
