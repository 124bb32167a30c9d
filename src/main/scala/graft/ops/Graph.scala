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
      dampDenom: Long = 20L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampNumer > 0 && dampDenom > dampNumer, "damping must be in (0,1)")
    val base = (dampDenom - dampNumer) * ScoreScale / dampDenom
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val ed = e.join(deg, Seq("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    // Iterations COMPOSE lazily: each score set is consumed exactly once
    // (the next iteration's edge join), so no per-iteration barrier is
    // needed — the whole fixpoint runs as ONE job over the checkpointed
    // edge/node sets. Only every 8th iteration checkpoints, bounding plan
    // depth for deep runs without paying a materialization per round
    // (an eager per-iteration checkpoint benched 9× slower at 3 rounds).
    var scores = nodes.withColumn("score", lit(ScoreScale))
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
          (lit(base) +
            expr(s"($dampNumer * coalesce(__in, 0L)) DIV $dampDenom")).as("score"))
      if (i % 8 == 7 && i != iterations - 1) {
        next = next.localCheckpoint(true)
        pinned.foreach(org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint)
        pinned = Some(next)
      }
      scores = next
      i += 1
    }
    scores
  }
}
