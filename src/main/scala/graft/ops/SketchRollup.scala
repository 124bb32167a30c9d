package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketch rollup tables: build a per-fine-dimension HLL sketch
  * table ONCE (Spark's Apache DataSketches HllSketch binary), then answer
  * distinct-count questions at ANY coarser grouping by merging sketches —
  * never rescanning the data. This is the pre-aggregation pattern that
  * makes interactive cardinality dashboards possible over 100 TB: the
  * sketch table is dimensions-sized, each sketch a few KB, and
  * `hll_union_agg` is associative so rollups compose.
  *
  * The rollup is LOSSLESS with respect to the sketch: merging fine
  * sketches yields the same estimate as sketching the coarser group
  * directly (spec-pinned exactly) — the property that makes a persisted
  * sketch table trustworthy.
  *
  * No reference analog — pipeline-extension layer.
  */
object SketchRollup {

  /** The fine-grained sketch table: one row per `dims` group with the HLL
    * sketch of `valueCol` plus an exact row count (counts are additive, so
    * they roll up exactly alongside).
    */
  def build(df: DataFrame, dims: Seq[String], valueCol: String): DataFrame = {
    require(dims.nonEmpty, "sketch table needs at least one dimension")
    df.groupBy(dims.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"), count(lit(1)).as("n_rows"))
  }

  /** Roll a sketch table up to a coarser dimension subset: distinct
    * estimates via sketch union, row counts by addition. `dims` may be
    * empty for the grand total.
    */
  def rollup(sketches: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = Seq(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_est"),
      sum(col("n_rows")).as("n_rows"))
    if (dims.isEmpty) sketches.agg(aggs.head, aggs.tail: _*)
    else sketches.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** φ-heavy hitters with EXACT output counts, Count-Min-accelerated: the
    * two-pass verified pattern. Pass 1 builds a CMS over `keyCol` (one
    * map-side pass, constant sketch memory, mergeable across partitions).
    * Pass 2 filters each row by the broadcast sketch's estimate BEFORE the
    * exact aggregation, so the hash-agg state and the shuffle only ever
    * hold candidate keys — at 100 TB the long tail (the overwhelming
    * majority of a token/URL/user-id stream) never leaves the mapper.
    * CMS never under-estimates, so every true heavy hitter survives the
    * prefilter: filtered-exact ≡ unfiltered-exact (spec-pinned), which is
    * what makes the output REPLAYABLE — plain `GROUP BY HAVING count ≥
    * ⌈φ·N⌉` — unlike the raw sketch estimates it replaces.
    *
    * The threshold is the standard φ·N share (scale-invariant); `phi`
    * also bounds the candidate-set size by 1/φ + CMS-error spillover, so
    * `eps` should be chosen ≲ φ (default 100× tighter) to keep the
    * false-candidate mass down.
    */
  def verifiedHeavyHitters(
      df: DataFrame,
      keyCol: String,
      phi: Double,
      eps: Double = 0.0005,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val spark = df.sparkSession
    val keyed = df.select(col(keyCol).cast("string").as(keyCol)).filter(col(keyCol).isNotNull)
    val cms = keyed.stat.countMinSketch(keyCol, eps, confidence, seed)
    val total = cms.totalCount() // CMS tracks the stream length exactly
    val minFreq = math.ceil(phi * total).toLong
    val bc = spark.sparkContext.broadcast(cms)
    val est = udf((k: String) => bc.value.estimateCount(k))
    keyed
      .filter(est(col(keyCol)) >= minFreq)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col(keyCol))
  }
}
