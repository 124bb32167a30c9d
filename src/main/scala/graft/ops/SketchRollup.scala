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
}
