package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: AQE's skew-join split handles sort-merge skew at
  * runtime, but salting is still the tool of choice when a handful of hot
  * keys dominate a shuffled hash join or when AQE is unavailable (e.g.
  * inside a cached subplan). At 100 TB a single hot key (null-ish ids,
  * default enum values) otherwise pins one reducer for hours.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `leftKey = rightKey` with the left side's
    * hot keys spread over `salts` buckets and the (smaller) right side
    * replicated `salts` times. Row-deterministic salt (hash of the whole
    * left row) keeps reruns/speculative tasks consistent.
    *
    * Output columns = left columns ++ right columns (right key dropped).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val lCols = left.columns
    val l = left.withColumn(
      "__salt",
      pmod(xxhash64(struct(lCols.map(left(_)).toIndexedSeq: _*)), lit(salts.toLong)).cast("int"))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
      .drop(r(rightKey))
  }

  /** EXACT heavy-key diagnostic: the `topN` hottest values of `keyCol`
    * with their counts and exact share in parts-per-million — the report
    * you run BEFORE choosing [[saltedJoin]]'s salt count or a bucketing
    * layout (the sketch-based heavy-hitters query answers the same
    * question approximately in one pass; this is the exact companion at
    * the cost of a key-cardinality aggregate). Share is an integer DIV on
    * longs — no doubles, replayable anywhere.
    *
    * Scale shape: one map-side-combined `groupBy(key)` shuffle collapses
    * the table to key-cardinality counts, which are MATERIALIZED once
    * (`localCheckpoint` — counts are key-cardinality-sized, not
    * row-sized); the 1-row total and the top-N both derive from that
    * materialization, so the table scans exactly once (plan-audited — the
    * naive two-consumer form re-scans, ReuseExchange notwithstanding).
    * Top-N is a TakeOrdered over the counts, never a global sort of data
    * rows. The deterministic (n DESC, key ASC) order makes rank stable
    * under reruns.
    */
  def keyReport(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN > 0)
    val counts = df
      .select(col(keyCol).cast("string").as("key"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val total = counts.agg(sum(col("n")).as("__total"))
    counts
      .crossJoin(broadcast(total))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
      .withColumn(
        "rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("key").asc)))
      .select(col("rank"), col("key"), col("n"),
        expr("(n * 1000000) DIV __total").as("ppm"))
  }
}
