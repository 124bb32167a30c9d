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
}
