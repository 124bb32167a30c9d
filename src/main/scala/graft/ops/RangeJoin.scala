package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band/range join: `left.value ∈ [ranges.lo, ranges.hi)`.
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin — every
  * left row against every range. This operator bucketizes the value space:
  * each range explodes to the buckets it covers, the join becomes an
  * equi-join on the bucket id (hash shuffle / broadcast-able), and a
  * residual filter applies the exact bounds. With bucketWidth chosen near
  * the typical range width, each range covers O(1) buckets and the join
  * touches only same-bucket candidates — the standard interval-join
  * decomposition at data-warehouse scale.
  */
object RangeJoin {

  /** @param bucketWidth value-space width per bucket; ranges spanning many
    *        buckets replicate once per covered bucket (pick width ≈ typical
    *        range length)
    */
  def bandJoin(
      left: DataFrame,
      valueCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val l = left.withColumn("__bucket", floor(col(valueCol) / bucketWidth).cast("long"))
    val r = ranges.withColumn(
      "__bucket",
      explode(
        sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          // hi is exclusive: a range ending exactly on a bucket boundary
          // does not cover the next bucket
          floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    l.join(r, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
