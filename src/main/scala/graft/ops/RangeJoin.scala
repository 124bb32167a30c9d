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

  /** Interval-overlap join: one row per pair of HALF-OPEN intervals
    * `[lStart, lEnd) × [rStart, rEnd)` that intersect (`s1 < e2 ∧ s2 < e1`;
    * zero-length intervals never match), optionally within equal `keyCols`
    * — sessions × incident windows, validity ranges × validity ranges, the
    * interval-algebra sibling of [[bandJoin]]'s point-in-range.
    *
    * Same bucket decomposition, plus the MEET-BUCKET dedup trick: both
    * sides explode to the buckets they cover and the pair is kept only in
    * the bucket containing `greatest(s1, s2)` — the bucket where the
    * overlap STARTS, covered by both intervals by definition. Every
    * overlapping pair therefore surfaces in EXACTLY one bucket: no
    * distinct shuffle, no duplicate pairs, and the join stays a plain
    * equi-join on (keys, bucket) that hash-partitions / broadcasts like
    * any other. Replication cost: each interval appears once per covered
    * bucket — pick `bucketWidth` near the typical interval length so that
    * is O(1); a degenerate huge interval replicates honestly rather than
    * forcing every pair through one task.
    *
    * Start/end columns must be numeric (epoch micros as long for
    * timestamps — exact comparisons; the 1e-9 end nudge only positions
    * buckets and never decides a pair). Right-side non-key columns come
    * back `rightPrefix`ed.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Double,
      rightPrefix: String = "r_"): DataFrame = {
    require(bucketWidth > 0)
    def buckets(s: String, e: String) =
      sequence(
        floor(col(s) / bucketWidth).cast("long"),
        // end is exclusive; greatest(floor(..)) keeps [s, s) empty-safe
        greatest(
          floor(col(s) / bucketWidth).cast("long"),
          floor((col(e) - lit(1e-9)) / bucketWidth).cast("long")))
    val l = left.withColumn("__bucket", explode(buckets(lStart, lEnd)))
    val rRenamed = right.columns.foldLeft(right) { (df, c) =>
      if (keyCols.contains(c)) df else df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val r = rRenamed.withColumn(
      "__bucket", explode(buckets(s"$rightPrefix$rStart", s"$rightPrefix$rEnd")))
    val rs = col(s"$rightPrefix$rStart")
    val re = col(s"$rightPrefix$rEnd")
    l.join(r, keyCols :+ "__bucket")
      .filter(
        // the pairwise predicate alone would treat an EMPTY [x, x) as the
        // point x; set semantics need both intervals non-empty
        col(lStart) < col(lEnd) && rs < re &&
        col(lStart) < re && rs < col(lEnd) &&
          // meet bucket: the single bucket where the overlap begins
          col("__bucket") === floor(greatest(col(lStart), rs) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
