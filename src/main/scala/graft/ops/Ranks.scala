package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed inclusive prefix sums over a TOTAL order — the drop-in
  * replacement for `sum(x).over(Window.orderBy(key))`, which Spark plans
  * as a SINGLE-TASK global sort ("No Partition Defined for Window"): fine
  * for a bounded histogram, a cliff once the frame is corpus-sized. This
  * is the range-partitioned prefix-sum pattern proven in
  * [[Linkage.sortedNeighborhoodPairs]]'s distributed rank, extracted so
  * every cumulative-histogram consumer (ECDF ranks, equal-frequency
  * boundaries, KS/Lorenz/Gini cum-sums, winsorize bounds) shares one
  * audited kernel.
  *
  * Shape: one range shuffle on the key (parallel sort), a #partitions-
  * sized offsets frame whose own ordering window is partitions-sized (the
  * bounded-window contract the WindowAuditSpec audit enforces), offsets
  * broadcast back, then a PARTITION-LOCAL running sum. No global
  * single-task stage at any scale.
  *
  * Contract: `keyCol` must be UNIQUE per row (callers pass a
  * `groupBy(key)` histogram — exactly the inputs the global windows had),
  * so inclusive prefix sums are well-defined without frame ties and the
  * result is bit-identical to the single-task window it replaces.
  */
object Ranks {

  /** Adds, for each `(valueCol, outCol)` pair, the inclusive running sum
    * of `valueCol` under `orderBy(keyCol ASC)`.
    *
    * CORRECTNESS PRECONDITION: `df` must be DETERMINISTIC (replayable to
    * the same rows — parquet scans, exact aggregates thereof). The
    * range-shuffled plan is consumed twice (offsets branch + main
    * branch); Spark usually reuses the exchange, but when it does not, a
    * nondeterministic input could draw DIFFERENT range boundaries per
    * branch, mis-aligning `__pid` between offsets and rows and silently
    * corrupting the prefix sums. Inputs containing sampling, rand(), or
    * floating reductions whose row SET can vary must be pinned
    * (`localCheckpoint`) by the caller first — for deterministic-but-
    * expensive inputs pinning remains a performance choice only.
    */
  def runningSums(
      df: DataFrame,
      keyCol: String,
      sums: Seq[(String, String)]): DataFrame = {
    require(sums.nonEmpty, "need at least one (value, out) column pair")
    val ordered = df
      .repartitionByRange(col(keyCol).asc)
      .sortWithinPartitions(col(keyCol).asc)
      .withColumn("__pid", spark_partition_id())
    // per-partition totals -> exclusive prefix offsets: a partitions-sized
    // frame, so ITS unpartitioned window is bounded by construction
    val totals = sums.map { case (v, o) => sum(col(v)).as(s"__t_$o") }
    val offs = ordered
      .groupBy(col("__pid"))
      .agg(totals.head, totals.tail: _*)
      .select(col("__pid") +: sums.map { case (_, o) =>
        coalesce(
          sum(col(s"__t_$o")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as(s"__off_$o")
      }: _*)
    val local = Window.partitionBy("__pid").orderBy(col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.foldLeft(ordered.join(broadcast(offs), Seq("__pid"))) {
      case (acc, (v, o)) =>
        acc.withColumn(o, col(s"__off_$o") + sum(col(v)).over(local))
    }.drop("__pid" +: sums.map { case (_, o) => s"__off_$o" }: _*)
  }

  /** Single-column convenience form. */
  def runningSum(df: DataFrame, keyCol: String, valueCol: String, outCol: String): DataFrame =
    runningSums(df, keyCol, Seq(valueCol -> outCol))

  /** Distributed `lead(keyCol) over (order by keyCol)` — each row gains
    * the NEXT key in the total order (`outCol`, null for the global
    * last): partition-local lead after a range shuffle, with the seam
    * rows (each partition's last) patched from a broadcast
    * partitions-sized frame of per-partition FIRST keys. Same bounded-
    * window contract as [[runningSums]]; same unique-key requirement.
    * The adjacency primitive behind gap integration (1-D Wasserstein's
    * `(v_{i+1} - v_i)` terms) without a single-task global sort.
    */
  def nextKey(df: DataFrame, keyCol: String, outCol: String): DataFrame = {
    val ordered = df
      .repartitionByRange(col(keyCol).asc)
      .sortWithinPartitions(col(keyCol).asc)
      .withColumn("__pid", spark_partition_id())
    // per-partition first keys; a range partition can be EMPTY, so the
    // seam successor of partition p is the first key of the nearest
    // NON-EMPTY partition after p — the partitions-sized cross-join
    // below (its ordering window input is #partitions rows) finds it
    val firsts = ordered.groupBy(col("__pid"))
      .agg(min(col(keyCol)).as("__first"))
    val seam = firsts.as("a")
      .join(firsts.as("b"), col("b.__pid") > col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(min(col("b.__first")).as("__succ"))
    val local = Window.partitionBy("__pid").orderBy(col(keyCol).asc)
    ordered.join(broadcast(seam), Seq("__pid"))
      .withColumn(outCol,
        coalesce(lead(col(keyCol), 1).over(local), col("__succ")))
      .drop("__pid", "__succ")
  }
}
