package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation) flagging — the standard scale-free anomaly gate for metric
  * streams (a point is anomalous when its deviation from the group median
  * exceeds k·1.4826·MAD, the Hampel filter). Mean/stddev z-scores break
  * down exactly when needed most — the outliers they should catch inflate
  * the stddev; median/MAD have a 50% breakdown point.
  *
  * Exactness discipline (cross-engine replayable, zero doubles in the
  * decision): values land on a fixed integer grid (`floor(v · 2^20)` as
  * LONG — one double multiply+floor, bit-identical in any IEEE engine);
  * the median is the LOWER median (the grid value at 1-indexed rank
  * `(n+1) div 2` under ascending order — rank selection, no interpolation,
  * so even-count groups stay on the grid); MAD is the lower median of
  * `|q - med|`; and the flag compares longs: `dev · 10000 > k · 14826 ·
  * mad` (1.4826 ≈ the normal-consistency constant, carried as the exact
  * rational 14826/10000).
  *
  * Scale shape — ONE scan of the table, exact medians WITHOUT a per-group
  * full sort: the grid compresses the stream to a VALUE HISTOGRAM
  * (`groupBy(group, q)` partial-aggregates map-side, so 100 TB of points
  * shuffles only distinct-grid-value counts), and that histogram is
  * materialized ONCE (`localCheckpoint`, the engine's discipline — it is
  * distinct-values-sized, not point-sized). Every later stage derives
  * from it: the median by a cumulative-count window (partition size =
  * distinct values, not points), the DEVIATION histogram by a broadcast
  * join + re-aggregation of the histogram itself (never the raw stream),
  * the MAD from that, and the summary — counts, medians, Hampel tallies —
  * by weighting histogram bins. The raw table is never read twice.
  *
  * No reference analog — pipeline-extension layer.
  */
object Outliers {

  val GridScale = 1L << 20
  /** Hampel consistency constant 1.4826 as an exact rational. */
  val MadNumer = 14826L
  val MadDenom = 10000L

  private def grid(c: org.apache.spark.sql.Column) =
    floor(c.cast("double") * GridScale.toDouble).cast("long")

  /** Lower median from a (group, value, count) histogram via rank
    * selection: the smallest value whose cumulative count reaches
    * `(n+1) div 2`. One (group, median) row per group.
    */
  private def lowerMedianHist(
      hist: DataFrame,
      groupCol: String,
      valCol: String,
      cntCol: String): DataFrame = {
    val byVal = Window.partitionBy(groupCol)
      .orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(groupCol)
    hist
      .withColumn("__cum", sum(col(cntCol)).over(byVal))
      .withColumn("__n", sum(col(cntCol)).over(all))
      .withColumn("__r", expr(s"(__n + 1) DIV 2"))
      .filter(col("__cum") - col(cntCol) < col("__r") && col("__r") <= col("__cum"))
      .select(col(groupCol), col(valCol).as("__med"))
  }

  /** The materialized (group, grid-value, count) histogram — the ONE pass
    * over the raw stream that every later stage derives from.
    */
  private def valueHist(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol), grid(col(valueCol)).as("__q"))
      .groupBy(col(groupCol), col("__q"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)

  /** The (group, deviation, count) histogram, derived from the value
    * histogram alone — histogram-sized work, no raw re-scan.
    */
  private def devHist(hist: DataFrame, groupCol: String): DataFrame =
    hist.join(broadcast(lowerMedianHist(hist, groupCol, "__q", "__c")
        .withColumnRenamed("__med", "__gmed")), Seq(groupCol))
      .select(col(groupCol), abs(col("__q") - col("__gmed")).as("__dev"),
        col("__c"), col("__gmed"))
      .groupBy(col(groupCol), col("__dev"), col("__gmed"))
      .agg(sum(col("__c")).as("__c"))
      .localCheckpoint(true)

  /** Per-group robust summary: group, n, median and MAD (both on the 2^20
    * grid), and the Hampel outlier count at threshold `k`. Null values are
    * excluded (they carry no magnitude to test).
    */
  def robustSummary(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 3): DataFrame = {
    val dh = devHist(valueHist(df, groupCol, valueCol), groupCol)
    val mad = lowerMedianHist(dh, groupCol, "__dev", "__c")
      .withColumnRenamed("__med", "__gmad")
    dh.join(broadcast(mad), Seq(groupCol))
      .groupBy(groupCol)
      .agg(
        sum(col("__c")).as("n"),
        first(col("__gmed")).as("median_grid"),
        first(col("__gmad")).as("mad_grid"),
        sum(when(
          col("__dev") * MadDenom > lit(k) * MadNumer * col("__gmad"), col("__c"))
          .otherwise(0L)).as("n_outliers"))
  }

  /** Row-level flag form: the input rows whose deviation trips the Hampel
    * test — the quarantine shape (route flagged rows out of a training
    * mix). Derives (med, mad) from the histogram pipeline, then takes ONE
    * more pass over the raw stream for the row output (inherent: the
    * result is row-sized); both stats ride in as broadcasts, so the second
    * pass is a map-side filter.
    */
  def flagged(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      k: Int = 3): DataFrame = {
    val hist = valueHist(df, groupCol, valueCol)
    val med = lowerMedianHist(hist, groupCol, "__q", "__c")
      .withColumnRenamed("__med", "__gmed")
    val mad = lowerMedianHist(devHist(hist, groupCol), groupCol, "__dev", "__c")
      .withColumnRenamed("__med", "__gmad")
    df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valueCol), grid(col(valueCol)).as("__q"))
      .join(broadcast(med), Seq(groupCol))
      .join(broadcast(mad), Seq(groupCol))
      .filter(abs(col("__q") - col("__gmed")) * MadDenom >
        lit(k) * MadNumer * col("__gmad"))
      .select(col(idCol), col(groupCol), col(valueCol))
  }
}
