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
  * Scale shape — exact medians WITHOUT a per-group full sort: the grid
  * compresses each group to a VALUE HISTOGRAM first (`groupBy(group, q)`
  * partial-aggregates map-side, so 100 TB of points shuffles only
  * distinct-grid-value counts), then rank selection runs a cumulative sum
  * over the histogram inside a per-group window — partition size = distinct
  * values, not points. The two medians are two such passes; the per-group
  * (med, mad) rows then broadcast back into a map-side flag over the raw
  * stream. Nothing point-sized ever shuffles twice, no driver state.
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

  /** Lower median of `valCol` per `groupCol` via histogram rank selection.
    * Input must be (group, value-long) rows; output one (group, median) row
    * per group.
    */
  private def lowerMedian(
      points: DataFrame,
      groupCol: String,
      valCol: String): DataFrame = {
    val hist = points.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__c"))
    val byVal = Window.partitionBy(groupCol)
      .orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(groupCol)
    // the lower median is the smallest grid value whose cumulative count
    // reaches rank (n+1) div 2 — DIV keeps the rank in exact long math
    hist
      .withColumn("__cum", sum(col("__c")).over(byVal))
      .withColumn("__n", sum(col("__c")).over(all))
      .withColumn("__r", expr("(__n + 1) DIV 2"))
      .filter(col("__cum") - col("__c") < col("__r") && col("__r") <= col("__cum"))
      .select(col(groupCol), col(valCol).as("__med"))
  }

  /** Per-group robust summary: group, n, median and MAD (both on the 2^20
    * grid), and the Hampel outlier count at threshold `k`. Null values are
    * excluded (they carry no magnitude to test).
    */
  def robustSummary(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 3): DataFrame = {
    val pts = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol), grid(col(valueCol)).as("__q"))
    val med = lowerMedian(pts, groupCol, "__q")
      .withColumnRenamed("__med", "__gmed")
    // deviations reuse the same histogram trick for the MAD median
    val dev = pts.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), col("__q"),
        abs(col("__q") - col("__gmed")).as("__dev"), col("__gmed"))
    val mad = lowerMedian(dev.select(col(groupCol), col("__dev")), groupCol, "__dev")
      .withColumnRenamed("__med", "__gmad")
    dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        first(col("__gmed")).as("median_grid"),
        first(col("__gmad")).as("mad_grid"),
        sum(when(
          col("__dev") * MadDenom > lit(k) * MadNumer * col("__gmad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Row-level flag form: the input rows of one group joined with their
    * robust deviation verdict — `idCol` rows where
    * `|q - med| · 10⁴ > k · 14826 · mad`. The summary is the dashboard
    * shape; this is the quarantine shape (route the flagged rows out of a
    * training mix).
    */
  def flagged(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      k: Int = 3): DataFrame = {
    val pts = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valueCol), grid(col(valueCol)).as("__q"))
    val med = lowerMedian(pts.select(col(groupCol), col("__q")), groupCol, "__q")
      .withColumnRenamed("__med", "__gmed")
    val dev = pts.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col("__q") - col("__gmed")))
    val mad = lowerMedian(dev.select(col(groupCol), col("__dev")), groupCol, "__dev")
      .withColumnRenamed("__med", "__gmad")
    dev.join(broadcast(mad), Seq(groupCol))
      .filter(col("__dev") * MadDenom > lit(k) * MadNumer * col("__gmad"))
      .select(col(idCol), col(groupCol), col(valueCol))
  }
}
