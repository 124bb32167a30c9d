package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A/B experiment readout: the 2×2 conversion table and its Pearson χ²
  * statistic — the decision row every experimentation platform derives
  * before shipping a variant.
  *
  * Exactness discipline (the [[Checks.corrExact]] pattern): the four cell
  * counts aggregate exactly; the χ² pieces that can overflow a long
  * ((ad−bc)², the row/column-margin products) compute as DECIMAL(38,0) —
  * exact — and the FINAL combine is a fixed-order double expression of
  * correctly-rounded casts, so the statistic is bit-identical on any
  * partitioning and any engine. Degenerate tables (an empty variant, a
  * zero or saturated conversion column) yield a null χ², not NaN.
  *
  * Scale shape: one partial-agg'd aggregate over the unit table (conditional
  * sums — no shuffle wider than the 1-row result). The unit table is one
  * row per experimental unit; build it upstream with the per-user
  * collapse the query shows (events → per-user converted flag).
  *
  * No reference analog — pipeline-extension layer.
  */
object Experiment {

  /** One-row 2×2 report over a UNIT table: `variantCol` ∈ {0, 1} (long),
    * `convertedCol` ∈ {0, 1} (long). Output: per-variant sizes and
    * conversions plus `chi2`.
    */
  def abReport(
      units: DataFrame,
      variantCol: String,
      convertedCol: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val v = col(variantCol)
    val c = col(convertedCol)
    val agg = units
      .filter(v.isNotNull && c.isNotNull)
      .agg(
        // coalesce: an empty unit table reports zeros, not nulls
        coalesce(sum(when(v === 0 && c === 1, 1L).otherwise(0L)), lit(0L)).as("conv_a"),
        coalesce(sum(when(v === 0, 1L).otherwise(0L)), lit(0L)).as("n_a"),
        coalesce(sum(when(v === 1 && c === 1, 1L).otherwise(0L)), lit(0L)).as("conv_b"),
        coalesce(sum(when(v === 1, 1L).otherwise(0L)), lit(0L)).as("n_b"))
    // 2×2 cells: a = conv_a, b = n_a − conv_a, c = conv_b, d = n_b − conv_b
    val a = col("conv_a")
    val b = col("n_a") - col("conv_a")
    val cc = col("conv_b")
    val dd = col("n_b") - col("conv_b")
    val n = col("n_a") + col("n_b")
    val adbc = a * dd - b * cc // |cells| ≤ n² ≤ 2^63 at any realistic n
    val sq = adbc.cast(d19) * adbc.cast(d19) // exact DECIMAL(38,0)
    val rows = (col("n_a").cast(d19) * col("n_b").cast(d19)).cast("double")
    val cols = ((a + cc).cast(d19) * (b + dd).cast(d19)).cast("double")
    agg.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && (a + cc) > 0 && (b + dd) > 0,
        n.cast("double") * sq.cast("double") / (rows * cols))
        .otherwise(lit(null).cast("double")).as("chi2"))
  }
}
