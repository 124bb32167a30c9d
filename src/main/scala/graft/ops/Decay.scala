package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Half-life-decayed engagement scoring: each event contributes its value
  * halved once per `halfLifeHours` of age — the recency-weighted activity
  * score behind churn models, feature stores and trending rankings
  * (yesterday's click matters more than last month's).
  *
  * Exactness discipline: the classic `value · exp(-λ·age)` is a libm call
  * — the one place two engines' doubles legitimately drift — so the decay
  * here is DYADIC: weight = 2^(-⌊age/halfLife⌋), applied as an ARITHMETIC
  * RIGHT SHIFT of the grid value (`floor(v · 2^20)` as long). Shifts
  * floor toward −∞ in every engine (unlike integer division, whose
  * truncation direction differs by engine for negatives), the age step
  * count is an EXACT floor division (`(age − pmod(age, d)) / d` — the
  * numerator is exactly divisible, so the double divide is exact), and
  * the per-group sum is a sum of longs — order-free, bit-replayable. The
  * step-wise half-life (piecewise-constant within a half-life bucket) is
  * the documented trade for exactness.
  *
  * Scale shape: one map-side shift+weight per event, one partial-agg'd
  * `groupBy(key)` shuffle of (key, weighted-long) — the same motion as any
  * per-key sum; the reference instant rides in as a literal. 100 TB of
  * events, key-cardinality output.
  *
  * No reference analog — pipeline-extension layer.
  */
object Decay {

  val GridScale = 1L << 20
  private val MicrosPerHour = 3600L * 1000000L

  /** Per-key decayed score: `(key, score, n_events)` with
    * `score = Σ (⌊v·2^20⌋ >> ⌊age/halfLife⌋)` relative to `ref` — the
    * "now" of the scoring run, passed explicitly so reruns and engines
    * agree on ages. Events after `ref` and null values/timestamps are
    * excluded. Shift counts cap at 62 (beyond that the contribution is
    * the correct floor limit 0/−1 by sign).
    */
  def score(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      ref: java.sql.Timestamp,
      halfLifeHours: Int): DataFrame = {
    require(halfLifeHours > 0, "halfLifeHours must be positive")
    val stepMicros = MicrosPerHour * halfLifeHours
    val age = unix_micros(lit(ref)) - unix_micros(col(tsCol))
    val steps = least(
      ((age - pmod(age, lit(stepMicros))) / lit(stepMicros)).cast("long"),
      lit(62L))
    df.filter(col(valueCol).isNotNull && col(tsCol).isNotNull &&
        col(tsCol) <= lit(ref))
      .select(
        col(keyCol),
        floor(col(valueCol).cast("double") * GridScale.toDouble).cast("long").as("__q"),
        steps.cast("int").as("__k"))
      .withColumn("__w", expr("shiftright(__q, __k)"))
      .groupBy(col(keyCol))
      .agg(sum(col("__w")).as("score"), count(lit(1)).as("n_events"))
  }
}
