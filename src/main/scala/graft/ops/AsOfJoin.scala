package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator the reference lacks (SURVEY §2 lists
  * joins as inner-equi only) and Spark's DataFrame API doesn't expose.
  *
  * For each left row, attach the latest right row with the same key whose
  * time is `<=` the left row's time (DuckDB `ASOF JOIN` semantics).
  *
  * Implementation is the union+window technique rather than a range join:
  * tag both inputs, union them, and take `last(right, ignoreNulls)` over a
  * `(key)` window ordered by `(time, tag)`. Right rows sort before left rows
  * at equal timestamps, giving `>=` matching. Cost model at scale: ONE
  * shuffle of |L|+|R| rows by key plus a per-key sort — no range-explosion,
  * no broadcast requirement, and AQE handles key skew. That is the plan
  * you'd want on 100 TB; a Catalyst range-join strategy would only help for
  * band predicates, not as-of.
  */
object AsOfJoin {

  /** @param leftTime/rightTime columns of identical orderable type
    * @param rightPrefix prefix applied to right columns in the output
    * @param inner when true, left rows with no match are dropped
    *
    * Null semantics (shared with [[graft.plans.AsOfJoinNative.backward]]):
    * a right row with NULL time never matches (SQL comparison — matches the
    * DuckDB ASOF oracle), and a left row with NULL time matches nothing
    * (dropped when `inner`, emitted with null right columns otherwise).
    * NULL keys DO group together (Spark window/shuffle semantics) — a
    * documented divergence from DuckDB, which never matches NULL keys.
    * Ties on equal (key, time): the right row with the maximum remaining
    * column values wins (full-struct tiebreak) — deterministic.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "r_",
      inner: Boolean = true): DataFrame =
    impl(left, right, leftKey, rightKey, leftTime, rightTime, rightPrefix,
      inner, forwardDir = false)

  /** FORWARD as-of: for each left row, the EARLIEST right row with the
    * same key whose time is `>=` the left row's time — "the next event
    * after" (next click after an error, next restock after a stockout,
    * next heartbeat after an alert). Same union+window machinery and the
    * same one-shuffle cost model, traversed in DESCENDING time order:
    * the running `last(right)` at a left row is then the smallest right
    * time at-or-after it. Tie rule mirrors [[backward]]: at equal
    * (key, time) the right row matches (`>=`), and among equal right
    * times the MAXIMUM full right struct wins — deterministic.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "r_",
      inner: Boolean = true): DataFrame =
    impl(left, right, leftKey, rightKey, leftTime, rightTime, rightPrefix,
      inner, forwardDir = true)

  /** Tolerance-bounded backward as-of — the feature-store read: the latest
    * right row at-or-before the left row's time, but only if it is no
    * staler than `maxStaleness` (a match older than the bound counts as NO
    * match — dropped when `inner`, null right columns otherwise). The
    * pandas `merge_asof(tolerance=...)` semantics.
    *
    * Exact by post-filter, at zero extra data motion: the backward winner
    * is the NEAREST at-or-before candidate, so every other candidate is
    * staler — testing only the winner against the bound loses nothing.
    * Cost model is [[backward]]'s unchanged: one |L|+|R| key shuffle.
    *
    * @param maxStaleness subtracted from the left time to form the floor
    *   (`right.time >= left.time - maxStaleness`); an INTERVAL literal for
    *   timestamp times, a plain numeric for numeric times.
    */
  def backwardTolerance(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      maxStaleness: Column,
      rightPrefix: String = "r_",
      inner: Boolean = true): DataFrame =
    impl(left, right, leftKey, rightKey, leftTime, rightTime, rightPrefix,
      inner, forwardDir = false, staleness = Some((maxStaleness, rightTime)))

  /** Tolerance-bounded FORWARD as-of — the conversion-window / SLA read:
    * the earliest right row at-or-after the left row's time, but only if
    * it arrives within `maxWait` ("did a click follow the error within an
    * hour"). Exact by the same nearest-candidate post-filter argument as
    * [[backwardTolerance]]: the forward winner is the EARLIEST candidate,
    * so any other candidate is later still — testing only the winner
    * against `left.time + maxWait` loses nothing, at zero extra motion.
    */
  def forwardTolerance(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      maxWait: Column,
      rightPrefix: String = "r_",
      inner: Boolean = true): DataFrame =
    impl(left, right, leftKey, rightKey, leftTime, rightTime, rightPrefix,
      inner, forwardDir = true, staleness = Some((maxWait, rightTime)))

  /** Time-INTERPOLATED as-of read — the feature-store read for continuous
    * signals (sensor values, prices, gauges) where carrying the stale
    * previous observation ([[backward]]) biases everything between two
    * readings: each left row gets the straight-line value between its
    * surrounding right observations,
    * `v = (v_prev·(t_next − t) + v_next·(t − t_prev)) / (t_next − t_prev)`.
    *
    * Exactness: times are int64 µs, values arrive as an integer GRID
    * (caller scales: cents, millidegrees — the engine-wide discipline),
    * and the division floors via `(num − pmod(num, dT)) / dT`, which
    * matches DuckDB's floor `//` for ANY numerator sign. An exact-hit
    * left row (t = t_prev) reduces algebraically to `v_prev` — no special
    * case; `t_prev = t_next` (one observation at both ends) is the one
    * guarded branch. No prev or no next ⇒ null (edges don't extrapolate;
    * `value_interp` is null exactly where a plot would show no line).
    * Overflow contract: `|v_grid| · max_gap_µs` must fit int64 — at a
    * 30-day gap that allows grids to ~3.5×10⁶, loudly documented here
    * because silent wraparound is the one failure the oracle gate could
    * miss if both engines wrapped identically (they don't — DuckDB
    * promotes to INT128).
    *
    * Scale shape: the [[backward]] union+window technique run BOTH
    * directions off ONE key shuffle (two window sorts share the
    * exchange) — |L|+|R| rows move once, no join, no range explosion.
    * Ties on equal (key, time) resolve to the max grid value in both
    * directions (deterministic, oracle-replayed).
    */
  def interpolated(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueGrid: Column): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)).toIndexedSeq: _*)
    val l2 = left.select(
      left(leftKey).as("__k"),
      unix_micros(left(leftTime)).as("__t"),
      lit(1).as("__src"),
      lStruct.as("__l"),
      lit(null).cast("long").as("__v"))
    val r2 = right.filter(right(rightTime).isNotNull).select(
      right(rightKey).as("__k"),
      unix_micros(right(rightTime)).as("__t"),
      lit(0).as("__src"),
      lit(null).cast(left.schema).as("__l"),
      rightValueGrid.cast("long").as("__v"))
    // right rows sort before left at equal (t) in BOTH traversals, so an
    // exact-hit observation is visible to its own timestamp's reads;
    // __v asc makes last() pick the max value among duplicate times
    val wPrev = Window.partitionBy("__k")
      .orderBy(col("__t").asc_nulls_first, col("__src").asc, col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("__k")
      .orderBy(col("__t").desc_nulls_first, col("__src").asc, col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsT = when(col("__src") === 0, col("__t"))
    // num is an exact multiple of dT after the pmod subtraction, so the
    // integral DIV is exact and sign-safe (truncate == floor on exact
    // multiples) — a plain `/` would round through double past 2^53
    val interp = expr(
      """CASE WHEN __prev_t IS NULL OR __next_t IS NULL THEN CAST(NULL AS BIGINT)
        |     WHEN __next_t = __prev_t THEN __prev_v
        |     ELSE (__num - pmod(__num, __next_t - __prev_t))
        |          DIV (__next_t - __prev_t) END""".stripMargin)
    l2.unionByName(r2)
      .withColumn("__prev_v", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__prev_t", last(obsT, ignoreNulls = true).over(wPrev))
      .withColumn("__next_v", last(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__next_t", last(obsT, ignoreNulls = true).over(wNext))
      .filter(col("__src") === 1)
      .withColumn("__num",
        col("__prev_v") * (col("__next_t") - col("__t")) +
          col("__next_v") * (col("__t") - col("__prev_t")))
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++ Seq(
        col("__prev_t").as("prev_t_us"), col("__prev_v").as("prev_v"),
        col("__next_t").as("next_t_us"), col("__next_v").as("next_v"),
        interp.cast("long").as("value_interp")): _*)
  }

  private def impl(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPrefix: String,
      inner: Boolean,
      forwardDir: Boolean,
      staleness: Option[(Column, String)] = None): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)).toIndexedSeq: _*)
    val rStruct = struct(right.columns.map(right(_)).toIndexedSeq: _*)
    val l2 = left.select(
      left(leftKey).as("__k"),
      left(leftTime).as("__t"),
      lit(1).as("__src"),
      lStruct.as("__l"),
      lit(null).cast(right.schema).as("__r"))
    // NULL right time never matches: nulls-first ordering would otherwise
    // make such a row the "earliest" of its key and a match for every left
    // row — the opposite of SQL comparison (and the DuckDB ASOF oracle)
    val r2 = right.filter(right(rightTime).isNotNull).select(
      right(rightKey).as("__k"),
      right(rightTime).as("__t"),
      lit(0).as("__src"),
      lit(null).cast(left.schema).as("__l"),
      rStruct.as("__r"))
    // Deterministic even under duplicate right timestamps: the struct itself
    // is the final tiebreaker. Forward traverses time DESCENDING, so the
    // running last(right) is the nearest at-or-after instead of at-or-before.
    // nulls FIRST in both directions: a null-time left row must traverse
    // before any right row so it matches nothing (asc defaults to
    // nulls-first; desc must say so explicitly)
    val tOrd = if (forwardDir) col("__t").desc_nulls_first else col("__t").asc
    val w = Window
      .partitionBy("__k")
      .orderBy(tOrd, col("__src").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = l2
      .unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
    // staleness/wait bound: nearest-candidate post-filter is exact
    // (scaladoc); the window direction decides which side the bound sits on
    val matched = staleness match {
      case Some((tol, rt)) =>
        val fresh =
          if (forwardDir) col(s"__m.$rt") <= col("__t") + tol
          else col(s"__m.$rt") >= col("__t") - tol
        matchedRaw.withColumn("__m", when(fresh, col("__m")))
      case None => matchedRaw
    }
    val kept = if (inner) matched.filter(col("__m").isNotNull) else matched
    val outCols: Seq[Column] =
      left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
        right.columns.toIndexedSeq.map(c => col(s"__m.$c").as(s"$rightPrefix$c"))
    kept.select(outCols: _*)
  }
}
