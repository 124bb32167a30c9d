package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics over an unbounded long domain WITHOUT a global
  * sort and WITHOUT assuming a bounded value grid — the distributed
  * SELECTION algorithm: each pass histograms the surviving value range
  * into `fanout` buckets with one map-side aggregate, descends into the
  * bucket containing the target rank, and finishes with an exact
  * value-vocabulary count once the range collapses. `log_fanout(range)`
  * passes total (4 passes cover the full 2^63 domain at fanout 256);
  * driver state is two longs and a rank.
  *
  * This complements the grid-histogram quantiles ([[Outliers]], the
  * percentile queries): those are one-pass but need a value grid chosen
  * up front; selection needs no prior knowledge of the distribution and
  * is still exact on adversarial ranges.
  */
object Selection {

  /** The value at 1-based rank `ceil(q·n)` of the ascending order (the
    * lower quantile; q→0 gives the minimum, q=1 the maximum) for each
    * requested q. Returns `(q, n_rows, value)` — one row per q, null
    * value when the input is empty. Nulls in the column are excluded
    * from ranking (SQL quantile semantics).
    *
    * The projected long column is pinned once (localCheckpoint — one
    * column of the input, the multi-pass descent then never re-derives
    * the caller's plan); each descent pass is one partial-agg'd scan of
    * that column. All range arithmetic is BigInt on the driver and
    * subtraction-safe in the plan (the first pass splits at 0 when the
    * raw range would overflow a long).
    */
  def quantileSelect(
      df: DataFrame,
      valueCol: Column,
      qs: Seq[Double],
      fanout: Int = 256,
      finishAt: Long = 65536L): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0,1], got $qs")
    require(fanout >= 2 && finishAt >= 2, s"need fanout >= 2 and finishAt >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint(true)
    val n = base.count()
    if (n == 0L) {
      return qs.map(q => (q, 0L, Option.empty[Long])).toDF("q", "n_rows", "value")
    }
    val bounds = base.agg(min(col("v")), max(col("v"))).head()
    val (gMin, gMax) = (bounds.getLong(0), bounds.getLong(1))

    // rank-k value within [lo, hi], where k is 1-based among rows in range
    @annotation.tailrec
    def descend(lo: Long, hi: Long, k: Long): Long = {
      val range = BigInt(hi) - BigInt(lo)
      if (range <= BigInt(finishAt)) {
        // exact finish: vocabulary-sized counts, walked on the driver
        val counts = base.filter(col("v") >= lo && col("v") <= hi)
          .groupBy(col("v")).agg(count(lit(1)).as("c"))
          .orderBy(col("v"))
          .as[(Long, Long)].collect()
        var rem = k
        var i = 0
        while (i < counts.length && rem > counts(i)._2) { rem -= counts(i)._2; i += 1 }
        counts(i)._1
      } else if (lo < 0L && hi > 0L && range > BigInt(Long.MaxValue) / 2) {
        // raw range would overflow (v - lo): split at zero first
        val neg = base.filter(col("v") >= lo && col("v") < 0L).count()
        if (k <= neg) descend(lo, -1L, k) else descend(0L, hi, k - neg)
      } else {
        val width = (range / fanout + 1).toLong // (v-lo) DIV width < fanout+1, safe
        // integer DIV, not `/`: Spark's Column `/` is DOUBLE division,
        // which loses low bits at 2^63 scale and mis-buckets edge values
        val hist = base.filter(col("v") >= lo && col("v") <= hi)
          .groupBy(expr(s"(v - ${lo}L) DIV ${width}L").cast("int").as("b"))
          .agg(count(lit(1)).as("c"))
          .orderBy(col("b"))
          .as[(Int, Long)].collect()
        var rem = k
        var i = 0
        while (i < hist.length && rem > hist(i)._2) { rem -= hist(i)._2; i += 1 }
        val b = hist(i)._1.toLong
        val lo2 = lo + b * width
        val hi2 = math.min(hi, lo2 + width - 1)
        descend(lo2, hi2, rem)
      }
    }

    val out = qs.map { q =>
      val k = math.max(1L, math.ceil(q * n).toLong)
      (q, n, Option(descend(gMin, gMax, k)))
    }
    out.toDF("q", "n_rows", "value")
  }

  /** Per-GROUP exact quantile by SIMULTANEOUS bucket descent: every
    * unfinished group advances one level per pass, so the total pass
    * count is `log_fanout(max group range)` — NOT groups × passes. Each
    * pass is one aggregate over (group, bucket) against a broadcast
    * bounds dim carrying every group's surviving `[lo, width]`; driver
    * state is three longs per group. Returns `(group, n_rows, value)`
    * with the same rank-`ceil(q·n)` semantics as [[quantileSelect]].
    *
    * Contract: the GROUP VOCABULARY is driver-sized (the per-group
    * bounds and the final ≤`finishAt`-wide value counts collect — the
    * same justified pull as every groups-sized report in this library);
    * the VALUE domain is unbounded, which is the op's point.
    */
  def groupedQuantileSelect(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      q: Double,
      fanout: Int = 256,
      finishAt: Long = 4096L): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must lie in [0,1], got $q")
    require(fanout >= 2 && finishAt >= 2, s"need fanout >= 2 and finishAt >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"), valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
      .localCheckpoint(true)
    // (g, lo, hi, k): k = 1-based rank of the target among rows in [lo, hi]
    var state: Map[String, (Long, Long, Long)] = base
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, n, lo, hi) =>
        g -> (lo, hi, math.max(1L, math.ceil(q * n).toLong))
      }.toMap
    val nRows = base.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    def rangeOf(lo: Long, hi: Long) = BigInt(hi) - BigInt(lo)
    def widthOf(lo: Long, hi: Long) = (rangeOf(lo, hi) / fanout + 1).toLong

    var active = state.filter { case (_, (lo, hi, _)) => rangeOf(lo, hi) > BigInt(finishAt) }
    while (active.nonEmpty) {
      // mixed-sign over-wide ranges: resolve each with one negative count
      // (groups hitting this are rare — adversarial full-domain data)
      val (wide, normal) = active.partition { case (_, (lo, hi, _)) =>
        lo < 0L && hi > 0L && rangeOf(lo, hi) > BigInt(Long.MaxValue) / 2
      }
      if (wide.nonEmpty) {
        val negCounts = base
          .join(broadcast(wide.keys.toSeq.toDF("g")), Seq("g"), "left_semi")
          .filter(col("v") < 0L)
          .groupBy(col("g")).agg(count(lit(1)).as("c"))
          .as[(String, Long)].collect().toMap
        wide.foreach { case (g, (lo, hi, k)) =>
          val neg = negCounts.getOrElse(g, 0L)
          state += (g -> (if (k <= neg) (lo, -1L, k) else (0L, hi, k - neg)))
        }
      }
      if (normal.nonEmpty) {
        val dim = normal.toSeq.map { case (g, (lo, hi, _)) =>
          (g, lo, hi, widthOf(lo, hi))
        }.toDF("g", "__lo", "__hi", "__w")
        val hist = base
          .join(broadcast(dim), Seq("g"))
          .filter(col("v") >= col("__lo") && col("v") <= col("__hi"))
          .groupBy(col("g"), expr("(v - __lo) DIV __w").cast("int").as("b"))
          .agg(count(lit(1)).as("c"))
          .as[(String, Int, Long)].collect()
          .groupBy(_._1)
        normal.foreach { case (g, (lo, hi, k)) =>
          val buckets = hist(g).sortBy(_._2)
          var rem = k
          var i = 0
          while (i < buckets.length && rem > buckets(i)._3) { rem -= buckets(i)._3; i += 1 }
          val b = buckets(i)._2.toLong
          val w = widthOf(lo, hi)
          val lo2 = lo + b * w
          state += (g -> (lo2, math.min(hi, lo2 + w - 1), rem))
        }
      }
      active = state.filter { case (_, (lo, hi, _)) => rangeOf(lo, hi) > BigInt(finishAt) }
    }
    // one finishing pass for every group: value counts within the
    // collapsed ranges, walked on the driver
    val dimF = state.toSeq.map { case (g, (lo, hi, _)) => (g, lo, hi) }
      .toDF("g", "__lo", "__hi")
    val finals = base
      .join(broadcast(dimF), Seq("g"))
      .filter(col("v") >= col("__lo") && col("v") <= col("__hi"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    val out = state.toSeq.map { case (g, (_, _, k)) =>
      val counts = finals(g).sortBy(_._2)
      var rem = k
      var i = 0
      while (i < counts.length && rem > counts(i)._3) { rem -= counts(i)._3; i += 1 }
      (g, nRows(g), counts(i)._2)
    }
    out.toDF(groupCol, "n_rows", "value")
  }
}
