package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-conversion funnel over an event stream: how many users reached
  * stage k having entered stage k-1 first. A user's entry time into stage k
  * is their EARLIEST stage-k event at or after their stage k-1 entry —
  * the standard product-analytics funnel semantics (strictly ordered,
  * unbounded window).
  *
  * Scale shape: one filtered aggregate per stage, each shuffling only that
  * stage's events by user; survivors shrink monotonically down the funnel
  * and ride broadcast joins once small (AQE decides from measured sizes).
  * Each survivor stage is CACHED (`persist` MEMORY_AND_DISK) before the
  * next stage builds on it: the N stage counts would otherwise each
  * re-embed the full plan of stages 1..k, and without exchange reuse a
  * deep funnel re-scans the events table O(N²)-ish times per action.
  * Cached, the events table is scanned exactly once per stage — N scans
  * total — and the count branches read only the user-sized cached sets.
  * `persist` (not `localCheckpoint`) on purpose: lineage stays intact, so
  * an evicted or executor-lost block recomputes instead of failing the
  * query, and the ContextCleaner reclaims the blocks once the returned
  * frame is dropped.
  *
  * No reference analog — pipeline-extension layer.
  */
object Funnel {

  /** Debounce: suppress every event closer than `minGapMicros` to its
    * per-key predecessor — the telemetry burst cleaner (double-clicks,
    * retry storms, sensor chatter). An event survives iff it has no
    * predecessor within the gap under the (ts, id) total order; the id
    * tiebreak makes equal-timestamp bursts resolve deterministically.
    * Contract: the gap is measured to the previous RAW event (the
    * window-expressible standard), not the previous KEPT one — a burst
    * longer than the gap thins pairwise rather than to one survivor; the
    * recursive variant is a stateful kernel, not a window.
    *
    * Scale shape: one shuffle on the key columns for the lag window,
    * timestamp math on µs integers (the `events_moving` discipline) — no
    * join, no state, engine-replayable.
    */
  def debounce(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      minGapMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(minGapMicros > 0, s"minGapMicros must be > 0, got $minGapMicros")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    df.withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(
        col("__prev_us").isNull ||
          unix_micros(col(tsCol)) - col("__prev_us") >= minGapMicros)
      .drop("__prev_us")
  }

  /** @param steps event-type names in funnel order (at least one)
    * @return (stage, stage_idx, users) — one row per step, `users` = count
    *         of users whose ordered entry reached that step. The returned
    *         3-column frame reads only the cached survivor sets (built
    *         stage by stage on first action).
    */
  def stages(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame =
    stagesImpl(df, userCol, typeCol, tsCol, steps, None)

  /** [[stages]] with a conversion window: a user's stage-k entry must fall
    * within `maxGapMicros` of their stage-(k−1) entry — the "converted
    * WITHIN 24 h" funnel every growth team actually reports (the unbounded
    * variant overcounts users who wander back weeks later). Same cached
    * survivor-chain shape; the window is one extra µs predicate on the
    * stage gate.
    */
  def stagesWindowed(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxGapMicros: Long): DataFrame = {
    require(maxGapMicros > 0, s"maxGapMicros must be > 0, got $maxGapMicros")
    stagesImpl(df, userCol, typeCol, tsCol, steps, Some(maxGapMicros))
  }

  private def stagesImpl(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxGapMicros: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    survivorChain(df, userCol, typeCol, tsCol, steps, maxGapMicros)
      .zip(steps).zipWithIndex
      .map { case ((surv, step), i) =>
        surv.agg(count(lit(1)).as("users"))
          .select(lit(step).as("stage"), lit(i).as("stage_idx"), col("users"))
      }
      .reduce(_ unionByName _)
  }

  /** The cached per-stage survivor sets `(user, __entry)` — one frame per
    * step, each ≤ one row per user. Shared by [[stages]] (counts) and
    * [[transitionStats]] (latencies).
    */
  private def survivorChain(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxGapMicros: Option[Long] = None): Seq[DataFrame] = {
    val u = col(userCol)
    def entries(step: String, prev: Option[DataFrame]): DataFrame = {
      val events = df.filter(col(typeCol) === step)
      val gated = prev match {
        case None => events
        case Some(p) =>
          val inOrder = col(tsCol) >= col("__entry")
          val bound = maxGapMicros match {
            case Some(g) =>
              inOrder && unix_micros(col(tsCol)) - unix_micros(col("__entry")) <= g
            case None => inOrder
          }
          events.join(p, Seq(userCol)).filter(bound).drop("__entry")
      }
      // survivors are user-sized (≤ one row per user) and feed both the
      // next stage's gate and this stage's count: pin them once
      gated.groupBy(u).agg(min(col(tsCol)).as("__entry"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    steps.tail.scanLeft(entries(steps.head, None)) {
      case (prev, step) => entries(step, Some(prev))
    }
  }

  /** First-order Markov transition table over the event stream: for every
    * ordered pair of event types, how often type B directly follows type A
    * within a user's stream, plus the transition probability on the exact
    * ppm grid (`n_trans·10⁶ DIV n_from` — long floor division, engine-
    * replayable; the long product bounds per-pair transitions at ~9·10¹²,
    * far above any real stream). The behavior-model prior behind
    * next-action prediction and anomalous-session scoring.
    *
    * Scale shape: ONE shuffle (the per-user lead window on the key), then
    * the pair aggregate partial-aggregates map-side down to |types|² rows;
    * the per-source total is a window over that tiny table. Stream ends
    * (last event per user) contribute no pair — lead() semantics.
    */
  def markov(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = df
      .select(col(typeCol).as("from_type"), lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val byFrom = Window.partitionBy("from_type")
    pairs
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("n_from", sum(col("n_trans")).over(byFrom))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        expr("n_trans * 1000000 DIV n_from").as("p_ppm"))
  }

  /** Top-k most common length-`len` event-type paths (session path
    * mining): consecutive runs under the per-user (ts, id) total order,
    * counted and cut at `k` by the deterministic (count DESC, path ASC)
    * order. Same single-shuffle shape as [[markov]] — the lead window is
    * the only corpus-sized exchange; the path aggregate partial-aggregates
    * map-side and the cut is TakeOrdered (bounded, no global sort).
    */
  def topPaths(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      len: Int,
      k: Int): DataFrame = {
    require(len >= 2, s"paths need at least 2 steps, got $len")
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val steps = col(typeCol) +: (1 until len).map(i => lead(col(typeCol), i).over(w))
    df.select(steps.last.as("__last"), concat_ws(" > ", steps: _*).as("path"))
      .filter(col("__last").isNotNull)
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Time-to-convert per funnel transition: for every adjacent stage pair,
    * how many users converted and the exact LOWER median / lower p90 of
    * their entry-to-entry latency in whole seconds — the product question
    * behind every funnel count ("how long does the click→purchase hop
    * take?").
    *
    * Exactness: latencies are exact µs longs floored to seconds
    * (`DIV 1000000` — non-negative by funnel construction); the
    * percentiles are rank selections at `(n+1) div 2` and
    * `⌈9n/10⌉ = (9n+9) div 10` over a latency histogram — all long
    * arithmetic, bit-replayable.
    *
    * Scale shape: transitions join the already-cached user-sized survivor
    * sets (no event-table re-scan); the second-granularity histogram
    * bounds the percentile windows by the time horizon in seconds, not by
    * the user count — the same materialized-histogram discipline as
    * [[Outliers]].
    */
  def transitionStats(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "transitions need at least two steps")
    val chain = survivorChain(df, userCol, typeCol, tsCol, steps)
    val gaps = steps.indices.dropRight(1).map { k =>
      chain(k).withColumnRenamed("__entry", "__ea")
        .join(chain(k + 1).withColumnRenamed("__entry", "__eb"), Seq(userCol))
        .select(
          lit(steps(k)).as("stage_from"),
          lit(steps(k + 1)).as("stage_to"),
          lit(k).as("__step"),
          (unix_micros(col("__eb")) - unix_micros(col("__ea"))).as("__gap_us"))
    }.reduce(_ unionByName _)
      .withColumn("__gap_s", expr("__gap_us DIV 1000000"))
    val hist = gaps
      .groupBy(col("stage_from"), col("stage_to"), col("__step"), col("__gap_s"))
      .agg(count(lit(1)).as("__c"))
    val byGap = Window.partitionBy("__step").orderBy("__gap_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("__step")
    hist
      .withColumn("__cum", sum(col("__c")).over(byGap))
      .withColumn("__n", sum(col("__c")).over(all))
      .groupBy(col("stage_from"), col("stage_to"), col("__step"))
      .agg(
        max(col("__n")).as("n_conv"),
        min(when(col("__cum") >= expr("(__n + 1) DIV 2"), col("__gap_s")))
          .as("med_gap_s"),
        min(when(col("__cum") >= expr("(9 * __n + 9) DIV 10"), col("__gap_s")))
          .as("p90_gap_s"))
      .drop("__step")
  }
  /** Markov removal-effect attribution (Anderl et al.'s data-driven
    * multi-touch model): user journeys truncated at FIRST conversion feed
    * a first-order transition matrix with absorbing `conv`/`drop` states;
    * the base conversion probability comes from `iterations` rounds of
    * value iteration, and each channel's credit is the DROP in conversion
    * when journeys through that channel are severed (its inbound
    * transitions redirect to failure — the standard removal effect, no
    * renormalization). Output per channel: `(channel, base_ppm,
    * removed_ppm, effect_ppm, attribution_ppm)`.
    *
    * Exactness: transition probabilities are exact floor ppm
    * (`count·10⁶ DIV out`), every value-iteration step is
    * `pconv + (Σ p·v) DIV 10⁶` in longs, so all five scenarios (base + one
    * per channel) replay bit-exactly as unrolled SQL CTE chains — the
    * oracle does exactly that. Floors make each step monotone, so the
    * fixed-round result is deterministic regardless of join order.
    *
    * Scale shape: ONE user-keyed window shuffle builds the journey pairs
    * (the [[markov]] motion); everything after lives on the TYPES²-sized
    * probability table — bounded by the DISTINCT EVENT TYPES in the data
    * (src/dst range over every non-conversion type plus start/conv/drop,
    * not just the `channels` argument), which is COLLECTED and
    * value-iterated on the driver (the repo's bounded-driver-fold
    * discipline, like the lineage hash chain). The collect carries a loud
    * size guard: a high-cardinality `typeCol` (an id mistaken for a type
    * column) fails with a routing hint instead of OOMing the driver. The
    * round-12 plan-as-written bench showed the lazily-composed
    * alternative — 12 rounds × (1+|channels|) scenarios of unrolled tiny
    * joins — costs 6+ s of pure planning/scheduling on a ~36-row matrix
    * while the driver fold is microseconds of identical integer
    * arithmetic. The event table never moves twice.
    */
  def markovAttribution(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      convType: String,
      channels: Seq[String],
      iterations: Int = 12): DataFrame = {
    require(iterations >= 2, s"value iteration needs >= 2 rounds, got $iterations")
    require(channels.nonEmpty && !channels.contains(convType),
      "channels must be non-empty and exclude the conversion type")
    val fp = df.filter(col(typeCol) === convType)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__fp"))
    val j = df
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(typeCol).as("__t"))
      .filter(col("__t") =!= convType)
      .join(fp, Seq("__u"), "left")
      .filter(col("__fp").isNull || col("__ts") < col("__fp"))
    val w = Window.partitionBy("__u").orderBy(col("__ts"), col("__id"))
    val trMid = j.select(
      col("__u"),
      col("__t").as("src"),
      coalesce(lead(col("__t"), 1).over(w),
        when(col("__fp").isNotNull, lit("conv")).otherwise(lit("drop"))).as("dst"),
      row_number().over(w).as("__rn"))
    val trans = trMid.select(col("src"), col("dst"))
      .union(trMid.filter(col("__rn") === 1)
        .select(lit("start").as("src"), col("src").as("dst")))
      .union(fp.join(j.select("__u").distinct(), Seq("__u"), "left_anti")
        .select(lit("start").as("src"), lit("conv").as("dst")))
    val cnt = trans.groupBy("src", "dst").agg(count(lit(1)).as("__c"))
    val tot = cnt.groupBy("src").agg(sum(col("__c")).as("__o"))
    // the ONLY distributed work: one pass over events (above) down to the
    // types²-bounded probability table — collect it and run the
    // 12-round × (1+|channels|)-scenario value iteration on the driver
    // with the identical integer arithmetic (floor ppm, sum-then-DIV).
    // The probe reads cap+1 rows so a high-cardinality typeCol fails
    // loudly BEFORE a full collect can OOM the driver.
    val maxEdges = 1 << 20
    val probe = cnt.join(tot, Seq("src"))
      .select(col("src"), col("dst"), expr("__c * 1000000 DIV __o").as("__p"))
    val p: Array[(String, String, Long)] = {
      val rows = probe.limit(maxEdges + 1).collect()
      require(rows.length <= maxEdges,
        s"markovAttribution: transition matrix exceeds $maxEdges edges — " +
          s"'$typeCol' looks like a high-cardinality column, not an event-type " +
          "domain. Bucket it to a bounded type vocabulary first (the matrix is " +
          "types², and the driver fold is only sound for a bounded type domain).")
      rows.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    }
    val states: Seq[String] = p.map(_._1).distinct.sorted.toSeq

    def converge(removed: Option[String]): Option[Long] = {
      val pp = removed.fold(p)(c => p.filter(_._2 != c))
      val pConv = pp.filter(_._2 == "conv").map(t => t._1 -> t._3).toMap
      val pMid = pp.filter(t => states.contains(t._2))
      var v: Map[String, Long] =
        states.map(s => s -> pConv.getOrElse(s, 0L)).toMap
      var i = 1
      while (i < iterations) {
        val s = pMid.groupBy(_._1).map { case (src, ts) =>
          src -> ts.map(t => t._3 * v(t._2)).sum
        }
        v = states.map(st =>
          st -> (pConv.getOrElse(st, 0L) + s.getOrElse(st, 0L) / 1000000L)).toMap
        i += 1
      }
      v.get("start")
    }

    val spark = df.sparkSession
    import spark.implicits._
    converge(None) match {
      case None =>
        Seq.empty[(String, Long, Long, Long, Option[Long])]
          .toDF("channel", "base_ppm", "removed_ppm", "effect_ppm",
            "attribution_ppm")
      case Some(basePpm) =>
        val rows = channels.map { c =>
          val removedPpm = converge(Some(c)).getOrElse(0L)
          (c, basePpm, removedPpm, basePpm - removedPpm)
        }
        val te = rows.map(_._4).sum
        rows.map { case (c, b, r, e) =>
          (c, b, r, e, if (te > 0) Some(e * 1000000L / te) else None)
        }.toDF("channel", "base_ppm", "removed_ppm", "effect_ppm",
          "attribution_ppm")
    }
  }

  /** Stationary distribution of the [[markov]] chain by integer power
    * iteration: from the uniform start, `iterations` rounds of
    * `π'(t) = Σ_s ⌊π(s)·p_ppm(s,t) / 10⁶⌋` — every term floored
    * INDIVIDUALLY (order-independent, partitioning-invariant), so the
    * trajectory replays exactly in unrolled SQL. The long-run behavior
    * prior behind session simulators and attribution baselines. Mass
    * leaks monotonically through the floors and through states with no
    * outgoing transitions (documented: ranks and ratios are the product,
    * not a probability that sums to 10⁶).
    *
    * Scale shape: the transition table is |types|²-sized and pins once;
    * each iteration is a join+agg over that tiny table — the corpus is
    * touched exactly once (inside [[markov]]).
    */
  def markovStationary(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val trans = markov(df, userCol, typeCol, tsCol, idCol)
      .select(col("from_type"), col("to_type"), col("p_ppm"))
      .localCheckpoint(true)
    val states = trans.select(col("from_type").as("state"))
      .union(trans.select(col("to_type").as("state")))
      .distinct()
      .localCheckpoint(true)
    val n = states.count()
    var pi = states.withColumn("pi_ppm", lit(1000000L / n))
    for (_ <- 1 to iterations) {
      pi = trans
        .join(pi, trans("from_type") === pi("state"))
        .groupBy(col("to_type").as("state"))
        .agg(sum(expr("pi_ppm * p_ppm DIV 1000000")).as("pi_ppm"))
        .localCheckpoint(true)
    }
    pi.select(col("state"), col("pi_ppm"))
  }

}
