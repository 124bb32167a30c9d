package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines:
  * train/val/test splits, corpus mixture weighting, and stratified
  * exact-k-per-stratum draws.
  *
  * All decisions derive from `md5(salt || id)` — a pure per-row Column
  * expression, so every operator here is map-side (zero shuffles except the
  * stratified draw's bounded top-k), reproducible across runs AND across
  * engines (md5 is standardized, unlike seeded RNG streams whose values
  * depend on partitioning), and stable under re-partitioning or data
  * re-ordering at 100 TB. The `salt` decorrelates independent decisions on
  * the same ids (e.g. a split drawn after a mixture pass): different salts
  * give independent hash streams.
  *
  * No reference analog (the reference has no sampling at all) — this is the
  * pipeline-extension layer next to [[Dedup]]/[[Similarity]].
  */
object Sampling {

  /** First 8 hex chars of `md5(salt || id)` — 32 uniform bits as lowercase
    * hex. Lexicographic order on the hex string equals numeric order, so
    * thresholding compares STRINGS and never leaves integer space; the same
    * expression replays verbatim in any engine with md5.
    */
  def hashKey(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 8)

  /** `floor(f · 16⁸)` as 8-digit lowercase hex — the string threshold such
    * that `hashKey < threshold` keeps an `f`-fraction of ids in expectation.
    */
  def fractionThreshold(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction $f out of [0,1]")
    // f == 1.0 must keep EVERY row: "g" sorts after every hex string, so
    // `hashKey < "g"` is unconditionally true (plain "ffffffff" would drop
    // the one-in-2³² row that hashes to the exact maximum)
    if (f >= 1.0) "g"
    else f"${(f * 4294967296.0).toLong}%08x"
  }

  /** Deterministic keep-with-probability-`f` filter on `idCol`. */
  def sampleFraction(df: DataFrame, idCol: String, f: Double, salt: String = "s"): DataFrame =
    df.filter(hashKey(col(idCol), salt) < lit(fractionThreshold(f)))

  /** EXACT-k uniform sample without replacement: rank rows by the salted
    * md5 of their id and keep the k smallest (ties → id) — id-stable
    * randomness with a guaranteed sample SIZE, where [[sampleFraction]]
    * guarantees only the rate. Plans as ONE TakeOrdered bounded heap
    * (never a global sort) and replays verbatim in SQL; the stateless
    * alternative to per-partition reservoir state.
    */
  def exactKSample(df: DataFrame, idCol: String, k: Int, salt: String = "ks"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn("__hk", hashKey(col(idCol), salt))
      .orderBy(col("__hk"), col(idCol))
      .limit(k)
      .drop("__hk")
  }

  /** Per-group exact-k: the same hash order INSIDE each group, pruned
    * map-side under WindowGroupLimit — the balanced-eval-set draw
    * ("5 random docs per source, reproducibly").
    */
  def exactKPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      k: Int,
      salt: String = "ks"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(groupCol).orderBy(col("__hk"), col(idCol))
    df.withColumn("__hk", hashKey(col(idCol), salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__hk", "__rn")
  }

  /** Importance sampling: keep each row with its OWN probability, given as
    * a Column in [0, 1] — the quality-weighted data-mixing primitive
    * (score documents, then sample proportional to the score). Same
    * deterministic salted-hash draw as [[sampleFraction]], so it is
    * id-stable under corpus growth and engine-replayable: the per-row
    * threshold is the probability scaled to the 32-bit hash space,
    * rendered as the same 8-hex-digit string the hash key uses. Pure
    * map-side — one comparison per row, no shuffle, no state.
    *
    * p ≥ 1 keeps the row unconditionally; p ≤ 0 (or null) drops it.
    */
  def importanceSample(
      df: DataFrame,
      idCol: String,
      probCol: Column,
      salt: String = "imp"): DataFrame = {
    val h = hashKey(col(idCol), salt)
    df.filter(probCol >= 1.0 || (probCol > 0.0 && h < probThreshold(probCol)))
  }

  /** Label every row with a split name by hash bucket: `splits` are
    * (name, weight) pairs, weights normalized to 1. A row's split is fixed
    * by its id alone — adding data never reassigns existing rows, the
    * property that keeps eval sets uncontaminated as the corpus grows.
    */
  def splitColumn(idCol: Column, splits: Seq[(String, Double)], salt: String = "split"): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits need positive weights")
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val h = hashKey(idCol, salt)
    // last split is the unconditional otherwise: no row falls through
    val cases = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        val c = h < lit(fractionThreshold(hi))
        Some(acc.fold(when(c, lit(name)))(_.when(c, lit(name))))
    }
    cases.fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1)))
  }

  /** Down-weight sources to a target mixture: each row survives with its
    * source's probability. The per-source fractions ride a broadcast join
    * against a rows-sized weights dim — at 100 TB the corpus streams
    * map-side, one comparison per row, no shuffle.
    *
    * Sources ABSENT from `weights` follow `defaultWeight`: `None` (the
    * default) keeps the map as the complete specification of the mixture —
    * unlisted sources are dropped, stated here loudly because a typo'd key
    * or a source added upstream otherwise silently excludes a slice. Pass
    * `Some(f)` to instead sample unlisted sources at `f` (e.g. `Some(1.0)`
    * = pass through untouched).
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      salt: String = "mix",
      defaultWeight: Option[Double] = None): DataFrame = {
    require(weights.nonEmpty, "empty mixture")
    val sp = df.sparkSession
    val dim = sp.createDataFrame(
      weights.toSeq.sortBy(_._1).map { case (s, f) => (s, fractionThreshold(f)) })
      .toDF(sourceCol, "__thresh")
    val joined = defaultWeight match {
      case None => df.join(broadcast(dim), Seq(sourceCol))
      case Some(f) =>
        df.join(broadcast(dim), Seq(sourceCol), "left")
          .withColumn("__thresh", coalesce(col("__thresh"), lit(fractionThreshold(f))))
    }
    joined
      .filter(hashKey(col(idCol), salt) < col("__thresh"))
      .drop("__thresh")
  }

  /** Per-group keep rates for a TEMPERATURE-rebalanced mixture (the
    * multilingual-corpus standard: small sources are up-weighted so the
    * head languages/domains don't monopolize the token budget). Group g
    * holding t_g of the corpus's T tokens gets target share
    * q_g ∝ (t_g/T)^alpha (alpha = 1: proportional — no rebalancing;
    * alpha → 0: equal shares), and keeps
    * rate_g = min(1, targetFraction · (q_g/Σq) · (T/t_g)) of its rows.
    *
    * Cross-engine determinism: token sums stay in LONG space (exact, any
    * aggregation order), and the only libm value — (t_g/T)^alpha — is
    * floored onto a 2⁴⁰ integer grid BEFORE the normalizing sum, so Σq is
    * an exact long and every downstream division is plain IEEE on
    * exactly-representable integers (the `text_perplexity` grid
    * discipline). The rate replays value-for-value in any SQL engine.
    *
    * One groups-sized output row per group — broadcast it into the keep
    * filter; the corpus itself is never shuffled.
    */
  def temperatureRates(
      df: DataFrame,
      groupCol: String,
      tokensCol: String,
      alpha: Double,
      targetFraction: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha out of [0,1]")
    require(targetFraction > 0.0 && targetFraction <= 1.0, s"targetFraction $targetFraction out of (0,1]")
    val grid = 1099511627776.0 // 2^40: q ∈ [0,1] lands on an exact-long grid
    // NB: names must differ in more than case — the analyzer is
    // case-insensitive by default, so "__t"/"__T" would be ONE column.
    val stats = df.groupBy(groupCol).agg(sum(col(tokensCol)).as("__tok"))
    // Corpus-wide totals via an unpartitioned window over the GROUPS-sized
    // stats (one tiny task), not a crossJoin back onto stats' own lineage
    // (which Spark flags as an ambiguous self-join reference).
    val all = Window.partitionBy()
    stats
      .withColumn("__tot", sum(col("__tok")).over(all)) // long: exact in any order
      .withColumn(
        "__qi",
        floor(pow(col("__tok").cast("double") / col("__tot").cast("double"), alpha) * grid).cast("long"))
      .withColumn("__sq", sum(col("__qi")).over(all)) // long again: exact
      .select(
        col(groupCol),
        least(
          lit(1.0),
          lit(targetFraction) * (col("__qi").cast("double") / col("__sq").cast("double")) *
            (col("__tot").cast("double") / col("__tok").cast("double"))).as("rate"))
  }

  /** Filter `df` to the temperature-rebalanced mixture: every row keeps
    * with its group's [[temperatureRates]] rate via the salted-hash draw —
    * deterministic, partitioning-invariant, engine-replayable. Two passes
    * over the corpus total (the rates aggregation, then the map-side keep
    * filter against the broadcast groups-sized rates dim) — the minimum
    * for rates computed FROM the data. Rows with a null group drop (they
    * have no share to draw against).
    */
  def temperatureMixture(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokensCol: String,
      alpha: Double,
      targetFraction: Double,
      salt: String = "mixT"): DataFrame =
    applyMixtureRates(
      df, idCol, groupCol,
      temperatureRates(df, groupCol, tokensCol, alpha, targetFraction), salt)

  /** Apply a precomputed per-group `rate` dim (groupCol, rate ∈ [0,1]) to
    * `df` via the deterministic salted-hash draw — the second half of
    * [[temperatureMixture]], split out because it is STATELESS: the rates
    * broadcast and every keep decision is per-row, so the same call
    * filters a STREAMING DataFrame (rates from yesterday's corpus
    * snapshot gating today's arrivals — see
    * [[graft.streaming.StreamingOps.mixtureStream]]). Rows whose group is
    * absent from `rates` drop (no share to draw against).
    */
  def applyMixtureRates(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: DataFrame,
      salt: String = "mixT"): DataFrame =
    df.join(broadcast(rates), Seq(groupCol))
      // rate == 1.0 keeps EVERY row (the clamped "ffffffff" threshold
      // alone would drop the one-in-2³² row hashing to the exact maximum)
      .filter(col("rate") >= 1.0 || hashKey(col(idCol), salt) < probThreshold(col("rate")))
      .drop("rate")

  /** A probability Column rendered as the 8-hex-digit string threshold
    * such that `hashKey < probThreshold(p)` keeps a p-fraction in
    * expectation — the per-row generalization of [[fractionThreshold]].
    * Clamped to 2³²−1: for p just below 1 the product ROUNDS to exactly
    * 2³², whose hex is 9 digits — lpad would truncate it to "10000000"
    * and keep ~6% instead of ~100%.
    */
  def probThreshold(probCol: Column): Column =
    lpad(lower(hex(least(floor(probCol * 4294967296.0).cast("long"), lit(4294967295L)))), 8, "0")

  /** Keep the top `frac` fraction of each group by `scoreCol`, EXACTLY —
    * the per-language/per-domain quality cut of a pretraining pipeline
    * ("keep the best 20% of every language by quality score"). Group g of
    * size n_g keeps its ceil(frac·n_g) highest rows under the total order
    * (score DESC, salted id-hash ASC) — the hash tiebreak makes the
    * boundary deterministic even when many rows share a score, so the
    * selection is partitioning-invariant and engine-replayable.
    *
    * Scale shape: the full corpus never shuffles. Only a THREE-column
    * projection (group, score, hash) moves: a per-group window ranks it,
    * row rank == ceil(frac·n_g) yields ONE boundary row per group, and
    * that groups-sized dim broadcasts back into a map-side keep filter
    * (score > boundary, or == with hash ≤ boundary's). Rows with a null
    * score or null group drop — they have no place in the order.
    */
  def topFractionPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: Column,
      idCol: String,
      frac: Double,
      salt: String = "topf"): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac $frac out of (0,1]")
    // No explicit isNotNull(score) filter: predicate pushdown would
    // substitute the alias and re-embed the (possibly expensive) score
    // expression into both scan filters. Nulls drop anyway — DESC NULLS
    // LAST ranks them past every valid row, count(__sc) skips them when
    // sizing the group (so the boundary rank never lands on one), and the
    // final three-way comparison is null for them.
    val scored = df
      .withColumn("__sc", scoreCol)
      .withColumn("__hk", hashKey(col(idCol), salt))
    val proj = scored.select(col(groupCol), col("__sc"), col("__hk"))
    val w = Window.partitionBy(groupCol).orderBy(col("__sc").desc, col("__hk").asc)
    val wAll = Window.partitionBy(groupCol)
    val boundary = proj
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(col("__sc")).over(wAll))
      .filter(col("__rn") === ceil(lit(frac) * col("__n")).cast("int"))
      .select(col(groupCol), col("__sc").as("__bs"), col("__hk").as("__bh"))
    scored
      .join(broadcast(boundary), Seq(groupCol))
      .filter(col("__sc") > col("__bs") ||
        (col("__sc") === col("__bs") && col("__hk") <= col("__bh")))
      .select(df.columns.map(col).toIndexedSeq: _*) // input column order back
  }

  /** Exact k rows per stratum, chosen by hash order — a deterministic
    * stratified sample whose members never change with partitioning. Rides
    * [[TopK.perKey]]: bounded per-partition heaps, shuffle ≤ partitions·k
    * rows per stratum — never a full per-stratum sort.
    *
    * @return input columns plus `rank` (1..k within the stratum)
    */
  def stratified(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      k: Int,
      salt: String = "strat"): DataFrame =
    TopK.perKey(
      df.withColumn("__h", hashKey(col(idCol), salt)),
      strataCols, "__h", idCol, k)
      .drop("__h")

  /** Equal-n class balancing: every class downsampled to the SMALLEST
    * class's size — the classifier-training balancer (a 99:1 skewed label
    * column otherwise trains a majority-class predictor). Members are
    * chosen by salted-hash order via [[stratified]], so the balanced set
    * is deterministic, id-stable and partitioning-invariant; null classes
    * drop. The min-class size is one tiny driver aggregate (the ANN
    * dim-probe discipline) — the selection itself stays bounded-heap
    * distributed, never a per-class sort.
    */
  def balanceClasses(
      df: DataFrame,
      classCol: String,
      idCol: String,
      salt: String = "bal"): DataFrame = {
    val present = df.filter(col(classCol).isNotNull)
    val kRow = present.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n"))).head
    // no non-null classes at all: the balanced set is empty, not a crash
    if (kRow.isNullAt(0))
      return present.withColumn("rank", lit(0)).limit(0)
    val kMin = kRow.getLong(0)
    require(kMin <= Int.MaxValue, s"min class size $kMin exceeds Int range")
    stratified(present, Seq(classCol), idCol, kMin.toInt, salt)
  }

  /** Epoch-repeat mixture materialization: size every group to its share
    * of a TOKEN budget by REPEATING its documents — the pretraining
    * mixture shape the keep-rate ops cannot express ([[temperatureRates]]
    * clamps at 1.0 and only discards; real mixtures also run low-resource
    * sources for MULTIPLE epochs).
    *
    * Group g with integer weight w_g (of weight-sum W) is budgeted
    * B·w_g/W tokens; holding t_g tokens, its repeat factor is
    * r_g = B·w_g / (W·t_g). Every row of g materializes floor(r_g) full
    * copies plus one extra copy kept with the fractional-part probability
    * via the salted-hash draw — deterministic, id-stable under corpus
    * growth, partitioning-invariant. r_g < 1 degenerates to a plain
    * downsample (0 full copies, keep-with-probability r_g). Output rows
    * carry an `epoch` column (1-based). Groups absent from `weights` and
    * null-group rows drop (no budget share); a group with w_g but no rows
    * contributes nothing.
    *
    * Cross-engine determinism: B·w_g and W·t_g stay in LONG space (exact
    * products of exact sums, overflow-guarded in-plan), the full-copy
    * count is LONG integer division, and the fractional part is ONE IEEE
    * double division of those two longs — exactly rounded, so the draw
    * threshold replays bit-for-bit in any IEEE/md5 engine.
    *
    * Scale shape: the rates dim is groups-sized, computed in one
    * partial-agg shuffle over a two-column (group, tokens) projection,
    * and broadcast back; the repeat itself is a map-side
    * explode(sequence(1, n)) — the corpus never shuffles and cost is
    * proportional to OUTPUT size, the floor for an op that writes r_g
    * copies of everything.
    */
  def epochRepeat(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokenCol: Column,
      weights: Map[String, Long],
      budgetTokens: Long,
      salt: String = "epoch"): DataFrame =
    applyEpochRates(df, idCol, groupCol,
      epochRates(df, groupCol, tokenCol, weights, budgetTokens), salt)

  /** The groups-sized repeat-factor dim behind [[epochRepeat]]:
    * (group, n_full, frac) with r_g = n_full + frac. Public so a stream
    * can snapshot the rates from a static corpus and apply them row-by-row
    * ([[graft.streaming.StreamingOps]]) — the same static-rates split
    * [[temperatureRates]] has.
    */
  def epochRates(
      df: DataFrame,
      groupCol: String,
      tokenCol: Column,
      weights: Map[String, Long],
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be non-empty and positive")
    val wSum = weights.values.sum
    require(
      weights.values.forall(w => w <= Long.MaxValue / budgetTokens),
      s"budgetTokens·weight overflows long at budget $budgetTokens")
    val dim = df.sparkSession
      .createDataFrame(weights.toSeq.sortBy(_._1))
      .toDF(groupCol, "__w")
    val totals = df
      .filter(col(groupCol).isNotNull)
      .groupBy(groupCol)
      .agg(sum(tokenCol.cast("long")).as("__tok"))
      .filter(col("__tok") > 0)
    // W·t_g can overflow for extreme weight-sums; the group count is
    // unknown driver-side, so the guard rides the groups-sized plan
    // (raise_error participates in codegen, costs one compare per GROUP).
    val maxTok = Long.MaxValue / wSum
    totals
      .join(broadcast(dim), Seq(groupCol))
      .withColumn(
        "__den",
        when(col("__tok") <= maxTok, col("__tok") * wSum)
          .otherwise(raise_error(format_string(
            s"epochRepeat: group %s token total %d overflows at weight-sum $wSum",
            col(groupCol), col("__tok"))).cast("long")))
      .withColumn("__num", col("__w") * budgetTokens)
      .select(
        col(groupCol),
        expr("__num div __den").as("n_full"),
        (pmod(col("__num"), col("__den")).cast("double") /
          col("__den").cast("double")).as("frac"))
  }

  /** Per-group PERCENTILE calibration of a score — the comparability step
    * before any cross-group cut: a raw quality score means different things
    * in different languages/domains (stopword ratios run lower in zh than
    * en), so global thresholds over raw scores silently bias the mixture.
    * Calibrated, every row carries its group-relative standing
    * `pct = n_less / (n - 1)` — the fraction of the group's scored rows
    * strictly below it (percent_rank semantics: ties share the value,
    * single-row groups get 0.0) — and one global threshold means the same
    * thing in every group.
    *
    * Scale shape: the corpus itself NEVER shuffles. Ranks depend only on a
    * row's (group, score), so the op aggregates counts per distinct
    * (group, score) — a two-column-projection partial-agg shuffle — ranks
    * that score-level dim with a cumulative window, and broadcasts it back
    * into a map-side join. The dim is (group × distinct scores)-sized:
    * bounded-cardinality scores (integer-ratio doubles, grid-floored
    * values — every score this library produces) keep it broadcastable at
    * any corpus size; for a genuinely continuous score, floor it onto a
    * grid first (the [[temperatureRates]] discipline) — stated loudly
    * because a high-cardinality score degrades the dim toward corpus size.
    *
    * Cross-engine determinism: `n_less` and `n` are exact longs; the one
    * division is IEEE on exactly-representable integers — bit-replayable.
    * Rows with a null group or score drop (they have no standing to
    * report).
    *
    * @return input columns plus `pct` (double in [0,1])
    */
  /** Curriculum staging (Bengio et al. 2009 applied to corpus ordering):
    * rank every document by an exact integer DIFFICULTY score and cut the
    * ascending order into `stages` equal-count stages — train on stage 0
    * first, widen as training progresses. The stage is computed from the
    * exact cumulative histogram (`stage = ((#{≤ d} − 1) · S) div n` — the
    * ecdfNormalize discipline: no global sort, no window over corpus
    * rows; ties share their difficulty block's closing rank, so equal
    * difficulty can never straddle a stage boundary in a
    * partition-dependent way).
    *
    * Scale shape: one histogram aggregate over DISTINCT difficulty
    * values, a cumulative window over that (value-cardinality-sized)
    * table, then a broadcast map-side join back — two scans of the
    * column, zero corpus shuffles.
    */
  def curriculumStages(
      df: DataFrame,
      idCol: String,
      difficulty: Column,
      stages: Int): DataFrame = {
    require(stages >= 2, s"need at least two stages, got $stages")
    val pts = df
      .select(col(idCol), difficulty.cast("long").as("difficulty"))
      .filter(col("difficulty").isNotNull)
    val cumW = Window.orderBy("difficulty")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = pts.groupBy(col("difficulty")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
      .withColumn("__cum", sum(col("__c")).over(cumW))
    val n = cum.agg(sum(col("__c")).as("__n"))
    pts
      .join(broadcast(cum.select(col("difficulty"), col("__cum"))), Seq("difficulty"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("difficulty"),
        expr(s"CAST(((__cum - 1) * $stages) DIV __n AS INT)").as("stage"))
  }

  def calibrateByGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: Column): DataFrame = {
    // the join back keys on the score VALUE: double equality is exact and
    // deterministic here because scores arrive as computed doubles (no NaN
    // — callers guard 0/0; -0.0 only from a -0.0-producing score, which
    // ratio/grid scores never emit)
    val scored = df
      .withColumn("__sc", scoreCol)
      .filter(col(groupCol).isNotNull && col("__sc").isNotNull)
    val counts = scored
      .groupBy(col(groupCol), col("__sc"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(groupCol).orderBy(col("__sc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(groupCol)
    val dim = counts
      .withColumn("__less", coalesce(sum(col("__c")).over(wCum), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .select(
        col(groupCol), col("__sc"),
        when(col("__n") === 1L, lit(0.0))
          .otherwise(col("__less").cast("double") / (col("__n") - 1L).cast("double"))
          .as("pct"))
    scored
      .join(broadcast(dim), Seq(groupCol, "__sc"))
      .drop("__sc")
  }

  /** Stateless half of [[epochRepeat]]: broadcast a (group, n_full, frac)
    * rates dim and fan every row out to its epoch copies — per-row draw,
    * no aggregation, so it runs unchanged on a STREAM under snapshot
    * rates.
    */
  def applyEpochRates(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: DataFrame,
      salt: String = "epoch"): DataFrame =
    df.join(broadcast(rates), Seq(groupCol))
      .withColumn(
        "__n",
        col("n_full") + when(
          hashKey(col(idCol), salt) < probThreshold(col("frac")), 1L).otherwise(0L))
      .filter(col("__n") >= 1L)
      // sequence() with start > stop counts DOWN — the n==0 guard above is
      // load-bearing, not cosmetic
      .withColumn("epoch", explode(sequence(lit(1), col("__n").cast("int"))))
      .drop("n_full", "frac", "__n")

  /** Token-budget quota fill — the deterministic data-mixing cut: each
    * group (source/domain) contributes its best rows, in `scoreCol`-desc
    * order, until that group's token quota is exhausted; the first row
    * that would OVERSHOOT the quota is excluded (strict prefix — budgets
    * are ceilings, not targets). The greedy prefix is exactly a running
    * sum ≤ quota under the (score desc, id asc) total order, so unlike
    * true bin packing it IS window-expressible: one shuffle per key, no
    * iteration, deterministic under any partitioning.
    *
    * Scale shape: one groupCol-keyed window (the quota table broadcasts);
    * at 100 TB the cumulative sum streams per partition — no per-key
    * state beyond the running long. Rows from groups absent in `quotas`
    * are dropped (an explicit mixing recipe lists every source it wants).
    *
    * @param quotas (group value, token ceiling) pairs — the mixing recipe
    * @return admitted rows: input columns + `cum_cost` (tokens through
    *         and including this row)
    */
  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — public method):
    * score every document by how much its HASHED-unigram profile looks
    * like a target domain rather than the raw corpus, then keep the top
    * `topK`. The classic data-selection move when the target domain is
    * small (curated wiki, code, a language) and the raw corpus is 100 TB
    * of crawl.
    *
    * Features are md5-derived token buckets (cross-engine-replayable, the
    * fixed-vocab hashing trick that makes the estimator corpus-size-free);
    * per bucket the log-likelihood ratio
    * `λ_b = ⌊2²⁰·ln( ((ct_b+1)·(Nr+B)) / ((cr_b+1)·(Nt+B)) )⌋`
    * (add-one smoothing, one grid-floored ln per BUCKET — 64 libm calls
    * total, the WOE discipline), and each doc's importance is the exact
    * integer `Σ_b c_b(doc)·λ_b`. Deterministic top-k by (importance desc,
    * id) — resampling replaced by rank selection, the reproducible-cut
    * variant.
    *
    * Scale shape: one tokenize+explode pass aggregated to (doc, bucket)
    * counts (map-side combine: ≤ B rows per doc survive), two B-sized
    * bucket profiles, a BROADCAST λ join (B rows), one doc-keyed sum and
    * a bounded top-k. The corpus text never shuffles; nothing row-scale
    * moves twice.
    *
    * @param isTarget row predicate marking the target-domain exemplars
    * @return (idCol, n_tokens, imp_grid, rank) — rank 1..topK
    */
  def dsirSelect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 64,
      topK: Int = 50): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol), isTarget.as("__tgt"),
        explode(TextOps.tokens(col(textCol))).as("__w"))
      .select(col(idCol), col("__tgt"),
        (conv(substring(md5(col("__w")), 1, 4), 16, 10).cast("long")
          % buckets).as("__b"))
    val docBucket = toks.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"), first(col("__tgt")).as("__tgt"))
      .localCheckpoint(true)
    val raw = docBucket.groupBy("__b").agg(sum(col("__c")).as("__cr"))
    val tgt = docBucket.filter(col("__tgt"))
      .groupBy("__b").agg(sum(col("__c")).as("__ct"))
    val tots = docBucket.agg(
      sum(col("__c")).as("__nr"),
      sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("__nt"))
    val lambda = raw
      .join(tgt, Seq("__b"), "left")
      .crossJoin(broadcast(tots))
      .select(col("__b"),
        floor(log(
          ((coalesce(col("__ct"), lit(0L)) + 1).cast("double") *
            (col("__nr") + buckets).cast("double")) /
            ((col("__cr") + 1).cast("double") *
              (col("__nt") + buckets).cast("double")))
          * lit(1048576.0)).cast("long").as("__lam"))
    val scored = docBucket
      .join(broadcast(lambda), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * col("__lam")).as("imp_grid"))
    // sort+limit compiles to TakeOrderedAndProject (per-partition heaps,
    // driver merges topK) — the single-partition rank window only ever
    // sees the topK survivors
    val top = scored.orderBy(col("imp_grid").desc, col(idCol).asc).limit(topK)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("imp_grid").desc, col(idCol).asc)))
  }

  def budgetFill(
      df: DataFrame,
      groupCol: String,
      costCol: Column,
      scoreCol: Column,
      idCol: String,
      quotas: Seq[(String, Long)]): DataFrame = {
    require(quotas.nonEmpty, "need at least one (group, quota) pair")
    require(quotas.forall(_._2 >= 0), s"quotas must be >= 0: $quotas")
    val spark = df.sparkSession
    import spark.implicits._
    val q = broadcast(quotas.toDF(groupCol, "__quota"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__sc").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__sc", scoreCol)
      .withColumn("__cost", costCol.cast("long"))
      .join(q, groupCol)
      .withColumn("cum_cost", sum(col("__cost")).over(w))
      .filter(col("cum_cost") <= col("__quota"))
      .select(df.columns.map(col).toIndexedSeq :+ col("cum_cost"): _*)
  }

  /** Neyman optimal allocation (Neyman 1934 — the textbook answer to
    * "how many samples per stratum": `n_h ∝ N_h·σ_h`, which minimizes
    * the estimator variance at a fixed total budget; proportional
    * allocation over-samples homogeneous strata). The per-stratum weight
    * `N_h·σ_h = √(N_h·Σx² − (Σx)²)` comes straight off the exact-long
    * sufficient statistics — the variance numerator is assembled in
    * DECIMAL(38,0) (the eval_pass_at_k discipline), because with cent
    * values up to ~10⁶ the long product `N_h·Σx²` overflows Int64 past
    * ~30 k rows/stratum and Spark would wrap SILENTLY under non-ANSI
    * arithmetic (one IEEE sqrt on the exact value, floored onto the 2²⁰
    * grid) —
    * and the integer allocation is exact LARGEST-REMAINDER rounding: base
    * shares by integer division, the `budget − Σbase` leftover units go
    * to the largest remainders (ties to the smaller stratum name) — so
    * `Σ alloc = budget` EXACTLY, deterministically, engine-replayable.
    *
    * Scale shape: one sufficient-statistics aggregate over the corpus;
    * everything after is strata-sized (the ordering window runs over
    * #strata rows — the bounded-window contract).
    */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: String,
      value: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val stats = df
      .filter(value.isNotNull)
      .select(col(stratumCol).as("stratum"), value.cast("long").as("__x"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_stratum"), sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__s2"))
      .select(col("stratum"), col("n_stratum"),
        // DECIMAL(38,0) sufficient-statistics product: exact up to 10^38,
        // vs Int64's 9.2e18 which n*Σx² exceeds at ~30k cent-valued rows
        floor(sqrt(expr(
          """(CAST(n_stratum AS DECIMAL(38,0)) * __s2
            | - CAST(__s AS DECIMAL(38,0)) * __s)""".stripMargin)
          .cast("double")) * 1048576.0).cast("long").as("w_grid"))
      // strata-sized, but its lineage is the corpus aggregate and THREE
      // consumers follow (totals, bases, spare) — pin one evaluation or
      // the sufficient-statistics scan runs three times (plan-audited)
      .localCheckpoint(true)
    val tot = stats.agg(sum(col("w_grid")).as("__wt"),
      count(lit(1)).as("__k"))
    val based = stats.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_stratum"), col("w_grid"),
        expr(s"($budget * w_grid) DIV __wt").as("__base"),
        expr(s"($budget * w_grid) % __wt").as("__rem"))
      .localCheckpoint(true)
    val spare = based.agg((lit(budget) - sum(col("__base"))).as("__spare"))
    val w = Window.orderBy(col("__rem").desc, col("stratum").asc)
    based.crossJoin(broadcast(spare))
      .withColumn("__rk", row_number().over(w))
      .select(col("stratum"), col("n_stratum"), col("w_grid"),
        (col("__base") + when(col("__rk") <= col("__spare"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Systematic sampling (the survey-methods classic: sort by a key, take
    * every k-th element from a fixed start — one pass, exact 1/k rate,
    * and when the sort key is uncorrelated with the measure it behaves
    * like SRS while guaranteeing even coverage of the key range, which
    * Bernoulli draws do not). Returns the selected rows plus their
    * 1-based `rank` in key order; rows whose `(rank − 1) mod k == offset`
    * survive.
    *
    * Deterministic BY KEY, not by partitioning: the rank is the
    * distributed range-partitioned prefix sum ([[graft.ops.Ranks]] — the
    * kernel every ECDF/quantile consumer shares), never a single-task
    * global window, so the same inputs select the same rows at any
    * parallelism and any scale. `keyCol` must be unique (the Ranks
    * contract); one range shuffle total.
    */
  def systematicSample(
      df: DataFrame,
      keyCol: String,
      k: Int,
      offset: Int = 0): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(offset >= 0 && offset < k, s"need 0 <= offset < $k, got $offset")
    Ranks.runningSum(df.withColumn("__one", lit(1L)), keyCol, "__one", "rank")
      .drop("__one")
      .filter(pmod(col("rank") - 1, lit(k.toLong)) === offset)
  }
}
