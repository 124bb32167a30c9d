package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation over a scored corpus: the "did the distilled
  * quality filter actually work" step that closes every classifier loop in
  * an LLM data pipeline — score a held-out labeled slice ([[Inference]]),
  * then measure ranking power (ROC AUC), operating-point quality
  * (confusion matrix, precision/recall curve), probability honesty
  * (calibration bins) and targeting efficiency (lift/gains by decile).
  *
  * Exactness discipline (the [[Inference]] / corr_exact contract): every
  * metric is assembled from EXACT integer counts — true/false positive
  * tallies, tie-group sizes, rank sums — combined by ONE fixed-order
  * double division at the end. No mean-of-double ever enters a hash-gated
  * output (IEEE addition is order-dependent across partitionings); rank
  * arithmetic is carried ×2-scaled so tie mid-ranks stay integral.
  *
  * Scale shape: the corpus is touched once per metric and immediately
  * collapses to metric-sized state — a distinct-score histogram (AUC), a
  * handful of conditional sums (confusion, PR curve), a bin table
  * (calibration), or a bucket table (lift). The only total order ever
  * materialized is over the HISTOGRAM/buckets via the distributed
  * prefix-sum pattern ([[Ranking.abcClassify]]): range-repartition,
  * per-partition subtotals, broadcast offsets — no single-reducer sort.
  *
  * No reference analog — pipeline-extension layer.
  */
object Eval {

  /** Exact tie-corrected ROC AUC (Mann–Whitney form) of `scoreCol` as a
    * ranker for binary `labelCol` (1 = positive; higher score must mean
    * "more positive"). Ties contribute ½ — the mid-rank convention.
    *
    * One row: `(n_pos, n_neg, auc_num2, auc)` where
    * `auc = auc_num2 / (2·n_pos·n_neg)` and
    * `auc_num2 = 2·Σ_pos midrank − n_pos·(n_pos+1)` is an EXACT integer
    * (mid-ranks are half-integers, so the ×2 ledger never rounds): the
    * one division is the only double op, bit-replayable anywhere. Null
    * scores/labels are excluded; degenerate single-class inputs yield a
    * null `auc` (the numerator is still reported).
    *
    * Scale: corpus → per-score `(count, positives)` partial-agg histogram;
    * the below-count prefix sum runs distributed over that histogram
    * (range-repartition + broadcast offsets, no global window); the final
    * fold is one 1-row aggregate. Total motion beyond the histogram
    * shuffle is histogram-sized.
    */
  def aucExact(scored: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val hist = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__c"), sum(col(labelCol).cast("long")).as("__p"))
      .repartitionByRange(col("__s").asc)
      .sortWithinPartitions(col("__s").asc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offs = hist.groupBy(col("__pid")).agg(sum(col("__c")).as("__ps"))
      .withColumn("__off",
        coalesce(
          sum(col("__ps")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    val wIn = Window.partitionBy("__pid").orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .join(broadcast(offs), Seq("__pid"))
      // rows strictly below this score group = partition offset + partial
      .withColumn("__below", col("__off") + coalesce(sum(col("__c")).over(wIn), lit(0L)))
    ranked
      .agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__c") - col("__p")).as("n_neg"),
        // 2·Σ_pos midrank = Σ_s p_s · (2·below_s + c_s + 1)
        sum(col("__p") * (col("__below") * 2 + col("__c") + 1)).as("__r2"))
      .select(
        col("n_pos"), col("n_neg"),
        (col("__r2") - col("n_pos") * (col("n_pos") + 1)).as("auc_num2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("auc_num2").cast("double") / (col("n_pos") * col("n_neg") * 2))
          .otherwise(lit(null).cast("double")))
  }

  /** Confusion matrix + summary metrics of integer `predCol` (0/1) against
    * integer `labelCol` (0/1): one row `(tp, fp, fn, tn, acc, prec, rec,
    * f1)`. One aggregate pass — four conditional sums — then single
    * divisions; rows with a null label or prediction are excluded (they
    * are REPORTED by [[Checks]], not silently classified). Empty classes
    * yield null metrics, never division blow-ups.
    */
  def confusion(scored: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val l = col(labelCol).cast("long")
    val p = col(predCol).cast("long")
    val cell = (lv: Int, pv: Int) =>
      sum(when(l === lv && p === pv, 1L).otherwise(0L))
    scored
      .filter(l.isNotNull && p.isNotNull)
      .agg(
        cell(1, 1).as("tp"), cell(0, 1).as("fp"),
        cell(1, 0).as("fn"), cell(0, 0).as("tn"))
      .withColumn("acc",
        when(col("tp") + col("fp") + col("fn") + col("tn") > 0,
          (col("tp") + col("tn")).cast("double") /
            (col("tp") + col("fp") + col("fn") + col("tn")))
          .otherwise(lit(null).cast("double")))
      .withColumn("prec",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")))
          .otherwise(lit(null).cast("double")))
      .withColumn("rec",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")))
          .otherwise(lit(null).cast("double")))
      .withColumn("f1",
        when(col("tp") * 2 + col("fp") + col("fn") > 0,
          (col("tp") * 2).cast("double") / (col("tp") * 2 + col("fp") + col("fn")))
          .otherwise(lit(null).cast("double")))
  }

  /** Precision/recall curve at FIXED score thresholds (predict positive ⇔
    * `score ≥ t`): one row per threshold `(thr, n_pred_pos, tp, prec,
    * rec)`. The whole curve is ONE aggregate pass — 2·|thresholds|
    * conditional sums (the [[Bootstrap]] replicate-column discipline) —
    * exploded into rows afterwards; the corpus is scanned once and never
    * shuffled. Thresholds are caller-fixed (a grid over the score's
    * range), so the curve is replayable without any data-dependent cut
    * selection.
    */
  def prCurve(
      scored: DataFrame,
      labelCol: String,
      scoreCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "prCurve needs at least one threshold")
    val l = col(labelCol).cast("long")
    val s = col(scoreCol)
    val base = scored.filter(s.isNotNull && l.isNotNull)
    val sums = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(s >= t, 1L).otherwise(0L)).as(s"__pp$i"),
        sum(when(s >= t && l === 1L, 1L).otherwise(0L)).as(s"__tp$i"))
    }
    val pos = sum(when(l === 1L, 1L).otherwise(0L)).as("__pos")
    val one = base.agg(sums.head, (sums.tail :+ pos): _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("thr"), col(s"__pp$i").as("n_pred_pos"),
        col(s"__tp$i").as("tp"), col("__pos").as("__pos"))
    }
    one
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.thr"), col("r.n_pred_pos"), col("r.tp"),
        when(col("r.n_pred_pos") > 0,
          col("r.tp").cast("double") / col("r.n_pred_pos"))
          .otherwise(lit(null).cast("double")).as("prec"),
        when(col("r.__pos") > 0,
          col("r.tp").cast("double") / col("r.__pos"))
          .otherwise(lit(null).cast("double")).as("rec"))
  }

  /** Reliability (calibration) bins over the raw score: bin k covers
    * `[k·binWidth, (k+1)·binWidth)`, output `(bin, bin_lo, n, n_pos,
    * pos_rate)`. Binning is `floor(score / binWidth)` with a caller-chosen
    * DYADIC width (0.5, 0.25 …) so the edge arithmetic is exact in binary
    * and every engine buckets identically; `pos_rate` is the single
    * integer division. One partial-agg groupBy — bins-sized output. The
    * deliberate omission: no mean-score-per-bin column, because a double
    * sum's value depends on addition order and would break cross-engine
    * replay — `bin_lo` states the bin location exactly instead.
    */
  def calibration(
      scored: DataFrame,
      labelCol: String,
      scoreCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = col(labelCol).cast("long")
    scored
      .filter(col(scoreCol).isNotNull && l.isNotNull)
      .groupBy(floor(col(scoreCol) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(l).as("n_pos"))
      .withColumn("bin_lo", col("bin") * binWidth)
      .withColumn("pos_rate", col("n_pos").cast("double") / col("n"))
      .select("bin", "bin_lo", "n", "n_pos", "pos_rate")
  }

  /** Expected Calibration Error over grid forecasts — the single number
    * the [[calibration]] table rolls up to: with forecasts as integers
    * `p_num ∈ [0, scale)` and `bins` equal grid ranges,
    * `ECE = Σ_k (n_k/N)·|acc_k − conf̄_k| = Σ_k |scale·n_pos_k − Σp_num_k|
    * / (N·scale)` — the per-bin weights cancel into ONE exact integer
    * numerator (`ece_num`, a sum of longs) and ONE closing double
    * division. No per-bin float averages anywhere, so the number is
    * partitioning- and engine-invariant.
    *
    * Scale shape: one partial-agg'd bins groupBy + a bins-sized rollup.
    *
    * @param probNum integer forecast column on the `[0, scale)` grid
    *                (caller grids: `floor(p·scale)` clamped below scale)
    * @return one row: (n_rows, n_bins, ece_num, ece)
    */
  def ece(
      scored: DataFrame,
      labelCol: String,
      probNum: Column,
      scale: Long,
      bins: Int): DataFrame = {
    require(bins >= 1 && scale % bins == 0, s"bins must divide scale, got $bins/$scale")
    val w = scale / bins
    val y = col(labelCol).cast("long")
    scored
      .filter(probNum.isNotNull && y.isNotNull)
      .select(y.as("__y"), probNum.cast("long").as("__pn"))
      .groupBy(expr(s"__pn DIV $w").as("__bin"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"),
        sum(col("__pn")).as("__conf"))
      .agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_bins"),
        sum(abs(lit(scale) * col("__np") - col("__conf"))).as("ece_num"))
      .withColumn("ece",
        col("ece_num").cast("double") / (col("n_rows").cast("double") * scale))
  }

  /** Cumulative gains / lift by score bucket: rank the corpus by `(score
    * desc, tiebreakCol asc)`, cut into `buckets` equal-width rank slices
    * (`bucket = floor((rank−1)·buckets / N)` — the row_number form, NOT
    * SQL ntile's first-buckets-get-the-remainder rule, so the definition
    * replays from arithmetic alone), and report per bucket: size,
    * positives, cumulative positives, capture (share of all positives
    * found so far) and lift (bucket precision over base rate) — each ONE
    * integer-ratio division. The "how deep must the filter dig" report
    * that decides a quality-threshold operating point.
    *
    * Scale: the global rank is the distributed prefix-sum pattern over the
    * CORPUS ordering ([[Ranking.abcClassify]]): range-repartition on the
    * sort key, partition-local row counts, broadcast running offsets —
    * rank = offset + local row_number, no single-reducer sort. Everything
    * after the rank is a buckets-sized aggregate.
    */
  def liftByBucket(
      scored: DataFrame,
      labelCol: String,
      scoreCol: String,
      tiebreakCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val ordered = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(tiebreakCol), col(scoreCol).as("__s"),
        col(labelCol).cast("long").as("__l"))
      .repartitionByRange(col("__s").desc, col(tiebreakCol).asc)
      .sortWithinPartitions(col("__s").desc, col(tiebreakCol).asc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parts = ordered.groupBy(col("__pid")).agg(count(lit(1)).as("__pc"))
    val offs = parts
      .withColumn("__off",
        coalesce(
          sum(col("__pc")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    val total = parts.agg(sum(col("__pc")).as("__tot"))
    val wIn = Window.partitionBy("__pid")
      .orderBy(col("__s").desc, col(tiebreakCol).asc)
    val perBucket = ordered
      .join(broadcast(offs), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn("__rank", col("__off") + row_number().over(wIn))
      // integer DIV: Column `/` is double division (the quantile_select
      // lesson) — DIV keeps the bucket id exact at any N
      .withColumn("__num", (col("__rank") - 1) * buckets)
      .groupBy(expr("__num DIV __tot").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__l")).as("n_pos"))
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    perBucket
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("__tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("__tot_n", sum(col("n")).over(wAll))
      .withColumn("capture",
        when(col("__tot_pos") > 0,
          col("cum_pos").cast("double") / col("__tot_pos"))
          .otherwise(lit(null).cast("double")))
      .withColumn("lift",
        when(col("__tot_pos") > 0 && col("n") > 0,
          (col("n_pos") * col("__tot_n")).cast("double")
            / (col("n") * col("__tot_pos")))
          .otherwise(lit(null).cast("double")))
      .select("bucket", "n", "n_pos", "cum_pos", "capture", "lift")
  }

  /** Retrieval quality of an approximate top-k list against an exact
    * ground-truth top-k list (both `(query, item, rank)` with rank 1..k):
    * per query, `n_hit` (overlap with the truth set), `recall@k`
    * (`n_hit / k`, the single division), the system rank of the TRUE
    * nearest neighbour (`nn_rank`, null when the approximate list missed
    * it), and `rr_num` — the reciprocal rank carried on the exact
    * `lcm(1..k)` integer grid (`lcm DIV nn_rank`; every rank divides the
    * grid, so the value is an exact integer and `MRR = Σ rr_num /
    * (lcm·|Q|)` needs no order-dependent double sum anywhere).
    *
    * The ANN acceptance gate: run the quantized/bucketed path against a
    * brute-force sample and decide whether its recall clears the bar.
    *
    * Scale: both inputs are (|Q|·k)-sized — the expensive part is
    * PRODUCING them ([[Similarity]]); this op is one equi-join on
    * `(query, item)` plus a per-query partial agg. Rank columns beyond k
    * are rejected loudly rather than silently truncated.
    */
  def retrievalMetrics(
      truth: DataFrame,
      system: DataFrame,
      queryCol: String,
      itemCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 40, s"need 1 <= k <= 40 (lcm fits a long), got $k")
    val grid = (1 to k).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    // in-plan guard (the int8TopK discipline): a rank outside 1..k means
    // the caller's lists disagree with `k` — fail loudly, don't mis-score
    def ranked(c: org.apache.spark.sql.Column) =
      when(c < 1 || c > k,
        raise_error(concat(lit(s"rank outside 1..$k: "), c.cast("string"))))
        .otherwise(c)
    val t = truth.select(col(queryCol).as("q"), col(itemCol).as("item"),
      ranked(col(rankCol).cast("int")).as("trank"))
    val s = system.select(col(queryCol).as("q"), col(itemCol).as("item"),
      ranked(col(rankCol).cast("int")).as("srank"))
    t.join(s, Seq("q", "item"), "left")
      .groupBy("q")
      .agg(
        sum(when(col("srank").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        min(when(col("trank") === 1, col("srank"))).as("nn_rank"))
      .select(
        col("q").as(queryCol), col("n_hit"),
        (col("n_hit").cast("double") / k).as("recall"),
        col("nn_rank"),
        // grid is divisible by every rank 1..k — the quotient is exact
        coalesce((lit(grid) / col("nn_rank")).cast("long"), lit(0L)).as("rr_num"))
  }

  /** nDCG@k of a system top-k list against an exact ground-truth top-k
    * list (both `(query, item, rank)`, rank 1..k) — the graded,
    * position-discounted companion to [[retrievalMetrics]]: a system that
    * finds all k items but inverts their order keeps recall = 1 and loses
    * nDCG. Relevance is the standard rank-derived grade `rel = k+1 −
    * truth_rank`; the discount is the classic `1/log2(r+1)`.
    *
    * Exactness: the irrational discounts are carried as the INTEGER table
    * `W(r) = ⌊2²⁰ / log2(r+1)⌋`, frozen at plan build (spec-pinned
    * literals, so both engines fold the same constants — no cross-libm
    * floor anywhere in the data path). Per query `dcg_num = Σ_matched
    * rel·W(system_rank)` and `idcg_num = Σ_truth rel·W(truth_rank)` (the
    * ideal order IS truth-rank order, rel being monotone in it) are exact
    * longs; `ndcg_ppm = 10⁶·dcg_num DIV idcg_num` is the single division.
    *
    * Scale: one `(query, item)` equi-join of two (|Q|·k)-sized lists and
    * a per-query partial agg — nothing corpus-sized.
    */
  def ndcg(
      truth: DataFrame,
      system: DataFrame,
      queryCol: String,
      itemCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 63, s"need 1 <= k <= 63, got $k")
    val weights = ndcgWeights(k)
    def ranked(c: org.apache.spark.sql.Column) =
      when(c < 1 || c > k,
        raise_error(concat(lit(s"rank outside 1..$k: "), c.cast("string"))))
        .otherwise(c)
    val t = truth.select(col(queryCol).as("q"), col(itemCol).as("item"),
      ranked(col(rankCol).cast("int")).as("trank"))
    val s = system.select(col(queryCol).as("q"), col(itemCol).as("item"),
      ranked(col(rankCol).cast("int")).as("srank"))
    val rel = (lit(k + 1) - col("trank")).cast("long")
    t.join(s, Seq("q", "item"), "left")
      .groupBy("q")
      .agg(
        sum(when(col("srank").isNotNull,
          rel * element_at(typedLit(weights), col("srank")))
          .otherwise(0L)).as("dcg_num"),
        sum(rel * element_at(typedLit(weights), col("trank"))).as("idcg_num"))
      .select(col("q").as(queryCol), col("dcg_num"), col("idcg_num"),
        expr("dcg_num * 1000000 DIV idcg_num").as("ndcg_ppm"))
  }

  /** `⌊2²⁰ / log2(r+1)⌋` for r = 1..k — plan-time constants; the k = 10
    * prefix is pinned literal-for-literal by the spec so the oracle's
    * hardcoded table provably matches.
    */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(r => (1048576.0 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** Rank-biased overlap (Webber et al.) at persistence p = 1/2 between a
    * ground-truth and a system top-k list — the rank-SIMILARITY companion
    * to [[retrievalMetrics]]: recall ignores order, RBO weights agreement
    * at the top exponentially more. `RBO@k = Σ_{d=1..k} overlap_d /
    * (2^d · d)` (truncated form, max `1 − 2^-k`).
    *
    * Exactness: p = 1/2 makes every geometric weight dyadic, so the whole
    * sum lives on the `2^k · lcm(1..k)` integer grid. A matched item
    * contributes to every depth `d ≥ m = max(truth rank, system rank)`;
    * its total contribution `W(m) = Σ_{d=m..k} 2^(k-d) · lcm/d` is a
    * k-entry integer lookup table folded into the plan. Per query:
    * `rbo_num = Σ W(m)` (exact long) and the single closing division.
    *
    * Scale: one `(query, item)` equi-join of two (|Q|·k)-sized lists and
    * a per-query partial agg — nothing corpus-sized.
    */
  def rankBiasedOverlap(
      truth: DataFrame,
      system: DataFrame,
      queryCol: String,
      itemCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"need 1 <= k <= 20 (2^k·lcm fits a long), got $k")
    val weights = rboWeights(k)
    val denom = (1L << k) * (1 to k).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    def ranked(c: org.apache.spark.sql.Column) =
      when(c < 1 || c > k,
        raise_error(concat(lit(s"rank outside 1..$k: "), c.cast("string"))))
        .otherwise(c)
    val t = truth.select(col(queryCol).as("q"), col(itemCol).as("item"),
      ranked(col(rankCol).cast("int")).as("trank"))
    val s = system.select(col(queryCol).as("q"), col(itemCol).as("item"),
      ranked(col(rankCol).cast("int")).as("srank"))
    t.join(s, Seq("q", "item"), "left")
      .groupBy("q")
      .agg(sum(when(col("srank").isNotNull,
        element_at(typedLit(weights), greatest(col("trank"), col("srank"))))
        .otherwise(0L)).as("rbo_num"))
      .select(col("q").as(queryCol), col("rbo_num"),
        (col("rbo_num").cast("double") / denom).as("rbo"))
  }

  /** Per-bin Brier decomposition (Murphy): forecasts `σ(score)` land on
    * the 2²⁰ probability grid (floored — the perplexity discipline keeps
    * the libm sigmoid cross-engine-safe), bins are `2²⁰/bins`-wide
    * integer ranges, and each bin row carries its EXACT integer
    * sufficient statistics plus its contribution to the three Murphy
    * terms:
    *
    *  - `brier_term = Σ(p_q − y)²/N` restricted to the bin (from the
    *    exact `Σ(p_num − y·2²⁰)²` decimal sum),
    *  - `rel_term = n_k·(p̄_k − ō_k)²/N` (reliability: forecast vs
    *    observed rate in the bin),
    *  - `res_term = n_k·(ō_k − ō)²/N` (resolution: bin rate vs base
    *    rate).
    *
    * Each term is ONE fixed-order double combine over exact integers —
    * bit-replayable. Summing the rows gives the decomposition
    * `brier ≈ reliability − resolution + ō(1−ō)` (exact only when
    * forecasts are constant within bins — the binning residual is the
    * caller's tradeoff; spec-pinned on a constant-forecast fixture).
    *
    * Scale shape: one map-side grid projection, one bins-sized
    * aggregate, a broadcast 1-row total — nothing corpus-sized moves.
    */
  def brierBins(
      scored: DataFrame,
      labelCol: String,
      scoreCol: String,
      bins: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val S = 1048576L
    require(bins >= 1 && S % bins == 0, s"bins must divide 2^20, got $bins")
    val w = S / bins
    val d38 = DecimalType(38, 0)
    val y = col(labelCol).cast("long")
    val sig = lit(1.0) / (lit(1.0) + exp(-col(scoreCol)))
    val base = scored
      .filter(col(scoreCol).isNotNull && y.isNotNull)
      .select(y.as("__y"),
        // σ < 1 mathematically, but double rounding can reach 1.0: clamp
        // the grid code into the top bin (mirrored by the oracle)
        least(floor(sig * S.toDouble).cast("long"), lit(S - 1)).as("__pn"))
    val err = col("__pn") - col("__y") * S
    val grouped = base
      .groupBy(expr(s"__pn DIV $w").as("bin"))
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"),
        sum(col("__pn").cast(d38)).as("__sp"),
        sum((err * err).cast(d38)).as("__sq"))
    val tot = base.agg(count(lit(1)).as("__N"), sum("__y").as("__P"))
    val nD = col("n").cast("double")
    val nTD = col("__N").cast("double")
    val pbar = col("__sp").cast("double") / (lit(1048576.0) * nD)
    val obark = col("n_pos").cast("double") / nD
    val obar = col("__P").cast("double") / nTD
    grouped
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("__sq").cast("double") / (lit(1048576.0) * lit(1048576.0) * nTD))
          .as("brier_term"),
        ((pbar - obark) * (pbar - obark) * nD / nTD).as("rel_term"),
        ((obark - obar) * (obark - obar) * nD / nTD).as("res_term"))
  }

  /** `W(m) = Σ_{d=m..k} 2^(k-d) · lcm(1..k)/d`, 1-indexed by m — shared
    * with the oracle generator so both sides fold identical constants.
    */
  def rboWeights(k: Int): Seq[Long] = {
    val grid = (1 to k).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    (1 to k).map(m => (m to k).map(d => (1L << (k - d)) * (grid / d)).sum)
  }

  /** The closing denominator `2^k · lcm(1..k)` for [[rankBiasedOverlap]]. */
  def rboDenom(k: Int): Long =
    (1L << k) * (1 to k).foldLeft(1L)((a, b) => a / gcd(a, b) * b)

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** EXACT isotonic calibration by Pool-Adjacent-Violators (Ayer et al.
    * 1955; [[calibration]]'s fixed bins answer "is the score honest in
    * these buckets", this fits the OPTIMAL monotone calibration map) —
    * the least-squares-optimal non-decreasing step function from an
    * integer-grid score to an empirical positive rate.
    *
    * Exactness: observations pre-aggregate per distinct score (ties
    * collapse up front, so arrival order never matters), and every merge
    * decision compares pool RATES as cross-multiplied longs —
    * `pos_prev·n_cur ≥ pos_cur·n_prev` — no division anywhere. Equal
    * rates merge too (canonical maximal level sets: one pool per level,
    * a unique normal form both engines reproduce). Output per pool:
    * `(score_lo, score_hi, n, pos)` — the fitted rate is the exact
    * fraction pos/n; fitted rates are STRICTLY increasing across pools.
    *
    * Scale shape: the corpus collapses to the distinct-score histogram in
    * one distributed aggregation (map-side partials); PAV itself is
    * inherently sequential and runs in ONE task over that bounded
    * histogram (scores live on a grid by the [[Inference]] discipline —
    * hundreds of levels, not rows), embarrassingly parallel across
    * `groupCol` (per-model / per-segment calibration). Cross-multiply
    * bound: pos·n per group must fit a long — calibration sets up to ~3B
    * rows per group, beyond any realistic labeled slice.
    */
  /** Split-conformal prediction thresholds (Vovk; Papadopoulos et al.):
    * for each miscoverage level α = num/den (exact fraction — no float α
    * ever meets an integer rank), the threshold is the calibration set's
    * nonconformity score at 1-based rank `⌈(n_cal+1)·(1−α)⌉`, computed by
    * integer arithmetic `((n+1)(den−num) + den − 1) div den`; a test
    * point is covered when its score is ≤ that threshold. Output per α:
    * `(alpha_num, alpha_den, n_cal, k_rank, threshold, n_test,
    * n_covered)` — the finite-sample guarantee says coverage ≥ 1−α in
    * expectation, and the driver gate replays every number exactly.
    *
    * Scale shape: scores are integer-grid longs; the calibration set is
    * a bounded labeled slice by nature, so the rank is read off one
    * sorted window over it (for a calibration set too large to sort in
    * one task, [[Selection.quantileSelect]]'s bucket descent is the
    * drop-in — same rank semantics, no global sort). The test side only
    * ever answers two counting aggregates. The per-α driver actions pull
    * SCALARS (a threshold, a count) — the operator's output is
    * α-levels-sized by definition.
    */
  def conformalSplit(
      cal: DataFrame,
      test: DataFrame,
      scoreCol: String,
      alphas: Seq[(Int, Int)]): DataFrame = {
    require(alphas.nonEmpty && alphas.forall { case (a, d) => a > 0 && a < d },
      "each alpha must be a fraction in (0,1)")
    val spark = cal.sparkSession
    import spark.implicits._
    val calS = cal.select(col(scoreCol).cast("long").as("s"))
      .filter(col("s").isNotNull).localCheckpoint(true)
    val nCal = calS.count()
    require(nCal > 0, "empty calibration set")
    val ranked = calS
      .withColumn("__rk", row_number().over(Window.orderBy(col("s"))))
      .localCheckpoint(true)
    val testS = test.select(col(scoreCol).cast("long").as("s"))
      .filter(col("s").isNotNull).localCheckpoint(true)
    val nTest = testS.count()
    alphas.map { case (an, ad) =>
      val k = ((nCal + 1) * (ad - an) + ad - 1) / ad
      val thr = ranked.filter(col("__rk") === math.min(k, nCal)).head().getLong(0)
      (an, ad, nCal, k, thr, nTest, testS.filter(col("s") <= thr).count())
    }.toDF("alpha_num", "alpha_den", "n_cal", "k_rank", "threshold",
      "n_test", "n_covered")
  }

  def isotonicFit(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      groupCol: Option[String] = None): DataFrame = {
    val parts = groupCol.map(col).toSeq
    val pools = df
      .groupBy(parts :+ col(scoreCol).cast("long").as("__s"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(labelCol).cast("long")).as("__p"))
    val pav = udf { (ss: Seq[Long], ns: Seq[Long], ps: Seq[Long]) =>
      val order = ss.indices.sortBy(ss(_))
      val los = scala.collection.mutable.ArrayBuffer.empty[Long]
      val his = scala.collection.mutable.ArrayBuffer.empty[Long]
      val n = scala.collection.mutable.ArrayBuffer.empty[Long]
      val p = scala.collection.mutable.ArrayBuffer.empty[Long]
      order.foreach { i =>
        los += ss(i); his += ss(i); n += ns(i); p += ps(i)
        var merging = true
        while (merging && los.length >= 2) {
          val k = los.length
          if (p(k - 2) * n(k - 1) >= p(k - 1) * n(k - 2)) {
            n(k - 2) += n(k - 1); p(k - 2) += p(k - 1); his(k - 2) = his(k - 1)
            los.remove(k - 1); his.remove(k - 1); n.remove(k - 1); p.remove(k - 1)
          } else merging = false
        }
      }
      los.indices.map(i => (los(i), his(i), n(i), p(i)))
    }
    pools
      .groupBy(parts: _*)
      .agg(collect_list(struct(
        col("__s").as("s"), col("__n").as("n"), col("__p").as("p"))).as("__pl"))
      .select(parts :+ explode(pav(
        transform(col("__pl"), x => x.getField("s")),
        transform(col("__pl"), x => x.getField("n")),
        transform(col("__pl"), x => x.getField("p")))).as("__o"): _*)
      .select(parts ++ Seq(
        col("__o._1").as("score_lo"), col("__o._2").as("score_hi"),
        col("__o._3").as("n"), col("__o._4").as("pos")): _*)
  }

  /** ROUGE-2 between paired texts (Lin 2004, the summarization-eval
    * standard): clipped bigram-multiset overlap
    * `ov = Σ_g min(c_a(g), c_b(g))`, with precision `ov/n_a`, recall
    * `ov/n_b` and `f1_ppm = 2·ov·10⁶ DIV (n_a + n_b)` — all exact
    * integers divided once. The generation-eval primitive (summary vs
    * reference, draft vs edit, near-dup audit).
    *
    * Scale shape: one (doc, bigram) count aggregate, two pair joins on
    * (id, bigram digests never leave the hash), per-pair rollup — motion
    * ∝ bigram volume of the PAIRED docs only.
    *
    * @param pairs (id_a, id_b) — which texts to compare
    * @return (id_a, id_b, overlap, n_a, n_b, f1_ppm); pairs where either
    *         side has no bigrams emit overlap 0 and null f1
    */
  def rouge2(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame): DataFrame = {
    // only PAIRED docs gram up: the id set is pair-sized and broadcasts,
    // so corpus size stops mattering the moment the pair list is small
    // (benched 5× on the gate fixture: 4.8 s → corpus-independent)
    val wanted = pairs.select(col("id_a").cast("long").as("__wid"))
      .union(pairs.select(col("id_b").cast("long").as("__wid")))
      .distinct()
    val grams = docs
      .filter(col(textCol).isNotNull)
      .join(broadcast(wanted), col(idCol).cast("long") === col("__wid"), "left_semi")
      .select(col(idCol).cast("long").as("id"),
        explode(TextOps.wordNgramsAllOfTokens(
          TextOps.tokens(col(textCol)), 2)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tot = grams.groupBy("id").agg(sum(col("c")).as("n"))
    val p = pairs.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    val ov = p
      .join(grams.toDF("id_a", "g", "__ca"), Seq("id_a"))
      .join(grams.toDF("__idb2", "g2", "__cb"),
        col("id_b") === col("__idb2") && col("g") === col("g2"))
      .select(col("id_a"), col("id_b"), least(col("__ca"), col("__cb")).as("__m"))
      .groupBy("id_a", "id_b").agg(sum(col("__m")).as("overlap"))
    p.join(ov, Seq("id_a", "id_b"), "left")
      .join(tot.toDF("id_a", "n_a"), Seq("id_a"), "left")
      .join(tot.toDF("id_b", "n_b"), Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .withColumn("f1_ppm",
        expr("""CASE WHEN n_a + n_b = 0 THEN NULL
               |ELSE 2 * overlap * 1000000 DIV (n_a + n_b) END""".stripMargin))
  }


  /** BLEU-2 between paired texts (Papineni et al. 2002) — candidate
    * `id_a` scored against reference `id_b`: clipped modified precisions
    * for unigrams and bigrams, brevity penalty `min(1, e^(1−r/c))`, and
    * `bleu = BP·√(p1·p2)`. All counts exact integers; the penalty's one
    * exp and the closing sqrt are single fixed-order double calls on
    * exact ratios (the sigmoid/cosine trust argument). Zero n-gram
    * matches or an empty candidate yield 0/null without blow-ups.
    *
    * Scale shape: the [[rouge2]] motion twice (unigram + bigram count
    * tables over the PAIRED docs only, pair-sized broadcast semi-join).
    *
    * @return (id_a, id_b, c_len, r_len, m1, m2, bleu)
    */
  def bleu2(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame): DataFrame = {
    val wanted = pairs.select(col("id_a").cast("long").as("__wid"))
      .union(pairs.select(col("id_b").cast("long").as("__wid")))
      .distinct()
    val toks = docs
      .filter(col(textCol).isNotNull)
      .join(broadcast(wanted), col(idCol).cast("long") === col("__wid"), "left_semi")
      .select(col(idCol).cast("long").as("id"),
        TextOps.tokens(col(textCol)).as("__ws"))
      .localCheckpoint(true)
    def counts(n: Int) = toks
      .select(col("id"),
        explode(TextOps.wordNgramsAllOfTokens(col("__ws"), n)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
    val p = pairs.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    def clipped(n: Int, as: String) = p
      .join(counts(n).toDF("id_a", "g", "__ca"), Seq("id_a"))
      .join(counts(n).toDF("__idb2", "g2", "__cb"),
        col("id_b") === col("__idb2") && col("g") === col("g2"))
      .groupBy("id_a", "id_b")
      .agg(sum(least(col("__ca"), col("__cb"))).as(as))
    val lens = toks.select(col("id"), size(col("__ws")).cast("long").as("len"))
    val out = p
      .join(clipped(1, "m1"), Seq("id_a", "id_b"), "left")
      .join(clipped(2, "m2"), Seq("id_a", "id_b"), "left")
      .join(lens.toDF("id_a", "c_len"), Seq("id_a"), "left")
      .join(lens.toDF("id_b", "r_len"), Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("c_len"), lit(0L)).as("c_len"),
        coalesce(col("r_len"), lit(0L)).as("r_len"),
        coalesce(col("m1"), lit(0L)).as("m1"),
        coalesce(col("m2"), lit(0L)).as("m2"))
    // the one libm exp floors onto the 2^20 grid (raw exp differs by an
    // ULP across engines — the discipline everything else follows); sqrt
    // and the arithmetic are IEEE-correctly-rounded and engine-identical
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(floor(exp(lit(1.0) -
        col("r_len").cast("double") / col("c_len").cast("double"))
        * lit(1048576.0)) / lit(1048576.0))
    out.withColumn("bleu",
      when(col("c_len") > 1 && col("m1") > 0 && col("m2") > 0,
        bp * sqrt(
          (col("m1").cast("double") / col("c_len").cast("double")) *
            (col("m2").cast("double") / (col("c_len") - 1).cast("double"))))
        .otherwise(when(col("c_len") > 0, lit(0.0))
          .otherwise(lit(null).cast("double"))))
  }

}
