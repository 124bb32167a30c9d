package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    // Clamp to 2^32-1: for p just below 1 (e.g. the double 1-2^-53) the
    // product p*2^32 ROUNDS to exactly 2^32, whose hex is 9 digits — lpad
    // would truncate it to "10000000" and keep ~6% instead of ~100%. The
    // p >= 1.0 branch does not cover that value.
    val scaled = least(floor(probCol * 4294967296.0).cast("long"), lit(4294967295L))
    val thr = lpad(lower(hex(scaled)), 8, "0")
    df.filter(probCol >= 1.0 || (probCol > 0.0 && h < thr))
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
}
