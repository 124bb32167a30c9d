package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-pass Poisson bootstrap — uncertainty estimates for corpus metrics
  * without resampling data movement (Chamandy et al., "Estimating
  * Uncertainty for Massive Data Streams", 2012): instead of drawing B
  * resamples, every row carries B DETERMINISTIC Poisson(1) multiplicities
  * derived from md5(salt, replica, id), so all B replica estimates
  * accumulate in ONE aggregation pass. The hash→weight ladder lives in
  * the same md5-hex-threshold space as [[Sampling.hashKey]] (string
  * compares against 8-hex-digit literals — integer-exact, engine-portable),
  * and the SQL form is GENERATED from the same threshold constants, so the
  * two sides cannot drift.
  */
object Bootstrap {

  /** Poisson(1) CDF at k = 0..7 as [[Sampling.fractionThreshold]] hex
    * literals: a uniform hex draw below `poissonCdfHex(k)` means weight ≤ k.
    * Truncation at 8 loses P(W > 8) < 1.1e-7 — far below bootstrap noise.
    */
  val poissonCdfHex: Seq[String] = {
    val pmf = new Array[Double](8)
    pmf(0) = math.exp(-1.0)
    for (k <- 1 until 8) pmf(k) = pmf(k - 1) / k
    pmf.scanLeft(0.0)(_ + _).tail.toSeq.map(Sampling.fractionThreshold)
  }

  /** The deterministic Poisson(1) multiplicity of `idCol` in `replica`. */
  def poissonWeight(idCol: Column, replica: Int, salt: String): Column = {
    val h = substring(md5(concat(lit(s"${salt}_${replica}_"), idCol.cast("string"))), 1, 8)
    poissonCdfHex.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (hex, k)) =>
        val c = h < lit(hex)
        Some(acc.fold(when(c, lit(k.toLong)))(_.when(c, lit(k.toLong))))
      }
      .get.otherwise(lit(poissonCdfHex.size.toLong))
  }

  /** The same ladder as ANSI SQL over a precomputed hash expression —
    * splice into an oracle so both engines read identical literals.
    */
  def poissonWeightSql(hashExpr: String): String =
    poissonCdfHex.zipWithIndex
      .map { case (hex, k) => s"WHEN $hashExpr < '$hex' THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${poissonCdfHex.size} END")

  /** Percentile-bootstrap confidence interval for the per-group mean of an
    * integral value column. Returns per group: `n_rows`, the point `mean`,
    * and `ci_lo`/`ci_hi` — the order statistics of the B replica means at
    * ranks `max(1, ⌊α/2·B'⌋)` and `min(B', ⌈(1−α/2)·B'⌉)` (1-based, B' =
    * replicas whose total weight was nonzero; a zero-weight replica's mean
    * is undefined and drops out rather than polluting the order
    * statistics).
    *
    * Scale shape: ONE shuffle on the group key. The B replicas do NOT
    * expand rows — each contributes two conditional sums (weighted value,
    * weight) to a single 2B+2-column aggregate, all partial map-side;
    * replica means, sorting, and the rank picks happen in a group-sized
    * projection. Weighted sums accumulate as DECIMAL(38) (order-free,
    * overflow-safe at warehouse scale); every division is one
    * correctly-rounded double op, so SQL replays the interval bit-exactly.
    */
  def meanCI(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: Column,
      replicas: Int = 64,
      alpha: Double = 0.05,
      salt: String = "boot"): DataFrame =
    ratioCI(df, groupCol, idCol, valueCol, lit(1L), replicas, alpha, salt,
      pointAs = "mean")

  /** Percentile-bootstrap CI for a per-group RATIO of sums
    * `Σ num / Σ den` — the metric shape (revenue per order, clicks per
    * session, price per unit) whose variance has no closed per-row form,
    * which is exactly what the bootstrap is FOR. [[meanCI]] is the
    * `den = 1` special case; same one-pass replica motion, same order
    * statistics, numerator and denominator drawn with the SAME weights
    * (within-row correlation preserved — resampling them independently
    * would be wrong). A replica whose denominator draw is zero drops out
    * of the order statistics, like meanCI's zero-weight replicas.
    */
  def ratioCI(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      numCol: Column,
      denCol: Column,
      replicas: Int = 64,
      alpha: Double = 0.05,
      salt: String = "boot",
      pointAs: String = "ratio"): DataFrame = {
    require(replicas >= 8 && replicas <= 256, s"need 8 <= replicas <= 256, got $replicas")
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    val d38 = DecimalType(38, 0)
    val x = numCol.cast("long")
    val y = denCol.cast("long")
    val repAggs = (0 until replicas).flatMap { b =>
      val w = poissonWeight(col(idCol), b, salt)
      Seq(
        sum((w * x).cast(d38)).as(s"__s$b"),
        sum((w * y).cast(d38)).as(s"__c$b"))
    }
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      sum(x.cast(d38)).as("__tx"),
      sum(y.cast(d38)).as("__ty")) ++ repAggs
    val base = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val ratios = array((0 until replicas).map { b =>
      when(col(s"__c$b") === 0, lit(null).cast("double"))
        .otherwise(col(s"__s$b").cast("double") / col(s"__c$b").cast("double"))
    }: _*)
    val sorted = array_sort(filter(ratios, r => r.isNotNull))
    val n = size(sorted)
    val loIdx = greatest(lit(1), floor(lit(alpha / 2) * n).cast("int"))
    val hiIdx = least(n, ceil(lit(1.0 - alpha / 2) * n).cast("int"))
    // every replica can drop out (an all-zero denominator group): the
    // interval is undefined there — null, not an ANSI index error
    def pick(idx: Column) =
      when(n === 0, lit(null).cast("double")).otherwise(element_at(sorted, idx))
    base.select(
      col(groupCol),
      col("n_rows"),
      when(col("__ty") === 0, lit(null).cast("double"))
        .otherwise(col("__tx").cast("double") / col("__ty").cast("double"))
        .as(pointAs),
      pick(loIdx).as("ci_lo"),
      pick(hiIdx).as("ci_hi"))
  }
}
