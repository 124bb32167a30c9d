package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-pass Poisson bootstrap — uncertainty estimates for corpus metrics
  * without resampling data movement (Chamandy et al., "Estimating
  * Uncertainty for Massive Data Streams", 2012): instead of drawing B
  * resamples, every row carries B DETERMINISTIC Poisson(1) multiplicities
  * derived from md5 digests of (salt, chunk, id), so all B replica
  * estimates accumulate in one bounded aggregation. The hash→weight
  * ladder lives in the same md5-hex-threshold space as
  * [[Sampling.hashKey]] (string compares against 8-hex-digit literals —
  * integer-exact, engine-portable), and the SQL form is GENERATED from
  * the same threshold constants, so the two sides cannot drift.
  *
  * Round 12 restructure (the bench's plan-as-written re-baseline exposed
  * the original wide form at 32 s/slot): ONE md5 digest now feeds FOUR
  * replicas (its 128 bits are four independent 32-bit uniforms — slices
  * of one digest are statistically equivalent to separate digests), and
  * the aggregation runs in LONG FORM — `posexplode` the B weights and
  * aggregate per (group, replica) — instead of 2B+3 aggregate columns.
  * Why: the 2B-column wide aggregate exceeds what whole-stage codegen
  * will compile (janino refuses the 96-ladder update method), so it ran
  * through the interpreted `MutableProjection` path, re-deriving every
  * md5 ladder TWICE per row (numerator and denominator aggregates are
  * separate update expressions — no cross-aggregate subexpression
  * elimination there). The long form keeps every stage inside codegen,
  * computes each weight exactly once, and its per-(group, replica)
  * partial aggregate collapses map-side to |groups|·B rows per task —
  * nothing about the explode ever materializes B× the data. Measured at
  * sf0.1: 23 s → ~2 s for the 48-replica ratio query.
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

  /** The CDF ladder over an 8-hex-char uniform draw. */
  private def ladder(h8: Column): Column =
    poissonCdfHex.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (hex, k)) =>
        val c = h8 < lit(hex)
        Some(acc.fold(when(c, lit(k.toLong)))(_.when(c, lit(k.toLong))))
      }
      .get.otherwise(lit(poissonCdfHex.size.toLong))

  /** The deterministic Poisson(1) multiplicity of `idCol` in `replica`:
    * replica `b` reads hex chars `[(b%4)·8+1, (b%4)·8+8]` of
    * `md5(salt_(b/4)_id)` — four replicas per digest.
    */
  def poissonWeight(idCol: Column, replica: Int, salt: String): Column = {
    val dg = md5(concat(lit(s"${salt}_${replica / 4}_"), idCol.cast("string")))
    ladder(substring(dg, (replica % 4) * 8 + 1, 8))
  }

  /** The same ladder as ANSI SQL over a precomputed hash expression —
    * splice into an oracle so both engines read identical literals. With
    * the chunked scheme the oracle's hash expression is
    * `substring(md5(salt || '_' || CAST(b // 4 AS VARCHAR) || '_' || id),
    * (b % 4) * 8 + 1, 8)`.
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
    * `den = 1` special case; numerator and denominator are drawn with the
    * SAME weights (within-row correlation preserved — resampling them
    * independently would be wrong). A replica whose denominator draw is
    * zero drops out of the order statistics, like meanCI's zero-weight
    * replicas.
    *
    * Scale shape: `posexplode` of the B per-row weights feeds ONE
    * shuffle keyed (group, replica) whose map-side partial aggregate
    * collapses to |groups|·B rows per task — the B-fold expansion is
    * pipelined inside whole-stage codegen and never materializes.
    * Weighted sums accumulate as DECIMAL(38) (order-free, overflow-safe
    * at warehouse scale); every division is one correctly-rounded double
    * op, so SQL replays the interval bit-exactly. When the input arrives
    * in fewer partitions than `defaultParallelism` (the small-file shape
    * — a CPU-dense stage would otherwise run single-task), the rows are
    * hash-repartitioned on the id first; at warehouse scale the scan
    * already carries more partitions than cores and the guard is a no-op.
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
    val base0 = df.select(
      col(groupCol).as("__g"),
      numCol.cast("long").as("__x"),
      denCol.cast("long").as("__y"),
      col(idCol).cast("string").as("__ids"))
    val base = Partitioning.densify(base0, col("__ids"))
    // one digest per four replicas: md5's 128 bits = 4 independent
    // 32-bit uniforms, read as the four 8-hex-char slices. The explode
    // stops at CHUNK granularity — each exploded row carries its four
    // replicas' weights into eight sum slots, quartering the generate
    // row-writes and hash-map probes of a per-replica explode (the row
    // OVERHEAD, not the ladder arithmetic, dominated the per-replica
    // form at measurement).
    val nChunks = (replicas + 3) / 4
    val digests = array((0 until nChunks).map(i =>
      md5(concat(lit(s"${salt}_${i}_"), col("__ids")))): _*)
    val e1 = base.select(
      col("__g"), col("__x"), col("__y"),
      posexplode(digests).as(Seq("__chunk", "__dg")))
    val withW = e1.select(
      (Seq(col("__g"), col("__x"), col("__y"), col("__chunk")) ++
        (0 until 4).map(j =>
          ladder(substring(col("__dg"), j * 8 + 1, 8)).as(s"__w$j"))): _*)
    // per (group, chunk): four replicas' weighted sums; the base stats
    // ride the chunk-0 slice (each input row appears exactly once there)
    val sumCols = (0 until 4).flatMap { j =>
      Seq(
        sum((col(s"__w$j") * col("__x")).cast(d38)).as(s"__s$j"),
        sum((col(s"__w$j") * col("__y")).cast(d38)).as(s"__c$j"))
    } ++ Seq(
      sum(when(col("__chunk") === 0, 1L)).as("__n0"),
      sum(when(col("__chunk") === 0, col("__x")).cast(d38)).as("__tx0"),
      sum(when(col("__chunk") === 0, col("__y")).cast(d38)).as("__ty0"))
    val perChunk = withW.groupBy(col("__g"), col("__chunk"))
      .agg(sumCols.head, sumCols.tail: _*)
    // unpivot the four replica slots at |groups|·chunks row count —
    // group-sized data, nothing row-scale flows through the stack
    val stackExpr = (0 until 4)
      .map(j => s"$j, __s$j, __c$j").mkString(", ")
    val perRep = perChunk.selectExpr(
      "__g", "__chunk", "__n0", "__tx0", "__ty0",
      s"stack(4, $stackExpr) AS (__j, __s, __c)")
      .select(col("__g"), col("__n0"), col("__tx0"), col("__ty0"),
        (col("__chunk") * 4 + col("__j")).as("__b"), col("__s"), col("__c"))
      .filter(col("__b") < replicas)
    val agg = perRep.groupBy(col("__g")).agg(
      sum(when(col("__b") === 0, col("__n0"))).as("n_rows"),
      sum(when(col("__b") === 0, col("__tx0"))).as("__tx"),
      sum(when(col("__b") === 0, col("__ty0"))).as("__ty"),
      array_sort(filter(collect_list(
        when(col("__c") === 0, lit(null).cast("double"))
          .otherwise(col("__s").cast("double") / col("__c").cast("double"))),
        r => r.isNotNull)).as("__sorted"))
    val n = size(col("__sorted"))
    val loIdx = greatest(lit(1), floor(lit(alpha / 2) * n).cast("int"))
    val hiIdx = least(n, ceil(lit(1.0 - alpha / 2) * n).cast("int"))
    // every replica can drop out (an all-zero denominator group): the
    // interval is undefined there — null, not an ANSI index error
    def pick(idx: Column) =
      when(n === 0, lit(null).cast("double")).otherwise(element_at(col("__sorted"), idx))
    agg.select(
      col("__g").as(groupCol),
      col("n_rows"),
      when(col("__ty") === 0, lit(null).cast("double"))
        .otherwise(col("__tx").cast("double") / col("__ty").cast("double"))
        .as(pointAs),
      pick(loIdx).as("ci_lo"),
      pick(hiIdx).as("ci_hi"))
  }
}
