package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** CUPED variance-reduced experiment readout (Deng et al. 2013): adjust
    * each unit's post-period metric by its PRE-period covariate —
    * `y_adj = y − θ·(x − mean(x))` with `θ = Cov(x,y)/Var(x)` — the
    * standard lever that cuts experiment runtimes by the covariate's R².
    *
    * Exactness discipline: metric and covariate land on the integer CENT
    * grid (`(v·100)::long` — the [[abReport]] exactness frame), and all
    * five sufficient statistics (n, Σx, Σy, Σxy, Σx²) accumulate as
    * DECIMAL(38,0) INTEGERS — order/partitioning-invariant, and exactly
    * mirrored by HUGEINT in any replaying engine (integer decimals dodge
    * the cross-engine precision-38 multiplication rules entirely). The
    * cent scale cancels exactly in θ's ratio; θ, the grand covariate
    * mean, and the per-variant adjusted means are fixed-order double
    * expressions of correctly-rounded integer casts. Zero covariate
    * variance yields θ = null and adjusted = raw means.
    *
    * Scale shape: ONE aggregate over the unit table for the statistics
    * (1-row broadcast back), one for the per-variant sums — no joins
    * wider than the variant count.
    *
    * @param units one row per unit: variant (long), metric y and
    *              covariate x (numerics; 2-decimal grid values expected)
    */
  def cuped(
      units: DataFrame,
      variantCol: String,
      metricCol: String,
      covariateCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    def cents(c: Column): Column =
      (c.cast(DecimalType(18, 2)) * 100).cast("long")
    val base = units
      .filter(col(variantCol).isNotNull && col(metricCol).isNotNull &&
        col(covariateCol).isNotNull)
      .select(col(variantCol).as("variant"),
        cents(col(covariateCol)).as("__x"), cents(col(metricCol)).as("__y"))
    val stats = base.agg(
      count(lit(1)).as("__n"),
      coalesce(sum(col("__x").cast(d38)), lit(0).cast(d38)).as("__sx"),
      coalesce(sum(col("__y").cast(d38)), lit(0).cast(d38)).as("__sy"),
      coalesce(sum((col("__x").cast(d38) * col("__y")).cast(d38)), lit(0).cast(d38))
        .as("__sxy"),
      coalesce(sum((col("__x").cast(d38) * col("__x")).cast(d38)), lit(0).cast(d38))
        .as("__sxx"))
    val perVariant = base.groupBy(col("variant")).agg(
      count(lit(1)).as("n"),
      sum(col("__x").cast(d38)).as("__vx"),
      sum(col("__y").cast(d38)).as("__vy"))
    // θ = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx) — integer cents² cancel
    // exactly, every piece an exact integer, ONE division in double
    val covNum = (col("__n").cast(d38) * col("__sxy")
      - (col("__sx") * col("__sy")).cast(d38)).cast("double")
    val varNum = (col("__n").cast(d38) * col("__sxx")
      - (col("__sx") * col("__sx")).cast(d38)).cast("double")
    val theta = when(varNum =!= 0.0, covNum / varNum).otherwise(lit(null).cast("double"))
    val xBarC = col("__sx").cast("double") / col("__n") // grand covariate mean, cents
    perVariant.crossJoin(broadcast(stats))
      .select(
        col("variant"),
        col("n"),
        (col("__vy").cast("double") / (col("n") * 100.0)).as("mean_y"),
        theta.as("theta"),
        when(theta.isNull, col("__vy").cast("double") / (col("n") * 100.0))
          .otherwise(
            (col("__vy").cast("double") / col("n")
              - theta * (col("__vx").cast("double") / col("n") - xBarC)) / 100.0)
          .as("mean_y_adj"))
  }

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

  /** Difference-in-differences estimate over a parallel-period design:
    * units carry (variant 0/1, period 0 = pre / 1 = post, an integer
    * metric grid), and
    * `DiD = (m_t,post − m_t,pre) − (m_c,post − m_c,pre)` — the standard
    * launch readout when assignment wasn't randomized but trends were
    * parallel. All four cell means come from exact long (sum, n) pairs;
    * the estimate is ONE fixed-order double combine of the four exact
    * ratios (empty cells ⇒ null, never NaN).
    *
    * Scale shape: one aggregate pass — 8 conditional sums; nothing else
    * moves.
    *
    * @return one row: per-cell n/sum plus `did` on the metric's grid
    */
  def didReport(
      units: DataFrame,
      variantCol: String,
      periodCol: String,
      metricGrid: Column): DataFrame = {
    val v = col(variantCol)
    val p = col(periodCol)
    val m = metricGrid.cast("long")
    def cell(vv: Int, pp: Int, what: Column) =
      coalesce(sum(when(v === vv && p === pp, what)), lit(0L))
    val agg = units
      .filter(v.isNotNull && p.isNotNull && m.isNotNull)
      .agg(
        cell(0, 0, lit(1L)).as("n_c_pre"), cell(0, 0, m).as("s_c_pre"),
        cell(0, 1, lit(1L)).as("n_c_post"), cell(0, 1, m).as("s_c_post"),
        cell(1, 0, lit(1L)).as("n_t_pre"), cell(1, 0, m).as("s_t_pre"),
        cell(1, 1, lit(1L)).as("n_t_post"), cell(1, 1, m).as("s_t_post"))
    def mean(sc: String, nc: String) =
      col(sc).cast("double") / col(nc).cast("double")
    agg.withColumn("did",
      when(col("n_c_pre") > 0 && col("n_c_post") > 0 &&
        col("n_t_pre") > 0 && col("n_t_post") > 0,
        (mean("s_t_post", "n_t_post") - mean("s_t_pre", "n_t_pre")) -
          (mean("s_c_post", "n_c_post") - mean("s_c_pre", "n_c_pre")))
        .otherwise(lit(null).cast("double")))
  }

  /** Two-proportion sample-size calculator (the pre-launch power
    * analysis): with baseline rate p̂ = conv/n from the corpus and a
    * target minimum-detectable ABSOLUTE effect `mdePpm` (ppm grid),
    * `n_required = ⌈2·(z_α/2 + z_β)²·p̄(1−p̄) / δ²⌉` per variant at
    * α = 0.05, power = 0.8 (z constants frozen as the literals 1.959964
    * and 0.841621 — plan-time, oracle-shared). The baseline statistics
    * are exact longs; the sizing formula is one fixed-order double
    * expression (a DESIGN number — its inputs are what must be exact).
    */
  /** Wald SPRT per-outcome log-likelihood-ratio weights on the 2²⁰ grid,
    * for H₀: p = p0 vs H₁: p = p1 given as exact fractions — computed
    * ONCE at plan build from the rationals (the [[graft.ops.Linkage
    * .fsWeights]] frozen-constant pattern: the oracle builder calls this
    * SAME function, so the literals cannot drift). Returns
    * `(wConvert, wNonConvert)` = `(⌊2²⁰·ln(p1/p0)⌋, ⌊2²⁰·ln((1−p1)/(1−p0))⌋)`.
    */
  def sprtWeights(
      p0Num: Long, p0Den: Long, p1Num: Long, p1Den: Long): (Long, Long) = {
    require(p0Num > 0 && p1Num > 0 && p0Num < p0Den && p1Num < p1Den,
      "p0, p1 must be proper fractions")
    require(p1Num * p0Den > p0Num * p1Den, "need p1 > p0 (a one-sided lift test)")
    val wc = math.floor(math.log(
      (p1Num * p0Den).toDouble / (p1Den * p0Num).toDouble) * 1048576.0).toLong
    val wn = math.floor(math.log(
      ((p1Den - p1Num) * p0Den).toDouble /
        (p1Den * (p0Den - p0Num)).toDouble) * 1048576.0).toLong
    (wc, wn)
  }

  /** Wald SPRT decision bounds on the same 2²⁰ grid for error rates
    * α = aNum/aDen (type I) and β = bNum/bDen (type II):
    * `(upper, lower)` = `(⌊2²⁰·ln((1−β)/α)⌋, ⌊2²⁰·ln(β/(1−α))⌋)` — cross
    * the upper bound and H₁ is accepted, the lower and H₀ is.
    */
  def sprtBounds(
      aNum: Long, aDen: Long, bNum: Long, bDen: Long): (Long, Long) = {
    require(aNum > 0 && bNum > 0 && aNum < aDen && bNum < bDen,
      "alpha, beta must be proper fractions")
    val up = math.floor(math.log(
      ((bDen - bNum) * aDen).toDouble / (bDen * aNum).toDouble) * 1048576.0).toLong
    val lo = math.floor(math.log(
      (bNum * aDen).toDouble / (bDen * (aDen - aNum)).toDouble) * 1048576.0).toLong
    (up, lo)
  }

  def powerSample(
      units: DataFrame,
      convertedCol: String,
      mdePpm: Long): DataFrame = {
    require(mdePpm > 0, s"mdePpm must be > 0, got $mdePpm")
    val c = col(convertedCol)
    val agg = units.filter(c.isNotNull)
      .agg(count(lit(1)).as("n"), coalesce(sum(c.cast("long")), lit(0L)).as("conv"))
    val zSum = 1.959964 + 0.841621
    val pBar = (col("conv").cast("double") / col("n").cast("double")) +
      (mdePpm.toDouble / 2000000.0)
    val delta = mdePpm.toDouble / 1000000.0
    agg.select(col("n"), col("conv"),
      (col("conv").cast("double") / col("n").cast("double")).as("baseline_rate"),
      when(col("n") > 0,
        ceil(lit(2.0 * zSum * zSum) * pBar * (lit(1.0) - pBar) /
          lit(delta * delta)).cast("long"))
        .otherwise(lit(null).cast("long")).as("n_required"))
  }
}
