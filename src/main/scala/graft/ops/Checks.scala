package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks and profiling over arbitrary tables — the
  * expectations layer every ingestion pipeline runs before trusting a
  * batch: per-column profiles, key uniqueness, referential integrity,
  * completeness. Each check is a plain aggregate (map-side partials, one
  * small shuffle), so a full check suite over 100 TB costs a handful of
  * scans and returns rows-sized reports.
  *
  * No reference analog — pipeline-extension layer.
  */
object Checks {

  /** Per-column profile: row/null/distinct counts plus min/max rendered as
    * strings (dates ISO, decimals plain — deterministic renderings; raw
    * doubles format engine-specifically, cast them to DECIMAL first).
    *
    * Pass shape: the row/null/min/max counters ride ONE aggregate scan;
    * each EXACT distinct count runs as its own column-pruned
    * distinct+count subplan (reading only that column's pages) — the
    * alternative, several `countDistinct` in one agg, plans through
    * Catalyst's Expand (k+1 copies of every in-flight row) and its
    * string/timestamp buffers force a twice-sorted SortAggregate, which
    * measured 2.4× slower at sf0.1 and sorts (k+1)·|rows| wide tuples at
    * any scale. Total bytes read stay ≈ one full scan (parquet pages per
    * column are read once either way). Pass `approxDistinct = true` for
    * the single-scan 100 TB path — `approx_count_distinct` (HLL++, ~2%
    * error) is expand-free and constant-memory per column, so everything
    * folds back into the one aggregate pass.
    */
  def profile(df: DataFrame, cols: Seq[String], approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // The exact path below executes its input k+1 times (one stats pass +
    // one column-pruned distinct per column). Over a directly-scannable
    // columnar source that is ≈ one scan of bytes (each column's pages read
    // once) — the intended shape. A DERIVED input (joins/aggregates
    // upstream, or a row-based source) would re-run its whole pipeline
    // k+1 times, so it is pinned ONCE here; the probe is driver-side only
    // (densify's discipline: no jobs, no adaptive-plan materialization).
    val input = {
      // LOGICAL-plan probe (no physical compile — compiling a plan that
      // carries nondeterministic expressions re-evaluates subtrees in
      // some shapes): any node that plans to a shuffle or re-executes an
      // expensive upstream marks the input as derived
      def derived(d: DataFrame) = {
        import org.apache.spark.sql.catalyst.plans.logical._
        org.apache.spark.sql.GraftColumnBridge.analyzed(d).exists {
          case _: Join => true
          case _: Aggregate => true
          case _: Window => true
          case _: Distinct => true
          case _: Deduplicate => true
          case _: RepartitionOperation => true
          case _: Sort => true
          case _ => false
        }
      }
      if (!approxDistinct && derived(df)) df.localCheckpoint(true) else df
    }
    // counters are aliased by POSITION, not name: a duplicate entry in
    // `cols` would make name-based aliases ambiguous at re-resolution, and
    // a dotted column name would re-parse as struct-field access
    val aggs = count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i")) ++
        (if (approxDistinct) Seq(approx_count_distinct(col(c)).as(s"__nd_$i"))
         else Seq.empty)
    }
    val stats = input.agg(aggs.head, aggs.tail: _*)
    // EXACT distinct counts run as one column-pruned distinct+count per
    // column instead of several countDistinct in one agg: multi-distinct
    // plans through Catalyst's Expand — k+1 copies of every row — and the
    // string/timestamp aggregation buffers force SortAggregate, so the
    // single "one scan" pass really sorted (k+1)·rows wide tuples twice
    // (measured 2.4× slower at sf0.1 than k pruned scans, each of which
    // reads ONE column's pages and hash-aggregates). The 1-row results
    // cross-join back onto the stats row — broadcast-sized by
    // construction. approxDistinct keeps the one-agg path: HLL sketches
    // are Expand-free already.
    val wide =
      if (approxDistinct) stats
      else
        cols.zipWithIndex
          .map { case (c, i) =>
            input.select(col(c)).filter(col(c).isNotNull).distinct()
              .agg(count(lit(1)).as(s"__nd_$i"))
          }
          .foldLeft(stats)(_.crossJoin(_))
    // unpivot the 1-row wide result — rows-sized, stays on the executors
    val perCol = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"__null_$i").as("n_null"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_s"),
        col(s"__max_$i").as("max_s"))
    }
    wide.select(explode(array(perCol: _*)).as("__r")).select("__r.*")
  }

  /** Number of key VALUES appearing more than once (0 = the key is unique). */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(count(lit(1)).as("violations"))

  /** Candidate-key / uniqueness profile for SEVERAL column combinations in
    * ONE grouping-sets pass — the data-contract question "which of these
    * combos actually identifies a row" ([[duplicateKeys]] asks it for one
    * combo; this answers it for all of them in a single scan+shuffle).
    *
    * Output, one row per combo: `key_combo` (participating columns joined
    * by ',' in table-column order), `n_groups` (distinct key tuples),
    * `n_dup_groups` (tuples appearing more than once — 0 ⇔ the combo is a
    * key), `max_group` (worst multiplicity), `n_rows` (total, identical
    * across combos — a built-in cross-combo consistency check), `is_key`.
    *
    * Scale shape: GROUPING SETS is Catalyst's Expand — ONE scan and ONE
    * shuffle of |combos|·|rows| expanded tuples, against |combos| separate
    * scan+shuffle passes for the per-combo alternative. For profiling
    * (a handful of combos over a scan-dominated table) the single pass
    * wins, and column pruning keeps the expansion to the union of the key
    * columns. The per-tuple counts then collapse by combo label — a
    * second, combos-sized aggregate. Null key values group like values
    * (SQL GROUP BY), so a null-ridden column still profiles honestly.
    */
  def keyProfile(df: DataFrame, combos: Seq[Seq[String]]): DataFrame = {
    require(combos.nonEmpty && combos.forall(_.nonEmpty), "need non-empty combos")
    val allCols = combos.flatten.distinct
    // combo label from grouping() flags — engine-agnostic (no reliance on
    // grouping_id bit order), identical expression in the DuckDB oracle
    val label = concat_ws(",",
      allCols.map(c => when(grouping(col(c)) === 0, lit(c))): _*)
    df.groupingSets(combos.map(_.map(col)), allCols.map(col): _*)
      .agg(label.as("key_combo"), count(lit(1)).as("__cnt"))
      .groupBy("key_combo")
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__cnt") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        max(col("__cnt")).as("max_group"),
        sum(col("__cnt")).as("n_rows"))
      .withColumn("is_key", col("n_dup_groups") === 0)
  }

  /** Number of child rows whose key has no match in `parent` (orphans).
    * Null child keys are orphans too unless `countNullAsOrphan` is false —
    * a null FK is usually a modeling decision, so it's explicit.
    */
  def orphans(
      child: DataFrame,
      parent: DataFrame,
      childKey: String,
      parentKey: String,
      countNullAsOrphan: Boolean = true): DataFrame = {
    val parents = parent.select(col(parentKey).as("__pk")).distinct()
    val base = child.join(parents, col(childKey) === col("__pk"), "left_anti")
    (if (countNullAsOrphan) base else base.filter(col(childKey).isNotNull))
      .agg(count(lit(1)).as("violations"))
  }

  /** Number of rows with a null in ANY of `cols` (completeness violations). */
  def incomplete(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "completeness needs at least one column")
    df.filter(cols.map(col(_).isNull).reduce(_ || _))
      .agg(count(lit(1)).as("violations"))
  }

  /** Per-group Pearson correlation with EXACT sufficient statistics:
    * `corr` accumulates `Σx, Σy, Σxy, Σx², Σy²` in floating point, where
    * the sums' value (and hence the last digits of r) depends on partition
    * count and reduce order — a correlation that changes when the cluster
    * resizes. Here the inputs land on the 2^20 integer grid and all five
    * sums accumulate as DECIMAL(38,0) — exact, order-free, shuffle-stable
    * — then combine once in a FIXED-ORDER double expression (casts and
    * sqrt are correctly-rounded IEEE), so r is bit-identical on any
    * partitioning and any engine.
    *
    * Scale shape: one map-side-combined `groupBy` carrying five decimal
    * partials — the same single-shuffle motion as `corr` itself. Zero- or
    * single-point groups and zero-variance groups return null r (not NaN,
    * not a crash).
    */
  def corrExact(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      gridScale: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def grid(c: String) = floor(col(c).cast("double") * gridScale.toDouble).cast("long")
    val d19 = DecimalType(19, 0)
    val agg0 = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), grid(xCol).as("__x"), grid(yCol).as("__y"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x").cast(d19)).as("__sx"),
        sum(col("__y").cast(d19)).as("__sy"),
        sum(col("__x").cast(d19) * col("__y").cast(d19)).as("__sxy"),
        sum(col("__x").cast(d19) * col("__x").cast(d19)).as("__sxx"),
        sum(col("__y").cast(d19) * col("__y").cast(d19)).as("__syy"))
    // fixed-order double combine over the exact decimal sums
    val nD = col("n").cast("double")
    val num = nD * col("__sxy").cast("double") - col("__sx").cast("double") * col("__sy").cast("double")
    val vx = nD * col("__sxx").cast("double") - col("__sx").cast("double") * col("__sx").cast("double")
    val vy = nD * col("__syy").cast("double") - col("__sy").cast("double") * col("__sy").cast("double")
    agg0.select(
      col(groupCol), col("n"),
      when(vx > 0.0 && vy > 0.0, num / (sqrt(vx) * sqrt(vy)))
        .otherwise(lit(null).cast("double")).as("corr"))
  }

  /** All-pairs Pearson correlation MATRIX over `cols` in ONE pass —
    * [[corrExact]]'s exact-grid discipline lifted to k columns. Each of
    * the k(k−1)/2 pairs accumulates its six sufficient statistics over
    * the rows where BOTH its columns are non-null (the
    * pairwise-complete-observations contract) as conditional DECIMAL(19)
    * sums inside a SINGLE aggregate, then combines in the fixed-order
    * double expression. One scan and a 1-row reduction regardless of k —
    * a per-pair [[corrExact]] loop would scan the table k(k−1)/2 times
    * (the [[profile]] single-pass argument, applied to dependence
    * structure). Bit-stable under any partitioning.
    *
    * @return one row per unordered pair: (col_x, col_y, n, corr) —
    *         corr null when either side is constant or n < 2
    */
  def corrMatrix(
      df: DataFrame,
      cols: Seq[String],
      gridScale: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val d19 = DecimalType(19, 0)
    def grid(c: String) = floor(col(c).cast("double") * gridScale.toDouble).cast("long")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size } yield (i, j)
    val staged = df.select(cols.zipWithIndex.map { case (c, i) => grid(c).as(s"__g$i") }: _*)
    val aggs = pairs.flatMap { case (i, j) =>
      val both = col(s"__g$i").isNotNull && col(s"__g$j").isNotNull
      val x = when(both, col(s"__g$i").cast(d19))
      val y = when(both, col(s"__g$j").cast(d19))
      Seq(
        sum(when(both, 1L)).as(s"__n_${i}_$j"),
        sum(x).as(s"__sx_${i}_$j"),
        sum(y).as(s"__sy_${i}_$j"),
        sum(x * y).as(s"__sxy_${i}_$j"),
        sum(x * x).as(s"__sxx_${i}_$j"),
        sum(y * y).as(s"__syy_${i}_$j"))
    }
    val rows = pairs.map { case (i, j) =>
      val n = coalesce(col(s"__n_${i}_$j"), lit(0L))
      val nD = n.cast("double")
      def d(s: String) = coalesce(col(s"__${s}_${i}_$j").cast("double"), lit(0.0))
      val num = nD * d("sxy") - d("sx") * d("sy")
      val vx = nD * d("sxx") - d("sx") * d("sx")
      val vy = nD * d("syy") - d("sy") * d("sy")
      struct(
        lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"), n.as("n"),
        when(vx > 0.0 && vy > 0.0, num / (sqrt(vx) * sqrt(vy)))
          .otherwise(lit(null).cast("double")).as("corr"))
    }
    staged
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("p"))
      .select("p.*")
  }

  /** Mutual information (and normalized MI) between two categorical
    * columns — the feature-selection / redundancy readout — on the
    * floored 1e-6 log grid (the text_perplexity discipline: each cell's
    * `ln` lands on an integer grid BEFORE the weighted sum, so the
    * result is bit-replayable cross-engine and partitioning-invariant
    * despite libm differences; the floor can nudge mi a hair below its
    * true non-negative value — deterministically so).
    *
    * `mi_num = Σ_xy c_xy · ⌊ln(N·c_xy / (c_x·c_y))·10⁶⌋` (exact long),
    * `mi = mi_num / (N·10⁶)`; marginal entropies come from the SAME
    * cell table (`Σ_y c_xy = c_x` makes the per-cell weighting exact),
    * and `nmi = mi / √(hx·hy)` in one fixed-order double expression.
    * Rows with a null on either side are dropped (a null category is a
    * completeness question — [[incomplete]] — not a dependence one).
    *
    * Scale shape: one `groupBy(x, y)` with map-side combine is the only
    * data-sized motion; the windows and the final 1-row aggregate run
    * over the CELL table (≤ |X|·|Y| rows — category cross-product
    * sized, driver-safe by the categorical contract). Ratios are formed
    * in doubles before multiplying, so no c_x·c_y long overflow at any N.
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("string").as("x"), col(yCol).cast("string").as("y"))
    val cells = base
      .groupBy("x", "y").agg(count(lit(1)).as("cxy"))
      .withColumn("cx", sum("cxy").over(Window.partitionBy("x")))
      .withColumn("cy", sum("cxy").over(Window.partitionBy("y")))
      .withColumn("n", sum("cxy").over(Window.partitionBy()))
    def lnGrid(r: Column) = floor(log(r) * 1000000.0).cast("long")
    val agg0 = cells.agg(
      max("n").as("n"),
      sum(col("cxy") * lnGrid(col("n").cast("double") * col("cxy").cast("double") /
        (col("cx").cast("double") * col("cy").cast("double")))).as("mi_num"),
      (-sum(col("cxy") * lnGrid(col("cx").cast("double") / col("n").cast("double"))))
        .as("hx_num"),
      (-sum(col("cxy") * lnGrid(col("cy").cast("double") / col("n").cast("double"))))
        .as("hy_num"))
    val nD = col("n").cast("double") * 1000000.0
    val mi = col("mi_num").cast("double") / nD
    val hx = col("hx_num").cast("double") / nD
    val hy = col("hy_num").cast("double") / nD
    agg0.select(
      col("n"), col("mi_num"), mi.as("mi"), hx.as("hx"), hy.as("hy"),
      when(col("hx_num") > 0L && col("hy_num") > 0L, mi / sqrt(hx * hy))
        .otherwise(lit(null).cast("double")).as("nmi"))
  }

  /** Grouped simple-regression trend lines on the exact grid: per group,
    * the OLS slope and intercept of `yCol` over `xCol` — the bit-stable
    * "is this metric trending" readout ([[corrExact]]'s sufficient-
    * statistics frame; z-score trends from a sample would be neither
    * exact nor partitioning-invariant). The four DECIMAL(19) sums are
    * order-free; slope `= (nΣxy − ΣxΣy)/(nΣx² − Σx²)` and intercept
    * `= (Σy − slope·Σx)/n` combine in fixed-order doubles; a zero-variance
    * x (single distinct grid value) yields nulls. One partial-agg'd
    * group aggregate — the same motion as any `groupBy().agg`.
    */
  def olsExact(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      gridScale: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def grid(c: String) = floor(col(c).cast("double") * gridScale.toDouble).cast("long")
    val d19 = DecimalType(19, 0)
    val agg0 = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), grid(xCol).as("__x"), grid(yCol).as("__y"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x").cast(d19)).as("__sx"),
        sum(col("__y").cast(d19)).as("__sy"),
        sum(col("__x").cast(d19) * col("__y").cast(d19)).as("__sxy"),
        sum(col("__x").cast(d19) * col("__x").cast(d19)).as("__sxx"))
    val nD = col("n").cast("double")
    val num = nD * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")
    val vx = nD * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val slope = when(vx =!= 0.0, num / vx).otherwise(lit(null).cast("double"))
    agg0.select(
      col(groupCol), col("n"),
      slope.as("slope_grid"),
      when(slope.isNotNull,
        (col("__sy").cast("double") - slope * col("__sx").cast("double")) / nD)
        .otherwise(lit(null).cast("double")).as("intercept_grid"))
  }

  /** Grouped TWO-feature OLS (`y ~ x1 + x2`) solved in closed form by
    * Cramer's rule over the 3×3 normal equations — multiple regression
    * with the corr_exact guarantees: the NINE sufficient statistics are
    * order-free DECIMAL sums on the 2^20 grid, and the determinants
    * combine in ONE fixed order of IEEE doubles, so coefficients are
    * bit-stable across engines and partitionings. Returns
    * `(group, n, b0, b1, b2)` (grid units); a singular system (collinear
    * or constant features) yields nulls. One partial-agg'd group
    * aggregate — the same motion as any `groupBy().agg`.
    */
  def ols2Exact(
      df: DataFrame,
      groupCol: String,
      x1Col: String,
      x2Col: String,
      yCol: String,
      gridScale: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.DecimalType
    def grid(c: String) = floor(col(c).cast("double") * gridScale.toDouble).cast("long")
    val d38 = DecimalType(38, 0)
    def s(c: Column) = sum(c.cast(d38))
    val a = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), grid(x1Col).as("__x1"), grid(x2Col).as("__x2"),
        grid(yCol).as("__y"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        s(col("__x1")).as("__s1"), s(col("__x2")).as("__s2"),
        s(col("__y")).as("__sy"),
        s(col("__x1") * col("__x1")).as("__s11"),
        s(col("__x2") * col("__x2")).as("__s22"),
        s(col("__x1") * col("__x2")).as("__s12"),
        s(col("__x1") * col("__y")).as("__s1y"),
        s(col("__x2") * col("__y")).as("__s2y"))
    def D(c: Column) = c.cast("double")
    // det3 in the fixed order a(ei−fh) − b(di−fg) + c(dh−eg)
    def det3(a1: Column, b1: Column, c1: Column,
        a2: Column, b2: Column, c2: Column,
        a3: Column, b3: Column, c3: Column): Column =
      a1 * (b2 * c3 - c2 * b3) - b1 * (a2 * c3 - c2 * a3) +
        c1 * (a2 * b3 - b2 * a3)
    val (n, s1, s2, sy) = (D(col("n")), D(col("__s1")), D(col("__s2")), D(col("__sy")))
    val (s11, s22, s12, s1y, s2y) =
      (D(col("__s11")), D(col("__s22")), D(col("__s12")), D(col("__s1y")), D(col("__s2y")))
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    a.select(col(groupCol), col("n"),
      when(det =!= 0.0, det0 / det).otherwise(lit(null).cast("double")).as("b0"),
      when(det =!= 0.0, det1 / det).otherwise(lit(null).cast("double")).as("b1"),
      when(det =!= 0.0, det2 / det).otherwise(lit(null).cast("double")).as("b2"))
  }

  /** Grouped Spearman rank correlation — the monotone-association readout
    * robust to outliers and nonlinearity that Pearson misreads. Computed
    * as [[corrExact]] over EXACT average ranks: for a value with `cb` rows
    * strictly below it and `c` tied rows, the average rank is
    * `cb + (c+1)/2`, carried DOUBLED (`2·cb + c + 1`) so ties' half-ranks
    * stay integers — Pearson is scale-invariant, so the doubling cancels
    * and the result is the textbook tie-corrected Spearman ρ, bit-stable
    * across engines and partitionings.
    *
    * Scale shape: one `(group, value)` histogram per column (map-side
    * partials), a running-count window over each histogram — HISTOGRAM-
    * sized, so intended for bounded-cardinality columns (ratings, bucket
    * ids, quantities; pre-grid continuous columns first) — and one
    * broadcast-sized join of ranks back onto the rows, then corrExact's
    * single five-sum aggregate. No data-sized sort anywhere.
    */
  def spearmanExact(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).as("__x"), col(yCol).as("__y"))
    def ranks(c: String, out: String) = {
      val w = Window.partitionBy("__g").orderBy(c)
        .rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(col("__g"), col(c)).agg(count(lit(1)).as("__c"))
        .select(col("__g"), col(c),
          (lit(2L) * coalesce(sum(col("__c")).over(w), lit(0L)) +
            col("__c") + lit(1L)).as(out))
    }
    val joined = base
      .join(ranks("__x", "__drx"), Seq("__g", "__x"))
      .join(ranks("__y", "__dry"), Seq("__g", "__y"))
      .withColumnRenamed("__g", groupCol)
    corrExact(joined, groupCol, "__drx", "__dry", gridScale = 1L)
      .withColumnRenamed("corr", "spearman")
  }

  /** Exact Mann–Whitney U rank test, each group against the REST of the
    * pooled sample — the nonparametric "did the distribution shift"
    * readout experimentation needs when means mislead (heavy tails,
    * ordinal metrics). With two groups this is the classic two-sample
    * U test (the two rows carry U₁/U₂ with z₂ = −z₁); with k groups each
    * row tests group-vs-rest.
    *
    * Exactness ([[spearmanExact]]'s doubled-rank construction, pooled):
    * ranks come from the value histogram as `2·below + ties + 1` — exact
    * longs, no midrank halves — so `2U_g = Σ c·dr − n_g(n_g+1)` is an
    * exact integer (DECIMAL(38) internally; emitted as `u2`, the DOUBLED
    * U). The tie-corrected normal approximation
    * `z = (U − n_g·n_rest/2) / σ`, with
    * `σ² = n_g·n_rest/12 · [(n+1) − Σ(t³−t)/(n(n−1))]`, combines the
    * exact integer parts in ONE fixed-order double expression — bit-
    * replayable cross-engine. All values tied (σ² ≤ 0) yields null z.
    *
    * Scale shape: one histogram aggregate over values, one per-(group,
    * value) aggregate, a broadcast of the 1-row totals; the rank window
    * runs over the DISTINCT-VALUE histogram (value-cardinality sized —
    * the weighted-median discipline), never over rows.
    */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val (perGroup, tot) = rankLedger(df, groupCol, valueCol)
    val nD = col("__n").cast("double")
    val ngD = col("__ng").cast("double")
    val nrD = nD - ngD
    val sig2 = ngD * nrD / 12.0 *
      ((nD + 1.0) - col("__tie").cast("double") / (nD * (nD - 1.0)))
    val u2 = (col("__r2") - (col("__ng").cast(d38) * (col("__ng") + 1L))).cast("long")
    perGroup
      .crossJoin(broadcast(tot))
      .select(col("__g").as(groupCol), col("__ng").as("n"), u2.as("u2"),
        when(sig2 > 0.0, (u2.cast("double") - ngD * nrD) / (lit(2.0) * sqrt(sig2)))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  /** The shared pooled-rank sufficient statistics of [[mannWhitney]] and
    * [[kruskalWallis]]: per group the size and EXACT doubled rank sum
    * (`Σ c·dr`, DECIMAL(38)), plus the 1-row pooled totals `(n, Σt³−t)`.
    * The rank window runs over the distinct-value histogram.
    */
  private def rankLedger(
      df: DataFrame,
      groupCol: String,
      valueCol: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"), col(valueCol).as("__v"))
    val hv = base.groupBy("__v").agg(count(lit(1)).as("__tc"))
    val w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hv.select(col("__v"), col("__tc"),
      (lit(2L) * coalesce(sum("__tc").over(w), lit(0L)) + col("__tc") + 1L).as("__dr"))
    val tot = hv.agg(
      sum(col("__tc")).as("__n"),
      sum(col("__tc").cast(d38) * col("__tc") * col("__tc") - col("__tc")).as("__tie"))
    val perGroup = base
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
      .join(ranked, "__v")
      .groupBy("__g")
      .agg(sum(col("__c")).as("__ng"),
        sum(col("__c").cast(d38) * col("__dr")).as("__r2"))
    (perGroup, tot)
  }

  /** Kruskal–Wallis H (k-group rank ANOVA) with tie correction — "did
    * ANY group's distribution shift", the omnibus companion to
    * [[mannWhitney]]'s per-group readout, over the same exact rank
    * ledger. With doubled rank sums `R2_g = 2R_g`:
    * `H = 3/(N(N+1)) · Σ_g R2_g²/n_g − 3(N+1)` and the tie-corrected
    * `H' = H / (1 − Σ(t³−t)/(N³−N))`.
    *
    * Determinism: each group's `R2_g²/n_g` is ONE double from exact
    * integers; the k-term sum folds in SORTED group order through a
    * collected array (both engines reduce the identical sequence left to
    * right — the cross-engine answer to "double addition does not
    * commute"), and the closing combine is fixed-order. For k = 2,
    * `H' = z²` of [[mannWhitney]] (spec-pinned). All-tied data (the
    * correction denominator hits 0) yields null.
    *
    * @return one row: (k, n, h, h_corrected)
    */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val (perGroup, tot) = rankLedger(df, groupCol, valueCol)
    val term = col("__r2").cast("double") * col("__r2").cast("double") /
      col("__ng").cast("double")
    val folded = perGroup
      .select(col("__g"), term.as("__t"))
      .agg(count(lit(1)).as("k"),
        sort_array(collect_list(struct(col("__g"), col("__t")))).as("__arr"))
      .select(col("k"),
        aggregate(col("__arr"), lit(0.0), (acc, x) => acc + x.getField("__t"))
          .as("__s"))
    val nD = col("__n").cast("double")
    folded
      .crossJoin(broadcast(tot))
      .select(col("k"), col("__n").as("n"),
        (lit(3.0) / (nD * (nD + 1.0)) * col("__s") - lit(3.0) * (nD + 1.0)).as("h"),
        {
          val corr = lit(1.0) - col("__tie").cast("double") / (nD * nD * nD - nD)
          when(col("__n") > 1L && corr > 0.0,
            (lit(3.0) / (nD * (nD + 1.0)) * col("__s") - lit(3.0) * (nD + 1.0)) / corr)
            .otherwise(lit(null).cast("double")).as("h_corrected")
        })
  }

  /** Order-free table CONTENT checksum — the data-contract primitive
    * behind "did the migration/compaction/rewrite preserve the rows":
    * every row is encoded injectively ([[Snapshot.diff]]'s marker +
    * length + value cells), md5'd, and its first 15 hex digits (60 bits,
    * always positive) summed into a DECIMAL(38). Row order, partitioning
    * and file layout cannot move the sum; any single-cell change almost
    * surely does (a forged collision needs md5 preimages). One map-side
    * pass + a 1-row reduction; compare checksums, never data.
    *
    * @return one row: (n_rows, checksum) — checksum as a decimal string
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum needs at least one column")
    val enc = concat_ws("", cols.map { c =>
      val s = coalesce(col(c).cast("string"), lit(""))
      concat(when(col(c).isNull, lit("0")).otherwise(lit("1")),
        length(s).cast("string"), lit(":"), s)
    }: _*)
    df.select(conv(substring(md5(enc), 1, 15), 16, 10)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h")).cast("string").as("checksum"))
  }

  /** Welch's unequal-variance t-test, each group against the REST — the
    * parametric companion of [[mannWhitney]] (means with heteroskedastic
    * groups; the A/B default when the metric is roughly symmetric).
    *
    * Exactness (the abReport/kappa discipline): values arrive on an
    * integer grid, so per-group `(n, Σx, Σx²)` aggregate exactly as
    * DECIMAL(38); the variance-over-n terms are the exact rationals
    * `A_g = (n_g·Σx² − (Σx)²) / (n_g²·(n_g−1))`, and
    * `t = ((S_g·n_r − S_r·n_g)/(n_g·n_r)) / √(A_g + A_r)` plus the
    * Welch–Satterthwaite `df = (A_g+A_r)² / (A_g²/(n_g−1) + A_r²/(n_r−1))`
    * combine those exact integers in ONE fixed-order double expression —
    * bit-replayable cross-engine. Degenerate groups (n < 2 either side,
    * or zero variance both sides) yield null t, never NaN.
    *
    * Scale shape: ONE scan into one group aggregate; rest-statistics come
    * from totals folded in an unbounded window over the GROUP-SIZED stats
    * frame (the feature_woe lesson — a separate totals aggregate would
    * re-embed the scan).
    */
  def welchT(df: DataFrame, groupCol: String, valueGrid: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val x = valueGrid.cast("long")
    val stats = df
      .filter(x.isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x.cast(d38)).as("__s"),
        sum((x * x).cast(d38)).as("__q"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val d = (c: Column) => c.cast("double")
    val wst = stats
      .withColumn("__nr", sum(col("n")).over(all) - col("n"))
      .withColumn("__sr", (sum(col("__s")).over(all) - col("__s")).cast(d38))
      .withColumn("__qr", (sum(col("__q")).over(all) - col("__q")).cast(d38))
    // guarded up front: a singleton side divides by n-1 = 0 under ANSI
    // before the t-level when() could mask it
    val ag = when(col("n") >= 2,
      (d(col("__q")) * d(col("n")) - d(col("__s")) * d(col("__s"))) /
        (d(col("n")) * d(col("n")) * (d(col("n")) - 1.0)))
    val ar = when(col("__nr") >= 2,
      (d(col("__qr")) * d(col("__nr")) - d(col("__sr")) * d(col("__sr"))) /
        (d(col("__nr")) * d(col("__nr")) * (d(col("__nr")) - 1.0)))
    wst
      .withColumn("__ag", ag)
      .withColumn("__ar", ar)
      .select(col(groupCol), col("n"),
        (d(col("__s")) / d(col("n"))).as("mean"),
        when(col("n") >= 2 && col("__nr") >= 2 && (col("__ag") + col("__ar")) > 0.0,
          // cross-products stay in double (exact below 2^53 — grid·rows
          // contract) so the SQL replay needs no decimal-width gymnastics
          ((d(col("__s")) * d(col("__nr")) - d(col("__sr")) * d(col("n"))) /
            (d(col("n")) * d(col("__nr")))) / sqrt(col("__ag") + col("__ar")))
          .otherwise(lit(null).cast("double")).as("t"),
        when(col("n") >= 2 && col("__nr") >= 2 && (col("__ag") + col("__ar")) > 0.0,
          ((col("__ag") + col("__ar")) * (col("__ag") + col("__ar"))) /
            (col("__ag") * col("__ag") / (d(col("n")) - 1.0) +
              col("__ar") * col("__ar") / (d(col("__nr")) - 1.0)))
          .otherwise(lit(null).cast("double")).as("df_welch"))
  }

  /** Kendall's τ-b per group between two DISCRETE columns (Kendall 1945,
    * tie-corrected form) via the CONTINGENCY-TABLE reduction — the
    * rank-correlation sibling of [[spearman]] that counts concordant vs
    * discordant PAIRS, robust to any monotone rescaling of either axis.
    *
    * The naive definition is an O(n²) pair sweep — a scale cliff. When
    * both variables are discrete with bounded domains (k_x · k_y cells),
    * every pair statistic is a function of the contingency table alone:
    * `C = Σ n_ij · Σ_{i'>i, j'>j} n_i'j'` (concordant),
    * `D = Σ n_ij · Σ_{i'>i, j'<j} n_i'j'` (discordant),
    * tie terms `n1 = Σ_x t_x(t_x−1)/2`, `n2 = Σ_y u_y(u_y−1)/2`, and
    * `τ_b = (C−D)/√((n0−n1)(n0−n2))` with `n0 = n(n−1)/2`. One corpus
    * aggregate builds the cells; everything after is CELL-PAIR work —
    * O(k²) per group, scale-free in row count. Sufficient statistics ride
    * DECIMAL(38,0) (`(n0−n1)(n0−n2)` overflows Int64 past n ≈ 3·10⁹ —
    * the [[Sampling.neymanAllocation]] discipline) and τ_b lands on the
    * 2²⁰ grid through one IEEE sqrt + one divide on identical operands.
    *
    * `xCol`/`yCol` must be integral bucket columns (hour-of-day, fixed
    * value bins, ordinal grades); the result is EXACT τ-b of the
    * discretized variables — the discretization is the caller's stated
    * model, not an approximation knob.
    */
  def kendallTauB(
      df: DataFrame,
      groupCol: String,
      xCol: Column,
      yCol: Column): DataFrame = {
    val cells = df
      .select(col(groupCol).as("g"), xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("g", "x", "y")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // cell-sized; consumed by pairs + both margins
    val pairStats = cells.as("a")
      .join(cells.as("b"),
        col("a.g") === col("b.g") && col("a.x") < col("b.x"))
      .groupBy(col("a.g").as("g"))
      .agg(
        sum(when(col("a.y") < col("b.y"),
          col("a.c").cast("decimal(38,0)") * col("b.c")).otherwise(lit(0)))
          .as("c_pairs"),
        sum(when(col("a.y") > col("b.y"),
          col("a.c").cast("decimal(38,0)") * col("b.c")).otherwise(lit(0)))
          .as("d_pairs"))
    val margins = cells.groupBy("g").agg(sum(col("c")).as("n"))
    val tx = cells.groupBy("g", "x").agg(sum(col("c")).as("t"))
      .groupBy("g").agg(expr("sum(t * (t - 1)) DIV 2").as("n1"))
    val ty = cells.groupBy("g", "y").agg(sum(col("c")).as("u"))
      .groupBy("g").agg(expr("sum(u * (u - 1)) DIV 2").as("n2"))
    margins.join(tx, "g").join(ty, "g").join(pairStats, "g")
      .select(col("g").as(groupCol), col("n"),
        col("c_pairs").cast("long").as("c_pairs"),
        col("d_pairs").cast("long").as("d_pairs"),
        col("n1"), col("n2"),
        floor(
          (col("c_pairs") - col("d_pairs")).cast("double") * 1048576.0 /
            sqrt(expr(
              """(CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2 - n1)
                | * (CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2 - n2)"""
                .stripMargin).cast("double")))
          .cast("long").as("tau_b_grid"))
  }
}
