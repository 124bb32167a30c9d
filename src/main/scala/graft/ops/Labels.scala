package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Annotation aggregation: collapse many (item, label) votes into one
  * consensus label per item — the step every labeled-training-set build
  * runs between raw annotations (crowd workers, model ensembles, heuristic
  * taggers) and the training table. Majority vote with a DETERMINISTIC
  * total order on candidates ((votes DESC, label ASC)) so ties never
  * depend on execution order, plus the agreement ratio the curriculum /
  * quality-filter stages key on (drop items annotators disagree about, or
  * route them to re-review).
  *
  * Exactness: counts are longs; agreement ships as the (top, total) long
  * pair rather than a ratio — division is the consumer's choice of
  * precision, not baked in.
  *
  * Scale shape: `groupBy(item, label)` partial-aggregates map-side (the
  * vote stream collapses to distinct (item, label) pairs before the only
  * shuffle), then a per-item window over the handful of candidate labels
  * picks the winner. 100 TB of votes, item-cardinality output, no join, no
  * driver state. Skew = one hot item's label set, which is at most the
  * label vocabulary — bounded by construction.
  *
  * No reference analog — pipeline-extension layer.
  */
object Labels {

  /** One row per item: the winning label, its vote count, and the item's
    * total votes. `agreement = votes_top / votes_total` is left to the
    * caller (long/long).
    */
  def majority(
      votes: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val counts = votes
      .filter(col(itemCol).isNotNull)
      .groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("votes_top"))
    val byItem = Window.partitionBy(itemCol)
    val ranked = Window.partitionBy(itemCol)
      .orderBy(col("votes_top").desc, col(labelCol).asc_nulls_last)
    counts
      .withColumn("votes_total", sum(col("votes_top")).over(byItem))
      .withColumn("__rn", row_number().over(ranked))
      .filter(col("__rn") === 1)
      .select(col(itemCol), col(labelCol).as("label"),
        col("votes_top"), col("votes_total"))
  }

  /** Cohen's kappa between two annotators: chance-corrected agreement over
    * the items BOTH rated — the inter-annotator-agreement gate every
    * labeling campaign runs before trusting its consensus labels
    * (κ ≲ 0.4 ⇒ re-write the guidelines, don't train on the labels).
    *
    * Exactness (the [[Experiment.abReport]] discipline): the L×L
    * contingency cells aggregate exactly as longs; the chance-agreement
    * pieces that can overflow (`N·agree`, `N²`, the margin products)
    * compute as DECIMAL(38,0) — exact — and
    * `κ = (N·agree − Σ rowAₗ·rowBₗ) / (N² − Σ rowAₗ·rowBₗ)` is ONE
    * fixed-order double expression of correctly-rounded casts, bit-stable
    * under any partitioning and replayable cross-engine. A degenerate
    * denominator (both raters constant) yields null, not NaN.
    *
    * Scale shape: one item-keyed join (the only corpus-sized exchange),
    * collapsed immediately to the |labels|²-sized cell table; margins and
    * the final combine are windows/aggregates over that tiny table.
    *
    * @param a (itemCol, labelCol) — rater A, at most one row per item
    * @param b rater B, same schema contract
    * @return one row: (n_items, n_agree, kappa)
    */
  def cohenKappa(
      a: DataFrame,
      b: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val cells = a
      .filter(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .select(col(itemCol), col(labelCol).as("__la"))
      .join(
        b.filter(col(itemCol).isNotNull && col(labelCol).isNotNull)
          .select(col(itemCol), col(labelCol).as("__lb")),
        Seq(itemCol))
      .groupBy(col("__la"), col("__lb"))
      .agg(count(lit(1)).as("__c"))
    val totals = cells.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n_items"),
      coalesce(sum(when(col("__la") === col("__lb"), col("__c")).otherwise(0L)), lit(0L))
        .as("n_agree"))
    val pe = cells.groupBy(col("__la")).agg(sum(col("__c")).as("__ra"))
      .join(
        cells.groupBy(col("__lb")).agg(sum(col("__c")).as("__rb")),
        col("__la") === col("__lb"))
      .agg(coalesce(sum(col("__ra").cast(d38) * col("__rb").cast(d38)), lit(0).cast(d38))
        .as("__pe"))
    val n = col("n_items").cast(d38)
    val numer = (n * col("n_agree").cast(d38) - col("__pe")).cast("double")
    val denom = (n * n - col("__pe")).cast("double")
    totals.crossJoin(pe).select(
      col("n_items"), col("n_agree"),
      when(denom =!= 0.0, numer / denom).otherwise(lit(null).cast("double")).as("kappa"))
  }

  /** Items whose consensus is WEAK: agreement strictly below
    * `minNumer/minDenom` (exact long cross-multiplication, no doubles) —
    * the re-review queue.
    */
  def disputed(
      votes: DataFrame,
      itemCol: String,
      labelCol: String,
      minNumer: Long,
      minDenom: Long): DataFrame = {
    require(minDenom > 0, "minDenom must be positive")
    majority(votes, itemCol, labelCol)
      .filter(col("votes_top") * minDenom < col("votes_total") * minNumer)
  }

  /** Krippendorff's alpha (nominal) — the agreement coefficient that
    * HANDLES MISSING RATINGS: any number of raters per unit, units with a
    * single rating simply don't pair (Cohen's kappa needs a complete
    * 2-rater grid). `α = 1 − D_o/D_e` over the pairable values; this is
    * the multi-annotator quality gate for crowd-labeled training data.
    *
    * Exactness: the per-unit 1/(m_u−1) weights are the one fractional
    * piece, so observed disagreement is carried ×`L = lcm(1..maxRaters−1)`
    * — `(L DIV (m_u−1))·Σ_c cnt_cu·(m_u−cnt_cu)` is an exact long for
    * every unit — and expected disagreement is the exact integer
    * `L·Σ_c n_c·(n−n_c)` (marginals n_c are plain counts). The closing
    * `α = 1 − ((n−1)·do_L) / de_L` is ONE double division; everything
    * upstream is integer. Units with more than `maxRaters` ratings fail
    * IN-PLAN (`raise_error`) rather than silently mis-weighting.
    *
    * Scale shape: one (unit, value) aggregate, one unit-sized m join, one
    * value-marginal aggregate with a 1-row total broadcast — nothing
    * row-scale moves twice.
    *
    * @return one row: (n, n_units, do_num, de_num, alpha) — alpha null
    *         when D_e = 0 (all pairable ratings share one value)
    */
  def krippendorffAlpha(
      ratings: DataFrame,
      unitCol: String,
      valueCol: String,
      maxRaters: Int = 8): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 41,
      s"maxRaters in [2, 41] (lcm fits a long), got $maxRaters")
    val L = (1 until maxRaters).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    // cnt feeds the unit sizes AND the pairable join — pin one evaluation
    val cnt = ratings
      .filter(col(unitCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(unitCol).as("__u"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val m = cnt.groupBy("__u").agg(sum(col("__c")).as("__m"))
      .filter(col("__m") >= 2)
      .withColumn("__m",
        when(col("__m") > maxRaters,
          raise_error(concat(lit(s"unit exceeds maxRaters=$maxRaters: "),
            col("__u").cast("string"))))
          .otherwise(col("__m")))
    val paired = cnt.join(m, "__u")
    val doL = paired
      .agg(sum(expr(s"($L DIV (__m - 1)) * __c * (__m - __c)")).as("do_L"),
        sum(col("__c")).as("n"))
    val nUnits = m.agg(count(lit(1)).as("n_units"))
    paired.groupBy("__v").agg(sum(col("__c")).as("__nc"))
      .crossJoin(broadcast(doL))
      .agg(
        first(col("n")).as("n"),
        first(col("do_L")).as("do_L"),
        sum(col("__nc") * (col("n") - col("__nc"))).as("__deSum"))
      .crossJoin(broadcast(nUnits))
      .select(
        col("n"), col("n_units"),
        ((col("n") - 1) * col("do_L")).as("do_num"),
        (lit(L) * col("__deSum")).as("de_num"))
      .withColumn("alpha",
        when(col("de_num") > 0,
          lit(1.0) - col("do_num").cast("double") / col("de_num").cast("double"))
          .otherwise(lit(null).cast("double")))
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Preference-pair mining for DPO/RLHF-style training sets: within each
    * group (prompt, domain, language), rank candidates by an integer
    * quality grid and pair rank i with rank n+1−i — best against worst,
    * second-best against second-worst — keeping pairs whose score margin
    * clears `minMargin` (a preference with no margin teaches nothing).
    * The symmetric-extremes pairing maximizes the summed margin among
    * perfect matchings that use each item at most once (spec-executed on
    * a brute-force check), and the (score desc, id asc) total order makes
    * the pair set deterministic under any partitioning.
    *
    * Scale shape: one group-keyed rank window; the chosen↔rejected match
    * is an EQUI-join on (group, computed partner rank) of the pinned
    * ranked table — no inequality join, no per-group quadratic stage.
    *
    * @return (groupCol, chosen_id, rejected_id, margin) — margin =
    *         chosen score − rejected score on the caller's grid
    */
  def preferencePairs(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreGrid: Column,
      minMargin: Long): DataFrame = {
    require(minMargin >= 1, s"minMargin must be >= 1, got $minMargin")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__sc").desc, col(idCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    // feeds both sides of the partner join — pin one evaluation
    val ranked = df
      .filter(scoreGrid.isNotNull)
      .select(col(groupCol), col(idCol), scoreGrid.cast("long").as("__sc"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .localCheckpoint(true)
    val rejected = ranked.select(
      col(groupCol).as("__g2"), col(idCol).as("rejected_id"),
      col("__sc").as("__rsc"), col("__rn").as("__prn"))
    ranked
      .filter(col("__rn") * 2 < col("__n") + 1)
      .join(rejected,
        col(groupCol) === col("__g2") &&
          col("__prn") === col("__n") + 1 - col("__rn"))
      .select(col(groupCol), col(idCol).as("chosen_id"), col("rejected_id"),
        (col("__sc") - col("__rsc")).as("margin"))
      .filter(col("margin") >= minMargin)
  }
}
