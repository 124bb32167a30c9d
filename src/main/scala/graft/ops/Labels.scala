package graft.ops

import org.apache.spark.sql.DataFrame
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
}
