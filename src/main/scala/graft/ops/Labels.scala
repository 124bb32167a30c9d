package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
