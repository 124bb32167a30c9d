package graft.ops

import org.apache.spark.sql.DataFrame
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
    * One aggregate pass per column, unioned into a (columns × 6) report.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
        .select(
          lit(c).as("col_name"),
          col("n_rows"), col("n_null"), col("n_distinct"),
          col("min_s"), col("max_s"))
    }.reduce(_ unionByName _)
  }

  /** Number of key VALUES appearing more than once (0 = the key is unique). */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(count(lit(1)).as("violations"))

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
}
