package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diffing: classify every key as added / removed / changed /
  * unchanged between two versions of a table — the change-data-capture
  * primitive for dataset versioning (what changed between crawl N and
  * crawl N+1, which training shards need rebuilding, audit trails).
  *
  * Contract: `keyCols` identify a row in each snapshot (duplicate keys
  * within one snapshot make "changed" ill-posed — run
  * [[Checks.duplicateKeys]] first). Content equality is md5 over the
  * concatenated `contentCols`, each cell encoded injectively as
  * `marker ++ length ++ ':' ++ value` (null marked distinctly, so a
  * null→empty-string change IS a change; the length prefix keeps cell
  * boundaries unambiguous, so ("a1","b") never collides with ("a","1b")).
  *
  * Scale shape: one digest projection per side (map-side), one full outer
  * join on the key — the minimum data motion any exact diff needs. The
  * digest join ships (key, 32-byte md5), never the content columns.
  *
  * No reference analog — pipeline-extension layer.
  */
object Snapshot {

  /** Row-level diff: `keyCols` plus a `status` in
    * {added, removed, changed, unchanged}.
    */
  def diff(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String],
      contentCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && contentCols.nonEmpty, "need key and content columns")
    // null-safe, injective content digest: the marker distinguishes a null
    // cell from any string, and the length prefix pins each cell boundary
    // so adjacent cells cannot reassociate under concatenation
    def digest(df: DataFrame) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("",
          contentCols.map { c =>
            val s = coalesce(col(c).cast("string"), lit(""))
            concat(when(col(c).isNull, lit("0")).otherwise(lit("1")),
              length(s).cast("string"), lit(":"), s)
          }: _*)).as("__h"): _*)
    val b = digest(before).withColumnRenamed("__h", "__hb")
    val a = digest(after).withColumnRenamed("__h", "__ha")
    b.join(a, keyCols, "full_outer")
      .select(
        keyCols.map(col) :+
          when(col("__hb").isNull, "added")
            .when(col("__ha").isNull, "removed")
            .when(col("__ha") === col("__hb"), "unchanged")
            .otherwise("changed")
            .as("status"): _*)
  }

  /** Aggregate form: one row per status with its key count. */
  def diffSummary(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String],
      contentCols: Seq[String]): DataFrame =
    diff(before, after, keyCols, contentCols)
      .groupBy("status")
      .agg(count(lit(1)).as("n"))
}
