package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** MERGE (upsert/delete) a change batch into a snapshot — the lakehouse
    * write primitive between [[diff]] (which derives changes) and
    * [[scd2]] (which histories them): `changes` carries an `opCol` in
    * {insert, update, delete} plus the key and content columns; the
    * result is the next snapshot version.
    *
    * Semantics: delete drops the base row; insert and update both land
    * the change row (upsert — an insert over an existing key overwrites,
    * an update without a base row inserts; the permissive MERGE every
    * engine converges on). At most one change per key per batch is the
    * caller's contract — enforce upstream with [[Checks.duplicateKeys]]
    * over the change batch (two changes to one key in one batch have no
    * defined order).
    *
    * Scale shape: ONE full-outer key join of base against the batch-sized
    * change set. Full-outer joins cannot broadcast a side in Spark, so
    * the motion floor is one co-partitioning of both inputs by the key —
    * the honest cost of exact keyed application that must also surface
    * never-matched base rows. On a base maintained across batches, key-
    * bucketed storage ([[graft.sources.Sources.writeBucketed]]) makes the
    * base's half of that exchange a no-op at every apply.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need key columns")
    val contentCols = base.columns.filterNot(keyCols.contains)
    val ch = changes.select(
      keyCols.map(col) ++
        contentCols.map(c => col(c).as(s"__ch_$c")) :+ col(opCol).as("__op"): _*)
    base.join(ch, keyCols, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "delete")
      .select(
        keyCols.map(col) ++ contentCols.map { c =>
          when(col("__op").isNotNull, col(s"__ch_$c")).otherwise(col(c)).as(c)
        }: _*)
  }

  /** Type-2 slowly-changing-dimension build from an attribute change log:
    * collapse each key's consecutive runs of an equal attribute value into
    * validity intervals `[valid_from, valid_to)` with `is_current` on the
    * open run — the dimension-table shape every warehouse derives from CDC
    * feeds (and the natural consumer of [[diff]]'s change stream).
    *
    * Semantics (gaps-and-islands): observations are totally ordered per key
    * by `(tsCol, idCol)` (the id breaks timestamp ties deterministically —
    * without it, equal-timestamp logs would make the run boundaries
    * ambiguous). A run is a maximal consecutive span with the same
    * `attrCol` value; re-appearing values start a NEW run (A→B→A is three
    * intervals, the type-2 contract). `valid_to` is the next run's
    * `valid_from` (half-open intervals tile the timeline with no gaps);
    * the last run has `valid_to` null and `is_current` true. `n_obs`
    * counts the observations collapsed into the run. Null attribute values
    * are legal and compare as a distinct value (null≠non-null boundaries
    * are run boundaries; null==null extends a run) via the null-safe
    * comparison.
    *
    * Scale shape: ONE hash shuffle on the key, then two window passes and
    * one partial aggregation inside the same key partitioning (Catalyst
    * reuses the exchange — the sort for the second window is free, it
    * inherits the first's). No join, no driver state; 100 TB of log
    * collapses to runs-sized output. Skewed keys cost one partition sort
    * each — the same bound as any per-key sessionization.
    *
    * No reference analog — pipeline-extension layer.
    */
  def scd2(
      log: DataFrame,
      keyCol: String,
      attrCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    // run boundary: first observation of the key, or attr changed vs. the
    // predecessor under the (ts, id) total order; <=> is null-safe so a
    // null attribute forms runs like any other value
    val boundary = when(row_number().over(byTime) === 1, 1L)
      .when(!(col(attrCol) <=> lag(col(attrCol), 1).over(byTime)), 1L)
      .otherwise(0L)
    val runs = log
      .select(col(keyCol), col(attrCol), col(tsCol), col(idCol))
      .withColumn("__run", sum(boundary).over(byTime))
      .groupBy(col(keyCol), col("__run"))
      .agg(
        first(col(attrCol)).as(attrCol), // constant within a run
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val byRun = Window.partitionBy(keyCol).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }

  /** INCREMENTAL [[scd2]] maintenance: apply an APPEND-ONLY observation
    * batch to an existing dimension without recomputing history — the
    * lakehouse "merge CDC into the dimension" step, and the IVM shape of
    * SCD2 (history rows never move; only each touched key's CURRENT row
    * and the batch-derived runs change).
    *
    * Semantics (given the append-only contract): the batch's runs are
    * computed by the same gaps-and-islands discipline; a key's first
    * batch run either EXTENDS the key's current run (equal attribute —
    * n_obs adds, validity stays open or chains into the next batch run)
    * or CLOSES it (`valid_to` = first differing observation's time) and
    * appends; keys new to the dimension append whole. Null attributes
    * compare null-safely, exactly as in [[scd2]]. The result is
    * bit-identical to `scd2(full log)` — the `scd2_incremental` gate
    * replays that equivalence through two successive applies.
    *
    * CONTRACT — append-only per key: every batch observation must
    * postdate (under the `(tsCol, idCol)` order) every observation
    * already folded into `dim` for that key. Late/out-of-order data
    * cannot be detected from the collapsed dimension (runs don't retain
    * last-observation times) and yields undefined intervals — rebuild
    * from the log instead, or route late keys to a rebuild path.
    *
    * Scale shape: batch runs are batch-sized; the dimension joins the
    * batch's FIRST-run dim (keys-sized, broadcastable) once — history
    * rows pass through with no per-row work beyond the join probe, and
    * on a key-bucketed dimension store the probe is shuffle-free. Motion
    * is O(|dim| scan + |batch|), never O(full log) — the point of
    * maintaining instead of rebuilding.
    */
  def scd2Apply(
      dim: DataFrame,
      batch: DataFrame,
      keyCol: String,
      attrCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    // PIN both inputs once: `dim` feeds curDim AND the pass-through scan,
    // `brIdx` feeds ann AND firstInfo — without materialization a CHAIN of
    // applies re-embeds every earlier apply's plan at each reference
    // (2^applies recomputation, the stage-chain disease), and the prior
    // dimension is exactly the engine's own batch-promotion case
    val dimP = dim.localCheckpoint(true)
    val w = Window.partitionBy(keyCol).orderBy(col("valid_from"))
    val brIdx = scd2(batch, keyCol, attrCol, tsCol, idCol)
      .withColumn("__ri", row_number().over(w))
      .localCheckpoint(true)
    // explicit presence markers: attributes may legitimately be NULL (a
    // null-attr run), so "missing after the left join" must be signalled
    // by a dedicated flag, never by attr nullness
    val curDim = dimP.filter(col("is_current")).select(
      col(keyCol), col(attrCol).as("__dattr"),
      col("valid_from").as("__dfrom"), col("n_obs").as("__dn"),
      lit(true).as("__dhit"))
    val ann = brIdx.join(broadcast(curDim), Seq(keyCol), "left")
    val extendsCur =
      col("__ri") === 1 && coalesce(col("__dhit"), lit(false)) &&
        (col(attrCol) <=> col("__dattr"))
    // every batch run appends, EXCEPT a first run that extends the current
    // dim run (equal attr) — that one is replaced by the merged row below
    val appended = ann
      .filter(!extendsCur)
      .select(col(keyCol), col(attrCol), col("valid_from"), col("n_obs"),
        col("valid_to"), col("is_current"))
    val merged = ann
      .filter(extendsCur)
      .select(col(keyCol), col(attrCol), col("__dfrom").as("valid_from"),
        (col("n_obs") + col("__dn")).as("n_obs"), col("valid_to"), col("is_current"))
    val firstInfo = ann.filter(col("__ri") === 1).select(
      col(keyCol), col(attrCol).as("__battr"), col("valid_from").as("__bfrom"),
      lit(true).as("__bhit"))
    val touched = coalesce(col("__bhit"), lit(false))
    // dim pass-through: history rows unchanged; a touched key's current row
    // is dropped when merged, or closed at the batch's first timestamp
    val dimAdj = dimP.join(broadcast(firstInfo), Seq(keyCol), "left")
      .filter(!(col("is_current") && touched && (col(attrCol) <=> col("__battr"))))
      .select(
        col(keyCol), col(attrCol), col("valid_from"), col("n_obs"),
        when(col("is_current") && touched, col("__bfrom"))
          .otherwise(col("valid_to")).as("valid_to"),
        (col("is_current") && !touched).as("is_current"))
    dimAdj.unionByName(merged).unionByName(appended)
  }

  /** Coalesce overlapping-or-touching `[start, end]` intervals per key —
    * the interval-algebra primitive behind CDC validity-window
    * compaction, subscription/contract coverage, and uptime accounting.
    * An interval joins the running span when its start is ≤ the maximum
    * end seen so far (touching counts as connected — the half-open
    * coverage reading). Returns one row per merged span:
    * `(key, span_start, span_end, n_intervals)`.
    *
    * Scale shape: ONE key shuffle — the gaps-and-islands pair of windows
    * (running max of end over earlier rows, then a cumulative new-island
    * sum) and the final span rollup all share the key partitioning;
    * Catalyst reuses the exchange exactly as in [[scd2]]. Works for any
    * orderable start/end type (timestamps, dates, numerics).
    */
  def mergeIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(keyCol), col(startCol), col(endCol))
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(
        min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .select(col(keyCol), col("span_start"), col("span_end"), col("n_intervals"))
  }
}
