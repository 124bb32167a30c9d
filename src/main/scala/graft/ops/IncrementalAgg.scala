package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained ADDITIVE aggregate over insert-only batches —
  * the aggregate analog of the engine's set-semantics IVM views. The
  * reference has no aggregates at all (SURVEY §2); this extends its
  * incremental-maintenance idea to the rollups an analytics user actually
  * keeps: per-key sums and counts, updated per batch instead of recomputed.
  *
  * Correctness rests on additivity: `agg(A ∪ B) = agg(A) ⊕ agg(B)` for
  * sum/count, so each epoch folds the NEW batch's partial aggregate into
  * the running state — work ∝ |batch| + |state|, never the history. Sums
  * run in DECIMAL: decimal addition is exact and associative, so the
  * incremental result is bit-identical to a full recompute no matter how
  * the inserts were batched (double addition would drift with batching).
  *
  * Scale shape: the partial aggregate is a map-side-combine shuffle of the
  * batch; the merge shuffles only aggregate-sized state (one row per key).
  * State is `localCheckpoint`ed per epoch and superseded state unpersisted
  * — same storage discipline as the engine's `Instance`. At 100 TB the
  * running state is the rollup itself: orders of magnitude smaller than
  * the data, and the only thing that ever re-shuffles.
  *
  * Single-threaded per instance, like the engine's session objects.
  */
final class IncrementalAgg private (
    spark: SparkSession,
    keyCols: Seq[String],
    valueCol: String,
    scale: Int,
    store: Option[String],
    retain: Int = 1) {

  // Accumulate at the FULL widened precision: Spark's sum over decimal
  // yields decimal(38, scale), and re-narrowing the running __sum to a
  // smaller precision each epoch would overflow (silently null under
  // non-ANSI semantics) once the rollup passes the narrow type's integer
  // digits. Narrowing happens once, in current().
  private def wide(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(38, scale))

  private var state: Option[DataFrame] = None
  private var version: Long = 0L

  private[ops] def loadVersion(df: DataFrame, v: Long): Unit = {
    state = Some(df)
    version = v
  }

  /** Materialize the merged epoch state per the storage mode: block-manager
    * checkpoint (fast, transient) or a versioned parquet snapshot under
    * `store` — whole-state-per-epoch, so a `state_v<n>` directory is either
    * complete (its write returned) or ignored by recovery; older versions
    * are garbage-collected only AFTER the new one is fully written, so a
    * crash at any instant leaves a complete latest snapshot on disk. The
    * rollup is orders of magnitude smaller than the data, which is what
    * makes rewrite-per-epoch the right durability shape here (contrast
    * [[graft.core.Instance]], whose batches are data-sized and therefore
    * append + manifest).
    */
  private def materialize(merged: DataFrame): DataFrame = store match {
    case None => merged.localCheckpoint(true)
    case Some(dir) =>
      version += 1
      val path = s"$dir/${IncrementalAgg.StatePrefix}$version"
      merged.write.mode("overwrite").parquet(path)
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // own commit marker, written AFTER the parquet job returns: recovery
      // must not depend on Hadoop's _SUCCESS, which object-store configs
      // commonly disable (mapreduce.fileoutputcommitter.marksuccessfuljobs)
      fs.create(
        new org.apache.hadoop.fs.Path(path, IncrementalAgg.CommitMarker), true).close()
      fs.listStatus(base).map(_.getPath).foreach { p =>
        // retention window: versions older than the trailing `retain`
        // snapshots go; retain = 1 is the classic latest-only store,
        // retain > 1 keeps a time-travel window (readVersion)
        if (IncrementalAgg.stateVersion(p.getName).exists(_ <= version - retain))
          fs.delete(p, true)
      }
      spark.read.schema(merged.schema).parquet(path)
  }

  /** Fold one insert batch into the running aggregate. */
  def update(batch: DataFrame): Unit = {
    val partial = batch
      .groupBy(keyCols.map(col): _*)
      .agg(sum(wide(col(valueCol))).as("__sum"), count(lit(1)).as("__cnt"))
    val merged = state match {
      case None => partial
      case Some(prev) =>
        prev
          .unionByName(partial)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(wide(col("__sum"))).as("__sum"), sum(col("__cnt")).as("__cnt"))
    }
    val next = materialize(merged)
    if (store.isEmpty)
      state.foreach(org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint)
    state = Some(next)
  }

  /** The current rollup: keys, exact decimal sum (surfaced as double for
    * cross-engine comparison), and count.
    */
  def current(sumAs: String = "total", countAs: String = "n"): DataFrame =
    state
      .getOrElse(
        spark.emptyDataFrame) match {
      case df if df.columns.isEmpty => df
      case df =>
        df.select(
          keyCols.map(col) :+
            wide(col("__sum")).cast("double").as(sumAs) :+
            col("__cnt").as(countAs): _*)
    }

  /** Release transient (block-manager) state. Durable parquet snapshots
    * stay on disk — surviving restart is their point; re-attach with
    * [[IncrementalAgg.durable]]. The instance is empty afterwards.
    */
  def close(): Unit = {
    if (store.isEmpty)
      state.foreach(org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint)
    state = None
  }
}

object IncrementalAgg {

  /** A per-`keyCols` running sum/count over `valueCol`, summed in
    * DECIMAL(38, `scale`) — match `scale` to the column's true precision
    * (money: 2) so the incremental result replays exactly in any engine.
    */
  def apply(
      spark: SparkSession,
      keyCols: Seq[String],
      valueCol: String,
      scale: Int = 2): IncrementalAgg =
    new IncrementalAgg(spark, keyCols, valueCol, scale, None)

  private[ops] val StatePrefix = "state_v"
  private[ops] val CommitMarker = "_GRAFT_COMMIT"
  private val StateName = "state_v(\\d+)".r
  private[ops] def stateVersion(name: String): Option[Long] = name match {
    case StateName(v) => Some(v.toLong)
    case _            => None
  }

  /** Durable rollup under `dir`: each epoch persists the whole state as a
    * versioned parquet snapshot (`state_v<n>`), so the rollup survives
    * executor loss and JVM restart — the [[graft.core.Instance.ReliableStore]]
    * discipline, adapted to state that is rollup-sized rather than
    * data-sized. Attaching to a `dir` that already holds snapshots resumes
    * from the highest COMMITTED version (the recovery path): a snapshot
    * counts only if its commit marker exists — the engine's own
    * `_GRAFT_COMMIT` (written after the parquet job returns, so it does
    * not depend on Hadoop's `_SUCCESS`, which object-store configs
    * commonly disable) or, for snapshots written before the marker
    * existed, `_SUCCESS`. A crash mid-write leaves a partial `state_v<n>`
    * with neither marker, which recovery skips in favor of the intact
    * `state_v<n-1>` (the next update overwrites the partial directory).
    * Updates continue from there and supersede it. Single writer per
    * directory, same contract as `ReliableStore`.
    */
  def durable(
      spark: SparkSession,
      keyCols: Seq[String],
      valueCol: String,
      dir: String,
      scale: Int = 2,
      retain: Int = 1): IncrementalAgg = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val agg = new IncrementalAgg(spark, keyCols, valueCol, scale, Some(dir), retain)
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) {
      val latest = fs.listStatus(base)
        .flatMap(s => stateVersion(s.getPath.getName).map(_ -> s.getPath))
        .filter { case (_, p) =>
          // only fully committed snapshots are recovery candidates; accept
          // the legacy _SUCCESS so pre-marker stores stay recoverable
          fs.exists(new org.apache.hadoop.fs.Path(p, IncrementalAgg.CommitMarker)) ||
            fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
        }
        .sortBy(_._1)
        .lastOption
      latest.foreach { case (v, p) =>
        agg.loadVersion(spark.read.parquet(p.toString), v)
      }
    }
    agg
  }

  /** Committed snapshot versions present under `dir`, ascending — the
    * time-travel window a `retain > 1` store keeps on disk. A version
    * counts only with its commit marker (or legacy `_SUCCESS`), the same
    * completeness rule recovery applies.
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base)
      .flatMap(s => stateVersion(s.getPath.getName).map(_ -> s.getPath))
      .filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker)) ||
          fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }
      .map(_._1).sorted.toSeq
  }

  /** TIME TRAVEL: the rollup exactly as it stood after epoch `v` — the
    * "what did the dashboard say last Tuesday" read, answered from the
    * retained snapshot rather than a raw-log replay. Whole-state-per-epoch
    * versioning makes this read trivially consistent: one committed
    * directory IS one epoch's world, no log compaction or manifest
    * reconstruction. Fails loudly when `v` fell outside the retention
    * window (or never committed) — a silent fallback to another version
    * is the one wrong answer a time-travel read can give.
    */
  def readVersion(
      spark: SparkSession,
      dir: String,
      v: Long,
      scale: Int = 2,
      sumAs: String = "total",
      countAs: String = "n"): DataFrame = {
    require(versions(spark, dir).contains(v),
      s"version $v not committed under $dir (have: ${versions(spark, dir)})")
    val df = spark.read.parquet(s"$dir/$StatePrefix$v")
    val keys = df.columns.filterNot(c => c == "__sum" || c == "__cnt")
    df.select(
      keys.map(col).toIndexedSeq :+
        col("__sum").cast(org.apache.spark.sql.types.DecimalType(38, scale))
          .cast("double").as(sumAs) :+
        col("__cnt").as(countAs): _*)
  }
}
