package graft.core

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions.broadcast

/** The datafrog-style three-set relation instance, re-expressed over Spark
  * Datasets (reference: core/src/database/instance.rs:103-206).
  *
  *  - `stable`: batches already reflected in all dependent views. Each batch
  *    is distinct and the batches are mutually disjoint (promotion anti-joins
  *    against stable), so their union needs no dedup.
  *  - `recent`: the batch added but not yet propagated to views.
  *  - `toAdd`: staged insert batches; possibly overlapping/duplicated.
  *
  * Batches are materialized per [[Instance.CheckpointPolicy]]: the IVM loop
  * would otherwise grow an unbounded lineage of unions/joins across epochs,
  * blowing up Catalyst analysis time. Materialization truncates lineage each
  * epoch — the moral equivalent of the reference's sorted runs. Counts ride
  * along so the geometric-compaction rule can be applied without extra jobs.
  *
  * Promotion is delta-proportional (reference: the gallop anti-join,
  * core/src/database/helpers.rs:7-26, is O(batch·log stable)): a small staged
  * batch is broadcast and stable is scanned map-side by a broadcast left-semi
  * join — stable never shuffles. Only when the staged batch itself is huge
  * (a bulk load into a non-empty store) does promotion fall back to a full
  * EXCEPT, which is then proportional to the data actually being loaded.
  *
  * At cluster scale each batch is a partitioned Dataset; the compaction rule
  * (merge trailing batches while `last.count <= 2 * recent.count`, reference
  * instance.rs:177-187) keeps the number of stable batches O(log n) so scans
  * stay cheap.
  */
final class Instance[T](
    empty: => Dataset[T],
    policy: Instance.CheckpointPolicy = Instance.LocalCheckpoint) {

  import Instance.Run

  private var stableBatches: Vector[Run[T]] = Vector.empty
  private var recentBatch: Option[(Dataset[T], Long)] = None
  private var toAdd: Vector[Dataset[T]] = Vector.empty
  private var batchCounter = 0

  /** Stage a batch; O(1), no Spark job (reference: instance.rs:127-131). */
  def insert(ds: Dataset[T]): Unit = synchronized { toAdd :+= ds }

  /** Deep-copy the three sets. Batches are immutable materialized Datasets,
    * so a snapshot shares them — O(#batches) driver work, zero data copied
    * (the Spark analog of the reference's `Clone`, database.rs:345-363).
    */
  private[core] def snapshot(
      newPolicy: Instance.CheckpointPolicy = policy): Instance[T] = synchronized {
    val c = new Instance[T](empty, newPolicy)
    c.stableBatches = stableBatches
    c.recentBatch = recentBatch
    c.toAdd = toAdd
    // Future materializations land in the snapshot's own directory, so the
    // batch counter restarts; existing batches are shared and immutable.
    c.batchCounter = if (newPolicy == policy) batchCounter else 0
    c
  }

  def stable: Dataset[T] =
    stableBatches.map(_.ds).reduceOption(_ union _).getOrElse(empty)

  def recent: Dataset[T] = recentBatch.map(_._1).getOrElse(empty)

  def hasRecent: Boolean = recentBatch.nonEmpty
  def pendingCount: Int = toAdd.size
  private[core] def stableBatchCount: Int = stableBatches.size
  def stableCount: Long = stableBatches.map(_.count).sum

  /** Materialize a batch, truncating lineage per the checkpoint policy. */
  private def materialize(ds: Dataset[T]): Dataset[T] = policy match {
    case Instance.LocalCheckpoint =>
      // Fast: blocks live in executor block managers. A lost executor loses
      // the store — acceptable in local mode / recomputable pipelines.
      ds.localCheckpoint(true)
    case Instance.ReliableStore(dir) =>
      // Durable: each batch is written to the store directory as parquet and
      // read back, so state survives executor loss and JVM restart
      // (re-attach via [[Instance.loadBatches]]).
      val path = {
        batchCounter += 1
        s"$dir/batch_$batchCounter"
      }
      ds.write.mode(SaveMode.Overwrite).parquet(path)
      ds.sparkSession.read.schema(ds.schema).parquet(path).as(ds.encoder)
  }

  /** Advance one epoch (reference: instance.rs:173-206):
    *  1. fold `recent` into `stable`, geometrically compacting trailing
    *     batches (merge while `last.count <= 2 * recent.count`);
    *  2. drain ALL `toAdd` batches in one round, dedup, anti-join against
    *     stable (broadcast-semi, delta-proportional), and make the genuinely
    *     new tuples the new `recent`;
    *  3. return whether `recent` is non-empty.
    */
  def changed(): Boolean = synchronized {
    recentBatch.foreach { r =>
      var merged: Run[T] = Run(r._1, r._2, 0)
      while (stableBatches.nonEmpty && stableBatches.last.count <= 2 * merged.count) {
        val last = stableBatches.last
        stableBatches = stableBatches.init
        // Batches are disjoint: plain union, no distinct needed; logical
        // union only — counts add, no Spark job.
        merged = Run(
          last.ds.union(merged.ds),
          last.count + merged.count,
          math.max(last.depth, merged.depth) + 1)
      }
      if (merged.depth > Instance.MaxUnionDepth)
        merged = Run(materialize(merged.ds), merged.count, 0)
      stableBatches :+= merged
      recentBatch = None
    }
    if (toAdd.nonEmpty) {
      val staged =
        (if (toAdd.size == 1) toAdd.head else toAdd.reduce(_ union _)).distinct()
      toAdd = Vector.empty
      val stagedCp = materialize(staged)
      val stagedN = stagedCp.count()
      val (cp, n) =
        if (stableBatches.isEmpty || stagedN == 0) (stagedCp, stagedN)
        else {
          val novel =
            if (stagedN <= Instance.BroadcastPromoteMaxRows) {
              // Delta-proportional path: stable streams map-side against the
              // broadcast staged batch; the duplicates found are at most
              // |staged| rows, and the final EXCEPT runs on two batch-sized
              // sets. Stable is never shuffled.
              val sDf = stable.toDF()
              val nDf = stagedCp.toDF()
              val cond = sDf.columns
                .map(c => sDf(c) <=> nDf(c))
                .reduce(_ && _)
              val dups = sDf.join(broadcast(nDf), cond, "left_semi").as(stagedCp.encoder)
              stagedCp.except(dups)
            } else
              // Bulk load into a non-empty store: a broadcast would not fit;
              // fall back to the full anti-join (work ∝ data being loaded).
              stagedCp.except(stable)
          val ncp = materialize(novel)
          (ncp, ncp.count())
        }
      if (n > 0) { recentBatch = Some((cp, n)); true }
      else false
    } else false
  }
}

object Instance {

  /** A stable run: dataset, row count, and union-lineage depth since the
    * last materialization. Compaction merges are LOGICAL unions (free —
    * counts add, no job); a merge only re-materializes once its lineage
    * depth exceeds [[MaxUnionDepth]], bounding both plan size and the number
    * of materialization jobs per epoch.
    */
  private[core] final case class Run[T](ds: Dataset[T], count: Long, depth: Int)

  /** Max logical-union lineage depth of a stable run before it is
    * re-materialized: folds below this depth cost zero Spark jobs; the
    * materialization amortizes to O(1) per `MaxUnionDepth` merges.
    */
  val MaxUnionDepth = 4

  /** Largest staged batch (rows) promoted via the broadcast-semi path; bigger
    * batches fall back to a full EXCEPT against stable. Guards driver/executor
    * memory: a broadcast relation is built once per executor.
    */
  val BroadcastPromoteMaxRows: Long = 1L << 20

  /** Where epoch state lives once materialized. */
  sealed trait CheckpointPolicy extends Serializable

  /** Executor-block-manager checkpoints: fastest, not fault-tolerant — a lost
    * executor loses the store. The right default for local mode and for
    * pipelines that can replay inserts.
    */
  case object LocalCheckpoint extends CheckpointPolicy

  /** Durable store: every materialized batch is persisted as parquet under
    * `dir` and scanned back. Survives executor loss and JVM restart; an
    * instance's content can be re-attached with [[loadBatches]].
    */
  final case class ReliableStore(dir: String) extends CheckpointPolicy

  /** Re-read everything a [[ReliableStore]] instance persisted under `dir` —
    * the restart-recovery path (stable ∪ recent content; staged-but-never-
    * stabilized inserts were never materialized and are the caller's to
    * replay, exactly like the reference's in-memory `to_add`).
    */
  def loadBatches(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$dir/batch_*")
}
