package graft.core

import org.apache.spark.sql.Dataset

/** The datafrog-style three-set relation instance, re-expressed over Spark
  * Datasets (reference: core/src/database/instance.rs:103-206).
  *
  *  - `stable`: batches already reflected in all dependent views. Each batch
  *    is distinct and the batches are mutually disjoint (promotion anti-joins
  *    against stable), so their union needs no dedup.
  *  - `recent`: the batch added but not yet propagated to views.
  *  - `toAdd`: staged insert batches; possibly overlapping/duplicated.
  *
  * Batches are `localCheckpoint`ed: the IVM loop would otherwise grow an
  * unbounded lineage of unions/excepts across epochs, blowing up Catalyst
  * analysis time. Checkpointing truncates lineage each epoch — the moral
  * equivalent of the reference's materialized sorted runs. Counts ride along
  * so the geometric-compaction rule can be applied without extra jobs.
  *
  * At cluster scale each batch is a partitioned in-memory Dataset; the
  * compaction rule (merge trailing batches while `last.count <= 2 *
  * recent.count`, reference instance.rs:177-187) keeps the number of stable
  * batches O(log n) so scans stay cheap.
  */
final class Instance[T](empty: => Dataset[T]) {

  import Instance.Run

  private var stableBatches: Vector[Run[T]] = Vector.empty
  private var recentBatch: Option[(Dataset[T], Long)] = None
  private var toAdd: Vector[Dataset[T]] = Vector.empty

  /** Stage a batch; O(1), no Spark job (reference: instance.rs:127-131). */
  def insert(ds: Dataset[T]): Unit = synchronized { toAdd :+= ds }

  /** Deep-copy the three sets. Batches are immutable checkpointed Datasets,
    * so a snapshot shares them — O(#batches) driver work, zero data copied
    * (the Spark analog of the reference's `Clone`, database.rs:345-363).
    */
  private[core] def snapshot(): Instance[T] = synchronized {
    val c = new Instance[T](empty)
    c.stableBatches = stableBatches
    c.recentBatch = recentBatch
    c.toAdd = toAdd
    c
  }

  def stable: Dataset[T] =
    stableBatches.map(_.ds).reduceOption(_ union _).getOrElse(empty)

  def recent: Dataset[T] = recentBatch.map(_._1).getOrElse(empty)

  def hasRecent: Boolean = recentBatch.nonEmpty
  def pendingCount: Int = toAdd.size
  private[core] def stableBatchCount: Int = stableBatches.size
  def stableCount: Long = stableBatches.map(_.count).sum

  /** Advance one epoch (reference: instance.rs:173-206):
    *  1. fold `recent` into `stable`, geometrically compacting trailing
    *     batches (merge while `last.count <= 2 * recent.count`);
    *  2. drain `toAdd`, dedup, anti-join against all stable batches, and make
    *     the genuinely-new tuples the new `recent`;
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
        merged = Run(merged.ds.localCheckpoint(true), merged.count, 0)
      stableBatches :+= merged
      recentBatch = None
    }
    if (toAdd.nonEmpty) {
      val staged =
        (if (toAdd.size == 1) toAdd.head else toAdd.reduce(_ union _)).distinct()
      val novel =
        if (stableBatches.isEmpty) staged
        else staged.except(stable) // EXCEPT DISTINCT = the gallop anti-join's job
      val cp = novel.localCheckpoint(true)
      val n = cp.count()
      toAdd = Vector.empty
      if (n > 0) { recentBatch = Some((cp, n)); true }
      else false
    } else false
  }
}

object Instance {

  /** A stable run: dataset, row count, and union-lineage depth since the
    * last checkpoint. Compaction merges are LOGICAL unions (free — counts
    * add, no job); a merge only re-checkpoints once its lineage depth
    * exceeds [[MaxUnionDepth]], bounding both plan size and the number of
    * materialization jobs per epoch.
    */
  private[core] final case class Run[T](ds: Dataset[T], count: Long, depth: Int)

  /** Max logical-union lineage depth of a stable run before it is
    * re-checkpointed: folds below this depth cost zero Spark jobs; the
    * checkpoint amortizes to O(1) per `MaxUnionDepth` merges.
    */
  val MaxUnionDepth = 4
}
