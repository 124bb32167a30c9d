package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Small-input parallelism guard for CPU-DENSE stages (hash cascades,
  * per-token kernels, signature pipelines): a few-megabyte parquet scan
  * arrives as ONE partition (`spark.sql.files.maxPartitionBytes` splits by
  * bytes, not by downstream cost), so everything pipelined on top of it —
  * including a 16-permutation MinHash or a 48-replica bootstrap — runs
  * single-task no matter how many cores the cluster has. AQE cannot help:
  * it only re-plans around SHUFFLES, and a scan→project→partial-agg
  * prefix has none.
  *
  * `densify` hash-repartitions to `defaultParallelism` ONLY when the
  * input arrives in fewer partitions: at warehouse scale a real scan
  * already carries orders of magnitude more partitions than cores and
  * this is a no-op (checked from the compiled physical plan — a
  * driver-side inspection, no job). The shuffled bytes in the guarded
  * case are by definition small (few partitions ⇒ small scan).
  */
object Partitioning {

  /** Repartition `df` on `keys` to `defaultParallelism` when it arrives in
    * fewer partitions; identity otherwise. Hash partitioning (not
    * round-robin) keeps the exchange sort-free and deterministic.
    */
  def densify(df: DataFrame, keys: Column*): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par, keys: _*) else df
  }
}
