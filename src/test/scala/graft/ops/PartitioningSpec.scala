package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Partitioning.densify]] — the small-input parallelism guard: a
  * CPU-dense stage over a one-partition scan must widen to
  * `defaultParallelism`; an input already at-or-above it must pass
  * through UNTOUCHED (the warehouse-scale no-op half of the contract —
  * at 100 TB the scan out-partitions the cores and densify must never
  * inject a full-data shuffle).
  */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a below-parallelism input widens to defaultParallelism, values intact") {
    val par = spark.sparkContext.defaultParallelism
    val df = (1L to 1000L).toDF("id").coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val out = Partitioning.densify(df, col("id"))
    assert(out.rdd.getNumPartitions == par,
      s"expected $par partitions, got ${out.rdd.getNumPartitions}")
    assert(out.as[Long].collect().sorted.toSeq == (1L to 1000L),
      "densify must be a pure repartition — same rows")
  }

  test("an at-or-above-parallelism input passes through with no exchange") {
    val par = spark.sparkContext.defaultParallelism
    val df = (1L to 1000L).toDF("id").repartition(par + 2)
    val out = Partitioning.densify(df, col("id"))
    assert(out.rdd.getNumPartitions == par + 2,
      "already-parallel input must be untouched")
    // identity, not a new plan: no repartition node appears
    assert(out.queryExecution.logical eq df.queryExecution.logical,
      "densify must return the input unchanged when the guard does not fire")
  }
}
