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

  /** Jobs started by `body`, counted listener-side but scoped by a unique
    * job group: bus residue from earlier tests' jobs (delivered after the
    * listener attaches) carries a different/absent group and is ignored. A
    * sentinel job in the SAME group runs after `body`; the bus is FIFO, so
    * once the sentinel's event lands every `body` job event has too.
    */
  private def probeJobs[A](body: => A): (A, Int) = {
    val group = s"graft_probe_${java.util.UUID.randomUUID()}"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id")) jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "densify probe window")
      val result =
        try body
        finally {
          // sentinel, same group: an RDD count is exactly ONE job (a SQL
          // count() under AQE runs one job per query stage)
          spark.sparkContext.range(0, 1).count()
          spark.sparkContext.clearJobGroup()
        }
      val deadline = System.nanoTime() + 10e9.toLong
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      (result, jobs.get() - 1)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("a one-file parquet scan widens; the probe runs ZERO jobs") {
    val par = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft_densify").toString
    (1L to 500L).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val (out, ran) = probeJobs(Partitioning.densify(df, col("id")))
    assert(ran == 0,
      s"the probe must size the scan from the compiled plan, not by running jobs ($ran ran)")
    assert(out.rdd.getNumPartitions == par,
      "a one-split scan must widen to defaultParallelism")
  }

  test("a shuffle-shaped input under AQE: identity, and the probe executes NOTHING upstream") {
    // the r12 probe (df.rdd.getNumPartitions) materialized the adaptive
    // plan, executing every upstream stage at DataFrame-construction time;
    // the probe must now neither run jobs nor change the plan
    val left = (1L to 2000L).map(i => (i % 50, i)).toDF("k", "v")
    val agg = left.groupBy("k").count().join(
      (1L to 50L).toDF("k"), Seq("k"))
    val (out, ran) = probeJobs(Partitioning.densify(agg, col("k")))
    assert(ran == 0,
      s"probing a shuffle-shaped plan must not execute its stages ($ran jobs ran)")
    assert(out.queryExecution.logical eq agg.queryExecution.logical,
      "post-shuffle parallelism is already configured — identity")
  }

  test("a leaf the probe cannot size driver-side passes through untouched") {
    // widening a cached relation could inject a full-data shuffle on a
    // big input; the guard must refuse to guess and return the input
    val df = (1L to 1000L).toDF("id").cache()
    try {
      df.count()
      val out = Partitioning.densify(df, col("id"))
      assert(out.queryExecution.logical eq df.queryExecution.logical,
        "unknown-sized leaves (InMemoryTableScan) must pass through")
    } finally df.unpersist()
  }
}
