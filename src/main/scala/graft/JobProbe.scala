package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Counts the Spark JOBS a named query runs — the per-epoch action census
  * the IVM optimization needs (guide §1: measure first; the view family's
  * cost is job-scheduling floors, so the job list IS the profile).
  *
  * Usage: JobProbe <sfDir> <query> [query ...]
  * Prints one line per job (id, duration, description/first stage name)
  * and a total per query.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftFunctions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(j.stageInfos.headOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        jobs.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        done.put(j.jobId, j.time)
    }
    spark.sparkContext.addSparkListener(listener)
    for (n <- names) {
      // one untimed warmup so JIT/session setup doesn't pollute the census
      try SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
      graft.queries.ParityQueries.releaseSessions()
      graft.ops.Linkage.releaseShared()
      Thread.sleep(300)
      jobs.clear(); done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(s"================ $n  (${f"$dt%.2f"} s)")
      import scala.jdk.CollectionConverters._
      val rows = jobs.asScala.toSeq.sortBy(_._1)
      rows.foreach { case (id, (t0j, desc)) =>
        val ms = done.get(id).map(t1 => (t1 - t0j).toString + " ms").getOrElse("?")
        println(f"job $id%3d  $ms%10s  $desc")
      }
      println(s"TOTAL jobs: ${rows.size}")
      graft.queries.ParityQueries.releaseSessions()
      graft.ops.Linkage.releaseShared()
    }
    graft.queries.ParityQueries.releaseWarm()
    graft.queries.RelationalQueries.releaseShared()
    spark.stop()
  }
}
