package graft

/** Writes `.explain("formatted")` output for named queries to files —
  * the plan evidence the optimization rounds commit under `plans/`.
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query> [query ...]
  * Writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftFunctions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote $n")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
      graft.queries.ParityQueries.releaseSessions()
      graft.ops.Linkage.releaseShared()
    }
    graft.queries.ParityQueries.releaseWarm()
    graft.queries.RelationalQueries.releaseShared()
    spark.stop()
  }
}
