package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- args) {
      println(s"================ $n")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString)
      graft.queries.ParityQueries.releaseSessions()
    }
    spark.stop()
  }
}
