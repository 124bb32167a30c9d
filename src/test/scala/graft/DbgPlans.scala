package graft
import graft.TestSpark
object DbgPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val df = SparkEntry.queries("quality_topfrac")(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"ELAPSED ${(System.nanoTime()-t0)/1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
