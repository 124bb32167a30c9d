package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the sketch-based queries (`approx_parts`,
  * `approx_quantiles`) — the constant-memory 100 TB companions of the exact
  * aggregates. Sketch internals are engine-specific, so these are spec
  * gates, not oracles: each estimate is bounded against the exact answer.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact on lineitem partkeys") {
    val r = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(
        approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(r._1 - r._2).toDouble / r._2 < 0.05, r.toString)
  }

  test("approx_percentile brackets between exact quantiles at q ± rank tolerance") {
    // accuracy 10000 → rank error ≤ 1e-4·n; bracket with a generous ±0.01
    // in quantile space so the bound is robust to ties
    val q = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(
        expr("approx_percentile(o_totalprice, 0.5D, 10000)").as("approx"),
        expr("percentile(o_totalprice, 0.49D)").as("lo"),
        expr("percentile(o_totalprice, 0.51D)").as("hi"))
      .as[(String, Double, Double, Double)].collect()
    assert(q.nonEmpty)
    q.foreach { case (g, a, lo, hi) =>
      assert(a >= lo && a <= hi, s"group $g: approx $a outside [$lo, $hi]")
    }
  }
}
