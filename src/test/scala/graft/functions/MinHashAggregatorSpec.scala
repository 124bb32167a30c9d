package graft.functions

import graft.TestSpark
import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("group signature equals element-wise min of doc signatures") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val shingled = docs.select(
      col("source"),
      TextOps.wordShingles(col("text"), 3).as("shingles"))
    val sigs = shingled.select(
      col("source"),
      Dedup.minhashSignature(col("shingles"), 16).cast("array<bigint>").as("sig"))
    val perDoc = sigs.as[(String, Array[Long])].collect()
    val expected = perDoc.groupBy(_._1).view.mapValues { rows =>
      rows.map(_._2).reduce((a, b) => a.zip(b).map(t => math.min(t._1, t._2)))
    }.toMap
    val got = sigs.groupBy("source")
      .agg(MinHashAggregator.groupSignature(col("sig"), 16).as("g"))
      .as[(String, Array[Long])].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (s, sig) => assert(sig.sameElements(expected(s)), s) }
  }

  test("estimated jaccard of identical groups is 1.0") {
    val a = Array(1L, 2L, 3L, 4L)
    assert(MinHashAggregator.estimatedJaccard(a, a) == 1.0)
    assert(MinHashAggregator.estimatedJaccard(a, Array(1L, 9L, 3L, 9L)) == 0.5)
  }

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
