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

}
