package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-33 operators: Neyman allocation, Burrows' Delta, dhash SQL scalar. */
class Wave33Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("neymanAllocation: allocations sum to the budget exactly; variable strata get more") {
    // stratum 'wide' has 10x the spread of 'tight' at equal size
    val rows =
      (1 to 100).map(i => ("tight", 1000L + (i % 3))) ++
        (1 to 100).map(i => ("wide", 1000L + (i % 3) * 500L))
    val df = rows.toDF("seg", "v")
    val out = graft.ops.Sampling
      .neymanAllocation(df, "seg", col("v"), budget = 97L)
      .select("stratum", "alloc").as[(String, Long)].collect().toMap
    assert(out.values.sum == 97L, s"allocations must sum to the budget: $out")
    assert(out("wide") > out("tight"), s"variable stratum must get more: $out")
  }

  test("neymanAllocation: largest-remainder rounding is deterministic and exact on ties") {
    val df = (1 to 30).map(i => (s"s${i % 3}", (i % 7).toLong)).toDF("seg", "v")
    val a = graft.ops.Sampling.neymanAllocation(df, "seg", col("v"), 100L)
      .select("stratum", "alloc").as[(String, Long)].collect().toMap
    val b = graft.ops.Sampling.neymanAllocation(df.repartition(13), "seg", col("v"), 100L)
      .select("stratum", "alloc").as[(String, Long)].collect().toMap
    assert(a == b, "allocation must be partitioning-invariant")
    assert(a.values.sum == 100L)
  }

  test("text_burrows: all source pairs, bounded k, zero distance to itself by construction") {
    val out = graft.SparkEntry.queries("text_burrows")(spark, dir)
      .as[(String, String, Long, Long)].collect()
    val sources = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("source").distinct().count()
    assert(out.length == (sources * (sources - 1) / 2),
      s"expected all ${sources}C2 pairs, got ${out.length}")
    out.foreach { case (a, b, k, d) =>
      assert(a < b && k >= 1 && k <= 30 && d >= 0)
    }
    // planted property: a corpus where two sources share the exact same
    // text distribution has delta 0 between them
    val twin = Seq(
      (1L, "alpha beta gamma alpha", "sA"), (2L, "alpha beta gamma alpha", "sB"),
      (3L, "zeta zeta zeta eta", "sC"))
      .toDF("doc_id", "text", "source")
    val words = twin.select(col("source"),
      explode(graft.ops.TextOps.tokens(col("text"))).as("__w"))
    // identical frequency vectors => |f1-f2| = 0 for every word
    val f = words.groupBy("source", "__w").count()
    val fa = f.filter(col("source") === "sA").select(col("__w"), col("count").as("ca"))
    val fb = f.filter(col("source") === "sB").select(col("__w"), col("count").as("cb"))
    assert(fa.join(fb, Seq("__w"), "full_outer")
      .filter(coalesce(col("ca"), lit(0L)) =!= coalesce(col("cb"), lit(0L)))
      .count() == 0)
  }

  test("graft_dhash60 SQL scalar ≡ the compiled kernel on ascii payloads") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("w33_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_dhash60(text) AS h FROM w33_docs")
      .as[(Long, Long)].collect().toMap
    val viaKernel = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect()
      .map { case (id, t) =>
        id -> graft.ops.Multimodal.dhash60Scala(t.getBytes("UTF-8"))
      }.toMap
    assert(viaSql == viaKernel)
    assert(viaSql.nonEmpty)
  }
}
