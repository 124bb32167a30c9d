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

  test("neymanAllocation: no Int64 wrap on large cent-valued strata (DECIMAL(38) path)") {
    // 60k rows at ~1e6 cents: n*Σx² ≈ 6e16·1e6 = 6e22 ≫ Long.MaxValue
    // (9.2e18). Pre-fix, non-ANSI long arithmetic wrapped silently →
    // negative variance → sqrt(NaN) → garbage. The DECIMAL(38,0) path
    // must produce finite positive weights and a budget-exact allocation.
    val big = spark.range(60000).select(
      when(col("id") % 2 === 0, "even").otherwise("odd").as("seg"),
      (lit(900000L) + (col("id") % 200000L)).as("v"))
    val out = graft.ops.Sampling.neymanAllocation(big, "seg", col("v"), 1000L)
      .select("stratum", "w_grid", "alloc").as[(String, Long, Long)].collect()
    assert(out.length == 2)
    out.foreach { case (s, w, a) =>
      assert(w > 0L, s"stratum $s weight must be positive, got $w (overflow?)")
      assert(a > 0L, s"stratum $s allocation must be positive, got $a")
    }
    assert(out.map(_._3).sum == 1000L, "allocations must sum to the budget")
  }

  test("fixture contract: documents.text is pure ASCII at sf0.001 and sf0.01") {
    // The multimodal_dhash gate couples the compiled kernel (UTF-8 BYTES)
    // to its DuckDB oracle (code points via ord/substr); the two agree
    // exactly when every character is < 0x80 AND byte length == char
    // length. This test makes that parity contract explicit: if a future
    // fixture adds non-ASCII text, this fails loudly instead of the gate
    // mysteriously hash-mismatching.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bad = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("text").isNotNull)
        .filter(
          length(encode(col("text"), "UTF-8")) =!= length(col("text")) ||
            col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(bad == 0L, s"$d/documents has $bad non-ASCII texts — the " +
        "dhash byte/codepoint parity contract no longer holds")
    }
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
