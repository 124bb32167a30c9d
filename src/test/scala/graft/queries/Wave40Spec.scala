package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-40 operators: k-map risk, Kendall's W, hash-collision audit. */
class Wave40Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("privacy_kmap: population k bounds the sample count, flag is honest") {
    val rows = graft.SparkEntry.queries("privacy_kmap")(spark, dir)
      .select("n_sample", "k_pop", "risky").as[(Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ns, kp, r) =>
      assert(kp >= ns, "the sample cannot outnumber its population combo")
      assert(ns >= 1, "released combos only")
      assert(r == (kp < 5), "risk flag must be k_pop < 5")
    }
  }

  test("label_kendall_w: perfectly concordant raters score exactly W = 1") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w40").toString
    // 6 orders x 3 raters, every rater ranks the orders identically and
    // without ties -> the textbook W = 1 case
    val rows = for (o <- 1 to 6; r <- 1 to 3)
      yield (o.toLong, r, o.toDouble)
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val w = graft.SparkEntry.queries("label_kendall_w")(spark, tmp)
      .select("n_items", "kendall_w").as[(Long, Double)].head()
    assert(w._1 == 6L)
    assert(math.abs(w._2 - 1.0) < 1e-12, s"concordant W must be 1, got ${w._2}")
  }

  test("label_kendall_w: fixture value within [0,1]") {
    val w = graft.SparkEntry.queries("label_kendall_w")(spark, dir)
      .select("kendall_w").as[Double].head()
    assert(w >= 0.0 && w <= 1.0 + 1e-12, s"W out of range: $w")
  }

  test("vectorize_hash_collisions: histogram accounts for the whole vocabulary") {
    val hist = graft.SparkEntry.queries("vectorize_hash_collisions")(spark, dir)
      .select("n_terms", "n_buckets", "total_tf").as[(Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
    val vocab = docs.select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
      .select("w").distinct().count()
    val toks = docs.select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
      .count()
    assert(hist.map(_._2).sum <= 512, "cannot exceed the hash-space size")
    assert(hist.map(h => h._1 * h._2).sum == vocab,
      "terms-per-bucket histogram must cover every vocabulary term once")
    assert(hist.map(_._3).sum == toks,
      "bucket tf mass must equal the token stream size")
  }
}
