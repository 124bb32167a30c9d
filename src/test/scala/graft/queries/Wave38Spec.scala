package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-38 operators: TextRank keywords, source MinHash overlap matrix,
  * Gopher quality-rule screen.
  */
class Wave38Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("text_textrank: 20 keywords, scores on the 2^40 grid, strictly ordered") {
    val rows = graft.SparkEntry.queries("text_textrank")(spark, dir)
      .select("word", "score").as[(String, Long)].collect()
    assert(rows.length == 20, s"expected top-20, got ${rows.length}")
    assert(rows.forall(_._2 >= 164926744166L),
      "every score carries at least the restart mass")
    val resorted = rows.sortBy { case (w, s) => (-s, w) }.toSeq
    assert(rows.toSeq == resorted, "output must be (score desc, word asc)")
    assert(rows.map(_._1).distinct.length == 20, "keywords must be distinct")
  }

  test("source_overlap_matrix: all unordered source pairs, grid within [0, 2^20]") {
    val out = graft.SparkEntry.queries("source_overlap_matrix")(spark, dir)
      .select("source_a", "source_b", "n_agree", "jaccard_est_grid")
      .as[(String, String, Long, Long)].collect()
    val nSrc = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("source").distinct().count().toInt
    assert(out.length == nSrc * (nSrc - 1) / 2,
      s"expected ${nSrc * (nSrc - 1) / 2} pairs, got ${out.length}")
    out.foreach { case (a, b, agree, grid) =>
      assert(a < b, s"pairs must be ordered: ($a, $b)")
      assert(agree >= 0 && agree <= 16, s"($a,$b): agree $agree outside [0,16]")
      assert(grid == agree * 1048576L / 16, s"($a,$b): grid/agree mismatch")
    }
  }

  test("source_overlap_matrix: a source overlaps itself fully (kernel sanity)") {
    // duplicate one source under two names: their group signatures must
    // agree on every component -> grid exactly 2^20
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull && col("source") === "src0")
    val twin = d.withColumn("source", lit("zz_twin"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_w38").toString
    d.unionByName(twin).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val out = graft.SparkEntry.queries("source_overlap_matrix")(spark, tmp)
      .filter(col("source_a") === "src0" && col("source_b") === "zz_twin")
      .select("jaccard_est_grid").as[Long].head()
    assert(out == 1048576L, s"identical corpora must agree 16/16, got $out")
  }

  test("text_gopher_rules: verdict is the conjunction; counts are consistent") {
    val rows = graft.SparkEntry.queries("text_gopher_rules")(spark, dir)
      .select("n_words", "sum_wlen", "n_alpha_words", "n_stop",
        "r_word_count", "r_mean_wlen", "r_hash_ratio", "r_ellipsis_ratio",
        "r_alpha_frac", "r_stopwords", "gopher_pass")
      .as[(Long, Long, Long, Long,
        Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach {
      case (nw, sl, na, ns, r1, r2, r3, r4, r5, r6, pass) =>
        assert(pass == (r1 && r2 && r3 && r4 && r5 && r6), "verdict != AND")
        assert(na <= nw, "alpha words cannot exceed words")
        assert(ns <= nw, "stopword hits cannot exceed words")
        assert(sl >= nw, "every token has length >= 1")
    }
  }

  test("text_gopher_rules: hand-built pathological docs trip the right rules") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w38b").toString
    val good = ("the of and to in " + Seq.fill(45)("alpha").mkString(" "))
    val hashy = Seq.fill(60)("#tag").mkString(" ") + " the of"
    Seq((1L, good, "en", "s", good.length.toLong),
      (2L, hashy, "en", "s", hashy.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = graft.SparkEntry.queries("text_gopher_rules")(spark, tmp)
      .select("doc_id", "r_word_count", "r_hash_ratio", "r_alpha_frac", "gopher_pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(1L)._2 && m(1L)._3 && m(1L)._4 && m(1L)._5,
      s"the well-formed doc must pass, got ${m(1L)}")
    assert(!m(2L)._3, "a 60x'#tag' doc must fail the hash-ratio rule")
    assert(!m(2L)._5, "and therefore the overall verdict")
  }
}
