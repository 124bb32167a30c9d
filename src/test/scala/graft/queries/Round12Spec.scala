package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 fixes: Gopher ellipsis fidelity (0.1 symbol ratio + the
  * lines-ending-with-ellipsis rule the 0.3 threshold belongs to),
  * c-chart LCL ceil boundary, and the driftCvm DECIMAL(38) guard.
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Ellipsis-bearing corpus the sf fixtures lack (they contain zero
    * '...'): symbol-ratio boundary docs, line-suffix docs (with trailing
    * spaces — rtrim parity), backslash-adjacent dots (oracle regex
    * robustness), and non-overlapping '....'/'.....'/'......' runs.
    */
  private def ellipsisDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r12_ell").toString
    val docs = Seq(
      (9001L, "the cat sat ... on the mat ... and it was ... very good indeed today friend"),
      (9002L, "first line ends here...\nsecond line is fine\nthird one trails off...\nfourth ends too...  \nlast line plain"),
      (9003L, "a\\.b\\.c\\. backslash dots \\...\\ and more ... text x.y.z"),
      (9004L, "dots.... here and..... there and ......wow"))
    docs.map { case (id, t) => (id, t, "en", "fixture", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("text_gopher_rules: non-overlapping ellipsis count, 0.1 symbol bar, line rule") {
    val out = graft.SparkEntry.queries("text_gopher_rules")(spark, ellipsisDir)
      .select("doc_id", "n_ellipsis", "n_lines", "n_ell_lines",
        "r_ellipsis_ratio", "r_ellipsis_lines")
      .as[(Long, Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // 9001: 3 '...' over 15 words — fails the 0.1 symbol bar (passed the
    // old, misplaced 0.3 bar: the regression this spec pins)
    assert(out(9001L)._2 == 3 && !out(9001L)._5,
      "3 ellipses / 15 words must fail the 10*n_ellipsis <= n_words rule")
    assert(out(9001L)._6, "single line not ending in '...' passes the line rule")
    // 9002: 3 of 5 lines end with '...' (one behind trailing spaces) > 30%
    assert(out(9002L)._3 == 5 && out(9002L)._4 == 3 && !out(9002L)._6,
      "3/5 lines ending in '...' must fail the 0.3 line rule")
    // 9003: backslash-adjacent dots still count as literal '...'
    assert(out(9003L)._2 == 2, s"backslash doc: got ${out(9003L)._2}")
    // 9004: non-overlapping runs — 4,5,6 dots yield 1,1,2
    assert(out(9004L)._2 == 4, s"dot runs 4/5/6 count 1+1+2, got ${out(9004L)._2}")
  }

  test("events_control_chart: a starved day lands below the (ceil'd) LCL") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r12_cc").toString
    // 19 days of 100 events + one day of 10: lcl ≈ 66 on the count scale
    val rows = for {
      d <- 1 to 20
      i <- 1 to (if (d == 15) 10 else 100)
    } yield ((d * 10000 + i).toLong,
      java.sql.Timestamp.valueOf(f"2024-03-$d%02d 09:00:00"),
      1L, "starved", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.SparkEntry.queries("events_control_chart")(spark, tmp)
      .select("day", "below_lcl").as[(String, Boolean)].collect().toMap
    assert(out("2024-03-15"), "the starved day must breach the lower limit")
    assert(out.count(_._2) == 1, "only the starved day may breach it")
  }

  test("drift_cvm: guard admits fixture scale and the statistic is sane") {
    val row = graft.SparkEntry.queries("drift_cvm")(spark, dir)
      .select("n_a", "n_b", "cvm_t").as[(Long, Long, Double)].head()
    assert(row._1 > 0 && row._2 > 0)
    assert(row._3 >= 0.0 && !row._3.isNaN,
      s"CvM T is a sum of squares / positive scale, got ${row._3}")
  }
}
