package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-41 operators: Cohen's d, linear-weighted kappa, Ljung–Box. */
class Wave41Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ab_cohens_d: arms populated, d finite, means consistent with arms") {
    val r = graft.SparkEntry.queries("ab_cohens_d")(spark, dir)
      .select("n_a", "n_b", "mean_a", "mean_b", "cohens_d")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(!r._5.isNaN && !r._5.isInfinite, s"d must be finite, got ${r._5}")
    // same-distribution arms: effect size must be small on a null split
    assert(math.abs(r._5) < 0.5, s"null-split |d| should be small, got ${r._5}")
  }

  test("label_weighted_kappa: identical raters score exactly 1") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w41").toString
    val rows = for (o <- 1 to 40; ln <- 1 to 2)
      yield (o.toLong, ln, (o % 5) * 10.0 + 1.0)
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val k = graft.SparkEntry.queries("label_weighted_kappa")(spark, tmp)
      .select("n_items", "d_obs", "kappa_w").as[(Long, Long, Double)].head()
    assert(k._1 == 40L && k._2 == 0L)
    assert(math.abs(k._3 - 1.0) < 1e-12, s"identical raters must score 1, got ${k._3}")
  }

  test("label_weighted_kappa: fixture value within [-1, 1] and moments consistent") {
    val k = graft.SparkEntry.queries("label_weighted_kappa")(spark, dir)
      .select("n_items", "d_obs", "d_exp", "kappa_w")
      .as[(Long, Long, Double, Double)].head()
    assert(k._1 > 0 && k._2 >= 0 && k._3 > 0)
    assert(k._4 >= -1.0 - 1e-9 && k._4 <= 1.0 + 1e-9, s"kappa_w out of range: ${k._4}")
    assert(math.abs(k._4 - (1.0 - k._1.toDouble * k._2 / k._3)) < 1e-9,
      "kappa_w must equal 1 - n*D_obs/D_exp")
  }

  test("events_ljung_box: one row per type, Q nonnegative, flag honest") {
    val rows = graft.SparkEntry.queries("events_ljung_box")(spark, dir)
      .select("event_type", "n_days", "q_grid", "lb_reject")
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, nd, q, rej) =>
      assert(nd > 6, s"$t: need more days than max lag")
      assert(q >= 0, s"$t: Q is a sum of squares, got $q")
      assert(rej == (q > 11608445L), s"$t: flag/threshold mismatch")
    }
  }

  test("events_ljung_box: a strongly trending series rejects white noise") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w41b").toString
    // 30 days, day d gets d^2 events -> massive positive autocorrelation
    val rows = for {
      d <- 1 to 30
      i <- 1 to d * d
    } yield ((d * 1000 + i).toLong,
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
      1L, "trend", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.SparkEntry.queries("events_ljung_box")(spark, tmp)
      .select("lb_reject").as[Boolean].head()
    assert(r, "a quadratic trend must fail the white-noise test")
  }
}
