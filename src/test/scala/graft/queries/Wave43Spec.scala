package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-43 operators: Shewhart c-chart, Gwet's AC1. */
class Wave43Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("events_control_chart: verdict is the disjunction, limits behave") {
    val rows = graft.SparkEntry.queries("events_control_chart")(spark, dir)
      .select("event_type", "n_events", "above_ucl", "below_lcl", "out_of_control")
      .as[(String, Long, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, c, up, dn, out) =>
      assert(out == (up || dn), s"$t: verdict must be the disjunction")
      assert(!(up && dn), s"$t: a day cannot breach both limits")
      assert(c > 0, s"$t: observed days carry events")
    }
  }

  test("events_control_chart: a 100x spike day is flagged above the UCL") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w43").toString
    val rows = (for {
      d <- 1 to 20
      i <- 1 to (if (d == 15) 1000 else 10)
    } yield ((d * 10000 + i).toLong,
      java.sql.Timestamp.valueOf(f"2024-03-$d%02d 09:00:00"),
      1L, "spiky", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val flagged = graft.SparkEntry.queries("events_control_chart")(spark, tmp)
      .filter(col("day") === "2024-03-15")
      .select("above_ucl").as[Boolean].head()
    assert(flagged, "the 100x spike day must breach the upper control limit")
    val quiet = graft.SparkEntry.queries("events_control_chart")(spark, tmp)
      .filter(col("day") =!= "2024-03-15" && col("above_ucl"))
      .count()
    assert(quiet == 0, "no ordinary day may breach the UCL")
  }

  test("label_gwet_ac1: identical raters score exactly 1; value within [-1, 1]") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w43b").toString
    val rows = for (o <- 1 to 40; ln <- 1 to 2)
      yield (o.toLong, ln, (o % 3) * 10.0 + 1.0)
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val perfect = graft.SparkEntry.queries("label_gwet_ac1")(spark, tmp)
      .select("gwet_ac1").as[Double].head()
    assert(math.abs(perfect - 1.0) < 1e-12, s"identical raters must score 1, got $perfect")
    val fx = graft.SparkEntry.queries("label_gwet_ac1")(spark, dir)
      .select("n_items", "n_agree", "gwet_ac1").as[(Long, Long, Double)].head()
    assert(fx._2 <= fx._1)
    assert(fx._3 >= -1.0 - 1e-9 && fx._3 <= 1.0 + 1e-9, s"AC1 out of range: ${fx._3}")
  }
}
