package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-34 operators: LSH recall report, duplicate-payment screen,
  * FK-orphan audit.
  */
class Wave34Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("knn_lsh_recall: every query reports 10 truths and a sane hit count") {
    val out = graft.SparkEntry.queries("knn_lsh_recall")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 8)
    out.foreach { case (_, nTrue, nHit, ppm) =>
      assert(nTrue == 10 && nHit >= 0 && nHit <= 10)
      assert(ppm == nHit * 1000000L / 10L)
    }
  }

  test("orders_dup_payments: week-bucket decomposition ≡ brute force; gap and tolerance hold") {
    val out = graft.SparkEntry.queries("orders_dup_payments")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Int)].collect().toSet
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("v"),
        to_date(col("o_orderdate")).as("d"))
      .as[(Long, Long, Long, java.sql.Date)].collect()
    val brute = (for {
      (ka, ca, va, da) <- o; (kb, cb, vb, db) <- o
      if ca == cb && ka < kb
      gap = math.abs((db.toLocalDate.toEpochDay - da.toLocalDate.toEpochDay).toInt)
      if gap <= 7 && math.abs(va - vb) * 4 <= math.min(va, vb)
    } yield (ca, ka, kb, math.min(va, vb), math.max(va, vb), gap)).toSet
    assert(out == brute, s"engine ${out.size} pairs vs brute ${brute.size}")
    out.foreach { case (_, a, b, lo, hi, gap) =>
      assert(a < b && gap <= 7 && (hi - lo) * 4 <= lo)
    }
  }

  test("table_fk_orphans: the fixture is FK-clean and a planted orphan is counted") {
    val out = graft.SparkEntry.queries("table_fk_orphans")(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(out.length == 7)
    assert(out.forall(_._3 == 0L), s"fixture must be FK-clean: ${out.mkString(",")}")
    assert(out.map(_._1).distinct.length == 7)
    // planted orphan: the same anti-join shape counts exactly the bad row
    val child = Seq((1L, 10L), (2L, 11L), (3L, 999L)).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val orphans = child.select(col("fk").as("__k"))
      .join(parent.select(col("pk").as("__k")).distinct(), Seq("__k"), "left_anti")
      .count()
    assert(orphans == 1L)
  }
}
