package graft.ops

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKRangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TopK.perKey equals the window formulation") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val got = TopK.perKey(o, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = o.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == expected)
  }

  test("TopK.perKey handles k larger than group size and single-row keys") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 7.0), (2L, 20L, 1.0)).toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"), "v", "id", 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == Set((1L, 11L, 7.0, 1), (1L, 10L, 5.0, 2), (2L, 20L, 1.0, 1)))
  }

  test("TopK.perKey refuses non-comparable order/tie columns with a typed message") {
    val df = Seq((1L, 10L, 5.0)).toDF("k", "id", "v").withColumn("s", struct(col("v")))
    val e = intercept[IllegalArgumentException] {
      TopK.perKey(df, Seq("k"), "s", "id", 3)
    }
    assert(e.getMessage.contains("atomic comparable"), e.getMessage)
    intercept[IllegalArgumentException] { TopK.perKey(df, Seq("k"), "v", "s", 3) }
    // decimal order columns are fine (BigDecimal is Comparable)
    val dec = df.withColumn("d", col("v").cast("decimal(10,2)"))
    assert(TopK.perKey(dec, Seq("k"), "d", "id", 3).count() == 1)
  }

  test("bandJoin equals predicate join, including boundary values") {
    val left = Seq((1L, 0.0), (2L, 49999.999), (3L, 50000.0), (4L, 99999.0), (5L, 150000.0))
      .toDF("id", "v")
    val ranges = Seq((0, 0.0, 50000.0), (1, 50000.0, 100000.0)).toDF("band", "lo", "hi")
    val got = RangeJoin.bandJoin(left, "v", ranges, "lo", "hi", 50000.0)
      .select("id", "band").as[(Long, Int)].collect().toSet
    val expected = left.crossJoin(ranges)
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band").as[(Long, Int)].collect().toSet
    assert(got == expected)
    // lo inclusive, hi exclusive: 50000.0 lands in band 1; 150000 matches nothing
    assert(got == Set((1L, 0), (2L, 0), (3L, 1), (4L, 1)))
  }

  test("bandJoin with ranges spanning multiple buckets") {
    val left = Seq((1L, 25.0), (2L, 75.0), (3L, 125.0)).toDF("id", "v")
    val ranges = Seq((0, 0.0, 130.0)).toDF("band", "lo", "hi") // spans 13 buckets of 10
    val got = RangeJoin.bandJoin(left, "v", ranges, "lo", "hi", 10.0)
      .select("id", "band").as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 0), (2L, 0), (3L, 0)))
  }

  test("skyline equals brute-force dominance filter; duplicates and nulls") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i => (i, rnd.nextInt(50).toDouble, rnd.nextInt(50)))
    val df = pts.toDF("id", "price", "size")
    // brute force: minimize price, maximize size
    def dom(a: (Long, Double, Int), b: (Long, Double, Int)) =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    val expected = pts.filter(p => !pts.exists(q => dom(q, p))).map(_._1).toSet
    val got = TopK.skyline(df, Seq(("price", true), ("size", false)))
      .select("id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty && got.size < 300)
    // partitioning invariance (set semantics)
    val rep = TopK.skyline(df.repartition(13), Seq(("price", true), ("size", false)))
      .select("id").as[Long].collect().toSet
    assert(rep == expected)
    // coordinate duplicates never dominate each other — both survive
    val dup = Seq((1L, 1.0, 9), (2L, 1.0, 9), (3L, 2.0, 1)).toDF("id", "price", "size")
    assert(TopK.skyline(dup, Seq(("price", true), ("size", false)))
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    // rows with a null objective are excluded
    val withNull = Seq((Some(1.0), 1, 1L), (None, 9, 2L)).toDF("price", "size", "id")
    assert(TopK.skyline(withNull, Seq(("price", true), ("size", false)))
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // single minimized dim degenerates to "all rows tied at the minimum"
    val one = Seq((1L, 5.0), (2L, 3.0), (3L, 3.0)).toDF("id", "v")
    assert(TopK.skyline(one, Seq(("v", true)))
      .select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("intervalJoin: exact overlap pairs, ONE row per pair across buckets") {
    // bucket width 10; interval A spans 5 buckets, B overlaps it in 3 of
    // them — the meet-bucket rule must emit the pair exactly once
    val l = Seq((1L, "a", 0L, 50L), (2L, "a", 60L, 70L), (3L, "b", 0L, 50L))
      .toDF("lid", "k", "s", "e")
    val r = Seq((10L, "a", 25L, 55L), (11L, "a", 50L, 61L), (12L, "b", 49L, 50L))
      .toDF("rid", "k", "s", "e")
    val got = RangeJoin.intervalJoin(l, r, Seq("k"), "s", "e", "s", "e", 10.0)
      .select("lid", "r_rid").as[(Long, Long)].collect().toSeq
    // no duplicates despite multi-bucket overlap
    assert(got.length == got.distinct.length)
    val expected = l.join(r.withColumnRenamed("s", "rs").withColumnRenamed("e", "re")
        .withColumnRenamed("rid", "r_rid"), Seq("k"))
      .filter(col("s") < col("re") && col("rs") < col("e"))
      .select("lid", "r_rid").as[(Long, Long)].collect().toSet
    assert(got.toSet == expected)
    // half-open: [50,61) starts exactly at A's exclusive end → no match
    // with (1); [49,50) ⊂ [0,50) matches (3)
    assert(got.toSet == Set((1L, 10L), (2L, 11L), (3L, 12L)))
    // keys partition: same times, different key never pair — (1,"a") vs (12,"b")
    // empty keyCols = global interval join
    val g = RangeJoin.intervalJoin(
      l.drop("k"), r.drop("k"), Seq.empty, "s", "e", "s", "e", 10.0)
      .select("lid", "r_rid").as[(Long, Long)].collect().toSet
    // [0,50) × [50,61) touch but never overlap (half-open), so no (1,11)/(3,11)
    assert(g == Set((1L, 10L), (2L, 11L), (3L, 10L), (1L, 12L), (3L, 12L)))
    // zero-length interval matches nothing
    val z = Seq((9L, "a", 30L, 30L)).toDF("lid", "k", "s", "e")
    assert(RangeJoin.intervalJoin(z, r, Seq("k"), "s", "e", "s", "e", 10.0).count() == 0)
  }
}
