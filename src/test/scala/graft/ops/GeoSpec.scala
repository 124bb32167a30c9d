package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Geo]] — planar radius join / cell stats on the integer grid, plus
  * the double-valued haversine.
  */
class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    (for {
      Seq((ia, xa, ya), (ib, xb, yb)) <- pts.sortBy(_._1).combinations(2)
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet

  test("radiusPairs equals brute force: negatives, boundary, duplicates, invariance") {
    val rnd = new scala.util.Random(7)
    // random cloud spanning negative coordinates, plus hand-placed probes:
    // an exact-boundary pair (d = r), a duplicate point (d = 0), and a
    // cross-cell pair straddling a cell border
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextLong(2001) - 1000L, rnd.nextLong(2001) - 1000L)) ++
      Seq((901L, 5000L, 5000L), (902L, 5000L + 50L, 5000L), // exactly r apart
        (903L, -5000L, -5000L), (904L, -5000L, -5000L), // duplicate point
        (905L, 49L, 0L), (906L, 51L, 0L)) // straddles the x=50 cell cut
    val df = pts.toDF("id", "x", "y")
    val got = Geo.radiusPairs(df, "id", "x", "y", 50L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(pts, 50L) && got.nonEmpty)
    assert(got.contains((901L, 902L, 2500L)), "boundary d2 == r^2 is inclusive")
    assert(got.contains((903L, 904L, 0L)), "coincident points pair at distance 0")
    assert(got.contains((905L, 906L, 4L)), "neighbor-cell pairs are found")
    // no duplicate pair rows: each pair meets at exactly one cell offset
    val list = Geo.radiusPairs(df, "id", "x", "y", 50L)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(list.length == list.toSet.size)
    // partitioning invariance
    val got13 = Geo.radiusPairs(df.repartition(13), "id", "x", "y", 50L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got13 == got)
    intercept[IllegalArgumentException] { Geo.radiusPairs(df, "id", "x", "y", 0L) }
    intercept[IllegalArgumentException] {
      Geo.radiusPairs(df.withColumn("id", col("id").cast("string")), "id", "x", "y", 50L)
    }
  }

  test("cellStats: counts and sums tile the input exactly; negatives floor-cell") {
    val pts = Seq((1L, -10L, -10L), (2L, -1L, -1L), (3L, 0L, 0L), (4L, 9L, 9L), (5L, 10L, 0L))
    val df = pts.toDF("id", "x", "y")
    val out = Geo.cellStats(df, "x", "y", 10L)
      .orderBy("cx", "cy").collect()
    // floor cells: (-10,-10)->(-1,-1); (-1,-1)->(-1,-1); (0,0),(9,9)->(0,0); (10,0)->(1,0)
    assert(out.map(r => (r.getAs[Long]("cx"), r.getAs[Long]("cy"), r.getAs[Long]("n"))).toSeq ==
      Seq((-1L, -1L, 2L), (0L, 0L, 2L), (1L, 0L, 1L)))
    assert(out.map(_.getAs[Long]("n")).sum == pts.size)
    assert(out.map(_.getAs[Long]("sx")).sum == pts.map(_._2).sum)
  }

  test("haversineKm matches a Scala replica; zero distance; antipodes ~ half circumference") {
    val rows = Seq(
      (1L, 0.0, 0.0, 0.0, 0.0),
      (2L, 52.52, 13.405, 48.8566, 2.3522), // Berlin -> Paris ~ 878 km
      (3L, 0.0, 0.0, 0.0, 180.0)) // antipodal on the equator
    val df = rows.toDF("id", "lat1", "lon1", "lat2", "lon2")
    val got = df.select(col("id"),
      Geo.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("km"))
      .as[(Long, Double)].collect().toMap
    def replica(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val rad = math.Pi / 180.0
      val a = math.pow(math.sin((lat2 - lat1) * rad / 2), 2) +
        math.cos(lat1 * rad) * math.cos(lat2 * rad) *
          math.pow(math.sin((lon2 - lon1) * rad / 2), 2)
      2.0 * 6371.0 * math.asin(math.sqrt(a))
    }
    rows.foreach { case (id, a, b, c, d) =>
      assert(math.abs(got(id) - replica(a, b, c, d)) < 1e-9)
    }
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - 878.0) < 2.0)
    assert(math.abs(got(3L) - math.Pi * 6371.0) < 1e-6)
  }
}
