package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-39 operators: Hill tail index, lineage hash chain, newsvendor
  * stock, bullwhip ratio.
  */
class Wave39Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("orders_hill_tail: recovers a known Pareto exponent on synthetic data") {
    // deterministic Pareto(alpha=2, xm=1) sample via inverse CDF on the
    // midpoint grid: x_i = u_i^(-1/2); Hill on the top 200 must land
    // near 2 (estimator noise at n=2000 stays well inside +-0.4)
    val tmp = java.nio.file.Files.createTempDirectory("graft_w39").toString
    (1 to 2000).map { i =>
      val u = (i - 0.5) / 2000.0
      (i.toLong, math.pow(u, -0.5), "F")
    }.toDF("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = graft.SparkEntry.queries("orders_hill_tail")(spark, tmp)
      .select("k", "sum_excess_grid", "hill_alpha_grid")
      .as[(Long, Long, Long)].head()
    assert(r._1 == 200L, s"must keep exactly k=200, got ${r._1}")
    val alpha = r._3.toDouble / 1048576.0
    assert(alpha > 1.6 && alpha < 2.4, s"Hill alpha $alpha not near 2")
  }

  test("lineage_hash_chain: tampering with one month breaks every later link") {
    val base = graft.SparkEntry.queries("lineage_hash_chain")(spark, dir)
      .select("month", "chain_digest").as[(String, String)].collect()
      .sortBy(_._1)
    assert(base.length >= 3, "fixture must span several months")
    // flip one order's status in the middle month
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val mid = base(base.length / 2)._1
    val victim = orders
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === mid)
      .agg(min("o_orderkey")).head().getLong(0)
    val tampered = orders.withColumn("o_orderstatus",
      when(col("o_orderkey") === victim, lit("X"))
        .otherwise(col("o_orderstatus")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_w39b").toString
    tampered.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val after = graft.SparkEntry.queries("lineage_hash_chain")(spark, tmp)
      .select("month", "chain_digest").as[(String, String)].collect()
      .sortBy(_._1).toMap
    base.foreach { case (m, c) =>
      if (m < mid) assert(after(m) == c, s"pre-tamper month $m must match")
      else assert(after(m) != c, s"month $m must diverge after the tamper")
    }
  }

  test("orders_newsvendor: stock is exactly the 4/5-fractile of daily demand") {
    val out = graft.SparkEntry.queries("orders_newsvendor")(spark, dir)
      .select("priority", "n_days", "stock", "overage_units", "underage_units")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_orderpriority").as("p"), to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("dem"))
      .select("p", "dem").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.nonEmpty && out.keySet == daily.keySet)
    out.foreach { case (p, (_, nd, stock, over, under)) =>
      val ds = daily(p)
      assert(nd == ds.length, s"$p: day count")
      val expected = ds(math.ceil(0.8 * ds.length).toInt - 1)
      assert(stock == expected, s"$p: stock $stock != fractile $expected")
      assert(over == ds.filter(_ < stock).map(stock - _).sum, s"$p: overage")
      assert(under == ds.filter(_ > stock).map(_ - stock).sum, s"$p: underage")
    }
  }

  test("lineitem_bullwhip: positive variance numerators, finite ratio") {
    val r = graft.SparkEntry.queries("lineitem_bullwhip")(spark, dir)
      .select("n_months", "var_num_ordered", "var_num_shipped", "bullwhip_ratio")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 >= 3, "fixture spans several months")
    assert(r._2 >= 0.0 && r._3 >= 0.0, "variance numerators are nonnegative")
    assert(!r._4.isNaN && !r._4.isInfinite && r._4 > 0.0,
      s"bullwhip ratio must be a positive finite double, got ${r._4}")
    assert(math.abs(r._4 - r._2 / r._3) < 1e-12, "ratio must equal the quotient")
  }
}
