package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the sketch-based queries (`approx_parts`,
  * `approx_quantiles`, `sketch_rollup`) — the constant-memory 100 TB
  * companions of the exact aggregates. Since round 10 the queries are
  * ALSO hash-gated via acceptance verdicts (exact side + error-contract
  * booleans the oracle asserts TRUE); these specs pin the underlying
  * bounds independently, at tighter tolerances than the gate's.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact on lineitem partkeys") {
    val r = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(
        approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(r._1 - r._2).toDouble / r._2 < 0.05, r.toString)
  }

  test("sketch rollup: union of fine sketches equals direct coarse sketch exactly") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val fine = graft.ops.SketchRollup.build(docs, Seq("source", "lang"), "text")
    val rolled = graft.ops.SketchRollup.rollup(fine, Seq("source"))
      .select(col("source"), col("distinct_est"), col("n_rows"))
      .as[(String, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // the lossless-merge property: merging per-(source, lang) sketches must
    // give the SAME estimate as sketching per-source directly
    val direct = graft.ops.SketchRollup.build(docs, Seq("source"), "text")
      .select(col("source"),
        hll_sketch_estimate(col("sketch")).as("est"), col("n_rows"))
      .as[(String, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(rolled == direct, "sketch union must be lossless vs direct build")
    // and the estimates stay within HLL error of the exact answer
    val exact = docs.groupBy("source").agg(countDistinct(col("text")).as("d"))
      .as[(String, Long)].collect().toMap
    rolled.foreach { case (src, (est, _)) =>
      val e = exact(src).toDouble
      assert(math.abs(est - e) / e <= 0.05, s"$src: est $est vs exact $e")
    }
    // row counts roll up exactly
    val exactN = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(rolled.map { case (k, v) => k -> v._2 } == exactN)
  }

  test("approx_percentile brackets between exact quantiles at q ± rank tolerance") {
    // accuracy 10000 → rank error ≤ 1e-4·n; bracket with a generous ±0.01
    // in quantile space so the bound is robust to ties
    val q = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(
        expr("approx_percentile(o_totalprice, 0.5D, 10000)").as("approx"),
        expr("percentile(o_totalprice, 0.49D)").as("lo"),
        expr("percentile(o_totalprice, 0.51D)").as("hi"))
      .as[(String, Double, Double, Double)].collect()
    assert(q.nonEmpty)
    q.foreach { case (g, a, lo, hi) =>
      assert(a >= lo && a <= hi, s"group $g: approx $a outside [$lo, $hi]")
    }
  }
}
