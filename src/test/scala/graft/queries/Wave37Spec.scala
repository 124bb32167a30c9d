package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-37 operators: Cramér–von Mises drift, Cramér's V association,
  * SAX motif words, Cliff's delta effect size, MAD robust outliers,
  * Weisfeiler–Lehman color refinement.
  */
class Wave37Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("wlColors: path vs star hand case and partitioning invariance") {
    // path 1-2-3 (both orientations): ends {1,3} share a radius-1 shape,
    // the middle is alone -> exactly two color classes sized 2 and 1
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val h = graft.ops.Graph.wlColors(path, rounds = 1)
      .select("n_nodes").as[Long].collect().sorted.toSeq
    assert(h == Seq(1L, 2L), s"path colors must split 2+1, got $h")
    // star 1-{2,3,4}: leaves indistinguishable at ANY depth
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val hs = graft.ops.Graph.wlColors(star, rounds = 2)
      .select("n_nodes").as[Long].collect().sorted.toSeq
    assert(hs == Seq(1L, 3L), s"star colors must split 3+1, got $hs")
    val again = graft.ops.Graph.wlColors(star.repartition(7), rounds = 2)
      .select("wl_color", "n_nodes").as[(String, Long)].collect().toSet
    val base = graft.ops.Graph.wlColors(star, rounds = 2)
      .select("wl_color", "n_nodes").as[(String, Long)].collect().toSet
    assert(again == base, "WL colors must be partitioning-invariant")
  }

  test("wlColors: refinement never merges classes (round 2 >= round 1 classes)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") * 2).as("o"), (col("l_partkey") * 2 + 1).as("p"))
    val edges = li.select(col("o").as("src"), col("p").as("dst"))
      .union(li.select(col("p").as("src"), col("o").as("dst"))).cache()
    val c1 = graft.ops.Graph.wlColors(edges, rounds = 1).count()
    val c2 = graft.ops.Graph.wlColors(edges, rounds = 2).count()
    val nodes = edges.select("src").distinct().count()
    assert(c2 >= c1, s"refinement can only split classes: $c1 -> $c2")
    assert(c2 <= nodes, "classes cannot outnumber nodes")
    val total = graft.ops.Graph.wlColors(edges, rounds = 2)
      .agg(sum("n_nodes")).as[Long].head()
    assert(total == nodes, "histogram must cover every node exactly once")
    edges.unpersist()
  }

  test("drift_cvm: nonnegative, and zero for a self-compared histogram") {
    val out = graft.SparkEntry.queries("drift_cvm")(spark, dir)
      .select("n_a", "n_b", "cvm_t").as[(Long, Long, Double)].head()
    val (na, nb, t) = out
    assert(na > 0 && nb > 0, "both status groups must be populated")
    assert(t >= 0.0, s"CvM is a sum of squares, got $t")
    assert(t <= 1.0, s"normalized CvM stays well under 1, got $t")
  }

  test("events_cramers_v: V in [0,1], grid nonnegative, dims honest") {
    val r = graft.SparkEntry.queries("events_cramers_v")(spark, dir)
      .select("n", "n_types", "n_days", "chi2_grid", "cramers_v")
      .as[(Long, Long, Long, Long, Double)].head()
    val (n, ng, nw, chi2, v) = r
    assert(n > 0 && ng >= 2 && nw >= 2 && nw <= 7, s"dims off: $r")
    assert(chi2 >= 0L, "chi2 grid sum must be nonnegative")
    assert(v >= 0.0 && v <= 1.0 + 1e-9, s"V out of [0,1]: $v")
  }

  test("events_sax: one word per type, length n_weeks, alphabet a-d") {
    val rows = graft.SparkEntry.queries("events_sax")(spark, dir)
      .select("event_type", "n_weeks", "sax_word")
      .as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, nw, w) =>
      assert(w.length == nw, s"$t: word '$w' length != $nw weeks")
      assert(w.forall(c => c >= 'a' && c <= 'd'), s"$t: bad symbol in '$w'")
    }
  }

  test("ab_cliffs_delta: pair accounting and grid bounds") {
    val r = graft.SparkEntry.queries("ab_cliffs_delta")(spark, dir)
      .select("n_a", "n_b", "gt_pairs", "lt_pairs", "delta_grid")
      .as[(Long, Long, Long, Long, Long)].head()
    val (na, nb, gt, lt, d) = r
    assert(na > 0 && nb > 0)
    assert(gt >= 0 && lt >= 0 && gt + lt <= na * nb,
      s"pair counts exceed the pair universe: $r")
    assert(math.abs(d) <= 1048576L, s"delta grid out of [-2^20, 2^20]: $d")
  }

  test("quality_mad_outliers: fence accounting per type") {
    val rows = graft.SparkEntry.queries("quality_mad_outliers")(spark, dir)
      .select("event_type", "n", "med_cents", "mad_cents", "n_outliers")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, med, mad, out) =>
      assert(n > 0, s"$t: empty group")
      assert(mad >= 0, s"$t: MAD negative")
      assert(out >= 0 && out <= n, s"$t: outliers $out outside [0, $n]")
      assert(med >= 0, s"$t: value cents are nonnegative in the fixture")
      // at least half the mass sits within the MAD by definition
      assert(out * 2 <= n, s"$t: a MAD fence cannot flag half the data")
    }
  }
}
