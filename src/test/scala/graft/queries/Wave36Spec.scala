package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-36 operators: the three-stage dedup cascade funnel and the
  * k-means silhouette readout.
  */
class Wave36Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pipeline_dedup_cascade: funnel is consistent and stage 1 matches the digest count") {
    val rows = graft.SparkEntry.queries("pipeline_dedup_cascade")(spark, dir)
      .select("stage", "docs_in", "docs_out", "removed")
      .as[(String, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq("stage1_exact", "stage2_prefix_jaccard", "stage3_simhash"))
    rows.foreach { case (s, in, out, rem) =>
      assert(out <= in && rem == in - out && out >= 0, s"$s inconsistent: $in -> $out ($rem)")
    }
    // stages chain: each stage's survivors are the next stage's input
    assert(rows(0)._3 == rows(1)._2 && rows(1)._3 == rows(2)._2)
    // stage 1 = exact digest dedup, verified independently
    val d0 = spark.read.parquet(s"$dir/documents.parquet").filter(col("text").isNotNull)
    assert(rows(0)._2 == d0.count())
    assert(rows(0)._3 == d0.select(md5(col("text"))).distinct().count())
    // the fixture plants near-dups: the cascade must remove SOMETHING
    assert(rows.map(_._4).sum > 0, "expected a non-trivial funnel")
  }

  test("kmeansSilhouette: two tight, separated clusters score exactly 2^20") {
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 0f)), (4L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Similarity
      .kmeansSilhouette(df, "vec_id", "embedding", k = 2, iters = 1)
      .select("cluster", "n", "mean_sil_grid")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, 2L, 1048576L), (1, 2L, 1048576L)), s"got $out")
  }

  test("embedding_silhouette: k rows, grid-bounded, same partition as embedding_kmeans") {
    val sil = graft.SparkEntry.queries("embedding_silhouette")(spark, dir)
      .select("cluster", "n", "mean_sil_grid")
      .as[(Int, Long, Long)].collect()
    assert(sil.nonEmpty && sil.length <= 8)
    sil.foreach { case (c, n, s) =>
      assert(n >= 1 && s >= 0L && s <= 1048576L, s"cluster $c out of contract: n=$n s=$s")
    }
    // same deterministic fit: cluster sizes must match the kmeans query's
    val km = graft.SparkEntry.queries("embedding_kmeans")(spark, dir)
      .groupBy("cluster").count()
      .select(col("cluster").cast("int"), col("count"))
      .as[(Int, Long)].collect().toMap
    assert(sil.map(t => t._1 -> t._2).toMap == km,
      "silhouette must ride the identical fit as embedding_kmeans")
  }
}
