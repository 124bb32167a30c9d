package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-35 operators: contingency-table Kendall τ-b, Page–Hinkley drift,
  * systematic sampling, Yule's K, Good–Turing, n-gram novelty.
  */
class Wave35Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("kendallTauB: perfectly concordant/discordant hand cases hit ±2^20") {
    val conc = Seq(("g", 1, 1), ("g", 2, 2), ("g", 3, 3)).toDF("grp", "a", "b")
    val up = graft.ops.Checks.kendallTauB(conc, "grp", col("a"), col("b"))
      .select("tau_b_grid").as[Long].head()
    assert(up == 1048576L, s"concordant tau must be +2^20, got $up")
    val disc = Seq(("g", 1, 3), ("g", 2, 2), ("g", 3, 1)).toDF("grp", "a", "b")
    val down = graft.ops.Checks.kendallTauB(disc, "grp", col("a"), col("b"))
      .select("tau_b_grid").as[Long].head()
    assert(down == -1048576L, s"discordant tau must be -2^20, got $down")
  }

  test("kendallTauB: tie-corrected hand case and partitioning invariance") {
    // cells (1,1)x2, (2,2)x1: C=2, D=0, n=3, n1=1 (x ties), n2=1 (y ties),
    // n0=3 => tau_b = 2 / sqrt(2*2) = 1 => exactly 2^20 on the grid
    val df = Seq(("g", 1, 1), ("g", 1, 1), ("g", 2, 2)).toDF("grp", "a", "b")
    val r = graft.ops.Checks.kendallTauB(df, "grp", col("a"), col("b"))
      .select("n", "c_pairs", "d_pairs", "n1", "n2", "tau_b_grid")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((3L, 2L, 0L, 1L, 1L, 1048576L)), s"got $r")
    val rp = graft.ops.Checks.kendallTauB(df.repartition(7), "grp", col("a"), col("b"))
      .select("tau_b_grid").as[Long].head()
    assert(rp == 1048576L, "tau must be partitioning-invariant")
  }

  test("events_kendall: one row per event type, tau within [-2^20, 2^20]") {
    val out = graft.SparkEntry.queries("events_kendall")(spark, dir)
    val rows = out.select("event_type", "tau_b_grid").as[(String, Long)].collect()
    val types = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("value").isNotNull)
      .select("event_type").distinct().count()
    assert(rows.length == types, s"expected $types rows, got ${rows.length}")
    rows.foreach { case (t, tau) =>
      assert(math.abs(tau) <= 1048576L, s"$t: tau $tau out of range")
    }
  }

  test("events_page_hinkley: PH is nonnegative and the alarm verdict matches the peak") {
    val out = graft.SparkEntry.queries("events_page_hinkley")(spark, dir)
      .select("event_type", "n_days", "peak_ph_grid", "drift_detected")
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (t, nd, ph, alarm) =>
      assert(nd >= 1, s"$t: empty series")
      assert(ph >= 0L, s"$t: PH must be >= 0 (U minus its own running min)")
      assert(alarm == (ph > 50L * 1048576L), s"$t: verdict/peak mismatch")
    }
  }

  test("systematicSample: exact ranks, exact rate, partitioning-invariant") {
    val df = spark.range(1, 101).select(col("id").as("k"), (col("id") * 3).as("v"))
    val picked = graft.ops.Sampling.systematicSample(df, "k", 20, 0)
      .select("k", "rank").as[(Long, Long)].collect().sortBy(_._1)
    assert(picked.map(_._1).toSeq == Seq(1L, 21L, 41L, 61L, 81L))
    assert(picked.forall { case (k, r) => k == r }, "rank must equal key here")
    val again = graft.ops.Sampling.systematicSample(df.repartition(13), "k", 20, 0)
      .select("k").as[Long].collect().sorted.toSeq
    assert(again == Seq(1L, 21L, 41L, 61L, 81L), "selection must not depend on partitioning")
    val off = graft.ops.Sampling.systematicSample(df, "k", 20, 5)
      .select("k").as[Long].collect().sorted.toSeq
    assert(off == Seq(6L, 26L, 46L, 66L, 86L), "offset shifts the start")
  }

  test("yuleK: hand-computed repeat rate") {
    // "a a b": N=3, S2=2^2+1=5, K_grid = 10^4*2^20*(5-3) // 9
    val df = Seq(("s1", "a a b")).toDF("src", "text")
    val r = graft.ops.TextOps.yuleK(df, "src", "text")
      .select("n_tokens", "n_types", "s2", "yule_k_grid")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((3L, 2L, 5L, 20971520000L / 9L)), s"got $r")
    // single-token group is excluded (K undefined at N < 2)
    val tiny = graft.ops.TextOps.yuleK(Seq(("s1", "solo")).toDF("src", "text"), "src", "text")
    assert(tiny.count() == 0L)
  }

  test("goodTuring: hand-computed trigram r* ladder with absent N_{r+1} reading 0") {
    // "a b c a b c a b c": trigrams "a b c"x3, "b c a"x2, "c a b"x2
    // => N_2=2, N_3=1; r*=2: 3*N_3*2^20 // N_2 = 3*2^20/2; r*=3: N_4=0 -> 0
    val df = Seq(Tuple1("a b c a b c a b c")).toDF("text")
    val rows = graft.ops.Vocab.goodTuring(df, "text", n = 3, maxR = 10)
      .select("r", "n_r", "n_r_next", "rstar_grid")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (2L, 2L, 1L, 3L * 1048576L / 2L),
      (3L, 1L, 0L, 0L)), s"got ${rows.toSeq}")
    // unigram space on a bounded vocabulary is the documented hollow case
    val uni = graft.ops.Vocab.goodTuring(df, "text", n = 1, maxR = 2)
    assert(uni.count() == 0L, "every unigram here is frequent — no rows")
  }

  test("ngramNovelty: first doc fully novel, repeat grams attribute to the min id") {
    val docs = Seq(
      (1L, "x y z w"), // grams: "x y z", "y z w" — both first here
      (2L, "x y z q"), // "x y z" seen in doc 1; "y z q" novel
      (3L, "no"))      // < 3 tokens: no grams, excluded
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.ngramNovelty(docs, "doc_id", "text", 3)
      .select("doc_id", "n_grams", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 2L, 1000000L), (2L, 2L, 1L, 500000L)),
      s"got ${out.toSeq}")
  }

  test("text_novelty at fixture scale: ppm bounded, dups score below fresh docs") {
    val out = graft.SparkEntry.queries("text_novelty")(spark, dir)
    val vals = out.select("novelty_ppm").as[Long].collect()
    assert(vals.nonEmpty && vals.forall(v => v >= 0L && v <= 1000000L))
    // the fixture plants near-duplicates: SOME document must be non-novel
    assert(vals.exists(_ < 1000000L), "expected at least one non-novel doc")
  }
}
