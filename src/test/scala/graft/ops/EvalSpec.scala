package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the classifier-evaluation family ([[Eval]]): exact AUC
  * against a hand-computed tie case and a brute-force pair count,
  * confusion-matrix arithmetic, PR-curve endpoints, calibration binning,
  * lift-bucket accounting — and partitioning invariance of the
  * distributed-prefix-sum paths (the values must depend only on the data,
  * never on where range sampling placed partition boundaries).
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------------ AUC

  test("aucExact: hand-computed tie case") {
    // scores: pos {0.9, 0.5}, neg {0.5, 0.1}
    // pairs: (0.9 vs 0.5)=1, (0.9 vs 0.1)=1, (0.5 vs 0.5)=0.5, (0.5 vs 0.1)=1
    // AUC = 3.5/4 = 0.875
    val df = Seq((1, 0.9), (1, 0.5), (0, 0.5), (0, 0.1)).toDF("label", "score")
    val r = Eval.aucExact(df, "label", "score").collect().head
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Double]("auc") == 0.875)
  }

  test("aucExact ≡ brute-force pair count on a randomized fixture") {
    val rnd = new scala.util.Random(88)
    // coarse score grid to force many ties
    val rows = (1 to 400).map { _ =>
      (if (rnd.nextBoolean()) 1 else 0, rnd.nextInt(12) * 0.25)
    }
    val df = rows.toDF("label", "score").repartition(7)
    val auc = Eval.aucExact(df, "label", "score").collect().head.getAs[Double]("auc")
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(auc == num.toDouble / (2L * pos.size * neg.size))
  }

  test("aucExact: partitioning-invariant, null-excluding, degenerate-safe") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(i => (rnd.nextInt(2), rnd.nextInt(20) * 0.125))
    val df = rows.toDF("label", "score")
    val a = Eval.aucExact(df.repartition(1), "label", "score").collect().head
    val b = Eval.aucExact(df.repartition(13), "label", "score").collect().head
    assert(a == b, "AUC must not depend on partitioning")
    // null-score rows are excluded, never folded into the rank ledger
    val withNulls = df.union(Seq((1, 0.0)).toDF("label", "score")
      .select(col("label"), lit(null).cast("double").as("score")))
    assert(Eval.aucExact(withNulls, "label", "score").collect().head == a)
    // single-class input → null auc, reported counts
    val onePos = Seq((1, 0.3), (1, 0.9)).toDF("label", "score")
    val r = Eval.aucExact(onePos, "label", "score").collect().head
    assert(r.getAs[Long]("n_neg") == 0 && r.isNullAt(r.fieldIndex("auc")))
  }

  // ------------------------------------------------------- confusion / PR

  test("confusion: cells and ratios on known rows") {
    val df = Seq(
      (1, 1), (1, 1), (1, 0), // 2 tp, 1 fn
      (0, 1), (0, 0), (0, 0), (0, 0) // 1 fp, 3 tn
    ).toDF("label", "pred")
    val r = Eval.confusion(df, "label", "pred").collect().head
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 1
      && r.getAs[Long]("fn") == 1 && r.getAs[Long]("tn") == 3)
    assert(r.getAs[Double]("acc") == 5.0 / 7)
    assert(r.getAs[Double]("prec") == 2.0 / 3)
    assert(r.getAs[Double]("rec") == 2.0 / 3)
    assert(r.getAs[Double]("f1") == 4.0 / 6)
    // degenerate: no predicted positives → null precision, not a blow-up
    val nopos = Seq((1, 0), (0, 0)).toDF("label", "pred")
    val d = Eval.confusion(nopos, "label", "pred").collect().head
    assert(d.isNullAt(d.fieldIndex("prec")) && d.getAs[Double]("rec") == 0.0)
  }

  test("prCurve: endpoints and monotone predicted-positive counts") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 200).map(_ => (rnd.nextInt(2), rnd.nextDouble()))
      .toDF("label", "score")
    val thr = Seq(-1.0, 0.25, 0.5, 0.75, 2.0)
    val out = Eval.prCurve(df, "label", "score", thr)
      .orderBy("thr").collect()
    assert(out.map(_.getAs[Double]("thr")).toSeq == thr)
    // below-range threshold predicts everything positive: recall 1, prec = base rate
    assert(out.head.getAs[Long]("n_pred_pos") == 200
      && out.head.getAs[Double]("rec") == 1.0)
    // above-range threshold predicts nothing: null precision, zero recall
    assert(out.last.getAs[Long]("n_pred_pos") == 0
      && out.last.isNullAt(out.last.fieldIndex("prec")))
    // n_pred_pos is non-increasing in the threshold
    val pp = out.map(_.getAs[Long]("n_pred_pos"))
    assert(pp.zip(pp.tail).forall { case (a, b) => a >= b })
  }

  // --------------------------------------------------- calibration / lift

  test("calibration: dyadic edges bucket exactly, rates are integer ratios") {
    val df = Seq(
      (1, 0.0), (0, 0.1), // bin 0 = [0, 0.125)
      (1, 0.125), // bin 1 exactly on the edge
      (0, -0.125), (1, -0.1) // bins -1
    ).toDF("label", "score")
    val out = Eval.calibration(df, "label", "score", 0.125)
      .orderBy("bin").collect()
    assert(out.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
      r.getAs[Long]("n_pos"))).toSeq ==
      Seq((-1L, 2L, 1L), (0L, 2L, 1L), (1L, 1L, 1L)))
    assert(out.forall(r => r.getAs[Double]("bin_lo")
      == r.getAs[Long]("bin") * 0.125))
    assert(out.head.getAs[Double]("pos_rate") == 0.5)
  }

  test("liftByBucket: bucket sizes, cumulative capture, partitioning invariance") {
    val rnd = new scala.util.Random(31)
    val rows = (1L to 97L).map(i => (i, rnd.nextInt(2), rnd.nextDouble()))
    val df = rows.toDF("id", "label", "score")
    val out = Eval.liftByBucket(df, "label", "score", "id", buckets = 10)
      .orderBy("bucket").collect()
    // row_number bucketing: sizes differ by at most 1 and sum to N
    val sizes = out.map(_.getAs[Long]("n"))
    assert(sizes.sum == 97 && sizes.max - sizes.min <= 1)
    assert(out.map(_.getAs[Long]("bucket")).toSeq == (0L to 9L))
    // capture is the cumulative positive share, ending at exactly 1
    assert(out.last.getAs[Double]("capture") == 1.0)
    val cum = out.map(_.getAs[Long]("cum_pos"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    // total positives accounted for exactly once
    assert(out.map(_.getAs[Long]("n_pos")).sum == cum.last)
    // partitioning must not move any row across buckets
    val out13 = Eval.liftByBucket(df.repartition(13), "label", "score", "id", 10)
      .orderBy("bucket").collect()
    assert(out.toSeq == out13.toSeq)
  }

  // ----------------------------------------------------------- retrieval

  test("retrievalMetrics: overlap, grid reciprocal rank, miss handling, guard") {
    // truth and system top-3 lists for two queries
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // q1 truth
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3) // q2 truth
    ).toDF("q_id", "n_id", "rank")
    val system = Seq(
      (1L, 11L, 1), (1L, 10L, 2), (1L, 99L, 3), // q1: NN at rank 2, 2/3 overlap
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3) // q2: total miss
    ).toDF("q_id", "n_id", "rank")
    val out = Eval.retrievalMetrics(truth, system, "q_id", "n_id", "rank", 3)
      .orderBy("q_id").collect()
    // lcm(1..3) = 6: rank 2 → rr_num 3; miss → 0
    assert(out(0).getAs[Long]("n_hit") == 2
      && out(0).getAs[Double]("recall") == 2.0 / 3
      && out(0).getAs[Int]("nn_rank") == 2
      && out(0).getAs[Long]("rr_num") == 3L)
    assert(out(1).getAs[Long]("n_hit") == 0
      && out(1).isNullAt(out(1).fieldIndex("nn_rank"))
      && out(1).getAs[Long]("rr_num") == 0L)
    // perfect system: recall 1, rr_num = full grid
    val perfect = Eval.retrievalMetrics(truth, truth, "q_id", "n_id", "rank", 3)
      .collect()
    assert(perfect.forall(r => r.getAs[Double]("recall") == 1.0
      && r.getAs[Long]("rr_num") == 6L))
    // a rank outside 1..k fails loudly instead of mis-scoring
    val bad = Seq((1L, 10L, 4)).toDF("q_id", "n_id", "rank")
    intercept[Exception] {
      Eval.retrievalMetrics(truth, bad, "q_id", "n_id", "rank", 3).collect()
    }
  }

  test("brierBins: Murphy identity on constant-forecast bins; clamp; invariance") {
    // logit 0 → p = 0.5 exactly (grid 524288, bin 8): constant forecasts
    // per bin make the decomposition EXACT: brier = rel − res + ō(1−ō)
    val df = ((1 to 60).map(_ => (1, 0.0)) ++ (1 to 40).map(_ => (0, 0.0)) ++
      (1 to 10).map(_ => (1, 100.0)) ++ (1 to 90).map(_ => (0, -100.0)))
      .toDF("label", "score")
    val rows = Eval.brierBins(df, "label", "score", bins = 16).collect()
    val brier = rows.map(_.getAs[Double]("brier_term")).sum
    val rel = rows.map(_.getAs[Double]("rel_term")).sum
    val res = rows.map(_.getAs[Double]("res_term")).sum
    val n = rows.map(_.getAs[Long]("n")).sum.toDouble
    val p = rows.map(_.getAs[Long]("n_pos")).sum / n
    assert(math.abs(brier - (rel - res + p * (1 - p))) < 1e-9,
      s"Murphy identity: $brier vs ${rel - res + p * (1 - p)}")
    // σ(100) floors to the clamped top code → top bin 15, not a 17th bin
    assert(rows.map(_.getAs[Long]("bin")).max == 15L)
    // the 0.5 bin: 60/100 positives, brier mass = 100·0.25/200
    val mid = rows.find(_.getAs[Long]("bin") == 8L).get
    assert(mid.getAs[Long]("n") == 100L && mid.getAs[Long]("n_pos") == 60L)
    assert(math.abs(mid.getAs[Double]("brier_term") - 0.125) < 1e-9)
    // partitioning invariance, bit level
    def bits(parts: Int) = Eval.brierBins(df.repartition(parts), "label", "score", 16)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("brier_term")),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("rel_term")),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("res_term")))).toSet
    assert(bits(1) == bits(7))
    intercept[IllegalArgumentException] { Eval.brierBins(df, "label", "score", 15) }
  }

  test("ndcg: pinned weight table, perfect/inverted/missing lists") {
    // the oracle hardcodes this table — pin it literal for literal
    // (independently computed: floor(2^20 / log2(r+1)), r = 1..10)
    assert(Eval.ndcgWeights(10) == Seq(1048576L, 661577L, 524288L, 451597L,
      405644L, 373510L, 349525L, 330788L, 315652L, 303106L))
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3)
    ).toDF("q_id", "n_id", "rank")
    val w = Eval.ndcgWeights(3) // (1048576, 661577, 524288)
    val system = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // perfect
      (2L, 22L, 1), (2L, 21L, 2), (2L, 20L, 3), // fully inverted
      (3L, 97L, 1), (3L, 98L, 2), (3L, 99L, 3)  // total miss
    ).toDF("q_id", "n_id", "rank")
    val out = Eval.ndcg(truth, system, "q_id", "n_id", "rank", 3)
      .orderBy("q_id").collect()
    val idcg = 3 * w(0) + 2 * w(1) + 1 * w(2)
    assert(out(0).getAs[Long]("dcg_num") == idcg
      && out(0).getAs[Long]("ndcg_ppm") == 1000000L)
    // inverted: rel 3 lands at rank 3, rel 1 at rank 1
    val invDcg = 3 * w(2) + 2 * w(1) + 1 * w(0)
    assert(out(1).getAs[Long]("dcg_num") == invDcg
      && out(1).getAs[Long]("idcg_num") == idcg
      && out(1).getAs[Long]("ndcg_ppm") == invDcg * 1000000L / idcg)
    assert(out(2).getAs[Long]("dcg_num") == 0L
      && out(2).getAs[Long]("ndcg_ppm") == 0L)
    // rank outside 1..k fails loudly
    intercept[Exception] {
      Eval.ndcg(truth, Seq((1L, 10L, 4)).toDF("q_id", "n_id", "rank"),
        "q_id", "n_id", "rank", 3).collect()
    }
  }

  test("rankBiasedOverlap: exact dyadic grid matches the textbook sum") {
    // k=3, lcm(1..3)=6, denom = 2^3*6 = 48; W(m) = sum_{d=m..3} 2^(3-d)*6/d
    assert(Eval.rboWeights(3) == Seq(32L, 8L, 2L) && Eval.rboDenom(3) == 48L)
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)
    ).toDF("q_id", "n_id", "rank")
    // q1: identical list -> max RBO = 1 - 2^-3 = 7/8 (num 42/48)
    // q2: top-2 swapped -> overlap_d = (0,2,3) -> 2/(4*2)+3/(8*3) = 3/8
    val system = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 21L, 1), (2L, 20L, 2), (2L, 22L, 3)
    ).toDF("q_id", "n_id", "rank")
    val out = Eval.rankBiasedOverlap(truth, system, "q_id", "n_id", "rank", 3)
      .orderBy("q_id").collect()
    assert(out(0).getAs[Long]("rbo_num") == 42L
      && out(0).getAs[Double]("rbo") == 7.0 / 8)
    assert(out(1).getAs[Long]("rbo_num") == 18L
      && out(1).getAs[Double]("rbo") == 3.0 / 8)
    // total miss scores exactly 0, not null
    val miss = Seq((1L, 97L, 1), (1L, 98L, 2), (1L, 99L, 3),
      (2L, 97L, 1), (2L, 98L, 2), (2L, 99L, 3)).toDF("q_id", "n_id", "rank")
    val zero = Eval.rankBiasedOverlap(truth, miss, "q_id", "n_id", "rank", 3)
      .collect()
    assert(zero.forall(r => r.getAs[Long]("rbo_num") == 0L
      && r.getAs[Double]("rbo") == 0.0))
    // rank outside 1..k fails loudly
    intercept[Exception] {
      Eval.rankBiasedOverlap(truth,
        Seq((1L, 10L, 4)).toDF("q_id", "n_id", "rank"),
        "q_id", "n_id", "rank", 3).collect()
    }
  }

  test("rouge2: clipped bigram overlap; identical=1, disjoint=0, clipping binds") {
    val docs = Seq(
      (1L, "a b c d"),        // bigrams: ab, bc, cd
      (2L, "a b c d"),        // identical
      (3L, "x y z w"),        // disjoint
      (4L, "a b a b a b"),    // ab x3, ba x2 — clipping vs doc 1
      (5L, "")                // empty
    ).toDF("doc_id", "text")
    def run(pairs: Seq[(Long, Long)]) =
      Eval.rouge2(docs, "doc_id", "text",
        pairs.toDF("id_a", "id_b"))
        .select("id_a", "id_b", "overlap", "n_a", "n_b", "f1_ppm")
        .as[(Long, Long, Long, Long, Long, Option[Long])]
        .collect().map(r => (r._1, r._2) -> r).toMap
    val out = run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 5L)))
    assert(out((1L, 2L))._3 == 3L && out((1L, 2L))._6 == Some(1000000L))
    assert(out((1L, 3L))._3 == 0L && out((1L, 3L))._6 == Some(0L))
    // doc1 has ab x1; doc4 has ab x3 -> clipped to 1; f1 = 2*1e6/(3+5)
    assert(out((1L, 4L))._3 == 1L && out((1L, 4L))._6 == Some(250000L))
    assert(out((5L, 5L))._3 == 0L && out((5L, 5L))._6.isEmpty,
      "no bigrams on either side -> null f1")
  }

  test("bleu2: hand-solved precisions, brevity penalty, degenerate zeros") {
    val docs = Seq(
      (1L, "a b c d"),       // candidate, 4 tokens
      (2L, "a b c d"),       // identical reference -> bleu 1
      (3L, "a b x y z"),     // partial: m1=2 (a,b), m2=1 (ab); r longer
      (4L, "p q")            // no overlap
    ).toDF("doc_id", "text")
    def run(pairs: Seq[(Long, Long)]) =
      Eval.bleu2(docs, "doc_id", "text", pairs.toDF("id_a", "id_b"))
        .select("id_a", "id_b", "m1", "m2", "bleu")
        .as[(Long, Long, Long, Long, Option[Double])]
        .collect().map(r => (r._1, r._2) -> r).toMap
    val out = run(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(out((1L, 2L))._5 == Some(1.0), "identical pair scores exactly 1")
    // candidate len 4 vs reference len 5: BP = floor-grid exp(1 - 5/4);
    // p1 = 2/4, p2 = 1/3
    val bp = math.floor(math.exp(1.0 - 5.0 / 4.0) * 1048576.0) / 1048576.0
    val expect = bp * math.sqrt((2.0 / 4.0) * (1.0 / 3.0))
    assert(out((1L, 3L))._3 == 2L && out((1L, 3L))._4 == 1L)
    assert(out((1L, 3L))._5 == Some(expect))
    assert(out((1L, 4L))._5 == Some(0.0), "zero n-gram overlap scores 0")
  }
}
