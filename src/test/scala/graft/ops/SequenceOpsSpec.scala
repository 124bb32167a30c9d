package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the sequence/agreement/concentration additions: Markov
  * transition tables, top-k path mining, Cohen's kappa, ABC (Pareto)
  * classification, and the char-class entropy quality signal.
  */
class SequenceOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def evFixture = Seq(
    // user 1: A,B,A,C under ts order
    (1L, "A", ts("2024-01-01 00:00:01"), 1L),
    (1L, "B", ts("2024-01-01 00:00:02"), 2L),
    (1L, "A", ts("2024-01-01 00:00:03"), 3L),
    (1L, "C", ts("2024-01-01 00:00:04"), 4L),
    // user 2: equal timestamps — id breaks the tie: A(5) then B(6)
    (2L, "B", ts("2024-02-01 00:00:00"), 6L),
    (2L, "A", ts("2024-02-01 00:00:00"), 5L),
    // user 3: single event — contributes no pair
    (3L, "Z", ts("2024-03-01 00:00:00"), 7L)
  ).toDF("u", "t", "tt", "id")

  test("markov: exact pair counts and floor-ppm probabilities; ties by id") {
    val out = Funnel.markov(evFixture, "u", "t", "tt", "id")
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // pairs: u1 A→B, B→A, A→C; u2 A→B (tie resolved by id 5<6)
    assert(out.toSeq == Seq(
      ("A", "B", 2L, 666666L), // 2/3 of A-transitions
      ("A", "C", 1L, 333333L),
      ("B", "A", 1L, 1000000L)))
  }

  test("markovAttribution: hand-solved removal effects on a 3-journey chain") {
    // A: click→purchase; B: view→(drop); C: click→view→purchase
    // p: start→{click 2/3, view 1/3}; click→{conv 1/2, view 1/2};
    //    view→{conv 1/2, drop 1/2}
    val ev = Seq(
      (1L, "click", ts("2024-01-01 00:00:01"), 1L),
      (1L, "purchase", ts("2024-01-01 00:00:02"), 2L),
      (2L, "view", ts("2024-01-02 00:00:01"), 3L),
      (3L, "click", ts("2024-01-03 00:00:01"), 4L),
      (3L, "view", ts("2024-01-03 00:00:02"), 5L),
      (3L, "purchase", ts("2024-01-03 00:00:03"), 6L)
    ).toDF("u", "t", "tt", "id")
    val out = Funnel.markovAttribution(ev, "u", "t", "tt", "id",
      convType = "purchase", channels = Seq("click", "view"), iterations = 12)
      .as[(String, Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    // fixpoint (reached in 3 rounds): v(click)=750000, v(view)=500000,
    // base v(start) = (666666·750000 + 333333·500000)//1e6 = 666666
    // remove view:  start = (666666·500000)//1e6 = 333333 → effect 333333
    // remove click: start = (333333·500000)//1e6 = 166666 → effect 500000
    // attribution: total 833333 → click 600000, view 399999 (floors)
    assert(out(0) == (("click", 666666L, 166666L, 500000L, Some(600000L))))
    assert(out(1) == (("view", 666666L, 333333L, 333333L, Some(399999L))))
    // partitioning must not move a single ppm
    val rep = Funnel.markovAttribution(ev.repartition(5), "u", "t", "tt", "id",
      "purchase", Seq("click", "view"), 12)
      .as[(String, Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(rep.toSeq == out.toSeq)
  }

  test("markovAttribution: converting-only user routes start→conv directly") {
    // one user who purchases with NO preceding touches: base conversion
    // is 1e6 and no channel can claim any of it
    val ev = Seq(
      (1L, "purchase", ts("2024-01-01 00:00:01"), 1L),
      (2L, "click", ts("2024-01-02 00:00:01"), 2L)
    ).toDF("u", "t", "tt", "id")
    val out = Funnel.markovAttribution(ev, "u", "t", "tt", "id",
      "purchase", Seq("click"), 4)
      .as[(String, Long, Long, Long, Option[Long])].collect()
    // start→conv 1, start→click 1 → base = 500000; removing click
    // changes nothing (click leads nowhere) → effect 0, attribution null
    assert(out.head == (("click", 500000L, 500000L, 0L, None)))
  }

  test("property: markovAttribution removal effects are monotone and bounded") {
    import org.scalacheck.{Gen, Prop}
    val genEvents = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.oneOf("A", "B", "buy"))).map(_.take(24))
    val prop = Prop.forAll(genEvents) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, t), i) =>
        (u, t, ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), i.toLong)
      }
      val out = Funnel.markovAttribution(rows.toDF("u", "t", "tt", "id"),
        "u", "t", "tt", "id", "buy", Seq("A", "B"), 8)
        .as[(String, Long, Long, Long, Option[Long])].collect()
      // severing paths can only REDUCE conversion; base is a probability;
      // attribution shares are floor-ppm and sum to ≤ 1e6
      out.forall(r => r._3 <= r._2 && r._2 <= 1000000L && r._4 >= 0L) &&
        out.flatMap(_._5).sum <= 1000000L
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("markov: empty input yields empty output") {
    assert(Funnel.markov(evFixture.limit(0), "u", "t", "tt", "id").isEmpty)
  }

  test("topPaths: consecutive runs, deterministic (count DESC, path ASC) cut") {
    val out = Funnel.topPaths(evFixture, "u", "t", "tt", "id", len = 2, k = 2)
      .as[(String, Long)].collect().toSeq
    // length-2 paths = the markov pairs: A>B ×2 wins, then A>C (asc before B>A)
    assert(out == Seq(("A > B", 2L), ("A > C", 1L)))
    val three = Funnel.topPaths(evFixture, "u", "t", "tt", "id", len = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(three == Seq(("A > B > A", 1L), ("B > A > C", 1L)),
      "only user 1 has length-3 runs")
    intercept[IllegalArgumentException](
      Funnel.topPaths(evFixture, "u", "t", "tt", "id", len = 1, k = 1))
  }

  // --------------------------------------------------------- Cohen's kappa

  test("cohenKappa: hand-checked 2×2, exact chance correction") {
    val a = Seq((1L, "P"), (2L, "P"), (3L, "N"), (4L, "N")).toDF("item", "lab")
    val b = Seq((1L, "P"), (2L, "N"), (3L, "N"), (4L, "N")).toDF("item", "lab")
    val Array((n, agree, kappa)) =
      Labels.cohenKappa(a, b, "item", "lab").as[(Long, Long, Option[Double])].collect()
    // cells PP=1 PN=1 NN=2; pe = 2·1 + 2·3 = 8; κ = (12−8)/(16−8) = 0.5
    assert(n == 4L && agree == 3L && kappa.contains(0.5))
  }

  test("cohenKappa: degenerate (both raters constant) is null, not NaN") {
    val a = Seq((1L, "X"), (2L, "X")).toDF("item", "lab")
    val out = Labels.cohenKappa(a, a, "item", "lab")
      .as[(Long, Long, Option[Double])].collect().head
    assert(out._1 == 2L && out._2 == 2L && out._3.isEmpty)
  }

  test("cohenKappa: only co-rated items count; empty overlap is the zero row") {
    val a = Seq((1L, "P"), (2L, "N")).toDF("item", "lab")
    val b = Seq((3L, "P")).toDF("item", "lab")
    val out = Labels.cohenKappa(a, b, "item", "lab")
      .as[(Long, Long, Option[Double])].collect().head
    assert(out == ((0L, 0L, None)))
  }

  // ------------------------------------------------------------------- ABC

  private def abcFixture = Seq(
    ("a", 50L), ("b", 30L), ("c", 10L), ("d", 5L), ("e", 5L)
  ).toDF("k", "v")

  test("abcClassify: crossing-item convention — A is the set making up the first 80%") {
    val out = Ranking.abcClassify(abcFixture, "k", "v")
      .as[(String, Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", 50L, 50L, "A"), // prev 0 < 80
      ("b", 30L, 80L, "A"), // prev 50 < 80 — b completes the first 80%
      ("c", 10L, 90L, "B"), // prev 80: not < 80, < 95
      ("d", 5L, 95L, "B"), // ties order by key: d before e
      ("e", 5L, 100L, "C"))) // prev 95: not < 95
  }

  test("abcClassify: result is partitioning-invariant (order-determined, not boundary-determined)") {
    val base = Ranking.abcClassify(abcFixture, "k", "v").collect().toSet
    val re = Ranking.abcClassify(abcFixture.repartition(7), "k", "v").collect().toSet
    assert(base == re)
    intercept[IllegalArgumentException](Ranking.abcClassify(abcFixture, "k", "v", 95, 80))
  }

  test("abcClassify: null values drop; a single dominant key is A, not C") {
    val df = Seq(("x", Some(10L)), ("y", None)).toDF("k", "v")
    val out = Ranking.abcClassify(df, "k", "v").as[(String, Long, Long, String)].collect()
    assert(out.toSeq == Seq(("x", 10L, 10L, "A")))
  }

  // ------------------------------------------------------- windowed funnel

  test("stagesWindowed: conversions outside the window drop; inside matches unbounded") {
    val ev = Seq(
      // user 1 converts within the hour
      (1L, "view", ts("2024-01-01 00:00:00"), 1L),
      (1L, "buy", ts("2024-01-01 00:30:00"), 2L),
      // user 2's buy comes 3 h after the view — outside a 1 h window
      (2L, "view", ts("2024-01-02 00:00:00"), 3L),
      (2L, "buy", ts("2024-01-02 03:00:00"), 4L),
      // user 3: an early buy BEFORE the view never counts either way
      (3L, "buy", ts("2024-01-03 00:00:00"), 5L),
      (3L, "view", ts("2024-01-03 01:00:00"), 6L)
    ).toDF("u", "t", "tt", "id")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Int, Long)].collect().map(r => r._2 -> r._3).toMap
    val bounded = counts(
      Funnel.stagesWindowed(ev, "u", "t", "tt", Seq("view", "buy"), 3600000000L))
    val open = counts(Funnel.stages(ev, "u", "t", "tt", Seq("view", "buy")))
    assert(bounded == Map(0 -> 3L, 1 -> 1L), "only user 1 converts within 1 h")
    assert(open == Map(0 -> 3L, 1 -> 2L), "unbounded admits user 2's late buy")
    intercept[IllegalArgumentException](
      Funnel.stagesWindowed(ev, "u", "t", "tt", Seq("view"), 0L))
  }

  // ------------------------------------------------------------- BPE learn

  test("bpeLearn: hand-checked merge chain with recounts, early stop when fully merged") {
    val df = Seq((1L, "low low lower")).toDF("id", "text")
    val out = Vocab.bpeLearn(df, "text", steps = 10)
      .as[(Int, String, String, Long)].collect().toSeq
    // counts: low×2, lower×1. Round 1: l-o and o-w both 3 → pair order
    // elects (l,o). Round 2: (lo,w)=3. Round 3: low-e / e-r tie at 1 →
    // (e,r) first lexicographically. Round 4: (low,er). Then no pairs.
    assert(out == Seq(
      (1, "l", "o", 3L),
      (2, "lo", "w", 3L),
      (3, "e", "r", 1L),
      (4, "low", "er", 1L)), "then every word is one symbol — early stop")
  }

  test("bpeLearn: leftmost non-overlapping rewrite — 'aaa' merges to [aa, a]") {
    val df = Seq((1L, "aaa")).toDF("id", "text")
    val out = Vocab.bpeLearn(df, "text", steps = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    // round 1: (a,a) counted twice (positional multiset); rewrite is
    // leftmost, so the word becomes [aa, a], and round 2 merges (aa, a)
    assert(out == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("bpeSegment: learned merges shrink symbol counts; order matters") {
    val df = Seq((1L, "low low lower")).toDF("id", "text")
    val merges = Vocab.bpeLearn(df, "text", 4)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(r => (r._2, r._3)).toSeq
    val seg = Vocab.bpeSegment(df, "text", merges)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // after (l,o), (lo,w), (e,r), (low,er): low → 1 symbol, lower → 1
    assert(seg == Map("low" -> 1L, "lower" -> 1L))
    val partial = Vocab.bpeSegment(df, "text", merges.take(2))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(partial == Map("low" -> 1L, "lower" -> 3L),
      "two merges leave lower as [low, e, r]")
    val none = Vocab.bpeSegment(df, "text", Nil)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(none == Map("low" -> 3L, "lower" -> 5L), "no merges = character count")
  }

  test("property: bpeLearn equals a reference Scala BPE on random corpora") {
    import org.scalacheck.{Gen, Prop}
    val S = "\u001F"
    def brute(freqs: Map[String, Long], steps: Int): Seq[(Int, String, String, Long)] = {
      var vocab: Seq[(Vector[String], Long)] =
        freqs.toSeq.map { case (w, f) => w.map(_.toString).toVector -> f }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var step = 1
      var break = false
      while (step <= steps && !break) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (v, f) =>
          v.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
          }
        }
        if (counts.isEmpty) break = true
        else {
          val ((a, b), pf) = counts.toSeq
            .sortBy { case ((a, b), c) => (-c, a + S + b) }.head
          out += ((step, a, b, pf))
          vocab = vocab.map { case (v, f) =>
            val m = Vector.newBuilder[String]
            var i = 0
            while (i < v.length) {
              if (i + 1 < v.length && v(i) == a && v(i + 1) == b) { m += (a + b); i += 2 }
              else { m += v(i); i += 1 }
            }
            (m.result(), f)
          }
          step += 1
        }
      }
      out.toSeq
    }
    val genWord = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val genCorpus = Gen.nonEmptyListOf(Gen.zip(genWord, Gen.chooseNum(1, 4)))
      .map(_.take(8))
    val prop = Prop.forAll(genCorpus) { corpus =>
      val text = corpus.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
      val freqs = corpus.flatMap { case (w, n) => Seq.fill(n)(w) }
        .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      val expected = brute(freqs, 6)
      val got = Vocab.bpeLearn(Seq((1L, text)).toDF("id", "text"), "text", 6)
        .as[(Int, String, String, Long)].collect().toSeq
      got == expected
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: abcClassify equals the sequential replay on random inputs") {
    import org.scalacheck.{Gen, Prop}
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L)).map(_.take(12))) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (s"k$i", v) }
      val sorted = rows.sortBy { case (k, v) => (-v, k) }
      val tot = vs.sum
      var cum = 0L
      val expected = sorted.map { case (k, v) =>
        val prev = cum; cum += v
        val cls = if (prev * 100 < tot * 80) "A"
          else if (prev * 100 < tot * 95) "B" else "C"
        (k, v, cum, cls)
      }.toSet
      val got = Ranking.abcClassify(rows.toDF("k", "v"), "k", "v")
        .as[(String, Long, Long, String)].collect().toSet
      got == expected
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: markov conserves counts — per-source totals and global pair count") {
    import org.scalacheck.{Gen, Prop}
    val genEvents = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.oneOf("A", "B", "C"))).map(_.take(30))
    val prop = Prop.forAll(genEvents) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, t), i) =>
        (u, t, ts("2024-01-01 00:00:00"), i.toLong)
      }
      val df = rows.toDF("u", "t", "tt", "id")
      val out = Funnel.markov(df, "u", "t", "tt", "id")
        .as[(String, String, Long, Long)].collect()
      val perFrom = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val expectedPairs = rows.groupBy(_._1).values.map(g => math.max(0, g.size - 1)).sum
      out.map(_._3).sum == expectedPairs &&
        // p_ppm replays as floor(n_trans·10⁶ / n_from) with n_from the
        // per-source transition total
        out.forall(r => r._4 == r._3 * 1000000L / perFrom(r._1)) &&
        perFrom.values.forall(_ > 0)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: cohenKappa is bounded and identical raters score exactly 1") {
    import org.scalacheck.{Gen, Prop}
    val genLabels = Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z")).map(_.take(20))
    val prop = Prop.forAll(genLabels, genLabels) { (la, lb) =>
      val n = math.min(la.size, lb.size)
      val a = la.take(n).zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("item", "lab")
      val b = lb.take(n).zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("item", "lab")
      val k = Labels.cohenKappa(a, b, "item", "lab")
        .as[(Long, Long, Option[Double])].collect().head._3
      val self = Labels.cohenKappa(a, a, "item", "lab")
        .as[(Long, Long, Option[Double])].collect().head._3
      k.forall(v => v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12) &&
        self.forall(_ == 1.0) // None only when rater A is constant
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  // ----------------------------------------------------------------- CUPED

  test("cuped: θ exact on linear data; pure covariate differences equalize away") {
    val units = Seq(
      (0L, 10.0, 1.0), (0L, 20.0, 2.0), (1L, 30.0, 3.0), (1L, 40.0, 4.0)
    ).toDF("variant", "y", "x")
    val out = Experiment.cuped(units, "variant", "y", "x")
      .as[(Long, Long, Double, Option[Double], Double)].collect().sortBy(_._1)
    // y = 10x exactly ⇒ θ = 10; the entire between-variant difference is
    // the covariate's, so both adjusted means collapse to the grand mean
    assert(out.map(_._4).toSeq == Seq(Some(10.0), Some(10.0)))
    assert(out.map(_._3).toSeq == Seq(15.0, 35.0), "raw means differ")
    assert(out.map(_._5).toSeq == Seq(25.0, 25.0), "adjusted means equalize")
  }

  test("cuped: zero covariate variance falls back to raw means with null θ") {
    val units = Seq((0L, 10.0, 5.0), (1L, 30.0, 5.0)).toDF("variant", "y", "x")
    val out = Experiment.cuped(units, "variant", "y", "x")
      .as[(Long, Long, Double, Option[Double], Double)].collect().sortBy(_._1)
    assert(out.forall(_._4.isEmpty))
    assert(out.map(r => (r._3, r._5)).toSeq == Seq((10.0, 10.0), (30.0, 30.0)))
  }

  // ------------------------------------------------------------------- OLS

  test("olsExact: exact slope/intercept on linear data; null on zero x-variance") {
    val df = Seq(("g", 1.0, 5.0), ("g", 2.0, 7.0), ("g", 3.0, 9.0),
      ("z", 4.0, 1.0), ("z", 4.0, 9.0)).toDF("grp", "x", "y")
    val out = Checks.olsExact(df, "grp", "x", "y")
      .as[(String, Long, Option[Double], Option[Double])].collect().sortBy(_._1)
    // y = 2x + 3 exactly on the grid: slope 2 (scale cancels), intercept
    // 3 in grid units (3·2^20)
    assert(out(0) == (("g", 3L, Some(2.0), Some(3.0 * 1048576))))
    assert(out(1) == (("z", 2L, None, None)), "vertical line has no OLS slope")
  }

  // --------------------------------------------------------------- entropy

  private def entropy(s: String): Double = {
    val df = Seq((1L, s)).toDF("id", "text")
      .select(TextOps.charClassCounts(col("text")).as("cs"))
    df.select(TextOps.classEntropyOfCounts(col("cs"))).as[Double].collect().head
  }

  test("classEntropy: single-class and empty text score 0; two equal classes score ln 2") {
    assert(entropy("aaaa") == 0.0)
    assert(entropy("") == 0.0)
    assert(entropy("ab12") == 0.6931, "2+2 split = ln 2 on the 1e-6 grid")
  }

  test("classEntropy: four equal classes score ln 4; counts partition the length") {
    // ln(1/4)·1e6 floors to −1386295 (ln 4 = 1.3862944): grid floor rounds
    // the magnitude UP, so the 4-class score lands at 1.3863
    assert(entropy("a1 !") == 1.3863)
    val cs = Seq((1L, "a1 !x")).toDF("id", "text")
      .select(TextOps.charClassCounts(col("text")).as("cs"))
      .select(col("cs.letters"), col("cs.digits"), col("cs.spaces"), col("cs.other"), col("cs.n"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(cs == ((2L, 1L, 1L, 1L, 5L)))
  }
}
