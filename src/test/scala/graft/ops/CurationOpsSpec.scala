package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-8 curation/analytics additions: SCD2 interval
  * build, robust (median/MAD) outlier detection, annotation majority
  * vote, quality-aware cluster canonicalization, and md5-sign random
  * projection.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ------------------------------------------------------------------ SCD2

  private def scd2Fixture = Seq(
    // key 1: A,A,B,A — re-appearing value must open a NEW run (3 intervals)
    (1L, "A", ts("2024-01-01 00:00:00"), 1L),
    (1L, "A", ts("2024-01-02 00:00:00"), 2L),
    (1L, "B", ts("2024-01-03 00:00:00"), 3L),
    (1L, "A", ts("2024-01-04 00:00:00"), 4L),
    // key 2: single observation — one open run
    (2L, "X", ts("2024-02-01 00:00:00"), 5L),
    // key 3: equal timestamps — id breaks the tie (6 before 7)
    (3L, "P", ts("2024-03-01 00:00:00"), 6L),
    (3L, "Q", ts("2024-03-01 00:00:00"), 7L)
  ).toDF("k", "attr", "t", "id")

  test("scd2: runs collapse, re-appearing values reopen, intervals tile") {
    val out = Snapshot.scd2(scd2Fixture, "k", "attr", "t", "id")
      .as[(Long, String, java.sql.Timestamp, Long, Option[java.sql.Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    val k1 = out.filter(_._1 == 1L)
    assert(k1.map(_._2).toSeq == Seq("A", "B", "A"), "A,A,B,A → runs A,B,A")
    assert(k1.map(_._4).toSeq == Seq(2L, 1L, 1L), "first run collapses two obs")
    // half-open intervals tile: valid_to == next run's valid_from
    assert(k1(0)._5.contains(k1(1)._3) && k1(1)._5.contains(k1(2)._3))
    assert(k1(2)._5.isEmpty && k1(2)._6, "last run open and current")
    assert(k1.count(_._6) == 1, "exactly one current run per key")
    val k2 = out.filter(_._1 == 2L)
    assert(k2.length == 1 && k2.head._6 && k2.head._5.isEmpty)
    // tie on ts: id 6 (P) precedes id 7 (Q), so P closes at Q's valid_from
    val k3 = out.filter(_._1 == 3L)
    assert(k3.map(_._2).toSeq == Seq("P", "Q"))
    assert(!k3(0)._6 && k3(1)._6)
  }

  test("scd2 invariants hold on randomized logs: tiling, coverage, one current") {
    // deterministic pseudo-random log: 40 keys, strictly increasing
    // per-key timestamps (ties are covered by the dedicated tie test)
    val rnd = new scala.util.Random(4242)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = for {
      k <- 1L to 40L
      i <- 1 to (5 + rnd.nextInt(40))
    } yield (k, s"s${rnd.nextInt(4)}",
      new java.sql.Timestamp(base + i * 3600000L), k * 1000 + i)
    val df = rows.toDF("k", "attr", "t", "id")
    val out = Snapshot.scd2(df, "k", "attr", "t", "id")
      .as[(Long, String, java.sql.Timestamp, Long, Option[java.sql.Timestamp], Boolean)]
      .collect()
    val byKey = out.groupBy(_._1)
    assert(byKey.forall { case (_, runs) => runs.count(_._6) == 1 },
      "exactly one open run per key")
    byKey.foreach { case (k, runs) =>
      val sorted = runs.sortBy(_._3.getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // half-open intervals tile: valid_to == the next valid_from
          assert(a._5.contains(b._3), s"key $k: gap between runs")
          // adjacent runs always differ in attribute (runs are maximal)
          assert(a._2 != b._2, s"key $k: runs not maximal")
        case _ => ()
      }
      assert(sorted.last._5.isEmpty, s"key $k: last run must be open")
      // n_obs sums to the key's observation count (coverage)
      assert(sorted.map(_._4).sum == rows.count(_._1 == k),
        s"key $k: observations lost or duplicated")
    }
  }

  test("scd2: null attribute forms runs like any other value") {
    val df = Seq(
      (1L, Option("A"), ts("2024-01-01 00:00:00"), 1L),
      (1L, Option.empty[String], ts("2024-01-02 00:00:00"), 2L),
      (1L, Option.empty[String], ts("2024-01-03 00:00:00"), 3L),
      (1L, Option("A"), ts("2024-01-04 00:00:00"), 4L)
    ).toDF("k", "attr", "t", "id")
    val out = Snapshot.scd2(df, "k", "attr", "t", "id")
      .orderBy("valid_from")
      .as[(Long, Option[String], java.sql.Timestamp, Long, Option[java.sql.Timestamp], Boolean)]
      .collect()
    assert(out.map(_._2).toSeq == Seq(Some("A"), None, Some("A")),
      "null run collapses (null==null extends) and bounds its neighbors")
    assert(out.map(_._4).toSeq == Seq(1L, 2L, 1L))
  }

  test("scd2Apply: maintain ≡ rebuild across extend/close/new-key/null splits") {
    type Run = (Long, Option[String], java.sql.Timestamp, Long, Option[java.sql.Timestamp], Boolean)
    def runs(df: org.apache.spark.sql.DataFrame): Set[Run] =
      df.select(col("k"), col("attr"), col("valid_from"), col("n_obs"),
        col("valid_to"), col("is_current"))
        .as[(Long, Option[String], java.sql.Timestamp, Long,
          Option[java.sql.Timestamp], Boolean)]
        .collect().toSet
    // log with every boundary case: key 1 EXTENDS (A continues across the
    // split), key 2 CLOSES (X→Y at the boundary), key 3 is NEW in the
    // batch, key 4's null run continues (null <=> null extends)
    val log = Seq(
      (1L, Option("A"), ts("2024-01-01 00:00:00"), 1L),
      (1L, Option("A"), ts("2024-01-05 00:00:00"), 2L),
      (2L, Option("X"), ts("2024-01-02 00:00:00"), 3L),
      (4L, Option.empty[String], ts("2024-01-03 00:00:00"), 4L),
      // ---- split here: everything below is the batch
      (1L, Option("A"), ts("2024-02-01 00:00:00"), 5L),
      (1L, Option("B"), ts("2024-02-02 00:00:00"), 6L),
      (2L, Option("Y"), ts("2024-02-03 00:00:00"), 7L),
      (3L, Option("N"), ts("2024-02-04 00:00:00"), 8L),
      (3L, Option("M"), ts("2024-02-05 00:00:00"), 9L),
      (4L, Option.empty[String], ts("2024-02-06 00:00:00"), 10L)
    ).toDF("k", "attr", "t", "id")
    val cut = ts("2024-02-01 00:00:00")
    val dim0 = Snapshot.scd2(log.filter(col("t") < cut), "k", "attr", "t", "id")
    val applied = Snapshot.scd2Apply(
      dim0, log.filter(col("t") >= cut), "k", "attr", "t", "id")
    val full = Snapshot.scd2(log, "k", "attr", "t", "id")
    assert(runs(applied) == runs(full), "maintain must equal rebuild")
    // spot-check the extend case kept ONE merged run with summed n_obs
    val k1a = runs(applied).filter(r => r._1 == 1L && r._2.contains("A"))
    assert(k1a.size == 1 && k1a.head._4 == 3L, "A-run must merge, 2+1 obs")
    // randomized: 25 keys, random split point, two successive applies
    val rnd = new scala.util.Random(99)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = for { k <- 1L to 25L; i <- 1 to (3 + rnd.nextInt(20)) }
      yield (k, Option(s"s${rnd.nextInt(3)}"),
        new java.sql.Timestamp(base + i * 86400000L), k * 1000 + i)
    val df = rows.toDF("k", "attr", "t", "id")
    val c1 = new java.sql.Timestamp(base + 7L * 86400000L)
    val c2 = new java.sql.Timestamp(base + 14L * 86400000L)
    val d0 = Snapshot.scd2(df.filter(col("t") < c1), "k", "attr", "t", "id")
    val d1 = Snapshot.scd2Apply(d0,
      df.filter(col("t") >= c1 && col("t") < c2), "k", "attr", "t", "id")
    val d2 = Snapshot.scd2Apply(d1, df.filter(col("t") >= c2), "k", "attr", "t", "id")
    assert(runs(d2) == runs(Snapshot.scd2(df, "k", "attr", "t", "id")),
      "two-apply chain must equal the full rebuild")
  }

  // ------------------------------------------------- robust outliers (MAD)

  test("robustSummary: lower median, MAD, and Hampel count are exact") {
    // group g: values 1..9 and one wild point 1000 (n=10, even)
    // grid = value · 2^20; lower median of 1..9,1000 at rank 5 → 5
    // devs: |q-5| → 4,3,2,1,0,1,2,3,4,995 → sorted ranks: lower median
    // at rank 5 (n=10) → 2; outliers: dev·10⁴ > 3·14826·mad_grid
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 1000.0)).toDF("grp", "v")
    val row = Outliers.robustSummary(df, "grp", "v", k = 3)
      .as[(String, Long, Long, Long, Long)].collect().head
    val (_, n, med, mad, outliers) = row
    assert(n == 10)
    assert(med == 5L << 20, "lower median of even-count group stays on grid")
    assert(mad == 2L << 20)
    // dev=995·2^20: 995·10⁴ > 3·14826·2 ⇔ 9,950,000 > 88,956 → outlier;
    // dev=4·2^20: 40,000 < 88,956 → not
    assert(outliers == 1L)
  }

  test("flagged returns exactly the rows the summary counts") {
    val df = (1 to 50).map(i => (i.toLong, "g", if (i == 13) 9999.0 else i.toDouble))
      .toDF("id", "grp", "v")
    val summary = Outliers.robustSummary(df, "grp", "v").as[(String, Long, Long, Long, Long)]
      .collect().head
    val rows = Outliers.flagged(df, "grp", "v", "id").as[(Long, String, Double)].collect()
    assert(rows.length.toLong == summary._5)
    assert(rows.exists(_._1 == 13L), "the planted wild point is flagged")
  }

  test("robustSummary is partitioning-invariant") {
    val df = (1 to 101).map(i => (s"g${i % 3}", math.sin(i) * 100)).toDF("grp", "v")
    val a = Outliers.robustSummary(df.repartition(1), "grp", "v").collect().toSet
    val b = Outliers.robustSummary(df.repartition(7), "grp", "v").collect().toSet
    assert(a == b)
  }

  // --------------------------------------------------------- majority vote

  test("majority: winner by count, ties broken by label order") {
    val votes = Seq(
      (1L, "cat"), (1L, "cat"), (1L, "dog"),          // clear winner
      (2L, "dog"), (2L, "cat"),                        // tie → 'cat' (asc)
      (3L, "owl")                                      // single vote
    ).toDF("item", "lbl")
    val out = Labels.majority(votes, "item", "lbl")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "cat", 2L, 3L), (2L, "cat", 1L, 2L), (3L, "owl", 1L, 1L)))
  }

  test("disputed: exact rational agreement threshold, no doubles") {
    val votes = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),  // 2/3 agreement
      (2L, "a"), (2L, "b")              // 1/2 agreement
    ).toDF("item", "lbl")
    // threshold 2/3: strictly-below keeps only item 2
    val low = Labels.disputed(votes, "item", "lbl", 2L, 3L).as[(Long, String, Long, Long)].collect()
    assert(low.map(_._1).toSeq == Seq(2L))
  }

  // ----------------------------------------------------- canonicalization

  test("canonicalClusters elects by (quality DESC, id ASC), nulls last") {
    // two clusters: {1,2,3} and {10,11}; 2 has top quality; 10/11 tie on
    // missing quality → min id 10 wins
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val quality = Seq((1L, Some(5L)), (2L, Some(9L)), (3L, Some(9L))).toDF("id", "q")
    val out = Dedup.canonicalClusters(pairs, quality, "id", "q")
      .as[(Long, Long, Option[Long], Long)].collect().sortBy(_._1)
    // cluster 1: 2 and 3 tie at 9 → id 2; cluster 10: both null → id 10
    assert(out.toSeq == Seq((1L, 2L, Some(9L), 3L), (10L, 10L, None, 2L)))
  }

  // -------------------------------------------------- md5 sign projection

  test("signProject: exact long sums against an independent replay") {
    val df = Seq(
      (1L, Seq(0.5f, -0.25f, 1.0f)),
      (2L, Seq(0.0f, 0.125f, -1.5f))
    ).toDF("vid", "vec")
    val k = 4
    val out = Similarity.signProject(df, "vid", "vec", k)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 2 * k)
    assert(out.map(_._2).distinct.sorted.toSeq == (0 until k).toSeq)
    // independent replay: md5 via java.security directly, grid via BigDecimal
    def sign(j: Int, i: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else -1L
    }
    val vecs = Map(
      1L -> Seq(0.5f, -0.25f, 1.0f),
      2L -> Seq(0.0f, 0.125f, -1.5f))
    out.foreach { case (vid, j, v) =>
      val want = vecs(vid).zipWithIndex.map { case (x, i) =>
        sign(j, i) * math.floor(x.toDouble * (1L << 20)).toLong
      }.sum
      assert(v == want, s"vid=$vid dim=$j")
    }
  }

  test("signProject is deterministic across runs and partitionings") {
    val df = (1 to 40).map(i => (i.toLong, Seq.tabulate(8)(d => (i * 0.1f + d)))).toDF("vid", "vec")
    val a = Similarity.signProject(df.repartition(1), "vid", "vec", 6).collect().toSet
    val b = Similarity.signProject(df.repartition(5), "vid", "vec", 6).collect().toSet
    assert(a == b && a.size == 240)
  }

  // ------------------------------------------------------ linear inference

  test("linearLogit folds left in the declared order; label thresholds on 0") {
    val df = Seq((1L, 2.0, 10.0), (2L, -1.0, 0.0), (3L, 0.0, 0.0)).toDF("id", "f1", "f2")
    val logit = Inference.linearLogit(-1.0, Seq(col("f1") -> 0.5, col("f2") -> 0.125))
    val out = df.select(col("id"), logit.as("l"), Inference.label(logit).as("y"))
      .as[(Long, Double, Int)].collect().sortBy(_._1)
    // ((-1.0 + 2.0·0.5) + 10.0·0.125) = 1.25 → 1
    assert(out(0) == ((1L, 1.25, 1)))
    assert(out(1) == ((2L, -1.5, 0)))
    assert(out(2) == ((3L, -1.0, 0)))
  }

  test("label propagates null features as null, not as a silent class") {
    val df = Seq((1L, Some(4.0)), (2L, None)).toDF("id", "f")
    val logit = Inference.linearLogit(0.0, Seq(col("f") -> 1.0))
    val out = df.select(col("id"), Inference.label(logit).as("y"))
      .as[(Long, Option[Int])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, Some(1)), (2L, None)))
  }

  // ------------------------------------------------------ heavy-key report

  // ---------------------------------------------------- half-life decay

  test("decay score halves per elapsed half-life, excludes post-ref events") {
    val ref = ts("2024-01-10 00:00:00")
    val df = Seq(
      (1L, ts("2024-01-10 00:00:00"), 8.0),  // age 0 → full 8·2^20
      (1L, ts("2024-01-09 00:00:00"), 8.0),  // 24 h → one half-life → 4·2^20
      (1L, ts("2024-01-07 23:00:00"), 8.0),  // 49 h → two half-lives → 2·2^20
      (1L, ts("2024-01-11 00:00:00"), 100.0) // after ref → excluded
    ).toDF("user", "t", "v")
    val out = Decay.score(df, "user", "t", "v", ref, halfLifeHours = 24)
      .as[(Long, Long, Long)].collect().head
    assert(out._3 == 3L, "post-ref event must not count")
    assert(out._2 == (8L << 20) + (4L << 20) + (2L << 20))
  }

  test("decay shift floors negative grid values like the oracle's >>") {
    val ref = ts("2024-01-02 00:00:00")
    // -3·2^20 >> 1 = -1572864 (arithmetic shift floors toward -inf)
    val df = Seq((1L, ts("2024-01-01 00:00:00"), -3.0)).toDF("user", "t", "v")
    val out = Decay.score(df, "user", "t", "v", ref, halfLifeHours = 24)
      .as[(Long, Long, Long)].collect().head
    assert(out._2 == (-3L << 20) >> 1)
  }

  // ------------------------------------------------ equal-frequency bins

  test("binEqualFreq: exact rank boundaries, tie-stable, partition-invariant") {
    val df = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Vectorize.binEqualFreq(df, "id", "v", k = 4)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(out.map(_._3).toSeq == Seq(0, 0, 1, 1, 2, 2, 3, 3))
    // all-equal values: one bucket, never split
    val ties = (1 to 10).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val tb = Vectorize.binEqualFreq(ties, "id", "v", k = 4)
      .as[(Long, Long, Int)].collect()
    assert(tb.map(_._3).distinct.toSeq == Seq(0))
    val a = Vectorize.binEqualFreq(df.repartition(5), "id", "v", 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(a == out.toSet)
  }

  // ------------------------------------------------------ exact Pearson

  test("corrExact: ±1 on exact linear data, null on zero variance, stable bits") {
    val df = ((1 to 100).map(i => ("up", i.toDouble, 2.0 * i)) ++
      (1 to 100).map(i => ("down", i.toDouble, -3.0 * i)) ++
      (1 to 50).map(i => ("flat", i.toDouble, 7.0))).toDF("g", "x", "y")
    val out = Checks.corrExact(df, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(math.abs(out("up")._3.get - 1.0) < 1e-12)
    assert(math.abs(out("down")._3.get + 1.0) < 1e-12)
    assert(out("flat")._3.isEmpty, "zero variance must be null, not NaN")
    // bit-stability across partitionings — the reason this op exists
    val bits = (n: Int) => Checks.corrExact(df.repartition(n), "g", "x", "y")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3.map(java.lang.Double.doubleToLongBits)).toMap
    assert(bits(1) == bits(7))
  }

  test("corrMatrix: one-pass cells equal per-pair corrExact; pairwise-complete nulls") {
    val rnd = new scala.util.Random(47)
    val rows = (1 to 200).map { i =>
      val a = rnd.nextDouble() * 10
      (a, 2.0 * a + rnd.nextDouble(), rnd.nextDouble() * 5,
        if (i % 7 == 0) None else Some(rnd.nextDouble() - a))
    }
    val df = rows.toDF("a", "b", "c", "d")
    val got = Checks.corrMatrix(df, Seq("a", "b", "c", "d"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4.map(java.lang.Double.doubleToLongBits))).toMap
    assert(got.size == 6)
    // every cell bit-equals the dedicated single-pair op on the same rows
    for (((cx, cy), (n, corr)) <- got) {
      val single = Checks.corrExact(df.withColumn("g", lit(1)), "g", cx, cy)
        .as[(Int, Long, Option[Double])].collect().head
      assert(single._2 == n && single._3.map(java.lang.Double.doubleToLongBits) == corr,
        s"pair ($cx,$cy) diverged from corrExact")
    }
    // pairwise-complete: pairs with d use fewer rows than pairs without
    assert(got(("a", "d"))._1 < got(("a", "b"))._1)
    // partitioning invariance of the fused pass
    val bits = (p: Int) => Checks.corrMatrix(df.repartition(p), Seq("a", "b", "c", "d"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2, r._3, r._4.map(java.lang.Double.doubleToLongBits))).toSet
    assert(bits(1) == bits(13))
    intercept[IllegalArgumentException] { Checks.corrMatrix(df, Seq("a")) }
    intercept[IllegalArgumentException] { Checks.corrMatrix(df, Seq("a", "a")) }
  }

  test("mutualInfo: independence → ~0, determinism → hx, invariant, null-dropped") {
    // x determines y exactly: mi == hx == hy (same partition structure)
    val det = (1 to 120).map(i => (s"k${i % 4}", s"v${i % 4}")).toDF("x", "y")
    val detRow = Checks.mutualInfo(det, "x", "y").collect().head
    assert(detRow.getAs[Long]("n") == 120)
    // floor vs -ceil keeps mi and hx one grid unit apart at most
    assert(math.abs(detRow.getAs[Double]("mi") - detRow.getAs[Double]("hx")) < 1e-5)
    assert(math.abs(detRow.getAs[Double]("nmi") - 1.0) < 1e-5)
    // independent uniform cross: every cell c=N/(|X||Y|) → mi_num exactly 0
    val ind = (for { i <- 0 until 6; j <- 0 until 5; _ <- 0 until 4 }
      yield (s"x$i", s"y$j")).toDF("x", "y")
    val indRow = Checks.mutualInfo(ind, "x", "y").collect().head
    assert(indRow.getAs[Long]("mi_num") == 0L && indRow.getAs[Double]("nmi") == 0.0)
    // nulls dropped, not a category
    val withNull = det.union(Seq((null: String, "v0"), ("k0", null: String)).toDF("x", "y"))
    assert(Checks.mutualInfo(withNull, "x", "y").collect().head.getAs[Long]("n") == 120)
    // partitioning invariance
    val bits = (p: Int) => Checks.mutualInfo(det.repartition(p), "x", "y")
      .collect().head.toSeq.toList
    assert(bits(1) == bits(13))
  }

  test("mannWhitney: hand-checked U and z, tie degeneracy, invariance") {
    // disjoint groups, no ties: A={1,2,3} B={4,5,6} → U_A = 0,
    // z_A = (0 − 4.5)/2.29128… = −1.96396…, and z_B = −z_A
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 4.0), ("B", 5.0), ("B", 6.0)).toDF("g", "v")
    val out = Checks.mannWhitney(df, "g", "v").orderBy("g").collect()
    assert(out.map(_.getAs[Long]("u2")).toSeq == Seq(0L, 18L)) // 2U
    val zA = out(0).getAs[Double]("z")
    val expected = (0.0 - 4.5) / math.sqrt(3.0 * 3.0 * 7.0 / 12.0)
    assert(math.abs(zA - expected) < 1e-12)
    assert(out(1).getAs[Double]("z") == -zA)
    // all values identical: σ² = 0 exactly → null z, U at its tie value
    val tied = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0)).toDF("g", "v")
    val tRows = Checks.mannWhitney(tied, "g", "v").orderBy("g").collect()
    assert(tRows.forall(_.isNullAt(3)))
    // three groups: each row tests group-vs-rest; partitioning invariant
    val rnd = new scala.util.Random(11)
    val big = (1 to 300).map(i => (s"g${i % 3}", rnd.nextInt(10).toDouble))
      .toDF("g", "v")
    val a = Checks.mannWhitney(big, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val b = Checks.mannWhitney(big.repartition(13), "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(a == b && a.size == 3)
  }

  test("kruskalWallis: H' == z² for two groups; all-tied null; invariance") {
    val rnd = new scala.util.Random(23)
    val two = (1 to 200).map(i =>
      (if (i % 2 == 0) "A" else "B", rnd.nextInt(12).toDouble)).toDF("g", "v")
    val kw = Checks.kruskalWallis(two, "g", "v").collect().head
    val z = Checks.mannWhitney(two, "g", "v").collect().head.getAs[Double]("z")
    // the classic identity: two-group Kruskal–Wallis is the squared
    // (tie-corrected) Mann–Whitney z
    assert(math.abs(kw.getAs[Double]("h_corrected") - z * z) < 1e-9,
      s"H'=${kw.getAs[Double]("h_corrected")} vs z²=${z * z}")
    assert(kw.getAs[Long]("k") == 2 && kw.getAs[Long]("n") == 200)
    // all values tied: the correction denominator vanishes → null
    val tied = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0)).toDF("g", "v")
    assert(Checks.kruskalWallis(tied, "g", "v").collect().head
      .isNullAt(3))
    // partitioning invariance at the bit level (the ordered fold)
    val three = (1 to 300).map(i => (s"g${i % 3}", rnd.nextInt(7).toDouble)).toDF("g", "v")
    def bits(p: Int) = Checks.kruskalWallis(three.repartition(p), "g", "v")
      .collect().head match {
      case r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
    assert(bits(1) == bits(13))
  }

  test("tableChecksum: order/layout-free, cell-sensitive, boundary-injective") {
    val df = Seq((1L, "x", "p"), (2L, "y", null: String), (3L, "z", "r"))
      .toDF("id", "a", "b")
    def sum(d: org.apache.spark.sql.DataFrame) =
      Checks.tableChecksum(d, Seq("id", "a", "b")).collect().head
    val base = sum(df)
    assert(base.getAs[Long]("n_rows") == 3)
    // row order and partitioning cannot move the sum
    assert(sum(df.orderBy(desc("id"))).getString(1) == base.getString(1))
    assert(sum(df.repartition(7)).getString(1) == base.getString(1))
    // any single-cell change does
    val changed = Seq((1L, "x", "p"), (2L, "y", null: String), (3L, "z", "R"))
      .toDF("id", "a", "b")
    assert(sum(changed).getString(1) != base.getString(1))
    // injective cell encoding: ("a1","b") vs ("a","1b") differ; null ≠ ""
    def two(rows: Seq[(String, String)]) =
      Checks.tableChecksum(rows.toDF("a", "b"), Seq("a", "b")).collect().head.getString(1)
    assert(two(Seq(("a1", "b"))) != two(Seq(("a", "1b"))))
    assert(two(Seq((null, "b"))) != two(Seq(("", "b"))))
    intercept[IllegalArgumentException] { Checks.tableChecksum(df, Seq.empty) }
  }

  test("personalizedPageRankExact: chain propagation, zero unreachable, all-seeds ≡ global") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val s = Graph.ScoreScale
    val base = 3L * s / 20L
    val out = Graph.personalizedPageRankExact(edges, seeds, iterations = 1)
      .as[(Long, Long)].collect().toMap
    // seed keeps its restart mass; node 2 receives 17/20 of the seed's
    // full score; 3 gets nothing yet; 4 (unreachable from the seed) is 0
    assert(out(1L) == base)
    assert(out(2L) == 17L * s / 20L)
    assert(out(3L) == 0L && out(4L) == 0L)
    // two iterations push mass one hop further
    val out2 = Graph.personalizedPageRankExact(edges, seeds, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(out2(3L) > 0L && out2(4L) == 0L)
    // seeding EVERY node reproduces global PageRank bit-for-bit
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val ppr = Graph.personalizedPageRankExact(edges, nodes, iterations = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val pr = Graph.pageRankExact(edges, iterations = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(ppr == pr)
  }

  // ------------------------------------------------------------ A/B χ²

  test("ols2Exact: recovers an exact plane; collinear features go null; invariant") {
    import graft.ops.Checks
    // y = 2 + 3·x1 + 5·x2 on integer points — coefficients recover to
    // within double rounding of the (huge) determinants
    val pts = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 1), (3, 2))
      .map { case (a, b) => ("g", a.toDouble, b.toDouble, 2.0 + 3 * a + 5 * b) }
      .toDF("g", "x1", "x2", "y")
    val r = Checks.ols2Exact(pts, "g", "x1", "x2", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(r._2 == 6L)
    assert(math.abs(r._3.get - 2.0 * 1048576.0) < 1.0, s"b0=${r._3}")
    assert(math.abs(r._4.get - 3.0) < 1e-9 && math.abs(r._5.get - 5.0) < 1e-9)
    // collinear x2 = x1 → singular normal equations → nulls, not garbage
    val col2 = Seq(("g", 1.0, 1.0, 4.0), ("g", 2.0, 2.0, 8.0), ("g", 3.0, 3.0, 12.0))
      .toDF("g", "x1", "x2", "y")
    val s = Checks.ols2Exact(col2, "g", "x1", "x2", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(s._3.isEmpty && s._4.isEmpty && s._5.isEmpty)
    val rep = Checks.ols2Exact(pts.repartition(4), "g", "x1", "x2", "y").collect().head
    assert(rep == Checks.ols2Exact(pts, "g", "x1", "x2", "y").collect().head,
      "partitioning-invariant bits")
  }

  test("spearmanExact: monotone→1 (even nonlinear), anti→-1, ties share ranks") {
    import graft.ops.Checks
    // nonlinear but monotone: Pearson < 1, Spearman exactly 1
    val mono = Seq(("g", 1.0, 1.0), ("g", 2.0, 4.0), ("g", 3.0, 9.0))
      .toDF("g", "x", "y")
    // the fixed-order double combine rounds at sqrt — bit-STABLE (the
    // oracle replays the identical bits) but not algebraically clamped,
    // so ±1 lands within one ulp, not exactly on it
    def near(v: Option[Double], want: Double) =
      v.exists(d => math.abs(d - want) < 1e-12)
    val r1 = Checks.spearmanExact(mono, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    assert(r1._2 == 3L && near(r1._3, 1.0))
    // anti-monotone
    val anti = Seq(("g", 1.0, 30.0), ("g", 2.0, 20.0), ("g", 3.0, 10.0))
      .toDF("g", "x", "y")
    assert(near(Checks.spearmanExact(anti, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3, -1.0))
    // identical tie pattern on both sides is still a perfect rank match:
    // doubled ranks (2,5,5,8) on x AND y → ρ = 1
    val ties = Seq(("g", 1.0, 10.0), ("g", 2.0, 20.0), ("g", 2.0, 20.0), ("g", 3.0, 40.0))
      .toDF("g", "x", "y")
    assert(near(Checks.spearmanExact(ties, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3, 1.0))
    // zero variance → null, and partitioning must not change any bit
    val const = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)).toDF("g", "x", "y")
    assert(Checks.spearmanExact(const, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3.isEmpty)
    val big = (1 to 200).map(i => ("g", (i % 7).toDouble, ((i * 13) % 11).toDouble))
      .toDF("g", "x", "y")
    val a = Checks.spearmanExact(big, "g", "x", "y").collect().head
    val b = Checks.spearmanExact(big.repartition(7), "g", "x", "y").collect().head
    assert(a == b, "partitioning-invariant bits")
  }

  test("abReport: hand-checked chi-square, degenerate tables are null") {
    // a=30 conv of n_a=100; c=10 conv of n_b=100 → classic 2×2
    val units = ((1 to 100).map(i => (i.toLong, 0L, if (i <= 30) 1L else 0L)) ++
      (101 to 200).map(i => (i.toLong, 1L, if (i <= 110) 1L else 0L)))
      .toDF("id", "variant", "converted")
    val r = Experiment.abReport(units, "variant", "converted")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert((r._1, r._2, r._3, r._4) == ((100L, 30L, 100L, 10L)))
    // χ² = N(ad−bc)²/(n_a·n_b·c1·c2) = 200·(30·90−70·10)²/(100·100·40·160)
    val want = 200.0 * math.pow(30.0 * 90 - 70.0 * 10, 2) / (100.0 * 100 * 40 * 160)
    assert(math.abs(r._5.get - want) < 1e-9)
    // all-converted column ⇒ a margin is zero ⇒ null, not NaN
    val degen = Seq((1L, 0L, 1L), (2L, 1L, 1L)).toDF("id", "variant", "converted")
    val d = Experiment.abReport(degen, "variant", "converted")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(d._5.isEmpty)
  }

  // ------------------------------------------------------------ ECDF ppm

  test("ecdfNormalize: exact ppm ranks, ties share, max hits 1e6") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, 40.0)).toDF("id", "v")
    val out = Vectorize.ecdfNormalize(df, "id", "v")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // cum: 10→1, 20→3, 40→4 of n=4
    assert(out.map(_._3).toSeq == Seq(250000L, 750000L, 750000L, 1000000L))
    val rep = Vectorize.ecdfNormalize(df.repartition(3), "id", "v")
      .as[(Long, Long, Long)].collect().toSet
    assert(rep == out.toSet)
  }

  // ---------------------------------------------------------- drift report

  test("driftReport: identical samples → zero TV numerators; shift localizes") {
    val ref = (1 to 80).map(i => (i.toLong, (i % 8).toDouble)).toDF("id", "v")
    val same = Vectorize.driftReport(ref, ref, "v", k = 4)
      .as[(Int, Long, Long, Long)].collect()
    assert(same.forall(_._4 == 0L), "self-drift must be exactly zero")
    assert(same.map(_._2).sum == 80L)
    // shifted sample: mass moves to the top bucket and the numerator says so
    val cur = (1 to 80).map(i => (i.toLong, 7.0)).toDF("id", "v")
    val drift = Vectorize.driftReport(ref, cur, "v", k = 4)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(drift.last._3 == 80L, "all current mass in the top bucket")
    assert(drift.init.forall(_._3 == 0L))
    assert(drift.last._4 > 0L && drift.init.forall(_._4 > 0L))
  }

  // ------------------------------------------------------ class balancing

  test("editOnePairs: lossless vs brute force; ed=2 sig-collisions filtered; invariance") {
    import graft.ops.Linkage
    val names = Seq(
      (1L, "smith"), (2L, "smyth"), // substitution
      (3L, "smiths"), // insertion vs 1
      (4L, "mith"), // deletion vs 1
      (5L, "smthy"), // shares deletion "smth" with 2's "smth"? ed(2,5)=2 — must NOT pair
      (6L, "jones"), (7L, "smith"), // exact duplicate of 1
      (8L, null.asInstanceOf[String]))
    val df = names.toDF("id", "name")
    def brute = (for {
      Seq((ia, na), (ib, nb)) <- names.filter(_._2 != null).sortBy(_._1).combinations(2)
      d = {
        val dp = Array.tabulate(na.length + 1, nb.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to na.length; j <- 1 to nb.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (na(i - 1) == nb(j - 1)) 0 else 1))
        dp(na.length)(nb.length)
      }
      if d <= 1
    } yield (ia, ib, d)).toSet
    val got = Linkage.editOnePairs(df, "id", "name")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute && got.nonEmpty)
    assert(got.contains((1L, 7L, 0)) && got.contains((1L, 2L, 1)) &&
      got.contains((1L, 3L, 1)) && got.contains((1L, 4L, 1)))
    assert(!got.exists(p => (p._1, p._2) == (2L, 5L)),
      "an ed=2 pair sharing a deletion signature must be verified away")
    val got13 = Linkage.editOnePairs(df.repartition(13), "id", "name")
      .as[(Long, Long, Int)].collect().toSet
    assert(got13 == got)
    intercept[IllegalArgumentException] {
      Linkage.editOnePairs(df.withColumn("id", col("id").cast("string")), "id", "name")
    }
  }

  test("psiReport: identical → zero, shift → positive, one-sided → null, invariant") {
    import graft.ops.Vectorize
    val ref = (1 to 400).map(i => Tuple1(i.toDouble)).toDF("v")
    val same = Vectorize.psiReport(ref, ref, "v", k = 4).collect()
    // identical distributions: every cross-multiplied numerator is 0
    assert(same.length == 4 && same.forall(_.getAs[Double]("psi_term") == 0.0))
    // a shifted current sample drives the summed PSI positive
    val cur = (201 to 600).map(i => Tuple1(i.toDouble)).toDF("v")
    val shifted = Vectorize.psiReport(ref, cur, "v", k = 4).collect()
    val terms = shifted.flatMap(r => Option(r.getAs[java.lang.Double]("psi_term")).map(_.toDouble))
    assert(terms.sum > 0.1, s"shift must register, got ${terms.sum}")
    // a bucket present only in cur (values beyond the ref range) is null
    val far = (10001 to 10100).map(i => Tuple1(i.toDouble)).toDF("v")
    val oneSided = Vectorize.psiReport(ref, far, "v", k = 4).collect()
    assert(oneSided.exists(r => r.isNullAt(r.fieldIndex("psi_term"))))
    // partitioning invariance, bit-level
    def bits(p: Int) = Vectorize.psiReport(ref.repartition(p), cur.repartition(p), "v", 4)
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n_ref"),
        r.getAs[Long]("n_cur"),
        Option(r.getAs[java.lang.Double]("psi_term"))
          .map(d => java.lang.Double.doubleToLongBits(d)))).toSet
    assert(bits(1) == bits(13))
  }

  test("balanceClasses: every class cut to the smallest, deterministic members") {
    val df = ((1 to 50).map(i => (i.toLong, Some("big"))) ++
      (51 to 60).map(i => (i.toLong, Some("mid"))) ++
      (61 to 63).map(i => (i.toLong, Some("small"))) :+
      (99L, Option.empty[String])).toDF("id", "cls")
    val out = Sampling.balanceClasses(df, "cls", "id")
      .as[(Long, String, Int)].collect()
    val byClass = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byClass == Map("big" -> 3, "mid" -> 3, "small" -> 3))
    assert(!out.exists(_._1 == 99L), "null class drops")
    val again = Sampling.balanceClasses(df.repartition(7), "cls", "id")
      .as[(Long, String, Int)].collect()
    assert(again.toSet == out.toSet, "members are partitioning-invariant")
  }

  // -------------------------------------------------------- MERGE/upsert

  test("applyChanges: delete drops, update rewrites, upsert is permissive") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "ignored", "delete"),
      (2L, "B", "update"),   // normal update
      (3L, "C", "insert"),   // insert over existing key → overwrite
      (4L, "d", "update"),   // update without base row → insert
      (5L, "e", "insert")
    ).toDF("k", "v", "op")
    val out = Snapshot.applyChanges(base, changes, Seq("k"), "op")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(2L -> "B", 3L -> "C", 4L -> "d", 5L -> "e"))
  }

  // --------------------------------------------- funnel transition stats

  test("transitionStats: exact lower median/p90 of hop latency, ordered entries only") {
    def ev(u: Long, t: String, ty: String) = (u, ty, ts(t))
    val df = Seq(
      // user 1: view→click 10 s, click→purchase 100 s
      ev(1, "2024-01-01 00:00:00", "view"), ev(1, "2024-01-01 00:00:10", "click"),
      ev(1, "2024-01-01 00:01:50", "purchase"),
      // user 2: view→click 20 s, no purchase
      ev(2, "2024-01-01 00:00:00", "view"), ev(2, "2024-01-01 00:00:20", "click"),
      // user 3: click BEFORE view — never enters the click stage
      ev(3, "2024-01-01 00:00:30", "view"), ev(3, "2024-01-01 00:00:00", "click"),
      // user 4: view→click 30 s
      ev(4, "2024-01-01 00:00:00", "view"), ev(4, "2024-01-01 00:00:30", "click")
    ).toDF("user_id", "event_type", "t")
    val out = Funnel.transitionStats(df, "user_id", "event_type", "t",
        Seq("view", "click", "purchase"))
      .as[(String, String, Long, Long, Long)].collect().sortBy(_._1).reverse
    // view→click gaps {10,20,30}: n=3, lower med at rank 2 → 20, p90 rank 3 → 30
    assert(out(0) == (("view", "click", 3L, 20L, 30L)))
    assert(out(1) == (("click", "purchase", 1L, 100L, 100L)))
  }

  // ------------------------------------------------- vocabulary coverage

  test("oovRate: occurrence counting, deterministic cut line, token-free docs drop") {
    val df = Seq(
      (1L, "aa aa bb cc"),
      (2L, "cc cc dd"),
      (3L, "")            // no tokens → no row
    ).toDF("id", "text")
    // counts: aa=2, cc=3, bb=1, dd=1 → top-2 = {cc, aa}
    val out = Vocab.oovRate(df, "id", "text", vocabSize = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0) == ((1L, 4L, 1L)), "only bb is OOV for doc 1 under vocab {cc,aa}")
    assert(out(1) == ((2L, 3L, 1L)), "dd OOV for doc 2")
  }

  // ------------------------------------------------- integer PageRank

  test("pageRankExact: hand-checked 2-cycle, hub dominance, partition-invariant") {
    // 2-cycle: symmetric nodes stay equal; one iteration from uniform
    // 2^40 gives base + (17·(2^40 DIV 1)) DIV 20 exactly
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val one = Graph.pageRankExact(cyc, iterations = 1)
      .as[(Long, Long)].collect().toMap
    val base = 3L * (1L << 40) / 20L
    assert(one(1L) == base + (17L * (1L << 40)) / 20L)
    assert(one(1L) == one(2L), "symmetric graph → equal ranks")
    // star: the hub must outrank every leaf after 2 iterations
    val star = (2L to 6L).flatMap(l => Seq((l, 1L), (1L, l))).toDF("src", "dst")
    val pr = Graph.pageRankExact(star, iterations = 2).as[(Long, Long)].collect().toMap
    assert((2L to 6L).forall(l => pr(1L) > pr(l)))
    val a = Graph.pageRankExact(star.repartition(5), 2).as[(Long, Long)].collect().toMap
    assert(a == pr, "integer iteration must be partitioning-invariant")
  }

  // ------------------------------------------- triangles / communities

  test("triangles: K3 + pendant — counts, clustering ppm, partition-invariant") {
    // triangle 1-2-3 plus pendant 4 attached to 3; duplicate + reversed
    // edges and a self-loop must all collapse
    val g = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 4L))
      .toDF("src", "dst")
    val out = Graph.triangles(g)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 1L, 0L)))
    // clustering: deg-2 corner of one triangle = 2·1·1e6/(2·1) = 1e6 (exact)
    assert(out(0)._4 == 1000000L)
    assert(out(2)._4 == 2L * 1000000L / 6L, "deg-3 node: 2T/(d(d-1)) floored")
    assert(out(3)._4 == 0L, "pendant: degree < 2 → 0")
    val rep = Graph.triangles(g.repartition(5))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rep.toSeq == out.toSeq, "partitioning-invariant")
  }

  test("triangles: K4 — every node in C(3,2)=3 triangles, clustering 1") {
    val nodes = 1L to 4L
    val k4 = (for (a <- nodes; b <- nodes if a < b) yield (a, b)).toDF("src", "dst")
    val out = Graph.triangles(k4).as[(Long, Long, Long, Long)].collect()
    assert(out.forall(r => r._2 == 3L && r._3 == 3L && r._4 == 1000000L))
  }

  test("linkCandidates: K4 minus an edge predicts it; hub pruning forgoes wedges") {
    // K4 without edge 1-4: (1,4) share neighbors {2,3} → cn=2,
    // jaccard = 2e6/(2+2-2) = 1e6; existing edges must never appear
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.linkCandidates(g, maxDegree = 64, topK = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 4L, 2L, 1000000L)))
    // path 1-2-3: (1,3) via apex 2 → cn=1, jaccard = 1e6/(1+1-1)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Graph.linkCandidates(path, 64, 10).as[(Long, Long, Long, Long)].collect()
    assert(p.toSeq == Seq((1L, 3L, 1L, 1000000L)))
    // hub apex above the degree cap: star 1..4 around 9 — no wedges survive
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("src", "dst")
    assert(Graph.linkCandidates(star, maxDegree = 3, topK = 10).count() == 0L,
      "pruned hub must forgo its wedges (documented lower-bound contract)")
    assert(Graph.linkCandidates(star, maxDegree = 4, topK = 10).count() == 6L,
      "within the cap the same hub yields all C(4,2) pairs")
  }

  test("adamicAdar: K4-minus-edge hand score; rare apex outranks hub apex") {
    // K4 without edge 1-4: apexes 2 and 3 each have deg 3 →
    // w = floor(2^20 / ln 3); score = 2w, cn = 2
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val w3 = math.floor(1048576.0 / math.log(3.0)).toLong
    val out = Graph.adamicAdar(g, maxDegree = 64, topK = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 4L, 2L, 2 * w3)))
    // two candidate pairs, one via a deg-2 apex, one via a deg-4 hub: the
    // rare apex must score higher (1/ln 2 > 1/ln 4)
    val g2 = Seq(
      (1L, 2L), (2L, 3L), // apex 2: deg 2 → pair (1,3)
      (4L, 9L), (5L, 9L), (6L, 9L), (7L, 9L) // apex 9: deg 4 → pairs among 4..7
    ).toDF("src", "dst")
    val rows = Graph.adamicAdar(g2, maxDegree = 64, topK = 10)
      .as[(Long, Long, Long, Long)].collect()
    val top = rows.head
    assert((top._1, top._2) == (1L, 3L), s"rare apex must rank first: ${rows.toSeq}")
    assert(top._4 == math.floor(1048576.0 / math.log(2.0)).toLong)
    // existing edges never appear
    assert(rows.forall { case (u, v, _, _) =>
      !Set((1L, 2L), (2L, 3L)).contains((u, v)) })
  }

  test("pairAlignment: identical pair wins its control; output shape; derangement wraps") {
    import graft.ops.Multimodal
    // vectors 0..2 pair with 10..12; 0↔10 and 1↔11 identical (cos 1),
    // 2↔12 orthogonal (cos 0) so its control (10, cos 1·?) can beat it
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(1f, 0f)),
      (10L, Seq(1f, 0f)), (11L, Seq(0f, 1f)), (12L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Multimodal.pairAlignment(vecs, "vec_id", "embedding", n = 3, offset = 10)
      .orderBy("id_a")
      .as[(Long, Long, Double, Double, Int)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((0L, 10L), (1L, 11L), (2L, 12L)))
    // pair 0: cos(e0,e10)=1, control is e11 (next) → cos 0 → aligned
    assert(out(0)._3 == 1.0 && out(0)._4 == 0.0 && out(0)._5 == 1)
    // pair 2: cos(e2,e12)=0, control wraps to e10 → cos 1 → misaligned
    assert(out(2)._3 == 0.0 && out(2)._4 == 1.0 && out(2)._5 == 0)
  }

  test("kCore: chain peels in cascades; clique survives; degenerate inputs; invariant") {
    // triangle {1,2,3} with a pendant CHAIN 3-4-5: round 1 peels 5 (deg 1),
    // round 2 peels 4 — the cascade a single pass misses
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val out = Graph.kCore(g, k = 2, rounds = 8)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)),
      s"only the triangle is 2-core: ${out.toSeq}")
    // one round keeps node 4 (its degree was 2 before 5 fell) — the
    // bounded-rounds contract is a monotone superset
    val r1 = Graph.kCore(g, k = 2, rounds = 1).as[(Long, Long)].collect().sortBy(_._1)
    assert(r1.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // k above the max degree empties the graph
    assert(Graph.kCore(g, k = 4, rounds = 8).count() == 0L)
    // empty input peels to empty without error
    assert(Graph.kCore(g.filter(col("src") < 0), k = 2, rounds = 3).count() == 0L)
    val rep = Graph.kCore(g.repartition(5), k = 2, rounds = 8)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rep.toSeq == out.toSeq, "partitioning-invariant")
    intercept[IllegalArgumentException] { Graph.kCore(g, k = 0, rounds = 3) }
  }

  test("bfs: hop distances, min-root tie-break, hop bound, degenerate inputs") {
    // path 1-2-3-4-5 plus branch 3-6; seeds {1, 5}
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L)).toDF("src", "dst")
    def seeds(ids: Long*) = ids.toDF("node")
    val out = Graph.bfs(g, seeds(1L, 5L), maxHops = 4)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    // node 3 is 2 hops from BOTH seeds → min root 1; node 6 hangs off 3
    assert(out.toSeq == Seq((1L, 0, 1L), (2L, 1, 1L), (3L, 2, 1L),
      (4L, 1, 5L), (5L, 0, 5L), (6L, 3, 1L)), s"got ${out.toSeq}")
    // hop bound truncates: 2 hops from seed 1 only reaches {1,2,3}
    val b2 = Graph.bfs(g, seeds(1L), maxHops = 2)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(b2.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // maxHops = 0 returns exactly the seed set
    assert(Graph.bfs(g, seeds(1L, 5L), maxHops = 0).count() == 2L)
    // unreachable component: 8-9 never appears without a seed in it
    val g2 = g.union(Seq((8L, 9L)).toDF("src", "dst"))
    val r = Graph.bfs(g2, seeds(1L), maxHops = 8)
      .as[(Long, Int, Long)].collect().map(_._1).sorted
    assert(r.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // empty seed set → empty output, no error
    assert(Graph.bfs(g, seeds(), maxHops = 3).count() == 0L)
    // partitioning-invariant (distributed frontier joins move no row)
    val rep = Graph.bfs(g.repartition(5), seeds(1L, 5L), maxHops = 4)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(rep.toSeq == out.toSeq)
    intercept[IllegalArgumentException] { Graph.bfs(g, seeds(1L), maxHops = -1) }
  }

  test("shortestPaths: cheapest beats fewest hops; root ties re-propagate; bounds") {
    import org.apache.spark.sql.functions.lit
    def seeds(ids: Long*) = ids.toDF("node")
    // direct edge costs 10; the two-hop detour costs 2
    val g = Seq((1L, 9L, 10L), (1L, 2L, 1L), (2L, 9L, 1L)).toDF("src", "dst", "w")
    val out = Graph.shortestPaths(g, seeds(1L), rounds = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 1L), (2L, 1L, 1L), (9L, 2L, 1L)),
      s"got ${out.toSeq}")
    // rounds = 1 can only use one edge: the direct cost-10 path wins
    val r1 = Graph.shortestPaths(g, seeds(1L), rounds = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r1.find(_._1 == 9L).get._2 == 10L, "bounded-hop contract")
    // root-only improvement must re-offer downstream (regression for the
    // frontier-admission fix): m first settles (1, root 5), then the
    // equal-cost root-1 path arrives via the zero-weight edge and must
    // still reach x one round later
    val g2 = Seq(
      (5L, 20L, 1L), // seed 5 → m, cost 1 (round 1)
      (1L, 10L, 0L), // seed 1 → c, cost 0
      (10L, 20L, 1L), // c → m, total cost 1, smaller root (round 2)
      (20L, 30L, 1L) // m → x
    ).toDF("src", "dst", "w")
    val out2 = Graph.shortestPaths(g2, seeds(1L, 5L), rounds = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out2.find(_._1 == 20L).get == ((20L, 1L, 1L)), s"got ${out2.toSeq}")
    assert(out2.find(_._1 == 30L).get == ((30L, 2L, 1L)),
      "root improvement must propagate past m")
    // parallel edges keep the min cost
    val g3 = Seq((1L, 2L, 9L), (2L, 1L, 3L)).toDF("src", "dst", "w")
    assert(Graph.shortestPaths(g3, seeds(1L), rounds = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      == Seq((1L, 0L, 1L), (2L, 3L, 1L)))
    // negative weight fails loudly in-plan
    intercept[Exception] {
      Graph.shortestPaths(Seq((1L, 2L, -1L)).toDF("src", "dst", "w"),
        seeds(1L), rounds = 2).collect()
    }
    // empty seeds → empty result
    assert(Graph.shortestPaths(g, seeds(), rounds = 3).count() == 0L)
    // partitioning-invariant
    val rep = Graph.shortestPaths(g2.repartition(5), seeds(1L, 5L), rounds = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rep.toSeq == out2.toSeq)
  }

  test("labelPropagate: clique absorbs min label; bridge stays put; invariant") {
    // two triangles {1,2,3} and {10,11,12} joined by bridge 3-10
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L)).toDF("src", "dst")
    // round 1: every triangle node adopts its smallest neighbor's label
    // (all votes are 1-counts → min label wins)
    val r1 = Graph.labelPropagate(g, 1).as[(Long, Long)].collect().toMap
    assert(r1(1L) == 2L && r1(2L) == 1L && r1(3L) == 1L)
    assert(r1(10L) == 3L && r1(11L) == 10L && r1(12L) == 10L)
    // round 2 from those labels: 1's nbrs {2→1, 3→1} vote label 1 twice
    val r2 = Graph.labelPropagate(g, 2).as[(Long, Long)].collect().toMap
    assert(r2(1L) == 1L && r2(2L) == 1L)
    val rep = Graph.labelPropagate(g.repartition(5), 2).as[(Long, Long)].collect().toMap
    assert(rep == r2, "partitioning-invariant")
  }

  test("property: kCore equals the driver-side peel fixpoint on random graphs") {
    import org.scalacheck.{Gen, Prop}
    val genEdges = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 9L), Gen.chooseNum(1L, 9L))).map(_.take(18))
    val genK = Gen.chooseNum(1, 4)
    val prop = Prop.forAll(genEdges, genK) { (raw, k) =>
      var es = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      // brute fixpoint: drop sub-k nodes until stable
      var changed = true
      while (changed && es.nonEmpty) {
        val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = es.filter { case (a, b) => keep(a) && keep(b) }
        changed = next != es
        es = next
      }
      val expected = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap.toSet
      val got = Graph.kCore(raw.toDF("src", "dst"), k, rounds = 12)
        .as[(Long, Long)].collect().toSet
      got == expected
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: pairwiseJaccard equals brute force on random memberships") {
    import org.scalacheck.{Gen, Prop}
    val genRows = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("A", "B", "C", "D"), Gen.chooseNum(1L, 12L))).map(_.take(24))
    val prop = Prop.forAll(genRows) { (raw: List[(String, Long)]) =>
      val sets = raw.toSet.groupBy((t: (String, Long)) => t._1)
        .view.mapValues(_.map(_._2)).toMap
      val gs = sets.keys.toSeq.sorted
      val expected = (for {
        i <- gs.indices; j <- (i + 1) until gs.size
        a = sets(gs(i)); b = sets(gs(j))
        inter = (a & b).size.toLong if inter > 0
      } yield (gs(i), gs(j), a.size.toLong, b.size.toLong, inter,
        inter.toDouble / (a.size + b.size - inter))).toSet
      val got = Overlap.pairwiseJaccard(raw.toDF("g", "m"), col("g"), col("m"))
        .as[(String, String, Long, Long, Long, Double)].collect().toSet
      got == expected
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: triangles equals brute force on random graphs") {
    import org.scalacheck.{Gen, Prop}
    val genEdges = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 8L), Gen.chooseNum(1L, 8L))).map(_.take(16))
    val prop = Prop.forAll(genEdges) { raw =>
      val es = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      if (es.isEmpty) true
      else {
        val nodes = es.flatMap { case (a, b) => Seq(a, b) }
        val adj = nodes.map(n => n ->
          es.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }).toMap
        val expected = nodes.map { n =>
          val nb = adj(n).toSeq.sorted
          val t = (for {
            i <- nb.indices; j <- (i + 1) until nb.size
            if es.contains((math.min(nb(i), nb(j)), math.max(nb(i), nb(j))))
          } yield 1).size.toLong
          val d = nb.size.toLong
          val cc = if (d >= 2) 2L * t * 1000000L / (d * (d - 1)) else 0L
          (n, d, t, cc)
        }
        val got = Graph.triangles(raw.toDF("src", "dst"))
          .as[(Long, Long, Long, Long)].collect().toSet
        got == expected
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: labelPropagate equals a reference synchronous LPA") {
    import org.scalacheck.{Gen, Prop}
    val genEdges = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 7L), Gen.chooseNum(1L, 7L))).map(_.take(14))
    val prop = Prop.forAll(genEdges, Gen.chooseNum(1, 3)) { (raw, rounds) =>
      val es = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      if (es.isEmpty) true
      else {
        val nodes = es.flatMap { case (a, b) => Seq(a, b) }
        val adj = nodes.map(n => n ->
          es.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }).toMap
        var labels = nodes.map(n => n -> n).toMap
        (1 to rounds).foreach { _ =>
          labels = nodes.map { n =>
            val votes = adj(n).toSeq.map(labels).groupBy(identity)
              .view.mapValues(_.size).toMap
            n -> votes.toSeq.map { case (l, c) => (-c, l) }.min._2
          }.toMap
        }
        val got = Graph.labelPropagate(raw.toDF("src", "dst"), rounds)
          .as[(Long, Long)].collect().toMap
        got == labels
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: linkCandidates = brute common-neighbor table when uncapped") {
    import org.scalacheck.{Gen, Prop}
    val genEdges = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 7L), Gen.chooseNum(1L, 7L))).map(_.take(12))
    val prop = Prop.forAll(genEdges) { raw =>
      val es = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      if (es.isEmpty) true
      else {
        val nodes = es.flatMap { case (a, b) => Seq(a, b) }
        val adj = nodes.map(n => n ->
          es.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }).toMap
        val expected = (for {
          u <- nodes; v <- nodes if u < v && !es.contains((u, v))
          cn = (adj(u) intersect adj(v)).size.toLong if cn > 0
        } yield (u, v, cn,
          cn * 1000000L / (adj(u).size + adj(v).size - cn))).toSet
        val got = Graph.linkCandidates(raw.toDF("src", "dst"),
          maxDegree = Long.MaxValue, topK = 1000)
          .as[(Long, Long, Long, Long)].collect().toSet
        got == expected
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: spearmanExact equals the rank-Pearson reference bit-for-bit") {
    import org.scalacheck.{Gen, Prop}
    import graft.ops.Checks
    val genVals = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 5)))
    val prop = Prop.forAll(genVals) { vs =>
      if (vs.size < 2) true
      else {
        def dranks(xs: Seq[Int]): Seq[Long] = {
          val cnt = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val below = cnt.keys.map(v =>
            v -> xs.count(_ < v).toLong).toMap
          xs.map(v => 2L * below(v) + cnt(v) + 1L)
        }
        val rx = dranks(vs.map(_._1))
        val ry = dranks(vs.map(_._2))
        val n = vs.size.toLong
        val sx = rx.sum; val sy = ry.sum
        val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
        val sxx = rx.map(a => a * a).sum
        val syy = ry.map(a => a * a).sum
        val nD = n.toDouble
        val num = nD * sxy.toDouble - sx.toDouble * sy.toDouble
        val vx = nD * sxx.toDouble - sx.toDouble * sx.toDouble
        val vy = nD * syy.toDouble - sy.toDouble * sy.toDouble
        val expected =
          if (vx > 0 && vy > 0) Some(num / (math.sqrt(vx) * math.sqrt(vy)))
          else None
        val df = vs.map { case (x, y) => ("g", x.toDouble, y.toDouble) }
          .toDF("g", "x", "y")
        val got = Checks.spearmanExact(df, "g", "x", "y")
          .as[(String, Long, Option[Double])].collect().head
        got._2 == n && got._3 == expected
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("quantileSelect: matches sort ranks with ties/negatives; empty; overflow-wide ranges") {
    val vs = Seq(5L, -3L, 5L, 0L, 100L, -3L, 7L, Long.MaxValue / 3, 2L)
    val out = Selection.quantileSelect(vs.toDF("x"), col("x"),
      Seq(0.0, 0.5, 1.0), fanout = 4, finishAt = 4)
      .as[(Double, Long, Option[Long])].collect().map(r => r._1 -> r._3.get).toMap
    val sorted = vs.sorted
    def ref(q: Double) = sorted(math.max(1L, math.ceil(q * vs.size).toLong).toInt - 1)
    assert(out(0.0) == ref(0.0) && out(0.5) == ref(0.5) && out(1.0) == ref(1.0), out)
    // empty input: one null-valued row per q, n_rows 0
    val e = Selection.quantileSelect(
      vs.toDF("x").filter(col("x") > Long.MaxValue - 5), col("x"), Seq(0.5))
      .as[(Double, Long, Option[Long])].collect()
    assert(e.toSeq == Seq((0.5, 0L, None)))
    // a mixed-sign range wider than Long exercises the zero-split guard
    val wide = Seq(Long.MinValue + 10, -5L, 3L, Long.MaxValue - 10)
    val w = Selection.quantileSelect(wide.toDF("x"), col("x"),
      Seq(0.25, 0.5, 0.75, 1.0), fanout = 8, finishAt = 8)
      .as[(Double, Long, Option[Long])].collect().map(r => r._1 -> r._3.get).toMap
    assert(w(0.25) == Long.MinValue + 10 && w(0.5) == -5L &&
      w(0.75) == 3L && w(1.0) == Long.MaxValue - 10, w)
    intercept[IllegalArgumentException] {
      Selection.quantileSelect(vs.toDF("x"), col("x"), Seq(1.5))
    }
  }

  test("groupedQuantileSelect: per-group sorted reference; disparate ranges; constants") {
    val rows = (1 to 50).map(i => ("a", (i % 11).toLong)) ++      // small range, ties
      (1 to 30).map(i => ("b", i.toLong * 1000000000L)) ++        // wide range
      (1 to 9).map(_ => ("c", 42L))                               // constant group
    val df = rows.toDF("g", "x")
    for (q <- Seq(0.0, 0.5, 0.9, 1.0)) {
      val got = Selection.groupedQuantileSelect(df, "g", col("x"), q,
        fanout = 4, finishAt = 8)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      rows.groupBy(_._1).foreach { case (g, gs) =>
        val sorted = gs.map(_._2).sorted
        val k = math.max(1L, math.ceil(q * sorted.size).toLong).toInt
        assert(got(g) == (sorted.size.toLong, sorted(k - 1)), s"group $g q=$q")
      }
    }
    val rep = Selection.groupedQuantileSelect(df.repartition(7), "g", col("x"), 0.5,
      fanout = 4, finishAt = 8).as[(String, Long, Long)].collect().toSet
    assert(rep == Selection.groupedQuantileSelect(df, "g", col("x"), 0.5,
      fanout = 4, finishAt = 8).as[(String, Long, Long)].collect().toSet,
      "partitioning-invariant")
  }

  test("property: quantileSelect equals the sorted reference on random longs") {
    import org.scalacheck.{Gen, Prop}
    val genVals = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)).map(_.take(30))
    val genQ = Gen.chooseNum(0.0, 1.0)
    val prop = Prop.forAll(genVals, genQ) { (vals: List[Long], q: Double) =>
      val got = Selection.quantileSelect(vals.toDF("x"), col("x"), Seq(q),
        fanout = 4, finishAt = 8)
        .as[(Double, Long, Option[Long])].collect().head._3.get
      val sorted = vals.sorted
      got == sorted(math.max(1L, math.ceil(q * vals.size).toLong).toInt - 1)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("mergeIntervals: overlap and touch merge, gaps split, contained absorb, keys isolate") {
    val df = Seq(
      // key 1: [1,5] overlaps [3,8], [8,10] TOUCHES (8 == running max) →
      // one span [1,10]; [20,22] is an island; [21,21] nests inside it
      (1L, 1L, 5L), (1L, 3L, 8L), (1L, 8L, 10L), (1L, 20L, 22L), (1L, 21L, 21L),
      // key 2: same numbers must not interact with key 1
      (2L, 4L, 6L)
    ).toDF("k", "s", "e")
    val out = Snapshot.mergeIntervals(df, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 1L, 10L, 3L), (1L, 20L, 22L, 2L), (2L, 4L, 6L, 1L)), out.toSeq)
    val rep = Snapshot.mergeIntervals(df.repartition(5), "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(rep.toSeq == out.toSeq, "partitioning-invariant")
    // a gap of one unit splits ([1,2] then [4,5]: 4 > 2)
    val gap = Seq((1L, 1L, 2L), (1L, 4L, 5L)).toDF("k", "s", "e")
    assert(Snapshot.mergeIntervals(gap, "k", "s", "e").count() == 2L)
  }

  test("pairwiseJaccard: exact overlap, duplicate rows collapse, disjoint pairs absent") {
    val df = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("A", 2L), // duplicate (A,2) must not inflate
      ("B", 2L), ("B", 3L), ("B", 4L),
      ("C", 9L) // disjoint from A and B
    ).toDF("grp", "member")
    val out = Overlap.pairwiseJaccard(df, col("grp"), col("member"))
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("A", "B", 3L, 3L, 2L, 0.5)),
      s"only the intersecting pair, sizes deduped: ${out.toSeq}")
    val rep = Overlap.pairwiseJaccard(df.repartition(5), col("grp"), col("member"))
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rep.toSeq == out.toSeq, "partitioning-invariant")
  }

  test("kAnonymityReport: group sizes, l-diversity, both risk flags; bad args refused") {
    val df = Seq(
      ("x", "s1", 100L), ("x", "s1", 101L),            // n=2 < 5, l_div=1 < 2
      ("y", "s1", 1L), ("y", "s2", 2L), ("y", "s3", 3L), ("y", "s1", 4L),
      ("y", "s2", 5L)                                  // n=5, l_div=3
    ).toDF("quasi", "sens", "id")
    val out = Privacy.kAnonymityReport(df, Seq("quasi"), col("sens"), k = 5, l = 2)
      .as[(String, Long, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("x", 2L, 1L, true, true),
      ("y", 5L, 3L, false, false)), out.toSeq)
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(df, Seq.empty, col("sens"), k = 5)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(df, Seq("quasi"), col("sens"), k = 0)
    }
  }

  test("bootstrap meanCI: CI brackets the truth, constants collapse, invariant; bad args refused") {
    val df = ((1 to 400).map(i => ("g", i.toLong, (i % 21).toLong)) ++
      (1 to 50).map(i => ("const", 1000L + i, 7L)))
      .toDF("src", "id", "v")
    val out = Bootstrap.meanCI(df, "src", "id", col("v"), replicas = 32)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n, mean, lo, hi) = out("g")
    assert(n == 400 && math.abs(mean - 10.0) < 0.5)
    assert(lo <= hi, "interval must be ordered")
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket the point mean $mean")
    assert(hi - lo > 0, "nonzero variance must give a nonzero-width interval")
    // a constant column bootstraps to a degenerate interval at the constant
    val (_, _, cm, cl, ch) = out("const")
    assert(cm == 7.0 && cl == 7.0 && ch == 7.0)
    // deterministic under repartitioning (order-free decimal sums)
    val rep = Bootstrap.meanCI(df.repartition(7), "src", "id", col("v"), replicas = 32)
      .as[(String, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(rep == out, "partitioning-invariant bits")
    // the weight ladder draws Poisson(1)-shaped integers in [0, 8]
    val ws = spark.range(2000)
      .select(Bootstrap.poissonWeight(col("id"), 0, "boot").as("w"))
      .as[Long].collect()
    assert(ws.forall(w => w >= 0 && w <= 8))
    assert(math.abs(ws.sum.toDouble / ws.length - 1.0) < 0.1, "mean weight ~ 1")
    assert(ws.count(_ == 0).toDouble / ws.length > 0.25, "P(0) ~ 1/e")
    intercept[IllegalArgumentException] {
      Bootstrap.meanCI(df, "src", "id", col("v"), replicas = 4)
    }
    intercept[IllegalArgumentException] {
      Bootstrap.meanCI(df, "src", "id", col("v"), alpha = 1.5)
    }
  }

  test("bootstrap ratioCI: brackets the ratio; zero denominator yields null point") {
    val df = (1 to 300)
      .map(i => ("g", i.toLong, (i % 7 + 1).toLong * 10, (i % 7 + 1).toLong))
      .toDF("src", "id", "x", "y")
    val out = Bootstrap.ratioCI(df, "src", "id", col("x"), col("y"), replicas = 32)
      .as[(String, Long, Option[Double], Double, Double)].collect().head
    // x = 10·y row-wise → the ratio and every replica ratio are exactly 10
    assert(out._3.contains(10.0) && out._4 == 10.0 && out._5 == 10.0)
    val zeroDen = (1 to 40).map(i => ("z", i.toLong, 5L, 0L)).toDF("src", "id", "x", "y")
    val z = Bootstrap.ratioCI(zeroDen, "src", "id", col("x"), col("y"), replicas = 32)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])].collect().head
    assert(z._3.isEmpty && z._4.isEmpty && z._5.isEmpty,
      "an all-zero denominator must yield nulls, not NaN/Infinity")
  }

  test("keyReport: exact counts, ppm shares, deterministic rank under ties") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("k")
    val out = Skew.keyReport(df, "k", topN = 3)
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    // total 13; b and c tie at 3 → key order breaks the tie
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, "a", 6L), (2, "b", 3L), (3, "c", 3L)))
    assert(out.head._4 == 6L * 1000000 / 13)
    val all = Skew.keyReport(df.repartition(5), "k", topN = 3)
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(all.toSeq == out.toSeq, "partitioning-invariant")
  }

  test("woeEncode: hand-solved WOE/IV grids, one-sided nulls, null handling") {
    // A: 3 pos / 1 neg; B: 1 pos / 3 neg; C: 2 pos / 0 neg; POS=6 NEG=4
    val rows = Seq(
      ("A", 1), ("A", 1), ("A", 1), ("A", 0),
      ("B", 1), ("B", 0), ("B", 0), ("B", 0),
      ("C", 1), ("C", 1)
    ).map { case (c, y) => (c, y) }.toDF("cat", "y")
    val out = Vectorize.woeEncode(rows, "cat", col("y") === 1)
      .select("cat", "n", "n_pos", "woe_grid", "iv_term_grid")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // independently computed: floor(ln(12/6)*2^20), floor(ln(4/18)*2^20)
    assert(out("A")._4 == Some(726817L) && out("A")._5 == Some(181704L))
    assert(out("B")._4 == Some(-1577140L) && out("B")._5 == Some(919998L))
    assert(out("C")._4.isEmpty && out("C")._5.isEmpty, "one-sided -> null")
    // null targets drop; null categories form their own level
    val withNulls = Seq(
      (Some("A"), Some(1)), (Some("A"), None),
      (None, Some(1)), (None, Some(0))
    ).toDF("cat", "y")
    val o2 = Vectorize.woeEncode(withNulls, "cat", col("y") === 1)
      .select("cat", "n").as[(Option[String], Long)].collect().toMap
    assert(o2(Some("A")) == 1L, "null target excluded")
    assert(o2(None) == 2L, "null category is its own bucket")
    // IV terms are never negative (shared-sign argument)
    assert(Vectorize.woeEncode(rows, "cat", col("y") === 1)
      .filter(col("iv_term_grid") < 0).count() == 0)
  }

  test("hitsExact: hand-walked a/h rounds; sources get hub, sinks get auth") {
    // o1->{p1,p2}, o2->p1; h0=1. a1: p1=2, p2=1. h1: o1=3, o2=2.
    // a2: p1=h1(o1)+h1(o2)=5, p2=3. h2: o1=5+3=8, o2=5.
    val e = Seq((1L, 101L), (1L, 102L), (2L, 101L)).toDF("src", "dst")
    val out = Graph.hitsExact(e, iterations = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(
      1L -> (8L, 0L), 2L -> (5L, 0L),
      101L -> (0L, 5L), 102L -> (0L, 3L)))
    // duplicate edges collapse; partitioning-invariant
    val dup = e.union(e).repartition(5)
    val out2 = Graph.hitsExact(dup, iterations = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out2 == out)
    intercept[IllegalArgumentException](Graph.hitsExact(e, 0))
  }

  test("ece: zero for perfectly calibrated bins, exact gap otherwise") {
    // one bin (bins=1): 4 forecasts of 1/4 (pn = S/4), one positive ->
    // conf sum = S, scale*np = S -> ece_num 0
    val S = 1048576L
    val good = Seq((S / 4, 1), (S / 4, 0), (S / 4, 0), (S / 4, 0))
      .toDF("pn", "y")
    val g = Eval.ece(good, "y", col("pn"), S, bins = 1).collect()(0)
    assert(g.getAs[Long]("ece_num") == 0L && g.getAs[Double]("ece") == 0.0)
    // two positives: |2S - S| = S over 4S -> ece = 1/4 exactly
    val off = Seq((S / 4, 1), (S / 4, 1), (S / 4, 0), (S / 4, 0)).toDF("pn", "y")
    val o = Eval.ece(off, "y", col("pn"), S, bins = 1).collect()(0)
    assert(o.getAs[Long]("ece_num") == S && o.getAs[Double]("ece") == 0.25)
    // per-bin weights cancel: splitting the same rows across bins keeps
    // the identity ece = sum|...|/(N*scale) (here: two half-grid bins)
    val split = Seq((100L, 1), (100L, 0), (S - 100, 1), (S - 100, 0)).toDF("pn", "y")
    val sp = Eval.ece(split, "y", col("pn"), S, bins = 2).collect()(0)
    val expected = (math.abs(S - 200).toDouble + math.abs(S - 2 * (S - 100)).toDouble) / (4.0 * S)
    assert(sp.getAs[Long]("n_bins") == 2L && sp.getAs[Double]("ece") == expected)
    intercept[IllegalArgumentException](Eval.ece(good, "y", col("pn"), S, bins = 7))
  }

  test("krippendorffAlpha: textbook anchors — 0 at chance, 1 at perfect, null degenerate") {
    def run(rows: Seq[(Long, String)], maxR: Int = 8) =
      Labels.krippendorffAlpha(rows.toDF("u", "v"), "u", "v", maxR).collect()(0)
    // [A,A] + [A,B] + singleton [B]: D_o = D_e -> alpha exactly 0;
    // hand ledger (L=420): do_L=840, do_num=(4-1)*840=2520, de_num=420*6
    val chance = run(Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"), (3L, "B")))
    assert(chance.getAs[Long]("n") == 4L, "singleton unit must not pair")
    assert(chance.getAs[Long]("n_units") == 2L)
    assert(chance.getAs[Long]("do_num") == 2520L
      && chance.getAs[Long]("de_num") == 2520L)
    assert(chance.getAs[Double]("alpha") == 0.0)
    // perfect within-unit agreement -> alpha = 1 (D_o = 0)
    val perfect = run(Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B")))
    assert(perfect.getAs[Double]("alpha") == 1.0)
    // one global value -> D_e = 0 -> null, not NaN
    val degen = run(Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A")))
    assert(degen.isNullAt(degen.fieldIndex("alpha")))
    // a unit over maxRaters fails loudly in-plan
    intercept[Exception] {
      run((1 to 9).map(i => (1L, s"v$i")) :+ (2L -> "A") :+ (2L -> "B")).toString
    }
  }

  test("preferencePairs: symmetric extremes, odd middles unpaired, margin gate") {
    val df = Seq(
      ("g", 1L, 10L), ("g", 2L, 7L), ("g", 3L, 5L), ("g", 4L, 3L), // even
      ("h", 5L, 10L), ("h", 6L, 5L), ("h", 7L, 2L),                // odd
      ("z", 8L, 5L), ("z", 9L, 5L)                                 // zero margin
    ).toDF("g", "id", "sc")
    val out = Labels.preferencePairs(df, "g", "id", col("sc"), minMargin = 1L)
      .select("g", "chosen_id", "rejected_id", "margin")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("g", 1L, 4L, 7L), ("g", 2L, 3L, 2L),
      ("h", 5L, 7L, 8L)), out.toString)
    // the extremes matching maximizes total margin over all perfect
    // matchings (brute force on 6 scores)
    val scores = Seq(11L, 8L, 6L, 5L, 2L, 1L)
    def total(m: Seq[(Long, Long)]) = m.map { case (a, b) => (a - b).abs }.sum
    def matchings(xs: List[Long]): Seq[Seq[(Long, Long)]] = xs match {
      case Nil => Seq(Seq.empty)
      case h :: t => t.flatMap { p =>
        matchings(t.filterNot(_ == p)).map((h, p) +: _)
      }
    }
    val best = matchings(scores.toList).map(total).max
    val six = scores.zipWithIndex.map { case (sc, i) => ("s", i.toLong, sc) }
      .toDF("g", "id", "sc")
    val got = Labels.preferencePairs(six, "g", "id", col("sc"), 1L)
      .select("margin").as[Long].collect().sum
    assert(got == best, s"extremes matching must hit the max-total-margin $best")
    intercept[IllegalArgumentException](
      Labels.preferencePairs(df, "g", "id", col("sc"), 0L))
  }

  test("welchT: hand-solved two-group case; degenerate guards") {
    // a = [1,2,3] (mean 2, var 1), b = [4,6] (mean 5, var 2)
    // A_a = 1/3, A_b = 1; t_a = -3/sqrt(4/3); df = (4/3)^2/((1/9)/2 + 1)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 6L))
      .toDF("g", "x")
    val out = Checks.welchT(df, "g", col("x"))
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val aA = 1.0 / 3.0; val aB = 1.0
    val tA = ((6.0 * 2.0 - 10.0 * 3.0) / (3.0 * 2.0)) / math.sqrt(aA + aB)
    val dfA = ((aA + aB) * (aA + aB)) / (aA * aA / 2.0 + aB * aB / 1.0)
    assert(out("a")._3 == 2.0 && out("b")._3 == 5.0)
    assert(out("a")._4.contains(tA) && out("a")._5.contains(dfA))
    // two groups: the rest of b IS a, so t flips sign exactly
    assert(out("b")._4.contains(-tA))
    // degenerate: singleton group -> null t (n < 2); zero-variance both
    // sides -> null
    val single = Checks.welchT(
      Seq(("a", 1L), ("b", 4L), ("b", 6L), ("b", 8L)).toDF("g", "x"),
      "g", col("x"))
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r._4).toMap
    assert(single("a").isEmpty && single("b").isEmpty,
      "a singleton poisons both group-vs-rest rows (rest of b includes it)")
    val flat = Checks.welchT(
      Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "x"),
      "g", col("x"))
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect()
    assert(flat.forall(_._4.isEmpty), "zero variance everywhere -> null, not NaN")
  }

  test("kcenterSelect: hand-walked farthest-point traversal; short-input degrades") {
    // unit-quantized 2-d codes: a=(127,0) b=(0,127) c=(-127,0) d=(127,127)
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(-1.0f, 0.0f)), (4L, Seq(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kcenterSelect(df, "vec_id", "embedding", k = 4)
      .as[(Int, Long, Option[Long])].collect().sortBy(_._1).toSeq
    // start id1; then c (d2 254^2), then b (32258), then d (16129)
    assert(out == Seq(
      (1, 1L, None), (2, 3L, Some(64516L)),
      (3, 2L, Some(32258L)), (4, 4L, Some(16129L))), out.toString)
    // partitioning invariance
    val rep = Similarity.kcenterSelect(df.repartition(3), "vec_id", "embedding", 4)
      .as[(Int, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rep == out)
    // k beyond the corpus returns every vector once, order preserved
    val short = Similarity.kcenterSelect(df, "vec_id", "embedding", k = 10)
      .as[(Int, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(short.map(_._2).toSet == Set(1L, 2L, 3L, 4L) && short.length == 4)
    intercept[IllegalArgumentException](
      Similarity.kcenterSelect(df, "vec_id", "embedding", 0))
  }

  test("noisedCounts: reproducible, eps-scaled, both noise signs, exact grid") {
    val df = (1L to 2000L).map(i => (s"g${i % 200}", i)).toDF("g", "id")
    def run(epsN: Long, epsD: Long, salt: String) =
      Privacy.noisedCounts(df, Seq("g"), epsN, epsD, salt)
        .select("g", "n", "released_grid")
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(1L, 1L, "s")
    assert(a == run(1L, 1L, "s"), "same salt -> identical release")
    assert(a != run(1L, 1L, "t"), "different salt -> different noise")
    // noise magnitude halves EXACTLY at eps = 2 (integer DIV of the grid)
    val half = run(2L, 1L, "s").map(r => r._1 -> r._3).toMap
    val aMap = a.map(r => (r._1, (r._2, r._3))).toMap
    a.foreach { case (g, n, rg) =>
      val mag = (rg - n * 1048576L).abs
      val magHalf = (half(g) - n * 1048576L).abs
      assert(magHalf == mag / 2, s"eps=2 must halve the grid magnitude: $g")
    }
    // both signs occur and the mean |noise| is near the Laplace b = 1
    val mags = a.map { case (_, n, rg) => rg - n * 1048576L }
    assert(mags.exists(_ > 0) && mags.exists(_ < 0))
    val meanAbs = mags.map(_.abs.toDouble / 1048576.0).sum / mags.length
    assert(meanAbs > 0.6 && meanAbs < 1.5, s"mean |Laplace(1)| drifted: $meanAbs")
    intercept[IllegalArgumentException](Privacy.noisedCounts(df, Seq.empty, 1, 1, "s"))
    intercept[IllegalArgumentException](Privacy.noisedCounts(df, Seq("g"), 0, 1, "s"))
  }

  test("jsReport: 0 on identical samples, caps at ln 2 on disjoint ones") {
    val a = (1L to 400L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val same = Vectorize.jsReport(a, a, "v", k = 4)
      .agg(sum("js_term")).as[Double].collect()(0)
    assert(math.abs(same) < 1e-3, s"identical samples must score ~0: $same")
    // disjoint supports: every bucket one-sided -> each side ln2 exactly
    // (on the floored grid), total = ln 2 within grid resolution
    val lo = (1L to 200L).map(i => (i, 1.0)).toDF("id", "v")
    val hi = (1L to 200L).map(i => (i, 1000.0)).toDF("id", "v")
    val js = Vectorize.jsReport(lo, hi, "v", k = 4)
      .agg(sum("js_term")).as[Double].collect()(0)
    assert(math.abs(js - math.log(2.0)) < 1e-3, s"disjoint must reach ln2: $js")
    // PSI's one-sided buckets are null there; JS never is
    assert(Vectorize.jsReport(lo, hi, "v", 4).filter(col("js_term").isNull).count() == 0)
  }

  test("gopherRuleMask: each rule flips its own bit; empty tokens trip 0 and 2") {
    def mask(text: String, minWords: Int = 3) =
      Seq(Tuple1(text)).toDF("t")
        .select(TextOps.gopherRuleMask(
          coalesce(TextOps.tokens(col("t")), array().cast("array<string>")),
          minWords).as("m"))
        .as[Int].collect()(0)
    assert(mask("the quick brown fox jumps over that lazy sleeping dog") == 0,
      "clean prose passes")
    assert(mask("the was") == 1, "short doc -> bit 0 alone (len 3.0, 2 stopwords)")
    assert((mask("the is xx yy zz aa") & 2) == 2, "tiny mean word len -> bit 1")
    assert((mask("zebra quark vortex jumble nymph") & 4) == 4,
      "no stopwords -> bit 2")
    assert((mask("the the the the is is word word word word") & 8) == 8,
      "duplicate spam -> bit 3")
    assert(mask("") == (1 | 2 | 4), "empty: short, zero-len words, no stopwords — never an error")
  }

  test("events OHLC semantics: open/close follow the (ts, id) order") {
    val rows = Seq(
      (1L, 100L, "a", 5.0), (2L, 100L, "a", 9.0), // tie on ts: id orders
      (3L, 200L, "a", 1.0), (4L, 300L, "a", 7.0)
    ).toDF("event_id", "us", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), col("value"))
    val ord = org.apache.spark.sql.functions.struct(col("ts"), col("event_id"))
    val r = rows.groupBy("event_type")
      .agg(min_by(col("value"), ord).as("open"), max(col("value")).as("high"),
        min(col("value")).as("low"), max_by(col("value"), ord).as("close"))
      .as[(String, Double, Double, Double, Double)].collect()(0)
    assert(r == (("a", 5.0, 9.0, 1.0, 7.0)))
  }

  test("didReport: hand-solved four-cell design; empty cell nulls") {
    // control pre 10 -> post 12 (+2); treatment pre 20 -> post 25 (+5)
    val rows = Seq(
      (0, 0, 10L), (0, 0, 10L), (0, 1, 12L),
      (1, 0, 20L), (1, 1, 25L), (1, 1, 25L)
    ).toDF("variant", "period", "m")
    val r = Experiment.didReport(rows, "variant", "period", col("m")).collect()(0)
    assert(r.getAs[Double]("did") == 3.0)
    assert(r.getAs[Long]("n_c_pre") == 2L && r.getAs[Long]("s_t_post") == 50L)
    val missing = Experiment.didReport(
      rows.filter(!(col("variant") === 0 && col("period") === 1)),
      "variant", "period", col("m")).collect()(0)
    assert(missing.isNullAt(missing.fieldIndex("did")), "empty cell -> null")
  }

  test("powerSample: textbook sizing at a 10% baseline, 5pp MDE") {
    val units = (1L to 1000L).map(i => (i, if (i <= 100) 1 else 0)).toDF("id", "c")
    val r = Experiment.powerSample(units, "c", mdePpm = 50000L).collect()(0)
    assert(r.getAs[Double]("baseline_rate") == 0.1)
    val z = 1.959964 + 0.841621; val pb = 0.1 + 0.025; val d = 0.05
    val expect = math.ceil(2.0 * z * z * pb * (1.0 - pb) / (d * d)).toLong
    assert(r.getAs[Long]("n_required") == expect, s"got ${r.getAs[Long]("n_required")}")
    // larger effects need fewer samples (monotonicity)
    val big = Experiment.powerSample(units, "c", mdePpm = 100000L)
      .collect()(0).getAs[Long]("n_required")
    assert(big < expect)
    intercept[IllegalArgumentException](Experiment.powerSample(units, "c", 0L))
  }

  test("curriculumStages: equal-count stages, tie block shares a stage") {
    val df = (1L to 8L).map(i => (i, i * 10)).toDF("id", "diff")
    val out = Sampling.curriculumStages(df, "id", col("diff"), stages = 4)
      .orderBy("id").as[(Long, Long, Int)].collect()
    assert(out.map(_._3).toSeq == Seq(0, 0, 1, 1, 2, 2, 3, 3))
    // all-tied difficulties: the whole block shares its closing rank's
    // stage — a tie can never straddle stages
    val tied = (1L to 6L).map(i => (i, 7L)).toDF("id", "diff")
    val ts = Sampling.curriculumStages(tied, "id", col("diff"), stages = 3)
      .as[(Long, Long, Int)].collect()
    assert(ts.map(_._3).distinct.toSeq == Seq(2))
    intercept[IllegalArgumentException](
      Sampling.curriculumStages(df, "id", col("diff"), stages = 1))
  }

  test("katzExact: path-graph trajectory by hand; attenuation bounds") {
    val s = Graph.ScoreScale
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.katzExact(e, iterations = 3, attNumer = 1L, attDenom = 5L)
      .orderBy("node").as[(Long, Long)].collect()
    // x1 never receives; x2 = S + S//5 stabilizes after round 1;
    // x3 = S + (S + S//5)//5 after round 2
    assert(out.toSeq == Seq(
      (1L, s),
      (2L, s + s / 5),
      (3L, s + (s + s / 5) / 5)))
    intercept[IllegalArgumentException](
      Graph.katzExact(e, iterations = 1, attNumer = 5L, attDenom = 5L))
  }

  test("sprtWeights/sprtBounds: Wald textbook constants on the 2^20 grid") {
    // H0 p=0.1 vs H1 p=0.15: wc = ln(1.5), wn = ln(0.85/0.9)
    val (wc, wn) = Experiment.sprtWeights(1, 10, 3, 20)
    assert(wc == math.floor(math.log(1.5) * 1048576.0).toLong)
    assert(wn == math.floor(math.log(0.85 / 0.9) * 1048576.0).toLong)
    assert(wc > 0 && wn < 0, "conversion must push up, non-conversion down")
    // alpha=0.05, beta=0.2: upper = ln(0.8/0.05), lower = ln(0.2/0.95)
    val (up, lo) = Experiment.sprtBounds(1, 20, 1, 5)
    assert(up == math.floor(math.log(0.8 / 0.05) * 1048576.0).toLong)
    assert(lo == math.floor(math.log(0.2 / 0.95) * 1048576.0).toLong)
    assert(lo < 0 && 0 < up, "the continue region must contain the origin")
    intercept[IllegalArgumentException](Experiment.sprtWeights(3, 20, 1, 10))
    intercept[IllegalArgumentException](Experiment.sprtBounds(0, 20, 1, 5))
  }

  test("modularity: two triangles + bridge score the textbook 35/98 each") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "label")
    val out = Graph.modularity(e, labels)
      .select("community", "n_nodes", "e_intra", "deg_sum", "q_num")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // m = 7; per community: e_in 3, deg_sum 7 -> q_num = 84 - 49 = 35
    assert(out == Seq((1L, 3L, 3L, 7L, 35L), (4L, 3L, 3L, 7L, 35L)), out.toString)
    // global Q = 70 / 196
    val q = Graph.modularity(e, labels).agg(sum("q_term")).as[Double].collect()(0)
    assert(math.abs(q - 70.0 / 196.0) < 1e-12)
    // the all-one-community partition scores 0 exactly (e_in = m)
    val one = labels.select(col("node"), lit(9L).as("label"))
    val q1 = Graph.modularity(e, one).agg(sum("q_term")).as[Double].collect()(0)
    assert(q1 == 0.0)
  }
}
