package graft.queries

import graft.TestSpark
import graft.ops.{IncrementalAgg, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the r6 advisory findings: each test fails on the
  * pre-fix code, so the edge cases cannot silently reappear.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("importanceSample keeps ~all rows at p just below 1 (threshold clamp)") {
    // the double just below 1.0: p * 2^32 ROUNDS to exactly 2^32, whose
    // 9-digit hex a lpad-to-8 would truncate to "10000000" (~6% kept)
    val p = math.nextDown(1.0)
    val rows = (1L to 2000L).toDF("id")
    val kept = Sampling.importanceSample(rows, "id", lit(p)).count()
    assert(kept >= 1990, s"kept only $kept/2000 at p=1-2^-53 — threshold truncated")
    // and p = 0 / null still drop
    assert(Sampling.importanceSample(rows, "id", lit(0.0)).count() == 0)
    assert(
      Sampling.importanceSample(rows, "id", lit(null).cast("double")).count() == 0)
  }

  test("IncrementalAgg survives sums beyond 26 integer digits (wide accumulation)") {
    // each batch sums to ~5e27 per key — past decimal(28,2)'s 26 integer
    // digits after two epochs, which the old per-epoch re-narrowing nulled
    val big = 1e27
    val batch = Seq((1L, big), (1L, big * 2), (2L, big)).toDF("k", "v")
    val agg = IncrementalAgg(spark, Seq("k"), "v", scale = 2)
    agg.update(batch)
    agg.update(batch)
    val got = agg.current().as[(Long, Double, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    agg.close()
    assert(got(1L)._1 == 6e27, s"key 1 sum ${got(1L)._1} — overflowed to null/garbage")
    assert(got(2L)._1 == 2e27)
    assert(got(1L)._2 == 4L && got(2L)._2 == 2L)
  }

  test("epochRepeat and textKnn degrade to empty, not error, on degenerate input") {
    import graft.ops.Vectorize
    // empty corpus: rates dim is empty, the join drops everything
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "g", "tok")
    assert(Sampling.epochRepeat(empty, "id", "g", col("tok"), Map("a" -> 1L), 100L).count() == 0)
    // all-null groups: no share to draw against
    val nulls = Seq((1L, null.asInstanceOf[String], 5L)).toDF("id", "g", "tok")
    assert(Sampling.epochRepeat(nulls, "id", "g", col("tok"), Map("a" -> 1L), 100L).count() == 0)
    // query ids absent from the corpus: no pairs, empty top-k
    val corpus = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    assert(Vectorize.textKnn(corpus, "doc_id", "text", 16, Seq(99L), 3).count() == 0)
    // disjoint vocabularies: zero-overlap pairs never reach the join
    val disjoint = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    assert(Vectorize.textKnn(disjoint, "doc_id", "text", 4096, Seq(1L), 3).count() == 0)
  }

  test("cohort cells: gap weeks absent, multi-visit weeks count once") {
    import java.sql.Timestamp
    // user 1: weeks 0 and 2 (gap at 1; two visits in week 0 count once)
    // user 2: joins in week 2, active only then
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-03 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-15 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-16 10:00:00")))
      .toDF("user_id", "ts")
    val ev2 = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("__wk")).distinct()
    val first = ev2.groupBy("user_id").agg(min(col("__wk")).as("__cohort"))
    val cells = ev2.join(first, Seq("user_id"))
      .select(
        date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_week"),
        expr("CAST(datediff(__wk, __cohort) DIV 7 AS INT)").as("week_offset"))
      .groupBy("cohort_week", "week_offset").agg(count(lit(1)).as("n"))
      .as[(String, Int, Long)].collect().toSet
    assert(cells == Set(
      ("2024-01-01", 0, 1L), // user 1 week 0, deduped
      ("2024-01-01", 2, 1L), // user 1 returns; NO (.., 1, ..) cell
      ("2024-01-15", 0, 1L))) // user 2's own cohort
  }

  test("debounce: pairwise gap, equal-ts tiebreak, per-key independence") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 click burst: 0s, +10s, +70s(from #2: +60s → kept), +75s(dropped)
      (1L, 1L, "click", ts("2024-01-01 00:00:00")),
      (2L, 1L, "click", ts("2024-01-01 00:00:10")), // < 60s after #1: dropped
      (3L, 1L, "click", ts("2024-01-01 00:01:10")), // 60s after #2 exactly: kept
      (4L, 1L, "click", ts("2024-01-01 00:01:15")), // 5s after #3: dropped
      // same ts twice: id order decides; the second is zero-gap → dropped
      (5L, 1L, "view", ts("2024-01-01 00:00:00")),
      (6L, 1L, "view", ts("2024-01-01 00:00:00")),
      // other user unaffected by user 1's burst
      (7L, 2L, "click", ts("2024-01-01 00:00:05")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val kept = graft.ops.Funnel
      .debounce(ev, Seq("user_id", "event_type"), "ts", "event_id", 60000000L)
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L, 7L), s"got $kept")
  }

  test("repetition signals tolerate null and empty text") {
    val df = Seq(
      (1L, "a a a b"),
      (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val got = PipelineQueries.repetitionSignals(df)
      .as[(Long, Long, Double, Double)].collect().map(t => t._1 -> t).toMap
    assert(got(1L) == ((1L, 4L, 0.5, 2.0 / 3.0)))
    // null and empty text: zero tokens, zero fractions — never null, never NPE
    assert(got(2L) == ((2L, 0L, 0.0, 0.0)))
    assert(got(3L) == ((3L, 0L, 0.0, 0.0)))
  }

  test("second-wave ops degrade to empty/zero on degenerate input, not error") {
    import graft.ops._
    val noRows = Seq.empty[(Long, String, java.sql.Timestamp, Double)]
      .toDF("id", "k", "t", "v")
    // SCD2, outliers, majority, transitions: empty in → empty out
    assert(Snapshot.scd2(noRows, "k", "id", "t", "id").count() == 0)
    assert(Outliers.robustSummary(noRows, "k", "v").count() == 0)
    assert(Labels.majority(noRows, "id", "k").count() == 0)
    // balancing with an all-null class column: empty, not an NPE
    val allNull = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "cls")
    assert(Sampling.balanceClasses(allNull, "cls", "id").count() == 0)
    // A/B over an empty unit table: zero counts, null chi2 — one row
    val ab = Experiment.abReport(
      Seq.empty[(Long, Long, Long)].toDF("id", "variant", "converted"),
      "variant", "converted")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(ab == ((0L, 0L, 0L, 0L, None)))
    // PageRank on an empty edge list: empty score set
    assert(Graph.pageRankExact(
      Seq.empty[(Long, Long)].toDF("src", "dst"), 2).count() == 0)
  }

  test("statistical query invariants at sf0.001: gini/dispersion/KS/CUPED in range") {
    val dir = "/root/testdata/sf0.001"
    val gini = RelationalQueries.ordersGini(spark, dir)
      .as[(Long, Option[Double])].collect().head
    assert(gini._1 > 0 && gini._2.exists(g => g >= 0.0 && g < 1.0),
      s"gini out of [0,1): $gini")
    val disp = RelationalQueries.eventsDispersion(spark, dir)
      .as[(String, Long, Double, Option[Double])].collect()
    assert(disp.nonEmpty && disp.forall(d => d._3 > 0.0 && d._4.exists(_ >= 0.0)))
    val ks = RelationalQueries.driftKs(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(ks._3 >= 0.0 && ks._3 <= 1.0, s"KS distance out of [0,1]: $ks")
    val cuped = RelationalQueries.abCuped(spark, dir)
      .as[(Long, Long, Double, Option[Double], Double)].collect()
    assert(cuped.length == 2 && cuped.forall(_._4.isDefined),
      "both variants report with a defined theta on real data")
  }

  test("readability/code-detect kernels: empty and null text degrade to nulls/zeros") {
    import graft.ops.TextOps
    val df = Seq(
      (1L, ""), // empty: zero counts, null flesch (0 words)
      (2L, null.asInstanceOf[String]), // null text propagates null, never throws
      (3L, "it was. it was.") // 4 words, 2 sentences, 4 syllable groups
    ).toDF("doc_id", "text")
    val r = df
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__ws"),
        TextOps.sentenceUnits(col("text")).as("__su"))
      .select(col("doc_id"), size(col("__ws")).cast("long").as("w"),
        size(col("__su")).cast("long").as("s"),
        aggregate(col("__ws"), lit(0L),
          (acc, x) => acc + regexp_count(x, lit("[aeiouy]+")).cast("long")).as("y"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(r(0) == ((1L, Some(0L), Some(0L), Some(0L))))
    assert(r(1) == ((2L, None, None, None)), "null text → null counts, no crash")
    assert(r(2) == ((3L, Some(4L), Some(2L), Some(4L))))
    // entropy: null text → null, not a crash (gate parity with DuckDB)
    val e = df.select(TextOps.charClassCounts(col("text")).as("cs"))
      .select(TextOps.classEntropyOfCounts(col("cs")))
      .as[Option[Double]].collect()
    assert(e.count(_.isEmpty) == 1)
  }

  test("fourth-wave ops degrade gracefully on degenerate input, not error") {
    import graft.ops.{Checks, Funnel, Graph, Ranking}
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.triangles(noEdges).count() == 0)
    assert(Graph.labelPropagate(noEdges, 2).count() == 0)
    assert(Graph.linkCandidates(noEdges, 64, 10).count() == 0)
    // spearman with no rows / single value: empty / null ρ
    val noRows = Seq.empty[(String, Double, Double)].toDF("g", "x", "y")
    assert(Checks.spearmanExact(noRows, "g", "x", "y").count() == 0)
    assert(Checks.ols2Exact(noRows, "g", "x", "y", "y").count() == 0)
    // chi2/postings over an all-null-text corpus: empty, not an NPE
    val nullDocs = Seq((1L, "A", Option.empty[String])).toDF("id", "cls", "text")
    assert(Ranking.chi2Terms(nullDocs, "cls", "text", 1, 5).count() == 0)
    assert(Ranking.postings(nullDocs, "id", "text", 1, 3).count() == 0)
    // attribution with NO conversions anywhere: base 0, effects 0,
    // attribution null — never a crash or a negative
    val ev = Seq((1L, "A", java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L))
      .toDF("u", "t", "tt", "id")
    val ma = Funnel.markovAttribution(ev, "u", "t", "tt", "id", "buy", Seq("A"), 4)
      .as[(String, Long, Long, Long, Option[Long])].collect().head
    assert(ma == (("A", 0L, 0L, 0L, None)))
  }
}
