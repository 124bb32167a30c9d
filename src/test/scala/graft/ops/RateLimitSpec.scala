package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-bucket rate-limit replay: hand-walked bucket states, clamp at
  * capacity, equal-timestamp tiebreak, and partitioning invariance.
  */
class RateLimitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // capacity 2, one token per 100 µs → capS = 200, cost = 100
  private def run(rows: Seq[(String, Long, Long)]) =
    RateLimit.tokenBucket(
      rows.toDF("k", "us", "id").select(
        col("k"), timestamp_micros(col("us")).as("t"), col("id")),
      Seq("k"), "t", "id", capacity = 2, refillMicros = 100L)
      .select("k", "id", "admitted")
      .as[(String, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2))

  test("hand-walked bucket: burst drain, refill, clamp at capacity") {
    // t=0    avail=200 admit → 100
    // t=10   avail=110 admit → 10
    // t=20   avail=20  REJECT → 20 (rejects don't spend)
    // t=130  avail=130 admit → 30
    // t=1000 avail=min(200, 30+870)=200 (CLAMPED) admit → 100
    // t=1001 avail=101 admit → 1
    // t=1002 avail=2   REJECT
    val out = run(Seq(
      ("a", 0L, 1L), ("a", 10L, 2L), ("a", 20L, 3L), ("a", 130L, 4L),
      ("a", 1000L, 5L), ("a", 1001L, 6L), ("a", 1002L, 7L)))
    assert(out.map(_._3).toSeq ==
      Seq(true, true, false, true, true, true, false))
  }

  test("equal timestamps resolve by id: the earlier id gets the token") {
    // both at t=0: id 1 admits (200→100), id 2 admits (100→0),
    // id 3 at t=0 sees avail=0 → reject
    val out = run(Seq(("a", 0L, 1L), ("a", 0L, 2L), ("a", 0L, 3L)))
    assert(out.map(_._3).toSeq == Seq(true, true, false))
  }

  test("keys are independent; result is partitioning-invariant") {
    val rows = (1L to 200L).map { i =>
      (s"k${i % 7}", i * 37L % 1000L, i)
    }
    val a = run(rows)
    val b = RateLimit.tokenBucket(
      rows.toDF("k", "us", "id").repartition(13).select(
        col("k"), timestamp_micros(col("us")).as("t"), col("id")),
      Seq("k"), "t", "id", capacity = 2, refillMicros = 100L)
      .select("k", "id", "admitted")
      .as[(String, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq == b.toSeq)
    // every key's first event (in (ts, id) order) is always admitted
    val first = rows.groupBy(_._1).map { case (_, g) =>
      g.minBy(r => (r._2, r._3))
    }.map(r => (r._1, r._3)).toSet
    assert(a.filter(r => first((r._1, r._2))).forall(_._3))
  }

  test("rejections don't spend tokens: tightening is NOT subset-monotone") {
    // the plausible-but-wrong invariant (a stricter bucket admits a subset
    // of a looser one) fails BECAUSE rejections leave the token unspent:
    // the strict bucket rejects event 2, saving the refill that then
    // admits event 3 — which the loose bucket, having spent on 2, rejects.
    def policy(refill: Long) = RateLimit.tokenBucket(
      Seq(("a", 0L, 1L), ("a", 100L, 2L), ("a", 150L, 3L))
        .toDF("k", "us", "id").select(
          col("k"), timestamp_micros(col("us")).as("t"), col("id")),
      Seq("k"), "t", "id", capacity = 1, refillMicros = refill)
      .select("id", "admitted").as[(Long, Boolean)]
      .collect().sortBy(_._1).map(_._2).toSeq
    assert(policy(100L) == Seq(true, true, false), "loose spends on 2")
    assert(policy(150L) == Seq(true, false, true), "strict saves for 3")
  }

  test("guards: empty keys, bad capacity, bad refill") {
    val df = Seq(("a", 0L, 1L)).toDF("k", "us", "id")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("id"))
    intercept[IllegalArgumentException](
      RateLimit.tokenBucket(df, Seq.empty, "t", "id", 2, 100L))
    intercept[IllegalArgumentException](
      RateLimit.tokenBucket(df, Seq("k"), "t", "id", 0, 100L))
    intercept[IllegalArgumentException](
      RateLimit.tokenBucket(df, Seq("k"), "t", "id", 2, 0L))
  }

  test("property: admitted count never exceeds burst + minted tokens, any stream") {
    val rnd = new scala.util.Random(77)
    val rows = (1L to 400L).map { i =>
      (s"k${rnd.nextInt(5)}", math.abs(rnd.nextLong() % 100000L), i)
    }
    val out = RateLimit.tokenBucket(
      rows.toDF("k", "us", "id").select(
        col("k"), timestamp_micros(col("us")).as("t"), col("id")),
      Seq("k"), "t", "id", capacity = 3, refillMicros = 500L)
      .groupBy("k")
      .agg(sum(when(col("admitted"), 1L).otherwise(0L)).as("adm"))
      .as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val span = g.map(_._2).max - g.map(_._2).min
      val bound = 3L + span / 500L + 1L
      assert(out(k) <= bound, s"$k admitted ${out(k)} > bound $bound")
    }
    // and a full-refill gap is always admitted (the demo invariant, pinned)
    val verdicts = RateLimit.tokenBucket(
      rows.toDF("k", "us", "id").select(
        col("k"), timestamp_micros(col("us")).as("t"), col("id")),
      Seq("k"), "t", "id", capacity = 3, refillMicros = 500L)
      .select("k", "id", "admitted").as[(String, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val sorted = g.sortBy(r => (r._2, r._3))
      sorted.sliding(2).foreach {
        case Seq(a, b) if b._2 - a._2 >= 3 * 500L =>
          assert(verdicts((k, b._3)), s"full-refill gap must admit ${b._3}")
        case _ =>
      }
    }
  }
}
