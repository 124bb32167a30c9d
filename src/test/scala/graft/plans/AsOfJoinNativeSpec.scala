package graft.plans

import graft.TestSpark
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator (LogicalPlan + Strategy + streaming-merge
  * SparkPlan) must be semantically identical to the union+window
  * formulation, which is itself oracle-checked against DuckDB ASOF JOIN.
  */
class AsOfJoinNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def eventSides() = {
    val ev = graft.tables.Tables.events(spark, dir).toDF()
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    (errors, clicks)
  }

  test("native == window formulation on the events fixture (self-join shape)") {
    val (errors, clicks) = eventSides()
    val viaWindow = AsOfJoin
      .backward(errors, clicks, "user_id", "user_id", "ts", "ts", rightPrefix = "c_")
      .select("event_id", "c_event_id")
      .as[(Long, Long)].collect().sorted.toSeq
    val viaNative = AsOfJoinNative
      .backward(errors, clicks, "user_id", "user_id", "ts", "ts", rightPrefix = "c_")
      .select("event_id", "c_event_id")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaNative.nonEmpty)
    assert(viaNative == viaWindow)
  }

  test("physical plan is the custom exec (no window, no right-side buffer)") {
    val (errors, clicks) = eventSides()
    val df = AsOfJoinNative.backward(errors, clicks, "user_id", "user_id", "ts", "ts")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical) // nodeName strips "Exec"
    assert(!physical.contains("Window"), "native path must not plan a window")
    assert(physical.contains("PushedFilters: [IsNotNull(event_type)"),
      "filters must still reach the parquet scan under the custom node")
  }

  test("left-outer variant keeps unmatched left rows with null right") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 5L), (3L, 99L, 50L))
      .toDF("id", "k", "t")
    val right = Seq((7L, 10L, 50L), (8L, 10L, 90L))
      .toDF("rid", "k", "t")
    val out = AsOfJoinNative
      .backward(left, right, "k", "k", "t", "t", inner = false)
      .select(col("id"), col("r_rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(8L), 2L -> None, 3L -> None))
    val inner = AsOfJoinNative
      .backward(left, right, "k", "k", "t", "t")
      .select(col("id"), col("r_rid")).as[(Long, Long)].collect().toSeq
    assert(inner == Seq((1L, 8L)))
  }

  test("equal timestamps match (>=), latest-of-equals wins deterministically") {
    val left = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val right = Seq((7L, 1L, 100L), (6L, 1L, 100L), (5L, 1L, 40L)).toDF("rid", "k", "t")
    val got = AsOfJoinNative.backward(left, right, "k", "k", "t", "t")
      .select("r_rid").as[Long].collect().toSeq
    // ties on (key, time): the required child ordering appends the remaining
    // right columns, so the kept (last) row is their maximum — rid 7, the
    // same row the window formulation's full-struct tiebreak picks
    assert(got == Seq(7L))
    val viaWindow = AsOfJoin.backward(left, right, "k", "k", "t", "t")
      .select("r_rid").as[Long].collect().toSeq
    assert(viaWindow == got, "native and window tiebreaks must agree")
  }

  test("null right time never matches; null left time matches nothing (both formulations)") {
    val left = Seq((1L, 1L, Some(100L)), (2L, 1L, None)).toDF("id", "k", "t")
    // rid=9 has the latest (null) time under nulls-first ordering — it must
    // be skipped, not treated as the earliest match of the key
    val right = Seq((7L, 1L, Some(50L)), (9L, 1L, None)).toDF("rid", "k", "t")
    for (
      f <- Seq(
        AsOfJoinNative.backward(_: org.apache.spark.sql.DataFrame, _: org.apache.spark.sql.DataFrame,
          "k", "k", "t", "t", "r_", false),
        AsOfJoin.backward(_: org.apache.spark.sql.DataFrame, _: org.apache.spark.sql.DataFrame,
          "k", "k", "t", "t", "r_", false))
    ) {
      val out = f(left, right)
        .select(col("id"), col("r_rid")).as[(Long, Option[Long])].collect().toMap
      assert(out == Map(1L -> Some(7L), 2L -> None))
    }
  }

  test("forward as-of: earliest at-or-after, brute-force equal, null discipline") {
    val left = Seq((1L, 1L, Some(100L)), (2L, 1L, Some(250L)), (3L, 1L, None),
      (4L, 2L, Some(10L))).toDF("id", "k", "t")
    val right = Seq((7L, 1L, Some(100L)), (8L, 1L, Some(150L)), (9L, 1L, Some(40L)),
      (10L, 1L, None)).toDF("rid", "k", "t")
    val out = AsOfJoin.forward(left, right, "k", "k", "t", "t", inner = false)
      .select(col("id"), col("r_rid")).as[(Long, Option[Long])].collect().toMap
    // id 1: equal timestamp matches (>=) → rid 7; id 2: nothing after 250;
    // id 3: null left time matches nothing; id 4: no right rows for key 2;
    // rid 10's null time is never a match
    assert(out == Map(1L -> Some(7L), 2L -> None, 3L -> None, 4L -> None))
    // inner drops the misses
    assert(AsOfJoin.forward(left, right, "k", "k", "t", "t")
      .select(col("id"), col("r_rid")).as[(Long, Long)].collect().toSeq == Seq((1L, 7L)))
    // brute-force equality on the events fixture
    val (errors, clicks) = eventSides()
    val got = AsOfJoin
      .forward(errors, clicks, "user_id", "user_id", "ts", "ts", rightPrefix = "c_")
      .select("event_id", "c_event_id").as[(Long, Long)].collect().sorted.toSeq
    // tie rule: min right ts, then MAX event_id (max right struct) — so
    // min(struct(ts, negated id)) replays it exactly
    val e = errors.as("e")
    val brute = e
      .join(clicks.as("c"),
        col("e.user_id") === col("c.user_id") && col("c.ts") >= col("e.ts"))
      .groupBy(col("e.event_id"))
      .agg(min(struct(col("c.ts"), (-col("c.event_id")).as("nid"))).as("m"))
      .select(col("event_id"), (-col("m.nid")).as("click_id"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got.nonEmpty && got == brute)
  }

  test("tolerance as-of: stale winner becomes no-match, fresh one survives") {
    val left = Seq((1L, 1L, 200L), (2L, 1L, 500L), (3L, 2L, 100L)).toDF("id", "k", "t")
    val right = Seq((7L, 1L, 190L), (8L, 1L, 350L), (9L, 2L, 10L)).toDF("rid", "k", "t")
    // bound 100: id 1 matches rid 7 (gap 10); id 2's nearest is rid 8
    // (gap 150 > 100) → no match even though rid 7 is also ≤ 500 (staler
    // still); id 3's nearest rid 9 is 90 stale → keeps
    val out = AsOfJoin
      .backwardTolerance(left, right, "k", "k", "t", "t", lit(100L), inner = false)
      .select(col("id"), col("r_rid")).as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(7L), 2L -> None, 3L -> Some(9L)))
    // inner drops the stale-only row; unbounded tolerance ≡ plain backward
    assert(AsOfJoin.backwardTolerance(left, right, "k", "k", "t", "t", lit(100L))
      .count() == 2L)
    val plain = AsOfJoin.backward(left, right, "k", "k", "t", "t")
      .select("id", "r_rid").as[(Long, Long)].collect().sorted.toSeq
    val loose = AsOfJoin.backwardTolerance(left, right, "k", "k", "t", "t", lit(Long.MaxValue / 2))
      .select("id", "r_rid").as[(Long, Long)].collect().sorted.toSeq
    assert(plain == loose)
    // forward mirror: id 1 (t=200) → next right is rid 8 (t=350), gap 150:
    // kept at wait 200, dropped at wait 100
    val fw = AsOfJoin.forwardTolerance(left, right, "k", "k", "t", "t", lit(200L), inner = false)
      .select(col("id"), col("r_rid")).as[(Long, Option[Long])].collect().toMap
    assert(fw(1L) == Some(8L) && fw(2L).isEmpty)
    val fwTight = AsOfJoin.forwardTolerance(left, right, "k", "k", "t", "t", lit(100L), inner = false)
      .select(col("id"), col("r_rid")).as[(Long, Option[Long])].collect().toMap
    assert(fwTight(1L).isEmpty)
  }

  test("interpolated: line values, exact hits, edges null, floor matches //") {
    def tdf(rows: Seq[(String, Long, Long)], names: String*) =
      rows.toDF(names: _*).select(
        col(names(0)), timestamp_micros(col(names(1))).as(names(1)), col(names(2)))
    val obs = tdf(Seq(
      ("a", 0L, 100L), ("a", 100L, 200L), // rising segment
      ("b", 0L, 200L), ("b", 100L, 100L), // falling segment
      ("c", 0L, 0L), ("c", 3L, 1L),       // non-divisible floor
      ("d", 0L, -1L), ("d", 3L, 0L)       // negative numerator floor
    ), "k", "t", "v")
    val q = tdf(Seq(
      ("a", 25L, 1L), ("a", 0L, 2L), ("a", 100L, 3L),  // mid, both hits
      ("a", -10L, 4L), ("a", 200L, 5L),                 // edges
      ("b", 75L, 6L), ("c", 1L, 7L), ("d", 1L, 8L)
    ), "k", "t", "id")
    val out = AsOfJoin.interpolated(q, obs, "k", "k", "t", "t", col("v"))
      .select(col("id"), col("value_interp"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(125L), "linear midpoint")
    assert(out(2L) == Some(100L) && out(3L) == Some(200L), "exact hits")
    assert(out(4L).isEmpty && out(5L).isEmpty, "edges don't extrapolate")
    assert(out(6L) == Some(125L), "falling segment interpolates too")
    // num = 1, dT = 3: floor(1/3) = 0; num = -2, dT = 3: floor = -1
    // (DuckDB 1//3 = 0, -2//3 = -1 — the pmod DIV must agree)
    assert(out(7L) == Some(0L) && out(8L) == Some(-1L), "floor semantics")
    // duplicate-time observations: max value wins on both sides
    val dup = tdf(Seq(("e", 0L, 5L), ("e", 0L, 9L), ("e", 10L, 9L)), "k", "t", "v")
    val qe = tdf(Seq(("e", 0L, 1L), ("e", 5L, 2L)), "k", "t", "id")
    val oute = AsOfJoin.interpolated(qe, dup, "k", "k", "t", "t", col("v"))
      .select(col("id"), col("value_interp"))
      .as[(Long, Option[Long])].collect().toMap
    assert(oute(1L) == Some(9L) && oute(2L) == Some(9L))
  }

  test("strategy registers via SparkSessionExtensions too") {
    // builder-time path: a throwaway session with the extensions installed
    val s2 = spark.newSession()
    AsOfJoinNative.ensureStrategy(s2)
    val (errors, clicks) = eventSides()
    assert(AsOfJoinNative
      .backward(errors, clicks, "user_id", "user_id", "ts", "ts")
      .count() > 0)
  }

  test("property: interpolated value always lies between its endpoints") {
    val rnd = new scala.util.Random(99)
    val obs = (1L to 300L).map { i =>
      (s"k${i % 5}", math.abs(rnd.nextLong() % 100000L), rnd.nextInt(2001).toLong - 1000L)
    }
    val qs = (1L to 300L).map { i =>
      (s"k${i % 5}", math.abs(rnd.nextLong() % 100000L), i)
    }
    def tdf(rows: Seq[(String, Long, Long)], names: String*) =
      rows.toDF(names: _*).select(
        col(names(0)), timestamp_micros(col(names(1))).as(names(1)), col(names(2)))
    val out = AsOfJoin.interpolated(
      tdf(qs, "k", "t", "id"), tdf(obs, "k", "t", "v"), "k", "k", "t", "t", col("v"))
      .filter(col("value_interp").isNotNull)
      .select(col("prev_v"), col("next_v"), col("value_interp"))
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (p, n, v) =>
      assert(v >= math.min(p, n) && v <= math.max(p, n),
        s"interp $v escapes [$p, $n]")
    }
  }
}
