package graft.streaming

import graft.TestSpark
import graft.tables.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming operators pinned against their batch equivalents: the same
  * events produce the same aggregates whether they arrive as one batch or
  * as a stream of micro-batches.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly counts equal batch hourly counts") {
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.eventsDf(spark, dir).select("ts", "event_type", "value")
      .as[(java.sql.Timestamp, String, Double)].collect().toSeq
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val in = stream.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.hourlyCounts(in)
      .writeStream.outputMode("complete").format("memory").queryName("hourly").start()
    // feed in three micro-batches
    val (b1, rest) = batch.splitAt(batch.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    Seq(b1, b2, b3).foreach { b => stream.addData(b); q.processAllAvailable() }
    val got = spark.table("hourly")
      .select("hour", "event_type", "n")
      .as[(String, String, Long)].collect().toSet
    q.stop()
    val expected = Tables.eventsDf(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("stateful running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.runningTotals(stream.toDS())
      .writeStream.outputMode("update").format("memory").queryName("running").start()
    stream.addData(StreamingOps.UserEvent(1L, 10L, 2.0), StreamingOps.UserEvent(1L, 20L, 3.0))
    q.processAllAvailable()
    stream.addData(StreamingOps.UserEvent(1L, 30L, 5.0), StreamingOps.UserEvent(2L, 5L, 1.0))
    q.processAllAvailable()
    val rows = spark.table("running").as[StreamingOps.UserRunning].collect()
    q.stop()
    // last update per user wins
    val last = rows.groupBy(_.user_id).view.mapValues(_.last).toMap
    assert(last(1L).n_events == 3 && math.abs(last(1L).total_value - 10.0) < 1e-9)
    assert(last(2L).n_events == 1 && math.abs(last(2L).total_value - 1.0) < 1e-9)
  }

  test("streaming funnel equals the batch funnel on time-ordered delivery") {
    implicit val sqlCtx = spark.sqlContext
    // synthetic journeys incl. a stalled user and an out-of-order-within-
    // batch pair (the kernel sorts within each micro-batch)
    val evs = Seq(
      StreamingOps.TypedEvent(1L, "view", 10L),
      StreamingOps.TypedEvent(1L, "click", 30L),
      StreamingOps.TypedEvent(2L, "click", 5L), // click before any view
      StreamingOps.TypedEvent(2L, "view", 20L),
      StreamingOps.TypedEvent(1L, "purchase", 50L),
      StreamingOps.TypedEvent(2L, "click", 60L),
      StreamingOps.TypedEvent(3L, "view", 70L))
    val steps = Seq("view", "click", "purchase")
    val stream = MemoryStream[StreamingOps.TypedEvent]
    val q = StreamingOps.funnelStateful(stream.toDS(), steps)
      .writeStream.outputMode("append").format("memory").queryName("funnel").start()
    // time-ordered across batches; the second batch arrives ts-shuffled
    stream.addData(evs.take(4): _*)
    q.processAllAvailable()
    stream.addData(evs.drop(4).reverse: _*)
    q.processAllAvailable()
    val got = spark.table("funnel").as[StreamingOps.FunnelProgress].collect()
      .groupBy(_.stage_idx).view.mapValues(_.map(_.user_id).toSet).toMap
    q.stop()
    val batch = graft.ops.Funnel
      .stages(
        evs.map(e => (e.user_id, e.event_type, new java.sql.Timestamp(e.ts_ns)))
          .toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps)
      .as[(String, Int, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(got(0) == Set(1L, 2L, 3L) && got(1) == Set(1L, 2L) && got(2) == Set(1L))
    assert(batch == Map(0 -> 3L, 1 -> 2L, 2 -> 1L), s"batch funnel drifted: $batch")
    assert(got.view.mapValues(_.size.toLong).toMap == batch)
  }

  test("stateful debounce ≡ batch debounce on a time-ordered stream, state spans batches") {
    implicit val sqlCtx = spark.sqlContext
    val gap = 100L
    val evs = Seq(
      StreamingOps.IdEvent(1L, "click", 1000L, 1L),
      StreamingOps.IdEvent(1L, "click", 1050L, 2L), // burst: suppressed
      StreamingOps.IdEvent(1L, "click", 1150L, 3L), // ≥ gap from RAW prev
      StreamingOps.IdEvent(1L, "view", 1010L, 4L), // other type: own chain
      // equal timestamps: id order keeps 5, suppresses 6
      StreamingOps.IdEvent(2L, "click", 2000L, 6L),
      StreamingOps.IdEvent(2L, "click", 2000L, 5L),
      // second batch — the cross-batch gap check needs batch-1 state
      StreamingOps.IdEvent(1L, "click", 1200L, 7L), // 50 < gap from ev 3
      StreamingOps.IdEvent(1L, "click", 1400L, 8L),
      StreamingOps.IdEvent(3L, "view", 9000L, 9L))
    val stream = MemoryStream[StreamingOps.IdEvent]
    val q = StreamingOps.debounceStream(stream.toDS(), gap)
      .writeStream.outputMode("append").format("memory").queryName("debounce").start()
    stream.addData(evs.take(6): _*)
    q.processAllAvailable()
    stream.addData(evs.drop(6).reverse: _*) // ts-shuffled within the batch
    q.processAllAvailable()
    val got = spark.table("debounce").as[StreamingOps.IdEvent]
      .collect().map(_.event_id).toSet
    q.stop()
    val batchKept = {
      val df = evs.map(e => (e.user_id, e.event_type, e.ts_us, e.event_id))
        .toDF("user_id", "event_type", "ts_us", "event_id")
        .withColumn("ts", expr("timestamp_micros(ts_us)"))
      graft.ops.Funnel.debounce(df, Seq("user_id", "event_type"), "ts", "event_id", gap)
        .select("event_id").as[Long].collect().toSet
    }
    assert(got == batchKept, s"stream $got vs batch $batchKept")
    assert(got == Set(1L, 3L, 4L, 5L, 8L, 9L), "hand-checked survivor set")
  }

  test("streaming markov hops ≡ batch transition counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      StreamingOps.IdEvent(1L, "A", 1000L, 1L),
      StreamingOps.IdEvent(1L, "B", 2000L, 2L),
      StreamingOps.IdEvent(2L, "A", 1500L, 3L),
      // second batch: user 1 continues (the A→B state must span batches)
      StreamingOps.IdEvent(1L, "A", 3000L, 4L),
      StreamingOps.IdEvent(1L, "C", 4000L, 5L),
      StreamingOps.IdEvent(2L, "B", 2500L, 6L))
    val stream = MemoryStream[StreamingOps.IdEvent]
    val q = StreamingOps.markovStream(stream.toDS())
      .writeStream.outputMode("append").format("memory").queryName("markov").start()
    stream.addData(evs.take(3): _*)
    q.processAllAvailable()
    stream.addData(evs.drop(3).reverse: _*)
    q.processAllAvailable()
    val got = spark.table("markov").as[StreamingOps.TransitionHop].collect()
      .groupBy(h => (h.from_type, h.to_type)).view.mapValues(_.length.toLong).toMap
    q.stop()
    val batch = graft.ops.Funnel.markov(
      evs.map(e => (e.user_id, e.event_type, e.ts_us, e.event_id))
        .toDF("user_id", "event_type", "ts_us", "event_id")
        .withColumn("ts", expr("timestamp_micros(ts_us)")),
      "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got == Map(("A", "B") -> 2L, ("B", "A") -> 1L, ("A", "C") -> 1L))
  }

  test("streaming MERGE: versioned snapshot equals batch-by-batch applyChanges replay") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_stream").toString
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    base.write.parquet(s"$dir/v0")
    val stream = MemoryStream[(Long, String, String)]
    val q = StreamingOps.mergeStream(
      stream.toDF().toDF("k", "v", "op"), dir, Seq("k"), "op")
      .start()
    val b1 = Seq((1L, "a2", "update"), (3L, "c", "insert"))
    val b2 = Seq((2L, "", "delete"), (3L, "c2", "update"))
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val (snap, ver) = StreamingOps.latestSnapshot(spark, dir)
    assert(ver == 2, "two non-empty batches commit v1 and v2")
    val got = snap.as[(Long, String)].collect().toSet
    // batch replay of the same two change batches in order
    val replay = Seq(b1, b2).foldLeft(base) { (cur, ch) =>
      graft.ops.Snapshot.applyChanges(cur, ch.toDF("k", "v", "op"), Seq("k"), "op")
    }.as[(Long, String)].collect().toSet
    assert(got == replay && got == Set((1L, "a2"), (3L, "c2")))
    // a partial (uncommitted) write is invisible to recovery
    new java.io.File(s"$dir/v3").mkdirs()
    assert(StreamingOps.latestSnapshot(spark, dir)._2 == 2)
  }

  test("streaming SCD2: stream-maintained dimension equals the full-log rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_stream").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // initial dimension: the empty run frame (scd2 of an empty log)
    val empty = Seq.empty[(Long, String, java.sql.Timestamp, Long)].toDF("k", "attr", "t", "id")
    graft.ops.Snapshot.scd2(empty, "k", "attr", "t", "id")
      .write.parquet(s"$dir/v0")
    val stream = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val q = StreamingOps.scd2Stream(
      stream.toDF().toDF("k", "attr", "t", "id"), dir, "k", "attr", "t", "id").start()
    // three append-only batches: extends, closes, and a new key
    val b1 = Seq((1L, "A", at(1), 1L), (2L, "X", at(2), 2L))
    val b2 = Seq((1L, "A", at(3), 3L), (2L, "Y", at(4), 4L))
    val b3 = Seq((1L, "B", at(5), 5L), (3L, "N", at(6), 6L))
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    stream.addData(b3: _*); q.processAllAvailable()
    q.stop()
    val (snap, ver) = StreamingOps.latestSnapshot(spark, dir)
    assert(ver == 3, "three non-empty batches commit v1..v3")
    type Run = (Long, String, java.sql.Timestamp, Long, Option[java.sql.Timestamp], Boolean)
    val got = snap
      .select(col("k"), col("attr"), col("valid_from"), col("n_obs"),
        col("valid_to"), col("is_current"))
      .as[(Long, String, java.sql.Timestamp, Long, Option[java.sql.Timestamp], Boolean)]
      .collect().toSet
    val full = graft.ops.Snapshot
      .scd2((b1 ++ b2 ++ b3).toDF("k", "attr", "t", "id"), "k", "attr", "t", "id")
      .select(col("k"), col("attr"), col("valid_from"), col("n_obs"),
        col("valid_to"), col("is_current"))
      .as[(Long, String, java.sql.Timestamp, Long, Option[java.sql.Timestamp], Boolean)]
      .collect().toSet
    assert(got == full, "streamed dimension must equal the full-log rebuild")
    // the extend really merged: key 1's A run carries 2 observations
    assert(got.exists(r => r._1 == 1L && r._2 == "A" && r._4 == 2L && !r._6))
  }

  test("stateful sessionizer emits completed sessions with correct bounds") {
    implicit val sqlCtx = spark.sqlContext
    val gap = 1000L
    val stream = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.sessionizeStateful(stream.toDS(), gap)
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    // session 1: ts 0,500,900; gap; session 2: ts 3000 (still open at end)
    stream.addData(
      StreamingOps.UserEvent(7L, 0L, 0), StreamingOps.UserEvent(7L, 500L, 0))
    q.processAllAvailable()
    stream.addData(
      StreamingOps.UserEvent(7L, 900L, 0), StreamingOps.UserEvent(7L, 3000L, 0))
    q.processAllAvailable()
    val done = spark.table("sessions").as[(Long, Long, Long)].collect().toSeq
    q.stop()
    assert(done == Seq((7L, 0L, 3L))) // first session: started at 0, 3 events
  }

  test("stream-static enrichment equals batch join") {
    implicit val sqlCtx = spark.sqlContext
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_mktsegment")
    val batchEv = Tables.events(spark, dir).toDF()
      .select("event_id", "user_id").as[(Long, Long)].collect().toSeq
    val stream = MemoryStream[(Long, Long)]
    val in = stream.toDF().toDF("event_id", "user_id")
    val q = StreamingOps.enrich(in, dim, "user_id", "c_custkey")
      .select("event_id", "c_mktsegment")
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    batchEv.grouped(400).foreach { b => stream.addData(b); q.processAllAvailable() }
    val got = spark.table("enriched").as[(Long, String)].collect().toSet
    q.stop()
    val expected = StreamingOps.enrich(
        Tables.events(spark, dir).toDF(), dim, "user_id", "c_custkey")
      .select("event_id", "c_mktsegment").as[(Long, String)].collect().toSet
    assert(got == expected && got.size == batchEv.size)
  }

  test("stream-stream interval join equals the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // errors at 10s/70s for user 1; clicks at 5s/8s/65s (user 1), 6s (user 2)
    val errRows = Seq((100L, 1L, at(10)), (101L, 1L, at(70)), (102L, 2L, at(50)))
    val clickRows = Seq((200L, 1L, at(5)), (201L, 1L, at(8)), (202L, 1L, at(65)), (203L, 2L, at(6)))
    val errS = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clickS = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingOps.streamIntervalJoin(
      errS.toDF().toDF("event_id", "user_id", "ts"),
      clickS.toDF().toDF("event_id", "user_id", "ts"),
      "user_id", "user_id", "ts", "ts",
      lookback = "10 seconds", delay = "1 minute", rightPrefix = "c_")
    val q = joined.select("event_id", "c_event_id")
      .writeStream.outputMode("append").format("memory").queryName("sij").start()
    errS.addData(errRows.take(2)); clickS.addData(clickRows.take(2))
    q.processAllAvailable()
    errS.addData(errRows.drop(2)); clickS.addData(clickRows.drop(2))
    q.processAllAvailable()
    val got = spark.table("sij").as[(Long, Long)].collect().toSet
    q.stop()
    val expected = StreamingOps.streamIntervalJoin(
      errRows.toDF("event_id", "user_id", "ts"),
      clickRows.toDF("event_id", "user_id", "ts"),
      "user_id", "user_id", "ts", "ts",
      lookback = "10 seconds", delay = "1 minute", rightPrefix = "c_")
      .select("event_id", "c_event_id").as[(Long, Long)].collect().toSet
    // error@10s matches clicks@5s,8s (within 10s lookback); error@70s matches
    // click@65s; user-2 error@50s has no click in [40s, 50s]
    assert(expected == Set((100L, 200L), (100L, 201L), (101L, 202L)))
    assert(got == expected, s"stream result $got != batch $expected")
  }

  test("streaming dedup drops within-watermark duplicates, keeps state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val in = stream.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.dedupStream(in, "text", "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("deduped").start()
    stream.addData((1L, at(0), "aaa"), (2L, at(1), "bbb"))
    q.processAllAvailable()
    // same content arriving later within the watermark: dropped
    stream.addData((3L, at(2), "aaa"), (4L, at(3), "ccc"))
    q.processAllAvailable()
    val got = spark.table("deduped").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(got == Set(1L, 2L, 4L), s"doc 3 duplicates doc 1's content; got $got")
  }

  test("streaming decontamination drops ref-corpus content, equals the batch op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val ref = Seq("known eval question", "another benchmark item").toDF("text")
    val stream = MemoryStream[(Long, String)]
    val in = stream.toDF().toDF("doc_id", "text")
    val q = StreamingOps.decontaminateStream(in, "text", ref, "text")
      .writeStream.outputMode("append").format("memory").queryName("decont").start()
    val batch = Seq(
      (1L, "fresh training text"),
      (2L, "known eval question"), // contaminated
      (3L, "another benchmark item"), // contaminated
      (4L, "more fresh text"))
    stream.addData(batch: _*)
    q.processAllAvailable()
    val got = spark.table("decont").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(got == Set(1L, 4L), s"contaminated rows must drop; got $got")
    // the static-batch op on the same data agrees
    val batchGot = graft.ops.Dedup
      .exceptContentOf(batch.toDF("doc_id", "text"), "text", ref, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(batchGot == got, "stream and batch decontamination diverge")
  }

  test("streaming anomaly gate flags exactly the batch-op rows under static stats") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // "yesterday's" batch trains the robust baseline
    val history = ((1 to 40).map(i => (i.toLong, "m", i.toDouble % 7 + 10)) :+
      (99L, "m", 5000.0)).toDF("id", "metric", "v")
    val stats = graft.ops.Outliers.robustSummary(history, "metric", "v")
    // the live stream carries normal and wild points
    val live = Seq((100L, "m", 12.0), (101L, "m", 9000.0), (102L, "m", 11.5))
    val stream = MemoryStream[(Long, String, Double)]
    val in = stream.toDF().toDF("id", "metric", "v")
    val q = StreamingOps.anomalyGateStream(in, stats, "metric", "v")
      .writeStream.outputMode("append").format("memory").queryName("anom").start()
    stream.addData(live: _*)
    q.processAllAvailable()
    val got = spark.table("anom").select("id").as[Long].collect().toSet
    q.stop()
    assert(got == Set(101L), s"only the wild point flags; got $got")
    // batch flagged() over history+live restricted to live rows agrees
    val batchGot = graft.ops.Outliers
      .flagged(history.unionByName(live.toDF("id", "metric", "v")), "metric", "v", "id")
      .select("id").as[Long].collect().toSet
      .intersect(live.map(_._1).toSet)
    assert(batchGot == got, "stream gate and batch flag diverge")
  }

  test("streaming mixture gate equals the batch draw under snapshot rates") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // rates from a STATIC skewed snapshot: big source down-weighted
    val snapshot = ((1 to 200).map(i => (i.toLong, "big", 10L)) ++
      (1001 to 1020).map(i => (i.toLong, "small", 10L)))
      .toDF("doc_id", "source", "n_tok")
    val rates = graft.ops.Sampling
      .temperatureRates(snapshot, "source", "n_tok", alpha = 0.5, targetFraction = 0.5)
    val stream = MemoryStream[(Long, String)]
    val in = stream.toDF().toDF("doc_id", "source")
    val q = StreamingOps.mixtureStream(in, "doc_id", "source", rates)
      .writeStream.outputMode("append").format("memory").queryName("mixed").start()
    val arriving = (2000 to 2199).map(i => (i.toLong, if (i % 10 == 0) "small" else "big")) :+
      (3000L, "unknown_source") // no rate: must drop
    stream.addData(arriving: _*)
    q.processAllAvailable()
    val got = spark.table("mixed").select("doc_id").as[Long].collect().toSet
    q.stop()
    val batch = graft.ops.Sampling
      .applyMixtureRates(arriving.toDF("doc_id", "source"), "doc_id", "source", rates)
      .select("doc_id").as[Long].collect().toSet
    assert(got == batch, s"stream and batch draws diverge: ${got.diff(batch)} ${batch.diff(got)}")
    assert(!got.contains(3000L), "a group with no rate has no share to draw against")
    assert(got.nonEmpty && got.size < arriving.size, "gate must be a strict non-empty subset")
  }

  test("streaming epoch fan-out equals the batch repeat under snapshot rates") {
    implicit val sqlCtx = spark.sqlContext
    // rates from a STATIC snapshot: "small" repeats multiple epochs,
    // "big" keeps under 1× — both regimes cross the stream boundary
    val snapshot = ((1 to 200).map(i => (i.toLong, "big", 10L)) ++
      (1001 to 1020).map(i => (i.toLong, "small", 10L)))
      .toDF("doc_id", "source", "n_tok")
    val rates = graft.ops.Sampling.epochRates(
      snapshot, "source", org.apache.spark.sql.functions.col("n_tok"),
      Map("big" -> 1L, "small" -> 1L), budgetTokens = 800L)
    val stream = MemoryStream[(Long, String)]
    val in = stream.toDF().toDF("doc_id", "source")
    val q = StreamingOps.epochStream(in, "doc_id", "source", rates)
      .writeStream.outputMode("append").format("memory").queryName("epochs").start()
    val arriving = (2000 to 2099).map(i => (i.toLong, if (i % 10 == 0) "small" else "big")) :+
      (3000L, "unknown_source") // no rate: must drop
    stream.addData(arriving: _*)
    q.processAllAvailable()
    val got = spark.table("epochs").select("doc_id", "epoch")
      .as[(Long, Int)].collect().sorted.toSeq
    q.stop()
    val batch = graft.ops.Sampling
      .applyEpochRates(arriving.toDF("doc_id", "source"), "doc_id", "source", rates)
      .select("doc_id", "epoch").as[(Long, Int)].collect().sorted.toSeq
    assert(got == batch, "stream and batch epoch fan-outs diverge")
    assert(!got.exists(_._1 == 3000L), "a group with no rate has no budget share")
    // both regimes: small-source rows repeat (epoch 2 exists), big rows thin out
    assert(got.exists(_._2 >= 2), "upsampled source must fan out on the stream")
    val bigIds = arriving.filter(_._2 == "big").map(_._1).toSet
    assert(got.count(r => bigIds(r._1)) < bigIds.size, "down-weighted source must thin")
  }

  test("ivmSink: streamed inserts maintain a stored view incrementally") {
    implicit val sqlCtx = spark.sqlContext
    import graft.core.Expr._
    val db = new graft.core.CoddSession(spark)
    val rel = db.addRelation[StreamingOps.UserEvent]("stream_events")
    val view = db.storeView(rel.select(_.value > 5.0).project(e => (e.user_id, e.ts_ns)))
    val stream = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.ivmSink(stream.toDS(), db, rel).start()
    stream.addData(
      StreamingOps.UserEvent(1, 10, 9.0), StreamingOps.UserEvent(1, 20, 1.0))
    q.processAllAvailable()
    assert(db.evaluateSorted(view) == Seq((1L, 10L)))
    stream.addData(
      StreamingOps.UserEvent(2, 30, 7.0), StreamingOps.UserEvent(1, 10, 9.0)) // dup
    q.processAllAvailable()
    q.stop()
    assert(db.evaluateSorted(view) == Seq((1L, 10L), (2L, 30L)))
    assert(db.evaluateSorted(rel)(Ordering.by((e: StreamingOps.UserEvent) => (e.user_id, e.ts_ns))).size == 3)
  }

  test("stateless pipeline ops (redaction, hash split) apply to streams unchanged") {
    // the sampling/redaction family is pure Column expressions — no state,
    // no watermark, so the SAME code runs in a readStream pipeline; this
    // pins that no op accidentally grows a streaming-incompatible shape
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val in = stream.toDF().toDF("doc_id", "text")
    val out = in.select(
      col("doc_id"),
      graft.ops.TextOps.redactPii(col("text")).as("clean"),
      graft.ops.Sampling.splitColumn(
        col("doc_id"), Seq("train" -> 0.9, "test" -> 0.1)).as("split"))
    val q = out.writeStream.outputMode("append").format("memory").queryName("clean_docs").start()
    stream.addData((1L, "reach me: a@b.co"), (2L, "plain"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("clean_docs").as[(Long, String, String)].collect().toMap2
    val batch = Seq((1L, "reach me: a@b.co"), (2L, "plain")).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.ops.TextOps.redactPii(col("text")).as("clean"),
        graft.ops.Sampling.splitColumn(
          col("doc_id"), Seq("train" -> 0.9, "test" -> 0.1)).as("split"))
      .as[(Long, String, String)].collect().toMap2
    assert(got == batch && got(1L)._1 == "reach me: <EMAIL>")
  }

  test("streaming reach ≡ batch first-seen; re-sightings emit nothing across batches") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      StreamingOps.TypeUser("view", 1L, 100L),
      StreamingOps.TypeUser("view", 1L, 90L),  // same batch: min wins
      StreamingOps.TypeUser("view", 2L, 200L),
      StreamingOps.TypeUser("click", 1L, 150L),
      // second batch: user 1 re-sighted (no emission), user 3 new
      StreamingOps.TypeUser("view", 1L, 300L),
      StreamingOps.TypeUser("view", 3L, 400L))
    val stream = MemoryStream[StreamingOps.TypeUser]
    val q = StreamingOps.reachStream(stream.toDS())
      .writeStream.outputMode("append").format("memory").queryName("reach").start()
    stream.addData(evs.take(4): _*)
    q.processAllAvailable()
    stream.addData(evs.drop(4): _*)
    q.processAllAvailable()
    val got = spark.table("reach").as[StreamingOps.FirstSeen].collect()
      .map(f => (f.event_type, f.user_id) -> f.first_ns).toMap
    q.stop()
    assert(got == Map(
      ("view", 1L) -> 90L, ("view", 2L) -> 200L,
      ("click", 1L) -> 150L, ("view", 3L) -> 400L), got)
    // exactly the batch first-seen table on this time-ordered stream
    val batch = evs.map(e => (e.event_type, e.user_id, e.ts_ns))
      .toDF("t", "u", "ts").groupBy("t", "u").agg(min(col("ts")).as("f"))
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == batch)
  }

  private implicit class Tup3Ops(rows: Array[(Long, String, String)]) {
    def toMap2: Map[Long, (String, String)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("streaming token bucket ≡ batch replay; bucket state survives batch cuts") {
    implicit val sqlCtx = spark.sqlContext
    // capacity 2, refill 100 µs — drain, partial refill, clamp; the batch
    // cut lands mid-burst so the verdicts need batch-1 state
    val evs = Seq(
      StreamingOps.IdEvent(1L, "e", 0L, 1L),
      StreamingOps.IdEvent(1L, "e", 10L, 2L),
      StreamingOps.IdEvent(1L, "e", 20L, 3L),    // rejected: bucket drained
      StreamingOps.IdEvent(2L, "e", 0L, 4L),
      // --- batch cut ---
      StreamingOps.IdEvent(1L, "e", 130L, 5L),   // needs batch-1 tokens/last
      StreamingOps.IdEvent(1L, "e", 1000L, 6L),  // clamped refill
      StreamingOps.IdEvent(1L, "e", 1001L, 7L),
      StreamingOps.IdEvent(1L, "e", 1002L, 8L))  // rejected again
    val stream = MemoryStream[StreamingOps.IdEvent]
    val q = StreamingOps.tokenBucketStream(stream.toDS(), capacity = 2, refillMicros = 100L)
      .writeStream.outputMode("append").format("memory").queryName("bucket").start()
    stream.addData(evs.take(4): _*)
    q.processAllAvailable()
    stream.addData(evs.drop(4).reverse: _*) // ts-shuffled within the batch
    q.processAllAvailable()
    val got = spark.table("bucket").as[StreamingOps.BucketVerdict].collect()
      .map(v => v.event_id -> v.admitted).toMap
    q.stop()
    val batch = graft.ops.RateLimit.tokenBucket(
      evs.map(e => (e.user_id, e.ts_us, e.event_id)).toDF("u", "us", "id")
        .select(col("u"), timestamp_micros(col("us")).as("t"), col("id")),
      Seq("u"), "t", "id", capacity = 2, refillMicros = 100L)
      .select(col("id"), col("admitted")).as[(Long, Boolean)].collect().toMap
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got(3L) == false && got(5L) == true && got(8L) == false)
  }
}
