package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** [[CoddSession.stabilizeAll]] — the batched epoch (one Spark action per
  * view-DAG round) must be CONTENT-EQUIVALENT to the sequential
  * per-view stabilization it accelerates: same view contents, same set
  * semantics, same multi-epoch/multi-level cascade behavior, and the two
  * paths must interleave freely on one session (a user may mix
  * `stabilizeAll` epochs with ordinary `evaluate`s).
  */
class StabilizeAllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Expr._

  private def fresh = new CoddSession(spark)

  test("flat fan-out: N views over one relation, one batched epoch each") {
    val db = fresh
    val r = db.addRelation[(Int, Int)]("r")
    val vs = (0 until 5).map { i =>
      db.storeView(r.select(_._2 > i * 10).project(t => (t._1, t._2 + i)))
    }
    db.insert(r, (1 to 50).map(i => (i, i)))
    db.stabilizeAll()
    val afterFirst = vs.zipWithIndex.map { case (v, i) =>
      val got = db.evaluate(v).collect().toSet
      val want = (1 to 50).filter(_ > i * 10).map(x => (x, x + i)).toSet
      assert(got == want, s"view $i after epoch 1")
      got.size
    }
    // second epoch: a delta plus duplicates — set semantics must hold
    db.insert(r, (40 to 60).map(i => (i, i)))
    db.stabilizeAll()
    vs.zipWithIndex.foreach { case (v, i) =>
      val got = db.evaluate(v).collect().toSet
      val want = (1 to 60).filter(_ > i * 10).map(x => (x, x + i)).toSet
      assert(got == want, s"view $i after epoch 2")
      assert(got.size >= afterFirst(i))
    }
    db.close()
  }

  test("chain: view over view over view cascades level by level") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    val v1 = db.storeView(r.select(_ % 2 == 0))
    val v2 = db.storeView(v1.project(_ / 2))
    val v3 = db.storeView(v2.select(_ > 5))
    db.insert(r, 1 to 40)
    db.stabilizeAll()
    assert(db.evaluateSorted(v3) == (6 to 20))
    db.insert(r, 41 to 60)
    db.stabilizeAll()
    assert(db.evaluateSorted(v3) == (6 to 30))
    db.close()
  }

  test("batched epochs match a sequential twin session exactly (join view)") {
    val seqDb = fresh
    seqDb.sequentialStabilization = true // genuine per-instance loops
    val batDb = fresh
    def build(db: CoddSession) = {
      val o = db.addRelation[(Int, Int)]("orders")
      val c = db.addRelation[(Int, String)]("cust")
      val v = db.storeView(
        o.select(_._2 > 100).withKey(_._1)
          .join(c.withKey(_._1)).on((k, ord, cu) => (k, cu._2, ord._2)))
      (o, c, v)
    }
    val (so, sc, sv) = build(seqDb)
    val (bo, bc, bv) = build(batDb)
    val custRows = (1 to 20).map(i => (i, s"c$i"))
    val epochs = Seq(
      (1 to 30).map(i => (i % 20 + 1, i * 10)),
      (1 to 10).map(i => (i, 50 + i * 20)),
      Seq((1, 110), (1, 110), (2, 999))) // dup rows + dup epoch content
    seqDb.insert(sc, custRows); batDb.insert(bc, custRows)
    epochs.foreach { batch =>
      seqDb.insert(so, batch)
      seqDb.evaluate(sv).count() // sequential stabilization epoch
      batDb.insert(bo, batch)
      batDb.stabilizeAll() // batched epoch
      val s = seqDb.evaluate(sv).collect().toSet
      val b = batDb.evaluate(bv).collect().toSet
      assert(b == s, s"batched != sequential after batch of ${batch.size}")
    }
    seqDb.close(); batDb.close()
  }

  test("empty deltas and already-stable sessions are a quiet no-op") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    val v = db.storeView(r.select(_ > 5))
    db.stabilizeAll() // nothing inserted at all
    assert(db.evaluate(v).count() == 0)
    db.insert(r, 1 to 10)
    db.stabilizeAll()
    db.stabilizeAll() // idempotent second call
    assert(db.evaluateSorted(v) == (6 to 10))
    db.insert(r, Seq(3)) // delta that misses the view entirely
    db.stabilizeAll()
    assert(db.evaluateSorted(v) == (6 to 10))
    db.close()
  }

  /** Distinct SQL executions `body` runs, scoped by a unique job group
    * (a bare-RDD sentinel in the same group flushes the FIFO bus).
    */
  private def probeExecutions(body: => Unit): Int = {
    val group = s"stabilize_probe_${java.util.UUID.randomUUID()}"
    val execIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val sentinel = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id")) {
          Option(j.properties.getProperty("spark.sql.execution.id")) match {
            case Some(id) => execIds.add(id)
            case None     => sentinel.incrementAndGet()
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "stabilize probe window")
      body
      spark.sparkContext.range(0, 1).count() // FIFO sentinel, same group
      spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10e9.toLong
      while (sentinel.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      execIds.size
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("fused evaluate: one action per dependency wave; a fan-out epoch is ONE action (r14)") {
    // A chain pays one action per DAG level (the sequential count — a
    // dependent's plan must never race its dependee's still-lazy leaf in
    // one union action), but SIBLING views fuse: rel→(v1,v2) epochs run
    // the relation wave, then ONE action for both views, then the
    // consumer count.
    val db = fresh
    val r = db.addRelation[Int]("r")
    val v1 = db.storeView(r.select(_ % 2 == 0))
    val v2 = db.storeView(r.select(_ % 2 == 1))
    val both = v1.union(v2)
    db.insert(r, 1 to 40)
    val e1 = probeExecutions { db.evaluate(both).count() }
    assert(e1 == 3, s"epoch 1 must be rel wave + fused sibling wave + 1 count, saw $e1")
    assert(db.evaluateSorted(v1) == (2 to 40 by 2))
    db.insert(r, 30 to 60)
    val e2 = probeExecutions { db.evaluate(both).count() }
    // epoch 2: each of the 3 promotions still runs its prepare-time
    // checkpoint execution (the broadcast-dedup futures fire at RDD
    // construction — inherent to Dataset.localCheckpoint), but the THREE
    // per-instance count actions of the sequential path collapse into
    // TWO wave actions (rel, then both views fused), plus the cached
    // first batch's flatten and the consumer count: 3 + 2 + 1 + 1.
    assert(e2 == 7, s"epoch 2 must be 3 prepares + 2 wave actions + flatten + 1 count, saw $e2")
    assert(db.evaluateSorted(v2) == (1 to 60 by 2))
    // a duplicate-only epoch: zero-novel commits must unwind cleanly
    db.insert(r, 30 to 60)
    assert(db.evaluateSorted(v1) == (2 to 60 by 2))
    db.close()
  }

  test("fused evaluate matches a sequential twin across mixed epochs (join view)") {
    val seqDb = fresh
    seqDb.sequentialStabilization = true
    val batDb = fresh
    def build(db: CoddSession) = {
      val o = db.addRelation[(Int, Int)]("orders")
      val c = db.addRelation[(Int, String)]("cust")
      val v = db.storeView(
        o.select(_._2 > 100).withKey(_._1)
          .join(c.withKey(_._1)).on((k, ord, cu) => (k, cu._2, ord._2)))
      (o, c, v)
    }
    val (so, sc, sv) = build(seqDb)
    val (bo, bc, bv) = build(batDb)
    // BOTH relations receive batches in the SAME epoch — the fused round
    // promotes them together and the view's one staged delta must apply
    // the full 3-term rule (δL⋈Rˢ ∪ Lˢ⋈δR ∪ δL⋈δR)
    val epochs = Seq(
      ((1 to 15).map(i => (i, s"c$i")), (1 to 30).map(i => (i % 15 + 1, i * 10))),
      ((10 to 25).map(i => (i, s"c$i")), (1 to 10).map(i => (i + 10, 50 + i * 20))),
      (Seq((1, "c1")), Seq((1, 110), (1, 110), (2, 999))))
    epochs.foreach { case (cb, ob) =>
      seqDb.insert(sc, cb); seqDb.insert(so, ob)
      batDb.insert(bc, cb); batDb.insert(bo, ob)
      val s = seqDb.evaluate(sv).collect().toSet
      val b = batDb.evaluate(bv).collect().toSet
      assert(b == s, "fused evaluate diverged from the sequential twin")
    }
    seqDb.close(); batDb.close()
  }

  test("one batched round runs ONE action for a flat 8-view fan-out") {
    // count DISTINCT SQL executions (actions) in a scoped job group: the
    // sequential path runs one count() action per view (8 execution ids);
    // the batched round must run exactly ONE — the union-of-counts action
    // whose AQE stage sub-jobs all share that execution id
    val db = fresh
    val r = db.addRelation[(Int, Int)]("r")
    val vs = (0 until 8).map { i =>
      db.storeView(r.select(_._2 % 8 == i).project(t => (t._1, i)))
    }
    db.insert(r, (1 to 100).map(i => (i, i)))
    // stabilize the relation OUTSIDE the probe window (stages the 8 view
    // deltas): the relation's own epoch is identical in both paths
    db.evaluate(r).count()
    val group = s"stabilize_probe_${java.util.UUID.randomUUID()}"
    val execIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val sentinel = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id")) {
          // SQL actions carry an execution id; the bare-RDD sentinel does not
          Option(j.properties.getProperty("spark.sql.execution.id")) match {
            case Some(id) => execIds.add(id)
            case None     => sentinel.incrementAndGet()
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "stabilizeAll window")
      db.stabilizeAll()
      spark.sparkContext.range(0, 1).count() // FIFO sentinel, same group
      spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10e9.toLong
      while (sentinel.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(execIds.size == 1,
        s"a batched 8-view round must be ONE action, saw executions: $execIds")
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(db.evaluate(v).collect().toSet ==
          (1 to 100).filter(_ % 8 == i).map(x => (x, i)).toSet)
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      db.close()
    }
  }
}
