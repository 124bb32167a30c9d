package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's evaluator test corpus — same inputs, same sorted
  * expected outputs (reference: core/src/database/evaluate.rs:742-1604 and
  * core/examples/music.rs).
  */
class CoddCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Expr._

  private def fresh = new CoddSession(spark)

  test("relation: insert, dedup, sorted evaluate (evaluate.rs:773-788)") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    db.insert(r, Seq(3, 1, 2, 1, 3))
    db.insert(r, Seq(2, 4))
    assert(db.evaluateSorted(r) == Seq(1, 2, 3, 4))
  }

  test("select + project chain (music.rs:148-161 shape)") {
    val db = fresh
    val r = db.addRelation[(Int, String)]("r")
    db.insert(r, Seq((1, "a"), (2, "b"), (3, "c"), (2, "b")))
    val q = r.select(_._1 >= 2).project(_._2)
    assert(db.evaluateSorted(q) == Seq("b", "c"))
  }

  test("project can collapse tuples; result is a set") {
    val db = fresh
    val r = db.addRelation[(Int, Int)]("r")
    db.insert(r, Seq((1, 4), (2, 2), (1, 3)))
    assert(db.evaluateSorted(r.project(_._1)) == Seq(1, 2))
  }

  test("product with fused mapper (evaluate.rs product tests)") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    val s = db.addRelation[Int]("s")
    db.insert(r, Seq(1, 2))
    db.insert(s, Seq(10, 20))
    val q = r.product(s).on((a, b) => a + b)
    assert(db.evaluateSorted(q) == Seq(11, 12, 21, 22))
  }

  test("join on computed keys with fused mapper (evaluate.rs:961-1102)") {
    val db = fresh
    val r = db.addRelation[(Int, Int)]("r")
    val s = db.addRelation[(Int, Int)]("s")
    db.insert(r, Seq((1, 4), (2, 2), (1, 3)))
    db.insert(s, Seq((1, 5), (3, 2), (1, 6)))
    val q = r.withKey(_._1).join(s.withKey(_._1)).on((k, l, rr) => (k, l._2, rr._2))
    assert(db.evaluateSorted(q) == Seq((1, 3, 5), (1, 3, 6), (1, 4, 5), (1, 4, 6)))
  }

  test("join with Option keys: None == None matches (music.rs:163-167 semantics)") {
    val db = fresh
    val r = db.addRelation[(Option[String], Int)]("r")
    val s = db.addRelation[(Option[String], String)]("s")
    db.insert(r, Seq((Some("x"), 1), (None, 2)))
    db.insert(s, Seq((Some("x"), "a"), (None, "b")))
    val q = r.withKey(_._1).join(s.withKey(_._1)).on((_, l, rr) => (l._2, rr._2))
    assert(db.evaluateSorted(q) == Seq((1, "a"), (2, "b")))
  }

  test("union / intersect / difference") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    val s = db.addRelation[Int]("s")
    db.insert(r, Seq(1, 2, 3))
    db.insert(s, Seq(2, 3, 4))
    assert(db.evaluateSorted(r.union(s)) == Seq(1, 2, 3, 4))
    assert(db.evaluateSorted(r.intersect(s)) == Seq(2, 3))
    assert(db.evaluateSorted(r.difference(s)) == Seq(1))
    assert(db.evaluateSorted(s.difference(r)) == Seq(4))
  }

  test("difference over nested array tuples (evaluate.rs:1283-1293)") {
    val db = fresh
    val r = db.addRelation[Seq[Int]]("r")
    val s = db.addRelation[Seq[Int]]("s")
    db.insert(r, Seq(Seq(1, 2), Seq(3)))
    db.insert(s, Seq(Seq(3)))
    assert(db.evaluate(r.difference(s)).collect().toSeq == Seq(Seq(1, 2)))
  }

  test("empty, singleton, full") {
    val db = fresh
    assert(db.evaluateSorted(EmptyRel[Int]()) == Seq.empty)
    assert(db.evaluateSorted(Singleton(42)) == Seq(42))
    assertThrows[CoddError.UnsupportedExpression](db.evaluate(FullRel[Int]()))
    // singleton composes: δ empty but stable carries the tuple
    assert(db.evaluateSorted(Singleton((1, 2)).project(_._2)) == Seq(2))
  }

  test("duplicate relation / type mismatch errors (database.rs:443-461)") {
    val db = fresh
    db.addRelation[Int]("r")
    assertThrows[CoddError.InstanceExists](db.addRelation[Int]("r"))
    assertThrows[CoddError.InstanceNotFound](db.evaluate(Rel[String]("r")))
    assertThrows[CoddError.InstanceNotFound](db.evaluate(Rel[Int]("missing")))
  }

  test("view: incremental maintenance equals recomputation (evaluate.rs:1409-1436)") {
    val db = fresh
    val r = db.addRelation[(Int, Int)]("r")
    val s = db.addRelation[(Int, Int)]("s")
    db.insert(r, Seq((1, 4), (2, 2)))
    db.insert(s, Seq((1, 5)))
    val joinExpr =
      r.withKey(_._1).join(s.withKey(_._1)).on((k, l, rr) => (k, l._2 + rr._2))
    val v = db.storeView(joinExpr)
    assert(db.evaluateSorted(v) == Seq((1, 9)))
    // further inserts flow into the view incrementally
    db.insert(r, Seq((1, 3), (3, 7)))
    db.insert(s, Seq((3, 1), (1, 5))) // (1,5) is a duplicate
    assert(db.evaluateSorted(v) == Seq((1, 8), (1, 9), (3, 8)))
    assert(db.evaluateSorted(v) == db.evaluateSorted(joinExpr))
  }

  test("view over view cascade (evaluate.rs:1372-1383)") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    db.insert(r, Seq(1, 2, 3, 4))
    val v1 = db.storeView(r.select(_ % 2 == 0))
    val v2 = db.storeView(v1.project(_ * 10))
    assert(db.evaluateSorted(v2) == Seq(20, 40))
    db.insert(r, Seq(5, 6))
    assert(db.evaluateSorted(v2) == Seq(20, 40, 60))
    assert(db.evaluateSorted(v1) == Seq(2, 4, 6))
  }

  test("union/intersect feeding joins inside views (evaluate.rs:1469-1525)") {
    val db = fresh
    val r = db.addRelation[(Int, Int)]("r")
    val s = db.addRelation[(Int, Int)]("s")
    val t = db.addRelation[(Int, Int)]("t")
    db.insert(r, Seq((1, 40), (2, 41)))
    db.insert(s, Seq((2, 41), (3, 42)))
    db.insert(t, Seq((41, 100), (42, 200)))
    val u = r.union(s)
    val q = u.withKey(_._2).join(t.withKey(_._1)).on((k, _, tr) => (k, tr._2))
    val v = db.storeView(q)
    assert(db.evaluateSorted(v) == Seq((41, 100), (42, 200)))
    db.insert(r, Seq((9, 42)))
    db.insert(t, Seq((40, 300)))
    assert(db.evaluateSorted(v) == Seq((40, 300), (41, 100), (42, 200)))
    assert(db.evaluateSorted(v) == db.evaluateSorted(q))
  }

  test("difference rejected inside views (evaluate.rs:1526-1547)") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    val s = db.addRelation[Int]("s")
    assertThrows[CoddError.UnsupportedExpression](db.storeView(r.difference(s)))
    // ...even nested
    assertThrows[CoddError.UnsupportedExpression](
      db.storeView(r.union(s.difference(r)).project(_ + 1)))
  }

  test("late view creation sees previously stabilized data (evaluate.rs:1548-1559)") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    db.insert(r, Seq(1, 2, 3))
    assert(db.evaluateSorted(r) == Seq(1, 2, 3)) // stabilizes
    val v = db.storeView(r.select(_ > 1))
    assert(db.evaluateSorted(v) == Seq(2, 3))
    db.insert(r, Seq(4))
    assert(db.evaluateSorted(v) == Seq(2, 3, 4))
  }

  test("view created while inserts are staged but not stabilized") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    db.insert(r, Seq(1, 2)) // staged, never evaluated yet
    val v = db.storeView(r.project(_ * 2))
    db.insert(r, Seq(3))
    assert(db.evaluateSorted(v) == Seq(2, 4, 6))
  }

  test("repeated evaluation is idempotent; no deltas lost (evaluate.rs:1560-1602)") {
    val db = fresh
    val r = db.addRelation[Int]("r")
    val v = db.storeView(r.select(_ > 0))
    db.insert(r, Seq(1, 2))
    assert(db.evaluateSorted(v) == Seq(1, 2))
    assert(db.evaluateSorted(v) == Seq(1, 2))
    db.insert(r, Seq(3))
    db.insert(r, Seq(3, 4))
    assert(db.evaluateSorted(v) == Seq(1, 2, 3, 4))
    assert(db.evaluateSorted(r) == Seq(1, 2, 3, 4))
  }
}
