package graft.core

import graft.TestSpark
import graft.core.dsl._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's macro-DSL test corpus
  * (reference: core/src/macros.rs:112-382, `test_query` + `test_relexp`) —
  * every query shape the `query!`/`relexp!` macros accept, expressed through
  * the typed `graft.core.dsl` combinators.
  */
class CoddDslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def db = new CoddSession(spark)

  // --- query! statement forms (macros.rs:125-201) --------------------------

  test("create relation; evaluate empty is ok") {
    val d = db
    val r = d.createRelation[Int]("r")
    assert(d.evaluateSorted(r) == Seq.empty)
  }

  test("insert values; select * from (r)") {
    val d = db
    val r = d.createRelation[Int]("r")
    d.insertValues(r)(1, 2, 3, 4)
    assert(d.evaluateSorted(selectAll from r) == Seq(1, 2, 3, 4))
  }

  test("select * from (r) where [pred], expression built before the insert") {
    val d = db
    val r = d.createRelation[Int]("r")
    val exp = selectAll from r where (_ % 2 == 0)
    d.insertValues(r)(1, 2, 3, 4)
    assert(d.evaluateSorted(exp) == Seq(2, 4))
  }

  test("nested select * shapes compose") {
    val d = db
    val r = d.createRelation[Int]("r")
    val exp = selectAll from (selectAll from r where (_ > 2)) where (_ % 2 == 0)
    d.insertValues(r)(1, 2, 3, 4)
    assert(d.evaluateSorted(exp) == Seq(4))
  }

  test("select [proj] from (select * from (r) where [pred])") {
    val d = db
    val r = d.createRelation[Int]("r")
    val exp = select((t: Int) => t + 1) from (selectAll from r where (_ > 2))
    d.insertValues(r)(1, 2, 3, 4)
    assert(d.evaluateSorted(exp) == Seq(4, 5))
  }

  test("select [proj] from (r) where [pred] puts the σ under the π") {
    val d = db
    val r = d.createRelation[Int]("r")
    val exp = select((t: Int) => t + 1) from r where (_ > 2)
    d.insertValues(r)(1, 2, 3, 4)
    assert(d.evaluateSorted(exp) == Seq(4, 5))
  }

  test("create view as (select * from (r)) and as (select [proj] from (r))") {
    val d = db
    val r = d.createRelation[Int]("r")
    val v1 = d.createViewAs(selectAll from r)
    assert(d.evaluateSorted(v1) == Seq.empty)
    val v2 = d.createViewAs(select((x: Int) => x > 0) from r)
    assert(d.evaluateSorted(v2) == Seq.empty)
    d.insertValues(r)(-1, 3)
    assert(d.evaluateSorted(v1) == Seq(-1, 3))
    assert(d.evaluateSorted(v2) == Seq(false, true))
  }

  test("singleton literals under set operators (macros.rs:180-200)") {
    val d = db
    assert(d.evaluateSorted(selectAll from (row(42) union row(43))) == Seq(42, 43))
    assert(d.evaluateSorted(selectAll from (row(42) intersect row(42))) == Seq(42))
    assert(d.evaluateSorted(selectAll from (row(42) minus row(43))) == Seq(42))
  }

  // --- relexp! expression forms (macros.rs:202-382) ------------------------

  test("bare singleton evaluates (relexp!([42]))") {
    assert(db.evaluateSorted(row(42)) == Seq(42))
  }

  test("select [proj] from (r) maps every tuple") {
    val d = db
    val r = d.createRelation[Int]("r")
    val exp = select((t: Int) => t + 1) from r
    d.insertValues(r)(3, 4, 5, 6)
    assert(d.evaluateSorted(exp) == Seq(4, 5, 6, 7))
  }

  test("(r) cross (s) on [mapper] (macros.rs:268-289)") {
    val d = db
    val r = d.createRelation[Int]("r")
    val s = d.createRelation[Int]("s")
    val exp = (r cross s) on ((l: Int, x: Int) => l + x)
    d.insertValues(r)(1, 2, 3)
    d.insertValues(s)(10, 20, 30)
    assert(d.evaluateSorted(exp) == Seq(11, 12, 13, 21, 22, 23, 31, 32, 33))
  }

  test("(r) join (s) on [k; k] with [mapper] (macros.rs:290-315)") {
    val d = db
    val r = d.createRelation[(Int, String)]("r")
    val s = d.createRelation[(Int, String)]("s")
    val exp = (r join s).on(_._1, _._1) mapWith ((_, x, y) => x._2 + y._2)
    d.insertValues(r)((1, "a"), (2, "b"), (1, "a"), (4, "b"))
    d.insertValues(s)((1, "x"), (2, "y"))
    assert(d.evaluateSorted(exp) == Seq("ax", "by"))
  }

  test("string set operators: union / intersect / minus (macros.rs:316-369)") {
    val d = db
    val r = d.createRelation[String]("r")
    val s = d.createRelation[String]("s")
    d.insertValues(r)("a", "b")
    d.insertValues(s)("x", "b", "y")
    assert(d.evaluateSorted(r union s) == Seq("a", "b", "x", "y"))
    assert(d.evaluateSorted(r intersect s) == Seq("b"))
    assert(d.evaluateSorted(r minus s) == Seq("a"))
  }

  test("non-monotone view definitions are rejected through the DSL too") {
    val d = db
    val r = d.createRelation[Int]("r")
    val s = d.createRelation[Int]("s")
    intercept[CoddError.UnsupportedExpression] {
      d.createViewAs(selectAll from (r minus s))
    }
    intercept[CoddError.UnsupportedExpression] {
      d.createViewAs(select((x: Int) => x + 1) from (r minus s) where (_ > 0))
    }
  }

  test("fork of a fork stays isolated from both ancestors") {
    val d1 = db
    val r = d1.createRelation[Int]("r")
    d1.insertValues(r)(1)
    assert(d1.evaluateSorted(r) == Seq(1))
    val d2 = d1.fork()
    d2.insertValues(r)(2)
    val d3 = d2.fork()
    d3.insertValues(r)(3)
    d1.insertValues(r)(10)
    assert(d1.evaluateSorted(r) == Seq(1, 10))
    assert(d2.evaluateSorted(r) == Seq(1, 2))
    assert(d3.evaluateSorted(r) == Seq(1, 2, 3), "grandchild sees both ancestors' pre-fork state only")
  }

  test("views queried through the DSL keep maintaining (macros.rs:370-381)") {
    val d = db
    val r = d.createRelation[Int]("r")
    val v = d.createViewAs(selectAll from r)
    d.insertValues(r)(1, 2, 3, 4)
    assert(d.evaluateSorted(selectAll from v) == Seq(1, 2, 3, 4))
    d.insertValues(r)(100, 200, 300)
    val exp = select((x: Int) => x + 1) from v where (_ >= 100)
    assert(d.evaluateSorted(exp) == Seq(101, 201, 301))
  }
}
