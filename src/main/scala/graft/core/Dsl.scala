package graft.core

import org.apache.spark.sql.Encoder

import scala.language.implicitConversions
import scala.reflect.ClassTag

/** String-free query DSL mirroring the reference's `query!` / `relexp!`
  * macro grammar (reference: core/src/macros.rs:1-110) as plain typed Scala:
  *
  * {{{
  * import graft.core.dsl._
  * selectAll from r                                   // select * from (r)
  * selectAll from r where (_ % 2 == 0)                // … where [pred]
  * select((t: Int) => t + 1) from r where (_ > 2)     // select [proj] from (r) where [pred]
  * row(42)                                            // relexp!([42]) singleton literal
  * (r cross s) on ((l: Int, x: Int) => l + x)         // (r) cross (s) on [mapper]
  * (r join s).on(_._1, _._1) mapWith ((k, x, y) => …) // (r) join (s) on [k;k] with [mapper]
  * r union s; r intersect s; r minus s                // set operators
  * db.createRelation[Int]("r")                        // create relation "r":<i32>
  * db.createViewAs(selectAll from r)                  // create view as (…)
  * db.insertValues(r)(1, 2, 3, 4)                     // insert into (r) values […]
  * }}}
  *
  * Rust's macro pattern-matches token trees at compile time; the Scala
  * analog gets the same compile-time safety from the type system directly —
  * each combinator returns exactly the [[Expr]] node the macro would have
  * expanded to, so everything composes with the builder API and stored
  * views unchanged.
  */
object dsl {

  /** `select [proj] from (…)` — projection first, as in the macro. */
  def select[S, T](proj: S => T)(implicit enc: Encoder[T]): SelectProj[S, T] =
    new SelectProj[S, T](proj)

  final class SelectProj[S, T](proj: S => T)(implicit enc: Encoder[T]) {
    def from(e: Expr[S]): FromProj[S, T] = new FromProj[S, T](e, proj)
  }

  /** `select [proj] from (e)`; an optional `where` slips the σ UNDER the π,
    * exactly like the macro's `@select … @proj @pred` expansion.
    */
  final class FromProj[S, T](e: Expr[S], proj: S => T)(implicit enc: Encoder[T]) {
    def where(p: S => Boolean): Expr[T] = Project(Select(e, p), proj)
    def toExpr: Expr[T] = Project(e, proj)
  }

  implicit def fromProjIsExpr[S, T](fp: FromProj[S, T]): Expr[T] = fp.toExpr

  /** `select * from (…)` — identity shape; `where` adds the σ. */
  object selectAll {
    def from[T](e: Expr[T]): FromAll[T] = new FromAll[T](e)
  }

  final class FromAll[T](val e: Expr[T]) {
    def where(p: T => Boolean): Expr[T] = Select(e, p)
  }

  implicit def fromAllIsExpr[T](fa: FromAll[T]): Expr[T] = fa.e

  /** `relexp!([v])` — singleton literal relation. */
  def row[T](t: T)(implicit enc: Encoder[T]): Expr[T] = Singleton(t)

  implicit final class DslExprOps[L](private val self: Expr[L]) extends AnyVal {
    /** `(l) cross (r) on [mapper]` */
    def cross[R](right: Expr[R]): CrossPair[L, R] = new CrossPair(self, right)

    /** `(l) join (r) on [lkey ; rkey] with [mapper]` (`with` is a Scala
      * keyword — the mapper arm is `mapWith`).
      */
    def join[R](right: Expr[R]): JoinPair[L, R] = new JoinPair(self, right)

    /** `(l) minus (r)` */
    def minus(other: Expr[L]): Expr[L] = Difference(self, other)
  }

  final class CrossPair[L, R](left: Expr[L], right: Expr[R]) {
    def on[T](f: (L, R) => T)(implicit enc: Encoder[T]): Expr[T] = Prod(left, right, f)
  }

  final class JoinPair[L, R](left: Expr[L], right: Expr[R]) {
    def on[K](lk: L => K, rk: R => K)(implicit kEnc: Encoder[K]): JoinKeys[K, L, R] =
      new JoinKeys(left, right, lk, rk)
  }

  final class JoinKeys[K, L, R](left: Expr[L], right: Expr[R], lk: L => K, rk: R => K)(
      implicit kEnc: Encoder[K]) {
    def mapWith[T](f: (K, L, R) => T)(implicit enc: Encoder[T]): Expr[T] =
      EquiJoin(left, right, lk, rk, f)
  }

  /** The statement forms of the `query!` macro over a [[CoddSession]]. */
  implicit final class DslSessionOps(private val db: CoddSession) extends AnyVal {
    /** `create relation "name":<T>` */
    def createRelation[T](name: String)(implicit enc: Encoder[T], tag: ClassTag[T]): Rel[T] =
      db.addRelation[T](name)

    /** `create view as (select …)` */
    def createViewAs[T: ClassTag](q: Expr[T]): ViewExpr[T] = db.storeView(q)

    /** `insert into (rel) values [v, …]` */
    def insertValues[T](rel: Rel[T])(values: T*): Unit = db.insert(rel, values.toSeq)
  }
}
