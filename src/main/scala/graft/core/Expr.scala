package graft.core

import org.apache.spark.sql.Encoder

import scala.reflect.ClassTag

/** Opaque handle to a stored materialized view
  * (reference: core/src/expression/view.rs:6-7).
  */
final case class ViewRef(id: Int)

/** Typed relational-algebra expression tree — the Spark-native analog of the
  * reference's 13 expression node types (reference: core/src/expression.rs and
  * core/src/expression/mono.rs:10-26). An expression IS the plan: there is no
  * separate parse/analyze phase (reference has none either); "analysis" is
  * dependency collection, done lazily here and cached per node.
  *
  * Unlike the Rust original, which threads static generics through a
  * `Visitor`/double-dispatch maze, a sealed ADT carrying its `Encoder`
  * evidence is the idiomatic Scala/Spark representation (SURVEY §7): each
  * node knows how to become a `Dataset[T]`.
  *
  * Set semantics throughout: every node evaluates to a distinct set of
  * tuples (reference: core/src/database/instance.rs:15-28).
  */
sealed trait Expr[T] extends Serializable {

  /** Spark encoder for the tuple type this expression produces. */
  def enc: Encoder[T]

  /** Direct children (for generic tree walks — the analog of the reference's
    * `Visitor`, core/src/expression.rs:96-211).
    */
  def children: Seq[Expr[_]]

  /** Names of base relations this expression depends on
    * (reference: core/src/expression/dependency.rs:9-55).
    * A `ViewExpr` is a leaf: it contributes its own ref, not its
    * definition's dependencies.
    */
  final lazy val relDeps: Set[String] = this match {
    case Rel(name)      => Set(name)
    case _: ViewExpr[_] => Set.empty
    case _              => children.flatMap(_.relDeps).toSet
  }

  /** View refs this expression depends on (see [[relDeps]]). */
  final lazy val viewDeps: Set[Int] = this match {
    case v: ViewExpr[_] => Set(v.ref.id)
    case _: Rel[_]      => Set.empty
    case _              => children.flatMap(_.viewDeps).toSet
  }
}

/** Named base relation of `T`-tuples; leaf node
  * (reference: core/src/expression/relation.rs:20-57).
  * The `ClassTag` mirrors the reference's runtime downcast check
  * (core/src/database.rs:213-225): a `Rel[T]` aimed at a relation registered
  * with a different type raises `InstanceNotFound`.
  */
final case class Rel[T](name: String)(implicit val enc: Encoder[T], val tag: ClassTag[T])
    extends Expr[T] {
  def children: Seq[Expr[_]] = Nil
}

/** σ_p with an arbitrary predicate closure
  * (reference: core/src/expression/select.rs:28-63).
  */
final case class Select[T](child: Expr[T], p: T => Boolean) extends Expr[T] {
  def enc: Encoder[T] = child.enc
  def children: Seq[Expr[_]] = Seq(child)
}

/** π_f with an arbitrary mapper closure — may change type, compute, rename
  * (reference: core/src/expression/project.rs:28-65).
  */
final case class Project[S, T](child: Expr[S], f: S => T)(implicit val enc: Encoder[T])
    extends Expr[T] {
  def children: Seq[Expr[_]] = Seq(child)
}

/** Cartesian product fused with a mapper
  * (reference: core/src/expression/product.rs:27-73).
  */
final case class Prod[L, R, T](left: Expr[L], right: Expr[R], f: (L, R) => T)(
    implicit val enc: Encoder[T])
    extends Expr[T] {
  def children: Seq[Expr[_]] = Seq(left, right)
}

/** Equi-join on computed keys, fused with a mapper
  * (reference: core/src/expression/join.rs:42-148). Inner equi-join only —
  * the reference has no outer/semi/anti/theta joins (SURVEY §2).
  */
final case class EquiJoin[K, L, R, T](
    left: Expr[L],
    right: Expr[R],
    leftKey: L => K,
    rightKey: R => K,
    f: (K, L, R) => T)(implicit val kEnc: Encoder[K], val enc: Encoder[T])
    extends Expr[T] {
  def children: Seq[Expr[_]] = Seq(left, right)
}

/** L ∪ R, set union (reference: core/src/expression/union.rs:23-64). */
final case class Union[T](left: Expr[T], right: Expr[T]) extends Expr[T] {
  def enc: Encoder[T] = left.enc
  def children: Seq[Expr[_]] = Seq(left, right)
}

/** L ∩ R (reference: core/src/expression/intersect.rs:23-64). */
final case class Intersect[T](left: Expr[T], right: Expr[T]) extends Expr[T] {
  def enc: Encoder[T] = left.enc
  def children: Seq[Expr[_]] = Seq(left, right)
}

/** L − R. Non-monotone: legal in ad-hoc queries, rejected inside stored views
  * (reference: core/src/expression/difference.rs:25-67,
  * core/src/database/validate.rs:21-33).
  */
final case class Difference[T](left: Expr[T], right: Expr[T]) extends Expr[T] {
  def enc: Encoder[T] = left.enc
  def children: Seq[Expr[_]] = Seq(left, right)
}

/** Constant empty relation (reference: core/src/expression/empty.rs:17-52). */
final case class EmptyRel[T]()(implicit val enc: Encoder[T]) extends Expr[T] {
  def children: Seq[Expr[_]] = Nil
}

/** "All tuples of type T" — not range-restricted, so evaluation always fails
  * (reference: core/src/expression/full.rs:7-9, 23-52;
  * core/src/database/evaluate.rs:25-34). Exists for algebraic completeness.
  */
final case class FullRel[T]()(implicit val enc: Encoder[T]) extends Expr[T] {
  def children: Seq[Expr[_]] = Nil
}

/** Constant one-tuple relation (reference: core/src/expression/singleton.rs:16-49).
  * Note the IVM asymmetry: its delta is empty, its stable set is the tuple —
  * constants are born stable (core/src/database/evaluate.rs:43-48, 281-286).
  */
final case class Singleton[T](tuple: T)(implicit val enc: Encoder[T]) extends Expr[T] {
  def children: Seq[Expr[_]] = Nil
}

/** Reference to a stored materialized view; leaf node
  * (reference: core/src/expression/view.rs:48-96).
  */
final case class ViewExpr[T](ref: ViewRef)(implicit val enc: Encoder[T], val tag: ClassTag[T])
    extends Expr[T] {
  def children: Seq[Expr[_]] = Nil
}

object Expr {

  /** True iff the tree contains a `Difference` node — used to reject
    * non-monotone view definitions
    * (reference: core/src/database/validate.rs:21-33).
    */
  def containsDifference(e: Expr[_]): Boolean = e match {
    case _: Difference[_] => true
    case other            => other.children.exists(containsDifference)
  }

  /** Fluent builder over the ADT, mirroring the reference's builder facade
    * (reference: core/src/expression/builder.rs).
    */
  implicit final class ExprOps[T](private val self: Expr[T]) extends AnyVal {
    def select(p: T => Boolean): Expr[T] = Select(self, p)
    def project[U](f: T => U)(implicit enc: Encoder[U]): Expr[U] = Project(self, f)
    def union(other: Expr[T]): Expr[T] = Union(self, other)
    def intersect(other: Expr[T]): Expr[T] = Intersect(self, other)
    def difference(other: Expr[T]): Expr[T] = Difference(self, other)

    /** `l.product(r).on((l, r) => t)` (reference: builder.rs:172-183, 253-281). */
    def product[R](other: Expr[R]): ProductBuilder[T, R] = ProductBuilder(self, other)

    /** `l.withKey(k1).join(r.withKey(k2)).on((k, l, r) => t)`
      * (reference: builder.rs:214-222, 283-349).
      */
    def withKey[K](k: T => K)(implicit kEnc: Encoder[K]): Keyed[K, T] = Keyed(self, k)
  }

  final case class ProductBuilder[L, R](left: Expr[L], right: Expr[R]) {
    def on[T](f: (L, R) => T)(implicit enc: Encoder[T]): Expr[T] = Prod(left, right, f)
  }

  final case class Keyed[K, T](expr: Expr[T], key: T => K)(implicit val kEnc: Encoder[K]) {
    def join[R](other: Keyed[K, R]): JoinBuilder[K, T, R] = JoinBuilder(this, other)
  }

  final case class JoinBuilder[K, L, R](left: Keyed[K, L], right: Keyed[K, R]) {
    def on[T](f: (K, L, R) => T)(implicit enc: Encoder[T]): Expr[T] =
      EquiJoin(left.expr, right.expr, left.key, right.key, f)(left.kEnc, enc)
  }
}
