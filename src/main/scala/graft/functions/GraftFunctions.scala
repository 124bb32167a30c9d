package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Multiply, Sqrt}

/** SQL-surface registration for the graft native expressions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` and
  * `cosine_sim(a, b)` work alongside the Column API — plus the
  * text-pipeline scalars (`graft_lang_id`, `graft_token_count`, ...),
  * which expand to the same built-in-function trees the Column API
  * builds, so SQL users get identical codegen'd plans.
  */
object GraftFunctions {

  /** Lift a unary Column function into a FunctionRegistry builder: wrap
    * the argument Expression as a Column, apply, unwrap. The resulting
    * tree is ordinary Catalyst (no UDF) — identical to the Column API's.
    */
  private def unary(name: String, f: Column => Column)(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
    // expressionNow, not expression: a builder's return value bypasses the
    // DataFrame path that unwraps the lazy ColumnNodeExpression adapter
    GraftColumnBridge.expressionNow(f(GraftColumnBridge.column(args.head)))
  }

  /** (name, unary builder) for every text-pipeline scalar worth a SQL
    * name. `graft_` prefix keeps the session namespace collision-free.
    */
  private val textFns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_tokens" -> unary("graft_tokens", graft.ops.TextOps.tokens) _,
    "graft_token_count" -> unary("graft_token_count", graft.ops.TextOps.tokenCount) _,
    "graft_lang_id" -> unary("graft_lang_id", graft.ops.TextOps.langId) _,
    "graft_fingerprint" -> unary("graft_fingerprint", graft.ops.TextOps.fingerprint) _,
    "graft_normalize" -> unary("graft_normalize", graft.ops.TextOps.normalize) _,
    "graft_redact_pii" -> unary("graft_redact_pii", graft.ops.TextOps.redactPii) _,
    "graft_rolling_hash" -> unary("graft_rolling_hash", graft.ops.TextOps.rollingHash) _,
    "graft_simhash64" -> unary("graft_simhash64", graft.ops.Dedup.simhash64) _,
    "graft_dhash60" -> unary("graft_dhash60", graft.ops.Multimodal.dhash60) _,
    "graft_stopword_ratio" -> unary("graft_stopword_ratio", graft.ops.TextOps.stopwordRatio) _,
    // the Gopher rule bitmask straight from SQL (mask 0 = pass)
    "graft_quality_mask" -> unary("graft_quality_mask", (t: Column) =>
      graft.ops.TextOps.gopherRuleMask(
        org.apache.spark.sql.functions.coalesce(
          graft.ops.TextOps.tokens(t),
          org.apache.spark.sql.functions.array()
            .cast("array<string>")))) _)

  private def dotBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
    DotProduct(args(0), args(1))
  }

  private def intDotBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"int_dot_product expects 2 arguments, got ${args.length}")
    IntDotProduct(args(0), args(1))
  }

  private def jaroWinklerBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"jaro_winkler expects 2 arguments, got ${args.length}")
    JaroWinkler(args(0), args(1))
  }

  private def damerauBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"damerau_levenshtein expects 2 arguments, got ${args.length}")
    DamerauLevenshtein(args(0), args(1))
  }

  private def int8CodesBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"int8_unit_codes expects 1 argument, got ${args.length}")
    Int8UnitCodes(args(0))
  }

  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
    val (a, b) = (args(0), args(1))
    org.apache.spark.sql.catalyst.expressions.Divide(
      DotProduct(a, b),
      Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
  }

  /** Register into an existing session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("dot_product", dotBuilder, "built-in")
    registry.createOrReplaceTempFunction("int_dot_product", intDotBuilder, "built-in")
    registry.createOrReplaceTempFunction("jaro_winkler", jaroWinklerBuilder, "built-in")
    registry.createOrReplaceTempFunction("damerau_levenshtein", damerauBuilder, "built-in")
    registry.createOrReplaceTempFunction("int8_unit_codes", int8CodesBuilder, "built-in")
    registry.createOrReplaceTempFunction("cosine_sim", cosineBuilder, "built-in")
    textFns.foreach { case (n, b) => registry.createOrReplaceTempFunction(n, b, "built-in") }
  }

  /** Builder-time form:
    * `SparkSession.builder().withExtensions(new GraftExtensions)...` —
    * registers the functions into every session created with the
    * extensions, the deployment-grade path
    * (runtime [[register]] covers already-built sessions).
    */
  final class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(e: SparkSessionExtensions): Unit = {
      e.injectFunction(
        (new FunctionIdentifier("dot_product"),
          new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
          dotBuilder _))
      e.injectFunction(
        (new FunctionIdentifier("int_dot_product"),
          new ExpressionInfo(classOf[IntDotProduct].getName, "int_dot_product"),
          intDotBuilder _))
      e.injectFunction(
        (new FunctionIdentifier("jaro_winkler"),
          new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
          jaroWinklerBuilder _))
      e.injectFunction(
        (new FunctionIdentifier("damerau_levenshtein"),
          new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
          damerauBuilder _))
      e.injectFunction(
        (new FunctionIdentifier("int8_unit_codes"),
          new ExpressionInfo(classOf[Int8UnitCodes].getName, "int8_unit_codes"),
          int8CodesBuilder _))
      e.injectFunction(
        (new FunctionIdentifier("cosine_sim"),
          new ExpressionInfo(classOf[DotProduct].getName, "cosine_sim"),
          cosineBuilder _))
      textFns.foreach { case (n, b) =>
        e.injectFunction(
          (new FunctionIdentifier(n), new ExpressionInfo("graft.ops.TextOps", n), b))
      }
      // whole-operator extension: the native as-of join strategy
      e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    }
  }
}
