package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[JaroWinkler]] — the native similarity expression's pinned semantics
  * (textbook values, the engines' empty-string convention, boost gating)
  * and both execution paths.
  */
class StringExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double = JaroWinkler.simStr(a, b)

  test("kernel: textbook values, empty convention, boost gating, symmetry") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
    // either side empty scores 0 — including BOTH (the engines'
    // convention, deliberately not the textbook 1.0)
    assert(jw("abc", "") == 0.0 && jw("", "") == 0.0)
    // no matches inside the window: "ab" vs "ba" has window 0
    assert(jw("ab", "ba") == 0.0)
    // boost applies only above 0.7: this pair sits at exactly 2/3
    assert(jw("abcdef", "abczzz") == 0.6666666666666666)
    // prefix cap at 4: long shared prefixes don't overshoot
    assert(math.abs(jw("prefixaaaa", "prefixbbbb") - 0.8400000000000001) < 1e-15)
    // symmetric
    assert(jw("dixon", "dicksonx") == jw("dicksonx", "dixon"))
  }

  test("column path (codegen) and SQL registration agree with the kernel; nulls propagate") {
    val df = Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("abc", "abc"),
      (null.asInstanceOf[String], "x"), ("x", null.asInstanceOf[String]))
      .toDF("a", "b")
    val got = df.select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(jw("martha", "marhta")))
    assert(got(1).contains(jw("dixon", "dicksonx")))
    assert(got(2).contains(1.0))
    assert(got(3).isEmpty && got(4).isEmpty, "null inputs must yield null")
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("__jw_t")
    val sql = spark.sql("SELECT jaro_winkler(a, b) AS jw FROM __jw_t WHERE a IS NOT NULL AND b IS NOT NULL")
      .as[Double].collect()
    assert(sql.toSeq == Seq(jw("martha", "marhta"), jw("dixon", "dicksonx"), 1.0))
    // interpreted eval (no codegen) agrees bitwise
    val expr = JaroWinkler(
      org.apache.spark.sql.catalyst.expressions.Literal.create("martha"),
      org.apache.spark.sql.catalyst.expressions.Literal.create("marhta"))
    assert(expr.eval(null) == jw("martha", "marhta"))
  }
}
