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

  private def dl(a: String, b: String): Int = DamerauLevenshtein.distStr(a, b)

  test("damerau kernel: TRUE DL (transposition drift), textbook values, symmetry") {
    // the variant separator: OSA says 3, true DL says 2 (swap then insert
    // between the swapped pair)
    assert(dl("CA", "ABC") == 2)
    assert(dl("ab", "ba") == 1)
    assert(dl("abc", "acb") == 1)
    assert(dl("abcdef", "abdcef") == 1)
    assert(dl("kitten", "sitting") == 3)
    assert(dl("", "abc") == 3 && dl("abc", "") == 3 && dl("", "") == 0)
    assert(dl("aa", "aaa") == 1)
    assert(dl("banana", "ananab") == dl("ananab", "banana"), "symmetric")
    // transposition beats plain levenshtein where digits swap
    assert(dl("Customer#000000012", "Customer#000000021") == 1)
    // upper bound: never exceeds plain levenshtein (here lev would be 2)
  }

  test("damerau column path (codegen) + SQL registration agree; nulls propagate") {
    GraftFunctions.register(spark)
    val df = Seq(
      ("CA", "ABC"), ("ab", "ba"), ("kitten", "sitting"), ("same", "same"))
      .toDF("a", "b")
    val viaCol = df.select(
      DamerauLevenshtein.damerauLevenshtein(col("a"), col("b"))).as[Int].collect().toSeq
    assert(viaCol == Seq(2, 1, 3, 0))
    df.createOrReplaceTempView("dl_t")
    val viaSql = spark.sql("SELECT damerau_levenshtein(a, b) FROM dl_t")
      .as[Int].collect().toSeq
    assert(viaSql == viaCol)
    val withNull = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(DamerauLevenshtein.damerauLevenshtein(col("a"), col("b")))
      .as[Option[Int]].head()
    assert(withNull.isEmpty)
  }
}
