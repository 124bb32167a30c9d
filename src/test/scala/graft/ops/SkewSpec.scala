package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, s"l$i")).toDF("k", "lv")
    val right = (1 to 200).map(i => (i.toLong, s"r$i")).toDF("rk", "rv")
    val expected = left.join(right, col("k") === col("rk")).drop("rk")
      .as[(Long, String, String)].collect().toSet
    val got = Skew.saltedJoin(left, right, "k", "rk", salts = 8)
      .as[(Long, String, String)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
