package graft.queries

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-31 operators: distributed order primitives (Ranks), RA link
  * prediction, MATTR, Mann–Kendall, dyadic EWMA, 1-D Wasserstein.
  */
class Wave31Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("Ranks.runningSums ≡ the single-task global window it replaces") {
    val df = (1 to 997).map(i => ((i * 7919) % 100003, (i % 13).toLong))
      .toDF("k", "v")
    val viaRanks = graft.ops.Ranks.runningSum(df, "k", "v", "cum")
      .select("k", "cum").as[(Int, Long)].collect().toMap
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = df.withColumn("cum", sum(col("v")).over(w))
      .select("k", "cum").as[(Int, Long)].collect().toMap
    assert(viaRanks == viaWindow)
  }

  test("Ranks.runningSums is invariant to input partitioning") {
    val df = (1 to 500).map(i => ((i * 31) % 9973, 1L)).toDF("k", "v")
    val a = graft.ops.Ranks.runningSum(df.repartition(1), "k", "v", "cum")
      .select("k", "cum").as[(Int, Long)].collect().toSet
    val b = graft.ops.Ranks.runningSum(df.repartition(17), "k", "v", "cum")
      .select("k", "cum").as[(Int, Long)].collect().toSet
    assert(a == b)
  }

  test("Ranks.nextKey ≡ lead over the total order, null for the global last") {
    val df = (1 to 300).map(i => (i * 3) % 901).distinct.map(k => (k, 0)).toDF("k", "z")
    val viaRanks = graft.ops.Ranks.nextKey(df, "k", "nk")
      .select("k", "nk").as[(Int, Option[Int])].collect().toMap
    val viaWindow = df.withColumn("nk", lead(col("k"), 1).over(Window.orderBy("k")))
      .select("k", "nk").as[(Int, Option[Int])].collect().toMap
    assert(viaRanks == viaWindow)
    assert(viaRanks.values.count(_.isEmpty) == 1)
  }

  test("resourceAllocation: hand fixture — RA weight is 2^20 DIV deg") {
    // square 1-2-3-4-1 plus chord apexes: predict the diagonals
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val out = graft.ops.Graph.resourceAllocation(edges, maxDegree = 64, topK = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    // diagonals (1,3) and (2,4) share two degree-2 apexes each:
    // ra = 2 * (2^20 DIV 2) = 1048576
    assert(out == Set((1L, 3L, 2L, 1048576L), (2L, 4L, 2L, 1048576L)))
  }

  test("mattrPerDoc: exact sliding window values, short-doc fallback, null/empty exit") {
    val docs = Seq(
      (1L, "a b a c b"),          // windows of 3: aba->2, bac->3, acb->3 => 8/9
      (2L, "x y"),                // short doc: 2 distinct / 2 tokens
      (3L, "z z z z"),            // windows of 3: zzz->1, zzz->1 => 2/6
      (4L, "   "),                // tokenless => exits
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.mattrPerDoc(docs, "doc_id", "text", window = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 5L, 3L, 8L * 1000000L / 9L),
      (2L, 2L, 1L, 1000000L),
      (3L, 4L, 2L, 2L * 1000000L / 6L)))
  }

  test("mattrPerDoc sliding multiset ≡ naive window recompute on real docs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fast = graft.ops.TextOps.mattrPerDoc(docs, "doc_id", "text", window = 7)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    val naive = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        if (n == 0) None
        else if (n <= 7) Some(id -> ((n.toLong, 1L, toks.toSet.size * 1000000L / n)))
        else {
          val ds = (0 to n - 7).map(i => toks.slice(i, i + 7).toSet.size.toLong)
          Some(id -> ((n.toLong, ds.size.toLong, ds.sum * 1000000L / (7L * ds.size))))
        }
      }.toMap
    assert(fast == naive)
  }

  test("mann_kendall: strictly increasing daily counts give S = n(n-1)/2 and the textbook z") {
    // engine formula replicated on a hand series via the registered query's math:
    // S for a strictly monotone series of n distinct values is n(n-1)/2,
    // tie term zero, z = (S-1)/sqrt(n(n-1)(2n+5)/18)
    val n = 10L
    val s = n * (n - 1) / 2
    val varNum = n * (n - 1) * (2 * n + 5)
    val z = math.floor((s - 1).toDouble / math.sqrt(varNum.toDouble / 18.0) * 1048576.0)
    assert(s == 45 && varNum == 2250 && z == math.floor(44.0 / math.sqrt(125.0) * 1048576.0))
  }

  test("events_ewma: the dyadic recurrence is the one documented, per type, in day order") {
    val out = graft.SparkEntry.queries("events_ewma")(spark, dir)
      .as[(String, String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rows) => t -> rows.sortBy(_._2) }
    assert(out.nonEmpty)
    out.values.foreach { rows =>
      var prev = -1L
      rows.foreach { case (_, _, x, sVal) =>
        val expect =
          if (prev < 0) x * 1048576L
          else prev - prev / 4 + (x * 1048576L) / 4
        assert(sVal == expect, s"ewma recurrence broke: got $sVal want $expect")
        prev = expect
      }
    }
  }

  test("orders_emd ≡ brute-force CDF integration on the same histogram") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val pts = orders
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("v"),
        col("o_orderstatus").as("st"))
      .as[(Long, String)].collect()
    val fs = pts.filter(_._2 == "F").map(_._1).sorted
    val os = pts.filter(_._2 == "O").map(_._1).sorted
    val vs = (fs ++ os).distinct.sorted
    var num = BigInt(0)
    vs.sliding(2).foreach {
      case Array(v, nv) =>
        val ca = fs.count(_ <= v).toLong
        val cb = os.count(_ <= v).toLong
        num += BigInt(nv - v) * (BigInt(ca) * os.length - BigInt(cb) * fs.length).abs
      case _ => ()
    }
    val expect = (num * 1048576 / (BigInt(fs.length) * os.length)).toLong
    val got = graft.SparkEntry.queries("orders_emd")(spark, dir)
      .as[(Long, Long, Long)].head()
    assert(got == ((fs.length.toLong, os.length.toLong, expect)))
  }
}
