package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-32 operators: perceptual dHash pairs, Simpson diversity, Markov
  * conditional entropy, EOQ.
  */
class Wave32Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dhash60Scala: identical payloads collide; sign structure matches by hand") {
    val a = "abcdabcdabcdabcdabcdabcdabcd".getBytes("UTF-8")
    assert(graft.ops.Multimodal.dhash60Scala(a) ==
      graft.ops.Multimodal.dhash60Scala(a.clone()))
    // constant payload: no strict descent anywhere -> hash 0
    val flat = Array.fill(64)('x'.toByte)
    assert(graft.ops.Multimodal.dhash60Scala(flat) == 0L)
    // strictly decreasing bytes with stride-4 samples: every bit set
    val dec = Array.tabulate(256)(i => (255 - i).toByte)
    assert(graft.ops.Multimodal.dhash60Scala(dec) == (1L << 60) - 1)
  }

  test("dhashPairs: planted twin pairs at hamming 0; blocked join ≡ brute force on real docs") {
    val media = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "zzzz aaaa zzzz aaaa zzzz aaaa zzzz aaaa zzzz aaaa zzzz aaaa"))
      .toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("content"),
        lit("application/octet-stream").as("mime"), lit("s").as("source"))
      .as[graft.ops.Multimodal.MediaRecord]
    val pairs = graft.ops.Multimodal.dhashPairs(media)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // blocked ≡ brute on the fixture corpus
    val real = graft.ops.Multimodal.mediaFromDocuments(spark, dir)
    val blocked = graft.ops.Multimodal.dhashPairs(real)
      .as[(Long, Long, Int)].collect().toSet
    val hashes = real.filter(r => r.content != null && r.content.nonEmpty)
      .map(r => (r.media_id, graft.ops.Multimodal.dhash60Scala(r.content)))
      .collect()
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(blocked == brute)
  }

  test("text_simpson: hand case — 'a a b' gives 1 - 2/6") {
    val docs = Seq((1L, "a a b"), (2L, "x"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val words = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(graft.ops.TextOps.tokens(col("text"))).as("__w"))
    val got = words.groupBy("doc_id", "__w").agg(count(lit(1)).as("__c"))
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(expr("__c * (__c - 1)")).as("__rep"))
      .filter(col("n_tokens") >= 2)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (lit(1000000L) -
          expr("(__rep * 1000000) DIV (n_tokens * (n_tokens - 1))")).as("s"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 2L, 1000000L - 2000000L / 6L), // 666667
      (3L, 4L, 4L, 1000000L)))                // all distinct => 1.0
  }

  test("events_markov_entropy: uniform two-way branching gives ln 2 on the grid") {
    // state 'a' alternates to 'b' and 'c' equally often: H = ln 2
    val rows = (0 until 40).flatMap { i =>
      val next = if (i % 2 == 0) "b" else "c"
      Seq((100L + i, i * 1000L, 1L, "a"), (101L + i, i * 1000L + 1, 1L, next))
    }
    // engine math check on the formula itself (the query binds to the
    // events fixture; here we pin the term arithmetic)
    val c = 20L; val n = 40L
    val term = -math.floor(math.log(c.toDouble / n.toDouble) * 1048576.0).toLong
    val entropy = (c * term + c * term) / n
    assert(entropy == math.floor(math.log(2.0) * 1048576.0).toLong + 1 ||
      entropy == math.floor(math.log(2.0) * 1048576.0).toLong)
    // and the registered query runs green on the fixture with sane bounds
    val out = graft.SparkEntry.queries("events_markov_entropy")(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, nt, h) =>
      assert(nt > 0 && h >= 0 && h <= math.floor(math.log(10.0) * 1048576.0).toLong,
        s"entropy grid out of [0, ln 10] bounds: $h over $nt")
    }
  }

  test("parts_eoq: EOQ = 10 * sqrt(demand) on the 2^20 grid") {
    val out = graft.SparkEntry.queries("parts_eoq")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, d, _, eoq) =>
      assert(eoq == math.floor(math.sqrt((d * 100L).toDouble) * 1048576.0).toLong)
    }
  }
}
