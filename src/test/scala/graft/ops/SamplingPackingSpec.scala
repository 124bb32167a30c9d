package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Determinism and contract checks for the hash-sampling and packing
  * operators (value-level replay is covered by the DuckDB oracles; these
  * pin the properties the oracle compare can't express).
  */
class SamplingPackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()

  test("splitColumn: total partition, id-stable under corpus growth and repartitioning") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val full = docs.select(col("doc_id"), Sampling.splitColumn(col("doc_id"), splits).as("s"))
      .as[(Long, String)].collect().toMap
    assert(full.size == docs.count())
    assert(full.values.toSet == Set("train", "val", "test"))
    // growth stability: labels computed over a subset agree with the full run
    val subset = docs.filter(col("doc_id") < 100)
      .select(col("doc_id"), Sampling.splitColumn(col("doc_id"), splits).as("s"))
      .as[(Long, String)].collect().toMap
    assert(subset.forall { case (id, s) => full(id) == s })
    // partitioning independence
    val shuffled = docs.repartition(13)
      .select(col("doc_id"), Sampling.splitColumn(col("doc_id"), splits).as("s"))
      .as[(Long, String)].collect().toMap
    assert(shuffled == full)
  }

  test("sampleFraction: f=1 keeps everything, f=0 nothing, rate roughly honored") {
    assert(Sampling.sampleFraction(docs, "doc_id", 1.0).count() == docs.count())
    assert(Sampling.sampleFraction(docs, "doc_id", 0.0).count() == 0)
    val half = Sampling.sampleFraction(docs, "doc_id", 0.5).count().toDouble / docs.count()
    assert(half > 0.35 && half < 0.65, s"0.5-sample kept $half")
    // different salts draw independent samples
    val a = Sampling.sampleFraction(docs, "doc_id", 0.5, "a").select("doc_id").as[Long].collect().toSet
    val b = Sampling.sampleFraction(docs, "doc_id", 0.5, "b").select("doc_id").as[Long].collect().toSet
    assert(a != b && (a intersect b).nonEmpty)
  }

  test("importanceSample: p edges exact, constant p equals sampleFraction, null p drops") {
    import org.apache.spark.sql.functions.{col, lit, when}
    assert(Sampling.importanceSample(docs, "doc_id", lit(1.0)).count() == docs.count())
    assert(Sampling.importanceSample(docs, "doc_id", lit(0.0)).count() == 0)
    assert(Sampling.importanceSample(docs, "doc_id", lit(null).cast("double")).count() == 0)
    // a CONSTANT per-row probability must reproduce the scalar draw exactly
    // (same salt, same hash space, same threshold rendering)
    val viaImp = Sampling.importanceSample(docs, "doc_id", lit(0.37), salt = "s")
      .select("doc_id").as[Long].collect().toSet
    val viaFrac = Sampling.sampleFraction(docs, "doc_id", 0.37, salt = "s")
      .select("doc_id").as[Long].collect().toSet
    assert(viaImp == viaFrac, "importance draw diverges from the scalar draw")
    // per-row probabilities: kept set is monotone in p (p and p/2 nest)
    val p = when(col("doc_id") % 2 === 0, 0.8).otherwise(0.2)
    val hi = Sampling.importanceSample(docs, "doc_id", p)
      .select("doc_id").as[Long].collect().toSet
    val lo = Sampling.importanceSample(docs, "doc_id", p / 2)
      .select("doc_id").as[Long].collect().toSet
    assert(lo.subsetOf(hi), "halving every probability must only shrink the sample")
  }

  test("mixtureSample: subset of input, per-source rates follow the weights") {
    val w = Map("src0" -> 1.0, "src1" -> 0.2)
    val in = docs.filter(col("source").isin("src0", "src1")).select("doc_id", "source")
    val out = Sampling.mixtureSample(in, "doc_id", "source", w)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("src0") == 25, "weight 1.0 must keep every row")
    assert(counts.getOrElse("src1", 0L) < 15, s"weight 0.2 kept ${counts.get("src1")} of 25")
    // sampled rows are real input rows
    assert(out.join(in, Seq("doc_id", "source"), "left_anti").count() == 0)
  }

  test("temperatureMixture: α=1 proportional, α<1 up-weights small sources, α=0 equalizes tokens") {
    // skewed synthetic corpus: big source holds 100× the small one's tokens
    val rows = (1 to 1000).map(i => (i.toLong, "big", 10L)) ++
      (2001 to 2010).map(i => (i.toLong, "small", 10L))
    val df = rows.toDF("doc_id", "source", "n_tok")
    def rates(alpha: Double, tf: Double): Map[String, Double] =
      Sampling.temperatureRates(df, "source", "n_tok", alpha, tf)
        .as[(String, Double)].collect().toMap
    // α=1: q ∝ share cancels — every source keeps exactly targetFraction
    val r1 = rates(1.0, 0.4)
    assert(r1.values.forall(r => math.abs(r - 0.4) < 1e-6), s"α=1 rates $r1")
    // α=0.5: the small source's rate strictly exceeds the big one's
    val rHalf = rates(0.5, 0.4)
    assert(rHalf("small") > rHalf("big"), s"α=0.5 must up-weight: $rHalf")
    // α=0: equal TOKEN allocation per source (where the cap doesn't bind)
    val r0 = rates(0.0, 0.1)
    val bigToks = 1000 * 10L * r0("big")
    val smallToks = 10 * 10L * math.min(1.0, r0("small"))
    assert(r0("small") == 1.0 || math.abs(bigToks - smallToks) / bigToks < 1e-6,
      s"α=0 token allocation big=$bigToks small=$smallToks")
    // the keep filter honors the rates (exact expectation within hash noise)
    val kept = Sampling.temperatureMixture(df, "doc_id", "source", "n_tok", 0.5, 0.4)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("big") / 1000.0 - rHalf("big")) < 0.05,
      s"big kept ${kept("big")}/1000 vs rate ${rHalf("big")}")
    // determinism under physical layout
    val again = Sampling
      .temperatureMixture(df.repartition(13), "doc_id", "source", "n_tok", 0.5, 0.4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val first = Sampling.temperatureMixture(df, "doc_id", "source", "n_tok", 0.5, 0.4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(first == again, "temperature draw must not depend on partitioning")
  }

  test("exactKSample/exactKPerGroup: size guarantees, hash-rank reference, invariance") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "g")
    val got = Sampling.exactKSample(df, "id", 20)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(got.size == 20)
    // reference: the 20 smallest (md5-hex, id) ranks computed in Scala
    def hk(i: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("ks" + i).getBytes("UTF-8"))
      d.take(4).map("%02x".format(_)).mkString
    }
    val ref = (1L to 200L).sortBy(i => (hk(i), i)).take(20).toSet
    assert(got == ref, "hash-rank sample must match the md5 reference")
    val rep = Sampling.exactKSample(df.repartition(7), "id", 20)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(rep == got, "partitioning-invariant")
    // k >= n keeps everything; per-group sizes are exact min(k, group size)
    assert(Sampling.exactKSample(df, "id", 500).count() == 200L)
    val per = Sampling.exactKPerGroup(df, "g", "id", 7)
      .as[(Long, String)].collect().groupBy(_._2).view.mapValues(_.length).toMap
    assert(per == Map("a" -> 7, "b" -> 7))
    val tiny = Sampling.exactKPerGroup(df.filter(col("id") <= 4), "g", "id", 7)
      .as[(Long, String)].collect().groupBy(_._2).view.mapValues(_.length).toMap
    assert(tiny == Map("a" -> 1, "b" -> 3), "small groups keep all rows")
    intercept[IllegalArgumentException] { Sampling.exactKSample(df, "id", 0) }
  }

  test("topFractionPerGroup: exact ceil(frac·n) per group, ties broken by hash, null score drops") {
    val rows = (1 to 100).map(i => (i.toLong, "g1", i.toDouble)) ++
      (101 to 150).map(i => (i.toLong, "g2", 7.0)) ++ // ALL-tied group
      Seq((200L, "g3", Double.NaN), (201L, null.asInstanceOf[String], 1.0))
    val df = rows.toDF("doc_id", "grp", "sc")
      .withColumn("sc", when(isnan(col("sc")), lit(null)).otherwise(col("sc")))
    val kept = Sampling.topFractionPerGroup(df, "grp", col("sc"), "doc_id", 0.2)
      .as[(Long, String, Double)].collect()
    val byGrp = kept.groupBy(_._2)
    assert(byGrp("g1").length == 20, s"ceil(0.2*100): ${byGrp("g1").length}")
    assert(byGrp("g2").length == 10, s"ceil(0.2*50) under total ties: ${byGrp("g2").length}")
    assert(!byGrp.contains("g3"), "null-score rows drop")
    assert(!byGrp.contains(null), "null-group rows drop")
    // g1 keeps exactly the 20 HIGHEST scores (no ties there)
    assert(byGrp("g1").map(_._1).sorted.toSeq == (81L to 100L))
    // partitioning invariance (the tied group makes this a real check)
    val again = Sampling.topFractionPerGroup(df.repartition(13), "grp", col("sc"), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == kept.map(_._1).sorted.toSeq)
    // frac = 1 keeps every scored row
    val all = Sampling.topFractionPerGroup(df, "grp", col("sc"), "doc_id", 1.0).count()
    assert(all == 150)
  }

  test("calibrateByGroup: percent_rank semantics, ties share pct, singleton 0.0, nulls drop") {
    val rows = Seq(
      (1L, "g1", 10.0), (2L, "g1", 20.0), (3L, "g1", 20.0), (4L, "g1", 30.0), (5L, "g1", 40.0),
      (10L, "g2", 7.0), // singleton group
      (20L, "g3", Double.NaN), (21L, null.asInstanceOf[String], 1.0))
    val df = rows.toDF("doc_id", "grp", "sc")
      .withColumn("sc", when(isnan(col("sc")), lit(null)).otherwise(col("sc")))
    val got = Sampling.calibrateByGroup(df, "grp", col("sc"))
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    // g1 (n=5): strictly-below counts 0,1,1,3,4 over n-1=4
    assert(got(1L) == 0.0 && got(4L) == 0.75 && got(5L) == 1.0)
    assert(got(2L) == 0.25 && got(3L) == 0.25, "ties share the pct")
    assert(got(10L) == 0.0, "single-row group calibrates to 0.0")
    assert(!got.contains(20L) && !got.contains(21L), "null score/group rows drop")
    // brute-force replay over the real corpus scores
    val scored = docs
      .select(col("doc_id"), col("lang"),
        TextOps.stopwordRatioOfTokens(TextOps.tokens(col("text"))).as("sc"))
      .filter(col("sc").isNotNull && col("lang").isNotNull)
      .as[(Long, String, Double)].collect()
    val expect = scored.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      g.toSeq.map { case (id, _, sc) =>
        val less = g.count(_._3 < sc).toLong
        id -> (if (g.length == 1) 0.0 else less.toDouble / (g.length - 1))
      }
    }
    val corpus = Sampling.calibrateByGroup(
      docs.select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("__ws")),
      "lang", TextOps.stopwordRatioOfTokens(col("__ws")))
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    assert(corpus == expect.toMap, "corpus calibration must equal the brute-force ECDF")
    // the join back rides a broadcast of the score-level dim — the corpus
    // itself must not shuffle into a sort-merge join
    val plan = Sampling.calibrateByGroup(df, "grp", col("sc"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"expected broadcast join back, got:\n$plan")
  }

  test("stratified: exactly min(k, |stratum|) per stratum, partitioning-invariant members") {
    val got = Sampling.stratified(docs.select("doc_id", "source"), Seq("source"), "doc_id", 5)
    val per = got.groupBy("source").count().as[(String, Long)].collect()
    assert(per.length == 20 && per.forall(_._2 == 5))
    assert(got.select("rank").as[Int].collect().forall(r => r >= 1 && r <= 5))
    val again = Sampling
      .stratified(docs.repartition(17).select("doc_id", "source"), Seq("source"), "doc_id", 5)
    assert(
      got.select("doc_id").as[Long].collect().sorted.toSeq ==
        again.select("doc_id").as[Long].collect().sorted.toSeq,
      "hash-ordered draw must not depend on physical layout")
  }

  test("lengthBatches: full batches except last, padding beats arrival order, invariant") {
    val toks = docs.select(
      col("source"), col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("t"))
    val batched = Packing.lengthBatches(toks, "source", "doc_id", "t", 16)
    val sizes = batched.groupBy("source", "batch").count()
      .as[(String, Long, Long)].collect()
    // every batch full except at most one (the last) per stream
    sizes.groupBy(_._1).foreach { case (src, bs) =>
      val partial = bs.filter(_._3 != 16L)
      assert(partial.length <= 1, s"$src has ${partial.length} partial batches")
      val maxBatch = bs.map(_._2).max
      partial.foreach { case (_, b, _) => assert(b == maxBatch, s"$src partial batch $b not last") }
    }
    // the report's arithmetic is n·max − Σ, and the length-sorted layout
    // wastes strictly less padding than batching in arrival (id) order
    val report = Packing.paddingReport(batched, "source", "t")
    val brute = batched.as[(String, Long, Long, Long)].collect()
      .groupBy { case (s, _, _, b) => (s, b) }
      .map { case ((s, b), g) =>
        (s, b, g.length.toLong, g.map(_._3).max, g.map(_._3).sum) }
    val gotRep = report.select("source", "batch", "n_docs", "max_tok", "sum_tok", "pad_waste")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(gotRep.map { case (s, b, n, m, sm, _) => (s, b, n, m, sm) }.toSet == brute.toSet)
    assert(gotRep.forall { case (_, _, n, m, sm, w) => w == n * m - sm && w >= 0 })
    val sortedWaste = gotRep.map(_._6).sum
    val arrivalWaste = Packing.paddingReport(
      toks.withColumn("batch",
        expr("(row_number() over (partition by source order by doc_id) - 1L) div 16L")),
      "source", "t").agg(sum("pad_waste")).as[Long].head()
    assert(sortedWaste < arrivalWaste,
      s"length-sorted padding $sortedWaste must beat arrival-order $arrivalWaste")
    // partitioning invariance of the batch assignment
    val again = Packing.lengthBatches(toks.repartition(13), "source", "doc_id", "t", 16)
      .select("doc_id", "batch").as[(Long, Long)].collect().toMap
    assert(again == batched.select("doc_id", "batch").as[(Long, Long)].collect().toMap)
    // null tokens sort last and pad as zero
    val withNull = Seq(("s", 1L, Some(5L)), ("s", 2L, None), ("s", 3L, Some(9L)))
      .toDF("source", "doc_id", "t")
    val nb = Packing.lengthBatches(withNull, "source", "doc_id", "t", 2)
      .select("doc_id", "batch").as[(Long, Long)].collect().toMap
    assert(nb == Map(3L -> 0L, 1L -> 0L, 2L -> 1L), s"null-token row must batch last: $nb")
    val nrep = Packing.paddingReport(
      Packing.lengthBatches(withNull, "source", "doc_id", "t", 2), "source", "t")
      .select("batch", "max_tok", "pad_waste").as[(Long, Long, Long)].collect()
      .map { case (b, m, w) => b -> ((m, w)) }.toMap
    assert(nrep(1L) == ((0L, 0L)), "null token counts zero toward padding")
  }

  test("sequentialBins equals the Scala running-total fold") {
    val toks = docs
      .select(col("source"), col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("t"))
    val got = Packing.sequentialBins(toks, "source", "doc_id", "t", 512)
      .select("source", "doc_id", "bin").as[(String, Long, Long)].collect()
      .map { case (s, id, b) => (s, id) -> b }.toMap
    val expected = toks.as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .flatMap { case (src, rows) =>
        var acc = 0L
        rows.sortBy(_._2).toSeq.map { case (_, id, t) =>
          val bin = acc / 512; acc += t; (src, id) -> bin
        }
      }
    assert(got == expected)
  }

  test("assembleBins: blobs are id-ordered and identical under any partitioning") {
    val toks = docs.select(col("source"), col("doc_id"), col("text"),
      TextOps.tokenCount(col("text")).cast("long").as("t"))
    val binned = Packing.sequentialBins(toks, "source", "doc_id", "t", 512)
    def blobs(df: org.apache.spark.sql.DataFrame) =
      Packing.assembleBins(df, "source", "doc_id", "text", "t")
        .select(col("source"), col("bin"), md5(col("text")).as("m"))
        .as[(String, Long, String)].collect().toSet
    val a = blobs(binned)
    val b = blobs(binned.repartition(17))
    assert(a == b, "collect_list order must not leak into the assembled blob")
    // blob content = docs joined in id order
    val one = Packing.assembleBins(binned.filter(col("source") === "src0"),
      "source", "doc_id", "text", "t")
      .filter(col("bin") === 0).select("text").as[String].head()
    val expected = binned.filter(col("source") === "src0" && col("bin") === 0)
      .orderBy("doc_id").select("text").as[String].collect().mkString("\n\n")
    assert(one == expected)
  }

  test("greedyPack: bins respect the budget, oversize docs isolate, count near optimal") {
    val toks = docs
      .select(col("source"), col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("t"))
    val packed = Packing.greedyPack(toks, "source", "doc_id", "t", 512)
    val bins = packed.groupBy("source", "bin")
      .agg(sum("t").as("s"), count(lit(1)).as("n"), max("t").as("mx"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(bins.forall { case (_, _, s, n, _) => s <= 512 || n == 1 },
      "only single-oversize-doc bins may exceed the budget")
    // FFD can't use more than twice the fractional lower bound (loose check)
    val bySrc = packed.groupBy("source")
      .agg(sum("t").as("tot"), (max("bin") + 1).as("nbins"))
      .as[(String, Long, Long)].collect()
    assert(bySrc.forall { case (_, tot, nb) => nb <= 2 * (tot / 512 + 1) })
    // determinism
    val again = Packing.greedyPack(toks.repartition(11), "source", "doc_id", "t", 512)
      .select("source", "doc_id", "bin").as[(String, Long, Long)].collect().toSet
    assert(again == packed.select("source", "doc_id", "bin")
      .as[(String, Long, Long)].collect().toSet)
  }

  test("exceptContentOf is exact at any fpp (bloom false positives confirmed away)") {
    val ref = docs.filter(col("source") === "src0").select(col("text"))
    val expected = docs
      .join(docs.filter(col("source") === "src0").select(md5(col("text")).as("__r")),
        md5(col("text")) === col("__r"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Dedup.exceptContentOf(docs, "text", ref, "text", fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == expected, s"fpp=$fpp must not change the (exact) result")
    }
    assert(expected.nonEmpty && expected.size < docs.count())
  }

  test("exceptContentOf: ref nulls can't eat cap slots; corpus nulls survive") {
    val base = docs.limit(20).select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      Seq((-1L, null.asInstanceOf[String]), (-2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val ref = base.limit(5).select(col("text")).unionByName(
      Seq(null.asInstanceOf[String], null.asInstanceOf[String]).toDF("text"))
    val expected = corpus
      .join(base.limit(5).select(md5(col("text")).as("__r")).distinct(),
        md5(col("text")) === col("__r"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val got = Dedup.exceptContentOf(corpus, "text", ref, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == expected)
    // md5(null) is null and matches nothing: the null-content corpus rows stay
    assert(got.contains(-1L) && got.contains(-2L))
  }

  test("greedyPack rejects floating/binary stream keys (sort-equality contract)") {
    val df = Seq((0.0, 1L, 10L), (-0.0, 2L, 10L)).toDF("stream", "doc_id", "t")
    val e = intercept[IllegalArgumentException] {
      Packing.greedyPack(df, "stream", "doc_id", "t", 512)
    }
    assert(e.getMessage.contains("streamCol"))
    val b = Seq((Array[Byte](1), 1L, 10L)).toDF("stream", "doc_id", "t")
    intercept[IllegalArgumentException] {
      Packing.greedyPack(b, "stream", "doc_id", "t", 512)
    }
  }

  test("property: topFractionPerGroup keeps exactly ceil(frac·n) per group for arbitrary fracs") {
    import org.scalacheck.{Gen, Prop}
    // one Spark job per case is slow; a handful of arbitrary fracs over a
    // fixed skewed frame still pins the exact-count contract
    val sizes = Map("a" -> 37, "b" -> 4, "c" -> 211)
    val rows = sizes.toSeq.flatMap { case (g, n) =>
      (1 to n).map(i => (s"$g$i".hashCode.toLong, g, (i % 7).toDouble))
    }
    val df = rows.toDF("doc_id", "grp", "sc")
    val prop = Prop.forAll(Gen.chooseNum(0.001, 1.0)) { frac =>
      val per = Sampling.topFractionPerGroup(df, "grp", col("sc"), "doc_id", frac)
        .groupBy("grp").count().as[(String, Long)].collect().toMap
      sizes.forall { case (g, n) => per.getOrElse(g, 0L) == math.ceil(frac * n).toLong }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: temperatureRates are valid probabilities and the token budget is honored") {
    import org.scalacheck.{Gen, Prop}
    val genGroups = Gen.nonEmptyListOf(Gen.chooseNum(1L, 100000L)).map(_.take(8))
    val prop = Prop.forAll(genGroups, Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.05, 1.0)) {
      (toks, alpha, tf) =>
        val df = toks.zipWithIndex
          .map { case (t, i) => (i.toLong, s"g$i", t) }.toDF("doc_id", "source", "n_tok")
        val rates = Sampling.temperatureRates(df, "source", "n_tok", alpha, tf)
          .as[(String, Double)].collect().toMap
        val total = toks.sum.toDouble
        val byG = toks.zipWithIndex.map { case (t, i) => s"g$i" -> t }.toMap
        // every rate is a probability, and expected kept tokens never
        // exceed the target budget (the min(1,·) cap only LOWERS the sum)
        val valid = rates.values.forall(r => r >= 0.0 && r <= 1.0)
        val kept = rates.map { case (g, r) => byG(g) * r }.sum
        valid && kept <= tf * total * (1 + 1e-9)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: fractionThreshold is monotone with exact endpoints") {
    import org.scalacheck.{Gen, Prop}
    val genF = Gen.chooseNum(0.0, 1.0)
    val prop = Prop.forAll(genF, genF) { (f1, f2) =>
      val (lo, hi) = (math.min(f1, f2), math.max(f1, f2))
      Sampling.fractionThreshold(lo) <= Sampling.fractionThreshold(hi)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
    assert(Sampling.fractionThreshold(0.0) == "00000000", "f=0 admits nothing")
    assert(Sampling.fractionThreshold(1.0) == "g", "f=1 admits every hex string")
  }

  test("property: splitColumn totally partitions for arbitrary positive weights") {
    import org.scalacheck.{Gen, Prop}
    val genSplits = for {
      n <- Gen.chooseNum(1, 5)
      ws <- Gen.listOfN(n, Gen.chooseNum(0.05, 10.0))
    } yield ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
    val ids = (0L until 200L).toDF("id")
    val prop = Prop.forAllNoShrink(genSplits) { splits =>
      val labels = ids.select(Sampling.splitColumn(col("id"), splits).as("s"))
        .as[String].collect()
      labels.length == 200 && labels.toSet.subsetOf(splits.map(_._1).toSet)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: greedyPack is valid for arbitrary token distributions") {
    import org.scalacheck.{Gen, Prop}
    val genRows = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1200L))
    val prop = Prop.forAllNoShrink(genRows) { toks =>
      val df = toks.zipWithIndex.map { case (t, i) => ("s", i.toLong, t) }.toDF("k", "id", "t")
      val packed = Packing.greedyPack(df, "k", "id", "t", 512)
        .select("id", "t", "bin").as[(Long, Long, Long)].collect()
      val byBin = packed.groupBy(_._3)
      // capacity invariant: an oversize doc consumes exactly one bin's
      // budget (zero-token docs may legally share it, adding nothing)
      packed.length == toks.length &&
        byBin.values.forall(rows => rows.map(r => math.min(r._2, 512L)).sum <= 512)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("epochRepeat: exact copy counts, both regimes, partitioning-invariant") {
    val weights = Map("src0" -> 50L, "src1" -> 30L, "src2" -> 15L, "src3" -> 5L)
    val budget = 20000L // src0 repeats multiple epochs; src3 downsamples
    val df = docs.select(
      col("doc_id"), col("source"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
    val out = Sampling.epochRepeat(df, "doc_id", "source", col("n_tok"), weights, budget)
      .select("source", "doc_id", "n_tok", "epoch")
    val rows = out.as[(String, Long, Long, Int)].collect()

    // only weighted groups appear; epochs are 1-based and contiguous per doc
    assert(rows.map(_._1).toSet.subsetOf(weights.keySet))
    val byDoc = rows.groupBy(r => (r._1, r._2))
    assert(byDoc.values.forall(c => c.map(_._4).sorted.toSeq == (1 to c.size)))

    // exact Scala replay of the copy-count arithmetic (long div + one IEEE
    // division + the salted-hash draw) for EVERY input doc
    val totals = df.filter(col("source").isin(weights.keySet.toSeq: _*))
      .groupBy("source").agg(sum("n_tok").as("t")).as[(String, Long)].collect().toMap
    val wSum = weights.values.sum
    def md5hex8(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 8)
    }
    def expectedCopies(src: String, id: Long): Long = {
      val num = weights(src) * budget
      val den = totals(src) * wSum
      val frac = (num % den).toDouble / den.toDouble
      val thresh = "%08x".format(
        math.min(math.floor(frac * 4294967296.0).toLong, 4294967295L))
      num / den + (if (md5hex8("epoch" + id) < thresh) 1L else 0L)
    }
    val inputDocs = df.filter(col("source").isin(weights.keySet.toSeq: _*))
      .select("source", "doc_id").as[(String, Long)].collect()
    inputDocs.foreach { case (src, id) =>
      val got = byDoc.get((src, id)).map(_.length.toLong).getOrElse(0L)
      assert(got == expectedCopies(src, id), s"copies for ($src,$id)")
    }
    // both regimes exercised on this fixture: src0 upsamples, src3 keeps < 1×
    assert(rows.count(_._1 == "src0") > inputDocs.count(_._1 == "src0"))
    assert(rows.count(_._1 == "src3") < inputDocs.count(_._1 == "src3"))
    // materialized token mass lands near each group's budget share
    weights.foreach { case (src, w) =>
      val target = budget.toDouble * w / wSum
      val got = rows.filter(_._1 == src).map(_._3).sum.toDouble
      // 25 docs/group at sf0.001: the fractional draw's variance dominates
      assert(math.abs(got - target) / target < 0.35, s"$src tokens $got vs target $target")
    }
    // deterministic and partitioning-invariant
    val again = Sampling
      .epochRepeat(df.repartition(13), "doc_id", "source", col("n_tok"), weights, budget)
      .select("source", "doc_id", "n_tok", "epoch")
      .as[(String, Long, Long, Int)].collect()
    assert(again.sorted.toSeq == rows.sorted.toSeq)
  }

  test("epochRepeat: null/unweighted groups drop; empty and zero-token groups contribute nothing") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "b", 10L),
      (4L, null.asInstanceOf[String], 10L), (5L, "z", 0L))
      .toDF("id", "g", "tok")
    val out = Sampling.epochRepeat(
      df, "id", "g", col("tok"), Map("a" -> 1L, "z" -> 1L), budgetTokens = 100L)
      .select("id", "g", "epoch").as[(Long, String, Int)].collect()
    // b unweighted, null group, z zero-token: all gone; a repeats 100·(1/2)/20 = 2.5×
    assert(out.map(_._2).toSet == Set("a"))
    val perDoc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(Set(1L, 2L).subsetOf(perDoc.keySet))
    assert(perDoc.values.forall(n => n == 2 || n == 3), s"expected 2-3 copies, got $perDoc")
  }

  test("budgetFill: strict prefix per group, ceilings hold, absent groups drop") {
    val df = Seq(
      // group a, quota 10: scores 9,8,7 with costs 4,4,4 → rows 1,2 fill
      // 8; row 3 would reach 12 > 10 → cut (strict prefix: later cheaper
      // rows stay out too because the running sum already passed)
      ("a", 1L, 9L, 4L), ("a", 2L, 8L, 4L), ("a", 3L, 7L, 4L),
      ("a", 4L, 6L, 1L), // cum 13 — still out despite fitting 10-8
      // group b, quota 5: exact fill at the boundary is admitted
      ("b", 5L, 9L, 3L), ("b", 6L, 8L, 2L), ("b", 7L, 7L, 1L),
      // group c: absent from the recipe
      ("c", 8L, 9L, 1L)
    ).toDF("g", "id", "sc", "cost")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.budgetFill(d, "g", col("cost"), col("sc"), "id",
        Seq("a" -> 10L, "b" -> 5L))
        .select(col("id"), col("cum_cost")).as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
    val out = run(df)
    assert(out == Seq((1L, 4L), (2L, 8L), (5L, 3L), (6L, 5L)))
    assert(run(df.repartition(7)) == out, "partitioning-invariant")
    // score ties broken by id: equal scores admit the smaller id first
    val tie = Seq(("a", 2L, 5L, 3L), ("a", 1L, 5L, 3L)).toDF("g", "id", "sc", "cost")
    assert(Sampling.budgetFill(tie, "g", col("cost"), col("sc"), "id",
      Seq("a" -> 3L)).select("id").as[Long].collect().toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      Sampling.budgetFill(df, "g", col("cost"), col("sc"), "id", Seq.empty)
    }
  }

  test("redactPii on adversarial strings") {
    val cases = Seq(
      "mail bob.smith@example.com now" -> "mail <EMAIL> now",
      "ip 10.0.0.5 end" -> "ip <IP> end",
      "tel +1 415-555-1234." -> "tel <PHONE>.",
      "no pii here" -> "no pii here",
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(TextOps.redactPii(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("dsirSelect: target-like docs enrich to the top; deterministic under partitioning") {
    // target exemplars speak "qqq www"; raw background speaks "aaa bbb".
    // candidate docs: 5 target-flavored, 5 background-flavored — the
    // likelihood-ratio score must rank every target-flavored doc first
    val docs =
      (1L to 5L).map(i => (i, "qqq www qqq www qqq", true)) ++      // exemplars
        (11L to 15L).map(i => (i, "qqq www qqq www", false)) ++     // target-like
        (21L to 25L).map(i => (i, "aaa bbb aaa bbb", false))        // background
    val df = docs.toDF("id", "text", "is_tgt")
    val out = Sampling.dsirSelect(df, "id", "text", col("is_tgt"),
      buckets = 64, topK = 10)
      .select("id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    val topTen = out.map(_._1).toSeq
    // the 5 exemplars and the 5 target-like docs outrank all background
    assert(topTen.toSet == ((1L to 5L) ++ (11L to 15L)).toSet, topTen.toString)
    // partitioning invariance: identical scores and ranks
    val out2 = Sampling.dsirSelect(df.repartition(7), "id", "text",
      col("is_tgt"), buckets = 64, topK = 10)
      .select("id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq == out2.toSeq)
    // null text is inert; guards fire
    val withNull = df.union(Seq((99L, null: String, false)).toDF("id", "text", "is_tgt"))
    assert(!Sampling.dsirSelect(withNull, "id", "text", col("is_tgt"), 64, 20)
      .select("id").as[Long].collect().contains(99L))
    intercept[IllegalArgumentException](
      Sampling.dsirSelect(df, "id", "text", col("is_tgt"), buckets = 1))
    intercept[IllegalArgumentException](
      Sampling.dsirSelect(df, "id", "text", col("is_tgt"), topK = 0))
  }
}
