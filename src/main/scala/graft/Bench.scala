package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // iteration aid: regex over query names to bench a subset (full run when unset)
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").filter(_.nonEmpty).map(_.r)
    // one UNTIMED run per query before the timed ones: in small filtered
    // runs the first slots otherwise absorb the JIT/codegen warmup the
    // full bench amortizes across its alphabet (measured: dedup_minhash
    // 19.4/9.2/7.8 s in a cold 14-query subset vs 0.68 s in-bench)
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "0") == "1"
    // where the full per-query JSON lands (overridable so the isolated
    // child JVMs below never clobber the parent's record)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    // set in child JVMs: disables recursive attribution
    val isChild = sys.env.contains("SPARK_GRAFT_BENCH_ISOLATED")
    // Per-QUERY GC defaults ON — this is query isolation, not tuning:
    // ContextCleaner frees shuffle files / broadcasts / RDD blocks only
    // after their weak refs are GC'd, so in a shared JVM running 60+
    // queries the cleanup debt of the allocation-heavy family lands as one
    // multi-second pause on whichever query triggers the first major
    // collection (r3: difference_set 6.97 s median with a 16.9 s outlier
    // run, exonerated in a fresh JVM). The collection runs in the UNTIMED
    // gap AFTER a query's runs: debt never accumulates past one query, and
    // only the next query's FIRST run sees post-full-GC state (cold code
    // cache), which median-of-3 discards — A/B measured: per-RUN GC taxed
    // every run ~11% (views worst), per-QUERY GC keeps nogc-level medians
    // with the outlier pathology gone.
    val doGc = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "1") == "1"
    // Shuffle partitions default to the core count; the override exists for
    // the SCALE.md scaled-partitions experiments (r11 found two sf3 time
    // exponents >1 under a FIXED 16-partition harness while logical work
    // measured linear — the hypothesis is per-partition volume growth, and
    // testing it needs partitions to scale with data while cores stay put,
    // exactly as a real cluster would get 3x the reducers at 3x the data).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // AQE coalescing by TARGET SIZE, not parallelism-first (the setting
      // Spark's own tuning guide recommends for production): delta-sized
      // engine shuffles collapse to one reduce task instead of 32 tiny
      // ones, and at cluster scale the 64 MB advisory target still yields
      // full parallelism on real data volumes.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      // same extension surface as library users (SQL registry + as-of rule)
      .withExtensions(new graft.functions.GraftFunctions.GraftExtensions)
      .getOrCreate()
    System.err.println("[bench] GraftExtensions active")
    spark.sparkContext.setLogLevel("WARN")
    // session release intentionally unpersists locally-checkpointed engine
    // state; Spark warns per RDD — noise at 50+ queries × 3 runs
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
    // untimed warmup: JVM/JIT, session state, filesystem metadata — otherwise
    // the alphabetically-first query absorbs several seconds of startup
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    graft.queries.ParityQueries.releaseSessions()
    // CALIBRATION slot (VERDICT r10 item 1): a fixed registry-independent
    // CPU-bound probe timed before the queries. Round 10's diffuse 11%
    // "drift" (245 -> 272 s on 376 common slots) was invisible to the
    // >1.5x per-slot flag by design, and a back-to-back idle-machine
    // replay of both commits exonerated the code (r10 was 3% FASTER).
    // This number makes the machine's speed part of every record: uniform
    // drift with a matching calibration shift is environment; uniform
    // drift on a steady calibration is code — no replay needed next time.
    val calibration: Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 200000000L, 1L, cpus.toInt)
          .selectExpr("sum(id % 7 + id / 3)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // untimed JIT pass
      Seq(once(), once(), once()).sorted.apply(1)
    }
    System.err.println(f"[bench] calibration slot med $calibration%.3f s")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filter.forall(_.findFirstIn(name).nonEmpty) }
      .map { case (name, fn) =>
      // median-of-N: a single shared-JVM run is GC/page-cache noise — r2 saw
      // 2.7× swings on untouched queries. Engine storage is released between
      // runs so one query's checkpoints never pressure the next.
      // (the warm-base session is deliberately NOT released between runs
      // or queries: its six stabilized base tables are the amortized
      // build-once state the read-only parity queries measure against —
      // a bounded, cached, never-growing footprint, unlike the per-query
      // sessions whose checkpoints would otherwise accumulate)
      // Plan-as-written consumption is the DEFAULT as of round 12
      // (toRdd.count() — no column pruning from the consumer), closing
      // the r11 honesty finding: plain .count() lets Catalyst prune
      // output-only expensive columns (source_minhash measured 0.47 s
      // counted vs ~11 s as written). The full registry was re-baselined
      // under these semantics in r12 (BENCH_LOCAL.json; CHANGELOG note —
      // per-slot history restarts at r12). SPARK_GRAFT_BENCH_CONSUME=count
      // keeps the legacy consumer for comparisons against pre-r12 records.
      def consume(df: org.apache.spark.sql.DataFrame): Long =
        if (sys.env.get("SPARK_GRAFT_BENCH_CONSUME").contains("count"))
          df.count()
        else df.queryExecution.toRdd.count()
      if (warmup) {
        try { consume(fn(spark, sfDir)) } catch { case _: Throwable => () }
        graft.queries.ParityQueries.releaseSessions()
        graft.ops.Linkage.releaseShared()
      }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = try { consume(fn(spark, sfDir)) } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.queries.ParityQueries.releaseSessions()
        graft.ops.Linkage.releaseShared()
        (dt, n)
      }
      // Per-QUERY release of the shared basket checkpoint (r14, VERDICT r13
      // §wrong 6): memoizing it across QUERIES let basket_lift/cosine/rules
      // amortize basket_pairs' build — each slot now pays its own build in
      // run 1 (median-of-3 still reports the steady warm state, the same
      // discipline as the parity warm base). Within-query runs still share,
      // like Linkage's postings do between releases.
      graft.queries.RelationalQueries.releaseShared()
      if (doGc) {
        // ContextCleaner retires shuffle files/broadcasts ASYNCHRONOUSLY
        // after a GC clears their weak refs — without a drain window the
        // cleaner's backlog lands inside the NEXT query's timed runs
        // (r6: project_map 5.18 s in-bench vs 2.44 s isolated, attribution
        // in SCALE.md). GC twice with drain gaps: the first collection
        // ENQUEUES the weak refs and the cleaner drains them; the second
        // collects what the cleaner just freed — a single GC leaves the
        // late-alphabet queries (the view family) inheriting the backlog.
        System.gc(); Thread.sleep(150)
        System.gc(); Thread.sleep(150)
      }
      val med = times.map(_._1).sorted.apply(times.size / 2)
      System.err.println(
        f"[bench] $name%-22s med $med%8.2f s  (${times.map(t => f"${t._1}%.2f").mkString("/")};" +
          s" ${times.last._2} rows)")
      name -> med
    }.toMap
    // Self-attribution (VERDICT r9 item 3), DRIFT-AWARE as of round 13
    // (VERDICT r12 item 1): the shared JVM couples slots through GC debt,
    // code-cache state and ContextCleaner backlog, and the whole BOX can
    // run slow (the r12 driver ran ~1.3x across the board: 70 slots read
    // >1.5x and the flat top-6 cap silently dropped ~60 of them). The
    // bench already measures the run-level signal — the calibration slot —
    // so use it: when the median per-slot ratio agrees with the
    // calibration ratio, the drift is ENVIRONMENTAL and per-slot flags are
    // judged against the median-normalized baseline (a steady calibration
    // under a drifted median keeps norm = 1: uniform code slowdowns still
    // flag). Residual outliers re-run in an ISOLATED child JVM (warmup +
    // median-of-3); every flagged slot that was NOT isolated (budget cap,
    // spawn failure) is listed in the record — zero silent drops.
    val att: Attribution =
      if (isChild || filter.nonEmpty)
        Attribution(None, normalized = false, Seq.empty, Seq.empty)
      else attribution(results, latestRoundRecord(), calibration)
    att.runDrift.foreach { case (c, m) =>
      System.err.println(
        f"[bench] run drift: calibration ratio $c%.2fx, median slot ratio $m%.2fx" +
          (if (att.normalized) " — environmental, flags normalized" else ""))
    }
    // ADAPTIVE isolation (r14, VERDICT r13 item 3): drain the WHOLE flagged
    // list, worst first, until a wall-clock cap — a noisy box can flag
    // dozens of slots, and a flat top-6 budget left 32 of them unexonerated
    // in the r13 record, making the raw total uninterpretable. Slots the
    // cap cuts off are still listed (zero silent drops).
    val isoCapSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ISO_CAP_SEC", "1800").toLong
    val isoDeadline = System.nanoTime() + isoCapSec * 1000000000L
    val isolated: Map[String, Double] =
      att.toIsolate.flatMap { name =>
        if (System.nanoTime() >= isoDeadline) None
        else {
          System.err.println(
            s"[bench] $name moved >1.5x vs previous round (drift-normalized); re-running isolated")
          isolatedMedian(name, sfDir, cpus)
            .map { m => System.err.println(f"[bench] $name isolated med $m%8.2f s"); name -> m }
        }
      }.toMap
    val flaggedNotIsolated = att.flagged.filterNot(isolated.contains)
    if (flaggedNotIsolated.nonEmpty)
      System.err.println(
        s"[bench] flagged but not isolated (recorded): ${flaggedNotIsolated.mkString(", ")}")
    // 3-decimal slot values (r14, VERDICT r13 item 2c): the driver stores a
    // ~2000-char stdout tail, and 9-significant-digit slot values truncated
    // the 423-slot map mid-line; at 3 decimals (ms precision — medians are
    // seconds) roughly twice as many slots survive the tail.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val iso =
      if (isolated.isEmpty) ""
      else isolated.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString(""","isolated":{""", ",", "}")
    val drift = att.runDrift.fold("") { case (c, m) =>
      s""","run_drift":{"calibration_ratio":$c,"median_slot_ratio":$m,""" +
        s""""normalized":${att.normalized}}"""
    }
    val notIso =
      if (flaggedNotIsolated.isEmpty) ""
      else flaggedNotIsolated.map("\"" + _ + "\"")
        .mkString(""","flagged_not_isolated":[""", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Exonerated total ALONGSIDE (never instead of) the raw sum (r14,
    // VERDICT r13 item 3): isolated re-run medians substituted for the
    // contended in-bench values — the number a noisy box's record should
    // be read by, with the raw sum still the contract value.
    val exonerated =
      if (isolated.isEmpty) total
      else results.map { case (k, v) => isolated.getOrElse(k, v) }.sum
    val exo =
      if (isolated.isEmpty) ""
      else s""","exonerated_total":${fmt(exonerated)}"""
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","calibration_sec":$calibration$exo,""" +
        s""""queries":$qs$iso$drift$notIso,"sf":"$sfDir"}"""
    // The full JSON goes to BOTH stdout and a stable file: six rounds of
    // driver-side "parsed": null proved sbt wraps/appends around the stdout
    // line ([success] trailer, tail truncation mid-JSON), so the per-query
    // map must survive somewhere tooling can always read it.
    println(fullJson)
    val out = java.nio.file.Paths.get(outPath)
    java.nio.file.Files.write(out, fullJson.getBytes("UTF-8"))
    // Short total-only line LAST: small enough that neither sbt's trailer
    // nor a stored-tail truncation can corrupt a last-JSON-line parse.
    // calibration_sec rides here too (VERDICT r12 item 4): the driver
    // stores only a truncated stdout tail, and a total without the box-
    // health number next to it is not comparable across rounds.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","calibration_sec":$calibration$exo,""" +
        s""""sf":"$sfDir","detail":"$outPath"}""")
    graft.queries.ParityQueries.releaseWarm()
    graft.queries.RelationalQueries.releaseShared()
    spark.stop()
  }

  /** The attribution pass's decision, separated from its side effects so
    * the drift logic is spec-testable:
    *  - `runDrift`: `(calibration_ratio, median_slot_ratio)` vs the
    *    previous record, when both are computable;
    *  - `normalized`: the two ratios AGREE (within 25%), so the drift is
    *    environmental and per-slot flags were judged against the
    *    median-normalized baseline;
    *  - `flagged`: EVERY slot whose (normalized) median moved >1.5x,
    *    worst first — the record lists any of these that skip isolation;
    *  - `toIsolate`: the whole flagged list (r14: the flat top-6 budget
    *    left 32 slots unexonerated in the r13 record — the RUNNER now
    *    drains worst-first under a wall-clock cap instead).
    */
  private[graft] final case class Attribution(
      runDrift: Option[(Double, Double)],
      normalized: Boolean,
      flagged: Seq[String],
      toIsolate: Seq[String])

  /** Drift-aware flagging (VERDICT r12 item 1). The median per-slot ratio
    * is the run-level movement of the whole registry; the calibration
    * ratio is the box's CPU speed vs the previous record's box. When they
    * agree, the movement is environmental — flags are then measured
    * against `median · prev` so the isolation budget is spent only on
    * residual outliers, and a 1.3x-slow box no longer floods the flag
    * list. When calibration is steady but the median moved (a uniform
    * CODE slowdown), nothing is normalized and every mover flags, exactly
    * as before. The 0.5 s absolute floor keeps sub-second jitter out.
    */
  private[graft] def attribution(
      results: Map[String, Double],
      prev: Map[String, Double],
      calibration: Double): Attribution = {
    val ratios = results.toSeq.flatMap { case (n, m) =>
      prev.get(n).collect { case p if p > 0 => m / p }
    }
    val medianRatio =
      if (ratios.isEmpty) None else Some(ratios.sorted.apply(ratios.size / 2))
    val calRatio = prev.get("calibration_sec").filter(_ > 0).map(calibration / _)
    val runDrift = for { c <- calRatio; m <- medianRatio } yield (c, m)
    val normalized = runDrift.exists { case (c, m) => math.abs(m - c) <= 0.25 * c }
    val norm = if (normalized) medianRatio.get else 1.0
    val flagged = results.toSeq
      .flatMap { case (n, m) =>
        prev.get(n).collect {
          case p if p > 0 && m > 1.5 * norm * p && m >= 0.5 => (n, m / (norm * p))
        }
      }
      .sortBy(-_._2).map(_._1)
    Attribution(runDrift, normalized, flagged, flagged)
  }

  /** Previous-round per-query medians the attribution pass compares
    * against: the newest `BENCH_r*.json` (the driver's per-round record)
    * overlaid by the git-committed `BENCH_LOCAL.json` where both carry a
    * slot. BENCH_LOCAL wins because it is COMPLETE (the bench writes the
    * full per-query map there every run) while the driver file stores
    * only a 2000-char truncated `tail` of stdout — round 11's 26.4 s
    * `pipeline_exact_dedup` driver slot went unexonerated precisely
    * because the old parser understood only the bench's own format and
    * returned an empty previous-round map for driver files. Empty when
    * neither record exists.
    */
  private[graft] def latestRoundRecord(): Map[String, Double] = {
    def readText(f: java.io.File): String =
      try new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      catch { case _: Throwable => "" }
    // queries + the record's own calibration slot: parseQueries scopes an
    // own-shape record to its "queries" block, so the box-health number —
    // which [[attribution]] needs for the run-level drift test — is
    // re-attached here from the record's top level
    def parseRecord(text: String): Map[String, Double] =
      parseQueries(text) ++
        """"calibration_sec"\s*:\s*([0-9]+(?:\.[0-9]+)?(?:[Ee][+-]?[0-9]+)?)""".r
          .findFirstMatchIn(text)
          .map(m => "calibration_sec" -> m.group(1).toDouble)
    val dir = new java.io.File(".")
    val driver = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("BENCH_r\\d+\\.json")).sortBy(_.getName)
      .lastOption.map(f => parseRecord(readText(f))).getOrElse(Map.empty)
    val local = {
      val f = new java.io.File("BENCH_LOCAL.json")
      if (f.isFile) parseRecord(readText(f)) else Map.empty[String, Double]
    }
    driver ++ local
  }

  /** Per-query `name → seconds` out of EITHER bench-record shape (no JSON
    * library on the runtime classpath — both shapes are machine-written,
    * so regexes are sound):
    *  - this object's own record: the `"queries":{"name":sec,…}` map;
    *  - the driver's per-round record: `{n, rc, cpus, sf, tail, parsed}`
    *    where `tail` is a truncated stdout fragment holding flat
    *    `\"name\":sec` pairs (quotes escaped because tail is a JSON
    *    string value; the leading pair is usually cut mid-number and is
    *    skipped by the name-anchored regex).
    * Non-query numeric keys a flat scan picks up (`n`, `rc`, `cpus`,
    * `sf`, `value`) are harmless: lookups are by registry query name —
    * except `calibration_sec`, which [[attribution]] deliberately reads
    * as the previous record's box-health number (it rides the short
    * total line as of r13, so even a driver-truncated tail carries it).
    */
  private[graft] def parseQueries(json: String): Map[String, Double] = {
    val pair = """\\?"([A-Za-z0-9_]+)\\?"\s*:\s*([0-9]+(?:\.[0-9]+)?(?:[Ee][+-]?[0-9]+)?)""".r
    val own = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json).map(_.group(1))
    val body = own.getOrElse(json)
    pair.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Median-of-3 (after one untimed warmup) of `name` in a FRESH child
    * JVM with the same classpath/classes — the isolation the manual
    * exoneration runs used, automated. None on spawn/parse failure or a
    * 15-minute timeout (attribution must never hang the bench).
    */
  private def isolatedMedian(name: String, sfDir: String, cpus: String): Option[Double] = {
    val outF = java.nio.file.Files.createTempFile(s"graft_iso_$name", ".json")
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(System.getProperty("java.home") + "/bin/java") ++ opens ++ Seq(
      "-Xmx16g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"), "graft.Bench")
    try {
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val env = pb.environment()
      env.put("SPARK_GRAFT_BENCH_ISOLATED", "1")
      env.put("SPARK_GRAFT_BENCH_FILTER", "^" + java.util.regex.Pattern.quote(name) + "$")
      env.put("SPARK_GRAFT_BENCH_RUNS", "3")
      env.put("SPARK_GRAFT_BENCH_WARMUP", "1")
      env.put("SPARK_GRAFT_BENCH_OUT", outF.toString)
      env.put("SPARK_GRAFT_SF_DIR", sfDir)
      env.put("SPARK_GRAFT_CPUS", cpus)
      val p = pb.start()
      if (!p.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)) {
        p.destroyForcibly(); return None
      }
      parseQueries(new String(java.nio.file.Files.readAllBytes(outF), "UTF-8")).get(name)
    } catch { case _: Throwable => None }
    finally { try java.nio.file.Files.deleteIfExists(outF) catch { case _: Throwable => () } }
  }
}
