package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("writeZOrdered: file stats skip on BOTH z columns; content survives") {
    val events = graft.tables.Tables.eventsDf(spark, "/root/testdata/sf0.01")
      .select("event_id", "user_id", "ts", "value")
    val zPath = tmp("zorder") + "/events_z"
    val sortedPath = tmp("zsorted") + "/events_s"
    Sources.writeZOrdered(events, zPath, Seq("user_id", "value"), numFiles = 32)
    // baseline: single-column sort — the layout z-order must beat on the
    // NON-leading column
    events.repartitionByRange(32, col("value")).sortWithinPartitions("value")
      .write.mode("overwrite").parquet(sortedPath)

    val conf = spark.sparkContext.hadoopConfiguration
    // files whose [min,max] stats for `column` cover the probe value — the
    // row groups a stats-pruning scan must read
    def covering(path: String, column: String, probe: Double): (Int, Int) = {
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      val files = fs.listStatus(dir).map(_.getPath).filter(_.getName.endsWith(".parquet"))
      var cover = 0
      files.foreach { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try {
          val covered = reader.getFooter.getBlocks.stream().anyMatch { rg =>
            val c = rg.getColumns.stream()
              .filter(_.getPath.toDotString == column).findFirst().get()
            val st = c.getStatistics
            def d(a: Any): Double = a match {
              case l: java.lang.Long => l.toDouble
              case x: java.lang.Double => x
              case x => x.toString.toDouble
            }
            d(st.genericGetMin()) <= probe && probe <= d(st.genericGetMax())
          }
          if (covered) cover += 1
        } finally reader.close()
      }
      (cover, files.length)
    }
    val uProbe = 75.0 // mid-range user_id (sf0.01: 0..149)
    val vProbe = 245.0 // mid-range value (sf0.01: ~0..490)
    val (zu, zn) = covering(zPath, "user_id", uProbe)
    val (zv, _) = covering(zPath, "value", vProbe)
    val (su, sn) = covering(sortedPath, "user_id", uProbe)
    assert(zn >= 16, s"expected ~32 z files, got $zn")
    // genuine 2-D clustering: BOTH columns skip more than half the files
    assert(zu * 2 < zn, s"user_id covers $zu/$zn z-ordered files — no skipping")
    assert(zv * 2 < zn, s"value covers $zv/$zn z-ordered files — no skipping")
    // the value-sorted baseline cannot skip on user_id (covers ~all files)
    assert(su * 2 >= sn, s"baseline unexpectedly skips user_id: $su/$sn")
    // layout changes nothing about content
    assert(
      spark.read.parquet(zPath).as[(Long, Long, java.sql.Timestamp, Double)]
        .collect().toSet ==
        events.as[(Long, Long, java.sql.Timestamp, Double)].collect().toSet)
  }

  test("writeZOrdered quantile cuts beat linear cuts on a skewed column") {
    // power-law column: 99% of rows land in [0, 100), a thin tail reaches
    // 10^9 — linear 16-bit buckets put ~all rows into bucket 0, so file
    // min/max stats on `skew` cannot skip; equal-frequency cuts spread the
    // dense region across the code space and skipping comes back
    val rows = (1L to 40000L).map { i =>
      val skew = if (i % 100 == 0) i * 50000.0 else (i % 9973).toDouble / 100.0
      (i, skew, (i % 500).toDouble)
    }.toDF("id", "skew", "other")
    val linPath = tmp("zlin") + "/t"
    val qPath = tmp("zq") + "/t"
    Sources.writeZOrdered(rows, linPath, Seq("skew", "other"), numFiles = 32)
    Sources.writeZOrdered(rows, qPath, Seq("skew", "other"), numFiles = 32, quantileCuts = true)
    val conf = spark.sparkContext.hadoopConfiguration
    def covering(path: String, column: String, probe: Double): (Int, Int) = {
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      val files = fs.listStatus(dir).map(_.getPath).filter(_.getName.endsWith(".parquet"))
      var cover = 0
      files.foreach { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try {
          val covered = reader.getFooter.getBlocks.stream().anyMatch { rg =>
            val c = rg.getColumns.stream()
              .filter(_.getPath.toDotString == column).findFirst().get()
            val st = c.getStatistics
            def d(a: Any): Double = a.toString.toDouble
            d(st.genericGetMin()) <= probe && probe <= d(st.genericGetMax())
          }
          if (covered) cover += 1
        } finally reader.close()
      }
      (cover, files.length)
    }
    val probe = 42.0 // inside the dense region
    val (linCover, linN) = covering(linPath, "skew", probe)
    val (qCover, qN) = covering(qPath, "skew", probe)
    // linear cuts collapse the dense region into one code: ~no skipping
    assert(linCover * 2 >= linN, s"linear unexpectedly skipped: $linCover/$linN")
    // quantile cuts must skip more than half the files on the same probe
    assert(qCover * 2 < qN, s"quantile cuts cover $qCover/$qN — no skipping")
    // layout changes nothing about content
    assert(spark.read.parquet(qPath).as[(Long, Double, Double)].collect().toSet ==
      rows.as[(Long, Double, Double)].collect().toSet)
  }

  test("z-code bits stay below the long sign bit for every column count") {
    // 4 columns × 16 bits would place the top interleaved bit at position
    // 63 (the sign bit), flipping half the code space negative
    for (n <- 2 to 4; q <- Seq(false, true)) {
      val bits = Sources.bitsPerDim(n, q)
      assert(n * bits <= 63, s"n=$n quantile=$q: top bit ${n * bits - 1} >= 63")
    }
    assert(Sources.bitsPerDim(2, false) == 16)
    assert(Sources.bitsPerDim(4, false) == 15)
    // end-to-end: a 4-column z-write with corner values round-trips
    val corners = Seq(
      (0.0, 0.0, 0.0, 0.0),
      (1e9, 1e9, 1e9, 1e9),
      (0.0, 1e9, 0.0, 1e9)).toDF("a", "b", "c", "d")
    val p = tmp("z4") + "/t"
    Sources.writeZOrdered(corners, p, Seq("a", "b", "c", "d"), numFiles = 2)
    assert(spark.read.parquet(p).as[(Double, Double, Double, Double)].collect().toSet ==
      corners.as[(Double, Double, Double, Double)].collect().toSet)
  }

  test("writeZOrdered tolerates empty input and all-null z columns") {
    val emptyPath = tmp("zempty") + "/e"
    val empty = Seq.empty[(Long, Double)].toDF("a", "b")
    Sources.writeZOrdered(empty, emptyPath, Seq("a", "b"), numFiles = 2)
    assert(spark.read.parquet(emptyPath).count() == 0)
    val nullPath = tmp("znull") + "/n"
    val withNulls = Seq((1L, None: Option[Double]), (2L, None)).toDF("a", "b")
    Sources.writeZOrdered(withNulls, nullPath, Seq("a", "b"), numFiles = 2)
    assert(spark.read.parquet(nullPath).count() == 2)
  }

  test("csv and json round-trip with explicit schema") {
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val expected = df.as[(Int, String, Int)].collect().toSet

    val csvPath = tmp("csv") + "/nation"
    Sources.writeCsv(df, csvPath)
    val csvBack = Sources.readCsv(spark, csvPath, df.schema)
    assert(csvBack.as[(Int, String, Int)].collect().toSet == expected)

    val jsonPath = tmp("json") + "/nation"
    Sources.writeJson(df, jsonPath)
    val jsonBack = Sources.readJson(spark, jsonPath, df.schema)
    assert(jsonBack.as[(Int, String, Int)].collect().toSet == expected)
  }

  test("writeWithBloom: footers carry a bloom filter for the indexed column only") {
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey", "c_name")
    val path = tmp("bloom") + "/customer"
    Sources.writeWithBloom(df, path, Seq("c_custkey"), expectedDistinct = 10000)
    // inspect the actual parquet footers: the indexed column must carry a
    // bloom filter offset, the unindexed one must not
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dir).map(_.getPath).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val conf = spark.sparkContext.hadoopConfiguration
    var indexed = 0; var unindexed = 0
    files.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try reader.getFooter.getBlocks.forEach { rg =>
        rg.getColumns.forEach { c =>
          val hasBloom = c.getBloomFilterOffset >= 0
          if (c.getPath.toDotString == "c_custkey") { assert(hasBloom, s"$f"); indexed += 1 }
          else { assert(!hasBloom, s"$f unexpectedly indexed ${c.getPath}"); unindexed += 1 }
        }
      } finally reader.close()
    }
    assert(indexed > 0 && unindexed > 0)
    // and the data still round-trips
    assert(spark.read.parquet(path).count() == df.count())
  }

  test("orc round-trip with predicate pushdown reaching the scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal")
    val path = tmp("orc") + "/customer"
    Sources.writeOrc(df, path)
    val back = Sources.readOrc(spark, path)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      df.as[(Long, String, Double)].collect().toSet)
    // the same pushdown/pruning contract as parquet
    val plan = back.filter(col("c_acctbal") > 5000.0).select("c_custkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,5000.0)]"),
      plan)
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_acctbal:double>"),
      "column pruning must reach the ORC scan")
  }

  test("partitioned write enables partition pruning") {
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val path = tmp("part") + "/customer"
    Sources.writePartitioned(df, path, Seq("c_mktsegment"))
    val pruned = spark.read.parquet(path).filter(col("c_mktsegment") === "BUILDING")
    val plan = pruned.queryExecution.executedPlan.toString
    // pruning shows up as a PartitionFilters entry on the scan
    assert(plan.contains("PartitionFilters") && plan.contains("c_mktsegment"))
    assert(pruned.count() ==
      df.filter(col("c_mktsegment") === "BUILDING").count())
  }

  test("bucketed tables join without a shuffle") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Sources.writeBucketed(o, "b_orders", "o_orderkey", 4)
    Sources.writeBucketed(l, "b_lineitem", "l_orderkey", 4)
    // disable broadcast so the join must pick sort-merge: bucketing then
    // means NO shuffle exchange on either side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == l.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compactParquet merges small files to the byte target without losing rows") {
    val src = tmp("frag") + "/docs"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(40).write.parquet(src) // simulate micro-batch fragmentation
    def parquetFiles(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src).size == 40)
    val out = tmp("compact") + "/docs"
    val totalBytes = parquetFiles(src).map(_.length).sum
    val target = totalBytes / 4 // force ~4-6 output files
    // no-shuffle contract: compaction runs on its own isolated session, so
    // assert on what actually EXECUTED — a context-wide listener summing
    // shuffle bytes over the jobs the call runs (a plan probe on the caller
    // session would keep passing even if compaction grew a shuffle)
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten +
            sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val n =
      try {
        val n = Sources.compactParquet(spark, src, out, target)
        org.apache.spark.sql.GraftColumnBridge.flushListenerBus(spark, 30000)
        n
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(shuffled.get() == 0L, s"compaction shuffled ${shuffled.get()} bytes")
    assert(parquetFiles(out).size == n && n >= 4 && n <= 6, s"wrote $n files")
    assert(spark.read.parquet(out).as[(Long, String, String, String, Long)].collect().toSet ==
      docs.as[(Long, String, String, String, Long)].collect().toSet)
  }

  test("writeTokenShards: one file per shard dir, token totals bounded by budget + overhang") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), col("doc_id"), col("text"),
        graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
    val budget = 256L
    graft.sources.Sources.writeTokenShards(
      src, "source", "doc_id", "text", "n_tok", budget, out)
    // layout: every shard directory holds exactly ONE parquet file
    val shardDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles().filter(_.isDirectory))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: ${parts.length} files — a reader maps one shard to one file")
    }
    // budget invariant: a shard exceeds the budget only by its last doc's
    // overhang (sequential binning never splits a document)
    val maxDoc = src.agg(max("n_tok")).head.getLong(0)
    val back = spark.read.parquet(out)
    back.select("n_tokens").as[Long].collect().foreach { t =>
      assert(t < budget + maxDoc, s"shard holds $t tokens, budget $budget + maxDoc $maxDoc")
    }
    // lossless: every document's tokens are in exactly one shard
    assert(back.agg(sum("n_tokens")).head.getLong(0) ==
      src.agg(sum("n_tok")).head.getLong(0))
    assert(back.agg(sum("n_docs")).head.getLong(0) == src.count())
  }

  test("rowGroupReport: diagnoses the monolithic-row-group layout from footers alone") {
    // the SCALE.md generator-lesson-3 defect: ONE file with ONE giant row
    // group serializes every consumer. The report must read it as exactly
    // that — without scanning a single data page — and must read a
    // small-block multi-group layout as split.
    val rows = (1L to 20000L).map(i => (i, s"payload_$i", i * 1.5))
      .toDF("k", "s", "v")
    val mono = tmp("rg_mono") + "/t"
    rows.coalesce(1).write.mode("overwrite").parquet(mono)
    val split = tmp("rg_split") + "/t"
    rows.repartition(2, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024)
      .parquet(split)

    val m = Sources.rowGroupReport(spark, mono).collect()
    assert(m.length == 1 && m.head.getLong(2) == 1L,
      s"one file, one row group expected: ${m.mkString(",")}")
    assert(m.head.getLong(4) == 20000L, "the monolithic group holds every row")
    assert(m.head.getString(0) == "", "flat layout: empty part_dir")

    val s = Sources.rowGroupReport(spark, split)
      .orderBy("part_idx").collect()
    assert(s.length == 2, s"two files expected: ${s.mkString(",")}")
    assert(s.map(_.getLong(3)).sum == 20000L, "row totals must match the data")
    assert(s.forall(_.getLong(2) >= 2),
      s"64 KiB blocks must split each file into multiple groups: ${s.mkString(",")}")
    assert(s.forall(r => r.getLong(4) < r.getLong(3)),
      "max group must be a strict fraction of the file's rows")
    assert(s.forall(r => r.getLong(6) > 0 && r.getLong(5) >= r.getLong(6)),
      "footer byte totals: uncompressed >= compressed > 0")
  }

  test("rowGroupReport: partitioned layouts list recursively, keyed per partition dir") {
    // k=v subdirectories restart part-00000 numbering: a non-recursive
    // listing would report NOTHING, and an index-only key would merge
    // files across partitions — both silent misses this spec pins
    val rows = (1L to 9000L).map(i => (i, i % 3, s"v_$i")).toDF("k", "p", "s")
    val dir = tmp("rg_part") + "/t"
    rows.repartition(1).write.mode("overwrite").partitionBy("p").parquet(dir)
    val r = Sources.rowGroupReport(spark, dir).collect()
    assert(r.length == 3, s"one row per partition file: ${r.mkString(",")}")
    assert(r.map(_.getString(0)).toSet == Set("p=0", "p=1", "p=2"),
      s"part_dir must carry the partition directory: ${r.mkString(",")}")
    assert(r.map(_.getLong(3)).sum == 9000L, "row totals across partitions")
  }
}
