package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format and table-layout helpers — the source/sink surface the
  * reference lacks entirely (memory-only, SURVEY §2 "explicitly absent"),
  * provided Spark-first:
  *
  *  - schema-explicit CSV/JSON readers (schema inference is a full extra
  *    pass over the data — never acceptable at 100 TB);
  *  - partitioned parquet writes (partition pruning is the cheapest filter
  *    there is: pruned directories are never listed, let alone read);
  *  - bucketed tables for shuffle-free co-located joins: two tables
  *    bucketed on the same key into the same bucket count sort-merge-join
  *    without any Exchange — THE layout decision for repeatedly-joined
  *    100 TB fact tables.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .schema(schema)
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC read/write — the second columnar format Spark ships natively.
    * Same pushdown machinery as parquet (predicate pushdown, column
    * pruning, partition layout all apply), so pipelines landing in
    * ORC-based warehouses interoperate without conversion passes.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Schema-evolution read: a parquet dataset whose files were written
    * under DIFFERENT (compatible) schemas — the long-lived-table reality
    * where later batches gained columns — reads as the UNION of all file
    * schemas, missing columns null-filled (`mergeSchema`). Partition
    * discovery composes: `k=v` subdirectories still surface as partition
    * columns.
    *
    * Scale note: schema merging reads every file's FOOTER (a distributed
    * metadata job — no data motion, but at 100 TB it is millions of small
    * reads). The production discipline: pay it once, then pin the merged
    * schema explicitly (`spark.read.schema(merged)`) or normalize the
    * layout with a compaction rewrite; this reader is the discovery step,
    * not the steady state.
    */
  def readEvolving(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Partitioned parquet layout: directory per `partitionCols` value.
    * Queries filtering on those columns list only matching directories
    * (`PartitionFilters` in the scan, not even `PushedFilters`).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Token-budget-bounded training shards — the sink the packing family
    * exists to feed (WebDataset/TFRecord-style: a training job maps one
    * shard file to one reader). Documents are binned sequentially per
    * stream ([[graft.ops.Packing.sequentialBins]] — integer-DIV replayable),
    * each (stream, bin) assembles into ONE blob row
    * ([[graft.ops.Packing.assembleBins]], id-ordered, deterministic under
    * any partitioning), and blobs land as `stream=<s>/bin=<n>/` parquet —
    * one file per shard, because each group exits the assembly aggregate on
    * a single task. Shard token totals are budget-bounded up to one
    * document's overhang (sequential binning never splits a document; a doc
    * crossing the boundary finishes its bin past the line).
    *
    * Scale shape: ONE shuffle — the assembly aggregate on (stream, bin) —
    * then a straight partitioned write; no repartition (the aggregate's
    * clustering already satisfies the write), no driver materialization.
    */
  def writeTokenShards(
      df: DataFrame,
      streamCol: String,
      idCol: String,
      textCol: String,
      tokensCol: String,
      budget: Long,
      path: String,
      sep: String = "\n\n"): Unit = {
    val binned =
      graft.ops.Packing.sequentialBins(df, streamCol, idCol, tokensCol, budget)
    graft.ops.Packing.assembleBins(binned, streamCol, idCol, textCol, tokensCol, sep)
      .write.mode(SaveMode.Overwrite).partitionBy(streamCol, "bin").parquet(path)
  }

  /** Compact a parquet directory into ~`targetBytes` output files —
    * the maintenance pass every incremental sink needs: micro-batches leave
    * a few KB per commit, and at cluster scale millions of tiny files make
    * listing dominate job startup and one-row-group-per-file kill scan
    * throughput. The output file count comes from the MEASURED input bytes
    * (a guessed count is wrong the moment data skews): the scan itself packs
    * input files into ~`targetBytes` splits via `maxPartitionBytes`, and
    * each split writes straight through as one output file — NO shuffle.
    *
    * @return number of output files written
    */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0)
    // Let the SCAN do the sizing: with maxPartitionBytes = target (and the
    // per-file open-cost padding zeroed, which would otherwise split tiny
    // files early), Spark packs input files into ~targetBytes splits — each
    // becomes one output file. No coalesce arithmetic, no shuffle, and the
    // split count tracks MEASURED bytes even under skewed file sizes.
    // The sizing confs go on an ISOLATED session (same SparkContext, own
    // SQLConf) so concurrent queries on the caller's session never see them.
    val s = spark.newSession()
    s.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    s.conf.set("spark.sql.files.openCostInBytes", "0")
    s.read.parquet(inDir).write.mode(SaveMode.Overwrite).parquet(outDir)
    // report files actually written (a split that contains no row-group
    // start emits nothing, so counting scan splits would over-report)
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(out).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Parquet with column BLOOM FILTERS in the file footers: point lookups
    * (`WHERE id = x`, digest probes, id anti-joins) skip whole row groups
    * whose bloom says "definitely absent" — at 100 TB this turns a
    * needle-in-haystack scan into reads of a handful of row groups. Costs
    * ~1-2% file size per indexed column; worthless for range scans, so
    * index only equality-probed columns.
    */
  def writeWithBloom(
      df: DataFrame,
      path: String,
      bloomCols: Seq[String],
      expectedDistinct: Long = 1000000L): Unit = {
    require(bloomCols.nonEmpty, "name at least one column to index")
    val w = df.write.mode(SaveMode.Overwrite)
    val configured = bloomCols.foldLeft(w) { (acc, c) =>
      acc
        .option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedDistinct.toString)
    }
    configured.parquet(path)
  }

  /** Z-order clustered parquet: rows are range-partitioned and sorted by
    * the BIT-INTERLEAVED bucket codes of `zCols`, so each output file
    * covers a small rectangle of the multi-column value space instead of a
    * stripe of one column — min/max row-group stats then skip files for
    * predicates on ANY of the z columns (a single-column sort only skips
    * for the leading column). This is the lakehouse layout lever for 100 TB
    * fact tables probed on several dimensions.
    *
    * Two bucketing schemes, both one extra 1-row aggregate job; the
    * interleave itself is a static fold of codegen'd bit expressions — no
    * UDF, scan-speed:
    *
    *  - LINEAR (default): `width_bucket` codes against the MEASURED
    *    min/max. Right for roughly uniform columns; heavily skewed columns
    *    collapse most rows into a few codes and the skipping dies.
    *  - QUANTILE (`quantileCuts = true`): equal-FREQUENCY buckets from
    *    `approx_percentile` boundaries, so every code covers ~the same
    *    number of rows no matter how skewed the values — the standard fix
    *    for power-law ids, timestamps with hot ranges, etc. Costs a
    *    per-row `filter` HOF over the boundary array at write time (the
    *    read side sees identical parquet), so quantile mode defaults to
    *    8 bits/dimension — 256 frequency buckets saturate file-level
    *    skipping at any realistic file count.
    *
    * Bits per dimension are capped so the top interleaved bit stays below
    * the long's sign bit (n·bits ≤ 63): with 4 columns at 16 bits, bit 63
    * would flip half the code space negative and range-partitioning would
    * order the upper half of the z-curve before the lower, splitting
    * locality at the sign boundary.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      numFiles: Int = 0,
      quantileCuts: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2, "z-ordering needs at least two columns (sort for one)")
    require(zCols.size <= 4, "more than 4 z columns dilutes per-column skipping")
    val n = zCols.size
    val bits = bitsPerDim(n, quantileCuts)
    val buckets = 1 << bits
    val spark = df.sparkSession
    val codes: Seq[org.apache.spark.sql.Column] =
      if (quantileCuts) {
        // equal-frequency cut points, all columns in ONE aggregate job
        val probs = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
        val cutRow = df.agg(
          percentile_approx(col(zCols.head).cast("double"), probs, lit(10000)).as("c0"),
          zCols.tail.zipWithIndex.map { case (c, i) =>
            percentile_approx(col(c).cast("double"), probs, lit(10000)).as(s"c${i + 1}")
          }: _*).head()
        zCols.indices.map { i =>
          // null row (empty input / all-null column) ⇒ no ordering info
          if (cutRow.isNullAt(i)) lit(0L)
          else {
            val cuts = cutRow.getSeq[Double](i).distinct.sorted
            if (cuts.isEmpty) lit(0L)
            else {
              val arr = array(cuts.map(lit): _*)
              // code = #cuts at or below v ∈ [0, buckets-1]; nulls → 0
              val v = col(zCols(i)).cast("double")
              coalesce(
                when(v.isNull, lit(0L)).otherwise(
                  size(filter(arr, b => b <= v)).cast("long")),
                lit(0L))
            }
          }
        }
      } else {
        val stats = df.agg(
          min(col(zCols.head)).cast("double").as("mn0"),
          (max(col(zCols.head)).cast("double").as("mx0") +:
            zCols.tail.zipWithIndex.flatMap { case (c, i) =>
              Seq(
                min(col(c)).cast("double").as(s"mn${i + 1}"),
                max(col(c)).cast("double").as(s"mx${i + 1}"))
            }): _*).head()
        // empty input / all-null z column ⇒ null min/max: that column carries
        // no ordering information, so its code degenerates to 0 (the rows
        // still write; the OTHER z columns keep clustering)
        def statOr0(name: String): Double =
          if (stats.isNullAt(stats.fieldIndex(name))) 0.0
          else stats.getDouble(stats.fieldIndex(name))
        zCols.zipWithIndex.map { case (c, i) =>
          val mn = statOr0(s"mn$i")
          val mx = statOr0(s"mx$i")
          // width_bucket maps v==max to buckets+1 and nulls to null: clamp into
          // [0, 2^bits-1] so every row gets a code and file ranges stay tight
          val wb =
            if (mn == mx) lit(0L)
            else
              least(
                greatest(
                  width_bucket(col(c).cast("double"), lit(mn), lit(mx), lit(buckets)) - 1,
                  lit(0L)),
                lit((buckets - 1).toLong))
          coalesce(wb, lit(0L))
        }
      }
    val zval = (0 until bits)
      .flatMap(b => codes.zipWithIndex.map { case (code, i) =>
        shiftleft(shiftright(code, b).bitwiseAND(1L), b * n + i)
      })
      .reduce(_ + _)
    val files = if (numFiles > 0) numFiles else spark.sparkContext.defaultParallelism
    df.withColumn("__z", zval)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Bits per z dimension: 16 linear / 8 quantile, capped so the TOP
    * interleaved bit position (n·bits − 1) stays below the long's sign
    * bit — otherwise half the code space goes negative and the range
    * partitioner orders the upper half of the z-curve first.
    */
  private[sources] def bitsPerDim(n: Int, quantileCuts: Boolean): Int =
    math.min(if (quantileCuts) 8 else 16, 63 / n)

  /** Bucketed + sorted managed table. Joining two tables bucketed on the
    * same key with the same `numBuckets` needs no shuffle — the join
    * becomes a per-bucket merge.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // a stale location (files from a previous session whose catalog entry is
    // gone) makes saveAsTable fail with LOCATION_ALREADY_EXISTS — drop both
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Per-file manifest of a parquet directory — the stats collection a
    * lakehouse table format (Iceberg/Delta manifests, public designs)
    * keeps so planners can prune files without opening them: per output
    * file, its row count and the min/max of the clustering key. Derived
    * by READING THE FILES THEMSELVES (`input_file_name` grouping), so the
    * manifest is the ground truth of what actually landed on disk — and
    * the DuckDB oracle independently opens the same files, making the
    * gate a genuine cross-engine FILE-LEVEL check, not a logical replay.
    *
    * The part index comes from the `part-NNNNN` component of the file
    * name (deterministic under hash repartitioning); the attempt-uuid
    * suffix is not exposed (non-deterministic by design).
    *
    * Scale shape: one scan of the directory, partial-aggregated map-side
    * to one row per file — manifest-sized output, the same motion the
    * real stats collectors use.
    */
  def fileManifest(
      spark: SparkSession,
      dir: String,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(dir)
      .groupBy(regexp_extract(input_file_name(), "part-(\\d+)", 1)
        .cast("int").as("part_idx"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
  }

  /** Row-group layout audit over a parquet directory — per file: how many
    * row groups, how many rows, the LARGEST group, and the footer's
    * uncompressed/compressed byte totals. Productizes the round-12
    * generator lesson (SCALE.md "generator lesson 3"): Spark's scan
    * parallelism is bounded by ROW GROUPS, not bytes — a scan advertises
    * `maxPartitionBytes` splits, but parquet reads whole row groups, so
    * only the split containing a group's start produces rows. An upstream
    * writer emitting monolithic row groups (one giant group per file)
    * silently serializes every consumer, and nothing in the consumer's UI
    * says so (`getNumPartitions` reports the advertised splits). This
    * report is the diagnosis: `n_row_groups = 1` with a large
    * `max_group_rows` on a big file is exactly that defect, visible
    * before any query pays for it.
    *
    * Output: one row per data file keyed `(part_dir, part_idx)` —
    * `part_dir` is the file's directory relative to `dir` (empty for a
    * flat layout), because partitioned layouts restart `part-NNNNN`
    * numbering inside every `k=v` subdirectory and the index alone would
    * merge files across partitions. The listing is RECURSIVE for the
    * same reason: a non-recursive probe would return an empty report for
    * exactly the partitioned tables most worth auditing.
    *
    * Scale shape: pure FOOTER reads, no data scan — the file list is
    * distributed over executors (`mapPartitions` over paths, filesystem
    * config riding a broadcast), so a million-file warehouse audits at
    * full cluster parallelism; output is files-sized.
    */
  def rowGroupReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: partitioned layouts keep their data files under
    // k=v subdirectories, and a non-recursive probe would return an EMPTY
    // report for exactly the tables most worth auditing — a silent miss
    def listFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isDirectory) listFiles(s.getPath)
        else if (n.endsWith(".parquet") || n.startsWith("part-")) Seq(s.getPath)
        else Seq.empty
      }
    val files = listFiles(base).map(_.toString).sorted
    // per-file identity = path RELATIVE to the audited dir: under a
    // partitioned layout every k=v subdirectory restarts part numbering
    // at part-00000, so the part index alone would silently merge files
    // from different partitions
    val qBase = fs.makeQualified(base).toString
    val confOf = org.apache.spark.sql.GraftColumnBridge.hadoopConfAccessor(spark)
    val perGroup = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.length, spark.sparkContext.defaultParallelism)))
      .mapPartitions { paths =>
        val conf = confOf()
        paths.flatMap { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val rel = p.stripPrefix(qBase).stripPrefix("/")
            import scala.jdk.CollectionConverters._
            r.getFooter.getBlocks.asScala
              .map(b => (rel, b.getRowCount, b.getTotalByteSize, b.getCompressedSize))
              .toVector
          } finally r.close()
        }
      }
      .toDF("file", "group_rows", "group_bytes", "group_compressed")
    perGroup
      .groupBy(
        when(col("file").contains("/"),
          regexp_extract(col("file"), "^(.*)/[^/]*$", 1)).otherwise("")
          .as("part_dir"),
        regexp_extract(col("file"), "part-(\\d+)", 1).cast("int").as("part_idx"))
      .agg(
        count(lit(1)).as("n_row_groups"),
        sum("group_rows").as("n_rows"),
        max("group_rows").as("max_group_rows"),
        sum("group_bytes").as("total_bytes"),
        sum("group_compressed").as("compressed_bytes"))
  }

  /** Schema diff between two parquet directories — the evolution report a
    * governance review reads before enabling merged-schema reads: every
    * column classified added / removed / retyped / unchanged, with types
    * normalized to a small canonical vocabulary (bigint / int / string /
    * double) so the comparison is engine-neutral (the DuckDB oracle maps
    * parquet physical types to the SAME labels). Pure metadata — two
    * footer reads, no data motion; the result is a LITERAL table (exact
    * by construction, the schema IS the value under test).
    */
  def schemaDiff(spark: SparkSession, dirA: String, dirB: String): DataFrame = {
    import spark.implicits._
    def fields(dir: String): Map[String, String] =
      spark.read.parquet(dir).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
    val a = fields(dirA)
    val b = fields(dirB)
    (a.keySet ++ b.keySet).toSeq.sorted.map { c =>
      val (ta, tb) = (a.get(c), b.get(c))
      val status = (ta, tb) match {
        case (None, Some(_))                  => "added"
        case (Some(_), None)                  => "removed"
        case (Some(x), Some(y)) if x == y     => "unchanged"
        case _                                => "retyped"
      }
      (c, ta.orNull, tb.orNull, status)
    }.toDF("column", "type_a", "type_b", "status")
  }

}
