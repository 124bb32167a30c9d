package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Sequence packing: group documents into fixed token-budget bins — the
  * step that turns a filtered corpus into dense fixed-context training
  * batches. Two shapes:
  *
  *  - [[sequentialBins]]: streaming concat-and-chop — deterministic order,
  *    bin boundary wherever the running token total crosses the budget.
  *    One window over one shuffle by stream; SQL-replayable, the shape for
  *    100 TB (each stream is independent, bins assign map-side after the
  *    sort).
  *  - [[greedyPack]]: first-fit-decreasing within a stream — tighter bins
  *    (classic FFD ≤ 11/9·OPT + 6/9) at the cost of a compiled per-stream
  *    kernel; the stream column bounds state exactly like
  *    [[Dedup.ngramJaccardPairs]]'s block contract.
  *
  * No reference analog — pipeline-extension layer.
  */
object Packing {

  /** Assign `bin = tokensBefore DIV budget` over rows ordered by `orderCol`
    * within `streamCol` — integer arithmetic only (DIV, not `/`), so the
    * assignment replays bit-exactly in any SQL engine. A document longer
    * than the budget still lands in one bin (its own, usually): packing
    * never splits documents; `truncate the outliers first` is the contract.
    */
  def sequentialBins(
      df: DataFrame,
      streamCol: String,
      orderCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val before = sum(col(tokensCol)).over(
      Window.partitionBy(streamCol).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1))
    // integer DIV (the Column `/` is double division — see the resize op's
    // same discipline): bit-exact replay in DuckDB's `//`
    df.withColumn("__before", coalesce(before, lit(0L)))
      .withColumn("bin", expr(s"__before div ${budget}L"))
      .drop("__before")
  }

  /** Assemble binned documents into one training blob per (stream, bin) —
    * the artifact packing exists to produce. Documents concatenate in id
    * order via `array_sort(collect_list(struct(id, text)))` (ids are
    * unique, so the struct sort is total) — deterministic under any
    * partitioning, and exactly replayable as SQL `string_agg(text, sep
    * ORDER BY id)`. One shuffle on (stream, bin) with map-side partial
    * collects; blob size is budget-bounded by construction.
    */
  def assembleBins(
      binned: DataFrame,
      streamCol: String,
      idCol: String,
      textCol: String,
      tokensCol: String,
      sep: String = "\n\n"): DataFrame =
    binned
      .groupBy(col(streamCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"),
        concat_ws(
          sep,
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            x => x.getField(textCol))).as("text"))

  /** Length-bucketed dynamic batching: group rows into fixed-COUNT batches
    * of `batchSize` in (tokens DESC, id ASC) order within each stream — the
    * padded-batch builder for inference/eval serving and sequence-level
    * training, where a batch is padded to its LONGEST member (unlike the
    * token-budget packers above, which concatenate). Sorting by length
    * first is the standard padding-minimizing heuristic: near-equal-length
    * rows share a batch, so `n·max − Σ` waste collapses versus arrival
    * order. The (tokens DESC, id ASC) order is total ⇒ batch ids are
    * deterministic, partitioning-invariant, and SQL-replayable
    * (`(row_number − 1) DIV batchSize` — integer arithmetic only).
    *
    * Scale shape: one shuffle on the stream key, one per-stream window
    * sort (spillable), batch assignment map-side after it — the
    * [[sequentialBins]] cost model. Null tokens sort last (DESC NULLS
    * LAST) and count 0 toward padding, same null regime as the packers.
    *
    * @return input rows plus `batch` (0-based within stream)
    */
  def lengthBatches(
      df: DataFrame,
      streamCol: String,
      idCol: String,
      tokensCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val w = Window.partitionBy(streamCol)
      .orderBy(col(tokensCol).desc_nulls_last, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("batch", expr(s"(__rn - 1L) div ${batchSize}L"))
      .drop("__rn")
  }

  /** Per-batch padding accounting over [[lengthBatches]] output — the
    * report that justifies (or indicts) a batching layout: each (stream,
    * batch) pads every member to the batch max, so the padded cost is
    * `n_docs · max_tok` and the waste is `pad_waste = n_docs · max_tok −
    * sum_tok`. Pure integer aggregation (map-side partials on the
    * (stream, batch) key), output is batches-sized.
    */
  def paddingReport(
      batched: DataFrame,
      streamCol: String,
      tokensCol: String): DataFrame =
    batched
      .groupBy(col(streamCol), col("batch"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(coalesce(col(tokensCol), lit(0L))).as("max_tok"),
        sum(coalesce(col(tokensCol), lit(0L))).as("sum_tok"))
      .withColumn("pad_waste", col("n_docs") * col("max_tok") - col("sum_tok"))

  /** First-fit-decreasing bin packing per stream: docs sorted by token count
    * descending (id ascending on ties — deterministic), each placed in the
    * lowest-numbered bin with room; a doc over budget consumes one whole
    * bin's capacity (so only zero-token docs can share its bin). Capacity
    * invariant: Σ min(tokens, budget) ≤ budget per bin.
    * Output: input rows plus `bin` (0-based within stream). A stream must
    * fit in executor memory — choose `streamCol` accordingly (same contract
    * as every within-block kernel here). Streams arrive CONTIGUOUS (hash
    * repartition on the stream, then a partition-local sort), so the kernel
    * buffers exactly one stream at a time: peak memory is the LARGEST
    * stream, not the sum of every stream co-hashed to the partition.
    */
  def greedyPack(
      df: DataFrame,
      streamCol: String,
      idCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // same loud-contract discipline as the dedup kernels: a string id or
    // token column would ClassCastException mid-job otherwise
    Dedup.requireIntegralId(df, idCol)
    Dedup.requireIntegralId(df, tokensCol)
    // run detection below finds stream boundaries with Scala == on the key,
    // while run CONTIGUITY comes from Spark's sort order — the two must
    // agree on equality. Floating keys (interleaved -0.0/0.0, NaN: Spark
    // sorts them equal, equals() does not) and binary keys (byte-array
    // reference equality) disagree, silently splitting one sorted stream
    // into several runs with different bin assignments — reject them loudly.
    locally {
      import org.apache.spark.sql.types._
      df.schema(streamCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType |
            BooleanType | DateType | TimestampType | TimestampNTZType => ()
        case _: DecimalType => () // fixed scale per column ⇒ equals == compareTo
        case dt =>
          throw new IllegalArgumentException(
            s"greedyPack streamCol '$streamCol' must be an integral/string/" +
              s"boolean/date/time/decimal column (sort-equality must match " +
              s"equals()); got $dt — floating, binary and nested keys are " +
              s"not supported")
      }
    }
    val schema = df.schema
    val streamIdx = schema.fieldIndex(streamCol)
    val idIdx = schema.fieldIndex(idCol)
    val tokIdx = schema.fieldIndex(tokensCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        "bin", org.apache.spark.sql.types.LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.repartition(col(streamCol))
      .sortWithinPartitions(col(streamCol))
      .toDF()
      .mapPartitions { it =>
        // null tokens count as 0 — same "adds nothing" semantics the window
        // sum gives sequentialBins, so the two packers agree on null rows
        def tok(r: Row): Long =
          if (r.isNullAt(tokIdx)) 0L else r.getAs[Number](tokIdx).longValue()
        def packStream(rows: mutable.ArrayBuffer[Row]): Iterator[Row] = {
          val sorted = rows.sortBy { r =>
            (-tok(r), r.getAs[Number](idIdx).longValue())
          }
          // open bins: remaining capacity per bin index; linear first-fit —
          // bins per stream are few (≈ total/budget), so the scan is cheap
          val remaining = mutable.ArrayBuffer.empty[Long]
          sorted.iterator.map { r =>
            val t = tok(r)
            var b = 0
            while (b < remaining.length && remaining(b) < t) b += 1
            if (b == remaining.length) remaining += budget
            remaining(b) -= math.min(t, budget)
            Row.fromSeq(r.toSeq :+ b.toLong)
          }
        }
        // streams are contiguous after the partition-local sort, so buffer
        // one run (= one stream) at a time — never the whole partition
        val in = it.buffered
        new Iterator[Row] {
          private var current: Iterator[Row] = Iterator.empty
          def hasNext: Boolean = current.hasNext || in.hasNext
          def next(): Row = {
            if (!current.hasNext) {
              val key = in.head.get(streamIdx)
              val run = mutable.ArrayBuffer.empty[Row]
              while (in.hasNext && in.head.get(streamIdx) == key) run += in.next()
              current = packStream(run)
            }
            current.next()
          }
        }
      }(enc)
  }
}
