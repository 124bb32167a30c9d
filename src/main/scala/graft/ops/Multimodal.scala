package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata structs; decode / feature-extraction runs as
  * partition-batched iterators (`mapPartitions`), the Scala analog of a
  * vectorized decode UDF — the Spark-side schema, batching, and partitioning
  * are real, the codec itself is STUBBED (no image/audio libraries in this
  * environment) behind a deterministic fake.
  */
object Multimodal {

  /** A media record: opaque payload + metadata, the schema a 100 TB
    * image/audio table would use (payload column stays pruned away unless a
    * stage actually decodes).
    */
  case class MediaRecord(media_id: Long, content: Array[Byte], mime: String, source: String)

  /** Extracted features: fixed-shape metadata a decoder would emit. */
  case class MediaFeature(
      media_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      aspect: Double,
      n_frames: Long)

  /** STUB decode: deterministic pseudo-features from the payload size.
    * A real deployment swaps this body for an image/audio codec; the
    * surrounding batching/schema stays identical.
    */
  def decodeStub(id: Long, content: Array[Byte]): MediaFeature = {
    val n = content.length.toLong
    val width = 16L + n % 64L
    val height = 16L + (n * 7L) % 64L
    val aspect = BigDecimal(width.toDouble / height)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    MediaFeature(id, n, width, height, aspect, 1L + n % 10L)
  }

  /** Build a media table from the documents fixture: text bytes stand in
    * for an image payload (UTF-8 encode), mime/source carried as metadata.
    *
    * Parity contract: the dhash gate's DuckDB oracle samples CODE POINTS
    * (`ord(substr(...))`) while [[dhash60Scala]] samples UTF-8 BYTES —
    * equal exactly when the fixture text is pure ASCII, which
    * Wave33Spec's fixture-contract test asserts for sf0.001 and sf0.01
    * (a non-ASCII fixture fails that test loudly, not the gate quietly).
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"),
        lit("application/octet-stream").as("mime"),
        col("source"))
      .as[MediaRecord]
  }

  /** Feature extraction over partition-sized batches. `grouped(batchSize)`
    * mirrors the batch shape a vectorized decoder wants (amortized codec
    * init per batch, bounded memory); partition parallelism is Spark's.
    */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would init once here, then decode the whole batch
        batch.iterator.map(r => decodeStub(r.media_id, r.content))
      }
    }
  }

  /** Metadata-only pass: payload column is never decoded, only measured —
    * the plan should show the binary column pruned into a cheap projection.
    */
  def metadata(media: Dataset[MediaRecord]): DataFrame =
    media.toDF().select(
      col("media_id"),
      octet_length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_md5"),
      col("mime"),
      col("source"))

  /** Resize planning: target dimensions fitting `maxDim` with aspect
    * preserved — pure integer arithmetic (floor division) so the plan is
    * engine-exact; a real pipeline hands (out_w, out_h) to the codec in the
    * same batched decode pass as [[extractFeatures]]. Map-side projection,
    * no shuffle.
    */
  def resizePlan(media: Dataset[MediaRecord], maxDim: Long): DataFrame = {
    require(maxDim > 0)
    // DIV, not `/`: the Column `/` is double division; DIV keeps the whole
    // plan in integer arithmetic, bit-exact across engines
    extractFeatures(media).toDF().selectExpr(
      "media_id",
      "width",
      "height",
      s"CAST(CASE WHEN greatest(width, height) <= $maxDim THEN width " +
        s"ELSE width * $maxDim DIV greatest(width, height) END AS BIGINT) AS out_w",
      s"CAST(CASE WHEN greatest(width, height) <= $maxDim THEN height " +
        s"ELSE height * $maxDim DIV greatest(width, height) END AS BIGINT) AS out_h")
  }

  /** Paired-embedding alignment screen — the CLIP-style caption↔image QA
    * gate: for each pair `(id, id + offset)` (two towers' embeddings of
    * the same item — here the two halves of the embeddings fixture), the
    * TRUE cosine must beat a derangement control (the NEXT item's right
    * tower, `((id+1) mod n) + offset`). Pairs whose true cosine loses to
    * a mismatched partner are exactly the mislabeled/duplicate-caption
    * rows a contrastive training set must drop. Output per pair:
    * `(id_a, id_b, cos_pair, cos_control, aligned)` with `aligned` an
    * exact int (cosines are the proven sequential-fold dot triple —
    * bit-replayable, so even the comparison is engine-exact).
    *
    * Scale shape: two hash equi-joins on the id arithmetic (no similarity
    * search, no fan-out) — the control partner is a FIXED derangement, so
    * the screen costs O(pairs) at any corpus size; a stronger screen
    * composes [[graft.ops.Similarity.bruteForceTopK]] when rank-aware
    * checking is worth its candidate generation.
    */
  def pairAlignment(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      n: Long,
      offset: Long): DataFrame = {
    require(n > 1, s"need at least two pairs, got $n")
    val e = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).as("v"),
      Similarity.l2Norm(col(vecCol)).as("nrm"))
    val left = e.filter(col("id") < n)
      .select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val right = e.filter(col("id") >= offset && col("id") < offset + n)
    left
      .join(right.select((col("id") - offset).as("id_a"), col("id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb")), Seq("id_a"))
      .join(right.select(
        pmod(col("id") - offset - 1 + n, lit(n)).as("id_a"),
        col("v").as("vc"), col("nrm").as("nc")), Seq("id_a"))
      .select(
        col("id_a"), col("id_b"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("cos_pair"),
        (Similarity.dot(col("va"), col("vc")) / (col("na") * col("nc")))
          .as("cos_control"))
      .withColumn("aligned",
        (col("cos_pair") > col("cos_control")).cast("int"))
  }

  /** 60-bit difference hash (dHash — the classic perceptual image hash:
    * resample to a tiny grid, emit one bit per adjacent-sample
    * comparison; gradient SIGNS survive re-encoding/resizing where raw
    * bytes don't). The "resample" here reads 61 evenly spaced payload
    * bytes (`p_i = ⌊i·n/61⌋` — a real deployment swaps this sampler for
    * the decoded-pixel grid; the bit construction, blocking and verify
    * stay identical), bit i = sample_i > sample_{i+1}. 60 bits = 4
    * pigeonhole chunks of 15, and every step is replayable from the
    * payload bytes in any engine with `ord`/`substr` — which puts the
    * whole perceptual-dedup path under the cross-engine gate.
    *
    * Sampling is a FIXED stride-4 walk wrapped modulo the payload length
    * (`p_i = 4i mod n`), not a length-scaled grid: fixed positions keep
    * similar payload HEADS hashing alike (the property a perceptual hash
    * exists for), where length-scaled positions shift every sample when
    * one byte is inserted — measured on the fixture: length-scaled
    * sampling produced ZERO pairs, the fixed walk pairs the
    * shared-profile payloads.
    */
  def dhash60Scala(content: Array[Byte]): Long = {
    val n = content.length
    require(n > 0, "dhash of an empty payload")
    var h = 0L
    var i = 0
    while (i < 60) {
      val b1 = content((i * 4) % n) & 0xff
      val b2 = content(((i + 1) * 4) % n) & 0xff
      if (b1 > b2) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Column form of [[dhash60Scala]] over a STRING payload — the SQL
    * surface (`graft_dhash60`). Identical bits for ascii payloads (the
    * kernel reads bytes, `ascii()` reads code points — equal below
    * 0x80); the compiled kernel remains the hot path for binary media.
    * Null or empty payloads yield null.
    */
  def dhash60(payload: Column): Column = {
    val n = length(payload)
    def sample(pos: Column): Column = ascii(payload.substr(pos + 1, lit(1)))
    val bits = transform(
      sequence(lit(0), lit(59)),
      i => when(
        sample(pmod(i * 4, n)) > sample(pmod((i + 1) * 4, n)),
        call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L)))
    when(payload.isNull || n === 0, lit(null).cast("long"))
      .otherwise(aggregate(bits, lit(0L), (acc, b) => acc + b))
  }

  /** Perceptual near-duplicate pairs over the media payloads: per-row
    * compiled [[dhash60Scala]] signatures, then the exact 4-chunk
    * pigeonhole Hamming join shared with the simhash family
    * ([[Dedup.hammingPairs]] — blocked ≡ brute force for the ≤ 3
    * radius). Empty payloads exit (no signature). Scale shape: one
    * compiled signature scan, id+hash-only shuffles, candidates bounded
    * by signature-bucket sizes.
    */
  def dhashPairs(media: Dataset[MediaRecord], maxHamming: Int = 3): DataFrame = {
    import media.sparkSession.implicits._
    val sh = media
      .filter(r => r.content != null && r.content.nonEmpty)
      .map(r => (r.media_id, dhash60Scala(r.content)))
      .toDF("id", "sh")
    Dedup.hammingPairs(sh, maxHamming, bits = 60)
  }

  /** Frame sampling: one row per sampled frame index, every `stride`-th
    * frame of each medium (frame counts from the decode stub). A map-side
    * generator — the fan-out step before per-frame decode/embedding in a
    * video pipeline; no shuffle, output rows ∝ sampled frames.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    require(stride > 0)
    extractFeatures(media).toDF()
      .select(
        col("media_id"),
        col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
  }
}
