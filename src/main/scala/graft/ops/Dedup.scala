package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Everything is Column-expression based
  * (codegen'd) plus ordinary joins, so the same code path scales out:
  * signatures are computed map-side at scan speed, candidate generation is a
  * shuffle on short (band, hash) keys, and only candidate pairs — not the
  * full n² — are verified.
  */
object Dedup {

  /** Exact dedup: one survivor (minimum id) per md5 of the content column.
    * Map-side partial aggregation; one shuffle on the 128-bit digest.
    */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("h"))
      .agg(min(col(idCol)).as(idCol))

  /** MinHash signature of `numHashes` permutations over a **staged**
    * shingles column. One xxhash64 family, seeded by position — the standard
    * "k independent hash functions" construction.
    *
    * `shingles` MUST be an attribute reference, not an inline expression:
    * it sits inside the per-seed lambda, so an inline expression would be
    * re-shingled `numHashes` times per row.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingles, s => xxhash64(s, j))))

  /** [[minhashSignature]]'s md5-derived replayable twin — the
    * [[simhashPairsReplayable]] pattern applied to MinHash: permutation
    * `j` hashes a shingle to the first 15 hex nibbles (60 bits, always
    * nonnegative in a long) of `md5(shingle # j)`, so every component is
    * recomputable in any engine with md5 — which is what puts the
    * group-union MinHash query (`source_minhash`) under a full
    * cross-engine hash gate. Production corpora should prefer
    * [[minhashSignature]]: xxhash64 is several times faster per shingle
    * than MessageDigest md5, and the signature scan IS the corpus scan
    * at 100 TB. Same staging contract: `shingles` MUST be an attribute
    * reference, not an inline expression.
    */
  def minhashSignatureMd5(shingles: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingles, s =>
        conv(substring(md5(concat(s, lit("#"), j.cast("string"))), 1, 15), 16, 10)
          .cast("long"))))

  /** LSH banding: split the signature into `bands` bands and hash each,
    * producing (band_idx, band_hash) rows. Docs sharing any band bucket are
    * candidate near-duplicates.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b =>
        struct(
          b.as("band"),
          xxhash64(concat_ws(",", transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string"))))
            .as("bh")))

  /** Scala replica of [[minhashSignature]] over word `n`-shingles — same
    * xxhash64 family and chaining as the Column form (`xxhash64(s, j)` =
    * hash the int position `j` seeded by the string hash, outer seed 42),
    * pinned bitwise by spec. Runs as a compiled per-row kernel: the
    * higher-order-function form cannot be kept out of CollapseProject once
    * the shingles column is pruned from the output (single reference →
    * Catalyst inlines the shingling into the per-seed lambda, re-shingling
    * `numHashes` times per row).
    */
  private[ops] def minhashSignatureScala(text: String, numHashes: Int, n: Int): Array[Long] = {
    // deduped shingle set: duplicates cannot change a min, so skipping them
    // saves their 64 rehashes; shares the exact shingling of the verify path
    val shingles = TextOps.wordShinglesScala(text, n)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h0 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var j = 0
      while (j < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, h0)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }
    sig
  }

  /** Scala replica of [[lshBands]]: per-band hash of the comma-joined
    * signature slice (matching `xxhash64(concat_ws(",", ...))`, seed 42).
    */
  private[ops] def bandHashesScala(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] =
    Array.tabulate(bands) { b =>
      val sb = new java.lang.StringBuilder
      var i = b * rowsPerBand
      val end = i + rowsPerBand
      while (i < end) {
        if (i > b * rowsPerBand) sb.append(',')
        sb.append(sig(i))
        i += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    }

  /** The typed candidate kernels carry ids as Long. A silent `cast('long')`
    * would turn non-numeric ids into NULLs — pairs vanish and dedup degrades
    * to a no-op — so the id column must already be integral, checked loudly.
    */
  private[ops] def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(
      dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType,
      s"column '$idCol' must be an integral type (byte/short/int/long), got $dt; " +
        "map string/uuid values to a long surrogate first (e.g. xxhash64 or a dimension join)")
  }

  /** Candidate pairs (idA < idB) via MinHash LSH, then exact-Jaccard
    * verification over the shingle sets; only pairs with
    * `jaccard >= threshold` survive. False positives are eliminated by the
    * verification join; false negatives are bounded by the (bands, rows)
    * choice — 16×4 gives ~64% detection at j=0.5 and >99.9% at j=0.9.
    *
    * Scale shape: candidate generation ships ONLY (band, bh, id) through the
    * band explode and the (band, bh) shuffle — shuffle bytes ∝ bands × ids,
    * not bands × corpus shingle volume. The shingle arrays re-join AFTER
    * candidate dedup, so only surviving candidate pairs ever carry them
    * (candidates are small by LSH construction, so AQE broadcasts them and
    * the shingle table streams map-side).
    */
  // ---- shared MinHash pipeline stages: ONE implementation of the hash
  // family / shingling / verification, so the single-corpus and
  // cross-corpus formulations cannot drift (their equivalence is
  // spec-pinned). Null text cannot be a near-duplicate of anything (and
  // would NPE the kernels): such rows exit at prep. The repartition spreads
  // CPU-bound signature work; at cluster scale it spreads the scan anyway.

  private def minhashRows(df: DataFrame, textCol: String, idCol: String) = {
    val sp = df.sparkSession
    import sp.implicits._
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .repartition(sp.sparkContext.defaultParallelism)
      .as[(Long, String)]
  }

  private def bandedOf(
      rows: org.apache.spark.sql.Dataset[(Long, String)],
      numHashes: Int,
      bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sp = rows.sparkSession
    import sp.implicits._
    rows
      .flatMap { case (id, text) =>
        bandHashesScala(minhashSignatureScala(text, numHashes, 3), bands, rowsPerBand)
          .iterator.zipWithIndex.map { case (bh, band) => (band, bh, id) }
      }
      .toDF("band", "bh", "id")
  }

  private def shingledOf(
      rows: org.apache.spark.sql.Dataset[(Long, String)],
      idName: String,
      shName: String): DataFrame = {
    val sp = rows.sparkSession
    import sp.implicits._
    rows.map { case (id, text) => (id, TextOps.wordShinglesScala(text, 3)) }
      .toDF(idName, shName)
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against the
    * two shingle tables: false positives cannot survive it.
    */
  private def verifyJaccard(
      candidates: DataFrame,
      shingledA: DataFrame,
      shingledB: DataFrame,
      threshold: Double): DataFrame =
    candidates
      .join(shingledA, Seq("id_a"))
      .join(shingledB, Seq("id_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    requireIntegralId(df, idCol)
    val rows = minhashRows(df, textCol, idCol)
    val banded = bandedOf(rows, numHashes, bands)
    val candidates = banded.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bh"), col("id").as("id_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(
      candidates,
      shingledOf(rows, "id_a", "sh_a"),
      shingledOf(rows, "id_b", "sh_b"),
      threshold)
  }

  /** Near-duplicate pairs BETWEEN two corpora (id_a from `dfA`, id_b from
    * `dfB`) — the incremental-ingest shape: band the small incoming batch
    * and the big existing corpus with the SAME hash family, join on
    * (band, hash), verify exact Jaccard on candidates. Identical LSH
    * recall contract as [[minhashPairs]]; candidate shuffle ships
    * (band, bh, id) triples only, so the corpus side costs bands × |B|
    * short rows regardless of document sizes.
    */
  def minhashPairsBetween(
      dfA: DataFrame,
      dfB: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    requireIntegralId(dfA, idCol)
    requireIntegralId(dfB, idCol)
    val a = minhashRows(dfA, textCol, idCol)
    val b = minhashRows(dfB, textCol, idCol)
    val candidates = bandedOf(a, numHashes, bands).select(col("band"), col("bh"), col("id").as("id_a"))
      .join(bandedOf(b, numHashes, bands).select(col("band"), col("bh"), col("id").as("id_b")),
        Seq("band", "bh"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(
      candidates,
      shingledOf(a, "id_a", "sh_a"),
      shingledOf(b, "id_b", "sh_b"),
      threshold)
  }

  /** Drop every incoming row with a verified near-duplicate anywhere in the
    * reference corpus — [[exceptContentOf]]'s fuzzy sibling (exact-content
    * there, Jaccard-near here).
    */
  def dedupAgainstCorpus(
      df: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.5): DataFrame = {
    val losers = minhashPairsBetween(df, ref, textCol, idCol, threshold)
      .select(col("id_a").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Drop every row that has a verified near-duplicate with a smaller id
    * (greedy keep-first; transitive chains collapse to their minimum over
    * repeated application).
    */
  def dedupByMinhash(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.5): DataFrame = {
    val losers = minhashPairs(df, textCol, idCol, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit ±1 votes of each token's
    * xxhash64, sign-aggregated into a bit vector. Pure higher-order Column
    * expressions; no UDF, no shuffle.
    */
  // variable shift amounts need call_function: the Scala DSL's
  // shiftrightunsigned/shiftleft only accept Int literals
  private def ushr(v: Column, bits: Column): Column =
    call_function("shiftrightunsigned", v, bits)
  private def shl(v: Column, bits: Column): Column =
    call_function("shiftleft", v, bits)

  /** Per-bit ±1 vote array (length 64) of the tokens' xxhash64 values. */
  def simhashVotes(toks: Column): Column =
    aggregate(
      transform(toks, w => xxhash64(w)),
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(
          acc,
          transform(
            sequence(lit(0), lit(63)),
            // bitwiseAND, not `% 2`: an unshifted negative hash (j = 0)
            // has remainder -1 even when its lowest bit is set
            j => when(ushr(h, j.cast("int")).bitwiseAND(lit(1L)) === 1, 1L).otherwise(-1L)),
          (x, y) => x + y))

  /** Fold a **staged** vote array into the 64-bit sign vector. `votes` must
    * be an attribute reference: it sits inside the per-bit lambda and would
    * otherwise be recomputed 64 times per row.
    */
  def simhashFromVotes(votes: Column): Column =
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, j) =>
        acc + when(call_function("element_at", votes, j.cast("int") + 1) > 0,
          shl(lit(1L), j.cast("int"))).otherwise(0L))

  def simhash64(text: Column): Column =
    simhashFromVotes(simhashVotes(TextOps.tokens(text)))

  /** Same SimHash in plain Scala (same tokenization, same xxhash64 family
    * via Spark's XXH64 with the Column default seed 42). The interpreted
    * higher-order-function form cannot be kept out of constraint-inferred
    * filters — Catalyst substitutes the full expression into pushed-down
    * `isnotnull` predicates, re-evaluating the 64×|tokens| vote loop per
    * row per predicate — so the hot path hashes in compiled code instead.
    */
  def simhash64Scala(text: String): Long = {
    val votes = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var sh = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sh |= (1L << j); j += 1 }
    sh
  }

  /** Near-duplicate pairs by SimHash Hamming distance ≤ `maxHamming`,
    * blocked on 16-bit chunks (pigeonhole: any pair within Hamming 3 shares
    * at least one of 4 chunks) so candidate generation is a join on short
    * keys, never n².
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsImpl(df, textCol, idCol, maxHamming, simhash64Scala, bits = 64)

  /** [[simhashPairs]] over the md5-nibble simhash ([[simhash60Md5Scala]]) —
    * IDENTICAL blocking, verification and pairing code, but every step of
    * the hash is replayable in any engine with md5 (the DuckDB oracle
    * recomputes the full pair set brute-force and hash-matches it), so the
    * whole simhash pairing path sits under a cross-engine content check.
    * Production corpora should prefer [[simhashPairs]]: xxhash64 is several
    * times faster per token than MessageDigest md5, and at 100 TB the
    * token-hash throughput is the cost of the signature scan.
    */
  def simhashPairsReplayable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsImpl(df, textCol, idCol, maxHamming, simhash60Md5Scala, bits = 60)

  /** Shared pairing machinery: compiled per-row signature kernel, 4-chunk
    * pigeonhole blocking (exact for `maxHamming` ≤ 3: a pair differing in
    * ≤ 3 bits matches in at least one of 4 chunks), id-ordered verified
    * pairs. `bits` must be divisible by 4.
    */
  private def simhashPairsImpl(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int,
      kernel: String => Long,
      bits: Int): DataFrame = {
    requireIntegralId(df, idCol)
    val sp = df.sparkSession
    import sp.implicits._
    // typed map: compiled per-row hashing that no optimizer rule can clone
    // into pushed-down predicates (see simhash64Scala); null text carries no
    // tokens to hash, so those rows exit here instead of NPE-ing the kernel.
    // densifyCpu: widen-only on scans, explicit AQE-exempt width on derived
    // inputs (a fixed repartition(defaultParallelism) shrank wide scans at
    // 100 TB; plain densify let AQE collapse this CPU-dense stage to 1 task)
    val sh = Partitioning.densifyCpu(
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).cast("long").as("id"), col(textCol).as("text")))
      .as[(Long, String)]
      .map { case (id, text) => (id, kernel(text)) }
      .toDF("id", "sh")
    hammingPairs(sh, maxHamming, bits)
  }

  /** The blocking+verify half of the simhash pairing, reusable for ANY
    * per-row bit signature (simhash, perceptual dHash, …): 4-chunk
    * pigeonhole candidate join over a pre-hashed `(id, sh)` frame, exact
    * popcount verify, id-ordered distinct pairs. Exact for
    * `maxHamming ≤ 3`: a pair differing in ≤ 3 bits agrees on at least
    * one of 4 chunks.
    */
  private[ops] def hammingPairs(
      sh: DataFrame,
      maxHamming: Int,
      bits: Int): DataFrame = {
    require(maxHamming <= 3, s"4-chunk pigeonhole blocking is exact only for maxHamming <= 3")
    val chunkBits = bits / 4
    val mask = (1L << chunkBits) - 1
    val chunked = sh.select(
      col("id"),
      col("sh"),
      explode(
        transform(
          sequence(lit(0), lit(3)),
          c => struct(
            c.as("chunk"),
            call_function("shiftrightunsigned", col("sh"), c.cast("int") * chunkBits)
              .bitwiseAND(lit(mask)).as("ch"))))
        .as("b"))
      .select(col("id"), col("sh"), col("b.chunk"), col("b.ch"))
    val a = chunked.select(col("chunk"), col("ch"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("ch"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "ch"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** 60-bit simhash whose token hash is the first 15 hex nibbles of md5 —
    * every step (lowercase, `\s+` split, md5, nibble→bit mapping, ±1
    * votes, sign fold) is exactly replayable in any SQL engine with md5,
    * which is what puts [[simhashPairsReplayable]] under the DuckDB
    * oracle. Bit position `4k + b` carries bit `b` (LSB-first) of hex
    * nibble `k` (hex-string order), so the cross-engine mapping needs no
    * integer parse of the digest. 60 bits = 4 pigeonhole chunks of 15.
    */
  // one digest instance per executor thread: getInstance does a JCA
  // provider lookup + allocation, a pure per-row tax in the signature scan
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def simhash60Md5Scala(text: String): Long = {
    val votes = new Array[Int](60)
    val md = md5Local.get()
    text.toLowerCase.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        md.reset()
        val digest = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var k = 0
        while (k < 15) {
          // hex nibble k: high nibble of byte k/2 when k even, low when odd
          val byte = digest(k / 2) & 0xff
          val v = if (k % 2 == 0) byte >>> 4 else byte & 0xf
          var b = 0
          while (b < 4) {
            if (((v >>> b) & 1) == 1) votes(4 * k + b) += 1 else votes(4 * k + b) -= 1
            b += 1
          }
          k += 1
        }
      }
    }
    var sh = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) sh |= (1L << j); j += 1 }
    sh
  }

  /** Exact n-gram Jaccard similarity pairs within a blocking key (e.g. same
    * source) — the brute-force-within-bucket baseline for corpora where a
    * natural partition bounds the pair count.
    */
  /** Sorted distinct xxhash64 values of the char n-gram shingles of `text`,
    * in COMPILED code — bit-identical to the Column formulation
    * `array_sort(array_distinct(transform(charShinglesOfNorm(normalize(t),n),
    * xxhash64)))` (the DuckDB oracle replays that semantics), but without
    * the per-shingle interpreted HOF dispatch that dominated the profile:
    * same Locale.ROOT lowercase, same `\s+`→single-space regex, CODE-POINT
    * windows (Spark's `substr`/`length` count code points, not UTF-16
    * units), `len ≤ n` ⇒ the single shingle is the whole string, and the
    * same XXH64 family with the Column default seed 42.
    */
  private[ops] def shingleHashes(text: String, n: Int): Array[Long] = {
    val norm = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ").trim
    val cps = norm.codePoints().toArray
    val count = math.max(cps.length - n, 0) + 1
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, cps.length)
      val s = new String(cps, i, end - i)
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var r = 0; var w = 0
    while (r < hs.length) {
      if (w == 0 || hs(w - 1) != hs(r)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** Sub-blocks a block of `cnt` docs splits into: 1 (no split) until the
    * block outgrows `target`, then enough that each sub-block holds ~target
    * docs, capped at `maxSplits` (shuffle volume grows linearly with the
    * split factor — each doc ships to G tasks).
    */
  private[ops] def subBlocks(cnt: Long, target: Int, maxSplits: Int): Int =
    math.min(maxSplits.toLong, math.max(1L, (cnt + target - 1) / target)).toInt

  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int,
      threshold: Double,
      targetBlockSize: Int = 4096,
      maxSplits: Int = 16): DataFrame =
    blockedNgramPairs(df, textCol, idCol, blockCol, n, threshold,
      targetBlockSize, maxSplits, containment = false)
      .withColumnRenamed("score", "jaccard")

  /** Containment near-dup pairs: score = |A∩B| / min(|A|, |B|) over word
    * n-gram shingle sets — the ASYMMETRIC companion of [[ngramJaccardPairs]].
    * Symmetric Jaccard under-scores doc-inside-doc duplication (a short
    * article quoted whole inside a long page has high containment but low
    * Jaccard because the union is large); containment is the standard
    * detector for quotation/expansion/syndication shapes. Same triangular
    * block decomposition and compiled merge kernel; the Jaccard size
    * prefilter is deliberately ABSENT (radically different sizes are
    * exactly the pairs containment exists to keep).
    */
  def ngramContainmentPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int,
      threshold: Double,
      targetBlockSize: Int = 4096,
      maxSplits: Int = 16): DataFrame =
    blockedNgramPairs(df, textCol, idCol, blockCol, n, threshold,
      targetBlockSize, maxSplits, containment = true)
      .withColumnRenamed("score", "containment")

  private def blockedNgramPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int,
      threshold: Double,
      targetBlockSize: Int,
      maxSplits: Int,
      containment: Boolean): DataFrame = {
    require(targetBlockSize > 0 && maxSplits > 0)
    val sp = df.sparkSession
    import sp.implicits._
    // shingle in a compiled typed map (see shingleHashes): hashes to sorted
    // Long arrays, so the pair stage runs a compiled two-pointer merge
    // instead of per-pair interpreted array_intersect (the pair count is
    // inherently quadratic per block — the per-pair constant decides
    // throughput). Null text/block rows drop here: SQL join semantics pair
    // them with nothing.
    val base = df
      .select(col(blockCol).cast("string").as("blk"), col(idCol).cast("long").as("id"),
        col(textCol).as("text"))
      .filter(col("blk").isNotNull && col("text").isNotNull)
    val s = base
      .as[(String, Long, String)]
      .mapPartitions(_.map { case (blk, id, text) => (blk, id, shingleHashes(text, n)) })
      .toDF("blk", "id", "sh")
    // TRIANGULAR sub-block decomposition for blocks above targetBlockSize:
    // one giant block would otherwise serialize into a single task. Docs
    // land in G = subBlocks(|block|) groups by id-hash; every unordered
    // sub-block pair (ga ≤ gb) becomes its own task, so a block fans out to
    // G(G+1)/2 tasks of ~(|block|/G)² pair work while each doc ships to
    // exactly G of them. Pair coverage is exact and duplicate-free: a pair
    // within one sub-block appears only in (g,g); across sub-blocks only in
    // (min,max).
    // per-block sizes from the CHEAP pre-shingle projection (counting off
    // `s` would run the shingle map twice), broadcast back onto `s` so the
    // shingled rows never shuffle for the join — the count relation is one
    // row per distinct block
    val counts = base.groupBy("blk").agg(count(lit(1)).as("__cnt"))
    val tgt = lit(targetBlockSize.toLong); val mx = lit(maxSplits.toLong)
    val keyed = s
      .join(broadcast(counts), "blk")
      .withColumn("__g", least(mx, greatest(lit(1L), ceil(col("__cnt") / tgt)))
        .cast("int"))
      .withColumn("g", pmod(xxhash64(col("id")), col("__g").cast("long")).cast("int"))
      .select(
        col("blk"), col("id"), col("sh"), col("g"),
        explode(
          array_distinct(transform(
            sequence(lit(0), col("__g") - 1),
            o => struct(least(col("g"), o).as("ga"), greatest(col("g"), o).as("gb")))))
          .as("t"))
      .select(col("blk"), col("t.ga"), col("t.gb"), col("g"), col("id"), col("sh"))
    // per-task compiled kernel: a self-join would materialize every pair
    // with both 2KB arrays (O(pairs·|sh|) bytes through the pipeline);
    // grouping deserializes each doc once and runs the O(pairs) double loop
    // in compiled code. A task buffers one sub-block pair (~2·targetBlockSize
    // docs) — that, not the whole block, is the executor-memory contract.
    keyed
      .as[(String, Int, Int, Int, Long, Array[Long])]
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key, it) =>
        val (_, ga, gb) = key
        val out = Vector.newBuilder[(Long, Long, Double)]
        def pair(ia: Long, sa: Array[Long], ib: Long, sb: Array[Long]): Unit = {
          // size prefilter (Jaccard only): j >= t needs |A|/|B| in [t, 1/t].
          // Containment must NOT prefilter on size — disparate sizes are
          // precisely its target pairs.
          val minLen = math.min(sa.length, sb.length).toDouble
          val maxLen = math.max(sa.length, sb.length).toDouble
          if (minLen > 0 && (containment || minLen / maxLen >= threshold)) {
            var i = 0; var j = 0; var inter = 0
            while (i < sa.length && j < sb.length) {
              if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
              else if (sa(i) < sb(j)) i += 1
              else j += 1
            }
            val sc =
              if (containment) inter.toDouble / minLen
              else inter.toDouble / (sa.length + sb.length - inter)
            if (sc >= threshold) out += ((math.min(ia, ib), math.max(ia, ib), sc))
          }
        }
        if (ga == gb) {
          val ds = it.map(t => (t._5, t._6)).toArray.sortBy(_._1)
          var x = 0
          while (x < ds.length) {
            var y = x + 1
            while (y < ds.length) { pair(ds(x)._1, ds(x)._2, ds(y)._1, ds(y)._2); y += 1 }
            x += 1
          }
        } else {
          val (as, bs) = it.toArray.partition(_._4 == ga)
          var x = 0
          while (x < as.length) {
            var y = 0
            while (y < bs.length) { pair(as(x)._5, as(x)._6, bs(y)._5, bs(y)._6); y += 1 }
            x += 1
          }
        }
        out.result().iterator
      }
      .toDF("id_a", "id_b", "score")
      .withColumn("score", round(col("score"), 4))
  }

  /** Digest sets up to this size take [[exceptContentOf]]'s exact broadcast
    * path: 128 bits each, packed primitive, so the cap is a 64 MB broadcast.
    */
  val MaxExactDigests: Int = 4 * 1024 * 1024

  /** Remove rows whose content already appears in a REFERENCE corpus — the
    * eval-set-decontamination step every training pipeline runs. Equality is
    * md5-of-content (128-bit: collisions out of reach, and the oracle can
    * replay the digest verbatim).
    *
    * Scale shape, two regimes — both keep the big corpus map-side only
    * (it never shuffles; only a broadcast ships):
    *
    *  - ref digest set ≤ [[MaxExactDigests]] (the normal shape — a
    *    decontamination ref is an eval set, orders of magnitude smaller
    *    than the corpus): ONE capped scan parses and SORTS the digests
    *    cluster-side, collects them as packed primitive `Array[Long]`
    *    chunks of 128-bit pairs (~16 bytes each — the driver never holds
    *    per-String objects) and broadcasts; membership is a binary-search
    *    probe per corpus row. Exact, one pass over the ref, NO
    *    cached/persisted state left behind. Null content rows in the ref
    *    are dropped in the query (they can match nothing), so the cap
    *    check is exact.
    *  - bigger refs: a Bloom filter (~9.6 bits per doc at 1% fpp, ~27×
    *    smaller than raw digests) prefilters map-side and only bloom hits
    *    pay an exact confirm join that removes the false positives. The
    *    ref digest plan is scanned per pass, never persisted — pinning
    *    cached blocks for the session's lifetime was the worse trade.
    *
    * The probe is the one deliberate UDF family in this codebase: sketch /
    * packed-array lookups have no Column-expression form, and one primitive
    * call per row beats shuffling the corpus. Broadcasts are reclaimed by
    * the ContextCleaner once the returned plan is dropped.
    */
  def exceptContentOf(
      df: DataFrame,
      contentCol: String,
      ref: DataFrame,
      refContentCol: String,
      fpp: Double = 0.01,
      maxExact: Int = MaxExactDigests): DataFrame = {
    // nulls out of the digest set IN THE QUERY, before the capped pull: a
    // null content row digests to null and can match nothing, but if it
    // survived to the driver-side filter it would eat one slot of the
    // limit(cap+1) probe and make an over-cap ref look exactly-at-cap —
    // silently truncating the digest set (rows beyond the cap would not
    // be decontaminated)
    val refH = ref.select(md5(col(refContentCol)).as("__h"))
      .filter(col("__h").isNotNull).distinct()
    val withH = df.withColumn("__h", md5(col(contentCol)))
    // capped pull: one over the cap proves "too big" without an unbounded
    // driver collect. Parse AND sort distributed — the driver receives only
    // packed primitive Array[Long] chunks (16 bytes per digest), never
    // cap-many Row+String objects (~400 MB transient at the 4M cap).
    val sp = df.sparkSession
    import sp.implicits._
    // sign-flip trick: signed order on (hi ^ MIN, lo ^ MIN) equals unsigned
    // order on the raw bits, so the cluster-side orderBy, the concatenation
    // below, and the probe's plain Long compares all agree on one order
    val parts = refH.limit(maxExact + 1)
      .as[String]
      .map { h =>
        (java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16) ^ Long.MinValue,
          java.lang.Long.parseUnsignedLong(h.substring(16, 32), 16) ^ Long.MinValue)
      }
      .toDF("hi", "lo").orderBy("hi", "lo")
      .as[(Long, Long)]
      .mapPartitions { it =>
        val b = Array.newBuilder[Long]
        it.foreach { case (hi, lo) => b += hi; b += lo }
        Iterator.single(b.result())
      }
      .collect() // range-sorted partitions collect in order ⇒ concat is globally sorted
    val n = { var s = 0; parts.foreach(s += _.length); s / 2 }
    if (n <= maxExact) {
      // exact path: flipped digests as sorted (hi, lo) pairs at [2i], [2i+1]
      val flat = new Array[Long](2 * n)
      var off = 0
      parts.foreach { a => System.arraycopy(a, 0, flat, off, a.length); off += a.length }
      val bc = sp.sparkContext.broadcast(flat)
      val contains = udf { (h: String) =>
        h != null && {
          val arr = bc.value
          val hi = java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16) ^ Long.MinValue
          val lo = java.lang.Long.parseUnsignedLong(h.substring(16, 32), 16) ^ Long.MinValue
          var a = 0; var b = arr.length / 2 - 1; var found = false
          while (a <= b && !found) {
            val m = (a + b) >>> 1
            val mh = arr(2 * m)
            val c =
              if (mh != hi) java.lang.Long.compare(mh, hi)
              else java.lang.Long.compare(arr(2 * m + 1), lo)
            if (c == 0) found = true else if (c < 0) a = m + 1 else b = m - 1
          }
          found
        }
      }
      withH.filter(!contains(col("__h"))).drop("__h")
    } else {
      // big-ref fallback: bloom prefilter + exact confirm join. The digest
      // plan is evaluated per pass (count, bloom, confirm) instead of
      // persisted — decontamination refs this large are rare, and leaked
      // cached blocks across a long session cost more than the rescans.
      val expected = math.max(refH.count(), 1L)
      val bloom = refH.stat.bloomFilter("__h", expected, fpp)
      val bc = df.sparkSession.sparkContext.broadcast(bloom)
      val mightContain = udf((h: String) => h != null && bc.value.mightContainString(h))
      val clean = withH.filter(!mightContain(col("__h")))
      val flagged = withH.filter(mightContain(col("__h")))
      // exact confirm: only bloom hits (small by construction) reach this
      // join; false positives survive it, true duplicates do not
      val survivors = flagged.join(refH, Seq("__h"), "left_anti")
      clean.unionByName(survivors).drop("__h")
    }
  }

  /** Keep one row per exact-duplicate group, generic version: survivor is
    * the first row by `orderCol` within each `keyCols` group.
    */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** A pair graph with at most this many (symmetric) edges resolves in ONE
    * compiled union-find task instead of the distributed loop — see
    * [[duplicateClusters]]. The task's memory is driven by NODES, not
    * edges: the two open-addressed LongMaps (parent + seen) hold up to one
    * entry per distinct node, and with power-of-two arrays at ≤½ load plus
    * a transient doubling copy the realistic peak is ~100 bytes/node. In
    * the worst case (every edge touching fresh nodes) distinct nodes ≈
    * edge count, so 8M edges ⇒ ≲ 0.8 GB peak for the one task — safely
    * inside an executor; beyond that the distributed min-label loop wins
    * anyway because the single task is also a serial CPU bottleneck.
    */
  val SingleTaskEdgeLimit: Long = 8L * 1024 * 1024

  /** Duplicate clusters from near-dup pairs: connected components.
    * Greedy pair-dropping ([[dedupByMinhash]]) over-deletes transitive
    * chains (B~A and C~B drops both B and C even when C≁A);
    * cluster-then-keep-one is the standard resolution step.
    *
    * Two regimes, chosen by measured edge count. The pair graph is tiny
    * next to the corpus BY CONSTRUCTION (only near-duplicates pair), so
    * the normal case — even at 100 TB corpus scale — is a graph that fits
    * one task: a compiled path-compressed union-find over the edge
    * iterator, one Spark job, exact. Distributed iteration only wins when
    * the edge list itself is huge (≥ [[SingleTaskEdgeLimit]]); that path
    * is min-label propagation with POINTER HALVING (label ← label(label)
    * each round), converging in O(log diameter) rounds of small joins,
    * each round `localCheckpoint`ed to truncate lineage and unpersisted
    * when superseded. Convergence is detected by the label-sum checksum —
    * labels only ever decrease, so an unchanged sum IS the fixpoint. The
    * returned labels stay block-manager-resident; at 100 TB you'd write
    * them to a table anyway.
    *
    * @param pairs near-dup pairs with `id_a`/`id_b` columns
    * @return (id, cluster) — cluster is the component's minimum id; ids
    *         absent from `pairs` are absent here (singletons keep
    *         themselves, see [[dedupByClusters]])
    */
  def duplicateClusters(
      pairs: DataFrame,
      maxIter: Int = 20,
      singleTaskLimit: Long = SingleTaskEdgeLimit): DataFrame = {
    // Pin the PAIRS first: the symmetric union below consumes the input
    // plan TWICE, and without this pin the whole upstream pair
    // generation (an LSH bucket join, the prefix-join candidate+verify
    // stages, ...) executes once per branch — measured in round 11 as
    // pipeline_exact_dedup running 80 s at sf1 while its standalone
    // prefix-join core ran 56 s (partial exchange reuse hid the rest).
    // Pairs are cluster-graph-sized, so the extra materialization is
    // noise next to one re-execution of the generator.
    val p = pairs
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
      .localCheckpoint(true)
    // Checkpoint the symmetric edge list ONCE: both regimes read it more
    // than once, and without materialization every read re-executes its
    // upstream plan.
    val edges = p
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    // p served only to feed the (eager) edges checkpoint above — release
    // it now, matching the unpersist discipline edges/cand/labels follow,
    // so no pair-sized block outlives the call.
    org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(p)
    if (edges.count() <= singleTaskLimit) {
      val sp = pairs.sparkSession
      import sp.implicits._
      val labels = edges
        .as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          // path-compressed union-find; roots are component minima because
          // union always points the LARGER root at the smaller one
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
            r
          }
          val seen = scala.collection.mutable.LongMap.empty[Unit]
          it.foreach { case (s, d) =>
            seen.update(s, ())
            val rs = find(s); val rd = find(d)
            if (rs != rd) {
              if (rs < rd) parent(rd) = rs else parent(rs) = rd
            }
          }
          seen.keysIterator.map(n => (n, find(n)))
        }
        .toDF("id", "cluster")
        .localCheckpoint(true) // edges are unpersisted below: sever the lineage
      org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(edges)
      return labels
    }
    var labels = edges
      .select(col("src").as("id"))
      .distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    // Convergence via label checksum: min-label propagation only ever
    // DECREASES labels, so the sum is strictly monotone until fixpoint —
    // one tiny aggregate replaces the join-and-compare job. Decimal sum:
    // immune to Long overflow at any node-id magnitude.
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster").cast("decimal(38,0)"))).head.getDecimal(0)
    var prev = checksum(labels)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val viaNbr = edges
        .join(labels, edges("dst") === labels("id"))
        .select(col("src").as("id"), col("cluster"))
      // materialized per round: the hop below reads it twice (self-join),
      // and joining the raw union+agg plan against itself trips Catalyst's
      // Union constraint rewriting besides re-executing the round's work
      val cand = viaNbr
        .union(labels)
        .groupBy("id")
        .agg(min("cluster").as("cluster"))
        .localCheckpoint(true)
      // Pointer halving: follow each candidate label one hop through the
      // candidate mapping itself (label ← label(label)). Chains contract
      // geometrically — O(log diameter) rounds instead of O(diameter) —
      // and each round is still just joins on the tiny label/edge sets.
      val candB = cand.select(col("id").as("cid"), col("cluster").as("ccl"))
      val next = cand
        .join(candB, cand("cluster") === candB("cid"), "left")
        .select(
          cand("id"),
          least(cand("cluster"), coalesce(col("ccl"), cand("cluster"))).as("cluster"))
        .localCheckpoint(true)
      val s = checksum(next)
      converged = s == prev
      prev = s
      org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(cand)
      org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(labels)
      labels = next
      i += 1
    }
    org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(edges)
    labels
  }

  /** Keep exactly one survivor (the minimum id) per duplicate cluster:
    * rows whose id is a cluster label survive, other clustered rows drop,
    * singletons (no near-dup at all) pass through.
    */
  def dedupByClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = duplicateClusters(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware cluster canonicalization: per duplicate cluster, elect
    * the REPRESENTATIVE under the deterministic total order
    * (quality DESC, id ASC) — the curation policy real pipelines want
    * ([[dedupByClusters]]'s min-id survivor is arbitrary; "keep the
    * longest / highest-quality copy, drop the syndicated fragments" is the
    * documented choice in C4/RefinedWeb-style dedup). One row per cluster:
    * `(cluster, rep_id, rep_quality, n_members)`.
    *
    * `quality` carries one (id, quality) row per clustered id; ids missing
    * from it rank below all present ones (nulls last), so a partial score
    * table still elects deterministically.
    *
    * Scale shape: clusters are pair-graph-sized (already ≪ corpus); one
    * key join against the score projection and one per-cluster window over
    * member counts — no corpus-sized motion at all. Election inside a
    * cluster is a window over its members; cluster sizes are near-dup
    * community sizes, bounded in practice by the blocking that built the
    * pair graph.
    *
    * No reference analog — pipeline-extension layer.
    */
  def canonicalClusters(
      pairs: DataFrame,
      quality: DataFrame,
      idCol: String,
      qualityCol: String): DataFrame = {
    val members = duplicateClusters(pairs)
    val scored = members.join(
      quality.select(col(idCol).cast("long").as("id"), col(qualityCol).as("__q")),
      Seq("id"), "left")
    val elect = Window.partitionBy("cluster")
      .orderBy(col("__q").desc_nulls_last, col("id").asc)
    scored
      .withColumn("__rn", row_number().over(elect))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy("cluster")))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("id").as("rep_id"),
        col("__q").as("rep_quality"), col("n_members"))
  }

  /** N-gram-overlap decontamination report — the published eval-leakage
    * gate (GPT-3 appx C / PaLM style): a training document is contaminated
    * when it shares at least `minOverlap` distinct word `n`-grams with the
    * reference (eval) corpus. Exact-digest decontamination
    * ([[exceptContentOf]]) only catches verbatim copies; the n-gram gate
    * catches partial inclusions — an eval question quoted inside a longer
    * page — which is what actually leaks benchmarks.
    *
    * Output: one row per corpus row — (id, n_hit_grams, contaminated) —
    * the audit report; filter on `contaminated` to drop.
    *
    * Scale shape: the reference's distinct gram set is eval-set-sized
    * (orders of magnitude smaller than the corpus) and is BROADCAST; the
    * corpus tokenizes and explodes its grams map-side, probes the
    * broadcast, and only per-id hit counts — map-side-combined longs —
    * reach the one aggregate shuffle. The corpus text itself never
    * shuffles. A reference too large to broadcast should drop the hint
    * and let the join shuffle (not this method's shape: eval sets are
    * small by definition).
    *
    * Documents with fewer than `n` tokens carry no n-gram and cannot be
    * flagged (grams are not padded); null text rows report 0 hits.
    */
  def ngramOverlapOf(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      ref: DataFrame,
      refContentCol: String,
      n: Int,
      minOverlap: Int = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    // distinct grams per doc: stage tokens as an attribute first — an
    // inline tokens() would re-run the regex split once per gram
    def grams(c: DataFrame, content: String, out: String): DataFrame =
      c.filter(col(content).isNotNull)
        .withColumn("__ws", TextOps.tokens(col(content)))
        .select(col("*"), explode(array_distinct(
          TextOps.wordNgramsAllOfTokens(col("__ws"), n))).as(out))
    val refGrams = grams(ref, refContentCol, "__g").select("__g").distinct()
    val hits = grams(df.select(col(idCol), col(contentCol)), contentCol, "__g")
      .select(col(idCol), col("__g"))
      .join(broadcast(refGrams), "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_grams"))
    df.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") >= minOverlap)
  }

  /** Per-document EXACT duplicated-substring signal (the "dedupe text
    * overlaps" measurement of Lee et al., Deduplicating Training Data
    * Makes Language Models Better): for every document, the fraction of
    * its distinct word `n`-grams that occur in at least one OTHER
    * document. Near-1 scores mark syndicated/quoted/templated text that
    * document-level dedup keeps (the docs differ) but substring-level
    * training duplication still hurts.
    *
    * Scale shape: the gram table is generated ONCE (tokenize + shingle +
    * md5 is the dominant CPU at corpus scale — a join-back formulation
    * would generate it twice) and digested map-side, so the one gram-sized
    * shuffle moves (id, 128-bit digest) pairs, never gram text: a
    * count-over-digest window labels every gram row with its document
    * frequency right where the shuffle landed it, and the per-doc
    * aggregate partial-combines map-side before re-keying by id (doc-count
    * sized). The corpus text itself never shuffles. A gram duplicated
    * across millions of documents just makes one window partition long —
    * the count streams, no per-key state.
    *
    * Counting is per-DOCUMENT (distinct grams; a doc repeating its own
    * phrase is [[graft.ops.TextOps.dupUnitFraction]]'s intra-doc signal,
    * not this one). Docs with fewer than `n` tokens have zero grams and
    * report dup_frac 0; null text likewise. One division of exact integer
    * counts — bit-exact cross-engine.
    *
    * @return (id, n_grams, n_dup_grams, dup_frac) — one row per input row
    */
  def dupNgramStats(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // the typed kernel carries the id as Long — non-integral ids must fail
    // loudly, not cast to null (the duplicateSpans contract)
    requireIntegralId(df, idCol)
    // compiled gram kernel — see [[duplicateSpans]]; per-doc distinct
    // happens in the kernel (same strings, order irrelevant downstream).
    // densifyCpu: widen-only on scans, explicit AQE-exempt width on derived
    // inputs — see that helper's doc for the cascade measurement
    val sp = df.sparkSession
    import sp.implicits._
    val grams = Partitioning.densifyCpu(
      df.filter(col(contentCol).isNotNull)
        .select(col(idCol).cast("long"), col(contentCol).cast("string")))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, TextOps.wordNgramsAllScala(text, n).distinct)
      }
      .toDF(idCol, "__gs")
      .select(col(idCol), explode(col("__gs")).as("__g"))
      .select(col(idCol), md5(col("__g")).as("__d"))
    // grams are per-doc distinct already, so the per-digest row count IS
    // the distinct-document frequency — no distinct aggregation state
    val perDoc = grams
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("__d")))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum((col("__df") >= 2).cast("long")).as("n_dup_grams"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
      .withColumn(
        "dup_frac",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_dup_grams").cast("double") / col("n_grams")))
  }

  /** C4-style corpus-frequency boilerplate removal: split every document
    * into consecutive `unitWords`-word tiles, count in how many DISTINCT
    * documents each tile's text occurs, and strip every occurrence of a
    * tile that appears in at least `minDocFreq` documents — the
    * cookie-banner / nav-menu / footer scrubber (C4 removed any LINE
    * occurring 3+ times in the corpus; the tile generalizes the unit to
    * corpora without line structure — pass the natural unit size for the
    * corpus at hand).
    *
    * Output: one row per INPUT row — (id, clean_text, n_removed) with
    * `clean_text` the surviving tiles rejoined in order (token-normalized:
    * lowercased, whitespace-collapsed — tokenization is the op's domain).
    * A document that is pure boilerplate comes back with an empty string;
    * a null-text document comes back with null text and zero removals.
    * Dropping rows is the caller's policy, never this op's.
    *
    * Scale shape: tiles are digested (md5) map-side so the frequency
    * aggregate shuffles fixed 128-bit keys, never tile text (production
    * lines can be kilobytes). The boilerplate digest set — corpus-frequency
    * ≥ `minDocFreq` collapses it — is BROADCAST back for the strip; the
    * per-doc bad-position lists (only affected docs, only integer
    * positions) are the other aggregate shuffle. The rebuild recomputes
    * tiles from each doc's own staged tokens and drops flagged positions in
    * place; its join of docs against the bad-position lists broadcasts
    * under AQE when the affected-doc set is small (the common case) and
    * only in the everything-is-boilerplate worst case re-shuffles the
    * corpus by id — the inherent floor for a content rewrite.
    */
  def removeBoilerplateUnits(
      df: DataFrame,
      idCol: String,
      textCol: String,
      unitWords: Int,
      minDocFreq: Int): DataFrame = {
    require(unitWords >= 1, s"unitWords must be >= 1, got $unitWords")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val u = unitWords
    def tiles(ws: Column): Column =
      when(coalesce(size(ws), lit(0)) < 1, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), floor((size(ws) - 1) / u).cast("int")),
          k => concat_ws(" ", slice(ws, k * u + 1, lit(u)))))
    val toks = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), TextOps.tokens(col(textCol)).as("__ws"))
    val units = toks.select(
      col("__id"), posexplode(tiles(col("__ws"))).as(Seq("__k", "__u")))
    val bp = units
      .groupBy(md5(col("__u")).as("__h"))
      .agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select("__h")
    val bad = units
      .join(broadcast(bp), md5(col("__u")) === col("__h"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_set(col("__k"))).as("__bad"))
    // positions 0..ntiles-1; MUST be guarded — sequence(0, -1) yields a
    // DESCENDING [0, -1], not an empty array, on a zero-token document
    def positions(ws: Column): Column =
      when(coalesce(size(ws), lit(0)) < 1, array().cast("array<int>"))
        .otherwise(sequence(lit(0), floor((size(ws) - 1) / u).cast("int")))
    val cleaned = toks
      .join(bad, Seq("__id"), "left")
      .select(
        col("__id"),
        concat_ws(
          " ",
          transform(
            filter(
              positions(col("__ws")),
              k => !array_contains(coalesce(col("__bad"), array().cast("array<int>")), k)),
            k => concat_ws(" ", slice(col("__ws"), k * u + 1, lit(u))))).as("clean_text"),
        coalesce(size(col("__bad")), lit(0)).cast("long").as("n_removed"))
    // drive the output from EVERY input row: null-text docs (absent from
    // toks) come back with a null clean_text and zero removals — dropping
    // rows is the caller's policy, never this op's
    df.select(col(idCol).as("__id"))
      .join(cleaned, Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        col("clean_text"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** Per-document MAXIMAL duplicated-substring spans — the ACTION half of
    * the substring-duplication measurement [[dupNgramStats]] reports
    * (Lee et al., Deduplicating Training Data Makes Language Models
    * Better): every maximal token range covered by word `n`-grams that
    * also occur in at least one OTHER document, as half-open token
    * intervals `[span_start, span_end)` — the cut list a substring-level
    * dedup pass applies. Same-document repeats alone do NOT flag a span
    * (intra-doc repetition is [[graft.ops.TextOps.dupUnitFraction]]'s
    * signal); adjacent and overlapping duplicated grams coalesce into one
    * span ([[Snapshot.mergeIntervals]]' gaps-and-islands — touching
    * half-open intervals connect).
    *
    * Scale shape: gram generation is the dominant CPU (one pass,
    * Column-only); the document-frequency count ships (128-bit digest,
    * id) pairs — never gram text — through a map-side-combined distinct +
    * count; positions join back on the digest; the interval merge is ONE
    * doc-keyed shuffle whose windows and rollup share the exchange. A
    * gram shared by millions of docs makes one digest partition long —
    * the count streams, no per-key state.
    *
    * @return (id, span_start, span_end, n_intervals) — token indices,
    *         half-open; docs with no cross-document duplication are absent
    */
  def duplicateSpans(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    requireIntegralId(df, idCol)
    // the positioned-gram table feeds BOTH the frequency count and the
    // join-back — pin one evaluation or tokenize+shingle+md5 runs twice.
    // Gram generation runs COMPILED ([[TextOps.wordNgramsAllScala]] — the
    // Column-HOF form re-tokenized once per gram, see that kernel's doc);
    // md5 stays a Column so digests are the engine's own bit-for-bit.
    val sp = df.sparkSession
    import sp.implicits._
    // densifyCpu: widen-only on scans, explicit AQE-exempt width on derived
    // inputs — see that helper's doc for the cascade measurement
    val grams = Partitioning.densifyCpu(
      df.filter(col(contentCol).isNotNull)
        .select(col(idCol).cast("long"), col(contentCol).cast("string")))
      .as[(Long, String)]
      .map { case (id, text) => (id, TextOps.wordNgramsAllScala(text, n)) }
      .toDF(idCol, "__gs")
      .select(col(idCol), posexplode(col("__gs")).as(Seq("__pos", "__g")))
      .select(col(idCol), col("__pos"), md5(col("__g")).as("__d"))
      .localCheckpoint(true)
    // distinct-document frequency per digest: per-doc distinct first (the
    // same digest repeated within a doc collapses map-side), then a plain
    // count — no distinct-aggregation state at the count
    val dfq = grams
      .select(col("__d"), col(idCol)).distinct()
      .groupBy("__d").agg(count(lit(1)).as("__dfq"))
    val dupPos = grams
      .join(dfq, "__d")
      .filter(col("__dfq") >= 2)
      .select(col(idCol), col("__pos").as("__s"), (col("__pos") + n).as("__e"))
    Snapshot.mergeIntervals(dupPos, idCol, "__s", "__e")
  }

  /** EXACT set-similarity self-join by prefix filtering (the All-Pairs /
    * PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08, public
    * literature): every pair of documents whose distinct word-`n`-gram
    * sets have Jaccard ≥ `threshold`, with NO blocking column, NO
    * LSH recall loss, and NO block-quadratic pair stage. Candidate
    * pruning is LOSSLESS — the result set equals brute force (spec-pinned)
    * — so this is the exact-threshold companion to [[minhashPairs]]
    * (probabilistic recall) and [[ngramJaccardPairs]] (quadratic within
    * caller-chosen blocks).
    *
    * Construction. Shingles get a global rarest-first total order by
    * (document frequency, shingle). Each doc sorts its distinct shingles
    * in that order; with s = |set|, only the first `s − ⌈t·s⌉ + 1` (the
    * PREFIX) are posted to the inverted candidate index. A pair with
    * Jaccard ≥ t shares ≥ ⌈t·max(sa,sb)⌉ elements, which cannot all hide
    * in both suffixes, so prefix-disjoint pairs are provably below
    * threshold. Candidates also pass the length filter
    * `t·sa ≤ sb ∧ t·sb ≤ sa` (ε-guarded so float rounding can only ADMIT
    * a borderline candidate, never drop one — the verify stage is exact
    * and false positives cost one intersection each). Verification then
    * computes |A∩B| once per surviving candidate; one integer division
    * yields the score, bit-exact cross-engine.
    *
    * Why this is the 100 TB shape: frequent shingles — exactly the keys
    * that make a naive token self-join quadratic — sort LAST and fall
    * outside every prefix, so they never generate a candidate; each
    * posting list is bounded by its shingle's own rarity. Total work =
    * one frequency aggregation over the exploded shingles, one per-doc
    * re-sort (both ∝ corpus shingle volume, the same bound as shingling
    * itself), one self-join of the PREFIX postings (∝ (1−t)·volume, with
    * rare-key lists), and verification ∝ candidates — never all pairs.
    * The full shingle arrays join back only onto surviving candidates.
    */
  def prefixJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      n: Int = 3): DataFrame = {
    // the shingle-set table feeds THREE consumers (candidate generation
    // plus both sides of the verify join) and the posting list inside
    // prefixCandidates feeds two — without pinning, the whole tokenize →
    // shingle → frequency-sort chain re-runs per consumer (a 3× A/B at
    // sf0.1). localCheckpoint is the engine's own pin-once discipline; at
    // cluster scale this is exactly the staged table a multi-pass
    // set-similarity join materializes anyway.
    // the declared id layout (the kernel repartitions by id before its
    // compiled map — see prefixShingleSets) makes BOTH verify joins read
    // the heavy shingle-set side exchange-free
    val toks = Partitioning.declarePinnedHash(
      prefixShingleSets(df, textCol, idCol, threshold, n).localCheckpoint(true),
      "id")
    val cand = prefixCandidates(toks, threshold)
    // Explicit-parallelism exchange before the verify joins: candidate
    // rows are ~16 BYTES but cost an array_intersect over full shingle
    // sets each — AQE's bytes-based coalescing (64 MB advisory) would
    // collapse this CPU-bound stage to 2-3 tasks at sf1 (measured:
    // verify 5 s -> 58 s under parallelismFirst=false). An explicit
    // numPartitions repartition is exempt from AQE coalescing, and the
    // id_a hash partitioning is reused by the first verify join; the count
    // floors at the configured shuffle parallelism (exchangeCount) so the
    // candidate set is never squeezed below cluster width.
    cand
      .repartition(Partitioning.exchangeCount(cand), col("id_a"))
      .join(toks.select(col("id").as("id_a"), col("set").as("__sa")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("set").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__sa"), col("__sb"))).as("inter"),
        size(col("__sa")).as("size_a"), size(col("__sb")).as("size_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
  }

  /** Distinct word-`n`-gram sets `(id, set)` for [[prefixJaccardPairs]],
    * as xxhash64 LONGS — shingle text never leaves the shingling
    * expression, so the frequency sort, the posting join and the verify
    * intersections all run on 8-byte keys (the [[blockedNgramPairs]]
    * representation; collision odds ~|sets|²/2⁶⁴, vacuous at verify
    * scale, and a collision can only ADD a candidate or merge two rank
    * keys — verification stays exact over the hash sets). Docs shorter
    * than `n` tokens shingle to [] and exit (an empty set has no Jaccard
    * partner), null text likewise. Split out so the spec can count
    * candidates against the true-pair set.
    */
  private[ops] def prefixShingleSets(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      n: Int): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(n >= 1, s"n must be >= 1, got $n")
    requireIntegralId(df, idCol)
    // COMPILED per-row kernel (the shingleHashes discipline): the Column
    // form — tokens → wordNgramsAllOfTokens → transform(xxhash64) →
    // array_distinct — is a stack of higher-order functions whose lambdas
    // dispatch INTERPRETED per shingle, and it dominated the operator's
    // profile (shingle stage 4.0 s of a 6.2 s warm prefix-join at sf0.1;
    // compiled ≈ 6×). Same tokenization, same gram strings, same
    // xxhash64(seed 42) family; element ORDER inside a set differs
    // (sorted here, first-occurrence there) — no consumer observes it
    // (size / array_intersect size / a (dfq, g) struct sort downstream).
    // The id-hash repartition doubles as the small-input parallelism
    // guard (densify rationale) AND the layout the caller's pin declares;
    // its count floors at the input's own parallelism (exchangeCount) so
    // a wide scan is never SHRUNK to core count at warehouse scale.
    val sp = df.sparkSession
    import sp.implicits._
    val staged = df.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    staged
      .repartition(Partitioning.exchangeCount(staged), col("id"))
      .as[(Long, String)]
      .map { case (id, text) => (id, wordShingleHashSet(text, n)) }
      .toDF("id", "set")
      .filter(size(col("set")) > 0)
  }

  /** Sorted distinct xxhash64 values of the word-`n`-gram shingles of
    * `text` in compiled code — the word-gram sibling of [[shingleHashes]].
    * Tokenization matches [[TextOps.tokens]] (lowercase, `\s+` split,
    * empties dropped); docs shorter than `n` tokens shingle to [] (the
    * [[TextOps.wordNgramsAllOfTokens]] counting-mode contract); gram
    * strings are space-joined token windows hashed with the Column
    * default XXH64 seed 42.
    */
  private[ops] def wordShingleHashSet(text: String, n: Int): Array[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array.emptyLongArray
    else {
      val count = toks.length - n + 1
      val hs = new Array[Long](count)
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, 42L)
        i += 1
      }
      java.util.Arrays.sort(hs)
      var r = 0; var w = 0
      while (r < hs.length) {
        if (w == 0 || hs(w - 1) != hs(r)) { hs(w) = hs(r); w += 1 }
        r += 1
      }
      if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w)
    }
  }

  /** The lossless candidate stage of [[prefixJaccardPairs]]: distinct
    * `(id_a, id_b)` pairs sharing ≥ 1 rarest-first PREFIX shingle and
    * passing the ε-guarded length filter. Superset of all true pairs
    * (spec-pinned), disjoint-prefix pairs provably below threshold.
    */
  private[ops] def prefixCandidates(toks: DataFrame, threshold: Double): DataFrame = {
    val ex = toks.select(col("id"), explode(col("set")).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("dfq"))
    // rarest-first per-doc order: (dfq, shingle) struct sort is a total
    // order, so the prefix is deterministic under any partitioning
    val ordered = ex
      .join(dfreq, "g")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("dfq"), col("g")))).as("st"))
      .select(col("id"), size(col("st")).as("s"),
        transform(col("st"), t => t("g")).as("ranked"))
    // prefix length s − ⌈t·s⌉ + 1; the ε makes an exactly-integral t·s
    // round DOWN at the ceil (longer prefix — conservative direction)
    val preLen = (col("s") - ceil(lit(threshold) * col("s") - lit(1e-9)) + 1).cast("int")
    // the posting list is BOTH sides of the candidate self-join — pin it
    // once (prefix-sized, ≈(1−t)·shingle volume) or the frequency-sort
    // chain above runs twice
    val post = ordered
      .select(col("id"), col("s"),
        posexplode(slice(col("ranked"), lit(1), preLen)).as(Seq("p", "g")))
      .localCheckpoint(true)
    // length filter: J ≥ t forces t·sa ≤ sb ∧ t·sb ≤ sa. POSITION filter
    // (PPJoin): a pair needs overlap α ≥ ⌈t/(1+t)·(sa+sb)⌉, and a match
    // at 0-based prefix positions (pa, pb) bounds α ≤ min(pa,pb) +
    // min(sa−pa, sb−pb) — for a TRUE pair every shared token satisfies
    // the bound (it upper-bounds the true α), so row-filtering before
    // the candidate distinct is lossless. Both ε-guarded: float rounding
    // may only ADMIT borderline candidates, never drop one.
    // explicit-parallelism exchange for the same reason as the verify
    // join (see prefixJaccardPairs): posting rows are tiny in bytes but
    // the hot-key self-join is CPU-bound — don't let bytes-based AQE
    // coalescing starve it (count floored at shuffle parallelism)
    post.repartition(Partitioning.exchangeCount(post), col("g"))
      .select(col("g"), col("id").as("id_a"), col("s").as("s_a"), col("p").as("p_a"))
      .join(post.select(col("g"), col("id").as("id_b"), col("s").as("s_b"), col("p").as("p_b")),
        Seq("g"))
      .filter(col("id_a") < col("id_b") &&
        col("s_b").cast("double") >= lit(threshold) * col("s_a") - lit(1e-9) &&
        col("s_a").cast("double") >= lit(threshold) * col("s_b") - lit(1e-9) &&
        (least(col("p_a"), col("p_b")) +
          least(col("s_a") - col("p_a"), col("s_b") - col("p_b"))).cast("double") >=
          lit(threshold / (1.0 + threshold)) * (col("s_a") + col("s_b")) - lit(1e-9))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS algorithm, public literature): per document, hash every
    * word k-gram and keep the MINIMUM hash of each sliding window of `w`
    * consecutive grams — the guarantee is that any shared run of at
    * least w+k−1 tokens between two documents shares at least one
    * selected fingerprint, at ~1/w the storage of full shingling. The
    * positional variant of [[minhashPairs]]: MinHash estimates set
    * overlap, winnowing LOCALIZES shared substrings.
    *
    * Determinism: gram hashes are md5-derived 60-bit longs (cross-engine
    * replayable, unlike xxhash); window selection is `min(struct(hash,
    * pos))` — the leftmost of equal hashes — so the fingerprint set is a
    * pure function of the text. Shared-fingerprint PAIR counting drops
    * fingerprints seen in more than `maxDf` documents first (boilerplate
    * phrases are exactly the hot keys that would square the join — the
    * prefix-join rare-key argument, applied as an explicit knob).
    *
    * Scale shape: gram hashing is one scan; the window min runs per-doc
    * (doc-keyed shuffle); fingerprints are ~grams/w; the pair join ships
    * (hash, doc) pairs with df-bounded lists. Content never shuffles.
    *
    * @return (id_a, id_b, n_shared) — pairs sharing >= `minShared`
    *         selected fingerprints
    */
  def winnowingPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      maxDf: Int = 10,
      minShared: Int = 2): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    require(maxDf >= 2 && minShared >= 1, s"need maxDf >= 2, minShared >= 1")
    requireIntegralId(df, idCol)
    // the WHOLE per-document selection — tokenize, k-grams, md5-60-bit
    // hashes, window minima, per-doc distinct — runs as one compiled
    // kernel ([[winnowingFingerprints]]): selection is a pure per-doc
    // function, so the former doc-keyed window shuffle + two window
    // passes bought nothing a map can't do, and the Column gram stage
    // re-tokenized per gram (see [[TextOps.wordNgramsAllScala]]).
    // Fingerprint semantics are bit-identical (spec + oracle pinned).
    val sp = df.sparkSession
    import sp.implicits._
    // densifyCpu: widen-only on scans, explicit AQE-exempt width on derived
    // inputs — see that helper's doc for the cascade measurement
    val fps = Partitioning.densifyCpu(
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .map { case (id, text) => (id, winnowingFingerprints(text, k, w)) }
      .toDF("id", "__hs")
      .select(col("id"), explode(col("__hs")).as("h"))
    val rare = fps.groupBy("h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
    val posts = fps.join(rare.select("h"), "h")
    posts.toDF("h", "id_a")
      .join(posts.toDF("h", "id_b"), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Compiled winnowing selection for [[winnowingPairs]] — per document:
    * word k-gram strings (the [[TextOps.wordNgramsAllScala]] tokenization),
    * 60-bit hashes equal to the Column form's
    * `conv(substring(md5(gram),1,15),16,10)` (the first 15 hex nibbles of
    * the md5 digest), the minimum hash of every FULL window of `w`
    * consecutive grams (windows starting at 0..m−w — the partial trailing
    * windows are dropped, matching the `pos ≤ n−w` filter), distinct, in
    * first-selection order. Ties inside a window need no position
    * tie-break here because only the hash value is emitted.
    */
  private[ops] def winnowingFingerprints(text: String, k: Int, w: Int): Array[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val m = toks.length - k + 1
    if (m < w) Array.emptyLongArray
    else {
      val hs = new Array[Long](m)
      val md = md5Local.get()
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        md.reset()
        val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        hs(i) = (h << 4) | ((d(7) & 0xffL) >>> 4)
        i += 1
      }
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      var p = 0
      while (p <= m - w) {
        var best = hs(p)
        var q = p + 1
        while (q < p + w) { if (hs(q) < best) best = hs(q); q += 1 }
        out += best
        p += 1
      }
      out.toArray
    }
  }

}
