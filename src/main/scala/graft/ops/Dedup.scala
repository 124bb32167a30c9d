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

  /** MinHash signature of `numHashes` permutations over word 3-gram
    * shingles. One xxhash64 family, seeded by position — the standard
    * "k independent hash functions" construction.
    */
  def minhashSignature(text: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(TextOps.wordShingles(text, 3), s => xxhash64(s, j))))

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

  /** Candidate pairs (idA < idB) via MinHash LSH, then exact-Jaccard
    * verification over the shingle sets; only pairs with
    * `jaccard >= threshold` survive. False positives are eliminated by the
    * verification join; false negatives are bounded by the (bands, rows)
    * choice — 16×4 gives ~64% detection at j=0.5 and >99.9% at j=0.9.
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = df
      .select(
        col(idCol).as("id"),
        TextOps.wordShingles(col(textCol), 3).as("shingles"),
        minhashSignature(col(textCol), numHashes).as("sig"))
      .withColumn("bandrow", explode(lshBands(col("sig"), bands, rowsPerBand)))
      .select(col("id"), col("shingles"), col("bandrow.band"), col("bandrow.bh"))
    val a = withSig.select(col("band"), col("bh"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = withSig.select(col("band"), col("bh"), col("id").as("id_b"), col("shingles").as("sh_b"))
    val candidates = a
      .join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
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
  def simhash64(text: Column): Column = {
    // variable shift amounts need call_function: the Scala DSL's
    // shiftrightunsigned/shiftleft only accept Int literals
    def ushr(v: Column, bits: Column): Column = call_function("shiftrightunsigned", v, bits)
    def shl(v: Column, bits: Column): Column = call_function("shiftleft", v, bits)
    val hashes = transform(TextOps.tokens(text), w => xxhash64(w))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(
          acc,
          transform(
            sequence(lit(0), lit(63)),
            j => when(ushr(h, j.cast("int")) % 2 === 1, 1L).otherwise(-1L)),
          (x, y) => x + y))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, j) =>
        acc + when(call_function("element_at", votes, j.cast("int") + 1) > 0,
          shl(lit(1L), j.cast("int"))).otherwise(0L))
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
      maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val chunked = sh.select(
      col("id"),
      col("sh"),
      explode(
        transform(
          sequence(lit(0), lit(3)),
          c => struct(
            c.as("chunk"),
            (call_function("shiftrightunsigned", col("sh"), c.cast("int") * 16) % 65536).as("ch"))))
        .as("b"))
      .select(col("id"), col("sh"), col("b.chunk"), col("b.ch"))
    val a = chunked.select(col("chunk"), col("ch"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("ch"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "ch"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard similarity pairs within a blocking key (e.g. same
    * source) — the brute-force-within-bucket baseline for corpora where a
    * natural partition bounds the pair count.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    val s = df.select(
      col(blockCol).as("blk"),
      col(idCol).as("id"),
      TextOps.charShingles(col(textCol), n).as("sh"))
    val a = s.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = s.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Keep one row per exact-duplicate group, generic version: survivor is
    * the first row by `orderCol` within each `keyCols` group.
    */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
