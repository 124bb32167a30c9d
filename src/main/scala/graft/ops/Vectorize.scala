package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text vectorization: the hashing-trick term-frequency featurizer
  * (HashingTF) that turns a text column into fixed-dimension sparse
  * vectors without a vocabulary pass — the bridge from the text tables to
  * the embedding/ANN operators when no learned embedding exists yet.
  *
  * No reference analog (the reference has no text featurization) — this
  * is the pipeline-extension layer next to [[Ranking]]/[[Similarity]].
  */
object Vectorize {

  /** Hashing-trick TF vectors in LONG FORM: one row per (id, dimension)
    * with the term-frequency weight and its L2-unit-normalized value.
    * Token t lands in dimension md5_32(salt||t) mod `dim` — no vocabulary
    * is built, so the op is one pass, stateless, and new corpus batches
    * vectorize identically forever (the property a streaming ingest
    * needs; a fitted vocabulary would drift).
    *
    * Long form rather than an array column by design: it is the sparse
    * exchange format — it joins directly into dot-product aggregations
    * (cosine via SUM(a.w*b.w) GROUP BY pair), survives any engine's
    * row-level hashing, and densifies only at the consumer's edge.
    *
    * Cross-engine determinism: tf counts and the squared-sum under the
    * norm stay in LONG space (exact in any order); sqrt and the one
    * division per row are exactly-rounded IEEE — the whole output replays
    * bit-for-bit in DuckDB.
    *
    * Scale shape: explode → (id, dim) partial-combined count (the only
    * corpus-token-sized motion, combiner-reduced to pair form map-side),
    * then a pair-sized window on id for the norm. The text never shuffles.
    */
  def hashTf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int,
      salt: String = "htf"): DataFrame = {
    require(dim > 0, s"dim must be > 0, got $dim")
    val tf = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__w"))
      .withColumn(
        "dim",
        conv(substring(md5(concat(lit(salt), col("__w"))), 1, 8), 16, 10)
          .cast("long") % dim)
      .groupBy(col(idCol), col("dim"))
      .agg(count(lit(1)).as("tf"))
    tf.withColumn(
        "w",
        col("tf").cast("double") /
          sqrt(sum(col("tf") * col("tf")).over(Window.partitionBy(idCol)).cast("double")))
  }
}
