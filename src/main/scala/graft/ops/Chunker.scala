package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: fixed-size sliding token
  * windows with overlap — one output row per chunk. Pure generator
  * expressions (`posexplode` over a computed index range): map-side,
  * shuffle-free, linear in corpus size; the chunk fan-out is bounded by
  * `ceil(tokens/step)` per document.
  */
object Chunker {

  /** @param size    tokens per chunk
    * @param overlap tokens shared between consecutive chunks (< size)
    * @return idCol, chunk_idx, chunk_text, n_chunk_tokens — empty documents
    *         produce no chunks
    */
  def chunkByTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      size: Int,
      overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size)
    val step = size - overlap
    val words = df.select(
      col(idCol),
      TextOps.tokens(col(textCol)).as("__words"))
    words
      .filter(org.apache.spark.sql.functions.size(col("__words")) > 0)
      .select(
        col(idCol),
        col("__words"),
        posexplode(
          sequence(
            lit(0),
            floor((org.apache.spark.sql.functions.size(col("__words")) - 1) / lit(step))
              .cast("int"))).as(Seq("__pos", "chunk_idx")))
      .select(
        col(idCol),
        col("chunk_idx"),
        concat_ws(" ", slice(col("__words"), col("chunk_idx") * step + 1, lit(size)))
          .as("chunk_text"),
        org.apache.spark.sql.functions
          .size(slice(col("__words"), col("chunk_idx") * step + 1, lit(size)))
          .cast("long")
          .as("n_chunk_tokens"))
  }
}
