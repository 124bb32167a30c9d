package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training primitives over a text corpus: the corpus-scale half
  * of BPE vocabulary learning. The expensive part of a BPE merge step at
  * 100 TB is counting symbol-pair frequencies over the corpus; the merge
  * decision itself is vocab-sized driver work. This op does the corpus
  * part the Spark-shaped way:
  *
  *   corpus → tokens (map-side explode) → word counts (partial-agg
  *   shuffle, WORD-keyed — the only corpus-sized motion, and map-side
  *   combine collapses it to ~vocab size) → per-word adjacent char pairs
  *   weighted by word frequency (vocab-sized explode) → pair counts
  *   (vocab-sized shuffle) → bounded top-k via TakeOrderedAndProject.
  *
  * Everything after the first aggregate touches VOCAB-sized data, never
  * the corpus again — the shape that makes iterated merge steps cheap:
  * re-running on a materialized word-count table costs no corpus scan.
  */
object Vocab {

  /** Distinct words with frequencies — the reusable input to merge steps.
    * One explode + one count aggregate (map-side partials first).
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wfreq"))

  /** All adjacent character pairs of a word as a multiset — duplicates
    * KEPT (each occurrence of a pair in a word counts once per word
    * instance, the BPE definition). Words of length < 2 contribute none.
    */
  private def charPairs(word: Column): Column =
    when(length(word) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(word) - 1), i => word.substr(i, lit(2))))

  /** One BPE merge-step count: adjacent character-pair frequencies over
    * the corpus (pair count = Σ over words of wfreq · occurrences-in-word),
    * top `k` by (count DESC, pair ASC — deterministic at the cut line).
    * This is the initial-alphabet iteration; running it over a
    * symbol-rewritten vocab table gives every later iteration the same
    * shape and cost.
    *
    * @return (pair, pfreq) — `k` rows
    */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame =
    wordCounts(df, textCol)
      .select(explode(charPairs(col("word"))).as("pair"), col("wfreq"))
      .groupBy("pair")
      .agg(sum(col("wfreq")).as("pfreq"))
      .orderBy(col("pfreq").desc, col("pair"))
      .limit(k)
}
