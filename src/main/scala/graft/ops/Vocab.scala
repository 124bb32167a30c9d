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

  /** Separator for the symbol-sequence encoding of [[bpeLearn]]: every
    * symbol is wrapped `␟sym␟`, so a pair pattern `␟a␟␟b␟` can never match
    * across a symbol boundary, and adjacent matches replace correctly
    * (each match consumes its own delimiters — `␟a␟␟b␟␟a␟␟b␟` rewrites to
    * `␟ab␟␟ab␟` under leftmost non-overlapping replacement, and `a a a`
    * merges to `aa a`, the textbook greedy-BPE order). U+001F cannot occur
    * in whitespace-split tokens.
    */
  private val S = "\u001F"

  /** Iterative BPE vocabulary learning (Sennrich et al. 2016): run `steps`
    * merge rounds, each counting adjacent symbol-pair frequencies over the
    * (frequency-weighted) word vocabulary, electing the most frequent pair
    * under the deterministic (count DESC, pair ASC) order, and rewriting
    * every word's symbol sequence by leftmost non-overlapping replacement —
    * the exact greedy order reference BPE implementations use.
    *
    * Scale shape (the [[wordCounts]] contract): the corpus is scanned ONCE
    * to build the word-count table, which is pinned; every merge round
    * touches only VOCAB-sized data — a pair-count aggregate plus a map-side
    * rewrite — and pulls exactly one elected (pair, count) row to the
    * driver (the decision is vocab-global by definition; same justified
    * 1-row pull as the IVF dim probe). Rewrites compose lazily with a
    * lineage-bounding pin every 8th round (the pageRankExact discipline).
    * Stops early when no pair remains (every word fully merged).
    *
    * @return one row per executed merge: (step, lhs, rhs, pfreq), in step
    *         order — the merge table a tokenizer ships.
    */
  def bpeLearn(df: DataFrame, textCol: String, steps: Int): DataFrame = {
    require(steps >= 1 && steps <= 256, s"steps must be in [1, 256], got $steps")
    var vocab = wordCounts(df, textCol)
      .select(regexp_replace(col("word"), "(.)", S + "$1" + S).as("__sym"), col("wfreq"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val syms = split(regexp_replace(col("__sym"), s"^$S|$S$$", ""), s"$S$S")
      val top = vocab
        .select(explode(adjacentPairs(syms)).as("__pair"), col("wfreq"))
        .groupBy(col("__pair"))
        .agg(sum(col("wfreq")).as("__pf"))
        .orderBy(col("__pf").desc, col("__pair").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val pair = top(0).getString(0)
        val Array(a, b) = pair.split(S)
        merges += ((step, a, b, top(0).getLong(1)))
        vocab = vocab.withColumn("__sym",
          replace(col("__sym"), lit(S + a + S + S + b + S), lit(S + a + b + S)))
        if (step % 8 == 0) vocab = vocab.localCheckpoint(false)
        step += 1
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "pfreq")
  }

  /** Apply a learned merge list to the vocabulary — the TOKENIZE half of
    * the BPE lifecycle ([[bpeLearn]] trains, this segments): every word's
    * symbol sequence is rewritten by the merges IN TRAINING ORDER (each a
    * leftmost non-overlapping replacement, the same kernel), and the
    * per-word symbol count comes back — the quantity token budgets are
    * denominated in. Vocab-sized map work after the one corpus word-count
    * scan.
    *
    * @return (word, wfreq, n_symbols)
    */
  def bpeSegment(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val rewritten = merges.foldLeft(
      regexp_replace(col("word"), "(.)", S + "$1" + S)) { case (sym, (a, b)) =>
      replace(sym, lit(S + a + S + S + b + S), lit(S + a + b + S))
    }
    wordCounts(df, textCol)
      .select(col("word"), col("wfreq"),
        size(split(regexp_replace(rewritten, s"^$S|$S$$", ""), s"$S$S"))
          .cast("long").as("n_symbols"))
  }

  /** Adjacent symbol pairs of a symbol array as `a␟b` strings, duplicates
    * kept (pair count = occurrences × word frequency — the BPE multiset).
    */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(2), size(syms)),
          i => concat(element_at(syms, i - 1), lit(S), element_at(syms, i))))

  /** Vocabulary coverage: per document, total token occurrences and how
    * many fall OUTSIDE the corpus' own top-`vocabSize` words — the OOV
    * signal that decides tokenizer vocab sizes and flags
    * wrong-language/garbage documents (high OOV against the corpus vocab)
    * before training. Counts ship as the exact (n_tokens, n_oov) long
    * pair; the rate is the consumer's division.
    *
    * Determinism: the vocab cut line orders by (freq DESC, word ASC), so
    * boundary ties resolve identically everywhere.
    *
    * Scale shape: the vocab is `vocabSize` rows (TakeOrdered over the
    * word-count aggregate) and BROADCASTS into a map-side membership
    * probe of the exploded token stream; the only corpus-sized shuffles
    * are the two partial-agg'd counts (word build, per-doc tally). Two
    * corpus scans total (vocab pass + tally pass) — inherent to deriving
    * the vocab from the same corpus; pass a pre-built vocab-bearing df
    * to [[wordCounts]] consumers to amortize across runs. Documents with
    * no tokens produce no row (explode semantics).
    */
  def oovRate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val vocab = wordCounts(df, textCol)
      .orderBy(col("wfreq").desc, col("word"))
      .limit(vocabSize)
      .select(col("word"), lit(1).as("__in"))
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999 — the n-gram-LM smoothing standard) with the
    * discount frozen at d = 3/4 so EVERYTHING is exact integer
    * arithmetic:
    *
    * `P(w|v) = max(c(vw) − d, 0)/c(v) + d·N₁₊(v·)/c(v) · N₁₊(·w)/N`
    *
    * over one common denominator `4·c(v)·N` (N = distinct bigram types):
    * `num = max(4·c(vw) − 3, 0)·N + 3·N₁₊(v·)·N₁₊(·w)`, emitted as
    * `p_kn_ppm = 10⁶·num DIV den`. The continuation counts are what make
    * KN right for pretraining-corpus LMs: a word that appears often but
    * only after one head ("francisco") gets a LOW unseen-context
    * probability.
    *
    * Scale shape: corpus motion is the ONE bigram aggregate; the pair
    * table is pinned (it feeds head stats, tail stats, the type count,
    * and the output join) and everything after it is vocab-sized. The
    * 1-row type count broadcasts; head/tail joins are vocab-keyed.
    * Overflow: `4·max c(v)·N` must fit int64 — corpus size × bigram
    * types, honest to ~10¹⁸ (beyond that, shard by head word).
    *
    * @return (w1, w2, n, p_kn_ppm) for bigrams with c(vw) ≥ `minCount`
    */
  def kneserNeyBigrams(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val bgs = df
      .select(TextOps.tokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__ws"), lit(1), size(col("__ws")) - 1),
        slice(col("__ws"), lit(2), size(col("__ws")) - 1))).as("z"))
      .select(col("z.0").as("w1"), col("z.1").as("w2"))
    val pair = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val heads = pair.groupBy("w1")
      .agg(sum(col("n")).as("__c_head"), count(lit(1)).as("__n_cont_head"))
    val tails = pair.groupBy("w2").agg(count(lit(1)).as("__n_cont_tail"))
    val tot = pair.agg(count(lit(1)).as("__ntot"))
    pair.filter(col("n") >= minCount)
      .join(heads, "w1")
      .join(tails, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n"),
        expr("""(greatest(4 * n - 3, 0L) * __ntot
               | + 3 * __n_cont_head * __n_cont_tail) * 1000000
               |DIV (4 * __c_head * __ntot)""".stripMargin).as("p_kn_ppm"))
  }

  /** Good–Turing frequency re-estimation (Good 1953 — the smoothing that
    * answers "how much probability mass belongs to n-grams we have NOT
    * seen": observed count r is adjusted to `r* = (r+1)·N_{r+1}/N_r`,
    * where `N_r` counts TYPES seen exactly r times; the singleton mass
    * `N_1/N` estimates the unseen-mass). Runs over word `n`-grams — the
    * LM event space the smoothing exists for: unigram counts on a
    * bounded vocabulary have NO sparse frontier (every word frequent →
    * zero rows, the hollow-gate trap), while the n-gram space is
    * combinatorial and its low-count ladder is exactly what GT corrects.
    * Returns one row per low frequency `r ∈ [1, maxR]` present:
    * `(r, n_r, n_r_next, rstar_grid)` with `r*` exact on the 2²⁰ grid
    * (`(r+1)·N_{r+1}·2²⁰ DIV N_r` — pure integer arithmetic, no libm).
    * `n_r_next` is N_{r+1} via an explicit r+1 self-join (NOT a lead
    * window: absent frequencies must read as 0, not skip to the next
    * observed one).
    *
    * Scale shape: one gram explode + count (the [[wordCounts]] shuffle
    * shape), one count-of-counts aggregate (≤ maxR+1 groups after the
    * map-side filter), then joins over a ≤ maxR+1-row frame. Output is
    * maxR-sized at any corpus scale; the re-estimate only MEANS anything
    * for small r (N_r is noisy once sparse), which is why the frontier
    * is capped.
    */
  def goodTuring(df: DataFrame, textCol: String, n: Int = 3, maxR: Int = 10): DataFrame = {
    require(maxR >= 1, s"need maxR >= 1, got $maxR")
    require(n >= 1, s"need n >= 1, got $n")
    // tokens staged as a multi-consumer attribute (size + slices): the
    // regex split runs once per doc, not once per gram
    val freqOfFreq = df
      .filter(col(textCol).isNotNull)
      .withColumn("__ws", TextOps.tokens(col(textCol)))
      .select(explode(TextOps.wordNgramsAllOfTokens(col("__ws"), n)).as("__g"))
      .groupBy("__g")
      .agg(count(lit(1)).as("wfreq"))
      .filter(col("wfreq") <= maxR + 1)
      .groupBy(col("wfreq").as("r"))
      .agg(count(lit(1)).as("n_r"))
      .localCheckpoint(true) // tiny (≤ maxR+1 rows); consumed twice below
    freqOfFreq
      .filter(col("r") <= maxR)
      .join(
        freqOfFreq.select((col("r") - 1).as("r"), col("n_r").as("n_r_next")),
        Seq("r"), "left")
      .select(col("r"), col("n_r"),
        coalesce(col("n_r_next"), lit(0L)).as("n_r_next"),
        expr("(r + 1) * coalesce(n_r_next, 0) * 1048576 DIV n_r")
          .as("rstar_grid"))
  }
}
