package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relevance scoring over a document corpus — the retrieval/weighting step
  * of data-curation pipelines (e.g. selecting training documents similar to
  * a quality seed set, as in Brown et al. 2020's data filtering).
  *
  * Scale design: for a FIXED small term set the whole computation is
  * map-side. Per-term term frequencies are independent Column expressions
  * over the staged token array (no explode, no (doc, term) shuffle), and the
  * corpus statistics BM25 needs — N, avgdl, per-term document frequencies —
  * fold into ONE tiny global aggregate (a single row) that broadcasts back
  * over the corpus. The documents table itself never shuffles; the only
  * exchange is the single-row statistics aggregate. At 100 TB that is a scan
  * plus a scalar broadcast — the plan you want.
  */
object Ranking {

  /** Okapi BM25 standard parameters. */
  val K1 = 1.2
  val B = 0.75

  /** BM25 scores for every document matching at least one query term.
    *
    * Output: (idCol, score) — score rounded to 4 decimals: the per-term
    * contributions are summed in fixed term order on both engines, but
    * `ln` may differ in the last ulp across libm implementations, so the
    * oracle comparison needs the rounding.
    *
    * idf uses the "plus one" form `ln(1 + (N - df + 0.5)/(df + 0.5))`
    * (Lucene's variant), which is always positive — stopword-frequent terms
    * contribute little rather than negatively.
    *
    * @param df corpus
    * @param terms the query's terms (lowercase); matched as whole tokens
    */
  def bm25(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = K1,
      b: Double = B): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val staged = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__ws"))
    val tf = staged.select(
      col(idCol) +: size(col("__ws")).as("__dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__ws"), w => w === lit(t))).as(s"__tf$i")
        }: _*)
    // one row: N, Σdl, df per term — everything the score formula needs
    val statsAggs =
      count(lit(1)).as("__n") +: sum(col("__dl")).as("__sumdl") +:
        terms.indices.map(i => sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val stats = tf.agg(statsAggs.head, statsAggs.tail: _*)
    val scored = tf.crossJoin(broadcast(stats))
    val avgdl = col("__sumdl").cast("double") / col("__n")
    val lenNorm = lit(k1) * (lit(1 - b) + lit(b) * col("__dl").cast("double") / avgdl)
    val score = terms.indices
      .map { i =>
        val tfi = col(s"__tf$i").cast("double")
        val idf = log(lit(1.0) +
          (col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
        when(col(s"__tf$i") === 0, lit(0.0))
          .otherwise(idf * tfi * lit(k1 + 1) / (tfi + lenNorm))
      }
      .reduce(_ + _)
    scored
      .filter(terms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col(idCol), round(score, 4).as("score"))
  }

  /** The [[bm25]] computation as DuckDB SQL over table `documents` — same
    * staging, same fixed-order contribution sum, same rounding.
    */
  def bm25Sql(
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = K1,
      b: Double = B): String = {
    // terms embed verbatim in generated SQL — restrict to token-safe
    // characters so a quote can never break (or inject into) the oracle
    require(
      terms.forall(_.matches("[a-z0-9_-]+")),
      s"bm25Sql terms must be lowercase token-safe: ${terms.mkString(", ")}")
    val ws = s"list_filter(string_split_regex(lower($textCol), '\\s+'), w -> w != '')"
    val tfCols = terms.zipWithIndex
      .map { case (t, i) => s"len(list_filter(ws, w -> w = '$t')) AS tf$i" }
      .mkString(", ")
    val dfCols = terms.indices
      .map(i => s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
      .mkString(", ")
    val contribs = terms.indices
      .map { i =>
        s"""CASE WHEN tf$i = 0 THEN 0.0 ELSE
           | ln(1 + (n - df$i + 0.5) / (df$i + 0.5)) *
           | CAST(tf$i AS DOUBLE) * ${k1 + 1} /
           | (CAST(tf$i AS DOUBLE) + $k1 * (${1 - b} + $b * CAST(dl AS DOUBLE) / avgdl))
           |END""".stripMargin
      }
      .mkString(" + ")
    s"""WITH staged AS (SELECT $idCol, $ws AS ws FROM documents),
       |tf AS (SELECT $idCol, len(ws) AS dl, $tfCols FROM staged),
       |stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
       |  $dfCols FROM tf)
       |SELECT $idCol, round($contribs, 4) AS score
       |FROM tf, stats
       |WHERE ${terms.indices.map(i => s"tf$i > 0").mkString(" OR ")}""".stripMargin
  }

  /** ABC / Pareto classification: rank keys by an exact long value (grid
    * units — cents, tokens, bytes), accumulate the running share under the
    * deterministic (value DESC, key ASC) total order, and cut classes at
    * `aPct` / `bPct` of the grand total by exact cross-multiplication
    * (`(cum−v)·100 < total·pct` — longs, no division, no doubles in the
    * decision). The inventory/revenue-concentration staple ("which 20% of
    * parts carry 80% of revenue").
    *
    * Class membership uses the "crossing item included" convention: a key
    * belongs to A iff the cumulative share BEFORE it is strictly under
    * `aPct` — so class A is exactly the set of keys that make up the first
    * `aPct`% of value (a single dominant key is A, not C), the Pareto
    * reading.
    *
    * Scale shape — a DISTRIBUTED prefix sum, not a global window: range-
    * repartition on the order, sort within partitions, pin ONE evaluation
    * (`persist` — range boundaries come from sampling, so the two
    * downstream branches must see the same assignment), then per-partition
    * subtotals (a partitions-sized table) turn into running offsets that
    * broadcast back; each row's cumulative is its partition offset plus a
    * PARTITION-LOCAL running-sum window. Every stage is parallel — no
    * single-reducer sort anywhere. Output values depend only on the total
    * order, never on where sampling placed the boundaries.
    *
    * Contract: `valueCol` must be long-typed grid units with
    * `Σ value ≤ Long.Max/100` (exact cross-multiplication headroom) and
    * values ≥ 0; null values are excluded.
    */
  def abcClassify(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      aPct: Int = 80,
      bPct: Int = 95): DataFrame = {
    require(0 < aPct && aPct < bPct && bPct < 100,
      s"need 0 < aPct < bPct < 100, got ($aPct, $bPct)")
    val ordered = df
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(valueCol).cast("long").as("__v"))
      .repartitionByRange(col("__v").desc, col(keyCol).asc)
      .sortWithinPartitions(col("__v").desc, col(keyCol).asc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parts = ordered.groupBy(col("__pid")).agg(sum(col("__v")).as("__ps"))
    val offs = parts
      .withColumn("__off",
        coalesce(
          sum(col("__ps")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    val total = parts.agg(sum(col("__ps")).as("__tot"))
    val wIn = Window.partitionBy("__pid")
      .orderBy(col("__v").desc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered
      .join(broadcast(offs), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn("__cum", col("__off") + sum(col("__v")).over(wIn))
      .select(
        col(keyCol),
        col("__v").as("value_grid"),
        col("__cum").as("cum_grid"),
        when((col("__cum") - col("__v")) * 100 < col("__tot") * aPct, "A")
          .when((col("__cum") - col("__v")) * 100 < col("__tot") * bPct, "B")
          .otherwise("C").as("abc_class"))
  }

  /** χ² term–class feature selection: the top-k tokens most associated
    * with each class (language, source, quality tier) by the 2×2
    * contingency χ² — the classic supervised vocabulary screen (and a
    * classifier-feature shortlist). Output: `(class, token, n_in_class,
    * chi2)`, `topK` rows per class ordered by `(χ² desc, token asc)`.
    *
    * Exactness: a/b/c/d cell counts are exact longs from three partial-agg
    * aggregates; χ² `= N(ad−bc)² / ((a+b)(c+d)·(a+c)(b+d))` combines them
    * in ONE fixed-order double expression (every step correctly-rounded
    * IEEE ⇒ bit-identical across engines and partitionings — the
    * corr_exact discipline), so even the double ORDERING replays.
    *
    * Scale shape: token-instance explode → `(class, token)` counts
    * (map-side partials), a vocabulary-sized token-total rollup joined
    * back BY TOKEN (vocab-sized shuffle, no corpus motion), class totals
    * and N as tiny broadcasts, then a per-class top-k that
    * WindowGroupLimit prunes before any full sort. `minCount` drops the
    * hapax tail before ranking — at web scale the tail IS the vocabulary,
    * so the cut is the difference between a vocab-sized and a
    * tail-dominated shuffle.
    */
  def chi2Terms(
      df: DataFrame,
      classCol: String,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 10): DataFrame = {
    // the cell table feeds FOUR plan arms (scores, token totals, class
    // totals, N) — pinned once so the corpus tokenizes exactly once
    val cell = df
      .filter(col(classCol).isNotNull)
      .select(col(classCol).as("__g"),
        explode(TextOps.tokens(col(textCol))).as("__t"))
      .groupBy("__g", "__t")
      .agg(count(lit(1)).as("__a"))
      .localCheckpoint(true)
    val rowT = cell.groupBy("__t").agg(sum(col("__a")).as("__rt"))
    val colT = cell.groupBy("__g").agg(sum(col("__a")).as("__ct"))
    val tot = colT.agg(sum(col("__ct")).as("__n"))
    val aD = col("__a").cast("double")
    val bD = (col("__rt") - col("__a")).cast("double")
    val cD = (col("__ct") - col("__a")).cast("double")
    val dD = (col("__n") - col("__rt") - col("__ct") + col("__a")).cast("double")
    val nD = col("__n").cast("double")
    val scored = cell
      .filter(col("__a") >= minCount)
      .join(rowT, Seq("__t"))
      .join(broadcast(colT), Seq("__g"))
      .crossJoin(broadcast(tot))
      .withColumn("chi2",
        (nD * ((aD * dD - bD * cD) * (aD * dD - bD * cD))) /
          (((aD + bD) * (cD + dD)) * ((aD + cD) * (bD + dD))))
    val w = Window.partitionBy("__g").orderBy(col("chi2").desc, col("__t").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
      .select(col("__g").as(classCol), col("__t").as("token"),
        col("__a").as("n_in_class"), col("chi2"))
  }

  /** Inverted-index postings summary: per token above a document-frequency
    * floor, its document frequency, total term frequency, and the top
    * `perToken` documents by `(tf desc, doc asc)` — the search-index build
    * step emitted as rows `(token, df, total_tf, rank, doc, tf)` so the
    * result stays flat and engine-comparable.
    *
    * Scale shape: one explode → `(doc, token)` tf counts (map-side
    * partials), one token-keyed rollup for df/total, and a per-token
    * top-k that WindowGroupLimit bounds to `perToken` rows per key before
    * any sort completes. Vocabulary-sized output; the corpus never
    * shuffles raw text.
    */
  def postings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 3L,
      perToken: Int = 3): DataFrame = {
    // tf feeds both the stats rollup and the rank arm — pinned once so
    // the corpus tokenizes exactly once
    val tf = df
      .select(col(idCol).as("__doc"),
        explode(TextOps.tokens(col(textCol))).as("__t"))
      .groupBy("__t", "__doc")
      .agg(count(lit(1)).as("__tf"))
      .localCheckpoint(true)
    val stats = tf.groupBy("__t").agg(
      count(lit(1)).as("df"),
      sum(col("__tf")).as("total_tf"))
    val w = Window.partitionBy("__t").orderBy(col("__tf").desc, col("__doc").asc)
    tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perToken)
      .join(stats.filter(col("df") >= minDf), Seq("__t"))
      .select(col("__t").as("token"), col("df"), col("total_tf"),
        col("rank").cast("long").as("rank"),
        col("__doc").as("doc"), col("__tf").as("tf"))
  }

  /** Reciprocal Rank Fusion (Cormack et al. 2009) — the standard hybrid-
    * retrieval combiner: each input ranking contributes `1 / (k + rank)`
    * to a document's fused score, so documents near the top of ANY list
    * surface without any score normalization across heterogeneous scorers
    * (BM25 logits and dot products never share a scale; ranks always do).
    *
    * Exactness: the reciprocal lands on an integer grid —
    * `grid DIV (k + rank)` with long division — so the fused score is a
    * SUM of longs: order-independent, bit-replayable cross-engine, no
    * float summation ambiguity. With the default `grid = 1e9` the grid
    * error is < 1e-9·k·lists — far below any rank-k reciprocal gap at
    * sane depths (the smallest gap at depth d is ~1/(k+d)², ≈ 8e-5 at
    * k=60, d=50).
    *
    * Rank discipline: rank inside each list is `row_number` under the
    * deterministic (`scoreCol` DESC, `idCol` ASC) total order, truncated
    * at `depth` — absent documents contribute zero, the RRF convention.
    *
    * Scale shape: input lists are RESULT sets (top-`depth` per upstream
    * query), bounded by construction — ranking them is a window over at
    * most `depth` rows per query group and the fused aggregate moves
    * `lists × depth` rows per query. The heavy lifting (corpus scans, ANN
    * probes) lives in the operators that PRODUCE the lists, which keep
    * their own scale shapes. Pass `queryCol` when fusing many queries'
    * lists at once: every window and the final top-`topN` cut partition
    * by it, so fusion stays embarrassingly parallel across queries — the
    * no-partition single-window shape only ever sees one bounded list.
    *
    * Output: (queryCol?, idCol, fused, rank) — top `topN` by
    * (fused DESC, id ASC).
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      scoreCol: String,
      kConst: Int = 60,
      depth: Int = 50,
      topN: Int = 20,
      queryCol: Option[String] = None,
      grid: Long = 1000000000L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranking")
    require(kConst >= 1 && depth >= 1 && topN >= 1 && grid >= 1, "positive parameters")
    val parts = queryCol.map(col).toSeq
    val contribs = lists.map { df =>
      val w = Window.partitionBy(parts: _*)
        .orderBy(col(scoreCol).desc, col(idCol).asc)
      df.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= depth)
        .select(parts :+ col(idCol) :+
          expr(s"${grid}L div (${kConst}L + __r)").as("__w"): _*)
    }
    val fusedW = Window.partitionBy(parts: _*)
      .orderBy(col("fused").desc, col(idCol).asc)
    contribs.reduce(_ unionByName _)
      .groupBy(parts :+ col(idCol): _*)
      .agg(sum(col("__w")).as("fused"))
      .withColumn("rank", row_number().over(fusedW))
      .filter(col("rank") <= topN)
  }
}
