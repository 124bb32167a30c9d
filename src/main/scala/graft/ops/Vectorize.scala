package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
      salt: String = "htf"): DataFrame =
    tfCounts(df, idCol, textCol, dim, salt).withColumn(
      "w",
      col("tf").cast("double") /
        sqrt(sum(col("tf") * col("tf")).over(Window.partitionBy(idCol)).cast("double")))

  /** The un-normalized long form behind [[hashTf]] — (id, dim, tf) only,
    * for consumers like [[textKnn]] whose integer arithmetic derives its
    * own norms (planning the unit-weight window just to drop it would
    * leave a corpus-sized Window in the plan).
    */
  def tfCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int,
      salt: String = "htf"): DataFrame = {
    require(dim > 0, s"dim must be > 0, got $dim")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__w"))
      .withColumn(
        "dim",
        conv(substring(md5(concat(lit(salt), col("__w"))), 1, 8), 16, 10)
          .cast("long") % dim)
      .groupBy(col(idCol), col("dim"))
      .agg(count(lit(1)).as("tf"))
  }

  /** TF-IDF-weighted hashed vectors: [[tfCounts]] re-weighted by each
    * dimension's inverse document frequency — the retrieval-standard
    * weighting that damps stopword-heavy dimensions, computed per HASHED
    * dimension (MLlib's HashingTF+IDF shape) so it still needs no
    * vocabulary.
    *
    * idf stays on an integer grid: floor(ln((N+1)/(df_d+1)) · 1e6) as a
    * LONG (the `text_perplexity` grid discipline — the coarse grid
    * absorbs libm last-ulp noise), and the weight is the long product
    * tf · idf_q — no doubles anywhere, so the output replays bit-for-bit
    * AND downstream long-sum dot products stay order-independent.
    *
    * Scale shape: the tf shuffle from [[tfCounts]], then a DIMS-sized
    * (≤ `dim` rows) df aggregate + 1-row corpus count, both broadcast
    * back map-side. The corpus never shuffles twice.
    */
  def hashTfIdf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int,
      salt: String = "htf"): DataFrame = {
    val tf = tfCounts(df, idCol, textCol, dim, salt)
    val docFreq = tf.groupBy(col("dim")).agg(count(lit(1)).as("__df"))
    val nDocs = tf.select(col(idCol)).distinct().agg(count(lit(1)).as("__n"))
    tf.join(broadcast(docFreq), Seq("dim"))
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "idf_q",
        floor(log((col("__n") + 1).cast("double") / (col("__df") + 1)) * 1000000.0)
          .cast("long"))
      .withColumn("w_q", col("tf") * col("idf_q"))
      .select(col(idCol), col("dim"), col("tf"), col("idf_q"), col("w_q"))
  }

  /** Text-space cosine top-k without embeddings: the query docs' hashed
    * TF vectors broadcast against the corpus's, meeting on shared
    * dimensions — similarity search over raw text, the [[Similarity]]
    * family's shape applied to [[hashTf]] output.
    *
    * Determinism is the whole design: the dot product and both norms are
    * LONG sums of tf products (exact in ANY aggregation order — a
    * double-weight dot would drift with Spark's partial-agg order), and
    * cosine is derived per pair from three longs with exactly-rounded
    * IEEE steps (sqrt·sqrt, one division) — bit-for-bit replayable. Ties
    * break on candidate id, so the top-k cut is total.
    *
    * Scale shape: the query side is queries·dims rows — it BROADCASTS;
    * the corpus long form never shuffles (map-side hash join on dim),
    * and only pair-sized partial-combined (query, candidate) dots move.
    */
  def textKnn(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int,
      queryIds: Seq[Long],
      k: Int): DataFrame = {
    require(queryIds.nonEmpty, "need at least one query id")
    val tf = tfCounts(df, idCol, textCol, dim)
    val q = tf.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col("dim"), col("tf").as("__qtf"))
    knnOverCounts(tf, idCol, q, k, excludeSelf = true)
  }

  /** Free-text retrieval: search the corpus for literal query STRINGS
    * rather than member documents — the other half of the retrieval API
    * ([[textKnn]] searches by example). Query vectors hash identically to
    * corpus vectors (same salt, same buckets), so a query string equal to
    * a stored document scores cosine 1. Query ids are the 0-based
    * positions of `queryTexts`. Same scale shape as [[textKnn]]: the
    * queries·dims vectors broadcast, the corpus never shuffles raw text.
    */
  def textKnnFree(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int,
      queryTexts: Seq[String],
      k: Int,
      salt: String = "htf"): DataFrame = {
    require(queryTexts.nonEmpty, "need at least one query string")
    val spark = df.sparkSession
    import spark.implicits._
    val qDf = queryTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("query_id", textCol)
    val q = tfCounts(qDf, "query_id", textCol, dim, salt)
      .select(col("query_id"), col("dim"), col("tf").as("__qtf"))
    knnOverCounts(tfCounts(df, idCol, textCol, dim, salt), idCol, q, k,
      excludeSelf = false)
  }

  /** Shared top-k kernel: long-sum dots of a broadcast query long form
    * against corpus counts, cosine from three longs, ties on candidate
    * id. `excludeSelf` drops candidate == query_id matches (meaningless
    * when query ids live in a separate space).
    */
  private def knnOverCounts(
      tf: DataFrame,
      idCol: String,
      q: DataFrame,
      k: Int,
      excludeSelf: Boolean): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val norms = tf.groupBy(col(idCol)).agg(sum(col("tf") * col("tf")).as("__n2"))
    val qNorms = q.groupBy(col("query_id")).agg(sum(col("__qtf") * col("__qtf")).as("__qn2"))
    val met = tf.join(broadcast(q), Seq("dim"))
    val dots = (if (excludeSelf) met.filter(col(idCol) =!= col("query_id")) else met)
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__qtf") * col("tf")).as("__dot")) // long: exact any order
    val scored = dots
      .join(broadcast(qNorms), Seq("query_id"))
      .join(norms, Seq(idCol))
      .withColumn(
        "cos",
        col("__dot").cast("double") /
          (sqrt(col("__qn2").cast("double")) * sqrt(col("__n2").cast("double"))))
    TopK.perKey(scored, Seq("query_id"), "cos", idCol, k)
      .select(col("query_id"), col(idCol), col("cos"))
  }

  /** Equal-frequency (quantile) binning of a numeric column into `k`
    * buckets — the featurization standard for skewed magnitudes (prices,
    * token counts, engagement) where equal-WIDTH bins collapse to one hot
    * bucket. Boundary `j` is the value at exact rank `⌈j·n/k⌉` under the
    * grid order; a row's bucket is the number of boundaries strictly
    * below its value, so TIES ARE STABLE — equal values always share a
    * bucket (the documented trade: heavy ties make bucket populations
    * uneven rather than splitting a value across buckets).
    *
    * Exactness: values land on the 2^20 grid (one IEEE multiply+floor);
    * ranks are exact long arithmetic (`(j·n + k−1) DIV k`); assignment
    * compares longs — the whole (id, value_grid, bucket) output replays
    * bit-for-bit.
    *
    * Scale shape: the grid histogram partial-aggregates map-side and is
    * MATERIALIZED once (distinct-grid-values-sized — bounded by value
    * range · 2^20, not by row count); boundaries come from a cumulative
    * window over that histogram (single-partition over distinct values —
    * the documented cardinality contract, same as any exact-quantile
    * pass); the k−1 boundaries then broadcast into a map-side bucket
    * assignment. Two scans of the raw column total (histogram + assign),
    * inherent to a row-sized output.
    */
  def binEqualFreq(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      k: Int,
      gridScale: Long = 1L << 20): DataFrame = {
    require(k >= 2, "need at least 2 buckets")
    val pts = df
      .filter(col(valueCol).isNotNull)
      .select(col(idCol),
        floor(col(valueCol).cast("double") * gridScale.toDouble).cast("long").as("__v"))
    pts
      .crossJoin(broadcast(equalFreqBounds(pts.select(col("__v")), k)))
      .select(col(idCol), col("__v").as("value_grid"),
        size(filter(col("__bs"), b => col("__v") > b)).as("bucket"))
  }

  /** The k−1 exact-rank boundaries of a grid-value column as ONE row
    * holding a sorted array `__bs` — broadcastable into any map-side
    * bucket assignment (`bucket = #{b ∈ __bs : v > b}`). Shared by
    * [[binEqualFreq]] (bins over its own input) and the drift report
    * (REFERENCE-derived bins applied to both samples).
    */
  private[ops] def equalFreqBounds(gridVals: DataFrame, k: Int): DataFrame = {
    val hist = gridVals.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    // distributed prefix sum: the value histogram is DISTINCT-VALUE-sized,
    // which for a continuous column is corpus-sized — a global ordering
    // window here was the single-task cliff WindowAuditSpec now forbids
    Ranks.runningSum(hist, "__v", "__c", "__cum")
      .crossJoin(broadcast(hist.agg(sum(col("__c")).as("__n"))))
      .withColumn("__j", explode(sequence(lit(1), lit(k - 1))))
      .filter(col("__cum") >= expr(s"(__j * __n + ${k - 1}) DIV $k"))
      .groupBy(col("__j"))
      .agg(min(col("__v")).as("__b"))
      .agg(sort_array(collect_list(col("__b"))).as("__bs"))
  }

  /** ECDF (percentile-rank) normalization of a numeric column: every row
    * gets its empirical cumulative rank in PARTS-PER-MILLION —
    * `ecdf_ppm = (#{values ≤ v} · 10⁶) DIV n` — the rank-normalize step
    * that makes features comparable across arbitrary distributions
    * (quantile normalization, calibration inputs, heavy-tail flattening).
    * Exact integer output; ties share a rank by construction.
    *
    * Scale shape: the same materialized grid-histogram discipline as
    * [[binEqualFreq]] — one histogram aggregate, a cumulative window over
    * DISTINCT grid values, then the (value → cum) map broadcasts back
    * into a map-side join (distinct-values-sized, the documented
    * cardinality contract). Two scans of the raw column (histogram +
    * row-level emit), inherent to row-sized output.
    */
  def ecdfNormalize(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      gridScale: Long = 1L << 20): DataFrame = {
    val pts = df
      .filter(col(valueCol).isNotNull)
      .select(col(idCol),
        floor(col(valueCol).cast("double") * gridScale.toDouble).cast("long").as("__v"))
    // distributed prefix sum over the distinct-value histogram (see
    // equalFreqBounds) — identical ranks, no single-task global window
    val cum = Ranks.runningSum(
      pts.groupBy(col("__v")).agg(count(lit(1)).as("__c")).localCheckpoint(true),
      "__v", "__c", "__cum")
    val n = cum.agg(sum(col("__c")).as("__n"))
    pts
      .join(broadcast(cum.select(col("__v"), col("__cum"))), Seq("__v"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("__v").as("value_grid"),
        expr("(__cum * 1000000) DIV __n").as("ecdf_ppm"))
  }

  /** Distribution-drift report between a REFERENCE sample and a CURRENT
    * sample of one numeric column: both bin under the reference's own
    * equal-frequency boundaries, and each bucket row carries the exact
    * integer total-variation numerator
    * `|n_cur·N_ref − n_ref·N_cur|` — cross-multiplied longs, no division,
    * so the drift signal replays bit-exactly (TV distance itself is
    * `Σ numer / (2·N_ref·N_cur)`, the consumer's one division). Uniform
    * numerators ≈ no drift; a spiked bucket names WHERE the distribution
    * moved — the monitoring table behind every training-data freshness
    * alarm.
    *
    * Scale shape: one histogram pass per sample plus the k-row bucket
    * join; boundaries broadcast; nothing row-sized moves after the
    * grid collapse.
    */
  def driftReport(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      k: Int,
      gridScale: Long = 1L << 20): DataFrame = {
    require(k >= 2, "need at least 2 buckets")
    def gridded(df: DataFrame) = df
      .filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol).cast("double") * gridScale.toDouble).cast("long").as("__v"))
    val bounds = equalFreqBounds(gridded(ref), k)
    def binned(df: DataFrame, out: String) = gridded(df)
      .crossJoin(broadcast(bounds))
      .select(size(filter(col("__bs"), b => col("__v") > b)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(out))
      .localCheckpoint(true)
    val r = binned(ref, "n_ref")
    val c = binned(cur, "n_cur")
    val totals = r.agg(sum(col("n_ref")).as("__tr"))
      .crossJoin(c.agg(sum(col("n_cur")).as("__tc")))
    r.join(c, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        abs(col("n_cur") * col("__tr") - col("n_ref") * col("__tc")).as("tv_numer"))
  }

  /** Population Stability Index per bucket — the industry-standard drift
    * score on [[driftReport]]'s equal-frequency reference buckets:
    * `PSI = Σ (q_i − p_i)·ln(q_i/p_i)` with p from the reference and q
    * from the current sample. Exactness: the cross-multiplied
    * `(n_cur·T_ref − n_ref·T_cur)` difference is exact integer counts,
    * the log lands on the floored 1e-6 grid BEFORE the product (the
    * text_perplexity discipline), and one fixed-order double combine
    * closes each term — bit-replayable cross-engine. Buckets empty on
    * EITHER side report a NULL term: the standard ε-smoothing choice
    * belongs to the caller; silently inventing mass would fake the
    * score (sum the non-null terms for the headline PSI, count the
    * nulls as the data-coverage warning).
    *
    * Scale shape: [[driftReport]]'s two binned passes, then window sums
    * over the k-row bucket table — nothing data-sized beyond the scans.
    */
  def psiReport(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      k: Int,
      gridScale: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val b = driftReport(ref, cur, valueCol, k, gridScale)
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        sum("n_ref").over(w).as("__tr"), sum("n_cur").over(w).as("__tc"))
    val num = col("n_cur") * col("__tr") - col("n_ref") * col("__tc")
    val lnG = floor(log(
      (col("n_cur").cast("double") * col("__tr").cast("double")) /
        (col("n_ref").cast("double") * col("__tc").cast("double"))) * 1000000.0)
      .cast("long")
    b.select(col("bucket"), col("n_ref"), col("n_cur"),
      when(col("n_ref") > 0 && col("n_cur") > 0,
        num.cast("double") * lnG /
          (col("__tc").cast("double") * col("__tr").cast("double") * lit(1000000.0)))
        .otherwise(lit(null).cast("double")).as("psi_term"))
  }

  /** Jensen–Shannon drift between the same two samples [[psiReport]]
    * compares — the BOUNDED symmetric divergence (≤ ln 2) that stays
    * finite when a bucket empties on one side, exactly where PSI's
    * unbounded log-ratio blows up or nulls out. Same equal-frequency
    * reference buckets; per bucket, with counts (a, b) and totals (A, B):
    * `js_term = ½·[ a/A·ln(2aB/(aB+bA)) + b/B·ln(2bA/(aB+bA)) ]` — each
    * ln argument is a ratio of EXACT integer products (< 2⁵³, cast-exact
    * into the one libm call per side on the 10⁶ floor grid), each side
    * contributes 0 (not null) when its count is 0, and the final term is
    * one fixed-order double combine. Σ js_term ∈ [0, ln 2] is the
    * drift score.
    *
    * Scale shape: identical to [[psiReport]] — bucket-sized everything
    * after the two histogram aggregates.
    */
  def jsReport(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      k: Int,
      gridScale: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val b = driftReport(ref, cur, valueCol, k, gridScale)
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        sum("n_ref").over(w).as("__tr"), sum("n_cur").over(w).as("__tc"))
    val mixed = col("n_ref") * col("__tc") + col("n_cur") * col("__tr")
    def side(n: Column, tot: Column, cross: Column) = {
      val lnG = floor(log(
        (lit(2.0) * n.cast("double") * cross.cast("double")) /
          mixed.cast("double")) * 1000000.0).cast("long")
      when(n > 0,
        n.cast("double") * lnG /
          (tot.cast("double") * lit(1000000.0)))
        .otherwise(lit(0.0))
    }
    b.select(col("bucket"), col("n_ref"), col("n_cur"),
      (lit(0.5) * (side(col("n_ref"), col("__tr"), col("__tc")) +
        side(col("n_cur"), col("__tc"), col("__tr")))).as("js_term"))
  }

  /** Weight-of-evidence encoding of a categorical feature against a
    * binary target — the credit-scoring standard (`WOE_c =
    * ln((pos_c/POS)/(neg_c/NEG))`) plus each category's Information-Value
    * term (`IV = Σ (pos_c/POS − neg_c/NEG)·WOE_c`, the feature-selection
    * score read off the same table).
    *
    * Exactness: counts are exact longs; WOE rides the engine's 2²⁰
    * grid-floored-ln discipline (ONE libm call per category on a
    * correctly-rounded double ratio — the text_perplexity argument), and
    * the IV term is then pure integer arithmetic: `iv_term_grid =
    * (pos_c·NEG − neg_c·POS)·woe_grid DIV (POS·NEG)` — the two factors
    * always share a sign (both flip with the share ratio at exactly the
    * same point), so the quotient is nonnegative and truncate == floor.
    * One-sided categories (pos or neg = 0) emit null WOE rather than a
    * smoothed lie — the caller chooses a smoothing policy explicitly.
    *
    * Scale shape: ONE scan into one category aggregate; the POS/NEG
    * totals come from an unbounded window over the CATEGORY-SIZED stats
    * frame (a separate total aggregate would re-embed the whole scan —
    * the plan audit caught exactly that), so the single-partition window
    * sees #categories rows, never data. Null targets are excluded
    * (scored rows only); null categories group as their own level (SQL
    * grouping semantics — often the most predictive "missing" bucket).
    */
  def woeEncode(df: DataFrame, catCol: String, target: Column): DataFrame = {
    val base = df.filter(target.isNotNull)
      .select(col(catCol), target.cast("long").as("__y"))
    val stats = base.groupBy(catCol).agg(
      count(lit(1)).as("n"),
      sum(col("__y")).as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    stats
      .withColumn("__pos", sum(col("n_pos")).over(all))
      .withColumn("__neg", sum(col("n_neg")).over(all))
      .select(col(catCol), col("n"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          floor(log(
            (col("n_pos").cast("double") * col("__neg").cast("double")) /
              (col("n_neg").cast("double") * col("__pos").cast("double")))
            * lit(1048576.0)).cast("long"))
          .as("woe_grid"),
        col("__pos"), col("__neg"))
      .withColumn("iv_term_grid",
        expr("""CASE WHEN woe_grid IS NULL THEN NULL
               |ELSE (n_pos * __neg - n_neg * __pos) * woe_grid
               |     DIV (__pos * __neg) END""".stripMargin))
      .drop("__pos", "__neg")
  }
}
