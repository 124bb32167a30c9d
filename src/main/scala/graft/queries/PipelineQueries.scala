package graft.queries

import graft.ops.{Coverage, Dedup, Multimodal, Packing, Ranking, Sampling, Similarity, SketchRollup, TextOps, Vectorize, Vocab}
import graft.sources.Sources
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the documents/embeddings
  * fixtures: dedup (exact + MinHash + SimHash + n-gram Jaccard + embedding
  * cosine), similarity search (brute-force and LSH), text analysis, and
  * multimodal plumbing.
  *
  * Oracle-able queries pair with DuckDB SQL; ops whose hashing scheme the
  * oracle cannot replicate (xxhash64-based LSH) are covered by rows-only
  * checks here plus brute-force-comparison specs in PipelineOpsSpec.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  // ------------------------------------------------------------------ dedup

  val dedupExact: Q = (spark, dir) =>
    Dedup.exact(docs(spark, dir), "text", "doc_id")

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification (rows-only:
    * the oracle cannot reproduce xxhash64).
    */
  val dedupMinhash: Q = (spark, dir) =>
    Dedup.minhashPairs(docs(spark, dir), "text", "doc_id", threshold = 0.5)

  /** Cross-corpus near-dup pairs: the incoming half of the corpus banded
    * against the existing half. Hash-checked against a brute-force
    * exact-Jaccard oracle (the LSH stage is xxhash64, but its recall at
    * the fixture's near-dup similarity is total, and verification admits
    * no false positives — spec-pinned both ways).
    */
  val dedupCross: Q = (spark, dir) => {
    val d = docs(spark, dir)
    Dedup.minhashPairsBetween(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
      "text", "doc_id", threshold = 0.5)
  }

  /** SimHash Hamming-≤3 pairs via 4-chunk pigeonhole blocking, on the
    * md5-nibble signature so the FULL pair set hash-checks against a
    * brute-force DuckDB replay (blocking is exact for Hamming ≤ 3 and
    * verification admits no false positives, so blocked ≡ brute force).
    * The xxhash64 production variant shares every line of pairing code
    * and is spec-pinned to brute force separately.
    */
  val dedupSimhash: Q = (spark, dir) =>
    Dedup.simhashPairsReplayable(docs(spark, dir), "text", "doc_id", maxHamming = 3)

  /** Exact char-5-gram Jaccard pairs within the natural source blocking. */
  val dedupNgram: Q = (spark, dir) =>
    Dedup.ngramJaccardPairs(docs(spark, dir), "text", "doc_id", "source", 5, 0.30)

  /** Dedup-aware train/val/test split: near-duplicate documents must land
    * in the SAME split, else eval answers leak into training via paraphrase
    * copies that a doc-id hash split scatters across splits. Every doc is
    * labeled with its near-dup cluster (MinHash pairs → connected
    * components; singletons label themselves) and the deterministic hash
    * split keys on the CLUSTER label — the composition of three
    * already-oracled stages, replayed end-to-end by the oracle.
    */
  val sampleSplitNodup: Q = (spark, dir) => {
    val d = docs(spark, dir)
    val clusters = Dedup.duplicateClusters(
      Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5))
    d.select(col("doc_id"))
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster_label"))
      .withColumn(
        "split",
        Sampling.splitColumn(
          col("cluster_label"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
  }

  /** Containment (asymmetric) near-dup pairs within the source blocking:
    * |A∩B| / min(|A|,|B|) over char-5-gram sets — flags doc-inside-doc
    * duplication (quotation/expansion/syndication) that symmetric Jaccard
    * under-scores.
    */
  val dedupContainment: Q = (spark, dir) =>
    Dedup.ngramContainmentPairs(docs(spark, dir), "text", "doc_id", "source", 5, 0.60)

  /** Maximal cross-document duplicated token spans
    * ([[graft.ops.Dedup.duplicateSpans]], word 3-grams) — the substring-
    * dedup cut list; the oracle replays grams, distinct-doc frequencies,
    * and the gaps-and-islands merge.
    */
  val dedupSpans: Q = (spark, dir) =>
    Dedup.duplicateSpans(docs(spark, dir), "doc_id", "text", 3)

  /** End-to-end EXACT near-dup dedup: LOSSLESS prefix-join pairs
    * (≥ 0.8 word-3-gram Jaccard) → connected components → min-id
    * survivor per cluster — the fully-deterministic dedup chain with NO
    * probabilistic stage anywhere (the MinHash chain's exactness
    * upgrade). The oracle replays brute-force pairs + recursive-CTE
    * components + the anti-join, end to end.
    */
  val pipelineExactDedup: Q = (spark, dir) => {
    val d = docs(spark, dir)
    val pairs = Dedup.prefixJaccardPairs(d, "text", "doc_id", 0.8, n = 3)
    Dedup.dedupByClusters(d, "doc_id", pairs)
      .select("doc_id", "source")
  }

  /** The full dedup CASCADE as one funnel report — the stage-by-stage
    * survivor accounting every production corpus-curation run publishes
    * (exact → near-dup → perceptual, cheapest first so each stage sees
    * only the previous stage's survivors): stage 1 exact (md5 digest,
    * keep min doc_id per text), stage 2 lossless prefix-Jaccard clusters
    * (≥ 0.8 word-3-gram, [[pipelineExactDedup]]'s chain), stage 3
    * md5-replayable SimHash (Hamming ≤ 3,
    * [[graft.ops.Dedup.simhashPairsReplayable]]). One row per stage:
    * `(stage, docs_in, docs_out, removed)`. Every stage is a kernel the
    * gate already proves in isolation; the oracle replays the whole
    * chain — exact digest groups, brute-force Jaccard + recursive-CTE
    * components, the bit-for-bit SimHash twin — so the COMPOSITION is
    * hash-gated, not just the parts.
    *
    * Scale shape: survivors materialize once per stage (localCheckpoint —
    * exactly the inter-stage materialization a real pipeline does), each
    * stage's pair work rides its own audited kernel; the funnel itself is
    * three 1-row aggregates stacked.
    */
  val pipelineDedupCascade: Q = (spark, dir) => {
    val d0 = docs(spark, dir).toDF()
      .filter(col("text").isNotNull)
      .select("doc_id", "text")
      .localCheckpoint(true)
    val keep1 = d0.groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val s1 = d0.join(keep1, "doc_id").localCheckpoint(true)
    val s2 = Dedup
      .dedupByClusters(s1, "doc_id",
        Dedup.prefixJaccardPairs(s1, "text", "doc_id", 0.8, n = 3))
      .localCheckpoint(true)
    val s3 = Dedup.dedupByClusters(s2, "doc_id",
      Dedup.simhashPairsReplayable(s2, "text", "doc_id", maxHamming = 3))
    d0.agg(count(lit(1)).as("n0"))
      .crossJoin(s1.agg(count(lit(1)).as("n1")))
      .crossJoin(s2.agg(count(lit(1)).as("n2")))
      .crossJoin(s3.agg(count(lit(1)).as("n3")))
      .selectExpr(
        """stack(3,
          |  'stage1_exact', n0, n1,
          |  'stage2_prefix_jaccard', n1, n2,
          |  'stage3_simhash', n2, n3) AS (stage, docs_in, docs_out)"""
          .stripMargin)
      .withColumn("removed", col("docs_in") - col("docs_out"))
  }

  /** EXACT word-3-gram-set Jaccard pairs (≥ 0.8) by LOSSLESS prefix
    * filtering ([[graft.ops.Dedup.prefixJaccardPairs]] — the All-Pairs /
    * PPJoin shape): no blocking column, no LSH recall loss, candidates
    * pruned by the rarest-first prefix index. The oracle is plain brute
    * force — equality with it IS the losslessness proof at gate scale.
    */
  val dedupPrefixJoin: Q = (spark, dir) =>
    Dedup.prefixJaccardPairs(docs(spark, dir), "text", "doc_id", 0.8, n = 3)

  /** Winnowing / MOSS shared-fingerprint pairs
    * ([[graft.ops.Dedup.winnowingPairs]], k = 3, w = 4): the positional
    * near-dup detector — window-min md5-gram fingerprints localize shared
    * runs of >= w+k-1 tokens; pairs sharing >= 2 selected fingerprints
    * (df-capped at 10 to drop boilerplate keys) survive. Fully
    * window-replayable in the oracle (min(ROW(h, pos)) OVER the same
    * frame).
    */
  val dedupWinnowing: Q = (spark, dir) =>
    Dedup.winnowingPairs(docs(spark, dir).toDF(), "doc_id", "text",
      k = 3, w = 4, maxDf = 10, minShared = 2)

  /** Embedding-cosine near-duplicate pairs via hyperplane LSH buckets. */
  val dedupEmbedding: Q = (spark, dir) =>
    Similarity.cosineNearDupPairs(emb(spark, dir), "vec_id", "embedding", 0.30, bits = 4)

  /** SEMANTIC golden records end to end: embedding near-dup pairs →
    * union-find clusters → per-cluster representative elected by vector
    * norm (keep the highest-energy member) — the linkage_golden MDM chain
    * applied to the embedding space, every stage riding an
    * already-oracle-proven kernel.
    */
  val dedupSemantic: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val pairs = Similarity
      .cosineNearDupPairs(e, "vec_id", "embedding", 0.30, bits = 4)
      .select("id_a", "id_b")
    Dedup.canonicalClusters(
      pairs,
      e.withColumn("__nrm", Similarity.l2Norm(col("embedding"))),
      "vec_id", "__nrm")
  }

  /** Duplicate CLUSTERS from the embedding near-dup pair graph: connected
    * components by min-label propagation. Oracle-checked end-to-end — the
    * pair graph replays via hyperplane literals and the component labels
    * via a recursive transitive-closure CTE, so the iterative Spark graph
    * loop is held to an exact algebraic answer.
    */
  val dedupComponents: Q = (spark, dir) =>
    Dedup.duplicateClusters(
      Similarity.cosineNearDupPairs(emb(spark, dir), "vec_id", "embedding", 0.30, bits = 4))

  /** Quality-aware cluster canonicalization over the MinHash near-dup
    * graph: per duplicate cluster, elect the representative under
    * (n_chars DESC, doc_id ASC) — "keep the longest copy, drop the
    * fragments". The oracle replays pairs (brute-force exact word-3-gram
    * Jaccard, the dedup_minhash recall argument), components (recursive
    * transitive closure), and the election window.
    */
  val dedupCanonical: Q = (spark, dir) => {
    val d = docs(spark, dir)
    Dedup.canonicalClusters(
      Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5),
      d.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars")
  }

  // ------------------------------------------------------------- similarity

  /** Exact cosine top-10 for query vectors (vec_id < 8) over the corpus.
    * Oracle-able: DuckDB list_dot_product over DOUBLE[] folds sequentially,
    * bit-identical to Spark's zip_with/aggregate — verified empirically.
    */
  val knnBrute: Q = (spark, dir) => {
    val e = emb(spark, dir)
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 10)
  }

  /** Poisson-bootstrap 95% CI of price-per-unit (Σ cents / Σ quantity)
    * per return flag ([[graft.ops.Bootstrap.ratioCI]]) — the RATIO
    * metric whose variance has no closed per-row form, drawn with the
    * SAME weights on numerator and denominator (within-row correlation
    * preserved). Line id = 8·orderkey + linenumber (linenumber ≤ 7).
    */
  val metricBootstrapRatio: Q = (spark, dir) =>
    graft.ops.Bootstrap.ratioCI(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("__id", col("l_orderkey") * 8 + col("l_linenumber")),
      "l_returnflag", "__id",
      (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long"),
      col("l_quantity"),
      replicas = 48, salt = "ratio")

  /** Builds the metric_bootstrap_ratio oracle — the meanCI pattern with
    * weighted numerator AND denominator sums per replica.
    */
  private def metricBootstrapRatioOracle: String = {
    val wcase = graft.ops.Bootstrap.poissonWeightSql(
      "substring(md5('ratio_' || CAST(b // 4 AS VARCHAR) || '_' || " +
        "CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)), (b % 4) * 8 + 1, 8)")
    val lo = 0.05 / 2
    val hi = 1.0 - 0.05 / 2
    s"""WITH r AS (SELECT range AS b FROM range(0, 48)),
       |w AS (
       |  SELECT l_returnflag AS g, r.b, ($wcase) AS wt,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
       |    CAST(l_quantity AS BIGINT) AS y
       |  FROM lineitem CROSS JOIN r),
       |m AS (
       |  SELECT g, b,
       |    CASE WHEN SUM(CAST(wt AS HUGEINT) * y) = 0 THEN NULL
       |         ELSE CAST(CAST(SUM(CAST(wt AS HUGEINT) * x) AS VARCHAR) AS DOUBLE)
       |              / CAST(CAST(SUM(CAST(wt AS HUGEINT) * y) AS VARCHAR) AS DOUBLE)
       |    END AS rb
       |  FROM w GROUP BY 1, 2),
       |l AS (
       |  SELECT g, list(rb ORDER BY rb) FILTER (WHERE rb IS NOT NULL) AS lst
       |  FROM m GROUP BY 1),
       |p AS (
       |  SELECT l_returnflag AS g, count(*) AS n_rows,
       |    CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |          AS HUGEINT)) AS VARCHAR) AS DOUBLE)
       |      / CAST(CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS VARCHAR) AS DOUBLE)
       |      AS ratio
       |  FROM lineitem GROUP BY 1)
       |SELECT p.g AS l_returnflag, p.n_rows, p.ratio,
       |  l.lst[GREATEST(1, CAST(floor($lo * len(l.lst)) AS INT))] AS ci_lo,
       |  l.lst[LEAST(len(l.lst), CAST(ceil($hi * len(l.lst)) AS INT))] AS ci_hi
       |FROM p JOIN l ON p.g = l.g""".stripMargin
  }

  /** Per-label centroid drift between the even- and odd-id halves of
    * the embedding corpus ([[graft.ops.Similarity.centroidDrift]]) —
    * the "did the encoder move between crawls" probe. Synthetic halves
    * of one corpus should read ≈ 1.0 per label; the oracle replays the
    * grid sums, HUGEINT products (VARCHAR-mediated double casts — the
    * documented DuckDB >2^64 rounding fix), and the final cosine.
    */
  val embeddingDrift: Q = (spark, dir) => {
    val e = emb(spark, dir)
    Similarity.centroidDrift(
      e.filter(col("vec_id") % 2 === 0),
      e.filter(col("vec_id") % 2 === 1),
      "label", "embedding")
  }

  /** Poisson-bootstrap 95% CI of mean document length per source
    * ([[graft.ops.Bootstrap.meanCI]] — 64 replicas in ONE aggregation
    * pass; the oracle re-derives every md5 weight, replica mean, and
    * order-statistic pick from the same generated threshold literals).
    */
  val metricBootstrap: Q = (spark, dir) =>
    graft.ops.Bootstrap.meanCI(
      docs(spark, dir), "source", "doc_id", col("n_chars"),
      replicas = 64, alpha = 0.05, salt = "boot")

  /** Builds the metric_bootstrap oracle from [[graft.ops.Bootstrap]]'s own
    * threshold constants — the Spark ladder and the SQL ladder cannot
    * drift.
    */
  private def metricBootstrapOracle: String = {
    val wcase = graft.ops.Bootstrap.poissonWeightSql(
      "substring(md5('boot_' || CAST(b // 4 AS VARCHAR) || '_' || " +
        "CAST(doc_id AS VARCHAR)), (b % 4) * 8 + 1, 8)")
    val lo = 0.05 / 2
    val hi = 1.0 - 0.05 / 2
    s"""WITH r AS (SELECT range AS b FROM range(0, 64)),
       |w AS (
       |  SELECT d.source, r.b, ($wcase) AS wt, d.n_chars
       |  FROM documents d CROSS JOIN r),
       |m AS (
       |  SELECT source, b,
       |    CASE WHEN SUM(wt) = 0 THEN NULL
       |         ELSE CAST(CAST(SUM(CAST(wt AS HUGEINT) * n_chars) AS VARCHAR) AS DOUBLE)
       |              / CAST(CAST(SUM(CAST(wt AS HUGEINT)) AS VARCHAR) AS DOUBLE) END AS mb
       |  FROM w GROUP BY 1, 2),
       |l AS (
       |  SELECT source, list(mb ORDER BY mb) FILTER (WHERE mb IS NOT NULL) AS lst
       |  FROM m GROUP BY 1),
       |p AS (
       |  SELECT source, count(*) AS n_rows,
       |    CAST(CAST(SUM(CAST(n_chars AS HUGEINT)) AS VARCHAR) AS DOUBLE)
       |      / count(*) AS mean
       |  FROM documents GROUP BY 1)
       |SELECT p.source, p.n_rows, p.mean,
       |  l.lst[GREATEST(1, CAST(floor($lo * len(l.lst)) AS INT))] AS ci_lo,
       |  l.lst[LEAST(len(l.lst), CAST(ceil($hi * len(l.lst)) AS INT))] AS ci_hi
       |FROM p JOIN l ON p.source = l.source""".stripMargin
  }

  /** Hard-negative mining: the top-5 most-similar DIFFERENT-label
    * vectors per anchor (vec_id < 8) —
    * [[graft.ops.Similarity.hardNegatives]]; the oracle replays the
    * label-filtered cosine ranking exactly (the knn_brute kernel
    * argument).
    */
  val knnHardneg: Q = (spark, dir) => {
    val e = emb(spark, dir)
    Similarity.hardNegatives(
      e, e.filter(col("vec_id") < 8), "vec_id", "embedding", "label", 5)
  }

  /** Product-quantized ANN: 8 subspaces × 16 codewords (64× compression),
    * asymmetric-distance top-10 for the query vectors
    * ([[graft.ops.Similarity.pqBuild]]/[[graft.ops.Similarity.pqTopK]]).
    * HASH-GATED since round 9: the fit is seeded-deterministic, so the
    * trained codebooks embed as SQL literals captured from THIS run (the
    * knn_lsh hyperplane-literal trick) and DuckDB replays encode + ADC
    * bit-exactly — see [[knnPqOracleSql]] / [[dynamicOracles]].
    */
  val knnPq: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val idx = Similarity.pqBuild(e, "vec_id", "embedding", nsub = 8, k = 16)
    DynamicOracles.put("knn_pq", knnPqOracleSql(idx.codebooks, topK = 10))
    Similarity.pqTopK(idx, e.filter(col("vec_id") < 8), "vec_id", "embedding", 10)
  }

  /** Top principal direction of the embedding matrix by exact-grid power
    * iteration ([[graft.ops.Similarity.pcaPower]] — 6 rounds, DECIMAL(38)
    * accumulation, one IEEE renormalization per component per round; the
    * oracle unrolls the same rounds).
    */
  val embeddingPca: Q = (spark, dir) =>
    Similarity.pcaPower(emb(spark, dir), "embedding", dim = 64, iterations = 6)

  /** Builds the embedding_pca oracle: the identical grid encode, then 6
    * unrolled power-iteration rounds (dots in BIGINT, component sums in
    * HUGEINT, the same double renormalization), all MATERIALIZED.
    */
  private def embeddingPcaOracle: String = {
    val iters = 6
    val sb = new StringBuilder
    sb ++= """WITH e0 AS MATERIALIZED (SELECT vec_id,
             |  list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS g
             |  FROM embeddings),
             |ks AS MATERIALIZED (SELECT range AS k FROM range(1, 65)),
             |v0 AS MATERIALIZED (SELECT range AS k, CAST(1048576 AS BIGINT) AS val
             |  FROM range(1, 65)),
             |""".stripMargin
    for (n <- 1 to iters) {
      val prev = s"v${n - 1}"
      sb ++= s"d$n AS MATERIALIZED (SELECT e.vec_id, SUM(e.g[v.k] * v.val) AS d " +
        s"FROM e0 e CROSS JOIN $prev v GROUP BY e.vec_id),\n"
      sb ++= s"w$n AS MATERIALIZED (SELECT ks.k, " +
        s"SUM(CAST(e.g[ks.k] AS HUGEINT) * CAST(d.d AS HUGEINT)) AS w " +
        s"FROM e0 e JOIN d$n d ON e.vec_id = d.vec_id CROSS JOIN ks GROUP BY ks.k),\n"
      sb ++= s"m$n AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w$n),\n"
      sb ++= s"v$n AS MATERIALIZED (SELECT k, CAST(floor(CAST(w AS DOUBLE) " +
        s"/ CAST(m AS DOUBLE) * 1048576.0) AS BIGINT) AS val " +
        s"FROM w$n CROSS JOIN m$n),\n"
    }
    sb.setLength(sb.length - 2) // drop trailing ",\n"
    sb ++= s"\nSELECT k, val AS loading_grid FROM v$iters"
    sb.toString
  }

  /** Look-alike audience: top-20 non-seed vectors by cosine to the seed
    * set's exact-grid centroid ([[graft.ops.Similarity.lookalike]] — the
    * corpus never shuffles; the centroid embeds as a literal).
    */
  val audienceLookalike: Q = (spark, dir) =>
    Similarity.lookalike(emb(spark, dir), "vec_id", "embedding", col("vec_id") < 8, k = 20)

  /** Embedding-space outliers: vectors whose squared distance to the
    * corpus' exact-grid centroid Hampel-flags against the global
    * median/MAD — the "garbage embeddings" screen (encoder failures,
    * wrong-modality rows) composed from the lookalike centroid and
    * [[graft.ops.Outliers.flagged]]. d² expands to three proven dot
    * kernels (|e|² − 2·e·m + |m|², fixed order), so even the doubles
    * replay bit-exactly; the flag decision is pure integer.
    */
  val embeddingOutliers: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val sums = e
      .select(posexplode(
        transform(col("embedding"), x => floor(x.cast("double") * 1048576.0).cast("long"))))
      .groupBy(col("pos"))
      .agg(sum(col("col")).as("__s"), count(lit(1)).as("__c"))
      .orderBy(col("pos"))
      .select(col("__s"), col("__c"))
      .collect()
    val n = sums.head.getLong(1)
    val mvec = typedLit(sums.map(_.getLong(0).toDouble / (n * 1048576.0)).toSeq)
    val scored = e.select(
      col("vec_id"),
      lit(1).as("__g"),
      (Similarity.dot(col("embedding"), col("embedding"))
        - lit(2.0) * Similarity.dot(col("embedding"), mvec)
        + Similarity.dot(mvec, mvec)).as("__d2"))
    graft.ops.Outliers.flagged(scored, "__g", "__d2", "vec_id", k = 2)
      .select(col("vec_id"), col("__d2").as("d2"))
  }

  /** LSH-bucketed approximate top-10 (rows-only; recall measured in spec). */
  val knnLsh: Q = (spark, dir) => {
    val e = emb(spark, dir)
    Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 10, bits = 4)
  }

  /** Recall@10 of the LSH index against exact brute force — the
    * index-quality report every ANN deployment watches, computed
    * ENTIRELY under the hash gate: both sides are already replayable
    * (brute = the knn_brute cosine ranking; LSH = the knn_lsh
    * hyperplane-literal buckets), so the per-query hit count is
    * cross-engine EXACT, not an acceptance verdict. One bucket join +
    * one k-row-per-query broadcast join; query-sized output.
    */
  val knnLshRecall: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 8)
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", 10, bits = 4)
      .select(col("q_id"), col("n_id"), lit(1L).as("__hit"))
    Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select(col("q_id"), col("n_id"))
      .join(lsh, Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(
        count(lit(1)).as("n_true"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .select(col("q_id"), col("n_true"), col("n_hit"),
        expr("(n_hit * 1000000) DIV n_true").as("recall_ppm"))
  }

  /** IVF+PQ composite ANN ([[graft.ops.Similarity.ivfPqTopK]] — the FAISS
    * IVFPQ shape): coarse cells route each query to 3 of 8 cells, PQ
    * asymmetric distance scores the candidates from their 8-subspace
    * codes. Hash-gated: BOTH fitted literal sets (centroids + codebooks)
    * are captured from this run and the oracle replays routing, encode,
    * and the ADC left-fold ([[knnIvfPqOracleSql]]).
    */
  val knnIvfPq: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val ivf = Similarity.ivfBuild(e, "vec_id", "embedding", nlist = 8, seed = 42L)
    val pq = Similarity.pqBuild(e, "vec_id", "embedding", nsub = 8, k = 16, seed = 42L)
    DynamicOracles.put("knn_ivfpq",
      knnIvfPqOracleSql(ivf.centroids, pq.codebooks, nprobe = 3, k = 10))
    Similarity.ivfPqSearch(ivf, pq, e.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 10, nprobe = 3)
  }

  /** IVF (k-means cells) approximate top-10 — HASH-GATED since round 9:
    * the coarse quantizer's fit is seeded-deterministic, so the trained
    * centroids embed as SQL literals captured from THIS run and DuckDB
    * replays cell assignment, probe routing, and cosine ranking
    * bit-exactly ([[knnIvfOracleSql]]). The spec additionally pins
    * nprobe==nlist bitwise to brute force and bounds recall for partial
    * probes.
    */
  val knnIvf: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val idx = Similarity.ivfBuild(e, "vec_id", "embedding", nlist = 8, seed = 42L)
    DynamicOracles.put("knn_ivf",
      knnIvfOracleSql(idx.centroids, nprobe = 3, k = 10))
    Similarity.ivfSearch(idx, e.filter(col("vec_id") < 8), "vec_id", "embedding",
      10, nprobe = 3)
  }

  /** Distributed Lloyd k-means on the int8 unit-code integer grid
    * ([[graft.ops.Similarity.kmeansCodes]], k=8, 3 fixed iterations):
    * deterministic init (codes of the 8 smallest ids), exact long dist²,
    * first-min tie-break, floor(sum/n) centroid updates — the oracle
    * unrolls the identical trajectory iteration by iteration, putting a
    * CLUSTERING op under the full hash gate (float k-means can't be).
    */
  val embeddingKmeans: Q = (spark, dir) =>
    Similarity.kmeansCodes(emb(spark, dir), "vec_id", "embedding", k = 8, iters = 3)

  /** Per-cluster simplified silhouette over the SAME k-means fit as
    * [[embeddingKmeans]] ([[graft.ops.Similarity.kmeansSilhouette]] —
    * `(b−a)/max(a,b)` on the 2²⁰ grid from exact integer d², O(n·k) not
    * O(n²)): the cluster-quality readout that says whether the k-means
    * partition is worth serving. The oracle unrolls the identical fit
    * (the kmeans replay) plus the one extra distance pass.
    */
  val embeddingSilhouette: Q = (spark, dir) =>
    Similarity.kmeansSilhouette(emb(spark, dir), "vec_id", "embedding", k = 8, iters = 3)

  /** Int8-quantized top-10 by integer dot product over unit-normalized
    * vectors — fully oracle-checked (integer scores leave no float
    * ambiguity), pinning the quantized ANN path end-to-end.
    */
  val knnInt8: Q = (spark, dir) => {
    val e = emb(spark, dir)
    Similarity.int8TopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 10)
  }

  /** Shard-and-merge distributed top-k: the int8 search runs
    * independently over the even and odd corpus shards, the per-shard
    * lists union and re-rank under the same (dot DESC, id) order — and
    * the result must equal the FULL single-corpus search (exact scores
    * make merge lossless; the oracle IS knn_int8's full-search SQL, so
    * the gate executes the theorem). The serving pattern behind every
    * sharded vector index.
    */
  val knnSharded: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 8)
    val shards = Seq(0, 1).map(r =>
      Similarity.int8TopK(
        e.filter(pmod(col("vec_id"), lit(2)) === r), q,
        "vec_id", "embedding", 10))
    val w = Window.partitionBy("q_id").orderBy(col("dot_q").desc, col("n_id"))
    shards.reduce(_ unionByName _)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 10)
      .select("q_id", "n_id", "dot_q", "rank")
  }

  /** Per-vector int8 quantization, projected to scalars for the oracle
    * (array cells don't survive the driver's hashing): scale plus first/
    * last codes and exact integer aggregates over the code array.
    */
  val embeddingQuantize: Q = (spark, dir) =>
    Similarity.quantizeInt8(emb(spark, dir), "embedding")
      .select(
        col("vec_id"),
        col("scale"),
        element_at(col("q"), 1).as("q_first"),
        element_at(col("q"), -1).as("q_last"),
        aggregate(col("q"), lit(0L), (a, v) => a + v).as("q_sum"),
        aggregate(col("q"), lit(0L), (a, v) => a + abs(v)).as("q_l1"))

  /** Exact L2 norms — raw doubles, bitwise-equal cross-engine. */
  val embeddingNorm: Q = (spark, dir) =>
    emb(spark, dir).select(
      col("vec_id"),
      sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("norm"))

  /** JL random projection to 16 md5-derived ±1 directions on the 2^20
    * integer grid — every projected value is an exact long sum, replayed
    * value-for-value by the oracle's inline md5 sign replay.
    */
  val embeddingProject: Q = (spark, dir) =>
    Similarity.signProject(emb(spark, dir), "vec_id", "embedding", k = 16)

  /** Unit-normalization checked by scalar projections (array cells don't
    * survive the driver's pandas hashing, so the oracle compares the first
    * and last components plus the post-normalization norm — all raw
    * doubles, bit-exact per the division/fold discipline).
    */
  val embeddingUnit: Q = (spark, dir) =>
    Similarity.unitNormalize(emb(spark, dir), "embedding")
      .select(
        col("vec_id"),
        element_at(col("unit"), 1).as("u_first"),
        element_at(col("unit"), -1).as("u_last"),
        sqrt(Similarity.dot(col("unit"), col("unit"))).as("unit_norm"))

  // ------------------------------------------------------------------- text

  val textTokens: Q = (spark, dir) =>
    docs(spark, dir).select(
      col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextOps.tokenEstimate(col("text")).cast("long").as("n_tok_est"))

  val textQuality: Q = (spark, dir) =>
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars2"),
      TextOps.tokenCount(col("text")).cast("long").as("n_words"),
      TextOps.avgWordLen(col("text")).as("avg_wlen"),
      TextOps.punctCount(col("text")).cast("long").as("n_punct"),
      TextOps.stopwordRatio(col("text")).as("stop_ratio"))

  val textLangid: Q = (spark, dir) =>
    docs(spark, dir).select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))

  /** Per-document OOV tally against the corpus' own top-100 vocabulary —
    * exact long counts, deterministic vocab cut line.
    */
  val textOov: Q = (spark, dir) =>
    Vocab.oovRate(docs(spark, dir), "doc_id", "text", vocabSize = 100)

  /** Frozen linear quality classifier over the TextOps feature bundle —
    * the "score the whole corpus with the distilled filter" step
    * ([[graft.ops.Inference]]). Weights are DYADIC rationals (exact in
    * binary), features are integer counts divided once, and the logit is
    * a fixed-order IEEE chain — so the scored corpus replays bit-exactly,
    * label included. Thresholding is on the logit (sigmoid is monotone);
    * no transcendental ever enters the plan.
    */
  val inferenceQuality: Q = (spark, dir) => {
    import graft.ops.Inference
    val staged = docs(spark, dir)
      .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("__ws"))
    val logit = Inference.linearLogit(
      -1.25,
      Seq(
        size(col("__ws")).cast("double") -> 0.00390625, // tokens · 2⁻⁸
        TextOps.stopwordRatioOfTokens(col("__ws")) -> 3.0,
        TextOps.avgWordLenOfTokens(col("__ws")) -> 0.125,
        TextOps.punctCount(col("text")).cast("double") -> -0.03125))
    staged.select(col("doc_id"), logit.as("logit"), Inference.label(logit).as("label"))
  }

  /** The held-out-eval staging frame behind the [[graft.ops.Eval]] family:
    * every document scored by the SAME frozen linear classifier as
    * `inference_quality` (bit-replayable logit), labeled by an independent
    * ground truth (`lang = 'en'` — the language the classifier's stopword
    * feature was built from). The fixture model is deliberately WEAK
    * (AUC ≈ 0.5 on this corpus): the eval machinery, not the model, is
    * under test — exactness of ranks, counts and ratios must hold at any
    * model quality.
    */
  private def scoredDocs(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Inference
    val staged = docs(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        TextOps.tokens(col("text")).as("__ws"))
    val logit = Inference.linearLogit(
      -1.25,
      Seq(
        size(col("__ws")).cast("double") -> 0.00390625,
        TextOps.stopwordRatioOfTokens(col("__ws")) -> 3.0,
        TextOps.avgWordLenOfTokens(col("__ws")) -> 0.125,
        TextOps.punctCount(col("text")).cast("double") -> -0.03125))
    staged.select(col("doc_id"),
      (col("lang") === "en").cast("int").as("label"), logit.as("score"))
  }

  /** Exact tie-corrected ROC AUC of the frozen classifier against the
    * language ground truth ([[graft.ops.Eval.aucExact]] — integer rank
    * ledger, distributed prefix sum over the score histogram, one final
    * division). 489 distinct logits over 500 docs at sf0.01, so the tie
    * mid-rank path is genuinely exercised.
    */
  val evalAuc: Q = (spark, dir) =>
    graft.ops.Eval.aucExact(scoredDocs(spark, dir), "label", "score")

  /** Confusion matrix + accuracy/precision/recall/F1 at the logit-0
    * operating point ([[graft.ops.Eval.confusion]] — four conditional
    * sums in one pass, single integer-ratio divisions).
    */
  val evalConfusion: Q = (spark, dir) => {
    val s = scoredDocs(spark, dir)
      .withColumn("pred", (col("score") > 0).cast("int"))
    graft.ops.Eval.confusion(s, "label", "pred")
  }

  /** Precision/recall curve over a fixed dyadic threshold grid spanning
    * the logit range ([[graft.ops.Eval.prCurve]] — the whole curve is ONE
    * corpus scan of 2·|grid| conditional sums; grid ends sit outside the
    * observed range so the degenerate all-positive row is exercised).
    */
  val evalPrCurve: Q = (spark, dir) =>
    graft.ops.Eval.prCurve(scoredDocs(spark, dir), "label", "score",
      Seq(-0.75, -0.625, -0.5, -0.375, -0.25, -0.125, 0.0, 0.125))

  /** Reliability bins over the raw logit at dyadic width 0.125
    * ([[graft.ops.Eval.calibration]] — exact binning, integer positive
    * rates, no mean-of-double in the output).
    */
  val evalCalibration: Q = (spark, dir) =>
    graft.ops.Eval.calibration(scoredDocs(spark, dir), "label", "score", 0.125)

  /** Murphy decomposition of the Brier score by 16 probability bins
    * ([[graft.ops.Eval.brierBins]] — σ(score) floored onto the 2²⁰
    * grid, exact integer sufficient statistics, one fixed-order double
    * per term): reliability / resolution contributions next to each
    * bin's raw Brier mass.
    */
  val evalBrier: Q = (spark, dir) =>
    graft.ops.Eval.brierBins(scoredDocs(spark, dir), "label", "score", bins = 16)

  /** Cumulative gains / lift by score decile ([[graft.ops.Eval
    * .liftByBucket]] — distributed prefix-sum global rank, row_number
    * bucket arithmetic, integer-ratio capture and lift).
    */
  val evalLift: Q = (spark, dir) =>
    graft.ops.Eval.liftByBucket(scoredDocs(spark, dir), "label", "score",
      "doc_id", buckets = 10)

  /** Retrieval acceptance gate for the quantized ANN path: recall@10,
    * true-NN rank and grid-exact reciprocal rank of the int8 integer-dot
    * search against the float brute-force ground truth, per query
    * ([[graft.ops.Eval.retrievalMetrics]] — both lists are already
    * oracle-pinned queries, so the metric replay is end-to-end exact;
    * `MRR = Σ rr_num / (2520·|Q|)` with no double sum anywhere).
    */
  val evalRetrieval: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 8)
    val truth = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
    val sys = Similarity.int8TopK(e, q, "vec_id", "embedding", 10)
    graft.ops.Eval.retrievalMetrics(truth, sys, "q_id", "n_id", "rank", 10)
  }

  /** BLEU-2 over the same doc pairing as `eval_rouge`
    * ([[graft.ops.Eval.bleu2]]): clipped modified precisions, brevity
    * penalty, geometric mean — candidate d scored against reference
    * d+250. Exact integer numerators; the exp and sqrt are single
    * fixed-order calls on exact ratios.
    */
  val evalBleu: Q = (spark, dir) => {
    val d = docs(spark, dir).toDF()
    val pairs = d.select(col("doc_id").as("id_a"),
      (col("doc_id") + 250).as("id_b"))
      .filter(col("id_a") < 250)
    graft.ops.Eval.bleu2(d, "doc_id", "text", pairs)
  }

  /** ROUGE-2 over a deterministic doc pairing ([[graft.ops.Eval.rouge2]],
    * doc d vs doc d+250): clipped bigram overlap, exact integer P/R
    * numerators, one f1 division — the generation-eval primitive under
    * the gate.
    */
  val evalRouge: Q = (spark, dir) => {
    val d = docs(spark, dir).toDF()
    val pairs = d.select(col("doc_id").as("id_a"),
      (col("doc_id") + 250).as("id_b"))
      .filter(col("id_a") < 250)
    graft.ops.Eval.rouge2(d, "doc_id", "text", pairs)
  }

  /** Matryoshka-truncation probe: overlap@10 per query between the int8
    * search over the FULL embedding and over its 16-dim PREFIX (truncate
    * → renormalize → quantize, the MRL deployment question "how much
    * retrieval survives a 4× dimension cut"). Both lists ride the
    * oracle-pinned int8 path, so the overlap counts replay exactly.
    */
  val evalMrl: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val e16 = e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
    val full = Similarity.int8TopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 10)
      .select(col("q_id"), col("n_id"))
    val pref = Similarity.int8TopK(e16, e16.filter(col("vec_id") < 8), "vec_id", "embedding", 10)
      .select(col("q_id"), col("n_id"))
    full.join(pref, Seq("q_id", "n_id"))
      .groupBy("q_id")
      .agg(count(lit(1)).cast("int").as("n_overlap"))
  }

  /** Exact PAV isotonic calibration ([[graft.ops.Eval.isotonicFit]]) of
    * a 20-level grid score against a binary label: the optimal monotone
    * calibration map as exact integer pools. The oracle replays the PAV
    * STACK MACHINE in a recursive CTE — one push or one merge per step,
    * violation tested by the same cross-multiplied longs — so pool
    * boundaries, sizes, and positive counts match bit-for-bit.
    */
  val evalIsotonic: Q = (spark, dir) =>
    graft.ops.Eval.isotonicFit(
      emb(spark, dir).select(
        floor(element_at(col("embedding"), 1).cast("double") * 20).cast("long").as("s"),
        (col("label") < 5).cast("long").as("y")),
      "s", "y")

  /** Split-conformal thresholds ([[graft.ops.Eval.conformalSplit]]) at
    * α = 1/10 and 1/20 over even/odd embedding splits — exact integer
    * rank selection, coverage counted on the held-out half.
    */
  val evalConformal: Q = (spark, dir) => {
    val e = emb(spark, dir).select(
      col("vec_id"),
      floor(element_at(col("embedding"), 1).cast("double") * 1000).cast("long").as("s"))
    graft.ops.Eval.conformalSplit(
      e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
      "s", Seq((1, 10), (1, 20)))
  }

  /** k-anonymity generalization ladder: the acctbal quasi-identifier
    * coarsens through 100 / 1 000 / 10 000-unit buckets and full
    * suppression, and each level reports its group count and SMALLEST
    * group — the table a data-release review reads to pick the minimal
    * generalization meeting k ≥ 5. One scan: the four levels explode from
    * each row (4× level-tagged rows, map-side combined), so choosing a
    * privacy level never rescans the corpus.
    */
  val privacyGeneralize: Q = (spark, dir) => {
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val leveled = c.select(col("c_nationkey"), col("c_mktsegment"),
      explode(array(
        struct(lit(0).as("level"),
          floor(col("c_acctbal") / 100).cast("long").as("qb")),
        struct(lit(1).as("level"),
          floor(col("c_acctbal") / 1000).cast("long").as("qb")),
        struct(lit(2).as("level"),
          floor(col("c_acctbal") / 10000).cast("long").as("qb")),
        struct(lit(3).as("level"), lit(0L).as("qb")))).as("__l"))
    leveled
      .groupBy(col("__l.level").as("level"), col("c_nationkey"),
        col("c_mktsegment"), col("__l.qb"))
      .agg(count(lit(1)).as("__k"))
      .groupBy("level")
      .agg(count(lit(1)).as("n_groups"), min(col("__k")).as("k_min"))
      .withColumn("meets_k", (col("k_min") >= 5).cast("int"))
  }

  /** Seeded-Laplace noised count release ([[graft.ops.Privacy.noisedCounts]],
    * ε = 1): per (type, day) event counts with reproducible inverse-CDF
    * noise on the 2²⁰ ln grid — the DP-mechanism plumbing demo (the
    * scaladoc states plainly why a fixed seed is not DP).
    */
  val privacyNoised: Q = (spark, dir) =>
    graft.ops.Privacy.noisedCounts(
      graft.tables.Tables.eventsDf(spark, dir)
        .select(col("event_type"), to_date(col("ts")).as("event_date")),
      Seq("event_type", "event_date"), epsNumer = 1L, epsDenom = 1L, salt = "dp")

  /** Greedy k-center coreset ([[graft.ops.Similarity.kcenterSelect]],
    * k = 8): the 8 most mutually-distant embeddings on the exact int8
    * grid — diversity-first selection; the oracle replays the farthest-
    * point traversal pick for pick in a recursive CTE.
    */
  val selectKcenter: Q = (spark, dir) =>
    Similarity.kcenterSelect(emb(spark, dir).toDF(), "vec_id", "embedding", k = 8)

  /** Expected Calibration Error ([[graft.ops.Eval.ece]]) of a synthetic
    * grid forecast (first embedding dim shifted onto [0,1), clamped to
    * the 2²⁰ grid) against the binary label — the single-number rollup of
    * `eval_calibration`: per-bin weights cancel into one exact integer
    * numerator; the only double is the closing division.
    */
  val evalEce: Q = (spark, dir) => {
    val S = 1048576L
    val pn = least(greatest(
      floor((element_at(col("embedding"), 1).cast("double") + 0.5) * S.toDouble)
        .cast("long"), lit(0L)), lit(S - 1))
    graft.ops.Eval.ece(
      emb(spark, dir).select(pn.as("__pn"), (col("label") < 5).as("y")),
      "y", col("__pn"), S, bins = 16)
  }

  /** Rank-biased overlap of the int8 list against the float ground truth
    * ([[graft.ops.Eval.rankBiasedOverlap]] at p = 1/2, k = 10): the
    * order-sensitive twin of `eval_retrieval` — a system that returns the
    * right 10 items in the wrong order scores full recall but loses RBO.
    * Dyadic weights keep the whole sum on the `2^10·lcm(1..10)` integer
    * grid; the oracle folds the identical W(m) table.
    */
  val evalRbo: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 8)
    val truth = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
    val sys = Similarity.int8TopK(e, q, "vec_id", "embedding", 10)
    graft.ops.Eval.rankBiasedOverlap(truth, sys, "q_id", "n_id", "rank", 10)
  }

  /** nDCG@10 of the int8 list against the float ground truth
    * ([[graft.ops.Eval.ndcg]]): the GRADED order-sensitive metric closing
    * the retrieval-eval triad — recall (set), RBO (order), nDCG (order ×
    * graded relevance). Discounts ride the frozen `⌊2²⁰/log2(r+1)⌋`
    * integer table (spec-pinned literals), so dcg/idcg are exact longs
    * and `ndcg_ppm` one integer division.
    */
  val evalNdcg: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 8)
    val truth = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
    val sys = Similarity.int8TopK(e, q, "vec_id", "embedding", 10)
    graft.ops.Eval.ndcg(truth, sys, "q_id", "n_id", "rank", 10)
  }

  /** Gopher-style intra-document repetition signals: duplicate-token
    * fraction (map-side HOFs) and the most-frequent bigram's share of all
    * bigrams. The bigram mode is PER-DOCUMENT work, so it runs as a
    * compiled per-row kernel instead of an explode + two (doc, bigram)
    * shuffles — the whole query is one scan with ZERO exchanges
    * (plan-audited). All signals are integer counts divided once:
    * bit-exact cross-engine.
    */
  val textRepetition: Q = (spark, dir) =>
    repetitionSignals(docs(spark, dir))

  /** The repetition kernel over any (doc_id, text) frame — split out so the
    * null-text contract is spec-testable on injected rows.
    */
  private[queries] def repetitionSignals(df: DataFrame): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    df
      // null text must stage as the EMPTY token list: tokens(null) is a
      // null array, which nulls n_tokens and NPEs the typed kernel's
      // non-nullable Long field (the sibling decontamination oracles make
      // the same allowance)
      .select(col("doc_id"),
        coalesce(TextOps.tokens(col("text")), array().cast("array<string>")).as("ws"))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        TextOps.dupUnitFraction(col("ws")).as("dup_word_frac"),
        TextOps.wordNgramsAllOfTokens(col("ws"), 2).as("bgs"))
      .as[(Long, Long, Double, Seq[String])]
      .map { case (id, n, dupf, bgs) =>
        var best = 0
        if (bgs.nonEmpty) {
          val counts = scala.collection.mutable.HashMap.empty[String, Int]
          bgs.foreach { bg =>
            val c = counts.getOrElse(bg, 0) + 1
            counts.update(bg, c)
            if (c > best) best = c
          }
        }
        (id, n, dupf, if (bgs.isEmpty) 0.0 else best.toDouble / bgs.size)
      }
      .toDF("doc_id", "n_tokens", "dup_word_frac", "top_bigram_frac")
  }

  /** Top-5 TF-IDF terms per document — keyword extraction over the corpus.
    * One token-explode shuffle for tf, a vocab-sized aggregate for df, the
    * corpus size as a 1-row broadcast (the BM25 stats pattern), bounded
    * per-doc heaps for the top-k. Ranking orders by the ROUNDED score so
    * libm ln last-ulp differences cannot flip cross-engine ranks.
    */
  val tfidfTopterms: Q = (spark, dir) => {
    val tf = docs(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("term"), col("score"), col("rank"))
  }

  /** Bigram-LM quality score per document (the CCNet/Gopher-style
    * perplexity filter): add-one-smoothed P(w₂|w₁) from corpus bigram/
    * history counts, scored as the mean log-probability over each doc's
    * bigrams. Per-bigram log-probs are FLOORED onto a 1e-6 grid and summed
    * as integers, so the per-doc aggregation is order-independent and
    * bit-exact cross-engine (a raw double sum would depend on partition
    * order; the coarse grid absorbs libm ln last-ulp noise).
    */
  val textPerplexity: Q = (spark, dir) => {
    val staged = docs(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
    val bgs = staged
      .select(
        col("doc_id"),
        explode(arrays_zip(
          slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
          slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))))).as("z"))
      .select(col("doc_id"), col("z.0").as("w1"), col("z.1").as("w2"))
    val hist = bgs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val pair = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vocab = staged
      .select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val contrib = bgs
      .join(pair, Seq("w1", "w2"))
      .join(hist, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn(
        "lp_q",
        floor(log((col("c12") + 1).cast("double") / (col("c1") + col("v"))) * 1000000.0))
    contrib
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_q")).as("__s"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        round(col("__s") / (col("n_bigrams") * 1000000.0), 4).as("logp_avg"))
  }

  /** BM25 relevance over the corpus for a fixed query — the retrieval/
    * data-selection scoring step, all map-side except one single-row
    * statistics aggregate (see [[graft.ops.Ranking]]).
    */
  val bm25Terms = Seq("vector", "stream", "window")
  val bm25Rank: Q = (spark, dir) =>
    Ranking.bm25(docs(spark, dir), "text", "doc_id", bm25Terms)

  /** Greedy max-coverage data selection ([[graft.ops.Coverage
    * .coverageSelect]]): which 12 documents of a bounded pool jointly
    * cover the most distinct vocabulary. Gains are integer counts and
    * ties break by id, so the oracle's recursive CTE replays pick order,
    * marginal gains, and the running covered-universe size exactly.
    */
  val selectCoverage: Q = (spark, dir) => {
    // universe = word 3-gram shingles (the synthetic corpus has ~31
    // distinct TOKENS — token coverage saturates after two picks)
    val pool = docs(spark, dir)
      .filter(col("doc_id") < 120 && col("text").isNotNull)
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("toks"))
    Coverage.coverageSelect(pool, "doc_id", "toks", 12)
  }

  /** Hybrid retrieval — [[graft.ops.Ranking.rrfFuse]] Reciprocal Rank
    * Fusion of the BM25 lexical ranking (fixed query terms) with the int8
    * ANN semantic ranking (query = vector 0, the codegen'd
    * [[graft.ops.Similarity.int8TopK]] path), the way production search
    * stacks combine keyword and embedding retrieval. Both lists rank
    * under deterministic (score DESC, id ASC); the reciprocal lands on
    * the 1e9 long grid (`grid DIV (k + rank)`), so the fused score is an
    * exact integer sum the oracle replays bit-for-bit.
    */
  /** MMR diversified re-rank of the int8 ANN candidate list for query
    * vector 0 ([[graft.ops.Similarity.mmrSelect]]) — every greedy
    * decision compares longs (wRel·dot − wDiv·maxIntDot), so the oracle's
    * recursive CTE replays the selection order, scores and all,
    * bit-for-bit (the [[graft.ops.Packing]] `pack_greedy` discipline).
    */
  val searchMmr: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val cands = Similarity
      .int8TopK(e, e.filter(col("vec_id") === 0), "vec_id", "embedding", 50)
      .select(col("n_id"), col("dot_q"))
    val codes = e.select(
      col("vec_id").as("n_id"),
      graft.functions.VectorExpressions.int8UnitCodes(col("embedding")).as("q"))
    Similarity.mmrSelect(cands.join(codes, "n_id"), "n_id", "dot_q", "q", 10)
      .select(col("n_id").as("doc_id"), col("mmr_score"), col("pick"))
  }

  val searchRrf: Q = (spark, dir) => {
    val lex = Ranking.bm25(docs(spark, dir), "text", "doc_id", bm25Terms)
    val e = emb(spark, dir)
    val sem = Similarity
      .int8TopK(e, e.filter(col("vec_id") === 0), "vec_id", "embedding", 50)
      .select(col("n_id").as("doc_id"), col("dot_q").as("score"))
    Ranking.rrfFuse(Seq(lex, sem), "doc_id", "score")
  }

  /** Canonical-form md5 fingerprint — oracle-able (DuckDB md5 over the same
    * normalization); the xxhash64 rolling hash lives in [[textRolling]] so
    * this query's whole row is oracle-checked.
    */
  val textFingerprint: Q = (spark, dir) =>
    docs(spark, dir).select(
      col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"))

  /** Order-sensitive rolling token hash, md5-token variant — every step
    * (tokenize, md5-prefix token value, ·31 polynomial mod p) replays in
    * DuckDB, so the whole row hash-checks; the faster xxhash64 production
    * variant shares the polynomial and is spec-pinned to the same
    * structure.
    */
  val textRolling: Q = (spark, dir) =>
    docs(spark, dir).select(
      col("doc_id"),
      TextOps.rollingHashReplayable(col("text")).as("rolling"))

  /** Character-class Shannon entropy per document — the gibberish /
    * minified-content / base64-dump quality signal
    * ([[graft.ops.TextOps.classEntropyOfCounts]]): per-class
    * log-likelihoods floored onto the 1e-6 integer grid (the perplexity
    * discipline) so the score replays bit-exactly. Pure Column — zero
    * shuffle, scan speed.
    */
  val textEntropy: Q = (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"), TextOps.charClassCounts(col("text")).as("__cs"))
      .select(
        col("doc_id"),
        col("__cs")("n").as("n_chars"),
        TextOps.classEntropyOfCounts(col("__cs")).as("entropy"))

  /** Flesch reading-ease scoring: words, sentence units, vowel-group
    * syllable estimates — exact long counts feeding ONE fixed-order
    * double formula (206.835 − 1.015·w/s − 84.6·syl/w), so the score
    * replays bit-exactly. The classic prose-difficulty curation signal;
    * pure Column, zero shuffle.
    */
  val textReadability: Q = (spark, dir) =>
    docs(spark, dir)
      .select(
        col("doc_id"),
        TextOps.tokens(col("text")).as("__ws"),
        TextOps.sentenceUnits(col("text")).as("__su"))
      .select(
        col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        size(col("__su")).cast("long").as("n_sentences"),
        aggregate(col("__ws"), lit(0L),
          (acc, w) => acc + regexp_count(w, lit("[aeiouy]+")).cast("long"))
          .as("n_syllables"))
      .withColumn(
        "flesch",
        when(col("n_words") === 0 || col("n_sentences") === 0,
          lit(null).cast("double"))
          .otherwise(round(
            lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
              - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")),
            4)))

  /** Code-vs-prose heuristic: brace/bracket, semicolon and indented-line
    * densities — the "strip code out of the prose corpus (or the other
    * way around)" router every pretrain mix needs. Exact counts; the
    * verdict is one integer cross-multiplication (≥ 1 hit per 50 chars).
    */
  val textCodeDetect: Q = (spark, dir) =>
    docs(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars2"),
        length(regexp_replace(col("text"), "[^{}()\\[\\]]", "")).cast("long")
          .as("n_braces"),
        length(regexp_replace(col("text"), "[^;]", "")).cast("long").as("n_semis"),
        size(filter(split(col("text"), "\n"), l => l.rlike("^  ")))
          .cast("long").as("n_indent_lines"))
      .withColumn(
        "codelike",
        (col("n_braces") + col("n_semis") + col("n_indent_lines")) * 50 >= col("n_chars2"))

  /** Next-word suggestion table: for the 20 most frequent head words, the
    * top-3 following words by bigram count (deterministic cut lines both
    * levels) — the LM-flavored autocomplete staple. Corpus motion is one
    * bigram aggregate; heads broadcast; the per-head rank window sees
    * vocab-sized data.
    */
  val vocabNextWord: Q = (spark, dir) => {
    val bgs = docs(spark, dir)
      .select(TextOps.tokens(col("text")).as("__ws"))
      .select(explode(arrays_zip(
        slice(col("__ws"), lit(1), greatest(size(col("__ws")) - 1, lit(0))),
        slice(col("__ws"), lit(2), greatest(size(col("__ws")) - 1, lit(0))))).as("z"))
      .select(col("z.0").as("w1"), col("z.1").as("w2"))
    val pair = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val heads = pair.groupBy("w1").agg(sum(col("n")).as("__tot"))
      .orderBy(col("__tot").desc, col("w1")).limit(20).select("w1")
    val w = Window.partitionBy("w1").orderBy(col("n").desc, col("w2"))
    pair.join(broadcast(heads), Seq("w1"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("w1", "w2", "n", "rank")
  }

  /** Interpolated Kneser–Ney bigram LM ([[graft.ops.Vocab.kneserNeyBigrams]],
    * d = 3/4): exact-integer smoothed probabilities for every bigram seen
    * ≥ 5 times — the n-gram-LM table a perplexity filter or DSIR-style
    * selector scores against. The oracle folds the identical
    * one-denominator rational.
    */
  val vocabKneserNey: Q = (spark, dir) =>
    Vocab.kneserNeyBigrams(docs(spark, dir).toDF(), "text", minCount = 5L)

  /** Multimodal exact dedup: media grouped by content digest, electing
    * the lowest id as canonical — the byte-identical-asset collapse every
    * multimodal corpus runs before feature extraction (the binary never
    * shuffles, only its 128-bit digest).
    */
  val multimodalDedup: Q = (spark, dir) =>
    Multimodal.metadata(Multimodal.mediaFromDocuments(spark, dir))
      .groupBy(col("content_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("canonical_id"))

  /** Perceptual near-duplicate pairs over the media payloads
    * ([[graft.ops.Multimodal.dhashPairs]] — 60-bit dHash from 61 evenly
    * sampled payload bytes, then the simhash family's exact 4-chunk
    * pigeonhole Hamming join). The byte sampler stands in for a decoded
    * pixel grid (stub discipline); every step replays from the payload
    * in SQL, so unlike the digest dedup ([[multimodalDedup]]) this
    * catches SIMILAR payloads, not only identical ones, under a full
    * hash gate.
    */
  val multimodalDhash: Q = (spark, dir) =>
    Multimodal.dhashPairs(Multimodal.mediaFromDocuments(spark, dir), maxHamming = 3)

  /** Burrows' Delta between sources (Burrows 2002 — the standard
    * stylometric authorship distance: mean absolute z-score difference of
    * the top-k word frequencies): per source, word frequencies in exact
    * integer ppm; per word, the variance NUMERATOR `n·Σf² − (Σf)²` stays
    * an exact long (the ttest sufficient-statistics discipline), and the
    * means CANCEL in the pairwise difference, so each term is
    * `⌊|f₁−f₂|·n·2²⁰ / √var_num⌋` — one exact-long numerator, one IEEE
    * sqrt, one division, one floor, identical operand order in the
    * oracle. Zero-variance words (same frequency everywhere) carry no
    * stylistic signal and exit before the k count. Everything after the
    * one (source, word) count aggregate is (sources × k)-sized.
    */
  val textBurrows: Q = (spark, dir) => {
    val k = 30
    val words = docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("__w"))
    val counts = words.groupBy("source", "__w").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val totals = counts.groupBy("source").agg(sum(col("__c")).as("__t"))
    val top = counts.groupBy("__w").agg(sum(col("__c")).as("__g"))
      .orderBy(col("__g").desc, col("__w")).limit(k)
      .select(col("__w"))
    // dense (source × top-word) frequency grid: absent pairs are f = 0
    val f = totals.crossJoin(broadcast(top))
      .join(counts, Seq("source", "__w"), "left")
      .select(col("source"), col("__w"),
        expr("coalesce(__c, 0) * 1000000 DIV __t").as("__f"))
      .localCheckpoint(true)
    val stats = f.groupBy("__w")
      .agg(count(lit(1)).as("__n"), sum(col("__f")).as("__sf"),
        sum(col("__f") * col("__f")).as("__sf2"))
      .select(col("__w"), col("__n"),
        expr("__n * __sf2 - __sf * __sf").as("__vn"))
      .filter(col("__vn") > 0)
    // explicit renames: f, a, b and stats all descend from one frame, so
    // alias-qualified references stay ambiguous after the checkpoint
    val fa = f.select(col("source").as("source_a"), col("__w"), col("__f").as("__fa"))
    val fb = f.select(col("source").as("source_b"), col("__w"), col("__f").as("__fb"))
    fa.join(fb, Seq("__w"))
      .filter(col("source_a") < col("source_b"))
      .join(stats.select(col("__w"), col("__n"), col("__vn")), Seq("__w"))
      .select(col("source_a"), col("source_b"),
        floor((abs(col("__fa") - col("__fb")) * col("__n") * 1048576L)
          .cast("double") / sqrt(col("__vn").cast("double")))
          .cast("long").as("__term"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("k_words"), sum(col("__term")).as("__s"))
      .select(col("source_a"), col("source_b"), col("k_words"),
        expr("__s DIV k_words").as("delta_grid"))
  }

  /** Simpson lexical-diversity index per document (1 − Σ nᵢ(nᵢ−1) /
    * (N(N−1)) — the probability two random tokens differ; the
    * repeated-token sibling of [[textMattr]]'s windowed view): exact
    * integer ppm via one (doc, word) count aggregate, single-token
    * documents exit (the index needs N ≥ 2). Two shuffles, both on
    * (doc, word) / doc keys — never wider than the tokenized corpus.
    */
  val textSimpson: Q = (spark, dir) => {
    val words = docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("__w"))
    words.groupBy("doc_id", "__w").agg(count(lit(1)).as("__c"))
      .groupBy("doc_id")
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(expr("__c * (__c - 1)")).as("__rep"))
      .filter(col("n_tokens") >= 2)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (lit(1000000L) -
          expr("(__rep * 1000000) DIV (n_tokens * (n_tokens - 1))"))
          .as("simpson_ppm"))
  }

  /** Yule's K repeat-rate per source ([[graft.ops.TextOps.yuleK]] —
    * the length-insensitive lexical-richness measure next to
    * [[textSimpson]]'s per-doc concentration and [[textMattr]]'s
    * windowed TTR: `10⁴·(Σ m²V_m − N)/N²` on the 10⁴·2²⁰ grid, the
    * sufficient-statistics product in DECIMAL(38,0)/HUGEINT). Higher K =
    * more repetitive — the source-level boilerplate screen.
    */
  val textYuleK: Q = (spark, dir) =>
    TextOps.yuleK(docs(spark, dir).toDF(), "source", "text")

  /** Good–Turing frequency re-estimation over corpus word TRIGRAMS
    * ([[graft.ops.Vocab.goodTuring]] — `r* = (r+1)·N_{r+1}/N_r` on the
    * 2²⁰ grid for r ≤ 10): the smoothing table an n-gram LM builds
    * before assigning unseen-mass. Trigrams, not unigrams, because the
    * bounded synthetic vocabulary has no sparse unigram frontier (every
    * word frequent → zero rows — the hollow-gate trap); the trigram
    * space is combinatorial and its singleton ladder is GT's whole
    * subject (~9.4k singleton trigrams at sf0.01).
    */
  val vocabGoodTuring: Q = (spark, dir) =>
    graft.ops.Vocab.goodTuring(docs(spark, dir).toDF(), "text", n = 3, maxR = 10)

  /** Per-document word-3-gram novelty in doc-id order
    * ([[graft.ops.TextOps.ngramNovelty]] — the fraction of a document's
    * distinct grams whose globally FIRST occurrence is this document):
    * the freshness screen before paying to keep a document; near-1 =
    * genuinely new text, near-0 = the corpus already said this.
    */
  val textNovelty: Q = (spark, dir) =>
    TextOps.ngramNovelty(docs(spark, dir).toDF(), "doc_id", "text", n = 3)

  /** Language-ID evaluation: the confusion matrix of the n-gram-heuristic
    * classifier against the table's labeled `lang` — the model-eval table
    * every classifier upgrade is judged on (per-cell exact counts; derive
    * precision/recall downstream).
    */
  val textLangEval: Q = (spark, dir) =>
    docs(spark, dir)
      .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))

  /** Moving-Average Type-Token Ratio per document
    * ([[graft.ops.TextOps.mattrPerDoc]] — Covington & McFall 2010): the
    * length-robust lexical-diversity score, exact integer ppm from an
    * O(n) sliding-multiset compiled kernel (the Column-HOF form would
    * re-tokenize per window — the measured CollapseProject trap). One
    * scan, zero shuffles, doc-sized output; DuckDB replays the window
    * distinct-sum with list slicing.
    */
  val textMattr: Q = (spark, dir) =>
    TextOps.mattrPerDoc(docs(spark, dir), "doc_id", "text", window = 50)

  /** Heaps'-law vocabulary growth (V ≈ K·N^β — the sublinear law every
    * natural corpus obeys; β is the tokenizer-sizing and
    * dedup-health diagnostic: β drifting toward 1 means the corpus keeps
    * minting "new" words, i.e. junk): at dyadic doc-id checkpoints t,
    * N(t) = tokens in docs below t and V(t) = distinct words FIRST SEEN
    * below t (one word-sized min-doc table — no per-prefix distinct
    * recount), both exact longs; ln N / ln V ride the 2²⁰ floor grid and
    * β comes from the exact integer OLS over the ≤ 17 checkpoint points
    * as one closing double division. The threshold fan-out is a
    * broadcast theta-join bounded by the checkpoint count (≤ 17× rows —
    * the events_engagement bounded-fan contract).
    */
  val textHeaps: Q = (spark, dir) => {
    val d = docs(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__ws"))
    val docTok = d
      .select(col("doc_id"), size(col("__ws")).cast("long").as("__nt"))
      .localCheckpoint(true)
    val firsts = d.select(col("doc_id"), explode(col("__ws")).as("__w"))
      .groupBy("__w").agg(min(col("doc_id")).as("__fd"))
      .localCheckpoint(true)
    val maxId = docTok.agg(max(col("doc_id")).as("__mx"))
    val ts = spark.range(1)
      .select(explode(typedLit((4 to 20).map(k => 1L << k))).as("t"))
      .crossJoin(broadcast(maxId))
      .filter(col("t") <= col("__mx")).select("t")
      .localCheckpoint(true)
    val n = broadcast(ts).join(docTok, col("doc_id") < col("t"))
      .groupBy("t").agg(sum(col("__nt")).as("n_tokens"))
    val v = broadcast(ts).join(firsts, col("__fd") < col("t"))
      .groupBy("t").agg(count(lit(1)).as("v_words"))
    val pts = n.join(v, Seq("t"))
      .filter(col("n_tokens") > 0 && col("v_words") > 0)
      .select(col("t"), col("n_tokens"), col("v_words"),
        floor(log(col("n_tokens").cast("double")) * 1048576.0)
          .cast("long").as("ln_n_grid"),
        floor(log(col("v_words").cast("double")) * 1048576.0)
          .cast("long").as("ln_v_grid"))
      .localCheckpoint(true)
    val st = pts.agg(
      count(lit(1)).as("__k"),
      sum(col("ln_n_grid")).as("__sx"),
      sum(col("ln_v_grid")).as("__sy"),
      sum(col("ln_n_grid") * col("ln_v_grid")).as("__sxy"),
      sum(col("ln_n_grid") * col("ln_n_grid")).as("__sxx"))
    pts.crossJoin(broadcast(st))
      .select(col("t"), col("n_tokens"), col("v_words"),
        col("ln_n_grid"), col("ln_v_grid"),
        when(col("__k") * col("__sxx") - col("__sx") * col("__sx") =!= 0,
          (col("__k") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            (col("__k") * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
          .otherwise(lit(null).cast("double")).as("beta"))
  }

  /** End-to-end DPO/RLHF preference-data prep — the composition a
    * post-training data pipeline actually runs, each stage an
    * already-gated operator: max-margin preference pairs per language
    * ([[graft.ops.Labels.preferencePairs]] — the label_pref_pairs
    * construction), DECONTAMINATION of the chosen side against the
    * held-out eval slice by content digest (any pair whose chosen text
    * appears verbatim in eval leaks the benchmark — dropped), and a
    * pair-atomic 90/10 train/val split keyed on chosen_id
    * ([[graft.ops.Sampling.splitColumn]] — both halves of a pair can
    * never straddle the split). Output: per (split, lang) pair counts
    * and exact margin mass.
    */
  val pipelineDpo: Q = (spark, dir) => {
    val d = docs(spark, dir).toDF()
    val pairs = graft.ops.Labels.preferencePairs(
      d.select("doc_id", "lang", "n_chars"), "lang", "doc_id",
      coalesce(col("n_chars"), lit(0L)), minMargin = 1L)
    val digests = d.select(col("doc_id"), md5(col("text")).as("__h"))
    val evalSet = digests.filter(col("doc_id") % 97 === 0)
      .select(col("__h")).distinct()
    val clean = pairs
      .join(digests.select(col("doc_id").as("chosen_id"), col("__h")),
        Seq("chosen_id"))
      .join(evalSet, Seq("__h"), "left_anti")
    clean
      .withColumn("split", Sampling.splitColumn(col("chosen_id"),
        Seq("train" -> 0.9, "val" -> 0.1), "dpo"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_pairs"), sum(col("margin")).as("sum_margin"))
  }

  /** Bradley–Terry strength ratings from pairwise contests — the
    * arena-style model-ranking machinery (and the reward-model view of
    * preference data): consecutive documents of DIFFERENT languages
    * contest, the longer text wins (ties break to the smaller language
    * string), and two unrolled minorization–maximization rounds (Hunter
    * 2004: `r_i ← W_i / Σ_j n_ij/(r_i + r_j)`) run ENTIRELY on the 1e6
    * integer grid — each reciprocal term is one exact long floor division
    * `⌊n_ij·10¹² / (r_i + r_j)⌋`, so the trajectory replays bit-for-bit.
    * Everything after the one contest aggregate is language-pair-sized.
    */
  val evalBradleyTerry: Q = (spark, dir) => {
    val d = docs(spark, dir)
      .filter(col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_chars"), lit(0L)).as("__s"))
    val aWins = col("a.__s") > col("b.__s") ||
      (col("a.__s") === col("b.__s") && col("a.lang") < col("b.lang"))
    val contests = d.as("a")
      .join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1 &&
          col("a.lang") =!= col("b.lang"))
      .select(
        when(aWins, col("a.lang")).otherwise(col("b.lang")).as("winner"),
        when(aWins, col("b.lang")).otherwise(col("a.lang")).as("loser"))
    val pw = contests.groupBy(col("winner").as("i"), col("loser").as("j"))
      .agg(count(lit(1)).as("w"))
    val sym = pw.select(col("i"), col("j"), col("w"))
      .union(pw.select(col("j"), col("i"), lit(0L)))
      .groupBy("i", "j").agg(sum(col("w")).as("wij"))
      .localCheckpoint(true)
    val m = sym.as("x")
      .join(sym.as("y"), col("x.i") === col("y.j") && col("x.j") === col("y.i"))
      .select(col("x.i").as("i"), col("x.j").as("j"),
        (col("x.wij") + col("y.wij")).as("n"))
      .localCheckpoint(true)
    val wi = sym.groupBy("i").agg(sum(col("wij")).as("wi"))
    val nc = m.groupBy("i").agg(sum(col("n")).as("n_contests"))
    var r = wi.select(col("i").as("lang"), lit(1000000L).as("r"))
    for (_ <- 1 to 2) {
      val den = m
        .join(r.select(col("lang").as("i"), col("r").as("ri")), Seq("i"))
        .join(r.select(col("lang").as("j"), col("r").as("rj")), Seq("j"))
        // greatest(·,1): a zero-rated pair (two languages with zero total
        // wins contesting each other) must not hit DIV 0 — Spark would
        // yield NULL while DuckDB // errors; the guard is mirrored in the
        // oracle so both engines replay the same trajectory.
        .select(col("i"), expr("(n * 1000000000000) DIV greatest(ri + rj, 1)").as("t"))
        .groupBy("i").agg(sum(col("t")).as("den"))
      r = wi.join(den, Seq("i"))
        .select(col("i").as("lang"), expr("(wi * 1000000000000) DIV den").as("r"))
    }
    r.join(nc.withColumnRenamed("i", "lang"), Seq("lang"))
      .join(wi.withColumnRenamed("i", "lang"), Seq("lang"))
      .select(col("lang"), col("n_contests"), col("wi").as("n_wins"),
        col("r").as("rating_ppm"))
  }

  /** Codex-style pass@k (Chen et al. 2021, the unbiased estimator
    * `1 − C(n−c, k)/C(n, k)`): per task (docs bucketed by `doc_id % 10` —
    * attempts), c = attempts passing the length gate, and pass@{1,3,5}
    * computed EXACTLY — the falling-factorial products ride DECIMAL(38)
    * (the sufficient-statistics discipline: 250-attempt tasks overflow
    * int64 at k=5) and the single closing division is exact because the
    * scaled numerator is reduced to a multiple of the denominator first
    * (`(x − pmod(x, den)) / den` — decimal floor division, both sides
    * nonnegative). Tasks with n < k stay NULL rather than lying. One
    * scan, task-sized output.
    *
    * Scale ceiling: the k=5 falling-factorial product is ~n⁵·10⁶, which
    * exceeds DECIMAL(38) (and DuckDB HUGEINT) once n_attempts ≳ 4·10⁷ per
    * task — past that Spark decimal arithmetic yields NULL silently while
    * DuckDB errors loudly. At 100 TB, cap attempts per task (sample to
    * ≤10⁶ — the estimator is already an average over subsets) or bucket
    * tasks finer before this aggregate; the int64 note above covers only
    * the 250-attempt overflow, not this ceiling.
    */
  val evalPassAtK: Q = (spark, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val one = lit(java.math.BigDecimal.ONE).cast(d38)
    def fallProd(term: Column => Column, k: Int): Column =
      aggregate(sequence(lit(0L), lit(k - 1L)), one,
        (acc, i) => (acc * term(i).cast(d38)).cast(d38))
    def passPpm(k: Int): Column = {
      val num = fallProd(i => greatest(col("n_correct") * -1 +
        col("n_attempts") - i, lit(0L)), k)
      val den = fallProd(i => col("n_attempts") - i, k)
      val x = (lit(1000000L).cast(d38) * num).cast(d38)
      when(col("n_attempts") >= k,
        (lit(1000000L) - ((x - pmod(x, den)) / den).cast("long")))
        .otherwise(lit(null).cast("long")).as(s"pass${k}_ppm")
    }
    docs(spark, dir)
      .select((col("doc_id") % 10).as("task"),
        (coalesce(col("n_chars"), lit(0L)) >= 200).cast("int").as("__ok"))
      .groupBy("task")
      .agg(count(lit(1)).as("n_attempts"), sum(col("__ok")).as("n_correct"))
      .select(col("task"), col("n_attempts"), col("n_correct"),
        passPpm(1), passPpm(3), passPpm(5))
  }

  /** McNemar's paired test (the correct significance test when TWO
    * classifiers score the SAME items — accuracy deltas alone ignore the
    * pairing): classifier A = the n-gram language-ID heuristic, baseline
    * B = always-predict-'en' (the majority class), truth = the `lang`
    * column. Only the DISCORDANT cells matter: b = A right ∧ B wrong,
    * c = A wrong ∧ B right; the continuity-corrected statistic
    * `(max(|b−c|−1, 0))²/(b+c)` rides the 1e6 integer grid (exact counts,
    * one integer DIV — fully hash-replayable; compare grid 3 841 459 ≈
    * the χ²₁ 5% line). One corpus scan, four conditional sums, one row.
    */
  val evalMcnemar: Q = (spark, dir) => {
    val scored = docs(spark, dir)
      .filter(col("lang").isNotNull && col("text").isNotNull)
      .select(
        (TextOps.langId(col("text")) === col("lang")).cast("int").as("__a"),
        (col("lang") === "en").cast("int").as("__b"))
    scored.agg(
        count(lit(1)).as("n_items"),
        sum(when(col("__a") === 1 && col("__b") === 0, 1L).otherwise(0L))
          .as("b_discordant"),
        sum(when(col("__a") === 0 && col("__b") === 1, 1L).otherwise(0L))
          .as("c_discordant"))
      .withColumn("mcnemar_grid",
        when(col("b_discordant") + col("c_discordant") > 0,
          expr("""greatest(abs(b_discordant - c_discordant) - 1, 0)
                 | * greatest(abs(b_discordant - c_discordant) - 1, 0)
                 | * 1000000
                 | div (b_discordant + c_discordant)""".stripMargin))
          .otherwise(lit(null).cast("long")))
  }

  /** Vocabulary coverage curve: the share of all token occurrences that
    * the top-100/1k/10k words cover (exact ppm under the deterministic
    * (freq DESC, word ASC) rank) — the tokenizer-sizing readout the OOV
    * rate summarizes pointwise. The rank window runs over the VOCAB, not
    * the corpus.
    */
  val vocabCoverage: Q = (spark, dir) => {
    val ranked = Vocab.wordCounts(docs(spark, dir), "text")
      .withColumn("__rn",
        row_number().over(Window.orderBy(col("wfreq").desc, col("word"))))
    ranked.agg(
      count(lit(1)).as("n_vocab"),
      sum(col("wfreq")).as("n_tokens"),
      sum(when(col("__rn") <= 100, col("wfreq")).otherwise(0L)).as("__c100"),
      sum(when(col("__rn") <= 1000, col("wfreq")).otherwise(0L)).as("__c1k"),
      sum(when(col("__rn") <= 10000, col("wfreq")).otherwise(0L)).as("__c10k"))
      .select(col("n_vocab"), col("n_tokens"),
        expr("__c100 * 1000000 DIV n_tokens").as("cov100_ppm"),
        expr("__c1k * 1000000 DIV n_tokens").as("cov1k_ppm"),
        expr("__c10k * 1000000 DIV n_tokens").as("cov10k_ppm"))
  }

  /** Type-token ratio per document — the lexical-diversity quality
    * signal (template spam and keyword stuffing score low). Pure Column,
    * zero shuffle; integer counts divided once.
    */
  val textTtr: Q = (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__ws"))
      .select(
        col("doc_id"),
        size(col("__ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("__ws"))).cast("long").as("n_types"))
      .withColumn("ttr",
        when(col("n_tokens") === 0, 0.0)
          .otherwise(col("n_types").cast("double") / col("n_tokens")))

  /** Top-20 PMI collocations (bigrams that co-occur far above unigram
    * chance, support ≥ 5) — the keyphrase-mining staple. The PMI ratio
    * builds from exact long counts in ONE fixed-order double expression
    * and lands on the 1e-6 log grid (the perplexity discipline), so the
    * ranking and the score replay exactly. Corpus motion: the bigram and
    * unigram aggregates; everything after is vocab-sized.
    */
  val textCollocations: Q = (spark, dir) => {
    val staged = docs(spark, dir)
      .select(TextOps.tokens(col("text")).as("ws"))
    val bgs = staged
      .select(explode(arrays_zip(
        slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
        slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))))).as("z"))
      .select(col("z.0").as("w1"), col("z.1").as("w2"))
    val pair = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = staged.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("u"))
    val totals = pair.agg(sum(col("c12")).as("npairs"))
      .crossJoin(uni.agg(sum(col("u")).as("ntok")))
    pair.filter(col("c12") >= 5)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("u", "u1"), Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("u", "u2"), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi_q",
        floor(log(
          ((col("c12").cast("double") * col("ntok")) * col("ntok"))
            / ((col("npairs").cast("double") * col("u1")) * col("u2")))
          * 1000000.0).cast("long"))
      .orderBy(col("pmi_q").desc, col("w1"), col("w2"))
      .limit(20)
      .select("w1", "w2", "c12", "pmi_q")
  }

  /** Corpus embedding diversity WITHOUT the quadratic pair sweep: the
    * mean pairwise dot product from the one-pass identity
    * `Σᵢ≠ⱼ eᵢ·eⱼ = ‖Σe‖² − Σ‖e‖²` — on the 2^20 integer grid both sides
    * are EXACT integers, so the collapse-detection headline (diversity
    * → 0 as embeddings cluster) replays bit-exactly while touching each
    * vector once. One dim-sized aggregate + one scalar aggregate.
    */
  val embeddingDiversity: Q = (spark, dir) => {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = emb(spark, dir).select(
      transform(col("embedding"), x => floor(x.cast("double") * 1048576.0).cast("long"))
        .as("__g"))
    // ONE pass over the exploded components: per-dim sums AND per-dim
    // square sums together, then one dim-sized collapse (the count-star
    // rides parquet metadata, not a data scan)
    val per = g.select(posexplode(col("__g")))
      .groupBy(col("pos"))
      .agg(
        sum(col("col").cast(d38)).as("__s"),
        sum(col("col").cast(d38) * col("col")).as("__qd"))
    val agg = per.agg(
      coalesce(sum(col("__s") * col("__s")), lit(0).cast(d38)).as("__s2"),
      coalesce(sum(col("__qd")), lit(0).cast(d38)).as("__q"))
    val n = g.agg(count(lit(1)).as("n_vectors"))
    n.crossJoin(agg)
      .select(
        col("n_vectors"),
        when(col("n_vectors") > 1,
          (col("__s2") - col("__q")).cast("double")
            / ((col("n_vectors") * (col("n_vectors") - 1)).cast("double")
              * 1099511627776.0))
          .otherwise(lit(null).cast("double")).as("mean_pair_dot"))
  }

  /** Near-dup threshold tuning table: candidate-pair counts per 0.05
    * cosine band (≥ 0.30, the LSH-bucketed kernel) — read this BEFORE
    * picking a dedup threshold: the knee in the band histogram separates
    * the duplicate mass from the background. Same bucket shapes as
    * [[dedupEmbedding]]; the banding is one floor on the already-replayed
    * rounded cosine.
    */
  val dedupThresholdSweep: Q = (spark, dir) =>
    Similarity.cosineNearDupPairs(emb(spark, dir), "vec_id", "embedding", 0.30, bits = 4)
      .withColumn("band", floor(col("cos") * 20).cast("long"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_pairs"))

  /** Byte-budgeted media sharding: media packed into ~1 MiB bins per
    * source stream ([[graft.ops.Packing.sequentialBins]] on bytes instead
    * of tokens) — the shard plan a multimodal export hands its writers.
    */
  val multimodalBins: Q = (spark, dir) =>
    Packing.sequentialBins(
      Multimodal.metadata(Multimodal.mediaFromDocuments(spark, dir))
        .select(col("source"), col("media_id"), col("n_bytes")),
      "source", "media_id", "n_bytes", budget = 1L << 20)
      .select("source", "media_id", "n_bytes", "bin")

  /** Inter-class separation map: pairwise cosine between per-label
    * embedding centroids — "are my classes separable / drifting
    * together" at a glance. Centroids accumulate on the exact 2^20 grid
    * per (label, pos) — cosine's scale invariance makes the raw grid
    * sums stand in for means (the lookalike trick), so the whole matrix
    * is the proven dot/norm kernel over exact inputs, label²-sized after
    * one aggregate.
    */
  val embeddingLabelSim: Q = (spark, dir) => {
    val cents = emb(spark, dir)
      .select(col("label"), posexplode(
        transform(col("embedding"), x => floor(x.cast("double") * 1048576.0).cast("long"))))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("__s"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("__s")))),
        x => x.getField("__s").cast("double")).as("__cv"))
    val a = cents.select(col("label").as("label_a"), col("__cv").as("__ca"))
    val b = cents.select(col("label").as("label_b"), col("__cv").as("__cb"))
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        (Similarity.dot(col("__ca"), col("__cb"))
          / (Similarity.l2Norm(col("__ca")) * Similarity.l2Norm(col("__cb"))))
          .as("cos"))
  }

  /** Nearest-centroid label purity: every vector is assigned to its
    * closest label centroid (cosine, deterministic (cos DESC, label)
    * tie-break) and scored against its own label — the one-number
    * "do my embeddings respect my labels" evaluation
    * ([[embeddingLabelSim]]'s separation map collapsed to accuracy).
    * Centroids broadcast; the corpus scans once.
    */
  val embeddingLabelPurity: Q = (spark, dir) => {
    val cents = emb(spark, dir)
      .select(col("label"), posexplode(
        transform(col("embedding"), x => floor(x.cast("double") * 1048576.0).cast("long"))))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("__s"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("__s")))),
        x => x.getField("__s").cast("double")).as("__cv"))
      .select(col("label").as("__cl"), col("__cv"))
    val scored = emb(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .join(broadcast(cents))
      .select(col("vec_id"), col("label"), col("__cl"),
        (Similarity.dot(col("embedding"), col("__cv"))
          / (Similarity.l2Norm(col("embedding")) * Similarity.l2Norm(col("__cv"))))
          .as("__cos"))
    val w = Window.partitionBy("vec_id").orderBy(col("__cos").desc, col("__cl"))
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__cl") === col("label"), 1L).otherwise(0L)).as("n_correct"))
  }

  /** Mutual k-nearest-neighbor pairs over the first 64 vectors: (a, b)
    * where each is in the other's cosine top-5 — the symmetric-affinity
    * edge set density-based clustering builds on (one-sided neighbors
    * are hubness noise). Composes the proven brute-force ranking with a
    * self-join on the (query, neighbor) edge list.
    */
  val knnMutual: Q = (spark, dir) => {
    val sub = emb(spark, dir).filter(col("vec_id") < 64)
    val topk = Similarity.bruteForceTopK(sub, sub, "vec_id", "embedding", 5)
      .select(col("q_id"), col("n_id"))
    topk.as("x")
      .join(topk.as("y"),
        col("x.q_id") === col("y.n_id") && col("x.n_id") === col("y.q_id"))
      .filter(col("x.q_id") < col("x.n_id"))
      .select(col("x.q_id").as("id_a"), col("x.n_id").as("id_b"))
  }

  /** Mutual information between document language and source
    * ([[graft.ops.Checks.mutualInfo]]) — "does source determine
    * language?" on the floored 1e-6 log grid, so every cell term is an
    * exact long and the oracle replays mi/hx/hy/nmi bit-for-bit.
    */
  val featureMi: Q = (spark, dir) =>
    graft.ops.Checks.mutualInfo(docs(spark, dir), "lang", "source")

  val docStats: Q = (spark, dir) =>
    docs(spark, dir)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum("n_chars") / count(lit(1))).as("avg_chars"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))

  // ------------------------------------------------------------- multimodal

  val multimodalMeta: Q = (spark, dir) =>
    Multimodal
      .metadata(Multimodal.mediaFromDocuments(spark, dir))
      .select("media_id", "n_bytes", "content_md5")

  /** Two-tower alignment screen ([[graft.ops.Multimodal.pairAlignment]]):
    * the embeddings fixture's halves stand in for the caption / image
    * towers; every pair's true cosine must beat its derangement control.
    */
  val multimodalAlignment: Q = (spark, dir) => {
    val e = emb(spark, dir)
    val n = e.count() / 2
    Multimodal.pairAlignment(e, "vec_id", "embedding", n, n)
  }

  /** mapPartitions batch decode (stubbed codec) — oracle replays the stub's
    * arithmetic on octet_length, validating the full binary→feature path.
    */
  val multimodalFeatures: Q = (spark, dir) =>
    Multimodal
      .extractFeatures(Multimodal.mediaFromDocuments(spark, dir))
      .toDF()

  /** Every-3rd-frame sampling fan-out (map-side generator). */
  val multimodalFrames: Q = (spark, dir) =>
    Multimodal.sampleFrames(Multimodal.mediaFromDocuments(spark, dir), 3)

  /** Aspect-preserving resize planning to a 48px bound (integer-exact). */
  val multimodalResize: Q = (spark, dir) =>
    Multimodal.resizePlan(Multimodal.mediaFromDocuments(spark, dir), 48)

  /** Sink round-trip under the oracle gate: documents are WRITTEN to ORC,
    * READ BACK, and aggregated — while the oracle aggregates the ORIGINAL
    * parquet. Any loss or corruption in the write→read path (types,
    * nulls, unicode, encoding) breaks the hash compare, so this covers
    * the read-back path the plan-asserted SourcesSpec cannot. The filter
    * after the read exercises ORC predicate pushdown on the replay.
    */
  val sourceRoundtrip: Q = (spark, dir) => {
    val path = System.getProperty("java.io.tmpdir") + "/graft_roundtrip_orc"
    Sources.writeOrc(docs(spark, dir).select("doc_id", "source", "text"), path)
    Sources.readOrc(spark, path)
      .filter(length(col("text")) > 0)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
  }

  /** Schema evolution under the oracle gate: the corpus is written as two
    * generations with DIFFERENT schemas (v1 lacks `lang`/`n_chars` — the
    * pre-migration files), read back through the merged-schema path
    * ([[graft.sources.Sources.readEvolving]]), and aggregated with the
    * null-filled columns exercised both as a group key (coalesced) and a
    * summed measure (null-skipped) — exactly what breaks when a reader
    * mishandles missing-column files. The oracle reconstructs the same
    * view from the original table.
    */
  val sourceEvolution: Q = (spark, dir) => {
    val base = docs(spark, dir)
    val path = System.getProperty("java.io.tmpdir") + "/graft_evolving_parquet"
    base.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
      .write.mode("overwrite").parquet(path + "/v=1")
    base.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(path + "/v=2")
    Sources.readEvolving(spark, path)
      .groupBy(coalesce(col("lang"), lit("unknown")).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).cast("long").as("text_chars"))
  }

  /** Snapshot diff between two deterministic corpus versions — the
    * change-data-capture report ([[graft.ops.Snapshot]]): version B drops
    * every 97th doc, revises every 89th survivor, and adds re-keyed copies
    * of every 101st; the diff must classify exactly those. Row-level,
    * non-unchanged rows only.
    */
  val snapshotDiff: Q = (spark, dir) => {
    val before = docs(spark, dir).select(col("doc_id"), col("text"), col("source"))
    val after = before
      .filter(col("doc_id") % 97 =!= 0)
      .withColumn(
        "text",
        when(col("doc_id") % 89 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      .unionByName(before.filter(col("doc_id") % 101 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source")))
    graft.ops.Snapshot.diff(before, after, Seq("doc_id"), Seq("text", "source"))
      .filter(col("status") =!= "unchanged")
  }

  /** Group-level MinHash via the custom typed Aggregator: per-source corpus
    * signature (element-wise min of doc signatures). Hash-gated: the
    * per-shingle hash is [[Dedup.minhashSignatureMd5]] (first 15 hex
    * nibbles of `md5(shingle # j)` — the dedup_simhash replayable
    * pattern), so DuckDB recomputes min-per-permutation over the same
    * shingles directly per source — which equals the element-wise min of
    * the per-doc signatures the Aggregator reduces (the min-of-mins
    * identity the Aggregator exists to exploit).
    */
  val sourceMinhash: Q = (spark, dir) => {
    // tokens staged as an attribute: an inline tokens(text) inside the
    // shingle lambda re-tokenizes per shingle (O(words²) regex per row)
    val shingled = graft.ops.Partitioning
      .densify(docs(spark, dir), col("doc_id"))
      .filter(col("text").isNotNull)
      .select(col("source"), TextOps.tokens(col("text")).as("toks"))
      .select(
        col("source"),
        TextOps.wordShinglesOfTokens(col("toks"), 3).as("shingles"))
    val sigs = shingled.select(
      col("source"),
      Dedup.minhashSignatureMd5(col("shingles"), 16).cast("array<bigint>").as("sig"))
    sigs
      .groupBy("source")
      .agg(graft.functions.MinHashAggregator.groupSignature(col("sig"), 16).as("group_sig"))
      // Driver-hashable scalar: the harness sorts/hashes cells with pandas,
      // which cannot factorize array cells — ship the signature as a string.
      .select(col("source"), concat_ws(",", col("group_sig")).as("group_sig"))
  }

  /** Sketch-based distinct counting next to the exact answer — the
    * constant-memory path for 100 TB cardinalities (HLL++: one small buffer
    * per group, order-independent merges). Hash-gated via the ACCEPTANCE
    * VERDICT: the estimate itself is engine-specific and cannot
    * cross-engine hash-match, but its error CONTRACT can — the query emits
    * the exact side plus a per-group boolean `within_5pct` (HLL++ at
    * default rsd 0.05), and the oracle computes the exact side and asserts
    * the verdict TRUE. A drifting sketch flips the boolean and fails the
    * hash gate — the bound moved from spec prose into the driver's gate.
    */
  val approxParts: Q = (spark, dir) =>
    spark.read
      .parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("__approx"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n"))
      .select(
        col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("__approx") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("within_5pct"))

  /** Mergeable sketch rollup: a per-(source, lang) HLL sketch table of
    * distinct texts, rolled up to per-source estimates by sketch UNION —
    * no rescan ([[graft.ops.SketchRollup]]). Hash-gated via the ACCEPTANCE
    * VERDICTS (the approx_parts pattern): the output carries the exact
    * side plus two per-source booleans — `within_5pct` (rollup estimate
    * within HLL error of the exact distinct count) and `merge_lossless`
    * (union-of-fine ≡ direct-coarse estimate EXACTLY, the property that
    * makes a persisted sketch table trustworthy) — and the oracle computes
    * the exact side and asserts both verdicts TRUE.
    */
  val sketchRollup: Q = (spark, dir) => {
    val base = docs(spark, dir).filter(col("text").isNotNull)
    val fine = graft.ops.SketchRollup.build(base, Seq("source", "lang"), "text")
    val rolled = graft.ops.SketchRollup.rollup(fine, Seq("source"))
      .select(col("source"), col("distinct_est"), col("n_rows"))
    val direct = graft.ops.SketchRollup.build(base, Seq("source"), "text")
      .select(col("source"), hll_sketch_estimate(col("sketch")).as("__direct"))
    val exact = base.groupBy("source")
      .agg(countDistinct(col("text")).as("exact_distinct"))
    rolled
      .join(direct, Seq("source"))
      .join(exact, Seq("source"))
      .select(
        col("source"), col("n_rows"), col("exact_distinct"),
        (abs(col("distinct_est") - col("exact_distinct")) <=
          col("exact_distinct") * 0.05).as("within_5pct"),
        (col("distinct_est") === col("__direct")).as("merge_lossless"))
  }

  // ------------------------------------------------- sampling / packing

  /** Deterministic 80/10/10 train/val/test labels by salted md5 — pure
    * map-side, id-stable under corpus growth, replayed verbatim by the
    * oracle (md5 is the cross-engine hash; see [[Sampling]]).
    */
  val sampleSplit: Q = (spark, dir) =>
    docs(spark, dir).select(
      col("doc_id"),
      Sampling.splitColumn(
        col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))

  /** EXACT-100 uniform document sample by salted-md5 rank
    * ([[graft.ops.Sampling.exactKSample]]) — guaranteed SIZE where the
    * fraction sampler guarantees only the rate; one TakeOrdered heap.
    */
  val sampleExactK: Q = (spark, dir) =>
    Sampling.exactKSample(
      docs(spark, dir).select("doc_id", "source", "n_chars"), "doc_id", 100)

  /** Balanced eval-set draw: exactly 5 docs per source under the same
    * hash order ([[graft.ops.Sampling.exactKPerGroup]], WindowGroupLimit
    * pruned).
    */
  val sampleKPerGroup: Q = (spark, dir) =>
    Sampling.exactKPerGroup(
      docs(spark, dir).select("doc_id", "source", "n_chars"),
      "source", "doc_id", 5)

  /** GROUP-aware split: hash the source, not the document, so every
    * document of a source lands in the same split — the leakage-safe
    * variant when near-duplicates cluster within groups (same crawl
    * domain, same book, same repo). Same stability property, one level up:
    * adding documents never reassigns a group.
    */
  val sampleSplitGroup: Q = (spark, dir) =>
    docs(spark, dir).select(
      col("doc_id"),
      col("source"),
      Sampling.splitColumn(
        col("source"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))

  /** Quality-weighted importance sampling: keep probability proportional
    * to a per-document score (here: length-based, capped at 1) — the
    * data-mixing shape where quality scoring feeds sampling directly.
    */
  val sampleWeighted: Q = (spark, dir) => {
    val scored = docs(spark, dir).select(
      col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_words"))
    Sampling.importanceSample(
      scored, "doc_id", least(lit(1.0), col("n_words") / 200.0))
  }

  /** DSIR-style importance selection ([[graft.ops.Sampling.dsirSelect]]):
    * the 50 documents whose hashed-unigram profile most resembles the
    * English subcorpus relative to the whole corpus — add-one-smoothed
    * log-likelihood-ratio buckets on the 2²⁰ ln grid, exact integer doc
    * scores, deterministic rank cut. The oracle rebuilds the md5 buckets
    * digit by digit (ascii-mapped hex) and folds the identical rational.
    */
  val sampleDsir: Q = (spark, dir) =>
    Sampling.dsirSelect(docs(spark, dir).toDF(), "doc_id", "text",
      col("lang") === "en", buckets = 64, topK = 50)

  /** Token-budget quota fill ([[graft.ops.Sampling.budgetFill]]): each
    * language contributes its longest docs (n_chars desc, doc_id tiebreak)
    * until its token ceiling fills — the deterministic mixing cut that
    * turns "40% en / 20% de…" recipes into an exact row set. zh is
    * deliberately absent from the recipe (absent groups drop).
    */
  val sampleBudget: Q = (spark, dir) =>
    Sampling.budgetFill(
      docs(spark, dir).toDF(),
      "lang",
      coalesce(TextOps.tokenCount(col("text")), lit(0)),
      coalesce(col("n_chars"), lit(0L)),
      "doc_id",
      Seq("en" -> 6000L, "de" -> 2000L, "fr" -> 2000L, "es" -> 2000L))
      .select("doc_id", "lang", "cum_cost")

  /** Curriculum staging over token-count difficulty
    * ([[graft.ops.Sampling.curriculumStages]]): four equal-count stages,
    * shortest documents first — the ordering a curriculum schedule feeds
    * from.
    */
  val sampleCurriculum: Q = (spark, dir) =>
    Sampling.curriculumStages(
      docs(spark, dir).toDF(), "doc_id",
      coalesce(TextOps.tokenCount(col("text")), lit(0)), stages = 4)

  /** Mixture weights for [[sampleMixture]]: even-numbered sources kept at
    * 0.9, odd at 0.3 — shared between the Spark query and the oracle CASE.
    */
  private val mixWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (if (i % 2 == 0) 0.9 else 0.3)).toMap

  /** Re-weight the corpus to a target source mixture: per-source keep
    * probabilities via the broadcast weights dim — no shuffle of the corpus.
    */
  val sampleMixture: Q = (spark, dir) =>
    Sampling.mixtureSample(
      docs(spark, dir).select("doc_id", "source"), "doc_id", "source", mixWeights)

  /** Exact 5-per-source stratified draw by hash order — rides the bounded
    * TopK heaps, never a full per-stratum sort.
    */
  val sampleStratified: Q = (spark, dir) =>
    Sampling.stratified(
      docs(spark, dir).select("doc_id", "source"), Seq("source"), "doc_id", 5)

  /** Equal-n language balancing: every lang cut to the smallest lang's
    * count by hash order — deterministic class balancing under the gate.
    */
  val sampleBalanced: Q = (spark, dir) =>
    Sampling.balanceClasses(
      docs(spark, dir).select("doc_id", "lang"), "lang", "doc_id")

  /** Temperature-rebalanced mixture at α = 0.5, half the token budget:
    * per-source keep rates computed FROM the corpus (token share^α,
    * renormalized), small sources up-weighted — the multilingual-corpus
    * sampling standard. The integer-grid rate discipline lets the oracle
    * replay the rates value-for-value and the hash draw verbatim.
    */
  val sampleTemperature: Q = (spark, dir) =>
    Sampling.temperatureMixture(
      docs(spark, dir).select(
        col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
      "doc_id", "source", "n_tok", alpha = 0.5, targetFraction = 0.5)

  /** Epoch-repeat mixture: four sources sized to a 200k-token budget at
    * 50/30/15/5 weights. Below-budget sources materialize MULTIPLE epochs
    * (upsampling — the shape the keep-rate mixtures cannot express);
    * above-budget ones degenerate to a plain downsample. The oracle
    * replays the exact long arithmetic, the one IEEE division per group,
    * the hash draw, and the epoch fan-out itself via generate_series.
    */
  val sampleEpochs: Q = (spark, dir) =>
    Sampling.epochRepeat(
      docs(spark, dir).select(
        col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
      "doc_id", "source", col("n_tok"),
      weights = Map("src0" -> 50L, "src1" -> 30L, "src2" -> 15L, "src3" -> 5L),
      budgetTokens = 200000L)
      .select("source", "doc_id", "n_tok", "epoch")

  /** Hashing-trick TF vectors (512-dim) in long form — the
    * no-vocabulary text featurizer bridging the documents table to the
    * ANN operators. Counts and squared sums stay in long space; the one
    * sqrt + division per row replays bit-for-bit.
    */
  val vectorizeHashtf: Q = (spark, dir) =>
    Vectorize.hashTf(docs(spark, dir), "doc_id", "text", 512)

  /** TF-IDF-weighted hashed vectors (512-dim): per-dimension idf on the
    * 1e-6 integer grid, weights as long products — no doubles anywhere,
    * bit-replayable, and downstream dots stay order-independent.
    */
  val vectorizeTfidf: Q = (spark, dir) =>
    Vectorize.hashTfIdf(docs(spark, dir), "doc_id", "text", 512)

  /** Text-space cosine top-5 for three query docs over hashed TF vectors —
    * similarity search over raw text, no embeddings. Dot products and
    * norms are LONG sums (order-independent), cosine derives per pair
    * from three longs — bit-exact both engines.
    */
  val knnText: Q = (spark, dir) =>
    Vectorize.textKnn(docs(spark, dir), "doc_id", "text", 512, Seq(0L, 1L, 2L), 5)

  /** Per-language top-20% quality cut (FineWeb-style: score every doc,
    * keep the best fraction of each language) — exact selection under the
    * (score DESC, id-hash ASC) total order. Only a three-column projection
    * shuffles for the per-group boundary; the boundary dim broadcasts into
    * a map-side keep filter, the corpus never shuffles.
    */
  val qualityTopfrac: Q = (spark, dir) =>
    Sampling.topFractionPerGroup(
      // stage tokens once (HOF discipline): the inline ratio would
      // re-tokenize at every use site — filter, project, both branches
      docs(spark, dir).select(
        col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("__ws")),
      "lang", TextOps.stopwordRatioOfTokens(col("__ws")), "doc_id", 0.2)
      .select("doc_id", "lang")

  /** Per-language percentile calibration of the stopword-ratio quality
    * score — the comparability step before any cross-language cut (raw
    * stopword ratios mean different things in en vs zh). pct is the
    * fraction of same-language rows strictly below the row's score; the
    * rank dim is (lang × distinct scores)-sized and broadcasts back, so
    * the corpus never shuffles.
    */
  val qualityCalibrate: Q = (spark, dir) =>
    Sampling.calibrateByGroup(
      docs(spark, dir).select(
        col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("__ws")),
      "lang", TextOps.stopwordRatioOfTokens(col("__ws")))
      .select("doc_id", "lang", "pct")

  /** One BPE merge-step count: adjacent character-pair frequencies over
    * the word-frequency vocab, top 50. The only corpus-sized motion is the
    * word-count partial-agg shuffle; everything after is vocab-sized.
    */
  val vocabBpePairs: Q = (spark, dir) =>
    Vocab.bpePairCounts(docs(spark, dir), "text", 50)

  /** Iterative BPE vocabulary learning: three full merge rounds — elect
    * the most frequent adjacent symbol pair, rewrite every word by
    * leftmost non-overlapping replacement, recount
    * ([[graft.ops.Vocab.bpeLearn]]). One corpus scan total; each round is
    * vocab-sized. The oracle unrolls the identical three rounds as CTEs —
    * election, rewrite and recount all replay exactly.
    */
  val vocabBpeMerges: Q = (spark, dir) =>
    Vocab.bpeLearn(docs(spark, dir), "text", steps = 3)

  /** The tokenize half of the BPE lifecycle: learn three merges, then
    * SEGMENT the vocabulary with them — top-20 words with their post-merge
    * symbol counts ([[graft.ops.Vocab.bpeSegment]]; the oracle re-derives
    * the same three merges and replays every rewrite).
    */
  val vocabBpeApply: Q = (spark, dir) => {
    val d = docs(spark, dir)
    val merges = Vocab.bpeLearn(d, "text", steps = 3)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    Vocab.bpeSegment(d, "text", merges)
      .orderBy(col("wfreq").desc, col("word"))
      .limit(20)
  }

  /** Tokenizer fertility per language ([[graft.ops.Vocab.bpeSegment]]
    * over the 3-step learned merges): subwords-per-word in ppm — the
    * "how much does this tokenizer tax each language" table every
    * multilingual vocab decision reads. Exact integer sums; one DIV.
    */
  val vocabFertility: Q = (spark, dir) => {
    val d = docs(spark, dir)
    val merges = Vocab.bpeLearn(d, "text", steps = 3)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Vocab.bpeSegment(d, "text", merges).select("word", "n_symbols")
    d.toDF().select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("__f"))
      .join(seg, "word")
      .groupBy("lang")
      .agg(sum(col("__f")).as("n_words"),
        sum(col("__f") * col("n_symbols")).as("n_subwords"))
      .withColumn("fertility_ppm", expr("n_subwords * 1000000 DIV n_words"))
  }

  /** Exact duplicated-substring signal (Lee et al.): per doc, the fraction
    * of its distinct word 8-grams occurring in ≥ 1 other document. Both
    * shuffles move 128-bit gram digests, never text.
    */
  val textDupgrams: Q = (spark, dir) =>
    Dedup.dupNgramStats(docs(spark, dir), "doc_id", "text", 8)

  /** Sequential 512-token packing bins per source stream — the
    * concat-and-chop batch builder; integer DIV arithmetic replays
    * bit-exactly in the oracle.
    */
  val packBins: Q = (spark, dir) =>
    Packing.sequentialBins(
      docs(spark, dir).select(
        col("source"), col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
      "source", "doc_id", "n_tok", 512)

  /** Length-bucketed dynamic batching report: 16-doc batches per source in
    * (tokens DESC, id ASC) order, each padded to its longest member —
    * per-batch counts, max/sum tokens, and padding waste. Pure integer
    * arithmetic end-to-end; the window + aggregate replay verbatim.
    */
  val packBatches: Q = (spark, dir) => {
    val batched = Packing.lengthBatches(
      docs(spark, dir).select(
        col("source"), col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
      "source", "doc_id", "n_tok", 16)
    Packing.paddingReport(batched, "source", "n_tok")
      .select("source", "batch", "n_docs", "max_tok", "sum_tok", "pad_waste")
  }

  /** Shard-sink roundtrip: documents written as token-budget shards
    * (one parquet file per `source=<s>/bin=<n>/` dir), read BACK from the
    * files, summarized per shard. The oracle recomputes the same summary
    * from the original table, so the layout write+read must be lossless —
    * the `source_roundtrip` discipline applied to the training-shard sink.
    * Budget 4096 (vs the packers' 512): a shard is a FILE, and real shard
    * budgets are sized so one shard holds many documents — at 512 the
    * fixture degenerates into one near-empty file per 2-3 docs and the
    * commit-protocol rename per file dominates the measurement.
    */
  val sourceShards: Q = (spark, dir) => {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_shards_out"
    Sources.writeTokenShards(
      docs(spark, dir).select(
        col("source"), col("doc_id"), col("text"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
      "source", "doc_id", "text", "n_tok", budget = 4096, path = out)
    spark.read.parquet(out).select(
      col("source"), col("bin").cast("long").as("bin"),
      col("n_docs"), col("n_tokens"), md5(col("text")).as("blob_md5"))
  }

  /** First-fit-decreasing 512-token packing per source stream — the
    * tighter-bins packer ([[Packing.greedyPack]]'s compiled per-stream
    * kernel). The oracle replays FFD exactly in DuckDB: a recursive CTE
    * carries each stream's open-bin remaining-capacity LIST and assigns
    * docs in (tokens DESC, id ASC) order with `list_position` as the
    * first-fit probe — procedural semantics, fully hash-checked.
    */
  val packGreedy: Q = (spark, dir) =>
    Packing.greedyPack(
      docs(spark, dir).select(
        col("source"), col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
      "source", "doc_id", "n_tok", 512)

  /** Packed-bin assembly: the 512-token bins concatenated into one training
    * blob each, in doc-id order. The oracle replays the concatenation with
    * `string_agg(... ORDER BY ...)` and compares blob md5s — whole-content
    * equality without shipping megabyte cells through the driver's hasher.
    */
  val packAssemble: Q = (spark, dir) => {
    val binned = Packing.sequentialBins(
      docs(spark, dir).select(
        col("source"), col("doc_id"), col("text"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
      "source", "doc_id", "n_tok", 512)
    Packing.assembleBins(binned, "source", "doc_id", "text", "n_tok")
      .select(
        col("source"), col("bin"), col("n_docs"), col("n_tokens"),
        md5(col("text")).as("blob_md5"))
  }

  /** PII redaction over deterministically synthesized contact strings (the
    * fixture text carries no PII, so the query plants an email + IPv4 +
    * phone per row and the oracle replays the same construction + patterns).
    */
  val textRedact: Q = (spark, dir) =>
    docs(spark, dir).select(
      col("doc_id"),
      TextOps.redactPii(concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7 tel 415-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).as("redacted"))

  /** Luhn-validated card-PII counters ([[graft.ops.TextOps.cardScan]]):
    * shape matches vs checksum-valid matches per document. The fixture
    * text carries no digits, so the query plants one 16-digit
    * pseudo-card per row (deterministic from doc_id — ~10% pass Luhn
    * naturally, giving both counter values real variance) plus a
    * too-short run the shape must reject; the oracle replays the same
    * construction, regex, and mod-10 walk.
    */
  val textLuhn: Q = (spark, dir) => {
    val synth = concat(
      substring(coalesce(col("text"), lit("")), 1, 30),
      lit(" pay 4"),
      lpad((col("doc_id") * 982451653L % 1000000000000000L).cast("string"), 15, "0"),
      lit(" ref "), lpad((col("doc_id") % 1000).cast("string"), 3, "0"))
    val (cand, valid) = TextOps.cardScan(synth)
    docs(spark, dir).select(col("doc_id"), cand, valid)
  }

  /** RAKE keyphrases per document ([[graft.ops.TextOps.rakePhrases]],
    * top-3): stopword-free runs as candidates, `(10⁶·deg) div freq` word
    * scores — the oracle replays the whole relational chain including
    * integer-grid division.
    */
  val textRake: Q = (spark, dir) =>
    TextOps.rakePhrases(docs(spark, dir), "doc_id", "text", topK = 3)

  /** Eval-set decontamination: drop every document whose content (md5)
    * appears in the reference slice (source = src0). Bloom prefilter +
    * exact confirm — exact result, oracle-checkable.
    */
  val dedupAgainstRef: Q = (spark, dir) => {
    val d = docs(spark, dir)
    Dedup
      .exceptContentOf(d, "text", d.filter(col("source") === "src0"), "text")
      .select("doc_id", "source")
  }

  /** N-gram-overlap decontamination (GPT-3 appx C style): a doc is
    * contaminated when it shares any distinct word 7-gram with the
    * reference slice (source = src0). The exact-digest gate
    * (`dedup_against_ref`) only catches verbatim copies; this catches
    * partial inclusion — how benchmarks actually leak.
    */
  val decontamNgram: Q = (spark, dir) => {
    val d = docs(spark, dir)
    Dedup.ngramOverlapOf(
      d, "doc_id", "text", d.filter(col("source") === "src0"), "text",
      n = 7, minOverlap = 1)
  }

  /** C4-style boilerplate scrub: 5-word tiles occurring in ≥ 3 distinct
    * documents are stripped from every document (the fixture's small
    * vocabulary makes repeated tiles natural, like nav/footer lines in a
    * crawl).
    */
  val textBoilerplate: Q = (spark, dir) =>
    Dedup.removeBoilerplateUnits(
      docs(spark, dir), "doc_id", "text", unitWords = 5, minDocFreq = 3)

  /** Global token-frequency top-100 — vocabulary seeding for tokenizer
    * training. One explode + one count aggregate (map-side partials), and
    * the global top-k fuses into TakeOrderedAndProject: per-partition heaps
    * ship k rows each, never a full sort — the same bounded-heap shape as
    * [[graft.ops.TopK]], via Catalyst's own operator.
    */
  val vocabTopk: Q = (spark, dir) =>
    docs(spark, dir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(100)

  /** Zipf-law fit of the corpus vocabulary: log-frequency regressed on
    * log-rank through [[graft.ops.Checks.olsExact]] — a healthy natural
    * corpus slopes near −1·2²⁰ on the grid; a synthetic or template-heavy
    * one flattens. The rank window runs over the VOCABULARY (not the
    * corpus); the regression is the proven one-aggregate exact-OLS frame.
    */
  val vocabZipf: Q = (spark, dir) => {
    val freq = docs(spark, dir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__f"))
    val w = Window.orderBy(col("__f").desc, col("token").asc)
    val ranked = freq
      .withColumn("__rank", row_number().over(w))
      .withColumn("g", lit("corpus"))
      .withColumn("__lx", log(col("__rank").cast("double")))
      .withColumn("__ly", log(col("__f").cast("double")))
    graft.ops.Checks.olsExact(ranked, "g", "__lx", "__ly")
  }

  /** χ² term–language feature selection: the 10 tokens most associated
    * with each language ([[graft.ops.Ranking.chi2Terms]] — exact 2×2 cell
    * counts, one fixed-order double χ², WindowGroupLimit-bounded top-k).
    */
  val textChi2Terms: Q = (spark, dir) =>
    graft.ops.Ranking.chi2Terms(docs(spark, dir), "lang", "text")

  /** Inverted-index postings build: per token (df ≥ 3), document
    * frequency, total tf, and the top-3 documents by tf
    * ([[graft.ops.Ranking.postings]] — the search-index construction
    * step, vocabulary-sized output).
    */
  val textPostings: Q = (spark, dir) =>
    graft.ops.Ranking.postings(docs(spark, dir), "doc_id", "text")

  /** φ-heavy hitters (φ = 1/30 of the token stream), Count-Min-verified
    * two-pass: the CMS prefilters candidates map-side (never an
    * underestimate, so no true hitter is lost — spec-pinned), the exact
    * pass confirms. Output counts are EXACT, so the whole result replays
    * in DuckDB as `GROUP BY HAVING count ≥ ⌈φ·N⌉` — the sketch buys
    * shuffle reduction, not approximation, which is how a 100 TB pipeline
    * should use it.
    */
  val heavyHitters: Q = (spark, dir) =>
    SketchRollup.verifiedHeavyHitters(
      docs(spark, dir).select(explode(TextOps.tokens(col("text"))).as("token")),
      "token",
      phi = 1.0 / 30.0)

  /** Per-source contamination AUDIT: how much of each source's content
    * appears in the reference slice — the report you read before dropping
    * rows. Same digest semantics as [[dedupAgainstRef]], aggregated
    * instead of filtered; the ref digest set aggregates once and
    * broadcasts into the probe join, the corpus never shuffles before the
    * final small per-source aggregate.
    */
  val contaminationReport: Q = (spark, dir) => {
    val d = docs(spark, dir)
    val refH = d.filter(col("source") === "src0")
      .select(md5(col("text")).as("__h")).filter(col("__h").isNotNull).distinct()
    d.withColumn("__h", md5(col("text")))
      .join(broadcast(refH.withColumn("__hit", lit(1))), Seq("__h"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("__hit"), lit(0))).as("n_contaminated"))
      .withColumn(
        "contamination_rate",
        col("n_contaminated").cast("double") / col("n_docs"))
  }

  /** The SAME decontamination through the big-ref regime (`maxExact = 0`
    * forces the Bloom prefilter + exact confirm join): results are exact at
    * any fpp, so the identical oracle faces the bloom path in the driver's
    * gate — both regimes of [[Dedup.exceptContentOf]] stay correctness-
    * checked, not just the one the fixture size happens to take.
    */
  val dedupBloom: Q = (spark, dir) => {
    val d = docs(spark, dir)
    Dedup
      .exceptContentOf(d, "text", d.filter(col("source") === "src0"), "text", maxExact = 0)
      .select("doc_id", "source")
  }

  /** Gopher-style quality gate: each document gets its FIRST failing rule
    * (length bounds, mean word length, intra-doc sentence repetition) or
    * 'ok' — the filter stage of a pretraining pipeline with drop REASONS,
    * which is what you audit at 100 TB. All signals are integer counts
    * divided once, so the oracle replays the doubles bit-exactly; heavy
    * producers are staged as attributes per the HOF discipline.
    */
  val qualityGate: Q = (spark, dir) => {
    val staged = docs(spark, dir).select(
      col("doc_id"),
      TextOps.tokens(col("text")).as("ws"),
      TextOps.sentenceUnits(col("text")).as("us"))
    val scored = staged.select(
      col("doc_id"),
      size(col("ws")).as("nw"),
      TextOps.avgWordLenOfTokens(col("ws")).as("awl"),
      TextOps.dupUnitFraction(col("us")).as("dupf"))
    scored.select(
      col("doc_id"),
      when(col("nw") < 5, "too_short")
        .when(col("nw") > 1000, "too_long")
        .when(col("awl") < 2.0, "short_words")
        .when(col("awl") > 12.0, "long_words")
        .when(col("dupf") > 0.3, "repetitive")
        .otherwise("ok").as("verdict"))
  }

  /** Gopher-rule quality bitmask ([[graft.ops.TextOps.gopherRuleMask]],
    * minWords = 20): every violated rule reported per document — the
    * dashboard form of the quality gate (per-rule fire counts), pass =
    * mask 0. All integer-or-single-division arithmetic.
    */
  val qualityRules: Q = (spark, dir) =>
    docs(spark, dir).select(
      col("doc_id"),
      TextOps.gopherRuleMask(
        coalesce(TextOps.tokens(col("text")), array().cast("array<string>")),
        minWords = 20).as("rule_mask"))
      .withColumn("pass", (col("rule_mask") === 0).cast("int"))

  /** Sliding-window token chunking (size 32, overlap 8) — the map-side
    * generator every pretraining pipeline runs before tokenization.
    */
  val textChunks: Q = (spark, dir) =>
    graft.ops.Chunker.chunkByTokens(docs(spark, dir), "text", "doc_id", 32, 8)

  /** End-to-end pretraining-data pipeline in ONE composed query: language
    * filter → quality gate → exact dedup (keep min id per content hash) →
    * sliding-window chunking → per-document chunk/token stats. Everything
    * stays declarative Column expressions, so the whole pipeline is one
    * Catalyst plan (filters reach the scan, dedup is the only shuffle
    * before the final aggregate) — and the DuckDB oracle replays it
    * fully, making the composition itself a checked artifact.
    */
  val pipelineE2e: Q = (spark, dir) => {
    val kept = docs(spark, dir)
      .filter(TextOps.langId(col("text")) === "en")
      .filter(TextOps.tokenCount(col("text")) >= 5)
    val survivors = Dedup.exact(kept, "text", "doc_id").select("doc_id")
    val deduped = kept.join(survivors, Seq("doc_id"), "left_semi")
    graft.ops.Chunker
      .chunkByTokens(deduped, "text", "doc_id", 32, 8)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum("n_chunk_tokens").as("n_tokens"))
  }

  /** Second composed capstone, built from the round's curation ops: length
    * + repetition gates → exact dedup (keep min id) → leakage-safe GROUP
    * split (train slice) → token-budget sequence packing. Everything up to
    * the packer is one Catalyst plan (filters at the scan, one digest
    * shuffle); the packer adds its per-stream shuffle. The DuckDB oracle
    * replays the full composition, so the pipeline — not just its parts —
    * is a checked artifact.
    */
  val pipelineCurate: Q = (spark, dir) => {
    val staged = docs(spark, dir).select(
      col("doc_id"), col("source"), col("text"),
      TextOps.tokens(col("text")).as("ws"))
    val scored = staged.select(
      col("doc_id"), col("source"), col("text"),
      size(col("ws")).as("nw"),
      TextOps.dupUnitFraction(col("ws")).as("dupw"))
    val kept = scored.filter(col("nw") >= 5 && col("nw") <= 1000 && col("dupw") <= 0.3)
    val survivors = Dedup.exact(kept, "text", "doc_id").select("doc_id")
    val deduped = kept.join(survivors, Seq("doc_id"), "left_semi")
    val train = deduped.filter(
      Sampling.splitColumn(
        col("source"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) === "train")
    Packing.sequentialBins(
      train.select(col("source"), col("doc_id"), col("nw").cast("long").as("n_tok")),
      "source", "doc_id", "n_tok", 512)
  }

  /** FineWeb-style pretraining curation, the round-8 operators composed
    * end-to-end under ONE oracle: language gate → per-source top-half
    * quality cut → exact content dedup (min-id survivor) → decontamination
    * against the src0 reference slice → temperature-rebalanced mixture
    * (α = 0.5, half the token budget). Every stage is an operator already
    * proven alone; the composed gate catches what per-stage gates cannot —
    * column-contract and null-regime drift BETWEEN stages. Scale shape is
    * inherited stagewise: the corpus shuffles once for the dedup window,
    * everything else is projection shuffles and broadcast dims.
    */
  val pipelinePretrain: Q = (spark, dir) => {
    val d = docs(spark, dir)
    val en = d.filter(col("lang") === "en").select(
      col("doc_id"), col("source"), col("text"),
      TextOps.tokens(col("text")).as("__ws"))
    val cut = Sampling.topFractionPerGroup(
      en, "source", TextOps.stopwordRatioOfTokens(col("__ws")), "doc_id", 0.5)
    val deduped = Dedup.keepFirst(
      cut.withColumn("__fp", md5(col("text"))), Seq("__fp"), "doc_id")
    val clean = Dedup.exceptContentOf(
      deduped, "text", d.filter(col("source") === "src0"), "text")
    Sampling.temperatureMixture(
      clean.select(
        col("doc_id"), col("source"), size(col("__ws")).cast("long").as("n_tok")),
      "doc_id", "source", "n_tok", alpha = 0.5, targetFraction = 0.5)
  }

  /** The materialized mixture feeding the packer — the last mile of a
    * pretraining pipeline (mixture → 512-token training bins per source
    * stream). The per-stream pack order is the (doc_id, epoch) composite,
    * encoded as one long key so the running-sum window replays verbatim;
    * epoch copies of a document pack CONSECUTIVELY, the training-run
    * reality the composition has to preserve.
    */
  val pipelineShards: Q = (spark, dir) => {
    val mixed = Sampling.epochRepeat(
      docs(spark, dir).select(
        col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
      "doc_id", "source", col("n_tok"),
      weights = Map("src0" -> 50L, "src1" -> 30L, "src2" -> 15L, "src3" -> 5L),
      budgetTokens = 200000L)
    Packing.sequentialBins(
      mixed.withColumn("__ord", col("doc_id") * 100000L + col("epoch")),
      "source", "__ord", "n_tok", 512)
      .select("source", "doc_id", "epoch", "n_tok", "bin")
  }

  /** Stage-attrition report for the pretrain chain — the observability
    * artifact every production pipeline ships next to its output: one row
    * per curation stage with the surviving doc count. Stages replicate
    * [[pipelinePretrain]] exactly and are materialized ONCE
    * (localCheckpoint — the `Funnel.stages` discipline), so the six count
    * branches are six trivially-cheap single-stage jobs instead of
    * re-running ever-longer plan prefixes.
    */
  val pipelineReport: Q = (spark, dir) => {
    val d = docs(spark, dir)
    def ck(df: DataFrame): DataFrame = df.localCheckpoint(true)
    val en = ck(d.filter(col("lang") === "en").select(
      col("doc_id"), col("source"), col("text"),
      TextOps.tokens(col("text")).as("__ws")))
    val cut = ck(Sampling.topFractionPerGroup(
      en, "source", TextOps.stopwordRatioOfTokens(col("__ws")), "doc_id", 0.5))
    val deduped = ck(Dedup.keepFirst(
      cut.withColumn("__fp", md5(col("text"))), Seq("__fp"), "doc_id"))
    val clean = ck(Dedup.exceptContentOf(
      deduped, "text", d.filter(col("source") === "src0"), "text"))
    val mixed = Sampling.temperatureMixture(
      clean.select(
        col("doc_id"), col("source"), size(col("__ws")).cast("long").as("n_tok")),
      "doc_id", "source", "n_tok", alpha = 0.5, targetFraction = 0.5)
    def c(stage: String, idx: Int, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), lit(idx).as("stage_idx"), col("n_docs"))
    c("raw", 0, d)
      .union(c("lang", 1, en))
      .union(c("quality", 2, cut))
      .union(c("dedup", 3, deduped))
      .union(c("decontam", 4, clean))
      .union(c("mixture", 5, mixed))
  }

  // ——— wave 38: TextRank, source-overlap matrix, Gopher rule screen ———

  // the repo's 10-word en stoplist as plain values (twin of enStopSql)
  private val enStops: Seq[Any] =
    Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "was")

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) over the corpus
    * co-occurrence graph: adjacent-token pairs (window 1, both
    * orientations, deduped) feed three rounds of the integer-exact
    * PageRank recurrence ([[graft.ops.Graph.pageRankExact]]'s 2⁴⁰-grid
    * arithmetic inlined over STRING nodes — word ids would add a
    * global rank pass for nothing), and the top 20 words by
    * `(score desc, word asc)` are the corpus keywords. The oracle
    * unrolls the same three rounds join-for-join.
    *
    * Scale shape: the edge list is vocabulary-pair-sized (≪ token
    * count after dedup), pins once, and each round is one edge-key join
    * + partial-agg sum — [[graft.ops.Graph]]'s Pregel motion; the final
    * top-k is a 20-row TakeOrdered, never a full sort.
    */
  val textTextrank: Q = (spark, dir) => {
    val toks = docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = toks
      .select(explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
          |  (a, b) -> struct(a, b))""".stripMargin)).as("e"))
      .select(col("e.a").as("wa"), col("e.b").as("wb"))
      .filter(col("wa") =!= col("wb"))
      // the standard TextRank candidate filter: stopwords out of the
      // graph (they out-degree every content word and win otherwise)
      .filter(!col("wa").isin(enStops: _*) && !col("wb").isin(enStops: _*))
    val e = pairs.select(col("wa").as("src"), col("wb").as("dst"))
      .union(pairs.select(col("wb").as("src"), col("wa").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val ed = e.join(deg, Seq("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint(true)
    var scores = nodes.select(col("node"), lit(1099511627776L).as("score"))
    var i = 0
    while (i < 3) {
      val contrib = ed
        .join(scores.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("score DIV __deg").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      scores = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(164926744166L) + expr("(17 * coalesce(__in, 0L)) DIV 20"))
            .as("score"))
      i += 1
    }
    scores.orderBy(col("score").desc, col("node").asc).limit(20)
      .select(col("node").as("word"), col("score"))
  }

  /** Pairwise corpus-overlap matrix between sources via the md5-replayable
    * group MinHash ([[sourceMinhash]]'s signature, compared
    * component-wise): `jaccard_est_grid = agree·2²⁰ DIV 16` estimates the
    * shingle-set Jaccard between each source pair — the corpus-overlap
    * dashboard read before mixing sources into a training run
    * (syndication/mirror detection at the SOURCE level, where doc-level
    * dedup is too late). Signatures are source-count-sized; the pair join
    * is a broadcast of a handful of rows, never a corpus operation.
    */
  val sourceOverlapMatrix: Q = (spark, dir) => {
    // REUSE the source_minhash query end-to-end: its (source, group_sig)
    // output carries exactly the signature components this matrix
    // compares, so the corpus pipeline exists once in the codebase and
    // the pair join reads a source-count-sized frame. Pinned because the
    // self-join consumes it twice (the duplicateClusters lesson).
    val sigs = sourceMinhash(spark, dir)
      .select(col("source"),
        split(col("group_sig"), ",").cast("array<bigint>").as("gs"))
      .localCheckpoint(true)
    val comp = sigs.select(col("source"), posexplode(col("gs")).as(Seq("__j", "__v")))
    comp.toDF("source_a", "__j", "__va")
      .join(comp.toDF("source_b", "__j", "__vb"), Seq("__j"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum(when(col("__va") === col("__vb"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("jaccard_est_grid", expr("(n_agree * 1048576) DIV 16"))
  }

  /** The Gopher quality-rule screen (Rae et al. 2021 §A1.1 — the published
    * heuristic filter suite behind MassiveText and most corpora since),
    * one boolean per rule + the conjunction verdict, ALL as cross-
    * multiplied integer compares so no ratio ever divides: word count in
    * [50, 100 000]; mean word length in [3, 10] (`3n ≤ Σlen ≤ 10n`); hash
    * SYMBOL ratio ≤ 0.1 (`10·n# ≤ n`); ellipsis SYMBOL ratio ≤ 0.1
    * (`10·n… ≤ n` — Rae et al. put both symbols under the same 0.1
    * symbol-to-word bar); fraction of LINES ending with an ellipsis
    * ≤ 0.3 (`10·nℓ… ≤ 3·nℓ` — the rule the 0.3 threshold actually
    * belongs to); alphabetic-word fraction ≥ 0.8 (`10·nα ≥ 8n`);
    * ≥ 2 stopword hits
    * (the repo's 10-word en list). Distinct from [[textQuality]], which
    * emits raw features: this is the named industry FILTER with its
    * verdicts, the thing a curation run actually branches on. Pure
    * Column arithmetic, zero shuffle, corpus-parallel.
    */
  val textGopherRules: Q = (spark, dir) =>
    docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("__ws"))
      .select(
        col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        expr("CAST(aggregate(__ws, 0L, (acc, w) -> acc + length(w)) AS BIGINT)")
          .as("sum_wlen"),
        (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
          .cast("long").as("n_hash"),
        ((length(col("text"))
          - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
          .cast("long").as("n_ellipsis"),
        size(split(col("text"), "\n", -1)).cast("long").as("n_lines"),
        size(filter(split(col("text"), "\n", -1),
          l => endswith(rtrim(l), lit("...")))).cast("long").as("n_ell_lines"),
        size(filter(col("__ws"), w => w.rlike("[a-z]"))).cast("long")
          .as("n_alpha_words"),
        size(filter(col("__ws"), w => w.isin("the", "of", "and", "to", "in",
          "a", "is", "that", "it", "was"))).cast("long").as("n_stop"))
      .withColumn("r_word_count",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("r_mean_wlen",
        col("n_words") > 0L && lit(3L) * col("n_words") <= col("sum_wlen")
          && col("sum_wlen") <= lit(10L) * col("n_words"))
      .withColumn("r_hash_ratio", lit(10L) * col("n_hash") <= col("n_words"))
      .withColumn("r_ellipsis_ratio",
        lit(10L) * col("n_ellipsis") <= col("n_words"))
      .withColumn("r_ellipsis_lines",
        lit(10L) * col("n_ell_lines") <= lit(3L) * col("n_lines"))
      .withColumn("r_alpha_frac",
        lit(10L) * col("n_alpha_words") >= lit(8L) * col("n_words"))
      .withColumn("r_stopwords", col("n_stop") >= 2L)
      .withColumn("gopher_pass",
        col("r_word_count") && col("r_mean_wlen") && col("r_hash_ratio")
          && col("r_ellipsis_ratio") && col("r_ellipsis_lines")
          && col("r_alpha_frac") && col("r_stopwords"))

  /** Collision audit of the 512-dim hashing trick [[vectorizeHashtf]]
    * rides on: how many DISTINCT vocabulary terms share each hashed
    * dimension, rolled up as the collision histogram
    * `(n_terms → n_buckets, total_tf)` — the saturation read that tells
    * you when the hash space is too small for the vocabulary (the mass
    * sitting in many-term buckets is the mass whose similarity signal is
    * being aliased away). Same salt/dim/md5 mapping as the vectorizer,
    * so the audit describes the PRODUCTION space, not a lookalike.
    * Vocabulary-sized work: one term aggregate, one bucket aggregate,
    * one histogram rollup.
    */
  val vectorizeHashCollisions: Q = (spark, dir) => {
    val terms = docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(TextOps.tokens(col("text"))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__tf"))
      .withColumn("__dim",
        conv(substring(md5(concat(lit("htf"), col("__w"))), 1, 8), 16, 10)
          .cast("long") % 512)
    terms.groupBy(col("__dim"))
      .agg(count(lit(1)).as("__nt"), sum(col("__tf")).as("__btf"))
      .groupBy(col("__nt").as("n_terms"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("__btf")).as("total_tf"))
  }

  val all: Map[String, Q] = Map(
    "vectorize_hash_collisions" -> vectorizeHashCollisions,
    "text_textrank" -> textTextrank,
    "source_overlap_matrix" -> sourceOverlapMatrix,
    "text_gopher_rules" -> textGopherRules,
    "eval_auc" -> evalAuc,
    "eval_confusion" -> evalConfusion,
    "eval_pr_curve" -> evalPrCurve,
    "eval_calibration" -> evalCalibration,
    "eval_lift" -> evalLift,
    "eval_brier" -> evalBrier,
    "eval_retrieval" -> evalRetrieval,
    "eval_mrl" -> evalMrl,
    "eval_isotonic" -> evalIsotonic,
    "eval_conformal" -> evalConformal,
    "eval_rbo" -> evalRbo,
    "eval_ndcg" -> evalNdcg,
    "eval_ece" -> evalEce,
    "eval_rouge" -> evalRouge,
    "eval_bleu" -> evalBleu,
    "eval_mcnemar" -> evalMcnemar,
    "eval_pass_at_k" -> evalPassAtK,
    "eval_bradley_terry" -> evalBradleyTerry,
    "pipeline_dpo" -> pipelineDpo,
    "text_heaps" -> textHeaps,
    "text_mattr" -> textMattr,
    "text_simpson" -> textSimpson,
    "text_yule_k" -> textYuleK,
    "vocab_good_turing" -> vocabGoodTuring,
    "text_novelty" -> textNovelty,
    "text_burrows" -> textBurrows,
    "select_kcenter" -> selectKcenter,
    "privacy_noised" -> privacyNoised,
    "privacy_generalize" -> privacyGeneralize,
    "sample_split" -> sampleSplit,
    "sample_exact_k" -> sampleExactK,
    "sample_k_per_group" -> sampleKPerGroup,
    "sample_split_group" -> sampleSplitGroup,
    "sample_weighted" -> sampleWeighted,
    "sample_mixture" -> sampleMixture,
    "sample_budget" -> sampleBudget,
    "sample_curriculum" -> sampleCurriculum,
    "sample_dsir" -> sampleDsir,
    "sample_temperature" -> sampleTemperature,
    "sample_epochs" -> sampleEpochs,
    "vectorize_hashtf" -> vectorizeHashtf,
    "pipeline_shards" -> pipelineShards,
    "knn_text" -> knnText,
    "vectorize_tfidf" -> vectorizeTfidf,
    "pipeline_report" -> pipelineReport,
    "quality_topfrac" -> qualityTopfrac,
    "quality_calibrate" -> qualityCalibrate,
    "vocab_bpe_pairs" -> vocabBpePairs,
    "vocab_bpe_merges" -> vocabBpeMerges,
    "vocab_bpe_apply" -> vocabBpeApply,
    "vocab_fertility" -> vocabFertility,
    "text_dupgrams" -> textDupgrams,
    "sample_stratified" -> sampleStratified,
    "sample_balanced" -> sampleBalanced,
    "pack_bins" -> packBins,
    "pack_batches" -> packBatches,
    "pack_greedy" -> packGreedy,
    "pack_assemble" -> packAssemble,
    "source_shards" -> sourceShards,
    "text_redact" -> textRedact,
    "dedup_against_ref" -> dedupAgainstRef,
    "decontam_ngram" -> decontamNgram,
    "text_boilerplate" -> textBoilerplate,
    "dedup_bloom" -> dedupBloom,
    "vocab_topk" -> vocabTopk,
    "text_chi2_terms" -> textChi2Terms,
    "vocab_zipf" -> vocabZipf,
    "text_postings" -> textPostings,
    "heavy_hitters" -> heavyHitters,
    "contamination_report" -> contaminationReport,
    "quality_gate" -> qualityGate,
    "quality_rules" -> qualityRules,
    "pipeline_e2e" -> pipelineE2e,
    "pipeline_curate" -> pipelineCurate,
    "pipeline_pretrain" -> pipelinePretrain,
    "text_chunks" -> textChunks,
    "tfidf_topterms" -> tfidfTopterms,
    "text_perplexity" -> textPerplexity,
    "source_minhash" -> sourceMinhash,
    "source_roundtrip" -> sourceRoundtrip,
    "source_evolution" -> sourceEvolution,
    "snapshot_diff" -> snapshotDiff,
    "sketch_rollup" -> sketchRollup,
    "approx_parts" -> approxParts,
    "dedup_exact" -> dedupExact,
    "dedup_minhash" -> dedupMinhash,
    "dedup_cross" -> dedupCross,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram" -> dedupNgram,
    "dedup_containment" -> dedupContainment,
    "dedup_prefix_join" -> dedupPrefixJoin,
    "dedup_winnowing" -> dedupWinnowing,
    "dedup_spans" -> dedupSpans,
    "pipeline_exact_dedup" -> pipelineExactDedup,
    "pipeline_dedup_cascade" -> pipelineDedupCascade,
    "sample_split_nodup" -> sampleSplitNodup,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_semantic" -> dedupSemantic,
    "dedup_components" -> dedupComponents,
    "dedup_canonical" -> dedupCanonical,
    "embedding_project" -> embeddingProject,
    "knn_brute" -> knnBrute,
    "knn_hardneg" -> knnHardneg,
    "embedding_pca" -> embeddingPca,
    "knn_pq" -> knnPq,
    "audience_lookalike" -> audienceLookalike,
    "embedding_outliers" -> embeddingOutliers,
    "knn_lsh" -> knnLsh,
    "knn_lsh_recall" -> knnLshRecall,
    "knn_ivf" -> knnIvf,
    "knn_ivfpq" -> knnIvfPq,
    "embedding_kmeans" -> embeddingKmeans,
    "embedding_silhouette" -> embeddingSilhouette,
    "knn_int8" -> knnInt8,
    "knn_sharded" -> knnSharded,
    "embedding_quantize" -> embeddingQuantize,
    "text_repetition" -> textRepetition,
    "bm25_rank" -> bm25Rank,
    "search_rrf" -> searchRrf,
    "search_mmr" -> searchMmr,
    "select_coverage" -> selectCoverage,
    "text_luhn" -> textLuhn,
    "text_rake" -> textRake,
    "embedding_norm" -> embeddingNorm,
    "embedding_unit" -> embeddingUnit,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_oov" -> textOov,
    "inference_quality" -> inferenceQuality,
    "text_fingerprint" -> textFingerprint,
    "text_entropy" -> textEntropy,
    "text_readability" -> textReadability,
    "text_code_detect" -> textCodeDetect,
    "vocab_next_word" -> vocabNextWord,
    "vocab_kneser_ney" -> vocabKneserNey,
    "text_lang_eval" -> textLangEval,
    "vocab_coverage" -> vocabCoverage,
    "text_ttr" -> textTtr,
    "text_collocations" -> textCollocations,
    "knn_mutual" -> knnMutual,
    "embedding_diversity" -> embeddingDiversity,
    "dedup_threshold_sweep" -> dedupThresholdSweep,
    "multimodal_bins" -> multimodalBins,
    "embedding_label_sim" -> embeddingLabelSim,
    "embedding_label_purity" -> embeddingLabelPurity,
    "text_rolling" -> textRolling,
    "doc_stats" -> docStats,
    "feature_mi" -> featureMi,
    "metric_bootstrap" -> metricBootstrap,
    "metric_bootstrap_ratio" -> metricBootstrapRatio,
    "embedding_drift" -> embeddingDrift,
    "multimodal_meta" -> multimodalMeta,
    "multimodal_alignment" -> multimodalAlignment,
    "multimodal_dedup" -> multimodalDedup,
    "multimodal_dhash" -> multimodalDhash,
    "multimodal_features" -> multimodalFeatures,
    "multimodal_frames" -> multimodalFrames,
    "multimodal_resize" -> multimodalResize
  )

  private val wordsSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), w -> w != '')"
  private val enStopSql =
    "['the', 'of', 'and', 'to', 'in', 'a', 'is', 'that', 'it', 'was']"
  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** The frozen quality classifier's logit as DuckDB SQL — the identical
    * left-fold `((((bias + f1·w1) + f2·w2) + f3·w3) + f4·w4)` with dyadic
    * weights; IEEE addition is order-fixed on both sides. Shared by the
    * `inference_quality` and `eval_*` oracles so score and metrics can
    * never drift apart.
    */
  private val logitSql =
    s"""((((-1.25)
       |      + CAST(len($wordsSql) AS DOUBLE) * 0.00390625)
       |      + (CASE WHEN len($wordsSql) = 0 THEN 0.0
       |              ELSE CAST(len(list_filter($wordsSql, w -> list_contains($enStopSql, w))) AS DOUBLE)
       |                   / len($wordsSql) END) * 3.0)
       |      + (CASE WHEN len($wordsSql) = 0 THEN 0.0
       |              ELSE CAST(list_sum(list_transform($wordsSql, w -> length(w))) AS DOUBLE)
       |                   / len($wordsSql) END) * 0.125)
       |      + CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) * (-0.03125)""".stripMargin

  /** The eval staging CTE: label + score per doc, nulls excluded — the SQL
    * twin of [[scoredDocs]] plus the [[graft.ops.Eval]] null filter.
    */
  private val evalScoredSql =
    s"""SELECT doc_id, CAST(lang = 'en' AS INTEGER) AS label, $logitSql AS score
       |  FROM documents
       |  WHERE lang IS NOT NULL""".stripMargin

  /** Shared CTE prefix of the retrieval-eval oracles: the knn_brute float
    * ground truth and the knn_int8 system list (both verbatim from their
    * own oracle-pinned queries), left-joined on `(query, item)` into `j`
    * with both ranks. Ends WITHOUT a final select so each metric oracle
    * appends its own rollup.
    */
  /** The int8 unit-code replay CTEs (`s` → `unitized` → `qz`) — the SQL
    * twin of [[graft.functions.Int8UnitCodes]], shared verbatim by every
    * oracle that consumes the quantized codes (ANN eval, k-means) so the
    * quantization replay cannot drift between them.
    */
  /** The knn_int8 oracle — shared verbatim by knn_sharded: the
    * shard-and-merge query must equal the FULL search, so its oracle
    * IS the full search (the exactness theorem executed at the gate).
    */
  private val knnInt8OracleSql =
    """WITH s AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
        |  FROM embeddings),
        |unitized AS (
        |  SELECT vec_id,
        |    CASE WHEN n = 0 THEN v ELSE list_transform(v, x -> x / n) END AS u
        |  FROM s),
        |qz AS (
        |  SELECT vec_id,
        |    list_transform(u, x -> CAST(floor(x *
        |      (CASE WHEN list_max(list_transform(u, y -> abs(y))) = 0 THEN 1.0
        |            ELSE 127.0 / list_max(list_transform(u, y -> abs(y))) END) + 0.5)
        |      AS INTEGER)) AS q
        |  FROM unitized),
        |scored AS (
        |  SELECT qr.vec_id AS q_id, c.vec_id AS n_id,
        |    CAST(list_dot_product(CAST(qr.q AS DOUBLE[]), CAST(c.q AS DOUBLE[])) AS BIGINT) AS dot_q
        |  FROM qz c JOIN qz qr ON qr.vec_id < 8 AND c.vec_id != qr.vec_id)
        |SELECT q_id, n_id, dot_q, rank FROM (
        |  SELECT q_id, n_id, dot_q,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, n_id) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin

  /** The unrolled 3-step BPE learn+segment CTE chain (segmented vocab
    * in `v3`) shared by the vocab_bpe_apply and vocab_fertility
    * oracles.
    */
  private val bpeSegCtesSql =
    s"""WITH w AS (SELECT unnest($wordsSql) AS word FROM documents),
         |v0 AS (
         |  SELECT word, regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS sym,
         |    count(*) AS wfreq
         |  FROM w GROUP BY word),
         |p1 AS (
         |  SELECT unnest(list_transform(range(2, len(syms) + 1),
         |      i -> syms[i - 1] || chr(31) || syms[i])) AS pair, wfreq
         |  FROM (SELECT string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms, wfreq
         |        FROM v0)),
         |b1 AS (SELECT pair FROM (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pf FROM p1 GROUP BY pair
         |       ORDER BY pf DESC, pair LIMIT 1)),
         |v1 AS (
         |  SELECT word, replace(sym,
         |    (SELECT chr(31) || replace(pair, chr(31), chr(31) || chr(31)) || chr(31) FROM b1),
         |    (SELECT chr(31) || replace(pair, chr(31), '') || chr(31) FROM b1)) AS sym, wfreq
         |  FROM v0),
         |p2 AS (
         |  SELECT unnest(list_transform(range(2, len(syms) + 1),
         |      i -> syms[i - 1] || chr(31) || syms[i])) AS pair, wfreq
         |  FROM (SELECT string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms, wfreq
         |        FROM v1)),
         |b2 AS (SELECT pair FROM (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pf FROM p2 GROUP BY pair
         |       ORDER BY pf DESC, pair LIMIT 1)),
         |v2 AS (
         |  SELECT word, replace(sym,
         |    (SELECT chr(31) || replace(pair, chr(31), chr(31) || chr(31)) || chr(31) FROM b2),
         |    (SELECT chr(31) || replace(pair, chr(31), '') || chr(31) FROM b2)) AS sym, wfreq
         |  FROM v1),
         |p3 AS (
         |  SELECT unnest(list_transform(range(2, len(syms) + 1),
         |      i -> syms[i - 1] || chr(31) || syms[i])) AS pair, wfreq
         |  FROM (SELECT string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms, wfreq
         |        FROM v2)),
         |b3 AS (SELECT pair FROM (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pf FROM p3 GROUP BY pair
         |       ORDER BY pf DESC, pair LIMIT 1)),
         |v3 AS (
         |  SELECT word, replace(sym,
         |    (SELECT chr(31) || replace(pair, chr(31), chr(31) || chr(31)) || chr(31) FROM b3),
         |    (SELECT chr(31) || replace(pair, chr(31), '') || chr(31) FROM b3)) AS sym, wfreq
         |  FROM v2)""".stripMargin

  private val int8CodesCtesSql =
    """s AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
      |  FROM embeddings),
      |unitized AS (
      |  SELECT vec_id, CASE WHEN n = 0 THEN v ELSE list_transform(v, x -> x / n) END AS u
      |  FROM s),
      |qz AS (
      |  SELECT vec_id,
      |    list_transform(u, x -> CAST(floor(x *
      |      (CASE WHEN list_max(list_transform(u, y -> abs(y))) = 0 THEN 1.0
      |            ELSE 127.0 / list_max(list_transform(u, y -> abs(y))) END) + 0.5)
      |      AS INTEGER)) AS q
      |  FROM unitized)""".stripMargin

  private val annListsSql =
    s"""WITH sf AS (
      |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])))) AS cos
      |  FROM embeddings q, embeddings n
      |  WHERE q.vec_id < 8 AND n.vec_id != q.vec_id),
      |truth AS (SELECT q_id, n_id, rank FROM (
      |  SELECT q_id, n_id,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INTEGER) AS rank
      |  FROM sf) WHERE rank <= 10),
      |$int8CodesCtesSql,
      |scored AS (
      |  SELECT qr.vec_id AS q_id, c.vec_id AS n_id,
      |    CAST(list_dot_product(CAST(qr.q AS DOUBLE[]), CAST(c.q AS DOUBLE[])) AS BIGINT) AS dot_q
      |  FROM qz c JOIN qz qr ON qr.vec_id < 8 AND c.vec_id != qr.vec_id),
      |sys AS (SELECT q_id, n_id, rank FROM (
      |  SELECT q_id, n_id,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, n_id) AS INTEGER) AS rank
      |  FROM scored) WHERE rank <= 10),
      |j AS (SELECT t.q_id, t.rank AS trank, y.rank AS srank
      |      FROM truth t LEFT JOIN sys y ON t.q_id = y.q_id AND t.n_id = y.n_id)""".stripMargin

  /** Builds the eval_rbo oracle: the [[annListsSql]] lists, each matched
    * item scored by the SAME `W(max(trank, srank))` integer table the op
    * folds into its plan ([[graft.ops.Eval.rboWeights]]), one closing
    * division by `2^k · lcm(1..k)`.
    */
  private def evalRboOracle(k: Int): String = {
    val w = graft.ops.Eval.rboWeights(k)
    val cases = (1 to k)
      .map(m => s"WHEN ${m} THEN ${w(m - 1)}").mkString(" ")
    val num = "SUM(CASE WHEN srank IS NULL THEN 0 ELSE CASE " +
      "(CASE WHEN trank > srank THEN trank ELSE srank END) " + cases +
      " ELSE 0 END END)"
    annListsSql + s"""
       |SELECT q_id,
       |  CAST($num AS BIGINT) AS rbo_num,
       |  CAST($num AS DOUBLE) / ${graft.ops.Eval.rboDenom(k)} AS rbo
       |FROM j GROUP BY q_id""".stripMargin
  }

  /** Builds the eval_ndcg oracle: the [[annListsSql]] lists; each truth
    * row contributes `rel·W(trank)` to idcg and, when matched,
    * `rel·W(srank)` to dcg — the SAME frozen integer discount table the
    * op folds ([[graft.ops.Eval.ndcgWeights]], spec-pinned literals).
    */
  private def evalNdcgOracle(k: Int): String = {
    val w = graft.ops.Eval.ndcgWeights(k)
    def tbl(rankExpr: String) =
      s"CASE $rankExpr " +
        (1 to k).map(r => s"WHEN $r THEN ${w(r - 1)}").mkString(" ") +
        " ELSE 0 END"
    val rel = s"CAST(${k + 1} - trank AS BIGINT)"
    annListsSql + s"""
       |SELECT q_id,
       |  CAST(SUM(CASE WHEN srank IS NULL THEN 0
       |           ELSE $rel * ${tbl("srank")} END) AS BIGINT) AS dcg_num,
       |  CAST(SUM($rel * ${tbl("trank")}) AS BIGINT) AS idcg_num,
       |  CAST(SUM(CASE WHEN srank IS NULL THEN 0
       |           ELSE $rel * ${tbl("srank")} END) * 1000000
       |       // SUM($rel * ${tbl("trank")}) AS BIGINT) AS ndcg_ppm
       |FROM j GROUP BY q_id""".stripMargin
  }

  /** Builds the embedding_kmeans oracle: the [[int8CodesCtesSql]] codes,
    * then `iters` UNROLLED Lloyd rounds (assign aᵢ → per-dim sums uᵢ →
    * floored means nᵢ → carried centroids c₍ᵢ₊₁₎, empty clusters keeping
    * the previous row via the LEFT JOIN coalesce), then the final
    * assignment. Init order, first-min tie-break (row_number over
    * (d2, cid)) and floor(sum/n) arithmetic mirror
    * [[graft.ops.Similarity.kmeansCodes]] exactly.
    */
  private def kmeansD2Sql(dim: Int)(q: String, c: String) =
    s"""list_sum(list_transform(range($dim),
       |          i -> ($q.x[CAST(i+1 AS INT)] - $c.c[CAST(i+1 AS INT)])
       |             * ($q.x[CAST(i+1 AS INT)] - $c.c[CAST(i+1 AS INT)])))""".stripMargin

  /** Everything up to and including the fitted-centroid CTE `c<iters>` —
    * shared by the kmeans oracle and the silhouette oracle so the two
    * gates replay the IDENTICAL fit.
    */
  private def kmeansCtesPrefix(k: Int, iters: Int, dim: Int): String = {
    val d2Sql = kmeansD2Sql(dim) _
    val sb = new StringBuilder
    sb ++= s"WITH $int8CodesCtesSql,\n"
    sb ++= s"""xs AS (SELECT vec_id, list_transform(q, v -> CAST(v AS BIGINT)) AS x FROM qz),
              |c0 AS (
              |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, x AS c
              |  FROM (SELECT vec_id, x FROM xs ORDER BY vec_id LIMIT $k)),
              |""".stripMargin
    for (i <- 0 until iters) {
      sb ++= s"""a$i AS (
                |  SELECT vec_id, x, cid AS cluster FROM (
                |    SELECT vec_id, x, cid,
                |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                |    FROM (
                |      SELECT q.vec_id, q.x, c.cid, ${d2Sql("q", "c")} AS d2
                |      FROM xs q CROSS JOIN c$i c))
                |  WHERE rn = 1),
                |u$i AS (
                |  SELECT cluster, pos, SUM(x[CAST(pos+1 AS INT)]) AS s, COUNT(*) AS n
                |  FROM a$i CROSS JOIN range($dim) t(pos) GROUP BY cluster, pos),
                |n$i AS (
                |  SELECT cluster, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS c
                |  FROM u$i GROUP BY cluster),
                |c${i + 1} AS (
                |  SELECT p.cid, COALESCE(u.c, p.c) AS c
                |  FROM c$i p LEFT JOIN n$i u ON p.cid = u.cluster),
                |""".stripMargin
    }
    sb.toString
  }

  private def kmeansOracle(k: Int, iters: Int, dim: Int): String = {
    val d2Sql = kmeansD2Sql(dim) _
    kmeansCtesPrefix(k, iters, dim) +
      s"""fin AS (
         |  SELECT vec_id, cluster, d2 FROM (
         |    SELECT vec_id, cid AS cluster, d2,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM (
         |      SELECT q.vec_id, c.cid, ${d2Sql("q", "c")} AS d2
         |      FROM xs q CROSS JOIN c$iters c))
         |  WHERE rn = 1)
         |SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS dist2 FROM fin""".stripMargin
  }

  /** The silhouette tail over the same fit: per point, `a` = min d²
    * (own centroid, first-min cid tie-break), `b` = min d² over the
    * OTHER centroids, `s = (b−a)·2²⁰ // max(a,b)` (0 when both zero),
    * aggregated per cluster.
    */
  private def kmeansSilhouetteOracle(k: Int, iters: Int, dim: Int): String = {
    val d2Sql = kmeansD2Sql(dim) _
    kmeansCtesPrefix(k, iters, dim) +
      s"""ds AS (SELECT q.vec_id, c.cid, ${d2Sql("q", "c")} AS d2
         |       FROM xs q CROSS JOIN c$iters c),
         |own AS (SELECT vec_id, cid AS cluster, d2 AS a FROM (
         |          SELECT vec_id, cid, d2,
         |            row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |          FROM ds) WHERE rn = 1),
         |oth AS (SELECT ds.vec_id, MIN(ds.d2) AS b
         |        FROM ds JOIN own ON ds.vec_id = own.vec_id
         |          AND ds.cid != own.cluster
         |        GROUP BY 1),
         |sil AS (SELECT own.vec_id, own.cluster,
         |          CASE WHEN greatest(own.a, oth.b) = 0 THEN 0
         |               ELSE (oth.b - own.a) * 1048576 // greatest(own.a, oth.b)
         |          END AS sg
         |        FROM own JOIN oth ON own.vec_id = oth.vec_id)
         |SELECT cluster, count(*) AS n,
         |  CAST(SUM(sg) // count(*) AS BIGINT) AS mean_sil_grid
         |FROM sil GROUP BY 1""".stripMargin
  }

  /** The deterministic hyperplanes as DuckDB DOUBLE[] literals — Scala
    * Double.toString round-trips exactly, and DuckDB's sequential
    * `list_dot_product` fold is bitwise-equal to the engine's DotProduct
    * (proven by the knn_brute oracle), so LSH bucket ids replay exactly.
    * Fixture embeddings are 64-dim (TESTDATA.md); [[Similarity]] infers the
    * same from the data.
    */
  private def bucketSql(vecExpr: String, bits: Int): String =
    Similarity.hyperplanes(bits, 64).toSeq.zipWithIndex
      .map { case (p, i) =>
        s"(CASE WHEN list_dot_product($vecExpr, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1L << i} ELSE 0 END)"
      }
      .mkString(" + ")

  /** `hashKey` replayed in DuckDB — same salt concat, same 8-hex prefix. */
  private def hashKeySql(idExpr: String, salt: String): String =
    s"substring(md5('$salt' || CAST($idExpr AS VARCHAR)), 1, 8)"

  /** The pretrain-chain CTE bodies (en → quality cut → dedup →
    * decontam → mixture rates), shared by the pipeline_pretrain oracle
    * and the pipeline_report attrition counts.
    */
  private lazy val pretrainCtesSql: String =
    s"""en AS (
       |  SELECT doc_id, source, text, $wordsSql AS ws FROM documents WHERE lang = 'en'),
       |sc AS (
       |  SELECT doc_id, source, text, ws,
       |    CASE WHEN len(ws) = 0 THEN 0.0
       |         ELSE CAST(len(list_filter(ws, w -> list_contains($enStopSql, w))) AS DOUBLE) / len(ws)
       |    END AS sc,
       |    ${hashKeySql("doc_id", "topf")} AS hk
       |  FROM en),
       |r AS (
       |  SELECT doc_id, source, text, ws, sc,
       |    row_number() OVER (PARTITION BY source ORDER BY sc DESC NULLS LAST, hk ASC) AS rn,
       |    count(sc) OVER (PARTITION BY source) AS n
       |  FROM sc),
       |cut AS (
       |  SELECT doc_id, source, text, ws FROM r
       |  WHERE sc IS NOT NULL AND rn <= CAST(ceil(0.5 * n) AS INT)),
       |dd AS (
       |  SELECT * FROM cut
       |  WHERE doc_id IN (SELECT MIN(doc_id) FROM cut GROUP BY md5(text))),
       |dc AS (
       |  SELECT * FROM dd
       |  WHERE md5(text) NOT IN (SELECT md5(text) FROM documents
       |                          WHERE source = 'src0' AND text IS NOT NULL)),
       |tok AS (SELECT doc_id, source, CAST(len(ws) AS BIGINT) AS n_tok FROM dc),
       |st AS (SELECT source, SUM(n_tok) AS t FROM tok GROUP BY source),
       |tot AS (SELECT SUM(t) AS tt FROM st),
       |q AS (SELECT source, t,
       |        CAST(floor(pow(CAST(t AS DOUBLE) / CAST(tt AS DOUBLE), 0.5)
       |             * 1099511627776.0) AS BIGINT) AS qi
       |      FROM st, tot),
       |nq AS (SELECT SUM(qi) AS sq FROM q),
       |rt AS (SELECT source,
       |         least(1.0, 0.5 * (CAST(qi AS DOUBLE) / CAST(sq AS DOUBLE))
       |           * (CAST(tt AS DOUBLE) / CAST(t AS DOUBLE))) AS rate
       |       FROM q, nq, tot)""".stripMargin

  /** The pretrain chain's final mixture select over [[pretrainCtesSql]]. */
  private lazy val pretrainFinalSql: String =
    s"""SELECT tok.source, tok.doc_id, tok.n_tok
       |FROM tok JOIN rt USING (source)
       |WHERE rt.rate >= 1.0 OR ${hashKeySql("tok.doc_id", "mixT")} <
       |  lpad(lower(hex(least(CAST(floor(rt.rate * 4294967296.0) AS BIGINT),
       |                       4294967295))), 8, '0')""".stripMargin

  /** The [[Sampling.epochRepeat]] replay (weights 50/30/15/5, budget
    * 200k) ending in CTE `e(source, doc_id, n_tok, epoch)` — shared by
    * the sample_epochs oracle and the composed pipeline_shards oracle.
    */
  private lazy val epochsCteSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, CAST(len($wordsSql) AS BIGINT) AS n_tok FROM documents
       |  WHERE source IS NOT NULL),
       |w(source, wt) AS (VALUES ('src0', CAST(50 AS BIGINT)), ('src1', CAST(30 AS BIGINT)),
       |                         ('src2', CAST(15 AS BIGINT)), ('src3', CAST(5 AS BIGINT))),
       |st AS (SELECT source, SUM(n_tok) AS t FROM d GROUP BY source),
       |r AS (SELECT st.source,
       |        (wt * 200000) // (t * 100) AS n_full,
       |        CAST((wt * 200000) % (t * 100) AS DOUBLE) / CAST(t * 100 AS DOUBLE) AS frac
       |      FROM st JOIN w USING (source)
       |      WHERE t > 0),
       |n AS (SELECT d.doc_id, d.source, d.n_tok,
       |        n_full + (CASE WHEN ${hashKeySql("d.doc_id", "epoch")} <
       |          lpad(lower(hex(least(CAST(floor(frac * 4294967296.0) AS BIGINT),
       |                               4294967295))), 8, '0')
       |        THEN 1 ELSE 0 END) AS n
       |      FROM d JOIN r USING (source)),
       |u AS (SELECT source, doc_id, n_tok,
       |        unnest(generate_series(1, CAST(n AS BIGINT))) AS ep
       |      FROM n),
       |e AS (SELECT source, doc_id, n_tok, CAST(ep AS INT) AS epoch FROM u)""".stripMargin

  /** SQL literal that DuckDB parses back to the EXACT double: Java's
    * `Double.toString` prints the shortest decimal that uniquely identifies
    * the value, and the STRING→DOUBLE cast (strtod) rounds it to nearest —
    * round-trip is lossless. The string detour is load-bearing: a bare
    * numeric literal types as DECIMAL, and DuckDB's DECIMAL→DOUBLE
    * conversion DOUBLE-ROUNDS once the scaled mantissa exceeds 2⁵³
    * (measured: `0.11586502199306299::DOUBLE` ≠
    * `CAST('0.11586502199306299' AS DOUBLE)` — the latter is the exact
    * double).
    */
  private def dLit(d: Double): String =
    s"CAST('${java.lang.Double.toString(d)}' AS DOUBLE)"

  /** Sequential-fold squared L2 between `vecExpr[off+1 .. off+sub]` and the
    * literal list `cExpr` — replays the engine's `s += dd*dd` loop term for
    * term (list_transform preserves order; list_reduce left-folds from the
    * first element, and `0.0 + t == t` for the non-negative first term).
    */
  private def d2Sql(vecExpr: String, off: String, cExpr: String, sub: Int): String =
    s"list_reduce(list_transform(range($sub), j -> " +
      s"($vecExpr[$off + j + 1] - $cExpr[j + 1]) * " +
      s"($vecExpr[$off + j + 1] - $cExpr[j + 1])), (a, b) -> a + b)"

  /** The knn_ivf oracle, built from the centroids the query's OWN run
    * fitted (reference: the knn_lsh hyperplane-literal replay). Replays
    * exactly: corpus cell = argmin d² (ties → lowest cell, the
    * `nearestCells` sort), query probes = `nprobe` nearest cells, cosine =
    * the proven list_dot_product triple, rank = (cos DESC, n_id).
    */
  private[queries] def knnIvfOracleSql(
      centroids: Array[Array[Double]],
      nprobe: Int,
      k: Int): String = {
    val dim = centroids.head.length
    // CAST to DOUBLE[] is load-bearing: DuckDB types a bare decimal literal
    // as DECIMAL, and DECIMAL arithmetic drifts 1 ulp off the engine's
    // doubles; the cast parses each 17-digit literal exactly, then rounds
    // to nearest — which is the original double by toString's round-trip
    val rows = centroids.zipWithIndex
      .map { case (c, i) =>
        s"($i, CAST([${c.map(dLit).mkString(", ")}] AS DOUBLE[]))" }
      .mkString(",\n  ")
    s"""WITH cent(cell, cv) AS (VALUES
       |  $rows),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |d AS (
       |  SELECT e.vec_id, cent.cell, ${d2Sql("v", "0", "cv", dim)} AS d2
       |  FROM e CROSS JOIN cent),
       |r AS (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |  FROM d),
       |corp AS (
       |  SELECT r.cell, e.vec_id AS n_id, e.v AS n_vec,
       |    sqrt(list_dot_product(e.v, e.v)) AS n_norm
       |  FROM e JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |q AS (
       |  SELECT vec_id AS q_id, v AS q_vec,
       |    sqrt(list_dot_product(v, v)) AS q_norm
       |  FROM e WHERE vec_id < 8),
       |probe AS (
       |  SELECT vec_id AS q_id, cell FROM r
       |  WHERE vec_id < 8 AND rn <= $nprobe),
       |s AS (
       |  SELECT p.q_id, c.n_id,
       |    list_dot_product(q.q_vec, c.n_vec) / (q.q_norm * c.n_norm) AS cos
       |  FROM probe p JOIN corp c USING (cell) JOIN q ON q.q_id = p.q_id
       |  WHERE c.n_id != p.q_id)
       |SELECT q_id, n_id, cos, rank FROM (
       |  SELECT q_id, n_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
       |      AS INTEGER) AS rank
       |  FROM s)
       |WHERE rank <= $k""".stripMargin
  }

  /** The knn_pq oracle, built from the codebooks the query's OWN run
    * fitted. Replays exactly: per-subspace code = argmin d² over the 16
    * codewords (strict `<` in the encoder → ties to the lowest code), ADC
    * = the query's subspace-distance table summed over subspaces in
    * ascending-s order (the engine's `d += t(s)(code_s)` left fold),
    * rank = (adc_dist ASC, n_id).
    */
  private[queries] def knnPqOracleSql(
      codebooks: Array[Array[Array[Double]]],
      topK: Int): String = {
    val nsub = codebooks.length
    val sub = codebooks.head.head.length
    // CAST to DOUBLE[]: same 1-ulp DECIMAL-literal trap as the IVF builder —
    // and here the codebook values reach the OUTPUT (adc_dist), so the
    // drift is a hash miss, not just a routing wobble
    val rows = (for {
      s <- 0 until nsub
      c <- codebooks(s).indices
    } yield s"($s, $c, CAST([${codebooks(s)(c).map(dLit).mkString(", ")}] AS DOUBLE[]))")
      .mkString(",\n  ")
    s"""WITH cb(s, c, cv) AS (VALUES
       |  $rows),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |d AS (
       |  SELECT e.vec_id, cb.s, cb.c,
       |    ${d2Sql("e.v", s"cb.s * $sub", "cv", sub)} AS d2
       |  FROM e CROSS JOIN cb),
       |codes AS (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT vec_id, s, c,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
       |    FROM d)
       |  WHERE rn = 1),
       |qt AS (SELECT vec_id AS q_id, s, c, d2 FROM d WHERE vec_id < 8),
       |pair AS (
       |  SELECT qt.q_id, codes.vec_id AS n_id, qt.s, qt.d2
       |  FROM codes JOIN qt ON codes.s = qt.s AND codes.code = qt.c
       |  WHERE codes.vec_id != qt.q_id),
       |adc AS (
       |  SELECT q_id, n_id,
       |    list_reduce(list(d2 ORDER BY s), (a, b) -> a + b) AS adc_dist
       |  FROM pair GROUP BY q_id, n_id)
       |SELECT q_id, n_id, rank, adc_dist FROM (
       |  SELECT q_id, n_id, adc_dist,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, n_id)
       |      AS BIGINT) AS rank
       |  FROM adc)
       |WHERE rank <= $topK""".stripMargin
  }

  /** The knn_ivfpq oracle: BOTH literal sets, the IVF routing CTEs (cell
    * argmin + nprobe ranks) and the PQ encode/ADC CTEs, joined so only
    * probed-cell candidates score — the replay of [[graft.ops.Similarity
    * .ivfPqSearch]] term for term.
    */
  private[queries] def knnIvfPqOracleSql(
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nprobe: Int,
      k: Int): String = {
    val dim = centroids.head.length
    val nsub = codebooks.length
    val sub = codebooks.head.head.length
    val centRows = centroids.zipWithIndex
      .map { case (c, i) => s"($i, [${c.map(dLit).mkString(", ")}])" }
      .mkString(",\n  ")
    val cbRows = (for {
      s <- 0 until nsub
      c <- codebooks(s).indices
    } yield s"($s, $c, [${codebooks(s)(c).map(dLit).mkString(", ")}])")
      .mkString(",\n  ")
    s"""WITH cent(cell, cv) AS (VALUES
       |  $centRows),
       |cb(s, c, cw) AS (VALUES
       |  $cbRows),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |dc AS (
       |  SELECT e.vec_id, cent.cell, ${d2Sql("v", "0", "cv", dim)} AS d2
       |  FROM e CROSS JOIN cent),
       |rc AS (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |  FROM dc),
       |asg AS (SELECT vec_id, cell FROM rc WHERE rn = 1),
       |probe AS (SELECT vec_id AS q_id, cell FROM rc
       |          WHERE vec_id < 8 AND rn <= $nprobe),
       |dq AS (
       |  SELECT e.vec_id, cb.s, cb.c,
       |    ${d2Sql("e.v", s"cb.s * $sub", "cw", sub)} AS d2
       |  FROM e CROSS JOIN cb),
       |codes AS (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT vec_id, s, c,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
       |    FROM dq)
       |  WHERE rn = 1),
       |qt AS (SELECT vec_id AS q_id, s, c, d2 FROM dq WHERE vec_id < 8),
       |pair AS (
       |  SELECT p.q_id, a.vec_id AS n_id, qt.s, qt.d2
       |  FROM probe p
       |  JOIN asg a ON a.cell = p.cell
       |  JOIN codes co ON co.vec_id = a.vec_id
       |  JOIN qt ON qt.q_id = p.q_id AND qt.s = co.s AND qt.c = co.code
       |  WHERE a.vec_id != p.q_id),
       |adc AS (
       |  SELECT q_id, n_id,
       |    list_reduce(list(d2 ORDER BY s), (a, b) -> a + b) AS adc_dist
       |  FROM pair GROUP BY q_id, n_id)
       |SELECT q_id, n_id, rank, adc_dist FROM (
       |  SELECT q_id, n_id, adc_dist,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, n_id)
       |      AS BIGINT) AS rank
       |  FROM adc)
       |WHERE rank <= $k""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sample_exact_k" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (ORDER BY
        |      substring(md5('ks' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 100""".stripMargin,
    "sample_k_per_group" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      substring(md5('ks' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5""".stripMargin,
    "sample_split" -> {
      val h = hashKeySql("doc_id", "split")
      s"""SELECT doc_id,
         |  CASE WHEN $h < '${Sampling.fractionThreshold(0.8)}' THEN 'train'
         |       WHEN $h < '${Sampling.fractionThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },
    "sample_split_group" -> {
      val h = hashKeySql("source", "split")
      s"""SELECT doc_id, source,
         |  CASE WHEN $h < '${Sampling.fractionThreshold(0.8)}' THEN 'train'
         |       WHEN $h < '${Sampling.fractionThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },
    "sample_weighted" ->
      s"""WITH s AS (SELECT doc_id, len($wordsSql) AS n_words FROM documents),
         |w AS (SELECT doc_id, n_words, least(1.0, n_words / 200.0) AS p FROM s)
         |SELECT doc_id, n_words FROM w
         |WHERE p >= 1.0 OR (p > 0 AND
         |  ${hashKeySql("doc_id", "imp")} <
         |  lpad(lower(hex(least(CAST(floor(p * 4294967296.0) AS BIGINT), 4294967295))), 8, '0'))""".stripMargin,
    "sample_dsir" ->
      // md5 hex -> bucket via ascii-mapped digits (the privacy_pseudo
      // trick); same add-one rational into ONE grid-floored ln per bucket
      s"""WITH w AS (
         |  SELECT doc_id, lang = 'en' AS tgt, unnest($wordsSql) AS wd
         |  FROM documents WHERE text IS NOT NULL),
         |b AS (SELECT doc_id, tgt, ((ascii(substr(md5(wd),1,1)) - CASE WHEN ascii(substr(md5(wd),1,1)) >= 97 THEN 87 ELSE 48 END) * 4096 + (ascii(substr(md5(wd),2,1)) - CASE WHEN ascii(substr(md5(wd),2,1)) >= 97 THEN 87 ELSE 48 END) * 256 + (ascii(substr(md5(wd),3,1)) - CASE WHEN ascii(substr(md5(wd),3,1)) >= 97 THEN 87 ELSE 48 END) * 16 + (ascii(substr(md5(wd),4,1)) - CASE WHEN ascii(substr(md5(wd),4,1)) >= 97 THEN 87 ELSE 48 END)) % 64 AS bk FROM w),
         |db AS (SELECT doc_id, bk, count(*) AS c, any_value(tgt) AS tgt
         |       FROM b GROUP BY 1, 2),
         |raw AS (SELECT bk, sum(c) AS cr FROM db GROUP BY 1),
         |tg AS (SELECT bk, sum(c) AS ct FROM db WHERE tgt GROUP BY 1),
         |tots AS (SELECT sum(c) AS nr,
         |                sum(CASE WHEN tgt THEN c ELSE 0 END) AS nt FROM db),
         |lam AS (SELECT raw.bk,
         |    CAST(floor(ln(
         |      (CAST(COALESCE(ct, 0) + 1 AS DOUBLE) * CAST(nr + 64 AS DOUBLE))
         |      / (CAST(cr + 1 AS DOUBLE) * CAST(nt + 64 AS DOUBLE)))
         |      * 1048576.0) AS BIGINT) AS lam
         |  FROM raw LEFT JOIN tg ON raw.bk = tg.bk CROSS JOIN tots),
         |s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |             CAST(sum(c * lam) AS BIGINT) AS imp_grid
         |      FROM db JOIN lam ON db.bk = lam.bk GROUP BY 1)
         |SELECT doc_id, n_tokens, imp_grid,
         |  CAST(row_number() OVER (ORDER BY imp_grid DESC, doc_id)
         |       AS INTEGER) AS rank
         |FROM s ORDER BY imp_grid DESC, doc_id LIMIT 50""".stripMargin,
    "sample_budget" ->
      // same tokenizer, same (n_chars DESC, doc_id) order, same strict
      // running-sum ceiling; zh absent from the recipe VALUES
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    COALESCE(n_chars, 0) AS sc,
         |    CAST(COALESCE(len($wordsSql), 0) AS BIGINT) AS cost
         |  FROM documents),
         |q(lang, quota) AS (VALUES
         |  ('en', 6000), ('de', 2000), ('fr', 2000), ('es', 2000)),
         |c AS (
         |  SELECT d.doc_id, d.lang, q.quota,
         |    SUM(cost) OVER (PARTITION BY d.lang
         |      ORDER BY sc DESC, doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cost
         |  FROM d JOIN q USING (lang))
         |SELECT doc_id, lang, CAST(cum_cost AS BIGINT) AS cum_cost
         |FROM c WHERE cum_cost <= quota""".stripMargin,
    "sample_curriculum" ->
      // same exact cumulative-histogram stage cut
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(COALESCE(len($wordsSql), 0) AS BIGINT) AS difficulty
         |  FROM documents),
         |h AS (SELECT difficulty, count(*) AS c FROM d GROUP BY 1),
         |cum AS (
         |  SELECT difficulty,
         |    SUM(c) OVER (ORDER BY difficulty
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
         |    SUM(c) OVER () AS n
         |  FROM h)
         |SELECT d.doc_id, d.difficulty,
         |  CAST(((cum.cm - 1) * 4) // cum.n AS INTEGER) AS stage
         |FROM d JOIN cum USING (difficulty)""".stripMargin,
    "sample_mixture" -> {
      val cases = mixWeights.toSeq.sortBy(_._1)
        .map { case (s, f) => s"WHEN '$s' THEN '${Sampling.fractionThreshold(f)}'" }
        .mkString(" ")
      s"""SELECT source, doc_id FROM documents
         |WHERE ${hashKeySql("doc_id", "mix")} < (CASE source $cases END)""".stripMargin
    },
    // Temperature mixture replayed end-to-end: LONG token sums (exact in
    // any order), the 2^40-grid-floored temperature weight (the one libm
    // value), exact-long normalization, then the same IEEE divisions and
    // the verbatim hash draw — the text_perplexity grid discipline
    "sample_temperature" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, CAST(len($wordsSql) AS BIGINT) AS n_tok FROM documents),
         |st AS (SELECT source, SUM(n_tok) AS t FROM d GROUP BY source),
         |tot AS (SELECT SUM(t) AS tt FROM st),
         |q AS (SELECT source, t,
         |        CAST(floor(pow(CAST(t AS DOUBLE) / CAST(tt AS DOUBLE), 0.5)
         |             * 1099511627776.0) AS BIGINT) AS qi
         |      FROM st, tot),
         |nq AS (SELECT SUM(qi) AS sq FROM q),
         |r AS (SELECT source,
         |        least(1.0, 0.5 * (CAST(qi AS DOUBLE) / CAST(sq AS DOUBLE))
         |          * (CAST(tt AS DOUBLE) / CAST(t AS DOUBLE))) AS rate
         |      FROM q, nq, tot)
         |SELECT d.source, d.doc_id, d.n_tok
         |FROM d JOIN r USING (source)
         |WHERE r.rate >= 1.0 OR ${hashKeySql("d.doc_id", "mixT")} <
         |  lpad(lower(hex(least(CAST(floor(r.rate * 4294967296.0) AS BIGINT),
         |                       4294967295))), 8, '0')""".stripMargin,
    // Epoch-repeat mixture replayed end-to-end: LONG budget/token products,
    // BIGINT integer division (// ≡ Spark div), ONE exactly-rounded IEEE
    // division for the fractional part, the verbatim hash draw, and the
    // repeat fan-out itself via generate_series (empty at n=0, matching
    // the engine's guarded sequence). CTE shared with pipeline_shards.
    "sample_epochs" ->
      s"""$epochsCteSql
         |SELECT source, doc_id, n_tok, epoch FROM e""".stripMargin,
    // The mixture feeding the packer: the epochs CTE above + the pack_bins
    // running-sum window over the (doc_id, epoch) composite order
    "pipeline_shards" ->
      s"""$epochsCteSql
         |SELECT source, doc_id, epoch, n_tok,
         |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source
         |    ORDER BY doc_id * 100000 + epoch
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS bin
         |FROM e""".stripMargin,
    // Hashing-trick TF replayed end-to-end: same md5_32 bucket (DuckDB
    // parses the 8-hex prefix via '0x' cast, Spark via conv base-16),
    // BIGINT counts and squared sums, then one exactly-rounded sqrt +
    // division per row
    "vectorize_hashtf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($wordsSql) AS w FROM documents WHERE text IS NOT NULL),
         |tf AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substring(md5('htf' || w), 1, 8)) AS BIGINT) % 512 AS dim,
         |    count(*) AS tf
         |  FROM toks GROUP BY doc_id, dim),
         |n AS (SELECT doc_id, sqrt(CAST(SUM(tf * tf) AS DOUBLE)) AS nrm
         |      FROM tf GROUP BY doc_id)
         |SELECT tf.doc_id, dim, tf, CAST(tf AS DOUBLE) / nrm AS w
         |FROM tf JOIN n USING (doc_id)""".stripMargin,
    "vectorize_hash_collisions" ->
      // the vectorize_hashtf bucket mapping replayed over the DISTINCT
      // vocabulary, rolled up to the collision histogram
      s"""WITH toks AS (
         |  SELECT unnest($wordsSql) AS w FROM documents WHERE text IS NOT NULL),
         |t AS (SELECT w, count(*) AS tf FROM toks GROUP BY 1),
         |d AS (
         |  SELECT CAST(('0x' || substring(md5('htf' || w), 1, 8)) AS BIGINT)
         |    % 512 AS dim, tf
         |  FROM t),
         |b AS (SELECT dim, CAST(count(*) AS BIGINT) AS nt,
         |        CAST(SUM(tf) AS BIGINT) AS btf
         |      FROM d GROUP BY 1)
         |SELECT nt AS n_terms, count(*) AS n_buckets,
         |  CAST(SUM(btf) AS BIGINT) AS total_tf
         |FROM b GROUP BY 1""".stripMargin,
    // TF-IDF re-weighting replayed exactly: same buckets, BIGINT df and
    // corpus counts, idf floored onto the 1e-6 grid (absorbs libm ln
    // last-ulp drift), weight = long product — zero doubles in the output
    "vectorize_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($wordsSql) AS w FROM documents WHERE text IS NOT NULL),
         |tf AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substring(md5('htf' || w), 1, 8)) AS BIGINT) % 512 AS dim,
         |    count(*) AS tf
         |  FROM toks GROUP BY doc_id, dim),
         |dfq AS (SELECT dim, count(*) AS df FROM tf GROUP BY dim),
         |nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf)
         |SELECT doc_id, tf.dim, tf,
         |  CAST(floor(ln(CAST(n + 1 AS DOUBLE) / (df + 1)) * 1000000.0) AS BIGINT) AS idf_q,
         |  tf * CAST(floor(ln(CAST(n + 1 AS DOUBLE) / (df + 1)) * 1000000.0) AS BIGINT) AS w_q
         |FROM tf JOIN dfq ON tf.dim = dfq.dim, nd""".stripMargin,
    // Text-space top-k replayed end-to-end: same md5 buckets, LONG dots
    // and norms (any aggregation order), cosine from three longs via
    // identical exactly-rounded IEEE steps, ties on candidate id
    "knn_text" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($wordsSql) AS w FROM documents WHERE text IS NOT NULL),
         |tf AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substring(md5('htf' || w), 1, 8)) AS BIGINT) % 512 AS dim,
         |    count(*) AS tf
         |  FROM toks GROUP BY doc_id, dim),
         |nn AS (SELECT doc_id, SUM(tf * tf) AS n2 FROM tf GROUP BY doc_id),
         |q AS (SELECT * FROM tf WHERE doc_id IN (0, 1, 2)),
         |dots AS (
         |  SELECT q.doc_id AS query_id, c.doc_id, SUM(q.tf * c.tf) AS dot
         |  FROM q JOIN tf c ON q.dim = c.dim AND c.doc_id <> q.doc_id
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT query_id, d.doc_id,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(qa.n2 AS DOUBLE)) * sqrt(CAST(ca.n2 AS DOUBLE))) AS cos
         |  FROM dots d
         |  JOIN nn qa ON qa.doc_id = d.query_id
         |  JOIN nn ca ON ca.doc_id = d.doc_id),
         |r AS (SELECT query_id, doc_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id ASC) AS rn
         |      FROM scored)
         |SELECT query_id, doc_id, cos FROM r WHERE rn <= 5""".stripMargin,
    // Per-language top-20% cut: rn ≤ ceil(frac·n) under the (score DESC,
    // hash ASC) total order is exactly the engine's boundary-broadcast
    // selection; the score is one int/int division — bit-exact both sides
    "quality_topfrac" ->
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN len($wordsSql) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter($wordsSql, w -> list_contains($enStopSql, w))) AS DOUBLE) / len($wordsSql)
         |    END AS sc,
         |    ${hashKeySql("doc_id", "topf")} AS hk
         |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
         |r AS (
         |  SELECT doc_id, lang, sc, hk,
         |    row_number() OVER (PARTITION BY lang ORDER BY sc DESC, hk ASC) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM s)
         |SELECT doc_id, lang FROM r WHERE rn <= CAST(ceil(0.2 * n) AS INT)""".stripMargin,
    // Percentile calibration replayed with a rank() window: min-rank ties
    // make rank-1 exactly the strictly-below count; one IEEE division of
    // exact longs — bit-equal to the engine's broadcast score-dim form
    "quality_calibrate" ->
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN len($wordsSql) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter($wordsSql, w -> list_contains($enStopSql, w))) AS DOUBLE) / len($wordsSql)
         |    END AS sc
         |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
         |r AS (
         |  SELECT doc_id, lang, sc,
         |    rank() OVER (PARTITION BY lang ORDER BY sc) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM s)
         |SELECT doc_id, lang,
         |  CASE WHEN n = 1 THEN 0.0 ELSE CAST(rk - 1 AS DOUBLE) / (n - 1) END AS pct
         |FROM r""".stripMargin,
    // One BPE merge-step count replayed from scratch: word frequencies,
    // per-word adjacent char pairs (multiset), weighted pair sums
    "vocab_bpe_merges" ->
      // the same three rounds unrolled: symbol sequences wrapped in
      // chr(31) delimiters, pairs from adjacent symbols (weighted by word
      // frequency), election by (count DESC, pair ASC), rewrite by plain
      // leftmost non-overlapping replace — both engines' replace()
      // semantics
      s"""WITH w AS (SELECT unnest($wordsSql) AS word FROM documents),
         |v0 AS (
         |  SELECT regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS sym,
         |    count(*) AS wfreq
         |  FROM w GROUP BY word),
         |p1 AS (
         |  SELECT unnest(list_transform(range(2, len(syms) + 1),
         |      i -> syms[i - 1] || chr(31) || syms[i])) AS pair, wfreq
         |  FROM (SELECT string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms, wfreq
         |        FROM v0)),
         |b1 AS (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pf FROM p1 GROUP BY pair
         |       ORDER BY pf DESC, pair LIMIT 1),
         |v1 AS (
         |  SELECT replace(sym,
         |    (SELECT chr(31) || replace(pair, chr(31), chr(31) || chr(31)) || chr(31) FROM b1),
         |    (SELECT chr(31) || replace(pair, chr(31), '') || chr(31) FROM b1)) AS sym, wfreq
         |  FROM v0),
         |p2 AS (
         |  SELECT unnest(list_transform(range(2, len(syms) + 1),
         |      i -> syms[i - 1] || chr(31) || syms[i])) AS pair, wfreq
         |  FROM (SELECT string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms, wfreq
         |        FROM v1)),
         |b2 AS (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pf FROM p2 GROUP BY pair
         |       ORDER BY pf DESC, pair LIMIT 1),
         |v2 AS (
         |  SELECT replace(sym,
         |    (SELECT chr(31) || replace(pair, chr(31), chr(31) || chr(31)) || chr(31) FROM b2),
         |    (SELECT chr(31) || replace(pair, chr(31), '') || chr(31) FROM b2)) AS sym, wfreq
         |  FROM v1),
         |p3 AS (
         |  SELECT unnest(list_transform(range(2, len(syms) + 1),
         |      i -> syms[i - 1] || chr(31) || syms[i])) AS pair, wfreq
         |  FROM (SELECT string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms, wfreq
         |        FROM v2)),
         |b3 AS (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pf FROM p3 GROUP BY pair
         |       ORDER BY pf DESC, pair LIMIT 1)
         |SELECT 1 AS step, split_part(pair, chr(31), 1) AS lhs,
         |  split_part(pair, chr(31), 2) AS rhs, pf AS pfreq FROM b1
         |UNION ALL
         |SELECT 2, split_part(pair, chr(31), 1), split_part(pair, chr(31), 2), pf FROM b2
         |UNION ALL
         |SELECT 3, split_part(pair, chr(31), 1), split_part(pair, chr(31), 2), pf FROM b3""".stripMargin,
    "vocab_fertility" ->
      // the shared segment chain joined to per-lang word counts
      (bpeSegCtesSql + """,
         |lw AS (
         |  SELECT lang, u AS word, count(*) AS f
         |  FROM (SELECT lang, unnest(list_filter(
         |          string_split_regex(lower(text), '\s+'), x -> x != '')) AS u
         |        FROM documents)
         |  GROUP BY 1, 2),
         |sg AS (
         |  SELECT word,
         |    CAST(len(string_split(trim(sym, chr(31)), chr(31) || chr(31)))
         |         AS BIGINT) AS n_symbols
         |  FROM v3)
         |SELECT lang, CAST(SUM(f) AS BIGINT) AS n_words,
         |  CAST(SUM(f * n_symbols) AS BIGINT) AS n_subwords,
         |  CAST(SUM(f * n_symbols) * 1000000 // SUM(f) AS BIGINT)
         |    AS fertility_ppm
         |FROM lw JOIN sg USING (word)
         |GROUP BY lang""".stripMargin),
    "vocab_bpe_apply" ->
      // the shared segment chain, finished by the top-20 cut
      (bpeSegCtesSql + """
         |SELECT word, CAST(wfreq AS BIGINT) AS wfreq,
         |  CAST(len(string_split(trim(sym, chr(31)), chr(31) || chr(31))) AS BIGINT)
         |    AS n_symbols
         |FROM v3
         |ORDER BY wfreq DESC, word LIMIT 20""".stripMargin),
    "vocab_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest($wordsSql) AS word FROM documents),
         |v AS (SELECT word, count(*) AS wfreq FROM w GROUP BY word),
         |p AS (SELECT unnest(list_transform(range(1, length(word)), i -> substring(word, i, 2))) AS pair,
         |        wfreq FROM v)
         |SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pfreq FROM p
         |GROUP BY pair ORDER BY pfreq DESC, pair LIMIT 50""".stripMargin,
    // Exact duplicated-8-gram fraction: distinct grams per doc (NO
    // shorter-than-n fallback — sub-8-token docs carry zero grams, like
    // the engine's counting-mode shingles), md5-digested, doc-frequency
    // ≥ 2 marks a gram duplicated; one int/int division at the end
    "text_dupgrams" ->
      s"""WITH g AS (
         |  SELECT doc_id, md5(gram) AS d FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
         |           ELSE list_distinct(list_transform(range(len(ws) - 7),
         |                  i -> array_to_string(ws[i + 1:i + 8], ' ')))
         |      END) AS gram
         |    FROM (SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL))),
         |freq AS (SELECT d, count(*) AS dfreq FROM g GROUP BY d),
         |pd AS (
         |  SELECT g.doc_id, count(*) AS n_grams,
         |    CAST(sum(CASE WHEN freq.dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM g JOIN freq USING (d) GROUP BY g.doc_id)
         |SELECT doc.doc_id,
         |  COALESCE(pd.n_grams, 0) AS n_grams,
         |  COALESCE(pd.n_dup, 0) AS n_dup_grams,
         |  CASE WHEN COALESCE(pd.n_grams, 0) = 0 THEN 0.0
         |       ELSE CAST(pd.n_dup AS DOUBLE) / pd.n_grams END AS dup_frac
         |FROM documents doc LEFT JOIN pd ON doc.doc_id = pd.doc_id""".stripMargin,
    "sample_stratified" ->
      s"""SELECT doc_id, source, rank FROM (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ${hashKeySql("doc_id", "strat")} DESC, doc_id) AS INTEGER) AS rank
         |  FROM documents)
         |WHERE rank <= 5""".stripMargin,
    "sample_balanced" ->
      s"""WITH n AS (
         |  SELECT lang, count(*) AS c FROM documents
         |  WHERE lang IS NOT NULL GROUP BY lang),
         |k AS (SELECT MIN(c) AS kmin FROM n),
         |r AS (
         |  SELECT doc_id, lang,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY ${hashKeySql("doc_id", "bal")} DESC, doc_id) AS INTEGER) AS rank
         |  FROM documents WHERE lang IS NOT NULL)
         |SELECT doc_id, lang, rank FROM r, k WHERE rank <= k.kmin""".stripMargin,
    "pack_bins" ->
      s"""SELECT source, doc_id, n_tok,
         |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS bin
         |FROM (SELECT source, doc_id, len($wordsSql) AS n_tok FROM documents)""".stripMargin,
    // Length-bucketed batching replayed verbatim: the same total order,
    // integer-division batch ids, and integer padding arithmetic (DuckDB
    // HUGEINT sums cast back to BIGINT to match the engine's longs)
    "pack_batches" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, CAST(len($wordsSql) AS BIGINT) AS n_tok FROM documents),
         |b AS (
         |  SELECT source, n_tok,
         |    (row_number() OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id ASC) - 1) // 16 AS batch
         |  FROM t)
         |SELECT source, batch, count(*) AS n_docs, max(n_tok) AS max_tok,
         |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
         |FROM b GROUP BY source, batch""".stripMargin,
    // Brute-force exact-Jaccard replay of the single-corpus near-dup pairs
    // (id_a < id_b) — same recall argument as dedup_cross below.
    "dedup_minhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(0, len(ws) - 3),
         |                i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
         |    END AS s
         |  FROM toks),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.5""".stripMargin,
    // Brute-force exact-Jaccard replay of the cross-corpus near-dup query.
    // The LSH candidate stage is xxhash64 (not replayable), but its 16x4
    // band recall at the fixture's near-dup similarity (~0.9) exceeds
    // 99.9%, and a no-false-positive spec pins the verification step — so
    // on the fixed sf verify corpus the surviving pair set equals the
    // brute-force answer and the whole query hash-checks. The jaccard is
    // one integer division: bit-exact cross-engine; round(.,4) mirrors the
    // Spark output column.
    "dedup_cross" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(0, len(ws) - 3),
         |                i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
         |    END AS s
         |  FROM toks),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
         |  FROM sh a JOIN sh b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1)
         |SELECT id_a, id_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.5""".stripMargin,
    // Brute-force replay of the md5-nibble simhash pair set: the signature
    // is recomputed from scratch (same lowercase/\s+ tokens, same md5, same
    // nibble→bit mapping: bit 4k+b = bit b of hex nibble k, same ±1 votes
    // and sign fold), then ALL pairs are Hamming-tested — no blocking. The
    // Spark side's 4-chunk pigeonhole blocking is exact for Hamming ≤ 3,
    // so blocked ≡ brute force and the full pair set hash-matches.
    // min over ALL of a source's shingles ≡ element-wise min of per-doc
    // signatures (the min-of-mins identity) — so the oracle needs no
    // per-doc stage; 15 hex nibbles of md5 parse via the '0x' cast
    "source_minhash" ->
      s"""WITH toks AS (
         |  SELECT source, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |sh AS (
         |  SELECT source,
         |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(0, len(ws) - 3),
         |                i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
         |    END AS s
         |  FROM toks),
         |e AS (SELECT source, unnest(s) AS sg FROM sh),
         |m AS (
         |  SELECT source, r.j,
         |    min(CAST('0x' || substr(md5(sg || '#' || CAST(r.j AS VARCHAR)), 1, 15)
         |        AS BIGINT)) AS mh
         |  FROM e CROSS JOIN range(16) r(j) GROUP BY 1, 2)
         |SELECT source,
         |  string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS group_sig
         |FROM m GROUP BY source""".stripMargin,
    "source_overlap_matrix" ->
      // the source_minhash group signature replay, compared component-
      // wise per source pair; agree·2^20 // 16 estimates shingle Jaccard
      s"""WITH toks AS (
         |  SELECT source, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |sh AS (
         |  SELECT source,
         |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(0, len(ws) - 3),
         |                i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
         |    END AS s
         |  FROM toks),
         |e AS (SELECT source, unnest(s) AS sg FROM sh),
         |m AS (
         |  SELECT source, r.j,
         |    min(CAST('0x' || substr(md5(sg || '#' || CAST(r.j AS VARCHAR)), 1, 15)
         |        AS BIGINT)) AS mh
         |  FROM e CROSS JOIN range(16) r(j) GROUP BY 1, 2)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         |  (CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1048576) // 16 AS jaccard_est_grid
         |FROM m a JOIN m b ON a.j = b.j AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,
    "text_textrank" ->
      // adjacent-token co-occurrence edges, then the graph_pagerank
      // integer recurrence unrolled three rounds over STRING nodes
      s"""WITH toks AS (
         |  SELECT ws FROM (SELECT $wordsSql AS ws FROM documents
         |                  WHERE text IS NOT NULL)
         |  WHERE len(ws) >= 2),
         |pl AS (
         |  SELECT unnest(list_transform(generate_series(0, len(ws) - 2),
         |           i -> [ws[i + 1], ws[i + 2]])) AS p
         |  FROM toks),
         |pr AS (SELECT p[1] AS wa, p[2] AS wb FROM pl
         |       WHERE p[1] != p[2]
         |         AND NOT list_contains($enStopSql, p[1])
         |         AND NOT list_contains($enStopSql, p[2])),
         |e AS (SELECT DISTINCT src, dst FROM
         |      (SELECT wa AS src, wb AS dst FROM pr UNION ALL SELECT wb, wa FROM pr)),
         |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         |ed AS (SELECT e.src, e.dst, deg.d FROM e JOIN deg USING (src)),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |s0 AS (SELECT node, CAST(1099511627776 AS BIGINT) AS s FROM n),
         |i1 AS (SELECT ed.dst AS node, SUM(s0.s // ed.d) AS inp
         |       FROM ed JOIN s0 ON ed.src = s0.node GROUP BY 1),
         |s1 AS (SELECT n.node, 164926744166 + (17 * COALESCE(i1.inp, 0)) // 20 AS s
         |       FROM n LEFT JOIN i1 USING (node)),
         |i2 AS (SELECT ed.dst AS node, SUM(s1.s // ed.d) AS inp
         |       FROM ed JOIN s1 ON ed.src = s1.node GROUP BY 1),
         |s2 AS (SELECT n.node, 164926744166 + (17 * COALESCE(i2.inp, 0)) // 20 AS s
         |       FROM n LEFT JOIN i2 USING (node)),
         |i3 AS (SELECT ed.dst AS node, SUM(s2.s // ed.d) AS inp
         |       FROM ed JOIN s2 ON ed.src = s2.node GROUP BY 1),
         |s3 AS (SELECT n.node, 164926744166 + (17 * COALESCE(i3.inp, 0)) // 20 AS s
         |       FROM n LEFT JOIN i3 USING (node))
         |SELECT node AS word, CAST(s AS BIGINT) AS score FROM s3
         |ORDER BY score DESC, word ASC LIMIT 20""".stripMargin,
    "text_gopher_rules" ->
      // every rule a cross-multiplied integer compare — no ratio divides;
      // '...' count via non-overlapping regex removal on both sides
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len($wordsSql) AS BIGINT) AS n_words,
         |    CAST(COALESCE(list_sum(list_transform($wordsSql, w -> length(w))), 0)
         |      AS BIGINT) AS sum_wlen,
         |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
         |    CAST((length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g')))
         |      // 3 AS BIGINT) AS n_ellipsis,
         |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(string_split(text, chr(10)),
         |      l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS n_ell_lines,
         |    CAST(len(list_filter($wordsSql, w -> regexp_matches(w, '[a-z]')))
         |      AS BIGINT) AS n_alpha_words,
         |    CAST(len(list_filter($wordsSql, w -> list_contains($enStopSql, w)))
         |      AS BIGINT) AS n_stop
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id, n_words, sum_wlen, n_hash, n_ellipsis, n_lines,
         |  n_ell_lines, n_alpha_words, n_stop,
         |  (n_words >= 50 AND n_words <= 100000) AS r_word_count,
         |  (n_words > 0 AND 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words)
         |    AS r_mean_wlen,
         |  (10 * n_hash <= n_words) AS r_hash_ratio,
         |  (10 * n_ellipsis <= n_words) AS r_ellipsis_ratio,
         |  (10 * n_ell_lines <= 3 * n_lines) AS r_ellipsis_lines,
         |  (10 * n_alpha_words >= 8 * n_words) AS r_alpha_frac,
         |  (n_stop >= 2) AS r_stopwords,
         |  ((n_words >= 50 AND n_words <= 100000)
         |    AND (n_words > 0 AND 3 * n_words <= sum_wlen
         |         AND sum_wlen <= 10 * n_words)
         |    AND (10 * n_hash <= n_words)
         |    AND (10 * n_ellipsis <= n_words)
         |    AND (10 * n_ell_lines <= 3 * n_lines)
         |    AND (10 * n_alpha_words >= 8 * n_words)
         |    AND (n_stop >= 2)) AS gopher_pass
         |FROM f""".stripMargin,
    // acceptance-verdict gates: the oracle computes the exact side and
    // asserts the engine's error-contract booleans TRUE — a drifting
    // sketch flips the verdict and fails the hash
    "approx_parts" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  count(*) AS n, TRUE AS within_5pct
        |FROM lineitem GROUP BY 1""".stripMargin,
    "sketch_rollup" ->
      """SELECT source, count(*) AS n_rows,
        |  CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct,
        |  TRUE AS within_5pct, TRUE AS merge_lossless
        |FROM documents WHERE text IS NOT NULL GROUP BY source""".stripMargin,
    "dedup_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |hs AS (
         |  SELECT doc_id, list_transform(ws, w -> md5(w)) AS hl FROM toks),
         |sh AS (
         |  SELECT doc_id,
         |    list_sum(list_transform(range(60), j ->
         |      CASE WHEN 2 * len(list_filter(hl, h ->
         |          ((strpos('0123456789abcdef',
         |              substring(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
         |            >> CAST(j % 4 AS INT)) & 1 = 1)) > len(hl)
         |      THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS sh
         |  FROM hs)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,
    "snapshot_diff" ->
      """WITH before_s AS (SELECT doc_id, text, source FROM documents),
        |after_s AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 89 = 0 THEN text || ' [rev2]' ELSE text END AS text,
        |    source
        |  FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 101 = 0),
        |bh AS (
        |  SELECT doc_id, md5(
        |    (CASE WHEN text IS NULL THEN '0' ELSE '1' END) ||
        |      len(coalesce(text, '')) || ':' || coalesce(text, '') ||
        |    (CASE WHEN source IS NULL THEN '0' ELSE '1' END) ||
        |      len(coalesce(source, '')) || ':' || coalesce(source, '')) AS hb
        |  FROM before_s),
        |ah AS (
        |  SELECT doc_id, md5(
        |    (CASE WHEN text IS NULL THEN '0' ELSE '1' END) ||
        |      len(coalesce(text, '')) || ':' || coalesce(text, '') ||
        |    (CASE WHEN source IS NULL THEN '0' ELSE '1' END) ||
        |      len(coalesce(source, '')) || ':' || coalesce(source, '')) AS ha
        |  FROM after_s)
        |SELECT doc_id, status FROM (
        |  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
        |    CASE WHEN b.doc_id IS NULL THEN 'added'
        |         WHEN a.doc_id IS NULL THEN 'removed'
        |         WHEN b.hb = a.ha THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM bh b FULL OUTER JOIN ah a ON b.doc_id = a.doc_id)
        |WHERE status <> 'unchanged'""".stripMargin,
    "source_evolution" ->
      // v1 files (even ids) predate lang/n_chars: the merged read
      // null-fills them, so they land in 'unknown' with a null sum
      """SELECT CASE WHEN doc_id % 2 = 1 THEN COALESCE(lang, 'unknown')
        |       ELSE 'unknown' END AS lang,
        |  count(*) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
        |    AS sum_chars,
        |  CAST(sum(len(text)) AS BIGINT) AS text_chars
        |FROM documents
        |GROUP BY 1""".stripMargin,
    "source_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(text)) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE len(text) > 0
        |GROUP BY source""".stripMargin,
    "pack_greedy" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT source, doc_id, len($wordsSql) AS n_tok FROM documents),
         |ordered AS (
         |  SELECT source, doc_id, n_tok,
         |    least(coalesce(n_tok, 0), 512) AS tt,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY coalesce(n_tok, 0) DESC, doc_id) AS rn
         |  FROM toks),
         |step AS (
         |  SELECT source, CAST(0 AS BIGINT) AS rn,
         |    CAST([] AS BIGINT[]) AS rem,
         |    CAST([] AS BIGINT[]) AS ids,
         |    CAST([] AS BIGINT[]) AS bins
         |  FROM (SELECT DISTINCT source FROM ordered)
         |  UNION ALL
         |  SELECT s.source, d.rn,
         |    CASE WHEN fit.i IS NULL
         |         THEN list_append(s.rem, 512 - d.tt)
         |         ELSE list_transform(range(1, len(s.rem) + 1),
         |                j -> CASE WHEN j = fit.i THEN s.rem[j] - d.tt
         |                          ELSE s.rem[j] END)
         |    END AS rem,
         |    list_append(s.ids, d.doc_id) AS ids,
         |    list_append(s.bins, CAST(coalesce(fit.i, len(s.rem) + 1) - 1 AS BIGINT)) AS bins
         |  FROM step s
         |  JOIN ordered d ON d.source = s.source AND d.rn = s.rn + 1
         |  -- list_position yields 0 (not NULL) for "not found": nullif maps
         |  -- it to the append-new-bin branch
         |  CROSS JOIN LATERAL (SELECT nullif(list_position(
         |    list_transform(s.rem, r -> r >= coalesce(d.n_tok, 0)), true), 0) AS i) fit),
         |last AS (
         |  SELECT s.source, unnest(s.ids) AS doc_id, unnest(s.bins) AS bin
         |  FROM step s
         |  JOIN (SELECT source, max(rn) AS mrn FROM step GROUP BY source) m
         |    ON s.source = m.source AND s.rn = m.mrn)
         |SELECT f.source, f.doc_id, t.n_tok, f.bin
         |FROM last f JOIN toks t ON f.source = t.source AND f.doc_id = t.doc_id""".stripMargin,
    "pack_assemble" ->
      s"""WITH binned AS (
         |  SELECT source, doc_id, text, n_tok,
         |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS bin
         |  FROM (SELECT source, doc_id, text, len($wordsSql) AS n_tok FROM documents))
         |SELECT source, bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id)) AS blob_md5
         |FROM binned GROUP BY source, bin""".stripMargin,
    // the shard files on disk must carry exactly the pack_assemble content:
    // the oracle recomputes from the ORIGINAL table, never the files
    "source_shards" ->
      s"""WITH binned AS (
         |  SELECT source, doc_id, text, n_tok,
         |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096 AS BIGINT) AS bin
         |  FROM (SELECT source, doc_id, text, len($wordsSql) AS n_tok FROM documents))
         |SELECT source, bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id)) AS blob_md5
         |FROM binned GROUP BY source, bin""".stripMargin,
    "text_redact" -> {
      val synth = "substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || " +
        "'.7 tel 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
      s"SELECT doc_id, ${TextOps.redactPiiSql(s"($synth)")} AS redacted FROM documents"
    },
    "dedup_against_ref" ->
      """SELECT doc_id, source FROM documents
        |WHERE text IS NULL
        |   OR md5(text) NOT IN (SELECT md5(text) FROM documents
        |                        WHERE source = 'src0' AND text IS NOT NULL)""".stripMargin,
    // Distinct word 7-grams per doc replayed from scratch; docs shorter
    // than 7 tokens carry no gram on either engine (no padding).
    "decontam_ngram" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |cg AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(0, len(ws) - 7),
         |    i -> array_to_string(list_slice(ws, i + 1, i + 7), ' ')))) AS g
         |  FROM toks WHERE len(ws) >= 7),
         |refg AS (
         |  SELECT DISTINCT c.g FROM cg c
         |  JOIN documents d ON c.doc_id = d.doc_id AND d.source = 'src0'),
         |hits AS (
         |  SELECT c.doc_id, COUNT(*) AS n FROM cg c
         |  JOIN refg r ON c.g = r.g GROUP BY c.doc_id)
         |SELECT d.doc_id, COALESCE(h.n, 0) AS n_hit_grams,
         |  COALESCE(h.n, 0) >= 1 AS contaminated
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
    // Tile / count / strip / reassemble replayed from scratch; grouping by
    // the tile STRING here ≡ Spark's grouping by md5(tile).
    "text_boilerplate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |units AS (
         |  SELECT doc_id, i AS k,
         |    array_to_string(list_slice(ws, i * 5 + 1, i * 5 + 5), ' ') AS u
         |  FROM toks, LATERAL (SELECT unnest(generate_series(
         |    0, CAST(floor((len(ws) - 1) / 5.0) AS BIGINT))) AS i) t
         |  WHERE len(ws) >= 1),
         |bp AS (
         |  SELECT u FROM units GROUP BY u HAVING COUNT(DISTINCT doc_id) >= 3),
         |kept AS (
         |  SELECT doc_id, COUNT(*) AS n_kept,
         |    string_agg(u, ' ' ORDER BY k) AS clean
         |  FROM units WHERE u NOT IN (SELECT u FROM bp) GROUP BY doc_id),
         |tot AS (SELECT doc_id, COUNT(*) AS n_units FROM units GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN d.text IS NULL THEN NULL
         |       ELSE COALESCE(k.clean, '') END AS clean_text,
         |  COALESCE(t.n_units, 0) - COALESCE(k.n_kept, 0) AS n_removed
         |FROM documents d
         |LEFT JOIN tot t ON d.doc_id = t.doc_id
         |LEFT JOIN kept k ON d.doc_id = k.doc_id""".stripMargin,
    "vocab_topk" ->
      s"""SELECT token, COUNT(*) AS freq
         |FROM (SELECT unnest($wordsSql) AS token FROM documents)
         |GROUP BY token
         |ORDER BY freq DESC, token
         |LIMIT 100""".stripMargin,
    "vocab_zipf" ->
      // rank by (freq DESC, token ASC); grid-floored logs feed the
      // orders_trend OLS replay
      s"""WITH f AS (SELECT token, count(*) AS f
         |  FROM (SELECT unnest($wordsSql) AS token FROM documents) GROUP BY 1),
         |r AS (SELECT f, row_number() OVER (ORDER BY f DESC, token ASC) AS rnk
         |      FROM f),
         |g AS (SELECT 'corpus' AS g,
         |    CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1048576.0) AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(f AS DOUBLE)) * 1048576.0) AS BIGINT) AS y
         |  FROM r),
         |s AS (SELECT g, count(*) AS n,
         |    SUM(CAST(x AS DECIMAL(19,0))) AS sx,
         |    SUM(CAST(y AS DECIMAL(19,0))) AS sy,
         |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
         |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx
         |  FROM g GROUP BY g)
         |SELECT g, n,
         |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) != 0.0
         |       THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |       ELSE NULL END AS slope_grid,
         |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) != 0.0
         |       THEN (CAST(sy AS DOUBLE)
         |             - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
         |               * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
         |       ELSE NULL END AS intercept_grid
         |FROM s""".stripMargin,
    // exact 2×2 cells from three rollups, then the identical fixed-order
    // double χ² — even the double ORDERING replays bit-for-bit
    "text_chi2_terms" ->
      s"""WITH toks AS (SELECT lang AS g, unnest($wordsSql) AS tk
         |              FROM documents WHERE lang IS NOT NULL),
         |cell AS (SELECT g, tk, count(*) AS a FROM toks GROUP BY 1, 2),
         |rt AS (SELECT tk, CAST(SUM(a) AS BIGINT) AS rt FROM cell GROUP BY 1),
         |ct AS (SELECT g, CAST(SUM(a) AS BIGINT) AS ct FROM cell GROUP BY 1),
         |n AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM ct),
         |s AS (SELECT cell.g, cell.tk, cell.a,
         |        CAST(cell.a AS DOUBLE) AS ad,
         |        CAST(rt.rt - cell.a AS DOUBLE) AS bd,
         |        CAST(ct.ct - cell.a AS DOUBLE) AS cd,
         |        CAST(n.n - rt.rt - ct.ct + cell.a AS DOUBLE) AS dd,
         |        CAST(n.n AS DOUBLE) AS nd
         |      FROM cell JOIN rt USING (tk) JOIN ct USING (g) CROSS JOIN n
         |      WHERE cell.a >= 5),
         |c2 AS (SELECT g, tk, a,
         |        (nd * ((ad*dd - bd*cd) * (ad*dd - bd*cd)))
         |        / (((ad+bd)*(cd+dd)) * ((ad+cd)*(bd+dd))) AS chi2 FROM s),
         |r AS (SELECT g, tk, a, chi2, row_number() OVER
         |        (PARTITION BY g ORDER BY chi2 DESC, tk ASC) AS rn FROM c2)
         |SELECT g AS lang, tk AS token, a AS n_in_class, chi2
         |FROM r WHERE rn <= 10""".stripMargin,
    "text_postings" ->
      s"""WITH tf AS (SELECT tk, doc, count(*) AS tf FROM
         |       (SELECT doc_id AS doc, unnest($wordsSql) AS tk FROM documents)
         |       GROUP BY 1, 2),
         |st AS (SELECT tk, count(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
         |       FROM tf GROUP BY 1),
         |r AS (SELECT tk, doc, tf, row_number() OVER
         |        (PARTITION BY tk ORDER BY tf DESC, doc ASC) AS rank FROM tf)
         |SELECT r.tk AS token, st.df, st.total_tf,
         |  CAST(r.rank AS BIGINT) AS rank, r.doc, CAST(r.tf AS BIGINT) AS tf
         |FROM r JOIN st USING (tk) WHERE st.df >= 3 AND r.rank <= 3""".stripMargin,
    // exact φ-heavy hitters: the engine's CMS prefilter is provably
    // output-invisible (never an underestimate ⇒ every true hitter
    // survives to the exact pass), so plain GROUP BY HAVING replays it
    "heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($wordsSql) AS token FROM documents)
         |SELECT token, COUNT(*) AS freq
         |FROM toks
         |GROUP BY token
         |HAVING COUNT(*) >= ceil((SELECT COUNT(*) FROM toks) / 30.0)""".stripMargin,
    "contamination_report" ->
      """WITH refh AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents
        |  WHERE source = 'src0' AND text IS NOT NULL)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN md5(text) IN (SELECT h FROM refh) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_contaminated,
        |  CAST(SUM(CASE WHEN md5(text) IN (SELECT h FROM refh) THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS contamination_rate
        |FROM documents GROUP BY source""".stripMargin,
    // the bloom regime is exact (confirm join removes false positives), so
    // the decontamination oracle is IDENTICAL to the exact regime's
    "dedup_bloom" ->
      """SELECT doc_id, source FROM documents
        |WHERE text IS NULL
        |   OR md5(text) NOT IN (SELECT md5(text) FROM documents
        |                        WHERE source = 'src0' AND text IS NOT NULL)""".stripMargin,
    "quality_rules" ->
      // same tokens, same thresholds, same bit weights
      s"""WITH w AS (
         |  SELECT doc_id, COALESCE($wordsSql, []) AS ws FROM documents),
         |m AS (
         |  SELECT doc_id, len(ws) AS nw,
         |    CASE WHEN len(ws) = 0 THEN 0.0
         |         ELSE CAST(list_sum(list_transform(ws, x -> length(x)))
         |              AS DOUBLE) / len(ws) END AS awl,
         |    len(list_filter(list_distinct(ws),
         |        w -> list_contains($enStopSql, w))) AS stops,
         |    CASE WHEN len(ws) = 0 THEN 0.0
         |         ELSE CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)
         |              / len(ws) END AS dupf
         |  FROM w)
         |SELECT doc_id,
         |  (CASE WHEN nw < 20 OR nw > 100000 THEN 1 ELSE 0 END
         |   + CASE WHEN awl < 3.0 OR awl > 10.0 THEN 2 ELSE 0 END
         |   + CASE WHEN stops < 2 THEN 4 ELSE 0 END
         |   + CASE WHEN dupf > 0.3 THEN 8 ELSE 0 END) AS rule_mask,
         |  CASE WHEN (CASE WHEN nw < 20 OR nw > 100000 THEN 1 ELSE 0 END
         |   + CASE WHEN awl < 3.0 OR awl > 10.0 THEN 2 ELSE 0 END
         |   + CASE WHEN stops < 2 THEN 4 ELSE 0 END
         |   + CASE WHEN dupf > 0.3 THEN 8 ELSE 0 END) = 0
         |  THEN 1 ELSE 0 END AS pass
         |FROM m""".stripMargin,
    "quality_gate" ->
      s"""WITH staged AS (
         |  SELECT doc_id, $wordsSql AS ws,
         |    list_filter(list_transform(string_split_regex(text, '\\.'), u -> trim(u)),
         |                u -> u != '') AS us
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, len(ws) AS nw,
         |    CASE WHEN len(ws) = 0 THEN 0.0
         |         ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws)
         |    END AS awl,
         |    CASE WHEN len(us) = 0 THEN 0.0
         |         ELSE CAST(len(us) - len(list_distinct(us)) AS DOUBLE) / len(us)
         |    END AS dupf
         |  FROM staged)
         |SELECT doc_id,
         |  CASE WHEN nw < 5 THEN 'too_short'
         |       WHEN nw > 1000 THEN 'too_long'
         |       WHEN awl < 2.0 THEN 'short_words'
         |       WHEN awl > 12.0 THEN 'long_words'
         |       WHEN dupf > 0.3 THEN 'repetitive'
         |       ELSE 'ok' END AS verdict
         |FROM scored""".stripMargin,
    "pipeline_e2e" ->
      s"""WITH en AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE ${TextOps.langIdSql("text")} = 'en' AND len($wordsSql) >= 5),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM en GROUP BY md5(text)),
         |chunks AS (
         |  SELECT e.doc_id, len(list_slice(e.words, i*24 + 1, i*24 + 32)) AS n
         |  FROM (SELECT doc_id, $wordsSql AS words FROM en
         |        WHERE doc_id IN (SELECT doc_id FROM keep)) e,
         |    unnest(generate_series(0, (len(e.words) - 1) // 24)) AS t(i))
         |SELECT doc_id, COUNT(*) AS n_chunks, CAST(SUM(n) AS BIGINT) AS n_tokens
         |FROM chunks GROUP BY doc_id""".stripMargin,
    "pipeline_curate" -> {
      val thr = Sampling.fractionThreshold(0.8)
      s"""WITH staged AS (SELECT doc_id, source, text, $wordsSql AS ws FROM documents),
         |scored AS (
         |  SELECT doc_id, source, text, len(ws) AS nw,
         |    CASE WHEN len(ws) = 0 THEN 0.0
         |         ELSE CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
         |    END AS dupw
         |  FROM staged),
         |kept AS (SELECT * FROM scored WHERE nw >= 5 AND nw <= 1000 AND dupw <= 0.3),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
         |train AS (
         |  SELECT source, doc_id, CAST(nw AS BIGINT) AS n_tok FROM kept
         |  WHERE doc_id IN (SELECT doc_id FROM keep)
         |    AND ${hashKeySql("source", "split")} < '$thr')
         |SELECT source, doc_id, n_tok,
         |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS bin
         |FROM train""".stripMargin
    },
    // The round-8 curation chain replayed stage-for-stage: each CTE is the
    // already-proven per-stage oracle, composed in the engine's order
    // (shared prefix/final in pretrainCtesSql/pretrainFinalSql — the
    // attrition report below counts the same chain)
    "pipeline_pretrain" ->
      s"""WITH $pretrainCtesSql
         |$pretrainFinalSql""".stripMargin,
    // Stage attrition over the same chain: six counts, one per CTE stage
    "pipeline_report" ->
      s"""WITH $pretrainCtesSql,
         |m AS ($pretrainFinalSql)
         |SELECT 'raw' AS stage, 0 AS stage_idx, COUNT(*) AS n_docs FROM documents
         |UNION ALL SELECT 'lang', 1, COUNT(*) FROM en
         |UNION ALL SELECT 'quality', 2, COUNT(*) FROM cut
         |UNION ALL SELECT 'dedup', 3, COUNT(*) FROM dd
         |UNION ALL SELECT 'decontam', 4, COUNT(*) FROM dc
         |UNION ALL SELECT 'mixture', 5, COUNT(*) FROM m""".stripMargin,
    "text_chunks" ->
      s"""SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |  array_to_string(list_slice(words, i*24 + 1, i*24 + 32), ' ') AS chunk_text,
         |  len(list_slice(words, i*24 + 1, i*24 + 32)) AS n_chunk_tokens
         |FROM (SELECT doc_id, $wordsSql AS words FROM documents),
         |  unnest(generate_series(0, (len(words) - 1) // 24)) AS t(i)""".stripMargin,
    "dedup_exact" ->
      "SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)",
    "embedding_pca" -> embeddingPcaOracle,
    "metric_bootstrap" -> metricBootstrapOracle,
    "metric_bootstrap_ratio" -> metricBootstrapRatioOracle,
    "embedding_drift" ->
      """WITH g AS (
        |  SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS gv
        |  FROM embeddings),
        |ea AS (SELECT label, pos, CAST(SUM(v) AS BIGINT) AS sa, count(*) AS ca
        |       FROM (SELECT label, unnest(gv) AS v, generate_subscripts(gv, 1) AS pos
        |             FROM g WHERE vec_id % 2 = 0) GROUP BY 1, 2),
        |eb AS (SELECT label, pos, CAST(SUM(v) AS BIGINT) AS sb, count(*) AS cb
        |       FROM (SELECT label, unnest(gv) AS v, generate_subscripts(gv, 1) AS pos
        |             FROM g WHERE vec_id % 2 = 1) GROUP BY 1, 2)
        |SELECT ea.label,
        |  CAST(MAX(ca) AS BIGINT) AS n_a,
        |  CAST(MAX(cb) AS BIGINT) AS n_b,
        |  CASE WHEN SUM(CAST(sa AS HUGEINT) * sa) = 0
        |         OR SUM(CAST(sb AS HUGEINT) * sb) = 0 THEN NULL
        |       ELSE CAST(CAST(SUM(CAST(sa AS HUGEINT) * sb) AS VARCHAR) AS DOUBLE)
        |            / (sqrt(CAST(CAST(SUM(CAST(sa AS HUGEINT) * sa) AS VARCHAR) AS DOUBLE))
        |               * sqrt(CAST(CAST(SUM(CAST(sb AS HUGEINT) * sb) AS VARCHAR) AS DOUBLE)))
        |  END AS cos_centroid
        |FROM ea JOIN eb ON ea.label = eb.label AND ea.pos = eb.pos
        |GROUP BY 1""".stripMargin,
    "knn_hardneg" ->
      """WITH s AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label,
        |    n.vec_id AS n_id, n.label AS n_label,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])))) AS cos
        |  FROM embeddings q, embeddings n
        |  WHERE q.vec_id < 8 AND n.vec_id != q.vec_id AND n.label != q.label)
        |SELECT q_id, q_label, n_id, n_label, cos, rank FROM (
        |  SELECT q_id, q_label, n_id, n_label, cos,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INTEGER) AS rank
        |  FROM s)
        |WHERE rank <= 5""".stripMargin,
    "knn_brute" ->
"""WITH s AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])))) AS cos
        |  FROM embeddings q, embeddings n
        |  WHERE q.vec_id < 8 AND n.vec_id != q.vec_id)
        |SELECT q_id, n_id, cos, rank FROM (
        |  SELECT q_id, n_id, cos,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INTEGER) AS rank
        |  FROM s)
        |WHERE rank <= 10""".stripMargin,
    "embedding_outliers" ->
      // grid centroid → d² via the three dot kernels in the same fixed
      // order → 2^20 distance grid → the global median/MAD rank replay
      """WITH g AS (
        |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS gv
        |  FROM embeddings),
        |c AS (
        |  SELECT pos, CAST(sum(v) AS DOUBLE) AS s
        |  FROM (SELECT unnest(gv) AS v, generate_subscripts(gv, 1) AS pos FROM g)
        |  GROUP BY pos),
        |nn AS (SELECT count(*) AS n FROM embeddings),
        |m AS (SELECT list(s / (nn.n * 1048576.0) ORDER BY pos) AS mv FROM c CROSS JOIN nn),
        |d AS (
        |  SELECT e.vec_id,
        |    (list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
        |     - 2.0 * list_dot_product(CAST(e.embedding AS DOUBLE[]), m.mv)
        |     + list_dot_product(m.mv, m.mv)) AS d2
        |  FROM embeddings e CROSS JOIN m),
        |q AS (SELECT vec_id, d2, CAST(floor(d2 * 1048576.0) AS BIGINT) AS q FROM d),
        |mr AS (SELECT q, row_number() OVER (ORDER BY q) AS rn, count(*) OVER () AS cn FROM q),
        |med AS (SELECT q AS gmed FROM mr WHERE rn = (cn + 1) // 2),
        |dv AS (SELECT q.vec_id, q.d2, abs(q.q - med.gmed) AS dev FROM q CROSS JOIN med),
        |m2 AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rn, count(*) OVER () AS cn FROM dv),
        |mad AS (SELECT dev AS gmad FROM m2 WHERE rn = (cn + 1) // 2)
        |SELECT dv.vec_id, dv.d2 FROM dv CROSS JOIN mad
        |WHERE dv.dev * 10000 > 2 * 14826 * mad.gmad""".stripMargin,
    "audience_lookalike" ->
      // same 2^20 grid centroid (exact integer sums, cast double), same
      // sequential-fold dot/norm kernel, same null guard on zero norms
      """WITH g AS (
        |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS gv
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (
        |  SELECT pos, CAST(sum(v) AS DOUBLE) AS cv
        |  FROM (SELECT unnest(gv) AS v, generate_subscripts(gv, 1) AS pos FROM g)
        |  GROUP BY pos),
        |cent AS (SELECT list(cv ORDER BY pos) AS cvec FROM c),
        |s AS (
        |  SELECT e.vec_id,
        |    CASE WHEN sqrt(list_dot_product(cent.cvec, cent.cvec)) = 0.0
        |           OR sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                    CAST(e.embedding AS DOUBLE[]))) = 0.0
        |         THEN NULL
        |         ELSE list_dot_product(CAST(e.embedding AS DOUBLE[]), cent.cvec) /
        |           (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                  CAST(e.embedding AS DOUBLE[]))) *
        |            sqrt(list_dot_product(cent.cvec, cent.cvec))) END AS cos
        |  FROM embeddings e, cent WHERE NOT (e.vec_id < 8))
        |SELECT vec_id, cos FROM s ORDER BY cos DESC NULLS LAST, vec_id LIMIT 20""".stripMargin,
    "embedding_norm" ->
      """SELECT vec_id,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
        |FROM embeddings""".stripMargin,
    "embedding_unit" ->
      """WITH s AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id,
        |    CASE WHEN n = 0 THEN v ELSE list_transform(v, x -> x / n) END AS unit
        |  FROM s)
        |SELECT vec_id, unit[1] AS u_first, unit[-1] AS u_last,
        |  sqrt(list_dot_product(unit, unit)) AS unit_norm
        |FROM u""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id,
         |  len($wordsSql) AS n_tokens,
         |  CAST(COALESCE(list_sum(list_transform($wordsSql, w -> 1 + (length(w) - 1) // 4)), 0) +
         |    length(regexp_replace(text, '[^0-9.,;:!?]', '', 'g')) AS BIGINT) AS n_tok_est
         |FROM documents""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  length(text) AS n_chars2,
         |  len($wordsSql) AS n_words,
         |  CASE WHEN len($wordsSql) = 0 THEN 0.0
         |       ELSE CAST(list_sum(list_transform($wordsSql, w -> length(w))) AS DOUBLE) / len($wordsSql)
         |  END AS avg_wlen,
         |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         |  CASE WHEN len($wordsSql) = 0 THEN 0.0
         |       ELSE CAST(len(list_filter($wordsSql, w -> list_contains($enStopSql, w))) AS DOUBLE) / len($wordsSql)
         |  END AS stop_ratio
         |FROM documents""".stripMargin,
    "text_langid" ->
      s"SELECT doc_id, ${TextOps.langIdSql("text")} AS lang_pred FROM documents",
    "text_oov" ->
      // same tokenization, same (freq DESC, word ASC) vocab cut, same
      // occurrence-counting membership tally
      s"""WITH w AS (
         |  SELECT unnest($wordsSql) AS word FROM documents WHERE text IS NOT NULL),
         |wc AS (SELECT word, count(*) AS c FROM w GROUP BY word),
         |v AS (SELECT word FROM wc ORDER BY c DESC, word LIMIT 100),
         |t AS (
         |  SELECT doc_id, unnest($wordsSql) AS word
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT t.doc_id, count(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |FROM t LEFT JOIN v ON t.word = v.word
         |GROUP BY t.doc_id""".stripMargin,
    "inference_quality" ->
      // the identical left-fold: ((((bias + f1·w1) + f2·w2) + f3·w3) + f4·w4)
      // with dyadic weights — IEEE addition is order-fixed on both sides
      s"""WITH l AS (
         |  SELECT doc_id, $logitSql AS logit
         |  FROM documents)
         |SELECT doc_id, logit,
         |  CASE WHEN logit IS NULL THEN NULL
         |       ELSE CAST(logit > 0 AS INTEGER) END AS label
         |FROM l""".stripMargin,
    "eval_auc" ->
      // mid-rank Mann–Whitney over the score histogram: the ×2 rank ledger
      // keeps every quantity integral until the single closing division
      s"""WITH l0 AS ($evalScoredSql),
         |l AS (SELECT * FROM l0 WHERE score IS NOT NULL),
         |h AS (SELECT score AS s, CAST(count(*) AS BIGINT) AS c,
         |        CAST(SUM(CAST(label AS BIGINT)) AS BIGINT) AS p
         |      FROM l GROUP BY 1),
         |r AS (SELECT s, c, p,
         |        CAST(COALESCE(SUM(c) OVER (ORDER BY s
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
         |      FROM h),
         |a AS (SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
         |        CAST(SUM(c - p) AS BIGINT) AS n_neg,
         |        CAST(SUM(p * (2 * below + c + 1)) AS BIGINT) AS r2
         |      FROM r)
         |SELECT n_pos, n_neg,
         |  r2 - n_pos * (n_pos + 1) AS auc_num2,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |       THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) / (2 * n_pos * n_neg)
         |       ELSE NULL END AS auc
         |FROM a""".stripMargin,
    "eval_brier" ->
      // σ floored onto the 2^20 grid (clamped into the top bin), exact
      // per-bin integer sums, the three Murphy terms each one
      // fixed-order double combine mirroring brierBins
      s"""WITH l0 AS ($evalScoredSql),
         |l AS (SELECT * FROM l0 WHERE score IS NOT NULL),
         |b AS (SELECT CAST(label AS BIGINT) AS y,
         |        LEAST(CAST(floor((1.0 / (1.0 + exp(-score))) * 1048576.0) AS BIGINT),
         |              1048575) AS pn
         |      FROM l),
         |g AS (SELECT pn // 65536 AS bin, count(*) AS n,
         |        CAST(SUM(y) AS BIGINT) AS n_pos,
         |        SUM(CAST(pn AS DECIMAL(38,0))) AS sp,
         |        SUM(CAST((pn - y * 1048576) * (pn - y * 1048576) AS DECIMAL(38,0))) AS sq
         |      FROM b GROUP BY 1),
         |t AS (SELECT count(*) AS nt, CAST(SUM(y) AS BIGINT) AS pt FROM b)
         |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
         |  CAST(sq AS DOUBLE) / (1048576.0 * 1048576.0 * CAST(t.nt AS DOUBLE)) AS brier_term,
         |  (CAST(sp AS DOUBLE) / (1048576.0 * CAST(n AS DOUBLE))
         |     - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
         |  * (CAST(sp AS DOUBLE) / (1048576.0 * CAST(n AS DOUBLE))
         |     - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
         |  * CAST(n AS DOUBLE) / CAST(t.nt AS DOUBLE) AS rel_term,
         |  (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
         |     - CAST(t.pt AS DOUBLE) / CAST(t.nt AS DOUBLE))
         |  * (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
         |     - CAST(t.pt AS DOUBLE) / CAST(t.nt AS DOUBLE))
         |  * CAST(n AS DOUBLE) / CAST(t.nt AS DOUBLE) AS res_term
         |FROM g CROSS JOIN t""".stripMargin,
    "eval_confusion" ->
      s"""WITH l0 AS ($evalScoredSql),
         |l AS (SELECT * FROM l0 WHERE score IS NOT NULL),
         |c AS (SELECT
         |  CAST(SUM(CASE WHEN label = 1 AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN label = 0 AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(SUM(CASE WHEN label = 1 AND NOT score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(SUM(CASE WHEN label = 0 AND NOT score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM l)
         |SELECT tp, fp, fn, tn,
         |  CASE WHEN tp + fp + fn + tn > 0
         |       THEN CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) ELSE NULL END AS acc,
         |  CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE NULL END AS prec,
         |  CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE NULL END AS rec,
         |  CASE WHEN tp * 2 + fp + fn > 0
         |       THEN CAST(tp * 2 AS DOUBLE) / (tp * 2 + fp + fn) ELSE NULL END AS f1
         |FROM c""".stripMargin,
    "eval_pr_curve" ->
      s"""WITH l0 AS ($evalScoredSql),
         |l AS (SELECT * FROM l0 WHERE score IS NOT NULL),
         |t(thr) AS (VALUES (-0.75), (-0.625), (-0.5), (-0.375), (-0.25),
         |                  (-0.125), (0.0), (0.125)),
         |s AS (SELECT t.thr,
         |        CAST(SUM(CASE WHEN l.score >= t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
         |        CAST(SUM(CASE WHEN l.score >= t.thr AND l.label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |        CAST(SUM(CASE WHEN l.label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos
         |      FROM l CROSS JOIN t GROUP BY 1)
         |SELECT CAST(thr AS DOUBLE) AS thr, n_pred_pos, tp,
         |  CASE WHEN n_pred_pos > 0 THEN CAST(tp AS DOUBLE) / n_pred_pos ELSE NULL END AS prec,
         |  CASE WHEN pos > 0 THEN CAST(tp AS DOUBLE) / pos ELSE NULL END AS rec
         |FROM s""".stripMargin,
    "eval_calibration" ->
      s"""WITH l0 AS ($evalScoredSql),
         |l AS (SELECT * FROM l0 WHERE score IS NOT NULL)
         |SELECT CAST(floor(score / 0.125) AS BIGINT) AS bin,
         |  CAST(CAST(floor(score / 0.125) AS BIGINT) AS DOUBLE) * 0.125 AS bin_lo,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(label AS BIGINT)) AS BIGINT) AS n_pos,
         |  CAST(SUM(CAST(label AS BIGINT)) AS DOUBLE) / count(*) AS pos_rate
         |FROM l GROUP BY 1""".stripMargin,
    "eval_lift" ->
      // row_number bucket arithmetic ((rank−1)·10 DIV N), NOT ntile's
      // remainder rule — the engine's distributed rank replays exactly
      s"""WITH l0 AS ($evalScoredSql),
         |l AS (SELECT * FROM l0 WHERE score IS NOT NULL),
         |r AS (SELECT label,
         |        CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rnk,
         |        CAST(count(*) OVER () AS BIGINT) AS tot
         |      FROM l),
         |b AS (SELECT ((rnk - 1) * 10) // tot AS bucket,
         |        CAST(count(*) AS BIGINT) AS n,
         |        CAST(SUM(CAST(label AS BIGINT)) AS BIGINT) AS n_pos
         |      FROM r GROUP BY 1),
         |c AS (SELECT bucket, n, n_pos,
         |        CAST(SUM(n_pos) OVER (ORDER BY bucket
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
         |        CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos,
         |        CAST(SUM(n) OVER () AS BIGINT) AS tot_n
         |      FROM b)
         |SELECT bucket, n, n_pos, cum_pos,
         |  CASE WHEN tot_pos > 0 THEN CAST(cum_pos AS DOUBLE) / tot_pos ELSE NULL END AS capture,
         |  CASE WHEN tot_pos > 0 AND n > 0
         |       THEN CAST(n_pos * tot_n AS DOUBLE) / (n * tot_pos) ELSE NULL END AS lift
         |FROM c""".stripMargin,
    "eval_retrieval" ->
      // truth = the knn_brute CTE verbatim, system = the knn_int8 CTE
      // verbatim, then the (query,item) left join + per-query rollup;
      // 2520 = lcm(1..10), so every reciprocal rank is an exact integer
      (annListsSql + """
        |SELECT q_id,
        |  CAST(SUM(CASE WHEN srank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(SUM(CASE WHEN srank IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 10 AS recall,
        |  MIN(CASE WHEN trank = 1 THEN srank END) AS nn_rank,
        |  COALESCE(CAST(2520 / MIN(CASE WHEN trank = 1 THEN srank END) AS BIGINT), 0) AS rr_num
        |FROM j GROUP BY q_id""".stripMargin),
    "eval_rbo" -> evalRboOracle(10),
    "eval_ece" ->
      // same shifted/clamped grid forecast; |scale*np - conf| folds the
      // per-bin weights into one integer numerator
      """WITH b AS (
        |  SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
        |    least(greatest(CAST(floor((CAST(embedding[1] AS DOUBLE) + 0.5)
        |      * 1048576.0) AS BIGINT), 0), 1048575) AS pn
        |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
        |    AND len(embedding) >= 1),
        |g AS (SELECT pn // 65536 AS bin, count(*) AS n, SUM(y) AS np,
        |             SUM(pn) AS conf
        |      FROM b GROUP BY 1)
        |SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        |  count(*) AS n_bins,
        |  CAST(SUM(abs(1048576 * np - conf)) AS BIGINT) AS ece_num,
        |  CAST(SUM(abs(1048576 * np - conf)) AS DOUBLE)
        |    / (CAST(SUM(n) AS DOUBLE) * 1048576.0) AS ece
        |FROM g""".stripMargin,
    "eval_ndcg" -> evalNdcgOracle(10),
    "eval_bleu" ->
      // same clipped counts for n = 1, 2; same BP exp and geometric mean
      s"""WITH staged AS (
         |  SELECT doc_id AS id, $wordsSql AS ws FROM documents
         |  WHERE text IS NOT NULL),
         |g1 AS (SELECT id, u AS gm, count(*) AS c
         |       FROM (SELECT id, unnest(ws) AS u FROM staged) GROUP BY 1, 2),
         |g2 AS (SELECT id, ws[i + 1] || ' ' || ws[i + 2] AS gm, count(*) AS c
         |       FROM staged,
         |            (SELECT unnest(generate_series(0, len(ws) - 2)) AS i)
         |       GROUP BY 1, 2),
         |t AS (SELECT id, len(ws) AS len FROM staged),
         |p AS (SELECT doc_id AS id_a, doc_id + 250 AS id_b
         |      FROM documents WHERE doc_id < 250),
         |m1 AS (SELECT p.id_a, p.id_b, SUM(least(a.c, b.c)) AS m1
         |       FROM p JOIN g1 a ON a.id = p.id_a
         |       JOIN g1 b ON b.id = p.id_b AND a.gm = b.gm GROUP BY 1, 2),
         |m2 AS (SELECT p.id_a, p.id_b, SUM(least(a.c, b.c)) AS m2
         |       FROM p JOIN g2 a ON a.id = p.id_a
         |       JOIN g2 b ON b.id = p.id_b AND a.gm = b.gm GROUP BY 1, 2),
         |o AS (
         |  SELECT p.id_a, p.id_b,
         |    COALESCE(ta.len, 0) AS c_len, COALESCE(tb.len, 0) AS r_len,
         |    CAST(COALESCE(m1.m1, 0) AS BIGINT) AS m1,
         |    CAST(COALESCE(m2.m2, 0) AS BIGINT) AS m2
         |  FROM p LEFT JOIN m1 ON p.id_a = m1.id_a AND p.id_b = m1.id_b
         |  LEFT JOIN m2 ON p.id_a = m2.id_a AND p.id_b = m2.id_b
         |  LEFT JOIN t ta ON ta.id = p.id_a
         |  LEFT JOIN t tb ON tb.id = p.id_b)
         |SELECT id_a, id_b, c_len, r_len, m1, m2,
         |  CASE WHEN c_len > 1 AND m1 > 0 AND m2 > 0 THEN
         |    (CASE WHEN c_len >= r_len THEN 1.0
         |          ELSE floor(exp(1.0 - CAST(r_len AS DOUBLE)
         |                         / CAST(c_len AS DOUBLE)) * 1048576.0)
         |               / 1048576.0
         |     END)
         |    * sqrt((CAST(m1 AS DOUBLE) / CAST(c_len AS DOUBLE))
         |           * (CAST(m2 AS DOUBLE) / CAST(c_len - 1 AS DOUBLE)))
         |  WHEN c_len > 0 THEN 0.0 END AS bleu
         |FROM o""".stripMargin,
    "eval_rouge" ->
      // same bigrams, same clipped-min overlap, same single division
      s"""WITH g AS (
         |  SELECT doc_id AS id, ws[i + 1] || ' ' || ws[i + 2] AS gm,
         |         count(*) AS c
         |  FROM (SELECT doc_id, $wordsSql AS ws FROM documents
         |        WHERE text IS NOT NULL),
         |       (SELECT unnest(generate_series(0, len(ws) - 2)) AS i)
         |  GROUP BY 1, 2),
         |t AS (SELECT id, SUM(c) AS n FROM g GROUP BY 1),
         |p AS (SELECT doc_id AS id_a, doc_id + 250 AS id_b
         |      FROM documents WHERE doc_id < 250),
         |ov AS (
         |  SELECT p.id_a, p.id_b, SUM(least(a.c, b.c)) AS overlap
         |  FROM p JOIN g a ON a.id = p.id_a JOIN g b
         |    ON b.id = p.id_b AND a.gm = b.gm
         |  GROUP BY 1, 2)
         |SELECT p.id_a, p.id_b,
         |  CAST(COALESCE(ov.overlap, 0) AS BIGINT) AS overlap,
         |  CAST(COALESCE(ta.n, 0) AS BIGINT) AS n_a,
         |  CAST(COALESCE(tb.n, 0) AS BIGINT) AS n_b,
         |  CASE WHEN COALESCE(ta.n, 0) + COALESCE(tb.n, 0) = 0 THEN NULL
         |       ELSE CAST(2 * COALESCE(ov.overlap, 0) * 1000000
         |            // (COALESCE(ta.n, 0) + COALESCE(tb.n, 0)) AS BIGINT)
         |  END AS f1_ppm
         |FROM p LEFT JOIN ov ON p.id_a = ov.id_a AND p.id_b = ov.id_b
         |LEFT JOIN t ta ON ta.id = p.id_a
         |LEFT JOIN t tb ON tb.id = p.id_b""".stripMargin,
    "embedding_kmeans" -> kmeansOracle(8, 3, 64),
    "embedding_silhouette" -> kmeansSilhouetteOracle(8, 3, 64),
    "text_fingerprint" ->
      s"SELECT doc_id, md5($normSql) AS fp FROM documents",
    "text_readability" ->
      // same tokenization, same period-split sentence units, same
      // vowel-group syllable estimate, same fixed-order Flesch combine
      s"""WITH s AS (
         |  SELECT doc_id,
         |    CAST(len($wordsSql) AS BIGINT) AS n_words,
         |    CAST(len(list_filter(list_transform(string_split(text, '.'), u -> trim(u)),
         |      u -> u != '')) AS BIGINT) AS n_sentences,
         |    CAST(COALESCE(list_sum(list_transform($wordsSql,
         |      w -> len(regexp_extract_all(w, '[aeiouy]+')))), 0) AS BIGINT) AS n_syllables
         |  FROM documents)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  CASE WHEN n_words = 0 OR n_sentences = 0 THEN NULL
         |       ELSE round(206.835
         |         - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
         |         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) END AS flesch
         |FROM s""".stripMargin,
    "text_code_detect" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars2,
        |    CAST(length(regexp_replace(text, '[^{}()\[\]]', '', 'g')) AS BIGINT) AS n_braces,
        |    CAST(length(regexp_replace(text, '[^;]', '', 'g')) AS BIGINT) AS n_semis,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> regexp_matches(l, '^  '))) AS BIGINT) AS n_indent_lines
        |  FROM documents)
        |SELECT doc_id, n_chars2, n_braces, n_semis, n_indent_lines,
        |  (n_braces + n_semis + n_indent_lines) * 50 >= n_chars2 AS codelike
        |FROM s""".stripMargin,
    "vocab_next_word" ->
      s"""WITH staged AS (SELECT $wordsSql AS ws FROM documents),
         |bgs AS (
         |  SELECT ws[i + 1] AS w1, ws[i + 2] AS w2
         |  FROM (SELECT ws, unnest(generate_series(0, len(ws) - 2)) AS i
         |        FROM staged WHERE len(ws) >= 2)),
         |pair AS (SELECT w1, w2, count(*) AS n FROM bgs GROUP BY 1, 2),
         |heads AS (
         |  SELECT w1 FROM (SELECT w1, sum(n) AS tot FROM pair GROUP BY 1)
         |  ORDER BY tot DESC, w1 LIMIT 20),
         |ranked AS (
         |  SELECT pair.w1, w2, n,
         |    CAST(row_number() OVER (PARTITION BY pair.w1 ORDER BY n DESC, w2)
         |      AS INTEGER) AS rank
         |  FROM pair JOIN heads ON pair.w1 = heads.w1)
         |SELECT w1, w2, n, rank FROM ranked WHERE rank <= 3""".stripMargin,
    "vocab_kneser_ney" ->
      // same bigram construction; head totals, continuation counts and the
      // type count fold into ONE rational per row: num = max(4c-3,0)*N +
      // 3*N1(v.)*N1(.w), den = 4*c(v)*N, ppm = 1e6*num // den
      s"""WITH staged AS (SELECT $wordsSql AS ws FROM documents),
         |bgs AS (
         |  SELECT ws[i + 1] AS w1, ws[i + 2] AS w2
         |  FROM (SELECT ws, unnest(generate_series(0, len(ws) - 2)) AS i
         |        FROM staged WHERE len(ws) >= 2)),
         |pair AS (SELECT w1, w2, count(*) AS n FROM bgs GROUP BY 1, 2),
         |heads AS (SELECT w1, sum(n) AS c_head, count(*) AS n_cont_head
         |          FROM pair GROUP BY 1),
         |tails AS (SELECT w2, count(*) AS n_cont_tail FROM pair GROUP BY 1),
         |tot AS (SELECT count(*) AS ntot FROM pair)
         |SELECT p.w1, p.w2, p.n,
         |  CAST((greatest(4 * p.n - 3, 0) * ntot
         |   + 3 * n_cont_head * n_cont_tail) * 1000000
         |  // (4 * c_head * ntot) AS BIGINT) AS p_kn_ppm
         |FROM pair p
         |JOIN heads h ON p.w1 = h.w1
         |JOIN tails t ON p.w2 = t.w2
         |CROSS JOIN tot
         |WHERE p.n >= 5""".stripMargin,
    "text_lang_eval" ->
      s"""SELECT lang, ${TextOps.langIdSql("text")} AS lang_pred, count(*) AS n
         |FROM documents GROUP BY 1, 2""".stripMargin,
    "multimodal_dhash" ->
      // the stride-4 wraparound byte dHash replayed with ord/substr (payload =
      // UTF-8 text, ascii-only fixture), then brute-force all-pairs
      // Hamming — blocked ≡ brute for the ≤3 radius (simhash argument)
      """WITH d AS (
        |  SELECT doc_id AS id, text, length(text) AS n
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |h AS (SELECT id,
        |        CAST(list_sum(list_transform(range(60), i ->
        |          CASE WHEN ord(substr(text, CAST((i * 4) % n AS INT) + 1, 1))
        |                  > ord(substr(text, CAST(((i + 1) * 4) % n AS INT) + 1, 1))
        |               THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
        |               ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sh
        |      FROM d)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,
    "text_burrows" ->
      // ppm frequency grid over the top-30 words, exact-long variance
      // numerators, one sqrt+divide per (pair, word) term, identical
      // operand order; zero-variance words exit before the k count
      s"""WITH w AS (
         |  SELECT source, unnest($wordsSql) AS w
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT source, w, count(*) AS c FROM w GROUP BY 1, 2),
         |tt AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY 1),
         |top AS (SELECT w FROM (SELECT w, SUM(c) AS g FROM c GROUP BY 1)
         |        ORDER BY g DESC, w LIMIT 30),
         |f AS (SELECT tt.source, top.w,
         |        CAST(COALESCE(c.c, 0) * 1000000 // tt.t AS BIGINT) AS f
         |      FROM tt CROSS JOIN top
         |      LEFT JOIN c ON c.source = tt.source AND c.w = top.w),
         |st AS (SELECT w, count(*) AS n,
         |         CAST(count(*) * SUM(f * f) - SUM(f) * SUM(f) AS BIGINT) AS vn
         |       FROM f GROUP BY 1 HAVING count(*) * SUM(f * f) - SUM(f) * SUM(f) > 0),
         |p AS (SELECT a.source AS source_a, b.source AS source_b,
         |        CAST(floor(CAST(abs(a.f - b.f) * st.n * 1048576 AS DOUBLE)
         |          / sqrt(CAST(st.vn AS DOUBLE))) AS BIGINT) AS term
         |      FROM f a JOIN f b ON a.w = b.w AND a.source < b.source
         |      JOIN st ON st.w = a.w)
         |SELECT source_a, source_b, count(*) AS k_words,
         |  CAST(SUM(term) // count(*) AS BIGINT) AS delta_grid
         |FROM p GROUP BY 1, 2""".stripMargin,
    "text_simpson" ->
      // exact (doc, word) counts; one integer division per doc
      s"""WITH w AS (
         |  SELECT doc_id, unnest($wordsSql) AS w
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |        count(*) AS n_distinct,
         |        CAST(SUM(c * (c - 1)) AS BIGINT) AS rep
         |      FROM c GROUP BY 1)
         |SELECT doc_id, n_tokens, n_distinct,
         |  CAST(1000000 - (rep * 1000000) // (n_tokens * (n_tokens - 1))
         |    AS BIGINT) AS simpson_ppm
         |FROM a WHERE n_tokens >= 2""".stripMargin,
    "text_yule_k" ->
      // exact (source, word) counts; the 10^4*2^20-grid division with
      // HUGEINT sufficient statistics (the DECIMAL(38,0) twin)
      s"""WITH w AS (
         |  SELECT source, unnest($wordsSql) AS w
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT source, w, count(*) AS m FROM w GROUP BY 1, 2),
         |a AS (SELECT source, CAST(SUM(m) AS BIGINT) AS n_tokens,
         |        count(*) AS n_types, CAST(SUM(m * m) AS BIGINT) AS s2
         |      FROM c GROUP BY 1)
         |SELECT source, n_tokens, n_types, s2,
         |  CAST((CAST(10485760000 AS HUGEINT) * (s2 - n_tokens))
         |    // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
         |    AS yule_k_grid
         |FROM a WHERE n_tokens >= 2""".stripMargin,
    "vocab_good_turing" ->
      // corpus TRIGRAM counts -> freq-of-freq; N_{r+1} via explicit r+1
      // left join (absent frequencies read 0, not next-observed)
      s"""WITH t AS (
         |  SELECT doc_id, $wordsSql AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |w AS (SELECT unnest(list_transform(
         |        generate_series(1, len(ws) - 2),
         |        i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]))) AS w
         |      FROM t WHERE len(ws) >= 3),
         |wc AS (SELECT w, count(*) AS f FROM w GROUP BY 1),
         |ff AS (SELECT f AS r, count(*) AS n_r FROM wc
         |       WHERE f <= 11 GROUP BY 1)
         |SELECT a.r, a.n_r,
         |  CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r_next,
         |  CAST((a.r + 1) * COALESCE(b.n_r, 0) * 1048576 // a.n_r AS BIGINT)
         |    AS rstar_grid
         |FROM ff a LEFT JOIN ff b ON b.r = a.r + 1
         |WHERE a.r <= 10""".stripMargin,
    "text_novelty" ->
      // distinct word 3-grams per doc; a gram is novel to the doc holding
      // its global min doc_id
      s"""WITH t AS (
         |  SELECT doc_id, $wordsSql AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |        generate_series(1, len(ws) - 2),
         |        i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2])))) AS gr
         |      FROM t WHERE len(ws) >= 3),
         |pd AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
         |fo AS (SELECT gr, min(doc_id) AS doc_id FROM g GROUP BY 1),
         |nv AS (SELECT doc_id, count(*) AS n_novel FROM fo GROUP BY 1)
         |SELECT pd.doc_id, pd.n_grams,
         |  CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
         |  CAST(COALESCE(nv.n_novel, 0) * 1000000 // pd.n_grams AS BIGINT)
         |    AS novelty_ppm
         |FROM pd LEFT JOIN nv USING (doc_id)""".stripMargin,
    "text_mattr" ->
      // window distinct-sums via 1-based inclusive list slices; all
      // integer, one trunc division (nonnegative => floor)
      s"""WITH t AS (
         |  SELECT doc_id, $wordsSql AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |d AS (SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) > 0)
         |SELECT doc_id,
         |  CAST(n AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN n <= 50 THEN 1 ELSE n - 50 + 1 END AS BIGINT)
         |    AS n_windows,
         |  CAST(CASE WHEN n <= 50
         |    THEN len(list_distinct(ws)) * 1000000 // n
         |    ELSE list_sum(list_transform(generate_series(0, n - 50),
         |           i -> len(list_distinct(ws[i + 1 : i + 50])))) * 1000000
         |         // (50 * (n - 50 + 1)) END AS BIGINT) AS mattr_ppm
         |FROM d""".stripMargin,
    "text_heaps" ->
      // same dyadic checkpoints, same first-seen-below-t vocabulary
      // counts, same exact-grid OLS for beta
      s"""WITH d AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |dt AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS nt FROM d),
         |fw AS (SELECT u AS w, min(doc_id) AS fd
         |       FROM (SELECT doc_id, unnest(ws) AS u FROM d) GROUP BY 1),
         |mx AS (SELECT max(doc_id) AS m FROM dt),
         |ts AS (SELECT CAST(1 << CAST(r.range AS INTEGER) AS BIGINT) AS t
         |       FROM range(4, 21) r, mx
         |       WHERE (1 << CAST(r.range AS INTEGER)) <= mx.m),
         |n AS (SELECT ts.t, CAST(SUM(dt.nt) AS BIGINT) AS n_tokens
         |      FROM ts JOIN dt ON dt.doc_id < ts.t GROUP BY 1),
         |v AS (SELECT ts.t, count(*) AS v_words
         |      FROM ts JOIN fw ON fw.fd < ts.t GROUP BY 1),
         |pts AS (
         |  SELECT n.t, n.n_tokens, v.v_words,
         |    CAST(floor(ln(CAST(n.n_tokens AS DOUBLE)) * 1048576.0) AS BIGINT)
         |      AS ln_n_grid,
         |    CAST(floor(ln(CAST(v.v_words AS DOUBLE)) * 1048576.0) AS BIGINT)
         |      AS ln_v_grid
         |  FROM n JOIN v ON n.t = v.t
         |  WHERE n.n_tokens > 0 AND v.v_words > 0),
         |st AS (
         |  SELECT count(*) AS k, CAST(SUM(ln_n_grid) AS BIGINT) AS sx,
         |    CAST(SUM(ln_v_grid) AS BIGINT) AS sy,
         |    CAST(SUM(ln_n_grid * ln_v_grid) AS BIGINT) AS sxy,
         |    CAST(SUM(ln_n_grid * ln_n_grid) AS BIGINT) AS sxx
         |  FROM pts)
         |SELECT pts.t, pts.n_tokens, pts.v_words, pts.ln_n_grid, pts.ln_v_grid,
         |  CASE WHEN k * sxx - sx * sx != 0 THEN
         |    CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE)
         |  END AS beta
         |FROM pts CROSS JOIN st""".stripMargin,
    "pipeline_dpo" -> {
      val h = hashKeySql("chosen_id", "dpo")
      s"""WITH r AS (
         |  SELECT lang, doc_id, COALESCE(n_chars, 0) AS sc,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY COALESCE(n_chars, 0) DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM documents),
         |p AS (
         |  SELECT a.lang, a.doc_id AS chosen_id, b.doc_id AS rejected_id,
         |    a.sc - b.sc AS margin
         |  FROM r a JOIN r b
         |    ON a.lang = b.lang AND b.rn = a.n + 1 - a.rn AND a.rn * 2 < a.n + 1
         |  WHERE a.sc - b.sc >= 1),
         |dg AS (SELECT doc_id, md5(text) AS hh FROM documents),
         |ev AS (SELECT DISTINCT hh FROM dg WHERE doc_id % 97 = 0),
         |clean AS (
         |  SELECT p.lang, p.chosen_id, p.margin
         |  FROM p JOIN dg ON p.chosen_id = dg.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM ev WHERE ev.hh = dg.hh)),
         |s AS (
         |  SELECT lang, margin,
         |    CASE WHEN $h < '${Sampling.fractionThreshold(0.9)}' THEN 'train'
         |         ELSE 'val' END AS split
         |  FROM clean)
         |SELECT split, lang, count(*) AS n_pairs,
         |  CAST(SUM(margin) AS BIGINT) AS sum_margin
         |FROM s GROUP BY 1, 2""".stripMargin
    },
    "eval_bradley_terry" ->
      // the same two unrolled integer MM rounds, reciprocal terms as
      // exact long floor divisions
      """WITH d AS (
        |  SELECT doc_id, lang, COALESCE(n_chars, 0) AS s
        |  FROM documents WHERE lang IS NOT NULL),
        |c AS (
        |  SELECT
        |    CASE WHEN a.s > b.s OR (a.s = b.s AND a.lang < b.lang)
        |         THEN a.lang ELSE b.lang END AS winner,
        |    CASE WHEN a.s > b.s OR (a.s = b.s AND a.lang < b.lang)
        |         THEN b.lang ELSE a.lang END AS loser
        |  FROM d a JOIN d b
        |    ON b.doc_id = a.doc_id + 1 AND a.lang != b.lang),
        |pw AS (SELECT winner AS i, loser AS j, count(*) AS w
        |       FROM c GROUP BY 1, 2),
        |sym AS (SELECT i, j, CAST(SUM(w) AS BIGINT) AS wij FROM (
        |          SELECT i, j, w FROM pw
        |          UNION ALL SELECT j, i, 0 FROM pw) GROUP BY 1, 2),
        |m AS (SELECT x.i, x.j, x.wij + y.wij AS n
        |      FROM sym x JOIN sym y ON x.i = y.j AND x.j = y.i),
        |wi AS (SELECT i, CAST(SUM(wij) AS BIGINT) AS w FROM sym GROUP BY 1),
        |nc AS (SELECT i, CAST(SUM(n) AS BIGINT) AS n_contests FROM m GROUP BY 1),
        |r0 AS (SELECT i AS lang, CAST(1000000 AS BIGINT) AS r FROM wi),
        |t1 AS (SELECT m.i,
        |         CAST(SUM((m.n * 1000000000000) // greatest(ra.r + rb.r, 1)) AS BIGINT)
        |           AS den
        |       FROM m JOIN r0 ra ON m.i = ra.lang
        |       JOIN r0 rb ON m.j = rb.lang GROUP BY 1),
        |r1 AS (SELECT wi.i AS lang,
        |         CAST((wi.w * 1000000000000) // t1.den AS BIGINT) AS r
        |       FROM wi JOIN t1 ON wi.i = t1.i),
        |t2 AS (SELECT m.i,
        |         CAST(SUM((m.n * 1000000000000) // greatest(ra.r + rb.r, 1)) AS BIGINT)
        |           AS den
        |       FROM m JOIN r1 ra ON m.i = ra.lang
        |       JOIN r1 rb ON m.j = rb.lang GROUP BY 1),
        |r2 AS (SELECT wi.i AS lang,
        |         CAST((wi.w * 1000000000000) // t2.den AS BIGINT) AS r
        |       FROM wi JOIN t2 ON wi.i = t2.i)
        |SELECT r2.lang, nc.n_contests, wi.w AS n_wins, r2.r AS rating_ppm
        |FROM r2 JOIN wi ON r2.lang = wi.i JOIN nc ON r2.lang = nc.i"""
        .stripMargin,
    "eval_pass_at_k" -> {
      // falling factorials in HUGEINT (exact), one trunc-division per k
      // (both sides nonnegative, so trunc ≡ floor ≡ the engine's exact
      // reduced-multiple division)
      def term(k: Int) =
        s"""CASE WHEN n >= $k THEN CAST(1000000 -
           |    (1000000 * list_reduce(list_transform(range($k),
           |       i -> CAST(greatest(n - c - i, 0) AS HUGEINT)), (x, y) -> x * y))
           |    // list_reduce(list_transform(range($k),
           |       i -> CAST(n - i AS HUGEINT)), (x, y) -> x * y)
           |  AS BIGINT) END AS pass${k}_ppm""".stripMargin
      s"""WITH s AS (
         |  SELECT doc_id % 10 AS task,
         |    CAST(COALESCE(n_chars, 0) >= 200 AS INTEGER) AS ok
         |  FROM documents),
         |a AS (SELECT task, count(*) AS n, CAST(SUM(ok) AS BIGINT) AS c
         |      FROM s GROUP BY 1)
         |SELECT task, n AS n_attempts, c AS n_correct,
         |  ${term(1)},
         |  ${term(3)},
         |  ${term(5)}
         |FROM a""".stripMargin
    },
    "eval_mcnemar" ->
      // same discordant cells, same continuity-corrected integer grid
      s"""WITH s AS (
         |  SELECT CAST(${TextOps.langIdSql("text")} = lang AS INTEGER) AS a,
         |    CAST(lang = 'en' AS INTEGER) AS b
         |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
         |t AS (
         |  SELECT count(*) AS n_items,
         |    CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS b_discordant,
         |    CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c_discordant
         |  FROM s)
         |SELECT n_items, b_discordant, c_discordant,
         |  CASE WHEN b_discordant + c_discordant > 0 THEN
         |    CAST(greatest(abs(b_discordant - c_discordant) - 1, 0)
         |         * greatest(abs(b_discordant - c_discordant) - 1, 0)
         |         * 1000000 // (b_discordant + c_discordant) AS BIGINT)
         |  END AS mcnemar_grid
         |FROM t""".stripMargin,
    "text_ttr" ->
      s"""WITH s AS (SELECT doc_id, $wordsSql AS ws FROM documents)
         |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_types,
         |  CASE WHEN len(ws) = 0 THEN 0.0
         |       ELSE CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) END AS ttr
         |FROM s""".stripMargin,
    "text_collocations" ->
      // same bigram staging, same fixed-order PMI ratio, same 1e-6 log
      // grid; (pmi DESC, w1, w2) is fully tie-broken at the cut
      s"""WITH staged AS (SELECT $wordsSql AS ws FROM documents),
         |bgs AS (
         |  SELECT ws[i + 1] AS w1, ws[i + 2] AS w2
         |  FROM (SELECT ws, unnest(generate_series(0, len(ws) - 2)) AS i
         |        FROM staged WHERE len(ws) >= 2)),
         |pair AS (SELECT w1, w2, count(*) AS c12 FROM bgs GROUP BY 1, 2),
         |uni AS (
         |  SELECT w, count(*) AS u
         |  FROM (SELECT unnest(ws) AS w FROM staged) GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT CAST(sum(c12) AS BIGINT) FROM pair) AS npairs,
         |    (SELECT CAST(sum(u) AS BIGINT) FROM uni) AS ntok)
         |SELECT w1, w2, c12,
         |  CAST(floor(ln(
         |    ((CAST(c12 AS DOUBLE) * ntok) * ntok)
         |    / ((CAST(npairs AS DOUBLE) * u1.u) * u2.u)) * 1000000.0) AS BIGINT) AS pmi_q
         |FROM pair
         |JOIN uni u1 ON pair.w1 = u1.w
         |JOIN uni u2 ON pair.w2 = u2.w
         |CROSS JOIN tot
         |WHERE c12 >= 5
         |ORDER BY pmi_q DESC, w1, w2 LIMIT 20""".stripMargin,
    "embedding_label_purity" ->
      // same centroids; per-vector argmax by (cos DESC, label) and the
      // per-label accuracy tally
      """WITH g AS (
        |  SELECT label, list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS gv
        |  FROM embeddings),
        |c AS (
        |  SELECT label, pos, CAST(sum(v) AS DOUBLE) AS s
        |  FROM (SELECT label, unnest(gv) AS v, generate_subscripts(gv, 1) AS pos FROM g)
        |  GROUP BY label, pos),
        |cv AS (SELECT label AS cl, list(s ORDER BY pos) AS cvec FROM c GROUP BY label),
        |sc AS (
        |  SELECT e.vec_id, e.label, cv.cl,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), cv.cvec) /
        |    (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(cv.cvec, cv.cvec))) AS cos
        |  FROM embeddings e CROSS JOIN cv),
        |top AS (
        |  SELECT vec_id, label, cl FROM (
        |    SELECT vec_id, label, cl,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl) AS rn
        |    FROM sc)
        |  WHERE rn = 1)
        |SELECT label, count(*) AS n,
        |  CAST(SUM(CASE WHEN cl = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |FROM top GROUP BY label""".stripMargin,
    "embedding_label_sim" ->
      // per-label grid centroids (exact sums, list-ordered by pos), then
      // the same sequential-fold cosine over the raw grid vectors
      """WITH g AS (
        |  SELECT label, list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS gv
        |  FROM embeddings),
        |c AS (
        |  SELECT label, pos, CAST(sum(v) AS DOUBLE) AS s
        |  FROM (SELECT label, unnest(gv) AS v, generate_subscripts(gv, 1) AS pos FROM g)
        |  GROUP BY label, pos),
        |cv AS (SELECT label, list(s ORDER BY pos) AS cvec FROM c GROUP BY label)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  list_dot_product(a.cvec, b.cvec) /
        |  (sqrt(list_dot_product(a.cvec, a.cvec)) * sqrt(list_dot_product(b.cvec, b.cvec)))
        |    AS cos
        |FROM cv a JOIN cv b ON a.label < b.label""".stripMargin,
    "embedding_diversity" ->
      // ‖Σg‖² and Σ‖g‖² as exact HUGEINTs over the same grid; the 2^40
      // grid² factor divides out once in double
      """WITH g AS (
        |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS gv
        |  FROM embeddings),
        |c AS (
        |  SELECT pos, CAST(sum(v) AS HUGEINT) AS s
        |  FROM (SELECT unnest(gv) AS v, generate_subscripts(gv, 1) AS pos FROM g)
        |  GROUP BY pos),
        |s2 AS (SELECT CAST(COALESCE(sum(s * s), 0) AS HUGEINT) AS s2 FROM c),
        |q AS (
        |  SELECT CAST(COALESCE(sum(CAST(v AS HUGEINT) * v), 0) AS HUGEINT) AS q
        |  FROM (SELECT unnest(gv) AS v FROM g)),
        |n AS (SELECT count(*) AS n_vectors FROM embeddings)
        |SELECT n.n_vectors,
        |  CASE WHEN n.n_vectors > 1
        |    THEN CAST(s2.s2 - q.q AS DOUBLE)
        |         / (CAST(n.n_vectors * (n.n_vectors - 1) AS DOUBLE) * 1099511627776.0)
        |    ELSE NULL END AS mean_pair_dot
        |FROM n CROSS JOIN s2 CROSS JOIN q""".stripMargin,
    "knn_mutual" ->
      """WITH s AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])))) AS cos
        |  FROM embeddings q, embeddings n
        |  WHERE q.vec_id < 64 AND n.vec_id < 64 AND n.vec_id != q.vec_id),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |    FROM s)
        |  WHERE rank <= 5)
        |SELECT x.q_id AS id_a, x.n_id AS id_b
        |FROM topk x JOIN topk y ON x.q_id = y.n_id AND x.n_id = y.q_id
        |WHERE x.q_id < x.n_id""".stripMargin,
    "vocab_coverage" ->
      s"""WITH w AS (SELECT unnest($wordsSql) AS word FROM documents),
         |v AS (SELECT word, count(*) AS wfreq FROM w GROUP BY word),
         |r AS (
         |  SELECT wfreq,
         |    row_number() OVER (ORDER BY wfreq DESC, word) AS rn
         |  FROM v)
         |SELECT count(*) AS n_vocab,
         |  CAST(sum(wfreq) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(sum(CASE WHEN rn <= 100 THEN wfreq ELSE 0 END), 0) AS BIGINT)
         |    * 1000000 // CAST(sum(wfreq) AS BIGINT) AS cov100_ppm,
         |  CAST(COALESCE(sum(CASE WHEN rn <= 1000 THEN wfreq ELSE 0 END), 0) AS BIGINT)
         |    * 1000000 // CAST(sum(wfreq) AS BIGINT) AS cov1k_ppm,
         |  CAST(COALESCE(sum(CASE WHEN rn <= 10000 THEN wfreq ELSE 0 END), 0) AS BIGINT)
         |    * 1000000 // CAST(sum(wfreq) AS BIGINT) AS cov10k_ppm
         |FROM r""".stripMargin,
    "text_entropy" ->
      // same 4-class histogram, same 1e-6 log grid, same fixed-order
      // weighted sum; n = 0 scores 0, NULL text propagates NULL
      """WITH cs AS (
        |  SELECT doc_id, length(text) AS n,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS letters,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits,
        |    length(text) - length(regexp_replace(text, '\s', '', 'g')) AS spaces
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, n, letters, digits, spaces,
        |    n - letters - digits - spaces AS other
        |  FROM cs)
        |SELECT doc_id, n AS n_chars,
        |  CASE WHEN n = 0 THEN 0.0 ELSE round(
        |    -(CAST(
        |        (CASE WHEN letters > 0 THEN letters * CAST(floor(ln(CAST(letters AS DOUBLE) / n) * 1000000.0) AS BIGINT) ELSE 0 END)
        |      + (CASE WHEN digits > 0 THEN digits * CAST(floor(ln(CAST(digits AS DOUBLE) / n) * 1000000.0) AS BIGINT) ELSE 0 END)
        |      + (CASE WHEN spaces > 0 THEN spaces * CAST(floor(ln(CAST(spaces AS DOUBLE) / n) * 1000000.0) AS BIGINT) ELSE 0 END)
        |      + (CASE WHEN other > 0 THEN other * CAST(floor(ln(CAST(other AS DOUBLE) / n) * 1000000.0) AS BIGINT) ELSE 0 END)
        |      AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * 1000000.0), 4) END AS entropy
        |FROM t""".stripMargin,
    // md5-token rolling hash replayed value-for-value: per-token value =
    // first 8 md5 hex chars as an integer (nibble-weighted sum) mod p,
    // folded through the same ·31 polynomial (list_reduce with no init ≡
    // fold from 0, since 0·31 + t₁ = t₁); empty/null token lists fold to 0
    "text_rolling" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents),
         |vals AS (
         |  SELECT doc_id,
         |    list_transform(ws, w -> list_sum(list_transform(range(8),
         |      k -> CAST(strpos('0123456789abcdef', substr(md5(w), CAST(k + 1 AS INT), 1)) - 1 AS BIGINT)
         |           * ([268435456, 16777216, 1048576, 65536, 4096, 256, 16, 1][CAST(k + 1 AS INT)])))
         |      % 1000000007) AS vs
         |  FROM toks)
         |SELECT doc_id,
         |  CAST(CASE WHEN vs IS NULL THEN NULL
         |       WHEN len(vs) = 0 THEN 0
         |       ELSE list_reduce(vs, (a, b) -> (a * 31 + b) % 1000000007)
         |  END AS BIGINT) AS rolling
         |FROM vals""".stripMargin,
    "dedup_ngram" ->
      // exact char-5-gram Jaccard within the source blocking — the engine
      // hashes shingles to longs (collision odds ~|sh|²/2⁶⁴, vacuous at
      // verify scale), so string-set Jaccard replays it exactly
      s"""WITH s AS (
         |  SELECT source, doc_id,
         |    list_distinct(list_transform(
         |      generate_series(0, greatest(length(n) - 5, 0)),
         |      i -> substr(n, i + 1, 5))) AS sh
         |  FROM (SELECT source, doc_id, $normSql AS n FROM documents))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
         |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.30""".stripMargin,
    "sample_split_nodup" -> {
      // brute-force exact-Jaccard pairs (same recall argument as
      // dedup_minhash) → recursive-CTE components (same as
      // dedup_components) → md5 hash split on the cluster label
      val h = hashKeySql("COALESCE(l.cluster, d.doc_id)", "split")
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(0, len(ws) - 3),
         |                i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
         |    END AS s
         |  FROM toks),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src)
         |SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster_label,
         |  CASE WHEN $h < '${Sampling.fractionThreshold(0.8)}' THEN 'train'
         |       WHEN $h < '${Sampling.fractionThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents d LEFT JOIN lab l ON d.doc_id = l.id""".stripMargin
    },
    "dedup_spans" ->
      // positioned grams → distinct-doc frequency >= 2 → half-open token
      // intervals → the orders_coverage islands construction per doc
      s"""WITH w AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |g AS (
         |  SELECT doc_id, pos, ws[pos + 1] || ' ' || ws[pos + 2] || ' ' || ws[pos + 3] AS gram
         |  FROM (SELECT doc_id, ws, unnest(range(len(ws) - 2)) AS pos
         |        FROM w WHERE len(ws) >= 3)),
         |dfq AS (SELECT gram, count(DISTINCT doc_id) AS c FROM g GROUP BY gram),
         |dup AS (
         |  SELECT g.doc_id, CAST(g.pos AS INTEGER) AS s, CAST(g.pos + 3 AS INTEGER) AS e
         |  FROM g JOIN dfq USING (gram) WHERE c >= 2),
         |m AS (
         |  SELECT doc_id, s, e,
         |    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM dup),
         |i AS (
         |  SELECT doc_id, s, e,
         |    SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
         |  FROM m)
         |SELECT doc_id, min(s) AS span_start, max(e) AS span_end, count(*) AS n_intervals
         |FROM i GROUP BY doc_id, island""".stripMargin,
    "pipeline_dedup_cascade" ->
      // the whole three-stage funnel replayed: exact digest groups →
      // brute-force Jaccard pairs + recursive components on stage-1
      // survivors → the bit-for-bit md5 SimHash twin + components on
      // stage-2 survivors; counts stacked exactly like the engine
      s"""WITH RECURSIVE d0 AS (
         |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         |k1 AS (SELECT MIN(doc_id) AS doc_id FROM d0 GROUP BY md5(text)),
         |s1 AS (SELECT d0.doc_id, d0.text FROM d0 JOIN k1 USING (doc_id)),
         |w AS (SELECT doc_id, $wordsSql AS ws FROM s1),
         |toks AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(0, len(ws) - 3),
         |    i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])) AS ts
         |  FROM w WHERE len(ws) >= 3),
         |nz AS (SELECT doc_id, ts, len(ts) AS s FROM toks WHERE len(ts) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
         |        (a.s + b.s - len(list_intersect(a.ts, b.ts))) >= 0.8),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src),
         |los2 AS (SELECT id FROM lab WHERE id != cluster),
         |s2 AS (SELECT s1.doc_id, s1.text FROM s1
         |       LEFT JOIN los2 ON s1.doc_id = los2.id WHERE los2.id IS NULL),
         |hs AS (SELECT doc_id, list_transform($wordsSql,
         |         w2 -> md5(w2)) AS hl FROM s2),
         |sh AS (
         |  SELECT doc_id,
         |    list_sum(list_transform(range(60), j ->
         |      CASE WHEN 2 * len(list_filter(hl, h ->
         |          ((strpos('0123456789abcdef',
         |              substring(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
         |            >> CAST(j % 4 AS INT)) & 1 = 1)) > len(hl)
         |      THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
         |      ELSE CAST(0 AS BIGINT) END)) AS sh
         |  FROM hs),
         |p3 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |       WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |e3 AS (SELECT id_a AS src, id_b AS dst FROM p3
         |       UNION ALL SELECT id_b, id_a FROM p3),
         |r3 AS (
         |  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM e3)
         |  UNION
         |  SELECT r.src, e.dst FROM r3 r JOIN e3 e ON r.dst = e.src),
         |l3 AS (SELECT src AS id, MIN(dst) AS cluster FROM r3 GROUP BY src),
         |los3 AS (SELECT id FROM l3 WHERE id != cluster),
         |s3 AS (SELECT s2.doc_id FROM s2
         |       LEFT JOIN los3 ON s2.doc_id = los3.id WHERE los3.id IS NULL),
         |c AS (SELECT (SELECT count(*) FROM d0) AS n0,
         |             (SELECT count(*) FROM s1) AS n1,
         |             (SELECT count(*) FROM s2) AS n2,
         |             (SELECT count(*) FROM s3) AS n3)
         |SELECT 'stage1_exact' AS stage, CAST(n0 AS BIGINT) AS docs_in,
         |  CAST(n1 AS BIGINT) AS docs_out, CAST(n0 - n1 AS BIGINT) AS removed
         |FROM c
         |UNION ALL
         |SELECT 'stage2_prefix_jaccard', CAST(n1 AS BIGINT),
         |  CAST(n2 AS BIGINT), CAST(n1 - n2 AS BIGINT) FROM c
         |UNION ALL
         |SELECT 'stage3_simhash', CAST(n2 AS BIGINT), CAST(n3 AS BIGINT),
         |  CAST(n2 - n3 AS BIGINT) FROM c""".stripMargin,
    "pipeline_exact_dedup" ->
      // brute-force exact pairs → recursive-CTE components (min-id
      // labels) → anti-join of the losers: the whole chain replayed
      s"""WITH RECURSIVE w AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |toks AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(0, len(ws) - 3),
         |    i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])) AS ts
         |  FROM w WHERE len(ws) >= 3),
         |nz AS (SELECT doc_id, ts, len(ts) AS s FROM toks WHERE len(ts) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
         |        (a.s + b.s - len(list_intersect(a.ts, b.ts))) >= 0.8),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src),
         |losers AS (SELECT id FROM lab WHERE id != cluster)
         |SELECT d.doc_id, d.source
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin,
    "dedup_winnowing" ->
      // same grams (0-based pos), same 60-bit md5 hash, same window min
      // with the leftmost-of-equal-hashes struct tie, same partial-window
      // drop, df cap, and pair rollup
      s"""WITH staged AS (SELECT doc_id, $wordsSql AS ws FROM documents
         |                WHERE text IS NOT NULL),
         |g AS (
         |  SELECT doc_id, i AS pos,
         |    CAST(('0x' || substr(md5(ws[i + 1] || ' ' || ws[i + 2] || ' '
         |                             || ws[i + 3]), 1, 15)) AS BIGINT) AS h
         |  FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 3)) AS i
         |        FROM staged WHERE len(ws) >= 3)),
         |sel AS (
         |  SELECT doc_id,
         |    min(ROW(h, pos)) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         |    pos,
         |    count(*) OVER (PARTITION BY doc_id) AS n
         |  FROM g),
         |fps AS (
         |  SELECT DISTINCT doc_id, m[1] AS h
         |  FROM sel WHERE pos <= n - 4),
         |rare AS (SELECT h FROM fps GROUP BY h HAVING count(*) <= 10)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |FROM fps a JOIN rare USING (h) JOIN fps b USING (h)
         |WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 2""".stripMargin,
    "dedup_prefix_join" ->
      // BRUTE-FORCE all-pairs word-3-gram Jaccard: the engine's prefix
      // filtering is provably lossless, so equality with this oracle is
      // the proof executed at gate scale (docs shorter than 3 tokens have
      // no shingle set and exit on both sides)
      s"""WITH w AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |toks AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(0, len(ws) - 3),
         |    i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])) AS ts
         |  FROM w WHERE len(ws) >= 3),
         |nz AS (SELECT doc_id, ts, len(ts) AS s FROM toks WHERE len(ts) > 0)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.ts, b.ts)) AS INTEGER) AS inter,
         |  CAST(a.s AS INTEGER) AS size_a, CAST(b.s AS INTEGER) AS size_b,
         |  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
         |    (a.s + b.s - len(list_intersect(a.ts, b.ts))) AS jaccard
         |FROM nz a JOIN nz b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
         |      (a.s + b.s - len(list_intersect(a.ts, b.ts))) >= 0.8""".stripMargin,
    "dedup_containment" ->
      // same hashed-shingle argument as dedup_ngram; only the denominator
      // changes: containment divides by the SMALLER set
      s"""WITH s AS (
         |  SELECT source, doc_id,
         |    list_distinct(list_transform(
         |      generate_series(0, greatest(length(n) - 5, 0)),
         |      i -> substr(n, i + 1, 5))) AS sh
         |  FROM (SELECT source, doc_id, $normSql AS n FROM documents))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        least(len(a.sh), len(b.sh)), 4) AS containment
         |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      least(len(a.sh), len(b.sh)) >= 0.60""".stripMargin,
    "dedup_threshold_sweep" ->
      // the dedup_embedding pair replay, banded on the rounded cosine
      s"""WITH h AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm,
         |    ${bucketSql("CAST(embedding AS DOUBLE[])", 4)} AS bucket
         |  FROM embeddings),
         |p AS (
         |  SELECT round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos
         |  FROM h a JOIN h b ON a.bucket = b.bucket AND a.id < b.id
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.30)
         |SELECT CAST(floor(cos * 20) AS BIGINT) AS band, count(*) AS n_pairs
         |FROM p GROUP BY 1""".stripMargin,
    "multimodal_bins" ->
      """WITH m AS (
        |  SELECT source, doc_id AS media_id, octet_length(encode(text)) AS n_bytes
        |  FROM documents)
        |SELECT source, media_id, n_bytes,
        |  CAST(COALESCE(sum(n_bytes) OVER (PARTITION BY source ORDER BY media_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1048576
        |    AS BIGINT) AS bin
        |FROM m""".stripMargin,
    "dedup_embedding" ->
      s"""WITH h AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm,
         |    ${bucketSql("CAST(embedding AS DOUBLE[])", 4)} AS bucket
         |  FROM embeddings)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos
         |FROM h a JOIN h b ON a.bucket = b.bucket AND a.id < b.id
         |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.30""".stripMargin,
    "dedup_components" ->
      // the engine's iterative min-label propagation vs. the algebraic
      // ground truth: transitive closure (recursive CTE) + min reachable id
      s"""WITH RECURSIVE h AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm,
         |    ${bucketSql("CAST(embedding AS DOUBLE[])", 4)} AS bucket
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM h a JOIN h b ON a.bucket = b.bucket AND a.id < b.id
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.30),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
         |SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src""".stripMargin,
    "dedup_semantic" ->
      // the dedup_components pair+closure replay, then election by
      // (norm DESC NULLS LAST, id ASC) — norms fold bit-identically
      s"""WITH RECURSIVE h AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm,
         |    ${bucketSql("CAST(embedding AS DOUBLE[])", 4)} AS bucket
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM h a JOIN h b ON a.bucket = b.bucket AND a.id < b.id
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.30),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |m AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src),
         |j AS (SELECT m.cluster, m.id, h.nrm AS q FROM m JOIN h ON m.id = h.id)
         |SELECT cluster, id AS rep_id, q AS rep_quality, n_members FROM (
         |  SELECT cluster, id, q,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY q DESC NULLS LAST, id) AS rn,
         |    count(*) OVER (PARTITION BY cluster) AS n_members
         |  FROM j)
         |WHERE rn = 1""".stripMargin,
    "dedup_canonical" ->
      // dedup_minhash's brute-force exact-Jaccard pair replay →
      // dedup_components' transitive closure → the (n_chars DESC,
      // doc_id ASC) election window
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents WHERE text IS NOT NULL),
         |s AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(0, len(ws) - 3),
         |                i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
         |    END AS sh
         |  FROM toks),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM p
         |  UNION ALL SELECT id_b, id_a FROM p),
         |reach AS (
         |  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lab AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src),
         |m AS (
         |  SELECT l.cluster, l.id, d.n_chars,
         |    row_number() OVER (PARTITION BY l.cluster
         |                       ORDER BY d.n_chars DESC NULLS LAST, l.id ASC) AS rn,
         |    count(*) OVER (PARTITION BY l.cluster) AS n_members
         |  FROM lab l JOIN documents d ON l.id = d.doc_id)
         |SELECT cluster, id AS rep_id, n_chars AS rep_quality,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM m WHERE rn = 1""".stripMargin,
    "embedding_project" ->
      // the sign matrix replays from md5 over the coordinate pair alone:
      // first hex nibble < 8 → +1 — no seed, no stored matrix
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qv
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(0, 15)) AS dim)
        |SELECT e.vec_id, CAST(d.dim AS INTEGER) AS dim,
        |  CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |    i -> (CASE WHEN substr(md5(CAST(d.dim AS VARCHAR) || ':' ||
        |                            CAST(i - 1 AS VARCHAR)), 1, 1) < '8'
        |               THEN 1 ELSE -1 END) * qv[i])) AS BIGINT) AS value
        |FROM e CROSS JOIN dims d""".stripMargin,
    "embedding_quantize" ->
      """WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |t AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM s),
        |u AS (SELECT vec_id, CASE WHEN mx = 0 THEN 1.0 ELSE 127.0 / mx END AS scale, v FROM t),
        |q AS (SELECT vec_id, scale,
        |        list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INTEGER)) AS q
        |      FROM u)
        |SELECT vec_id, scale, q[1] AS q_first, q[-1] AS q_last,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1
        |FROM q""".stripMargin,
    "knn_int8" -> knnInt8OracleSql,
    "knn_sharded" -> knnInt8OracleSql,
    "text_repetition" ->
      s"""WITH staged AS (
         |  SELECT doc_id, coalesce($wordsSql, CAST([] AS VARCHAR[])) AS ws
         |  FROM documents),
         |base AS (
         |  SELECT doc_id, len(ws) AS n_tokens,
         |    CASE WHEN len(ws) = 0 THEN 0.0
         |         ELSE CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
         |    END AS dup_word_frac,
         |    CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(generate_series(0, len(ws) - 2),
         |                             i -> ws[i + 1] || ' ' || ws[i + 2])
         |    END AS bgs
         |  FROM staged),
         |counted AS (
         |  SELECT doc_id, bg, COUNT(*) AS cnt
         |  FROM (SELECT doc_id, unnest(bgs) AS bg FROM base)
         |  GROUP BY doc_id, bg),
         |top AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM counted GROUP BY doc_id)
         |SELECT b.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, dup_word_frac,
         |  CASE WHEN len(bgs) = 0 THEN 0.0
         |       ELSE CAST(COALESCE(top_cnt, 0) AS DOUBLE) / len(bgs)
         |  END AS top_bigram_frac
         |FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id""".stripMargin,
    "tfidf_topterms" ->
      s"""WITH toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term,
         |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         |SELECT doc_id, term, score, rank FROM (
         |  SELECT doc_id, term, score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, term) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    "text_perplexity" ->
      s"""WITH staged AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |bgs AS (
         |  SELECT doc_id, ws[i + 1] AS w1, ws[i + 2] AS w2
         |  FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 2)) AS i
         |        FROM staged WHERE len(ws) >= 2)),
         |hist AS (SELECT w1, count(*) AS c1 FROM bgs GROUP BY w1),
         |pair AS (SELECT w1, w2, count(*) AS c12 FROM bgs GROUP BY w1, w2),
         |vocab AS (
         |  SELECT count(DISTINCT w) AS v
         |  FROM (SELECT unnest(ws) AS w FROM staged)),
         |contrib AS (
         |  SELECT doc_id,
         |    CAST(floor(ln(CAST(c12 + 1 AS DOUBLE) / (c1 + v)) * 1000000.0) AS BIGINT) AS lp_q
         |  FROM bgs JOIN pair USING (w1, w2) JOIN hist USING (w1) CROSS JOIN vocab)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(sum(lp_q) / (count(*) * 1000000.0), 4) AS logp_avg
         |FROM contrib GROUP BY doc_id""".stripMargin,
    "bm25_rank" -> Ranking.bm25Sql("text", "doc_id", bm25Terms),
    "text_rake" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents),
         |pos AS (
         |  SELECT doc_id, t.p, ws[t.p] AS w,
         |    (ws[t.p] IN ('the','of','and','to','in','a','is','that','it','was')) AS st
         |  FROM toks, unnest(generate_series(1, len(ws))) AS t(p)),
         |runs AS (
         |  SELECT doc_id, p, w,
         |    SUM(CASE WHEN st THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS run, st
         |  FROM pos),
         |words AS (SELECT doc_id, run, p, w FROM runs WHERE NOT st),
         |phrases AS (
         |  SELECT doc_id, run, string_agg(w, ' ' ORDER BY p) AS phrase,
         |    count(*) AS plen
         |  FROM words GROUP BY doc_id, run),
         |occ AS (
         |  SELECT wd.doc_id, wd.run, wd.w, ph.plen
         |  FROM words wd JOIN phrases ph ON wd.doc_id = ph.doc_id AND wd.run = ph.run),
         |stats AS (
         |  SELECT doc_id, w, (1000000 * CAST(SUM(plen) AS BIGINT)) // count(*) AS wsc
         |  FROM occ GROUP BY doc_id, w),
         |pscore AS (
         |  SELECT o.doc_id, o.run, CAST(SUM(s.wsc) AS BIGINT) AS score
         |  FROM occ o JOIN stats s ON o.doc_id = s.doc_id AND o.w = s.w
         |  GROUP BY o.doc_id, o.run),
         |cand AS (
         |  SELECT DISTINCT p.doc_id, ph.phrase, p.score
         |  FROM pscore p JOIN phrases ph ON p.doc_id = ph.doc_id AND p.run = ph.run)
         |SELECT doc_id, phrase, score, rank FROM (
         |  SELECT doc_id, phrase, score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, phrase) AS INTEGER) AS rank
         |  FROM cand)
         |WHERE rank <= 3""".stripMargin,
    "eval_conformal" ->
      """WITH cal AS (
        |  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS s
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |tst AS (
        |  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS s
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |r AS (SELECT s, CAST(row_number() OVER (ORDER BY s) AS BIGINT) AS rk FROM cal),
        |n AS (SELECT count(*) AS nc FROM cal),
        |th AS (
        |  SELECT a.an, a.ad, n.nc,
        |    ((n.nc + 1) * (a.ad - a.an) + a.ad - 1) // a.ad AS k
        |  FROM (VALUES (1, 10), (1, 20)) AS a(an, ad), n)
        |SELECT th.an AS alpha_num, th.ad AS alpha_den, th.nc AS n_cal,
        |  th.k AS k_rank, r.s AS threshold,
        |  (SELECT count(*) FROM tst) AS n_test,
        |  (SELECT count(*) FROM tst WHERE tst.s <= r.s) AS n_covered
        |FROM th JOIN r ON r.rk = least(th.k, th.nc)""".stripMargin,
    "eval_isotonic" ->
      """WITH RECURSIVE pools AS (
        |  SELECT s, n, p, CAST(row_number() OVER (ORDER BY s) AS BIGINT) AS rn FROM (
        |    SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 20) AS BIGINT) AS s,
        |      count(*) AS n,
        |      CAST(SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS BIGINT) AS p
        |    FROM embeddings GROUP BY 1)),
        |tot AS (SELECT max(rn) AS m FROM pools),
        |pav AS (
        |  SELECT CAST(0 AS BIGINT) AS i,
        |         CAST([] AS BIGINT[]) AS los, CAST([] AS BIGINT[]) AS his,
        |         CAST([] AS BIGINT[]) AS ns, CAST([] AS BIGINT[]) AS ps
        |  UNION ALL
        |  SELECT CASE WHEN g.viol THEN g.i ELSE g.i + 1 END,
        |    CASE WHEN g.viol THEN g.los[1:len(g.los)-1]
        |         ELSE list_append(g.los, np.s) END,
        |    CASE WHEN g.viol THEN list_append(g.his[1:len(g.his)-2], g.his[len(g.his)])
        |         ELSE list_append(g.his, np.s) END,
        |    CASE WHEN g.viol THEN
        |           list_append(g.ns[1:len(g.ns)-2], g.ns[len(g.ns)-1] + g.ns[len(g.ns)])
        |         ELSE list_append(g.ns, np.n) END,
        |    CASE WHEN g.viol THEN
        |           list_append(g.ps[1:len(g.ps)-2], g.ps[len(g.ps)-1] + g.ps[len(g.ps)])
        |         ELSE list_append(g.ps, np.p) END
        |  FROM (SELECT pav.*,
        |          (len(los) >= 2 AND
        |           ps[len(ps)-1] * ns[len(ns)] >= ps[len(ps)] * ns[len(ns)-1]) AS viol
        |        FROM pav) g
        |  CROSS JOIN tot
        |  LEFT JOIN pools np ON np.rn = g.i + 1
        |  WHERE g.viol OR g.i < tot.m),
        |fin AS (
        |  SELECT * FROM (
        |    SELECT g.*,
        |      (len(los) >= 2 AND
        |       ps[len(ps)-1] * ns[len(ns)] >= ps[len(ps)] * ns[len(ns)-1]) AS viol2
        |    FROM pav g CROSS JOIN tot WHERE g.i = tot.m)
        |  WHERE NOT viol2)
        |SELECT los[t.j] AS score_lo, his[t.j] AS score_hi,
        |  ns[t.j] AS n, ps[t.j] AS pos
        |FROM fin, unnest(generate_series(1, len(los))) AS t(j)""".stripMargin,
    "eval_mrl" ->
      s"""WITH $int8CodesCtesSql,
         |s16 AS (
         |  SELECT vec_id, CAST(embedding[1:16] AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding[1:16] AS DOUBLE[]),
         |                          CAST(embedding[1:16] AS DOUBLE[]))) AS n
         |  FROM embeddings),
         |unitized16 AS (
         |  SELECT vec_id, CASE WHEN n = 0 THEN v ELSE list_transform(v, x -> x / n) END AS u
         |  FROM s16),
         |qz16 AS (
         |  SELECT vec_id,
         |    list_transform(u, x -> CAST(floor(x *
         |      (CASE WHEN list_max(list_transform(u, y -> abs(y))) = 0 THEN 1.0
         |            ELSE 127.0 / list_max(list_transform(u, y -> abs(y))) END) + 0.5)
         |      AS INTEGER)) AS q
         |  FROM unitized16),
         |fullr AS (SELECT q_id, n_id FROM (
         |  SELECT qr.vec_id AS q_id, c.vec_id AS n_id,
         |    row_number() OVER (PARTITION BY qr.vec_id ORDER BY
         |      CAST(list_dot_product(CAST(qr.q AS DOUBLE[]), CAST(c.q AS DOUBLE[])) AS BIGINT)
         |        DESC, c.vec_id) AS rk
         |  FROM qz c JOIN qz qr ON qr.vec_id < 8 AND c.vec_id != qr.vec_id) WHERE rk <= 10),
         |prefr AS (SELECT q_id, n_id FROM (
         |  SELECT qr.vec_id AS q_id, c.vec_id AS n_id,
         |    row_number() OVER (PARTITION BY qr.vec_id ORDER BY
         |      CAST(list_dot_product(CAST(qr.q AS DOUBLE[]), CAST(c.q AS DOUBLE[])) AS BIGINT)
         |        DESC, c.vec_id) AS rk
         |  FROM qz16 c JOIN qz16 qr ON qr.vec_id < 8 AND c.vec_id != qr.vec_id) WHERE rk <= 10)
         |SELECT f.q_id, CAST(count(*) AS INTEGER) AS n_overlap
         |FROM fullr f JOIN prefr p ON f.q_id = p.q_id AND f.n_id = p.n_id
         |GROUP BY f.q_id""".stripMargin,
    "text_luhn" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    substr(coalesce(text, ''), 1, 30) || ' pay 4' ||
        |    lpad(CAST(doc_id * 982451653 % 1000000000000000 AS VARCHAR), 15, '0') ||
        |    ' ref ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS t
        |  FROM documents),
        |m AS (SELECT doc_id, regexp_extract_all(t, '[0-9][0-9 -]{11,17}[0-9]') AS ms FROM synth),
        |cands AS (
        |  SELECT doc_id,
        |    unnest(list_transform(ms, x -> regexp_replace(x, '[^0-9]', '', 'g'))) AS c2
        |  FROM m),
        |lu AS (
        |  SELECT doc_id, c2,
        |    list_sum(list_transform(generate_series(0, len(c2) - 1), r ->
        |      CASE WHEN r % 2 = 1 THEN
        |        CASE WHEN 2 * CAST(substr(c2, len(c2) - r, 1) AS INTEGER) > 9
        |             THEN 2 * CAST(substr(c2, len(c2) - r, 1) AS INTEGER) - 9
        |             ELSE 2 * CAST(substr(c2, len(c2) - r, 1) AS INTEGER) END
        |      ELSE CAST(substr(c2, len(c2) - r, 1) AS INTEGER) END)) AS s
        |  FROM cands),
        |agg AS (
        |  SELECT doc_id, count(*) AS nc,
        |    SUM(CASE WHEN len(c2) BETWEEN 13 AND 19 AND s % 10 = 0
        |             THEN 1 ELSE 0 END) AS nv
        |  FROM lu GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(a.nc, 0) AS INTEGER) AS n_card_candidates,
        |  CAST(coalesce(a.nv, 0) AS INTEGER) AS n_card_valid
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "select_coverage" ->
      s"""WITH RECURSIVE pool AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(0, len(ws) - 3),
         |                i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
         |    END AS its
         |  FROM (SELECT doc_id, $wordsSql AS ws FROM documents
         |        WHERE doc_id < 120 AND text IS NOT NULL)),
         |greedy AS (
         |  SELECT CAST(0 AS INTEGER) AS pick, CAST(NULL AS BIGINT) AS doc_id,
         |         CAST(NULL AS BIGINT) AS gain, CAST([] AS VARCHAR[]) AS covered,
         |         CAST([] AS BIGINT[]) AS chosen
         |  UNION ALL
         |  SELECT g.pick + 1, w.doc_id, w.gain,
         |         list_distinct(list_concat(g.covered, w.its)),
         |         list_append(g.chosen, w.doc_id)
         |  FROM greedy g
         |  CROSS JOIN LATERAL (
         |    -- neither lambdas nor list_intersect (a lambda macro) can
         |    -- capture the correlated g.covered; a correlated scalar
         |    -- subquery over unnest + list_contains binds fine
         |    SELECT d.doc_id, d.its,
         |      CAST((SELECT count(*) FROM unnest(d.its) AS u(t)
         |            WHERE NOT list_contains(g.covered, t)) AS BIGINT) AS gain
         |    FROM pool d
         |    WHERE NOT list_contains(g.chosen, d.doc_id)
         |    ORDER BY gain DESC, d.doc_id
         |    LIMIT 1) w
         |  WHERE g.pick < 12 AND w.gain > 0)
         |SELECT doc_id, gain, CAST(len(covered) AS BIGINT) AS covered_total, pick
         |FROM greedy WHERE pick >= 1""".stripMargin,
    "privacy_generalize" ->
      // the same four exploded levels, same floors, same k-min rollup
      """WITH l AS (
        |  SELECT c_nationkey, c_mktsegment, u.level,
        |    CASE u.level
        |      WHEN 0 THEN CAST(floor(c_acctbal / 100) AS BIGINT)
        |      WHEN 1 THEN CAST(floor(c_acctbal / 1000) AS BIGINT)
        |      WHEN 2 THEN CAST(floor(c_acctbal / 10000) AS BIGINT)
        |      ELSE 0 END AS qb
        |  FROM customer, (SELECT unnest([0, 1, 2, 3]) AS level) u),
        |g AS (
        |  SELECT level, c_nationkey, c_mktsegment, qb, count(*) AS k
        |  FROM l GROUP BY 1, 2, 3, 4)
        |SELECT level, count(*) AS n_groups, min(k) AS k_min,
        |  CASE WHEN min(k) >= 5 THEN 1 ELSE 0 END AS meets_k
        |FROM g GROUP BY level""".stripMargin,
    "privacy_noised" ->
      // same md5-uniform, same odd-shifted inverse-CDF arg, same
      // grid-floored ln; DuckDB reads the hex via CAST('0x...' AS BIGINT)
      """WITH c AS (
        |  SELECT event_type, CAST(ts AS DATE) AS event_date, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |u AS (
        |  SELECT *, CAST(('0x' || substr(md5(
        |      'dp' || chr(31) || COALESCE(CAST(event_type AS VARCHAR), '')
        |           || chr(31) || COALESCE(CAST(event_date AS VARCHAR), '')),
        |    1, 8)) AS BIGINT) AS uu
        |  FROM c),
        |g AS (
        |  SELECT *, CASE WHEN uu * 2 < 4294967296 THEN uu * 2 + 1
        |                 ELSE (4294967296 - uu) * 2 END AS argn
        |  FROM u),
        |m AS (
        |  SELECT *, CAST(floor(ln(4294967296.0 / CAST(argn AS DOUBLE))
        |                       * 1048576.0) AS BIGINT) AS mag
        |  FROM g)
        |SELECT event_type, event_date, n,
        |  CASE WHEN uu * 2 < 4294967296 THEN n * 1048576 - mag
        |       ELSE n * 1048576 + mag END AS released_grid,
        |  CAST(CASE WHEN uu * 2 < 4294967296 THEN n * 1048576 - mag
        |       ELSE n * 1048576 + mag END AS DOUBLE)
        |    / 1048576.0 AS released
        |FROM m""".stripMargin,
    "select_kcenter" ->
      // farthest-point traversal from min(vec_id): each round's winner is
      // argmax over candidates of min d2 to the chosen list, (d2 DESC, id)
      s"""WITH RECURSIVE $int8CodesCtesSql,
         |seed AS (SELECT min(vec_id) AS id FROM qz),
         |greedy AS (
         |  SELECT CAST(1 AS INTEGER) AS pick,
         |    (SELECT id FROM seed) AS vec_id,
         |    CAST(NULL AS BIGINT) AS d2_pick,
         |    [(SELECT id FROM seed)] AS chosen
         |  UNION ALL
         |  SELECT g.pick + 1, w.vec_id, w.d2, list_append(g.chosen, w.vec_id)
         |  FROM greedy g
         |  CROSS JOIN LATERAL (
         |    SELECT c.vec_id,
         |      (SELECT min(
         |         CAST(list_dot_product(CAST(c.q AS DOUBLE[]),
         |                               CAST(c.q AS DOUBLE[])) AS BIGINT)
         |         + CAST(list_dot_product(CAST(p.q AS DOUBLE[]),
         |                                 CAST(p.q AS DOUBLE[])) AS BIGINT)
         |         - 2 * CAST(list_dot_product(CAST(c.q AS DOUBLE[]),
         |                                     CAST(p.q AS DOUBLE[])) AS BIGINT))
         |       FROM qz p WHERE list_contains(g.chosen, p.vec_id)) AS d2
         |    FROM qz c
         |    WHERE NOT list_contains(g.chosen, c.vec_id)
         |    ORDER BY d2 DESC, c.vec_id
         |    LIMIT 1) w
         |  WHERE g.pick < 8)
         |SELECT pick, vec_id, d2_pick FROM greedy""".stripMargin,
    "search_mmr" ->
      s"""WITH RECURSIVE $int8CodesCtesSql,
         |cand AS (
         |  SELECT c.vec_id AS id,
         |    CAST(list_dot_product(CAST(qr.q AS DOUBLE[]), CAST(c.q AS DOUBLE[])) AS BIGINT) AS rel,
         |    c.q AS q
         |  FROM qz c JOIN qz qr ON qr.vec_id = 0 AND c.vec_id != qr.vec_id
         |  QUALIFY row_number() OVER (ORDER BY rel DESC, id) <= 50),
         |greedy AS (
         |  SELECT CAST(0 AS INTEGER) AS pick, CAST(NULL AS BIGINT) AS id,
         |         CAST(NULL AS BIGINT) AS score, CAST([] AS BIGINT[]) AS chosen
         |  UNION ALL
         |  SELECT g.pick + 1, w.id, w.score, list_append(g.chosen, w.id)
         |  FROM greedy g
         |  CROSS JOIN LATERAL (
         |    SELECT d.id,
         |      7 * d.rel - CASE WHEN len(g.chosen) = 0 THEN 0 ELSE
         |        3 * (SELECT max(CAST(list_dot_product(CAST(d.q AS DOUBLE[]),
         |                                              CAST(c2.q AS DOUBLE[])) AS BIGINT))
         |             FROM cand c2 WHERE list_contains(g.chosen, c2.id)) END AS score
         |    FROM cand d
         |    WHERE NOT list_contains(g.chosen, d.id)
         |    ORDER BY score DESC, d.id
         |    LIMIT 1) w
         |  WHERE g.pick < 10)
         |SELECT id AS doc_id, score AS mmr_score, pick
         |FROM greedy WHERE pick >= 1""".stripMargin,
    "search_rrf" ->
      s"""WITH lex AS (${Ranking.bm25Sql("text", "doc_id", bm25Terms)}),
         |$int8CodesCtesSql,
         |sem AS (
         |  SELECT c.vec_id AS doc_id,
         |    CAST(list_dot_product(CAST(qr.q AS DOUBLE[]), CAST(c.q AS DOUBLE[])) AS BIGINT) AS dot_q
         |  FROM qz c JOIN qz qr ON qr.vec_id = 0 AND c.vec_id != qr.vec_id),
         |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM lex),
         |semr AS (SELECT doc_id, row_number() OVER (ORDER BY dot_q DESC, doc_id) AS r FROM sem),
         |contrib AS (
         |  SELECT doc_id, 1000000000 // (60 + r) AS w FROM lexr WHERE r <= 50
         |  UNION ALL
         |  SELECT doc_id, 1000000000 // (60 + r) AS w FROM semr WHERE r <= 50),
         |f AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS fused FROM contrib GROUP BY doc_id)
         |SELECT doc_id, fused, rank FROM (
         |  SELECT doc_id, fused,
         |    CAST(row_number() OVER (ORDER BY fused DESC, doc_id) AS INTEGER) AS rank FROM f)
         |WHERE rank <= 20""".stripMargin,
    "knn_lsh_recall" ->
      // composition of the knn_brute and knn_lsh oracles: both top-10
      // sets replay exactly, so the intersection count is exact too
      s"""WITH h AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm,
         |    ${bucketSql("CAST(embedding AS DOUBLE[])", 4)} AS bucket
         |  FROM embeddings),
         |ls AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, n.v) / (q.nrm * n.nrm) DESC,
         |                 n.vec_id) AS rank
         |    FROM h n JOIN h q ON n.bucket = q.bucket
         |    WHERE q.vec_id < 8 AND n.vec_id != q.vec_id)
         |  WHERE rank <= 10),
         |br AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, n.v) / (q.nrm * n.nrm) DESC,
         |                 n.vec_id) AS rank
         |    FROM h n, h q
         |    WHERE q.vec_id < 8 AND n.vec_id != q.vec_id)
         |  WHERE rank <= 10)
         |SELECT br.q_id, count(*) AS n_true,
         |  CAST(SUM(CASE WHEN ls.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hit,
         |  CAST((SUM(CASE WHEN ls.n_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
         |    // count(*) AS BIGINT) AS recall_ppm
         |FROM br LEFT JOIN ls ON br.q_id = ls.q_id AND br.n_id = ls.n_id
         |GROUP BY br.q_id""".stripMargin,
    "knn_lsh" ->
      s"""WITH h AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm,
         |    ${bucketSql("CAST(embedding AS DOUBLE[])", 4)} AS bucket
         |  FROM embeddings),
         |s AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos
         |  FROM h n JOIN h q ON n.bucket = q.bucket
         |  WHERE q.vec_id < 8 AND n.vec_id != q.vec_id)
         |SELECT q_id, n_id, cos, rank FROM (
         |  SELECT q_id, n_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INTEGER) AS rank
         |  FROM s)
         |WHERE rank <= 10""".stripMargin,
    "feature_mi" ->
      // the mutualInfo construction replayed: cell counts, window
      // marginals, floored 1e-6 log-grid terms, one fixed-order double
      // combine (window SUMs are HUGEINT in DuckDB — cast back to BIGINT)
      """WITH b AS (
        |  SELECT CAST(lang AS VARCHAR) AS x, CAST(source AS VARCHAR) AS y
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
        |cxy AS (SELECT x, y, count(*) AS c FROM b GROUP BY 1, 2),
        |cells AS (SELECT x, y, c,
        |    SUM(c) OVER (PARTITION BY x) AS cx,
        |    SUM(c) OVER (PARTITION BY y) AS cy,
        |    SUM(c) OVER () AS n FROM cxy),
        |s AS (SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(SUM(c * CAST(floor(ln(CAST(n AS DOUBLE) * CAST(c AS DOUBLE) /
        |      (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) * 1000000.0) AS BIGINT)) AS BIGINT) AS mi_num,
        |    CAST(-SUM(c * CAST(floor(ln(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS hx_num,
        |    CAST(-SUM(c * CAST(floor(ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS hy_num
        |  FROM cells)
        |SELECT n, mi_num,
        |  CAST(mi_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mi,
        |  CAST(hx_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS hx,
        |  CAST(hy_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS hy,
        |  CASE WHEN hx_num > 0 AND hy_num > 0 THEN
        |    (CAST(mi_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) /
        |    sqrt((CAST(hx_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) *
        |         (CAST(hy_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)))
        |  ELSE NULL END AS nmi
        |FROM s""".stripMargin,
    "doc_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  SUM(n_chars) / COUNT(*) AS avg_chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents GROUP BY lang, source""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin,
    "multimodal_alignment" ->
      // true-pair cosine vs the fixed derangement control; the proven
      // list_dot_product triple replays both doubles bit-exactly
      """WITH t AS (SELECT count(*) // 2 AS n FROM embeddings),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                              CAST(embedding AS DOUBLE[]))) AS nrm
        |      FROM embeddings),
        |l AS (SELECT vec_id AS id_a, v AS va, nrm AS na FROM e, t
        |      WHERE vec_id < n),
        |r AS (SELECT vec_id, v, nrm FROM e, t
        |      WHERE vec_id >= n AND vec_id < 2 * n)
        |SELECT l.id_a, p.vec_id AS id_b,
        |  list_dot_product(l.va, p.v) / (l.na * p.nrm) AS cos_pair,
        |  list_dot_product(l.va, c.v) / (l.na * c.nrm) AS cos_control,
        |  CAST(list_dot_product(l.va, p.v) / (l.na * p.nrm)
        |       > list_dot_product(l.va, c.v) / (l.na * c.nrm)
        |    AS INTEGER) AS aligned
        |FROM l
        |JOIN t ON TRUE
        |JOIN r p ON p.vec_id = l.id_a + t.n
        |JOIN r c ON (c.vec_id - t.n - 1 + t.n) % t.n = l.id_a""".stripMargin,
    "multimodal_dedup" ->
      """SELECT md5(text) AS content_md5, count(*) AS n_copies,
        |  min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1""".stripMargin,
    "multimodal_resize" ->
      """SELECT media_id, width, height,
        |  CAST(CASE WHEN greatest(width, height) <= 48 THEN width
        |       ELSE width * 48 // greatest(width, height) END AS BIGINT) AS out_w,
        |  CAST(CASE WHEN greatest(width, height) <= 48 THEN height
        |       ELSE height * 48 // greatest(width, height) END AS BIGINT) AS out_h
        |FROM (SELECT doc_id AS media_id,
        |        16 + (octet_length(encode(text)) % 64) AS width,
        |        16 + ((octet_length(encode(text)) * 7) % 64) AS height
        |      FROM documents)""".stripMargin,
    "multimodal_frames" ->
      """SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(frame_idx AS BIGINT) AS frame_idx
        |FROM (SELECT doc_id AS media_id,
        |        1 + (octet_length(encode(text)) % 10) AS n_frames
        |      FROM documents),
        |  unnest(generate_series(0, n_frames - 1, 3)) AS t(frame_idx)""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |  16 + (octet_length(encode(text)) % 64) AS width,
        |  16 + ((octet_length(encode(text)) * 7) % 64) AS height,
        |  round((16 + (octet_length(encode(text)) % 64)) /
        |        CAST(16 + ((octet_length(encode(text)) * 7) % 64) AS DOUBLE), 4) AS aspect,
        |  1 + (octet_length(encode(text)) % 10) AS n_frames
        |FROM documents""".stripMargin
  ).filter(_._2 != null)
}
