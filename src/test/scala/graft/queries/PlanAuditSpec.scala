package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the AUDITED physical-plan shapes in CI: a lost broadcast hint, an
  * extra shuffle, or a window sneaking back where a bounded-heap/merge
  * operator belongs is a scale regression even when sf0.001 timings look
  * fine. Plan shape is SF-independent, so sf0.001 plans stand in for the
  * 100 TB ones.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    try df.queryExecution.executedPlan.toString
    finally ParityQueries.releaseSessions()
  }

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("q1_agg: one shuffle, shipdate filter pushed to the parquet scan") {
    val p = plan("q1_agg")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q3_top10: dims broadcast, global top-k is TakeOrderedAndProject") {
    val p = plan("q3_top10")
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), "limit+sort must fuse, not global-sort")
  }

  test("q5_local: every dimension joins broadcast; the only shuffle is the aggregate") {
    val p = plan("q5_local")
    assert(count(p, "BroadcastHashJoin") >= 4, p)
    assert(!p.contains("SortMergeJoin"), "no dim may fall back to SMJ")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("rollup_agg: SQL path keeps dims on BroadcastHashJoin under ROLLUP's Expand") {
    val p = plan("rollup_agg")
    assert(count(p, "BroadcastHashJoin") >= 3, p)
    assert(p.contains("Expand"), "ROLLUP lowers to Expand")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sort_limit: top-100 never globally sorts") {
    val p = plan("sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), "range-partitioned global sort is the anti-pattern")
  }

  test("topk_per_key: bounded-heap path plans no Window") {
    val p = plan("topk_per_key")
    assert(!p.contains("Window"), "window ranking would shuffle every row of every key")
  }

  test("range_bands: bucket decomposition avoids BroadcastNestedLoopJoin") {
    val p = plan("range_bands")
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("range_intervals: overlap join is an equi-join on (key, bucket), no NL join") {
    val p = plan("range_intervals")
    assert(!p.contains("BroadcastNestedLoop"), "interval join must not fall back to NL")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("profile_keys: all combos from ONE scan via a single Expand") {
    val p = plan("profile_keys")
    assert(count(p, "Scan parquet") == 1, "grouping sets must read the table once")
    assert(count(p, "Expand") == 1, p)
  }

  test("text_luhn: pure Column scan — zero exchanges") {
    val p = plan("text_luhn")
    assert(!p.contains("Exchange"), "card scan is map-side only")
  }

  test("search_rrf: no cartesian; every nest-loop builds on the tiny broadcast side") {
    val p = plan("search_rrf")
    assert(!p.contains("CartesianProduct"), p)
    // two deliberate BNLJs: BM25's 1-row stats cross join and int8TopK's
    // broadcast-queries × streaming-corpus probe — both must BuildRight
    // (the bounded side); a BuildLeft would broadcast the corpus
    assert(count(p, "BroadcastNestedLoopJoin") ==
      count(p, "BroadcastNestedLoopJoin BuildRight"), p)
  }

  test("linkage_dl: block join is hash equi-join; the DL kernel stays in codegen") {
    val p = plan("linkage_dl")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("damerau") || p.contains("DamerauLevenshtein"), p)
  }

  test("linkage_sorted: rank pairing is an equi-join, never a nested loop") {
    val p = plan("linkage_sorted")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "offset pairing must stay an equi-join on the computed rank")
  }

  test("wave 22-24 additions: equi-joins only, no nested loops, no cartesians") {
    // knn_ivfpq scores via broadcast tables inside a compiled map;
    // adamic_adar/theil_sen/alignment pair through hash equi-joins
    for (name <- Seq("knn_ivfpq", "graph_adamic_adar", "events_theil_sen",
      "multimodal_alignment")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoop"), s"$name plans a nested loop:\n$p")
    }
    // parts_xyz / label_fleiss attach a ONE-ROW broadcast stat (the month
    // count / category totals) — a BroadcastNestedLoopJoin over one row is
    // the standard stat-attach shape, but the heavy side must never
    // cartesian against anything row-sized
    for (name <- Seq("parts_xyz", "label_fleiss")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("wave 27-30 additions: no cartesians; bounded fan-outs stay broadcast") {
    for (name <- Seq("graph_closeness", "pipeline_dpo", "basket_rules",
      "events_lorenz", "orders_price_index", "parts_abc_migration")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
    // text_heaps' checkpoint fan-out is a theta join bounded by the <= 17
    // thresholds — it must run with the THRESHOLD side broadcast, never
    // shuffling the corpus for it
    val p = plan("text_heaps")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the threshold theta-join must broadcast the 17-row side")
  }

  test("sample_curriculum: stage map joins broadcast, histogram window is value-sized") {
    val p = plan("sample_curriculum")
    assert(p.contains("BroadcastHashJoin"),
      "the (difficulty -> cum) map must broadcast back map-side")
    assert(!p.contains("Exchange rangepartitioning"),
      "no global sort belongs in curriculum staging")
  }

  test("linkage_sorted: global rank is a partition-local window, no single-task sort") {
    val p = plan("linkage_sorted")
    // the record-table row_number must be partitioned by __pid (the
    // range-partitioned prefix-sum ranking); an unpartitioned row_number
    // here is the corpus-sized single-task window this audit exists to ban
    val rn = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rn.nonEmpty, s"expected the rank window in-plan:\n$p")
    assert(rn.forall(_.contains("__pid")),
      s"row_number window not partitioned by __pid:\n${rn.mkString("\n")}")
  }

  test("privacy_erasure: the cascade hop in-plan is a semi join") {
    // the customer→orders hops sit behind localCheckpoint (materialized in
    // their own jobs, same LeftSemi shape); the final plan carries the
    // lineitem hop
    val p = plan("privacy_erasure")
    assert(count(p, "LeftSemi") >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scd2_incremental: batch-key dims broadcast into the dimension pass") {
    val p = plan("scd2_incremental")
    assert(p.contains("BroadcastExchange"),
      "firstInfo/curDim must broadcast — the dimension side never reshuffles for them")
  }

  test("parts_skyline: two-phase reduction plans no join at all") {
    val p = plan("parts_skyline")
    assert(!p.contains("Join"), "skyline must not plan the O(n²) dominance join")
    assert(p.contains("Coalesce") || p.contains("coalesce"), p)
  }

  test("knn_brute: query side broadcasts; corpus never hash-shuffles before scoring") {
    val p = plan("knn_brute")
    assert(p.contains("BroadcastExchange"), "query set must broadcast")
    // the only hashpartitioning exchange is the per-query ranking window
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("asof_clicks (union+window): exactly one shuffle of |L|+|R| by key") {
    val p = plan("asof_clicks")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("asof_native: custom merge node, no Window, both sides clustered") {
    val p = plan("asof_native")
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
    assert(count(p, "Exchange hashpartitioning") == 2, p)
  }

  test("pipeline_e2e: survivors broadcast into the semi-join; two shuffles total") {
    val p = plan("pipeline_e2e")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "the dedup-survivor set must broadcast; the document table never shuffles for it")
    assert(count(p, "Exchange hashpartitioning") == 2,
      s"dedup digest shuffle + final agg shuffle only:\n$p")
    assert(p.contains("Generate"), "chunking must stay a map-side generator")
  }

  test("dedup_exact: single shuffle of the 128-bit digests (map-side partials)") {
    val p = plan("dedup_exact")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(p.contains("partial_"), "aggregate must have a map-side partial phase")
  }

  test("sample_split / sample_mixture: pure map-side — zero shuffles over the corpus") {
    val ps = plan("sample_split")
    assert(!ps.contains("Exchange"), s"hash split must not shuffle:\n$ps")
    val pm = plan("sample_mixture")
    assert(pm.contains("BroadcastHashJoin"), "weights dim must broadcast")
    assert(!pm.contains("Exchange hashpartitioning"),
      s"mixture sampling must not shuffle the corpus:\n$pm")
  }

  test("sample_stratified: bounded-heap draw plans no Window") {
    val p = plan("sample_stratified")
    assert(!p.contains("Window"), "stratified draw must ride the TopK heaps, not a window")
  }

  test("pack_bins: exactly the one per-stream shuffle the running sum needs") {
    val p = plan("pack_bins")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("embedding_unit: pure map-side projection, zero exchanges") {
    val p = plan("embedding_unit")
    assert(!p.contains("Exchange"), s"unit-normalization must not shuffle:\n$p")
  }

  test("approx_quantiles: one shuffle with map-side partial sketches") {
    val p = plan("approx_quantiles")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(p.contains("partial_"), "sketch aggregate must have a map-side partial phase")
  }

  test("pipeline_curate: survivors broadcast; only the digest and packer shuffles move data") {
    val p = plan("pipeline_curate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "dedup survivors must broadcast into the semi-join")
    assert(count(p, "Exchange hashpartitioning") == 2,
      s"digest aggregate + per-stream packer window only:\n$p")
  }

  test("vocab_topk: global top-k fuses to TakeOrderedAndProject, one count shuffle") {
    val p = plan("vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), "limit+sort must fuse, not global-sort")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(p.contains("partial_"), "token counts must combine map-side")
  }

  test("contamination_report: ref digests broadcast; corpus aggregates without a probe shuffle") {
    val p = plan("contamination_report")
    assert(p.contains("BroadcastHashJoin"), "digest probe must broadcast")
    // ref digest distinct + final per-source aggregate
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
  }

  test("text_repetition: per-doc kernel, zero exchanges") {
    val p = plan("text_repetition")
    assert(!p.contains("Exchange"), s"repetition signals must not shuffle:\n$p")
  }

  test("embedding_quantize: pure map-side, zero exchanges") {
    val p = plan("embedding_quantize")
    assert(!p.contains("Exchange"), s"quantization must not shuffle:\n$p")
  }

  test("bm25_rank: corpus never hash-shuffles; stats fold to one broadcast row") {
    val p = plan("bm25_rank")
    // per-term tf is map-side HOFs; the only exchange is the single-row
    // statistics aggregate (SinglePartition), which broadcasts back
    assert(count(p, "Exchange hashpartitioning") == 0,
      s"corpus must stay map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the one-row stats must ride a broadcast")
  }

  test("knn_int8: query side broadcasts like the float baseline") {
    val p = plan("knn_int8")
    assert(p.contains("BroadcastExchange"), "query set must broadcast")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"only the ranking window may shuffle:\n$p")
    // the fused prep and integer dot are native codegen'd expressions —
    // an interpreted HOF lambda reappearing in the hot path is the exact
    // regression the r6 verdict flagged (2.8× slower than float)
    assert(!p.contains("zip_with") && !p.contains("lambdafunction"),
      s"interpreted HOF back in the int8 path:\n$p")
    assert(p.contains("int8unitcodes") || p.contains("Int8UnitCodes"),
      s"fused prep kernel missing:\n$p")
  }

  test("tfidf_topterms: corpus-size rides a 1-row broadcast; tf aggregates map-side") {
    val p = plan("tfidf_topterms")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "n_docs must ride a broadcast, not a shuffle")
    // explode-tf, df-per-term, the tf⋈df join, and the per-doc ranking
    // window are the legitimate exchanges; the corpus text itself is
    // projected away before any of them
    assert(p.contains("Generate explode"), p)
  }

  test("text_perplexity: vocab scalar broadcasts; per-doc sum is an integer aggregate") {
    val p = plan("text_perplexity")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row vocab count must ride a broadcast")
    // the per-doc aggregation sums the 1e-6-grid integer contributions —
    // a raw double sum would be partition-order-dependent
    assert(p.contains("sum(lp_q"), s"integer-grid sum missing:\n$p")
  }

  test("snapshot_diff: only (key, digest) shuffles — content columns pruned before exchange") {
    val p = plan("snapshot_diff")
    // the md5 digest must be computed below the exchanges so the full-outer
    // join ships 32-byte hashes, never document text
    assert(!p.contains("CartesianProduct"), p)
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty, p)
    assert(!exchangeLines.exists(_.contains("text")), s"text crossed an exchange:\n$p")
  }

  test("events_funnel: stage aggregates are partial-combined; no corpus-wide cross join") {
    val p = plan("events_funnel")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"stage entries must combine map-side:\n$p")
  }

  test("decontam_ngram: ref grams broadcast; the corpus never shuffles") {
    val p = plan("decontam_ngram")
    assert(p.contains("BroadcastExchange"), "the eval gram set must broadcast")
    // exactly two hash exchanges are legitimate, both NOT corpus-sized: the
    // REF gram distinct (eval-set-sized) and the per-id hit count (partial-
    // combined longs). Corpus text/grams stream map-side into the broadcast
    // probe and never cross an exchange.
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchangeLines.exists(_.contains("text")), s"text crossed a hash exchange:\n$p")
    assert(p.contains("partial_count"), "hit counts must combine map-side")
  }

  test("dedup_against_ref: reference digests aggregate once; corpus path is scan+filter") {
    val p = plan("dedup_against_ref")
    // Two legitimate regimes: a small ref digest set rides the exact
    // broadcast probe — a map-side Filter over the corpus scan with ZERO
    // corpus exchanges — while an over-cap ref falls back to the bloom
    // prefilter + exact confirm anti-join. Either way the documents table
    // itself must never hash-shuffle.
    val exactProbe = p.contains("Filter NOT UDF(md5")
    assert(exactProbe || p.contains("LeftAnti"), p)
    val shuffleBudget = if (exactProbe) 0 else 3
    assert(count(p, "Exchange hashpartitioning") <= shuffleBudget,
      s"corpus must stream map-side (budget $shuffleBudget):\n$p")
  }

  test("quality_topfrac: boundary dim broadcasts; only the 3-col projection shuffles") {
    val p = plan("quality_topfrac")
    assert(p.contains("BroadcastHashJoin"),
      "the per-group boundary row must broadcast into a map-side keep filter")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"one shuffle only — the (group, score, hash) projection for the rank window:\n$p")
    // the window runs on the projection, never on the full corpus row
    assert(p.contains("Window"), p)
  }

  test("sample_epochs: rates dim broadcasts; corpus never shuffles; repeat is map-side") {
    val p = plan("sample_epochs")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"weights dim AND rates dim must broadcast into the corpus scan:\n$p")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"one shuffle only — the groups-sized (group, tokens) partial agg:\n$p")
    assert(p.contains("Generate explode"),
      "the epoch fan-out must be a map-side explode, not a join against a series table")
    assert(count(p, "partial_sum") >= 1, "token totals must partial-combine map-side")
  }

  test("vectorize_hashtf: token shuffle partial-combines to pair form; text never shuffles") {
    val p = plan("vectorize_hashtf")
    assert(count(p, "Exchange hashpartitioning") <= 2,
      s"(id, dim) tf agg + pair-sized id window only:\n$p")
    assert(count(p, "partial_count") >= 1,
      "the corpus-token-sized explode must combiner-reduce map-side before the exchange")
    assert(!p.contains("Exchange hashpartitioning(text"), "raw text must not shuffle")
  }

  test("pipeline_shards: rates agg + per-stream pack window are the only shuffles") {
    val p = plan("pipeline_shards")
    assert(count(p, "Exchange hashpartitioning") <= 2,
      s"groups-sized rates agg + source-partitioned pack window only:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"weights and rates dims must broadcast into the corpus scan:\n$p")
    assert(p.contains("Generate explode"), "the epoch fan-out must stay map-side")
  }

  test("knn_text: query vectors broadcast; corpus joins map-side; no text shuffle") {
    val p = plan("knn_text")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"query tf AND query norms must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the dim meet must be a broadcast hash join, never a corpus-wide SMJ:\n$p")
    assert(!p.contains("Exchange hashpartitioning(text"), "raw text must not shuffle")
    assert(count(p, "partial_count") + count(p, "partial_sum") >= 2,
      "tf and dot aggregates must partial-combine map-side")
  }

  test("vectorize_tfidf: df dim and corpus count broadcast; corpus shuffles once") {
    val p = plan("vectorize_tfidf")
    assert(count(p, "BroadcastHashJoin") + count(p, "BroadcastNestedLoopJoin") >= 2,
      s"the dims-sized df agg and the 1-row corpus count must broadcast back:\n$p")
    assert(!p.contains("SortMergeJoin"), s"nothing here warrants an SMJ:\n$p")
    assert(count(p, "partial_count") >= 1,
      "the corpus-token explode must combiner-reduce map-side")
  }

  test("events_cohorts: stream collapses to distinct user-weeks before any join") {
    val p = plan("events_cohorts")
    assert(count(p, "Exchange hashpartitioning") <= 4,
      s"distinct + first-week agg + join + cell agg only, all user-week-sized:\n$p")
    assert(count(p, "partial_") >= 2, "distinct and aggregates must partial-combine")
    assert(!p.contains("Exchange hashpartitioning(event_id"),
      "raw events must never shuffle — only the (user, week) projection")
  }

  test("vocab_bpe_pairs: corpus-sized motion is ONE partial-agg'd word shuffle; top-k bounded") {
    val p = plan("vocab_bpe_pairs")
    assert(count(p, "Exchange hashpartitioning") == 2,
      s"word-count shuffle + vocab-sized pair shuffle only:\n$p")
    assert(count(p, "partial_") >= 2, "both aggregates must partial-combine map-side")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-k must be bounded heaps, never a global sort")
  }

  test("scd2_users: one key shuffle serves all three window passes and the run agg") {
    val p = plan("scd2_users")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"gaps-and-islands must reuse the user_id partitioning end-to-end:\n$p")
  }

  test("label_majority: vote-pair partial agg + key window, rank pushed to group limit") {
    val p = plan("label_majority")
    assert(count(p, "Exchange hashpartitioning") == 2,
      s"(item,label) agg shuffle + item window shuffle only:\n$p")
    assert(p.contains("WindowGroupLimit"),
      "the rn=1 filter must push into WindowGroupLimit (bounded per-key state)")
  }

  test("inference_quality: scoring the corpus plans ZERO exchanges") {
    val p = plan("inference_quality")
    assert(!p.contains("Exchange"), s"inference is scan-speed map work:\n$p")
  }

  test("embedding_project: projection is one map-side generate, zero exchanges") {
    val p = plan("embedding_project")
    assert(!p.contains("Exchange"), s"JL projection must not shuffle:\n$p")
    assert(count(p, "Generate posexplode") == 1, p)
  }

  test("skew_report: counts materialize once — the final plan re-reads NO parquet") {
    val p = plan("skew_report")
    assert(!p.contains("FileScan parquet"),
      s"both total and top-N must derive from the one materialized count set:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-N must be a bounded heap")
  }

  test("events_outliers: all stats derive from checkpointed histograms, stats broadcast") {
    val p = plan("events_outliers")
    assert(!p.contains("FileScan parquet"),
      s"the raw table is scanned once, in the histogram job — never again:\n$p")
    assert(p.contains("BroadcastHashJoin"), "per-group stats must ride broadcasts")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ab_report: one unit shuffle and the 1-row combine — no join anywhere") {
    val p = plan("ab_report")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"per-user collapse is the only wide shuffle:\n$p")
    assert(!p.contains("Join"), "the 2×2 table is conditional sums, never a join")
  }

  test("snapshot_merge: one co-partitioned full-outer apply, base scanned once") {
    val p = plan("snapshot_merge")
    assert(count(p, "FullOuter") == 1, p)
    // base + assembled change batch: exactly one key exchange per side
    assert(count(p, "Exchange hashpartitioning") == 2,
      s"full outer needs both sides co-partitioned, nothing more:\n$p")
  }

  test("sample_balanced: bounded-heap selection plans no Window") {
    val p = plan("sample_balanced")
    assert(!p.contains("Window"),
      "per-class ranking must ride the bounded-heap TopK, not a window sort")
  }

  test("text_dupgrams: grams generated ONCE, digests shuffle, text never does") {
    val p = plan("text_dupgrams")
    // one explode for gram generation (the join-back formulation would
    // plan two — doubling the dominant tokenize+shingle CPU at scale)
    assert(count(p, "Generate explode") == 1,
      s"gram generation must appear exactly once:\n$p")
    assert(count(p, "Exchange hashpartitioning") <= 2,
      s"digest window shuffle + per-doc agg only:\n$p")
    // every shuffle key is the 128-bit digest or the id — never text/grams
    assert(!p.contains("Exchange hashpartitioning(__g"), "gram text must not shuffle")
  }

  test("events_transitions: one corpus shuffle (user window); later stages are type-sized") {
    val p = plan("events_transitions")
    // user window + pair aggregate + per-source window — nothing else,
    // and the only corpus-sized one is the first
    assert(count(p, "Exchange hashpartitioning") == 3, p)
    assert(!p.contains("Exchange rangepartitioning"), "no global sort anywhere")
  }

  test("events_paths: window shuffle + path agg, top-k is TakeOrdered") {
    val p = plan("events_paths")
    assert(p.contains("TakeOrderedAndProject"), "the k-cut must never globally sort")
    assert(count(p, "Exchange hashpartitioning") == 2, p)
  }

  test("text_entropy: pure map — zero exchanges, one codegen stage") {
    val p = plan("text_entropy")
    assert(!p.contains("Exchange"), s"entropy must run at scan speed:\n$p")
    assert(p.contains("*(1)") && !p.contains("*(2)"),
      "everything fuses into a single whole-stage-codegen stage")
  }

  test("basket_lift: the distinct set pins to ONE evaluation; cut is TakeOrdered") {
    val p = plan("basket_lift")
    assert(p.contains("InMemoryRelation") || p.contains("Scan ExistingRDD"),
      s"the four-branch distinct set must not recompute per branch:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("basket_pairs: key-bounded self-join, top-k is TakeOrdered") {
    val p = plan("basket_pairs")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("BroadcastNestedLoop"), "the pair fan-out must ride the equi-join")
    assert(count(p, "Exchange hashpartitioning") <= 3, p)
  }

  test("events_gaps: the window partitioning is reused by the aggregate — ONE shuffle total") {
    val p = plan("events_gaps")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"groupBy(user_id) must reuse the window's user partitioning:\n$p")
  }

  test("source_partitioned: the one-type read prunes at PARTITION level") {
    val p = plan("source_partitioned")
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"the event_type predicate must prune directories, not filter rows:\n$p")
  }

  test("events_percentiles: histogram shuffle + type-keyed windows — two exchanges, no global sort") {
    val p = plan("events_percentiles")
    assert(count(p, "Exchange hashpartitioning") == 2, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("text_readability and text_code_detect: pure map — zero exchanges") {
    val pr = plan("text_readability")
    assert(!pr.contains("Exchange"), s"readability must run at scan speed:\n$pr")
    val pc = plan("text_code_detect")
    assert(!pc.contains("Exchange"), s"code detection must run at scan speed:\n$pc")
  }

  test("events_user_entropy: the aggregate reuses the window's user partitioning") {
    val p = plan("events_user_entropy")
    // (user, type) count agg + user window + user agg — the last two share
    // the first shuffle's user clustering only partially: ≤ 2 exchanges
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
  }

  test("audience_lookalike: corpus never shuffles; cut is TakeOrdered") {
    val p = plan("audience_lookalike")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"scoring must be map-side against the literal centroid:\n$p")
  }

  test("parts_abc: distributed prefix sum — range sort, pinned evaluation, pid-local window") {
    val p = plan("parts_abc")
    assert(p.contains("Exchange rangepartitioning"), "the order is a distributed range sort")
    assert(p.contains("InMemoryRelation"),
      "the ordered set must pin ONE evaluation (sampled range boundaries)")
    assert(p.contains("windowspecdefinition(__pid"),
      "the running sum must be partition-local, never a single global window")
    // the only single-partition exchanges sit on the partitions-sized
    // subtotal tables (offsets window + grand total)
    assert(count(p, "Exchange SinglePartition") == 2, p)
  }

  test("graph_triangles: wedge + closing joins are all equi-joins, never nested-loop") {
    val p = plan("graph_triangles")
    // the (deg,id)-ordered pair trick exists precisely so the closing-edge
    // lookup is an equi-join; an OR-shaped condition would plan a BNLJ
    // whose cost is wedges × edges — the quadratic the orientation avoids
    assert(!p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_chi2_terms: cell table pinned once; totals broadcast; top-k group-limited") {
    val p = plan("text_chi2_terms")
    assert(!p.contains("Scan parquet"),
      s"the corpus must tokenize ONCE into the pinned cell table:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"class totals + corpus N must broadcast, not shuffle the cells:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-class top-k must prune under WindowGroupLimit before the sort:\n$p")
  }

  test("text_postings: tf pinned once; per-token top-k prunes under WindowGroupLimit") {
    val p = plan("text_postings")
    assert(!p.contains("Scan parquet"),
      s"the corpus must tokenize ONCE into the pinned tf table:\n$p")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pipeline_dashboard: ONE corpus scan feeds every health metric") {
    val p = plan("pipeline_dashboard")
    assert(count(p, "Scan parquet") == 1,
      s"the dashboard's metrics must all derive from one (source,hash,lang) aggregate:\n$p")
  }

  test("events_cusum: daily series pinned once; windows share the type shuffle") {
    val p = plan("events_cusum")
    // events scan once into the pinned day×type table; downstream the
    // only hash exchanges are the type-sized totals agg and the window
    // sort — the raw table never re-scans
    assert(!p.contains("Scan parquet"),
      s"raw events must not re-scan past the pinned daily table:\n$p")
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
    assert(p.contains("windowspecdefinition(event_type"), p)
  }

  test("events_forecast: cell table pinned once; bounds ride a broadcast") {
    val p = plan("events_forecast")
    assert(!p.contains("Scan parquet"),
      s"raw events must not re-scan past the pinned cell table:\n$p")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("markov_attribution: all five scenarios run off the pinned probability table") {
    val p = plan("markov_attribution")
    assert(!p.contains("Scan parquet"),
      s"events must feed the checkpointed transition table exactly once:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_pattern: the three-way pattern costs exactly one user shuffle") {
    val p = plan("events_pattern")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"reverse-frame window and the user aggregate must share one exchange:\n$p")
  }

  test("events_twa: lead window and aggregate share the user partitioning") {
    val p = plan("events_twa")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("events_survival: spans pin once; no raw events re-scan") {
    val p = plan("events_survival")
    assert(!p.contains("Scan parquet"), p)
  }

  test("q18_top_orders: big-order set broadcasts; the cut is a bounded heap") {
    val p = plan("q18_top_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must never globally sort:\n$p")
  }

  test("q2_mincost: dims broadcast; argmin is one rollup + one part window") {
    val p = plan("q2_mincost")
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("windowspecdefinition(p_partkey"), p)
  }

  test("q4_priority: EXISTS plans as a semi join, date filter pushed to orders") {
    val p = plan("q4_priority")
    assert(p.contains("LeftSemi"), s"EXISTS must lower to a semi join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
  }

  test("q6_forecast: every predicate reaches the scan; no grouped shuffle") {
    val p = plan("q6_forecast")
    // PushedFilters truncates in toString — assert the untruncated prefix
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), " +
      "IsNotNull(l_quantity), GreaterThanOrEqual"),
      s"ship/discount/quantity filters must push:\n$p")
    assert(count(p, "Exchange hashpartitioning") == 0,
      s"a global aggregate needs no hash exchange:\n$p")
  }

  test("q8_market_share: dim chain broadcasts; share computes in the one year agg") {
    val p = plan("q8_market_share")
    assert(count(p, "BroadcastHashJoin") >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(count(p, "lineitem.parquet") == 1,
      s"numerator and denominator must share ONE fact scan:\n$p")
  }

  test("q9_profit: red-part and supplier dims broadcast onto one fact scan") {
    val p = plan("q9_profit")
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(count(p, "lineitem.parquet") == 1, p)
  }

  test("q11_important: one partkey rollup; the global total rides a broadcast") {
    val p = plan("q11_important")
    // the rollup's lineage appears under BOTH the output and the 1-row
    // total pre-AQE; ReuseExchange dedupes the identical exchanges at
    // runtime, so the static bound is 2 (1 after reuse)
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q12_late_lines: shipdate window pushed to the scan; no cartesian") {
    val p = plan("q12_late_lines")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q13_custdist: the per-customer count reuses the join partitioning") {
    val p = plan("q13_custdist")
    assert(!p.contains("CartesianProduct"), p)
    // custkey join + custkey count share one partitioning; only the
    // histogram regroup adds an exchange
    assert(count(p, "Exchange hashpartitioning") <= 3, p)
  }

  test("q14_promo: part broadcast; promo and total share one aggregate") {
    val p = plan("q14_promo")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(count(p, "Exchange hashpartitioning") == 0,
      s"conditional sums must fold into the single global aggregate:\n$p")
    assert(count(p, "lineitem.parquet") == 1, p)
  }

  test("q15_top_supplier: one supplier rollup; the max rides a broadcast") {
    val p = plan("q15_top_supplier")
    // same ReuseExchange shape as q11: the rollup embeds twice pre-AQE
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q17_small_qty: brand parts and per-part stats both broadcast") {
    val p = plan("q17_small_qty")
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"only the per-part stats rollup may shuffle:\n$p")
  }

  test("q19_disjunct: the OR-of-conjunctions keeps the equi broadcast join") {
    val p = plan("q19_disjunct")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"),
      s"disjunctive predicates must not degrade the join:\n$p")
  }

  test("q20_promo_suppliers: promo parts broadcast; two bounded rollups") {
    val p = plan("q20_promo_suppliers")
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
  }

  test("q21_waiting: both EXISTS fold into one order window — lineitem scans once") {
    val p = plan("q21_waiting")
    assert(count(p, "lineitem.parquet") == 1,
      s"the correlated-EXISTS rewrite must not self-join the fact:\n$p")
    assert(p.contains("windowspecdefinition(l_orderkey"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sample_exact_k: a bounded heap, never a global sort; per-group prunes under WindowGroupLimit") {
    val p = plan("sample_exact_k")
    assert(p.contains("TakeOrderedAndProject"),
      s"exact-k must plan as a bounded heap:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), p)
    val pg = plan("sample_k_per_group")
    assert(pg.contains("WindowGroupLimit"),
      s"per-group exact-k must prune map-side:\n$pg")
  }

  test("metric_bootstrap: long-form replicas — pipelined explode, group-sized shuffles") {
    // round-12 contract (ops/Bootstrap.scala): the B weights ride ONE
    // pipelined chunk-explode whose per-(group, chunk) partial aggregate
    // collapses map-side — the explode never materializes B× the data,
    // and the generated code stays inside whole-stage codegen (the old
    // 2B-column wide form exceeded codegen limits and ran interpreted).
    val p = plan("metric_bootstrap")
    assert(count(p, "Generate posexplode") == 1,
      s"weights must ride one pipelined chunk explode:\n$p")
    // shuffles carry (group, chunk)-keyed partials and the group rollup —
    // both group-sized; the densify exchange repartitions the small scan
    // when its guard fires. EXACT counts per regime (r12 advisor: an
    // unconditional <= 3 would silently absorb an accidental extra
    // shuffle in the guard-off regime)
    val densified = p.contains("Exchange hashpartitioning(__ids")
    val expected = if (densified) 3 else 2
    assert(count(p, "Exchange hashpartitioning") == expected,
      s"exactly the group-sized shuffles${if (densified) " plus the densify exchange" else ""}:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Expand"), p)
    assert(count(p, "documents.parquet") == 1, p)
  }

  test("audience_jaccard: pair expansion stays an equi join; sizes broadcast") {
    val p = plan("audience_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"the group sizes must broadcast back onto the pair table:\n$p")
  }

  test("knn_hardneg: anchors broadcast; the corpus streams map-side") {
    val p = plan("knn_hardneg")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(count(p, "embeddings.parquet") == 2,
      s"one corpus scan + one anchor scan:\n$p")
  }

  test("embedding_drift: two snapshot scans, equi joins only") {
    val p = plan("embedding_drift")
    assert(count(p, "embeddings.parquet") == 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_reach: first-seen rollup + calendar window, bounded exchanges") {
    val p = plan("events_reach")
    assert(count(p, "Exchange hashpartitioning") <= 3, p)
    assert(p.contains("windowspecdefinition(event_type"), p)
  }

  test("orders_safety_stock: two rollups, no window, no join") {
    val p = plan("orders_safety_stock")
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("except_all/intersect_all: multiset algebra plans as aggregates, not joins") {
    val pe = plan("except_all")
    assert(!pe.contains("SortMergeJoin") && !pe.contains("BroadcastHashJoin"),
      s"EXCEPT ALL must lower to the count-annotated aggregate form:\n$pe")
    val pi = plan("intersect_all")
    assert(!pi.contains("SortMergeJoin") && !pi.contains("BroadcastHashJoin"), pi)
  }

  test("grouping_sets/unpivot: Expand and Generate lower as expected") {
    assert(plan("grouping_sets").contains("Expand"), "GROUPING SETS lowers to Expand")
    assert(plan("unpivot_segments").contains("Generate"), "stack() lowers to Generate")
  }

  test("privacy_kanon: one quasi-id aggregate chain") {
    val p = plan("privacy_kanon")
    assert(count(p, "customer.parquet") == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("dedup_semantic: bucketed pair join stays equi; one cluster window") {
    val p = plan("dedup_semantic")
    // the n_members count shares the election window's partition, so the
    // plan keeps ONE cluster window (no WindowGroupLimit — count needs
    // every member) and no cartesian anywhere
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("windowspecdefinition(cluster"), p)
  }

  test("geo_radius_join: cell-keyed equi join, no nested-loop anywhere") {
    val p = plan("geo_radius_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the 3x3 blocking must plan as an equi join:\n$p")
  }

  test("dedup_prefix_join: posting self-join stays equi; candidates broadcast into verify") {
    val p = plan("dedup_prefix_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding_kmeans: final assignment is a pure map over cached codes — zero exchanges") {
    val p = plan("embedding_kmeans")
    assert(!p.contains("Exchange"),
      s"assignment must fold literal centroids with no join or shuffle:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("corr_matrix: k(k-1)/2 pairs reduce in ONE aggregate pass") {
    val p = plan("corr_matrix")
    // a single global aggregate: one single-partition exchange, no
    // hash shuffle, no join — the whole matrix is one scan
    assert(count(p, "Exchange hashpartitioning") == 0, p)
    assert(!p.contains("Join"), p)
  }

  test("scd2_lookup: dimension build + native as-of merge, no interval nested loop") {
    val p = plan("scd2_lookup")
    assert(p.contains("AsOfJoin"), "the point-in-time read must use the native as-of node\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("table_checksum: one map-side digest pass into a single global aggregate") {
    val p = plan("table_checksum")
    assert(count(p, "Exchange hashpartitioning") == 0, p)
    assert(!p.contains("Join"), p)
  }

  test("eval_brier: bins aggregate once; totals broadcast, corpus never re-shuffles") {
    val p = plan("eval_brier")
    assert(count(p, "Exchange hashpartitioning") == 1, s"only the bin aggregate shuffles:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 1-row totals must broadcast\n" + p)
  }

  // ------------------------------------------------------------- wave 10

  test("events_ratelimit: ONE key shuffle feeds the sequential fold; no join") {
    val p = plan("events_ratelimit")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"the groupBy(user) is the only exchange:\n$p")
    assert(!p.contains("Join"), "the fold needs no join\n" + p)
    assert(!p.contains("Window"), "clamped state must not fake itself as a window\n" + p)
  }

  test("asof_interp: both directions ride ONE union shuffle — no join, no range explosion") {
    val p = plan("asof_interp")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"one key exchange shared by both window sorts:\n$p")
    assert(!p.contains("Join"), "interpolation must not plan a range join\n" + p)
    assert(p.contains("Union"), p)
  }

  test("sample_budget: quota table broadcasts; one key shuffle for the running sum") {
    val p = plan("sample_budget")
    assert(p.contains("BroadcastHashJoin"), "the recipe must broadcast\n" + p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("sample_dsir: lambda table broadcasts; global cut is TakeOrdered, not a sort") {
    val p = plan("sample_dsir")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must compile to per-partition heaps\n" + p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("SortMergeJoin"), "B-sized joins must broadcast\n" + p)
  }

  test("feature_woe: ONE scan, one category aggregate; totals fold in a stats-sized window") {
    val p = plan("feature_woe")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(count(p, "FileScan") == 1,
      "a second totals aggregate would re-embed the scan\n" + p)
    assert(!p.contains("Join"), "no join needed at all\n" + p)
  }

  test("eval_ece: one bins exchange; the rollup is bins-sized") {
    val p = plan("eval_ece")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("label_pref_pairs: partner match is an equi-join of the pinned ranked table") {
    val p = plan("label_pref_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "rank pairing must stay an equi-join\n" + p)
    assert(!p.contains("FileScan"),
      "both join sides must read the pinned ranked table, not re-rank\n" + p)
  }

  test("label_alpha: the corpus shuffles once (the unit-value aggregate); the rest is pinned") {
    val p = plan("label_alpha")
    assert(!p.contains("FileScan"),
      "every consumer must read the pinned count table\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("linkage_fs: nation-blocked scoring stays an equi-join; no nested loop") {
    val p = plan("linkage_fs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(count(p, "FileScan") <= 2, "one scan per join side at most\n" + p)
  }

  test("events_session_sweep: five gap counts ride ONE lag pass — one key shuffle, no join") {
    val p = plan("events_session_sweep")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Join"), p)
    assert(count(p, "FileScan") == 1, "five thresholds must share the scan\n" + p)
  }

  test("dedup_winnowing: posting self-join stays equi; selection is one compiled map") {
    val p = plan("dedup_winnowing")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // r13: the whole per-doc selection (grams, md5 hashes, window minima,
    // per-doc distinct) runs inside one compiled map — a WindowExec (and
    // its doc-keyed exchange + sort) in the plan would mean the selection
    // regressed to the shuffled formulation
    assert(!p.contains("Window"), s"winnowing selection must stay map-side:\n$p")
    assert(p.contains("MapElements") || p.contains("SerializeFromObject"),
      s"expected the compiled selection kernel in the plan:\n$p")
  }

  test("events_markov_pi: the corpus is scanned once (inside the pinned transition table)") {
    val p = plan("events_markov_pi")
    assert(!p.contains("FileScan"),
      "iterations must read the pinned |types|^2 table, not re-derive it\n" + p)
  }

  test("vocab_kneser_ney: everything after the pinned pair table is vocab-sized; type count broadcasts") {
    val p = plan("vocab_kneser_ney")
    // pair table is pinned (scan shows a checkpointed RDD, not documents)
    assert(!p.contains("FileScan parquet") || !p.contains("documents"),
      "the bigram aggregate must be pinned, not recomputed per consumer\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  // ------------------------------------------------------- waves 31-33

  test("text_mattr: one compiled scan, zero exchanges") {
    val p = plan("text_mattr")
    assert(!p.contains("Exchange"), s"the sliding kernel must not shuffle:\n$p")
  }

  test("orders_emd: prefix sums and gaps stay range-partitioned — no global single-task window") {
    val p = plan("orders_emd")
    assert(p.contains("Exchange rangepartitioning"),
      "Ranks must range-shuffle the merged histogram\n" + p)
    // every Window in the plan is either partition-local (__pid) or over
    // the partitions-sized offsets frame; the corpus-sized global form
    // is the WindowAuditSpec contract, pinned there by measurement
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graph_ra: wedge sweep joins stay equi; top-k is TakeOrdered") {
    val p = plan("graph_ra")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), "the cut must not global-sort\n" + p)
  }

  test("multimodal_dhash: compiled signature scan; candidate join is an equi-join on (chunk, bits)") {
    val p = plan("multimodal_dhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("events_mann_kendall: the day-pair sweep runs over the pinned daily rollup, not the corpus") {
    val p = plan("events_mann_kendall")
    assert(!p.contains("FileScan"),
      "day pairs must join the pinned day×type table, not re-scan events\n" + p)
  }

  test("sample_neyman: one corpus aggregate; the remainder window is strata-sized") {
    val p = plan("sample_neyman")
    assert(count(p, "FileScan") <= 1, s"one sufficient-statistics scan only:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("orders_dup_payments: the pair join is EQUI on (customer, bucket) — no per-customer cross product") {
    val p = plan("orders_dup_payments")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("table_fk_orphans: seven audits, zero cartesian products") {
    val p = plan("table_fk_orphans")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), "orphans must screen via anti-join\n" + p)
  }
}
