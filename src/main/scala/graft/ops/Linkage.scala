package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: candidate pairs share a cheap equality
  * BLOCKING key (a prefix, a phonetic code, a normalized field), then exact
  * edit distance decides within blocks — the classic dedup/linkage shape
  * for entity records (names, addresses, identifiers), complementing the
  * token-set (MinHash/Jaccard) family which ignores character-level edits.
  *
  * Scale shape: one shuffle on the block key ships (id, name) only; the
  * quadratic work is confined within blocks exactly like
  * [[Dedup.ngramJaccardPairs]]'s block contract — choose the key so blocks
  * stay bounded. The distance is Spark's BANDED levenshtein (threshold
  * form): the DP early-exits at `maxDist+1`, so per-pair cost is
  * O(maxDist · len), not O(len²). Recall is exactly the blocking recall:
  * pairs in different blocks are never compared, stated honestly — a
  * multi-pass scheme (several keys, union) buys more recall at more cost.
  */
object Linkage {

  /** Persisted frames whose lifetime must extend past the operator call
    * (the caller consumes them lazily), ONE SLOT PER OPERATOR: a repeat
    * invocation unpersists the previous pin before installing its own, so
    * a library caller looping over [[sortedNeighborhoodPairs]] holds at
    * most one cached rank table per operator at any time — never an
    * unbounded block accumulation. [[releaseShared]] drains the slots;
    * Bench/Verify call it at shutdown alongside the other shared caches.
    *
    * The one-slot rule's contract: results of a PREVIOUS call to the same
    * operator must be fully consumed before the next call, or the earlier
    * result recomputes its rank stage from lineage (correct, just uncached).
    */
  private val pinned =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Install `df` as operator `slot`'s live pin, releasing the previous
    * occupant's storage (blocking=false — in-flight consumers of the old
    * frame fall back to lineage recompute, never to wrong results).
    */
  private def pin(slot: String, df: DataFrame): Unit = {
    val prev = pinned.put(slot, df)
    if (prev != null && (prev ne df)) prev.unpersist(blocking = false)
  }

  /** Unpersist every frame pinned by operators in this module. */
  def releaseShared(): Unit = {
    pinned.forEach((_, df) => df.unpersist(blocking = false))
    pinned.clear()
  }

  /** Pairs (id_a < id_b) sharing `blockKey` with
    * `levenshtein(name_a, name_b) <= maxDist`, plus the exact distance.
    */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    Dedup.requireIntegralId(df, idCol)
    val a = df.select(
      col(idCol).as("id_a"), col(nameCol).as("name_a"), blockKey.as("__blk"))
    val b = df.select(
      col(idCol).as("id_b"), col(nameCol).as("name_b"), blockKey.as("__blk"))
    a.join(b, "__blk")
      .filter(col("id_a") < col("id_b"))
      // threshold form: banded DP, returns -1 when the distance exceeds it
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Multi-pass blocking: candidates are pairs sharing ANY of `blockKeys`
    * (each key is an independent pass — a prefix pass catches typos in the
    * tail, a suffix or phonetic pass catches typos in the head), unioned
    * and DEDUPLICATED before the levenshtein gate so a pair matching on
    * several keys pays the edit-distance DP once. This is the standard
    * recall lever over single-key blocking: a true pair is lost only if it
    * disagrees on EVERY key.
    *
    * Scale shape: the explode ships each (id, name) once per key — k keys
    * = k× the single-pass shuffle volume plus one dedup shuffle on the
    * candidate ids; quadratic work remains confined within (key, value)
    * blocks. Key values are compared as strings per key INDEX, so key 1's
    * value "x" never blocks against key 2's "x"; null key values produce
    * no candidates for that pass.
    */
  def fuzzyPairsMultiKey(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKeys: Seq[Column],
      maxDist: Int): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    Dedup.requireIntegralId(df, idCol)
    val keyed = df.select(
      col(idCol).as("id"),
      col(nameCol).as("name"),
      posexplode(array(blockKeys.map(_.cast("string")): _*)).as(Seq("__ki", "__blk")))
      .filter(col("__blk").isNotNull)
    val a = keyed.select(
      col("__ki"), col("__blk"), col("id").as("id_a"), col("name").as("name_a"))
    val b = keyed.select(
      col("__ki"), col("__blk"), col("id").as("id_b"), col("name").as("name_b"))
    a.join(b, Seq("__ki", "__blk"))
      .filter(col("id_a") < col("id_b"))
      // dedup BEFORE the DP: a pair found by several passes is gated once
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** EXACT edit-distance ≤ 1 self-join WITHOUT a blocking key — the
    * deletion-neighborhood signature scheme (FastSS family, public
    * literature): a string's signatures are itself plus each of its |s|
    * single-character deletions, and any two strings with `ed ≤ 1`
    * PROVABLY share one (equal → the string itself; one substitution at
    * i → both sides' deletion at i; one insert/delete → the longer
    * side's deletion equals the shorter string). The candidate stage is
    * therefore lossless — the oracle is plain brute-force levenshtein
    * and equality IS the proof. Shared signatures can also arise at
    * ed = 2 (delete i from one, j from the other), so ONE exact banded
    * levenshtein per candidate removes false positives.
    *
    * This closes the recall gap [[fuzzyPairs]] states honestly: no
    * caller-chosen blocking key to miss cross-block pairs. The price is
    * (len+1)·N signature postings instead of N blocked rows — the right
    * trade for short identifier strings (names, SKUs, codes); for long
    * text use the token-set family.
    *
    * Scale shape: signatures hash to 8-byte keys map-side (collisions
    * only ADD candidates — verification is exact); one shuffle of the
    * postings; candidate volume is signature-bucket bounded; the string
    * table joins back only onto candidates.
    */
  def editOnePairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    Dedup.requireIntegralId(df, idCol)
    // pin one evaluation of the (id, str) projection; the postings CARRY
    // the string (short identifier strings are this op's documented
    // domain, so a ~20-byte payload per posting beats joining the string
    // table back onto a candidate set that is often 50× larger — the r12
    // shape paid two candidate-sized join shuffles for it). Dedup runs
    // AFTER the banded levenshtein: a pair surfaces once per shared
    // signature (duplicate verifications are O(len) each, far cheaper
    // than a candidate-sized distinct exchange), and the survivor set the
    // dropDuplicates shuffles is edit-distance-1-sized — tiny.
    val s = df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("str"))
      .localCheckpoint(true)
    val deletions = transform(
      sequence(lit(1), length(col("str"))),
      i => concat(col("str").substr(lit(1), i - lit(1)),
        col("str").substr(i + lit(1), length(col("str")))))
    val post = s.select(col("id"), col("str"),
      explode(array_distinct(transform(
        concat(array(col("str")), deletions), g => xxhash64(g)))).as("sig"))
      .localCheckpoint(true)
    post.select(col("sig"), col("id").as("id_a"), col("str").as("__a"))
      .join(post.select(col("sig"), col("id").as("id_b"), col("str").as("__b")),
        Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("__a"), col("__b"), 1))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Sorted-neighborhood linkage (Hernández & Stolfo 1995) — the THIRD
    * blocking paradigm next to equality blocking ([[fuzzyPairs]]) and
    * signature blocking ([[editOnePairs]]): sort the records by a
    * carefully chosen key and compare each record only with its `window`
    * nearest neighbors in that order. Recall is positional — a true pair
    * is lost only when more than `window` records sort between them — so
    * it degrades GRACEFULLY with typo position, where prefix-equality
    * blocking falls off a cliff at the first character.
    *
    * Candidate generation is an EQUI-join in disguise: each record at
    * sorted rank r pairs with ranks r+1..r+window, produced by exploding
    * the offsets and joining `rank_b = rank_a + k` — no inequality join,
    * no per-pair shuffle beyond one hash join on the computed rank key.
    * The global rank is a DISTRIBUTED range-partitioned prefix sum
    * ([[Ranking.abcClassify]]'s discipline): range-repartition on
    * (key, id), pin ONE evaluation (range boundaries come from sampling),
    * count per partition (a partitions-sized table), broadcast the running
    * offsets back, and each row's global rank is its offset plus a
    * PARTITION-LOCAL row_number — identical ranks, no single-task sort
    * anywhere (plan-audited). The rank equi-join then ships each record
    * `window` times — the halo — and pairs stay hash-local to the rank key.
    *
    * Output: (id_a, id_b, dist) with id_a < id_b enforced AFTER the rank
    * pairing (the sort order and the id order may disagree), distance
    * gated by the banded levenshtein exactly as the sibling operators.
    *
    * Caching contract: the rank table is persisted (MEMORY_AND_DISK) so
    * the probe and build sides of the rank join share one evaluation, and
    * it OUTLIVES this call because the returned frame is lazy. The pin
    * lives in a per-operator slot — a repeat call releases the previous
    * call's pin automatically — and long-lived callers should invoke
    * [[releaseShared]] when done with the results (Bench/Verify do, at
    * shutdown) to drop the last one.
    */
  def sortedNeighborhoodPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      sortKey: Column,
      window: Int,
      maxDist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1 && maxDist >= 0, s"need window >= 1, maxDist >= 0")
    Dedup.requireIntegralId(df, idCol)
    val s = df
      .filter(col(nameCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(nameCol).as("name"),
        sortKey.as("__k"))
    val ordered = s
      .repartitionByRange(col("__k").asc, col("id").asc)
      .sortWithinPartitions(col("__k").asc, col("id").asc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition row counts → running offsets: a partitions-sized table,
    // so its ordering window is over #partitions rows, never corpus rows
    val offs = ordered
      .groupBy(col("__pid")).agg(count(lit(1)).as("__pc"))
      .withColumn("__off",
        coalesce(
          sum(col("__pc")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    val wIn = Window.partitionBy("__pid").orderBy(col("__k").asc, col("id").asc)
    // persist (not checkpoint): probes + the rank join both consume the
    // ranks; a recompute is safe because `ordered` above is the pinned
    // stage, and keeping the lineage lets the plan audit SEE the
    // partition-local window (no single-task sort) in the final plan
    val ranked = ordered
      .join(broadcast(offs), Seq("__pid"))
      .withColumn("__r", col("__off") + row_number().over(wIn))
      .select("id", "name", "__r")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the rank cache once, then release the upstream pin
    // immediately: in a long bench JVM repeated invocations would
    // otherwise accumulate MEMORY_AND_DISK blocks until ContextCleaner
    // happens to collect the references. `ranked` must outlive this call
    // (the caller consumes it lazily), so it goes through the release
    // registry drained by Bench/Verify at shutdown instead.
    ranked.count()
    ordered.unpersist(blocking = false)
    pin("sortedNeighborhoodPairs", ranked)
    val probes = ranked.select(
      col("id").as("ia"), col("name").as("na"),
      explode(sequence(col("__r") + 1, col("__r") + window)).as("__r"))
    probes
      .join(ranked.select(col("id").as("ib"), col("name").as("nb"), col("__r")), "__r")
      .withColumn("dist", levenshtein(col("na"), col("nb"), maxDist))
      .filter(col("dist") >= 0)
      .select(
        least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        col("dist"))
  }

  /** Fellegi–Sunter (1969, the probabilistic record-linkage standard)
    * agreement weights as PLAN-TIME integer constants: for a field with
    * match probability m = mNum/mDen (P(agree | same entity)) and chance
    * probability u = uNum/uDen (P(agree | different entities)), the
    * log-likelihood-ratio weights on the 2²⁰ grid are
    * `w_agree = ⌊2²⁰·ln(m/u)⌋` and `w_disagree = ⌊2²⁰·ln((1−m)/(1−u))⌋`.
    * Both are computed ONCE from exact rational ratios at plan build (the
    * eval_ndcg frozen-constant pattern — the oracle builder calls this
    * same function, so the literals cannot drift), and a record pair's
    * match score is then pure integer addition over its agreement
    * pattern — exact, partitioning-invariant, engine-replayable.
    */
  def fsWeights(mNum: Long, mDen: Long, uNum: Long, uDen: Long): (Long, Long) = {
    require(mNum > 0 && uNum > 0 && mNum < mDen && uNum < uDen,
      s"need 0 < u,m < 1 as proper fractions, got m=$mNum/$mDen u=$uNum/$uDen")
    require(mNum * uDen > uNum * mDen, s"need m > u (an informative field)")
    val wa = math.floor(math.log(
      (mNum * uDen).toDouble / (mDen * uNum).toDouble) * 1048576.0).toLong
    val wd = math.floor(math.log(
      ((mDen - mNum) * uDen).toDouble / (mDen * (uDen - uNum)).toDouble)
      * 1048576.0).toLong
    (wa, wd)
  }

  /** The pair score for an agreement pattern: Σ over fields of
    * `w_agree` when the field agrees, `w_disagree` when it disagrees, 0
    * when either side is missing (the FS missing-data convention — an
    * unobserved comparison carries no evidence).
    */
  def fsScore(fields: Seq[(Column, (Long, Long))]): Column = {
    require(fields.nonEmpty, "need at least one field")
    fields.map { case (agree, (wa, wd)) =>
      when(agree.isNull, 0L).when(agree, wa).otherwise(wd)
    }.reduce(_ + _)
  }
}
