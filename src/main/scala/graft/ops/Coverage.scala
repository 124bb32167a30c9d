package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection — the submodular data-subset-selection
  * primitive of training-data curation ("pick k documents that together
  * cover the most vocabulary/skills/topics"): each step selects the
  * candidate with the largest MARGINAL gain — items not yet covered by the
  * selected set. The greedy is the Nemhauser–Wolsey–Fisher algorithm with
  * its (1 − 1/e) approximation guarantee for monotone submodular
  * objectives; coverage is the canonical such objective.
  *
  * No reference analog — pipeline-extension layer.
  */
object Coverage {

  /** Greedy max-coverage over a BOUNDED candidate pool.
    *
    * Determinism contract (all integers, no float argmax): gain is a
    * count of uncovered distinct items; ties break toward the smaller id;
    * duplicate items within a document count once. Selection STOPS when
    * the best marginal gain hits 0 (further picks add nothing), so the
    * result may be shorter than `k` — the saturation point is itself
    * signal. Output: (groupCol?, idCol, gain, covered_total, pick) where
    * `covered_total` is the running universe size after the pick.
    *
    * Scale shape: the pool is a RESULT set (a few hundred candidates from
    * an upstream ranking/sample), bounded by construction — the greedy
    * runs in ONE task per group after an id-sorted collect (partitioning-
    * and arrival-order-invariant), k·|pool| set probes against a hash set
    * of covered items; embarrassingly parallel across `groupCol` groups.
    * For pools too large for one task, compose the GreeDi two-round shape
    * with this same operator: partition the pool (any deterministic
    * assignment as `groupCol`), select k per partition in round one, then
    * re-select k over the union of winners — the standard distributed
    * submodular scheme, each round exactly this function.
    */
  def coverageSelect(
      candidates: DataFrame,
      idCol: String,
      itemsCol: String,
      k: Int,
      groupCol: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be positive")
    val greedy = udf { (ids: Seq[Long], items: Seq[Seq[String]]) =>
      val cand = ids.indices
        .map(i => (ids(i), items(i).distinct.toArray))
        .sortBy(_._1)
        .toArray
      val n = cand.length
      val used = new Array[Boolean](n)
      val covered = scala.collection.mutable.HashSet.empty[String]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Int)]
      var m = 0
      var saturated = false
      while (m < math.min(k, n) && !saturated) {
        var bi = -1
        var bg = -1L
        var i = 0
        while (i < n) {
          if (!used(i)) {
            var g = 0L
            val its = cand(i)._2
            var t = 0
            while (t < its.length) { if (!covered.contains(its(t))) g += 1; t += 1 }
            if (g > bg) { bg = g; bi = i } // strict: ties keep the smaller id
          }
          i += 1
        }
        if (bg <= 0L) saturated = true
        else {
          used(bi) = true
          cand(bi)._2.foreach(covered += _)
          out += ((cand(bi)._1, bg, covered.size.toLong, m + 1))
          m += 1
        }
      }
      out.toSeq
    }
    val parts = groupCol.map(col).toSeq
    candidates
      .groupBy(parts: _*)
      .agg(collect_list(struct(
        col(idCol).cast("long").as("i"),
        col(itemsCol).as("s"))).as("__cand"))
      .select(parts :+ explode(greedy(
        transform(col("__cand"), x => x.getField("i")),
        transform(col("__cand"), x => x.getField("s")))).as("__p"): _*)
      .select(parts ++ Seq(
        col("__p._1").as(idCol),
        col("__p._2").as("gain"),
        col("__p._3").as("covered_total"),
        col("__p._4").as("pick")): _*)
  }
}
