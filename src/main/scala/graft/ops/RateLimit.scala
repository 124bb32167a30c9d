package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-bucket admission control replayed over a historical event stream:
  * which events WOULD a per-key rate limiter of `capacity` burst tokens and
  * one-token-per-`refillMicros` sustained rate have admitted? The question
  * every abuse/quota audit asks before a limiter ships ("how much traffic
  * does this policy cut, and whose"), and the labeling step that turns raw
  * logs into admitted/throttled training signals.
  *
  * Semantics (the classic token bucket, integer-exact): the bucket starts
  * FULL. An event at time t sees `avail = min(cap, tokens + (t − t_prev))`
  * in token-scaled µs units (1 token ≡ `refillMicros` units, so refill is
  * literally the elapsed µs), is admitted iff `avail ≥ refillMicros`, and
  * an admitted event spends its token. Events are ordered per key by
  * `(ts, id)` — the id tiebreak makes equal-timestamp bursts resolve
  * deterministically under any partitioning.
  *
  * The recurrence is a CLAMPED running state (the min() resets history), so
  * no window expresses it: like [[Packing]]'s FFD and the Holt fold, it runs
  * as a sequential `aggregate` HOF over each key's time-sorted event array —
  * ONE shuffle (the groupBy), per-key memory = that key's event list. That
  * per-key sequencing is inherent to the semantics (each verdict depends on
  * every prior verdict); keys are independent, so 100 TB of events across
  * millions of users parallelizes to per-user sequential folds, and the
  * documented contract is per-key event counts that fit an executor (true of
  * user-keyed telemetry; a key with 10⁸ events is the pathology a limiter
  * exists to prevent). All arithmetic is int64 µs — bit-exact cross-engine.
  *
  * No reference analog — pipeline-extension layer.
  */
object RateLimit {

  /** @param capacity   burst size in whole tokens (≥ 1)
    * @param refillMicros µs to mint one token (> 0); sustained rate =
    *                     1 event per `refillMicros`
    * @return one row per input event: (keyCols*, idCol, admitted) —
    *         admitted=false is the throttled set
    */
  def tokenBucket(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      capacity: Int,
      refillMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(refillMicros > 0, s"refillMicros must be > 0, got $refillMicros")
    val capS = capacity * refillMicros
    val folded = df
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        unix_micros(col(tsCol)).as("t"), col(idCol).as("id")))).as("__ev"))
      .select(keyCols.map(col) :+
        aggregate(
          col("__ev"),
          // tokens = capS and last = 0 make the first refill clamp to full
          struct(lit(capS).as("tokens"), lit(0L).as("last"),
            array().cast("array<struct<id:bigint,admitted:boolean>>").as("out")),
          (acc, e) => {
            val avail = least(lit(capS),
              acc.getField("tokens") + (e.getField("t") - acc.getField("last")))
            val adm = avail >= lit(refillMicros)
            struct(
              (avail - when(adm, lit(refillMicros)).otherwise(lit(0L))).as("tokens"),
              e.getField("t").as("last"),
              concat(acc.getField("out"),
                array(struct(e.getField("id").cast("long").as("id"),
                  adm.as("admitted")))).as("out"))
          },
          acc => acc.getField("out")).as("__out"): _*)
      .select(keyCols.map(col) :+ explode(col("__out")).as("__e"): _*)
    folded.select(keyCols.map(col) :+
      col("__e.id").as(idCol) :+ col("__e.admitted").as("admitted"): _*)
  }
}
