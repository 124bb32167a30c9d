package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk reports — the governance gate a training-data
  * pipeline runs before releasing a derived dataset: quasi-identifier
  * combinations that isolate fewer than k individuals re-identify them
  * (k-anonymity, Sweeney), and groups whose sensitive attribute barely
  * varies leak it even at size ≥ k (l-diversity).
  */
object Privacy {

  /** Per quasi-identifier group: its size `n`, the number of DISTINCT
    * sensitive values it contains (`l_div`), and the two risk flags —
    * `at_risk_k` (n < k: the combination isolates a re-identifiable
    * handful) and `at_risk_l` (l_div < l: everyone in the group shares
    * ~one sensitive value, so membership alone discloses it).
    *
    * Scale shape: ONE shuffle on the quasi-identifier tuple; both
    * counters partial-aggregate map-side (the distinct count is exact —
    * sensitive-attribute cardinality per group is small by nature; at
    * extreme cardinality swap in approx_count_distinct). Output is
    * groups-sized, rows only as large as the quasi-id vocabulary.
    */
  def kAnonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      k: Int,
      l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"need k >= 1 and l >= 1, got k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(sensitive).as("l_div"))
      .withColumn("at_risk_k", col("n") < k)
      .withColumn("at_risk_l", col("l_div") < l)
  }
}
