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

  /** Deterministic FORMAT-PRESERVING pseudonymization of a short
    * identifier column (account numbers, phones, member ids): each digit
    * maps to a digit, each letter to a letter of the same case, and every
    * other character (dashes, dots, '@') passes through — so downstream
    * parsers, length checks, and UIs keep working on the masked value.
    *
    * Determinism & linkability: the shift for position i is derived from
    * `md5(salt ‖ value ‖ ':' ‖ i)`, so equal inputs map to equal tokens
    * (joins on the pseudonym still link records — the point of
    * pseudonymization over redaction) and different salts give unlinkable
    * domains. NOT cryptographic FPE (md5 is not a PRP and the salt sits
    * in the expression) — this is the governance-tier masking for
    * datasets that must stay joinable, not an encryption substitute; for
    * adversarial settings use a real FF1/FF3 implementation with managed
    * keys.
    *
    * Scale shape: pure Column chain (one md5 per character of a SHORT id
    * — bounded per row), zero shuffle, whole-stage codegen; identical
    * arithmetic replays in the DuckDB oracle (ascii-mapped hex bytes, no
    * engine-specific conv()).
    */
  def pseudonymize(value: Column, salt: String): Column = {
    // 0..255 from the first two md5 hex chars, via ascii arithmetic that
    // both engines evaluate identically
    def hex(c: Column): Column =
      when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)
    val masked = transform(
      sequence(lit(1), length(value)),
      i => {
        val ch = value.substr(i, lit(1))
        val h = md5(concat(lit(salt), value, lit(":"), (i - 1).cast("string")))
        val shift = hex(h.substr(lit(1), lit(1))) * 16 + hex(h.substr(lit(2), lit(1)))
        val digit = (ascii(ch) - 48 + shift) % 10 + 48
        val lower = (ascii(ch) - 97 + shift) % 26 + 97
        val upper = (ascii(ch) - 65 + shift) % 26 + 65
        when(ch.between("0", "9"), chr(digit))
          .when(ch.between("a", "z"), chr(lower))
          .when(ch.between("A", "Z"), chr(upper))
          .otherwise(ch)
      })
    when(value.isNull, lit(null).cast("string"))
      .otherwise(array_join(masked, ""))
  }
}
