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

  /** Noised count release — the governance mechanism behind
    * differentially-private count tables (Laplace(1/ε) via the inverse
    * CDF), with the randomness drawn from md5(salt, key) so a release is
    * REPRODUCIBLE and auditable. Stated plainly: a fixed seed is NOT
    * differential privacy (an adversary who knows the salt can subtract
    * the noise); this is the deterministic mechanism demo + release
    * pipeline — swap the hash for fresh entropy at deployment and the
    * arithmetic, sensitivity-1 scaling, and gate-checked plumbing carry
    * over unchanged.
    *
    * Exactness: u = first 8 md5 hex chars over 16⁸ (a 32-bit uniform);
    * the Laplace magnitude `−ln(arg)` rides the 2²⁰ grid-floored-ln
    * discipline (ONE libm call per group on a correctly-rounded double
    * ratio), ε = `epsNumer/epsDenom` scales it in pure integer arithmetic
    * (nonnegative, so DIV == floor), and the released value is
    * `n ± mag/2²⁰` with the single closing division.
    *
    * Scale shape: one group aggregate; the noise is a per-GROUP scalar
    * expression — output-sized work after the count.
    *
    * @return (keyCols*, n, released_grid, released)
    */
  def noisedCounts(
      df: DataFrame,
      keyCols: Seq[String],
      epsNumer: Long,
      epsDenom: Long,
      salt: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(epsNumer > 0 && epsDenom > 0, s"epsilon must be > 0")
    val U = 4294967296L // 16^8
    val keyStr = concat_ws("\u001f",
      lit(salt) +: keyCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("__u", conv(substring(md5(keyStr), 1, 8), 16, 10).cast("long"))
    // u < 1/2: X = b*ln(2u) <= 0 (arg odd-shifted off zero); u >= 1/2:
    // X = -b*ln(2-2u) >= 0 — magnitude = -ln(arg/U) in both branches
    val argN = when(col("__u") * 2 < U, col("__u") * 2 + 1)
      .otherwise((lit(U) - col("__u")) * 2)
    val magGrid = floor(
      log(lit(U.toDouble) / argN.cast("double")) * lit(1048576.0)).cast("long")
    val magScaled = expr(s"__mag * $epsDenom DIV $epsNumer")
    counts
      .withColumn("__mag", magGrid)
      .withColumn("released_grid",
        when(col("__u") * 2 < U, col("n") * 1048576L - magScaled)
          .otherwise(col("n") * 1048576L + magScaled))
      .withColumn("released", col("released_grid").cast("double") / 1048576.0)
      .select(keyCols.map(col) :+ col("n") :+
        col("released_grid") :+ col("released"): _*)
  }
}
