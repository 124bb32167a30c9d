package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-overlap analytics between named member sets — "how much do the
  * audiences of two event types / the vocabularies of two sources / the
  * users of two products overlap" — the exact counterpart of the HLL
  * sketch rollups ([[SketchRollup]]) when the group vocabulary is small
  * enough to afford exact pairwise answers.
  */
object Overlap {

  /** Exact |A∩B| / |A| / |B| / Jaccard for every unordered pair of groups
    * that intersect (disjoint pairs produce no row — emitting the full
    * zero matrix would be groups²-sized output for no information).
    *
    * Scale shape: ONE distinct over (group, member) is the only
    * member-sized shuffle; the pair expansion happens PER MEMBER on the
    * member key (a member of g groups emits g(g−1)/2 pairs — bounded by
    * the square of the GROUP vocabulary, not the member count), the
    * intersection aggregate is pair-vocabulary-sized, and the per-group
    * sizes broadcast back onto it. The Jaccard divides exact longs as
    * doubles — IEEE-deterministic, replayed bit-identically by SQL.
    */
  def pairwiseJaccard(df: DataFrame, groupCol: Column, memberCol: Column): DataFrame = {
    val m = df.select(groupCol.as("g"), memberCol.as("m")).distinct()
    val inter = m.select(col("g").as("g_a"), col("m"))
      .join(m.select(col("g").as("g_b"), col("m")), Seq("m"))
      .filter(col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b")
      .agg(count(lit(1)).as("n_inter"))
    val sizes = m.groupBy(col("g")).agg(count(lit(1)).as("n"))
    inter
      .join(broadcast(sizes.select(col("g").as("g_a"), col("n").as("n_a"))), Seq("g_a"))
      .join(broadcast(sizes.select(col("g").as("g_b"), col("n").as("n_b"))), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"), col("n_inter"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
  }
}
