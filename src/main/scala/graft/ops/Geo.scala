package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar proximity operators on an integer coordinate grid — the spatial
  * self-join family (store clustering, co-location mining, contact
  * tracing, near-duplicate GPS fixes). Coordinates are integer grid units
  * (e.g. micro-degrees under an equirectangular projection, or metres in
  * a local planar CRS): distances are EXACT long arithmetic, so results
  * replay bit-for-bit cross-engine — the same integer-grid discipline as
  * the int8 ANN path. True great-circle distance lives in
  * [[haversineKm]] (doubles; spec-pinned, not oracle territory).
  *
  * No reference analog — pipeline-extension layer.
  */
object Geo {

  /** All unordered pairs `(id_a < id_b)` within L2 distance ≤ `r` grid
    * units: `d² = (Δx)² + (Δy)² ≤ r²`, exact in longs.
    *
    * Scale shape — grid-cell blocking, NOT an all-pairs join: each point
    * hashes to its `r×r` home cell (`⌊x/r⌋, ⌊y/r⌋`); any qualifying pair's
    * cells differ by ≤ 1 per axis, so the build side posts each point
    * ONCE and the probe side posts 9 copies (one per 3×3 neighbor
    * offset). A pair can meet at exactly ONE offset — the one mapping
    * b's home onto a's home — so no dedup pass is needed: the join output
    * is candidate pairs, each verified by one exact distance comparison.
    * Work = 9·N posting rows shuffled by cell key + per-cell products
    * (density-bounded, the r-choice contract), never N². Skewed hot
    * cells mean r is too large for the data's density — shrink r or
    * pre-split hot cells; the 3×3 contract is unaffected.
    *
    * @return (id_a, id_b, dist2) — dist2 in squared grid units
    */
  def radiusPairs(
      df: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      r: Long): DataFrame = {
    require(r >= 1, s"radius must be >= 1 grid unit, got $r")
    Dedup.requireIntegralId(df, idCol)
    val pts = df
      .select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    // floor division via double is exact for |coord| < 2^53 and replays
    // identically in any engine (integer `/` truncates toward zero and
    // would mis-cell negative coordinates)
    def cellOf(c: Column) = floor(c.cast("double") / r.toDouble).cast("long")
    val home = pts.select(col("id"), col("x"), col("y"),
      cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"))
    val offsets = for { dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L) } yield (dx, dy)
    val probe = home
      .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        col("cx").as("hbx"), col("cy").as("hby"),
        explode(typedLit(offsets)).as("o"))
      .select(col("id_b"), col("xb"), col("yb"),
        (col("hbx") + col("o._1")).as("cx"), (col("hby") + col("o._2")).as("cy"))
    val d2 = (col("x") - col("xb")) * (col("x") - col("xb")) +
      (col("y") - col("yb")) * (col("y") - col("yb"))
    home
      .join(probe, Seq("cx", "cy"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"), d2.as("dist2"))
      .filter(col("dist2") <= r * r)
  }

  /** Per-cell occupancy stats for a `cellSize`-unit grid: count, the
    * cell's observed bounding box, and the integer centroid-numerators
    * (`Σx, Σy` — divide by `n` downstream; shipping exact sums keeps the
    * row replayable and re-aggregatable to coarser grids). One map-side
    * partial aggregate shuffled by cell key — the heatmap/zonemap
    * primitive at any scale.
    */
  def cellStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      cellSize: Long): DataFrame = {
    require(cellSize >= 1, s"cellSize must be >= 1 grid unit, got $cellSize")
    def cellOf(c: Column) = floor(c.cast("double") / cellSize.toDouble).cast("long")
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"))
      .agg(
        count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"),
        sum("x").as("sx"), sum("y").as("sy"))
  }

  /** Great-circle distance in km between two (lat, lon) degree pairs —
    * the haversine formula on a 6371 km sphere. Double-valued (sin/cos
    * are libm territory — spec-pinned against a Scala replica, not
    * oracle-replayable; use [[radiusPairs]]' integer grid when bit
    * stability matters).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val rad = math.Pi / 180.0
    val dLat = (lat2 - lat1) * rad
    val dLon = (lon2 - lon1) * rad
    val a = pow(sin(dLat / 2), 2) +
      cos(lat1 * rad) * cos(lat2 * rad) * pow(sin(dLon / 2), 2)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }
}
