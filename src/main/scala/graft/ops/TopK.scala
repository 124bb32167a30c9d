package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import scala.collection.mutable

/** Distributed top-k per key without a global per-key sort.
  *
  * The window formulation (`row_number() over (partition by k order by v) <=
  * k`) shuffles and sorts EVERY row of every key. This operator keeps a
  * bounded k-element heap per key per partition map-side, shuffles only the
  * ≤ partitions·k survivors per key, and finishes with a per-key merge —
  * the classic combiner pattern applied to ranking. At 100 TB with k=3 it
  * moves ~k·partitions rows per key instead of all of them.
  *
  * Ordering: descending on `orderCol`, ascending on `tieCol` (must be
  * unique per row for deterministic ranks) — both must be Comparable.
  */
object TopK {

  private def rowOrdering(orderIdx: Int, tieIdx: Int): Ordering[Row] =
    new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val c = a.getAs[Any](orderIdx).asInstanceOf[Comparable[Any]]
          .compareTo(b.getAs[Any](orderIdx))
        if (c != 0) -c // descending on the order column
        else a.getAs[Any](tieIdx).asInstanceOf[Comparable[Any]]
          .compareTo(b.getAs[Any](tieIdx))
      }
    }

  /** The heap comparator casts external row values to `Comparable` — fine
    * for every atomic column type (numeric, decimal, string, date,
    * timestamp, boolean) but a struct/array/map/binary order column would
    * surface as an opaque ClassCastException mid-job. Checked loudly here.
    */
  private def requireComparable(df: DataFrame, c: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    val ok = dt match {
      case _: NumericType | StringType | DateType | TimestampType | TimestampNTZType |
          BooleanType =>
        true
      case _ => false
    }
    require(ok,
      s"TopK order/tie column '$c' must be an atomic comparable type " +
        s"(numeric/decimal/string/date/timestamp/boolean), got $dt; " +
        "project the ordering value into an atomic column first")
  }

  /** @return input columns plus an IntegerType `rank` (1-based). */
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    require(k > 0)
    requireComparable(df, orderCol)
    requireComparable(df, tieCol)
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val ord = rowOrdering(schema.fieldIndex(orderCol), schema.fieldIndex(tieCol))
    val enc = Encoders.row(schema)

    def partialTopK(it: Iterator[Row]): Iterator[Row] = {
      // per-key bounded "heap": reverse-ordered so the head is the worst
      // retained row, evicted when a better one arrives
      val heaps = mutable.Map.empty[Seq[Any], mutable.PriorityQueue[Row]]
      it.foreach { row =>
        val key = keyIdx.map(row.getAs[Any])
        val h = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty(ord))
        if (h.size < k) h.enqueue(row)
        else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    val partial = df.mapPartitions(partialTopK _)(enc)
    val located = partial.repartition(keyCols.map(col).toIndexedSeq: _*)
    val outSchema = StructType(schema.fields :+ StructField("rank", IntegerType, nullable = false))
    located.mapPartitions { it =>
      val byKey = mutable.Map.empty[Seq[Any], mutable.ArrayBuffer[Row]]
      it.foreach { row =>
        byKey.getOrElseUpdate(keyIdx.map(row.getAs[Any]), mutable.ArrayBuffer.empty) += row
      }
      byKey.valuesIterator.flatMap { rows =>
        rows.sorted(ord).iterator.take(k).zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ (i + 1))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Skyline (Pareto-optimal set, Börzsönyi et al. 2001): the rows no other
    * row dominates. `dims` lists (column, minimize?) objectives; row b
    * dominates row a when b is ≤ a on every minimized dim / ≥ on every
    * maximized dim, with at least one strict. Rows tied on EVERY dim never
    * dominate each other — coordinate duplicates all survive. The result is
    * a SET, so it is deterministic under any partitioning or arrival order.
    *
    * Scale shape — the classic two-phase reduction: phase 1 computes a
    * LOCAL skyline per partition map-side (a running non-dominated buffer;
    * memory = local skyline size, which for d conflicting objectives over
    * n rows concentrates around O(log^(d-1) n), thousands not billions);
    * phase 2 re-runs the same pass over the union of local skylines in one
    * task. Only local-skyline survivors ever move — at 100 TB the shuffle
    * is skyline-sized, not data-sized. A final skyline too large for one
    * task means the objectives barely conflict (near-total order) — pick
    * fewer/other dims; the all-pairs NOT EXISTS alternative every SQL
    * engine falls back to is O(n²) over the FULL table and strictly worse.
    *
    * Dim columns must be numeric and non-null (null preference is
    * undefined; rows with a null dim are excluded, loudly documented
    * here). Values compare as doubles — exact for the numeric types SQL
    * practice puts in objectives (ints up to 2⁵³, all floats/doubles).
    */
  def skyline(df: DataFrame, dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one objective")
    val schema = df.schema
    val idx = dims.map { case (c, minimize) => (schema.fieldIndex(c), minimize) }
    def keyOf(r: Row): Array[Double] = {
      val a = new Array[Double](idx.length)
      var i = 0
      idx.foreach { case (fi, minimize) =>
        val v = r.get(fi).asInstanceOf[Number].doubleValue()
        a(i) = if (minimize) v else -v
        i += 1
      }
      a
    }
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var allLe = true
      var oneLt = false
      var i = 0
      while (i < a.length && allLe) {
        if (a(i) > b(i)) allLe = false
        else if (a(i) < b(i)) oneLt = true
        i += 1
      }
      allLe && oneLt
    }
    def pass(it: Iterator[Row]): Iterator[Row] = {
      val buf = mutable.ArrayBuffer.empty[(Array[Double], Row)]
      it.foreach { r =>
        val k = keyOf(r)
        if (!buf.exists { case (kb, _) => dominates(kb, k) }) {
          buf.filterInPlace { case (kb, _) => !dominates(k, kb) }
          buf += ((k, r))
        }
      }
      buf.iterator.map(_._2)
    }
    val enc = Encoders.row(schema)
    val nonNull = df.filter(dims.map { case (c, _) => col(c).isNotNull }.reduce(_ && _))
    nonNull.mapPartitions(pass _)(enc).coalesce(1).mapPartitions(pass _)(enc)
  }
}
