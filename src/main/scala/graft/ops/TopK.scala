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
}
