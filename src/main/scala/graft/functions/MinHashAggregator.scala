package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate: element-wise minimum over MinHash signatures —
  * the signature of a *union of sets* is the element-wise min of the sets'
  * signatures, so grouping documents (by source, shard, dump…) and reducing
  * with this aggregator yields the group's corpus-level MinHash without ever
  * materializing the union.
  *
  * The shape SURVEY §4 anticipates for sketch extensions: an
  * `Aggregator[IN, BUF, OUT]` has a tiny fixed-size buffer, merges
  * associatively/commutatively (map-side partial aggregation works), and
  * ships as one row per group — O(groups · k) state at any scale.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
    var i = 0
    val n = math.min(buf.length, sig.length)
    while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {

  /** Column form, usable in `groupBy(...).agg(...)`. */
  def groupSignature(sigCol: org.apache.spark.sql.Column, numHashes: Int): org.apache.spark.sql.Column = {
    import scala.reflect.runtime.universe.TypeTag
    implicitly[TypeTag[Array[Long]]] // ensure the runtime-universe tag resolves
    org.apache.spark.sql.functions.udaf(new MinHashAggregator(numHashes)).apply(sigCol)
  }

  /** Estimated Jaccard between two group signatures: fraction of agreeing
    * components.
    */
  def estimatedJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length && a.nonEmpty)
    a.indices.count(i => a(i) == b(i)).toDouble / a.length
  }
}
