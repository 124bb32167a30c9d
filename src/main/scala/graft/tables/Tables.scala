package graft.tables

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed mappings of the driver-generated testdata tables (TESTDATA.md).
  * Loaders select exactly the case-class columns so the parquet scan prunes
  * to the fields actually consumed (ReadSchema stays minimal at 100 TB).
  */
case class Region(r_regionkey: Int, r_name: String)

case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)

case class Customer(
    c_custkey: Long,
    c_name: String,
    c_nationkey: Int,
    c_acctbal: Double,
    c_mktsegment: String)

case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)

case class Part(
    p_partkey: Long,
    p_name: String,
    p_brand: String,
    p_type: String,
    p_size: Int,
    p_retailprice: Double)

case class Order(
    o_orderkey: Long,
    o_custkey: Long,
    o_orderstatus: String,
    o_totalprice: Double,
    o_orderdate: java.sql.Timestamp,
    o_orderpriority: String)

case class Lineitem(
    l_orderkey: Long,
    l_partkey: Long,
    l_suppkey: Long,
    l_linenumber: Int,
    l_quantity: Double,
    l_extendedprice: Double,
    l_discount: Double,
    l_tax: Double,
    l_returnflag: String,
    l_linestatus: String,
    l_shipdate: java.sql.Timestamp)

/** `ts` is a microsecond-precision timestamp: the testdata stores
  * parquet `timestamp[us]` with `isAdjustedToUTC=false`, which Spark 4
  * reads as TIMESTAMP_NTZ; [[Tables.events]]/[[Tables.eventsDf]] cast it
  * to the session-zone TIMESTAMP (UTC everywhere in this project), so the
  * wall-clock content is unchanged and every consumer sees one type.
  */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

object Tables {
  private def load[T: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      dir: String,
      table: String): Dataset[T] = {
    val enc = implicitly[org.apache.spark.sql.Encoder[T]]
    val cols = enc.schema.fieldNames.map(org.apache.spark.sql.functions.col _)
    spark.read.parquet(s"$dir/$table.parquet").select(cols.toIndexedSeq: _*).as[T]
  }

  def region(spark: SparkSession, dir: String): Dataset[Region] = {
    import spark.implicits._; load[Region](spark, dir, "region")
  }
  def nation(spark: SparkSession, dir: String): Dataset[Nation] = {
    import spark.implicits._; load[Nation](spark, dir, "nation")
  }
  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._; load[Customer](spark, dir, "customer")
  }
  def supplier(spark: SparkSession, dir: String): Dataset[Supplier] = {
    import spark.implicits._; load[Supplier](spark, dir, "supplier")
  }
  def part(spark: SparkSession, dir: String): Dataset[Part] = {
    import spark.implicits._; load[Part](spark, dir, "part")
  }
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._; load[Order](spark, dir, "orders")
  }
  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._; load[Lineitem](spark, dir, "lineitem")
  }
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    eventsDf(spark, dir)
      .select(implicitly[org.apache.spark.sql.Encoder[Event]]
        .schema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
      .as[Event]
  }

  /** Raw events DataFrame with the microsecond `ts` normalized from
    * TIMESTAMP_NTZ to the session-zone TIMESTAMP (UTC) — wall-clock
    * preserving, and one timestamp type for every downstream op.
    */
  def eventsDf(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._; load[Document](spark, dir, "documents")
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._; load[Embedding](spark, dir, "embeddings")
  }
}
