package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: replicates the driver's sf0.1 testdata
  * N× (default 10× → "sf1") into a scratch directory, preserving every
  * distributional property the scaling measurements depend on — so the
  * SCALE.md time-vs-rows exponents measure the ENGINE, not an artifact of
  * synthetic data.
  *
  * Replica construction (replica 0 is the base data verbatim):
  *  - **Keys** shift by `r · |base table|` per replica — key spaces stay
  *    dense, FK integrity holds within a replica, and replicas never join
  *    across (exactly how a 10× corpus would look: more customers, more
  *    orders, same dimension tables). region/nation stay fixed (they are
  *    the bounded dimension tables at every scale).
  *  - **Names** (`c_name`/`s_name`) are re-derived from the NEW key with
  *    the base's own `Customer#%09d` format, so name-blocked linkage
  *    (SNM, fuzzy blocks) sees a true 10× entity population, not 10
  *    copies of every name (which would explode block sizes quadratically
  *    — the artifact this generator exists to avoid).
  *  - **Document text**: per-replica rotation of the (small, synthetic)
  *    vocabulary — token `v[i] → v[(i + r) mod |V|]`. Within a replica
  *    every pairwise Jaccard/shingle/simhash relation is ISOMORPHIC to the
  *    base corpus (a bijection on words induces one on shingles), so
  *    near-dup pair counts replicate exactly linearly; across replicas
  *    shingles differ everywhere (a length-3 shingle matches only under
  *    equal rotation), so no cross-replica candidate mass appears. This is
  *    the honest 10× dedup workload: 10× docs, 10× near-dup pairs.
  *  - **Embeddings**: per-replica cyclic rotation of the 64 components —
  *    norms and all within-replica dot products are preserved exactly
  *    (rotation is orthogonal), cross-replica similarities decorrelate.
  *  - **Events** keep their timestamps (10× event density, 10× users —
  *    per-user/session state sizes unchanged, per-window counts 10×: the
  *    realistic stream growth shape).
  *
  * Driver-side scratch tooling (like `tools/check.py`): not part of the
  * library surface, never touches `/root/testdata` (writes only to the
  * given output dir). The one `.collect()` pulls the 31-word document
  * vocabulary — bounded by construction.
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val R = broadcast(spark.range(reps).toDF("__r"))
    def rep(t: String): DataFrame =
      spark.read.parquet(s"$base/$t.parquet").crossJoin(R)
    // Fact tables are REPARTITIONED before writing (round-12 generator
    // lesson 3): the crossJoin(broadcast(R)) pipeline collapses to the
    // base scan's partitioning — ONE output file with ONE giant row
    // group for a small base — and a single-row-group parquet defeats
    // Spark's split-based scan parallelism downstream (the scan
    // advertises maxPartitionBytes splits, but only the split holding
    // the row-group start reads data: `getNumPartitions` said 16 while
    // a partition histogram showed all 6 M sf1 lineitem rows in ONE
    // task). Every scan-adjacent stage of every sfN measurement was
    // silently single-task until its first shuffle. `files` output
    // files ≈ what a real warehouse writer produces at this volume.
    // The floor tracks the SESSION's parallelism (r12 advisor): a
    // hardcoded 16 silently reintroduces the under-parallelized-scan
    // artifact on any harness running more cores than the r12 box.
    val files = math.max(spark.sparkContext.defaultParallelism, reps)
    def write(df: DataFrame, t: String): Unit = {
      df.repartition(files).write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[genscale] wrote $t")
    }
    def writeDim(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[genscale] wrote $t")
    }

    // bounded dimension tables: fixed at every scale, tiny — keep as-is
    writeDim(spark.read.parquet(s"$base/region.parquet"), "region")
    writeDim(spark.read.parquet(s"$base/nation.parquet"), "nation")

    // Strides are DERIVED from the base's actual key ranges, not assumed:
    // stride = max - min + 1 makes replica key ranges contiguous and
    // non-overlapping for ANY base dir (for the driver's 1-based dense
    // keys this reproduces the table size exactly), so FK integrity and
    // the dense-key / no-cross-replica-join properties the SCALE.md
    // exponents depend on hold even when the base is not sf0.1. One tiny
    // (min, max) aggregate per key domain, computed once.
    def stride(t: String, c: String): Long = {
      val r = spark.read.parquet(s"$base/$t.parquet")
        .agg(min(col(c).cast("long")), max(col(c).cast("long"))).head()
      require(!r.isNullAt(0), s"$t.$c: empty key domain")
      r.getLong(1) - r.getLong(0) + 1L
    }
    val custS = stride("customer", "c_custkey")
    val suppS = stride("supplier", "s_suppkey")
    val partS = stride("part", "p_partkey")
    val ordS = stride("orders", "o_orderkey")
    val evS = stride("events", "event_id")
    val userS = stride("events", "user_id")
    val docS = stride("documents", "doc_id")
    val vecS = stride("embeddings", "vec_id")

    def shifted(c: String, stride: Long) = (col(c) + col("__r") * stride).as(c)

    write(rep("customer").select(
      shifted("c_custkey", custS),
      format_string("Customer#%09d", col("c_custkey") + col("__r") * custS).as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")

    write(rep("supplier").select(
      shifted("s_suppkey", suppS),
      format_string("Supplier#%09d", col("s_suppkey") + col("__r") * suppS).as("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier")

    write(rep("part").select(
      shifted("p_partkey", partS),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), "part")

    write(rep("orders").select(
      shifted("o_orderkey", ordS), shifted("o_custkey", custS),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    write(rep("lineitem").select(
      shifted("l_orderkey", ordS), shifted("l_partkey", partS),
      shifted("l_suppkey", suppS),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    write(rep("events").select(
      shifted("event_id", evS), col("ts"), shifted("user_id", userS),
      col("event_type"), col("value"), col("props")), "events")

    // documents: per-replica vocabulary rotation (see scaladoc)
    val docsBase = spark.read.parquet(s"$base/documents.parquet")
    val vocab: Array[String] = docsBase
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .orderBy("w").collect().map(_.getString(0))
    val v = typedLit(vocab.toSeq)
    val nv = vocab.length
    val rotated = transform(
      split(col("text"), " "),
      w => element_at(v, ((array_position(v, w) - 1 + col("__r")) % nv + 1).cast("int")))
    val newText = when(col("text").isNull, lit(null).cast("string"))
      .when(col("__r") === 0, col("text"))
      .otherwise(concat_ws(" ", rotated))
    write(rep("documents")
      .withColumn("__t", newText)
      .select(
        shifted("doc_id", docS),
        col("__t").as("text"), col("lang"), col("source"),
        when(col("__t").isNull, lit(null).cast("long"))
          .otherwise(length(col("__t")).cast("long")).as("n_chars")), "documents")

    // embeddings: per-replica cyclic component rotation (orthogonal)
    val dim = 64
    val rotVec = transform(
      sequence(lit(0), lit(dim - 1)),
      i => element_at(col("embedding"),
        (((i + col("__r")) % dim) + 1).cast("int")))
    write(rep("embeddings").select(
      shifted("vec_id", vecS),
      when(col("__r") === 0, col("embedding"))
        .otherwise(rotVec.cast("array<float>")).as("embedding"),
      col("label")), "embeddings")

    spark.stop()
  }
}
