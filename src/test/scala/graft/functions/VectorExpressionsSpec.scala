package graft.functions

import graft.TestSpark
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd DotProduct must be bitwise-equal to the higher-order
  * reference formulation — the kNN oracle depends on exact doubles.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen dot == HOF dot bitwise on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .limit(2000)
    val diff = pairs
      .select(
        VectorExpressions.dotProduct(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("codegen intDot == HOF intDot bitwise on quantized embeddings") {
    val e = Similarity.quantizeInt8(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), "embedding")
    val pairs = e.select(col("vec_id").as("a_id"), col("q").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("q").as("b")))
      .limit(2000)
    val diff = pairs
      .select(
        Similarity.intDot(col("a"), col("b")).as("native"),
        Similarity.intDotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("fused int8UnitCodes == staged HOF unitNormalize+quantizeInt8 bitwise") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hof = Similarity
      .quantizeInt8(Similarity.unitNormalize(e, "embedding", "__u"), "__u")
      .select(col("vec_id"), col("q"))
    val native = e.select(
      col("vec_id"),
      VectorExpressions.int8UnitCodes(col("embedding")).as("qn"))
    val joined = hof.join(native, "vec_id")
    assert(joined.filter(col("q") =!= col("qn")).count() == 0)
    // zero vector and empty array edge cases
    val edge = Seq(
      (1L, Seq(0.0f, 0.0f)),
      (2L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val got = edge.select(VectorExpressions.int8UnitCodes(col("embedding")))
      .as[Seq[Int]].collect()
    assert(got(0) == Seq(0, 0) && got(1) == Seq.empty)
  }

  test("intDot nulls, SQL registration, and interpreted eval") {
    val df = Seq(
      (Some(Seq(1, -2, 3)), Some(Seq(4, 5, -6))),
      (None, Some(Seq(1))),
      (Some(Seq(1)), None)).toDF("a", "b")
    val r = df.select(Similarity.intDot(col("a"), col("b"))).collect()
    assert(r(0).getLong(0) == (4 - 10 - 18).toLong)
    assert(r(1).isNullAt(0) && r(2).isNullAt(0))
    GraftFunctions.register(spark)
    df.limit(1).createOrReplaceTempView("intdot_sql")
    assert(spark.sql("SELECT int_dot_product(a, b) AS d FROM intdot_sql")
      .head.getLong(0) == -24L)
    assert(spark.sql("SELECT int8_unit_codes(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS q")
      .head.getSeq[Int](0) == Seq(95, 127))
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(100, -100, 127))
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(arr,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))
    assert(IntDotProduct(lit, lit).eval(null) == (10000L + 10000L + 16129L))
  }

  test("dim mismatch yields NULL (codegen + interpreted), matching the HOF") {
    // the HOF zip_with null-pads the shorter side, so its fold is null;
    // the native kernels must agree instead of silently truncating
    val df = Seq(
      (Seq(1, 2, 3), Seq(4, 5)),
      (Seq(1, 2), Seq(4, 5))).toDF("a", "b")
    val got = df.select(
      Similarity.intDot(col("a"), col("b")).as("native"),
      Similarity.intDotHof(col("a"), col("b")).as("hof")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(got(1).getLong(0) == 14L && got(1).getLong(1) == 14L)
    val dd = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    val gd = dd.select(
      VectorExpressions.dotProduct(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    assert(gd(0).isNullAt(0) && gd(0).isNullAt(1))
    // interpreted eval path
    def intLit(xs: Array[Int]) = org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))
    assert(IntDotProduct(intLit(Array(1, 2)), intLit(Array(1, 2, 3))).eval(null) == null)
  }

  test("null inputs and double arrays") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None)).toDF("a", "b")
    val r = df.select(VectorExpressions.dotProduct(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0) && r(2).isNullAt(0))
  }

  test("interpreted eval path matches codegen (eval vs doGenCode)") {
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f))
    val e = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal(arr,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal(arr,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == (1.0 + 4.0 + 9.0))
  }

  test("SQL registration: dot_product and cosine_sim usable from spark.sql") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e.createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT vec_id, dot_product(embedding, embedding) AS d,
        |       cosine_sim(embedding, embedding) AS c
        |FROM emb_sql LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getDouble(1) > 0)
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-9) // self-cosine is 1
    }
  }

  test("SQL text scalars expand to the exact Column-API trees (value-equal on real docs)") {
    GraftFunctions.register(spark)
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_token_count(text) AS tc, graft_lang_id(text) AS li,
        |       graft_fingerprint(text) AS fp, graft_rolling_hash(text) AS rh,
        |       graft_simhash64(text) AS sh, graft_redact_pii(text) AS rp,
        |       graft_stopword_ratio(text) AS sr,
        |       graft_quality_mask(text) AS qm
        |FROM docs_sql""".stripMargin)
    val viaCol = d.select(
      col("doc_id"),
      graft.ops.TextOps.tokenCount(col("text")).as("tc"),
      graft.ops.TextOps.langId(col("text")).as("li"),
      graft.ops.TextOps.fingerprint(col("text")).as("fp"),
      graft.ops.TextOps.rollingHash(col("text")).as("rh"),
      graft.ops.Dedup.simhash64(col("text")).as("sh"),
      graft.ops.TextOps.redactPii(col("text")).as("rp"),
      graft.ops.TextOps.stopwordRatio(col("text")).as("sr"),
      graft.ops.TextOps.gopherRuleMask(
        coalesce(graft.ops.TextOps.tokens(col("text")),
          array().cast("array<string>"))).as("qm"))
    assert(viaSql.exceptAll(viaCol).count() == 0 && viaCol.exceptAll(viaSql).count() == 0,
      "SQL registration must produce the identical values to the Column API")
    // no UDF anywhere: the SQL path plans the same codegen-able tree
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
