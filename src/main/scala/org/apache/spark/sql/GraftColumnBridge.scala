package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the `private[sql]` Column↔Expression conversions: Spark 4 hides
  * the Expression-backed Column constructor behind the classic module, and
  * custom Catalyst expressions (graft.functions) need both directions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER ColumnNode → catalyst conversion. [[expression]] wraps the
    * Column in a lazy `ColumnNodeExpression` adapter that only DataFrame
    * plan construction unwraps — an expression RETURNED from a
    * FunctionRegistry builder bypasses that path, survives analysis as an
    * opaque leaf, and dies at codegen. Builders must convert eagerly.
    */
  def expressionNow(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Analyzed logical plan of a DataFrame (input side of custom plan nodes). */
  def analyzed(ds: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    ds.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a (possibly custom) logical plan back into a DataFrame. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A twin session over the SAME SparkContext (shared RDD blocks, shared
    * cache manager, cloned state) with ADAPTIVE EXECUTION OFF. Lazily
    * checkpointing a plan calls `queryExecution.toRdd`, and an adaptive
    * plan EXECUTES every non-result stage right there — one eager action
    * per plan, which defeats any caller trying to materialize many plans
    * in one batched action. Compiled classically, `toRdd` is pure plan
    * construction and ALL stages run inside whichever single action first
    * computes the RDD.
    */
  def sessionWithoutAqe(spark: SparkSession): SparkSession = {
    val c = spark.asInstanceOf[classic.SparkSession].cloneSession()
    c.conf.set("spark.sql.adaptive.enabled", "false")
    c
  }

  /** Re-bind a Dataset's logical plan to another session of the same
    * SparkContext, so a plan can compile under a differently-configured
    * twin (see [[sessionWithoutAqe]]) and its materialized result can be
    * re-homed afterwards.
    */
  def withSession[T](ds: Dataset[T], s: SparkSession): Dataset[T] =
    classic.Dataset.ofRows(
      s.asInstanceOf[classic.SparkSession],
      ds.asInstanceOf[classic.Dataset[T]].logicalPlan).as(ds.encoder)

  /** A serializable, broadcast-backed accessor for the session's Hadoop
    * configuration — for executor-side metadata work (parquet footer
    * reads) that must see the SAME filesystem configuration (S3
    * credentials, endpoint overrides) the driver resolved paths with.
    * `Configuration` itself is not serializable; Spark's internal wrapper
    * is `private[spark]`, so this bridge hands out a closure over the
    * broadcast instead.
    */
  def hadoopConfAccessor(
      spark: SparkSession): () => org.apache.hadoop.conf.Configuration = {
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    () => bc.value.value
  }

  /** The block-manager RDD behind a `localCheckpoint`ed Dataset, if any —
    * checkpointing rewrites the plan to a bare [[LogicalRDD]] leaf.
    */
  private def checkpointRdd(ds: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    ds match {
      case c: classic.Dataset[_] =>
        c.queryExecution.analyzed match {
          case lr: LogicalRDD => Some(lr.rdd)
          case _              => None
        }
      case _ => None
    }

  /** Free the executor-storage blocks of a `localCheckpoint`ed Dataset.
    * No-op for any other plan shape. Non-blocking.
    */
  def unpersistLocalCheckpoint(ds: Dataset[_]): Unit =
    checkpointRdd(ds).foreach(_.unpersist(blocking = false))

  /** Actual bytes a `localCheckpoint`ed Dataset occupies in executor storage
    * (memory + disk), or -1 when unknown. This is the *measured* size — the
    * right input for broadcast-budget decisions, unlike row counts or static
    * schema estimates that ignore string/array payload width.
    */
  /** Block until the context's listener bus has delivered every queued
    * event — support for listener-based "what actually executed" assertions
    * (events are delivered async, so a listener read right after an action
    * races the bus).
    */
  def flushListenerBus(spark: SparkSession, timeoutMillis: Long): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)

  def storageBytes(ds: Dataset[_]): Long =
    checkpointRdd(ds)
      .flatMap { rdd =>
        rdd.sparkContext.getRDDStorageInfo
          .find(_.id == rdd.id)
          .map(i => i.memSize + i.diskSize)
      }
      .getOrElse(-1L)

  /** Rewrap a `localCheckpoint`ed Dataset so its [[LogicalRDD]] leaf carries
    * MEASURED statistics instead of the origin plan's estimates. A
    * checkpointed join/distinct otherwise keeps its pre-execution stats —
    * often orders of magnitude above the materialized reality — which
    * poisons every size-based planning decision downstream (broadcast
    * choices, the engine's fused-promotion gate). Returns the input
    * unchanged when the plan is not a bare checkpoint leaf.
    */
  /** Rewrap a `localCheckpoint`ed Dataset so its [[LogicalRDD]] leaf DECLARES
    * the hash partitioning its blocks were materialized under.
    * `Dataset.localCheckpoint` under AQE records `UnknownPartitioning` on the
    * checkpoint leaf (the adaptive wrapper's `outputPartitioning` is not the
    * final plan's), so every downstream join/aggregate keyed on the pinned
    * layout re-exchanges data that is already correctly placed — for an
    * iterative op that means one avoidable shuffle of the pinned side PER
    * ROUND. The caller ASSERTS the physical layout (an explicit
    * `repartition(n, keys)` at the top of the checkpointed plan, or only
    * partitioning-preserving operators — filter/project/aggregate/window on
    * the same keys — above one); a false declaration silently mis-joins, so
    * this is only called via [[graft.ops.Partitioning]]'s pin helpers, whose
    * specs pin content equality against the undeclared plan. Returns the
    * input unchanged when the plan is not a bare checkpoint leaf.
    */
  def withDeclaredHashPartitioning[T](ds: Dataset[T], keys: Seq[String]): Dataset[T] =
    ds match {
      case c: classic.Dataset[T @unchecked] =>
        c.queryExecution.analyzed match {
          case lr: LogicalRDD =>
            val attrs = keys.map { k =>
              lr.output.find(_.name == k).getOrElse(
                throw new IllegalArgumentException(
                  s"withDeclaredHashPartitioning: no column '$k' in ${lr.output.map(_.name)}"))
            }
            val hp = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
              attrs, lr.rdd.getNumPartitions)
            val plan = LogicalRDD(
              lr.output, lr.rdd, hp, lr.outputOrdering, lr.isStreaming, lr.stream)(
              c.sparkSession, None, None)
            classic.Dataset.ofRows(c.sparkSession, plan).as(ds.encoder)
          case _ => ds
        }
      case _ => ds
    }

  def withMeasuredStats[T](ds: Dataset[T], bytes: Long, rows: Long): Dataset[T] =
    ds match {
      case c: classic.Dataset[T @unchecked] if bytes >= 0 =>
        c.queryExecution.analyzed match {
          case lr: LogicalRDD =>
            val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
              sizeInBytes = BigInt(bytes),
              rowCount = Some(BigInt(rows)))
            val plan = LogicalRDD(
              lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
              lr.isStreaming, lr.stream)(
              c.sparkSession, Some(stats), None)
            classic.Dataset.ofRows(c.sparkSession, plan).as(ds.encoder)
          case _ => ds
        }
      case _ => ds
    }
}
