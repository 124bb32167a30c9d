package graft.queries

import graft.core._
import graft.core.Expr._
import graft.tables._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One query per reference operator (SURVEY §2), each expressed through the
  * `graft.core` engine and paired with an ANSI-SQL oracle for the driver's
  * DuckDB comparison. Column names are aligned between the Spark result and
  * the oracle SQL (the driver sorts columns by name before hashing).
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Engine sessions opened by these queries, kept until the caller has
    * consumed the returned DataFrame (which is backed by session state).
    * [[releaseSessions]] frees their executor storage — without it a
    * long-lived JVM running many queries (the bench, a notebook) pins every
    * query's checkpointed batches in the block manager forever.
    */
  private val live = scala.collection.mutable.Buffer.empty[CoddSession]

  private def session(spark: SparkSession): CoddSession = live.synchronized {
    val s = new CoddSession(spark)
    live += s
    s
  }

  /** Close every session opened since the last release. Call only after the
    * returned DataFrames have been fully consumed.
    */
  def releaseSessions(): Unit = live.synchronized {
    live.foreach(_.close())
    live.clear()
  }

  /** Track a caller-constructed session (non-default storage policy) for
    * [[releaseSessions]] cleanup.
    */
  private def register(s: CoddSession): CoddSession = live.synchronized {
    live += s
    s
  }

  /** Stabilized base relations shared by the READ-ONLY parity queries within
    * a JVM — the long-lived-database usage model, which is the reference's
    * own (build the `Database` once, query it many times; its test corpus
    * never re-ingests per query). Each (SparkSession, dir) pair pays each
    * table's ingest — scan → set-semantics distinct → cache — exactly once;
    * after that a parity query costs only its own operator work, which is
    * what the per-query number should measure. Queries that MUTATE engine
    * state (the IVM epoch suites, the restart query) keep private sessions:
    * their inserts must not leak into the shared store.
    *
    * Content equivalence is unconditional: a fresh session over the same
    * parquet yields byte-identical stable sets, so the oracle gate is
    * unaffected — only the amortization changes.
    */
  private final case class Base(
      db: CoddSession,
      region: Rel[Region],
      nation: Rel[Nation],
      customer: Rel[Customer],
      supplier: Rel[Supplier],
      orders: Rel[Order],
      lineitem: Rel[Lineitem])

  private val warm = scala.collection.mutable.Map.empty[(SparkSession, String), Base]

  private def base(spark: SparkSession, dir: String): Base = warm.synchronized {
    warm.getOrElseUpdate(
      (spark, dir), {
        import spark.implicits._
        val db = new CoddSession(spark)
        val b = Base(
          db,
          db.addRelation[Region]("region"),
          db.addRelation[Nation]("nation"),
          db.addRelation[Customer]("customer"),
          db.addRelation[Supplier]("supplier"),
          db.addRelation[Order]("orders"),
          db.addRelation[Lineitem]("lineitem"))
        // staged lazily (O(1)); each table stabilizes at the first evaluate
        // that depends on it, so nobody pays for tables they never touch
        db.insert(b.region, Tables.region(spark, dir))
        db.insert(b.nation, Tables.nation(spark, dir))
        db.insert(b.customer, Tables.customer(spark, dir))
        db.insert(b.supplier, Tables.supplier(spark, dir))
        db.insert(b.orders, Tables.orders(spark, dir))
        db.insert(b.lineitem, Tables.lineitem(spark, dir))
        b
      })
  }

  /** Close the shared warm-base sessions (end of a bench/verify run). */
  def releaseWarm(): Unit = warm.synchronized {
    warm.values.foreach(_.db.close())
    warm.clear()
  }

  /** #1 Relation: base table scan (reference: relation.rs:20-57). */
  val relationScan: Q = (spark, dir) => {
    val b = base(spark, dir)
    b.db.evaluate(b.region).toDF()
  }

  /** #2 Select: σ with an arbitrary closure (reference: select.rs:28-63),
    * then #3 Project to drop the timestamp column.
    */
  val selectFilter: Q = (spark, dir) => {
    import spark.implicits._
    val b = base(spark, dir)
    val q = b.lineitem
      .select(l => l.l_quantity < 10.0 && l.l_returnflag == "R")
      .project(l => (l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_returnflag))
    b.db.evaluate(q).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
  }

  /** #3 Project: computing mapper — type-changing projection
    * (reference: project.rs:28-65). Set semantics: result is distinct.
    */
  val projectMap: Q = (spark, dir) => {
    import spark.implicits._
    val b = base(spark, dir)
    val q = b.lineitem.project(l => (l.l_orderkey, l.l_extendedprice * (1.0 - l.l_discount)))
    b.db.evaluate(q).toDF("l_orderkey", "revenue")
  }

  /** #4 Product: Cartesian product fused with a mapper
    * (reference: product.rs:27-73).
    */
  val productCross: Q = (spark, dir) => {
    import spark.implicits._
    val b = base(spark, dir)
    val q = b.region.product(b.nation).on((r, n) => (r.r_name, n.n_name))
    b.db.evaluate(q).toDF("r_name", "n_name")
  }

  /** #5 Join: equi-join on computed keys with fused mapper
    * (reference: join.rs:42-148).
    */
  val joinEqui: Q = (spark, dir) => {
    import spark.implicits._
    val b = base(spark, dir)
    val q = b.orders
      .withKey(_.o_custkey)
      .join(b.customer.withKey(_.c_custkey))
      .on((k, o, c) => (o.o_orderkey, k, c.c_name, o.o_totalprice))
    b.db.evaluate(q).toDF("o_orderkey", "c_custkey", "c_name", "o_totalprice")
  }

  /** #6 Union (reference: union.rs:23-64). */
  val unionSet: Q = (spark, dir) => {
    import spark.implicits._
    val b = base(spark, dir)
    val q = b.customer.project(_.c_nationkey).union(b.supplier.project(_.s_nationkey))
    b.db.evaluate(q).toDF("nkey")
  }

  /** #7 Intersect (reference: intersect.rs:23-64). */
  val intersectSet: Q = (spark, dir) => {
    import spark.implicits._
    val b = base(spark, dir)
    val q = b.customer
      .select(_.c_acctbal > 5000.0)
      .project(_.c_custkey)
      .intersect(b.orders.select(_.o_totalprice > 200000.0).project(_.o_custkey))
    b.db.evaluate(q).toDF("key")
  }

  /** #8 Difference — ad-hoc only; rejected in views
    * (reference: difference.rs:25-67, validate.rs:21-33).
    * Customers who never placed an order above 350k.
    */
  val differenceSet: Q = (spark, dir) => {
    import spark.implicits._
    val b = base(spark, dir)
    val q = b.customer
      .project(_.c_custkey)
      .difference(b.orders.select(_.o_totalprice > 350000.0).project(_.o_custkey))
    b.db.evaluate(q).toDF("key")
  }

  /** #9 Empty: constant ∅ (reference: empty.rs:17-52). */
  val emptyRel: Q = (spark, _) => {
    import spark.implicits._
    val db = session(spark)
    db.evaluate(EmptyRel[Long]()).toDF("key")
  }

  /** #11 Singleton: constant one-tuple relation (reference: singleton.rs:16-49),
    * composed under Project to prove constants are born stable
    * (reference: evaluate.rs:43-48, 281-286).
    */
  val singletonConst: Q = (spark, _) => {
    import spark.implicits._
    val db = session(spark)
    val q = Singleton((1, "graft")).project(t => (t._1, t._2))
    db.evaluate(q).toDF("x", "s")
  }

  /** #12 View with IVM: the view is created mid-stream and maintained
    * incrementally across three insert epochs; the oracle recomputes from
    * scratch — incremental ≡ full (reference: evaluate.rs:1409-1436).
    */
  val viewIvm: Q = (spark, dir) => {
    import spark.implicits._
    val db = session(spark)
    val ev = db.addRelation[Event]("events")
    val all = Tables.events(spark, dir)
    db.insert(ev, all.filter(_.event_id % 3 == 0))
    val v = db.storeView(
      ev.select(_.value > 100.0).project(e => (e.user_id, e.event_type)))
    db.evaluate(v).count() // stabilize epoch 1
    db.insert(ev, all.filter(_.event_id % 3 == 1))
    db.evaluate(v).count() // stabilize epoch 2
    db.insert(ev, all.filter(_.event_id % 3 == 2))
    db.evaluate(v).toDF("user_id", "event_type")
  }

  /** #12b View over a join, maintained while the fact side grows in batches
    * (delta rules δL⋈Rˢ ∪ Lˢ⋈δR ∪ δL⋈δR, reference: evaluate.rs:198-250).
    */
  val viewJoinIvm: Q = (spark, dir) => {
    import spark.implicits._
    val db = session(spark)
    val cust = db.addRelation[Customer]("customer")
    val ord = db.addRelation[Order]("orders")
    db.insert(cust, Tables.customer(spark, dir))
    val all = Tables.orders(spark, dir)
    db.insert(ord, all.filter(_.o_orderkey % 3 == 0))
    val expr = ord
      .select(_.o_totalprice > 300000.0)
      .withKey(_.o_custkey)
      .join(cust.withKey(_.c_custkey))
      .on((k, o, c) => (k, c.c_name, o.o_orderkey))
    val v = db.storeView(expr)
    db.evaluate(v).count()
    db.insert(ord, all.filter(_.o_orderkey % 3 == 1))
    db.evaluate(v).count()
    db.insert(ord, all.filter(_.o_orderkey % 3 == 2))
    db.evaluate(v).toDF("c_custkey", "c_name", "o_orderkey")
  }

  /** #12c View over view: deltas cascade down the view DAG
    * (reference: evaluate.rs:1372-1383, database.rs:287-314).
    */
  val viewChainIvm: Q = (spark, dir) => {
    import spark.implicits._
    val db = session(spark)
    val ev = db.addRelation[Event]("events")
    val all = Tables.events(spark, dir)
    db.insert(ev, all.filter(_.event_id % 2 == 0))
    val v1 = db.storeView(
      ev.select(_.value > 100.0).project(e => (e.user_id, e.event_type)))
    val v2 = db.storeView(v1.select(_._2 == "click").project(_._1))
    db.evaluate(v2).count()
    db.insert(ev, all.filter(_.event_id % 2 == 1))
    db.evaluate(v2).toDF("user_id")
  }

  /** #12d Durable restart: the end-to-end recovery path under the oracle
    * gate. "Process 1" builds a [[Instance.ReliableStore]]-backed view,
    * stabilizes it (batches + manifest become durable parquet), and CLOSES —
    * dropping every byte of transient state. "Process 2" starts from the
    * files alone: [[Instance.loadBatches]] replays the recovered relation
    * content, `attach = true` deliberately takes over the store (batch ids
    * resume above the existing maxima, reference: database.rs persistence
    * contract), a new view initializes over the recovered content, and a
    * post-restart delta batch is maintained incrementally. The oracle
    * recomputes from scratch over ALL events — restart must be invisible.
    */
  val viewRestartIvm: Q = (spark, dir) => {
    import spark.implicits._
    // stores live under one fixed parent, reclaimed on the NEXT invocation
    // (by then the previous result has been fully consumed) — repeated
    // bench/verify runs must not accumulate a store copy per run
    val parent = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_restart_store")
    if (java.nio.file.Files.exists(parent)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(parent).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    java.nio.file.Files.createDirectories(parent)
    val base = java.nio.file.Files.createTempDirectory(parent, "run").toString
    val all = Tables.events(spark, dir)
    // --- "first process": reliable session, half the events, stabilized view
    val s1 = register(new CoddSession(spark, Instance.ReliableStore(base)))
    val ev1 = s1.addRelation[Event]("events")
    s1.insert(ev1, all.filter(_.event_id % 2 == 0))
    val v1 = s1.storeView(
      ev1.select(_.value > 150.0).project(e => (e.user_id, e.event_type)))
    s1.evaluate(v1).count() // stabilize: store is now durable on disk
    s1.close() // "crash/shutdown": only the parquet store survives
    // --- "second process": recover from the files, take over, keep going
    val recovered = Instance.loadBatches(spark, s"$base/rel_events").as[Event]
    val s2 = register(new CoddSession(spark, Instance.ReliableStore(base, attach = true)))
    val ev2 = s2.addRelation[Event]("events")
    s2.insert(ev2, recovered)
    val v2 = s2.storeView(
      ev2.select(_.value > 150.0).project(e => (e.user_id, e.event_type)))
    s2.evaluate(v2).count() // late-view init over recovered content
    s2.insert(ev2, all.filter(_.event_id % 2 == 1))
    s2.evaluate(v2).toDF("user_id", "event_type")
  }

  /** #13 Mono: dynamic composition of heterogeneous nodes in one tree
    * (reference: mono.rs:10-26) — union ∘ select ∘ project ∘ intersect.
    */
  val monoCompose: Q = (spark, dir) => {
    import spark.implicits._
    val b = base(spark, dir)
    val building = b.customer.select(_.c_mktsegment == "BUILDING").project(_.c_custkey)
    val rich = b.customer.select(_.c_acctbal > 9000.0).project(_.c_custkey)
    val openOrders = b.orders.select(_.o_orderstatus == "O").project(_.o_custkey)
    val q: Expr[Long] = Union(building, rich).intersect(openOrders)
    b.db.evaluate(q).toDF("key")
  }

  val all: Map[String, Q] = Map(
    "relation_scan" -> relationScan,
    "select_filter" -> selectFilter,
    "project_map" -> projectMap,
    "product_cross" -> productCross,
    "join_equi" -> joinEqui,
    "union_set" -> unionSet,
    "intersect_set" -> intersectSet,
    "difference_set" -> differenceSet,
    "empty_rel" -> emptyRel,
    "singleton_const" -> singletonConst,
    "view_ivm" -> viewIvm,
    "view_join_ivm" -> viewJoinIvm,
    "view_chain_ivm" -> viewChainIvm,
    "view_restart_ivm" -> viewRestartIvm,
    "mono_compose" -> monoCompose
  )

  val oracles: Map[String, String] = Map(
    "relation_scan" -> "SELECT r_regionkey, r_name FROM region",
    "select_filter" ->
      """SELECT DISTINCT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity < 10 AND l_returnflag = 'R'""".stripMargin,
    "project_map" ->
      """SELECT DISTINCT l_orderkey, l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem""".stripMargin,
    "product_cross" -> "SELECT DISTINCT r_name, n_name FROM region CROSS JOIN nation",
    "join_equi" ->
      """SELECT DISTINCT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "union_set" ->
      "SELECT c_nationkey AS nkey FROM customer UNION SELECT s_nationkey FROM supplier",
    "intersect_set" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000""".stripMargin,
    "difference_set" ->
      """SELECT c_custkey AS key FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 350000""".stripMargin,
    "empty_rel" -> "SELECT c_custkey AS key FROM customer WHERE 1 = 0",
    "singleton_const" -> "SELECT CAST(1 AS INTEGER) AS x, 'graft' AS s",
    "view_ivm" ->
      "SELECT DISTINCT user_id, event_type FROM events WHERE value > 100",
    "view_join_ivm" ->
      """SELECT DISTINCT c_custkey, c_name, o_orderkey
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000""".stripMargin,
    "view_chain_ivm" ->
      "SELECT DISTINCT user_id FROM events WHERE value > 100 AND event_type = 'click'",
    "view_restart_ivm" ->
      "SELECT DISTINCT user_id, event_type FROM events WHERE value > 150",
    "mono_compose" ->
      """SELECT key FROM (
        |  SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin
  )
}
