package graft

import org.apache.spark.sql.SparkSession

/** IVM epoch-budget experiment (VERDICT r9 stretch 8): the reference's 2x
  * geometric-compaction rule (instance.rs:177-187) was adopted in round 1
  * but never measured — and it is the one engine parameter that matters at
  * a long-lived 100x deployment, where a view's base relation sees
  * thousands of insert epochs.
  *
  * Drives one relation + one filter/project view through `batches` equal
  * insert->stabilize epochs and prints per-epoch wall times (and the
  * total). The compaction factor under test comes from
  * `-Dgraft.compaction.factor` (default 2); SCALE.md records the sweep
  * over factors x batch counts at sf1.
  *
  * Usage: runMain graft.EpochBudget <sfDir> <batches>
  */
object EpochBudget {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val batches = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val factor = sys.props.getOrElse("graft.compaction.factor", "2")
    val all = graft.tables.Tables.events(spark, dir).cache()
    val n = all.count()
    val db = new graft.core.CoddSession(spark)
    val ev = db.addRelation[graft.tables.Event]("events")
    val v = db.storeView(
      ev.select(_.value > 100.0).project(e => (e.user_id, e.event_type)))
    val times = (0 until batches).map { b =>
      val batch = all.filter(_.event_id % batches == b)
      val t0 = System.nanoTime()
      db.insert(ev, batch)
      db.evaluate(v).count()
      (System.nanoTime() - t0) / 1e9
    }
    db.close()
    val total = times.sum
    val tail = times.takeRight(5).map(t => f"$t%.2f").mkString("/")
    println(
      f"""{"experiment":"epoch_budget","factor":$factor,"batches":$batches,""" +
        f""""rows":$n,"total_sec":$total%.2f,"mean_sec":${total / batches}%.3f,""" +
        f""""last5":"$tail"}""")
    spark.stop()
  }
}
