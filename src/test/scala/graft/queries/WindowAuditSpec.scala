package graft.queries

import graft.TestSpark
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.scalatest.funsuite.AnyFunSuite

/** Audits every unpartitioned Window in the registry (VERDICT r9 item 4).
  *
  * Spark warns "No Partition Defined for Window operation" on any window
  * without a partition spec — a real scale hazard when the input is
  * corpus-sized (the whole corpus moves to ONE task), but legitimate and
  * deliberate across this repo for histogram-/grid-/partitions-/group-sized
  * inputs (eventsLorenz's decile cum-sums, sortedNeighborhoodPairs' per-
  * partition offsets frame, unrolled-round trajectory replays…). Until now
  * that boundedness was prose in each scaladoc; this audit makes it a
  * measured invariant, so the warning becomes safe to grep for.
  *
  * Method: for every registered query, collect the child subtree of each
  * partitionless logical Window at sf0.001; where any exist, re-collect at
  * sf0.01 (10× the data) and COUNT both child inputs. A bounded input
  * (fixed grid, bucket histogram, #partitions, unrolled-round constant) is
  * scale-invariant-ish; a corpus-sized input grows ~10×. The gate: input
  * may grow at most 3× across the 10× data step OR stay under an absolute
  * floor (tiny value-cardinality frames that legitimately admit a few new
  * distinct values). Anything super-linear here is exactly the single-task
  * regression the warning is about.
  */
class WindowAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"

  private def unpartitionedWindowChildren(name: String, dir: String): Seq[LogicalPlan] = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w.child
    }
  }

  test("every unpartitioned Window input stays bounded across a 10x data step") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val audited = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.keysIterator.toSeq.sorted.foreach { name =>
      val small =
        try unpartitionedWindowChildren(name, sfSmall)
        finally { ParityQueries.releaseSessions(); graft.ops.Linkage.releaseShared() }
      if (small.nonEmpty) {
        val big =
          try unpartitionedWindowChildren(name, sfBig)
          finally { ParityQueries.releaseSessions(); graft.ops.Linkage.releaseShared() }
        assert(big.size == small.size,
          s"$name: window count differs across SFs (${small.size} vs ${big.size})")
        small.zip(big).zipWithIndex.foreach { case ((s, b), i) =>
          val nS = GraftColumnBridge.ofRows(spark, s).count()
          val nB = GraftColumnBridge.ofRows(spark, b).count()
          audited += s"$name[$i]: $nS -> $nB"
          if (nB > math.max(3L * nS, 64L))
            offenders += s"$name window#$i input grew $nS -> $nB rows over a 10x data step"
        }
        ParityQueries.releaseSessions()
        graft.ops.Linkage.releaseShared()
      }
    }
    info(s"audited ${audited.size} unpartitioned windows:\n  " + audited.mkString("\n  "))
    assert(audited.nonEmpty, "expected at least one unpartitioned window in the registry")
    assert(offenders.isEmpty,
      "corpus-sized single-task windows detected:\n  " + offenders.mkString("\n  "))
  }
}
