package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the round-14 scale-killer: Spark 4's
  * `localCheckpoint` carries the checkpointed plan's ESTIMATED statistics
  * onto the new `LogicalRDD` leaf, so an iterative loop that joins the
  * previous round's leaf k times compounds `sizeInBytes` as S_r ≈ S_{r-1}^k
  * — a BigInteger whose bit length grows geometrically per round, burning
  * driver seconds in stats arithmetic from ~round 12 with executors idle
  * (measured: 10 s/round → 1.2 s after the fix). Every iterative kernel
  * routes through `Analytics.roundBarrier`, whose `GraftSqlBridge
  * .resetStats` rebuilds the leaf with DEFAULT statistics.
  *
  * These tests pin the hazard and the guard STRUCTURALLY (leaf-stats bit
  * length across synthetic self-join rounds, no timing flakiness):
  *   - the guarded loop's stats stay bounded — red if a future Spark
  *     upgrade reintroduces compounding PAST the barrier (or if someone
  *     bypasses resetStats in roundBarrier);
  *   - the control documents that the hazard still exists in this Spark
  *     version — if IT turns red after an upgrade, Spark stopped carrying
  *     stats and the bridge may be retirable. */
class CheckpointStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private def statsBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength

  private def round(df: DataFrame): DataFrame =
    df.join(df.select(col("id")), Seq("id"))

  test("roundBarrier keeps leaf stats bounded across 16 synthetic self-join rounds") {
    var df = spark.range(100).toDF("id")
    (1 to 16).foreach { _ =>
      df = graft.olap.Analytics.roundBarrier(round(df))
    }
    val bits = statsBits(round(df))
    assert(bits < 10000,
      s"stats bit length $bits — checkpoint stats are compounding through roundBarrier " +
        "(resetStats bypassed or Spark changed localCheckpoint stats carriage)")
  }

  test("control: bare localCheckpoint still compounds stats geometrically (the hazard exists)") {
    var df = spark.range(100).toDF("id")
    (1 to 16).foreach { _ =>
      df = round(df).localCheckpoint(false)
    }
    val bits = statsBits(round(df))
    assert(bits > 100000,
      s"stats bit length only $bits — this Spark version no longer carries compounding " +
        "checkpoint stats; GraftSqlBridge.resetStats may be retirable (re-measure before removing)")
  }
}
