package org.apache.spark.sql

/** Package-local bridge used by graft's iterative kernels.
  *
  * Spark 4's `Dataset.checkpoint`/`localCheckpoint` carry the checkpointed
  * plan's ESTIMATED statistics onto the returned `LogicalRDD` leaf
  * (`LogicalRDD.rewriteStatsAndConstraints`, sql/core ExistingRDD.scala).
  * In an iterative loop whose per-round plan joins the previous round's
  * leaf k times, the carried `sizeInBytes` estimate compounds as
  * S_r ≈ S_{r-1}^k — a BigInteger whose BIT LENGTH grows geometrically per
  * round. From ~round 12 the driver burns seconds per round inside
  * `SizeInBytesOnlyStatsPlanVisitor` BigInteger multiplications
  * (Karatsuba/ToomCook frames in the thread dump), with executors idle —
  * measured on CC over a 10⁵-vertex path: rounds 1-11 ≈ 0.7 s, round 13
  * ≈ 10 s, identical with AQE off and with eager/reliable checkpoints.
  *
  * `resetStats` rebuilds the frame over the SAME InternalRow RDD (no row
  * conversion, no recomputation — for a checkpointed input this is the
  * already-materialized checkpoint RDD) via `internalCreateDataFrame`,
  * whose `LogicalRDD` takes the DEFAULT leaf statistics. That restores the
  * pre-carry behavior graft's loops were designed around: checkpointed
  * frames have no usable stats, and every size-sensitive join in the
  * iterative kernels carries an explicit `broadcast()` hint already. */
object GraftSqlBridge {
  def resetStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }
}
