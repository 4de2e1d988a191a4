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

  /** Events schema with `ts` carried as `tsType` (the sniffed parquet type). */
  private def eventsSchemaFor(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** A long-typed events.ts is only ever TIMESTAMP(NANOS) surfaced under the
    * legacy ns-as-long conf. A plain (unannotated) int64 micros/millis column
    * would land in the same branch and silently mis-scale every event-time
    * computation 1000x/1e6x, so sanity-check magnitude on one row: epoch-ns
    * for any plausible event date is > 1e17 (~1973); epoch-µs is ~1e15.
    * limit(1) short-circuits the scan. Shared by the batch reader
    * ([[graft.SparkEntry.readEventsRaw]]) and the streaming source — the
    * round-7 1000x bug lived exactly where the two paths diverged. */
  private[graft] def requirePlausibleNanos(df: DataFrame): Unit =
    df.select(col("ts")).filter(col("ts").isNotNull).limit(1).collect()
      .foreach { r =>
        val ts = r.getLong(0)
        if (ts < 100000000000000000L) throw new IllegalStateException(
          s"events.ts: int64 value $ts is not plausible epoch-nanoseconds; " +
            "plain-int64 micros/millis drops are out of contract")
      }

  /** Streaming source over the change table. The file stream source requires a
    * directory, so stream the sf dir with a glob pinned to the events table.
    *
    * Data drops have stored `ts` as either TIMESTAMP(NANOS) (surfacing as an
    * epoch-ns long under the legacy conf) or timestamp[us]; a one-off batch
    * schema sniff picks the branch — exactly mirroring the batch reader
    * ([[graft.SparkEntry.readEventsRaw]]), including its plain-int64
    * magnitude guard. The caller's session conf is NEVER mutated: µs/NTZ
    * drops need no conf and stream on the caller's session; a NANOS drop
    * builds the stream on the dedicated ns clone ([[graft.SparkEntry
    * .nsSession]]) so the legacy flag is live when the scan executes without
    * leaking into shared state. Consequence for memory sinks: the sink table
    * registers in the catalog of the RETURNED frame's session — consumers
    * should resolve it via `df.sparkSession.table(...)`, which is correct in
    * both branches. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    // schema sniff on the ns clone: yields LongType for a NANOS drop (under
    // the clone's legacy conf) and real timestamp types for µs drops
    val nsClone = graft.SparkEntry.nsSession(spark)
    val sniff = nsClone.read.parquet(s"$dir/events.parquet")
    val tsType = sniff.schema("ts").dataType
    val session = tsType match {
      case LongType => requirePlausibleNanos(sniff); nsClone
      case _ => spark
    }
    val raw = session.readStream.schema(eventsSchemaFor(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    tsType match {
      case LongType => // epoch-ns long → µs timestamp
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
      case TimestampType => raw
      case TimestampNTZType => // session tz is UTC in every entry point: exact
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
    }
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

  /** One micro-batch's worth of graph mutations (the reference's ChangeState
    * added/removed element sets, tc/core/log/ChangeState.java:25-57). */
  final case class Mutations(
      addVertices: Option[DataFrame] = None,
      deleteVertexIds: Option[DataFrame] = None,
      addEdges: Option[DataFrame] = None,
      deleteEdgeIds: Option[DataFrame] = None)

  /** Materialize the change log INTO a property graph — the reference's
    * downstream-processor pattern end-to-end (LogProcessorFramework: user
    * transaction log → ChangeProcessor → mutate derived state). Each
    * micro-batch maps to one mutation batch via `toMutations` and commits
    * through [[graft.data.GraphIO.applyMutations]] — so schema auto-creation,
    * static-label and consistency enforcement all apply per batch, exactly
    * like the reference's triggered transactions. Blocks until the
    * AvailableNow stream drains and returns the final graph.
    *
    * State handling: after each batch the merged vertex/edge frames are
    * EAGERLY checkpointed — a batch frame is only valid while its micro-batch
    * runs, so the merge must materialize before the callback returns (lazy
    * truncation would read a dead source); this also keeps the cross-batch
    * plan constant-size, the same superstep materialization the iterative
    * jobs perform. Index tables keep their lazy re-derived plans (rebuilt
    * per batch, computed only when queried). */
  def materializeGraph(changes: DataFrame, checkpoint: String,
      g0: graft.data.PropertyGraph, timeoutMs: Long = 300000L)(
      toMutations: DataFrame => Mutations): graft.data.PropertyGraph = {
    @volatile var g = g0
    val q = changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val m = toMutations(batch)
        val merged = graft.data.GraphIO.applyMutations(g,
          m.addVertices, m.deleteVertexIds, m.addEdges, m.deleteEdgeIds)
        g = merged.copy(
          vertices = merged.vertices.localCheckpoint(true),
          edges = merged.edges.localCheckpoint(true))
      }
      .trigger(Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(timeoutMs),
      s"materializeGraph: stream did not drain within ${timeoutMs}ms")
    g
  }

  /** STREAMING incremental connected components — the graph-analytics twin
    * of the incremental dedup loop: edges arrive through Structured
    * Streaming as (src, dst) rows and the component labeling updates PER
    * MICRO-BATCH instead of recomputing CC from scratch. Per batch:
    * endpoints new to the state enter as singleton classes; the batch's
    * cross-class pairs collapse onto their class MINIMUM through
    * [[graft.olap.Analytics.classMergeMapping]] — the batch MSF's dual
    * regime: driver union-find while the pair set is under
    * spark.graft.msf.driverMergeMaxRows, distributed pointer-doubled
    * min-label flood past it — and one mapping join rewrites the state. Labels are min-member ids, so after the stream
    * drains the state is EXACTLY batch CC of the accumulated edge set —
    * the oracle is the converged min-label recurrence, oracle-identical to
    * the batch operator.
    *
    * Scale: per batch one ids⨝state join (state-sized side prunable by the
    * touched ids), one class-pair control read bounded by batch size, one
    * broadcast remap. State is one row per vertex; eager per-batch local
    * checkpoints keep the cross-batch plan constant-size (the
    * [[materializeGraph]] discipline). */
  def incrementalComponents(edges: DataFrame, checkpoint: String,
      timeoutMs: Long = 300000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // DURABLE state: the label frame is versioned per batch under the
    // stream's own checkpoint dir. The offset log alone is NOT recovery —
    // a restarted query skips already-committed batches, so driver-memory
    // state would silently come back EMPTY (all prior components lost).
    // Batch b always reads state b-1 from disk when it exists, so a
    // replayed half-committed batch is exactly idempotent, and a fresh
    // invocation resumes from the latest committed state.
    val statePath = s"$checkpoint/graft-state"
    val hconf = spark.sparkContext.hadoopConfiguration
    def stateDir(bid: Long) = new org.apache.hadoop.fs.Path(s"$statePath/b=$bid")
    def committed(bid: Long): Boolean = {
      val p = new org.apache.hadoop.fs.Path(stateDir(bid), "_SUCCESS")
      p.getFileSystem(hconf).exists(p)
    }
    def latestBatch(): Option[Long] = {
      val root = new org.apache.hadoop.fs.Path(statePath)
      val fs = root.getFileSystem(hconf)
      if (!fs.exists(root)) None
      else fs.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("b=")).map(_.drop(2).toLong)
        .filter(committed).sorted.lastOption
    }
    def loadState(bid: Long): DataFrame = spark.read.parquet(stateDir(bid).toString)
    @volatile var labels: DataFrame = latestBatch().map(loadState).getOrElse(
      Seq.empty[(Long, Long)].toDF("id", "component")).localCheckpoint(true)
    val q = edges.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay safety: the input state for batch N is the committed
        // state of batch N-1 when present (the in-memory frame may already
        // include a replayed batch's effects)
        if (batchId > 0 && committed(batchId - 1))
          labels = loadState(batchId - 1).localCheckpoint(true)
        val e = batch.select(col("src"), col("dst"))
          .filter(col("src").isNotNull && col("dst").isNotNull)
        val ids = e.select(col("src").as("id"))
          .unionAll(e.select(col("dst").as("id"))).distinct()
        val touched = ids.join(labels, Seq("id"), "left")
          .select(col("id"), coalesce(col("component"), col("id")).as("component"))
        val lab0 = touched.unionByName(labels.join(ids, Seq("id"), "left_anti"))
        val cp = e
          .join(lab0.select(col("id").as("src"), col("component").as("__ca")), Seq("src"))
          .join(lab0.select(col("id").as("dst"), col("component").as("__cb")), Seq("dst"))
          .filter(col("__ca") =!= col("__cb"))
          .select(col("__ca"), col("__cb")).distinct()
        // Class-pair merge is the batch MSF's dual regime, not an uncapped
        // collect: under spark.graft.msf.driverMergeMaxRows the pair set is
        // a bounded control read into a driver union-find; past it (the
        // first micro-batch of a bulk CDC backfill has an EDGE-scale pair
        // set) the distributed pointer-doubled flood computes the same
        // min-label fixpoint without any driver materialization.
        val und = cp.select(col("__ca").as("a"), col("__cb").as("b"))
          .unionAll(cp.select(col("__cb").as("a"), col("__ca").as("b")))
          .distinct().localCheckpoint(false)
        val undRows = und.count()
        labels =
          (if (undRows == 0L) lab0
           else {
             // strict: these labels are committed into persisted streaming
             // state that later batches never revisit, so a flood that
             // exhausts its round budget must fail the batch, not warn
             val mapping = graft.olap.Analytics
               .classMergeMapping(und, undRows,
                 caller = "incrementalComponents", strict = true)
               .select(col("c").as("component"), col("l").as("__new"))
             lab0.join(mapping, Seq("component"), "left")
               .select(col("id"), coalesce(col("__new"), col("component")).as("component"))
           })
        // commit this batch's state BEFORE the offset log commits: a crash
        // between the two replays the batch against state b-1 (idempotent
        // overwrite); the reverse order would lose the batch entirely
        labels.write.mode("overwrite").parquet(stateDir(batchId).toString)
        labels = loadState(batchId).localCheckpoint(true)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(timeoutMs),
      s"incrementalComponents: stream did not drain within ${timeoutMs}ms")
    labels
  }

  /** Watermarked sliding-window aggregate (extension beyond reference parity). */
  def windowedCounts(changes: DataFrame, windowDur: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    changes.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Stream-static enrichment join: each change-log event picks up its
    * user's static profile row. The static side is broadcast per micro-batch
    * (dimension-sized, not log-sized), so the streaming side never shuffles —
    * the standard scale shape for log enrichment; Spark re-plans the static
    * side each batch, so a catalog refresh is picked up without restart. */
  def enrich(changes: DataFrame, dim: DataFrame, key: String,
      joinType: String = "left"): DataFrame =
    changes.join(broadcast(dim), Seq(key), joinType)

  /** Stream-stream interval join: left events matched to right events of the
    * same key within [l.ts, l.ts + within]. Both sides carry watermarks, so
    * join state is bounded — a row is held only until the other side's
    * watermark passes its match window, never O(log length). Inner matches
    * emit as soon as both rows arrive (the watermark only gates state
    * eviction), so AvailableNow drains the full result. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, key: String,
      within: String = "30 minutes", watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND r.ts BETWEEN l.ts AND l.ts + INTERVAL $within"))
  }

  /** Streaming exact-dedup of the change log on its transaction id — the
    * at-least-once→exactly-once bridge of the reference's recovery path
    * (StandardTransactionLogProcessor replays the WAL idempotently; replayed
    * entries must not double-apply). State is bounded by the watermark: an
    * event id is remembered only until event time passes `watermark`, so a
    * 100 TB log never accumulates unbounded dedup state. */
  def dedupStream(changes: DataFrame, watermark: String = "2 hours"): DataFrame =
    changes.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch replay of the full log (TransactionRecovery analogue: recompute
    * derived state from the log from scratch, idempotently). */
  def replay(spark: SparkSession, dir: String): DataFrame =
    withChange(graft.SparkEntry.readEvents(spark, dir))

  /** Batch sessionization: assign gap-based session ids per user (a new
    * session starts after `gapSeconds` of inactivity). Lag + running-count
    * windows — one shuffle on user_id. The streaming twin is
    * `sessionizeStream`. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull, 1)
          .when(unix_micros(col("ts")) - unix_micros(col("__prev")) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new_session")
  }

  /** Session aggregates per user: number of sessions and events. */
  def sessionStats(events: DataFrame, gapSeconds: Long): DataFrame =
    sessionizeBatch(events, gapSeconds)
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))

  /** Top-k SESSION PATHS — the full-sequence sibling of
    * [[eventTransitions]] (first-order Markov forgets everything before
    * the previous step; path mining keeps the whole session): sessionize,
    * concatenate each session's event types in (ts, event_id) order, count
    * identical paths corpus-wide, top `k` by (count DESC, path ASC).
    *
    * Determinism: collect_list order is partition-dependent, so the
    * elements are collected as (µs, event_id, type) structs and
    * array_sort'ed — a total order — before joining into the path string.
    * Scale: one user-keyed window (shared with sessionize), one
    * (user, session) aggregate whose state is session-sized, one
    * map-side-combinable path count, TakeOrdered top-k — no global sort. */
  def sessionPaths(events: DataFrame, gapSeconds: Long, k: Int = 25): DataFrame =
    sessionizeBatch(events, gapSeconds)
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(
        unix_micros(col("ts")).as("t"), col("event_id").as("e"),
        col("event_type").as("y")))), x => x.getField("y")), " ").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path").asc).limit(k)

  /** Exact EQUI-DEPTH histogram of `valueCol` per `typeCol` group: `nb`
    * NTILE buckets over the total order (value, id) — same-size buckets
    * (±1, extras to the leading buckets per the SQL-standard NTILE), each
    * reporting its row count and inclusive [lo, hi] value bounds. The
    * distribution profile beside [[valueZScores]]'s moments: equal-WIDTH
    * histograms starve on skew, equal-DEPTH ones place resolution where
    * the mass is.
    *
    * Scale: one window per group — groups parallelize across the cluster;
    * a single monster group serializes its own sort (the NTILE semantics
    * require a total order), so at true scale feed pre-aggregated or
    * sampled values, or take interpolated quantiles instead
    * ([[graft.pipeline.TextAnalysis.lengthQuantiles]]). */
  def equiDepthHistogram(events: DataFrame, nb: Int = 10,
      typeCol: String = "event_type", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(nb >= 2, "equiDepthHistogram: need at least 2 buckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col(valueCol).asc, col(idCol).asc)
    events.select(col(typeCol), col(valueCol), col(idCol))
      .withColumn("bucket", ntile(nb).over(w))
      .groupBy(col(typeCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"), min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }

  /** Ordered funnel over the event log — the product-analytics staple: how
    * many users did steps(0), then steps(1) STRICTLY later, …, each within
    * `windowSeconds` of their step-1 anchor time. First-touch semantics:
    * every stage matches the EARLIEST qualifying event, so each stage is a
    * min-aggregate — order-insensitive exact integers (µs), hash-exact on
    * any engine. One row per stage: (stage, step, users); a stage nobody
    * reaches still emits its row with users = 0.
    *
    * Scale: the log is filtered to ONE step's event type before each
    * user-keyed shuffle (the predicate reaches the scan), and every stage
    * frame is one (user, t, t0) row per surviving user — |steps| user-keyed
    * joins, no window functions, no per-user event buffers. The driver loop
    * runs over the |steps| query SHAPE, not data; the final per-stage counts
    * are one action (stage frames are shared plan branches, so their
    * shuffles are computed once and reused). */
  def funnel(events: DataFrame, steps: Seq[String],
      windowSeconds: Long = 7L * 86400): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("__us"))
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("__us")).as("__t"))
      .select(col("user_id"), col("__t"), col("__t").as("__t0"))
    val stages = steps.drop(1).scanLeft(first) { (prev, step) =>
      ev.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("__t").as("__pt"), col("__t0")),
          Seq("user_id"))
        .filter(col("__us") > col("__pt") &&
          col("__us") - col("__t0") <= windowSeconds * 1000000L)
        .groupBy(col("user_id"))
        // min of the carried constant __t0 = the constant — min (not first)
        // keeps the agg deterministic and map-side combinable
        .agg(min(col("__us")).as("__t"), min(col("__t0")).as("__t0"))
    }
    stages.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(step).as("step"), col("users"))
    }.reduce(_ unionAll _)
  }

  /** First-order Markov transition matrix over per-user event sequences —
    * the behavioral-model staple next to [[funnel]]: count every
    * consecutive (event, next-event) pair in each user's time-ordered
    * stream, and emit the exact conditional probability per source type as
    * a floor-scaled integer (`p_x1e6` = ⌊10⁶·cnt/Σ_from cnt⌋ — all-integer,
    * hash-exact on any engine). Ordering ties on ts break by event_id, so
    * the sequence — and the matrix — is bit-deterministic.
    *
    * Scale: ONE user-keyed shuffle for the lead() window (same key as
    * sessionization — a pipeline doing both reuses the exchange), then two
    * map-side-combinable count aggregates over the transition alphabet
    * (|types|² rows, microscopic next to the log). */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__us").asc, col("event_id").asc)
    val ev = events.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("__us"))
    val tr = ev.withColumn("__next", lead(col("event_type"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val tot = tr.groupBy(col("from_type")).agg(sum(col("cnt")).as("tot"))
    tr.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("cnt"),
        // DECIMAL scaling: log-sized counts × 10⁶ overflow Long at ~9·10¹²
        expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 DIV tot AS BIGINT)")
          .as("p_x1e6"))
  }

  /** Per-event z-scores against per-type moments — the metric-anomaly
    * report: z = (v − μ_type)/σ_type for every event, computed from
    * DECIMAL-exact sums so the moments are independent of partition order.
    * Values are pinned to 6 dp on entry (the cross-engine double→DECIMAL
    * recipe); downstream arithmetic is pure IEEE (subtract/divide/sqrt are
    * correctly rounded everywhere), so the raw doubles hash-match any
    * engine that mirrors the formula — no output rounding needed. Types
    * with zero variance emit NULL z (not a division error).
    *
    * Scale: one map-side-combinable moment aggregate (|types| rows,
    * broadcast back), then a pure per-row projection — a single scan. */
  def valueZScores(events: DataFrame, typeCol: String = "event_type",
      valueCol: String = "value", idCol: String = "event_id"): DataFrame = {
    // (17,6): v² is (35,12) — inside DECIMAL(38) so the square stays EXACT
    // (a wider input scale would overflow 38 digits and silently round)
    val pinned = round(col(valueCol), 6).cast(org.apache.spark.sql.types.DecimalType(17, 6))
    val ev = events.select(col(idCol), col(typeCol).as("etype"), pinned.as("__v"))
    val stats = ev.groupBy(col("etype").as("__sg")).agg(
      count(lit(1)).as("n"), sum(col("__v")).as("s"),
      sum(col("__v") * col("__v")).as("s2"))
    val m = col("s").cast("double") / col("n").cast("double")
    val variance = col("s2").cast("double") / col("n").cast("double") - m * m
    // NULL-SAFE group join: NULL-typed events score against their own
    // moment row instead of silently dropping
    ev.join(broadcast(stats), col("etype") <=> col("__sg"))
      .select(col(idCol), col("etype"),
        when(variance > 0.0,
          (col("__v").cast("double") - m) / sqrt(variance)).as("z"))
  }

  /** Exact per-event percentile rank within its type — the empirical CDF
    * position (pct = strictly-smaller count / type count, floor-scaled):
    * the calibration-free anomaly score next to [[valueZScores]] (a z-score
    * assumes rough normality; the CDF position does not). NULL values are
    * excluded (no defined rank); all-integer arithmetic, hash-exact.
    *
    * Scale: rank() over (type, value) is a range-partitioned sort per type —
    * the one unavoidable cost of EXACT ranks (this is Spark's scalable
    * global-sort shape, not a single-partition window); everything after is
    * a pure projection. For rank-free scoring at extreme scale use
    * [[valueZScores]] or quantile binning via
    * [[graft.pipeline.TextAnalysis.winsorize]] bounds. */
  def valuePercentiles(events: DataFrame, typeCol: String = "event_type",
      valueCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val ev = events.filter(col(valueCol).isNotNull)
      .select(col(idCol), col(typeCol).as("etype"),
        round(col(valueCol), 6).as("v"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("etype")).orderBy(col("v").asc)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("etype"))
    ev.withColumn("n_lt", rank().over(wr).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("pct_x1e6",
        expr("CAST(CAST(n_lt AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)"))
  }

  /** Retention cohort matrix — cohort(user) = the user's first active
    * period (floor of epoch µs over `periodSeconds`), cell = users from
    * cohort c still active k periods later. The activity set collapses to
    * DISTINCT (user, period) first (map-side combinable — the 100 TB log
    * never reaches the cohort join at event granularity), cohorts are one
    * min-agg over it, and the matrix is one grouped count. All-integer
    * arithmetic; epochs must be nonnegative (true for any real event-time
    * data — Spark's `div` truncates while the mirrored floor-divide floors,
    * which only diverges before 1970). */
  def retentionCohorts(events: DataFrame,
      periodSeconds: Long = 86400L): DataFrame = {
    val pUs = periodSeconds * 1000000L
    val up = events
      .select(col("user_id"), expr(s"unix_micros(ts) div ${pUs}L").as("__p"))
      .distinct()
    val cohort = up.groupBy(col("user_id")).agg(min(col("__p")).as("__c"))
    up.join(cohort, Seq("user_id"))
      .groupBy(col("__c").as("cohort_period"),
        (col("__p") - col("__c")).as("periods_since"))
      .agg(count(lit(1)).as("users"))
  }

  /** Streaming sessionization via flatMapGroupsWithState — the custom-state
    * extension point (KeyValueGroupedDataset, SURVEY §2.J "stateful ops are
    * beyond reference parity"). Emits one row per closed session.
    *
    * With `flushTimeout` set (a processing-time duration, e.g. "5 minutes"),
    * a user idle across micro-batches for that long has their open head
    * session flushed and state cleared — without it, the final session per
    * user would never be emitted (and state would be held forever for
    * one-shot users). */
  def sessionizeStream(events: DataFrame, gapSeconds: Long,
      flushTimeout: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark0 = events.sparkSession
    import spark0.implicits._
    val typed = events.select(col("user_id"), unix_micros(col("ts")).as("tsus"))
      .as[(Long, Long)]
    val timeoutConf =
      if (flushTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long, Long)], (Long, Long, Long)](
        OutputMode.Append(), timeoutConf) {
        case (uid, rows, state: GroupState[List[(Long, Long, Long)]]) =>
          if (state.hasTimedOut) {
            // idle past flushTimeout: emit the open head session and clear
            val open = state.getOption.getOrElse(Nil)
            state.remove()
            open.map { case (s, _, c) => (uid, s, c) }.iterator
          } else {
            // sessions as (start, last, count); batch-sorted fold
            val sorted = rows.map(_._2).toSeq.sorted
            val init = state.getOption.getOrElse(Nil)
            val gap = gapSeconds * 1000000L
            val sessions = sorted.foldLeft(init) { (acc, ts) =>
              acc match {
                case (s, l, c) :: tail if ts - l <= gap => (s, ts, c + 1) :: tail
                case _ => (ts, ts, 1L) :: acc
              }
            }
            // emit closed sessions (all but the most recent open one) and keep
            // ONLY the open head in state — retaining closed sessions would both
            // re-emit them on every later micro-batch (duplicate Append output)
            // and grow state unboundedly per user
            state.update(sessions.take(1))
            flushTimeout.foreach(state.setTimeoutDuration)
            sessions.drop(1).map { case (s, l, c) => (uid, s, c) }.iterator
          }
      }.toDF("user_id", "session_start_us", "n_events")
  }
}
