package graft

import graft.core._
import graft.mgmt.Management
import graft.stream.ChangeStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamMgmtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("change stream: foreachBatch listener sees exactly the full log (AvailableNow)") {
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val adds = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = ChangeStream.withChange(ChangeStream.readStream(spark, dir))
    val q = ChangeStream.addListener(stream, checkpoint) { (batch, _) =>
      seen.addAndGet(batch.count())
      adds.addAndGet(batch.filter(col("change") === "ADDED").count())
    }
    assert(q.awaitTermination(120000), "listener stream did not finish within 120s")
    val batchTotal = ChangeStream.replay(spark, dir).count()
    val batchAdds = ChangeStream.replay(spark, dir).filter(col("change") === "ADDED").count()
    assert(seen.get() === batchTotal)
    assert(adds.get() === batchAdds)
  }

  test("log readers are independent; each resumes from ITS OWN marker " +
      "(KCVSLog multi-reader contract — titan-test diskstorage/log/LogTest)") {
    // the reference's log store serves multiple named readers, each with a
    // durable read marker: every reader sees the whole log once, a restarted
    // reader resumes past what it consumed, and readers never disturb each
    // other. Checkpoint locations ARE the markers here.
    val c1 = Files.createTempDirectory("graft-reader1").toString
    val c2 = Files.createTempDirectory("graft-reader2").toString
    val total = ChangeStream.replay(spark, dir).count()
    def run(cp: String): Long = {
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      val stream = ChangeStream.readStream(spark, dir)
      val q = ChangeStream.addListener(stream, cp) { (b, _) => n.addAndGet(b.count()) }
      assert(q.awaitTermination(120000), "reader did not drain within 120s")
      n.get()
    }
    assert(run(c1) === total, "reader 1 must see the full log")
    assert(run(c2) === total, "reader 2 is independent and sees the full log too")
    assert(run(c1) === 0L, "a restarted reader resumes from its marker — nothing re-delivered")
    assert(run(c2) === 0L)
  }

  test("windowed aggregation over the change stream (watermark extension)") {
    val batch = ChangeStream.replay(spark, dir)
    val windowed = batch.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(windowed.count() > 0)
    val total = windowed.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === batch.count())
  }

  test("batch sessionization: session count bounded by events; gap=0 ⇒ one session per event") {
    val events = ChangeStream.replay(spark, dir)
    val stats = ChangeStream.sessionStats(events, gapSeconds = 3600).collect()
    stats.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1 && r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
    }
    // gap larger than the whole time range ⇒ exactly one session per user
    val one = ChangeStream.sessionStats(events, gapSeconds = 10L * 365 * 24 * 3600).collect()
    one.foreach(r => assert(r.getAs[Long]("n_sessions") === 1))
  }

  test("funnel: first-touch strict-order windowed stage matching") {
    import spark.implicits._
    def ev(uid: Long, typ: String, us: Long) = (uid, typ, us)
    val day = 86400L * 1000000L
    val rows = Seq(
      // u1 converts all three stages in order
      ev(1, "signup", 0L), ev(1, "view", 10L), ev(1, "purchase", 20L),
      // u2: view at the SAME µs as signup — strict > excludes it
      ev(2, "signup", 100L), ev(2, "view", 100L), ev(2, "purchase", 200L),
      // u3: view BEFORE signup — order violated, stage 1 only
      ev(3, "view", 50L), ev(3, "signup", 100L),
      // u4: view 8 days after signup — outside the 7-day window
      ev(4, "signup", 0L), ev(4, "view", 8L * day),
      // u5 never signs up — not in the funnel at all
      ev(5, "view", 0L), ev(5, "purchase", 10L))
    val events = rows.toDF("user_id", "event_type", "__us")
      .withColumn("ts", timestamp_micros(col("__us"))).drop("__us")
    val got = ChangeStream.funnel(events, Seq("signup", "view", "purchase"),
        windowSeconds = 7L * 86400)
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got === Map(1 -> ("signup", 4L), 2 -> ("view", 1L),
      3 -> ("purchase", 1L)))
  }

  test("eventTransitions: per-user consecutive pairs, event_id tie-break") {
    import spark.implicits._
    val rows = Seq(
      // u1: a -> b -> a (two transitions)
      (1L, 10L, "a", 0L), (1L, 11L, "b", 10L), (1L, 12L, "a", 20L),
      // u2: SAME ts for both events — event_id orders them b before a
      (2L, 20L, "b", 5L), (2L, 21L, "a", 5L),
      // u3: single event, no transition
      (3L, 30L, "a", 0L))
    val events = rows.toDF("user_id", "event_id", "event_type", "__us")
      .withColumn("ts", timestamp_micros(col("__us"))).drop("__us")
    val got = ChangeStream.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // from a: 1 of 1 to b; from b: a->a count 2 of 2 total
    assert(got === Map(
      ("a", "b") -> ((1L, 1000000L)),
      ("b", "a") -> ((2L, 1000000L))))
  }

  test("valueZScores: exact moments, zero-variance type yields NULL z") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 0.0), (2L, "a", 10.0),       // mean 5, sd 5 -> z = -1, +1
      (3L, "b", 7.0), (4L, "b", 7.0))        // constant -> NULL
    val events = rows.toDF("event_id", "event_type", "value")
    val got = ChangeStream.valueZScores(events).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got === Map(1L -> Some(-1.0), 2L -> Some(1.0), 3L -> None, 4L -> None))
  }

  test("valuePercentiles: exact CDF ranks, ties share n_lt, NULLs dropped") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(2.0)), (3L, "a", Some(2.0)),
      (4L, "a", Some(9.0)), (5L, "a", None))
    val events = rows.toDF("event_id", "event_type", "value")
    val got = ChangeStream.valuePercentiles(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      1L -> ((0L, 4L, 0L)), 2L -> ((1L, 4L, 250000L)),
      3L -> ((1L, 4L, 250000L)), 4L -> ((3L, 4L, 750000L))))
  }

  test("retentionCohorts: distinct daily activity against first-day cohorts") {
    import spark.implicits._
    val day = 86400L * 1000000L
    // u1 active days 0,1,3 (two events day 0 collapse); u2 active days 1,2
    val rows = Seq((1L, 0L), (1L, 1000L), (1L, day + 5L), (1L, 3 * day),
      (2L, day), (2L, 2 * day))
    val events = rows.toDF("user_id", "__us")
      .withColumn("ts", timestamp_micros(col("__us"))).drop("__us")
    val got = ChangeStream.retentionCohorts(events, periodSeconds = 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("streaming sessionization (flatMapGroupsWithState) emits closed sessions") {
    val checkpoint = Files.createTempDirectory("graft-ckpt2").toString
    val stream = ChangeStream.readStream(spark, dir)
    val sessions = ChangeStream.sessionizeStream(stream, gapSeconds = 3600)
    val q = sessions.writeStream
      .option("checkpointLocation", checkpoint)
      .format("memory").queryName("graft_sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "sessionization stream did not finish within 120s")
    val out = spark.table("graft_sessions")
    // closed sessions = total sessions - one open session per user
    val batch = ChangeStream.sessionStats(ChangeStream.replay(spark, dir), 3600)
    val expectedClosed = batch.agg(sum(col("n_sessions"))).collect()(0).getLong(0) - batch.count()
    assert(out.count() === expectedClosed)
  }

  private def writeEventFile(inDir: String, name: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-evt-tmp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, new java.io.File(inDir, name).toPath)
  }

  /** Run one AvailableNow pass, appending emitted sessions to `sink`
    * (foreachBatch — the memory sink cannot recover from a checkpoint, so
    * cross-restart tests must collect this way). */
  private def runSessionQuery(inDir: String, checkpoint: String,
      sink: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)],
      flushTimeout: Option[String] = None): Unit = {
    val stream = spark.readStream.schema(ChangeStream.eventsSchema).parquet(inDir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    val sessions = ChangeStream.sessionizeStream(stream, gapSeconds = 3600,
      flushTimeout = flushTimeout)
    val q = sessions.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        sink.synchronized { sink ++= rows }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // A pending ProcessingTimeTimeout keeps AvailableNow scheduling (empty)
    // micro-batches indefinitely, so flush passes never self-terminate: wait
    // for the sink to go quiet, then stop — otherwise the query leaks and
    // burns CPU under the whole remaining suite.
    val finished = q.awaitTermination(if (flushTimeout.isDefined) 5000 else 120000)
    if (!finished) {
      var last = sink.synchronized(sink.size)
      var stable = 0
      while (q.isActive && stable < 10) { // 5s of sink quiescence
        Thread.sleep(500)
        val now = sink.synchronized(sink.size)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      q.stop()
    }
  }

  test("streaming sessionization across micro-batches: closed session emitted once, never re-emitted") {
    val inDir = Files.createTempDirectory("graft-sess-in").toString
    val checkpoint = Files.createTempDirectory("graft-sess-ckpt").toString
    val ns = 1000000000L
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    // batch 1: user 1, two events 10s apart — one open session, nothing closed
    writeEventFile(inDir, "a.parquet", Seq(
      (1L, 0L, 1L, "click", 0.0, "{}"), (2L, 10L * ns, 1L, "click", 0.0, "{}")))
    runSessionQuery(inDir, checkpoint, sink)
    assert(sink.isEmpty, s"open session must not be emitted early: $sink")
    // batch 2 (separate micro-batch via restart): user 1 returns 8h later —
    // closes the first session, opens a new one. The round-1 bug kept closed
    // sessions in state and re-emitted them every batch.
    writeEventFile(inDir, "b.parquet", Seq(
      (3L, 8L * 3600L * ns, 1L, "click", 0.0, "{}")))
    runSessionQuery(inDir, checkpoint, sink)
    assert(sink.toList === List((1L, 0L, 2L)),
      s"exactly one closed session (start 0, 2 events), got $sink")
  }

  test("streaming sessionization: flushTimeout emits the final open session exactly once") {
    val inDir = Files.createTempDirectory("graft-flush-in").toString
    val checkpoint = Files.createTempDirectory("graft-flush-ckpt").toString
    val ns = 1000000000L
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    writeEventFile(inDir, "a.parquet", Seq(
      (1L, 0L, 1L, "click", 0.0, "{}"), (2L, 5L * ns, 1L, "click", 0.0, "{}")))
    runSessionQuery(inDir, checkpoint, sink, flushTimeout = Some("1 millisecond"))
    Thread.sleep(100) // let user 1's processing-time timeout lapse
    // a later batch (other user) triggers timeout processing for idle user 1
    // (if AvailableNow already ran a trailing batch past the timeout, the
    // flush legitimately happened in the first pass — either way, exactly one
    // emission with both events)
    writeEventFile(inDir, "b.parquet", Seq(
      (3L, 9L * 3600L * ns, 99L, "click", 0.0, "{}")))
    runSessionQuery(inDir, checkpoint, sink, flushTimeout = Some("10 minutes"))
    val user1 = sink.filter(_._1 == 1L)
    assert(user1.toList === List((1L, 0L, 2L)),
      s"idle user's open session must flush exactly once with 2 events, got $sink")
  }

  test("streaming dedup: replayed event ids across micro-batches emitted once") {
    val inDir = Files.createTempDirectory("graft-dedup-in").toString
    val checkpoint = Files.createTempDirectory("graft-dedup-ckpt").toString
    val ns = 1000000000L
    val sink = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runPass(): Unit = {
      val stream = spark.readStream.schema(ChangeStream.eventsSchema).parquet(inDir)
        .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      val q = ChangeStream.dedupStream(stream).writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = batch.select("event_id").collect().map(_.getLong(0))
          sink.synchronized { sink ++= ids }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "dedup stream pass did not finish within 120s")
    }
    // base event time well past epoch: rows at/below the initial watermark
    // (epoch 0) would be discarded as late before reaching the dedup operator
    val t0 = 1000L * 3600L * ns
    writeEventFile(inDir, "a.parquet", Seq(
      (1L, t0, 1L, "click", 0.0, "{}"), (2L, t0 + 1L * ns, 1L, "click", 0.0, "{}"),
      (3L, t0 + 2L * ns, 2L, "click", 0.0, "{}")))
    runPass()
    // replay batch: 2 and 3 are WAL re-deliveries, 4 is new
    writeEventFile(inDir, "b.parquet", Seq(
      (2L, t0 + 1L * ns, 1L, "click", 0.0, "{}"), (3L, t0 + 2L * ns, 2L, "click", 0.0, "{}"),
      (4L, t0 + 3L * ns, 2L, "click", 0.0, "{}")))
    runPass()
    assert(sink.sorted.toList === List(1L, 2L, 3L, 4L),
      s"each event id must be emitted exactly once, got ${sink.sorted.toList}")
  }

  test("readStream leaves the caller session's conf untouched after a full run") {
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(confKey)
    val checkpoint = Files.createTempDirectory("graft-ckpt-conf").toString
    val stream = ChangeStream.readStream(spark, dir)
    val q = ChangeStream.addListener(stream, checkpoint) { (_, _) => () }
    assert(q.awaitTermination(120000), "conf-isolation stream did not finish within 120s")
    assert(spark.conf.getOption(confKey) === before,
      "readStream must not mutate the caller session's conf")
  }

  test("plain-int64 events.ts drop fails loudly in BOTH batch and stream readers") {
    // a malformed drop: ts stored as unannotated int64 carrying MICROseconds
    // (~1.7e15) — silently treating it as nanos would mis-scale event time
    // 1000x; the magnitude guard must throw instead, on both paths
    val tmp = Files.createTempDirectory("graft-int64").toString
    val base = 1700000000000000L // epoch-µs, far below the 1e17 ns floor
    spark.range(5).selectExpr(
      "id AS event_id", s"CAST($base + id AS LONG) AS ts", "id AS user_id",
      "'click' AS event_type", "CAST(id AS DOUBLE) AS value", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val exBatch = intercept[IllegalStateException] {
      SparkEntry.readEventsRaw(spark, tmp)
    }
    assert(exBatch.getMessage.contains("not plausible epoch-nanoseconds"))
    val exStream = intercept[IllegalStateException] {
      ChangeStream.readStream(spark, tmp)
    }
    assert(exStream.getMessage.contains("not plausible epoch-nanoseconds"))
  }

  test("management: maker surface + commit") {
    val mgmt = new Management(GraphSchema())
    mgmt.makePropertyKey("score").dataType(org.apache.spark.sql.types.DoubleType).make()
    mgmt.makePropertyKey("tag").cardinality(Cardinality.SET).make()
    mgmt.makeVertexLabel("doc").partition().make()
    // a sort key requires MULTI multiplicity (the reference maker rule,
    // testSchemaTypes TitanGraphTest.java:536-546) — so 'cites' keeps its
    // sort key on MULTI and the SIMPLE label is declared without one
    mgmt.makeEdgeLabel("cites").sortKey("score").make()
    mgmt.makeEdgeLabel("refutes").multiplicity(Multiplicity.SIMPLE).make()
    val schema = mgmt.commit()
    assert(schema.propertyKey("tag").columnType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    assert(schema.vertexLabel("doc").partitioned)
    assert(schema.edgeLabel("cites").sortKey === Seq("score"))
    assert(schema.edgeLabel("refutes").multiplicity === Multiplicity.SIMPLE)
  }

  test("management: index lifecycle state machine") {
    val mgmt = new Management(GraphSchema())
    mgmt.makePropertyKey("name").make()
    mgmt.buildIndex("byName", ElementCategory.VERTEX).addKey("name").buildMixedIndex()
    assert(mgmt.indexStatus("byName") === SchemaStatus.INSTALLED)
    assert(mgmt.updateIndex("byName", SchemaAction.REGISTER_INDEX) === SchemaStatus.REGISTERED)
    assert(mgmt.updateIndex("byName", SchemaAction.ENABLE_INDEX) === SchemaStatus.ENABLED)
    assert(mgmt.updateIndex("byName", SchemaAction.REINDEX) === SchemaStatus.ENABLED)
    assert(mgmt.updateIndex("byName", SchemaAction.DISABLE_INDEX) === SchemaStatus.DISABLED)
    intercept[IllegalStateException] {
      mgmt.updateIndex("byName", SchemaAction.ENABLE_INDEX)
    }
    mgmt.updateIndex("byName", SchemaAction.REMOVE_INDEX)
    assert(!mgmt.current.indexes.contains("byName"))
  }

  test("SET cardinality: dedup-on-write + violation detection") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = GraphSchema()
      .withPropertyKey(PropertyKeyDef("tags", StringType, Cardinality.SET))
    val v = Seq((1L, "d", Seq("a", "b", "a")), (2L, "d", Seq("x")))
      .toDF("id", "label", "tags")
    val e = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("src", LongType),
        StructField("dst", LongType), StructField("label", StringType))))
    val g = graft.data.PropertyGraph(schema, v, e)
    assert(g.schemaViolations().exists(_.contains("duplicate")))
    val fixed = g.normalizedSets()
    assert(fixed.schemaViolations().isEmpty)
    assert(fixed.vertices.filter(col("id") === 1)
      .select(size(col("tags"))).collect()(0).getInt(0) === 2)
  }

  test("DefaultSchemaMaker: auto-creates undeclared types on first use; strict mode rejects") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val v = Seq((1L, "doc", "hello", 3.5, Seq("a", "b")))
      .toDF("id", "label", "title", "score", "tags")
    val e = Seq((1L, 1L, 1L, "cites", 2)).toDF("id", "src", "dst", "label", "weight")
    // schema.default=none (DisableDefaultSchemaMaker): undeclared types throw
    val ex = intercept[IllegalArgumentException] {
      graft.mgmt.DefaultSchemaMaker.require(GraphSchema(), v, e)
    }
    assert(ex.getMessage.contains("'title'") && ex.getMessage.contains("'cites'"))
    // schema.default=default: exact-type inference, maker defaults
    val schema = graft.mgmt.DefaultSchemaMaker.complete(GraphSchema(), v, e)
    assert(schema.propertyKey("title").columnType === StringType)
    assert(schema.propertyKey("score").columnType === DoubleType)
    assert(schema.propertyKey("weight").columnType === IntegerType)
    assert(schema.propertyKey("tags").cardinality === Cardinality.LIST)
    assert(!schema.vertexLabel("doc").partitioned)
    assert(schema.edgeLabel("cites").multiplicity === Multiplicity.MULTI)
    // completed catalog passes strict mode; completion is idempotent
    graft.mgmt.DefaultSchemaMaker.require(schema, v, e)
    assert(graft.mgmt.DefaultSchemaMaker.complete(schema, v, e) === schema)
    // a pre-declared type keeps its definition — only gaps are filled
    val pre = GraphSchema().withPropertyKey(
      PropertyKeyDef("score", DoubleType, Cardinality.SET))
    assert(graft.mgmt.DefaultSchemaMaker.complete(pre, v, e)
      .propertyKey("score").cardinality === Cardinality.SET)
    // the synthesized catalog structurally conforms to the frames it came from
    assert(graft.data.PropertyGraph(schema, v, e).schemaViolations().isEmpty)
  }

  test("management: duplicate type definition rejected; rename allowed") {
    val mgmt = new Management(GraphSchema())
    mgmt.makePropertyKey("x").make()
    intercept[IllegalArgumentException] { mgmt.makePropertyKey("x").make() }
    mgmt.renamePropertyKey("x", "y")
    assert(mgmt.current.propertyKeys.contains("y") && !mgmt.current.propertyKeys.contains("x"))
  }

  test("index: composite lookup equals direct filter; edge layout round-trips") {
    val g = graft.data.TpchGraph.load(spark, dir)
    val ix = graft.index.Indexes.materialize(g, g.schema.indexes("byUid"))
    val viaIndex = graft.index.Indexes.lookup(g, ix, Map("uid" -> 42L))
      .select("id").collect().map(_.getLong(0)).toSet
    val direct = g.vertices.filter(col("uid") === 42L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaIndex === direct && direct.nonEmpty)

    val out = Files.createTempDirectory("graft-layout").toString + "/edges"
    graft.index.Indexes.writeEdgeLayout(g, out, buckets = 4, sortKeys = Seq("shipdate"))
    val back = spark.read.parquet(out)
    assert(back.count() === g.edges.count())
  }

  test("indexQuery: scored text search with limit/offset paging") {
    val g = graft.data.TpchGraph.load(spark, dir)
    val page1 = graft.index.Indexes.indexQuery(g, ElementCategory.VERTEX, "name", "red widget", 5, 0)
      .select("id").collect().map(_.getLong(0)).toSeq
    val page2 = graft.index.Indexes.indexQuery(g, ElementCategory.VERTEX, "name", "red widget", 5, 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(page1.size === 5 && page2.size === 5)
    assert((page1.toSet intersect page2.toSet).isEmpty)
  }

  test("materializeGraph: per-batch enforcement fails the stream on a static-label violation") {
    val checkpoint = Files.createTempDirectory("graft-cmut-t").toString
    val g0 = graft.data.TpchGraph.load(spark, dir)
    val g = g0.copy(schema = g0.schema.copy(vertexLabels = g0.schema.vertexLabels +
      ("region" -> VertexLabelDef("region", static = true))))
    val t = 1L << GraphIds.TagBits
    val stream = ChangeStream.withChange(ChangeStream.readStream(spark, dir))
    // every batch tries to overwrite an EXISTING static-label vertex -> the
    // eager enforcement inside applyMutations must fail the streaming query
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ChangeStream.materializeGraph(stream, s"$checkpoint/ckpt", g) { batch =>
        ChangeStream.Mutations(addVertices = Some(
          batch.limit(1).select(lit(1L * t + 0L).as("id"),
            lit("region").as("label"), lit(0L).as("uid"), lit("RENAMED").as("name"))))
      }
    }
    assert(ex.getMessage.contains("static-label") ||
      Option(ex.getCause).exists(_.getMessage.contains("static-label")))
  }

  test("renamePropertyKey cascades through indexes, signatures and sort keys") {
    val g = graft.data.TpchGraph.load(spark, dir)
    val s2 = g.schema.renamePropertyKey("shipdate", "shipped")
    assert(s2.propertyKeys.contains("shipped") && !s2.propertyKeys.contains("shipdate"))
    assert(s2.edgeLabels("contains").sortKey === Seq("shipped"))
    assert(s2.relationIndexes("containsByShip").sortKey === Seq("shipped"))
    assert(g.schema.renamePropertyKey("name", "title").indexes("byName").keys === Seq("title"))
    // graph-level rename moves the frame column too; queries follow the new name
    val g2 = graft.olap.GraphOps.renameProperty(g, "name", "title")
    assert(g2.vertices.columns.contains("title") && !g2.vertices.columns.contains("name"))
    assert(g2.V().has("title", "NATION_5").dataframe.count() === 1)
  }

  test("incrementalComponents: cross-batch merges fold to exact batch CC") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-icc")
    try {
      // batch 1: two components {1,2} and {3,4}; batch 2 bridges them via
      // 2-3 AND starts {5,6} — the merge must rewrite batch-1 state
      Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
        .coalesce(1).write.parquet(s"$tmp/in/f1")
      Seq((2L, 3L), (5L, 6L)).toDF("src", "dst")
        .coalesce(1).write.parquet(s"$tmp/in/f2")
      val stream = spark.readStream
        .schema("src LONG, dst LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$tmp/in/*")
      val labels = graft.stream.ChangeStream
        .incrementalComponents(stream, s"$tmp/ckpt")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        5L -> 5L, 6L -> 5L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp.toString)).deleteRecursively()
    }
  }

  test("incrementalComponents: restart resumes from durable checkpoint state, not an empty driver") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-icc-restart")
    try {
      // invocation 1 ("before the kill"): only batch-1 files exist
      Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
        .coalesce(1).write.parquet(s"$tmp/in/f1")
      def run(): Map[Long, Long] = {
        val stream = spark.readStream
          .schema("src LONG, dst LONG")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*")
        graft.stream.ChangeStream
          .incrementalComponents(stream, s"$tmp/ckpt")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert(run() === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
      // "restart": a FRESH invocation over the same checkpoint after new
      // data arrived — the offset log skips batch 1, so these labels can
      // only be right if the state was durably recovered
      Seq((2L, 3L), (5L, 6L)).toDF("src", "dst")
        .coalesce(1).write.parquet(s"$tmp/in/f2")
      assert(run() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        5L -> 5L, 6L -> 5L))
      // a drained restart with no new input is a no-op returning the state
      assert(run() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        5L -> 5L, 6L -> 5L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp.toString)).deleteRecursively()
    }
  }

  test("incrementalComponents: pair set past the driver-merge cap takes the distributed flood, same labels") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-icc-flood")
    // cap 0 ⇒ EVERY batch's class-pair set exceeds the bounded-control-read
    // regime and the pointer-doubled distributed min-label flood must
    // produce the identical fixpoint (a 6-vertex chain arriving in two
    // batches exercises cross-batch merging through the flood path)
    spark.conf.set("spark.graft.msf.driverMergeMaxRows", "0")
    try {
      Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
        .coalesce(1).write.parquet(s"$tmp/in/f1")
      Seq((2L, 3L), (4L, 5L)).toDF("src", "dst")
        .coalesce(1).write.parquet(s"$tmp/in/f2")
      val stream = spark.readStream
        .schema("src LONG, dst LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$tmp/in/*")
      val labels = graft.stream.ChangeStream
        .incrementalComponents(stream, s"$tmp/ckpt")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels === (1L to 6L).map(_ -> 1L).toMap)
    } finally {
      spark.conf.unset("spark.graft.msf.driverMergeMaxRows")
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp.toString)).deleteRecursively()
    }
  }
}
