package graft

import graft.data.TpchGraph
import graft.expr.P
import graft.query.{Direction, VertexCentricQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry runs a graph-engine operator (SURVEY.md §2) over the TPC-H-ish
  * property-graph mapping (FIXTURES.md §4) and is paired with ANSI SQL over the
  * flat tables for the DuckDB oracle. Double aggregates go through exact
  * DECIMAL accumulation and one final cast to DOUBLE so both engines produce
  * bit-identical results regardless of summation order; dates are emitted as
  * 'yyyy-MM-dd' strings for representation-independent hashing.
  */
object SparkEntry {

  /** Memoized per (session, dir): the graph is served from TpchGraph's
    * materialized layout (derived vertex/edge tables written once per data
    * dir — the lineitem edge-id window is paid at ingest, never inside a
    * query plan, and `label` filters prune partitions at file-listing time).
    * Weak session keys let stopped sessions (and their pinned file
    * indexes/plans) be collected. The cached plans freeze the parquet file
    * listing — fine here because the testdata directories are immutable by
    * contract. */
  private val graphCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, graft.data.PropertyGraph]]())
  /** Recursively delete a stream probe's staged temp dir (inputs +
    * checkpoint) — shared by every streaming probe's every-exit cleanup. */
  private def deleteRecursively(tmp: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(tmp)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  /** Await an AvailableNow stream probe; stop + fail loudly on timeout
    * (a hung stream must never read as an empty-but-green probe). */
  private def awaitStreamProbe(q: org.apache.spark.sql.streaming.StreamingQuery,
      name: String): Unit = {
    val finished = q.awaitTermination(300000)
    if (!finished) { q.stop(); sys.error(s"$name: stream did not finish in 300s") }
  }

  /** The "batch operator, stream engine" probe scaffold: write `src` to a
    * per-invocation temp dir, readStream it with the same schema, apply
    * `build`, drain through a complete-mode memory sink, clean up. One
    * definition so the drain/dropTempView/cleanup sequence cannot be got
    * subtly wrong in the next streaming probe. */
  private def streamProbe(s: SparkSession, name: String, src: DataFrame)(
      build: DataFrame => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-$name")
    src.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
    val stream = s.readStream.schema(src.schema).parquet(s"$tmp/in")
    val qname = s"graft_${name}_${System.nanoTime()}"
    val q = build(stream)
      .writeStream.format("memory").queryName(qname).outputMode("complete")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      awaitStreamProbe(q, name)
      val t = s.table(qname)
      s.catalog.dropTempView(qname)
      t
    } finally deleteRecursively(tmp)
  }

  private def graph(s: SparkSession, dir: String): graft.data.PropertyGraph = {
    val perSession = graphCache.synchronized {
      var m = graphCache.get(s)
      if (m == null) { m = scala.collection.mutable.Map.empty; graphCache.put(s, m) }
      m
    }
    perSession.synchronized(perSession.getOrElseUpdate(dir, TpchGraph.loadMaterialized(s, dir)))
  }
  /** Co-location triangle fixture shared by q_triangles / q_triangles_df:
    * customer↔supplier edges within a nation close triangles with the shared
    * nation vertex, so every per-vertex count has a closed-form SQL mirror
    * (nation: nc·ns; customer: ns; supplier: nc). Returns the derived graph
    * plus the (kind, uid) projection columns. */
  private def triangleFixture(s: SparkSession, dir: String)
      : (graft.data.PropertyGraph, Column, Column) = {
    val g = graph(s, dir)
    val t = 1L << graft.core.GraphIds.TagBits
    val tag = shiftrightunsigned(col("src"), graft.core.GraphIds.TagBits)
    val inN = g.edges.filter(col("label") === "in_nation")
    val custN = inN.filter(tag === TpchGraph.CustomerTag)
      .select(col("src").as("c"), col("dst").as("nk"))
    val suppN = inN.filter(tag === TpchGraph.SupplierTag)
      .select(col("src").as("s2"), col("dst").as("nk"))
    val cs = custN.join(suppN, "nk")
      .select(lit(0L).as("id"), col("c").as("src"), col("s2").as("dst"),
        lit("colocated").as("label"))
    val verts = g.vertices.filter(col("label").isin("nation", "customer", "supplier"))
    val derived = g.copy(vertices = verts,
      edges = inN.select(col("id"), col("src"), col("dst"), col("label")).unionByName(cs))
    val kind = when(shiftrightunsigned(col("id"), graft.core.GraphIds.TagBits) ===
        TpchGraph.NationTag, "nation")
      .when(shiftrightunsigned(col("id"), graft.core.GraphIds.TagBits) ===
        TpchGraph.CustomerTag, "customer")
      .otherwise("supplier")
    (derived, kind, col("id") % t)
  }
  /** vertex id → source uid */
  private def uidOf(c: Column, tag: Int): Column =
    (c - lit(tag.toLong * (1L << graft.core.GraphIds.TagBits))).cast(LongType)
  /** order-insensitive exact double sum: decimal-accumulate, cast once. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Reference TinkerPop-conformance fixture (TitanGraphTest.java
    * testTinkerPopOptimizationStrategies): 100 plain vertices (pid j,
    * weight j%5) + 10 supernodes (pid -1, 'id'=sid in the reference), each
    * supernode knowing all 100 with edge weight j%5. Pure range()
    * arithmetic — the DuckDB oracle rebuilds the same relation verbatim,
    * so the probes pin the traversal engine against the reference's own
    * expected counts, not against a copy of its data. */
  private def tpFixture(s: SparkSession): graft.data.PropertyGraph = {
    val normals = s.range(100).select((col("id") + 1L).as("id"),
      lit("v").as("label"), col("id").as("pid"), (col("id") % 5).as("weight"))
    val supers = s.range(10).select((col("id") + 1001L).as("id"),
      lit("v").as("label"), lit(-1L).as("pid"), lit(null).cast("long").as("weight"))
    val edges = s.range(1000).select(
      (col("id") + 5000L).as("id"),
      expr("CAST(id DIV 100 + 1001 AS BIGINT)").as("src"),
      (col("id") % 100 + 1L).as("dst"),
      lit("knows").as("label"),
      (col("id") % 100 % 5).as("weight"))
    graft.data.PropertyGraph(graft.core.GraphSchema(), normals.unionByName(supers), edges)
  }

  /** Reference vertex-centric conformance fixture (TitanGraphTest.java
    * testVertexCentricQuery:2522-2700): anchors v (id 1) and u (id 2) plus
    * vs[i] (id 10+i, i in 1..9999); for every i each anchor gets one OUT
    * and one IN edge to vs[i] — label cycling connect/friend/knows for v
    * and connectDesc/friendDesc/knows for u by i%3 — with edge props
    * time=i, weight=i%4+0.5, number=i%5. Pure range() arithmetic, mirrored
    * verbatim by the DuckDB oracle. */
  private def tpVcFixture(s: SparkSession): graft.data.PropertyGraph = {
    val anchors = s.range(1, 3).select(col("id"), lit("anchor").as("label"))
    val vs = s.range(1, 10000).select((col("id") + 10L).as("id"), lit("vx").as("label"))
    val base = s.range(1, 10000).select(col("id").as("i"),
      expr("element_at(array('connect','friend','knows'), CAST(id % 3 AS INT) + 1)").as("lv"),
      expr("element_at(array('connectDesc','friendDesc','knows'), CAST(id % 3 AS INT) + 1)").as("lu"),
      (col("id") % 4 + lit(0.5)).as("weight"), (col("id") % 5).as("number"))
    def edge(k: Int, src: Column, dst: Column, lbl: Column) =
      base.select((col("i") * 4 + k + 100000L).as("id"), src.as("src"), dst.as("dst"),
        lbl.as("label"), col("i").as("time"), col("weight"), col("number"))
    val edges = edge(0, lit(1L), col("i") + 10L, col("lv"))
      .unionByName(edge(1, col("i") + 10L, lit(1L), col("lv")))
      .unionByName(edge(2, lit(2L), col("i") + 10L, col("lu")))
      .unionByName(edge(3, col("i") + 10L, lit(2L), col("lu")))
    graft.data.PropertyGraph(graft.core.GraphSchema(), anchors.unionByName(vs), edges)
  }
  /** IndexProviderTest document fixture (titan-test diskstorage/indexing/
    * IndexProviderTest.java:164-177, getDocument:851-870): three documents
    * carrying the full provider key set — TEXT (tokenized), NAME (exact
    * string, same value as TEXT), TIME (long), WEIGHT (double), LOCATION
    * (geo point), PHONE_LIST (LIST), PHONE_SET (SET), DATE (instant, epoch
    * seconds). The DuckDB oracle mirrors the same rows as a VALUES list and
    * recomputes every assertion from the data (token lists via
    * string_split_regex, haversine for geo). */
  private def ixpDocRows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L, "Hello world", 1001L, 5.2, 48.0, 0.0,
        Seq("1", "2", "3"), Seq("1", "2"), 1L),
      (2L, "Tomorrow is the world", 1010L, 8.5, 49.0, 1.0,
        Seq("4", "5", "6"), Seq("4", "5"), 2L),
      (3L, "Hello Bob, are you there?", -500L, 10.1, 47.0, 10.0,
        Seq("7", "8", "9"), Seq("7", "8"), 3L))
      .toDF("id", "text", "time", "weight", "lat", "lon", "phone_list", "phone_set", "ds")
      .select(col("id"), col("text"), col("text").as("name"), col("time"),
        col("weight"), graft.expr.Geo.pointCol(col("lat"), col("lon")).as("location"),
        col("phone_list"), col("phone_set"), col("ds").cast("timestamp").as("date"))
  }

  /** The provider fixture's schema: phone keys declared SET/LIST so the
    * per-element predicate semantics engage, text declared so TEXT-mapped
    * indexes can be built over it (IndexProviderTest registers the key set
    * with these cardinalities/types — :78-99). */
  private def ixpSchema: graft.core.GraphSchema =
    graft.core.GraphSchema()
      .withPropertyKey(graft.core.PropertyKeyDef("text",
        org.apache.spark.sql.types.StringType))
      .withPropertyKey(graft.core.PropertyKeyDef("phone_list",
        org.apache.spark.sql.types.StringType, graft.core.Cardinality.LIST))
      .withPropertyKey(graft.core.PropertyKeyDef("phone_set",
        org.apache.spark.sql.types.StringType, graft.core.Cardinality.SET))

  /** Both provider stores over the same documents (multipleStores — :159):
    * a VERTEX store (documents as vertices) and an EDGE store (documents as
    * self-loop edges carrying the same keys). */
  private def ixpVertexStore(s: SparkSession): graft.data.PropertyGraph = {
    val docs = ixpDocRows(s).withColumn("label", lit("doc"))
    graft.data.PropertyGraph(ixpSchema, docs,
      docs.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
  }
  private def ixpEdgeStore(s: SparkSession): graft.data.PropertyGraph = {
    val docs = ixpDocRows(s)
    val vs = docs.select(col("id"), lit("v").as("label"))
    val es = docs.select(col("id"), col("id").as("src"), col("id").as("dst"),
      lit("doc").as("label"), col("text"), col("name"), col("time"), col("weight"),
      col("location"), col("phone_list"), col("phone_set"), col("date"))
    graft.data.PropertyGraph(ixpSchema, vs, es)
  }

  /** Reference OLAP conformance fixture — deterministic range() twin of
    * OLAPTest.generateRandomGraph (titan-test olap/OLAPTest.java:61-88):
    * vertex i (id i+1, i in 0..99) carries uid=i+1, numvals in 1..5 (LCG
    * draw), a `values` LIST of exactly numvals elements, and emits i+1
    * 'knows' out-edges to dst ((i·31+j·17) mod 100)+1 — so Σ outdeg =
    * numV·(numV+1)/2 = 5050, the invariant the reference asserts at :87.
    * Every draw is pure modular arithmetic, mirrored verbatim in DuckDB. */
  private def tpOlapFixture(s: SparkSession): graft.data.PropertyGraph = {
    val verts = s.range(100)
      .select((col("id") + 1L).as("id"), lit("v").as("label"),
        (col("id") + 1L).as("uid"),
        (expr("(1103515245 * (id + 1) + 12345) % 2147483648") % 5L + 1L).as("numvals"))
      .withColumn("values",
        expr("transform(sequence(1, CAST(numvals AS INT)), j -> (id * 7 + j * 13) % 100)"))
    val edges = s.range(100)
      .select(col("id").as("i"), explode(expr("sequence(0, id)")).as("j"))
      .select((col("i") * 100L + col("j") + 10000L).as("id"),
        (col("i") + 1L).as("src"),
        ((col("i") * 31L + col("j") * 17L) % 100L + 1L).as("dst"),
        lit("knows").as("label"))
    graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
  }

  private def d(s: String) = java.sql.Date.valueOf(s)

  /** Session clone carrying `spark.sql.legacy.parquet.nanosAsLong`. The flag
    * must be live when the scan EXECUTES (the parquet reader resolves confs
    * through the relation's session, captured at read time), so save/restore
    * around the read would break; and setting it on the caller's session is
    * an ordering-dependent side effect across probes. Binding events reads to
    * a dedicated clone gives every downstream plan the flag without mutating
    * shared session state. Weak keys: entries die with the parent session. */
  private val nsSessions = new java.util.WeakHashMap[SparkSession, SparkSession]()
  private[graft] def nsSession(s: SparkSession): SparkSession = nsSessions.synchronized {
    var c = nsSessions.get(s)
    if (c == null) {
      c = s.newSession()
      c.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      nsSessions.put(s, c)
    }
    c
  }

  /** events.parquet has stored `ts` as TIMESTAMP(NANOS) in some data drops
    * and timestamp[us] in others; downstream probes and the vertex-property
    * model want the ns-long form either way. TIMESTAMP(NANOS) surfaces as a
    * ns long under the legacy conf (isolated session clone, see
    * [[nsSession]]); µs timestamps (with or without tz) are converted to ns
    * longs here (session tz is UTC in every entry point, so the NTZ cast is
    * exact). Raw variant always yields `ts` as an epoch-ns long. */
  def readEventsRaw(s: SparkSession, dir: String): DataFrame = {
    val df = nsSession(s).read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        // shared plain-int64 magnitude guard (see its doc) — the streaming
        // source applies the identical check, so batch and stream cannot
        // diverge on a malformed drop
        graft.stream.ChangeStream.requirePlausibleNanos(df)
        df
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
    }
  }

  /** `ts` exposed as a proper timestamp column (µs precision). */
  def readEvents(s: SparkSession, dir: String): DataFrame =
    readEventsRaw(s, dir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    traversal3Hop(spark, "/root/testdata/sf0.001", 100000.0)

  /** 2.E traversal: customers → orders (filtered) → parts, dedup'd. */
  private def traversal3Hop(s: SparkSession, dir: String, minTotal: Double): DataFrame =
    graph(s, dir).traversal.V()
      .hasLabel("customer").has("mktsegment", "BUILDING")
      .out("placed").has("totalprice", P.gt(minTotal))
      .out("contains").dedup()
      .values("uid", "name")

  /** Probe rules (driver-compare invariants, learned rounds 1–5):
    *  - NO array-typed output columns, ever — the driver's pandas
    *    canonicalizer cannot sort list cells; stringify (concat_ws) or
    *    explode at the probe boundary.
    *  - Column names must match the oracle SQL exactly (compare sorts by name).
    *  - Double aggregates go through DECIMAL accumulation on both sides (dsum).
    *  - DuckDB windowed/aggregated integers must be CAST back to BIGINT in the
    *    oracle (SUM widens to HUGEINT → pandas float64 → hash mismatch). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- 2.F aggregation (map-side combinable groupBy over edge properties) ----
    "q1_agg" -> ((s, dir) => {
      graph(s, dir).E().hasLabel("contains").dataframe
        .groupBy(col("returnflag"), col("linestatus"))
        .agg(
          dsum(col("quantity")).as("sum_qty"),
          dsum(col("extendedprice")).as("sum_base"),
          dsum((col("extendedprice") * (lit(1.0) - col("discount"))), 8).as("revenue"),
          count(lit(1)).as("cnt"))
    }),
    // ---- 2.B has(key, value) — Cmp.EQUAL over an indexed-style key ----
    "q_has_eq" -> ((s, dir) => {
      graph(s, dir).V().hasLabel("customer").has("mktsegment", "BUILDING").dataframe
        .select(col("uid"), col("name"), col("mktsegment"))
    }),
    // ---- 2.B has(key) existence (GraphCentricQueryBuilder.java:99-106) ----
    "q_has_exists" -> ((s, dir) => {
      graph(s, dir).V().has("acctbal").dataframe
        .select(col("uid"), col("label"), col("acctbal"))
    }),
    // ---- 2.B interval(key, start, end) = [start, end) ----
    "q_interval" -> ((s, dir) => {
      graph(s, dir).V().hasLabel("order").interval("totalprice", 50000.0, 100000.0).dataframe
        .select(col("uid"), col("totalprice"))
    }),
    // ---- 2.B/2.H orderBy + limit (TakeOrderedAndProject top-k) ----
    "q_orderby_limit" -> ((s, dir) => {
      graph(s, dir).V().hasLabel("order").orderBy("totalprice", asc = false).limit(10).dataframe
        .select(col("uid"), col("totalprice"))
    }),
    // ---- 2.D Contain.IN ----
    "q_contain_in" -> ((s, dir) => {
      graph(s, dir).V().hasLabel("part").has("brand", P.within("Brand#12", "Brand#23", "Brand#9")).dataframe
        .select(col("uid"), col("brand"))
    }),
    // ---- 2.D Text.CONTAINS (tokenized, case-insensitive) ----
    "q_text_contains" -> ((s, dir) => {
      graph(s, dir).V().hasLabel("part").has("name", P.textContains("widget")).dataframe
        .select(col("uid"), col("name"))
    }),
    // ---- 2.D Text.CONTAINS_PREFIX ----
    "q_text_prefix" -> ((s, dir) => {
      graph(s, dir).V().hasLabel("part").has("name", P.textContainsPrefix("gi")).dataframe
        .select(col("uid"), col("name"))
    }),
    // ---- 2.D Text.CONTAINS_REGEX ----
    "q_text_regex" -> ((s, dir) => {
      graph(s, dir).V().hasLabel("part").has("name", P.textContainsRegex("g.z.*")).dataframe
        .select(col("uid"), col("name"))
    }),
    // ---- 2.C multiQuery: frontier ⨝ edges (edgeMultiQuery as a join) ----
    "q_multiquery" -> ((s, dir) => {
      val g = graph(s, dir)
      val frontier = g.V().hasLabel("customer").has("mktsegment", "BUILDING")
        .dataframe.select(col("id").as("vid"))
      VertexCentricQuery(g).onFrontier(frontier).labels("placed").direction(Direction.OUT)
        .edgeCount()
        .select(uidOf(col("vid"), TpchGraph.CustomerTag).as("uid"), col("count").as("cnt"))
    }),
    // ---- 2.C/2.G per-vertex ordered limit (sort-key slice ⇒ Window top-k) ----
    "q_vc_topk" -> ((s, dir) => {
      val g = graph(s, dir)
      // tie-break chain (linenumber, dst, suppkey) is unique per order in the
      // data, so both engines pick identical top-k rows
      VertexCentricQuery(g).labels("contains").direction(Direction.OUT)
        .orderBy("extendedprice", asc = false)
        .orderBy("linenumber").orderBy("dst").orderBy("suppkey")
        .limit(2)
        .edges()
        .select(uidOf(col("vid"), TpchGraph.OrderTag).as("o_uid"),
          uidOf(col("other"), TpchGraph.PartTag).as("p_uid"),
          col("extendedprice"))
    }),
    // ---- 2.C interval slice on the sort key (vertex-centric index emulation) ----
    "q_vc_interval" -> ((s, dir) => {
      val g = graph(s, dir)
      VertexCentricQuery(g).labels("contains").direction(Direction.OUT)
        .interval("shipdate", d("1996-01-01"), d("1997-01-01"))
        .edges()
        .select(uidOf(col("vid"), TpchGraph.OrderTag).as("o_uid"),
          uidOf(col("other"), TpchGraph.PartTag).as("p_uid"),
          col("quantity"), date_format(col("shipdate"), "yyyy-MM-dd").as("ship"))
    }),
    // ---- 2.C sort-key slice over the vertex-centric edge LAYOUT: edges
    //      re-written hash-bucketed by src and sorted by (src,label,shipdate)
    //      so parquet min/max stats prune the slice the way the reference's
    //      byte-ordered column ranges do; results ≡ the un-laid-out slice ----
    "q_sortkey_slice" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-slice")
      val g = graph(s, dir)
      graft.index.Indexes.writeEdgeLayout(g, s"$tmp/edges", buckets = 8,
        sortKeys = Seq("shipdate"))
      val g2 = g.copy(edges = s.read.parquet(s"$tmp/edges"))
      val res = VertexCentricQuery(g2).labels("contains").direction(Direction.OUT)
        .interval("shipdate", d("1997-03-01"), d("1997-06-01"))
        .edges()
        .select(uidOf(col("vid"), TpchGraph.OrderTag).as("o_uid"),
          uidOf(col("other"), TpchGraph.PartTag).as("p_uid"),
          date_format(col("shipdate"), "yyyy-MM-dd").as("ship"))
        .localCheckpoint(true) // materialize before the layout files vanish
      deleteRecursively(tmp)
      res
    }),
    // ---- 2.E traversal 3-hop ----
    "q_traversal_3hop" -> ((s, dir) => traversal3Hop(s, dir, 400000.0)),
    // ---- 2.E/2.H range (order + offset slice) ----
    "q_range" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("order")
        .order("totalprice", asc = false).range(10, 20)
        .values("uid", "totalprice")
    }),
    // ---- 2.E repeat(n) — bounded loop of hops ----
    "q_repeat" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("region")
        .repeat(2)(_.in())
        .values("uid", "label")
    }),
    // ---- 2.E nested repeat (repeat-within-repeat): outer repeat(2) of an
    //      inner repeat(2)(both) unrolls to FOUR undirected hops with full
    //      traverser multiplicity preserved through both nesting levels
    //      (TinkerPop RepeatStep nests arbitrarily — reference corpus
    //      tt/graphdb/TitanGraphTest.java:3520-3843 ProcessStandardSuite).
    //      On the bipartite region↔nation relation every 4-walk returns to
    //      its start region, so the oracle is the closed-form two-join ----
    "q_repeat_nested" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("region")
        .repeat(2)(_.repeat(2)(_.both("in_region")))
        .values("uid", "label")
    }),
    // ---- 2.E group().by() — collect per key ----
    "q_group" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .group("mktsegment", "uid")
        .select(col("mktsegment"),
          concat_ws(",", sort_array(col("values"))).as("uids"))
    }),
    // ---- 2.E groupCount ----
    "q_groupcount" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer").groupCount("mktsegment")
        .withColumnRenamed("count", "cnt")
    }),
    // ---- 2.I union + dedup (QueryProcessor OR-merge) ----
    "q_union" -> ((s, dir) => {
      val g = graph(s, dir)
      val a = g.traversal.V().hasLabel("customer").has("mktsegment", "BUILDING")
      val b = g.traversal.V().hasLabel("customer").has("mktsegment", "MACHINERY")
      a.union(b).dedup().values("uid", "mktsegment")
    }),
    // ---- 2.K degree (VertexScanJob analogue: per-vertex edge count) ----
    "q_degree" -> ((s, dir) => {
      val g = graph(s, dir)
      VertexCentricQuery(g).labels("contains").direction(Direction.IN).edgeCount()
        .select(uidOf(col("vid"), TpchGraph.PartTag).as("uid"), col("count").as("cnt"))
    }),
    // ---- 2.J change-table batch view (stream parity lives in graft.stream) ----
    "q_events_agg" -> ((s, dir) => {
      readEvents(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value"), 6).as("sum_value"))
    }),
    // ---- 2.J ChangeProcessor replay: ADDED/REMOVED classification ----
    "q_change_replay" -> ((s, dir) => {
      graft.stream.ChangeStream.replay(s, dir)
        .groupBy(col("change")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.J streaming exact-dedup: an at-least-once log (every event
    //      delivered twice) streamed through the watermarked dedup collapses
    //      to exactly-once — final table equals the batch distinct ----
    "q_stream_dedup" -> ((s, dir) => {
      val src = readEvents(s, dir).select(col("event_id"), col("ts"), col("event_type"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
      // single file → single AvailableNow micro-batch: both copies of every
      // doubled event are processed before the watermark advances, so the
      // exactly-once claim the probe checks cannot flake on file-split order
      src.unionAll(src).coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(src.schema).parquet(s"$tmp/in")
      val qname = s"graft_sdedup_${System.nanoTime()}"
      val q = graft.stream.ChangeStream.dedupStream(stream)
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // a timed-out stream would leave a PARTIAL memory table — fail loudly
      // instead of reporting a fast-looking wrong count
      awaitStreamProbe(q, "q_stream_dedup")
      s.table(qname).groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.J streaming windowed aggregation: tumbling event-time windows
    //      over the change log; the AvailableNow final table must equal the
    //      batch GROUP BY of the same buckets ----
    // ---- 2.J stream-stream interval join: click→purchase attribution within
    //      30 minutes; watermarks bound the join state on both sides ----
    "q_stream_stream_join" -> ((s, dir) => {
      val src = readEvents(s, dir).select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-ssj").toString
      src.write.mode("overwrite").parquet(s"$tmp/in")
      def side(t: String) = s.readStream.schema(src.schema).parquet(s"$tmp/in")
        .filter(col("event_type") === t)
      val joined = graft.stream.ChangeStream.streamIntervalJoin(
          side("click"), side("purchase"), "user_id", within = "30 minutes")
        .select(col("l.event_id").as("click_id"), col("r.event_id").as("purchase_id"),
          col("l.user_id").as("user_id"))
      val qname = s"graft_ssj_${System.nanoTime()}"
      val q = joined.writeStream.format("memory").queryName(qname).outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitStreamProbe(q, "q_stream_stream_join")
      s.table(qname)
    }),
    // ---- 2.J stream-static enrichment: per-batch broadcast of the static
    //      dimension; the log side flows through append mode unshuffled ----
    "q_stream_join" -> ((s, dir) => {
      val src = readEvents(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val dim = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("user_id"), col("c_name").as("name"),
          col("c_nationkey").as("nationkey"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sjoin").toString
      src.write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(src.schema).parquet(s"$tmp/in")
      val qname = s"graft_sjoin_${System.nanoTime()}"
      val q = graft.stream.ChangeStream.enrich(stream, dim, "user_id")
        .select(col("event_id"), col("user_id"), col("name"), col("nationkey"))
        .writeStream.format("memory").queryName(qname).outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitStreamProbe(q, "q_stream_join")
      s.table(qname)
    }),
    "q_stream_window" -> ((s, dir) => {
      val src = readEvents(s, dir).select(col("event_id"), col("ts"),
        col("event_type"), col("value"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-swin").toString
      src.write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(src.schema).parquet(s"$tmp/in")
      val qname = s"graft_swin_${System.nanoTime()}"
      val q = graft.stream.ChangeStream.windowedCounts(stream,
          windowDur = "1 hour", slide = "1 hour")
        .writeStream.format("memory").queryName(qname).outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitStreamProbe(q, "q_stream_window")
      // counts only: the double value-sum is accumulation-order dependent
      // (same reason q_events_window pins counts; sums go through dsum there)
      s.table(qname).select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("wstart"),
        col("event_type"), col("cnt"))
    }),
    // ---- 2.A storage round-trip: save → load through the bucketed parquet
    //      layout preserves every element (counts per label over both sets) ----
    "q_store_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-store").toString
      graft.data.GraphIO.save(g, tmp)
      val back = graft.data.GraphIO.load(s, tmp, g.schema)
      back.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .select(lit("v").as("kind"), col("label"), col("cnt"))
        .unionAll(back.edges.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
          .select(lit("e").as("kind"), col("label"), col("cnt")))
    }),
    // ---- multi-hop analytical join: TPC-H Q3-style shipping priority ----
    "q_tpch_q3" -> ((s, dir) => {
      val g = graph(s, dir)
      val cust = g.V().hasLabel("customer").has("mktsegment", "BUILDING").dataframe
        .select(col("id").as("cust"))
      val placed = g.edges.filter(col("label") === "placed")
        .filter(col("orderdate") < d("1998-01-01"))
        .select(col("src").as("cust"), col("dst").as("ord"), col("orderdate"))
      val items = g.edges.filter(col("label") === "contains")
        .filter(col("shipdate") > d("1998-01-01"))
        .select(col("src").as("ord"), col("extendedprice"), col("discount"))
      cust.join(placed, Seq("cust")).join(items, Seq("ord"))
        .groupBy(col("ord"), col("orderdate"))
        .agg(dsum(col("extendedprice") * (lit(1.0) - col("discount")), 8).as("revenue"))
        .select(uidOf(col("ord"), TpchGraph.OrderTag).as("o_uid"),
          date_format(col("orderdate"), "yyyy-MM-dd").as("odate"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_uid")).limit(10)
    }),
    // ---- 6-way join: TPC-H Q5-style local supplier volume ----
    "q_tpch_q5" -> ((s, dir) => {
      val g = graph(s, dir)
      val asia = g.V().hasLabel("region").has("name", "ASIA").dataframe
        .select(col("id").as("reg"))
      val nations = g.edges.filter(col("label") === "in_region")
        .select(col("src").as("nat"), col("dst").as("reg"))
        .join(asia, Seq("reg"))
        .join(g.vertices.select(col("id").as("nat"), col("name").as("n_name")), Seq("nat"))
      val custNat = g.edges.filter(col("label") === "in_nation")
        .filter(col("src") < lit((TpchGraph.CustomerTag + 1).toLong * (1L << graft.core.GraphIds.TagBits)))
        .filter(col("src") >= lit(TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits)))
        .select(col("src").as("cust"), col("dst").as("nat"))
      val suppNat = g.edges.filter(col("label") === "in_nation")
        .filter(col("src") >= lit(TpchGraph.SupplierTag.toLong * (1L << graft.core.GraphIds.TagBits)))
        .filter(col("src") < lit((TpchGraph.SupplierTag + 1).toLong * (1L << graft.core.GraphIds.TagBits)))
        .select(col("src").as("supp"), col("dst").as("nat"))
      val placed = g.edges.filter(col("label") === "placed")
        .filter(col("orderdate") >= d("1996-01-01") && col("orderdate") < d("1998-01-01"))
        .select(col("src").as("cust"), col("dst").as("ord"))
      // a lineitem's contains edge and its supplied_by edge share the same
      // 56-bit local id (TpchGraph packs orderkey·256 + linenumber·32 + dupSeq,
      // assigned once at ingest in the materialized layout)
      val localId = pmod(col("id"), lit(1L << graft.core.GraphIds.TagBits))
      val items = g.edges.filter(col("label") === "contains")
        .select(col("src").as("ord"), localId.as("li"), col("extendedprice"), col("discount"))
      val supplied = g.edges.filter(col("label") === "supplied_by")
        .select(localId.as("li"), col("dst").as("supp"))
      // join chain: region-scoped nations → customers → orders → lineitems →
      // supplier, requiring supplier nation = customer nation (Q5's n1 = n2)
      nations.join(custNat, Seq("nat")).join(placed, Seq("cust"))
        .join(items, Seq("ord"))
        .join(supplied, Seq("li"))
        .join(suppNat.withColumnRenamed("nat", "snat"), Seq("supp"))
        .filter(col("snat") === col("nat"))
        .groupBy(col("n_name"))
        .agg(dsum(col("extendedprice") * (lit(1.0) - col("discount")), 8).as("revenue"))
        .select(col("n_name").as("nation"), col("revenue"))
    }),
    // ---- aggregation + post-filter (HAVING): high-volume customers ----
    "q_having" -> ((s, dir) => {
      val g = graph(s, dir)
      g.edges.filter(col("label") === "placed")
        .join(g.vertices.select(col("id").as("dst"), col("totalprice")), Seq("dst"))
        .groupBy(col("src"))
        .agg(dsum(col("totalprice")).as("spend"), count(lit(1)).as("n_orders"))
        .filter(col("spend") > 1500000.0)
        .select(uidOf(col("src"), TpchGraph.CustomerTag).as("uid"),
          col("spend"), col("n_orders"))
    }),
    // ---- 2.D Geo.WITHIN over synthesized coordinates — distance rounded to
    //      meters on both engines, so the oracle compare is exact ----
    "q_geo_within" -> ((s, dir) => {
      val g = graph(s, dir)
      val parts = g.V().hasLabel("part").dataframe
        .withColumn("loc", graft.expr.Geo.pointCol(
          pmod(col("uid"), lit(180)) - 90, pmod(col("uid") * 7, lit(360)) - 180))
      parts.filter(graft.expr.Geo.within(col("loc"),
          graft.expr.Geo.circle(0.0, 0.0, 5000.0), roundScale = Some(3)))
        .select(col("uid"))
    }),
    // ---- 2.B mixed GEO index: grid-cell pruning + exact residual — must
    //      return exactly the brute-force geoWithin result ----
    "q_geo_index" -> ((s, dir) => {
      val g = graph(s, dir)
      val parts = g.V().hasLabel("part").dataframe
        .withColumn("loc", graft.expr.Geo.pointCol(
          pmod(col("uid"), lit(180)) - 90, pmod(col("uid") * 7, lit(360)) - 180))
      val g2 = g.copy(vertices = parts)
      val ix = graft.core.IndexDef("partGeo", graft.core.ElementCategory.VERTEX,
        Seq("loc"), composite = false, onlyLabel = Some("part"))
      val cells = graft.index.Indexes.materializeGeo(g2, ix, col("loc"), cellDeg = 5.0)
      graft.index.Indexes.lookupGeoWithinCircle(g2, cells, col("loc"),
          centerLat = 0.0, centerLon = 0.0, radiusKm = 5000.0,
          cellDeg = 5.0, roundScale = Some(3))
        .select(col("uid"))
    }),
    // ---- 2.D Geo.INTERSECT: per-part circles vs a query circle ----
    "q_geo_intersects" -> ((s, dir) => {
      val g = graph(s, dir)
      val parts = g.V().hasLabel("part").dataframe
        .withColumn("zone", graft.expr.Geo.circleCol(
          pmod(col("uid"), lit(180)) - 90, pmod(col("uid") * 7, lit(360)) - 180,
          lit(1000.0)))
      parts.filter(graft.expr.Geo.intersects(col("zone"),
          graft.expr.Geo.circle(30.0, 40.0, 4000.0), roundScale = Some(3)))
        .select(col("uid"))
    }),
    // ---- 2.D Geo.DISJOINT — complement of intersects, same rounding ----
    "q_geo_disjoint" -> ((s, dir) => {
      val g = graph(s, dir)
      val parts = g.V().hasLabel("part").dataframe
        .withColumn("zone", graft.expr.Geo.circleCol(
          pmod(col("uid"), lit(180)) - 90, pmod(col("uid") * 7, lit(360)) - 180,
          lit(1000.0)))
      parts.filter(graft.expr.Geo.disjoint(col("zone"),
          graft.expr.Geo.circle(30.0, 40.0, 4000.0), roundScale = Some(3)))
        .select(col("uid"))
    }),
    // ---- 2.A GraphSON-style JSON export/import round-trip. Exported once
    //      per data dir to a deterministic cache path (vertices/_SUCCESS as
    //      the ready marker) so repeated probe builds don't re-export or
    //      accumulate temp directories ----
    // ---- 2.A Graph-of-the-Gods loader: the reference tutorial's canonical
    //      queries (battled time-filter, 2-hop father, geo-within) against
    //      the loader's fixed dataset — oracle is the documented answer set ----
    "q_gotg" -> ((s, _) => {
      val gods = graft.data.GraphOfTheGods.load(s)
      val t = gods.traversal
      val battled = t.V().has("name", "hercules")
        .outE("battled").has("time", graft.expr.P.gt(1)).inV().values("name")
        .select(lit("battled_gt1").as("kind"), col("name"))
      val grand = t.V().has("name", "hercules")
        .out("father").out("father").values("name")
        .select(lit("grandfather").as("kind"), col("name"))
      val geo = gods.E()
        .has("place", graft.expr.Geo.geoWithin(graft.expr.Geo.circle(37.97, 23.72, 50)))
        .dataframe
        .join(gods.vertices.select(col("id").as("dst"), col("name")), Seq("dst"))
        .select(lit("geo50km").as("kind"), col("name"))
      battled.unionAll(grand).unionAll(geo)
    }),
    "q_graphson" -> ((s, dir) => {
      val out = s"target/graft-gson/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      if (!new java.io.File(s"$out/vertices/_SUCCESS").exists()) {
        val g = graph(s, dir)
        val small = g.copy(
          vertices = g.vertices.filter(col("label").isin("region", "nation")),
          edges = g.edges.filter(col("label") === "in_region"))
        graft.data.GraphIO.exportJson(small, out)
      }
      val back = graft.data.GraphIO.importJson(s, out)
      back.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .unionAll(back.edges.groupBy(col("label")).agg(count(lit(1)).as("cnt")))
    }),
    // ---- 2.A GraphML IO round-trip (the third TinkerPop format): export
    //      distributed <node>/<edge> fragments + <key> sidecars, import
    //      through the native XML datasource, and aggregate a PROPERTY —
    //      typed values (not just counts) must survive the XML encode ----
    "q_graphml" -> ((s, dir) => {
      val out = s"target/graft-gml/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      if (!new java.io.File(s"$out/nodes/_SUCCESS").exists()) {
        val g = graph(s, dir)
        val small = g.copy(
          vertices = g.vertices.filter(col("label").isin("region", "nation")),
          edges = g.edges.filter(col("label") === "in_region"))
        graft.data.GraphIO.exportGraphml(small, out)
      }
      val back = graft.data.GraphIO.importGraphml(s, out)
      back.vertices.groupBy(col("label"))
        .agg(count(lit(1)).as("cnt"), min(col("name")).as("min_name"))
        .unionAll(back.edges.groupBy(col("label"))
          .agg(count(lit(1)).as("cnt"), lit(null).cast(StringType).as("min_name")))
    }),
    // ---- 2.A Gryo-parity BINARY IO round-trip (TitanIoRegistry registers
    //      GraphSON + Gryo; this is the binary half): export framed binaries,
    //      read back, and aggregate a PROPERTY — proving values (not just
    //      counts) survive the binary encode/decode ----
    "q_gryo" -> ((s, dir) => {
      val out = s"target/graft-gryo/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      if (!new java.io.File(s"$out/vertices/frames/_SUCCESS").exists()) {
        val g = graph(s, dir)
        val small = g.copy(
          vertices = g.vertices.filter(col("label").isin("region", "nation")),
          edges = g.edges.filter(col("label") === "in_region"))
        graft.data.GraphIO.exportGryo(small, out)
      }
      val back = graft.data.GraphIO.importGryo(s, out)
      back.vertices.groupBy(col("label"))
        .agg(count(lit(1)).as("cnt"), sum(col("uid")).as("sum_uid"))
        .unionAll(back.edges.groupBy(col("label"))
          .agg(count(lit(1)).as("cnt"), sum(lit(0L)).as("sum_uid")))
    }),
    // ---- 2.G running aggregate over an ordered per-vertex window ----
    "q_running_total" -> ((s, dir) => {
      val g = graph(s, dir)
      val placed = g.edges.filter(col("label") === "placed")
        .join(g.vertices.select(col("id").as("dst"), col("totalprice")), Seq("dst"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("orderdate"), col("dst"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      placed.select(
        uidOf(col("src"), TpchGraph.CustomerTag).as("c_uid"),
        uidOf(col("dst"), TpchGraph.OrderTag).as("o_uid"),
        sum(col("totalprice").cast(DecimalType(28, 2))).over(w).cast(DoubleType).as("running"))
    }),
    // ---- 2.F distinct counting across a 2-hop join ----
    "q_count_distinct" -> ((s, dir) => {
      val g = graph(s, dir)
      val placed = g.edges.filter(col("label") === "placed")
        .select(col("src").as("cust"), col("dst").as("ord"))
      val contains = g.edges.filter(col("label") === "contains")
        .select(col("src").as("ord"), col("dst").as("part"))
      placed.join(contains, Seq("ord"))
        .groupBy(col("cust"))
        .agg(count_distinct(col("part")).as("n_parts"))
        .select(uidOf(col("cust"), TpchGraph.CustomerTag).as("uid"), col("n_parts"))
    }),
    // ---- 2.J event-time tumbling window aggregation ----
    "q_events_window" -> ((s, dir) => {
      readEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"), col("cnt"))
    }),
    // ---- 2.E as/select (path-labeled steps) ----
    "q_select" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer").has("mktsegment", "BUILDING").as("a")
        .out("placed").as("b")
        .select("a", "b")
        .select(col("a_uid").as("c_uid"), col("b_uid").as("o_uid"))
    }),
    // ---- 2.E select(Pop.first) over a REUSED as-label (TinkerPop Pop;
    //      plain select on a repeated label ≡ Pop.last, covered by q_select) ----
    "q_select_pop" -> ((s, dir) => {
      graph(s, dir).traversal.V()
        .hasLabel("customer").has("mktsegment", "BUILDING").as("x")
        .out("placed").as("x")
        .selectPop("x", graft.traverse.Pop.First)
        .select(col("x_uid").as("first_uid"), col("x_label").as("first_label"))
    }),
    // ---- 2.E select(Pop.all) — the full occurrence id list, stringified ----
    "q_select_pop_all" -> ((s, dir) => {
      graph(s, dir).traversal.V()
        .hasLabel("customer").has("mktsegment", "BUILDING").as("x")
        .out("placed").as("x")
        .selectPop("x", graft.traverse.Pop.All)
    }),
    // ---- 2.E bothV — both endpoints per edge (2 traversers per edge) ----
    "q_bothv" -> ((s, dir) => {
      graph(s, dir).traversal.E().hasLabel("placed").bothV()
        .values("uid", "label")
    }),
    // ---- 2.E sack (per-traverser accumulator along the path) ----
    "q_sack" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer").has("mktsegment", "BUILDING")
        .withSack(lit(0.0))
        .out("placed").sackOp(_ + col("totalprice"))
        .outE("contains").sackOp(_ + col("extendedprice"))
        .sackValues()
    }),
    // ---- 2.E sack split/merge (TinkerPop SackStep with operators): each
    //      customer-traverser clones into two branches, split(sack)=sack+100
    //      per clone; both branches land on orders (branch 2 only on the
    //      urgent ones), and the declared merge aggregate (sum) coalesces
    //      traversers on the same element — urgent orders carry 202 ----
    "q_sack_split" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .withSack(lit(1L), Some((c: Column) => c + lit(100L)), Some(sum(_: Column)))
        .unionSteps(
          _.out("placed"),
          _.out("placed").has("orderpriority", "1-URGENT"))
        .toDF.groupBy(col("_sack").as("sack")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.E where(not(...)) — anti-join traversal predicate ----
    "q_where_not" -> ((s, dir) => {
      val g = graph(s, dir)
      // customers with no high-value order (NOT EXISTS as a left-anti join)
      val bigSpenders = g.traversal.V().hasLabel("order")
        .has("totalprice", P.gt(300000.0)).in("placed").dedup()
      g.traversal.V().hasLabel("customer")
        .whereNotExists(bigSpenders)
        .values("uid", "name")
    }),
    // ---- 2.E optional (left-outer step semantics) ----
    "q_optional" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .optional(_.out("placed"))
        .values("uid", "label")
    }),
    // ---- 2.C adjacent(v) — ~adjacent implicit key ----
    "q_vc_adjacent" -> ((s, dir) => {
      val g = graph(s, dir)
      VertexCentricQuery(g).labels("contains").direction(Direction.OUT)
        .adjacent(TpchGraph.PartTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L)
        .edges()
        .select(uidOf(col("vid"), TpchGraph.OrderTag).as("o_uid"),
          col("quantity"), col("linenumber"))
    }),
    // ---- 2.B/2.L mixed-index lookup via materialized inverted token table ----
    // ---- 2.L index lifecycle as data: INSTALLED→REGISTERED→ENABLED
    //      (+REINDEX fixpoint), query through the enabled index, then
    //      DISABLE→REMOVE drops it from the catalog — every transition and
    //      the indexed hit count oracle-checked ----
    "q_index_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val g = graph(s, dir)
      val mgmt = new graft.mgmt.Management(g.schema)
      val ix0 = mgmt.buildIndex("lcText", graft.core.ElementCategory.VERTEX)
        .addKey("name", graft.core.Mapping.TEXT).buildMixedIndex()
      val steps = Seq.newBuilder[(String, String)]
      steps += "0_install" -> ix0.status.toString
      steps += "1_register" ->
        mgmt.updateIndex("lcText", graft.core.SchemaAction.REGISTER_INDEX).toString
      steps += "2_enable" ->
        mgmt.updateIndex("lcText", graft.core.SchemaAction.ENABLE_INDEX).toString
      steps += "3_reindex" ->
        mgmt.updateIndex("lcText", graft.core.SchemaAction.REINDEX).toString
      val enabled = mgmt.current
      val inverted = graft.index.Indexes.materializeMixed(
        g.copy(schema = enabled), enabled.indexes("lcText"))
      val hits = graft.index.Indexes.lookupText(g, inverted, "name", "widget")
        .filter(col("label") === "part").count()
      steps += "4_query_hits" -> hits.toString
      steps += "5_disable" ->
        mgmt.updateIndex("lcText", graft.core.SchemaAction.DISABLE_INDEX).toString
      steps += "6_remove" ->
        mgmt.updateIndex("lcText", graft.core.SchemaAction.REMOVE_INDEX).toString
      steps += "7_present" -> mgmt.current.indexes.contains("lcText").toString
      steps.result().toDF("step", "state")
    }),
    "q_mixed_index" -> ((s, dir) => {
      val g = graph(s, dir)
      val ix = graft.core.IndexDef("nameText", graft.core.ElementCategory.VERTEX,
        Seq("name"), composite = false,
        mappings = Map("name" -> graft.core.Mapping.TEXT))
      val inverted = graft.index.Indexes.materializeMixed(g, ix)
      graft.index.Indexes.lookupText(g, inverted, "name", "widget")
        .filter(col("label") === "part")
        .select(col("uid"), col("name"))
    }),
    // ---- 2.E match — pattern conjunction as semi-join on shared binding ----
    "q_match" -> ((s, dir) => {
      val g = graph(s, dir)
      // match(a placed high-value order, a in BUILDING segment) → a
      val p1 = g.traversal.V().hasLabel("customer").as("a")
        .out("placed").has("totalprice", P.gt(400000.0))
      val p2 = g.traversal.V().hasLabel("customer").has("mktsegment", "BUILDING").as("a")
      p1.matchOn(p2, "a")
        .toDF.select(uidOf(col("_as_a_id"), TpchGraph.CustomerTag).as("uid")).distinct()
    }),
    // ---- 2.E MULTI-VARIABLE match(): two patterns sharing BOTH a and b —
    //      the semi-join keys on the (a,b) tuple, so only bindings present
    //      in both patterns as THE SAME PAIR survive (the single-alias form
    //      over-matches here; MatchMultiSpec proves the difference) ----
    "q_match_multi" -> ((s, dir) => {
      val g = graph(s, dir)
      val p1 = g.traversal.V().hasLabel("customer").as("a")
        .out("placed").has("totalprice", P.gt(300000.0)).as("b")
      val p2 = g.traversal.V().hasLabel("customer").has("mktsegment", "BUILDING").as("a")
        .out("placed").has("totalprice", P.lt(400000.0)).as("b")
      p1.matchOnAll(p2, Seq("a", "b"))
        .toDF.select(uidOf(col("_as_a_id"), TpchGraph.CustomerTag).as("cust_uid"),
          uidOf(col("_as_b_id"), TpchGraph.OrderTag).as("order_uid")).distinct()
    }),
    // ---- 2.E heterogeneous-binding match(): anchor binds (a,b); one
    //      constraint shares (a,b), another shares only (a) — each is
    //      semi-joined on exactly the aliases it shares with the anchor ----
    "q_match_shared" -> ((s, dir) => {
      val g = graph(s, dir)
      val anchor = g.traversal.V().hasLabel("customer").as("a")
        .out("placed").has("totalprice", P.gt(300000.0)).as("b")
      val c1 = g.traversal.V().hasLabel("customer").has("mktsegment", "BUILDING").as("a")
        .out("placed").has("totalprice", P.lt(400000.0)).as("b")
      val c2 = g.traversal.V().hasLabel("customer").has("acctbal", P.gt(0.0)).as("a")
      g.traversal.V().matchAllShared(anchor, c1, c2)
        .toDF.select(uidOf(col("_as_a_id"), TpchGraph.CustomerTag).as("cust_uid"),
          uidOf(col("_as_b_id"), TpchGraph.OrderTag).as("order_uid")).distinct()
    }),
    // ---- 2.E n-ary choose(selector).option(v, branch)…: TinkerPop's general
    //      value-switch ChooseStep; non-matching traversers take `none` ----
    "q_choose_option" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .chooseOption(col("mktsegment"),
          Seq[(Any, graft.traverse.Traversal => graft.traverse.Traversal)](
            "BUILDING" -> (_.out("placed")),
            "MACHINERY" -> (t => t)),
          none = Some(_.out("in_nation")))
        .values("uid", "label")
    }),
    // ---- 2.B mixed-index STRING mapping: exact-value lookup via index ----
    "q_mixed_string" -> ((s, dir) => {
      val g = graph(s, dir)
      val ix = graft.core.IndexDef("brandString", graft.core.ElementCategory.VERTEX,
        Seq("brand"), composite = false,
        mappings = Map("brand" -> graft.core.Mapping.STRING))
      val sIx = graft.index.Indexes.materializeString(g, ix)
      graft.index.Indexes.lookupString(g, sIx, "brand", "Brand#12")
        .select(col("uid"), col("brand"))
    }),
    // ---- 2.B mixed-index TEXTSTRING mapping: ONE index, BOTH families ----
    "q_mixed_textstring" -> ((s, dir) => {
      val g = graph(s, dir)
      val ix = graft.core.IndexDef("nameTS", graft.core.ElementCategory.VERTEX,
        Seq("name"), composite = false,
        mappings = Map("name" -> graft.core.Mapping.TEXTSTRING),
        onlyLabel = Some("part"))
      val ts = graft.index.Indexes.materializeTextString(g, ix)
      graft.index.Indexes.lookupTextStringContains(g, ts, "name", "widget")
        .select(col("uid"), col("name"), lit("contains").as("via"))
        .unionAll(graft.index.Indexes.lookupTextStringEquals(g, ts, "name", "red plate")
          .select(col("uid"), col("name"), lit("exact").as("via")))
    }),
    // ---- 2.B mixed-index numeric mapping: range lookup via index ----
    "q_mixed_range" -> ((s, dir) => {
      val g = graph(s, dir)
      val ix = graft.core.IndexDef("priceNum", graft.core.ElementCategory.VERTEX,
        Seq("retailprice"), composite = false)
      val nIx = graft.index.Indexes.materializeNumeric(g, ix, Seq("retailprice"))
      graft.index.Indexes.lookupRange(g, nIx, "retailprice", 905.0, 915.0)
        .select(col("uid"), col("retailprice"))
    }),
    // ---- 2.B mixed index, typed temporal range (Date/Instant are
    // first-class mixed-index types: reference docs/searchpredicates.txt:
    // 70-86) — native timestamp bounds, no caller-side double cast ----
    "q_mixed_range_date" -> ((s, dir) => {
      val g = graph(s, dir)
      val ix = graft.core.IndexDef("dateTs", graft.core.ElementCategory.VERTEX,
        Seq("orderdate"), composite = false)
      val tIx = graft.index.Indexes.materializeTemporal(g, ix, Seq("orderdate"))
      graft.index.Indexes.lookupTemporalRange(g, tIx, "orderdate",
        java.sql.Date.valueOf("1995-03-01"), java.sql.Date.valueOf("1995-03-08"),
        graft.core.ElementCategory.VERTEX)
        .select(col("uid"), date_format(col("orderdate"), "yyyy-MM-dd").as("odate"))
    }),
    // ---- 2.B direct index query, Lucene syntax: multi-field AND ----
    "q_index_lucene" -> ((s, dir) => {
      graft.index.Indexes.indexQueryLucene(graph(s, dir),
        graft.core.ElementCategory.VERTEX, "v.name:(small widget) v.brand:Brand#12",
        limit = 20)
        .select(col("uid"), col("name"), col("brand"), col("score"))
    }),
    // ---- 2.B/2.L multi-properties + meta-properties round-trip ----
    "q_multiprops" -> ((s, dir) => {
      import graft.data.MultiProperties
      val g = graph(s, dir)
      // build a multi-property per order: one cell per contains edge, value =
      // part uid, meta-properties = {rf: returnflag}; then property-element
      // filtering (cells whose meta rf = 'R') and relational unpivot
      val cells = g.edges.filter(col("label") === "contains")
        .select(col("src"),
          MultiProperties.cell(uidOf(col("dst"), TpchGraph.PartTag),
            "rf" -> col("returnflag")).as("c"))
      val mp = MultiProperties.collect(cells, col("src"), col("c"))
        .withColumn("cells", MultiProperties.cellsWithMeta(col("cells"), "rf", "R"))
        .filter(size(col("cells")) > 0)
      MultiProperties.explodeCells(mp, "cells")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_cells"), sum(col("value")).as("sum_part"))
        .select(uidOf(col("id"), TpchGraph.OrderTag).as("uid"),
          col("n_cells"), col("sum_part"))
    }),
    // ---- 2.B/2.L hyper-edge remnant (advschema.txt:96-109): meta-props on
    // an EDGE relation's property + a unidirected edge ON the edge pointing
    // at its recording supplier vertex; traverse out and aggregate ----
    "q_edge_metaprops" -> ((s, dir) => {
      import graft.data.HyperEdges
      val g = graph(s, dir)
      val contains = g.edges.filter(col("label") === "contains" &&
        col("returnflag") === "R")
      // annotate each edge's quantity property with provenance meta
      val ann = HyperEdges.annotateEdgeProperty(contains, "quantity",
        "ls" -> col("linestatus"))
      // unidirected 'recordedBy' meta-edge: contains-edge → supplier vertex
      val meta = HyperEdges.attachToEdges(ann, "recordedBy",
        TpchGraph.vid(TpchGraph.SupplierTag, col("suppkey")))
      val out = HyperEdges.outV(g, meta, "recordedBy")
      out.select(col("src_edge"), col("uid"))
        .join(ann.select(col("id").as("src_edge"), col("quantity_cells")),
          Seq("src_edge"))
        .groupBy(col("uid")).agg(
          count(lit(1)).as("n_edges"),
          sum(element_at(graft.data.MultiProperties.values(col("quantity_cells")), 1)
            .cast("long")).as("sum_qty"),
          sum(when(graft.data.MultiProperties.anyMetaEquals(
            col("quantity_cells"), "ls", "F"), 1L).otherwise(0L)).as("n_f"))
    }),
    // ---- 2.E match() as a planner: selectivity-ordered pattern join ----
    "q_match_planner" -> ((s, dir) => {
      val g = graph(s, dir)
      val p1 = g.traversal.V().hasLabel("customer").as("a")
        .out("placed").has("totalprice", P.gt(400000.0))
      val p2 = g.traversal.V().hasLabel("customer").has("mktsegment", "BUILDING").as("a")
      val p3 = g.traversal.V().hasLabel("customer").has("acctbal", P.gt(0.0)).as("a")
      g.traversal.V().matchAll("a", p1, p2, p3)
        .toDF.select(uidOf(col("_as_a_id"), TpchGraph.CustomerTag).as("uid")).distinct()
    }),
    // ---- 2.B direct index query: scored text search (TitanIndexQuery) ----
    "q_index_query" -> ((s, dir) => {
      graft.index.Indexes.indexQuery(graph(s, dir), graft.core.ElementCategory.VERTEX,
        "name", "small green widget", limit = 20)
        .select(col("uid"), col("name"), col("score"))
    }),
    // ---- 2.K PageRank (exact fixed-point integer — DuckDB-oracle-checkable) ----
    "q_pagerank" -> ((s, dir) => {
      graft.olap.Analytics.pageRankFixedPoint(graph(s, dir), iterations = 10)
    }),
    // ---- 2.K edge-WEIGHTED PageRank — rank mass flows ∝ weight (lineitem
    //      quantities on contains edges, 1 elsewhere), exact integer ----
    "q_pagerank_weighted" -> ((s, dir) => {
      graft.olap.Analytics.pageRankWeightedFixedPoint(graph(s, dir),
        weight = coalesce(col("quantity").cast("long"), lit(1L)), iterations = 10)
    }),
    // ---- 2.K HITS hubs/authorities (exact max-normalized integer
    //      fixed-point — order-insensitive, hash-oracle-checkable) ----
    "q_hits" -> ((s, dir) => {
      graft.olap.Analytics.hitsFixedPoint(graph(s, dir), iterations = 4)
    }),
    // ---- 2.K Katz centrality (exact fixed-point integer: full neighbor
    //      rank flows per edge, attenuated by α = 1/10000 post-sum) ----
    "q_katz" -> ((s, dir) => {
      graft.olap.Analytics.katzFixedPoint(graph(s, dir),
        alphaNum = 1L, alphaDen = 10000L, iterations = 8)
    }),
    // ---- 2.K WEIGHTED SSSP (exact integer Bellman-Ford: contains edges
    //      weighted by quantity, unit weights elsewhere — the reference's
    //      ShortestDistanceVertexProgram edge-distance property) ----
    "q_sssp_weighted" -> ((s, dir) => {
      val src = TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L
      graft.olap.Analytics.shortestDistanceExact(graph(s, dir), src,
        when(col("label") === "contains", col("quantity")).otherwise(lit(1.0)),
        maxIter = 8)
    }),
    // ---- 2.K personalized PageRank (teleport mass on one source; sparse
    //      non-zero-rank result; exact fixed-point ⇒ hash-oracle-checkable) ----
    "q_ppr" -> ((s, dir) => {
      val src = TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L
      graft.olap.Analytics.personalizedPageRankFixedPoint(graph(s, dir), Seq(src), iterations = 10)
    }),
    // ---- 2.K BSP vertex program end-to-end (combine + barrier + write-back) ----
    "q_bsp" -> ((s, dir) => {
      import s.implicits._
      val g = graph(s, dir)
      val sub = g.subgraph(col("label").isin("in_nation", "in_region"))
      val states = graft.olap.VertexProgramRunner
        .run(sub, graft.olap.NeighborDegree, maxIterations = 2)
        .vertices.toDF("id", "v")
      states.join(g.V().hasLabel("region").dataframe.select(col("id"), col("uid")), Seq("id"))
        .select(col("uid"), col("v"))
    }),
    // ---- 2.F OLAP MapReduce stage (map emitter → shuffle → reduce emitter) ----
    "q_mapreduce" -> ((s, dir) => {
      import s.implicits._
      val g = graph(s, dir)
      graft.olap.MapReduce.run(g.vertices)(
        r => Iterator((r.getString(r.fieldIndex("label")), 1L)))(
        (k, vs) => (k, vs.foldLeft(0L)((a, _) => a + 1)))
        .toDF("label", "cnt")
    }),
    // ---- 2.K ghost-vertex detection (half-deleted elements via anti-join) ----
    "q_ghost" -> ((s, dir) => {
      val g = graph(s, dir)
      val corrupted = g.copy(vertices = g.vertices.filter(col("label") =!= "nation"))
      graft.olap.GraphOps.ghostEdges(corrupted)
        .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.K connected components (min-label propagation, oracle-checkable) ----
    "q_connected_components" -> ((s, dir) => {
      graft.olap.Analytics.connectedComponentsExact(graph(s, dir), iterations = 12)
    }),
    // ---- 2.K deterministic label propagation (most-frequent neighbor label,
    //      ties → min; GraphX LPA's hash-order ties are not reproducible) ----
    "q_lpa" -> ((s, dir) => {
      graft.olap.Analytics.labelPropagationExact(graph(s, dir), rounds = 3)
    }),
    // ---- 2.K community-quality report — conductance + modularity terms
    //      over the LPA labeling, exact integer arithmetic ----
    "q_community_stats" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.olap.Analytics.communityStats(g,
        graft.olap.Analytics.labelPropagationExact(g, rounds = 3))
    }),
    // ---- 2.K per-vertex triangle count (GraphX canonical-orientation) over
    //      a co-location graph: customer↔supplier edges within a nation close
    //      triangles with the shared nation vertex, so every count has a
    //      closed-form mirror (nation: nc·ns; customer: ns; supplier: nc) ----
    "q_triangles" -> ((s, dir) => {
      val (derived, kind, uid) = triangleFixture(s, dir)
      graft.olap.Analytics.triangleCount(derived)
        .select(kind.as("kind"), uid.as("uid"), col("triangles"))
    }),
    // ---- 2.K per-vertex triangle count, DataFrame-native: degree-ordered
    //      wedge closure (Suri–Vassilvitskii), no GraphX/RDD round-trip —
    //      same fixture, same closed-form oracle ----
    "q_triangles_df" -> ((s, dir) => {
      val (derived, kind, uid) = triangleFixture(s, dir)
      graft.olap.Analytics.triangleCountDF(derived)
        .select(kind.as("kind"), uid.as("uid"), col("triangles"))
    }),
    // ---- 2.K k-core decomposition — synchronous peeling to fixpoint; the
    //      oracle mirrors the rounds and carries a NOT_CONVERGED sentinel so
    //      an insufficient round budget fails loudly, not silently ----
    "q_kcore" -> ((s, dir) => {
      val g = graph(s, dir)
      val t = 1L << graft.core.GraphIds.TagBits
      val tag = shiftrightunsigned(col("id"), graft.core.GraphIds.TagBits)
      val kind = when(tag === TpchGraph.RegionTag, "region")
        .when(tag === TpchGraph.NationTag, "nation")
        .when(tag === TpchGraph.CustomerTag, "customer")
        .when(tag === TpchGraph.SupplierTag, "supplier")
        .when(tag === TpchGraph.PartTag, "part")
        .otherwise("order")
      graft.olap.Analytics.kCore(g, k = 2, maxRounds = 6)
        .select(kind.as("kind"), (col("id") % t).as("uid"))
    }),
    // ---- 2.K coreness — per-vertex core numbers via the h-index iteration
    //      (full decomposition, not one k); oracle mirrors the recurrence
    //      round for round with a NOT_CONVERGED sentinel ----
    "q_coreness" -> ((s, dir) => {
      val g = graph(s, dir)
      val t = 1L << graft.core.GraphIds.TagBits
      val tag = shiftrightunsigned(col("id"), graft.core.GraphIds.TagBits)
      val kind = when(tag === TpchGraph.RegionTag, "region")
        .when(tag === TpchGraph.NationTag, "nation")
        .when(tag === TpchGraph.CustomerTag, "customer")
        .when(tag === TpchGraph.SupplierTag, "supplier")
        .when(tag === TpchGraph.PartTag, "part")
        .otherwise("order")
      graft.olap.Analytics.coreness(g, maxRounds = 16)
        .select(kind.as("kind"), (col("id") % t).as("uid"), col("core"))
    }),
    // ---- 2.K k-hop ego network: induced subgraph within 2 undirected hops
    //      of customer 1 — vertex label census + induced edge count ----
    "q_ego" -> ((s, dir) => {
      val g = graph(s, dir)
      val t = 1L << graft.core.GraphIds.TagBits
      val seed = TpchGraph.CustomerTag.toLong * t + 1L
      val ego = graft.olap.GraphOps.egoNetwork(g, Seq(seed), k = 2)
      ego.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .unionByName(ego.edges.agg(count(lit(1)).as("cnt"))
          .select(lit("~edges").as("label"), col("cnt")))
    }),
    // ---- 2.K deterministic random walks — the DeepWalk/GNN sampling
    //      primitive, hash-seeded so walks replay and oracle-mirror ----
    "q_random_walks" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val seeds = Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * t + _)
      graft.olap.Analytics.randomWalks(graph(s, dir), seeds,
        steps = 3, walksPerSeed = 2)
    }),
    // ---- 2.K skip-gram (center, context) pairs from the walk corpus —
    //      the DeepWalk/node2vec training-data step over q_random_walks ----
    "q_walk_pairs" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val seeds = Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * t + _)
      graft.olap.Analytics.walkContextPairs(
        graft.olap.Analytics.randomWalks(graph(s, dir), seeds,
          steps = 3, walksPerSeed = 2), window = 2)
    }),
    // ---- 2.K non-backtracking (second-order) walks — node2vec's essential
    //      mechanic: the walk carries prev and never immediately returns ----
    "q_walks_nobacktrack" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val seeds = Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * t + _)
      graft.olap.Analytics.nonBacktrackingWalks(graph(s, dir), seeds,
        steps = 3, walksPerSeed = 2)
    }),
    // ---- 2.K graph datasheet: the structural health report (per-label
    //      census, loops, ghosts, max degree, isolated vertices) ----
    "q_graph_datasheet" -> ((s, dir) => {
      graft.olap.GraphOps.graphDatasheet(graph(s, dir))
    }),
    // ---- 2.K bipartiteness test: BFS-parity 2-coloring from region 0 over
    //      the undirected graph + the odd-edge sentinel row ----
    "q_bipartite_color" -> ((s, dir) => {
      val seed = TpchGraph.RegionTag.toLong * (1L << graft.core.GraphIds.TagBits)
      graft.olap.Analytics.bipartiteColoring(graph(s, dir), seed, maxIter = 6)
    }),
    // ---- 2.K topological layering (Kahn peeling): layer = peel round;
    //      survivors of a no-peel round are the cycle set, layer -1 ----
    "q_topo_layers" -> ((s, dir) => {
      graft.olap.Analytics.topologicalLayers(graph(s, dir), maxRounds = 6)
    }),
    // ---- 2.K k-truss — synchronous support peeling over the co-location
    //      fixture; the oracle mirrors the rounds (NOT_CONVERGED sentinel) ----
    "q_ktruss" -> ((s, dir) => {
      val (derived, _, _) = triangleFixture(s, dir)
      graft.olap.Analytics.kTruss(derived, k = 3, maxRounds = 4)
    }),
    // ---- 2.K SSSP (synchronous Bellman-Ford hop distance, oracle-checkable) ----
    "q_sssp" -> ((s, dir) => {
      val src = TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L
      graft.olap.Analytics.shortestHopsExact(graph(s, dir), src, maxIter = 8)
    }),
    // ---- 2.K shortest-path COUNTING — σ(v), the integer half of Brandes'
    //      betweenness machinery, exact BIGINT sums layer by layer ----
    "q_path_counts" -> ((s, dir) => {
      val src = TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L
      graft.olap.Analytics.shortestPathCounts(graph(s, dir), src, maxIter = 4)
    }),
    // ---- 2.K strongly connected components — Trim + FW-BW min-label
    //      coloring; the probe graph adds order→customer back-edges so each
    //      customer + its orders is one SCC and the rest is a trimmable DAG ----
    "q_scc" -> ((s, dir) => {
      val g0 = graph(s, dir)
      val rev = g0.edges.filter(col("label") === "placed")
        .select((col("id") * -1L).as("id"), col("dst").as("src"),
          col("src").as("dst"), lit("rev_placed").as("label"))
      val g = g0.copy(edges = g0.edges
        .select(col("id"), col("src"), col("dst"), col("label")).unionByName(rev))
      graft.olap.Analytics.stronglyConnectedComponents(g,
        maxOuter = 2, maxTrim = 5, maxInner = 4)
    }),
    // ---- 2.K maximal matching — deterministic mutual-min handshake over
    //      the nation/customer/order subgraph (the coarsening primitive) ----
    "q_matching" -> ((s, dir) => {
      val g0 = graph(s, dir)
      val g = g0.copy(edges = g0.edges.filter(col("label").isin("in_nation", "placed")))
      graft.olap.Analytics.maximalMatching(g, maxRounds = 8)
    }),
    // ---- 2.K Jones–Plassmann greedy coloring — hash-priority rounds, mex
    //      color choice; the parallel symmetry-breaking primitive ----
    "q_coloring" -> ((s, dir) => {
      graft.olap.Analytics.greedyColoring(graph(s, dir), maxRounds = 20)
    }),
    // ---- 2.K Borůvka minimum spanning forest over the customer/order/part
    //      subgraph (parts shared across orders supply the cycles) ----
    "q_msf" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val g0 = graph(s, dir)
      val g = g0.copy(edges = g0.edges.filter(
        col("label") === "placed" ||
          (col("label") === "contains" && col("dst") < lit(5L * t + 200L))))
      graft.olap.Analytics.minimumSpanningForest(g, weight = col("dst"),
        maxOuter = 8, maxInner = 10)
    }),
    // ---- 2.K matching contraction — the coarse graph (supervertices =
    //      matched pairs, weighted coarse edges): one multilevel level ----
    "q_contract" -> ((s, dir) => {
      val g0 = graph(s, dir)
      val g = g0.copy(edges = g0.edges.filter(col("label").isin("in_nation", "placed")))
      val m = graft.olap.Analytics.maximalMatching(g, maxRounds = 8)
      graft.olap.Analytics.contractMatching(g, m)
    }),
    // ---- 2.K STRESS centrality — σ(v)·g(v), shortest paths THROUGH each
    //      vertex: the all-integer sibling of betweenness (Shimbel 1953);
    //      backward suffix-count sweep over the same BFS DAG ----
    "q_stress" -> ((s, dir) => {
      val src = TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L
      graft.olap.Analytics.stressCentrality(graph(s, dir), src, maxIter = 4)
    }),
    // ---- 2.K shortest-path TREE with deterministic min-id predecessors
    //      (ShortestPathVertexProgram's relational form) ----
    "q_shortest_tree" -> ((s, dir) => {
      val src = TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L
      graft.olap.Analytics.shortestPathTree(graph(s, dir), src, maxIter = 4)
    }),
    // ---- 2.K bipartite co-occurrence projection: order–order pairs via
    //      ≥2 co-contained parts (inverted-index join, hub-capped) ----
    "q_bipartite_projection" -> ((s, dir) => {
      graft.olap.Analytics.projectBipartite(graph(s, dir), "contains", minShared = 2L)
    }),
    // ---- 2.K local clustering coefficient — triangles / (deg choose 2) as
    //      exact integers over the co-location fixture (closed-form mirror) ----
    "q_clustering_coeff" -> ((s, dir) => {
      val (derived, kind, uid) = triangleFixture(s, dir)
      graft.olap.Analytics.clusteringCoefficient(derived)
        .select(kind.as("kind"), uid.as("uid"),
          col("triangles"), col("wedges"), col("coeff_x1e6"))
    }),
    // ---- 2.K edge embeddedness: per-edge triangle count (tie-strength /
    //      weak-tie feature; the kTruss support as a one-pass statistic) ----
    "q_edge_support" -> ((s, dir) => {
      val (derived, _, _) = triangleFixture(s, dir)
      graft.olap.Analytics.edgeSupport(derived)
    }),
    // ---- 2.K degree-assortativity moment sums (Newman's r ingredients) as
    //      exact integers over the in_nation star forest ----
    "q_assortativity" -> ((s, dir) => {
      val g = graph(s, dir)
      val sub = g.copy(edges = g.edges.filter(col("label") === "in_nation"))
      graft.olap.Analytics.degreeAssortativity(sub)
        .select(col("m2"), col("sum_xy").cast("long").as("sum_xy"),
          col("sum_x").cast("long").as("sum_x"),
          col("sum_x2").cast("long").as("sum_x2"))
    }),
    // ---- 2.K neighborhood Jaccard similarity (link-prediction feature) over
    //      the order–part containment bipartite graph, exact integers ----
    "q_vertex_jaccard" -> ((s, dir) => {
      graft.olap.Analytics.neighborJaccard(graph(s, dir),
        label = Some("contains"), minShared = 2L)
    }),
    // ---- 2.K Adamic–Adar link-prediction index over the same bipartite
    //      containment graph: rare shared neighbors weighted 1/ln(degree) ----
    "q_adamic_adar" -> ((s, dir) => {
      graft.olap.Analytics.adamicAdar(graph(s, dir),
        label = Some("contains"), minShared = 2L)
    }),
    // ---- 2.K rich-club coefficient per degree threshold: do hubs wire to
    //      each other? exact integers from two broadcast-sized histograms ----
    "q_rich_club" -> ((s, dir) => {
      graft.olap.Analytics.richClub(graph(s, dir))
    }),
    // ---- 2.K link-prediction feature sheet: common-neighbors, preferential
    //      attachment, Adamic-Adar, resource allocation in one pair pass ----
    "q_link_scores" -> ((s, dir) => {
      graft.olap.Analytics.linkPredictionScores(graph(s, dir),
        label = Some("contains"), minShared = 2L)
    }),
    // ---- 2.K butterfly (bipartite 4-cycle) counts per order vertex over
    //      the order-part graph: wedge sums + C(shared,2) closures ----
    "q_butterflies" -> ((s, dir) => {
      graft.olap.Analytics.butterflyCounts(graph(s, dir), label = "contains")
    }),
    // ---- 2.K triangle-closing link recommendations: per vertex the top-5
    //      non-adjacent candidates by common-neighbor count ----
    "q_recommend_links" -> ((s, dir) => {
      graft.olap.Analytics.recommendLinks(graph(s, dir),
        label = Some("contains"), k = 5, minShared = 2L)
    }),
    // ---- 2.K sampled Brandes betweenness: per-source σ forward pass +
    //      backward dependency sweep, 9-dp ratios / DECIMAL-exact sums ----
    "q_betweenness" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val srcs = Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * t + _)
      graft.olap.Analytics.betweennessSampled(graph(s, dir), srcs, maxIter = 4)
    }),
    // Sampled-betweenness estimator at FULL diameter on a fixture with
    // exact Brandes values (r15 VERDICT task #7): depth-5 diamond chain,
    // σ(x_j) = 2^j, so every δ ratio is genuinely fractional; the pivot set
    // {x_0, x_2} is a strict subset of V — the estimator semantics (sum of
    // the SAMPLED sources' dependencies only) is what the oracle pins.
    "q_betweenness_sampled" -> ((s, dir) => {
      val xs = s.range(6).select((col("id") + 1L).as("id"))
      val us = s.range(5).select((col("id") + 101L).as("id"))
      val ws = s.range(5).select((col("id") + 201L).as("id"))
      val verts = xs.unionAll(us).unionAll(ws).select(col("id"), lit("v").as("label"))
      val edges = Seq(
        s.range(5).select((col("id") + 5000L).as("id"), (col("id") + 1L).as("src"),
          (col("id") + 101L).as("dst"), lit("e").as("label")),
        s.range(5).select((col("id") + 5100L).as("id"), (col("id") + 1L).as("src"),
          (col("id") + 201L).as("dst"), lit("e").as("label")),
        s.range(5).select((col("id") + 5200L).as("id"), (col("id") + 101L).as("src"),
          (col("id") + 2L).as("dst"), lit("e").as("label")),
        s.range(5).select((col("id") + 5300L).as("id"), (col("id") + 201L).as("src"),
          (col("id") + 2L).as("dst"), lit("e").as("label"))
      ).reduce(_ unionAll _)
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      graft.olap.Analytics.betweennessSampled(g, Seq(1L, 3L), maxIter = 12)
    }),
    // ---- 2.K sampled harmonic centrality (Eppstein–Wang): Σ 1/dist from
    //      3 sampled sources as an exact integer, one multi-source BFS ----
    "q_harmonic" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val srcs = Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * t + _)
      graft.olap.Analytics.harmonicCentrality(graph(s, dir), srcs, maxIter = 4)
    }),
    // ---- 2.K sampled classic closeness: per-vertex Σdist + reached over
    //      the same sampled-source BFS (moments, not the quotient) ----
    "q_closeness" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val srcs = Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * t + _)
      graft.olap.Analytics.closenessCentrality(graph(s, dir), srcs, maxIter = 4)
    }),
    // ---- 2.K sampled eccentricity / pseudo-diameter: per-source max BFS
    //      distance + reached count through the same one-BFS-for-k-sources ----
    "q_eccentricity" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val srcs = Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * t + _)
      graft.olap.Analytics.eccentricity(graph(s, dir), srcs, maxIter = 4)
    }),
    // ---- 2.K sampled hop-distance histogram (the effective-diameter CDF
    //      ingredient) over the same shared BFS ----
    "q_hop_histogram" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val srcs = Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * t + _)
      graft.olap.Analytics.hopHistogram(graph(s, dir), srcs, maxIter = 4)
    }),
    // ---- 2.K explicit path materialization over the tree: source→v id
    //      chains for every reached vertex ----
    "q_shortest_paths" -> ((s, dir) => {
      val src = TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L
      graft.olap.Analytics.shortestPaths(
        graft.olap.Analytics.shortestPathTree(graph(s, dir), src, maxIter = 4), maxSteps = 4)
    }),
    // ---- 2.K degree stats via DataFrame aggregation ----
    "q_degrees_full" -> ((s, dir) => {
      graft.olap.Analytics.degrees(graph(s, dir), Seq("placed"))
        .select(uidOf(col("id"), TpchGraph.CustomerTag).as("uid"),
          col("out_degree"))
        .filter(col("out_degree") > 0)
    }),
    // ---- pipeline: exact dedup ----
    "q_dedup_exact" -> ((s, dir) => {
      graft.pipeline.Dedup.exact(s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: loser→survivor remap table (entity-resolution artifact
    //      downstream joins re-point through after dedup) ----
    "q_dedup_remap" -> ((s, dir) => {
      graft.pipeline.Dedup.survivorMap(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.8)
    }),
    // ---- pipeline: per-dimension embedding feature-health stats (dead
    //      dims, clipping, scale imbalance) ----
    "q_embed_dimstats" -> ((s, dir) => {
      graft.pipeline.Similarity.embeddingDimStats(
        s.read.parquet(s"$dir/embeddings.parquet"))
    }),
    // ---- pipeline: per-dimension standardization (diagonal whitening) —
    //      (v-mu)/sigma per cell, NULL on dead dims ----
    "q_embed_whiten" -> ((s, dir) => {
      graft.pipeline.Similarity.standardizeDims(
        s.read.parquet(s"$dir/embeddings.parquet"))
    }),
    // ---- pipeline: exact n-gram Jaccard similarity join ----
    "q_dedup_ngram" -> ((s, dir) => {
      graft.pipeline.Dedup.ngramJaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.8)
    }),
    // ---- pipeline: shingle-containment pairs (Broder containment — the
    //      quote/subsumption detector Jaccard misses) ----
    "q_containment_pairs" -> ((s, dir) => {
      graft.pipeline.Dedup.containmentPairs(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.5)
    }),
    // ---- pipeline: MinHash+LSH near-dup (verified ⇒ same oracle as exact) ----
    "q_dedup_minhash" -> ((s, dir) => {
      graft.pipeline.Dedup.minHashLshPairs(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.8)
    }),
    // ---- pipeline: end-to-end dedup (LSH pairs → CC → survivors; rows-only) ----
    // ---- pipeline: token-budget truncation (context-window cap) ----
    "q_truncate_tokens" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.truncateTokens(
        s.read.parquet(s"$dir/documents.parquet"), maxTokens = 40)
    }),
    // ---- pipeline: cross-source duplication matrix — near-dup pair counts
    //      by unordered (source, source) cell; off-diagonal = mirroring ----
    "q_cross_source_dups" -> ((s, dir) => {
      graft.pipeline.Dedup.crossSourceDupMatrix(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.8)
    }),
    // ---- pipeline × streaming: the SAME Dedup.exact operator run through
    //      Structured Streaming — a streamed corpus, complete-mode aggregate,
    //      memory sink; min-id survivor choice is order-insensitive, so the
    //      batch oracle matches exactly (one declarative plan, two engines —
    //      the Spark-first payoff) ----
    "q_stream_exact_dedup" -> ((s, dir) => {
      val src = s.read.parquet(s"$dir/documents.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft-sed")
      // file-stream sources take a DIRECTORY; stage the corpus as one
      src.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(src.schema).parquet(s"$tmp/in")
      val qname = s"graft_sed_${System.nanoTime()}"
      val q = graft.pipeline.Dedup.exact(stream)
        .writeStream.format("memory").queryName(qname).outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // clean the staged corpus + checkpoint on EVERY exit — success,
      // timeout, or a stream that terminates with an exception
      def cleanup(): Unit = deleteRecursively(tmp)
      val out =
        try {
          awaitStreamProbe(q, "q_stream_exact_dedup")
          val t = s.table(qname)
          s.catalog.dropTempView(qname)
          t
        } finally cleanup()
      out
    }),
    // ---- pipeline: STREAMING OOV monitor — the vocabulary freezes once
    //      (batch top-k), then the live ingest feed scores per-doc OOV mass
    //      through readStream: one broadcast join + ONE aggregation
    //      (complete-mode-legal), oracle-identical to the batch q_oov_rate ----
    "q_stream_oov" -> ((s, dir) => {
      val src = s.read.parquet(s"$dir/documents.parquet")
      val vocab = graft.pipeline.TextAnalysis.topVocabulary(src, 200)
      val tmp = java.nio.file.Files.createTempDirectory("graft-soov")
      src.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(src.schema).parquet(s"$tmp/in")
      val qname = s"graft_soov_${System.nanoTime()}"
      val q = graft.pipeline.TextAnalysis.oovRateAgainst(stream, vocab)
        .writeStream.format("memory").queryName(qname).outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      def cleanup(): Unit = deleteRecursively(tmp)
      val out =
        try {
          awaitStreamProbe(q, "q_stream_oov")
          val t = s.table(qname)
          s.catalog.dropTempView(qname)
          t
        } finally cleanup()
      out
    }),
    // ---- pipeline: STREAMING Bloom build — the word table is ONE bit_or
    //      aggregation, so the filter accretes per micro-batch; drained
    //      words ≡ the batch filter over the same eval slice ----
    "q_stream_bloom" -> ((s, dir) => {
      streamProbe(s, "q_stream_bloom", s.read.parquet(s"$dir/documents.parquet")
        .filter(pmod(col("doc_id"), lit(7L)) === 0L)) { stream =>
        graft.functions.Sketches.bloomBits(stream, "text", words = 8, k = 3)
      }
    }),
    // ---- pipeline: STREAMING HyperLogLog — the register table is ONE
    //      max-aggregation, so it updates per micro-batch in complete
    //      mode; drained registers ≡ the batch table (union = max) ----
    "q_stream_hll" -> ((s, dir) => {
      streamProbe(s, "q_stream_hll", s.read.parquet(s"$dir/documents.parquet")) {
        stream => graft.functions.Sketches.hllRegisters(stream, "doc_id")
      }
    }),
    // ---- pipeline: STREAMING count-min sketch — the occurrence-shaped
    //      single-aggregation form runs unchanged under readStream
    //      (complete mode); the drained counter table is oracle-identical
    //      to the batch sketch ----
    "q_stream_cms" -> ((s, dir) => {
      streamProbe(s, "q_stream_cms", s.read.parquet(s"$dir/documents.parquet")) {
        stream => graft.pipeline.TextAnalysis.countMinSketch(stream,
          width = 16, depth = 2, collapseVocab = false)
      }
    }),
    // ---- pipeline: STREAMING DSIR — the importance-weight model freezes
    //      once (batch λ table), then the live ingest feed scores through
    //      readStream: one broadcast stream-static join + ONE aggregation,
    //      oracle-identical to the batch q_dsir_weights ----
    "q_stream_dsir" -> ((s, dir) => {
      val src = s.read.parquet(s"$dir/documents.parquet")
      val model = graft.pipeline.TextAnalysis.dsirModel(
        src, col("source").isin("src0", "src1"), buckets = 1024)
      val tmp = java.nio.file.Files.createTempDirectory("graft-sdsir")
      src.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(src.schema).parquet(s"$tmp/in")
      val qname = s"graft_sdsir_${System.nanoTime()}"
      val q = graft.pipeline.TextAnalysis
        .importanceWeightsAgainst(stream, model, buckets = 1024)
        .writeStream.format("memory").queryName(qname).outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      def cleanup(): Unit = deleteRecursively(tmp)
      val out =
        try {
          awaitStreamProbe(q, "q_stream_dsir")
          val t = s.table(qname)
          s.catalog.dropTempView(qname)
          t
        } finally cleanup()
      out
    }),
    // ---- pipeline: STREAMING perceptual dedup — aHash fingerprints flow
    //      through Structured Streaming, one survivor (min id) + dup count
    //      per distinct fingerprint; oracle-identical to the batch groupBy,
    //      proving the visual-dedup family composes with streams like the
    //      text family does (q_stream_exact_dedup) ----
    "q_stream_image_dedup" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      val hashes = graft.pipeline.Multimodal.imageAHash(
        graft.pipeline.Multimodal.synthesizePngMedia(ids))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sid")
      hashes.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(hashes.schema).parquet(s"$tmp/in")
      val qname = s"graft_sid_${System.nanoTime()}"
      val q = stream
        .groupBy(col("ahash_hi"), col("ahash_lo"))
        .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_dups"))
        .writeStream.format("memory").queryName(qname).outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      def cleanup(): Unit = deleteRecursively(tmp)
      val out =
        try {
          awaitStreamProbe(q, "q_stream_image_dedup")
          val t = s.table(qname)
          s.catalog.dropTempView(qname)
          t
        } finally cleanup()
      out
    }),
    // ---- pipeline: STREAMING incremental dedup — document batches flow
    //      through foreachBatch, each near-dup'd against the STATIC corpus
    //      (nearDupAgainst unchanged); the corpus banded index is reused
    //      across micro-batches via PlanCache — the production CDC-ingest
    //      dedup loop ----
    "q_stream_neardup" -> ((s, dir) => {
      val corpus = s.read.parquet(s"$dir/documents.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft-snd")
      corpus.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(corpus.schema).parquet(s"$tmp/in")
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.pipeline.Dedup.nearDupAgainst(corpus, batch, threshold = 0.8)
            .write.mode("append").parquet(s"$tmp/out")
        }
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      def cleanup(): Unit = deleteRecursively(tmp)
      try {
        awaitStreamProbe(q, "q_stream_neardup")
        // materialize before the staged inputs are cleaned
        val out = s.read.parquet(s"$tmp/out").collect()
        s.createDataFrame(java.util.Arrays.asList(out: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("in_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("corpus_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("jaccard", org.apache.spark.sql.types.DoubleType))))
      } finally cleanup()
    }),
    // ---- pipeline: incremental dedup — today's batch (doc_id < 100)
    //      near-dup'd AGAINST the full corpus; candidates from the
    //      cross-side bucket join only, corpus banded index reused ----
    "q_neardup_against" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.pipeline.Dedup.nearDupAgainst(
        docs, docs.filter(col("doc_id") < 100), threshold = 0.8)
    }),
    // ---- pipeline: duplicate-cluster size histogram (the standard dedup
    //      report) — unpaired docs fold in as size-1 clusters so the
    //      histogram partitions the whole corpus ----
    "q_dedup_stats" -> ((s, dir) => {
      graft.pipeline.Dedup.dedupStats(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.8)
    }),
    "q_dedup_documents" -> ((s, dir) => {
      graft.pipeline.Dedup.dedupDocuments(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.8)
        .select(col("doc_id"), col("n_chars"))
    }),
    // ---- pipeline: dedup with priority survivor selection (keep longest) ----
    "q_dedup_priority" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val pairs = graft.pipeline.Dedup.minHashLshPairs(docs, threshold = 0.8)
      graft.pipeline.Dedup.survivorsByPriority(docs, pairs, "doc_id", col("n_chars"))
        .select(col("doc_id"), col("n_chars"))
    }),
    // ---- pipeline: IVF approximate top-k (scale path; rows-only) ----
    "q_ivf_topk" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .select(col("qid"), col("nid"), col("rank"))
    }),
    // ---- pipeline: ANN recall report — IVF candidates vs the exact
    //      brute-force answer, per-query + micro-averaged summary ----
    "q_ann_recall" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Similarity.annRecall(e, e.filter(col("vec_id") < 10), k = 5)
    }),
    // ---- pipeline: spherical product-quantization encode (Jégou et al.) —
    //      per-subspace deterministic k-means codebooks, one code column per
    //      subspace; the oracle mirrors every subspace chain CTE-for-CTE ----
    "q_pq_encode" -> ((s, dir) => {
      graft.pipeline.Similarity.pqEncode(
        s.read.parquet(s"$dir/embeddings.parquet"), m = 2, k = 8, rounds = 2)
    }),
    // ---- pipeline: PQ asymmetric-distance top-k (ADC) — corpus represented
    //      by codes only; per-query codeword lookup tables, fixed-order
    //      summed score, rank-exact against the mirrored oracle ----
    "q_pq_topk" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Similarity.pqTopK(e, e.filter(col("vec_id") < 10), k = 5)
    }),
    // ---- pipeline: bigram conditional-LM perplexity proxy — fluent word
    //      ORDER scores above bag-of-words boilerplate ----
    "q_bigram_logprob" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.bigramLogProb(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: temperature-scaled mixture weights (T5/mT5 recipe:
    //      rate ∝ count^0.5 upweights small sources) ----
    "q_temperature_weights" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.temperatureWeights(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: the published Gopher quality rules as one turnkey
    //      per-document filter (flags kept so failures are explainable) ----
    "q_gopher_rules" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.gopherRules(
        s.read.parquet(s"$dir/documents.parquet"), minWords = 30)
    }),
    // ---- pipeline: C4-style page cleaning (line-level terminal-punctuation
    //      + min-words rules, page-level lorem-ipsum/brace/min-lines drops).
    //      The corpus text is one unpunctuated line, so the probe builds a
    //      deterministic 4-line page per doc (both engines identically):
    //      two clean lines, one punctuation-less line, and a third line that
    //      carries a '{' on every 5th doc — exercising every rule class ----
    "q_c4_clean" -> ((s, dir) => {
      val page = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
        concat_ws("\n",
          concat(substring(col("text"), 1, 40), lit(" tail.")),
          lit("no terminal punct"),
          lit("the quick brown fox jumps."),
          when(col("doc_id") % 5 === 0, lit("junk { brace"))
            .otherwise(lit("clean third line."))).as("text"))
      graft.pipeline.TextAnalysis.c4Clean(page)
    }),
    // ---- pipeline: hubness — in-degree histogram of the k-NN digraph
    //      (hub vectors distort retrieval; zero-degree vectors included) ----
    "q_hubness" -> ((s, dir) => {
      graft.pipeline.Similarity.hubness(
        s.read.parquet(s"$dir/embeddings.parquet"), k = 5)
    }),
    // ---- pipeline: Johnson–Lindenstrauss random projection (seeded ±1
    //      directions; DECIMAL-exact sums, 6-dp values per dimension) ----
    "q_random_project" -> ((s, dir) => {
      graft.pipeline.Similarity.randomProject(
        s.read.parquet(s"$dir/embeddings.parquet"), outDim = 16)
    }),
    // ---- pipeline: hard-negative mining (DPR/Contriever recipe) — per
    //      query, the most-similar vectors with a DIFFERENT label ----
    "q_hard_negatives" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Similarity.hardNegatives(e, e.filter(col("vec_id") < 10), k = 5)
    }),
    // ---- pipeline: PQ decode — reconstruction from codes is EXACT given
    //      the 6-dp codebooks, so per-dimension values compare raw ----
    "q_pq_decode" -> ((s, dir) => {
      graft.pipeline.Similarity.pqDecode(
        s.read.parquet(s"$dir/embeddings.parquet"), m = 2, codes = 8, rounds = 2)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "val")))
    }),
    // ---- pipeline: IVF-PQ top-k — coarse buckets restrict candidates,
    //      ADC scores from codes; the 10¹⁰-vector production shape ----
    "q_ivfpq_topk" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), k = 5)
    }),
    // ---- pipeline: PERSISTED IVF-PQ index — write the bucket-partitioned
    //      codes + centroids + codebooks layout, then search it from disk;
    //      deterministic training makes the result identical to the
    //      in-session composition, so q_ivfpq_topk's oracle applies ----
    "q_ivfpq_persisted" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      // per-invocation temp dir: a fixed path would race concurrent drivers
      // (one overwriting codes/ while another's lazy scan reads them)
      val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx")
      graft.pipeline.Similarity.writeIvfPqIndex(e, tmp.toString)
      val res = graft.pipeline.Similarity
        .searchIvfPqIndex(s, tmp.toString, e.filter(col("vec_id") < 10), k = 5)
        .localCheckpoint(true) // materialize before the index files vanish
      deleteRecursively(tmp)
      res
    }),
    // ---- pipeline: INCREMENTAL index append — train on vec_id < 400,
    //      append the rest with the FROZEN centroids/codebooks, search the
    //      union; identical to a frozen-codebook build over everything ----
    "q_ivfpq_append" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-app")
      graft.pipeline.Similarity.writeIvfPqIndex(
        e.filter(col("vec_id") < 400), tmp.toString)
      graft.pipeline.Similarity.appendToIvfPqIndex(s, tmp.toString,
        e.filter(col("vec_id") >= 400))
      val res = graft.pipeline.Similarity
        .searchIvfPqIndex(s, tmp.toString, e.filter(col("vec_id") < 10), k = 5)
        .localCheckpoint(true) // materialize before the index files vanish
      deleteRecursively(tmp)
      res
    }),
    // ---- pipeline: SemDeDup-style semantic dedup (cluster → within-cluster
    //      cosine pairs → keep min id per duplicate component) ----
    "q_semantic_dedup" -> ((s, dir) => {
      graft.pipeline.Similarity.semanticDedup(
        s.read.parquet(s"$dir/embeddings.parquet"), threshold = 0.4254, nlist = 16)
        .select(col("vec_id"), col("label"))
    }),
    // ---- pipeline: LSH-bucketed cosine pairs (scale path). The cap is
    //      disabled HERE because the mirrored SQL keeps every banding
    //      candidate — production callers keep the default maxBucketSize ----
    "q_lsh_cosine_pairs" -> ((s, dir) => {
      graft.pipeline.Similarity.lshCosinePairs(
        s.read.parquet(s"$dir/embeddings.parquet"), 0.4, dim = 64, bandBits = 4,
        maxBucketSize = Long.MaxValue)
        .select(col("ida"), col("idb"))
    }),
    // ---- pipeline: LSH empirical quality sheet — banded join vs exact at
    //      the same threshold; recall measured, precision 1 by design ----
    "q_lsh_recall" -> ((s, dir) => {
      graft.pipeline.Similarity.lshQualityReport(
        s.read.parquet(s"$dir/embeddings.parquet"), 0.4, dim = 64, bandBits = 4)
    }),
    // ---- pipeline: binary (sign) quantization — 128 hyperplane sign bits
    //      as two BIGINT words; the 16-byte rung of the quantization ladder ----
    "q_binary_quantize" -> ((s, dir) => {
      graft.pipeline.Similarity.binaryQuantize(
        s.read.parquet(s"$dir/embeddings.parquet"))
    }),
    // ---- pipeline: SimHash near-dup — engine-portable md5 token-hash
    //      family, maxHamming ≤ pieces-1 so banding is provably complete and
    //      the output equals the brute-force Hamming join (exact oracle) ----
    "q_dedup_simhash" -> ((s, dir) => {
      graft.pipeline.Dedup.simHashPairs(
        s.read.parquet(s"$dir/documents.parquet"), maxHamming = 2,
        bits = 48, tokenHash = graft.pipeline.Dedup.md5Hash48)
        .select(col("ida"), col("idb"), col("hamming").cast(LongType).as("hamming"))
    }),
    // ---- pipeline: Gopher-style repetition quality signals ----
    "q_repetition" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.repetitionSignals(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: train/eval decontamination (shared 8-grams) ----
    "q_contamination" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      graft.pipeline.Dedup.contamination(
        d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20), n = 8)
    }),
    // ---- pipeline: overlap-FRACTION decontamination (thresholded GPT-3-
    //      style variant; short n tolerates incidental collisions) ----
    "q_contamination_overlap" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      graft.pipeline.Dedup.contaminationOverlap(
        d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
        n = 3, minOverlap = 0.2)
    }),
    // ---- pipeline: sliding-window chunking (sequence packing) ----
    "q_chunk" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.chunkDocuments(
        s.read.parquet(s"$dir/documents.parquet"), maxTokens = 24, overlap = 8)
    }),
    // ---- pipeline: sentence-boundary chunking — the corpus text is one
    //      unpunctuated line, so the probe plants sentence ends ('fast' →
    //      'fast.') identically on both sides, then packs sentences into
    //      ≤24-token chunks by the prefix-sum rule ----
    "q_chunk_sentences" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), expr("replace(text, ' fast ', ' fast. ')").as("text"))
      graft.pipeline.TextAnalysis.chunkBySentences(d, maxTokens = 24)
    }),
    // ---- pipeline: corpus token document frequency (vocabulary stats) ----
    "q_token_df" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.tokenDocFrequency(
        s.read.parquet(s"$dir/documents.parquet"), k = 20)
    }),
    // ---- pipeline: end-to-end corpus prep — quality filter → exact-dedup
    //      survivors (constant-width md5 agg + semi-join; text never enters
    //      an Exchange) → per-(source, lang) doc/token totals ----
    "q_corpus_prep" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.corpusPrep(
        s.read.parquet(s"$dir/documents.parquet"), minScore = 0.7)
    }),
    // ---- pipeline: corpus datasheet — per-source dataset-card summary
    //      (docs, token mass, exact median, language mix, exact-dup rate) ----
    "q_corpus_datasheet" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.corpusDatasheet(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: unigram log-prob (cheap perplexity-proxy quality) ----
    "q_unigram_logprob" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.unigramLogProb(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: per-window language mix — the code-switching detector
    //      a whole-document langId silently mislabels ----
    "q_language_mix" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.languageMix(
        s.read.parquet(s"$dir/documents.parquet"), windowTokens = 50)
    }),
    // ---- pipeline: weighted sampling without replacement (E-S A-Res) —
    //      exactly k per source, probability ∝ document length ----
    "q_weighted_sample" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.weightedSample(
        s.read.parquet(s"$dir/documents.parquet"), k = 5, weight = col("n_chars"))
    }),
    // ---- pipeline: epoch budgeting — the repeat-factor sheet for a fixed
    //      token budget and target mixture (over-epoching flagged) ----
    "q_epoch_budget" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.epochBudget(
        s.read.parquet(s"$dir/documents.parquet"),
        epochBudgetWeights, budgetTokens = 10000000L)
    }),
    // ---- pipeline: DSIR importance weights — hashed-ngram target-vs-raw
    //      log-likelihood ratio per document (importance resampling score) ----
    "q_dsir_weights" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.importanceWeights(
        s.read.parquet(s"$dir/documents.parquet"),
        targetPred = col("source").isin("src0", "src1"), buckets = 1024)
    }),
    // ---- pipeline: contiguous sequence packing into fixed token bins ----
    "q_pack_sequences" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.packSequences(
        s.read.parquet(s"$dir/documents.parquet"), capacityTokens = 2048)
    }),
    // ---- pipeline: cross-document duplicated-span fraction (exact
    //      substring-dedup signal over 8-gram spans) ----
    "q_dup_span_frac" -> ((s, dir) => {
      graft.pipeline.Dedup.dupSpanFraction(
        s.read.parquet(s"$dir/documents.parquet"), n = 8)
    }),
    // ---- pipeline: exact-substring span REMOVAL (Lee et al. 2022) — cut
    //      every token span whose 8-gram occurs in ≥2 docs, keep the rest;
    //      the full rewritten text round-trips through the oracle ----
    "q_remove_dup_spans" -> ((s, dir) => {
      graft.pipeline.Dedup.removeDupSpans(
        s.read.parquet(s"$dir/documents.parquet"), n = 8)
    }),
    // ---- pipeline: INTRA-document repetition removal — re-occurrences of a
    //      3-gram inside one document are cut, the first stays (n=3: the
    //      synthetic corpus repeats trigrams within docs, not 8-grams) ----
    "q_remove_repeated_spans" -> ((s, dir) => {
      graft.pipeline.Dedup.removeRepeatedSpans(
        s.read.parquet(s"$dir/documents.parquet"), n = 3)
    }),
    // ---- pipeline: corpus-wide line dedup (the C4 global rule: a line
    //      keeps only its lexicographically-first (doc,pos) occurrence).
    //      The synthetic corpus is single-line docs, so the probe runs the
    //      op at token granularity (sep=' ') to actually exercise
    //      first-wins/cover/rebuild; newline-split is fixture-tested in
    //      PipelineSpec ----
    "q_remove_dup_lines" -> ((s, dir) => {
      graft.pipeline.Dedup.removeDupLines(
        s.read.parquet(s"$dir/documents.parquet"), sep = " ")
    }),
    // ---- pipeline: BM25 retrieval over the corpus for a fixed term set ----
    "q_bm25" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.bm25TopK(
        s.read.parquet(s"$dir/documents.parquet"), Seq("hash", "scan", "merge"), k = 20)
    }),
    // ---- pipeline: count-min sketch accuracy sheet — fixed-memory md5
    //      counter table, point estimates vs exact counts (overcount is
    //      the one-sided sketch error; absent term pins the zero path) ----
    "q_cms_estimate" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.cmsEstimates(
        s.read.parquet(s"$dir/documents.parquet"),
        Seq("hash", "scan", "merge", "the", "data", "zzz_absent"),
        width = 16, depth = 2)
    }),
    // ---- pipeline: the LSH S-curve tuning sheet — candidate probability
    //      1-(1-s^r)^b per banding on a 0.05 similarity grid, computed as
    //      exact square-and-round DECIMAL chains (no float pow) ----
    "q_lsh_tuning" -> ((s, dir) => {
      graft.pipeline.Dedup.lshTuningTable(s)
    }),
    // ---- pipeline: trigram stupid-backoff LM scoring (Brants 2007) —
    //      model on sources src0-src9, scored corpus-wide so the 0.4
    //      backoff chain genuinely fires on out-of-model n-grams ----
    "q_stupid_backoff" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val model = docs.filter(col("source").isin((0 to 9).map(i => s"src$i"): _*))
      graft.pipeline.TextAnalysis.stupidBackoffLogProb(docs, model)
    }),
    // ---- pipeline: classic TF-IDF retrieval (linear tf, ln(N/df) idf) —
    //      the saturation-free vector-space baseline beside BM25 ----
    "q_tfidf" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.tfIdfTopK(
        s.read.parquet(s"$dir/documents.parquet"), Seq("hash", "scan", "merge"), k = 20)
    }),
    // ---- pipeline: exact interpolated token-length quantiles per source ----
    "q_length_quantiles" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.lengthQuantiles(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- 2.G lag/lead window: per-user inter-event gaps. Each raw ns long
    // is truncated to µs with exact integer division (`div`) BEFORE
    // differencing — DuckDB's parquet reader truncates ns→µs, and the
    // long→double µs conversion in readEvents can be off by 1 µs, which an
    // exact integer SUM would expose ----
    "q_event_gaps" -> ((s, dir) => {
      val ev = readEventsRaw(s, dir) // ts: long (ns)
        .withColumn("ts_us", expr("ts div 1000"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      ev.withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("gap")).as("sum_gap_us"),
          max(col("gap")).as("max_gap_us"))
    }),
    // ---- events analytics: ordered funnel (first-touch, strict order,
    //      windowed) — per-stage surviving-user counts ----
    "q_funnel" -> ((s, dir) => {
      graft.stream.ChangeStream.funnel(readEvents(s, dir),
        Seq("signup", "view", "purchase"), windowSeconds = 7L * 86400)
    }),
    // ---- events analytics: top-k session paths — the full-sequence
    //      sibling of the transition matrix (total-order sorted structs) ----
    "q_session_paths" -> ((s, dir) => {
      graft.stream.ChangeStream.sessionPaths(readEvents(s, dir),
        gapSeconds = 3600L, k = 25)
    }),
    // ---- events analytics: exact equi-depth (NTILE) histogram of value
    //      per event type — resolution where the mass is ----
    "q_equidepth" -> ((s, dir) => {
      graft.stream.ChangeStream.equiDepthHistogram(readEvents(s, dir), nb = 10)
    }),
    // ---- events analytics: retention cohort matrix (daily periods) ----
    "q_retention" -> ((s, dir) => {
      graft.stream.ChangeStream.retentionCohorts(readEvents(s, dir),
        periodSeconds = 86400L)
    }),
    // ---- events analytics: first-order Markov transition matrix over
    //      per-user event sequences, exact floor-scaled probabilities ----
    "q_event_transitions" -> ((s, dir) => {
      graft.stream.ChangeStream.eventTransitions(readEvents(s, dir))
    }),
    // ---- events analytics: per-event z-scores from DECIMAL-exact
    //      per-type moments (metric-anomaly report; raw IEEE doubles) ----
    "q_value_zscores" -> ((s, dir) => {
      graft.stream.ChangeStream.valueZScores(readEvents(s, dir))
    }),
    // ---- events analytics: winsorize the value column to per-type
    //      [p05, p95] interpolated quantiles (outlier clamp) ----
    "q_winsorize" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.winsorize(readEvents(s, dir))
    }),
    // ---- events analytics: exact empirical-CDF percentile rank per event
    //      (calibration-free anomaly score; all-integer) ----
    "q_value_percentiles" -> ((s, dir) => {
      graft.stream.ChangeStream.valuePercentiles(readEvents(s, dir))
    }),
    // ---- pipeline: token frequency-of-frequencies spectrum (Zipf health
    //      report — hapax mass vs head truncation) ----
    "q_freq_spectrum" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.frequencySpectrum(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: mutual information lang↔source (dataset-audit check
    //      for confounded metadata; exact ln recipe, nats) ----
    "q_mutual_info" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.mutualInformation(
        s.read.parquet(s"$dir/documents.parquet"), "lang", "source")
    }),
    // ---- pipeline: language-metadata consistency — langId prediction vs
    //      the declared lang column, mismatch rate per source ----
    "q_lang_mismatch" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.langConsistency(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: tokenizer fertility per language (subwords per word —
    //      the under-served-language context-window metric) ----
    "q_fertility" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.fertility(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: join-key health audit (orphans + dup keys both sides —
    //      the pre-join referential-integrity report) ----
    "q_join_audit" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.joinKeyAudit(
        s.read.parquet(s"$dir/lineitem.parquet"), "l_orderkey",
        s.read.parquet(s"$dir/orders.parquet"), "o_orderkey")
    }),
    // ---- pipeline: pairwise source vocabulary overlap (exact token-set
    //      Jaccard — dataset-mixing diversity signal) ----
    "q_source_overlap" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.sourceVocabOverlap(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: per-source Gopher-rule drop audit (which rule cuts
    //      which source, and how much survives) ----
    "q_filter_report" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.filterReport(
        s.read.parquet(s"$dir/documents.parquet"), minWords = 30)
    }),
    // ---- pipeline: deterministic per-source mixture sampling ----
    "q_mixture_sample" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.mixtureSample(
        s.read.parquet(s"$dir/documents.parquet"), MixtureRates)
        .select(col("doc_id"), col("source"))
    }),
    // ---- pipeline: per-domain quota (anti-domination cap, WindowGroupLimit) ----
    "q_domain_quota" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.domainQuota(
        s.read.parquet(s"$dir/documents.parquet"), n = 50)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),
    // ---- pipeline: linear quality-classifier scoring (fastText-shaped) ----
    "q_quality_linear" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.scoreLinear(
        s.read.parquet(s"$dir/documents.parquet"), QualityVocab,
        bias = 0.05, threshold = 0.1)
        .select(col("doc_id"), col("n_tokens"), col("score"), col("keep"))
    }),
    // ---- pipeline: BPE merge-pair counting (tokenizer training inner loop) ----
    "q_bpe_pairs" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.bpePairCounts(
        s.read.parquet(s"$dir/documents.parquet"), k = 30)
    }),
    // ---- pipeline: BPE ENCODE — the fixed merge table applied to every
    //      document (single-pass rank-ordered rewrites; see bpeEncode) ----
    "q_bpe_encode" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.bpeEncode(
        s.read.parquet(s"$dir/documents.parquet"), bpeMergeTable)
    }),
    // ---- pipeline: BPE TRAINING — learn the merge table itself (argmax
    //      pair per round, corpus-wide rewrite; feeds bpeEncode) ----
    "q_bpe_train" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.bpeTrain(
        s.read.parquet(s"$dir/documents.parquet"), numMerges = 8)
    }),
    // ---- pipeline: tokenizer-coverage report — per-doc OOV mass against
    //      the corpus's own top-k vocabulary (deterministic boundary) ----
    "q_oov_rate" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.oovRate(
        s.read.parquet(s"$dir/documents.parquet"), vocabSize = 200)
    }),
    // ---- pipeline: column profiling — the pre-training data-quality sweep
    //      (exact ndv via one Expand pass; approx twin is the scale path) ----
    "q_profile" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.profileColumns(
        s.read.parquet(s"$dir/documents.parquet"), Seq("lang", "source", "n_chars"))
    }),
    // ---- pipeline: deterministic train/val/test splits ----
    "q_split_hash" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.hashSplit(
        s.read.parquet(s"$dir/documents.parquet"), SplitWeights, salt = "split1")
        .select(col("doc_id"), col("split"))
    }),
    "q_split_stratified" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.stratifiedSplit(
        s.read.parquet(s"$dir/documents.parquet"), SplitWeights, salt = "split1")
        .select(col("doc_id"), col("source"), col("split"))
    }),
    // ---- pipeline: deterministic global shuffle (epoch permutation key) ----
    "q_shuffled" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.shuffled(
        s.read.parquet(s"$dir/documents.parquet"), salt = "epoch1")
        .limit(200).select(col("doc_id"), col("_shuffle_key"))
    }),
    // ---- pipeline: embedding-cosine near-dup pairs ----
    "q_embed_pairs" -> ((s, dir) => {
      graft.pipeline.Similarity.cosinePairs(
        s.read.parquet(s"$dir/embeddings.parquet"), threshold = 0.4254)
        .select(col("ida"), col("idb"))
    }),
    // ---- pipeline: top-k corpus bigram collocations ----
    "q_top_bigrams" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.topBigrams(
        s.read.parquet(s"$dir/documents.parquet"), k = 30)
    }),
    // ---- pipeline: PMI collocations — ln(P(ab)/(P(a·)P(·b))) over bigram
    //      positions, min-count floored; true phrases, not just frequent ----
    "q_pmi_bigrams" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.pmiCollocations(
        s.read.parquet(s"$dir/documents.parquet"), k = 30, minCount = 5L)
    }),
    // ---- pipeline: per-source vocabulary richness (type-token ratio) ----
    "q_vocab_stats" -> ((s, dir) => {
      graft.pipeline.TextAnalysis.vocabStats(
        s.read.parquet(s"$dir/documents.parquet"))
    }),
    // ---- pipeline: symmetric int8 embedding quantization. Codes emitted as
    //      one comma-joined string per row (probe rule: no array columns). ----
    "q_quantize_int8" -> ((s, dir) => {
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          graft.pipeline.Similarity.quantizeInt8(col("embedding")).as("q"))
        .select(col("vec_id"), round(col("q.scale"), 6).as("scale"),
          array_join(col("q.codes").cast("array<string>"), ",").as("codes"))
    }),
    // ---- pipeline: mean-pooled embedding centroid per class ----
    "q_embed_meanpool" -> ((s, dir) => {
      graft.pipeline.Similarity.meanPool(s.read.parquet(s"$dir/embeddings.parquet"))
        .select(col("label"), col("dim"), round(col("centroid"), 6).as("centroid"))
    }),
    // ---- pipeline: brute-force cosine top-k (ANN baseline) ----
    "q_ann_topk" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .select(col("qid"), col("nid"), col("rank"))
    }),
    // ---- pipeline: cosine RANGE search — top-k's threshold dual; queries
    //      broadcast, corpus scanned once with the filter map-side ----
    "q_ann_range" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Similarity.rangeSearch(e, e.filter(col("vec_id") < 10),
        threshold = 0.3)
    }),
    // ---- pipeline: token counting ----
    "q_token_count" -> ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), graft.pipeline.TextAnalysis.tokenCount(col("text")).cast(LongType).as("n_tokens"))
    }),
    // ---- pipeline: multimodal batch plumbing (payload bytes → features) ----
    "q_multimodal" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val media = graft.pipeline.Multimodal.synthesizeMedia(docs, "doc_id", "text")
      graft.pipeline.Multimodal.decodeStub(media)
        .join(media.select(col("doc_id"), col("media.width").as("width")), Seq("doc_id"))
        .select(col("doc_id"), col("n_bytes"), col("width"))
    }),
    // ---- 2.M multimodal: REAL image decode — deterministic 8×8 PNGs are
    //      encoded by the JDK's PNG writer, decoded distributed through
    //      javax.imageio, and the luminance histogram is re-derived by the
    //      oracle as a pure function of doc_id (pixel i = (id·31+i) mod 256,
    //      so an encode/decode discrepancy anywhere fails the hash) ----
    "q_image_decode" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      val media = graft.pipeline.Multimodal.synthesizePngMedia(ids)
      graft.pipeline.Multimodal.decodeImages(media)
        .select(col("doc_id"), col("width"), col("height"),
          posexplode(col("feature")).as(Seq("bin", "frac")))
        .withColumn("frac", col("frac").cast(DoubleType))
    }),
    // ---- 2.M multimodal dedup: perceptual average-hash of REAL decoded
    //      pixels (grayscale 8x8, threshold vs mean — the public pHash-family
    //      recipe); the synthetic pixels are a pure function of doc_id, so
    //      the oracle re-derives every bit without seeing the bytes ----
    "q_image_ahash" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      graft.pipeline.Multimodal.imageAHash(
        graft.pipeline.Multimodal.synthesizePngMedia(ids))
    }),
    // ---- 2.M image dHash: 56 horizontal gradient bits on the SAME 8x8
    //      lattice as aHash — survives global brightness shifts ----
    "q_image_dhash" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      graft.pipeline.Multimodal.imageDHash(
        graft.pipeline.Multimodal.synthesizePngMedia(ids))
    }),
    // ---- 2.M visual near-dup pairs: Hamming-banded aHash join (recall 1
    //      for distance <= 7 by pigeonhole over 8 byte-bands), verified by
    //      exact bit_count distance — the image member of the dedup family ----
    "q_image_neardup" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      graft.pipeline.Multimodal.imageNearDupPairs(
        graft.pipeline.Multimodal.imageAHash(
          graft.pipeline.Multimodal.synthesizePngMedia(ids)), maxHamming = 7)
    }),
    // ---- 2.M multimodal dedup, audio member: 64-frame energy fingerprint
    //      of REAL decoded PCM (same division-free mean threshold as aHash);
    //      the synthetic signal is a pure function of doc_id ----
    "q_audio_fingerprint" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      graft.pipeline.Multimodal.audioFingerprint(
        graft.pipeline.Multimodal.synthesizeWavMedia(ids))
    }),
    // ---- 2.M audio near-dup pairs through the generic Hamming-banded join ----
    "q_audio_neardup" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      graft.pipeline.Multimodal.hammingNearDupPairs(
        graft.pipeline.Multimodal.audioFingerprint(
          graft.pipeline.Multimodal.synthesizeWavMedia(ids)),
        "afp_hi", "afp_lo", maxHamming = 7)
    }),
    // ---- 2.M multimodal: REAL image resize (nearest-neighbor, JDK codec)
    //      composed with decode — the resized 4×4's histogram is the oracle's
    //      pure function of doc_id over the NN-sampled source pixels ----
    "q_image_resize" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      val media = graft.pipeline.Multimodal.synthesizePngMedia(ids)
      val small = graft.pipeline.Multimodal.resizeImages(media, 4, 4)
      graft.pipeline.Multimodal.decodeImages(small)
        .select(col("doc_id"), col("width"), col("height"),
          posexplode(col("feature")).as(Seq("bin", "frac")))
        .withColumn("frac", col("frac").cast(DoubleType))
    }),
    // ---- 2.M multimodal: REAL audio decode — deterministic PCM16 WAVs
    //      (sample i = (id·7919+i·31) mod 65536 − 32768) parsed distributed
    //      through javax.sound.sampled; integer signal statistics are
    //      re-derived by the oracle as a pure function of doc_id ----
    "q_audio_decode" -> ((s, dir) => {
      val ids = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      graft.pipeline.Multimodal.decodeAudio(
        graft.pipeline.Multimodal.synthesizeWavMedia(ids))
    }),
    // ---- 2.M multimodal: video frame-sampling plan (bounded explode of
    //      decode timestamps — the plumbing, not the codec) ----
    "q_frame_sample" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val media = docs.select(col("doc_id"), struct(
        encode(col("text"), "UTF-8").as("payload"), lit("fake/video").as("format"),
        lit(640).as("width"), lit(480).as("height"),
        (col("n_chars") * 40L).cast(LongType).as("duration_ms")).as("media"))
      graft.pipeline.Multimodal.frameSamplePlan(media, everyMs = 2000, maxFrames = 16)
    }),
    // ---- 2.M multimodal: fixed-size payload chunk ranges (audio windowing) ----
    "q_chunk_plan" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val media = graft.pipeline.Multimodal.synthesizeMedia(docs, "doc_id", "text")
      graft.pipeline.Multimodal.chunkPlan(media, chunkBytes = 1000)
    }),
    // ---- 2.F superset: grouping-set rollup (Spark freebie per SURVEY 2.F) ----
    "q_rollup" -> ((s, dir) => {
      s.read.parquet(s"$dir/orders.parquet")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"), col("cnt"))
    }),
    // ---- pipeline: quality features (integer-ratio deterministic doubles) ----
    "q_quality" -> ((s, dir) => {
      val f = graft.pipeline.TextAnalysis.qualityFeatures(col("text"))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), f.getField("n_tokens").as("n_tokens"),
          f.getField("n_distinct").as("n_distinct"),
          f.getField("distinct_ratio").as("distinct_ratio"),
          f.getField("stopword_ratio").as("stopword_ratio"))
    }),
    // ---- pipeline: composite quality score (deterministic double math) ----
    "q_quality_score" -> ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), graft.pipeline.TextAnalysis.qualityScore(col("text")).as("score"))
    }),
    // ---- pipeline: BPE-ish subword count (same-class runs, RE2-mirrorable) ----
    "q_subword_count" -> ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          graft.pipeline.TextAnalysis.subwordCount(col("text")).cast(LongType).as("n_subwords"))
    }),
    // ---- pipeline: language ID heuristic ----
    "q_langid" -> ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), graft.pipeline.TextAnalysis.langId(col("text")).as("lang_pred"))
    }),
    // ---- pipeline: document fingerprint ----
    "q_fingerprint" -> ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), graft.pipeline.TextAnalysis.fingerprintMd5(col("text")).as("fp"))
    }),
    // ---- pipeline: PII redaction (hash of the scrubbed text — proves the
    //      regex pipeline applied identically on both engines) ----
    "q_redact" -> ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          md5(graft.pipeline.TextAnalysis.redactPii(col("text"))).as("fp_redacted"))
    }),
    // ---- 2.E choose (per-traverser branch) ----
    "q_choose" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .choose(col("acctbal") > 5000.0)(_.out("placed"), identity)
        .values("uid", "label")
    }),
    // ---- 2.E choose with a TRAVERSAL predicate (TinkerPop
    //      choose(out('knows'), t, f): branch on sub-traversal emptiness) ----
    "q_choose_traversal" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer").has("mktsegment", "BUILDING")
        .chooseSub(_.out("placed").has("totalprice", P.gt(400000.0)))(
          t => t.out("placed"), f => f)
        .values("uid", "label")
    }),
    // ---- 2.E where with a traversal predicate (where(out(...).has(...))) ----
    "q_where_sub" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .whereSub(_.out("placed").has("totalprice", P.gt(300000.0)))
        .values("uid", "name")
    }),
    // ---- 2.E where(sub.count().is(p)) — count-valued traversal predicate
    //      (emptiness can't express ≥15); the lte form rides the same
    //      left-join+coalesce(0) path that makes count-0 selectable ----
    "q_where_count" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .whereCount(P.gte(15))(_.out("placed"))
        .values("uid")
    }),
    "q_where_count_low" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .whereCount(P.lte(8))(_.out("placed"))
        .values("uid")
    }),
    // ---- 2.E repeat().until(traversal) — exit when out() dries up ----
    "q_repeat_until_sub" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .repeatUntilSub(_.out(), maxIter = 3)(_.out("in_nation", "in_region"))
        .values("uid", "label")
    }),
    // ---- 2.E order().by(sub-traversal): degree-ordered top-k ----
    "q_order_by_degree" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .orderBySub(_.out("placed"), count(lit(1)), asc = false)
        .limit(10)
        .values("uid")
    }),
    // ---- 2.E group().by(key).by(sub-traversal agg) ----
    "q_group_by_agg" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .groupBySub("mktsegment", _.out("placed"), count(lit(1)))
        .select(col("mktsegment"), col("value"))
    }),
    // ---- 2.E group().by(keySubTraversal): by-modulation on the group KEY
    //      itself (TinkerPop group().by(out('placed').count()) — customers
    //      bucketed by how many orders they placed), not just the value ----
    "q_group_by_key_sub" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .groupByKeySub(_.out("placed"))
        .select(col("key").as("n_orders"), col("value").as("n_customers"))
    }),
    // ---- 2.E project().by(sub-traversal): per-element aggregates ----
    "q_project_by" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .projectSubs(("uid", uidOf(col("id"), TpchGraph.CustomerTag)),
          ("n_orders", _.out("placed"), count(lit(1)), lit(0L)),
          ("spend", _.out("placed"), dsum(col("totalprice")), lit(0.0)))
    }),
    // ---- 2.E select().by(property) — by-modulated select ----
    "q_select_by" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer").has("mktsegment", "BUILDING").as("a")
        .out("placed").as("b")
        .selectBy("a" -> "name", "b" -> "totalprice")
    }),
    // ---- 2.K partitioned-supernode aggregation: salted two-phase degree ----
    "q_salted_degree" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.olap.GraphOps.saltedAggregate(
        g.edges.filter(col("label") === "contains"), col("dst"), salts = 16,
        partialAggs = Seq(count(lit(1)).as("__c")),
        mergeAggs = Seq(sum(col("__c")).as("cnt")))
        .select(uidOf(col("__key"), TpchGraph.PartTag).as("uid"), col("cnt"))
    }),
    // ---- 2.C properties() result shape (vertex properties as relations) ----
    "q_properties" -> ((s, dir) => {
      val g = graph(s, dir)
      val frontier = g.V().hasLabel("customer").dataframe.select(col("id").as("vid"))
      VertexCentricQuery(g).onFrontier(frontier).properties("name", "mktsegment")
        .select(uidOf(col("vid"), TpchGraph.CustomerTag).as("uid"), col("key"), col("value"))
    }),
    // ---- semi-structured props: JSON extraction over the change table ----
    "q_events_props" -> ((s, dir) => {
      readEvents(s, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
    }),
    // ---- 2.G/2.H interval join: point-in-range via bucketed equi-join ----
    "q_interval_join" -> ((s, dir) => {
      val ev = readEvents(s, dir).select(col("event_id"), col("ts"))
      val base = unix_micros(to_timestamp(lit("2024-01-01 00:00:00")))
      val hour = 3600L * 1000000L
      val ranges = s.range(50).select(col("id").as("window_id"),
        timestamp_micros((base + col("id") * lit(14L * hour)).cast("long")).as("wstart"),
        timestamp_micros((base + col("id") * lit(14L * hour) + lit(2L * hour)).cast("long")).as("wend"))
      graft.operators.IntervalJoin.join(ev, ranges, "ts", "wstart", "wend",
        widthMicros = 2L * hour)
        .select(col("event_id"), col("window_id"))
    }),
    // ---- 2.G/2.J as-of join: most recent strictly-prior event per key ----
    "q_asof" -> ((s, dir) => {
      val ev = readEvents(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.operators.AsOfJoin.join(purchases, clicks, "user_id", "ts", "event_id",
        carry = Seq("event_id"))
        .select(col("event_id"), col("event_id_asof").as("click_id"))
    }),
    // ---- 2.J/2.G sessionization (gap-based, lag+running-sum windows) ----
    "q_sessionize" -> ((s, dir) => {
      graft.stream.ChangeStream.sessionStats(readEvents(s, dir), gapSeconds = 3600)
    }),
    // ---- 2.J native change-stream source end-to-end: sessionizeStream over
    //      ChangeStream.readStream itself (NOT a probe-local temp stream), so
    //      the CDC front door's event-time clock is oracle-covered — this is
    //      exactly where the round-7 µs-vs-ns 1000x bug lived undetected.
    //      Single file → single AvailableNow micro-batch; emitted rows are the
    //      closed sessions (every session but each user's open head), which
    //      the oracle re-derives in SQL with a QUALIFY on the last session ----
    "q_change_sessionize" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-csess")
      val stream = graft.stream.ChangeStream.readStream(s, dir)
      val qname = s"graft_csess_${System.nanoTime()}"
      val sessions = graft.stream.ChangeStream.sessionizeStream(stream, gapSeconds = 3600)
      // the memory sink registers in the catalog of the session the stream
      // was BUILT on (the caller's for µs drops, the ns clone for NANOS
      // drops) — resolve the table there, not on `s`
      val sinkSession = sessions.sparkSession
      val q = sessions
        .writeStream.format("memory").queryName(qname).outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitStreamProbe(q, "q_change_sessionize")
      // materialized sink rows survive dropping the catalog name (the Dataset
      // pins the memory-sink plan), so the probe leaves no temp view or
      // checkpoint files behind
      val out = sinkSession.table(qname)
      sinkSession.catalog.dropTempView(qname)
      deleteRecursively(tmp)
      out
    }),
    // ---- 2.J CDC→graph materialization end-to-end: the change stream
    //      applies per-micro-batch mutations to the property graph through
    //      applyMutations (the reference's downstream ChangeProcessor
    //      mutating derived state) — non-error events become event-vertices
    //      wired to their user; REMOVED (error) changes delete ----
    "q_stream_mutations" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-cmut")
      val t = 1L << graft.core.GraphIds.TagBits
      val changes = graft.stream.ChangeStream.withChange(
        graft.stream.ChangeStream.readStream(s, dir))
      val m = try {
        graft.stream.ChangeStream.materializeGraph(changes, s"$tmp/ckpt", graph(s, dir)) { batch =>
          val added = batch.filter(col("change") === "ADDED")
          graft.stream.ChangeStream.Mutations(
            addVertices = Some(added.select((lit(8L * t) + col("event_id")).as("id"),
              lit("event").as("label"), col("event_id").as("uid"), col("event_type"))),
            // REMOVED events delete their own (never-added) id — a no-op, but
            // it drives the delete path through the stream deterministically
            deleteVertexIds = Some(batch.filter(col("change") === "REMOVED")
              .select((lit(8L * t) + col("event_id")).as("id"))),
            addEdges = Some(added.select((lit(9L * t) + col("event_id")).as("id"),
              (lit(8L * t) + col("event_id")).as("src"),
              (lit(TpchGraph.CustomerTag.toLong * t) + col("user_id")).as("dst"),
              lit("by_user").as("label"))))
        }
      } finally {
        deleteRecursively(tmp)
      }
      m.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .select(lit("v").as("kind"), col("label"), col("cnt"))
        .unionAll(m.edges.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
          .select(lit("e").as("kind"), col("label"), col("cnt")))
    }),
    // ---- 2.J/2.K STREAMING incremental connected components — the CDC
    //      edge feed folds into the labeling per micro-batch; final state
    //      is oracle-identical to batch CC of the accumulated edges ----
    "q_stream_components" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val changes = graft.stream.ChangeStream.withChange(
        graft.stream.ChangeStream.readStream(s, dir))
      val edges = changes.filter(col("change") === "ADDED")
        .select((lit(8L * t) + col("event_id")).as("src"),
          (lit(TpchGraph.CustomerTag.toLong * t) + col("user_id")).as("dst"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sicc")
      try graft.stream.ChangeStream.incrementalComponents(edges, s"$tmp/ckpt")
      finally deleteRecursively(tmp)
    }),
    // ---- 2.A/2.L catalog persistence: save writes schema.json next to the
    //      frames; a LOAD WITH NO CALLER SCHEMA must recover every
    //      definition (TTL, static, multiplicity, sort keys, indexes) —
    //      the reference keeps schema vertices inside the store ----
    // ---- 2.L Graph.Variables (TinkerPop graph.variables(); the reference
    //      backs them with its system configuration store) — set semantics
    //      overwrite, remove deletes; they persist with the catalog and
    //      survive a save/load round-trip ----
    "q_graph_variables" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-vars")
      val v = Seq((1L, "thing")).toDF("id", "label")
      val e = v.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label"))
      val schema = graft.core.GraphSchema()
        .withVariable("creator", "graft")
        .withVariable("version", "0.9")
        .withVariable("tmpnote", "drop me")
        .withVariable("version", "1.0") // set overwrites
        .removeVariable("tmpnote")      // remove deletes
      graft.data.GraphIO.save(graft.data.PropertyGraph(schema, v, e), s"$tmp/g", buckets = 1)
      val back = graft.data.GraphIO.load(s, s"$tmp/g")
      val out = back.variables.toSeq.sortBy(_._1).toDF("vkey", "vval")
      // variables are already driver-materialized — the store can go now
      deleteRecursively(tmp)
      out
    }),
    "q_catalog_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-cat-p")
      val g0 = graph(s, dir)
      val rich = g0.copy(schema = g0.schema.copy(vertexLabels =
        g0.schema.vertexLabels + ("region" ->
          graft.core.VertexLabelDef("region", static = true, ttlSeconds = Some(604800L)))))
      graft.data.GraphIO.save(rich, s"$tmp/g", buckets = 4)
      val back = graft.data.GraphIO.load(s, s"$tmp/g")
      val sch = back.schema
      val rows =
        sch.edgeLabels.values.toSeq.sortBy(_.name).map(l => ("edge_label", l.name,
          l.multiplicity.toString + ":" + l.sortKey.mkString(","))) ++
        sch.vertexLabels.values.toSeq.sortBy(_.name).map(l => ("vertex_label", l.name,
          s"static=${l.static},ttl=${l.ttlSeconds.getOrElse(0L)}")) ++
        sch.relationIndexes.values.toSeq.sortBy(_.name).map(r => ("relation_index", r.name,
          r.edgeLabel + ":" + r.sortKey.mkString(","))) ++
        sch.indexes.values.toSeq.sortBy(_.name).map(i => ("index", i.name,
          i.keys.mkString(",")))
      val res = rows.toDF("kind", "name", "detail")
        .unionAll(Seq(
          ("stat", "vertices", back.vertices.count().toString),
          ("stat", "edges", back.edges.count().toString)).toDF("kind", "name", "detail"))
        .localCheckpoint(true) // materialize before the saved files vanish
      deleteRecursively(tmp)
      res
    }),
    // ---- 2.L DefaultSchemaMaker: undeclared-type ingest auto-creates the
    //      catalog (Tp3DefaultSchemaMaker parity). The probe ingests raw
    //      tables against an EMPTY schema, emits the synthesized catalog
    //      (oracle re-derives it from DuckDB's DESCRIBE of the same parquet,
    //      so type-inference drift fails the compare), proves the completed
    //      catalog passes strict mode + structural conformance, and runs a
    //      query through the auto-schema'd graph ----
    "q_auto_schema" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val vertices = c.select(col("c_custkey").as("id"), lit("customer").as("label"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      val o = s.read.parquet(s"$dir/orders.parquet")
      val edges = o.select(col("o_orderkey").as("id"), col("o_custkey").as("src"),
        col("o_orderkey").as("dst"), lit("placed").as("label"), col("o_totalprice"))
      val schema = graft.mgmt.DefaultSchemaMaker.complete(
        graft.core.GraphSchema(), vertices, edges)
      // the completed catalog must satisfy strict mode (nothing left undeclared)
      graft.mgmt.DefaultSchemaMaker.require(schema, vertices, edges)
      val g = graft.data.PropertyGraph(schema, vertices, edges)
      val violations = g.schemaViolations().size
      val cnt = g.V().has("c_mktsegment", "BUILDING").count()
      val rows =
        schema.propertyKeys.values.toSeq.map(pk => ("property", pk.name, pk.columnType.simpleString)) ++
        schema.vertexLabels.keys.toSeq.map(l => ("vertex_label", l, "-")) ++
        schema.edgeLabels.keys.toSeq.map(l => ("edge_label", l, "-")) ++
        Seq(("stat", "building_customers", cnt.toString),
          ("stat", "violations", violations.toString))
      import s.implicits._
      rows.toDF("kind", "name", "dtype")
    }),
    // ---- 2.L DefaultSchemaMaker wired into the WRITE path: a mutation batch
    //      carrying an undeclared property key against schema.default=default
    //      (the conf's default) auto-creates the key INSIDE applyMutations —
    //      Titan creates types transparently inside the write transaction
    //      (StandardTitanTx getOrCreate paths). The probe proves the key was
    //      absent before the write, present after, and queryable; strict mode
    //      (`none` rejects the same batch) is the MutationEnforcementSpec twin ----
    "q_schema_maker_write" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val vertices = c.select(col("c_custkey").as("id"), lit("customer").as("label"),
        col("c_name"), col("c_acctbal"))
      val edges = vertices.limit(0).select(col("id"), col("id").as("src"),
        col("id").as("dst"), col("label"))
      val g = graft.data.PropertyGraph(
        graft.mgmt.DefaultSchemaMaker.complete(graft.core.GraphSchema(), vertices, edges),
        vertices, edges)
      assert(!g.schema.propertyKeys.contains("vip"), "probe precondition: 'vip' undeclared")
      val adds = c.filter(col("c_acctbal") > 9000)
        .select((col("c_custkey") + lit(1000000L)).as("id"), lit("customer").as("label"),
          col("c_name"), col("c_acctbal"), (col("c_acctbal") > 9500).as("vip"))
      val g2 = graft.data.GraphIO.applyMutations(g, addVertices = Some(adds))
      val vipKey = g2.schema.propertyKeys("vip") // throws if the maker didn't fire
      val vipTrue = g2.V().has("vip", true).count()
      val total = g2.vertices.count()
      import s.implicits._
      Seq(
        ("key", "vip", vipKey.columnType.simpleString),
        ("stat", "vip_true", vipTrue.toString),
        ("stat", "vertices", total.toString))
        .toDF("kind", "name", "dtype")
    }),
    // ---- 2.E/2.H tail — last n under the traversal's order ----
    "q_tail" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("order")
        .order("totalprice", asc = false).tail(5)
        .values("uid", "totalprice")
    }),
    // ---- 2.A vertex lookup by id(s) (StandardTitanTx.getVertices) ----
    "q_vertex_by_id" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      graph(s, dir).vertexById(
        TpchGraph.CustomerTag * t + 1L, TpchGraph.SupplierTag * t + 1L,
        TpchGraph.PartTag * t + 10L)
        .select(col("uid"), col("label"))
    }),
    // ---- 2.A edge lookup by RelationIdentifier (composite edge id) ----
    "q_relation_lookup" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val rid = graft.data.RelationIdentifier(
        1L * t + 5L, // in_region edge tag = 1, local id = n_nationkey 5
        TpchGraph.NationTag * t + 5L, "in_region", None)
      graft.data.RelationIdentifier.lookup(graph(s, dir), rid)
        .select(uidOf(col("src"), TpchGraph.NationTag).as("n_uid"),
          uidOf(col("dst"), TpchGraph.RegionTag).as("r_uid"), col("label"))
    }),
    // ---- 2.B composite-index exact lookup (vertex element) ----
    "q_index_lookup" -> ((s, dir) => {
      val g = graph(s, dir)
      val ixDf = graft.index.Indexes.materialize(g, g.schema.indexes("byName"))
      graft.index.Indexes.lookup(g, ixDf, Map("name" -> "NATION_5"))
        .select(col("uid"), col("label"), col("name"))
    }),
    // ---- 2.D unidirected edge label: adjacency exists ONLY from the
    //      out-vertex (advschema.txt:96-103) — with `placed` marked
    //      unidirected, customer.out sees every order but order.in sees none ----
    "q_unidirected" -> ((s, dir) => {
      val g0 = graph(s, dir)
      val g = g0.copy(schema = g0.schema.copy(edgeLabels = g0.schema.edgeLabels +
        ("placed" -> graft.core.EdgeLabelDef("placed", unidirected = true))))
      val t = g.traversal
      val out = t.V().hasLabel("customer").out("placed").toDF
        .agg(count(lit(1)).as("cnt")).select(lit("out").as("dir"), col("cnt"))
      val in = t.V().hasLabel("order").in("placed").toDF
        .agg(count(lit(1)).as("cnt")).select(lit("in").as("dir"), col("cnt"))
      out.unionAll(in)
    }),
    // ---- 2.K index repair: mutate the graph, REINDEX from current state,
    //      then serve lookups from the rebuilt table — it must see both the
    //      newly added vertex and the pre-existing rows ----
    "q_reindex" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val g = graph(s, dir)
      val add = s.range(1).select(lit(TpchGraph.PartTag * t + 999999L).as("id"),
        lit("part").as("label"), lit(999999L).as("uid"),
        lit("REINDEXED_PART").as("name"))
      val m = graft.data.GraphIO.applyMutations(g, addVertices = Some(add))
      val tmp = java.nio.file.Files.createTempDirectory("graft-reindex").toString
      graft.olap.GraphOps.reindex(m, g.schema.indexes("byName"), tmp)
      val ixDf = s.read.parquet(tmp)
      graft.index.Indexes.lookup(m, ixDf, Map("name" -> "REINDEXED_PART"))
        .select(col("uid"), col("label"), col("name"))
        .unionAll(graft.index.Indexes.lookup(m, ixDf, Map("name" -> "NATION_5"))
          .select(col("uid"), col("label"), col("name")))
    }),
    // ---- 2.B AUTOMATIC index selection: no manual index call — the planner
    //      consults the catalog and picks the backed byName index ----
    "q_index_auto" -> ((s, dir) => {
      graph(s, dir).V().has("name", "NATION_5").dataframe
        .select(col("uid"), col("label"), col("name"))
    }),
    // ---- 2.L rename types end-to-end: the catalog cascade + frame-column
    //      rename move together (GraphOps.renameProperty) and the composite
    //      index re-derives under the NEW key name, so the renamed query
    //      still takes the index path ----
    "q_rename_key" -> ((s, dir) => {
      val g = graft.olap.GraphOps.renameProperty(graph(s, dir), "name", "title")
      g.V().has("title", "NATION_5").dataframe
        .select(col("uid"), col("label"), col("title"))
    }),
    // ---- 2.B force-index strict mode (query.force-index): the same query
    //      under forceIndex() must take the index path AND return identical
    //      rows; the rejection path (no usable index → throw) is spec-tested
    //      in ExtensionsSpec ----
    "q_force_index" -> ((s, dir) => {
      graph(s, dir).V().forceIndex().has("name", "NATION_5").dataframe
        .select(col("uid"), col("label"), col("name"))
    }),
    // ---- 2.B AUTOMATIC selection of a LABEL-SCOPED composite index: the
    //      index table holds only customer rows (onlyLabel), and the query's
    //      hasLabel("customer") constraint proves the scope covers it — the
    //      planner takes the index semi-join path (PlanShapeSpec asserts it);
    //      residual filters keep results identical to the scan ----
    "q_index_auto_scoped" -> ((s, dir) => {
      val g0 = graph(s, dir)
      val ix = graft.core.IndexDef("custBySegment", graft.core.ElementCategory.VERTEX,
        Seq("mktsegment"), onlyLabel = Some("customer"))
      val g = g0.copy(schema = g0.schema.copy(indexes = g0.schema.indexes + (ix.name -> ix)))
        .withIndexTable(ix.name, graft.index.Indexes.materialize(g0, ix))
      g.V().hasLabel("customer").has("mktsegment", "BUILDING").dataframe
        .select(col("uid"), col("name"))
    }),
    // ---- 2.B AUTOMATIC mixed-index selection: a plain has(textContains)
    //      routes through the backed inverted token table (the reference's
    //      planner considers mixed indexes too); residual re-verification
    //      keeps results identical to the full scan ----
    "q_index_auto_text" -> ((s, dir) => {
      val g0 = graph(s, dir)
      val ix = graft.core.IndexDef("nameTextAuto", graft.core.ElementCategory.VERTEX,
        Seq("name"), composite = false,
        mappings = Map("name" -> graft.core.Mapping.TEXT))
      val g = g0.copy(schema = g0.schema.copy(indexes = g0.schema.indexes + (ix.name -> ix)))
        .withIndexTable(ix.name, graft.index.Indexes.materializeMixed(g0, ix))
      g.V().has("name", P.textContains("widget")).dataframe
        .filter(col("label") === "part")
        .select(col("uid"), col("name"))
    }),
    // ---- 2.B composite-index lookup, EDGE element category ----
    "q_index_lookup_edge" -> ((s, dir) => {
      val g = graph(s, dir)
      val ix = graft.core.IndexDef("edgeByFlag", graft.core.ElementCategory.EDGE,
        Seq("returnflag"), onlyLabel = Some("contains"))
      val ixDf = graft.index.Indexes.materialize(g, ix)
      graft.index.Indexes.lookup(g, ixDf, Map("returnflag" -> "R"),
        element = graft.core.ElementCategory.EDGE)
        .select(uidOf(col("src"), TpchGraph.OrderTag).as("o_uid"),
          uidOf(col("dst"), TpchGraph.PartTag).as("p_uid"),
          col("quantity"), col("linenumber"))
    }),
    // ---- 2.A mutation sink: delete-with-cascade + add, snapshot merge ----
    "q_mutations" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val g = graph(s, dir)
      val del = s.range(1).select(lit(TpchGraph.CustomerTag * t + 1L).as("id"))
      val add = s.range(1).select(lit(TpchGraph.PartTag * t + 999999L).as("id"),
        lit("part").as("label"), lit(999999L).as("uid"))
      val m = graft.data.GraphIO.applyMutations(g,
        addVertices = Some(add), deleteVertexIds = Some(del))
      m.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .select(lit("v").as("kind"), col("label"), col("cnt"))
        .unionAll(m.edges.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
          .select(lit("e").as("kind"), col("label"), col("cnt")))
    }),
    // ---- 2.L mutation-time static-label enforcement: a LEGAL batch against
    //      a schema with a static label passes the eager checks (creating a
    //      NEW static-label vertex is allowed — static = immutable after
    //      creation); rejection paths are spec-tested (StreamMgmtSpec) ----
    "q_mutations_static" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val g0 = graph(s, dir)
      val g = g0.copy(schema = g0.schema.copy(vertexLabels = g0.schema.vertexLabels +
        ("region" -> graft.core.VertexLabelDef("region", static = true))))
      val add = s.range(1).select(lit(TpchGraph.RegionTag * t + 99L).as("id"),
        lit("region").as("label"), lit(99L).as("uid"), lit("NEWREGION").as("name"))
      val del = s.range(1).select(lit(TpchGraph.CustomerTag * t + 2L).as("id"))
      val m = graft.data.GraphIO.applyMutations(g,
        addVertices = Some(add), deleteVertexIds = Some(del))
      m.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.E drop() step (TinkerPop DropStep → the transaction delete
    //      path): remove the BUILDING customers; incident placed/in_nation
    //      edges cascade with the adjacency row ----
    "q_drop_step" -> ((s, dir) => {
      val m = graph(s, dir).traversal.V()
        .hasLabel("customer").has("mktsegment", "BUILDING").drop().graph
      m.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .select(lit("v").as("kind"), col("label"), col("cnt"))
        .unionAll(m.edges.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
          .select(lit("e").as("kind"), col("label"), col("cnt")))
    }),
    // ---- 2.E mergeV/mergeE (TinkerPop 3.6 upsert steps, beyond the
    //      reference's surface): match-or-create with idempotent replay ----
    "q_merge_vertices" -> ((s, dir) => {
      import s.implicits._
      val g = graph(s, dir)
      val upd = g.vertices
        .filter(col("label") === "customer" && col("mktsegment") === "BUILDING")
        .select(col("name"), lit("MERGED").as("mktsegment"))
      val fresh = (1 to 5).map(i => (s"NEWCUST_$i", "FRESH")).toDF("name", "mktsegment")
      val m = g.traversal.mergeV("customer", upd.unionByName(fresh), Seq("name")).graph
      m.vertices.filter(col("label") === "customer")
        .groupBy(col("mktsegment")).agg(count(lit(1)).as("cnt"))
    }),
    "q_merge_edges" -> ((s, dir) => {
      val g = graph(s, dir)
      // pass 1: every nation→region pair CREATES under a fresh label (the
      // first-use schema maker declares it); pass 2 UPDATES those pairs and
      // creates region self-loops — both merge paths in one probe, no
      // declared-endpoint or multiplicity conflicts with loader labels
      val nr = g.edges.filter(col("label") === "in_region")
        .select(col("src"), col("dst"), lit(2L).as("w"))
      val m1 = g.traversal.mergeE("colisted", nr).graph
      val upd = nr.select(col("src"), col("dst"), lit(9L).as("w"))
      val self = m1.vertices.filter(col("label") === "region")
        .select(col("id").as("src"), col("id").as("dst"), lit(5L).as("w"))
      val m2 = m1.traversal.mergeE("colisted", upd.unionByName(self)).graph
      m2.edges.filter(col("label") === "colisted")
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.E addV step (TinkerPop AddVertexStep): one 'segment' vertex per
    //      distinct market segment, deterministic reserved-tag ids; the new
    //      vertex label auto-creates through the first-use schema maker ----
    "q_add_vertex" -> ((s, dir) => {
      val g = graph(s, dir)
      val segs = g.vertices.filter(col("label") === "customer")
        .select(col("mktsegment").as("name")).distinct()
        .withColumn("uid", xxhash64(col("name")))
      val m = g.traversal.addV("segment", segs).graph
      m.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.E addE step (TinkerPop AddEdgeStep): materialize the reverse of
    //      'placed' as placed_by; the undeclared edge label auto-creates
    //      through the first-use schema maker inside applyMutations ----
    "q_add_edge" -> ((s, dir) => {
      val m = graph(s, dir).traversal.V().hasLabel("customer").as("c")
        .out("placed").addE("placed_by", "c").graph
      m.edges.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.E mutation steps CONTINUE the traversal (TinkerPop AddEdgeStep
    //      emits the created edge): addE(...).inV().values(...) keeps
    //      traversing from the created edges without re-anchoring ----
    "q_add_edge_chain" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer").as("c")
        .out("placed").addE("placed_by", "c")
        .inV() // created edge points order -> customer; dst = the customer
        .toDF.groupBy(col("mktsegment").as("segment")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.E property() step (TinkerPop AddPropertyStep): tag the BUILDING
    //      customers with an UNDECLARED key — the first-use schema maker
    //      creates it inside the upsert; untouched rows read back null ----
    "q_property_step" -> ((s, dir) => {
      val m = graph(s, dir).traversal.V()
        .hasLabel("customer").has("mktsegment", "BUILDING")
        .property("tier", lit("vip")).graph
      m.vertices.filter(col("label") === "customer")
        .groupBy(coalesce(col("tier"), lit("none")).as("tier"))
        .agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.L catalog-TTL auto-read: the label declares a TTL, ingest
    //      provenance is `_ts`, and a PLAIN V() scan hides expired elements
    //      (no explicit filter anywhere in the query) ----
    "q_ttl_catalog" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val v = readEvents(s, dir).select((lit(7L * t) + col("event_id")).as("id"),
        lit("event").as("label"), col("event_id").as("uid"),
        col("event_type"), col("ts").as("_ts"))
      val schema = graft.core.GraphSchema(
        vertexLabels = Map("event" -> graft.core.VertexLabelDef("event",
          ttlSeconds = Some(7L * 24 * 3600))),
        ttlReadTime = Some(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-31T00:00:00Z"))))
      val g = graft.data.PropertyGraph(schema, v,
        v.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      g.V().dataframe.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.L catalog-TTL on EDGE labels: the edge label declares the TTL
    //      (docs/advschema.txt:20-40 — edge TTL is the reference's headline
    //      TTL case), and a plain E() scan hides expired edges ----
    "q_ttl_edges" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val ev = readEvents(s, dir)
      val e = ev.select((lit(9L * t) + col("event_id")).as("id"),
        (lit(TpchGraph.CustomerTag.toLong * t) + col("user_id")).as("src"),
        (lit(7L * t) + col("event_id")).as("dst"),
        lit("did").as("label"), col("event_type"), col("ts").as("_ts"))
      val v = ev.select((lit(7L * t) + col("event_id")).as("id"),
        lit("event").as("label"), col("event_id").as("uid"))
      val schema = graft.core.GraphSchema(
        edgeLabels = Map("did" -> graft.core.EdgeLabelDef("did",
          ttlSeconds = Some(7L * 24 * 3600))),
        ttlReadTime = Some(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-31T00:00:00Z"))))
      val g = graft.data.PropertyGraph(schema, v, e)
      g.traversal.E().toDF.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.L property-KEY TTL (docs/advschema.txt:41-55): the key declares
    //      the TTL, so the VALUE expires while the element survives — the
    //      scan nulls event_type on expired-provenance rows, total row count
    //      unchanged (the NULL group absorbs the expired values) ----
    "q_ttl_property" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val v = readEvents(s, dir).select((lit(7L * t) + col("event_id")).as("id"),
        lit("event").as("label"), col("event_id").as("uid"),
        col("event_type"), col("ts").as("_ts"))
      val schema = graft.core.GraphSchema(
        vertexLabels = Map("event" -> graft.core.VertexLabelDef("event")),
        propertyKeys = Map("event_type" -> graft.core.PropertyKeyDef(
          "event_type", StringType, ttlSeconds = Some(7L * 24 * 3600))),
        ttlReadTime = Some(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-31T00:00:00Z"))))
      val g = graft.data.PropertyGraph(schema, v,
        v.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      g.V().dataframe.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.L TTL read-time view over the event table ----
    "q_ttl" -> ((s, dir) => {
      graft.olap.GraphOps.ttlView(readEvents(s, dir), "ts", 7L * 24 * 3600,
        now = to_timestamp(lit("2024-01-31 00:00:00")))
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.L ConsistencyModifier.FORK — updating a FORK-label edge deletes
    //      the old edge and writes a NEW id (CacheEdge.java:75-85); DEFAULT
    //      labels update in place. `forked` counts post-update ids above the
    //      pre-update max; the oracle mirrors it as the update-batch size ----
    "q_fork_update" -> ((s, dir) => {
      val g0 = graph(s, dir)
      val g = g0.copy(schema = g0.schema.copy(edgeLabels = g0.schema.edgeLabels +
        ("contains" -> graft.core.EdgeLabelDef("contains",
          consistency = graft.core.ConsistencyModifier.FORK))))
      val maxBefore = g.edges.agg(max(col("id")).as("__premax"))
      val updFork = g.edges.filter(col("label") === "contains" &&
          col("linenumber") === 1 && col("quantity") >= 45.0)
        .withColumn("quantity", col("quantity") + 1.0)
      val updInPlace = g.edges.filter(col("label") === "supplied_by" &&
          col("shipdate") < lit(d("1992-06-01")))
        .withColumn("linenumber", col("linenumber") + 10)
      val m = graft.data.GraphIO.updateEdges(g, updFork.unionByName(updInPlace))
      m.edges.crossJoin(broadcast(maxBefore))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("quantity")).as("qty_sum"),
          sum(col("linenumber").cast(LongType)).as("ln_sum"),
          count(when(col("id") > col("__premax"), 1)).as("forked"))
    }),
    // ---- pipeline: Bloom-filter decontamination sheet — 496-bit filter
    //      (8 x 62-bit words) over the eval texts, train corpus probed;
    //      (no false negatives; the FP row prices the sizing) ----
    "q_bloom_contamination" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.functions.Sketches.bloomContamination(
        docs, docs.filter(pmod(col("doc_id"), lit(7L)) === 0L),
        words = 8, k = 3)
    }),
    // ---- pipeline: HyperLogLog distinct-count accuracy sheet — md5-fold
    //      registers, EXACT integer harmonic sum, estimate beside the true
    //      distinct count (the cross-engine-reproducible HLL) ----
    "q_hll_distinct" -> ((s, dir) => {
      graft.functions.Sketches.hllReport(
        s.read.parquet(s"$dir/lineitem.parquet"), "l_partkey")
    }),
    // ---- 2.A Z-order clustering key — Morton-interleave (totalprice,
    //      orderkey) so a range-sorted layout prunes on BOTH columns ----
    "q_zorder_key" -> ((s, dir) => {
      graft.functions.ZOrder.withZKey(
        s.read.parquet(s"$dir/orders.parquet"), Seq("o_totalprice", "o_orderkey"))
        .select(col("o_orderkey"), col("zkey"))
    }),
    // ---- 2.A snapshot diff — reconcile two graph versions: added zone
    //      vertices, removed suppliers/in_region edges, property-changed
    //      customers/placed edges; unchanged elements emit nothing ----
    "q_graph_diff" -> ((s, dir) => {
      val g = graph(s, dir)
      val t = 1L << graft.core.GraphIds.TagBits
      val v1 = g.vertices.filter(!(col("label") === "supplier" &&
        pmod(col("uid"), lit(10L)) === 0))
      val v2 = v1.withColumn("acctbal",
        when(col("label") === "customer" && pmod(col("uid"), lit(7L)) === 0,
          col("acctbal") + 1.0).otherwise(col("acctbal")))
      val zones = g.vertices.filter(col("label") === "region")
        .withColumn("id", col("id") + lit(8L * t))
        .withColumn("label", lit("zone"))
      val e1 = g.edges.filter(!(col("label") === "in_region" &&
        pmod(col("id"), lit(5L)) === 0))
      val e2 = e1.withColumn("orderdate",
        when(col("label") === "placed" && pmod(col("dst"), lit(11L)) === 0,
          date_add(col("orderdate"), 1)).otherwise(col("orderdate")))
      graft.data.GraphIO.diff(g,
        g.copy(vertices = v2.unionByName(zones), edges = e2))
    }),
    // ---- 2.L TTL compaction — physically reclaim expired elements; the RAW
    //      post-compaction frame (no read-time filter anywhere) proves the
    //      rows are gone from storage, not just hidden ----
    "q_ttl_compact" -> ((s, dir) => {
      val t = 1L << graft.core.GraphIds.TagBits
      val v = readEvents(s, dir).select((lit(7L * t) + col("event_id")).as("id"),
        lit("event").as("label"), col("event_id").as("uid"),
        col("event_type"), col("ts").as("_ts"))
      val schema = graft.core.GraphSchema(
        vertexLabels = Map("event" -> graft.core.VertexLabelDef("event",
          ttlSeconds = Some(7L * 24 * 3600))),
        ttlReadTime = Some(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-31T00:00:00Z"))))
      val g = graft.data.PropertyGraph(schema, v,
        v.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      graft.data.GraphIO.compactExpired(g).vertices
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    }),
    // ---- 2.E elementMap — id + label + requested keys per element ----
    "q_elementmap" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("nation").elementMap("name", "uid")
    }),
    // ---- 2.H skip(n) — order + Offset without an upper limit ----
    "q_skip" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .order("acctbal", asc = false).skip(100)
        .values("uid", "acctbal")
    }),
    // ---- 2.E repeat().emit().until() — emit each round, exit on predicate:
    //      nations surface at depth 1 and leave the loop; depth 2 is empty.
    //      (Plain emit(2) would also surface customers+suppliers — the oracle
    //      pins the difference.) ----
    "q_repeat_emit_until" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("region")
        .repeatEmitUntil(col("label") === "nation", 2)(_.in())
        .values("uid", "label")
    }),
    // ---- 2.E path().by(key) — path elements rendered by a property.
    //      Probe rule: NO array-typed output columns (the driver's pandas
    //      canonicalizer cannot sort list cells) — join to one string here. ----
    "q_path_by" -> ((s, dir) => {
      graph(s, dir).traversal.withPath.V().hasLabel("region").in().pathBy("name")
        .select(concat_ws(">", col("path")).as("path"))
    }),
    // ---- 2.E coalesce — first step with results per source element ----
    "q_coalesce" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .coalesceSteps(
          _.out("placed").has("totalprice", P.gt(400000.0)),
          _.out("placed"))
        .values("uid", "totalprice")
    }),
    // ---- 2.E repeat().emit() — every intermediate frontier surfaces ----
    "q_repeat_emit" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("region")
        .repeatEmit(2)(_.in())
        .values("uid", "label")
    }),
    // ---- 2.E loops() — emitted frontiers carry the loop depth (source=0);
    //      regions/nations/customers+suppliers land at depths 0/1/2 ----
    "q_repeat_depth" -> ((s, dir) => {
      graft.data.TpchGraph.load(s, dir).traversal.V().hasLabel("region")
        .repeatEmitDepth(2)(_.in())
        .values("uid", "label", "_depth")
    }),
    // ---- 2.E emit(predicate).repeat(step) — filtered emit: only matching
    //      frontiers surface, but ALL traversers keep stepping (the source
    //      regions fail the filter; depth-1 nations and depth-2 suppliers
    //      pass; depth-2 customers are walked but not emitted) ----
    "q_repeat_emit_filter" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("region")
        .repeatEmitFilter(2, col("label").isin("nation", "supplier"))(_.in())
        .values("uid", "label")
    }),
    // ---- 2.E emit(subTraversal).repeat(step) — the emit test is itself a
    //      traversal: surface a traverser iff out('in_region') is non-empty
    //      there (true only on nations). Traverser multiplicity preserved:
    //      one nation row PER CUSTOMER that reached it ----
    "q_repeat_emit_sub" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .repeatEmitSub(2, _.out("in_region"))(_.out("in_nation", "in_region"))
        .values("uid", "label")
    }),
    // ---- 2.E project().by() — named value projection ----
    "q_project" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .project("uid" -> col("uid"), "seg" -> col("mktsegment"),
          "rich" -> (col("acctbal") > 5000.0))
    }),
    // ---- 2.E local(step.limit(n)) — per-source-element limit ----
    "q_local_topk" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .localLimit(2, Seq(col("totalprice").desc, col("id").asc))(_.out("placed"))
        .values("uid", "totalprice")
    }),
    // ---- 2.E sample(n) — deterministic hash-ordered sample ----
    "q_sample" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("part").sample(20).values("uid")
    }),
    // ---- 2.E coin(p) — deterministic Bernoulli filter ----
    "q_coin" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("order").coin(0.25).values("uid")
    }),
    // ---- 2.E repeat(step).until(predicate) ----
    "q_repeat_until" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("customer")
        .repeatUntil(col("label") === "region", 4)(_.out("in_nation", "in_region"))
        .values("uid", "label")
    }),
    // ---- 2.E cyclicPath — traversers that revisit an element ----
    "q_cyclic_path" -> ((s, dir) => {
      graph(s, dir).traversal.withPath.V().hasLabel("region")
        .both().both().cyclicPath()
        .values("uid", "label")
    }),
    // ---- 2.E tree — paths grouped under their root element ----
    "q_tree" -> ((s, dir) => {
      graph(s, dir).traversal.withPath.V().hasLabel("nation")
        .out("in_region")
        .tree()
        .select(col("root"), array_join(col("path"), ">").as("path"))
    }),
    // ---- 2.E fold — frontier collected into one sorted list ----
    "q_fold" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("region")
        .fold().select(array_join(col("ids"), ",").as("ids"))
    }),
    // ---- 2.E unfold — one traverser per sack-list element ----
    "q_unfold" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("part")
        .withSack(split(col("name"), " "))
        .unfold("_sack", "token")
    }),
    // ---- 2.E store/cap — in-traversal side-effect barrier (within/without) ----
    "q_store_cap" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("order").has("totalprice", P.gt(300000.0))
        .store("big")
        .in("placed").out("placed")
        .capWithout("big").dedup()
        .values("uid")
    }),
    // ---- 2.E local-scope terminals (count/order/limit/max over lists) ----
    "q_local_scope" -> ((s, dir) => {
      import graft.functions.Local
      graph(s, dir).traversal.V().hasLabel("customer").as("c").out("placed").toDF
        .groupBy(uidOf(col("_as_c_id"), TpchGraph.CustomerTag).as("c_uid"))
        .agg(collect_list(col("uid")).as("values"))
        .select(col("c_uid"),
          Local.count(col("values")).as("n_orders"),
          array_join(transform(Local.limit(Local.order(col("values")), 3),
            _.cast("string")), ",").as("first3"),
          Local.max(col("values")).as("max_uid"))
    }),
    // ---- 2.E inject — extra traversers added mid-traversal ----
    "q_inject" -> ((s, dir) => {
      val nid = TpchGraph.NationTag.toLong * (1L << graft.core.GraphIds.TagBits)
      graph(s, dir).traversal.V().hasLabel("region")
        .inject(nid + 1L, nid + 2L)
        .values("uid", "label")
    }),
    // ---- 2.E subgraph — induced subgraph from an edge predicate ----
    "q_subgraph" -> ((s, dir) => {
      val sg = graph(s, dir).subgraph(
        col("label") === "placed" && col("orderdate") < lit(d("1997-01-01")))
      sg.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .select(lit("v").as("kind"), col("label"), col("cnt"))
        .unionAll(sg.edges.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
          .select(lit("e").as("kind"), col("label"), col("cnt")))
    }),
    // ---- 2.E vertex-induced subgraph (SubgraphStrategy's vertex
    //      criterion): customers + orders keep only the placed edges ----
    "q_subgraph_vertices" -> ((s, dir) => {
      val sg = graph(s, dir).subgraphVertices(col("label").isin("customer", "order"))
      sg.vertices.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .select(lit("v").as("kind"), col("label"), col("cnt"))
        .unionAll(sg.edges.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
          .select(lit("e").as("kind"), col("label"), col("cnt")))
    }),
    // ---- 2.E sum()/mean() terminals (exact: integer column) ----
    "q_sum_terminal" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("part").sum("size")
    }),
    "q_mean_terminal" -> ((s, dir) => {
      graph(s, dir).traversal.V().hasLabel("part").mean("size")
    }),
    // ---- 2.E reference traversal-conformance block: the expected-count
    // corpus of TitanGraphTest.java testTinkerPopOptimizationStrategies
    // (~:3350-3460) + testSimpleTinkerPopTraversal (:3520), re-run through
    // this engine's traversal surface on the same deterministic fixture
    // (range() arithmetic — the DuckDB oracle rebuilds it verbatim).
    // Each probe row is one reference assertion: (caze, n[, ws]). ----
    "q_tp_vertexstep" -> ((s, dir) => {
      val g = tpFixture(s); val t = g.traversal
      def sv0 = t.V().hasId(1001L)
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"),
          coalesce(sum(col("weight")), lit(0L)).as("ws"))
          .select(lit(caze).as("caze"), col("n"), col("ws"))
      val wDesc = Seq(col("weight").desc, col("id").asc)
      val wAsc = Seq(col("weight").asc, col("id").asc)
      Seq(
        row("outE_has_w1", sv0.outE("knows").has("weight", 1L).toDF),
        row("outE", sv0.outE("knows").toDF),
        row("out", sv0.out("knows").toDF),
        row("local_limit10", sv0.localLimit(10, Seq(col("id").asc))(_.outE("knows")).toDF),
        row("local_range_10_20", sv0.localRange(10, 20, Seq(col("id").asc))(_.outE("knows")).toDF),
        row("local_order_limit10", sv0.localLimit(10, wDesc)(_.outE("knows")).toDF),
        row("has_w1_order", sv0.outE("knows").has("weight", 1L).order("weight").toDF),
        row("local_has_w1_order_limit10",
          sv0.localLimit(10, wAsc)(_.outE("knows").has("weight", 1L)).toDF),
        row("local_has_has_range_10_15",
          sv0.localRange(10, 15, wAsc)(
            _.outE("knows").has("weight", 1L).has("weight", 1L)).toDF),
      ).reduce(_ unionAll _)
    }),
    "q_tp_filter_is" -> ((s, dir) => {
      val g = tpFixture(s); val t = g.traversal
      def sv0 = t.V().hasId(1001L)
      val v50 = 51L
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        row("outE_filter_inV_is", sv0.outE("knows")
          .whereSub(_.inV().filterWhere(col("id") === v50)).toDF),
        row("outE_filter_otherV_is", sv0.outE("knows")
          .whereSub(_.otherV().filterWhere(col("id") === v50)).toDF),
        row("bothE_filter_otherV_is", sv0.bothE("knows")
          .whereSub(_.otherV().filterWhere(col("id") === v50)).toDF),
        row("bothE_filter_inV_is", sv0.bothE("knows")
          .whereSub(_.inV().filterWhere(col("id") === v50)).toDF),
        row("v50_bothE_otherV_super", t.V().hasId(v50).bothE("knows")
          .whereSub(_.otherV().filterWhere(col("id") === 1001L)).toDF),
      ).reduce(_ unionAll _)
    }),
    "q_tp_properties" -> ((s, dir) => {
      import graft.data.MultiProperties
      // LIST-cardinality 'names' with a weight META-property per cell —
      // the reference's TitanPropertiesStep cases (has on meta, local
      // order().by(meta).limit, super-fan values())
      val cellsRel = s.range(1000).select(
        expr("CAST(id DIV 100 + 1001 AS BIGINT)").as("vid"),
        concat(lit("n"), (col("id") % 100).cast("string")).as("value"),
        (col("id") % 100 % 5).cast("string").as("w"))
      val mp = MultiProperties.collect(
        cellsRel.select(col("vid"),
          MultiProperties.cell(col("value"), "weight" -> col("w")).as("c")),
        col("vid"), col("c"))
      val ex = MultiProperties.explodeCells(mp, "cells")
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"),
          coalesce(sum(when(col("meta").getItem("weight") === "4", 1L)
            .otherwise(0L)), lit(0L)).as("nw4"))
          .select(lit(caze).as("caze"), col("n"), col("nw4"))
      val sv0 = ex.filter(col("id") === 1001L)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
        .orderBy(col("meta").getItem("weight").desc, col("value").asc)
      Seq(
        row("props_all", sv0),
        row("props_meta_w1", MultiProperties.explodeCells(
          mp.withColumn("cells",
            MultiProperties.cellsWithMeta(col("cells"), "weight", "1")), "cells")
          .filter(col("id") === 1001L)),
        row("props_local_order_limit10", sv0
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 10)),
        row("supers_values_names", ex),
      ).reduce(_ unionAll _)
    }),
    "q_tp_graphstep" -> ((s, dir) => {
      val g = tpFixture(s); val t = g.traversal
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        row("has_id20", t.V().has("pid", 20L).toDF),
        row("has_id20_w0", t.V().has("pid", 20L).has("weight", 0L).toDF),
        row("has_w1", t.V().has("weight", 1L).toDF),
        row("has_w1_range_0_10", t.V().has("weight", 1L).range(0, 10).toDF),
        row("has_sid", t.V().has("pid", -1L).toDF),
        row("has_id20_as", t.V().has("pid", 20L).as("x").toDF),
        row("sid_outE_w1", t.V().has("pid", -1L).outE("knows").has("weight", 1L).toDF),
        row("sid_outE_w_between", t.V().has("pid", -1L).outE("knows")
          .has("weight", P.gte(1L)).has("weight", P.lt(3L)).toDF),
        row("sid_outE_between_p", t.V().has("pid", -1L).outE("knows")
          .has("weight", P.between(1L, 3L)).toDF),
        row("sid_local_limit10", t.V().has("pid", -1L)
          .localLimit(10, Seq(col("weight").desc, col("id").asc))(
            _.outE("knows").has("weight", P.between(1L, 3L))).toDF),
      ).reduce(_ unionAll _)
    }),
    // ---- 2.C reference self-loop conformance (testSelfLoop:1722-1735):
    // a loop counts ONCE under OUT and IN, TWICE under BOTH (one row per
    // orientation — the reference's loop dedup applies only to
    // single-direction queries), in both the vertex-centric query and the
    // Gremlin bothE()/both() steps ----
    "q_tp_selfloop" -> ((s, dir) => {
      import s.implicits._
      import graft.query.Direction._
      val v = Seq((1L, "v")).toDF("id", "label")
      val e = Seq((10L, 1L, 1L, "self")).toDF("id", "src", "dst", "label")
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
      def q = graft.query.VertexCentricQuery(g).onVertices(1L).labels("self")
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        n("out", q.direction(OUT).edges()),
        n("in", q.direction(IN).edges()),
        n("both", q.direction(BOTH).edges()),
        n("trav_bothE", g.traversal.V().hasId(1L).bothE("self").toDF),
        n("trav_both_v", g.traversal.V().hasId(1L).both("self").toDF),
      ).reduce(_ unionAll _)
    }),
    // ---- 2.B/2.L reference global-index conformance
    // (testGlobalGraphIndexingAndQueriesForInternalIndexes:3988-4070):
    // composite-index-shaped global queries over vertices, edges and
    // property elements — 100 vertices alternating person/organization with
    // single props (weight (i·0.5)%5, time i, text strs[i%4]), a
    // LIST-cardinality name {v·i, u·(i%5)} whose property elements carry
    // the same meta, and connect+related edges to the previous vertex
    // (self-loop at 0, related weight shifted +1). One probe row per
    // reference assertion: (caze, n). ----
    "q_tp_globalindex" -> ((s, dir) => {
      val base = s.range(100).select(col("id").as("i"),
        ((col("id") % 10).cast("double") * 0.5).as("w"),
        col("id").as("t"),
        expr("element_at(array('aaa','bbb','ccc','ddd'), CAST(id % 4 AS INT) + 1)").as("txt"))
      val verts = base.select((col("i") + 10L).as("id"),
        when(col("i") % 2 === 0, "person").otherwise("organization").as("label"),
        col("w").as("weight"), col("t").as("time"), col("txt").as("text"),
        array(concat(lit("v"), col("i").cast("string")),
          concat(lit("u"), (col("i") % 5).cast("string"))).as("name"))
      def edge(k: Int, lbl: String, wc: Column) = base.select(
        (col("i") * 2 + k + 2000L).as("id"), (col("i") + 10L).as("src"),
        (greatest(col("i") - 1, lit(0L)) + 10L).as("dst"), lit(lbl).as("label"),
        wc.as("weight"), col("t").as("time"), col("txt").as("text"))
      val edges = edge(0, "connect", col("w"))
        .unionByName(edge(1, "related", (col("w") + 1.0) % 5.0))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      // name property ELEMENTS with their meta-properties, as relation rows
      val props = base.select(col("i"),
        concat(lit("v"), col("i").cast("string")).as("value"),
        col("w").as("weight"), col("t").as("time"), col("txt").as("text"))
        .unionByName(base.select(col("i"),
          concat(lit("u"), (col("i") % 5).cast("string")).as("value"),
          col("w").as("weight"), col("t").as("time"), col("txt").as("text")))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      val V = g.vertices
      Seq(
        n("e_t10_w0", g.E().has("time", 10L).has("weight", 0.0).edges()),
        n("e_tin_w0", g.E().has("time", P.within(10L, 20L, 30L)).has("weight", 0.0).edges()),
        n("e_t10_w0_ccc", g.E().has("time", 10L).has("weight", 0.0).has("text", "ccc").edges()),
        n("e_t10_w1", g.E().has("time", 10L).has("weight", 1.0).edges()),
        n("e_t20_w0", g.E().has("time", 20L).has("weight", 0.0).edges()),
        n("e_t20_w3", g.E().has("time", 20L).has("weight", 3.0).edges()),
        n("e_aaa_connect", g.E().has("text", "aaa").has("label", "connect").edges()),
        n("e_aaa_connect_limit10",
          g.E().has("text", "aaa").has("label", "connect").limit(10).edges()),
        n("e_aaa", g.E().has("text", "aaa").edges()),
        n("e_w15", g.E().has("weight", 1.5).edges()),
        n("p_t50", props.filter(col("time") === 50L)),
        n("p_w0_aaa", props.filter(col("weight") === 0.0 && col("text") === "aaa")),
        n("p_w0_aaa_t0", props.filter(
          col("weight") === 0.0 && col("text") === "aaa" && col("time") === 0L)),
        n("p_w15", props.filter(col("weight") === 1.5)),
        n("v_t50_person", g.V().has("time", 50L).has("label", "person").vertices()),
        n("v_ccc_person", g.V().has("text", "ccc").has("label", "person").vertices()),
        n("v_ddd_person", g.V().has("text", "ddd").has("label", "person").vertices()),
        n("v_ccc_person_t2",
          g.V().has("text", "ccc").has("label", "person").has("time", 2L).vertices()),
        n("v_t51_v51_org", V.filter(col("label") === "organization" &&
          col("time") === 51L && array_contains(col("name"), "v51"))),
        n("v_t51_u1_org", V.filter(col("label") === "organization" &&
          col("time") === 51L && array_contains(col("name"), "u1"))),
        n("v_tin5_u1_org", V.filter(col("label") === "organization" &&
          col("time").isin(51L, 61L, 71L, 31L, 41L) && array_contains(col("name"), "u1"))),
        n("v_tin_empty", g.V().has("time", P.within()).vertices()),
        n("v_ccc_person_tnotin_empty",
          g.V().has("text", "ccc").has("label", "person")
            .has("time", P.without()).vertices()),
        n("v_t51_org", g.V().has("time", 51L).has("label", "organization").vertices()),
        n("v_name_u1", V.filter(array_contains(col("name"), "u1"))),
        n("v_name_v1", V.filter(array_contains(col("name"), "v1"))),
        n("v_name_v1_org", V.filter(col("label") === "organization" &&
          array_contains(col("name"), "v1"))),
      ).reduce(_ unionAll _)
    }),
    // ---- 2.C/2.L reference relation-type-index conformance
    // (testRelationTypeIndexes:2955-3050): sort-key-indexed edge and
    // property slices — anchor v (id 1) with 100 neighbors ns[i] (id 10+i),
    // one connect/child/link edge each (link UNIDIRECTED), edge and
    // name-property weights (i*0.5)%5 and times (i+77)%100. Each probe row
    // is one reference assertion: (caze, n, ws2) with ws2 = Σ 2·weight
    // (integral — weights are half-steps) pinning ordered-limit content. ----
    "q_tp_relindex" -> ((s, dir) => {
      import graft.query.Direction._
      val base = s.range(100).select(col("id").as("i"),
        (col("id") % 10).cast("double").multiply(0.5).as("weight"),
        ((col("id") + 77) % 100).as("time"))
      val verts = s.range(1, 2).select(col("id"), lit("anchor").as("label"))
        .unionByName(s.range(100).select((col("id") + 10L).as("id"), lit("n").as("label")))
      def edge(k: Int, lbl: String) = base.select(
        (col("i") * 4 + k + 1000L).as("id"), lit(1L).as("src"),
        (col("i") + 10L).as("dst"), lit(lbl).as("label"), col("weight"), col("time"))
      val edges = edge(0, "connect").unionByName(edge(1, "child")).unionByName(edge(2, "link"))
      val schema = graft.core.GraphSchema()
        .withEdgeLabel(graft.core.EdgeLabelDef("connect"))
        .withEdgeLabel(graft.core.EdgeLabelDef("child"))
        .withEdgeLabel(graft.core.EdgeLabelDef("link", unidirected = true))
      val g = graft.data.PropertyGraph(schema, verts, edges)
      // the LIST-cardinality name property as a relation frame:
      // (vid, value, weight, time) — TitanVertexProperty rows with meta
      val props = base.select(lit(1L).as("vid"),
        concat(lit("v"), col("i").cast("string")).as("value"),
        col("weight"), col("time"))
      def q = graft.query.VertexCentricQuery(g).onVertices(1L)
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"),
          coalesce(sum((col("weight") * 2).cast("long")), lit(0L)).as("ws2"))
          .select(lit(caze).as("caze"), col("n"), col("ws2"))
      val wProp = org.apache.spark.sql.expressions.Window.partitionBy(col("vid"))
      def propTop(d: DataFrame, n0: Int, asc: Boolean) = {
        val o = if (asc) Seq(col("weight").asc, col("value").asc)
                else Seq(col("weight").desc, col("value").asc)
        d.withColumn("__rn", row_number().over(wProp.orderBy(o: _*)))
          .filter(col("__rn") <= n0).drop("__rn")
      }
      Seq(
        row("props_wgt36", props.filter(col("weight") > 3.6)),
        row("props_wlt09_order", props.filter(col("weight") < 0.9)
          .orderBy(col("weight").asc)),
        row("props_interval_order_limit10", propTop(
          props.filter(col("weight") >= 1.1 && col("weight") < 2.2), 10, asc = false)),
        row("props_t5", props.filter(col("time") === 5L)),
        row("props_all", props),
        row("child_out_t5", q.labels("child").direction(OUT).has("time", 5L).edges()),
        row("child_both_t5", q.labels("child").direction(BOTH).has("time", 5L).edges()),
        row("child_out_tint_10_20_limit5", q.labels("child").direction(OUT)
          .interval("time", 10L, 20L).orderBy("weight", asc = false).limit(5).edges()),
        row("child_both_wint_0_1_order", q.labels("child").direction(BOTH)
          .interval("weight", 0.0, 1.0).orderBy("weight", asc = false).edges()),
        row("child_out_wint_0_1",
          q.labels("child").direction(OUT).interval("weight", 0.0, 1.0).edges()),
        row("child_both", q.labels("child").direction(BOTH).edges()),
        row("child_both_vertexIds",
          q.labels("child").direction(BOTH).vertexIds().select(lit(0.0).as("weight"))),
        row("child_out_wint_vertexIds",
          q.labels("child").interval("weight", 0.0, 1.0).direction(OUT).vertexIds()
            .select(lit(0.0).as("weight"))),
        row("child_out_tint_70_80_order_time", q.labels("child")
          .interval("time", 70L, 80L).direction(OUT).orderBy("time").edges()),
        row("connect_t5_wint_out", q.labels("connect").has("time", 5L)
          .interval("weight", 0.0, 5.0).direction(OUT).edges()),
        row("connect_t5_wint_both", q.labels("connect").has("time", 5L)
          .interval("weight", 0.0, 5.0).direction(BOTH).edges()),
        row("connect_tint_wint_out", q.labels("connect").interval("time", 10L, 20L)
          .interval("weight", 0.0, 5.0).direction(OUT).edges()),
        row("connect_out_order_asc_limit10", q.labels("connect").direction(OUT)
          .orderBy("weight").limit(10).edges()),
        row("connect_out_order_desc_limit10", q.labels("connect").direction(OUT)
          .orderBy("weight", asc = false).limit(10).edges()),
        row("connect_out_wint_14_275_order", q.labels("connect").direction(OUT)
          .interval("weight", 1.4, 2.75).orderBy("weight", asc = false).edges()),
        row("connect_out_t22", q.labels("connect").direction(OUT).has("time", 22L).edges()),
        row("connect_out_adj_u", q.labels("connect").direction(OUT).adjacent(10L).edges()),
        row("connect_out_w0_adj_u", q.labels("connect").direction(OUT)
          .has("weight", 0.0).adjacent(10L).edges()),
        row("connect_out_wint01_adj_u", q.labels("connect").direction(OUT)
          .interval("weight", 0.0, 1.0).adjacent(10L).edges()),
        row("connect_out_tint_50_100_adj_u", q.labels("connect").direction(OUT)
          .interval("time", 50L, 100L).adjacent(10L).edges()),
        // v.query() over ALL relations: 300 edges + 100 properties = 400
        row("rel_all", q.direction(BOTH).edges().select(col("weight"))
          .unionByName(props.select(col("weight")))),
        // unidirected link: the in-vertex is unaware — ns[0] BOTH sees its
        // connect and child edges, never the link edge
        row("u_both_no_link", graft.query.VertexCentricQuery(g)
          .onVertices(10L).direction(BOTH).edges()),
      ).reduce(_ unionAll _)
    }),
    // ---- 2.C reference vertex-centric conformance: ~35 expected-count
    // assertions from testVertexCentricQuery (:2522-2700) through the
    // VertexCentricQuery surface (labels/direction/has/interval/within/
    // adjacent/limit/multi-vertex frontier) on the same 10000-vertex
    // fixture, one probe row per reference assertion ----
    "q_tp_vcquery" -> ((s, dir) => {
      import graft.query.Direction._
      val g = tpVcFixture(s)
      def q(v: Long) = graft.query.VertexCentricQuery(g).onVertices(v)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        n("both_all", q(1L).direction(BOTH).edges()),
        n("connect_limit10", q(1L).labels("connect").limit(10).vertices()),
        n("connectDesc_limit10_u", q(2L).labels("connectDesc").limit(10).vertices()),
        n("connect_tgt30_limit10",
          q(1L).labels("connect").has("time", P.gt(30L)).limit(10).vertices()),
        n("connect_out_interval_3_31",
          q(1L).labels("connect").direction(OUT).interval("time", 3L, 31L).edges()),
        n("connect_out_t15_w35",
          q(1L).labels("connect").direction(OUT).has("time", 15L).has("weight", 3.5).edges()),
        n("connect_in_interval_3_31",
          q(1L).labels("connect").direction(IN).interval("time", 3L, 31L).edges()),
        n("connect_out_vertexIds_3_31",
          q(1L).labels("connect").direction(OUT).interval("time", 3L, 31L).vertexIds()),
        n("connect_out_tgt31",
          q(1L).labels("connect").direction(OUT).has("time", P.gt(31L)).edges()),
        n("friend_out_limit3", q(1L).labels("friend").direction(OUT).limit(3).edges()),
        n("friend_out_w05_interval_3_33", q(1L).labels("friend").direction(OUT)
          .interval("time", 3L, 33L).has("weight", 0.5).edges()),
        n("friend_out_win3_interval_3_33", q(1L).labels("friend").direction(OUT)
          .has("weight", P.within(0.5, 1.5, 2.5)).interval("time", 3L, 33L).edges()),
        n("friend_out_win2",
          q(1L).labels("friend").direction(OUT).has("weight", P.within(0.5, 1.5)).edges()),
        n("friend_out_w05_interval_4_10", q(1L).labels("friend").direction(OUT)
          .has("weight", 0.5).interval("time", 4L, 10L).edges()),
        n("friend_out_tlte10",
          q(1L).labels("friend").direction(OUT).has("time", P.lte(10L)).edges()),
        n("friend_out_tgt10",
          q(1L).labels("friend").direction(OUT).has("time", P.gt(10L)).edges()),
        n("fc_out_interval_3_33", q(1L).labels("friend", "connect").direction(OUT)
          .interval("time", 3L, 33L).edges()),
        n("knows_out_n0",
          q(1L).labels("knows").direction(OUT).has("number", 0L).edges()),
        n("knows_out_n0_w_0_4", q(1L).labels("knows").direction(OUT)
          .has("number", 0L).interval("weight", 0.0, 4.0).edges()),
        n("knows_out_n0_w_0_2", q(1L).labels("knows").direction(OUT)
          .has("number", 0L).interval("weight", 0.0, 2.0).edges()),
        n("knows_out_n0_w_21_4", q(1L).labels("knows").direction(OUT)
          .has("number", 0L).interval("weight", 2.1, 4.0).edges()),
        n("fck_out_interval_3_33", q(1L).labels("friend", "connect", "knows")
          .direction(OUT).interval("time", 3L, 33L).edges()),
        n("fck_out_tne10", q(1L).labels("friend", "connect", "knows")
          .direction(OUT).has("time", P.neq(10L)).edges()),
        n("connect_out_adj6_t6",
          q(1L).labels("connect").direction(OUT).adjacent(16L).has("time", 6L).edges()),
        n("knows_out_adj11", q(1L).labels("knows").direction(OUT).adjacent(21L).edges()),
        n("knows_in_adj11", q(1L).labels("knows").direction(IN).adjacent(21L).edges()),
        n("knows_both_adj11", q(1L).labels("knows").direction(BOTH).adjacent(21L).edges()),
        n("knows_out_adj11_w35",
          q(1L).labels("knows").direction(OUT).adjacent(21L).has("weight", 3.5).edges()),
        n("connect_both_adj6_t6",
          q(1L).labels("connect").adjacent(16L).has("time", 6L).edges()),
        n("connect_adj8_t8",
          q(1L).labels("connect").adjacent(18L).has("time", 8L).edges()),
        n("connect_out_count", q(1L).labels("connect").direction(OUT).edges()),
        n("connect_in_count", q(1L).labels("connect").direction(IN).edges()),
        n("connect_both_count", q(1L).labels("connect").direction(BOTH).edges()),
        n("in_t1", q(1L).direction(IN).has("time", 1L).edges()),
        n("out_interval_4_14", q(1L).direction(OUT).interval("time", 4L, 14L).edges()),
        n("in_interval_4_14_tne10",
          q(1L).direction(IN).interval("time", 4L, 14L).has("time", P.neq(10L)).edges()),
        // multiQuery block: qvs = vs[6,9,12,15,60] (ids 16,19,22,25,70)
        n("multi_in_connect", graft.query.VertexCentricQuery(g)
          .onVertices(16L, 19L, 22L, 25L, 70L).labels("connect").direction(IN).edges()),
        n("multi_connect_both", graft.query.VertexCentricQuery(g)
          .onVertices(16L, 19L, 22L, 25L, 70L).labels("connect").edges()),
        n("multi_knows", graft.query.VertexCentricQuery(g)
          .onVertices(16L, 19L, 22L, 25L, 70L).labels("knows").edges()),
        n("multi_all", graft.query.VertexCentricQuery(g)
          .onVertices(16L, 19L, 22L, 25L, 70L).edges()),
      ).reduce(_ unionAll _)
    }),
    "q_tp_select_edge" -> ((s, dir) => {
      import s.implicits._
      // testSimpleTinkerPopTraversal: V().has(josh).outE(created).as('e')
      // .inV().has(lop).select('e') resolves to the created-edge id
      val v = Seq((1L, "person", "josh"), (2L, "software", "lop"))
        .toDF("id", "label", "name")
      val e = Seq((10L, 1L, 2L, "created")).toDF("id", "src", "dst", "label")
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
      g.traversal.V().has("name", "josh").outE("created").as("e").inV()
        .has("name", "lop").selectPop("e", graft.traverse.Pop.Last)
        .select(col("e_id").as("eid"))
    }),
    // ---- TitanIndexTest mixed-index conformance corpus (q_tix_*) ----
    // testIndexing (titan-test/.../TitanIndexTest.java:186-371): 100 vertices
    // uid=i, category=i%5, grp=i%10, text='Vertex '+words[i%4], time=i,
    // location=point(±i/2, ±i/2); one knows edge i→max(0,i-1) carrying the
    // same props. Phase A = full graph, phase B = after deleting uid 88..99
    // (:337-342 — arithmetically the i<88 prefix: the deleted vertices'
    // incident edges are exactly edge ids 88..99). Each row is one reference
    // assertion: (caze, n, s) with s a Σtime pin over ordered-limit prefixes.
    "q_tix_indexing" -> ((s, dir) => {
      import s.implicits._
      def fixture(numV: Int): graft.data.PropertyGraph = {
        val base = s.range(numV).select(col("id").as("i"),
          (col("id") % 5).as("category"), (col("id") % 10).as("grp"),
          concat(lit("Vertex "), expr(
            "element_at(array('world','aurelius','titan','graph'), CAST(id % 4 AS INT) + 1)")).as("text"),
          col("id").as("time"),
          (when(col("id") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
            * col("id").cast("double") * 0.5).as("off"))
        val verts = base.select((col("i") + 1L).as("id"), lit("v").as("label"),
          col("category"), col("grp"), col("text"), col("time"),
          graft.expr.Geo.pointCol(col("off"), col("off")).as("location"))
        val edges = base.select((col("i") + 1000L).as("id"), (col("i") + 1L).as("src"),
          (greatest(col("i") - 1L, lit(0L)) + 1L).as("dst"), lit("knows").as("label"),
          col("category"), col("grp"), col("text"), col("time"),
          graft.expr.Geo.pointCol(col("off"), col("off")).as("location"))
        graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      }
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"), lit(0L).as("s"))
      def np(caze: String, d: DataFrame, pin: Column) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(pin), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      // the interval loop (:258-261) as ONE grouped aggregate per element
      // kind: cross the tiny bound list in, count time ∈ [b, 2b) per bound
      def intervals(tag: String, df: DataFrame, bs: Seq[Long]) =
        df.select(col("time")).crossJoin(broadcast(bs.toDF("b")))
          .groupBy(col("b")).agg(sum(when(
            col("time") >= col("b") && col("time") < col("b") * 2, 1L).otherwise(0L)).as("n"))
          .select(concat(lit(tag), col("b").cast("string")).as("caze"), col("n"),
            lit(0L).as("s"))
      // the geo loop (:263-268): radius = haversine(0,0 → b/2,b/2) + 20km,
      // count of locations WITHIN the circle per bound (expected b+1 — the
      // next vertex out is ≥48 km past the +20 km margin, so engines'
      // last-ulp trig differences cannot flip any comparison)
      def geoFam(tag: String, df: DataFrame, bs: Seq[Long]) = {
        val bounds = bs.toDF("b").select(col("b"),
          (graft.expr.Geo.haversineKm(lit(0.0), lit(0.0),
            col("b") * 0.5, col("b") * 0.5) + 20.0).as("rad"))
        df.select(col("location")).crossJoin(broadcast(bounds))
          .groupBy(col("b")).agg(sum(when(graft.expr.Geo.within(col("location"),
            graft.expr.Geo.circleCol(lit(0.0), lit(0.0), col("rad"))), 1L)
            .otherwise(0L)).as("n"))
          .select(concat(lit(tag), col("b").cast("string")).as("caze"), col("n"),
            lit(0L).as("s"))
      }
      def havKm(deg: Double): Double = {
        val r = math.toRadians(deg)
        val a = math.pow(math.sin(r / 2), 2) * (1.0 + math.cos(r))
        2 * graft.expr.Geo.EarthRadiusKm * math.asin(math.sqrt(a))
      }
      val words = Seq("world", "aurelius", "titan", "graph")
      val ga = fixture(100)
      val gb = fixture(88)
      val circle19 = graft.expr.Geo.circle(0.0, 0.0, havKm(9.5) + 20.0)
      val aCases = words.flatMap(w => Seq(
        n(s"va_c_$w", ga.V().has("text", P.textContains(w)).vertices()),
        n(s"ea_c_$w", ga.E().has("text", P.textContains(w)).edges()))) ++ Seq(
        np("va_world_t_asc", ga.V().has("text", P.textContains("world"))
          .orderBy("time").limit(5).vertices(), col("time")),
        np("va_world_t_desc", ga.V().has("text", P.textContains("world"))
          .orderBy("time", asc = false).limit(5).vertices(), col("time")),
        np("va_world_cat_asc", ga.V().has("text", P.textContains("world"))
          .orderBy("category").limit(5).vertices(), col("time")),
        np("va_world_cat_desc", ga.V().has("text", P.textContains("world"))
          .orderBy("category", asc = false).limit(5).vertices(), col("time")),
        np("va_grp3_t_asc3", ga.V().has("grp", 3L)
          .orderBy("time").limit(3).vertices(), col("time")),
        np("ea_grp3_t_desc3", ga.E().has("grp", 3L)
          .orderBy("time", asc = false).limit(3).edges(), col("time")),
        intervals("va_int_", ga.vertices, Seq(0L, 10L, 20L, 30L, 40L)),
        intervals("ea_int_", ga.edges, Seq(0L, 10L, 20L, 30L, 40L)),
        geoFam("va_geo_", ga.vertices, Seq(0L, 20L, 40L, 60L, 80L, 90L)),
        geoFam("ea_geo_", ga.edges, Seq(0L, 20L, 40L, 60L, 80L, 90L)),
        n("va_cat1_int", ga.V().has("category", 1L).interval("time", 10L, 28L).vertices()),
        n("ea_cat1_int", ga.E().has("category", 1L).interval("time", 10L, 28L).edges()),
        n("va_t1030_world", ga.V().has("time", P.gte(10L)).has("time", P.lt(30L))
          .has("text", P.textContains("world")).vertices()),
        n("va_geo19_world", ga.V().has("location", graft.expr.Geo.geoIntersect(circle19))
          .has("text", P.textContains("world")).vertices()),
        n("va_all", ga.V().vertices()), n("ea_all", ga.E().edges()))
      val bCases = words.flatMap(w => Seq(
        n(s"vb_c_$w", gb.V().has("text", P.textContains(w)).vertices()),
        n(s"eb_c_$w", gb.E().has("text", P.textContains(w)).edges()))) ++ Seq(
        intervals("vb_int_", gb.vertices, Seq(0L, 8L, 16L, 24L, 32L, 40L)),
        intervals("eb_int_", gb.edges, Seq(0L, 8L, 16L, 24L, 32L, 40L)),
        geoFam("vb_geo_", gb.vertices, Seq(0L, 30L, 60L, 80L)),
        geoFam("eb_geo_", gb.edges, Seq(0L, 30L, 60L, 80L)),
        n("vb_t1030_world", gb.V().has("time", P.gte(10L)).has("time", P.lt(30L))
          .has("text", P.textContains("world")).vertices()),
        n("vb_geo19_world", gb.V().has("location", graft.expr.Geo.geoIntersect(circle19))
          .has("text", P.textContains("world")).vertices()),
        n("vb_all", gb.V().vertices()), n("eb_all", gb.E().edges()))
      (aCases ++ bCases).reduce(_ unionAll _)
    }),
    // testIndexParameters (TitanIndexTest.java:795-942): chain graph of 1000
    // vertices/edges/uid-property-elements, name=text=strs[i%4] (four
    // sentences); the full string-predicate matrix — CONTAINS /
    // CONTAINS_PREFIX / CONTAINS_REGEX on the TEXT mapping, EQUAL /
    // NOT_EQUAL / PREFIX / REGEX on the STRING mapping — run identically
    // over all three element categories.
    "q_tix_params" -> ((s, dir) => {
      val strs = Seq("Uncle Berry has a farm", "and on his farm he has five ducks",
        "ducks are beautiful animals", "the sky is very blue today")
      val base = s.range(1000).select(col("id").as("i"), expr(
        "element_at(array('Uncle Berry has a farm','and on his farm he has five ducks'," +
          "'ducks are beautiful animals','the sky is very blue today')," +
          " CAST(id % 4 AS INT) + 1)").as("nm"))
      val verts = base.select((col("i") + 1L).as("id"), lit("v").as("label"),
        col("nm").as("name"), col("nm").as("text"))
      val edges = base.select((col("i") + 10000L).as("id"), (col("i") + 1L).as("src"),
        (greatest(col("i") - 1L, lit(0L)) + 1L).as("dst"), lit("knows").as("label"),
        col("nm").as("name"), col("nm").as("text"))
      // TitanVertexProperty elements: uid="v"+i carrying meta-props name/text
      val props = base.select(col("i").as("id"), lit("uid").as("key"),
        concat(lit("v"), col("i").cast("string")).as("value"),
        col("nm").as("name"), col("nm").as("text"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def fam(tag: String, f: (String, P) => DataFrame) = Seq(
        n(s"${tag}_c_ducks", f("text", P.textContains("ducks"))),
        n(s"${tag}_c_farm", f("text", P.textContains("farm"))),
        n(s"${tag}_c_beautiful", f("text", P.textContains("beautiful"))),
        n(s"${tag}_cp_beauti", f("text", P.textContainsPrefix("beauti"))),
        n(s"${tag}_cr_berry", f("text", P.textContainsRegex("be[r]+y"))),
        n(s"${tag}_c_lolipop", f("text", P.textContains("lolipop"))),
        n(s"${tag}_eq_s1", f("name", P.eq(strs(1)))),
        n(s"${tag}_neq_s2", f("name", P.neq(strs(2)))),
        n(s"${tag}_eq_farm", f("name", P.eq("farm"))),
        n(s"${tag}_p_ducks", f("name", P.textPrefix("ducks"))),
        n(s"${tag}_r_ducks", f("name", P.textRegex("(.*)ducks(.*)"))))
      (fam("v", (k, p) => g.V().has(k, p).vertices()) ++
        fam("e", (k, p) => g.E().has(k, p).edges()) ++
        fam("p", (k, p) => props.filter(p.apply(col(k)))))
        .reduce(_ unionAll _)
    }),
    // testRawQueries (TitanIndexTest.java:948-994) + the name-mapping tail of
    // testIndexParameters (:938-941): direct Lucene-style indexQuery over the
    // same chain graph — term OR-groups, quoted exact phrases on the STRING
    // mapping, limit/offset paging, backend-field (mapped-name) resolution
    // where bare field names bypass the key-name translation that element-
    // prefixed names get, and a custom element identifier ($v$).
    "q_tix_raw" -> ((s, dir) => {
      val base = s.range(1000).select(col("id").as("i"), expr(
        "element_at(array('Uncle Berry has a farm','and on his farm he has five ducks'," +
          "'ducks are beautiful animals','the sky is very blue today')," +
          " CAST(id % 4 AS INT) + 1)").as("nm"))
      val verts = base.select((col("i") + 1L).as("id"), lit("v").as("label"),
        col("nm").as("name"), col("nm").as("text"))
      val edges = base.select((col("i") + 10000L).as("id"), (col("i") + 1L).as("src"),
        (greatest(col("i") - 1L, lit(0L)) + 1L).as("dst"), lit("knows").as("label"),
        col("nm").as("name"), col("nm").as("text"))
      val props = base.select(col("i").as("id"), lit("uid").as("key"),
        concat(lit("v"), col("i").cast("string")).as("value"),
        col("nm").as("name"), col("nm").as("text"))
      val I = graft.index.Indexes
      val keyF = Map("name" -> "name", "text" -> "text")
      // setupChainGraph(sameNameMapping=true): vindex text carries explicit
      // mapped-name "xtext" (overriding the key-name default), pindex name
      // carries "xstr"; everything else maps to its own key name (:795-811)
      val vRaw = Map("name" -> "name", "xtext" -> "text")
      val eRaw = Map("name" -> "name", "text" -> "text")
      val pRaw = Map("xstr" -> "name", "text" -> "text")
      val NL = Int.MaxValue
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def rawFam(tag: String, df: DataFrame, raw: Map[String, String], pfx: String) = Seq(
        n(s"${tag}_ducks", I.indexQueryFrame(df, s"$pfx.text:ducks", keyF, raw, NL)),
        n(s"${tag}_farm3", I.indexQueryFrame(df, s"$pfx.text:(farm uncle berry)", keyF, raw, NL)),
        n(s"${tag}_and_phrase", I.indexQueryFrame(df,
          s"""$pfx.text:(farm uncle berry) AND $pfx.name:"Uncle Berry has a farm"""",
          keyF, raw, NL)),
        n(s"${tag}_bad", I.indexQueryFrame(df, s"$pfx.text:(beautiful are ducks)", keyF, raw, NL)),
        n(s"${tag}_bad_off10",
          I.indexQueryFrame(df, s"$pfx.text:(beautiful are ducks)", keyF, raw, NL, 10)),
        n(s"${tag}_bad_lim10",
          I.indexQueryFrame(df, s"""$pfx."text":(beautiful are ducks)""", keyF, raw, 10)),
        n(s"${tag}_bad_lim10_off10",
          I.indexQueryFrame(df, s"""$pfx."text":(beautiful are ducks)""", keyF, raw, 10, 10)),
        n(s"${tag}_bad_off1000",
          I.indexQueryFrame(df, s"""$pfx."text":(beautiful are ducks)""", keyF, raw, 10, 1000)))
      (rawFam("rqv", verts, vRaw, "v") ++ Seq(
        n("rqv_xtext", I.indexQueryFrame(verts, "xtext:ducks", keyF, vRaw, NL)),
        n("rqv_text_raw", I.indexQueryFrame(verts, "text:ducks", keyF, vRaw, NL)),
        n("rqv_elemid", I.indexQueryFrame(verts, "$v$text:ducks", keyF, vRaw, NL, 0, "$v$")),
        // testIndexParameters:938-941 (sameNameMapping=false): only explicit
        // mapped-names resolve — vindex xtext hits, eindex has none
        n("rqx_v_xtext", I.indexQueryFrame(verts, "xtext:ducks", keyF, Map("xtext" -> "text"), NL)),
        n("rqx_e_xtext", I.indexQueryFrame(edges, "xtext:ducks", keyF, Map.empty[String, String], NL))) ++
        rawFam("rqe", edges, eRaw, "e") ++ Seq(
        n("rqe_text_raw", I.indexQueryFrame(edges, "text:ducks", keyF, eRaw, NL))) ++
        rawFam("rqp", props, pRaw, "p") ++ Seq(
        n("rqp_text_raw", I.indexQueryFrame(props, "text:ducks", keyF, pRaw, NL))))
        .reduce(_ unionAll _)
    }),
    // Small-fixture TitanIndexTest blocks, one assertion per row (caze, n,
    // ids=Σ matched ids): testSimpleUpdate:153-182 (mutate-then-requery
    // through the index), testBooleanIndexing:378-403, testDateIndexing:
    // 410-440, testInstantIndexing:447-497 (millisecond phase; the
    // nanosecond phase maps to "backend without nanosecond support" — Spark
    // timestamps are microsecond — where the reference expects the index
    // update to FAIL, n/a for a recomputed snapshot), testUUIDIndexing:
    // 503-534, testDualMapping:997-1048 (TEXTSTRING dual predicates +
    // delete/update/property-removal phase), testIndexQueryWithScore:
    // 1512-1535, testContainsWithMultipleValues:1541-1556,
    // testWidcardQuery:1618-1636.
    "q_tix_small" -> ((s, dir) => {
      import s.implicits._
      val emptyE = Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "label")
      def pg(v: DataFrame, e: DataFrame = emptyE) =
        graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("id")), lit(0L)).cast("long").as("ids"))
          .select(lit(caze).as("caze"), col("n"), col("ids"))
      // -- testSimpleUpdate: rename vertex Marko Rodriguez→Marko and edge
      //    Hulu Bubab→Tubu Rubu through the property() mutation step
      val su0 = pg(Seq((1L, "v", "Marko Rodriguez")).toDF("id", "label", "name"),
        Seq((10L, 1L, 1L, "knows", "Hulu Bubab")).toDF("id", "src", "dst", "label", "name"))
      val su1 = su0.traversal.V().has("name", P.textContains("marko"))
        .property("name", lit("Marko")).graph
      val su2 = su1.traversal.E().property("name", lit("Tubu Rubu")).graph
      // -- testBooleanIndexing / testDateIndexing / testInstantIndexing
      val bg = pg(Seq((1L, "v", true), (2L, "v", false)).toDF("id", "label", "visible"))
      val ts1 = new java.sql.Timestamp(1L); val ts2k = new java.sql.Timestamp(2000L)
      val dg = pg(Seq((1L, "v", ts1), (2L, "v", ts2k)).toDF("id", "label", "date"))
      // -- testUUIDIndexing (two fixed UUIDs; the reference randomizes, the
      //    assertions only need them distinct)
      val u1 = "6ccd780c-baba-1026-9564-5b8c656024db"
      val u2 = "16fd2706-8baf-433b-82eb-8c7fada847da"
      val ug = pg(Seq((1L, "v", u1), (2L, "v", u2)).toDF("id", "label", "uid"))
      // -- testDualMapping: phase 1 queries, then remove Don's vertex,
      //    rename Lewis, remove Mabel's name property
      val dg0 = pg(Seq((1L, "v", "Long John Don"), (2L, "v", "Long Little Lewis"),
        (3L, "v", "Middle Sister Mabel")).toDF("id", "label", "name"))
      val dg1 = dg0.traversal.V().has("name", P.textRegex("(.*)Don")).drop().graph
      val dg2 = dg1.traversal.V().has("name", P.textRegex("(.*)Lewis"))
        .property("name", lit("Big Brother Bob")).graph
      val dg3 = dg2.traversal.V().has("name", P.textRegex("(.*)Mabel"))
        .property("name", lit(null).cast("string")).graph
      // -- testIndexQueryWithScore: three docs of very different token
      //    counts all matching "Hello" → three DISTINCT scores
      val sg = pg(Seq((1L, "v", "Hello Hello Hello Hello Hello Hello Hello Hello"),
        (2L, "v", "Hello abab abab fsdfsd sfdfsd sdffs fsdsdf fdf fsdfsd aera fsad abab abab fsdfsd sfdf"),
        (3L, "v", "Hello")).toDF("id", "label", "text"))
      val scored = graft.index.Indexes.indexQuery(sg, graft.core.ElementCategory.VERTEX,
        "text", "Hello", 50)
      // -- testContainsWithMultipleValues: one CONTAINS with several terms
      //    is a single AND-of-tokens condition, not a double-applied AND
      val cg = pg(Seq((1L, "v", "hercules was here")).toDF("id", "label", "name"))
      // -- testWidcardQuery: v.*:"x" matches on ANY indexed field
      val wg = Seq((1L, "v", "test1", "test2")).toDF("id", "label", "p1", "p2")
      val wk = Map("p1" -> "p1", "p2" -> "p2")
      Seq(
        n("su1_marko_v", su0.V().has("name", P.textContains("marko")).vertices()),
        n("su1_hulu_e", su0.E().has("name", P.textContains("Hulu")).edges()),
        n("su2_marko_v", su2.V().has("name", P.textContains("marko")).vertices()),
        n("su2_rubu_e", su2.E().has("name", P.textContains("Rubu")).edges()),
        n("su2_hulu_e", su2.E().has("name", P.textContains("Hulu")).edges()),
        n("b_eq_true", bg.V().has("visible", true).vertices()),
        n("b_eq_false", bg.V().has("visible", false).vertices()),
        n("b_neq_true", bg.V().has("visible", P.neq(true)).vertices()),
        n("b_neq_false", bg.V().has("visible", P.neq(false)).vertices()),
        n("b_all", bg.V().vertices()),
        n("dt_eq", dg.V().has("date", ts1).vertices()),
        n("dt_gt", dg.V().has("date", P.gt(ts1)).vertices()),
        n("dt_gte", dg.V().has("date", P.gte(ts1)).vertices()),
        n("dt_lt", dg.V().has("date", P.lt(ts2k)).vertices()),
        n("dt_lte", dg.V().has("date", P.lte(ts2k)).vertices()),
        n("dt_neq", dg.V().has("date", P.neq(ts1)).vertices()),
        n("uu_eq1", ug.V().has("uid", u1).vertices()),
        n("uu_eq2", ug.V().has("uid", u2).vertices()),
        n("uu_neq1", ug.V().has("uid", P.neq(u1)).vertices()),
        n("uu_neq2", ug.V().has("uid", P.neq(u2)).vertices()),
        n("dm1_eq_ljd", dg0.V().has("name", "Long John Don").vertices()),
        n("dm1_c_long", dg0.V().has("name", P.textContains("Long")).vertices()),
        n("dm1_c_long_don", dg0.V().has("name", P.textContains("Long Don")).vertices()),
        n("dm1_cp_lon", dg0.V().has("name", P.textContainsPrefix("Lon")).vertices()),
        // the reference query string is "Lit*le"; its indexed evaluation
        // matches the lowercased token (count 1 asserted at :1019) while
        // titan-core Text.java CONTAINS_REGEX (:86-97) is case-sensitive on
        // lowercased tokens — we follow Text.java (pinned in
        // PredicatesSpec), so the corpus count is pinned with the
        // explicitly case-folded pattern
        n("dm1_cr_litle", dg0.V().has("name", P.textContainsRegex("[Ll]it*le")).vertices()),
        n("dm1_r_long", dg0.V().has("name", P.textRegex("Long.*")).vertices()),
        n("dm1_p_middle", dg0.V().has("name", P.textPrefix("Middle")).vertices()),
        n("dm2_c_long", dg3.V().has("name", P.textContains("Long")).vertices()),
        n("dm2_c_big", dg3.V().has("name", P.textContains("Big")).vertices()),
        n("dm2_p_big", dg3.V().has("name", P.textPrefix("Big")).vertices()),
        n("dm2_p_middle", dg3.V().has("name", P.textPrefix("Middle")).vertices()),
        scored.agg(countDistinct(col("score")).as("n"),
          coalesce(sum(col("id")), lit(0L)).cast("long").as("ids"))
          .select(lit("sc_distinct").as("caze"), col("n"), col("ids")),
        n("cm_contains", cg.V().has("name", P.textContains("hercules here")).vertices()),
        n("cm_value", cg.V().has("name", P.textContains("hercules here"))
          .has("name", "hercules was here").vertices()),
        n("wc_t1", graft.index.Indexes.indexQueryFrame(wg, "v.*:\"test1\"", wk, wk)),
        n("wc_t2", graft.index.Indexes.indexQueryFrame(wg, "v.*:\"test2\"", wk, wk)),
      ).reduce(_ unionAll _)
    }),
    // Cardinality conformance: testPropertyCardinality (TitanGraphTest.java:
    // 1636-1660 — SINGLE overwrite removes the old index record, re-setting
    // the same value is allowed), testTinkerPopCardinality (:3323-3347 —
    // single() overwrite collapses to ONE property element, LIST keeps both),
    // and the TitanIndexTest.testCollection arc (:1685-1756 — add value1,
    // add value2, remove value1, re-add, then add a DUPLICATE: SET
    // deduplicates to 2 cells, LIST keeps 3; equality and geo-WITHIN lookups
    // match on ANY cell).
    // IndexProviderTest contract matrix (titan-test diskstorage/indexing/
    // IndexProviderTest.java storeTest:164-353, phase 1): the provider-level
    // predicate contract over BOTH stores — token CONTAINS (case folding,
    // multi-term conjunction), CONTAINS_PREFIX/CONTAINS_REGEX, exact-STRING
    // EQUAL/NOT_EQUAL/PREFIX/REGEX, boolean And/Or/Not trees, numeric, geo
    // circle/box, instant comparisons, per-element LIST/SET point lookups
    // (index-backed, force-index proves the access path), undefined-key
    // queries, ordered-result heads (:199-209), the RawQuery family
    // (phrases on analyzed fields, boolean AND, numeric [lo TO hi] ranges,
    // paging — :314-327), and the TEXTSTRING dual (tokenized + exact) on
    // EDGES. Rows: (caze, n, ids = Σ matched doc ids), edge twins ed_/ets_.
    // Seeded-anchor sweeps over three more conformance fixtures (the round-14
    // discipline extended per the r14 review): operands drawn by the LCG
    // a_k = (1103515245*7 + k*12347) mod 100 with the stride COPRIME to every
    // class modulus in play (2, 4, 5, 10), and a *_classes row pins IN THE
    // ORACLE that the anchors span >=2 label classes - the degenerate-draw
    // failure mode that blanked the r14 vcquery sweep cannot recur unnoticed.
    "q_tp_globalindex_seeded" -> ((s, dir) => {
      // same arithmetic fixture as q_tp_globalindex (label by i%2, text by
      // i%4, weight (i%10)*0.5, time=i; connect/related edges with weight w
      // and (w+1)%5)
      val base = s.range(100).select(col("id").as("i"),
        ((col("id") % 10).cast("double") * 0.5).as("w"),
        col("id").as("t"),
        expr("element_at(array('aaa','bbb','ccc','ddd'), CAST(id % 4 AS INT) + 1)").as("txt"))
      val verts = base.select((col("i") + 10L).as("id"),
        when(col("i") % 2 === 0, "person").otherwise("organization").as("label"),
        col("w").as("weight"), col("t").as("time"), col("txt").as("text"))
      def edge(k: Int, lbl: String, wc: Column) = base.select(
        (col("i") * 2 + k + 2000L).as("id"), (col("i") + 10L).as("src"),
        (greatest(col("i") - 1, lit(0L)) + 10L).as("dst"), lit(lbl).as("label"),
        wc.as("weight"), col("t").as("time"), col("txt").as("text"))
      val edges = edge(0, "connect", col("w"))
        .unionByName(edge(1, "related", (col("w") + 1.0) % 5.0))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      val words = Seq("aaa", "bbb", "ccc", "ddd")
      val anchors: Seq[Long] = (0 until 12).map(k => (1103515245L * 7 + k * 12347L) % 100)
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"),
          coalesce(sum((col("weight") * 2).cast("long")), lit(0L)).as("ws2"))
          .select(lit(caze).as("caze"), col("n"), col("ws2"))
      val classes = s.range(12)
        .select(((lit(1103515245L * 7) + col("id") * 12347L) % 100L).as("a"))
        .agg((count_distinct(col("a") % 2) * 100 + count_distinct(col("a") % 4))
          .cast("long").as("n"))
        .select(lit("sgx_classes").as("caze"), col("n"), lit(0L).as("ws2"))
      (Seq(classes,
        row("sgx_time_in", g.V().has("time", P.within(anchors: _*)).vertices()),
        row("sgx_time_in_person", g.V().has("time", P.within(anchors: _*))
          .has("label", "person").vertices())) ++
        anchors.zipWithIndex.map { case (a, k) =>
          row(s"sgx_e_t$k", g.E().has("time", a).edges()) } ++
        anchors.zipWithIndex.map { case (a, k) =>
          row(s"sgx_v_txt$k", g.V().has("text", words((a % 4).toInt))
            .has("label", if (a % 2 == 0) "person" else "organization")
            .has("time", P.gte(a)).vertices()) })
        .reduce(_ unionAll _)
    }),
    "q_tp_relindex_seeded" -> ((s, dir) => {
      import graft.query.Direction._
      // same fixture as q_tp_relindex; seeded sort-key interval sweep plus
      // ordered-limit content pins (sum of the top-3 weights is an order
      // statistic of the slice - deterministic even under storage-order ties)
      val base = s.range(100).select(col("id").as("i"),
        (col("id") % 10).cast("double").multiply(0.5).as("weight"),
        ((col("id") + 77) % 100).as("time"))
      val verts = s.range(1, 2).select(col("id"), lit("anchor").as("label"))
        .unionByName(s.range(100).select((col("id") + 10L).as("id"), lit("n").as("label")))
      def edge(k: Int, lbl: String) = base.select(
        (col("i") * 4 + k + 1000L).as("id"), lit(1L).as("src"),
        (col("i") + 10L).as("dst"), lit(lbl).as("label"), col("weight"), col("time"))
      val edges = edge(0, "connect").unionByName(edge(1, "child")).unionByName(edge(2, "link"))
      val schema = graft.core.GraphSchema()
        .withEdgeLabel(graft.core.EdgeLabelDef("connect"))
        .withEdgeLabel(graft.core.EdgeLabelDef("child"))
        .withEdgeLabel(graft.core.EdgeLabelDef("link", unidirected = true))
      val g = graft.data.PropertyGraph(schema, verts, edges)
      def q = graft.query.VertexCentricQuery(g).onVertices(1L)
      val anchors: Seq[Long] = (0 until 12).map(k => (1103515245L * 7 + k * 12347L) % 100)
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"),
          coalesce(sum((col("weight") * 2).cast("long")), lit(0L)).as("ws2"))
          .select(lit(caze).as("caze"), col("n"), col("ws2"))
      val classes = s.range(12)
        .select(((lit(1103515245L * 7) + col("id") * 12347L) % 100L).as("a"))
        .agg(count_distinct(col("a") % 10).cast("long").as("n"))
        .select(lit("srx_classes").as("caze"), col("n"), lit(0L).as("ws2"))
      (Seq(classes) ++
        anchors.zipWithIndex.map { case (a, k) =>
          row(s"srx_int$k", q.labels("child").direction(OUT)
            .interval("time", a, a + 10L).edges()) } ++
        anchors.zipWithIndex.map { case (a, k) =>
          row(s"srx_top$k", q.labels("child").direction(OUT)
            .interval("time", a, a + 10L).orderBy("weight", asc = false)
            .limit(3).edges()) })
        .reduce(_ unionAll _)
    }),
    "q_tix_indexing_seeded" -> ((s, dir) => {
      // same fixture shape as q_tix_indexing(100); seeded [a, 2a) interval
      // sweep + per-word suffix counts with time-sum content pins
      val base = s.range(100).select(col("id").as("i"),
        concat(lit("Vertex "), expr(
          "element_at(array('world','aurelius','titan','graph'), CAST(id % 4 AS INT) + 1)")).as("text"),
        col("id").as("time"))
      val verts = base.select((col("i") + 1L).as("id"), lit("v").as("label"),
        col("text"), col("time"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts,
        verts.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      val words = Seq("world", "aurelius", "titan", "graph")
      val anchors: Seq[Long] = (0 until 12).map(k => (1103515245L * 7 + k * 12347L) % 100)
      def np(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("time")), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      val classes = s.range(12)
        .select(((lit(1103515245L * 7) + col("id") * 12347L) % 100L).as("a"))
        .agg(count_distinct(col("a") % 4).cast("long").as("n"))
        .select(lit("stx_classes").as("caze"), col("n"), lit(0L).as("s"))
      (Seq(classes) ++
        anchors.zipWithIndex.map { case (a, k) =>
          np(s"stx_int$k", g.V().has("time", P.gte(a)).has("time", P.lt(2 * a)).vertices()) } ++
        anchors.zipWithIndex.map { case (a, k) =>
          np(s"stx_w$k", g.V().has("text", P.textContains(words((a % 4).toInt)))
            .has("time", P.gte(a)).vertices()) })
        .reduce(_ unionAll _)
    }),
    // TinkerPop process-suite long-tail compositions (the ProcessStandardSuite
    // shapes the r14 review listed as un-pinned): match() nested INSIDE
    // repeat(), Pop.first/last/all over a label reused across repeat
    // iterations, select's Pop.last default on repeated labels, and
    // barrier() as a results-neutral bulk-sync point. Chain fixture:
    // vertices 1..60 with m = id % 7, edges i -> i+1, mirrored by range()
    // arithmetic in the oracle.
    "q_ps_repeat_match_pop" -> ((s, dir) => {
      import graft.traverse.Pop
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"),
        (col("id") % 7).as("m"))
      val edges = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      def row(caze: String, d: DataFrame, v: Column) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(v), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      // match nested in repeat: every hop re-binds c and semi-joins the
      // m<>3 pattern on it (nested MatchStep inside RepeatStep)
      val mr = g.traversal.V().as("a").repeat(2)(st => st.out("e").as("c")
        .matchOn(g.traversal.V().has("m", P.neq(3L)).as("c"), "c")).toDF
      // Pop over a label reused across 3 repeat iterations
      val px = g.traversal.V().as("x").repeat(3)(_.out("e").as("x"))
      Seq(
        row("mr_survivors", mr, col("id")),
        row("mr_origins", mr, col("_as_a_id")),
        row("pop_first", px.selectPop("x", Pop.First), col("x_id")),
        row("pop_last", px.selectPop("x", Pop.Last), col("x_id")),
        row("select_last_default", px.select("x"), col("x_id")),
        row("b_plain", g.traversal.V().out("e").out("e").toDF, col("id")),
        row("b_barrier", g.traversal.V().out("e").barrier().out("e").toDF, col("id")),
        row("b_dedup_plain",
          g.traversal.V().out("e").in("e").dedup().out("e").toDF, col("id")),
        row("b_dedup_barrier",
          g.traversal.V().out("e").in("e").dedup().barrier().out("e").toDF, col("id")),
      ).reduce(_ unionAll _)
    }),
    // Pop.ALL under a repeat-reused label: the full occurrence list, one
    // stringified row per traverser (TinkerPop select(Pop.all, 'x'))
    "q_ps_pop_all" -> ((s, dir) => {
      import graft.traverse.Pop
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"),
        (col("id") % 7).as("m"))
      val edges = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      g.traversal.V().as("x").repeat(3)(_.out("e").as("x")).selectPop("x", Pop.All)
    }),
    // where() with Pop over a reused (select-all) label (TinkerPop
    // WherePredicateStep + Scope/Pop — ProcessStandardSuite long tail,
    // AbstractTitanGraphProvider.java:57): self-loops on multiples of 5 make
    // the FIRST and LAST occurrence bindings genuinely diverge across 2-hop
    // paths, so each Pop resolution filters a different path set; the last
    // case runs select(Pop.all) AFTER the where() filter.
    "q_ps_where_pop" -> ((s, dir) => {
      import graft.traverse.Pop
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"))
      val chain = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val loops = s.range(1, 13).select((col("id") + 6000L).as("id"),
        (col("id") * 5L).as("src"), (col("id") * 5L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts,
        chain.unionByName(loops))
      def row(caze: String, d: DataFrame, v: Column) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(v), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      def px = g.traversal.V().as("x").out("e").as("x").out("e").as("x")
      def pab = g.traversal.V().as("a").out("e").as("a").out("e").as("b")
      Seq(
        row("wp_first_eq_last",
          px.whereLabels("x", _ === _, "x", Pop.First, Pop.Last).toDF, col("id")),
        row("wp_first_neq_last",
          px.whereLabels("x", _ =!= _, "x", Pop.First, Pop.Last).toDF, col("id")),
        row("wp_last_default", pab.whereLabels("a", _ === _, "b").toDF, col("id")),
        row("wp_first_explicit",
          pab.whereLabels("a", _ === _, "b", Pop.First, Pop.Last).toDF, col("id")),
        row("wp_filtered_pop_all",
          px.whereLabels("x", _ === _, "x", Pop.First, Pop.Last).selectPop("x", Pop.All),
          length(col("x_ids")).cast("long")),
      ).reduce(_ unionAll _)
    }),
    // sack split/merge semantics ACROSS union branches (TinkerPop SackStep
    // under UnionStep — ProcessStandardSuite long tail): branch clones split
    // the sack once at entry; the declared merge aggregate coalesces ONLY
    // traversers identical in element AND as-history, so an as-label on the
    // origin suppresses the merge, and no merge operator keeps every clone.
    "q_ps_sack_union_merge" -> ((s, dir) => {
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"))
      val edges = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"),
            coalesce(sum(col("_sack")), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      def branches(t: graft.traverse.Traversal) =
        t.unionSteps(_.out("e"), _.out("e").out("e"))
      val split = Some((c: Column) => c + lit(100L))
      Seq(
        row("su_sum", branches(g.traversal.V()
          .withSack(col("id"), split, Some(sum(_: Column)))).toDF),
        row("su_max", branches(g.traversal.V()
          .withSack(col("id"), split, Some(max(_: Column)))).toDF),
        row("su_split_only", branches(g.traversal.V()
          .withSack(col("id"), split, None)).toDF),
        row("su_as_no_merge", branches(g.traversal.V().as("o")
          .withSack(col("id"), split, Some(sum(_: Column)))).toDF),
      ).reduce(_ unionAll _)
    }),
    // local() scoping over (nested) group (TinkerPop LocalStep over
    // GroupCount/GroupStep — ProcessStandardSuite long tail): a bare
    // groupCount folds ONE global map over the frontier; local() scopes the
    // fold per source element; group().by(outer).by(local fold) merges the
    // local maps per outer key by summing counts. Skip-edges i→i+8 (≡ mod 7)
    // give some sources a genuine count-2 cell, so local ≠ one-row-per-edge.
    "q_ps_local_nested_group" -> ((s, dir) => {
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"),
        (col("id") % 7).as("m"))
      val chain = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val skips = s.range(1, 14).select((col("id") + 6000L).as("id"),
        (col("id") * 4L).as("src"), (col("id") * 4L + 8L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts,
        chain.unionByName(skips))
      def row(caze: String, d: DataFrame, s1: Column, s2: Column) =
        d.agg(count(lit(1)).as("n"),
            coalesce(sum(s1), lit(0L)).cast("long").as("s"),
            coalesce(sum(s2), lit(0L)).cast("long").as("s2"))
          .select(lit(caze).as("caze"), col("n"), col("s"), col("s2"))
      val glob = g.traversal.V().out("e").groupCount("m")
      val local = g.traversal.V().localGroupCount(_.out("e"), "m")
      val nested = local.withColumn("kcls", col("source") % 3)
        .groupBy(col("kcls"), col("m")).agg(sum(col("count")).as("cnt"))
      Seq(
        row("ng_global", glob, col("count") * (col("m") + 1L), lit(0L)),
        row("ng_local", local, col("count"), col("source") * col("count")),
        row("ng_nested", nested, col("cnt"),
          col("cnt") * (col("kcls") * 10L + col("m"))),
      ).reduce(_ unionAll _)
    }),
    // where('a', P, 'b').by(key) — the by()-MODULATED WherePredicateStep
    // (ProcessStandardSuite long tail): the predicate compares property
    // VALUES of the two bindings, not the elements; combined with the
    // id-comparing whereLabels to exclude self-pairs.
    "q_ps_where_by" -> ((s, dir) => {
      val g = graph(s, dir)
      def row(caze: String, d: DataFrame, v: Column) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(v), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      // order pairs of one customer where the first's totalprice is lower
      val lt = g.traversal.V().hasLabel("order").as("a")
        .in("placed").out("placed").as("b")
        .whereLabelsBy("a", _ < _, "b", "totalprice").toDF
      // distinct same-nation customer pairs sharing a market segment
      val seg = g.traversal.V().hasLabel("customer").as("a")
        .out("in_nation").in("in_nation").hasLabel("customer").as("b")
        .whereLabelsBy("a", _ === _, "b", "mktsegment")
        .whereLabels("a", _ =!= _, "b").toDF
      Seq(
        row("wb_lt", lt, uidOf(col("id"), TpchGraph.OrderTag)),
        row("wb_eq_seg", seg, uidOf(col("id"), TpchGraph.CustomerTag)),
      ).reduce(_ unionAll _)
    }),
    // dedup('a','b') — DedupGlobalStep over as-label scopes (TinkerPop
    // process-suite long tail): one traverser per distinct binding TUPLE;
    // the single-label form collapses further. Sums use only the binding
    // columns (the representative's other columns are legitimately
    // arbitrary, as with Spark's dropDuplicates).
    "q_ps_dedup_labels" -> ((s, dir) => {
      val g = graph(s, dir)
      def row(caze: String, d: DataFrame, v: Column) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(v), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      def t = g.traversal.V().hasLabel("order").as("a").out("contains").as("b")
      val aUid = uidOf(col("_as_a_id"), TpchGraph.OrderTag)
      val bUid = uidOf(col("_as_b_id"), TpchGraph.PartTag)
      Seq(
        row("dl_pairs_all", t.toDF, aUid + bUid),
        row("dl_pairs", t.dedupLabels("a", "b").toDF, aUid + bUid),
        row("dl_a", t.dedupLabels("a").toDF, aUid),
      ).reduce(_ unionAll _)
    }),
    // where() nested INSIDE repeat() — the per-round filtered-frontier
    // composition (TinkerPop repeat(out().where(...)) — ProcessStandardSuite
    // long tail): the emptiness semi-join, its negation, and the
    // count-valued form must each apply at EVERY round, not once at the end.
    "q_ps_repeat_where" -> ((s, dir) => {
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"))
      val edges = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("id")), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      Seq(
        row("rw_wheresub", g.traversal.V()
          .repeat(2)(_.out("e").whereSub(_.out("e"))).toDF),
        row("rw_wherenot", g.traversal.V()
          .repeat(2)(_.out("e").whereNotSub(_.out("e"))).toDF),
        row("rw_wherecount", g.traversal.V()
          .repeat(2)(_.out("e").whereCount(P.gte(1L))(_.out("e"))).toDF),
      ).reduce(_ unionAll _)
    }),
    // sack split/merge through choose()/chooseOption() branches (TinkerPop
    // SackStep under ChooseStep incl. Pick.none — ProcessStandardSuite long
    // tail): the split applies once at each branch entry; the merge
    // coalesces cross-BRANCH traversers landing on the same element (under
    // chooseOption, a Pick.none clone and an option clone meet on j%3==0).
    "q_ps_sack_choose" -> ((s, dir) => {
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"))
      val edges = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"),
            coalesce(sum(col("_sack")), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      val split = Some((c: Column) => c + lit(100L))
      def sacked = g.traversal.V().withSack(col("id"), split, Some(sum(_: Column)))
      Seq(
        row("scp_sum", sacked.choose(col("id") % 2 === 0)(
          _.out("e").out("e"), _.out("e")).toDF),
        row("scp_opt_sum", sacked.chooseOption(col("id") % 3,
          Seq(0L -> ((t: graft.traverse.Traversal) => t.out("e")),
            1L -> ((t: graft.traverse.Traversal) => t.out("e").out("e"))),
          none = Some(_.out("e"))).toDF),
        row("scp_opt_drop", sacked.chooseOption(col("id") % 3,
          Seq(0L -> ((t: graft.traverse.Traversal) => t.out("e")),
            1L -> ((t: graft.traverse.Traversal) => t.out("e").out("e")))).toDF),
      ).reduce(_ unionAll _)
    }),
    // group().by(k).by(group().by(m).by(...)) — the NESTED group modulator
    // chain (ProcessStandardSuite GroupTest map-of-maps long tail,
    // g_V_group_byXlabelX_byXgroup...): the inner group folds over each
    // outer bucket's traverser stream COLLECTIVELY, so the relational form
    // is one (outerKey, innerKey) aggregate after the sub-traversal —
    // count-valued and sum-valued inner by() arms plus a single-level
    // groupBySub control on the same fixture.
    "q_ps_group_nested" -> ((s, dir) => {
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"),
        (col("id") % 7).as("m"), (col("id") % 3).as("k"))
      val chain = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val skips = s.range(1, 14).select((col("id") + 6000L).as("id"),
        (col("id") * 4L).as("src"), (col("id") * 4L + 8L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts,
        chain.unionByName(skips))
      def row(caze: String, d: DataFrame, s1: Column) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(s1), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      Seq(
        row("gn_count", g.traversal.V().groupNested("k", _.out("e"), "m"),
          col("value") * (col("key") * 100L + col("key2") + 1L)),
        row("gn_sum", g.traversal.V().groupNested("k", _.out("e"), "m", sum(col("id"))),
          col("value") * (col("key") * 100L + col("key2") + 1L)),
        row("gn_ctrl", g.traversal.V().groupBySub("k", _.out("e")),
          col("value") * (col("k") + 1L)),
      ).reduce(_ unionAll _)
    }),
    // tree().by(name) — TreeStep with by()-modulation (ProcessStandardSuite
    // TreeTest g_V_out_out_tree_byXnameX): every tree node rendered by a
    // property; elements with a NULL name keep their slot via the id-string
    // fallback (arity preserved, never silently shortened). Control arm:
    // the unmodulated id-tree over the same paths.
    "q_ps_tree_by" -> ((s, dir) => {
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"),
        when(col("id") % 10 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n"), col("id"))).as("name"))
      val chain = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, chain)
      def row(caze: String, d: DataFrame, s1: Column) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(s1), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      Seq(
        row("tb_rendered", g.traversal.withPath.V().out("e").out("e").treeBy("name"),
          length(col("root")) + length(array_join(col("path"), ","))),
        row("tb_ctrl_ids", g.traversal.withPath.V().out("e").out("e").tree(),
          col("root") + aggregate(col("path"), lit(0L), _ + _)),
      ).reduce(_ unionAll _)
    }),
    // path().by(name) over repeat EMISSIONS (ProcessStandardSuite PathTest ×
    // RepeatTest composition): emitted traversers carry paths of DIFFERENT
    // lengths (emit surfaces every round), and the by()-rendering must
    // preserve each arity — including the until() variant where traversers
    // exit at their own depths.
    "q_ps_path_by_emit" -> ((s, dir) => {
      val verts = s.range(1, 61).select(col("id"), lit("v").as("label"),
        when(col("id") % 10 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n"), col("id"))).as("name"))
      val chain = s.range(1, 60).select((col("id") + 5000L).as("id"),
        col("id").as("src"), (col("id") + 1L).as("dst"), lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, chain)
      def row(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"),
            coalesce(sum(length(array_join(col("path"), ","))), lit(0L))
              .cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      Seq(
        // one leading hop so every emitted traverser carries a path (emit
        // unions the post-hop source frontier + both round frontiers:
        // lengths 2, 3, 4)
        row("pbe_emit", g.traversal.withPath.V().out("e")
          .repeatEmit(2)(_.out("e")).pathBy("name")),
        // do-while until(id%5==0): traversers exit at their own depth, the
        // round-3 survivors are emitted as-is — lengths 2..4 mixed
        row("pbe_until", g.traversal.withPath.V()
          .repeatUntil(col("id") % 5 === 0, 3)(_.out("e")).pathBy("name")),
      ).reduce(_ unionAll _)
    }),
    // IndexProviderTest.largeTest (:447-467) limit semantics on a
    // deterministic twin of the random-document fixture: a conjunctive
    // numeric-range + geo-circle query where limit < matches returns EXACTLY
    // limit and an over-sized limit returns every match.
    "q_ixp_limit" -> ((s, dir) => {
      val docs = s.range(3000).select((col("id") + 1L).as("id"), lit("doc").as("label"),
        (((col("id") + 1L) % 100).cast("double") / 100.0).as("weight"),
        graft.expr.Geo.pointCol(
          (((col("id") + 1L) % 40) - 20).cast("double") * 0.5,
          ((((col("id") + 1L) * 7) % 40) - 20).cast("double") * 0.5).as("location"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), docs,
        docs.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      val circle = graft.expr.Geo.circle(0.0, 0.0, 1000.0)
      def q = g.V().has("weight", P.gte(0.2)).has("weight", P.lt(0.6))
        .has("location", graft.expr.Geo.geoWithin(circle))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        n("lim_base", q.vertices()),
        n("lim_30", q.limit(30).vertices()),
        n("lim_over", q.limit(200000).vertices()),
      ).reduce(_ unionAll _)
    }),
    // Typed collection-index comparison pinned at the ORACLE level (the
    // round-15 ADVICE fix): double cells, an Int operand, and a half-step
    // operand must all resolve through the inverted per-element index to
    // exactly the scan-path answer - the index may only change the access
    // path. force-index proves the index path engaged on every ct_ix_* row.
    "q_collection_typed" -> ((s, dir) => {
      val verts = s.range(50).select((col("id") + 1L).as("id"), lit("v").as("label"),
        array(((col("id") + 1L) % 10).cast("double"),
          ((col("id") + 1L) % 5).cast("double") + 0.5).as("nums"))
      val schema = graft.core.GraphSchema()
        .withPropertyKey(graft.core.PropertyKeyDef("nums",
          org.apache.spark.sql.types.DoubleType, graft.core.Cardinality.LIST))
        .withIndex(graft.core.IndexDef("byNums", graft.core.ElementCategory.VERTEX,
          Seq("nums"), composite = false))
      val g0 = graft.data.PropertyGraph(schema, verts,
        verts.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      val g = g0.withIndexTable("byNums",
        graft.index.Indexes.materializeCollection(g0, schema.indexes("byNums")))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("id")), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      Seq(
        n("ct_scan_int7", g0.V().has("nums", 7).vertices()),
        n("ct_ix_int7", g.V().has("nums", 7).forceIndex().vertices()),
        n("ct_ix_half", g.V().has("nums", 2.5).forceIndex().vertices()),
        n("ct_ix_miss", g.V().has("nums", 9.75).forceIndex().vertices()),
      ).reduce(_ unionAll _)
    }),
    // DateType cells through the collection-index path (the same
    // stringification-divergence class as q_collection_typed's Int/double
    // case, r15 VERDICT task #6): a java.sql.Date operand AND a bare ISO
    // string operand must both resolve through the typed cast chain to the
    // scan-path answer; forceIndex proves the index path engaged.
    "q_collection_date" -> ((s, dir) => {
      val base = to_date(lit("2024-01-01"))
      val verts = s.range(50).select((col("id") + 1L).as("id"), lit("v").as("label"),
        array(date_add(base, ((col("id") + 1L) % 10).cast("int")),
          date_add(base, (((col("id") + 1L) % 5) + 10L).cast("int"))).as("dts"))
      val schema = graft.core.GraphSchema()
        .withPropertyKey(graft.core.PropertyKeyDef("dts",
          org.apache.spark.sql.types.DateType, graft.core.Cardinality.LIST))
        .withIndex(graft.core.IndexDef("byDts", graft.core.ElementCategory.VERTEX,
          Seq("dts"), composite = false))
      val g0 = graft.data.PropertyGraph(schema, verts,
        verts.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      val g = g0.withIndexTable("byDts",
        graft.index.Indexes.materializeCollection(g0, schema.indexes("byDts")))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("id")), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      Seq(
        n("cd_scan_d7", g0.V().has("dts", java.sql.Date.valueOf("2024-01-08")).vertices()),
        n("cd_ix_d7", g.V().has("dts", java.sql.Date.valueOf("2024-01-08")).forceIndex().vertices()),
        n("cd_ix_d12", g.V().has("dts", java.sql.Date.valueOf("2024-01-13")).forceIndex().vertices()),
        n("cd_ix_str", g.V().has("dts", "2024-01-08").forceIndex().vertices()),
        n("cd_ix_miss", g.V().has("dts", java.sql.Date.valueOf("2030-01-01")).forceIndex().vertices()),
      ).reduce(_ unionAll _)
    }),
    // DecimalType cells through the collection-index path: an Int operand
    // against decimal(10,2) cells is the divergence pin ("3" vs "3.00"
    // without the typed cast chain), plus exact-BigDecimal, double and miss
    // operands — index answers must equal the scan path cell-for-cell.
    "q_collection_decimal" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(10, 2)
      val verts = s.range(50).select((col("id") + 1L).as("id"), lit("v").as("label"),
        array((((col("id") + 1L) % 10).cast("double") + 0.25).cast(dec),
          ((col("id") + 1L) % 7).cast(dec)).as("decs"))
      val schema = graft.core.GraphSchema()
        .withPropertyKey(graft.core.PropertyKeyDef("decs", dec, graft.core.Cardinality.LIST))
        .withIndex(graft.core.IndexDef("byDecs", graft.core.ElementCategory.VERTEX,
          Seq("decs"), composite = false))
      val g0 = graft.data.PropertyGraph(schema, verts,
        verts.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      val g = g0.withIndexTable("byDecs",
        graft.index.Indexes.materializeCollection(g0, schema.indexes("byDecs")))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("id")), lit(0L)).cast("long").as("s"))
          .select(lit(caze).as("caze"), col("n"), col("s"))
      Seq(
        n("cc_scan_int3", g0.V().has("decs", 3).vertices()),
        n("cc_ix_int3", g.V().has("decs", 3).forceIndex().vertices()),
        n("cc_ix_exact", g.V().has("decs", BigDecimal("7.25")).forceIndex().vertices()),
        n("cc_ix_dbl", g.V().has("decs", 2.25).forceIndex().vertices()),
        n("cc_ix_miss", g.V().has("decs", 9.99).forceIndex().vertices()),
      ).reduce(_ unionAll _)
    }),
    // The size-gated index path in its NON-BROADCAST regime, end-to-end
    // against the oracle (PlanShapeSpec pins the plan shape; this pins the
    // RESULTS): with the cap forced to 1 id the low-selectivity BUILDING
    // lookup exceeds it, the forced hint drops, and the AQE-decided
    // semi-join must return exactly the scan answer. force-index proves the
    // index path still engaged.
    "q_index_gated" -> ((s, dir) => {
      val g0 = graph(s, dir)
      val ix = graft.core.IndexDef("gatedSeg", graft.core.ElementCategory.VERTEX,
        Seq("mktsegment"), onlyLabel = Some("customer"))
      val g = g0.copy(schema = g0.schema.copy(indexes = g0.schema.indexes + (ix.name -> ix)))
        .withIndexTable(ix.name, graft.index.Indexes.materialize(g0, ix))
      s.conf.set("graft.index.broadcast.maxRows", "1")
      try g.V().hasLabel("customer").has("mktsegment", "BUILDING").forceIndex().dataframe
        .select(col("uid"), col("mktsegment"))
      finally s.conf.unset("graft.index.broadcast.maxRows")
    }),
    "q_ixp_matrix" -> ((s, dir) => {
      val gV = ixpVertexStore(s)
      val gE = ixpEdgeStore(s)
      val I = graft.index.Indexes
      val EC = graft.core.ElementCategory
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("id")), lit(0L)).cast("long").as("ids"))
          .select(lit(caze).as("caze"), col("n"), col("ids"))
      val circle200 = graft.expr.Geo.circle(48.5, 0.5, 200.0)
      val circle1000 = graft.expr.Geo.circle(48.5, 0.5, 1000.0)
      val boxq = graft.expr.Geo.box(46.5, -0.5, 50.5, 10.5)
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      def vx = gV.V()
      def ed = gE.E()
      // TEXTSTRING dual index on the EDGE store — one key serving tokenized
      // AND exact-value queries on edges (the provider-level corner with no
      // prior probe twin)
      val etsIx = graft.core.IndexDef("ets", EC.EDGE, Seq("text"), composite = false,
        mappings = Map("text" -> graft.core.Mapping.TEXTSTRING))
      val gEts = gE.copy(schema = gE.schema.withIndex(etsIx))
      val etsT = I.materializeTextString(gEts, etsIx)
      val gEi = gEts.withIndexTable("ets", etsT)
      // per-element inverted table backing the phone lookups
      val phIx = graft.core.IndexDef("phones", EC.VERTEX,
        Seq("phone_list", "phone_set"), composite = false)
      val gVp0 = gV.copy(schema = gV.schema.withIndex(phIx))
      val gVp = gVp0.withIndexTable("phones", I.materializeCollection(gVp0, phIx))
      Seq(
        // token CONTAINS family (:190-196)
        n("c_world", vx.has("text", P.textContains("world")).vertices()),
        n("c_world_case", vx.has("text", P.textContains("wOrLD")).vertices()),
        n("c_bob_lc", vx.has("text", P.textContains("bob")).vertices()),
        n("c_worl", vx.has("text", P.textContains("worl")).vertices()),
        n("c_tomorrow_world", vx.has("text", P.textContains("Tomorrow world")).vertices()),
        n("c_world_hello", vx.has("text", P.textContains("WorLD HELLO")).vertices()),
        // CONTAINS_PREFIX (:211-215)
        n("cp_w", vx.has("text", P.textContainsPrefix("w")).vertices()),
        n("cp_wor", vx.has("text", P.textContainsPrefix("wOr")).vertices()),
        n("cp_bobi", vx.has("text", P.textContainsPrefix("bobi")).vertices()),
        // CONTAINS_REGEX (:217-226)
        n("cr_hel_any", vx.has("text", P.textContainsRegex("he[l]+(.*)")).vertices()),
        n("cr_hel_any2", vx.has("text", P.textContainsRegex("[h]+e[l]+(.*)")).vertices()),
        n("cr_hel_exact", vx.has("text", P.textContainsRegex("he[l]+")).vertices()),
        n("cr_el", vx.has("text", P.textContainsRegex("e[l]+(.*)")).vertices()),
        // exact STRING family on NAME (:234-253)
        n("s_eq_tom", vx.has("name", "Tomorrow is the world").vertices()),
        n("s_eq_world", vx.has("name", "world").vertices()),
        n("s_neq_bob", vx.has("name", P.neq("bob")).vertices()),
        n("s_p_tom", vx.has("name", P.textPrefix("Tomorrow")).vertices()),
        n("s_p_wor", vx.has("name", P.textPrefix("wor")).vertices()),
        n("s_r_tom", vx.has("name", P.textRegex("Tomo[r]+ow is.*world")).vertices()),
        n("s_r_tom_part", vx.has("name", P.textRegex("Tomorrow")).vertices()),
        // boolean trees (:255-292)
        n("a_world_hello", vx.has("text", P.textContains("world"))
          .has("text", P.textContains("hello")).vertices()),
        n("t_eq_m500", vx.has("time", -500L).vertices()),
        n("t_or", vx.has("time", P.or(P.eq(1001L), P.eq(-500L))).vertices()),
        n("not_world", vx.has("text", P.textContains("world").negate).vertices()),
        n("t500_not_world", vx.has("time", -500L)
          .has("text", P.textContains("world").negate).vertices()),
        n("or_and_world", vx.has("time", P.or(P.eq(1001L), P.eq(-500L)))
          .has("text", P.textContains("world")).vertices()),
        n("c_bob_cs", vx.has("text", P.textContains("Bob")).vertices()),
        n("w_gt6_world", vx.has("text", P.textContains("world"))
          .has("weight", P.gt(6.0)).vertices()),
        // ordered-result heads (:199-209) — orderBy+limit through the query
        // surface pins the provider's result ordering on mixed results
        n("o_time_desc_1", vx.has("text", P.textContains("world"))
          .orderBy("time", asc = false).limit(1).vertices()),
        n("o_weight_desc_1", vx.has("text", P.textContains("world"))
          .orderBy("weight", asc = false).limit(1).vertices()),
        n("o_time_asc_1", vx.has("text", P.textContains("world"))
          .orderBy("time").limit(1).vertices()),
        n("o_weight_asc_1", vx.has("text", P.textContains("world"))
          .orderBy("weight").limit(1).vertices()),
        n("o_joint_1", vx.has("text", P.textContains("world"))
          .orderBy("weight", asc = false).orderBy("time", asc = false)
          .limit(1).vertices()),
        // geo (:294-306)
        n("g_circle", vx.has("location", graft.expr.Geo.geoWithin(circle200)).vertices()),
        n("g_circle_tom", vx.has("text", P.textContains("tomorrow"))
          .has("location", graft.expr.Geo.geoWithin(circle200)).vertices()),
        n("g_box", vx.has("location", graft.expr.Geo.geoWithin(boxq)).vertices()),
        n("g_time_circle", vx.has("time", P.gte(-1000L)).has("time", P.lt(1010L))
          .has("location", graft.expr.Geo.geoWithin(circle1000)).vertices()),
        n("w_gt10", vx.has("weight", P.gt(10.0)).vertices()),
        n("blah_gt10", vx.has("blah", P.gt(10.0)).vertices()),
        // LIST/SET per-element point lookups (:329-343), index-backed
        n("pl_1", gVp.V().has("phone_list", "1").forceIndex().vertices()),
        n("pl_4", gVp.V().has("phone_list", "4").forceIndex().vertices()),
        n("pl_7", gVp.V().has("phone_list", "7").forceIndex().vertices()),
        n("ps_2", gVp.V().has("phone_set", "2").forceIndex().vertices()),
        n("ps_5", gVp.V().has("phone_set", "5").forceIndex().vertices()),
        n("ps_8", gVp.V().has("phone_set", "8").forceIndex().vertices()),
        // DATE comparisons (:345-352)
        n("d_eq1", vx.has("date", ts(1)).vertices()),
        n("d_eq2", vx.has("date", ts(2)).vertices()),
        n("d_eq3", vx.has("date", ts(3)).vertices()),
        n("d_gt2", vx.has("date", P.gt(ts(2))).vertices()),
        n("d_gte2", vx.has("date", P.gte(ts(2))).vertices()),
        n("d_lt2", vx.has("date", P.lt(ts(2))).vertices()),
        n("d_lte2", vx.has("date", P.lte(ts(2))).vertices()),
        n("d_neq2", vx.has("date", P.neq(ts(2))).vertices()),
        // RawQuery family (:314-327)
        n("r_phrase", I.indexQueryLucene(gV, EC.VERTEX, "v.text:\"Hello Bob\"")),
        n("r_phrase_off1", I.indexQueryLucene(gV, EC.VERTEX, "v.text:\"Hello Bob\"", 50, 1)),
        n("r_and", I.indexQueryLucene(gV, EC.VERTEX, "v.text:(world AND tomorrow)")),
        n("r_multi", I.indexQueryLucene(gV, EC.VERTEX, "v.text:(you there Hello Bob)")),
        n("r_multi_l1", I.indexQueryLucene(gV, EC.VERTEX, "v.text:(you there Hello Bob)", 1)),
        n("r_multi_l1o1",
          I.indexQueryLucene(gV, EC.VERTEX, "v.text:(you there Hello Bob)", 1, 1)),
        n("r_multi_l1o2",
          I.indexQueryLucene(gV, EC.VERTEX, "v.text:(you there Hello Bob)", 1, 2)),
        n("r_world", I.indexQueryLucene(gV, EC.VERTEX, "v.text:\"world\"")),
        n("r_range", I.indexQueryLucene(gV, EC.VERTEX, "v.time:[1000 TO 1020]")),
        n("r_comb", I.indexQueryLucene(gV, EC.VERTEX, "v.text:world AND v.time:1001")),
        n("r_name_phrase", I.indexQueryLucene(gV, EC.VERTEX, "v.name:\"Hello world\"")),
        // edge-store twins (multipleStores :159-161)
        n("ed_c_world", ed.has("text", P.textContains("world")).edges()),
        n("ed_c_tomorrow_world", ed.has("text", P.textContains("Tomorrow world")).edges()),
        n("ed_s_eq_tom", ed.has("name", "Tomorrow is the world").edges()),
        n("ed_t_eq_m500", ed.has("time", -500L).edges()),
        n("ed_w_gt6_world", ed.has("text", P.textContains("world"))
          .has("weight", P.gt(6.0)).edges()),
        n("ed_g_circle", ed.has("location", graft.expr.Geo.geoWithin(circle200)).edges()),
        n("ed_pl_4", ed.has("phone_list", "4").edges()),
        n("ed_ps_5", ed.has("phone_set", "5").edges()),
        n("ed_d_gte2", ed.has("date", P.gte(ts(2))).edges()),
        // TEXTSTRING dual on edges: same key, both predicate families, both
        // through the one registered index table
        n("ets_contains_world",
          I.lookupTextStringContains(gEi, etsT, "text", "world", EC.EDGE)),
        n("ets_eq_tom",
          I.lookupTextStringEquals(gEi, etsT, "text", "Tomorrow is the world", EC.EDGE)),
        n("ets_eq_world", I.lookupTextStringEquals(gEi, etsT, "text", "world", EC.EDGE)),
        n("ets_ix_world", gEi.E().has("text", P.textContains("world"))
          .forceIndex().edges()),
      ).reduce(_ unionAll _)
    }),
    // IndexProviderTest storeTest phase 2 (:355-405): document update/delete
    // sequences — doc4 added, doc2 deleted wholesale, doc3 loses its weight
    // field and gets new time/text, doc1's time/weight move — then the full
    // requery matrix. The mutation runs through applyMutations (overwrite-
    // by-id + cascade delete + index-table refresh), so the registered
    // mixed-text and collection tables are rebuilt across the update and
    // force-index proves the REBUILT indexes serve the post-update queries.
    "q_ixp_update" -> ((s, dir) => {
      import s.implicits._
      val I = graft.index.Indexes
      val EC = graft.core.ElementCategory
      val g0raw = ixpVertexStore(s)
      val txIx = graft.core.IndexDef("dtext", EC.VERTEX, Seq("text"), composite = false,
        mappings = Map("text" -> graft.core.Mapping.TEXT))
      val phIx = graft.core.IndexDef("phones", EC.VERTEX,
        Seq("phone_list", "phone_set"), composite = false)
      val g0s = g0raw.copy(schema = g0raw.schema.withIndex(txIx).withIndex(phIx))
      val g0 = g0s.withIndexTable("dtext", I.materializeMixed(g0s, txIx))
        .withIndexTable("phones", I.materializeCollection(g0s, phIx))
      val upd1 = ixpDocRows(s).filter(col("id") === 1L)
        .withColumn("time", lit(1005L)).withColumn("weight", lit(11.1))
        .withColumn("label", lit("doc"))
      val upd3 = ixpDocRows(s).filter(col("id") === 3L)
        .withColumn("weight", lit(null).cast("double"))
        .withColumn("time", lit(2000L))
        .withColumn("text", lit("Bob owns the world"))
        .withColumn("label", lit("doc"))
      val doc4 = s.range(1).select(lit(4L).as("id"),
        lit("I'ts all a big Bob").as("text"), lit("I'ts all a big Bob").as("name"),
        lit(-100L).as("time"), lit(11.2).as("weight"),
        graft.expr.Geo.point(48.0, 8.0).as("location"),
        array(lit("10"), lit("11"), lit("12")).as("phone_list"),
        array(lit("10"), lit("11")).as("phone_set"),
        lit(4L).cast("timestamp").as("date"), lit("doc").as("label"))
      val g = graft.data.GraphIO.applyMutations(g0,
        addVertices = Some(upd1.unionByName(upd3).unionByName(doc4)),
        deleteVertexIds = Some(Seq(2L).toDF("id")))
      val circle200 = graft.expr.Geo.circle(48.5, 0.5, 200.0)
      val circle1000 = graft.expr.Geo.circle(48.5, 0.5, 1000.0)
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("id")), lit(0L)).cast("long").as("ids"))
          .select(lit(caze).as("caze"), col("n"), col("ids"))
      def vx = g.V()
      Seq(
        n("u_world", vx.has("text", P.textContains("world")).vertices()),
        n("u_ix_world", vx.has("text", P.textContains("world")).forceIndex().vertices()),
        n("u_world_w6", vx.has("text", P.textContains("world"))
          .has("weight", P.gt(6.0)).vertices()),
        n("u_circle", vx.has("location", graft.expr.Geo.geoWithin(circle200)).vertices()),
        n("u_tom_circle", vx.has("text", P.textContains("tomorrow"))
          .has("location", graft.expr.Geo.geoWithin(circle200)).vertices()),
        n("u_time_circle", vx.has("time", P.gte(-1000L)).has("time", P.lt(1010L))
          .has("location", graft.expr.Geo.geoWithin(circle1000)).vertices()),
        n("u_w10", vx.has("weight", P.gt(10.0)).vertices()),
        n("u_blah", vx.has("blah", P.gt(10.0)).vertices()),
        n("u_c_bob", vx.has("text", P.textContains("bob")).vertices()),
        n("u_pl_10", vx.has("phone_list", "10").forceIndex().vertices()),
        n("u_pl_11", vx.has("phone_list", "11").forceIndex().vertices()),
        n("u_ps_10", vx.has("phone_set", "10").forceIndex().vertices()),
        n("u_pl_4", vx.has("phone_list", "4").forceIndex().vertices()),
        n("u_d_eq2", vx.has("date", ts(2)).vertices()),
        n("u_d_eq4", vx.has("date", ts(4)).vertices()),
      ).reduce(_ unionAll _)
    }),
    // IndexProviderTest.testRestore (:470-561): wholesale document-state
    // replacement across TWO stores — doc1 deleted then resurrected, doc2's
    // every field replaced, doc3 added, store2 gets its own doc1 state.
    // Restore ≡ overwrite-by-id/delete through applyMutations here (the
    // reference's restore() rewrites each document to exactly the given
    // entry list). Rows: (caze, n, ids).
    "q_ixp_restore" -> ((s, dir) => {
      import s.implicits._
      def pg(rows: Seq[(Long, String, Option[Long], Option[Double])]) = {
        val v = rows.toDF("id", "name", "time", "weight")
          .withColumn("label", lit("doc"))
        graft.data.PropertyGraph(graft.core.GraphSchema(), v,
          v.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      }
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("id")), lit(0L)).cast("long").as("ids"))
          .select(lit(caze).as("caze"), col("n"), col("ids"))
      val s1p0 = pg(Seq((1L, "first", Some(1L), Some(10.2)),
        (2L, "second", Some(2L), Some(4.7))))
      // restore #1: delete doc1, rewrite doc2, add doc3
      val s1p1 = graft.data.GraphIO.applyMutations(s1p0,
        addVertices = Some(Seq((2L, "not-second", 0L, 2.1), (3L, "third", 3L, 11.5))
          .toDF("id", "name", "time", "weight").withColumn("label", lit("doc"))),
        deleteVertexIds = Some(Seq(1L).toDF("id")))
      // restore #2: resurrect doc1 in store1; store2 gets its own doc1
      val s1p2 = graft.data.GraphIO.applyMutations(s1p1,
        addVertices = Some(Seq((1L, "first-restored", 4L, 7.0))
          .toDF("id", "name", "time", "weight").withColumn("label", lit("doc"))))
      val s2 = pg(Seq((1L, "first-in-second-store", Some(5L), Some(4.0))))
      Seq(
        n("rs_p0_w4", s1p0.V().has("weight", P.gte(4.0)).vertices()),
        n("rs_p1_w4", s1p1.V().has("weight", P.gte(4.0)).vertices()),
        n("rs_p1_third_t3", s1p1.V().has("name", "third").has("time", 3L).vertices()),
        n("rs_p1_notsecond_t0", s1p1.V().has("name", "not-second").has("time", 0L).vertices()),
        n("rs_p2_w4", s1p2.V().has("weight", P.gte(4.0)).vertices()),
        n("rs_p2_doc1", s1p2.V().has("name", "first-restored").has("time", 4L).vertices()),
        n("rs_s2_w4", s2.V().has("weight", P.gte(4.0)).vertices()),
        n("rs_s2_doc1", s2.V().has("name", "first-in-second-store").has("time", 5L).vertices()),
      ).reduce(_ unionAll _)
    }),
    // IndexProviderTest concurrent-update cases (:640-811): two transactions
    // apply to the same document IN COMMIT ORDER (the provider's merge is
    // last-write-wins per field, document deletes clear every field). Each
    // caze is one of the reference's conflict tests; the final state is
    // produced by applying the two op sets sequentially through
    // applyMutations, then queried with the same CONTAINS/EQUAL checks.
    "q_ixp_conflict" -> ((s, dir) => {
      import s.implicits._
      val baseText = "the quick brown fox jumps over the lazy dog"
      def pg0 = {
        val v = Seq((1L, baseText)).toDF("id", "text")
          .withColumn("label", lit("doc")).withColumn("name", lit(null).cast("string"))
        graft.data.PropertyGraph(graft.core.GraphSchema(), v,
          v.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      }
      def del(g: graft.data.PropertyGraph, id: Long) =
        graft.data.GraphIO.applyMutations(g, deleteVertexIds = Some(Seq(id).toDF("id")))
      def put(g: graft.data.PropertyGraph, id: Long, text: Option[String],
          name: Option[String]) =
        graft.data.GraphIO.applyMutations(g, addVertices = Some(
          Seq((id, text, name)).toDF("id", "text", "name").withColumn("label", lit("doc"))))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def cBrown(g: graft.data.PropertyGraph) =
        g.V().has("text", P.textContains("brown")).vertices()
      // testDeleteDocumentThenDeleteField: delete doc, then delete-field on
      // the gone doc (a no-op) — document must not exist
      val g1 = del(pg0, 1L)
      // testDeleteDocumentThenModifyField: the modify resurrects the doc
      val g2 = put(del(pg0, 1L), 1L, Some("the slow brown fox jumps over the lazy dog"), None)
      // testDeleteDocumentThenAddField: only the added field is visible
      val g3 = put(del(pg0, 1L), 1L, None, Some("jm keynes"))
      // testAddFieldThenDeleteDoc: the delete wins — nothing visible
      val g4 = del(put(pg0, 1L, Some(baseText), Some("jm keynes")), 1L)
      // testConflictingAdd on a second doc: last write wins
      val g5 = put(put(pg0, 2L, Some("sugar sugar"), None), 2L, Some("honey honey"), None)
      // testLastWriteWins on the same doc
      val g6 = put(put(pg0, 1L, Some("sugar sugar"), None), 1L, Some("honey honey"), None)
      // testUpdateAddition: overwrite replaces the old tokens
      val g7 = put(pg0, 1L, Some("its a sunny day"), None)
      // testUpdateDeletion: delete the TEXT field only (doc remains)
      val g8 = put(pg0, 1L, None, None)
      Seq(
        n("cf_del_delfield", cBrown(g1)),
        n("cf_del_modify", cBrown(g2)),
        n("cf_del_addfield_text", cBrown(g3)),
        n("cf_del_addfield_name", g3.V().has("name", "jm keynes").vertices()),
        n("cf_addfield_del_text", cBrown(g4)),
        n("cf_addfield_del_name", g4.V().has("name", "jm keynes").vertices()),
        n("cf_confadd_brown", cBrown(g5)),
        n("cf_confadd_sugar", g5.V().has("text", P.textContains("sugar")).vertices()),
        n("cf_confadd_honey", g5.V().has("text", P.textContains("honey")).vertices()),
        n("cf_lww_brown", cBrown(g6)),
        n("cf_lww_sugar", g6.V().has("text", P.textContains("sugar")).vertices()),
        n("cf_lww_honey", g6.V().has("text", P.textContains("honey")).vertices()),
        n("cf_upd_brown", cBrown(g7)),
        n("cf_upd_sunny", g7.V().has("text", P.textContains("sunny")).vertices()),
        n("cf_updel_brown", cBrown(g8)),
        n("cf_updel_doc", g8.V().vertices()),
      ).reduce(_ unionAll _)
    }),
    "q_tp_cardinality" -> ((s, dir) => {
      import s.implicits._
      import graft.data.MultiProperties._
      val emptyE = Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "label")
      def pg(v: DataFrame) = graft.data.PropertyGraph(graft.core.GraphSchema(), v, emptyE)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      // -- testPropertyCardinality
      val pv = Seq((1L, "v", Some("name1"), None: Option[Long]),
        (2L, "v", None: Option[String], Some(512L))).toDF("id", "label", "name", "uid")
      val pg2 = pg(pv).traversal.V(1L).property("name", lit("name2")).graph
        .traversal.V(2L).property("uid", lit(512L)).graph
      // -- testTinkerPopCardinality
      val tv = Seq((1L, "v", 1L, Some("t1")), (2L, "v", 2L, None: Option[String]))
        .toDF("id", "label", "iid", "name")
        .withColumn("names", when(col("id") === 2L,
          array(cell(lit("n1")), cell(lit("n2")))))
      val tg2 = pg(tv).traversal.V().has("iid", 1L).property("name", lit("t2")).graph
        .traversal.V().has("iid", 1L).property("name", lit("t3")).graph
      // -- testCollection add/remove/re-add/duplicate arc as pure cell ops
      def arcCases(tag: String, isSet: Boolean, v1: Column, v2: Column,
          extra: Column => Seq[(String, Column)] = _ => Nil): Seq[DataFrame] = {
        def add(p: Column, c: Column) = if (isSet) addValueSet(p, c) else addValueList(p, c)
        val p0 = array(cell(v1))
        val p1 = add(p0, cell(v2))
        val p2 = filter(p1, c => !(c.getField("value") <=> v1))
        val p3 = add(p2, cell(v1))
        val p4 = add(p3, cell(v1))
        def hasVal(p: Column, v: Column) = exists(p, c => c.getField("value") <=> v)
        val one = s.range(1)
        (Seq(
          s"${tag}_q1_initial" -> when(hasVal(p0, v1), 1L).otherwise(0L),
          s"${tag}_q_both" -> when(hasVal(p1, v1) && hasVal(p1, v2), 1L).otherwise(0L),
          s"${tag}_q1_removed" -> when(hasVal(p2, v1), 1L).otherwise(0L),
          s"${tag}_q2_removed" -> when(hasVal(p2, v2), 1L).otherwise(0L),
          s"${tag}_q_readd" -> when(hasVal(p3, v1) && hasVal(p3, v2), 1L).otherwise(0L),
          s"${tag}_dup_cells" -> size(p4).cast("long")) ++ extra(p1))
          .map { case (cz, c) => one.select(lit(cz).as("caze"), c.as("n")) }
      }
      val geoExtra: Column => Seq[(String, Column)] = p1 => Seq(
        "colS_geo_within1" -> when(exists(p1, c => graft.expr.Geo.within(
          c.getField("value"), graft.expr.Geo.circle(1.0, 1.0, 0.1))), 1L).otherwise(0L),
        "colS_geo_within2" -> when(exists(p1, c => graft.expr.Geo.within(
          c.getField("value"), graft.expr.Geo.circle(2.0, 2.0, 0.1))), 1L).otherwise(0L))
      (Seq(
        n("pc_name1", pg2.V().has("name", "name1").vertices()),
        n("pc_name2", pg2.V().has("name", "name2").vertices()),
        n("pc_uid512", pg2.V().has("uid", 512L).vertices()),
        n("tc_name_props", tg2.V().has("iid", 1L).has("name").vertices()),
        n("tc_name_t3", tg2.V().has("iid", 1L).has("name", "t3").vertices()),
        n("tc_names_props", explodeCells(tg2.vertices.filter(col("iid") === 2L), "names")),
        n("tc_all", tg2.V().vertices())) ++
        arcCases("colL_str", isSet = false, lit("Totoro"), lit("Hiro")) ++
        arcCases("colS_str", isSet = true, lit("Totoro"), lit("Hiro")) ++
        arcCases("colL_long", isSet = false, lit(1L), lit(2L)) ++
        arcCases("colS_long", isSet = true, lit(1L), lit(2L)) ++
        arcCases("colS_geo", isSet = true, graft.expr.Geo.point(1.0, 1.0),
          graft.expr.Geo.point(2.0, 2.0), geoExtra))
        .reduce(_ unionAll _)
    }),
    // TTL conformance block (TitanGraphTest.java:4626-5138): the reference's
    // wall-clock sleeps map to pinned ttlReadTime snapshots over fixed `_ts`
    // write provenance — same timeline, reproducible. Blocks: edge-TTL
    // timing (:4626), edge TTL + vertex-centric/global index reads (:4719),
    // property-key vs static-vertex-label TTL (:4758), edge TTL limited by
    // vertex TTL incl. the all-incident-edges-expire rule (:4840, non-cache
    // branch :4932-4935), unsetting TTL after compaction (:4950), and the
    // ~ttl implicit key on edges and vertices (:5056, :5103).
    "q_tp_ttl" -> ((s, dir) => {
      import s.implicits._
      val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
      def ts(ms: Long) = java.sql.Timestamp.from(t0.plusMillis(ms))
      def at(g: graft.data.PropertyGraph, ms: Long) =
        g.copy(schema = g.schema.copy(ttlReadTime = Some(ts(ms))))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      val emptyE = Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "label")
      import graft.core.{EdgeLabelDef, GraphSchema, PropertyKeyDef, VertexLabelDef}
      def vcq(g: graft.data.PropertyGraph, id: Long) =
        graft.query.VertexCentricQuery(g).onVertices(id)
      // -- testEdgeTTLTiming: likes 1s, dislikes 4s, indifferentTo none
      val etG = graft.data.PropertyGraph(
        GraphSchema(edgeLabels = Map(
          "likes" -> EdgeLabelDef("likes", ttlSeconds = Some(1L)),
          "dislikes" -> EdgeLabelDef("dislikes", ttlSeconds = Some(4L)),
          "indifferentTo" -> EdgeLabelDef("indifferentTo"))),
        Seq((1L, "v"), (2L, "v"), (3L, "v")).toDF("id", "label")
          .withColumn("_ts", lit(ts(0))),
        Seq((10L, 1L, 2L, "likes"), (11L, 2L, 1L, "dislikes"), (12L, 3L, 1L, "indifferentTo"))
          .toDF("id", "src", "dst", "label").withColumn("_ts", lit(ts(0))))
      // -- testEdgeTTLWithIndex: wavedAt 1s with time prop
      val eiG = graft.data.PropertyGraph(
        GraphSchema(edgeLabels = Map(
          "wavedAt" -> EdgeLabelDef("wavedAt", ttlSeconds = Some(1L)))),
        Seq((1L, "v"), (2L, "v")).toDF("id", "label").withColumn("_ts", lit(ts(0))),
        Seq((10L, 1L, 2L, "wavedAt", 42L)).toDF("id", "src", "dst", "label", "time")
          .withColumn("_ts", lit(ts(0))))
      // -- testPropertyTTLTiming: name 42s, place 1s, static event label 2s
      val ptG = graft.data.PropertyGraph(
        GraphSchema(
          propertyKeys = Map(
            "name" -> PropertyKeyDef("name", StringType, ttlSeconds = Some(42L)),
            "place" -> PropertyKeyDef("place", StringType, ttlSeconds = Some(1L))),
          vertexLabels = Map(
            "event" -> VertexLabelDef("event", static = true, ttlSeconds = Some(2L)))),
        Seq((20L, "event", "some event", "somewhere")).toDF("id", "label", "name", "place")
          .withColumn("_ts", lit(ts(0))), emptyE)
      // -- testEdgeTTLLimitedByVertexTTL: person 2s caps likes' 42s
      val evG = graft.data.PropertyGraph(
        GraphSchema(
          edgeLabels = Map(
            "likes" -> EdgeLabelDef("likes", ttlSeconds = Some(42L)),
            "dislikes" -> EdgeLabelDef("dislikes", ttlSeconds = Some(1L)),
            "indifferentTo" -> EdgeLabelDef("indifferentTo")),
          vertexLabels = Map(
            "person" -> VertexLabelDef("person", static = true, ttlSeconds = Some(2L)))),
        Seq((30L, "person"), (31L, "v")).toDF("id", "label").withColumn("_ts", lit(ts(0))),
        Seq((40L, 30L, 31L, "likes"), (41L, 30L, 31L, "dislikes"),
          (42L, 30L, 31L, "indifferentTo"))
          .toDF("id", "src", "dst", "label").withColumn("_ts", lit(ts(0))))
      // -- testUnsettingTTL: expire + compact under 2s TTL, unset, rewrite
      val unG1 = graft.data.PropertyGraph(
        GraphSchema(edgeLabels = Map("likes" -> EdgeLabelDef("likes", ttlSeconds = Some(2L)))),
        Seq((50L, "v"), (51L, "v")).toDF("id", "label").withColumn("_ts", lit(ts(0))),
        Seq((60L, 50L, 51L, "likes")).toDF("id", "src", "dst", "label")
          .withColumn("_ts", lit(ts(0))))
      val compacted = graft.data.GraphIO.compactExpired(at(unG1, 2500))
      val unG2 = graft.data.PropertyGraph(
        GraphSchema(edgeLabels = Map("likes" -> EdgeLabelDef("likes"))),
        compacted.vertices.unionByName(Seq((52L, "v"), (53L, "v")).toDF("id", "label")
          .withColumn("_ts", lit(ts(3000)))),
        compacted.edges.unionByName(Seq((61L, 52L, 53L, "likes"))
          .toDF("id", "src", "dst", "label").withColumn("_ts", lit(ts(3000)))))
      // -- ~ttl implicit key
      val tkG = graft.data.PropertyGraph(
        GraphSchema(
          edgeLabels = Map(
            "likes" -> EdgeLabelDef("likes", ttlSeconds = Some(86400L)),
            "hasLiked" -> EdgeLabelDef("hasLiked")),
          vertexLabels = Map(
            "event" -> VertexLabelDef("event", static = true, ttlSeconds = Some(1L)))),
        Seq((70L, "event"), (71L, "v")).toDF("id", "label").withColumn("_ts", lit(ts(0))),
        Seq((80L, 70L, 71L, "likes"), (81L, 70L, 71L, "hasLiked"))
          .toDF("id", "src", "dst", "label").withColumn("_ts", lit(ts(0))))
      def ttlSum(caze: String, d: DataFrame, isV: Boolean, sch: GraphSchema) =
        d.agg(coalesce(sum(coalesce(graft.expr.ImplicitKeys.resolve(sch, d, "~ttl", isV),
          lit(0L))), lit(0L)).cast("long").as("n"))
          .select(lit(caze).as("caze"), col("n"))
      val tk = at(tkG, 500)
      Seq(
        n("et_t0_v1out", vcq(at(etG, 500), 1L).direction(Direction.OUT).edges()),
        n("et_t0_v2out", vcq(at(etG, 500), 2L).direction(Direction.OUT).edges()),
        n("et_t0_v3out", vcq(at(etG, 500), 3L).direction(Direction.OUT).edges()),
        n("et_t1_v1out", vcq(at(etG, 1200), 1L).direction(Direction.OUT).edges()),
        n("et_t1_v2out", vcq(at(etG, 1200), 2L).direction(Direction.OUT).edges()),
        n("et_t1_v3out", vcq(at(etG, 1200), 3L).direction(Direction.OUT).edges()),
        n("et_t2_v1out", vcq(at(etG, 4500), 1L).direction(Direction.OUT).edges()),
        n("et_t2_v2out", vcq(at(etG, 4500), 2L).direction(Direction.OUT).edges()),
        n("et_t2_v3out", vcq(at(etG, 4500), 3L).direction(Direction.OUT).edges()),
        n("ei_pre_vc", vcq(at(eiG, 500), 1L).direction(Direction.OUT)
          .interval("time", 0L, 100L).edges()),
        n("ei_pre_global", at(eiG, 500).E().has("time", 42L).edges()),
        n("ei_post_vc", vcq(at(eiG, 1100), 1L).direction(Direction.OUT)
          .interval("time", 0L, 100L).edges()),
        n("ei_post_global", at(eiG, 1100).E().has("time", 42L).edges()),
        n("pt_t1_nameplace", at(ptG, 1100).V().has("name", "some event")
          .has("place", "somewhere").vertices()),
        n("pt_t1_name", at(ptG, 1100).V().has("name", "some event").vertices()),
        n("pt_t1_v", at(ptG, 1100).vertexById(20L)),
        n("pt_t2_name", at(ptG, 2100).V().has("name", "some event").vertices()),
        n("pt_t2_v", at(ptG, 2100).vertexById(20L)),
        n("ev_t1_v1", at(evG, 1100).vertexById(30L)),
        n("ev_t1_in_likes", vcq(at(evG, 1100), 31L).direction(Direction.IN)
          .labels("likes").edges()),
        n("ev_t1_in_dislikes", vcq(at(evG, 1100), 31L).direction(Direction.IN)
          .labels("dislikes").edges()),
        n("ev_t1_in_indiff", vcq(at(evG, 1100), 31L).direction(Direction.IN)
          .labels("indifferentTo").edges()),
        n("ev_t2_v1", at(evG, 2100).vertexById(30L)),
        n("ev_t2_in_likes", vcq(at(evG, 2100), 31L).direction(Direction.IN)
          .labels("likes").edges()),
        n("ev_t2_in_dislikes", vcq(at(evG, 2100), 31L).direction(Direction.IN)
          .labels("dislikes").edges()),
        n("ev_t2_in_indiff", vcq(at(evG, 2100), 31L).direction(Direction.IN)
          .labels("indifferentTo").edges()),
        n("un_t1_v", at(unG1, 2500).V().vertices()),
        n("un_t1_e", at(unG1, 2500).E().edges()),
        n("un_t2_v", at(unG2, 5500).V().vertices()),
        n("un_t2_e", at(unG2, 5500).E().edges()),
        ttlSum("tk_e_likes", tk.E().has("label", "likes").edges(), isV = false, tk.schema),
        ttlSum("tk_e_hasliked", tk.E().has("label", "hasLiked").edges(), isV = false, tk.schema),
        ttlSum("tk_v_event", tk.vertexById(70L), isV = true, tk.schema),
        ttlSum("tk_v_plain", tk.vertexById(71L), isV = true, tk.schema),
      ).reduce(_ unionAll _)
    }),
    // Adversarial sweep of the vertex-centric conformance fixture: anchors
    // drawn by a seeded LCG over the vs[] range instead of the fixed
    // vertices 1/2 — the fixture's regular structure (labels cycling by
    // i%3, every vs[i] with exactly 2 OUT + 2 IN edges to the anchors)
    // cannot mask an orientation bug when the multi-anchor frontier is
    // arbitrary. Counts AND Σtime pins derive from pure anchor-index
    // arithmetic, mirrored verbatim by the oracle.
    "q_tp_vcquery_seeded" -> ((s, dir) => {
      import graft.query.Direction._
      val g = tpVcFixture(s)
      // seeded anchor draw: i_k = 1 + ((1103515245·7 + k·12347) mod 9999),
      // k in 0..11 (dedup below) — vs-vertex ids are 10 + i. The stride is
      // COPRIME TO 3 on purpose: base and 9999 are both ≡0 (mod 3), so a
      // stride ≡0 (mod 3) (like 12345) would pin every anchor in the
      // i%3=1 class and the sweep would never exercise the knows/connect
      // label orientations; 12347 ≡ 2 (mod 3) walks all three classes. The
      // sa_classes row pins that non-degeneracy in the oracle itself.
      val anchors = s.range(12).select(
        (lit(1L) + (lit(1103515245L * 7) + col("id") * 12347L) % 9999L).as("i"))
        .distinct()
      val frontier = anchors.select((col("i") + 10L).as("vid"))
      def q = graft.query.VertexCentricQuery(g).onFrontier(frontier)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("time")), lit(0L)).cast("long").as("st"))
          .select(lit(caze).as("caze"), col("n"), col("st"))
      Seq(
        // non-degeneracy pin: the 12 anchors must span ALL THREE i%3 label
        // classes (a degenerate draw would zero the knows/connect cases)
        anchors.agg(count_distinct(col("i") % 3).cast("long").as("n"))
          .select(lit("sa_classes").as("caze"), col("n"), lit(0L).as("st")),
        n("sa_out_all", q.direction(OUT).edges()),
        n("sa_in_all", q.direction(IN).edges()),
        n("sa_both_all", q.direction(BOTH).edges()),
        n("sa_out_knows", q.direction(OUT).labels("knows").edges()),
        n("sa_out_connect", q.direction(OUT).labels("connect").edges()),
        n("sa_in_frienddesc", q.direction(IN).labels("friendDesc").edges()),
        n("sa_out_tgte5000", q.direction(OUT).has("time", P.gte(5000L)).edges()),
        n("sa_adj1_both", q.direction(BOTH).adjacent(1L).edges()),
        n("sa_both_limit2", q.direction(BOTH).orderBy("time").limit(2).edges()),
      ).reduce(_ unionAll _)
    }),
    // testConditionalIndexing (TitanIndexTest.java:541-720): label-scoped
    // (indexOnly) mixed indexes — 200 person/org-alternating vertices,
    // name=text=strs[i%4], weight=(i%5)+0.5; plus testCompositeAndMixed
    // Indexing (:723-792): composite (name,weight) vs mixed (weight,text)
    // selection with a residual has('flag') — 100 vertices, flag=true.
    // Rows: (caze, n, s) with s = Σ(2·weight) over ordered-limit prefixes
    // (weights are half-steps, so 2w is integral).
    "q_tix_conditional" -> ((s, dir) => {
      val strs = Seq("houseboat", "humanoid", "differential", "extraordinary")
      def base(numV: Int) = s.range(numV).select(col("id").as("i"),
        expr("element_at(array('houseboat','humanoid','differential','extraordinary')," +
          " CAST(id % 4 AS INT) + 1)").as("nm"),
        ((col("id") % 5).cast("double") + 0.5).as("weight"))
      val cv = base(200).select((col("i") + 1L).as("id"),
        when(col("i") % 2 === 0, "person").otherwise("org").as("label"),
        col("nm").as("name"), col("nm").as("text"), col("weight"))
      val cg = graft.data.PropertyGraph(graft.core.GraphSchema(), cv,
        cv.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      val mv = base(100).select((col("i") + 1L).as("id"), lit("v").as("label"),
        col("nm").as("name"), col("nm").as("text"), col("weight"), lit(true).as("flag"))
      val mg = graft.data.PropertyGraph(graft.core.GraphSchema(), mv,
        mv.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"), lit(0L).as("s"))
      def np(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n"), coalesce(sum(col("weight") * 2), lit(0.0))
          .cast("long").as("s")).select(lit(caze).as("caze"), col("n"), col("s"))
      Seq(
        n("cx_s0_person", cg.V().has("text", P.textContains(strs(0)))
          .has("label", "person").vertices()),
        np("cx_s0_person_wdesc10", cg.V().has("text", P.textContains(strs(0)))
          .has("label", "person").orderBy("weight", asc = false).limit(10).vertices()),
        n("cx_s3_org", cg.V().has("text", P.textContains(strs(3)))
          .has("label", "org").vertices()),
        np("cx_s1_org_wdesc10", cg.V().has("text", P.textContains(strs(1)))
          .has("label", "org").orderBy("weight", asc = false).limit(10).vertices()),
        n("cx_s0_w25_person", cg.V().has("text", P.textContains(strs(0)))
          .has("weight", 2.5).has("label", "person").vertices()),
        n("cx_n2_person", cg.V().has("name", strs(2)).has("label", "person").vertices()),
        n("cx_n3_person", cg.V().has("name", strs(3)).has("label", "person").vertices()),
        n("cx_n0", cg.V().has("name", strs(0)).vertices()),
        n("cx_n2_s2_person", cg.V().has("name", strs(2))
          .has("text", P.textContains(strs(2))).has("label", "person").vertices()),
        np("cx_n0_s0_person_winc10", cg.V().has("name", strs(0))
          .has("text", P.textContains(strs(0))).has("label", "person")
          .orderBy("weight").limit(10).vertices()),
        n("cx_s0", cg.V().has("text", P.textContains(strs(0))).vertices()),
        np("cx_s0_winc10", cg.V().has("text", P.textContains(strs(0)))
          .orderBy("weight").limit(10).vertices()),
        n("cm_n0", mg.V().has("name", strs(0)).vertices()),
        n("cm_s0", mg.V().has("text", P.textContains(strs(0))).vertices()),
        n("cm_s0_flag", mg.V().has("text", P.textContains(strs(0))).has("flag").vertices()),
        n("cm_n0_w15", mg.V().has("name", strs(0)).has("weight", 1.5).vertices()),
        n("cm_n0_w15_flag", mg.V().has("name", strs(0)).has("weight", 1.5)
          .has("flag").vertices()),
        n("cm_s2_w25", mg.V().has("text", P.textContains(strs(2)))
          .has("weight", 2.5).vertices()),
        n("cm_s2_w25_flag", mg.V().has("text", P.textContains(strs(2)))
          .has("weight", 2.5).has("flag").vertices()),
        n("cm_s3_n3_w35", mg.V().has("text", P.textContains(strs(3)))
          .has("name", strs(3)).has("weight", 3.5).vertices()),
        n("cm_s3_n3_w35_flag", mg.V().has("text", P.textContains(strs(3)))
          .has("name", strs(3)).has("weight", 3.5).has("flag").vertices()),
      ).reduce(_ unionAll _)
    }),
    // ---- 2.M native expression: array_jaccard over name tokens ----
    "q_array_jaccard" -> ((s, dir) => {
      val p = graph(s, dir).V().hasLabel("part").dataframe
        .select(col("uid"), graft.expr.Text.tokens(col("name")).as("t"))
      val probe = array(lit("red"), lit("widget"))
      p.select(col("uid"), graft.functions.ArrayJaccard(col("t"), probe).as("j"))
        .filter(col("j") > 0.0)
    }),
    // ---- Reference OLAP conformance corpus (titan-test olap/OLAPTest.java).
    //      testVertexScan (:91-142): full-scan ScanJob over the random-graph
    //      twin — vertex count, Σ out-degree, per-vertex outdeg==uid,
    //      propertyCount('uid')==1, propertyCount('values')==numvals (each
    //      LIST cell is a property element). ----
    "q_tp_olap_scan" -> ((s, dir) => {
      import graft.query.Direction
      val g = tpOlapFixture(s)
      def vq = graft.query.VertexCentricQuery(g)
      val uid = g.vertices.select(col("id").as("vid"), col("uid"), col("numvals"))
      val deg = vq.direction(Direction.OUT).labels("knows").edgeCount()
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        n("scan_numv", g.V().vertices()),
        n("scan_uid_pos", g.V().has("uid", P.gt(0L)).vertices()),
        deg.agg(coalesce(sum(col("count")), lit(0L)).as("n"))
          .select(lit("scan_deg_total").as("caze"), col("n")),
        n("scan_deg_eq_uid", deg.join(uid, Seq("vid")).filter(col("count") === col("uid"))),
        n("scan_uid_props", vq.propertyCount("uid").filter(col("count") === 1L)),
        n("scan_numvals_props", vq.propertyCount("values").join(uid, Seq("vid"))
          .filter(col("count") === col("numvals"))),
        n("scan_nume", g.E().edges()),
      ).reduce(_ unionAll _)
    }),
    // DegreeCounter through the BSP runner (OLAPTest.degreeCounting:297-305 +
    // degreeCountingDistance:307-334): one superstep stores each vertex's
    // OUT-degree (messages travel through the in-edge scope to edge sources);
    // two supersteps forward the stored degree one hop, yielding
    // Σ outdeg(w) over out-neighbors with parallel-edge multiplicity. The
    // full 100-vertex distribution is pinned (deg1 == uid for every vertex,
    // the reference's per-entry assertion at :292-296).
    "q_tp_olap_degree" -> ((s, dir) => {
      import s.implicits._
      val g = tpOlapFixture(s)
      val d1 = graft.olap.VertexProgramRunner.run(g, new graft.olap.DegreeCounter, 1)
        .vertices.toDF("id", "deg1")
      val d2 = graft.olap.VertexProgramRunner.run(g, new graft.olap.DegreeCounter, 2)
        .vertices.toDF("id", "deg2")
      d1.join(d2, Seq("id")).select(col("id"), col("deg1"), col("deg2"))
    }),
    // testPageRank (OLAPTest.java:496-563 + expand():472-488): the 6-ary
    // likes-tree of diameter 5 (numV = (6⁶-1)/5 = 9331, edges child→parent).
    // All vertices of a depth are rank-symmetric, so the closed form
    // r_d = 0.15 + 0.85·6·r_{d+1} (leaves pinned at 0.15) is exact; the
    // probe runs the engine's integer fixed point and pins per-depth
    // (count, min rank, max rank) — min==max proves the symmetry survived
    // the distributed execution.
    "q_tp_olap_pagerank" -> ((s, dir) => {
      val verts = s.range(9331).select((col("id") + 1L).as("id"), lit("v").as("label"),
        when(col("id") >= 1555L, 5L).when(col("id") >= 259L, 4L)
          .when(col("id") >= 43L, 3L).when(col("id") >= 7L, 2L)
          .when(col("id") >= 1L, 1L).otherwise(0L).as("depth"))
      val edges = s.range(1, 9331).select((col("id") + 20000L).as("id"),
        (col("id") + 1L).as("src"),
        expr("CAST((id - 1) DIV 6 + 1 AS BIGINT)").as("dst"),
        lit("likes").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      graft.olap.Analytics.pageRankFixedPoint(g, iterations = 10)
        .join(verts.select(col("id"), col("depth")), Seq("id"))
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n"), min(col("rank_fp")).as("rank_min"),
          max(col("rank_fp")).as("rank_max"))
    }),
    // testShortestDistance (OLAPTest.java:565-636 + growVertex():610-622):
    // weighted single-source distances over a 500-node random tree (node k
    // attaches below p(k) = LCG(k) mod k with edge weight 1..3, edges
    // child→parent 'connect'). The reference program's message scope sends
    // through the sender's in-edges to edge SOURCES (root→children, i.e.
    // dst→src), so the engine kernel runs on the reversed edge view; every
    // computed distance must equal the construction's depth-sum, which the
    // oracle rebuilds with a recursive CTE.
    "q_tp_olap_sssp" -> ((s, dir) => {
      val verts = s.range(500).select((col("id") + 1L).as("id"), lit("v").as("label"))
      val edges = s.range(1, 500)
        .select(col("id").as("k"), expr("(1103515245 * id + 12345) % 2147483648").as("h"))
        .select((col("k") + 30000L).as("id"), (col("k") + 1L).as("src"),
          (col("h") % col("k") + 1L).as("dst"), lit("connect").as("label"),
          (expr("h DIV 16") % 3L + 1L).as("distance"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      val rev = g.copy(edges = g.edges.select(col("id"), col("dst").as("src"),
        col("src").as("dst"), col("label"), col("distance")))
      graft.olap.Analytics.shortestDistance(rev, source = 1L, weightCol = Some("distance"))
        .select(col("id"), col("distance").cast("long").as("distance"))
    }),
    // ---- Eventual-consistency conformance corpus (titan-test
    //      TitanEventualGraphTest.java:77-208, testTimestampSetting +
    //      testTimestampedEdgeUpdates): timestamped mutation logs resolve
    //      last-write-wins per cell — an out-of-order deletion (older ts
    //      than the standing write) is a no-op, per-property ~timestamp is
    //      readable, element tombstones beat older cells. Checkpoints
    //      replay the reference's transaction prefixes (_txn tag). ----
    "q_tp_eventual" -> ((s, dir) => {
      import s.implicits._
      val vlog = Seq(
        // tx1@100: v1(name=a), v2(name=b, age=42)
        (1L, Option("v"), 100L, "put", None: Option[Seq[String]],
          Option("a"), None: Option[String], None: Option[String], 1L),
        (2L, Option("v"), 100L, "put", None, Option("b"), Option("42"), None, 1L),
        // tx2@1000: v1 -name, +address=xyz
        (1L, None, 1000L, "put", Option(Seq("name")), None, None, Option("xyz"), 2L),
        // tx3@200: v1 -address — OLDER than the @1000 write, must lose
        (1L, None, 200L, "put", Option(Seq("address")), None, None, None, 3L),
        // tx4@2000: v2 age=15; tx5@1500: v2 age=16 — older, must lose
        (2L, None, 2000L, "put", None, None, Option("15"), None, 4L),
        (2L, None, 1500L, "put", None, None, Option("16"), None, 5L),
        // testTimestampedEdgeUpdates block
        (10L, Option("v"), 100L, "put", None, None, None, None, 11L),
        (11L, Option("v"), 100L, "put", None, None, None, None, 11L),
      ).toDF("id", "label", "_ts", "_op", "_dels", "name", "age", "address", "_txn")
      val elog = Seq(
        (100L, Option(2L), Option(1L), Option("parent"), 1000L, "put",
          None: Option[Seq[String]], None: Option[Long], 2L),
        (100L, None, None, None, 2000L, "del", None, None, 4L),
        (200L, Option(10L), Option(11L), Option("related"), 100L, "put", None, Option(25L), 11L),
        (200L, None, None, None, 200L, "put", None, Option(125L), 12L),
        (200L, None, None, None, 300L, "del", None, None, 13L),
      ).toDF("id", "src", "dst", "label", "_ts", "_op", "_dels", "time", "_txn")
      def at(k: Long) = graft.data.TimestampedLog.resolve(
        vlog.filter(col("_txn") <= k), elog.filter(col("_txn") <= k))
      def props(g: graft.data.PropertyGraph, id: Long) =
        graft.query.VertexCentricQuery(g).onVertices(id).properties()
      def vcq(g: graft.data.PropertyGraph, id: Long) =
        graft.query.VertexCentricQuery(g).onVertices(id)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      import graft.query.Direction
      val (g1, g2, g3, g4, g5) = (at(1), at(2), at(3), at(4), at(5))
      val (g11, g12, g13) = (at(11), at(12), at(13))
      Seq(
        n("ev_tx1_name_ts100", props(g1, 1L)
          .filter(col("key") === "name" && col("ts") === 100L)),
        vcq(g2, 1L).propertyCount()
          .agg(coalesce(sum(col("count")), lit(0L)).cast("long").as("n"))
          .select(lit("ev_tx2_v1_pcount").as("caze"), col("n")),
        n("ev_tx2_v1_ts_gt10", props(g2, 1L).filter(col("ts") > 10L)),
        n("ev_tx2_v1_ts_eq100", props(g2, 1L).filter(col("ts") === 100L)),
        n("ev_tx2_has_name", g2.V().has("name").vertices()),
        n("ev_tx2_address_xyz", g2.V().has("address", "xyz").vertices()),
        n("ev_tx2_edge_in", vcq(g2, 1L).direction(Direction.IN).labels("parent").edges()),
        n("ev_tx2_edge_byid", g2.E().edges().filter(col("id") === 100L)),
        n("ev_tx3_address_still", g3.V().has("address", "xyz").vertices()),
        n("ev_tx4_age15", g4.V().has("age", "15").vertices()),
        n("ev_tx4_edge_gone", g4.E().edges().filter(col("id") === 100L)),
        n("ev_tx5_age15", g5.V().has("age", "15").vertices()),
        n("ev_tx5_age16", g5.V().has("age", "16").vertices()),
        n("ev_upd_time25", g11.E().has("time", 25L).edges()),
        n("ev_upd_time125", g12.E().has("time", 125L).edges()),
        n("ev_upd_out", vcq(g12, 10L).direction(Direction.OUT).labels("related").edges()),
        n("ev_upd_gone", g13.E().edges().filter(col("id") === 200L)),
      ).reduce(_ unionAll _)
    }),
    // ---- Implicit-key conformance (testImplicitKey, TitanGraphTest.java:
    //      1670-1697 + testArrayEqualityUsingImplicitKey:1700-1720): `~id`
    //      on edges matches a composite RelationIdentifier, `~nid` the
    //      relation's internal long id, `~adjacent` the other endpoint;
    //      binary-array property values compare by CONTENT (two distinct
    //      byte[] instances with equal bytes both match). The reference's
    //      IllegalArgumentException on a nonexistent ~adjacent handle is a
    //      tx-cache validation we intentionally relax (see
    //      VertexCentricQuery.has scaladoc). ----
    "q_tp_implicit" -> ((s, dir) => {
      import s.implicits._
      import graft.query.Direction
      val v = Seq(
        (1L, "vertex", Option("Dan"), None: Option[Array[Byte]]),
        (2L, "vertex", None, None),
        (3L, "vertex", None, Option(Array[Byte](127, 0, 0, 1)))
      ).toDF("id", "label", "name", "single")
      val e = Seq((100L, 1L, 2L, "knows")).toDF("id", "src", "dst", "label")
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
      val eid = graft.data.RelationIdentifier(100L, 1L, "knows", Some(2L))
      def vq = graft.query.VertexCentricQuery(g).onVertices(1L)
        .direction(Direction.BOTH).labels("knows")
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        n("impl_v_id", g.V().has("~id", 1L).vertices()),
        n("impl_v_label_default", g.V().has("~label", "vertex").vertices()),
        n("impl_e_label", g.E().has("~label", "knows").edges()),
        n("impl_vc_eid", vq.has("~id", eid).edges()),
        n("impl_vc_eid_miss",
          vq.has("~id", graft.data.RelationIdentifier(4L, 5L, "6", Some(7L))).edges()),
        n("impl_vc_nid", vq.has("~nid", 100L).edges()),
        n("impl_vc_nid_miss", vq.has("~nid", 110111L).edges()),
        n("impl_edge_lookup", graft.data.RelationIdentifier.lookup(g, eid)),
        n("impl_adjacent", vq.has("~adjacent", 2L).edges()),
        n("impl_adjacent_int", vq.has("~adjacent", 2).edges()),
        n("impl_array_eq",
          g.V().has("single", Array[Byte](127, 0, 0, 1)).vertices()),
        n("impl_array_eq_copy",
          g.V().has("single", Array[Byte](127, 0, 0, 1)).vertices()),
      ).reduce(_ unionAll _)
    }),
    // ---- Index-retrieval conformance (TitanGraphTest.java:4399-4486).
    //      testLargeJointIndexRetrieval (:4399): two single-key composite
    //      indexes answer an AND by intersecting — 17 sids × 7 colors × 200.
    //      testIndexQueryWithLabelsAndContainsIN (:4423): label-scoped unique
    //      composite + Contain.IN + ~label constraint (a decoy vertex under
    //      another label must NOT leak through the scoped index).
    //      testLimitWithMixedIndexCoverage (:4451): indexed equality + an
    //      UNINDEXED residual + limit(1) must return the residual-matching
    //      row, not an arbitrary index hit cut short. ----
    "q_tp_indexretrieval" -> ((s, dir) => {
      import graft.core.{ElementCategory, GraphSchema, IndexDef, PropertyKeyDef}
      import org.apache.spark.sql.types.{LongType, StringType}
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      val noEdges = s.range(0).select(col("id"), col("id").as("src"),
        col("id").as("dst"), lit("x").as("label"))
      // joint-index block
      val colors = array(Seq("blue", "red", "yellow", "brown", "green",
        "orange", "purple").map(lit): _*)
      val jv = s.range(23800).select((col("id") + 1L).as("id"), lit("v").as("label"),
        element_at(colors, (col("id") % 7).cast("int") + 1).as("color"),
        (col("id") % 17L).as("sid"))
      val jSchema = GraphSchema()
        .withPropertyKey(PropertyKeyDef("sid", LongType))
        .withPropertyKey(PropertyKeyDef("color", StringType))
        .withIndex(IndexDef("bySid", ElementCategory.VERTEX, Seq("sid")))
        .withIndex(IndexDef("byColor", ElementCategory.VERTEX, Seq("color")))
      val jg0 = graft.data.PropertyGraph(jSchema, jv, noEdges)
      val jg = jg0
        .withIndexTable("bySid", graft.index.Indexes.materialize(jg0, jSchema.indexes("bySid")))
        .withIndexTable("byColor", graft.index.Indexes.materialize(jg0, jSchema.indexes("byColor")))
      // Contain.IN + label-scope block
      import s.implicits._
      val cv = Seq((1L, "labelName", "foo"), (2L, "labelName", "bar"),
        (3L, "otherLabel", "foo")).toDF("id", "label", "uid")
      val cSchema = GraphSchema()
        .withPropertyKey(PropertyKeyDef("uid", StringType))
        .withIndex(IndexDef("uidIndex", ElementCategory.VERTEX, Seq("uid"),
          unique = true, onlyLabel = Some("labelName")))
      val cg0 = graft.data.PropertyGraph(cSchema, cv, noEdges)
      val cg = cg0.withIndexTable("uidIndex",
        graft.index.Indexes.materialize(cg0, cSchema.indexes("uidIndex")))
      val cIn = cg.V().has("uid", P.within("foo", "bar"))
        .has("~label", "labelName").vertices()
      // mixed-coverage limit block (vt indexed, firstname NOT indexed)
      val mv = Seq((1L, "u", "user", "alice"), (2L, "u", "user", "bob"))
        .toDF("id", "label", "vt", "firstname")
      val mSchema = GraphSchema()
        .withPropertyKey(PropertyKeyDef("vt", StringType))
        .withIndex(IndexDef("byVt", ElementCategory.VERTEX, Seq("vt")))
      val mg0 = graft.data.PropertyGraph(mSchema, mv, noEdges)
      val mg = mg0.withIndexTable("byVt",
        graft.index.Indexes.materialize(mg0, mSchema.indexes("byVt")))
      def one(fn: String) = mg.V().has("vt", "user").has("firstname", fn)
        .limit(1).vertices()
      Seq(
        n("ji_sid8", jg.V().has("sid", 8L).vertices()),
        n("ji_color_yellow", jg.V().has("color", "yellow").vertices()),
        n("ji_joint", jg.V().has("sid", 11L).has("color", "brown").vertices()),
        n("ci_in_label", cIn),
        n("ci_in_label_all_match", cIn.filter(col("label") === "labelName")),
        n("ml_bob", one("bob")
          .filter(col("firstname") === "bob" && col("vt") === "user")),
        n("ml_alice", one("alice")
          .filter(col("firstname") === "alice" && col("vt") === "user")),
      ).reduce(_ unionAll _)
    }),
    // ---- Vertex-centric index with NULL cells (testVertexCentricIndexWithNull,
    //      TitanGraphTest.java:4536-4576): five parallel bought-edges, time
    //      set on only three — sort-key-indexed reads must keep the null-cell
    //      edges reachable (hasNot('time') = 2) and every Cmp range must skip
    //      them (orderings are false on null). ----
    "q_tp_vc_null" -> ((s, dir) => {
      import s.implicits._
      import graft.query.Direction
      import graft.core.{EdgeLabelDef, GraphSchema, PropertyKeyDef, RelationIndexDef, SortOrder}
      import org.apache.spark.sql.types.LongType
      val v = Seq((1L, "v"), (2L, "v")).toDF("id", "label")
      val e = Seq(
        (10L, 1L, 2L, "bought", Option(1L)), (11L, 1L, 2L, "bought", Option(2L)),
        (12L, 1L, 2L, "bought", Option(3L)), (13L, 1L, 2L, "bought", None),
        (14L, 1L, 2L, "bought", None)
      ).toDF("id", "src", "dst", "label", "time")
      val schema = GraphSchema()
        .withPropertyKey(PropertyKeyDef("time", LongType))
        .withEdgeLabel(EdgeLabelDef("bought"))
        .withRelationIndex(RelationIndexDef("byTimeDesc", "bought", Seq("time"), SortOrder.DESC))
        .withRelationIndex(RelationIndexDef("byTimeIncr", "bought", Seq("time")))
      val g = graft.data.PropertyGraph(schema, v, e)
      def vq = graft.query.VertexCentricQuery(g).onVertices(1L)
        .direction(Direction.OUT).labels("bought")
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        n("vcn_all", vq.edges()),
        n("vcn_t1", vq.has("time", 1L).edges()),
        n("vcn_lt3_gt1", vq.has("time", P.lt(3L)).has("time", P.gt(1L)).edges()),
        n("vcn_lt5", vq.has("time", P.lt(5L)).edges()),
        n("vcn_gt0", vq.has("time", P.gt(0L)).edges()),
        n("vcn_lt3", vq.has("time", P.lt(3L)).edges()),
        n("vcn_gt2", vq.has("time", P.gt(2L)).edges()),
        n("vcn_hasnot", vq.hasNot("time").edges()),
        n("vcn_all_again", vq.edges()),
      ).reduce(_ unionAll _)
    }),
    // ---- Schema rename conformance (testSchemaNameChange,
    //      TitanGraphTest.java:1205-1276): rename an edge label (knows →
    //      know), its relation index (byTime → overTime), a vertex label
    //      (people → person) and a graph index (timeIndex → byTime); every
    //      query answers under the NEW names, nothing under the old, and
    //      the composite index keeps serving through its renamed entry. ----
    "q_tp_rename" -> ((s, dir) => {
      import s.implicits._
      import graft.core._
      import graft.query.Direction
      val schema = GraphSchema()
        .withPropertyKey(PropertyKeyDef("time", org.apache.spark.sql.types.LongType))
        .withEdgeLabel(EdgeLabelDef("knows"))
        .withVertexLabel(VertexLabelDef("people"))
        .withRelationIndex(RelationIndexDef("byTime", "knows", Seq("time")))
        .withIndex(IndexDef("timeIndex", ElementCategory.VERTEX, Seq("time")))
      val v = Seq((1L, "people", 5L)).toDF("id", "label", "time")
      val e = Seq((10L, 1L, 1L, "knows", 11L)).toDF("id", "src", "dst", "label", "time")
      val g0a = graft.data.PropertyGraph(schema, v, e)
      val g0 = g0a.withIndexTable("timeIndex",
        graft.index.Indexes.materialize(g0a, schema.indexes("timeIndex")))
      val g = graft.olap.GraphOps.renameIndex(
        graft.olap.GraphOps.renameVertexLabel(
          graft.olap.GraphOps.renameEdgeLabel(g0, "knows", "know"),
          "people", "person"),
        "timeIndex", "byTimeG")
      val g2 = g.copy(schema = g.schema.renameRelationIndex("byTime", "overTime"))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def one(caze: String, ok: Boolean) =
        s.range(1).select(lit(caze).as("caze"), lit(if (ok) 1L else 0L).as("n"))
      def vq = graft.query.VertexCentricQuery(g2).onVertices(1L)
      Seq(
        n("rn_pre_time5", g0.V().has("time", 5L).hasLabel("people").vertices()),
        one("rn_mgmt", g2.schema.edgeLabels.contains("know") &&
          !g2.schema.edgeLabels.contains("knows") &&
          g2.schema.relationIndexes.contains("overTime") &&
          !g2.schema.relationIndexes.contains("byTime") &&
          g2.schema.relationIndexes("overTime").edgeLabel == "know" &&
          g2.schema.vertexLabels.contains("person") &&
          !g2.schema.vertexLabels.contains("people") &&
          g2.schema.indexes.contains("byTimeG") &&
          !g2.schema.indexes.contains("timeIndex") &&
          g2.indexTables.contains("byTimeG")),
        n("rn_time5_person", g2.V().has("time", 5L).hasLabel("person").vertices()),
        n("rn_time5_people", g2.V().has("time", 5L).hasLabel("people").vertices()),
        // the renamed composite index still serves (force-index accepts)
        n("rn_forced", g2.V().has("time", 5L).forceIndex().vertices()),
        n("rn_in_know", vq.direction(Direction.IN).labels("know").edges()),
        n("rn_in_knows", vq.direction(Direction.IN).labels("knows").edges()),
        n("rn_out_know_t11", vq.direction(Direction.OUT).labels("know")
          .has("time", 11L).edges()),
      ).reduce(_ unionAll _)
    }),
    // ---- Index-replay conformance (TitanIndexTest.testIndexReplay:
    //      1052-1122): with the index backend dropping every write, the
    //      transaction log replays into the recovered graph state and the
    //      index REBUILDS from it — four transactions (create, bulk create,
    //      delete + rename + property-remove, property-update) resolve
    //      through the timestamped log, the mixed text index materializes
    //      from the recovered frames, and every index-backed query sees the
    //      final state. The reference's recovery-stats counters are backend
    //      accounting with no analogue here. ----
    "q_tp_index_replay" -> ((s, dir) => {
      import s.implicits._
      import graft.core._
      def put(id: Long, ts: Long, name: String, age: Option[Long]) =
        (id, Option("v"), ts, "put", None: Option[Seq[String]], Option(name), age)
      val vlog = Seq(
        put(1L, 100L, "Big Boy Bobson", Some(55L)),
        put(2L, 200L, "Long Little Lewis", Some(35L)),
        put(3L, 200L, "Tall Long Tiger", Some(75L)),
        put(4L, 200L, "Long John Don", Some(15L)),
        (3L, None, 300L, "del", None, None, None),
        (4L, None, 300L, "put", Option(Seq("age")), Option("Bad Boy Badsy"), None),
        (1L, None, 400L, "put", None, None, Option(66L)),
      ).toDF("id", "label", "_ts", "_op", "_dels", "name", "age")
      val noEdges = s.range(0).select(col("id"), col("id").as("src"),
        col("id").as("dst"), lit("x").as("label"), col("id").as("_ts"),
        lit("put").as("_op"), lit(null).cast("array<string>").as("_dels"))
      val schema = GraphSchema(propertyKeys = Map(
        "name" -> PropertyKeyDef("name", StringType),
        "age" -> PropertyKeyDef("age", LongType)))
        .withIndex(IndexDef("mi", ElementCategory.VERTEX, Seq("name"),
          composite = false, mappings = Map("name" -> Mapping.TEXT)))
      val g0 = graft.data.TimestampedLog.resolve(vlog, noEdges, schema)
      val g = g0.withIndexTable("mi",
        graft.index.Indexes.materializeMixed(g0, schema.indexes("mi")))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        n("ir_boy", g.V().has("name", P.textContains("boy")).vertices()),
        n("ir_long", g.V().has("name", P.textContains("long")).vertices()),
        n("ir_long_age", g.V().has("name", P.textContains("long"))
          .interval("age", 30L, 40L).vertices()),
        n("ir_age75", g.V().has("age", 75L).vertices()),
        n("ir_boy_age", g.V().has("name", P.textContains("boy"))
          .interval("age", 60L, 70L).vertices()),
        n("ir_age_range", g.V().interval("age", 0L, 100L).vertices()),
        n("ir_index_ids", g.indexTables("mi").select(col("id")).distinct()),
      ).reduce(_ unionAll _)
    }),
    // ---- TTL × mixed-index conformance (TitanIndexTest
    //      .testVertexTTLWithMixedIndices:1325-1396 +
    //      testEdgeTTLWithMixedIndices:1398-1486): TTL'd elements answer
    //      index-backed queries before expiry and disappear from them after
    //      — including through a STALE index table built pre-expiry: the
    //      access-path semi-join lands on the TTL-filtered base, so an index
    //      can change the access path but never resurrect expired elements. ----
    "q_tp_ttl_index" -> ((s, dir) => {
      import s.implicits._
      import graft.core._
      val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
      def ts(ms: Long) = java.sql.Timestamp.from(t0.plusMillis(ms))
      val vSchema = GraphSchema(
        propertyKeys = Map(
          "name" -> PropertyKeyDef("name", StringType),
          "text" -> PropertyKeyDef("text", StringType),
          "time" -> PropertyKeyDef("time", LongType)),
        vertexLabels = Map("event" ->
          VertexLabelDef("event", static = true, ttlSeconds = Some(10L))))
        .withIndex(IndexDef("index2", ElementCategory.VERTEX, Seq("text"),
          composite = false, mappings = Map("text" -> Mapping.TEXT),
          onlyLabel = Some("event")))
      val verts = Seq(
        (1L, "event", "first event",
          "this text will help to identify the first event", 1000L),
        (2L, "event", "second event", "this text won't match", 1001L)
      ).toDF("id", "label", "name", "text", "time").withColumn("_ts", lit(ts(0)))
      val emptyE = Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "label")
      val g0 = graft.data.PropertyGraph(vSchema, verts, emptyE)
      val g = g0.withIndexTable("index2",
        graft.index.Indexes.materializeMixed(g0, vSchema.indexes("index2")))
      def at(ms: Long) = g.copy(schema = g.schema.copy(ttlReadTime = Some(ts(ms))))
      // edge block: TTL'd 'alert' edges with a TEXT-indexed message
      val eSchema = GraphSchema(
        propertyKeys = Map("text" -> PropertyKeyDef("text", StringType)),
        edgeLabels = Map("alert" -> EdgeLabelDef("alert", ttlSeconds = Some(10L))))
        .withIndex(IndexDef("eindex", ElementCategory.EDGE, Seq("text"),
          composite = false, mappings = Map("text" -> Mapping.TEXT)))
      val eg0 = graft.data.PropertyGraph(eSchema,
        Seq((1L, "v"), (2L, "v")).toDF("id", "label"),
        Seq((10L, 1L, 2L, "alert", "please help with this alert"))
          .toDF("id", "src", "dst", "label", "text").withColumn("_ts", lit(ts(0))))
      val eg = eg0.withIndexTable("eindex",
        graft.index.Indexes.materializeMixed(eg0, eSchema.indexes("eindex")))
      def eat(ms: Long) = eg.copy(schema = eg.schema.copy(ttlReadTime = Some(ts(ms))))
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def one(caze: String, v: Long) =
        s.range(1).select(lit(caze).as("caze"), lit(v).as("n"))
      def textQ(gr: graft.data.PropertyGraph) =
        gr.V().has("text", P.textContains("help")).hasLabel("event").vertices()
      def nameQ(gr: graft.data.PropertyGraph) =
        gr.V().has("name", "first event").orderBy("time", asc = false).vertices()
      Seq(
        one("ti_ttl_decl",
          if (g.schema.vertexLabel("event").ttlSeconds.contains(10L)) 1L else 0L),
        n("ti_pre_name", nameQ(at(5000))),
        n("ti_pre_text", textQ(at(5000))),
        n("ti_post_name", nameQ(at(15000))),
        n("ti_post_text", textQ(at(15000))),
        n("ti_post_byid", at(15000).V().hasId(1L).vertices()),
        n("ti_pre_etext", eat(5000).E()
          .has("text", P.textContains("help")).edges()),
        n("ti_post_etext", eat(15000).E()
          .has("text", P.textContains("help")).edges()),
      ).reduce(_ unionAll _)
    }),
    // ---- Collection-indexing conformance (TitanIndexTest.testListIndexing
    //      + testSetIndexing + testCollection:1643-1755): has(key, value) on
    //      a SET/LIST-cardinality key matches when SOME property element
    //      satisfies the predicate — the full reference arc: add one cell
    //      at a time (query by either value hits), remove one cell (its
    //      value stops matching, the other still hits), re-add, duplicate
    //      (LIST keeps 3 cells, SET collapses to 2), two-at-once on a fresh
    //      vertex, and a geo WITHIN over collection cells. Also
    //      testContainsWithMultipleValues:1541-1556 (multi-token CONTAINS
    //      over one text value) and element-existence on empty collections. ----
    "q_tp_collection" -> ((s, dir) => {
      import graft.data.MultiProperties
      val noEdges = s.range(0).select(col("id"), col("id").as("src"),
        col("id").as("dst"), lit("x").as("label"))
      val c1 = MultiProperties.cell(lit("Totoro"))
      val c2 = MultiProperties.cell(lit("Hiro"))
      def gOf(cells: Column) = graft.data.PropertyGraph(graft.core.GraphSchema(),
        s.range(1).select(lit(1L).as("id"), lit("v").as("label"), cells.as("name")),
        noEdges)
      val s1 = array(c1)
      val s2 = MultiProperties.addValueList(s1, c2)
      val s3 = filter(s2, x => x.getField("value") =!= "Totoro")
      val s4 = MultiProperties.addValueList(s3, c1)
      val s5l = MultiProperties.addValueList(s4, c1) // LIST: duplicate kept
      val s5s = MultiProperties.addValueSet(s4, c1)  // SET: duplicate collapses
      val s6 = array(c1, c2)
      val empty = array().cast("array<struct<value:string,meta:map<string,string>>>")
      // geo cells: two point shapes under one collection key
      val geoG = graft.data.PropertyGraph(graft.core.GraphSchema(),
        s.range(1).select(lit(1L).as("id"), lit("v").as("label"),
          array(graft.expr.Geo.point(1.0, 1.0), graft.expr.Geo.point(2.0, 2.0)).as("geo")),
        noEdges)
      // multi-token CONTAINS over a single text value
      val textG = graft.data.PropertyGraph(graft.core.GraphSchema(),
        s.range(1).select(lit(1L).as("id"), lit("v").as("label"),
          lit("hercules was here").as("name")), noEdges)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def cells(g: graft.data.PropertyGraph) =
        graft.query.VertexCentricQuery(g).onVertices(1L).propertyCount("name")
      Seq(
        n("col_s1_v1", gOf(s1).V().has("name", "Totoro").vertices()),
        n("col_s2_v1", gOf(s2).V().has("name", "Totoro").vertices()),
        n("col_s2_v2", gOf(s2).V().has("name", "Hiro").vertices()),
        n("col_s3_v1", gOf(s3).V().has("name", "Totoro").vertices()),
        n("col_s3_v2", gOf(s3).V().has("name", "Hiro").vertices()),
        n("col_s4_v1", gOf(s4).V().has("name", "Totoro").vertices()),
        n("col_s4_v2", gOf(s4).V().has("name", "Hiro").vertices()),
        n("col_s5_list_cells", cells(gOf(s5l)).filter(col("count") === 3L)),
        n("col_s5_set_cells", cells(gOf(s5s)).filter(col("count") === 2L)),
        n("col_s6_v1", gOf(s6).V().has("name", "Totoro").vertices()),
        n("col_s6_v2", gOf(s6).V().has("name", "Hiro").vertices()),
        n("col_empty_has", gOf(empty).V().has("name").vertices()),
        n("col_empty_hasnot", gOf(empty).V().hasNot("name").vertices()),
        n("col_geo_p1", geoG.V().has("geo",
          graft.expr.Geo.geoWithin(graft.expr.Geo.circle(1.0, 1.0, 12.0))).vertices()),
        n("col_geo_p2", geoG.V().has("geo",
          graft.expr.Geo.geoWithin(graft.expr.Geo.circle(2.0, 2.0, 12.0))).vertices()),
        n("col_geo_miss", geoG.V().has("geo",
          graft.expr.Geo.geoWithin(graft.expr.Geo.circle(40.0, 40.0, 12.0))).vertices()),
        n("col_text_multi", textG.V()
          .has("name", P.textContains("hercules here")).vertices()),
        // Gremlin surface shares the per-element branch
        n("col_trav_v1", gOf(s6).traversal.V().has("name", "Totoro").toDF),
        n("col_trav_v2", gOf(s6).traversal.V().has("name", "Hiro").toDF),
        n("col_trav_miss", gOf(s6).traversal.V().has("name", "Mei").toDF),
        n("col_trav_hasnot", gOf(empty).traversal.V().hasNot("name").toDF),
        // index-backed per-element lookup: the inverted collection table
        // serves the same (key,value,id) semi-join as a string index, and
        // both cell values resolve to the one vertex
        n("col_ix_v1", {
          val g6 = gOf(s6)
          val ix = graft.core.IndexDef("byName", graft.core.ElementCategory.VERTEX,
            Seq("name"), composite = false)
          val t = graft.index.Indexes.materializeCollection(g6, ix)
          graft.index.Indexes.lookupString(g6, t, "name", "Totoro")
        }),
        n("col_ix_v2", {
          val g6 = gOf(s6)
          val ix = graft.core.IndexDef("byName", graft.core.ElementCategory.VERTEX,
            Seq("name"), composite = false)
          val t = graft.index.Indexes.materializeCollection(g6, ix)
          graft.index.Indexes.lookupString(g6, t, "name", "Hiro")
        }),
        n("col_ix_dup_rows", {
          // LIST duplicates index one row per CELL: the s5l state holds
          // [Hiro, Totoro, Totoro] → 3 index rows
          val g5 = gOf(s5l)
          val ix = graft.core.IndexDef("byName", graft.core.ElementCategory.VERTEX,
            Seq("name"), composite = false)
          graft.index.Indexes.materializeCollection(g5, ix)
        }),
        n("col_auto_ix", {
          // AUTOMATIC selection: has(name, v) on the declared-LIST key takes
          // the registered inverted table — force-index proves the access
          // path engaged (it throws when no usable index covers the query)
          val schema = graft.core.GraphSchema()
            .withPropertyKey(graft.core.PropertyKeyDef("name",
              org.apache.spark.sql.types.StringType, graft.core.Cardinality.LIST))
            .withIndex(graft.core.IndexDef("byName",
              graft.core.ElementCategory.VERTEX, Seq("name"), composite = false))
          val gg = graft.data.PropertyGraph(schema,
            s.range(1).select(lit(1L).as("id"), lit("v").as("label"), s6.as("name")),
            noEdges)
          val gi = gg.withIndexTable("byName",
            graft.index.Indexes.materializeCollection(gg, schema.indexes("byName")))
          gi.V().has("name", "Totoro").forceIndex().vertices()
        }),
      ).reduce(_ unionAll _)
    }),
    // ---- Index-removal lifecycle conformance (testGotGIndexRemoval,
    //      TitanGraphTest.java:1279-1321): the Graph-of-the-Gods name index
    //      is ENABLED with exactly one field key; after DISABLE the same
    //      query still answers (scan fallback, index no longer an access
    //      path — force-index now rejects); after REMOVE the catalog entry
    //      is gone and the query still answers. ----
    "q_tp_index_lifecycle" -> ((s, dir) => {
      val gods = graft.data.GraphOfTheGods.load(s)
      import graft.core.{SchemaAction, SchemaStatus}
      val mgmt = new graft.mgmt.Management(gods.schema)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def one(caze: String, v: Long) =
        s.range(1).select(lit(caze).as("caze"), lit(v).as("n"))
      val ix = gods.schema.indexes("name")
      val sane = ix.keys == Seq("name") && ix.composite &&
        ix.status == SchemaStatus.ENABLED
      mgmt.updateIndex("name", SchemaAction.DISABLE_INDEX)
      val disabled = gods.copy(schema = mgmt.current)
      val forceRejected =
        try { disabled.V().has("name", "hercules").forceIndex().vertices().count(); 0L }
        catch { case _: IllegalArgumentException | _: IllegalStateException => 1L }
      mgmt.updateIndex("name", SchemaAction.REMOVE_INDEX)
      val removed = gods.copy(schema = mgmt.current)
      Seq(
        one("il_sane", if (sane) 1L else 0L),
        n("il_pre", gods.V().has("name", "hercules").vertices()),
        n("il_disabled_scan", disabled.V().has("name", "hercules").vertices()),
        one("il_disabled_force", forceRejected),
        one("il_removed_gone",
          if (removed.schema.indexes.contains("name")) 0L else 1L),
        n("il_removed_scan", removed.V().has("name", "hercules").vertices()),
      ).reduce(_ unionAll _)
    }),
    // ---- IO conformance (TitanIoTest.java:21-50 — GraphSON + Gryo round
    //      trips of Graph-of-the-Gods with embedded geo shapes, asserted by
    //      TitanIndexTest.assertGraphOfTheGods:142-150): 12 vertices, 3
    //      gods, hercules (demigod, age 30, degree 5), and the geo 'place'
    //      property must survive BOTH interchange formats — the Gryo codec
    //      grew struct/map frames for exactly this. ----
    "q_tp_io_gotg" -> ((s, dir) => {
      import graft.query.Direction
      val gods = graft.data.GraphOfTheGods.load(s)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def checks(g: graft.data.PropertyGraph, pre: String) = {
        val herc = g.V().has("name", "hercules").dataframe.select(col("id").as("vid"))
        Seq(
          n(s"${pre}_numv", g.V().vertices()),
          n(s"${pre}_gods", g.V().has("~label", "god").vertices()),
          n(s"${pre}_herc", g.V().has("name", "hercules").has("age", 30)
            .hasLabel("demigod").vertices()),
          n(s"${pre}_herc_deg", graft.query.VertexCentricQuery(g)
            .onFrontier(herc).direction(Direction.BOTH).edges()),
          n(s"${pre}_geo", g.E().has("place",
            graft.expr.Geo.geoWithin(graft.expr.Geo.circle(37.97, 23.72, 50))).edges()),
        )
      }
      val p1 = java.nio.file.Files.createTempDirectory("graft-io-gson").toString
      graft.data.GraphIO.exportJson(gods, p1)
      val g1 = graft.data.GraphIO.importJson(s, p1)
      val p2 = java.nio.file.Files.createTempDirectory("graft-io-gryo").toString
      graft.data.GraphIO.exportGryo(gods, p2)
      val g2 = graft.data.GraphIO.importGryo(s, p2)
      (checks(gods, "io_base") ++ checks(g1, "io_gson") ++ checks(g2, "io_gryo"))
        .reduce(_ unionAll _)
    }),
    // ---- Create/delete/update conformance (testCreateDelete,
    //      TitanGraphTest.java:4578-4620): property remove-and-rewrite on a
    //      vertex, in-place edge property updates, edge retrieval by
    //      RelationIdentifier (object AND string form), all surviving
    //      persistence (clopen ⇒ save+load). ----
    "q_tp_create_delete" -> ((s, dir) => {
      import s.implicits._
      import graft.query.Direction
      val v = Seq((1L, "v", None: Option[Long]), (3L, "v", Option(445L)))
        .toDF("id", "label", "uid")
      val e = Seq(
        (100L, 3L, 1L, "knows", Option(111L), None: Option[Double]),
        (101L, 1L, 3L, "friend", None, None)
      ).toDF("id", "src", "dst", "label", "uid", "weight")
      val g0 = graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
      // remove uid=445, write uid=353; update edge uids/weight in place
      val g1 = graft.data.GraphIO.applyMutations(g0, addVertices =
        Some(Seq((3L, "v", Option(353L))).toDF("id", "label", "uid")))
      val g2 = graft.data.GraphIO.updateEdges(g1, Seq(
        (100L, 3L, 1L, "knows", Option(222L), None: Option[Double]),
        (101L, 1L, 3L, "friend", Option(1L), Option(2.0))
      ).toDF("id", "src", "dst", "label", "uid", "weight"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-cd").toString
      graft.data.GraphIO.save(g2, tmp)
      val g3 = graft.data.GraphIO.load(s, tmp)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def knowsOf(g: graft.data.PropertyGraph) =
        graft.query.VertexCentricQuery(g).onVertices(3L)
          .direction(Direction.OUT).labels("knows").edges()
      val rid = graft.data.RelationIdentifier.parse("100-3-knows-1")
      Seq(
        n("cd_euid111", knowsOf(g0).filter(col("uid") === 111L)),
        n("cd_eid_obj", graft.data.RelationIdentifier.lookup(g0,
          graft.data.RelationIdentifier(100L, 3L, "knows", Some(1L)))),
        n("cd_eid_str", graft.data.RelationIdentifier.lookup(g0, rid)),
        n("cd_v3_353", g2.V().has("uid", 353L).vertices()),
        n("cd_v3_445_gone", g2.V().has("uid", 445L).vertices()),
        n("cd_e_222", knowsOf(g2).filter(col("uid") === 222L)),
        n("cd_e2_upd", graft.query.VertexCentricQuery(g2).onVertices(1L)
          .direction(Direction.OUT).labels("friend").edges()
          .filter(col("uid") === 1L && col("weight") === 2.0)),
        n("cd2_v3_353", g3.V().has("uid", 353L).vertices()),
        n("cd2_e_222", knowsOf(g3).filter(col("uid") === 222L)),
      ).reduce(_ unionAll _)
    }),
    // ---- Consistency-modifier conformance (TitanEventualGraphTest
    //      .testConsistencyModifier:263-341): two unlocked concurrent
    //      transactions (sig 10 @ts200, sig 20 @ts300) update the same
    //      relations. In-place relations (SINGLE weight, LIST value cell,
    //      o2o/em edges) converge to the LATER write under the SAME id;
    //      delete-and-readd relations (SET name cell, es/o2m edges) converge
    //      through the constraint's newest-wins collapse under a NEW id; and
    //      FORK relations (valuef cells, emf edges) keep BOTH writers'
    //      forked copies — the original id gone. Property cells ride the
    //      edge-log shape (src=element, label=key, dst=self). ----
    "q_tp_consistency" -> ((s, dir) => {
      import s.implicits._
      val vlog = Seq(
        (1L, Option("v"), 100L, "put", None: Option[Seq[String]], 0L),
        (2L, Option("v"), 100L, "put", None, 0L)
      ).toDF("id", "label", "_ts", "_op", "_dels", "_txn")
      def put(id: Long, src: Long, dst: Long, lbl: String, ts: Long,
          pval: Option[String], sig: Long) =
        (id, Option(src), Option(dst), Option(lbl), ts, "put",
          None: Option[Seq[String]], pval, Option(sig))
      def upd(id: Long, ts: Long, pval: Option[String], sig: Long) =
        (id, None: Option[Long], None: Option[Long], None: Option[String], ts,
          "put", None: Option[Seq[String]], pval, Option(sig))
      def del(id: Long, ts: Long) =
        (id, None: Option[Long], None: Option[Long], None: Option[String], ts,
          "del", None: Option[Seq[String]], None: Option[String], None: Option[Long])
      val rows = Seq(
        // base state @100 (sig 1): property cells 50x (dst=self), edges 60x
        put(500L, 1L, 1L, "weight", 100L, Option("5.0"), 1L),
        put(501L, 1L, 1L, "name", 100L, Option("John"), 1L),
        put(502L, 1L, 1L, "value", 100L, Option("2"), 1L),
        put(503L, 1L, 1L, "valuef", 100L, Option("2"), 1L),
        put(600L, 1L, 2L, "es", 100L, None, 1L),
        put(601L, 1L, 2L, "o2o", 100L, None, 1L),
        put(602L, 1L, 2L, "o2m", 100L, None, 1L),
        put(603L, 1L, 2L, "em", 100L, None, 1L),
        put(604L, 1L, 2L, "emf", 100L, None, 1L),
        // tx1 @200 (sig 10)
        upd(500L, 200L, Option("6.0"), 10L), del(501L, 200L),
        put(510L, 1L, 1L, "name", 200L, Option("Bob"), 10L),
        upd(502L, 200L, None, 10L), del(503L, 200L),
        put(511L, 1L, 1L, "valuef", 200L, Option("2"), 10L),
        del(600L, 200L), put(610L, 1L, 2L, "es", 200L, None, 10L),
        upd(601L, 200L, None, 10L),
        del(602L, 200L), put(612L, 1L, 2L, "o2m", 200L, None, 10L),
        upd(603L, 200L, None, 10L),
        del(604L, 200L), put(614L, 1L, 2L, "emf", 200L, None, 10L),
        // tx2 @300 (sig 20) — commits later, wins every in-place cell
        upd(500L, 300L, Option("6.0"), 20L), del(501L, 300L),
        put(520L, 1L, 1L, "name", 300L, Option("Bob"), 20L),
        upd(502L, 300L, None, 20L), del(503L, 300L),
        put(521L, 1L, 1L, "valuef", 300L, Option("2"), 20L),
        del(600L, 300L), put(620L, 1L, 2L, "es", 300L, None, 20L),
        upd(601L, 300L, None, 20L),
        del(602L, 300L), put(622L, 1L, 2L, "o2m", 300L, None, 20L),
        upd(603L, 300L, None, 20L),
        del(604L, 300L), put(624L, 1L, 2L, "emf", 300L, None, 20L),
      )
      val elog = rows.toDF("id", "src", "dst", "label", "_ts", "_op", "_dels",
        "pval", "sig")
      val resolved = graft.data.TimestampedLog.resolve(vlog, elog).edges
      val TL = graft.data.TimestampedLog
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def cells(k: String) = resolved.filter(col("label") === k)
      Seq(
        n("cm_weight", cells("weight")
          .filter(col("id") === 500L && col("pval") === "6.0" && col("sig") === 20L)),
        n("cm_name_set", TL.collapseNewest(cells("name"), Seq("src", "label", "pval"))
          .filter(col("sig") === 20L)),
        n("cm_value_keep", cells("value")
          .filter(col("id") === 502L && col("pval") === "2" && col("sig") === 20L)),
        n("cm_valuef_fork", cells("valuef")
          .filter(col("id") =!= 503L && col("pval") === "2")),
        n("cm_es", TL.collapseNewest(cells("es"), Seq("src", "dst", "label"))
          .filter(col("sig") === 20L && col("id") =!= 600L)),
        n("cm_o2o", cells("o2o")
          .filter(col("id") === 601L && col("sig") === 20L)),
        n("cm_o2m", TL.collapseNewest(cells("o2m"), Seq("dst", "label"))
          .filter(col("sig") === 20L && col("id") =!= 602L)),
        n("cm_em", cells("em").filter(col("id") === 603L && col("sig") === 20L)),
        n("cm_emf", cells("emf").filter(col("id") =!= 604L && col("dst") === 2L)),
      ).reduce(_ unionAll _)
    }),
    // ---- TinkerPop optimization-strategy conformance
    //      (testTinkerPopOptimizationStrategies, TitanGraphTest.java:
    //      3350-3470): the reference asserts the step-fusion AND the result
    //      counts over a 10-supernode fixture (each super: 100 knows edges
    //      weight j%5, 100 names LIST cells with a weight meta-property).
    //      Step fusion is TinkerPop-internal — Catalyst owns fusion here —
    //      so the portable semantics are the COUNTS, including the
    //      multiQuery block (frontier-batched, identical numbers) and
    //      meta-property filters on property elements. ----
    "q_tp_optstrat" -> ((s, dir) => {
      import graft.query.Direction
      val normals = s.range(100).select((col("id") + 1L).as("id"), lit("v").as("label"),
        col("id").as("pid"), (col("id") % 5L).as("weight"),
        lit(null).cast("array<struct<value:string,meta:map<string,string>>>").as("names"))
      val supers = s.range(10).select((col("id") + 1000L).as("id"), lit("v").as("label"),
        lit(-1L).as("pid"), lit(null).cast("long").as("weight"),
        expr("transform(sequence(0, 99), j -> named_struct(" +
          "'value', concat('n', CAST(j AS STRING)), " +
          "'meta', map('weight', CAST(j % 5 AS STRING))))").as("names"))
      val edges = s.range(10).select(col("id").as("k"))
        .crossJoin(s.range(100).select(col("id").as("j")))
        .select((col("k") * 1000L + col("j") + 50000L).as("id"),
          (col("k") + 1000L).as("src"), (col("j") + 1L).as("dst"),
          lit("knows").as("label"), (col("j") % 5L).as("weight"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(),
        normals.unionByName(supers), edges)
      def sv0 = graft.query.VertexCentricQuery(g).onVertices(1000L)
        .direction(Direction.OUT).labels("knows")
      def multi = graft.query.VertexCentricQuery(g)
        .onVertices(1000L to 1009L: _*).direction(Direction.OUT).labels("knows")
      val t = g.traversal
      val cells = graft.data.MultiProperties.explodeCells(
        g.vertices.filter(col("id") === 1000L), "names")
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      Seq(
        n("os_sv0_outE_w1", sv0.has("weight", 1L).edges()),
        n("os_sv0_outE", sv0.edges()),
        n("os_sv0_out", sv0.vertices()),
        n("os_sv0_local_limit10", sv0.limit(10).edges()),
        n("os_sv0_local_range", t.V().hasId(1000L)
          .localRange(10, 20, Seq(col("id").asc))(_.outE("knows")).toDF),
        n("os_sv0_order_decr", sv0.orderBy("weight", asc = false).edges()),
        n("os_sv0_order_limit10",
          sv0.orderBy("weight", asc = false).limit(10).edges()),
        n("os_sv0_w1_order", sv0.has("weight", 1L).orderBy("weight").edges()),
        n("os_sv0_w1_order_limit10",
          sv0.has("weight", 1L).orderBy("weight").limit(10).edges()),
        n("os_sv0_w1w1_range_10_15", t.V().hasId(1000L)
          .localRange(10, 15, Seq(col("weight").asc, col("id").asc))(
            _.outE("knows").has("weight", P.eq(1L)).has("weight", P.eq(1L))).toDF),
        n("os_sv0_inV_is50", sv0.adjacent(50L).edges()),
        n("os_sv0_otherV_is50", sv0.adjacent(50L).edges()),
        n("os_sv0_bothE_otherV", graft.query.VertexCentricQuery(g)
          .onVertices(1000L).direction(Direction.BOTH).labels("knows")
          .adjacent(50L).edges()),
        n("os_sv0_bothE_inV", graft.query.VertexCentricQuery(g)
          .onVertices(1000L).direction(Direction.BOTH).labels("knows")
          .edges().filter(col("dst") === 50L)),
        n("os_props_w1", cells.filter(col("meta").getItem("weight") === "1")),
        n("os_props", cells),
        n("os_props_order_limit10", cells
          .orderBy(col("meta").getItem("weight").desc, col("value").asc)
          .limit(10).filter(col("meta").getItem("weight") === "4")),
        n("os_sv0_outE_values_w", sv0.edges().select(col("weight"))),
        n("os_gid20", g.V().has("pid", 20L).vertices()),
        n("os_gid20_w0", g.V().has("pid", 20L).has("weight", 0L).vertices()),
        n("os_w1", g.V().has("weight", 1L).vertices()),
        n("os_w1_range10", g.V().has("weight", 1L).limit(10).vertices()),
        n("os_sid", g.V().has("pid", -1L).vertices()),
        n("os_super_outE_w1", multi.has("weight", 1L).edges()),
        n("os_super_outE_gte1_lt3",
          multi.has("weight", P.gte(1L)).has("weight", P.lt(3L)).edges()),
        n("os_super_outE_between", multi.has("weight", P.between(1L, 3L)).edges()),
        n("os_super_local_limit10",
          multi.has("weight", P.between(1L, 3L)).limit(10).edges()),
        n("os_super_order_limit10", multi.has("weight", P.between(1L, 3L))
          .orderBy("weight", asc = false).limit(10).edges()),
        n("os_super_names", multi.properties("names")),
      ).reduce(_ unionAll _)
    }),
    // ---- Ghost-vertex removal conformance (OLAPTest.removeGhostVertices:
    //      145-186): a vertex deleted in one transaction but written to by a
    //      stale transaction leaves ghost relations — edges referencing a
    //      vertex id with no vertex row. The scan must find exactly the
    //      ghost adjacency (1 ghost vertex id, 2 ghost relations) and the
    //      repair must drop it while keeping live edges. ----
    "q_tp_ghost" -> ((s, dir) => {
      import s.implicits._
      import graft.query.Direction
      val v = Seq((1L, "person", "dan"), (2L, "person", "marko"))
        .toDF("id", "label", "name")
      val e = Seq(
        (10L, 2L, 3L, "knows"),   // ghost dst: v3 was removed
        (11L, 1L, 2L, "knows"),
        (12L, 3L, 1L, "knows")    // ghost src: written by the stale tx
      ).toDF("id", "src", "dst", "label")
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
      val ghosts = graft.olap.GraphOps.ghostEdges(g)
      val repaired = graft.olap.GraphOps.removeGhosts(g)
      val ids = g.vertices.select(col("id").as("__vid"))
      val ghostIds = ghosts.select(col("src").as("gid"))
        .unionByName(ghosts.select(col("dst").as("gid")))
        .join(ids, col("gid") === col("__vid"), "left_anti").distinct()
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def inKnows(gr: graft.data.PropertyGraph) =
        graft.query.VertexCentricQuery(gr).onVertices(1L)
          .direction(Direction.IN).labels("knows").edges()
      Seq(
        n("gh_pre_in", inKnows(g)),
        n("gh_relations", ghosts),
        n("gh_vertices", ghostIds),
        n("gh_post_edges", repaired.edges),
        n("gh_post_in", inKnows(repaired)),
      ).reduce(_ unionAll _)
    }),
    // ---- Partitioned-vertex conformance (TitanPartitionGraphTest.java:
    //      testVertexPartitioning:100-170): 10 partitioned 'group' vertices
    //      (gid 0..9, an 8-name LIST, base edges i→0 for i>0, one edges
    //      i→i-1 for odd i). Every adjacency/property count must be exact
    //      THROUGH the partitioned-label machinery — here the supernode
    //      salted two-phase aggregate, which the partitioned schema flag
    //      engages on these queries (the analogue of the reference
    //      assembling a partitioned vertex from its scattered canonical
    //      representatives). ----
    "q_tp_partition" -> ((s, dir) => {
      import graft.query.Direction
      val names = Seq("Marko", "Dan", "Stephen", "Daniel", "Josh", "Thad",
        "Pavel", "Matthias")
      val groups = s.range(10).select((col("id") + 1L).as("id"),
        lit("group").as("label"), col("id").as("gid"), lit(0L).as("sig"),
        array(names.map(lit): _*).as("name"))
      val baseE = s.range(1, 10).select((col("id") + 100L).as("id"),
        (col("id") + 1L).as("src"), lit(1L).as("dst"), lit("base").as("label"))
      val oneE = s.range(10).filter(col("id") % 2 === 1)
        .select((col("id") + 200L).as("id"), (col("id") + 1L).as("src"),
          col("id").as("dst"), lit("one").as("label"))
      val schema = graft.core.GraphSchema()
        .withVertexLabel(graft.core.VertexLabelDef("group", partitioned = true))
      val g = graft.data.PropertyGraph(schema, groups, baseE.unionByName(oneE))
      def vq = graft.query.VertexCentricQuery(g)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      val gidOf = g.vertices.select(col("id").as("vid"), col("gid"))
      def degs(q: graft.query.VertexCentricQuery) =
        q.edgeCount().join(gidOf, Seq("vid"), "right_outer")
          .select(col("gid"), coalesce(col("count"), lit(0L)).as("count"))
      Seq(
        n("pt_one_both1", degs(vq.direction(Direction.BOTH).labels("one"))
          .filter(col("count") === 1L)),
        n("pt_one_in_even", degs(vq.direction(Direction.IN).labels("one"))
          .filter((col("gid") % 2 === 0 && col("count") === 1L) ||
            (col("gid") % 2 === 1 && col("count") === 0L))),
        n("pt_one_out_odd", degs(vq.direction(Direction.OUT).labels("one"))
          .filter((col("gid") % 2 === 1 && col("count") === 1L) ||
            (col("gid") % 2 === 0 && col("count") === 0L))),
        n("pt_base_out", degs(vq.direction(Direction.OUT).labels("base"))
          .filter(col("gid") > 0 && col("count") === 1L)),
        n("pt_base_in9", degs(vq.direction(Direction.IN).labels("base"))
          .filter(col("gid") === 0 && col("count") === 9L)),
        n("pt_name8", vq.propertyCount("name").filter(col("count") === 8L)),
        n("pt_gid_lookup", g.V().has("gid", 5L).vertices()),
      ).reduce(_ unionAll _)
    }),
    // ---- Partitioned-vertex OLAP conformance (TitanPartitionGraphTest
    //      .java:381-436 testVertexPartitionOlap* + setupGroupClusters:
    //      290-320, run at the Spread tests' degrees {10,20,30}): the BSP
    //      DegreeCounter over a graph whose 'group' label is partitioned
    //      must report each group's full contain-degree (the scattered
    //      adjacency re-aggregates) and every person's degree as 1; the
    //      salted two-phase count must agree with the plain aggregate on
    //      every vertex. ----
    "q_tp_partition_olap" -> ((s, dir) => {
      import graft.query.Direction
      val degs = Seq(10L, 20L, 30L)
      val groups = s.range(3).select((col("id") + 1L).as("id"),
        lit("group").as("label"),
        concat(lit("group"), col("id").cast("string")).as("groupid"))
      val gix = when(col("id") < 10L, 0L).when(col("id") < 30L, 1L).otherwise(2L)
      val persons = s.range(60).select((col("id") + 100L).as("id"),
        lit("person").as("label"),
        concat(lit("group"), gix.cast("string")).as("groupid"))
      val pg = persons.select(col("id").as("pid"),
        (when(col("id") - 100L < 10L, 0L).when(col("id") - 100L < 30L, 1L)
          .otherwise(2L) + 1L).as("gidv"))
      val memberE = pg.select((col("pid") + 1000L).as("id"), col("pid").as("src"),
        col("gidv").as("dst"), lit("member").as("label"))
      val containE = pg.select((col("pid") + 2000L).as("id"), col("gidv").as("src"),
        col("pid").as("dst"), lit("contain").as("label"))
      val schema = graft.core.GraphSchema()
        .withVertexLabel(graft.core.VertexLabelDef("person"))
        .withVertexLabel(graft.core.VertexLabelDef("group", partitioned = true))
      val g = graft.data.PropertyGraph(schema,
        groups.unionByName(persons), memberE.unionByName(containE))
      import s.implicits._
      val bsp = graft.olap.VertexProgramRunner.run(g, new graft.olap.DegreeCounter, 1)
        .vertices.toDF("id", "deg")
      val expected = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "want")
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      val salted = graft.query.VertexCentricQuery(g).direction(Direction.OUT)
        .edgeCount()
      val plain = g.edges.groupBy(col("src").as("vid2"))
        .agg(count(lit(1)).as("plainc"))
      Seq(
        n("po_group_deg", bsp.join(expected, Seq("id"))
          .filter(col("deg") === col("want"))),
        n("po_person_deg1", bsp.filter(col("id") >= 100L && col("deg") === 1L)),
        n("po_total", bsp),
        n("po_salted_eq", salted.join(plain, col("vid") === col("vid2"))
          .filter(col("count") === col("plainc"))),
      ).reduce(_ unionAll _)
    }),
    // ---- Data-type conformance (testDataTypes, TitanGraphTest.java:
    //      1004-1103): boolean / Instant / binary / geo-shape / double /
    //      custom-int property values roundtrip through persistence
    //      (clopen ⇒ save+load here), and an Object-typed LIST key holds
    //      heterogeneous cells (string, long, int[]) — modeled as a tagged
    //      variant struct array, each cell a first-class property element
    //      (propertyCount=3). The reference's invalid-type maker errors
    //      (primitive int.class, interface Number.class) are Java-API
    //      concerns with no analogue: our keys carry Spark DataTypes, all
    //      of which are storable. ----
    "q_tp_datatypes" -> ((s, dir) => {
      val verts = s.range(1).select(lit(1L).as("id"), lit("v").as("label"),
        lit(true).as("boolval"),
        timestamp_seconds(lit(1429225756L)).as("birthday"),
        lit(10).as("num"),
        lit(Array[Byte](1, 2, 3, 4)).as("barr"),
        graft.expr.Geo.box(10.0, 10.0, 20.0, 20.0).as("geo"),
        lit(10.12345).as("precise"),
        array(
          struct(lit("string").as("kind"), lit("Hello").as("sval"),
            lit(null).cast("long").as("lval"), lit(null).cast("array<int>").as("aval")),
          struct(lit("long").as("kind"), lit(null).cast("string").as("sval"),
            lit(10L).as("lval"), lit(null).cast("array<int>").as("aval")),
          struct(lit("intarray").as("kind"), lit(null).cast("string").as("sval"),
            lit(null).cast("long").as("lval"), array(lit(5), lit(6), lit(7)).as("aval"))
        ).as("any"))
      val noEdges = s.range(0).select(col("id"), col("id").as("src"),
        col("id").as("dst"), lit("x").as("label"))
      val g0 = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, noEdges)
      val tmp = java.nio.file.Files.createTempDirectory("graft-datatypes").toString
      graft.data.GraphIO.save(g0, tmp)
      val g1 = graft.data.GraphIO.load(s, tmp)
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      def cases(g: graft.data.PropertyGraph, pre: String) = {
        val V = g.vertices
        Seq(
          n(s"${pre}_boolval", V.filter(col("boolval") === true)),
          n(s"${pre}_birthday",
            V.filter(col("birthday") === timestamp_seconds(lit(1429225756L)))),
          n(s"${pre}_num", V.filter(col("num") === 10)),
          n(s"${pre}_barr_len", V.filter(length(col("barr")) === 4)),
          n(s"${pre}_geo",
            V.filter(col("geo") === graft.expr.Geo.box(10.0, 10.0, 20.0, 20.0))),
          n(s"${pre}_precise", V.filter(abs(col("precise") - 10.12345) < 1e-6)),
          n(s"${pre}_any_count", graft.query.VertexCentricQuery(g).onVertices(1L)
            .propertyCount("any").filter(col("count") === 3L)),
          n(s"${pre}_any_hello", V.filter(exists(col("any"),
            c => c.getField("kind") === "string" && c.getField("sval") === "Hello"))),
          n(s"${pre}_any_long", V.filter(exists(col("any"),
            c => c.getField("lval") === 10L))),
          n(s"${pre}_any_arr", V.filter(exists(col("any"),
            c => c.getField("aval") === array(lit(5), lit(6), lit(7))))),
        )
      }
      (cases(g0, "dt") ++ cases(g1, "dt2")).reduce(_ unionAll _)
    }),
    // ---- Basic CRUD / iteration conformance (TitanGraphTest.java:
    //      testBasic:174-198 — id lookup, miss, index lookup, relation
    //      count, cleared-graph emptiness; testVertexRemoval:204-240 —
    //      removal cascades to the adjacency and the index; and
    //      testGlobalIteration:243-281 — full scans before/after a limit-5
    //      removal (the reference removes an ARBITRARY 5 via iteration
    //      order; we pin the 5 lowest ids so the post-removal edge count is
    //      deterministic). ----
    "q_tp_crud" -> ((s, dir) => {
      import s.implicits._
      import graft.query.Direction
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      val noEdges = s.range(0).select(col("id"), col("id").as("src"),
        col("id").as("dst"), lit("x").as("label"))
      // testBasic
      val bv = Seq((1L, "vertex", "abcd")).toDF("id", "label", "name")
      val bg = graft.data.PropertyGraph(graft.core.GraphSchema(), bv, noEdges)
      val cleared = graft.data.PropertyGraph(graft.core.GraphSchema(), bv.limit(0), noEdges)
      // testVertexRemoval
      val rv = Seq((1L, "vertex", "v1"), (2L, "vertex", "v2")).toDF("id", "label", "name")
      val re = Seq((10L, 1L, 2L, "knows")).toDF("id", "src", "dst", "label")
      val rg = graft.data.PropertyGraph(graft.core.GraphSchema(), rv, re)
      val rg2 = graft.data.GraphIO.applyMutations(rg,
        deleteVertexIds = Some(Seq(2L).toDF("id")))
      def deg(g: graft.data.PropertyGraph, id: Long) =
        graft.query.VertexCentricQuery(g).onVertices(id).direction(Direction.BOTH).edges()
      // testGlobalIteration
      val gv = s.range(50).select((col("id") + 1L).as("id"), lit("v").as("label"),
        col("id").as("count"))
      val ge = s.range(1, 50).select((col("id") + 100L).as("id"), col("id").as("src"),
        (col("id") + 1L).as("dst"), lit("next").as("label"))
      val gg = graft.data.PropertyGraph(graft.core.GraphSchema(), gv, ge)
      val gg2 = graft.data.GraphIO.applyMutations(gg, deleteVertexIds =
        Some(gg.vertices.orderBy(col("id")).limit(5).select(col("id"))))
      Seq(
        n("basic_v_byid", bg.V().hasId(1L).vertices()),
        n("basic_missing", bg.V().hasId(65L).vertices()),
        n("basic_by_name", bg.V().has("name", "abcd").vertices()),
        n("basic_relations",
          graft.query.VertexCentricQuery(bg).onVertices(1L).properties()
            .unionByName(deg(bg, 1L).select(col("vid"), lit("e").as("key"),
              lit("e").as("value")), allowMissingColumns = true)),
        n("basic_all", bg.V().vertices()),
        n("basic_cleared", cleared.V().vertices()),
        n("rm_pre_v", rg.V().vertices()),
        n("rm_pre_v2", rg.V().has("name", "v2").vertices()),
        n("rm_pre_deg_v1", deg(rg, 1L)),
        n("rm_pre_deg_v2", deg(rg, 2L)),
        n("rm_post_deg_v1", deg(rg2, 1L)),
        n("rm_post_v", rg2.V().vertices()),
        n("rm_post_v1", rg2.V().has("name", "v1").vertices()),
        n("rm_post_v2", rg2.V().has("name", "v2").vertices()),
        n("gi_v", gg.V().vertices()),
        n("gi_e", gg.E().edges()),
        n("gi_post_v", gg2.V().vertices()),
        n("gi_post_gte0", gg2.V().has("count", P.gte(0L)).vertices()),
        n("gi_post_e", gg2.E().edges()),
      ).reduce(_ unionAll _)
    }),
    // ---- Medium create-retrieve conformance (testMediumCreateRetrieve,
    //      TitanGraphTest.java:284-391): 500 vertices (name='vertex'+i,
    //      uid=i), 5 connect + 5 knows out-edges per vertex at fixed ring
    //      offsets (wrapAround), knows edges carrying uid = src_uid+dst_uid,
    //      weight = offset·1.5, name = i+"-"+offset. Every per-vertex
    //      degree/property assertion aggregates to "all 500 satisfy";
    //      per-edge invariants aggregate to "all 2500 knows edges satisfy";
    //      the uid-index and name-index lookups must agree pointwise. ----
    "q_tp_medium" -> ((s, dir) => {
      import s.implicits._
      import graft.query.Direction
      def n(caze: String, d: DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(caze).as("caze"), col("n"))
      val N = 500L
      val mv = s.range(N).select((col("id") + 1L).as("id"), lit("node").as("label"),
        concat(lit("vertex"), col("id").cast("string")).as("name"), col("id").as("uid"))
      val cOffDf = Seq(-100L, -34L, -4L, 10L, 20L).zipWithIndex
        .map { case (o, j) => (o, j.toLong) }.toDF("off", "j")
      val kOffDf = Seq(-400L, -18L, 8L, 232L, 334L).zipWithIndex
        .map { case (o, j) => (o, j.toLong) }.toDF("off", "j")
      val base = s.range(N).select(col("id").as("i"))
      val connectE = base.crossJoin(cOffDf).select(
        (col("i") * 10L + col("j") + 100000L).as("id"), (col("i") + 1L).as("src"),
        (pmod(col("i") + col("off"), lit(N)) + 1L).as("dst"), lit("connect").as("label"),
        lit(null).cast("long").as("uid"), lit(null).cast("double").as("weight"),
        lit(null).cast("string").as("name"))
      val knowsE = base.crossJoin(kOffDf).select(
        (col("i") * 10L + col("j") + 100005L).as("id"), (col("i") + 1L).as("src"),
        (pmod(col("i") + col("off"), lit(N)) + 1L).as("dst"), lit("knows").as("label"),
        (col("i") + pmod(col("i") + col("off"), lit(N))).as("uid"),
        (col("off").cast("double") * 1.5).as("weight"),
        concat(col("i").cast("string"), lit("-"), col("off").cast("string")).as("name"))
      val mg = graft.data.PropertyGraph(graft.core.GraphSchema(), mv,
        connectE.unionByName(knowsE))
      def vq = graft.query.VertexCentricQuery(mg)
      val vu = mv.select(col("id").as("vid2"), col("uid").as("vuid"))
      val ke = mg.E().hasLabel("knows").edges()
      val joined = ke
        .join(vu.withColumnRenamed("vid2", "sid2").withColumnRenamed("vuid", "suid"),
          col("src") === col("sid2"))
        .join(vu.withColumnRenamed("vid2", "did2").withColumnRenamed("vuid", "duid"),
          col("dst") === col("did2"))
      Seq(
        n("med_out10", vq.direction(Direction.OUT).edgeCount()
          .filter(col("count") === 10L)),
        n("med_out_connect5", vq.direction(Direction.OUT).labels("connect")
          .edgeCount().filter(col("count") === 5L)),
        n("med_both_connect10", vq.direction(Direction.BOTH).labels("connect")
          .edgeCount().filter(col("count") === 10L)),
        n("med_both_knows10", vq.direction(Direction.BOTH).labels("knows")
          .edgeCount().filter(col("count") === 10L)),
        n("med_props2", vq.propertyCount().filter(col("count") === 2L)),
        n("med_knows_uid_ok", joined.filter(col("uid") === col("suid") + col("duid"))),
        n("med_knows_name_ok", joined.filter(col("name") ===
          concat(col("suid").cast("string"), lit("-"),
            (col("weight") / 1.5).cast("int").cast("string")))),
        n("med_name_uid_agree", mg.vertices.filter(
          col("name") === concat(lit("vertex"), col("uid").cast("string")))),
        n("med_bulk_50", mg.V().hasId(1L to 50L: _*).vertices()),
      ).reduce(_ unionAll _)
    }),
    // ---- Unindexed global order (testWithoutIndex, TitanGraphTest.java:
    //      4488-4521): orderBy on a key with NO index falls back to the
    //      engine sort and limit still applies — 1000 vertices / 999 edges
    //      with LCG-drawn kids, asc/desc × vertices/edges × four limits.
    //      The oracle pins the full (rank, kid) prefix content: the sorted
    //      multiset prefix is unique even across equal-kid ties. ----
    "q_tp_order_noindex" -> ((s, dir) => {
      val verts = s.range(1000).select((col("id") + 1L).as("id"), lit("v").as("label"),
        (expr("(1103515245 * (id + 1) + 12345) % 2147483648") % 1000L).as("kid"),
        concat(lit("v"), col("id").cast("string")).as("name"))
      val edges = s.range(1, 1000).select((col("id") + 5000L).as("id"),
        (col("id") + 1L).as("src"), col("id").as("dst"), lit("knows").as("label"),
        (expr("(1103515245 * (id + 7777) + 12345) % 2147483648") % 500L).as("kid"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), verts, edges)
      def ranked(caze: String, d: DataFrame, asc: Boolean) = {
        val w = org.apache.spark.sql.expressions.Window.orderBy(
          if (asc) col("kid").asc else col("kid").desc)
        d.select(lit(caze).as("caze"), row_number().over(w).as("rn"), col("kid"))
      }
      Seq(
        ranked("on_v_asc_500", g.V().orderBy("kid").limit(500).vertices(), asc = true),
        ranked("on_e_asc_300", g.E().orderBy("kid").limit(300).edges(), asc = true),
        ranked("on_v_desc_400",
          g.V().orderBy("kid", asc = false).limit(400).vertices(), asc = false),
        ranked("on_e_desc_200",
          g.E().orderBy("kid", asc = false).limit(200).edges(), asc = false),
      ).reduce(_ unionAll _)
    }),
  )

  /** Headline subset timed by Bench (others still verified for correctness). */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "q_has_eq", "q_orderby_limit", "q_multiquery",
    "q_vc_topk", "q_traversal_3hop", "q_degree", "q_text_contains",
    "q_dedup_minhash", "q_ann_topk", "q_sessionize", "q_pagerank",
    "q_tpch_q3", "q_tpch_q5",
    "q_semantic_dedup", "q_bm25", "q_lsh_cosine_pairs",
    // exact-substring span removal: the heaviest text-rewrite op (positioned
    // grams + anti-join rebuild) — bench it so gram-frame regressions surface
    "q_remove_dup_spans",
    // the production ANN composition (coarse probe + ADC over codes): bench
    // it so index-build (k-means trains) and search-path regressions surface
    "q_ivfpq_topk",
    // PQ ADC search alone (subspace codebook trains + LUT joins + per-query
    // top-k): regression cover for the PQ family independent of IVF probing
    "q_pq_topk",
    // incremental-ingest dedup (batch vs corpus banded index): the
    // production CDC dedup loop's wall-time, tracked per round
    "q_neardup_against",
    // JDK imageio decode through mapPartitions: the multimodal decode path's
    // wall-time (batch shape, blob handling) gets tracked per round
    "q_image_decode",
    // iterative-join analytics: regressions hide in lineage truncation and
    // cache lifecycle, so the bench times them every round
    // q_triangles_df is the same statistic through the DataFrame-native
    // degree-ordered wedge closure — benched next to the GraphX path so the
    // ~10× gap (0.34s vs 3.46s at sf0.1, same-session A/B) stays visible
    // q_ktruss: per-round oriented triangle enumeration — the new iterative
    // family gets regression tracking like kcore/cc
    "q_kcore", "q_ktruss", "q_triangles", "q_triangles_df", "q_connected_components",
    // round-12 iterative families: full-decomposition coreness (h-index
    // fixpoint), Trim+FW-BW SCC, and Borůvka spanning forest — each is a
    // multi-phase label loop whose regressions (lost broadcast, lineage
    // growth) only show up under timing
    "q_coreness", "q_scc", "q_msf",
    // corpus-scale text loops: BPE merge learning (argmax + rewrite per
    // round) and the DSIR scorer (explode → bucket agg → broadcast rejoin)
    "q_bpe_train", "q_dsir_weights",
    // native CDC source end-to-end (readStream → stateful sessionize →
    // memory sink): the one streaming family wall-time, so source/state
    // throughput regressions surface in the bench, not just correctness
    "q_change_sessionize",
    // round-12 heavies: the FoaF pair join + rank-limit window, the
    // line-dedup text rebuild, and the exact-CDF per-type global sort
    "q_recommend_links", "q_remove_dup_lines", "q_value_percentiles",
    // late round-12: Katz (8 fixed-point rounds over the cached edge
    // projection), sampled Brandes betweenness (3 sources × forward σ +
    // backward δ sweeps — the deepest per-level loop in the inventory),
    // and the trigram backoff scorer (three n-gram models + a 3-way
    // broadcast join onto the position stream)
    "q_katz", "q_betweenness", "q_stupid_backoff")

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue,
        |COUNT(*) AS cnt FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_has_eq" ->
      "SELECT c_custkey AS uid, c_name AS name, c_mktsegment AS mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'",
    "q_has_exists" ->
      """SELECT c_custkey AS uid, 'customer' AS label, c_acctbal AS acctbal FROM customer
        |UNION ALL SELECT s_suppkey, 'supplier', s_acctbal FROM supplier""".stripMargin,
    "q_interval" ->
      "SELECT o_orderkey AS uid, o_totalprice AS totalprice FROM orders WHERE o_totalprice >= 50000.0 AND o_totalprice < 100000.0",
    "q_orderby_limit" ->
      "SELECT o_orderkey AS uid, o_totalprice AS totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_contain_in" ->
      "SELECT p_partkey AS uid, p_brand AS brand FROM part WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#9')",
    "q_text_contains" ->
      "SELECT p_partkey AS uid, p_name AS name FROM part WHERE list_contains(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> length(t) > 1), 'widget')",
    "q_text_prefix" ->
      "SELECT p_partkey AS uid, p_name AS name FROM part WHERE len(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> length(t) > 1 AND t LIKE 'gi%')) > 0",
    "q_text_regex" ->
      "SELECT p_partkey AS uid, p_name AS name FROM part WHERE len(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> length(t) > 1 AND regexp_full_match(t, 'g.z.*'))) > 0",
    "q_multiquery" ->
      """SELECT c_custkey AS uid, COUNT(*) AS cnt FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' GROUP BY 1""".stripMargin,
    "q_vc_topk" ->
      """SELECT l_orderkey AS o_uid, l_partkey AS p_uid, l_extendedprice AS extendedprice FROM (
        |SELECT l_orderkey, l_partkey, l_extendedprice,
        |ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber, l_partkey, l_suppkey) AS rn
        |FROM lineitem) WHERE rn <= 2""".stripMargin,
    "q_vc_interval" ->
      """SELECT l_orderkey AS o_uid, l_partkey AS p_uid, l_quantity AS quantity,
        |strftime(l_shipdate, '%Y-%m-%d') AS ship FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'""".stripMargin,
    "q_traversal_3hop" ->
      """SELECT DISTINCT l_partkey AS uid, p_name AS name FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN part ON p_partkey = l_partkey
        |WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 400000.0""".stripMargin,
    "q_groupcount" ->
      "SELECT c_mktsegment AS mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1",
    "q_range" ->
      "SELECT o_orderkey AS uid, o_totalprice AS totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey OFFSET 10 LIMIT 10",
    "q_repeat" ->
      """SELECT c_custkey AS uid, 'customer' AS label FROM customer
        |JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |UNION ALL SELECT s_suppkey, 'supplier' FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q_group" ->
      "SELECT c_mktsegment AS mktsegment, array_to_string(list_sort(list(c_custkey)), ',') AS uids FROM customer GROUP BY 1",
    "q_union" ->
      "SELECT c_custkey AS uid, c_mktsegment AS mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')",
    "q_degree" ->
      "SELECT l_partkey AS uid, COUNT(*) AS cnt FROM lineitem GROUP BY 1",
    "q_events_agg" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q_change_replay" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'REMOVED' ELSE 'ADDED' END AS change,
        |COUNT(*) AS cnt FROM events GROUP BY 1""".stripMargin,
    "q_having" ->
      """SELECT o_custkey AS uid,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend,
        |COUNT(*) AS n_orders FROM orders GROUP BY 1
        |HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) > 1500000.0""".stripMargin,
    "q_tpch_q3" ->
      """SELECT o_orderkey AS o_uid, strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1998-01-01'
        |AND l_shipdate > DATE '1998-01-01'
        |GROUP BY 1, 2 ORDER BY revenue DESC, o_uid LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name AS nation,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1996-01-01'
        |AND o_orderdate < DATE '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey AS c_uid, o_orderkey AS o_uid,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running
        |FROM orders""".stripMargin,
    "q_count_distinct" ->
      """SELECT o_custkey AS uid, COUNT(DISTINCT l_partkey) AS n_parts FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1""".stripMargin,
    "q_events_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2""".stripMargin,
    "q_select" ->
      """SELECT c_custkey AS c_uid, o_orderkey AS o_uid FROM customer
        |JOIN orders ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q_select_pop" ->
      """SELECT c_custkey AS first_uid, 'customer' AS first_label FROM customer
        |JOIN orders ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q_select_pop_all" ->
      s"""SELECT CAST(${TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits)} + c_custkey AS VARCHAR)
         | || ',' || CAST(${TpchGraph.OrderTag.toLong * (1L << graft.core.GraphIds.TagBits)} + o_orderkey AS VARCHAR) AS x_ids
         |FROM customer JOIN orders ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q_sack" ->
      """SELECT 0.0 + o_totalprice + l_extendedprice AS sack FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    // every order is reached by branch 1 with sack 1+100; urgent orders are
    // ALSO reached by branch 2 and the declared sum-merge folds the clones
    "q_sack_split" ->
      """SELECT CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 202 ELSE 101 END AS BIGINT) AS sack,
        |COUNT(*) AS cnt FROM orders GROUP BY 1""".stripMargin,
    "q_where_not" ->
      """SELECT c_custkey AS uid, c_name AS name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,
    "q_optional" ->
      """SELECT o_orderkey AS uid, 'order' AS label FROM orders
        |UNION ALL SELECT c_custkey, 'customer' FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_vc_adjacent" ->
      "SELECT l_orderkey AS o_uid, l_quantity AS quantity, l_linenumber AS linenumber FROM lineitem WHERE l_partkey = 1",
    "q_sortkey_slice" ->
      """SELECT l_orderkey AS o_uid, l_partkey AS p_uid,
        |strftime(l_shipdate, '%Y-%m-%d') AS ship FROM lineitem
        |WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-06-01'""".stripMargin,
    "q_index_lifecycle" ->
      """SELECT '0_install' AS step, 'INSTALLED' AS state
        |UNION ALL SELECT '1_register', 'REGISTERED'
        |UNION ALL SELECT '2_enable', 'ENABLED'
        |UNION ALL SELECT '3_reindex', 'ENABLED'
        |UNION ALL SELECT '4_query_hits', CAST((SELECT COUNT(*) FROM part
        |  WHERE list_contains(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'),
        |    t -> length(t) > 1), 'widget')) AS VARCHAR)
        |UNION ALL SELECT '5_disable', 'DISABLED'
        |UNION ALL SELECT '6_remove', 'DISABLED'
        |UNION ALL SELECT '7_present', 'false'""".stripMargin,
    "q_mixed_index" ->
      "SELECT p_partkey AS uid, p_name AS name FROM part WHERE list_contains(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> length(t) > 1), 'widget')",
    "q_index_auto_text" ->
      "SELECT p_partkey AS uid, p_name AS name FROM part WHERE list_contains(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> length(t) > 1), 'widget')",
    "q_match" ->
      """SELECT DISTINCT c_custkey AS uid FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 400000.0""".stripMargin,
    "q_match_multi" ->
      """SELECT DISTINCT c_custkey AS cust_uid, o_orderkey AS order_uid
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000.0 AND o_totalprice < 400000.0
        |AND c_mktsegment = 'BUILDING'""".stripMargin,
    "q_match_shared" ->
      """SELECT DISTINCT c_custkey AS cust_uid, o_orderkey AS order_uid
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000.0 AND o_totalprice < 400000.0
        |AND c_mktsegment = 'BUILDING' AND c_acctbal > 0.0""".stripMargin,
    "q_choose_option" ->
      """SELECT o_orderkey AS uid, 'order' AS label FROM orders
        |JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING'
        |UNION ALL SELECT c_custkey, 'customer' FROM customer WHERE c_mktsegment = 'MACHINERY'
        |UNION ALL SELECT n_nationkey, 'nation' FROM customer
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY')""".stripMargin,
    "q_index_auto_scoped" ->
      "SELECT c_custkey AS uid, c_name AS name FROM customer WHERE c_mktsegment = 'BUILDING'",
    "q_mixed_string" ->
      "SELECT p_partkey AS uid, p_brand AS brand FROM part WHERE p_brand = 'Brand#12'",
    "q_mixed_textstring" ->
      """SELECT p_partkey AS uid, p_name AS name, 'contains' AS via FROM part
        |WHERE list_contains(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> length(t) > 1), 'widget')
        |UNION ALL SELECT p_partkey, p_name, 'exact' FROM part WHERE p_name = 'red plate'""".stripMargin,
    "q_mixed_range" ->
      "SELECT p_partkey AS uid, p_retailprice AS retailprice FROM part WHERE p_retailprice >= 905.0 AND p_retailprice < 915.0",
    "q_mixed_range_date" ->
      """SELECT o_orderkey AS uid, strftime(o_orderdate, '%Y-%m-%d') AS odate
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1995-03-01'
        |AND o_orderdate < TIMESTAMP '1995-03-08'""".stripMargin,
    "q_index_lucene" ->
      """WITH t AS (SELECT p_partkey AS uid, p_name AS name, p_brand AS brand,
        |  list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), x -> length(x) > 1) AS tn,
        |  list_filter(string_split_regex(lower(p_brand), '[^a-z0-9]+'), x -> length(x) > 1) AS tb
        |  FROM part),
        |s AS (SELECT uid, name, brand,
        |  (CAST(list_contains(tn,'small') AS INT) + CAST(list_contains(tn,'widget') AS INT)) AS hn,
        |  (CAST(list_contains(tb,'brand') AS INT) + CAST(list_contains(tb,'12') AS INT)) AS hb,
        |  len(tn) AS nn, len(tb) AS nb FROM t)
        |SELECT uid, name, brand,
        |  (CAST(hn AS DOUBLE)/2.0 + 0.001/CAST(nn + 10 AS DOUBLE)) +
        |  (CAST(hb AS DOUBLE)/2.0 + 0.001/CAST(nb + 10 AS DOUBLE)) AS score
        |FROM s WHERE hn > 0 AND hb > 0 ORDER BY score DESC, uid LIMIT 20""".stripMargin,
    "q_multiprops" ->
      """SELECT l_orderkey AS uid, COUNT(*) AS n_cells,
        |CAST(SUM(l_partkey) AS BIGINT) AS sum_part FROM lineitem
        |WHERE l_returnflag = 'R' GROUP BY 1""".stripMargin,
    "q_tp_vertexstep" ->
      """WITH e AS (SELECT CAST(x.range AS BIGINT) AS eid, x.range // 100 AS i,
        |  x.range % 100 AS j, CAST(x.range % 100 % 5 AS BIGINT) AS w FROM range(1000) x)
        |SELECT 'outE_has_w1' AS caze, COUNT(*) AS n, CAST(SUM(w) AS BIGINT) AS ws
        |  FROM e WHERE i = 0 AND w = 1
        |UNION ALL SELECT 'outE', COUNT(*), CAST(SUM(w) AS BIGINT) FROM e WHERE i = 0
        |UNION ALL SELECT 'out', COUNT(*), CAST(SUM(w) AS BIGINT) FROM e WHERE i = 0
        |UNION ALL SELECT 'local_limit10', COUNT(*), CAST(SUM(w) AS BIGINT)
        |  FROM e WHERE i = 0 AND j < 10
        |UNION ALL SELECT 'local_range_10_20', COUNT(*), CAST(SUM(w) AS BIGINT)
        |  FROM e WHERE i = 0 AND j >= 10 AND j < 20
        |UNION ALL SELECT 'local_order_limit10', COUNT(*), CAST(SUM(w) AS BIGINT)
        |  FROM (SELECT w FROM e WHERE i = 0 ORDER BY w DESC, eid ASC LIMIT 10)
        |UNION ALL SELECT 'has_w1_order', COUNT(*), CAST(SUM(w) AS BIGINT)
        |  FROM e WHERE i = 0 AND w = 1
        |UNION ALL SELECT 'local_has_w1_order_limit10', COUNT(*), CAST(SUM(w) AS BIGINT)
        |  FROM (SELECT w FROM e WHERE i = 0 AND w = 1 ORDER BY w ASC, eid ASC LIMIT 10)
        |UNION ALL SELECT 'local_has_has_range_10_15', COUNT(*), CAST(SUM(w) AS BIGINT)
        |  FROM (SELECT w FROM e WHERE i = 0 AND w = 1 ORDER BY w ASC, eid ASC
        |        LIMIT 5 OFFSET 10)""".stripMargin,
    "q_tp_filter_is" ->
      """SELECT 'outE_filter_inV_is' AS caze, CAST(1 AS BIGINT) AS n
        |UNION ALL SELECT 'outE_filter_otherV_is', 1
        |UNION ALL SELECT 'bothE_filter_otherV_is', 1
        |UNION ALL SELECT 'bothE_filter_inV_is', 1
        |UNION ALL SELECT 'v50_bothE_otherV_super', 1""".stripMargin,
    "q_tp_properties" ->
      """WITH c AS (SELECT i.range AS i, CAST(j.range AS BIGINT) AS j,
        |  CAST(j.range % 5 AS BIGINT) AS w FROM range(10) i, range(100) j)
        |SELECT 'props_all' AS caze, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN w = 4 THEN 1 ELSE 0 END) AS BIGINT) AS nw4
        |  FROM c WHERE i = 0
        |UNION ALL SELECT 'props_meta_w1', COUNT(*),
        |  CAST(SUM(CASE WHEN w = 4 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM c WHERE i = 0 AND w = 1
        |UNION ALL SELECT 'props_local_order_limit10', COUNT(*),
        |  CAST(SUM(CASE WHEN w = 4 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM (SELECT w FROM c WHERE i = 0 ORDER BY w DESC, j ASC LIMIT 10)
        |UNION ALL SELECT 'supers_values_names', COUNT(*),
        |  CAST(SUM(CASE WHEN w = 4 THEN 1 ELSE 0 END) AS BIGINT) FROM c""".stripMargin,
    "q_tp_graphstep" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS j,
        |  CAST(x.range % 5 AS BIGINT) AS w FROM range(100) x),
        |e AS (SELECT x.range // 100 AS i, x.range % 100 AS j,
        |  CAST(x.range % 100 % 5 AS BIGINT) AS w FROM range(1000) x)
        |SELECT 'has_id20' AS caze, COUNT(*) AS n FROM v WHERE j = 20
        |UNION ALL SELECT 'has_id20_w0', COUNT(*) FROM v WHERE j = 20 AND w = 0
        |UNION ALL SELECT 'has_w1', COUNT(*) FROM v WHERE w = 1
        |UNION ALL SELECT 'has_w1_range_0_10', COUNT(*)
        |  FROM (SELECT 1 FROM v WHERE w = 1 ORDER BY j LIMIT 10)
        |UNION ALL SELECT 'has_sid', COUNT(*) FROM range(10)
        |UNION ALL SELECT 'has_id20_as', COUNT(*) FROM v WHERE j = 20
        |UNION ALL SELECT 'sid_outE_w1', COUNT(*) FROM e WHERE w = 1
        |UNION ALL SELECT 'sid_outE_w_between', COUNT(*) FROM e WHERE w >= 1 AND w < 3
        |UNION ALL SELECT 'sid_outE_between_p', COUNT(*) FROM e WHERE w >= 1 AND w < 3
        |UNION ALL SELECT 'sid_local_limit10', CAST(SUM(t.c) AS BIGINT)
        |  FROM (SELECT LEAST(COUNT(*), 10) AS c FROM e WHERE w >= 1 AND w < 3
        |        GROUP BY i) t""".stripMargin,
    "q_tp_select_edge" -> "SELECT CAST(10 AS BIGINT) AS eid",
    "q_tp_selfloop" ->
      """SELECT 'out' AS caze, CAST(1 AS BIGINT) AS n
        |UNION ALL SELECT 'in', 1
        |UNION ALL SELECT 'both', 2
        |UNION ALL SELECT 'trav_bothE', 2
        |UNION ALL SELECT 'trav_both_v', 2""".stripMargin,
    "q_tp_globalindex" ->
      """WITH t AS (SELECT CAST(x.range AS BIGINT) AS i,
        |  CAST(x.range % 10 AS DOUBLE) * 0.5 AS w, CAST(x.range AS BIGINT) AS tm,
        |  CASE WHEN x.range % 4 = 0 THEN 'aaa' WHEN x.range % 4 = 1 THEN 'bbb'
        |       WHEN x.range % 4 = 2 THEN 'ccc' ELSE 'ddd' END AS txt FROM range(100) x),
        |e AS (SELECT i, w, tm, txt, 'connect' AS lbl FROM t
        |      UNION ALL SELECT i, fmod(w + 1.0, 5.0), tm, txt, 'related' FROM t),
        |p AS (SELECT i, 'v' || CAST(i AS VARCHAR) AS v, w, tm, txt FROM t
        |      UNION ALL SELECT i, 'u' || CAST(i % 5 AS VARCHAR), w, tm, txt FROM t)
        |SELECT 'e_t10_w0' AS caze, COUNT(*) AS n FROM e WHERE tm = 10 AND w = 0.0
        |UNION ALL SELECT 'e_tin_w0', COUNT(*) FROM e WHERE tm IN (10, 20, 30) AND w = 0.0
        |UNION ALL SELECT 'e_t10_w0_ccc', COUNT(*) FROM e WHERE tm = 10 AND w = 0.0 AND txt = 'ccc'
        |UNION ALL SELECT 'e_t10_w1', COUNT(*) FROM e WHERE tm = 10 AND w = 1.0
        |UNION ALL SELECT 'e_t20_w0', COUNT(*) FROM e WHERE tm = 20 AND w = 0.0
        |UNION ALL SELECT 'e_t20_w3', COUNT(*) FROM e WHERE tm = 20 AND w = 3.0
        |UNION ALL SELECT 'e_aaa_connect', COUNT(*) FROM e WHERE txt = 'aaa' AND lbl = 'connect'
        |UNION ALL SELECT 'e_aaa_connect_limit10', COUNT(*)
        |  FROM (SELECT 1 FROM e WHERE txt = 'aaa' AND lbl = 'connect' LIMIT 10)
        |UNION ALL SELECT 'e_aaa', COUNT(*) FROM e WHERE txt = 'aaa'
        |UNION ALL SELECT 'e_w15', COUNT(*) FROM e WHERE w = 1.5
        |UNION ALL SELECT 'p_t50', COUNT(*) FROM p WHERE tm = 50
        |UNION ALL SELECT 'p_w0_aaa', COUNT(*) FROM p WHERE w = 0.0 AND txt = 'aaa'
        |UNION ALL SELECT 'p_w0_aaa_t0', COUNT(*) FROM p WHERE w = 0.0 AND txt = 'aaa' AND tm = 0
        |UNION ALL SELECT 'p_w15', COUNT(*) FROM p WHERE w = 1.5
        |UNION ALL SELECT 'v_t50_person', COUNT(*) FROM t WHERE tm = 50 AND i % 2 = 0
        |UNION ALL SELECT 'v_ccc_person', COUNT(*) FROM t WHERE txt = 'ccc' AND i % 2 = 0
        |UNION ALL SELECT 'v_ddd_person', COUNT(*) FROM t WHERE txt = 'ddd' AND i % 2 = 0
        |UNION ALL SELECT 'v_ccc_person_t2', COUNT(*) FROM t WHERE txt = 'ccc' AND i % 2 = 0 AND tm = 2
        |UNION ALL SELECT 'v_t51_v51_org', COUNT(*) FROM t WHERE i % 2 = 1 AND tm = 51
        |  AND ('v' || CAST(i AS VARCHAR) = 'v51' OR 'u' || CAST(i % 5 AS VARCHAR) = 'v51')
        |UNION ALL SELECT 'v_t51_u1_org', COUNT(*) FROM t WHERE i % 2 = 1 AND tm = 51
        |  AND ('v' || CAST(i AS VARCHAR) = 'u1' OR 'u' || CAST(i % 5 AS VARCHAR) = 'u1')
        |UNION ALL SELECT 'v_tin5_u1_org', COUNT(*) FROM t WHERE i % 2 = 1
        |  AND tm IN (51, 61, 71, 31, 41)
        |  AND ('v' || CAST(i AS VARCHAR) = 'u1' OR 'u' || CAST(i % 5 AS VARCHAR) = 'u1')
        |UNION ALL SELECT 'v_tin_empty', COUNT(*) FROM t WHERE FALSE
        |UNION ALL SELECT 'v_ccc_person_tnotin_empty', COUNT(*) FROM t WHERE txt = 'ccc' AND i % 2 = 0
        |UNION ALL SELECT 'v_t51_org', COUNT(*) FROM t WHERE tm = 51 AND i % 2 = 1
        |UNION ALL SELECT 'v_name_u1', COUNT(*) FROM t
        |  WHERE 'v' || CAST(i AS VARCHAR) = 'u1' OR 'u' || CAST(i % 5 AS VARCHAR) = 'u1'
        |UNION ALL SELECT 'v_name_v1', COUNT(*) FROM t
        |  WHERE 'v' || CAST(i AS VARCHAR) = 'v1' OR 'u' || CAST(i % 5 AS VARCHAR) = 'v1'
        |UNION ALL SELECT 'v_name_v1_org', COUNT(*) FROM t WHERE i % 2 = 1
        |  AND ('v' || CAST(i AS VARCHAR) = 'v1' OR 'u' || CAST(i % 5 AS VARCHAR) = 'v1')""".stripMargin,
    "q_tp_relindex" ->
      """WITH t AS (SELECT CAST(x.range AS BIGINT) AS i,
        |  CAST(x.range % 10 AS DOUBLE) * 0.5 AS w, CAST(x.range % 10 AS BIGINT) AS w2,
        |  (x.range + 77) % 100 AS tm FROM range(100) x)
        |SELECT 'props_wgt36' AS caze, COUNT(*) AS n, CAST(SUM(w2) AS BIGINT) AS ws2 FROM t WHERE w > 3.6
        |UNION ALL SELECT 'props_wlt09_order', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE w < 0.9
        |UNION ALL SELECT 'props_interval_order_limit10', COUNT(*), CAST(SUM(w2) AS BIGINT)
        |  FROM (SELECT w2 FROM t WHERE w >= 1.1 AND w < 2.2 ORDER BY w DESC LIMIT 10)
        |UNION ALL SELECT 'props_t5', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE tm = 5
        |UNION ALL SELECT 'props_all', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t
        |UNION ALL SELECT 'child_out_t5', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE tm = 5
        |UNION ALL SELECT 'child_both_t5', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE tm = 5
        |UNION ALL SELECT 'child_out_tint_10_20_limit5', COUNT(*), CAST(SUM(w2) AS BIGINT)
        |  FROM (SELECT w2 FROM t WHERE tm >= 10 AND tm < 20 ORDER BY w DESC LIMIT 5)
        |UNION ALL SELECT 'child_both_wint_0_1_order', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE w >= 0.0 AND w < 1.0
        |UNION ALL SELECT 'child_out_wint_0_1', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE w >= 0.0 AND w < 1.0
        |UNION ALL SELECT 'child_both', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t
        |UNION ALL SELECT 'child_both_vertexIds', COUNT(*), CAST(0 AS BIGINT) FROM t
        |UNION ALL SELECT 'child_out_wint_vertexIds', COUNT(*), CAST(0 AS BIGINT) FROM t WHERE w >= 0.0 AND w < 1.0
        |UNION ALL SELECT 'child_out_tint_70_80_order_time', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE tm >= 70 AND tm < 80
        |UNION ALL SELECT 'connect_t5_wint_out', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE tm = 5 AND w >= 0.0 AND w < 5.0
        |UNION ALL SELECT 'connect_t5_wint_both', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE tm = 5 AND w >= 0.0 AND w < 5.0
        |UNION ALL SELECT 'connect_tint_wint_out', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE tm >= 10 AND tm < 20 AND w >= 0.0 AND w < 5.0
        |UNION ALL SELECT 'connect_out_order_asc_limit10', COUNT(*), CAST(SUM(w2) AS BIGINT)
        |  FROM (SELECT w2 FROM t ORDER BY w ASC LIMIT 10)
        |UNION ALL SELECT 'connect_out_order_desc_limit10', COUNT(*), CAST(SUM(w2) AS BIGINT)
        |  FROM (SELECT w2 FROM t ORDER BY w DESC LIMIT 10)
        |UNION ALL SELECT 'connect_out_wint_14_275_order', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE w >= 1.4 AND w < 2.75
        |UNION ALL SELECT 'connect_out_t22', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE tm = 22
        |UNION ALL SELECT 'connect_out_adj_u', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE i = 0
        |UNION ALL SELECT 'connect_out_w0_adj_u', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE i = 0 AND w = 0.0
        |UNION ALL SELECT 'connect_out_wint01_adj_u', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE i = 0 AND w >= 0.0 AND w < 1.0
        |UNION ALL SELECT 'connect_out_tint_50_100_adj_u', COUNT(*), CAST(SUM(w2) AS BIGINT) FROM t WHERE i = 0 AND tm >= 50 AND tm < 100
        |UNION ALL SELECT 'rel_all', CAST(COUNT(*) * 4 AS BIGINT), CAST(SUM(w2) * 4 AS BIGINT) FROM t
        |UNION ALL SELECT 'u_both_no_link', COUNT(*) * 2, CAST(SUM(w2) * 2 AS BIGINT) FROM t WHERE i = 0""".stripMargin,
    "q_tp_vcquery" ->
      """WITH t AS (SELECT CAST(x.range AS BIGINT) AS i, x.range % 3 AS m,
        |  CAST(x.range % 4 AS DOUBLE) + 0.5 AS w, x.range % 5 AS num FROM range(1, 10000) x)
        |SELECT 'both_all' AS caze, CAST(COUNT(*) * 2 AS BIGINT) AS n FROM t
        |UNION ALL SELECT 'connect_limit10', CAST(LEAST(COUNT(*) * 2, 10) AS BIGINT) FROM t WHERE m = 0
        |UNION ALL SELECT 'connectDesc_limit10_u', CAST(LEAST(COUNT(*) * 2, 10) AS BIGINT) FROM t WHERE m = 0
        |UNION ALL SELECT 'connect_tgt30_limit10', CAST(LEAST(COUNT(*) * 2, 10) AS BIGINT) FROM t WHERE m = 0 AND i > 30
        |UNION ALL SELECT 'connect_out_interval_3_31', COUNT(*) FROM t WHERE m = 0 AND i >= 3 AND i < 31
        |UNION ALL SELECT 'connect_out_t15_w35', COUNT(*) FROM t WHERE m = 0 AND i = 15 AND w = 3.5
        |UNION ALL SELECT 'connect_in_interval_3_31', COUNT(*) FROM t WHERE m = 0 AND i >= 3 AND i < 31
        |UNION ALL SELECT 'connect_out_vertexIds_3_31', COUNT(*) FROM t WHERE m = 0 AND i >= 3 AND i < 31
        |UNION ALL SELECT 'connect_out_tgt31', COUNT(*) FROM t WHERE m = 0 AND i > 31
        |UNION ALL SELECT 'friend_out_limit3', CAST(LEAST(COUNT(*), 3) AS BIGINT) FROM t WHERE m = 1
        |UNION ALL SELECT 'friend_out_w05_interval_3_33', COUNT(*) FROM t WHERE m = 1 AND w = 0.5 AND i >= 3 AND i < 33
        |UNION ALL SELECT 'friend_out_win3_interval_3_33', COUNT(*) FROM t WHERE m = 1 AND w IN (0.5, 1.5, 2.5) AND i >= 3 AND i < 33
        |UNION ALL SELECT 'friend_out_win2', COUNT(*) FROM t WHERE m = 1 AND w IN (0.5, 1.5)
        |UNION ALL SELECT 'friend_out_w05_interval_4_10', COUNT(*) FROM t WHERE m = 1 AND w = 0.5 AND i >= 4 AND i < 10
        |UNION ALL SELECT 'friend_out_tlte10', COUNT(*) FROM t WHERE m = 1 AND i <= 10
        |UNION ALL SELECT 'friend_out_tgt10', COUNT(*) FROM t WHERE m = 1 AND i > 10
        |UNION ALL SELECT 'fc_out_interval_3_33', COUNT(*) FROM t WHERE m IN (0, 1) AND i >= 3 AND i < 33
        |UNION ALL SELECT 'knows_out_n0', COUNT(*) FROM t WHERE m = 2 AND num = 0
        |UNION ALL SELECT 'knows_out_n0_w_0_4', COUNT(*) FROM t WHERE m = 2 AND num = 0 AND w >= 0.0 AND w < 4.0
        |UNION ALL SELECT 'knows_out_n0_w_0_2', COUNT(*) FROM t WHERE m = 2 AND num = 0 AND w >= 0.0 AND w < 2.0
        |UNION ALL SELECT 'knows_out_n0_w_21_4', COUNT(*) FROM t WHERE m = 2 AND num = 0 AND w >= 2.1 AND w < 4.0
        |UNION ALL SELECT 'fck_out_interval_3_33', COUNT(*) FROM t WHERE i >= 3 AND i < 33
        |UNION ALL SELECT 'fck_out_tne10', COUNT(*) FROM t WHERE i <> 10
        |UNION ALL SELECT 'connect_out_adj6_t6', COUNT(*) FROM t WHERE m = 0 AND i = 6
        |UNION ALL SELECT 'knows_out_adj11', COUNT(*) FROM t WHERE m = 2 AND i = 11
        |UNION ALL SELECT 'knows_in_adj11', COUNT(*) FROM t WHERE m = 2 AND i = 11
        |UNION ALL SELECT 'knows_both_adj11', CAST(COUNT(*) * 2 AS BIGINT) FROM t WHERE m = 2 AND i = 11
        |UNION ALL SELECT 'knows_out_adj11_w35', COUNT(*) FROM t WHERE m = 2 AND i = 11 AND w = 3.5
        |UNION ALL SELECT 'connect_both_adj6_t6', CAST(COUNT(*) * 2 AS BIGINT) FROM t WHERE m = 0 AND i = 6
        |UNION ALL SELECT 'connect_adj8_t8', COUNT(*) FROM t WHERE m = 0 AND i = 8
        |UNION ALL SELECT 'connect_out_count', COUNT(*) FROM t WHERE m = 0
        |UNION ALL SELECT 'connect_in_count', COUNT(*) FROM t WHERE m = 0
        |UNION ALL SELECT 'connect_both_count', CAST(COUNT(*) * 2 AS BIGINT) FROM t WHERE m = 0
        |UNION ALL SELECT 'in_t1', COUNT(*) FROM t WHERE i = 1
        |UNION ALL SELECT 'out_interval_4_14', COUNT(*) FROM t WHERE i >= 4 AND i < 14
        |UNION ALL SELECT 'in_interval_4_14_tne10', COUNT(*) FROM t WHERE i >= 4 AND i < 14 AND i <> 10
        |UNION ALL SELECT 'multi_in_connect', COUNT(*) FROM t WHERE i IN (6, 9, 12, 15, 60) AND m = 0
        |UNION ALL SELECT 'multi_connect_both', CAST(COUNT(*) * 2 AS BIGINT) FROM t WHERE i IN (6, 9, 12, 15, 60) AND m = 0
        |UNION ALL SELECT 'multi_knows', COUNT(*) FROM t WHERE i IN (6, 9, 12, 15, 60) AND m = 2
        |UNION ALL SELECT 'multi_all', CAST(COUNT(*) * 4 AS BIGINT) FROM t WHERE i IN (6, 9, 12, 15, 60)""".stripMargin,
    "q_edge_metaprops" ->
      """SELECT l_suppkey AS uid, COUNT(*) AS n_edges,
        |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
        |FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1""".stripMargin,
    "q_match_planner" ->
      """SELECT DISTINCT c_custkey AS uid FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0.0
        |AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q_index_query" ->
      """WITH t AS (SELECT p_partkey AS uid, p_name AS name,
        |  list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), x -> length(x) > 1) AS tok FROM part),
        |s AS (SELECT uid, name,
        |  (CAST(list_contains(tok,'small') AS INT) + CAST(list_contains(tok,'green') AS INT)
        |   + CAST(list_contains(tok,'widget') AS INT)) AS hits, len(tok) AS n FROM t)
        |SELECT uid, name, CAST(hits AS DOUBLE)/3.0 + 0.001/CAST(n + 10 AS DOUBLE) AS score
        |FROM s WHERE hits > 0 ORDER BY score DESC, uid LIMIT 20""".stripMargin,
    "q_degrees_full" ->
      "SELECT o_custkey AS uid, COUNT(*) AS out_degree FROM orders GROUP BY 1",
    "q_geo_within" ->
      """WITH t AS (SELECT p_partkey AS uid,
        |  CAST(p_partkey % 180 - 90 AS DOUBLE) AS lat,
        |  CAST((p_partkey * 7) % 360 - 180 AS DOUBLE) AS lon FROM part)
        |SELECT uid FROM t WHERE round(2 * 6371.0087714 * asin(sqrt(
        |  pow(sin(radians(0.0 - lat) / 2), 2) +
        |  cos(radians(lat)) * cos(radians(0.0)) * pow(sin(radians(0.0 - lon) / 2), 2))), 3)
        |  <= 5000.0""".stripMargin,
    "q_geo_index" ->
      """WITH t AS (SELECT p_partkey AS uid,
        |  CAST(p_partkey % 180 - 90 AS DOUBLE) AS lat,
        |  CAST((p_partkey * 7) % 360 - 180 AS DOUBLE) AS lon FROM part)
        |SELECT uid FROM t WHERE round(2 * 6371.0087714 * asin(sqrt(
        |  pow(sin(radians(0.0 - lat) / 2), 2) +
        |  cos(radians(lat)) * cos(radians(0.0)) * pow(sin(radians(0.0 - lon) / 2), 2))), 3)
        |  <= 5000.0""".stripMargin,
    "q_geo_intersects" ->
      """WITH t AS (SELECT p_partkey AS uid,
        |  CAST(p_partkey % 180 - 90 AS DOUBLE) AS lat,
        |  CAST((p_partkey * 7) % 360 - 180 AS DOUBLE) AS lon FROM part)
        |SELECT uid FROM t WHERE round(2 * 6371.0087714 * asin(sqrt(
        |  pow(sin(radians(30.0 - lat) / 2), 2) +
        |  cos(radians(lat)) * cos(radians(30.0)) * pow(sin(radians(40.0 - lon) / 2), 2))), 3)
        |  <= 1000.0 + 4000.0""".stripMargin,
    "q_geo_disjoint" ->
      """WITH t AS (SELECT p_partkey AS uid,
        |  CAST(p_partkey % 180 - 90 AS DOUBLE) AS lat,
        |  CAST((p_partkey * 7) % 360 - 180 AS DOUBLE) AS lon FROM part)
        |SELECT uid FROM t WHERE round(2 * 6371.0087714 * asin(sqrt(
        |  pow(sin(radians(30.0 - lat) / 2), 2) +
        |  cos(radians(lat)) * cos(radians(30.0)) * pow(sin(radians(40.0 - lon) / 2), 2))), 3)
        |  > 1000.0 + 4000.0""".stripMargin,
    "q_graphson" ->
      """SELECT 'region' AS label, CAST((SELECT COUNT(*) FROM region) AS BIGINT) AS cnt
        |UNION ALL SELECT 'nation', (SELECT COUNT(*) FROM nation)
        |UNION ALL SELECT 'in_region', (SELECT COUNT(*) FROM nation)""".stripMargin,
    "q_graphml" ->
      """SELECT 'region' AS label, CAST((SELECT COUNT(*) FROM region) AS BIGINT) AS cnt,
        |  (SELECT MIN(r_name) FROM region) AS min_name
        |UNION ALL SELECT 'nation', (SELECT COUNT(*) FROM nation), (SELECT MIN(n_name) FROM nation)
        |UNION ALL SELECT 'in_region', (SELECT COUNT(*) FROM nation), CAST(NULL AS VARCHAR)""".stripMargin,
    "q_unidirected" ->
      """SELECT 'out' AS dir, CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS cnt
        |UNION ALL SELECT 'in', 0""".stripMargin,
    "q_reindex" ->
      """SELECT CAST(999999 AS BIGINT) AS uid, 'part' AS label, 'REINDEXED_PART' AS name
        |UNION ALL SELECT n_nationkey, 'nation', n_name FROM nation
        |WHERE n_name = 'NATION_5'""".stripMargin,
    "q_gotg" ->
      """SELECT 'battled_gt1' AS kind, 'hydra' AS name
        |UNION ALL SELECT 'battled_gt1', 'cerberus'
        |UNION ALL SELECT 'grandfather', 'saturn'
        |UNION ALL SELECT 'geo50km', 'nemean'
        |UNION ALL SELECT 'geo50km', 'hydra'""".stripMargin,
    "q_gryo" ->
      """SELECT 'region' AS label, CAST((SELECT COUNT(*) FROM region) AS BIGINT) AS cnt,
        |  CAST((SELECT SUM(r_regionkey) FROM region) AS BIGINT) AS sum_uid
        |UNION ALL SELECT 'nation', (SELECT COUNT(*) FROM nation),
        |  CAST((SELECT SUM(n_nationkey) FROM nation) AS BIGINT)
        |UNION ALL SELECT 'in_region', (SELECT COUNT(*) FROM nation), 0""".stripMargin,
    "q_tail" ->
      "SELECT o_orderkey AS uid, o_totalprice AS totalprice FROM orders ORDER BY o_totalprice ASC, o_orderkey DESC LIMIT 5",
    "q_vertex_by_id" ->
      """SELECT c_custkey AS uid, 'customer' AS label FROM customer WHERE c_custkey = 1
        |UNION ALL SELECT s_suppkey, 'supplier' FROM supplier WHERE s_suppkey = 1
        |UNION ALL SELECT p_partkey, 'part' FROM part WHERE p_partkey = 10""".stripMargin,
    "q_relation_lookup" ->
      "SELECT n_nationkey AS n_uid, n_regionkey AS r_uid, 'in_region' AS label FROM nation WHERE n_nationkey = 5",
    "q_index_lookup" ->
      "SELECT n_nationkey AS uid, 'nation' AS label, n_name AS name FROM nation WHERE n_name = 'NATION_5'",
    "q_index_auto" ->
      "SELECT n_nationkey AS uid, 'nation' AS label, n_name AS name FROM nation WHERE n_name = 'NATION_5'",
    "q_force_index" ->
      "SELECT n_nationkey AS uid, 'nation' AS label, n_name AS name FROM nation WHERE n_name = 'NATION_5'",
    "q_rename_key" ->
      "SELECT n_nationkey AS uid, 'nation' AS label, n_name AS title FROM nation WHERE n_name = 'NATION_5'",
    "q_index_lookup_edge" ->
      """SELECT l_orderkey AS o_uid, l_partkey AS p_uid, l_quantity AS quantity,
        |l_linenumber AS linenumber FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,
    "q_mutations" ->
      """SELECT 'v' AS kind, 'region' AS label, COUNT(*) AS cnt FROM region
        |UNION ALL SELECT 'v', 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'v', 'customer', COUNT(*) - 1 FROM customer
        |UNION ALL SELECT 'v', 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'v', 'part', COUNT(*) + 1 FROM part
        |UNION ALL SELECT 'v', 'order', COUNT(*) FROM orders
        |UNION ALL SELECT 'e', 'in_region', COUNT(*) FROM nation
        |UNION ALL SELECT 'e', 'in_nation',
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey <> 1) + (SELECT COUNT(*) FROM supplier)
        |UNION ALL SELECT 'e', 'placed', COUNT(*) FROM orders WHERE o_custkey <> 1
        |UNION ALL SELECT 'e', 'contains', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'e', 'supplied_by', COUNT(*) FROM lineitem""".stripMargin,
    "q_mutations_static" ->
      """SELECT 'region' AS label, COUNT(*) + 1 AS cnt FROM region
        |UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'customer', COUNT(*) - 1 FROM customer
        |UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'order', COUNT(*) FROM orders""".stripMargin,
    "q_drop_step" ->
      """SELECT 'v' AS kind, 'region' AS label, COUNT(*) AS cnt FROM region
        |UNION ALL SELECT 'v', 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'v', 'customer',
        |  (SELECT COUNT(*) FROM customer WHERE c_mktsegment <> 'BUILDING')
        |UNION ALL SELECT 'v', 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'v', 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'v', 'order', COUNT(*) FROM orders
        |UNION ALL SELECT 'e', 'in_region', COUNT(*) FROM nation
        |UNION ALL SELECT 'e', 'in_nation',
        |  (SELECT COUNT(*) FROM customer WHERE c_mktsegment <> 'BUILDING')
        |  + (SELECT COUNT(*) FROM supplier)
        |UNION ALL SELECT 'e', 'placed',
        |  (SELECT COUNT(*) FROM orders JOIN customer ON c_custkey = o_custkey
        |   WHERE c_mktsegment <> 'BUILDING')
        |UNION ALL SELECT 'e', 'contains', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'e', 'supplied_by', COUNT(*) FROM lineitem""".stripMargin,
    "q_merge_vertices" ->
      """SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'MERGED' ELSE c_mktsegment END
        |  AS mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1
        |UNION ALL SELECT 'FRESH', 5""".stripMargin,
    "q_merge_edges" ->
      """SELECT CAST(9 AS BIGINT) AS w, COUNT(*) AS cnt FROM nation
        |UNION ALL SELECT CAST(5 AS BIGINT), COUNT(*) FROM region""".stripMargin,
    "q_add_vertex" ->
      """SELECT 'region' AS label, COUNT(*) AS cnt FROM region
        |UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'order', COUNT(*) FROM orders
        |UNION ALL SELECT 'segment', COUNT(DISTINCT c_mktsegment) FROM customer""".stripMargin,
    "q_add_edge" ->
      """SELECT 'in_region' AS label, COUNT(*) AS cnt FROM nation
        |UNION ALL SELECT 'in_nation',
        |  (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
        |UNION ALL SELECT 'placed', COUNT(*) FROM orders
        |UNION ALL SELECT 'placed_by', COUNT(*) FROM orders
        |UNION ALL SELECT 'contains', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'supplied_by', COUNT(*) FROM lineitem""".stripMargin,
    // one created placed_by edge per (order, customer) pair = one per order;
    // its dst (inV) is the customer, so the chain counts orders per segment
    "q_add_edge_chain" ->
      """SELECT c.c_mktsegment AS segment, COUNT(*) AS cnt
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,
    "q_property_step" ->
      """SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'vip' ELSE 'none' END AS tier,
        |COUNT(*) AS cnt FROM customer GROUP BY 1""".stripMargin,
    "q_ttl" ->
      """SELECT event_type, COUNT(*) AS cnt FROM events
        |WHERE ts + INTERVAL 604800 SECOND > TIMESTAMP '2024-01-31 00:00:00' GROUP BY 1""".stripMargin,
    "q_ttl_catalog" ->
      """SELECT event_type, COUNT(*) AS cnt FROM events
        |WHERE ts + INTERVAL 604800 SECOND > TIMESTAMP '2024-01-31 00:00:00' GROUP BY 1""".stripMargin,
    "q_ttl_compact" ->
      """SELECT event_type, COUNT(*) AS cnt FROM events
        |WHERE ts + INTERVAL 604800 SECOND > TIMESTAMP '2024-01-31 00:00:00' GROUP BY 1""".stripMargin,
    "q_ttl_edges" ->
      """SELECT event_type, COUNT(*) AS cnt FROM events
        |WHERE ts + INTERVAL 604800 SECOND > TIMESTAMP '2024-01-31 00:00:00' GROUP BY 1""".stripMargin,
    // property-key TTL: expired values fold into the NULL group; row totals
    // are preserved (the element outlives its property)
    "q_ttl_property" ->
      """SELECT CASE WHEN ts + INTERVAL 604800 SECOND > TIMESTAMP '2024-01-31 00:00:00'
        |THEN event_type END AS event_type, COUNT(*) AS cnt FROM events GROUP BY 1""".stripMargin,
    "q_stream_dedup" ->
      "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1",
    "q_stream_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS wstart,
        |event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2""".stripMargin,
    "q_stream_join" ->
      """SELECT e.event_id, e.user_id, c.c_name AS name, c.c_nationkey AS nationkey
        |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id""".stripMargin,
    "q_stream_stream_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |AND a.event_type = 'click' AND b.event_type = 'purchase'
        |AND b.ts BETWEEN a.ts AND a.ts + INTERVAL 30 MINUTE""".stripMargin,
    "q_store_roundtrip" ->
      """SELECT 'v' AS kind, 'region' AS label, COUNT(*) AS cnt FROM region
        |UNION ALL SELECT 'v', 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'v', 'customer', COUNT(*) FROM customer
        |UNION ALL SELECT 'v', 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'v', 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'v', 'order', COUNT(*) FROM orders
        |UNION ALL SELECT 'e', 'in_region', COUNT(*) FROM nation
        |UNION ALL SELECT 'e', 'in_nation',
        |  (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
        |UNION ALL SELECT 'e', 'placed', COUNT(*) FROM orders
        |UNION ALL SELECT 'e', 'contains', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'e', 'supplied_by', COUNT(*) FROM lineitem""".stripMargin,
    "q_fork_update" ->
      """WITH u AS (SELECT COUNT(*) AS n FROM lineitem WHERE l_linenumber = 1 AND l_quantity >= 45),
        |     s AS (SELECT COUNT(*) AS n FROM lineitem WHERE l_shipdate < DATE '1992-06-01')
        |SELECT 'in_region' AS label, CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS cnt,
        |       CAST(NULL AS DOUBLE) AS qty_sum, CAST(NULL AS BIGINT) AS ln_sum, CAST(0 AS BIGINT) AS forked
        |UNION ALL SELECT 'in_nation',
        |  (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier), NULL, NULL, 0
        |UNION ALL SELECT 'placed', (SELECT COUNT(*) FROM orders), NULL, NULL, 0
        |UNION ALL SELECT 'contains', (SELECT COUNT(*) FROM lineitem),
        |  CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(28,2))) FROM lineitem) + (SELECT n FROM u) AS DOUBLE),
        |  CAST((SELECT SUM(CAST(l_linenumber AS BIGINT)) FROM lineitem) AS BIGINT), (SELECT n FROM u)
        |UNION ALL SELECT 'supplied_by', (SELECT COUNT(*) FROM lineitem), NULL,
        |  CAST((SELECT SUM(CAST(l_linenumber AS BIGINT)) FROM lineitem) + 10 * (SELECT n FROM s) AS BIGINT), 0""".stripMargin,
    "q_elementmap" ->
      """SELECT 2 * 72057594037927936 + n_nationkey AS id, 'nation' AS label,
        |n_name AS name, n_nationkey AS uid FROM nation""".stripMargin,
    "q_skip" ->
      """SELECT c_custkey AS uid, c_acctbal AS acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey OFFSET 100""".stripMargin,
    "q_repeat_emit_until" ->
      "SELECT n_nationkey AS uid, 'nation' AS label FROM nation",
    "q_path_by" ->
      """SELECT array_to_string([r_name, n_name], '>') AS path FROM nation
        |JOIN region ON r_regionkey = n_regionkey""".stripMargin,
    "q_domain_quota" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 50""".stripMargin,
    "q_shuffled" ->
      """SELECT doc_id, md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS _shuffle_key
        |FROM documents ORDER BY 2 LIMIT 200""".stripMargin,
    "q_coalesce" ->
      """SELECT o_orderkey AS uid, o_totalprice AS totalprice FROM orders WHERE o_totalprice > 400000.0
        |UNION ALL SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""".stripMargin,
    "q_repeat_emit" ->
      """SELECT r_regionkey AS uid, 'region' AS label FROM region
        |UNION ALL SELECT n_nationkey, 'nation' FROM nation
        |UNION ALL SELECT c_custkey, 'customer' FROM customer
        |UNION ALL SELECT s_suppkey, 'supplier' FROM supplier""".stripMargin,
    "q_repeat_depth" ->
      """SELECT r_regionkey AS uid, 'region' AS label, 0 AS _depth FROM region
        |UNION ALL SELECT n_nationkey, 'nation', 1 FROM nation
        |UNION ALL SELECT c_custkey, 'customer', 2 FROM customer
        |UNION ALL SELECT s_suppkey, 'supplier', 2 FROM supplier""".stripMargin,
    // filtered emit: depth-1 nations + depth-2 suppliers; source regions and
    // depth-2 customers are walked but fail the emit predicate
    "q_repeat_emit_filter" ->
      """SELECT n_nationkey AS uid, 'nation' AS label FROM nation
        |UNION ALL SELECT s_suppkey, 'supplier' FROM supplier""".stripMargin,
    // sub-traversal emit: only nations have out('in_region'); multiplicity is
    // per-traverser, so each customer contributes its nation once
    "q_repeat_emit_sub" ->
      "SELECT c_nationkey AS uid, 'nation' AS label FROM customer",
    "q_project" ->
      "SELECT c_custkey AS uid, c_mktsegment AS seg, c_acctbal > 5000.0 AS rich FROM customer",
    "q_local_topk" ->
      """SELECT o_orderkey AS uid, o_totalprice AS totalprice FROM (
        |SELECT o_orderkey, o_totalprice, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) WHERE rn <= 2""".stripMargin,
    "q_sample" ->
      s"""SELECT p_partkey AS uid FROM part
         |ORDER BY md5(CAST(5 * $T + p_partkey AS VARCHAR) || '42'), p_partkey LIMIT 20""".stripMargin,
    "q_coin" ->
      s"""SELECT o_orderkey AS uid FROM orders
         |WHERE substr(md5(CAST(6 * $T + o_orderkey AS VARCHAR) || '42'), 1, 2) < '40'""".stripMargin,
    "q_repeat_until" ->
      """SELECT r_regionkey AS uid, 'region' AS label FROM customer
        |JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q_cyclic_path" ->
      "SELECT n_regionkey AS uid, 'region' AS label FROM nation",
    "q_tree" ->
      s"""SELECT 2 * $T + n_nationkey AS root,
         |CAST(2 * $T + n_nationkey AS VARCHAR) || '>' || CAST(1 * $T + n_regionkey AS VARCHAR) AS path
         |FROM nation""".stripMargin,
    "q_fold" ->
      s"""SELECT string_agg(CAST(1 * $T + r_regionkey AS VARCHAR), ',' ORDER BY r_regionkey) AS ids
         |FROM region""".stripMargin,
    "q_unfold" ->
      "SELECT unnest(string_split(p_name, ' ')) AS token FROM part",
    "q_store_cap" ->
      """SELECT DISTINCT o_orderkey AS uid FROM orders
        |WHERE o_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        |AND NOT o_totalprice > 300000.0""".stripMargin,
    "q_local_scope" ->
      """SELECT c_custkey AS c_uid, COUNT(*) AS n_orders,
        |array_to_string(list_slice(list_sort(list(o_orderkey)), 1, 3), ',') AS first3,
        |MAX(o_orderkey) AS max_uid
        |FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q_inject" ->
      """SELECT r_regionkey AS uid, 'region' AS label FROM region
        |UNION ALL SELECT n_nationkey, 'nation' FROM nation WHERE n_nationkey IN (1, 2)""".stripMargin,
    "q_subgraph" ->
      """SELECT 'v' AS kind, 'customer' AS label, COUNT(DISTINCT o_custkey) AS cnt
        |FROM orders WHERE o_orderdate < DATE '1997-01-01'
        |UNION ALL SELECT 'v', 'order', COUNT(*) FROM orders WHERE o_orderdate < DATE '1997-01-01'
        |UNION ALL SELECT 'e', 'placed', COUNT(*) FROM orders WHERE o_orderdate < DATE '1997-01-01'""".stripMargin,
    "q_subgraph_vertices" ->
      """SELECT 'v' AS kind, 'customer' AS label, COUNT(*) AS cnt FROM customer
        |UNION ALL SELECT 'v', 'order', COUNT(*) FROM orders
        |UNION ALL SELECT 'e', 'placed', COUNT(*) FROM orders""".stripMargin,
    "q_sum_terminal" ->
      """SELECT CAST(SUM(p_size) AS BIGINT) AS "sum" FROM part""",
    "q_mean_terminal" ->
      """SELECT AVG(p_size) AS "mean" FROM part""",
    "q_pagerank" -> pageRankOracle(10),
    "q_pagerank_weighted" -> wPageRankOracle(10),
    "q_katz" -> katzOracle(1L, 10000L, 8),
    "q_ppr" -> pprOracle(
      TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L, 10),
    "q_sssp_weighted" -> wssspOracle(
      TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L, 8),
    "q_hits" -> hitsOracle(4),
    "q_bsp" ->
      """WITH deg AS (
        |  SELECT nk, CAST(SUM(d) AS BIGINT) AS d FROM (
        |    SELECT c_nationkey AS nk, COUNT(*) AS d FROM customer GROUP BY 1
        |    UNION ALL SELECT s_nationkey, COUNT(*) FROM supplier GROUP BY 1
        |  ) GROUP BY nk)
        |SELECT r_regionkey AS uid, CAST(SUM(deg.d) AS BIGINT) AS v
        |FROM nation JOIN deg ON deg.nk = n_nationkey
        |JOIN region ON r_regionkey = n_regionkey GROUP BY 1""".stripMargin,
    "q_mapreduce" ->
      """SELECT 'region' AS label, CAST((SELECT COUNT(*) FROM region) AS BIGINT) AS cnt
        |UNION ALL SELECT 'nation', (SELECT COUNT(*) FROM nation)
        |UNION ALL SELECT 'customer', (SELECT COUNT(*) FROM customer)
        |UNION ALL SELECT 'supplier', (SELECT COUNT(*) FROM supplier)
        |UNION ALL SELECT 'part', (SELECT COUNT(*) FROM part)
        |UNION ALL SELECT 'order', (SELECT COUNT(*) FROM orders)""".stripMargin,
    "q_ghost" ->
      """SELECT 'in_nation' AS label,
        |CAST((SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier) AS BIGINT) AS cnt
        |UNION ALL SELECT 'in_region', (SELECT COUNT(*) FROM nation)""".stripMargin,
    "q_sssp" -> ssspOracle(
      TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L, 8),
    "q_shortest_tree" -> shortestTreeOracle(
      TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L, 4),
    "q_bipartite_projection" ->
      s"""WITH e AS (SELECT DISTINCT
         |  ${TpchGraph.OrderTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_orderkey AS src,
         |  ${TpchGraph.PartTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_partkey AS dst FROM lineitem)
         |SELECT a.src AS ida, b.src AS idb, COUNT(*) AS shared
         |FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin,
    "q_clustering_coeff" ->
      """WITH cn AS (SELECT c_custkey AS c, c_nationkey AS nk FROM customer),
        |     sn AS (SELECT s_suppkey AS s, s_nationkey AS nk FROM supplier),
        |     cc AS (SELECT nk, COUNT(*) AS nc FROM cn GROUP BY 1),
        |     sc AS (SELECT nk, COUNT(*) AS ns FROM sn GROUP BY 1),
        |base AS (
        |  SELECT 'nation' AS kind, n_nationkey AS uid,
        |         COALESCE(nc, 0) * COALESCE(ns, 0) AS triangles,
        |         COALESCE(nc, 0) + COALESCE(ns, 0) AS d
        |  FROM nation LEFT JOIN cc ON cc.nk = n_nationkey LEFT JOIN sc ON sc.nk = n_nationkey
        |  UNION ALL SELECT 'customer', c, COALESCE(ns, 0), 1 + COALESCE(ns, 0)
        |  FROM cn LEFT JOIN sc USING (nk)
        |  UNION ALL SELECT 'supplier', s, COALESCE(nc, 0), 1 + COALESCE(nc, 0)
        |  FROM sn LEFT JOIN cc USING (nk))
        |SELECT kind, uid, CAST(triangles AS BIGINT) AS triangles,
        |  CAST(d * (d - 1) // 2 AS BIGINT) AS wedges,
        |  CAST(CASE WHEN d > 1 THEN triangles * 1000000 // (d * (d - 1) // 2)
        |            ELSE 0 END AS BIGINT) AS coeff_x1e6
        |FROM base""".stripMargin,
    "q_assortativity" ->
      s"""WITH e0 AS (
         |  SELECT ${TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits)} + c_custkey AS u,
         |         ${TpchGraph.NationTag.toLong * (1L << graft.core.GraphIds.TagBits)} + c_nationkey AS v FROM customer
         |  UNION ALL
         |  SELECT ${TpchGraph.SupplierTag.toLong * (1L << graft.core.GraphIds.TagBits)} + s_suppkey,
         |         ${TpchGraph.NationTag.toLong * (1L << graft.core.GraphIds.TagBits)} + s_nationkey FROM supplier),
         |ce AS (SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v FROM e0 WHERE u <> v),
         |b AS (SELECT u, v FROM ce UNION ALL SELECT v, u FROM ce),
         |deg AS (SELECT u, COUNT(*) AS d FROM b GROUP BY 1)
         |SELECT COUNT(*) AS m2,
         |  CAST(SUM(dx.d * dy.d) AS BIGINT) AS sum_xy,
         |  CAST(SUM(dx.d) AS BIGINT) AS sum_x,
         |  CAST(SUM(dx.d * dx.d) AS BIGINT) AS sum_x2
         |FROM b JOIN deg dx ON b.u = dx.u JOIN deg dy ON b.v = dy.u""".stripMargin,
    // mirrors adamicAdar stage-for-stage: undirected adjacency → degrees →
    // per-center weight round(1/ln d, 9) pinned into DECIMAL → common-center
    // pair join → DECIMAL sum (the bigramLogProb ln recipe); the hub cap
    // (100000) is unreachable at oracle scales so it has no SQL mirror
    "q_adamic_adar" ->
      s"""WITH e AS (SELECT DISTINCT
         |  ${TpchGraph.OrderTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_orderkey AS o,
         |  ${TpchGraph.PartTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_partkey AS p FROM lineitem),
         |adj AS (SELECT o AS x, p AS a FROM e UNION ALL SELECT p, o FROM e),
         |deg AS (SELECT x, COUNT(*) AS d FROM adj GROUP BY 1),
         |w AS (SELECT x AS a, CAST(ROUND(1.0 / ln(d), 9) AS DECIMAL(28,12)) AS w
         |  FROM deg WHERE d >= 2),
         |pr AS (SELECT l.x, r.x AS y, l.a FROM adj l JOIN adj r ON l.a = r.a AND l.x < r.x)
         |SELECT x AS ida, y AS idb, COUNT(*) AS inter,
         |  ROUND(CAST(SUM(w.w) AS DOUBLE), 6) AS aa
         |FROM pr JOIN w ON pr.a = w.a GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin,
    // one pair pass, four classic link-prediction measures: CN, PA (degree
    // product), Adamic-Adar (1/ln d), resource allocation (1/d)
    "q_link_scores" ->
      s"""WITH e AS (SELECT DISTINCT
         |  ${TpchGraph.OrderTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_orderkey AS o,
         |  ${TpchGraph.PartTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_partkey AS p FROM lineitem),
         |adj AS (SELECT o AS x, p AS a FROM e UNION ALL SELECT p, o FROM e),
         |deg AS (SELECT x, COUNT(*) AS d FROM adj GROUP BY 1),
         |w AS (SELECT x AS a, CAST(ROUND(1.0 / ln(d), 9) AS DECIMAL(28,12)) AS wln,
         |  CAST(ROUND(1.0 / d, 9) AS DECIMAL(28,12)) AS wd FROM deg WHERE d >= 2),
         |pr AS (SELECT l.x, r.x AS y, l.a FROM adj l JOIN adj r ON l.a = r.a AND l.x < r.x),
         |agg AS (SELECT x, y, COUNT(*) AS inter,
         |  ROUND(CAST(SUM(w.wln) AS DOUBLE), 6) AS aa,
         |  ROUND(CAST(SUM(w.wd) AS DOUBLE), 6) AS ra
         |  FROM pr JOIN w ON pr.a = w.a GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         |SELECT agg.x AS ida, agg.y AS idb, inter, dx.d * dy.d AS pa, aa, ra
         |FROM agg JOIN deg dx ON dx.x = agg.x JOIN deg dy ON dy.x = agg.y""".stripMargin,
    // butterflies: per order vertex, wedge incidences and C(shared,2) 4-cycle
    // closures over the order-part bipartite graph (shared >= 2 pairs only)
    "q_butterflies" ->
      s"""WITH e AS (SELECT DISTINCT
         |  ${TpchGraph.OrderTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_orderkey AS src,
         |  ${TpchGraph.PartTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_partkey AS dst FROM lineitem),
         |pairs AS (SELECT a.src AS ida, b.src AS idb, COUNT(*) AS shared
         |  FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |sym AS (SELECT ida AS id, shared FROM pairs UNION ALL SELECT idb, shared FROM pairs)
         |SELECT id, CAST(SUM(shared) AS BIGINT) AS wedges,
         |  CAST(SUM(shared * (shared - 1) // 2) AS BIGINT) AS butterflies
         |FROM sym GROUP BY id""".stripMargin,
    // rich club: thresholds read two tiny histograms (degree, edge-min-degree)
    "q_rich_club" ->
      s"""WITH $graphCtes,
         |se AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
         |  FROM eg WHERE src <> dst),
         |deg AS (SELECT x, COUNT(*) AS d
         |  FROM (SELECT u AS x FROM se UNION ALL SELECT v FROM se) GROUP BY 1),
         |dh AS (SELECT d, COUNT(*) AS c FROM deg GROUP BY 1),
         |eh AS (SELECT LEAST(du.d, dv.d) AS m, COUNT(*) AS c
         |  FROM se JOIN deg du ON du.x = se.u JOIN deg dv ON dv.x = se.v GROUP BY 1),
         |ks(k) AS (VALUES (CAST(0 AS BIGINT)), (1), (2), (4), (8), (16), (32)),
         |nk AS (SELECT k, CAST(SUM(c) AS BIGINT) AS nk FROM ks JOIN dh ON dh.d > ks.k GROUP BY 1),
         |ek AS (SELECT k, CAST(SUM(c) AS BIGINT) AS ek FROM ks JOIN eh ON eh.m > ks.k GROUP BY 1)
         |SELECT ks.k, CAST(COALESCE(nk.nk, 0) AS BIGINT) AS nk,
         |  CAST(COALESCE(ek.ek, 0) AS BIGINT) AS ek,
         |  CASE WHEN COALESCE(nk.nk, 0) >= 2
         |    THEN 2 * COALESCE(ek.ek, 0) * 1000000 // (nk.nk * (nk.nk - 1)) END AS phi_x1e6
         |FROM ks LEFT JOIN nk ON ks.k = nk.k LEFT JOIN ek ON ks.k = ek.k""".stripMargin,
    "q_zorder_key" -> zorderOracle(16),
    "q_hll_distinct" -> hllOracle(10, "hll", "lineitem", "l_partkey"),
    // bloom: identical md5 bit positions, bit_or-packed words, bool_and probe
    "q_bloom_contamination" ->
      """WITH ev AS (SELECT DISTINCT text FROM documents WHERE doc_id % 7 = 0),
        |js AS (SELECT unnest(range(0, 3)) AS j),
        |bp AS (SELECT ('0x' || substr(md5(CAST(j AS VARCHAR) || ':bloom:' || text), 21, 12))::BIGINT % 496 AS p
        |  FROM ev CROSS JOIN js),
        |bits AS (SELECT p // 62 AS word,
        |  bit_or(1::BIGINT << CAST(p % 62 AS INTEGER)) AS bits FROM bp GROUP BY 1),
        |tp AS (SELECT doc_id,
        |  ('0x' || substr(md5(CAST(j AS VARCHAR) || ':bloom:' || text), 21, 12))::BIGINT % 496 AS p
        |  FROM documents CROSS JOIN js),
        |pr AS (SELECT doc_id,
        |  bool_and((COALESCE(bits.bits, 0) & (1::BIGINT << CAST(tp.p % 62 AS INTEGER))) <> 0) AS flagged
        |  FROM tp LEFT JOIN bits ON tp.p // 62 = bits.word GROUP BY 1),
        |ac AS (SELECT d.doc_id, (ev.text IS NOT NULL) AS actual
        |  FROM documents d LEFT JOIN ev ON d.text = ev.text)
        |SELECT pr.flagged, ac.actual, COUNT(*) AS cnt
        |FROM pr JOIN ac ON pr.doc_id = ac.doc_id GROUP BY 1, 2""".stripMargin,
    // snapshot diff: each category derives from its mutation predicate; the
    // engine's full-outer JSON-signature compare must land on exactly these
    "q_graph_diff" -> {
      val t = 1L << graft.core.GraphIds.TagBits
      s"""SELECT 'v' AS kind, 'removed' AS change,
         |  ${4L * t} + s_suppkey AS id, 'supplier' AS label
         |FROM supplier WHERE s_suppkey % 10 = 0
         |UNION ALL SELECT 'v', 'changed', ${3L * t} + c_custkey, 'customer'
         |FROM customer WHERE c_custkey % 7 = 0
         |UNION ALL SELECT 'v', 'added', ${9L * t} + r_regionkey, 'zone' FROM region
         |UNION ALL SELECT 'e', 'removed', ${1L * t} + n_nationkey, 'in_region'
         |FROM nation WHERE (${1L * t} + n_nationkey) % 5 = 0
         |UNION ALL SELECT 'e', 'changed', ${4L * t} + o_orderkey, 'placed'
         |FROM orders WHERE (${6L * t} + o_orderkey) % 11 = 0""".stripMargin
    },
    // recommendations: common-neighbor candidates minus existing canonical
    // edges, symmetrized, per-vertex top-5 by (inter desc, rec asc)
    "q_recommend_links" ->
      s"""WITH e AS (SELECT DISTINCT
         |  ${TpchGraph.OrderTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_orderkey AS o,
         |  ${TpchGraph.PartTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_partkey AS p FROM lineitem),
         |ed AS (SELECT LEAST(o, p) AS u, GREATEST(o, p) AS v FROM e),
         |adj AS (SELECT o AS x, p AS a FROM e UNION ALL SELECT p, o FROM e),
         |cand AS (SELECT l.x, r.x AS y, COUNT(*) AS inter FROM adj l
         |  JOIN adj r ON l.a = r.a AND l.x < r.x GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |ne AS (SELECT c.x, c.y, c.inter FROM cand c
         |  ANTI JOIN ed ON c.x = ed.u AND c.y = ed.v),
         |sym AS (SELECT x AS id, y AS rec, inter FROM ne
         |  UNION ALL SELECT y, x, inter FROM ne)
         |SELECT id, rec, inter, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT id, rec, inter, ROW_NUMBER() OVER (PARTITION BY id
         |    ORDER BY inter DESC, rec ASC) AS rank FROM sym)
         |WHERE rank <= 5""".stripMargin,
    "q_vertex_jaccard" ->
      s"""WITH e AS (SELECT DISTINCT
         |  ${TpchGraph.OrderTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_orderkey AS o,
         |  ${TpchGraph.PartTag.toLong * (1L << graft.core.GraphIds.TagBits)} + l_partkey AS p FROM lineitem),
         |dego AS (SELECT o, COUNT(*) AS d FROM e GROUP BY 1),
         |degp AS (SELECT p, COUNT(*) AS d FROM e GROUP BY 1),
         |oo AS (SELECT a.o AS x, b.o AS y, COUNT(*) AS inter
         |       FROM e a JOIN e b ON a.p = b.p AND a.o < b.o GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |pp AS (SELECT a.p AS x, b.p AS y, COUNT(*) AS inter
         |       FROM e a JOIN e b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |pairs AS (
         |  SELECT oo.x, oo.y, inter, dx.d + dy.d - inter AS uni
         |  FROM oo JOIN dego dx ON oo.x = dx.o JOIN dego dy ON oo.y = dy.o
         |  UNION ALL
         |  SELECT pp.x, pp.y, inter, dx.d + dy.d - inter
         |  FROM pp JOIN degp dx ON pp.x = dx.p JOIN degp dy ON pp.y = dy.p)
         |SELECT x AS ida, y AS idb, inter, uni,
         |  CAST(inter * 1000000 // uni AS BIGINT) AS jaccard_x1e6 FROM pairs""".stripMargin,
    "q_harmonic" -> harmonicOracle(
      Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + _), 4),
    "q_closeness" -> closenessOracle(
      Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + _), 4),
    "q_hop_histogram" -> hopHistogramOracle(
      Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + _),
      rounds = 4),
    "q_eccentricity" -> eccentricityOracle(
      Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + _), 4),
    "q_shortest_paths" -> shortestPathsOracle(
      TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L, 4),
    "q_path_counts" -> pathCountsOracle(
      TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L, 4),
    "q_stress" -> stressOracle(
      TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L, 4),
    "q_betweenness" -> betweennessOracle(
      Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong *
        (1L << graft.core.GraphIds.TagBits) + _), 4),
    "q_betweenness_sampled" ->
      betweennessOracleOver(diamondChainCtes, Seq(1L, 3L), 10),
    "q_scc" -> sccOracle(2, 5, 4),
    "q_matching" -> matchingOracle(8),
    "q_contract" -> contractionOracle(8),
    "q_msf" -> msfOracle(8, 10),
    "q_coloring" -> coloringOracle(20),
    "q_connected_components" -> ccOracle(12),
    "q_lpa" -> lpaOracle(3),
    "q_community_stats" -> communityStatsOracle(3),
    // streaming incremental CC folds to exactly batch CC of the ADDED
    // event→user edges: min-label recurrence converged (stars, diameter 2)
    "q_stream_components" ->
      s"""WITH ev AS MATERIALIZED (SELECT 8*$T + event_id AS src,
         |  3*$T + user_id AS dst FROM events WHERE event_type <> 'error'),
         |e2 AS MATERIALIZED (SELECT src, dst FROM ev UNION ALL SELECT dst, src FROM ev),
         |c0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS l FROM e2),
         |${minLabelIters("c", 3)}
         |SELECT id, l AS component FROM c3""".stripMargin,
    "q_kcore" -> kcoreOracle(2, 6),
    "q_coreness" -> corenessOracle(16),
    "q_ktruss" -> ktrussOracle(3, 4),
    // embeddedness: the ktruss fixture's canonical edge set, support =
    // common-neighbor count per edge, zero-support edges kept via LEFT JOIN
    "q_edge_support" -> {
      val T = 1L << graft.core.GraphIds.TagBits
      val cu = TpchGraph.CustomerTag.toLong * T
      val su = TpchGraph.SupplierTag.toLong * T
      val na = TpchGraph.NationTag.toLong * T
      s"""WITH cn AS (SELECT $cu + c_custkey AS c, c_nationkey AS nk FROM customer),
         |sn AS (SELECT $su + s_suppkey AS s, s_nationkey AS nk FROM supplier),
         |t0 AS MATERIALIZED (
         |  SELECT LEAST(c, $na + nk) AS u, GREATEST(c, $na + nk) AS v FROM cn
         |  UNION SELECT LEAST(s, $na + nk), GREATEST(s, $na + nk) FROM sn
         |  UNION SELECT LEAST(c, s), GREATEST(c, s) FROM cn JOIN sn USING (nk)),
         |adj AS (SELECT u AS x, v AS a FROM t0 UNION ALL SELECT v, u FROM t0),
         |wed AS (SELECT x1.x AS u, x2.x AS v, x1.a FROM adj x1
         |  JOIN adj x2 ON x1.a = x2.a AND x1.x < x2.x)
         |SELECT e.u, e.v, CAST(COUNT(wed.a) AS BIGINT) AS support
         |FROM t0 e LEFT JOIN wed ON wed.u = e.u AND wed.v = e.v
         |GROUP BY 1, 2""".stripMargin
    },
    "q_topo_layers" -> topoLayersOracle(6),
    "q_ego" -> egoOracle(
      TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + 1L, 2),
    "q_random_walks" -> randomWalksOracle(
      Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + _),
      steps = 3, walksPerSeed = 2),
    // the walks CTE replays randomWalksOracle verbatim; the pair join and
    // window filter mirror walkContextPairs
    "q_walk_pairs" ->
      s"""WITH walks AS MATERIALIZED (${randomWalksOracle(
             Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + _),
             steps = 3, walksPerSeed = 2)})
         |SELECT a.id, b.id AS ctx, COUNT(*) AS cnt
         |FROM walks a JOIN walks b ON a.walk = b.walk AND a.step <> b.step
         |  AND abs(a.step - b.step) <= 2
         |GROUP BY 1, 2""".stripMargin,
    "q_walks_nobacktrack" -> nonBacktrackingOracle(
      Seq(1L, 2L, 3L).map(TpchGraph.CustomerTag.toLong * (1L << graft.core.GraphIds.TagBits) + _),
      steps = 3, walksPerSeed = 2),
    "q_graph_datasheet" ->
      s"""WITH $graphCtes,
         |b AS MATERIALIZED (SELECT src AS id FROM eg UNION ALL SELECT dst FROM eg),
         |deg AS MATERIALIZED (SELECT id, COUNT(*) AS d FROM b GROUP BY 1)
         |SELECT 'v:region' AS metric, COUNT(*) AS value FROM region
         |UNION ALL SELECT 'v:nation', COUNT(*) FROM nation
         |UNION ALL SELECT 'v:customer', COUNT(*) FROM customer
         |UNION ALL SELECT 'v:supplier', COUNT(*) FROM supplier
         |UNION ALL SELECT 'v:part', COUNT(*) FROM part
         |UNION ALL SELECT 'v:order', COUNT(*) FROM orders
         |UNION ALL SELECT 'e:in_region', COUNT(*) FROM nation
         |UNION ALL SELECT 'e:in_nation',
         |  (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
         |UNION ALL SELECT 'e:placed', COUNT(*) FROM orders
         |UNION ALL SELECT 'e:contains', COUNT(*) FROM lineitem
         |UNION ALL SELECT 'e:supplied_by', COUNT(*) FROM lineitem
         |UNION ALL SELECT 'vertices', COUNT(*) FROM vg
         |UNION ALL SELECT 'edges', COUNT(*) FROM eg
         |UNION ALL SELECT 'self_loops', COUNT(*) FROM eg WHERE src = dst
         |UNION ALL SELECT 'ghost_edges', COUNT(*) FROM eg
         |  WHERE src NOT IN (SELECT id FROM vg) OR dst NOT IN (SELECT id FROM vg)
         |UNION ALL SELECT 'max_degree', COALESCE((SELECT MAX(d) FROM deg), 0)
         |UNION ALL SELECT 'isolated_vertices',
         |  (SELECT COUNT(*) FROM vg WHERE id NOT IN (SELECT id FROM b))""".stripMargin,
    "q_bipartite_color" -> bipartiteOracle(
      TpchGraph.RegionTag.toLong * (1L << graft.core.GraphIds.TagBits), 6),
    "q_triangles" ->
      """WITH cn AS (SELECT c_custkey AS c, c_nationkey AS nk FROM customer),
        |     sn AS (SELECT s_suppkey AS s, s_nationkey AS nk FROM supplier),
        |     cc AS (SELECT nk, COUNT(*) AS nc FROM cn GROUP BY 1),
        |     sc AS (SELECT nk, COUNT(*) AS ns FROM sn GROUP BY 1)
        |SELECT 'nation' AS kind, n_nationkey AS uid,
        |       COALESCE(nc, 0) * COALESCE(ns, 0) AS triangles
        |FROM nation LEFT JOIN cc ON cc.nk = n_nationkey LEFT JOIN sc ON sc.nk = n_nationkey
        |UNION ALL SELECT 'customer', c, COALESCE(ns, 0) FROM cn LEFT JOIN sc USING (nk)
        |UNION ALL SELECT 'supplier', s, COALESCE(nc, 0) FROM sn LEFT JOIN cc USING (nk)""".stripMargin,
    "q_triangles_df" ->
      """WITH cn AS (SELECT c_custkey AS c, c_nationkey AS nk FROM customer),
        |     sn AS (SELECT s_suppkey AS s, s_nationkey AS nk FROM supplier),
        |     cc AS (SELECT nk, COUNT(*) AS nc FROM cn GROUP BY 1),
        |     sc AS (SELECT nk, COUNT(*) AS ns FROM sn GROUP BY 1)
        |SELECT 'nation' AS kind, n_nationkey AS uid,
        |       COALESCE(nc, 0) * COALESCE(ns, 0) AS triangles
        |FROM nation LEFT JOIN cc ON cc.nk = n_nationkey LEFT JOIN sc ON sc.nk = n_nationkey
        |UNION ALL SELECT 'customer', c, COALESCE(ns, 0) FROM cn LEFT JOIN sc USING (nk)
        |UNION ALL SELECT 'supplier', s, COALESCE(nc, 0) FROM sn LEFT JOIN cc USING (nk)""".stripMargin,
    "q_dedup_exact" ->
      "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies FROM documents GROUP BY text",
    // the streaming run of the SAME operator must produce the identical set
    "q_stream_exact_dedup" ->
      "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies FROM documents GROUP BY text",
    "q_dedup_ngram" -> ngramJaccardOracle,
    // containment: the same inverted-index pair counts normalized by the
    // SMALLER shingle set (c = shared / min(|A|, |B|))
    "q_containment_pairs" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text,'\s+') AS wl FROM documents),
        |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
        |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
        |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT ida, idb, shared, CAST(sa.n AS INTEGER) AS sza, CAST(sb.n AS INTEGER) AS szb,
        |  CAST(shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
        |FROM pairs JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
        |WHERE CAST(shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.5""".stripMargin,
    "q_dedup_minhash" -> ngramJaccardOracle,
    // streaming run: every document arrives as part of some batch, so the
    // union of per-batch results is ALL ordered distinct near-dup pairs —
    // the symmetric closure of the exact pair join
    "q_stream_neardup" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text,'\s+') AS wl FROM documents),
        |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
        |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
        |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |verified AS (SELECT ida, idb,
        |  CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) AS jaccard
        |  FROM pairs JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
        |  WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.8)
        |SELECT ida AS in_id, idb AS corpus_id, jaccard FROM verified
        |UNION ALL SELECT idb, ida, jaccard FROM verified""".stripMargin,
    // batch-vs-corpus: exact Jaccard pairs with the IN side restricted to
    // the batch ids, both directions distinct ids (re-ingest excluded)
    "q_neardup_against" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text,'\s+') AS wl FROM documents),
        |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
        |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
        |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
        |pairs AS (SELECT a.doc_id AS in_id, b.doc_id AS corpus_id, count(*) AS shared
        |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id <> b.doc_id
        |  WHERE a.doc_id < 100 GROUP BY 1, 2)
        |SELECT in_id, corpus_id,
        |  CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) AS jaccard
        |FROM pairs JOIN sizes sa ON sa.doc_id = in_id JOIN sizes sb ON sb.doc_id = corpus_id
        |WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.8""".stripMargin,
    "q_dedup_simhash" -> simHashOracle,
    "q_binary_quantize" -> binaryQuantizeOracle,
    "q_lsh_cosine_pairs" -> lshCosineOracle,
    "q_lsh_recall" -> lshRecallOracle,
    "q_repetition" -> repetitionOracle,
    "q_chunk" -> chunkOracle(24, 8),
    // sentence-boundary chunking oracle: same planted sentence ends, same
    // replace-then-split segmentation (e'\\1\x01' = backref + the 0x01
    // sentinel), same prefix-sum chunk rule
    "q_chunk_sentences" ->
      """WITH d AS (SELECT doc_id, replace(text, ' fast ', ' fast. ') AS text FROM documents),
        |seg AS (SELECT doc_id,
        |  [x for x in string_split(
        |     regexp_replace(text, '([.!?])\s+', e'\\1\x01', 'g'), chr(1)) if len(x) > 0] AS l
        |  FROM d),
        |sen AS (SELECT doc_id, unnest([{'sidx': i-1, 'sent': l[i]}
        |    for i in range(1, len(l)+1)], recursive := true) FROM seg),
        |tok AS (SELECT doc_id, sidx, sent,
        |  len(string_split_regex(trim(sent), '\s+')) AS ntok FROM sen),
        |cum AS (SELECT doc_id, sidx, sent, ntok,
        |  SUM(ntok) OVER (PARTITION BY doc_id ORDER BY sidx) AS cum FROM tok)
        |SELECT doc_id, CAST((cum - ntok) // 24 AS BIGINT) AS chunk_id,
        |  string_agg(sent, ' ' ORDER BY sidx) AS chunk_text,
        |  COUNT(*) AS n_sentences, CAST(SUM(ntok) AS BIGINT) AS n_tokens
        |FROM cum GROUP BY 1, 2""".stripMargin,
    "q_token_df" ->
      """SELECT token, COUNT(*) AS df FROM (
        |  SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\s+'))) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY df DESC, token ASC LIMIT 20""".stripMargin,
    "q_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |counts AS (SELECT token, COUNT(*) AS tc FROM toks GROUP BY 1),
        |tot AS (SELECT SUM(tc) AS n FROM counts)
        |SELECT doc_id,
        |  ROUND(CAST(SUM(CAST(ROUND(ln(CAST(tc AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_logp
        |FROM toks JOIN counts USING (token) CROSS JOIN tot GROUP BY 1""".stripMargin,
    // mirrors importanceWeights stage-for-stage: hashed uni+bigram buckets,
    // add-one smoothed target/raw bucket models, 9-dp lns differenced and
    // summed in DECIMAL per occurrence, weight rounded at 6 dp
    // E-S weighted sample: identical md5 u-draw, ln(u)/w priority at 9 dp,
    // per-source top-5 with the id tie-break
    "q_weighted_sample" ->
      """WITH p AS (SELECT source, doc_id,
        |  ROUND(ln(CAST(('0x' || substr(md5(':' || CAST(doc_id AS VARCHAR)), 21, 12))::BIGINT
        |    % 1000000 + 1 AS DOUBLE) / 1000000.0) / CAST(n_chars AS DOUBLE), 9) AS priority
        |  FROM documents WHERE n_chars > 0)
        |SELECT source, doc_id, priority FROM (
        |  SELECT source, doc_id, priority,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority DESC, doc_id ASC) AS rn
        |  FROM p) t WHERE rn <= 5""".stripMargin,
    "q_epoch_budget" -> epochBudgetOracle(10000000L),
    "q_dsir_weights" -> dsirOracleSql,
    // the streaming twin scores the identical feed against the frozen model
    "q_stream_dsir" -> dsirOracleSql,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens FROM documents)
        |SELECT doc_id, source, n_tokens,
        |  CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens) // 2048 AS BIGINT) AS bin
        |FROM t""".stripMargin,
    "q_dup_span_frac" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS wl FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [array_to_string(wl[i:i+7], ' ') for i in range(1, len(wl)-6)])) AS g
        |  FROM w WHERE len(wl) >= 8),
        |df AS (SELECT g, COUNT(*) AS ndocs FROM sh GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_spans,
        |  ROUND(CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS dup_frac
        |FROM sh JOIN df USING (g) GROUP BY 1""".stripMargin,
    // mirrors removeDupSpans stage-for-stage: positioned 8-grams → ≥2-doc
    // duplicate set → covered positions (start+0..7, distinct) → anti-join
    // tokens → in-order rebuild; '' (not absence) for fully-removed docs,
    // NULL preserved for NULL input text
    "q_remove_dup_spans" ->
      """WITH w AS (SELECT doc_id, text, string_split_regex(text, '\s+') AS wl FROM documents),
        |gr AS (SELECT doc_id, unnest([{'s': i-1, 'g': array_to_string(wl[i:i+7], ' ')}
        |    for i in range(1, len(wl)-6)], recursive := true)
        |  FROM w WHERE len(wl) >= 8),
        |dup AS (SELECT g FROM gr GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT doc_id, s + o AS pos
        |  FROM (SELECT gr.doc_id, gr.s FROM gr JOIN dup USING (g)), unnest(range(8)) AS t(o)),
        |toks AS (SELECT doc_id, unnest([{'pos': i-1, 'tok': wl[i]}
        |    for i in range(1, len(wl)+1)], recursive := true) FROM w),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t
        |  ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos)
        |SELECT w.doc_id, CASE WHEN w.text IS NULL THEN NULL
        |  ELSE coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') END AS text
        |FROM w LEFT JOIN kept k ON w.doc_id = k.doc_id GROUP BY w.doc_id, w.text""".stripMargin,
    // mirrors removeRepeatedSpans: per-(doc, gram) first start → every later
    // occurrence covers its positions → anti-join + in-order rebuild
    "q_remove_repeated_spans" ->
      """WITH w AS (SELECT doc_id, text, string_split_regex(text, '\s+') AS wl FROM documents),
        |gr AS (SELECT doc_id, unnest([{'s': i-1, 'g': array_to_string(wl[i:i+2], ' ')}
        |    for i in range(1, len(wl)-1)], recursive := true)
        |  FROM w WHERE len(wl) >= 3),
        |fs AS (SELECT doc_id, g, MIN(s) AS first_s FROM gr GROUP BY 1, 2),
        |rep AS (SELECT gr.doc_id, gr.s FROM gr JOIN fs
        |  ON gr.doc_id = fs.doc_id AND gr.g = fs.g AND gr.s > fs.first_s),
        |cov AS (SELECT DISTINCT doc_id, s + o AS pos FROM rep, unnest(range(3)) AS t(o)),
        |toks AS (SELECT doc_id, unnest([{'pos': i-1, 'tok': wl[i]}
        |    for i in range(1, len(wl)+1)], recursive := true) FROM w),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t
        |  ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos)
        |SELECT w.doc_id, CASE WHEN w.text IS NULL THEN NULL
        |  ELSE coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') END AS text
        |FROM w LEFT JOIN kept k ON w.doc_id = k.doc_id GROUP BY w.doc_id, w.text""".stripMargin,
    // mirrors removeDupLines(sep=' '): split on the unit separator → units
    // of >=1 char → per distinct unit the lexicographically-min (doc,pos)
    // survives, every other occurrence covered → anti-join + in-order rebuild
    "q_remove_dup_lines" ->
      """WITH w AS (SELECT doc_id, text, str_split(text, ' ') AS ll FROM documents),
        |l AS (SELECT doc_id, unnest([{'pos': i-1, 'line': ll[i]}
        |    for i in range(1, len(ll)+1)], recursive := true) FROM w),
        |el AS (SELECT doc_id, pos, line FROM l WHERE len(line) >= 1),
        |f AS (SELECT line, MIN({'d': doc_id, 'p': pos}) AS f FROM el
        |  GROUP BY 1 HAVING COUNT(*) >= 2),
        |cov AS (SELECT el.doc_id, el.pos FROM el JOIN f USING (line)
        |  WHERE el.doc_id <> f.f.d OR el.pos <> f.f.p),
        |kept AS (SELECT l.doc_id, l.pos, l.line FROM l
        |  ANTI JOIN cov c ON l.doc_id = c.doc_id AND l.pos = c.pos)
        |SELECT w.doc_id, CASE WHEN w.text IS NULL THEN NULL
        |  ELSE coalesce(string_agg(k.line, ' ' ORDER BY k.pos), '') END AS text
        |FROM w LEFT JOIN kept k ON w.doc_id = k.doc_id GROUP BY w.doc_id, w.text""".stripMargin,
    "q_bothv" ->
      """SELECT o_custkey AS uid, 'customer' AS label FROM orders
        |UNION ALL SELECT o_orderkey, 'order' FROM orders""".stripMargin,
    // datasheet: same token counts, hash-based dup losers, padded-string
    // arg-max for the top language, quantile_cont = Spark's percentile,
    // ratios as exact floor-scaled integers (// = Spark's div)
    "q_corpus_datasheet" ->
      """WITH base AS (SELECT doc_id, source, lang,
        |  len(string_split_regex(text, '\s+')) AS nt, md5(text) AS h FROM documents),
        |losers AS (SELECT b.doc_id FROM base b JOIN (
        |  SELECT h, MIN(doc_id) AS keep, COUNT(*) AS c FROM base GROUP BY 1
        |  HAVING COUNT(*) > 1) d ON d.h = b.h WHERE b.doc_id <> d.keep),
        |flagged AS (SELECT base.*, losers.doc_id IS NOT NULL AS dup
        |  FROM base LEFT JOIN losers ON base.doc_id = losers.doc_id),
        |lt AS (SELECT source, COUNT(*) AS n_langs,
        |  substring(MAX(lpad(CAST(lc AS VARCHAR), 19, '0') || lang), 20) AS top_lang
        |  FROM (SELECT source, lang, COUNT(*) AS lc FROM flagged GROUP BY 1, 2)
        |  GROUP BY 1),
        |agg AS (SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |  quantile_cont(nt, 0.5) AS p50_tokens,
        |  CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups
        |  FROM flagged GROUP BY 1)
        |SELECT a.source, n_docs, n_tokens,
        |  CAST(n_tokens * 1000000 // n_docs AS BIGINT) AS mean_tokens_x1e6,
        |  p50_tokens, n_langs, top_lang, n_exact_dups,
        |  CAST(n_exact_dups * 1000000 // n_docs AS BIGINT) AS dup_pct_x1e6
        |FROM agg a JOIN lt ON lt.source = a.source""".stripMargin,
    "q_corpus_prep" ->
      """WITH t AS (SELECT doc_id, text, source, lang,
        |  string_split_regex(text, '\s+') AS tok FROM documents),
        |c AS (SELECT doc_id, text, source, lang, len(tok) AS ntok,
        |CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS dr,
        |CAST(len(list_filter(tok, w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE)
        |  / CAST(len(tok) AS DOUBLE) AS sr,
        |CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
        |  / CAST(length(text) AS DOUBLE) AS pr
        |FROM t),
        |f AS (SELECT doc_id, text, source, lang, ntok FROM c
        |  WHERE least(dr * 2.0, 1.0) * 0.4 + least(sr * 5.0, 1.0) * 0.3
        |    + greatest(1.0 - pr * 4.0, 0.0) * 0.3 >= 0.7),
        |k AS (SELECT source, lang, ntok FROM f
        |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)))
        |SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
        |FROM k GROUP BY 1, 2""".stripMargin,
    // BM25 (k1=1.2, b=0.75, classic Robertson idf+1): the per-term scores are
    // pivoted into fixed columns and added in declared term order, so the
    // float sum is order-deterministic on both engines; ROUND(_,6) absorbs
    // last-ulp ln() differences.
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, unnest(string_split_regex(lower(text), '\s+')) AS token,
        |         CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS dl
        |  FROM documents),
        |matched AS (
        |  SELECT id, token, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
        |  FROM toks WHERE token IN ('hash', 'scan', 'merge') GROUP BY 1, 2),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |         AVG(CAST(len(string_split_regex(text, '\s+')) AS DOUBLE)) AS avgdl
        |  FROM documents),
        |dfs AS (SELECT token, CAST(COUNT(DISTINCT id) AS DOUBLE) AS dfreq FROM matched GROUP BY 1),
        |scored AS (
        |  SELECT m.id, m.token,
        |    ln((s.n_docs - d.dfreq + 0.5) / (d.dfreq + 0.5) + 1.0) *
        |    (m.tf * 2.2) / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl)) AS sc
        |  FROM matched m JOIN dfs d USING (token) CROSS JOIN stats s),
        |piv AS (
        |  SELECT id,
        |    MAX(CASE WHEN token = 'hash' THEN sc END) AS s1,
        |    MAX(CASE WHEN token = 'scan' THEN sc END) AS s2,
        |    MAX(CASE WHEN token = 'merge' THEN sc END) AS s3
        |  FROM scored GROUP BY 1)
        |SELECT id AS doc_id,
        |  ROUND(COALESCE(s1, 0) + COALESCE(s2, 0) + COALESCE(s3, 0), 6) AS score
        |FROM piv ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_lsh_tuning" -> lshTuningOracle(Seq((64, 2), (32, 4), (16, 8), (8, 16))),
    // streaming CMS: the same counter table the batch sketch produces
    "q_stream_cms" ->
      """WITH toks AS (SELECT unnest(string_split_regex(text, '\s+')) AS t FROM documents),
        |counts AS (SELECT t, COUNT(*) AS cnt FROM toks GROUP BY 1),
        |rws AS (SELECT unnest(range(0, 2)) AS rw)
        |SELECT CAST(rw AS INTEGER) AS rw,
        |  ('0x' || substr(md5(CAST(rw AS VARCHAR) || ':cms:' || t), 21, 12))::BIGINT % 16 AS bucket,
        |  CAST(SUM(cnt) AS BIGINT) AS cnt
        |FROM counts CROSS JOIN rws GROUP BY 1, 2""".stripMargin,
    // count-min: vocab counts -> depth x width md5 counter table -> per-term
    // min over its depth buckets (untouched bucket reads 0)
    "q_cms_estimate" ->
      """WITH toks AS (SELECT unnest(string_split_regex(text, '\s+')) AS t FROM documents),
        |counts AS (SELECT t, COUNT(*) AS cnt FROM toks GROUP BY 1),
        |rws AS (SELECT unnest(range(0, 2)) AS rw),
        |sk AS (SELECT rw,
        |  ('0x' || substr(md5(CAST(rw AS VARCHAR) || ':cms:' || t), 21, 12))::BIGINT % 16 AS bucket,
        |  SUM(cnt) AS cnt FROM counts CROSS JOIN rws GROUP BY 1, 2),
        |terms(token) AS (VALUES ('hash'), ('scan'), ('merge'), ('the'), ('data'), ('zzz_absent')),
        |probes AS (SELECT token, rw,
        |  ('0x' || substr(md5(CAST(rw AS VARCHAR) || ':cms:' || token), 21, 12))::BIGINT % 16 AS bucket
        |  FROM terms CROSS JOIN rws),
        |est AS (SELECT token, MIN(COALESCE(sk.cnt, 0)) AS est FROM probes
        |  LEFT JOIN sk ON probes.rw = sk.rw AND probes.bucket = sk.bucket GROUP BY 1),
        |ex AS (SELECT t AS token, COUNT(*) AS exact FROM toks
        |  WHERE t IN ('hash', 'scan', 'merge', 'the', 'data', 'zzz_absent') GROUP BY 1)
        |SELECT terms.token, CAST(COALESCE(ex.exact, 0) AS BIGINT) AS exact,
        |  CAST(COALESCE(est.est, 0) AS BIGINT) AS est,
        |  CAST(COALESCE(est.est, 0) - COALESCE(ex.exact, 0) AS BIGINT) AS overcount
        |FROM terms LEFT JOIN est ON terms.token = est.token
        |LEFT JOIN ex ON terms.token = ex.token""".stripMargin,
    // stupid backoff: model counts from src0-src9, 3-level CASE fallback,
    // 9-dp lns + DECIMAL-exact backoff constants (ln 0.4 pinned inline)
    "q_stupid_backoff" ->
      """WITH mw AS (SELECT string_split_regex(text, '\s+') AS w FROM documents
        |  WHERE source IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')),
        |tri AS (SELECT w[i] AS a, w[i+1] AS b, w[i+2] AS c, COUNT(*) AS tc
        |  FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i FROM mw WHERE len(w) >= 3)
        |  GROUP BY 1, 2, 3),
        |bi AS (SELECT w[i] AS a, w[i+1] AS b, COUNT(*) AS bc
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM mw WHERE len(w) >= 2)
        |  GROUP BY 1, 2),
        |uni AS (SELECT a, COUNT(*) AS uc FROM (SELECT unnest(w) AS a FROM mw) GROUP BY 1),
        |tot AS (SELECT CAST(SUM(uc) AS DOUBLE) AS n FROM uni),
        |tris AS (SELECT tri.a, tri.b, tri.c,
        |  CAST(ROUND(ln(CAST(tc AS DOUBLE) / CAST(bi.bc AS DOUBLE)), 9) AS DECIMAL(28,12)) AS ts
        |  FROM tri JOIN bi ON tri.a = bi.a AND tri.b = bi.b),
        |bis AS (SELECT bi.a AS b, bi.b AS c,
        |  CAST(ROUND(ln(CAST(bc AS DOUBLE) / CAST(uni.uc AS DOUBLE)), 9) AS DECIMAL(28,12)) AS bs
        |  FROM bi JOIN uni ON bi.a = uni.a),
        |unis AS (SELECT uni.a AS c,
        |  CAST(ROUND(ln(CAST(uc AS DOUBLE) / n), 9) AS DECIMAL(28,12)) AS us
        |  FROM uni CROSS JOIN tot),
        |fl AS (SELECT CAST(ROUND(ln(1.0 / n), 9) AS DECIMAL(28,12)) AS fs FROM tot),
        |pos AS (SELECT doc_id, w[i] AS a, w[i+1] AS b, w[i+2] AS c
        |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents)
        |  , LATERAL unnest(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3),
        |scored AS (SELECT doc_id,
        |  CASE WHEN ts IS NOT NULL THEN ts
        |       WHEN bs IS NOT NULL THEN CAST(-0.916290732 AS DECIMAL(28,12)) + bs
        |       ELSE CAST(-1.832581464 AS DECIMAL(28,12)) + COALESCE(us, fs) END AS logs
        |  FROM pos
        |  LEFT JOIN tris ON pos.a = tris.a AND pos.b = tris.b AND pos.c = tris.c
        |  LEFT JOIN bis ON pos.b = bis.b AND pos.c = bis.c
        |  LEFT JOIN unis ON pos.c = unis.c
        |  CROSS JOIN fl)
        |SELECT doc_id, ROUND(CAST(SUM(logs) AS DOUBLE) / COUNT(*), 6) AS mean_logs
        |FROM scored GROUP BY 1""".stripMargin,
    // tf-idf: linear tf x 9-dp-pinned ln(N/df), fixed-order pivot sum
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents),
        |matched AS (
        |  SELECT id, token, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM toks WHERE token IN ('hash', 'scan', 'merge') GROUP BY 1, 2),
        |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |dfs AS (SELECT token, CAST(COUNT(DISTINCT id) AS DOUBLE) AS dfreq FROM matched GROUP BY 1),
        |scored AS (
        |  SELECT m.id, m.token, m.tf * ROUND(ln(n.n_docs / d.dfreq), 9) AS sc
        |  FROM matched m JOIN dfs d USING (token) CROSS JOIN nd n),
        |piv AS (
        |  SELECT id,
        |    MAX(CASE WHEN token = 'hash' THEN sc END) AS s1,
        |    MAX(CASE WHEN token = 'scan' THEN sc END) AS s2,
        |    MAX(CASE WHEN token = 'merge' THEN sc END) AS s3
        |  FROM scored GROUP BY 1)
        |SELECT id AS doc_id,
        |  ROUND(COALESCE(s1, 0) + COALESCE(s2, 0) + COALESCE(s3, 0), 6) AS score
        |FROM piv ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_length_quantiles" ->
      """SELECT source, COUNT(*) AS n,
        |  ROUND(quantile_cont(len(string_split_regex(text, '\s+')), 0.25), 4) AS p25,
        |  ROUND(quantile_cont(len(string_split_regex(text, '\s+')), 0.5), 4) AS p50,
        |  ROUND(quantile_cont(len(string_split_regex(text, '\s+')), 0.75), 4) AS p75
        |FROM documents GROUP BY 1""".stripMargin,
    "q_event_gaps" ->
      """WITH o AS (SELECT user_id,
        |  epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(gap) AS BIGINT) AS sum_gap_us, MAX(gap) AS max_gap_us
        |FROM o GROUP BY 1""".stripMargin,
    // funnel: stage-by-stage first-touch CTE chain mirroring
    // ChangeStream.funnel join-for-join (strict > on µs, 7-day window)
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t, MIN(epoch_us(ts)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t, MIN(s1.t0) AS t0
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t
        |    AND epoch_us(e.ts) - s1.t0 <= CAST(7 * 86400 AS BIGINT) * 1000000
        |  GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t, MIN(s2.t0) AS t0
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
        |    AND epoch_us(e.ts) - s2.t0 <= CAST(7 * 86400 AS BIGINT) * 1000000
        |  GROUP BY 1)
        |SELECT 1 AS stage, 'signup' AS step, COUNT(*) AS users FROM s1
        |UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3""".stripMargin,
    // retention: DISTINCT (user, day) activity set → min-period cohort →
    // grouped count; integer floor-divides mirror Spark's div on the
    // nonnegative epochs
    "q_retention" ->
      """WITH up AS (SELECT DISTINCT user_id,
        |  epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) AS p
        |  FROM events),
        |c AS (SELECT user_id, MIN(p) AS c FROM up GROUP BY 1)
        |SELECT c.c AS cohort_period, up.p - c.c AS periods_since,
        |  COUNT(*) AS users
        |FROM up JOIN c ON up.user_id = c.user_id GROUP BY 1, 2""".stripMargin,
    // percentiles: rank() = 1 + strictly-smaller count, type-partitioned;
    // DECIMAL-scaled exact CDF position
    "q_value_percentiles" ->
      """WITH ev AS (SELECT event_id, event_type AS etype, ROUND(value, 6) AS v
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_id, etype, v,
        |  CAST(RANK() OVER (PARTITION BY etype ORDER BY v ASC) AS BIGINT) - 1 AS n_lt,
        |  CAST(COUNT(*) OVER (PARTITION BY etype) AS BIGINT) AS n,
        |  CAST((CAST(RANK() OVER (PARTITION BY etype ORDER BY v ASC) AS HUGEINT) - 1)
        |    * 1000000 // COUNT(*) OVER (PARTITION BY etype) AS BIGINT) AS pct_x1e6
        |FROM ev""".stripMargin,
    // winsorize: 6-dp-pinned values, 4-dp-rounded interpolated quantile
    // bounds (the lengthQuantiles recipe), pure clamp
    "q_winsorize" ->
      """WITH ev AS (SELECT event_id, event_type, ROUND(value, 6) AS v FROM events),
        |b AS (SELECT event_type AS bg, ROUND(quantile_cont(v, 0.05), 4) AS lo,
        |  ROUND(quantile_cont(v, 0.95), 4) AS hi FROM ev GROUP BY 1)
        |SELECT ev.event_id, ev.event_type,
        |  least(greatest(ev.v, b.lo), b.hi) AS v_clipped
        |FROM ev JOIN b ON ev.event_type IS NOT DISTINCT FROM b.bg""".stripMargin,
    // z-scores: 6-dp-pinned DECIMAL(17,6) values (square exact inside 38
    // digits), moments per type, then the IEEE-mirrored (v-μ)/σ chain —
    // subtract/divide/sqrt are correctly rounded in both engines
    "q_value_zscores" ->
      """WITH ev AS (SELECT event_id, event_type AS etype,
        |  CAST(ROUND(value, 6) AS DECIMAL(17,6)) AS v FROM events),
        |st AS (SELECT etype AS sg, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS s2
        |  FROM ev GROUP BY 1)
        |SELECT ev.event_id, ev.etype,
        |  CASE WHEN CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) > 0
        |    THEN (CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |        - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
        |    ELSE NULL END AS z
        |FROM ev JOIN st ON ev.etype IS NOT DISTINCT FROM st.sg""".stripMargin,
    // transitions: per-user lead() ordered by (ts, event_id) → pair counts
    // → exact floor-scaled conditional probabilities
    "q_event_transitions" ->
      """WITH seq AS (SELECT event_type,
        |  LEAD(event_type) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS nxt FROM events),
        |tr AS (SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS cnt
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, SUM(cnt) AS tot FROM tr GROUP BY 1)
        |SELECT tr.from_type, tr.to_type, tr.cnt,
        |  CAST(tr.cnt * 1000000 // tot.tot AS BIGINT) AS p_x1e6
        |FROM tr JOIN tot ON tr.from_type = tot.from_type""".stripMargin,
    // fertility: exact word/subword sums per lang, floor-scaled ratio; the
    // subword regex is the q_subword_count RE2-mirrorable run extraction
    "q_fertility" ->
      """SELECT lang,
        |  CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_words,
        |  CAST(SUM(len(regexp_extract_all(text,
        |    '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]+'))) AS BIGINT) AS n_subwords,
        |  CAST(SUM(len(regexp_extract_all(text,
        |    '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]+'))) * 1000000
        |    // SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS fertility_x1e6
        |FROM documents GROUP BY 1""".stripMargin,
    // join audit: per-key counts each side, orphan mass via anti-joins
    "q_join_audit" ->
      """WITH lk AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |rk AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1)
        |SELECT
        |  (SELECT CAST(SUM(c) AS BIGINT) FROM lk) AS n_left,
        |  (SELECT COUNT(*) FROM lk) AS left_keys,
        |  (SELECT CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM lk) AS left_dup_keys,
        |  (SELECT CAST(SUM(c) AS BIGINT) FROM rk) AS n_right,
        |  (SELECT COUNT(*) FROM rk) AS right_keys,
        |  (SELECT CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM rk) AS right_dup_keys,
        |  (SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0) FROM lk ANTI JOIN rk r2 ON lk.k = r2.k) AS left_orphans,
        |  (SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0) FROM rk ANTI JOIN lk l2 ON rk.k = l2.k) AS right_orphans""".stripMargin,
    // overlap: distinct (source, token) incidence → token-keyed pair join →
    // exact inter/union integers (the neighborJaccard statistic on vocab)
    "q_source_overlap" ->
      """WITH st AS (SELECT DISTINCT source AS g,
        |  unnest(string_split_regex(text, '\s+')) AS w FROM documents),
        |sz AS (SELECT g, COUNT(*) AS nv FROM st GROUP BY 1),
        |pr AS (SELECT a.g, b.g AS g2, COUNT(*) AS shared FROM st a
        |  JOIN st b ON a.w = b.w AND a.g < b.g GROUP BY 1, 2)
        |SELECT pr.g AS source_a, pr.g2 AS source_b, pr.shared,
        |  sa.nv + sb.nv - pr.shared AS uni,
        |  CAST(pr.shared * 1000000 // (sa.nv + sb.nv - pr.shared) AS BIGINT) AS jaccard_x1e6
        |FROM pr JOIN sz sa ON sa.g = pr.g JOIN sz sb ON sb.g = pr.g2""".stripMargin,
    // filter audit: the q_gopher_rules flag SQL aggregated per source
    "q_filter_report" ->
      """WITH t AS (SELECT source, string_split_regex(text, '\s+') AS w FROM documents),
        |f AS (SELECT source, len(w) AS n,
        |  CAST(list_sum([len(x) for x in w]) AS DOUBLE) / len(w) AS mean_len,
        |  len(list_filter(w, x -> contains(x, '#') OR contains(x, '...'))) AS sym,
        |  len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
        |  len(list_distinct(list_filter(w, x -> x IN
        |    ('the','a','an','and','or','of','to','in','is','it')))) AS stops
        |  FROM t),
        |fl AS (SELECT source,
        |  n >= 30 AND n <= 100000 AS wc,
        |  mean_len >= 3.0 AND mean_len <= 10.0 AS ml,
        |  CAST(sym AS DOUBLE) / n <= 0.1 AS sr,
        |  CAST(alpha AS DOUBLE) / n >= 0.8 AS ar,
        |  stops >= 2 AS sw FROM f)
        |SELECT source, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN NOT wc THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
        |  CAST(SUM(CASE WHEN NOT ml THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
        |  CAST(SUM(CASE WHEN NOT sr THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol_ratio,
        |  CAST(SUM(CASE WHEN NOT ar THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_ratio,
        |  CAST(SUM(CASE WHEN NOT sw THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopword,
        |  CAST(SUM(CASE WHEN wc AND ml AND sr AND ar AND sw THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM fl GROUP BY 1""".stripMargin,
    // MI: one joint count, marginals derived from it, per-cell
    // cab·round(ln r, 9) summed in DECIMAL — the bigramLogProb recipe
    "q_mutual_info" ->
      """WITH j AS (SELECT lang AS a, source AS b, COUNT(*) AS cab FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |ca AS (SELECT a, SUM(cab) AS ca FROM j GROUP BY 1),
        |cb AS (SELECT b, SUM(cab) AS cb FROM j GROUP BY 1),
        |nn AS (SELECT CAST(SUM(cab) AS BIGINT) AS n FROM j)
        |SELECT nn.n, ROUND(CAST(SUM(CAST(cab AS DECIMAL(19,0)) * CAST(ROUND(ln(
        |    (CAST(nn.n AS DOUBLE) * CAST(cab AS DOUBLE)) /
        |    (CAST(ca.ca AS DOUBLE) * CAST(cb.cb AS DOUBLE))), 9)
        |  AS DECIMAL(11,9))) AS DOUBLE) / CAST(nn.n AS DOUBLE), 6) AS mi
        |FROM j JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN nn
        |GROUP BY nn.n""".stripMargin,
    // spectrum: occurrences → per-type counts → frequency-of-frequencies
    "q_freq_spectrum" ->
      """WITH toks AS (SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents),
        |tf AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY 1)
        |SELECT freq, COUNT(*) AS n_types FROM tf GROUP BY 1""".stripMargin,
    "q_contamination" -> contaminationOracle,
    "q_contamination_overlap" -> contaminationOverlapOracle,
    "q_mixture_sample" -> mixtureSampleOracle,
    "q_split_hash" -> hashSplitOracle(SplitWeights, "split1"),
    "q_split_stratified" -> stratifiedSplitOracle(SplitWeights, "split1"),
    "q_quality_linear" -> qualityLinearOracle(QualityVocab, 0.05, 0.1),
    "q_bpe_encode" -> bpeEncodeOracle,
    "q_oov_rate" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w FROM documents),
        |v AS (SELECT w FROM (SELECT w, COUNT(*) AS f FROM toks GROUP BY 1
        |                     ORDER BY f DESC, w ASC LIMIT 200)),
        |j AS (SELECT t.doc_id, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM toks t LEFT JOIN v ON v.w = t.w)
        |SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(oov) AS BIGINT) AS n_oov,
        |  CAST(SUM(oov) * 1000000 // COUNT(*) AS BIGINT) AS oov_x1e6
        |FROM j GROUP BY 1""".stripMargin,
    // the streaming monitor must equal the batch statistic exactly
    "q_stream_oov" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w FROM documents),
        |v AS (SELECT w FROM (SELECT w, COUNT(*) AS f FROM toks GROUP BY 1
        |                     ORDER BY f DESC, w ASC LIMIT 200)),
        |j AS (SELECT t.doc_id, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM toks t LEFT JOIN v ON v.w = t.w)
        |SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(oov) AS BIGINT) AS n_oov,
        |  CAST(SUM(oov) * 1000000 // COUNT(*) AS BIGINT) AS oov_x1e6
        |FROM j GROUP BY 1""".stripMargin,
    "q_profile" -> Seq("lang", "source", "n_chars").map(c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n,
         |COUNT(*) - COUNT($c) AS nulls, COUNT(DISTINCT $c) AS ndv,
         |CAST(MIN($c) AS VARCHAR) AS min_str, CAST(MAX($c) AS VARCHAR) AS max_str
         |FROM documents""".stripMargin).mkString("\nUNION ALL\n"),
    "q_bpe_train" -> bpeTrainOracle(8),
    "q_bpe_pairs" ->
      """WITH toks AS (SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents),
        |wf AS (SELECT w, COUNT(*) AS f FROM toks GROUP BY 1),
        |p0 AS (SELECT w, f, unnest(range(1, len(w))) AS i FROM wf WHERE len(w) >= 2),
        |p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, f FROM p0)
        |SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM p
        |GROUP BY 1 ORDER BY cnt DESC, pair ASC LIMIT 30""".stripMargin,
    "q_dedup_documents" -> dedupDocsOracle(8),
    "q_dedup_remap" -> survivorMapOracle(8),
    // dim stats: 6-dp-pinned doubles, DECIMAL moments, IEEE mean/std chain
    // (the valueZScores recipe applied per dimension)
    "q_embed_dimstats" ->
      """WITH x AS (SELECT unnest(range(len(embedding))) AS dim,
        |    unnest(embedding) AS e FROM embeddings),
        |p AS (SELECT CAST(dim AS INTEGER) AS dim, ROUND(CAST(e AS DOUBLE), 6) AS vd FROM x),
        |q AS (SELECT dim, vd, CAST(vd AS DECIMAL(17,6)) AS dv FROM p),
        |a AS (SELECT dim, COUNT(*) AS n, MIN(vd) AS vmin, MAX(vd) AS vmax,
        |  SUM(dv) AS s, SUM(dv * dv) AS s2 FROM q GROUP BY 1)
        |SELECT dim, n, vmin, vmax,
        |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |  CASE WHEN CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) > 0
        |    THEN sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
        |    ELSE 0.0 END AS std
        |FROM a""".stripMargin,
    // whitening: the dim-stats moment recipe, then the IEEE (v-mu)/sigma
    // chain per exploded cell; zero-variance dims yield NULL z
    "q_embed_whiten" ->
      """WITH x AS (SELECT vec_id, unnest(range(len(embedding))) AS dim,
        |    unnest(embedding) AS e FROM embeddings),
        |p AS (SELECT vec_id, CAST(dim AS INTEGER) AS dim,
        |  ROUND(CAST(e AS DOUBLE), 6) AS vd FROM x),
        |q AS (SELECT dim, CAST(vd AS DECIMAL(17,6)) AS dv FROM p),
        |a AS (SELECT dim, COUNT(*) AS n, SUM(dv) AS s, SUM(dv * dv) AS s2
        |  FROM q GROUP BY 1),
        |st AS (SELECT dim, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |  CASE WHEN CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) > 0
        |    THEN sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
        |    ELSE NULL END AS sigma
        |  FROM a)
        |SELECT p.vec_id, p.dim, (p.vd - st.mu) / st.sigma AS z
        |FROM p JOIN st ON p.dim = st.dim""".stripMargin,
    "q_dedup_stats" -> dedupStatsOracle(8),
    "q_dedup_priority" -> dedupPriorityOracle(8),
    "q_semantic_dedup" -> semanticDedupOracle(8, 0.4254, 16),
    "q_ann_range" ->
      """SELECT q.vec_id AS qid, d.vec_id AS nid FROM embeddings q JOIN embeddings d
        |ON q.vec_id < 10 AND q.vec_id <> d.vec_id
        |AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |  CAST(d.embedding AS DOUBLE[])) >= 0.3""".stripMargin,
    "q_embed_pairs" ->
      """SELECT a.vec_id AS ida, b.vec_id AS idb FROM embeddings a JOIN embeddings b
        |ON a.vec_id < b.vec_id
        |AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4254""".stripMargin,
    "q_top_bigrams" ->
      """WITH toks AS (SELECT string_split_regex(text, '\s+') AS t FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
        |      FROM toks WHERE len(t) >= 2)
        |SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY 1
        |ORDER BY cnt DESC, bigram LIMIT 30""".stripMargin,
    // PMI: marginals derived FROM the bigram-position table, one 9-dp ln
    "q_pmi_bigrams" ->
      """WITH ws AS (SELECT string_split_regex(text, '\s+') AS w FROM documents),
        |bi AS (SELECT w[i] AS a, w[i+1] AS b
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM ws WHERE len(w) >= 2)),
        |bc AS (SELECT a, b, COUNT(*) AS bc FROM bi GROUP BY 1, 2),
        |ac AS (SELECT a, SUM(bc) AS ac FROM bc GROUP BY 1),
        |cc AS (SELECT b, SUM(bc) AS cc FROM bc GROUP BY 1),
        |tt AS (SELECT CAST(SUM(bc) AS DOUBLE) AS n FROM bc)
        |SELECT bc.a || ' ' || bc.b AS bigram, bc.bc AS cnt,
        |  ROUND(ln((CAST(bc.bc AS DOUBLE) * tt.n) /
        |    (CAST(ac.ac AS DOUBLE) * CAST(cc.cc AS DOUBLE))), 9) AS pmi
        |FROM bc JOIN ac ON bc.a = ac.a JOIN cc ON bc.b = cc.b CROSS JOIN tt
        |WHERE bc.bc >= 5 ORDER BY pmi DESC, bigram ASC LIMIT 30""".stripMargin,
    "q_vocab_stats" ->
      """WITH tk AS (SELECT source, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
        |SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_distinct,
        |round(CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*), 6) AS ttr
        |FROM tk GROUP BY 1""".stripMargin,
    "q_quantize_int8" ->
      """WITH q AS (SELECT vec_id,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s,
        |  embedding FROM embeddings)
        |SELECT vec_id, round(s, 6) AS scale,
        |  CASE WHEN s = 0 THEN array_to_string(list_transform(embedding, x -> '0'), ',')
        |       ELSE array_to_string(list_transform(embedding,
        |         x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 127 / s + 0.5) AS INTEGER) AS VARCHAR)), ',') END AS codes
        |FROM q""".stripMargin,
    "q_embed_meanpool" ->
      """WITH x AS (SELECT label, unnest(range(len(embedding))) AS dim,
        |                  unnest(embedding) AS e FROM embeddings)
        |SELECT label, CAST(dim AS INTEGER) AS dim,
        |       round(CAST(SUM(CAST(e AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS centroid
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q_ann_topk" ->
      """SELECT qid, nid, "rank" FROM (
        |SELECT q.vec_id AS qid, d.vec_id AS nid,
        |ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[])) DESC,
        |  d.vec_id) AS "rank"
        |FROM embeddings q JOIN embeddings d ON d.vec_id <> q.vec_id
        |WHERE q.vec_id < 10) WHERE "rank" <= 5""".stripMargin,
    "q_ivf_topk" ->
      s"""WITH ${kmeansCtes(16, 2)},
        |asg AS MATERIALIZED (
        |  SELECT vec_id AS nid, embedding AS dvec, cid FROM (
        |    SELECT e.vec_id, e.embedding, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
        |    FROM embeddings e CROSS JOIN cents2 c) WHERE rn = 1),
        |probes AS MATERIALIZED (
        |  SELECT qid, qvec, cid FROM (
        |    SELECT q.vec_id AS qid, q.embedding AS qvec, c.cid, ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
        |    FROM embeddings q CROSS JOIN cents2 c WHERE q.vec_id < 10) WHERE rn <= 4)
        |SELECT qid, nid, "rank" FROM (
        |  SELECT p.qid, a.nid, ROW_NUMBER() OVER (PARTITION BY p.qid
        |    ORDER BY list_cosine_similarity(CAST(p.qvec AS DOUBLE[]), CAST(a.dvec AS DOUBLE[])) DESC, a.nid) AS "rank"
        |  FROM probes p JOIN asg a ON a.cid = p.cid WHERE a.nid <> p.qid)
        |WHERE "rank" <= 5""".stripMargin,
    // recall report: the q_ann_topk brute CTE ∩ the q_ivf_topk probe CTE,
    // exact integer recall per query + the qid=-1 micro-average
    "q_ann_recall" ->
      s"""WITH ${kmeansCtes(16, 2)},
        |asg AS MATERIALIZED (
        |  SELECT vec_id AS nid, embedding AS dvec, cid FROM (
        |    SELECT e.vec_id, e.embedding, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
        |    FROM embeddings e CROSS JOIN cents2 c) WHERE rn = 1),
        |probes AS MATERIALIZED (
        |  SELECT qid, qvec, cid FROM (
        |    SELECT q.vec_id AS qid, q.embedding AS qvec, c.cid, ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
        |    FROM embeddings q CROSS JOIN cents2 c WHERE q.vec_id < 10) WHERE rn <= 4),
        |ivf AS MATERIALIZED (SELECT qid, nid FROM (
        |  SELECT p.qid, a.nid, ROW_NUMBER() OVER (PARTITION BY p.qid
        |    ORDER BY list_cosine_similarity(CAST(p.qvec AS DOUBLE[]), CAST(a.dvec AS DOUBLE[])) DESC, a.nid) AS rn
        |  FROM probes p JOIN asg a ON a.cid = p.cid WHERE a.nid <> p.qid) WHERE rn <= 5),
        |bf AS MATERIALIZED (SELECT qid, nid FROM (
        |  SELECT q.vec_id AS qid, d.vec_id AS nid,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[])) DESC,
        |      d.vec_id) AS rn
        |  FROM embeddings q JOIN embeddings d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10) WHERE rn <= 5),
        |ex AS (SELECT qid, COUNT(*) AS n_exact FROM bf GROUP BY 1),
        |h AS (SELECT b.qid, COUNT(*) AS hits FROM bf b
        |  JOIN ivf i ON i.qid = b.qid AND i.nid = b.nid GROUP BY 1),
        |per AS (SELECT e.qid, COALESCE(h.hits, 0) AS hits, e.n_exact,
        |  COALESCE(h.hits, 0) * 1000000 // e.n_exact AS recall_x1e6
        |  FROM ex e LEFT JOIN h ON h.qid = e.qid)
        |SELECT qid, CAST(hits AS BIGINT) AS hits, CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(recall_x1e6 AS BIGINT) AS recall_x1e6 FROM per
        |UNION ALL SELECT CAST(-1 AS BIGINT), CAST(SUM(hits) AS BIGINT),
        |  CAST(SUM(n_exact) AS BIGINT),
        |  CAST(SUM(hits) * 1000000 // SUM(n_exact) AS BIGINT) FROM per""".stripMargin,
    "q_pq_encode" -> pqEncodeOracle(m = 2, k = 8, rounds = 2, dim = 64),
    "q_random_project" -> randomProjectOracle(outDim = 16, dim = 64),
    "q_truncate_tokens" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS wl FROM documents)
        |SELECT doc_id, array_to_string(wl[1:40], ' ') AS text,
        |  CAST(least(len(wl), 40) AS BIGINT) AS n_tokens, len(wl) > 40 AS truncated FROM w""".stripMargin,
    // same exact-Jaccard pair graph as the dedup oracles, bucketed by the
    // unordered source pair of the endpoints
    "q_cross_source_dups" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text,'\s+') AS wl FROM documents),
        |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
        |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
        |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
        |pairs AS MATERIALIZED (SELECT ida, idb FROM (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) p
        |  JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
        |  WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.8)
        |SELECT least(a.source, b.source) AS source_a,
        |  greatest(a.source, b.source) AS source_b, COUNT(*) AS n_pairs
        |FROM pairs JOIN documents a ON a.doc_id = ida
        |JOIN documents b ON b.doc_id = idb GROUP BY 1, 2""".stripMargin,
    "q_hubness" ->
      """WITH knn AS (SELECT nid FROM (
        |  SELECT q.vec_id AS qid, d.vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(d.embedding AS DOUBLE[])) DESC, d.vec_id) AS rn
        |  FROM embeddings q JOIN embeddings d ON q.vec_id <> d.vec_id) WHERE rn <= 5),
        |deg AS (SELECT e.vec_id, COUNT(k.nid) AS in_degree
        |  FROM embeddings e LEFT JOIN knn k ON k.nid = e.vec_id GROUP BY 1)
        |SELECT in_degree, COUNT(*) AS n_vectors FROM deg GROUP BY 1""".stripMargin,
    "q_pq_topk" -> pqTopKOracle(m = 2, k = 5, codes = 8, rounds = 2, dim = 64, maxQid = 10),
    // decode: codeword concat per vector, per-dimension rows; values are the
    // 6-dp decimal means both engines compute bit-identically
    "q_pq_decode" ->
      s"""WITH ${pqBlocks(2, 8, 2, 64).mkString(",\n")},
         |dec AS (SELECT a0.vec_id, c0.cvec || c1.cvec AS l
         |  FROM asg0 a0 JOIN asg1 a1 USING (vec_id)
         |  JOIN s0_cents2 c0 ON c0.cid = a0.code0
         |  JOIN s1_cents2 c1 ON c1.cid = a1.code1)
         |SELECT vec_id, unnest([{'dim': i-1, 'val': l[i]}
         |  for i in range(1, len(l)+1)], recursive := true) FROM dec""".stripMargin,
    "q_ivfpq_topk" -> ivfPqTopKOracle(nlist = 16, nprobe = 4, m = 2, k = 5,
      codes = 8, rounds = 2, dim = 64, maxQid = 10),
    // the persisted index materializes the same deterministic training, so
    // the search result — and therefore the oracle — is identical
    // append: training frozen on the base corpus, encode/search the union
    "q_ivfpq_append" -> ivfPqTopKOracle(nlist = 16, nprobe = 4, m = 2, k = 5,
      codes = 8, rounds = 2, dim = 64, maxQid = 10, trainSrc = "base",
      preCtes = "base AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id < 400),\n"),
    "q_ivfpq_persisted" -> ivfPqTopKOracle(nlist = 16, nprobe = 4, m = 2, k = 5,
      codes = 8, rounds = 2, dim = 64, maxQid = 10),
    "q_bigram_logprob" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS wl FROM documents),
        |bi AS (SELECT doc_id, unnest([{'a': wl[i], 'b': wl[i+1]}
        |    for i in range(1, len(wl))], recursive := true)
        |  FROM w WHERE len(wl) >= 2),
        |bc AS (SELECT a, b, COUNT(*) AS bc FROM bi GROUP BY 1, 2),
        |ac AS (SELECT a, COUNT(*) AS ac FROM bi GROUP BY 1)
        |SELECT doc_id,
        |  ROUND(CAST(SUM(CAST(ROUND(ln(CAST(bc AS DOUBLE) / CAST(ac AS DOUBLE)), 9) AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_logp
        |FROM bi JOIN bc USING (a, b) JOIN ac USING (a) GROUP BY 1""".stripMargin,
    "q_temperature_weights" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |s AS (SELECT source, n_docs, CAST(sqrt(n_docs) AS DECIMAL(27,10)) AS sc FROM c),
        |t AS (SELECT SUM(sc) AS tot FROM s)
        |SELECT source, n_docs,
        |  round(CAST(sc AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS weight FROM s, t""".stripMargin,
    "q_gopher_rules" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
        |f AS (SELECT doc_id, len(w) AS n,
        |  CAST(list_sum([len(x) for x in w]) AS DOUBLE) / len(w) AS mean_len,
        |  len(list_filter(w, x -> contains(x, '#') OR contains(x, '...'))) AS sym,
        |  len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
        |  len(list_distinct(list_filter(w, x -> x IN
        |    ('the','a','an','and','or','of','to','in','is','it')))) AS stops
        |  FROM t)
        |SELECT doc_id,
        |  n >= 30 AND n <= 100000 AS word_count_ok,
        |  mean_len >= 3.0 AND mean_len <= 10.0 AS mean_word_len_ok,
        |  CAST(sym AS DOUBLE) / n <= 0.1 AS symbol_ratio_ok,
        |  CAST(alpha AS DOUBLE) / n >= 0.8 AS alpha_ratio_ok,
        |  stops >= 2 AS stopword_ok,
        |  (n >= 30 AND n <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |    AND (CAST(sym AS DOUBLE) / n <= 0.1) AND (CAST(alpha AS DOUBLE) / n >= 0.8)
        |    AND stops >= 2 AS pass
        |FROM f""".stripMargin,
    // mirrors c4Clean rule-for-rule over the same synthesized 4-line page
    "q_c4_clean" ->
      """WITH page AS (SELECT doc_id,
        |  substr(text, 1, 40) || ' tail.' || chr(10) ||
        |  'no terminal punct' || chr(10) ||
        |  'the quick brown fox jumps.' || chr(10) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN 'junk { brace' ELSE 'clean third line.' END) AS text
        |  FROM documents),
        |k AS (SELECT doc_id, text,
        |  [l for l in string_split(text, chr(10)) if regexp_matches(rtrim(l), '[.!?"]$')
        |    and len(string_split_regex(trim(l), '\s+')) >= 3
        |    and not contains(lower(l), 'javascript')] AS kl FROM page)
        |SELECT doc_id,
        |  CASE WHEN pd THEN NULL ELSE array_to_string(kl, chr(10)) END AS text,
        |  NOT pd AS kept
        |FROM (SELECT doc_id, kl,
        |  text IS NULL OR contains(lower(text), 'lorem ipsum')
        |    OR contains(text, '{') OR len(kl) < 3 AS pd
        |  FROM k)""".stripMargin,
    "q_hard_negatives" ->
      """SELECT qid, nid, "rank" FROM (
        |  SELECT q.vec_id AS qid, d.vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(d.embedding AS DOUBLE[])) DESC, d.vec_id) AS "rank"
        |  FROM embeddings q JOIN embeddings d ON d.label <> q.label
        |  WHERE q.vec_id < 10)
        |WHERE "rank" <= 5""".stripMargin,
    "q_token_count" ->
      "SELECT doc_id, CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens FROM documents",
    "q_multimodal" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |CAST(length(text) % 640 AS INTEGER) AS width FROM documents""".stripMargin,
    "q_image_decode" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |px AS (SELECT doc_id, (doc_id*31 + i) % 256 AS g
        |       FROM ids CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        |cnt AS (SELECT doc_id, g // 32 AS bin, COUNT(*) AS c FROM px GROUP BY 1, 2),
        |bins AS (SELECT unnest(range(0, 8)) AS bin)
        |SELECT ids.doc_id, 8 AS width, 8 AS height, CAST(bins.bin AS INTEGER) AS bin,
        |  CAST(COALESCE(c, 0) AS DOUBLE) / 64 AS frac
        |FROM ids CROSS JOIN bins
        |LEFT JOIN cnt ON cnt.doc_id = ids.doc_id AND cnt.bin = bins.bin""".stripMargin,
    // aHash oracle: pixel g(i) = (doc_id*31+i) % 256, Rec.601 of a gray pixel
    // is g exactly, bit i set iff g*64 > sum(g); words assembled bit-by-bit
    // (lo = bits 0-31, hi = 32-63 — shifts stay below the sign bit)
    "q_image_ahash" ->
      """WITH px AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS i, (doc_id*31 + i) % 256 AS g
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        |s AS (SELECT doc_id, i, g, SUM(g) OVER (PARTITION BY doc_id) AS tot FROM px)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN g*64 > tot AND i >= 32 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
        |  CAST(SUM(CASE WHEN g*64 > tot AND i < 32 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS ahash_lo
        |FROM s GROUP BY doc_id""".stripMargin,
    // dHash: same analytic 8x8 luminance lattice, horizontal gradient bits
    "q_image_dhash" ->
      """WITH px AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS i, (doc_id*31 + i) % 256 AS g
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        |d AS (SELECT a.doc_id, (a.i // 8) * 7 + (a.i % 8) AS k
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  WHERE a.i % 8 < 7 AND b.g > a.g)
        |SELECT doc_id,
        |  CAST(COALESCE(SUM(CAST(1 AS BIGINT) << CAST(k AS INTEGER)), 0) AS BIGINT) AS dhash
        |FROM (SELECT doc_id FROM documents) docs
        |LEFT JOIN d USING (doc_id) GROUP BY doc_id""".stripMargin,
    // streaming twin: same hash derivation, one survivor + count per
    // distinct fingerprint — identical to what the stream's complete-mode
    // aggregate materializes
    "q_stream_image_dedup" ->
      """WITH px AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS i, (doc_id*31 + i) % 256 AS g
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        |s AS (SELECT doc_id, i, g, SUM(g) OVER (PARTITION BY doc_id) AS tot FROM px),
        |h AS (SELECT doc_id,
        |  CAST(SUM(CASE WHEN g*64 > tot AND i >= 32 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
        |  CAST(SUM(CASE WHEN g*64 > tot AND i < 32 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS ahash_lo
        |FROM s GROUP BY doc_id)
        |SELECT ahash_hi, ahash_lo, MIN(doc_id) AS survivor, COUNT(*) AS n_dups
        |FROM h GROUP BY 1, 2""".stripMargin,
    // near-dup oracle: brute-force Hamming over the same hashes — the engine's
    // banded join is recall-1 for distance <= 7, so the sets are identical
    "q_image_neardup" ->
      """WITH px AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS i, (doc_id*31 + i) % 256 AS g
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        |s AS (SELECT doc_id, i, g, SUM(g) OVER (PARTITION BY doc_id) AS tot FROM px),
        |h AS (SELECT doc_id,
        |  CAST(SUM(CASE WHEN g*64 > tot AND i >= 32 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |  CAST(SUM(CASE WHEN g*64 > tot AND i < 32 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS lo
        |FROM s GROUP BY doc_id)
        |SELECT ida, idb, hamming FROM (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb,
        |    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
        |  FROM h a JOIN h b ON a.doc_id < b.doc_id)
        |WHERE hamming <= 7""".stripMargin,
    "q_image_resize" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |px AS (SELECT doc_id,
        |         (doc_id*31 + ((i // 4) * 2) * 8 + (i % 4) * 2) % 256 AS g
        |       FROM ids CROSS JOIN (SELECT unnest(range(0, 16)) AS i)),
        |cnt AS (SELECT doc_id, g // 32 AS bin, COUNT(*) AS c FROM px GROUP BY 1, 2),
        |bins AS (SELECT unnest(range(0, 8)) AS bin)
        |SELECT ids.doc_id, 4 AS width, 4 AS height, CAST(bins.bin AS INTEGER) AS bin,
        |  CAST(COALESCE(c, 0) AS DOUBLE) / 16 AS frac
        |FROM ids CROSS JOIN bins
        |LEFT JOIN cnt ON cnt.doc_id = ids.doc_id AND cnt.bin = bins.bin""".stripMargin,
    // audio fingerprint oracle: 256 samples -> 64 frames of 4, frame energy
    // Σ|s|, bit f iff e*64 > total — mirrors audioFingerprint exactly
    "q_audio_fingerprint" ->
      """WITH sm AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
        |    CAST((doc_id*7919 + i*31) % 65536 - 32768 AS BIGINT) AS s
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 256)) AS i)),
        |fr AS (SELECT doc_id, i // 4 AS f, SUM(ABS(s)) AS e FROM sm GROUP BY 1, 2),
        |t AS (SELECT doc_id, CAST(f AS INTEGER) AS f, e,
        |      SUM(e) OVER (PARTITION BY doc_id) AS tot FROM fr)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN e*64 > tot AND f >= 32 THEN (CAST(1 AS BIGINT) << (f - 32)) ELSE 0 END) AS BIGINT) AS afp_hi,
        |  CAST(SUM(CASE WHEN e*64 > tot AND f < 32 THEN (CAST(1 AS BIGINT) << f) ELSE 0 END) AS BIGINT) AS afp_lo
        |FROM t GROUP BY doc_id""".stripMargin,
    "q_audio_neardup" ->
      """WITH sm AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
        |    CAST((doc_id*7919 + i*31) % 65536 - 32768 AS BIGINT) AS s
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 256)) AS i)),
        |fr AS (SELECT doc_id, i // 4 AS f, SUM(ABS(s)) AS e FROM sm GROUP BY 1, 2),
        |t AS (SELECT doc_id, CAST(f AS INTEGER) AS f, e,
        |      SUM(e) OVER (PARTITION BY doc_id) AS tot FROM fr),
        |h AS (SELECT doc_id,
        |  CAST(SUM(CASE WHEN e*64 > tot AND f >= 32 THEN (CAST(1 AS BIGINT) << (f - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |  CAST(SUM(CASE WHEN e*64 > tot AND f < 32 THEN (CAST(1 AS BIGINT) << f) ELSE 0 END) AS BIGINT) AS lo
        |FROM t GROUP BY doc_id)
        |SELECT ida, idb, hamming FROM (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb,
        |    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
        |  FROM h a JOIN h b ON a.doc_id < b.doc_id)
        |WHERE hamming <= 7""".stripMargin,
    "q_audio_decode" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |sm AS (SELECT doc_id, CAST((doc_id*7919 + i*31) % 65536 - 32768 AS INTEGER) AS s
        |       FROM ids CROSS JOIN (SELECT unnest(range(0, 256)) AS i))
        |SELECT doc_id, 8000 AS sample_rate, CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  MIN(s) AS smin, MAX(s) AS smax, CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs
        |FROM sm GROUP BY doc_id""".stripMargin,
    "q_frame_sample" ->
      """WITH f AS (SELECT doc_id, unnest(generate_series(0, n_chars * 40 - 1, 2000)) AS o
        |           FROM documents WHERE n_chars > 0)
        |SELECT doc_id, CAST(o / 2000 AS INTEGER) AS frame_idx, o AS offset_ms
        |FROM f WHERE o < 32000""".stripMargin,
    "q_chunk_plan" ->
      """WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |     f AS (SELECT doc_id, n, unnest(generate_series(0, n - 1, 1000)) AS o
        |           FROM d WHERE n > 0)
        |SELECT doc_id, n AS n_bytes, CAST(o / 1000 AS INTEGER) AS chunk_idx,
        |       o AS "start", least(o + 1000, n) AS "end" FROM f""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |coalesce(o_orderstatus, 'ALL') AS status, COUNT(*) AS cnt
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin,
    "q_quality" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS tok FROM documents)
        |SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
        |CAST(len(list_distinct(tok)) AS BIGINT) AS n_distinct,
        |CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS distinct_ratio,
        |CAST(len(list_filter(tok, w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE)
        |  / CAST(len(tok) AS DOUBLE) AS stopword_ratio
        |FROM t""".stripMargin,
    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(text, '\s+') AS tok FROM documents),
        |c AS (SELECT doc_id,
        |CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS dr,
        |CAST(len(list_filter(tok, w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE)
        |  / CAST(len(tok) AS DOUBLE) AS sr,
        |CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
        |  / CAST(length(text) AS DOUBLE) AS pr
        |FROM t)
        |SELECT doc_id, least(dr * 2.0, 1.0) * 0.4 + least(sr * 5.0, 1.0) * 0.3
        |  + greatest(1.0 - pr * 4.0, 0.0) * 0.3 AS score FROM c""".stripMargin,
    "q_langid" ->
      """WITH t AS (SELECT doc_id, list_transform(string_split_regex(text,'\s+'), w -> lower(w)) AS tok FROM documents),
        |c AS (SELECT doc_id,
        |len(list_filter(tok, w -> list_contains(['the','a','of','and','to','is','in','it'], w))) AS c_en,
        |len(list_filter(tok, w -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], w))) AS c_de,
        |len(list_filter(tok, w -> list_contains(['le','la','et','les','des','un','une','est'], w))) AS c_fr,
        |len(list_filter(tok, w -> list_contains(['el','los','las','una','es','en','que','y'], w))) AS c_es
        |FROM t)
        |SELECT doc_id, CASE
        |WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
        |WHEN c_de > 0 AND c_de > c_en AND c_de >= c_fr AND c_de >= c_es THEN 'de'
        |WHEN c_fr > 0 AND c_fr > c_en AND c_fr > c_de AND c_fr >= c_es THEN 'fr'
        |WHEN c_es > 0 AND c_es > c_en AND c_es > c_de AND c_es > c_fr THEN 'es'
        |ELSE 'und' END AS lang_pred FROM c""".stripMargin,
    // mismatch report: the q_langid profile CASE vs the declared lang,
    // counted per source with a floor-scaled rate
    "q_lang_mismatch" ->
      """WITH t AS (SELECT source, lang,
        |  list_transform(string_split_regex(text,'\s+'), w -> lower(w)) AS tok FROM documents),
        |c AS (SELECT source, lang,
        |len(list_filter(tok, w -> list_contains(['the','a','of','and','to','is','in','it'], w))) AS c_en,
        |len(list_filter(tok, w -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], w))) AS c_de,
        |len(list_filter(tok, w -> list_contains(['le','la','et','les','des','un','une','est'], w))) AS c_fr,
        |len(list_filter(tok, w -> list_contains(['el','los','las','una','es','en','que','y'], w))) AS c_es
        |FROM t),
        |p AS (SELECT source, lang, CASE
        |WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
        |WHEN c_de > 0 AND c_de > c_en AND c_de >= c_fr AND c_de >= c_es THEN 'de'
        |WHEN c_fr > 0 AND c_fr > c_en AND c_fr > c_de AND c_fr >= c_es THEN 'fr'
        |WHEN c_es > 0 AND c_es > c_en AND c_es > c_de AND c_es > c_fr THEN 'es'
        |ELSE 'und' END AS pred FROM c)
        |SELECT source, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN pred <> lang THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |  CAST(SUM(CASE WHEN pred <> lang THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
        |    AS mismatch_x1e6
        |FROM p GROUP BY 1""".stripMargin,
    // mirrors languageMix: 50-token windows, the q_langid profile CASE per
    // window, dominant language by (count desc, lang asc)
    "q_language_mix" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text,'\s+') AS wl FROM documents
        |  WHERE len(string_split_regex(text,'\s+')) >= 1),
        |win AS (SELECT doc_id, unnest([array_to_string(wl[i*50+1 : i*50+50], ' ')
        |  for i in range(0, (len(wl)-1)//50 + 1)]) AS wt FROM t),
        |tok AS (SELECT doc_id,
        |  list_transform(string_split_regex(wt,'\s+'), x -> lower(x)) AS tk FROM win),
        |c AS (SELECT doc_id,
        |  len(list_filter(tk, w -> list_contains(['the','a','of','and','to','is','in','it'], w))) AS c_en,
        |  len(list_filter(tk, w -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], w))) AS c_de,
        |  len(list_filter(tk, w -> list_contains(['le','la','et','les','des','un','une','est'], w))) AS c_fr,
        |  len(list_filter(tk, w -> list_contains(['el','los','las','una','es','en','que','y'], w))) AS c_es
        |  FROM tok),
        |wl2 AS (SELECT doc_id, CASE
        |  WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
        |  WHEN c_de > 0 AND c_de > c_en AND c_de >= c_fr AND c_de >= c_es THEN 'de'
        |  WHEN c_fr > 0 AND c_fr > c_en AND c_fr > c_de AND c_fr >= c_es THEN 'fr'
        |  WHEN c_es > 0 AND c_es > c_en AND c_es > c_de AND c_es > c_fr THEN 'es'
        |  ELSE 'und' END AS lang FROM c),
        |lc AS (SELECT doc_id, lang, COUNT(*) AS c FROM wl2 GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tot,
        |  CAST(COUNT(*) AS BIGINT) AS nl FROM lc GROUP BY 1),
        |dom AS (SELECT doc_id, lang, c FROM (
        |  SELECT doc_id, lang, c, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY c DESC, lang ASC) AS rn FROM lc) WHERE rn = 1)
        |SELECT a.doc_id, a.tot AS n_windows, a.nl AS n_langs, d.lang AS dom_lang,
        |  d.c * 1000000 // a.tot AS dom_frac_x1e6
        |FROM agg a JOIN dom d USING (doc_id)""".stripMargin,
    "q_fingerprint" ->
      "SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM documents",
    "q_redact" ->
      """SELECT doc_id, md5(regexp_replace(regexp_replace(regexp_replace(text,
        |  'https?://[^\s]+', '<URL>', 'g'),
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g')) AS fp_redacted FROM documents""".stripMargin,
    "q_subword_count" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text,
        |'[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]+')) AS BIGINT) AS n_subwords FROM documents""".stripMargin,
    "q_choose" ->
      """SELECT o_orderkey AS uid, 'order' AS label FROM orders
        |JOIN customer ON o_custkey = c_custkey WHERE c_acctbal > 5000.0
        |UNION ALL SELECT c_custkey, 'customer' FROM customer WHERE NOT (c_acctbal > 5000.0)""".stripMargin,
    "q_choose_traversal" ->
      """WITH cust AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |SELECT o_orderkey AS uid, 'order' AS label FROM orders
        |JOIN cust ON o_custkey = c_custkey
        |WHERE c_custkey IN (SELECT o_custkey FROM big)
        |UNION ALL SELECT c_custkey, 'customer' FROM cust
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM big)""".stripMargin,
    "q_where_sub" ->
      """SELECT c_custkey AS uid, c_name AS name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,
    "q_where_count" ->
      """SELECT c_custkey AS uid FROM customer
        |WHERE (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) >= 15""".stripMargin,
    "q_where_count_low" ->
      """SELECT c_custkey AS uid FROM customer
        |WHERE (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) <= 8""".stripMargin,
    "q_repeat_until_sub" ->
      """SELECT r_regionkey AS uid, 'region' AS label FROM customer
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey""".stripMargin,
    "q_order_by_degree" ->
      """SELECT uid FROM (
        |  SELECT c_custkey AS uid, count(o_orderkey) AS cnt
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY 1) ORDER BY cnt DESC, uid ASC LIMIT 10""".stripMargin,
    "q_group_by_agg" ->
      """SELECT c_mktsegment AS mktsegment, count(o_orderkey) AS value
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q_select_by" ->
      """SELECT c_name AS a_name, o_totalprice AS b_totalprice FROM customer
        |JOIN orders ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q_project_by" ->
      """SELECT c_custkey AS uid, COUNT(o_orderkey) AS n_orders,
        |CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,2))), 0) AS DOUBLE) AS spend
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q_salted_degree" ->
      "SELECT l_partkey AS uid, COUNT(*) AS cnt FROM lineitem GROUP BY 1",
    "q_properties" ->
      """SELECT c_custkey AS uid, 'name' AS key, c_name AS value FROM customer
        |UNION ALL SELECT c_custkey, 'mktsegment', c_mktsegment FROM customer""".stripMargin,
    "q_events_props" ->
      """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |COUNT(*) AS cnt FROM events GROUP BY 1""".stripMargin,
    "q_interval_join" ->
      """SELECT e.event_id, r.i AS window_id FROM events e JOIN
        |(SELECT i, TIMESTAMP '2024-01-01 00:00:00' + to_hours(CAST(i * 14 AS BIGINT)) AS ws
        | FROM range(50) t(i)) r
        |ON e.ts >= r.ws AND e.ts < r.ws + INTERVAL 2 HOUR""".stripMargin,
    "q_asof" ->
      """SELECT l.event_id,
        |  (SELECT r.event_id FROM events r
        |   WHERE r.user_id = l.user_id AND r.event_type = 'click' AND r.ts < l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS click_id
        |FROM events l WHERE l.event_type = 'purchase'""".stripMargin,
    "q_sessionize" ->
      """WITH o AS (SELECT user_id, ts, event_id,
        |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |s AS (SELECT user_id,
        |  CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > CAST(3600 AS BIGINT) * 1000000 THEN 1 ELSE 0 END AS ns
        |  FROM o)
        |SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM s GROUP BY 1""".stripMargin,
    // session paths: same session ids as q_sessionize, in-session order
    // string_agg'd over the (ts, event_id) total order
    "q_session_paths" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |s AS (SELECT user_id, ts, event_id, event_type,
        |  SUM(CASE WHEN prev IS NULL
        |      OR epoch_us(ts) - epoch_us(prev) > CAST(3600 AS BIGINT) * 1000000
        |    THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |p AS (SELECT user_id, sid,
        |  string_agg(event_type, ' ' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, COUNT(*) AS cnt FROM p GROUP BY 1
        |ORDER BY cnt DESC, path ASC LIMIT 25""".stripMargin,
    // equi-depth: SQL-standard NTILE over the (value, event_id) total order
    "q_equidepth" ->
      """WITH n AS (SELECT event_type, value, event_id,
        |  NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bucket
        |  FROM events)
        |SELECT event_type, CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS cnt,
        |  MIN(value) AS lo, MAX(value) AS hi
        |FROM n GROUP BY 1, 2""".stripMargin,
    // streaming Bloom: the packed word table of the batch filter
    "q_stream_bloom" ->
      """WITH ev AS (SELECT text FROM documents WHERE doc_id % 7 = 0),
        |js AS (SELECT unnest(range(0, 3)) AS j),
        |bp AS (SELECT ('0x' || substr(md5(CAST(j AS VARCHAR) || ':bloom:' || text), 21, 12))::BIGINT % 496 AS p
        |  FROM ev CROSS JOIN js)
        |SELECT p // 62 AS word,
        |  bit_or(1::BIGINT << CAST(p % 62 AS INTEGER)) AS bits FROM bp GROUP BY 1""".stripMargin,
    // streaming HLL: the register table of the batch sketch
    "q_stream_hll" ->
      """WITH hx AS (SELECT
        |  ('0x' || substr(md5('hll:' || CAST(doc_id AS VARCHAR)), 21, 12))::BIGINT AS h
        |  FROM documents WHERE doc_id IS NOT NULL),
        |hw AS (SELECT h % 1024 AS bucket, h // 1024 AS w FROM hx)
        |SELECT bucket, CAST(MAX(CASE WHEN w = 0 THEN 39
        |  ELSE 39 - length(bin(w)) END) AS INTEGER) AS reg
        |FROM hw GROUP BY 1""".stripMargin,
    "q_graph_variables" ->
      """SELECT 'creator' AS vkey, 'graft' AS vval
        |UNION ALL SELECT 'version', '1.0'""".stripMargin,
    "q_catalog_roundtrip" ->
      """SELECT 'edge_label' AS kind, 'contains' AS name, 'MULTI:shipdate' AS detail
        |UNION ALL SELECT 'edge_label', 'in_nation', 'MANY2ONE:'
        |UNION ALL SELECT 'edge_label', 'in_region', 'MANY2ONE:'
        |UNION ALL SELECT 'edge_label', 'placed', 'MULTI:orderdate'
        |UNION ALL SELECT 'edge_label', 'supplied_by', 'MULTI:'
        |UNION ALL SELECT 'vertex_label', 'customer', 'static=false,ttl=0'
        |UNION ALL SELECT 'vertex_label', 'nation', 'static=false,ttl=0'
        |UNION ALL SELECT 'vertex_label', 'order', 'static=false,ttl=0'
        |UNION ALL SELECT 'vertex_label', 'part', 'static=false,ttl=0'
        |UNION ALL SELECT 'vertex_label', 'region', 'static=true,ttl=604800'
        |UNION ALL SELECT 'vertex_label', 'supplier', 'static=false,ttl=0'
        |UNION ALL SELECT 'relation_index', 'containsByShip', 'contains:shipdate'
        |UNION ALL SELECT 'relation_index', 'placedByDate', 'placed:orderdate'
        |UNION ALL SELECT 'index', 'byName', 'name'
        |UNION ALL SELECT 'index', 'byUid', 'uid'
        |UNION ALL SELECT 'stat', 'vertices', CAST(
        |  (SELECT COUNT(*) FROM region) + (SELECT COUNT(*) FROM nation)
        |  + (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
        |  + (SELECT COUNT(*) FROM part) + (SELECT COUNT(*) FROM orders) AS VARCHAR)
        |UNION ALL SELECT 'stat', 'edges', CAST(
        |  (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM customer)
        |  + (SELECT COUNT(*) FROM supplier) + (SELECT COUNT(*) FROM orders)
        |  + 2 * (SELECT COUNT(*) FROM lineitem) AS VARCHAR)""".stripMargin,
    "q_auto_schema" ->
      """WITH vc AS (SELECT column_name AS name,
        |  CASE column_type WHEN 'VARCHAR' THEN 'string' WHEN 'INTEGER' THEN 'int'
        |    ELSE lower(column_type) END AS dtype
        |  FROM (DESCRIBE SELECT * FROM customer))
        |SELECT 'property' AS kind, name, dtype FROM vc WHERE name <> 'c_custkey'
        |UNION ALL SELECT 'property', 'o_totalprice', 'double'
        |UNION ALL SELECT 'vertex_label', 'customer', '-'
        |UNION ALL SELECT 'edge_label', 'placed', '-'
        |UNION ALL SELECT 'stat', 'building_customers',
        |  CAST((SELECT COUNT(*) FROM customer WHERE c_mktsegment = 'BUILDING') AS VARCHAR)
        |UNION ALL SELECT 'stat', 'violations', '0'""".stripMargin,
    "q_repeat_nested" ->
      """SELECT r_regionkey AS uid, 'region' AS label
        |FROM region
        |JOIN nation n1 ON n1.n_regionkey = r_regionkey
        |JOIN nation n2 ON n2.n_regionkey = r_regionkey""".stripMargin,
    "q_group_by_key_sub" ->
      """WITH oc AS (SELECT c_custkey,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o WHERE o.o_custkey = c_custkey) AS n_orders
        |  FROM customer)
        |SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers FROM oc GROUP BY 1""".stripMargin,
    "q_schema_maker_write" ->
      """SELECT 'key' AS kind, 'vip' AS name, 'boolean' AS dtype
        |UNION ALL SELECT 'stat', 'vip_true',
        |  CAST((SELECT COUNT(*) FROM customer WHERE c_acctbal > 9500) AS VARCHAR)
        |UNION ALL SELECT 'stat', 'vertices',
        |  CAST((SELECT COUNT(*) FROM customer) +
        |       (SELECT COUNT(*) FROM customer WHERE c_acctbal > 9000) AS VARCHAR)""".stripMargin,
    "q_stream_mutations" ->
      """SELECT 'v' AS kind, 'region' AS label, COUNT(*) AS cnt FROM region
        |UNION ALL SELECT 'v', 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'v', 'customer', COUNT(*) FROM customer
        |UNION ALL SELECT 'v', 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'v', 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'v', 'order', COUNT(*) FROM orders
        |UNION ALL SELECT 'v', 'event',
        |  (SELECT COUNT(*) FROM events WHERE event_type <> 'error')
        |UNION ALL SELECT 'e', 'in_region', COUNT(*) FROM nation
        |UNION ALL SELECT 'e', 'in_nation',
        |  (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
        |UNION ALL SELECT 'e', 'placed', COUNT(*) FROM orders
        |UNION ALL SELECT 'e', 'contains', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'e', 'supplied_by', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'e', 'by_user',
        |  (SELECT COUNT(*) FROM events WHERE event_type <> 'error')""".stripMargin,
    "q_change_sessionize" ->
      """WITH o AS (SELECT user_id, ts, event_id,
        |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |s AS (SELECT user_id, ts, event_id,
        |  CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > CAST(3600 AS BIGINT) * 1000000 THEN 1 ELSE 0 END AS ns
        |  FROM o),
        |t AS (SELECT user_id, ts,
        |  SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |  FROM s),
        |sess AS (SELECT user_id, sid, CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM t GROUP BY 1, 2)
        |SELECT user_id, session_start_us, n_events
        |FROM sess QUALIFY sid < MAX(sid) OVER (PARTITION BY user_id)""".stripMargin,
    "q_tix_indexing" ->
      """WITH t AS (SELECT CAST(x.range AS BIGINT) AS i, CAST(x.range % 5 AS BIGINT) AS cat,
        |  CAST(x.range % 10 AS BIGINT) AS grp, CAST(x.range % 4 AS BIGINT) AS wk,
        |  CAST(x.range AS BIGINT) AS tm,
        |  (CASE WHEN x.range % 2 = 0 THEN 1.0 ELSE -1.0 END) * x.range * 0.5 AS off
        | FROM range(100) x),
        |td AS (SELECT *, 2*6371.0087714*asin(sqrt(pow(sin(radians(off)/2),2)*(1.0+cos(radians(off))))) AS dist FROM t),
        |u AS (SELECT * FROM td WHERE i < 88),
        |iba AS (SELECT CAST(v.b AS BIGINT) AS b FROM (VALUES (0),(10),(20),(30),(40)) v(b)),
        |ibb AS (SELECT CAST(v.b AS BIGINT) AS b FROM (VALUES (0),(8),(16),(24),(32),(40)) v(b)),
        |gba AS (SELECT CAST(v.b AS BIGINT) AS b,
        |  2*6371.0087714*asin(sqrt(pow(sin(radians(v.b*0.5)/2),2)*(1.0+cos(radians(v.b*0.5)))))+20 AS rad
        |  FROM (VALUES (0),(20),(40),(60),(80),(90)) v(b)),
        |gbb AS (SELECT CAST(v.b AS BIGINT) AS b,
        |  2*6371.0087714*asin(sqrt(pow(sin(radians(v.b*0.5)/2),2)*(1.0+cos(radians(v.b*0.5)))))+20 AS rad
        |  FROM (VALUES (0),(30),(60),(80)) v(b)),
        |r19 AS (SELECT 2*6371.0087714*asin(sqrt(pow(sin(radians(9.5)/2),2)*(1.0+cos(radians(9.5)))))+20 AS rad)
        |SELECT 'va_c_world' AS caze, count(*) AS n, CAST(0 AS BIGINT) AS s FROM td WHERE wk=0
        |UNION ALL SELECT 'ea_c_world', count(*), 0 FROM td WHERE wk=0
        |UNION ALL SELECT 'va_c_aurelius', count(*), 0 FROM td WHERE wk=1
        |UNION ALL SELECT 'ea_c_aurelius', count(*), 0 FROM td WHERE wk=1
        |UNION ALL SELECT 'va_c_titan', count(*), 0 FROM td WHERE wk=2
        |UNION ALL SELECT 'ea_c_titan', count(*), 0 FROM td WHERE wk=2
        |UNION ALL SELECT 'va_c_graph', count(*), 0 FROM td WHERE wk=3
        |UNION ALL SELECT 'ea_c_graph', count(*), 0 FROM td WHERE wk=3
        |UNION ALL SELECT 'va_world_t_asc', count(*), CAST(SUM(tm) AS BIGINT)
        |  FROM (SELECT tm FROM td WHERE wk=0 ORDER BY tm LIMIT 5)
        |UNION ALL SELECT 'va_world_t_desc', count(*), CAST(SUM(tm) AS BIGINT)
        |  FROM (SELECT tm FROM td WHERE wk=0 ORDER BY tm DESC LIMIT 5)
        |UNION ALL SELECT 'va_world_cat_asc', count(*), CAST(SUM(tm) AS BIGINT)
        |  FROM (SELECT tm FROM td WHERE wk=0 ORDER BY cat LIMIT 5)
        |UNION ALL SELECT 'va_world_cat_desc', count(*), CAST(SUM(tm) AS BIGINT)
        |  FROM (SELECT tm FROM td WHERE wk=0 ORDER BY cat DESC LIMIT 5)
        |UNION ALL SELECT 'va_grp3_t_asc3', count(*), CAST(SUM(tm) AS BIGINT)
        |  FROM (SELECT tm FROM td WHERE grp=3 ORDER BY tm LIMIT 3)
        |UNION ALL SELECT 'ea_grp3_t_desc3', count(*), CAST(SUM(tm) AS BIGINT)
        |  FROM (SELECT tm FROM td WHERE grp=3 ORDER BY tm DESC LIMIT 3)
        |UNION ALL SELECT 'va_int_' || CAST(iba.b AS VARCHAR),
        |  CAST(SUM(CASE WHEN td.tm >= iba.b AND td.tm < 2*iba.b THEN 1 ELSE 0 END) AS BIGINT), 0
        |  FROM iba CROSS JOIN td GROUP BY iba.b
        |UNION ALL SELECT 'ea_int_' || CAST(iba.b AS VARCHAR),
        |  CAST(SUM(CASE WHEN td.tm >= iba.b AND td.tm < 2*iba.b THEN 1 ELSE 0 END) AS BIGINT), 0
        |  FROM iba CROSS JOIN td GROUP BY iba.b
        |UNION ALL SELECT 'va_geo_' || CAST(gba.b AS VARCHAR),
        |  CAST(SUM(CASE WHEN td.dist <= gba.rad THEN 1 ELSE 0 END) AS BIGINT), 0
        |  FROM gba CROSS JOIN td GROUP BY gba.b
        |UNION ALL SELECT 'ea_geo_' || CAST(gba.b AS VARCHAR),
        |  CAST(SUM(CASE WHEN td.dist <= gba.rad THEN 1 ELSE 0 END) AS BIGINT), 0
        |  FROM gba CROSS JOIN td GROUP BY gba.b
        |UNION ALL SELECT 'va_cat1_int', count(*), 0 FROM td WHERE cat=1 AND tm>=10 AND tm<28
        |UNION ALL SELECT 'ea_cat1_int', count(*), 0 FROM td WHERE cat=1 AND tm>=10 AND tm<28
        |UNION ALL SELECT 'va_t1030_world', count(*), 0 FROM td WHERE tm>=10 AND tm<30 AND wk=0
        |UNION ALL SELECT 'va_geo19_world', count(*), 0 FROM td, r19 WHERE td.dist <= r19.rad AND wk=0
        |UNION ALL SELECT 'va_all', count(*), 0 FROM td
        |UNION ALL SELECT 'ea_all', count(*), 0 FROM td
        |UNION ALL SELECT 'vb_c_world', count(*), 0 FROM u WHERE wk=0
        |UNION ALL SELECT 'eb_c_world', count(*), 0 FROM u WHERE wk=0
        |UNION ALL SELECT 'vb_c_aurelius', count(*), 0 FROM u WHERE wk=1
        |UNION ALL SELECT 'eb_c_aurelius', count(*), 0 FROM u WHERE wk=1
        |UNION ALL SELECT 'vb_c_titan', count(*), 0 FROM u WHERE wk=2
        |UNION ALL SELECT 'eb_c_titan', count(*), 0 FROM u WHERE wk=2
        |UNION ALL SELECT 'vb_c_graph', count(*), 0 FROM u WHERE wk=3
        |UNION ALL SELECT 'eb_c_graph', count(*), 0 FROM u WHERE wk=3
        |UNION ALL SELECT 'vb_int_' || CAST(ibb.b AS VARCHAR),
        |  CAST(SUM(CASE WHEN u.tm >= ibb.b AND u.tm < 2*ibb.b THEN 1 ELSE 0 END) AS BIGINT), 0
        |  FROM ibb CROSS JOIN u GROUP BY ibb.b
        |UNION ALL SELECT 'eb_int_' || CAST(ibb.b AS VARCHAR),
        |  CAST(SUM(CASE WHEN u.tm >= ibb.b AND u.tm < 2*ibb.b THEN 1 ELSE 0 END) AS BIGINT), 0
        |  FROM ibb CROSS JOIN u GROUP BY ibb.b
        |UNION ALL SELECT 'vb_geo_' || CAST(gbb.b AS VARCHAR),
        |  CAST(SUM(CASE WHEN u.dist <= gbb.rad THEN 1 ELSE 0 END) AS BIGINT), 0
        |  FROM gbb CROSS JOIN u GROUP BY gbb.b
        |UNION ALL SELECT 'eb_geo_' || CAST(gbb.b AS VARCHAR),
        |  CAST(SUM(CASE WHEN u.dist <= gbb.rad THEN 1 ELSE 0 END) AS BIGINT), 0
        |  FROM gbb CROSS JOIN u GROUP BY gbb.b
        |UNION ALL SELECT 'vb_t1030_world', count(*), 0 FROM u WHERE tm>=10 AND tm<30 AND wk=0
        |UNION ALL SELECT 'vb_geo19_world', count(*), 0 FROM u, r19 WHERE u.dist <= r19.rad AND wk=0
        |UNION ALL SELECT 'vb_all', count(*), 0 FROM u
        |UNION ALL SELECT 'eb_all', count(*), 0 FROM u""".stripMargin,
    "q_tix_params" ->
      """WITH t AS (SELECT CAST(x.range % 4 AS BIGINT) AS wk FROM range(1000) x),
        |f AS (SELECT 'c_ducks' AS c, count(*) AS n FROM t WHERE wk IN (1,2)
        | UNION ALL SELECT 'c_farm', count(*) FROM t WHERE wk IN (0,1)
        | UNION ALL SELECT 'c_beautiful', count(*) FROM t WHERE wk = 2
        | UNION ALL SELECT 'cp_beauti', count(*) FROM t WHERE wk = 2
        | UNION ALL SELECT 'cr_berry', count(*) FROM t WHERE wk = 0
        | UNION ALL SELECT 'c_lolipop', count(*) FROM t WHERE FALSE
        | UNION ALL SELECT 'eq_s1', count(*) FROM t WHERE wk = 1
        | UNION ALL SELECT 'neq_s2', count(*) FROM t WHERE wk <> 2
        | UNION ALL SELECT 'eq_farm', count(*) FROM t WHERE FALSE
        | UNION ALL SELECT 'p_ducks', count(*) FROM t WHERE wk = 2
        | UNION ALL SELECT 'r_ducks', count(*) FROM t WHERE wk IN (1,2))
        |SELECT 'v_' || c AS caze, n FROM f
        |UNION ALL SELECT 'e_' || c, n FROM f
        |UNION ALL SELECT 'p_' || c, n FROM f""".stripMargin,
    "q_tix_raw" ->
      """WITH t AS (SELECT CAST(x.range % 4 AS BIGINT) AS wk FROM range(1000) x),
        |f AS (SELECT 'ducks' AS c, count(*) AS n FROM t WHERE wk IN (1,2)
        | UNION ALL SELECT 'farm3', count(*) FROM t WHERE wk IN (0,1)
        | UNION ALL SELECT 'and_phrase', count(*) FROM t WHERE wk = 0
        | UNION ALL SELECT 'bad', count(*) FROM t WHERE wk IN (1,2)
        | UNION ALL SELECT 'bad_off10', count(*)
        |   FROM (SELECT 1 FROM t WHERE wk IN (1,2) OFFSET 10)
        | UNION ALL SELECT 'bad_lim10', count(*)
        |   FROM (SELECT 1 FROM t WHERE wk IN (1,2) LIMIT 10)
        | UNION ALL SELECT 'bad_lim10_off10', count(*)
        |   FROM (SELECT 1 FROM t WHERE wk IN (1,2) LIMIT 10 OFFSET 10)
        | UNION ALL SELECT 'bad_off1000', count(*)
        |   FROM (SELECT 1 FROM t WHERE wk IN (1,2) LIMIT 10 OFFSET 1000))
        |SELECT 'rqv_' || c AS caze, n FROM f
        |UNION ALL SELECT 'rqe_' || c, n FROM f
        |UNION ALL SELECT 'rqp_' || c, n FROM f
        |UNION ALL SELECT 'rqv_xtext', count(*) FROM t WHERE wk IN (1,2)
        |UNION ALL SELECT 'rqv_text_raw', count(*) FROM t WHERE FALSE
        |UNION ALL SELECT 'rqv_elemid', count(*) FROM t WHERE wk IN (1,2)
        |UNION ALL SELECT 'rqx_v_xtext', count(*) FROM t WHERE wk IN (1,2)
        |UNION ALL SELECT 'rqx_e_xtext', count(*) FROM t WHERE FALSE
        |UNION ALL SELECT 'rqe_text_raw', count(*) FROM t WHERE wk IN (1,2)
        |UNION ALL SELECT 'rqp_text_raw', count(*) FROM t WHERE wk IN (1,2)""".stripMargin,
    "q_tix_small" ->
      """WITH bo AS (SELECT * FROM (VALUES (1,true),(2,false)) t(id,vis)),
        |dt AS (SELECT * FROM (VALUES (1, TIMESTAMP '1970-01-01 00:00:00.001'),
        |                             (2, TIMESTAMP '1970-01-01 00:00:02')) t(id,ts)),
        |uu AS (SELECT * FROM (VALUES (1,'6ccd780c-baba-1026-9564-5b8c656024db'),
        |                             (2,'16fd2706-8baf-433b-82eb-8c7fada847da')) t(id,uid)),
        |dm1 AS (SELECT id, nm, list_filter(string_split_regex(lower(nm),'[^a-z0-9]+'), x -> length(x)>1) AS tok
        |  FROM (VALUES (1,'Long John Don'),(2,'Long Little Lewis'),(3,'Middle Sister Mabel')) t(id,nm)),
        |dm2 AS (SELECT id, nm, list_filter(string_split_regex(lower(coalesce(nm,'')),'[^a-z0-9]+'), x -> length(x)>1) AS tok
        |  FROM (VALUES (2,'Big Brother Bob'),(3,CAST(NULL AS VARCHAR))) t(id,nm)),
        |sc AS (SELECT id, len(list_filter(string_split_regex(lower(txt),'[^a-z0-9]+'), x -> length(x)>1)) AS nt
        |  FROM (VALUES (1,'Hello Hello Hello Hello Hello Hello Hello Hello'),
        |    (2,'Hello abab abab fsdfsd sfdfsd sdffs fsdsdf fdf fsdfsd aera fsad abab abab fsdfsd sfdf'),
        |    (3,'Hello')) t(id,txt)),
        |cm AS (SELECT id, nm, list_filter(string_split_regex(lower(nm),'[^a-z0-9]+'), x -> length(x)>1) AS tok
        |  FROM (VALUES (1,'hercules was here')) t(id,nm))
        |SELECT 'su1_marko_v' AS caze, CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS ids
        |UNION ALL SELECT 'su1_hulu_e', 1, 10
        |UNION ALL SELECT 'su2_marko_v', 1, 1
        |UNION ALL SELECT 'su2_rubu_e', 1, 10
        |UNION ALL SELECT 'su2_hulu_e', 0, 0
        |UNION ALL SELECT 'b_eq_true', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM bo WHERE vis
        |UNION ALL SELECT 'b_eq_false', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM bo WHERE NOT vis
        |UNION ALL SELECT 'b_neq_true', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM bo WHERE vis <> true
        |UNION ALL SELECT 'b_neq_false', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM bo WHERE vis <> false
        |UNION ALL SELECT 'b_all', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM bo
        |UNION ALL SELECT 'dt_eq', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dt WHERE ts = TIMESTAMP '1970-01-01 00:00:00.001'
        |UNION ALL SELECT 'dt_gt', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dt WHERE ts > TIMESTAMP '1970-01-01 00:00:00.001'
        |UNION ALL SELECT 'dt_gte', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dt WHERE ts >= TIMESTAMP '1970-01-01 00:00:00.001'
        |UNION ALL SELECT 'dt_lt', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dt WHERE ts < TIMESTAMP '1970-01-01 00:00:02'
        |UNION ALL SELECT 'dt_lte', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dt WHERE ts <= TIMESTAMP '1970-01-01 00:00:02'
        |UNION ALL SELECT 'dt_neq', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dt WHERE ts <> TIMESTAMP '1970-01-01 00:00:00.001'
        |UNION ALL SELECT 'uu_eq1', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM uu WHERE uid = '6ccd780c-baba-1026-9564-5b8c656024db'
        |UNION ALL SELECT 'uu_eq2', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM uu WHERE uid = '16fd2706-8baf-433b-82eb-8c7fada847da'
        |UNION ALL SELECT 'uu_neq1', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM uu WHERE uid <> '6ccd780c-baba-1026-9564-5b8c656024db'
        |UNION ALL SELECT 'uu_neq2', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM uu WHERE uid <> '16fd2706-8baf-433b-82eb-8c7fada847da'
        |UNION ALL SELECT 'dm1_eq_ljd', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm1 WHERE nm = 'Long John Don'
        |UNION ALL SELECT 'dm1_c_long', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm1 WHERE list_contains(tok,'long')
        |UNION ALL SELECT 'dm1_c_long_don', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm1 WHERE list_contains(tok,'long') AND list_contains(tok,'don')
        |UNION ALL SELECT 'dm1_cp_lon', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm1 WHERE len(list_filter(tok, x -> starts_with(x,'lon')))>0
        |UNION ALL SELECT 'dm1_cr_litle', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm1 WHERE len(list_filter(tok, x -> regexp_full_match(x,'[Ll]it*le')))>0
        |UNION ALL SELECT 'dm1_r_long', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm1 WHERE regexp_full_match(nm,'Long.*')
        |UNION ALL SELECT 'dm1_p_middle', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm1 WHERE starts_with(nm,'Middle')
        |UNION ALL SELECT 'dm2_c_long', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm2 WHERE list_contains(tok,'long')
        |UNION ALL SELECT 'dm2_c_big', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm2 WHERE list_contains(tok,'big')
        |UNION ALL SELECT 'dm2_p_big', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm2 WHERE starts_with(nm,'Big')
        |UNION ALL SELECT 'dm2_p_middle', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM dm2 WHERE starts_with(nm,'Middle')
        |UNION ALL SELECT 'sc_distinct', CAST(count(DISTINCT 1.0+0.001/(nt+10)) AS BIGINT), CAST(sum(id) AS BIGINT) FROM sc
        |UNION ALL SELECT 'cm_contains', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM cm WHERE list_contains(tok,'hercules') AND list_contains(tok,'here')
        |UNION ALL SELECT 'cm_value', count(*), CAST(coalesce(sum(id),0) AS BIGINT) FROM cm WHERE list_contains(tok,'hercules') AND list_contains(tok,'here') AND nm = 'hercules was here'
        |UNION ALL SELECT 'wc_t1', 1, 1
        |UNION ALL SELECT 'wc_t2', 1, 1""".stripMargin,
    "q_tp_globalindex_seeded" ->
      """WITH an AS (SELECT CAST(x.range AS BIGINT) AS k,
        |    (CAST(1103515245 AS BIGINT)*7 + CAST(x.range AS BIGINT)*12347) % 100 AS a FROM range(12) x),
        |base AS (SELECT CAST(x.range AS BIGINT) AS i, CAST(x.range % 10 AS BIGINT) AS w2,
        |    CAST(x.range % 2 AS BIGINT) AS par, CAST(x.range % 4 AS BIGINT) AS wrd FROM range(100) x)
        |SELECT 'sgx_classes' AS caze,
        |  CAST((SELECT count(DISTINCT a%2) FROM an)*100 + (SELECT count(DISTINCT a%4) FROM an) AS BIGINT) AS n,
        |  CAST(0 AS BIGINT) AS ws2
        |UNION ALL SELECT 'sgx_time_in', CAST(count(*) AS BIGINT), CAST(coalesce(sum(b.w2),0) AS BIGINT)
        |  FROM base b WHERE b.i IN (SELECT a FROM an)
        |UNION ALL SELECT 'sgx_time_in_person', CAST(count(*) AS BIGINT), CAST(coalesce(sum(b.w2),0) AS BIGINT)
        |  FROM base b WHERE b.i IN (SELECT a FROM an) AND b.par = 0
        |UNION ALL SELECT concat('sgx_e_t', CAST(an.k AS VARCHAR)), CAST(2 AS BIGINT),
        |  CAST(an.a % 10 + CAST(2*fmod((an.a % 10)*0.5 + 1.0, 5.0) AS BIGINT) AS BIGINT) FROM an
        |UNION ALL SELECT concat('sgx_v_txt', CAST(an.k AS VARCHAR)), CAST(count(b.i) AS BIGINT),
        |  CAST(coalesce(sum(b.w2),0) AS BIGINT)
        |  FROM an LEFT JOIN base b ON b.wrd = an.a % 4 AND b.i >= an.a GROUP BY an.k""".stripMargin,
    "q_tp_relindex_seeded" ->
      """WITH an AS (SELECT CAST(x.range AS BIGINT) AS k,
        |    (CAST(1103515245 AS BIGINT)*7 + CAST(x.range AS BIGINT)*12347) % 100 AS a FROM range(12) x),
        |base AS (SELECT CAST(x.range AS BIGINT) AS i, (CAST(x.range AS BIGINT) + 77) % 100 AS tm,
        |    CAST(x.range % 10 AS BIGINT) AS w2 FROM range(100) x),
        |tops AS (SELECT an.k, b.w2, row_number() OVER (PARTITION BY an.k ORDER BY b.w2 DESC) AS rn
        |    FROM an JOIN base b ON b.tm >= an.a AND b.tm < an.a + 10)
        |SELECT 'srx_classes' AS caze, CAST((SELECT count(DISTINCT a%10) FROM an) AS BIGINT) AS n,
        |  CAST(0 AS BIGINT) AS ws2
        |UNION ALL SELECT concat('srx_int', CAST(an.k AS VARCHAR)), CAST(count(b.i) AS BIGINT),
        |  CAST(coalesce(sum(b.w2),0) AS BIGINT)
        |  FROM an LEFT JOIN base b ON b.tm >= an.a AND b.tm < an.a + 10 GROUP BY an.k
        |UNION ALL SELECT concat('srx_top', CAST(k AS VARCHAR)),
        |  CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN rn <= 3 THEN w2 END), 0) AS BIGINT) FROM tops GROUP BY k""".stripMargin,
    "q_tix_indexing_seeded" ->
      """WITH an AS (SELECT CAST(x.range AS BIGINT) AS k,
        |    (CAST(1103515245 AS BIGINT)*7 + CAST(x.range AS BIGINT)*12347) % 100 AS a FROM range(12) x),
        |base AS (SELECT CAST(x.range AS BIGINT) AS i, CAST(x.range % 4 AS BIGINT) AS wrd FROM range(100) x)
        |SELECT 'stx_classes' AS caze, CAST((SELECT count(DISTINCT a%4) FROM an) AS BIGINT) AS n,
        |  CAST(0 AS BIGINT) AS s
        |UNION ALL SELECT concat('stx_int', CAST(an.k AS VARCHAR)), CAST(count(b.i) AS BIGINT),
        |  CAST(coalesce(sum(b.i),0) AS BIGINT)
        |  FROM an LEFT JOIN base b ON b.i >= an.a AND b.i < 2*an.a GROUP BY an.k
        |UNION ALL SELECT concat('stx_w', CAST(an.k AS VARCHAR)), CAST(count(b.i) AS BIGINT),
        |  CAST(coalesce(sum(b.i),0) AS BIGINT)
        |  FROM an LEFT JOIN base b ON b.wrd = an.a % 4 AND b.i >= an.a GROUP BY an.k""".stripMargin,
    "q_ps_repeat_match_pop" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i FROM range(1, 61) x)
        |SELECT 'mr_survivors' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(coalesce(sum(i+2),0) AS BIGINT) AS s
        |  FROM v WHERE i <= 58 AND (i+1)%7 <> 3 AND (i+2)%7 <> 3
        |UNION ALL SELECT 'mr_origins', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT)
        |  FROM v WHERE i <= 58 AND (i+1)%7 <> 3 AND (i+2)%7 <> 3
        |UNION ALL SELECT 'pop_first', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM v WHERE i <= 57
        |UNION ALL SELECT 'pop_last', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i+3),0) AS BIGINT) FROM v WHERE i <= 57
        |UNION ALL SELECT 'select_last_default', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i+3),0) AS BIGINT) FROM v WHERE i <= 57
        |UNION ALL SELECT 'b_plain', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i+2),0) AS BIGINT) FROM v WHERE i <= 58
        |UNION ALL SELECT 'b_barrier', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i+2),0) AS BIGINT) FROM v WHERE i <= 58
        |UNION ALL SELECT 'b_dedup_plain', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i+1),0) AS BIGINT) FROM v WHERE i <= 59
        |UNION ALL SELECT 'b_dedup_barrier', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i+1),0) AS BIGINT) FROM v WHERE i <= 59""".stripMargin,
    "q_ps_pop_all" ->
      """SELECT concat(CAST(x.range AS VARCHAR), ',', CAST(x.range+1 AS VARCHAR), ',',
        |  CAST(x.range+2 AS VARCHAR), ',', CAST(x.range+3 AS VARCHAR)) AS x_ids
        |FROM range(1, 58) x""".stripMargin,
    "q_ps_where_pop" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i FROM range(1, 61) x),
        |e AS (SELECT i AS s, i+1 AS d FROM v WHERE i <= 59
        |      UNION ALL SELECT i, i FROM v WHERE i % 5 = 0),
        |p AS (SELECT e1.s AS v0, e1.d AS v1, e2.d AS v2
        |      FROM e e1 JOIN e e2 ON e2.s = e1.d)
        |SELECT 'wp_first_eq_last' AS caze, CAST(count(*) AS BIGINT) AS n,
        |       CAST(coalesce(sum(v2),0) AS BIGINT) AS s FROM p WHERE v0 = v2
        |UNION ALL SELECT 'wp_first_neq_last', CAST(count(*) AS BIGINT),
        |       CAST(coalesce(sum(v2),0) AS BIGINT) FROM p WHERE v0 <> v2
        |UNION ALL SELECT 'wp_last_default', CAST(count(*) AS BIGINT),
        |       CAST(coalesce(sum(v2),0) AS BIGINT) FROM p WHERE v1 = v2
        |UNION ALL SELECT 'wp_first_explicit', CAST(count(*) AS BIGINT),
        |       CAST(coalesce(sum(v2),0) AS BIGINT) FROM p WHERE v0 = v2
        |UNION ALL SELECT 'wp_filtered_pop_all', CAST(count(*) AS BIGINT),
        |       CAST(coalesce(sum(length(CAST(v0 AS VARCHAR) || ',' || CAST(v1 AS VARCHAR) || ',' || CAST(v2 AS VARCHAR))),0) AS BIGINT)
        |       FROM p WHERE v0 = v2""".stripMargin,
    "q_ps_where_by" ->
      """SELECT 'wb_lt' AS caze, CAST(count(*) AS BIGINT) AS n,
        |       CAST(coalesce(sum(o2.o_orderkey),0) AS BIGINT) AS s
        |FROM orders o1 JOIN orders o2 ON o1.o_custkey = o2.o_custkey
        |WHERE o1.o_totalprice < o2.o_totalprice
        |UNION ALL SELECT 'wb_eq_seg', CAST(count(*) AS BIGINT),
        |       CAST(coalesce(sum(c2.c_custkey),0) AS BIGINT)
        |FROM customer c1 JOIN customer c2 ON c1.c_nationkey = c2.c_nationkey
        |WHERE c1.c_mktsegment = c2.c_mktsegment AND c1.c_custkey <> c2.c_custkey""".stripMargin,
    "q_ps_dedup_labels" ->
      """SELECT 'dl_pairs_all' AS caze, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(l_orderkey + l_partkey) AS BIGINT) AS s FROM lineitem
        |UNION ALL SELECT 'dl_pairs', CAST(count(*) AS BIGINT), CAST(sum(o + p) AS BIGINT)
        |  FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
        |UNION ALL SELECT 'dl_a', CAST(count(*) AS BIGINT), CAST(sum(o) AS BIGINT)
        |  FROM (SELECT DISTINCT l_orderkey AS o FROM lineitem)""".stripMargin,
    "q_ps_repeat_where" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i FROM range(1, 61) x)
        |SELECT 'rw_wheresub' AS caze, CAST(count(*) AS BIGINT) AS n,
        |       CAST(coalesce(sum(i),0) AS BIGINT) AS s FROM v WHERE i >= 3 AND i <= 59
        |UNION ALL SELECT 'rw_wherenot', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |UNION ALL SELECT 'rw_wherecount', CAST(count(*) AS BIGINT),
        |       CAST(coalesce(sum(i),0) AS BIGINT) FROM v WHERE i >= 3 AND i <= 59""".stripMargin,
    "q_ps_sack_choose" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i FROM range(1, 61) x),
        |bt AS (SELECT i+2 AS id, i+100 AS k FROM v WHERE i % 2 = 0 AND i <= 58),
        |bf AS (SELECT i+1 AS id, i+100 AS k FROM v WHERE i % 2 = 1 AND i <= 59),
        |m1 AS (SELECT id, sum(k) AS k FROM (SELECT * FROM bt UNION ALL SELECT * FROM bf) GROUP BY id),
        |o0 AS (SELECT i+1 AS id, i+100 AS k FROM v WHERE i % 3 = 0 AND i <= 59),
        |o1 AS (SELECT i+2 AS id, i+100 AS k FROM v WHERE i % 3 = 1 AND i <= 58),
        |onn AS (SELECT i+1 AS id, i+100 AS k FROM v WHERE i % 3 = 2 AND i <= 59),
        |m2 AS (SELECT id, sum(k) AS k FROM (SELECT * FROM o0 UNION ALL SELECT * FROM o1 UNION ALL SELECT * FROM onn) GROUP BY id),
        |m3 AS (SELECT id, sum(k) AS k FROM (SELECT * FROM o0 UNION ALL SELECT * FROM o1) GROUP BY id)
        |SELECT 'scp_sum' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS s FROM m1
        |UNION ALL SELECT 'scp_opt_sum', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT) FROM m2
        |UNION ALL SELECT 'scp_opt_drop', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT) FROM m3""".stripMargin,
    "q_ps_sack_union_merge" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i FROM range(1, 61) x),
        |e AS (SELECT i AS s, i+1 AS d FROM v WHERE i <= 59),
        |b1 AS (SELECT d AS id, s+100 AS k FROM e),
        |b2 AS (SELECT e2.d AS id, e1.s+100 AS k FROM e e1 JOIN e e2 ON e2.s = e1.d),
        |ub AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
        |ms AS (SELECT id, sum(k) AS k FROM ub GROUP BY id),
        |mm AS (SELECT id, max(k) AS k FROM ub GROUP BY id)
        |SELECT 'su_sum' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS s FROM ms
        |UNION ALL SELECT 'su_max', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT) FROM mm
        |UNION ALL SELECT 'su_split_only', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT) FROM ub
        |UNION ALL SELECT 'su_as_no_merge', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT) FROM ub""".stripMargin,
    "q_ps_local_nested_group" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i, CAST(x.range AS BIGINT) % 7 AS m FROM range(1, 61) x),
        |e AS (SELECT i AS s, i+1 AS d FROM v WHERE i <= 59
        |      UNION ALL SELECT CAST(x.range AS BIGINT)*4, CAST(x.range AS BIGINT)*4+8 FROM range(1, 14) x),
        |pairs AS (SELECT e.s AS src, vm.m AS m FROM e JOIN v vm ON vm.i = e.d),
        |gmap AS (SELECT m, count(*) AS c FROM pairs GROUP BY m),
        |loc AS (SELECT src, m, count(*) AS c FROM pairs GROUP BY src, m),
        |nest AS (SELECT src % 3 AS kcls, m, sum(c) AS c FROM loc GROUP BY 1, 2)
        |SELECT 'ng_global' AS caze, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(c*(m+1)) AS BIGINT) AS s, CAST(0 AS BIGINT) AS s2 FROM gmap
        |UNION ALL SELECT 'ng_local', CAST(count(*) AS BIGINT),
        |       CAST(sum(c) AS BIGINT), CAST(sum(src*c) AS BIGINT) FROM loc
        |UNION ALL SELECT 'ng_nested', CAST(count(*) AS BIGINT),
        |       CAST(sum(c) AS BIGINT), CAST(sum(c*(kcls*10+m)) AS BIGINT) FROM nest""".stripMargin,
    "q_ps_group_nested" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i FROM range(1, 61) x),
        |e AS (SELECT i AS s, i+1 AS d FROM v WHERE i <= 59
        |      UNION ALL SELECT CAST(x.range AS BIGINT)*4, CAST(x.range AS BIGINT)*4+8 FROM range(1, 14) x),
        |p AS (SELECT e.s AS src, e.d AS dst, e.s % 3 AS k, e.d % 7 AS m FROM e),
        |gc AS (SELECT k, m, count(*) AS c FROM p GROUP BY 1, 2),
        |gs AS (SELECT k, m, sum(dst) AS c FROM p GROUP BY 1, 2),
        |ct AS (SELECT k, count(*) AS c FROM p GROUP BY 1)
        |SELECT 'gn_count' AS caze, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(c*(k*100+m+1)) AS BIGINT) AS s FROM gc
        |UNION ALL SELECT 'gn_sum', CAST(count(*) AS BIGINT),
        |       CAST(sum(c*(k*100+m+1)) AS BIGINT) FROM gs
        |UNION ALL SELECT 'gn_ctrl', CAST(count(*) AS BIGINT),
        |       CAST(sum(c*(k+1)) AS BIGINT) FROM ct""".stripMargin,
    "q_ps_tree_by" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i FROM range(1, 61) x),
        |r AS (SELECT i, CASE WHEN i % 10 = 0 THEN CAST(i AS VARCHAR)
        |                     ELSE 'n' || CAST(i AS VARCHAR) END AS nm FROM v),
        |p AS (SELECT r0.nm AS n0, r1.nm AS n1, r2.nm AS n2,
        |             r0.i AS i0, r1.i AS i1, r2.i AS i2
        |      FROM r r0 JOIN r r1 ON r1.i = r0.i + 1
        |                JOIN r r2 ON r2.i = r0.i + 2 WHERE r0.i <= 58)
        |SELECT 'tb_rendered' AS caze, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(2*length(n0) + length(n1) + length(n2) + 2) AS BIGINT) AS s FROM p
        |UNION ALL SELECT 'tb_ctrl_ids', CAST(count(*) AS BIGINT),
        |       CAST(sum(2*i0 + i1 + i2) AS BIGINT) FROM p""".stripMargin,
    "q_ps_path_by_emit" ->
      """WITH v AS (SELECT CAST(x.range AS BIGINT) AS i FROM range(1, 61) x),
        |L AS (SELECT i, length(CASE WHEN i % 10 = 0 THEN CAST(i AS VARCHAR)
        |                            ELSE 'n' || CAST(i AS VARCHAR) END) AS l FROM v),
        |e2 AS (SELECT la.l + lb.l + 1 AS s FROM L la JOIN L lb ON lb.i = la.i+1 WHERE la.i <= 59),
        |e3 AS (SELECT la.l + lb.l + lc.l + 2 AS s FROM L la
        |       JOIN L lb ON lb.i = la.i+1 JOIN L lc ON lc.i = la.i+2 WHERE la.i <= 58),
        |e4 AS (SELECT la.l + lb.l + lc.l + ld.l + 3 AS s FROM L la
        |       JOIN L lb ON lb.i = la.i+1 JOIN L lc ON lc.i = la.i+2
        |       JOIN L ld ON ld.i = la.i+3 WHERE la.i <= 57),
        |emit AS (SELECT s FROM e2 UNION ALL SELECT s FROM e3 UNION ALL SELECT s FROM e4),
        |u1 AS (SELECT i FROM v WHERE i <= 59 AND (i+1) % 5 = 0),
        |u2 AS (SELECT i FROM v WHERE i <= 58 AND (i+1) % 5 <> 0 AND (i+2) % 5 = 0),
        |u3 AS (SELECT i FROM v WHERE i <= 57 AND (i+1) % 5 <> 0 AND (i+2) % 5 <> 0),
        |us AS (SELECT (SELECT sum(l) FROM L WHERE L.i BETWEEN u1.i AND u1.i+1) + 1 AS s FROM u1
        |  UNION ALL SELECT (SELECT sum(l) FROM L WHERE L.i BETWEEN u2.i AND u2.i+2) + 2 FROM u2
        |  UNION ALL SELECT (SELECT sum(l) FROM L WHERE L.i BETWEEN u3.i AND u3.i+3) + 3 FROM u3)
        |SELECT 'pbe_emit' AS caze, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(s) AS BIGINT) AS s FROM emit
        |UNION ALL SELECT 'pbe_until', CAST(count(*) AS BIGINT),
        |       CAST(sum(s) AS BIGINT) FROM us""".stripMargin,
    "q_index_gated" ->
      "SELECT c_custkey AS uid, c_mktsegment AS mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'",
    "q_ixp_limit" ->
      """WITH d AS (SELECT CAST(x.range AS BIGINT) + 1 AS i,
        |    ((CAST(x.range AS BIGINT) + 1) % 100) / 100.0 AS w,
        |    (((CAST(x.range AS BIGINT) + 1) % 40) - 20) * 0.5 AS lat,
        |    ((((CAST(x.range AS BIGINT) + 1) * 7) % 40) - 20) * 0.5 AS lon
        |  FROM range(3000) x),
        |m AS (SELECT * FROM d WHERE w >= 0.2 AND w < 0.6 AND
        |  2*6371.0087714*asin(sqrt(pow(sin(radians(0.0-lat)/2),2)+cos(radians(0.0))*cos(radians(lat))*pow(sin(radians(0.0-lon)/2),2))) <= 1000.0)
        |SELECT 'lim_base' AS caze, CAST(count(*) AS BIGINT) AS n FROM m
        |UNION ALL SELECT 'lim_30', CAST(LEAST(30, count(*)) AS BIGINT) FROM m
        |UNION ALL SELECT 'lim_over', CAST(count(*) AS BIGINT) FROM m""".stripMargin,
    "q_collection_typed" ->
      """WITH d AS (SELECT CAST(x.range AS BIGINT) + 1 AS i FROM range(50) x)
        |SELECT 'ct_scan_int7' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(coalesce(sum(i),0) AS BIGINT) AS s FROM d WHERE i % 10 = 7
        |UNION ALL SELECT 'ct_ix_int7', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM d WHERE i % 10 = 7
        |UNION ALL SELECT 'ct_ix_half', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM d WHERE i % 5 = 2
        |UNION ALL SELECT 'ct_ix_miss', CAST(0 AS BIGINT), CAST(0 AS BIGINT)""".stripMargin,
    "q_collection_date" ->
      """WITH d AS (SELECT CAST(x.range AS BIGINT) + 1 AS i FROM range(50) x)
        |SELECT 'cd_scan_d7' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(coalesce(sum(i),0) AS BIGINT) AS s FROM d WHERE i % 10 = 7
        |UNION ALL SELECT 'cd_ix_d7', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM d WHERE i % 10 = 7
        |UNION ALL SELECT 'cd_ix_d12', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM d WHERE i % 5 = 2
        |UNION ALL SELECT 'cd_ix_str', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM d WHERE i % 10 = 7
        |UNION ALL SELECT 'cd_ix_miss', CAST(0 AS BIGINT), CAST(0 AS BIGINT)""".stripMargin,
    "q_collection_decimal" ->
      """WITH d AS (SELECT CAST(x.range AS BIGINT) + 1 AS i FROM range(50) x)
        |SELECT 'cc_scan_int3' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(coalesce(sum(i),0) AS BIGINT) AS s FROM d WHERE i % 7 = 3
        |UNION ALL SELECT 'cc_ix_int3', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM d WHERE i % 7 = 3
        |UNION ALL SELECT 'cc_ix_exact', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM d WHERE i % 10 = 7
        |UNION ALL SELECT 'cc_ix_dbl', CAST(count(*) AS BIGINT), CAST(coalesce(sum(i),0) AS BIGINT) FROM d WHERE i % 10 = 2
        |UNION ALL SELECT 'cc_ix_miss', CAST(0 AS BIGINT), CAST(0 AS BIGINT)""".stripMargin,
    "q_ixp_matrix" ->
      """WITH docs AS (SELECT * FROM (VALUES
        |  (1, 'Hello world', 1001, 5.2, 48.0, 0.0, ['1','2','3'], ['1','2'], 1),
        |  (2, 'Tomorrow is the world', 1010, 8.5, 49.0, 1.0, ['4','5','6'], ['4','5'], 2),
        |  (3, 'Hello Bob, are you there?', -500, 10.1, 47.0, 10.0, ['7','8','9'], ['7','8'], 3)
        |) t(id, text, time, weight, lat, lon, pl, ps, ds)),
        |d AS (SELECT id, text, text AS name, time, weight, lat, lon, pl, ps, ds,
        |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> len(t) > 1) AS toks,
        |  2*6371.0087714*asin(sqrt(pow(sin(radians(48.5-lat)/2),2)+cos(radians(48.5))*cos(radians(lat))*pow(sin(radians(0.5-lon)/2),2))) AS dist
        |  FROM docs),
        |sc AS (SELECT id, len(list_filter(['you','there','hello','bob'], q -> list_contains(toks, q)))/4.0 + 0.001/(len(toks)+10) AS score
        |  FROM d WHERE list_has_any(toks, ['you','there','hello','bob']))
        |SELECT 'c_world' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(coalesce(sum(id),0) AS BIGINT) AS ids FROM d WHERE list_contains(toks,'world')
        |UNION ALL SELECT 'c_world_case', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world')
        |UNION ALL SELECT 'c_bob_lc', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'bob')
        |UNION ALL SELECT 'c_worl', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'worl')
        |UNION ALL SELECT 'c_tomorrow_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_has_all(toks, ['tomorrow','world'])
        |UNION ALL SELECT 'c_world_hello', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_has_all(toks, ['world','hello'])
        |UNION ALL SELECT 'cp_w', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE len(list_filter(toks, t -> t LIKE 'w%')) > 0
        |UNION ALL SELECT 'cp_wor', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE len(list_filter(toks, t -> t LIKE 'wor%')) > 0
        |UNION ALL SELECT 'cp_bobi', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE len(list_filter(toks, t -> t LIKE 'bobi%')) > 0
        |UNION ALL SELECT 'cr_hel_any', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE len(list_filter(toks, t -> regexp_full_match(t, 'he[l]+(.*)'))) > 0
        |UNION ALL SELECT 'cr_hel_any2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE len(list_filter(toks, t -> regexp_full_match(t, '[h]+e[l]+(.*)'))) > 0
        |UNION ALL SELECT 'cr_hel_exact', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE len(list_filter(toks, t -> regexp_full_match(t, 'he[l]+'))) > 0
        |UNION ALL SELECT 'cr_el', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE len(list_filter(toks, t -> regexp_full_match(t, 'e[l]+(.*)'))) > 0
        |UNION ALL SELECT 's_eq_tom', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE name = 'Tomorrow is the world'
        |UNION ALL SELECT 's_eq_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE name = 'world'
        |UNION ALL SELECT 's_neq_bob', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE name <> 'bob'
        |UNION ALL SELECT 's_p_tom', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE name LIKE 'Tomorrow%'
        |UNION ALL SELECT 's_p_wor', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE name LIKE 'wor%'
        |UNION ALL SELECT 's_r_tom', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE regexp_full_match(name, 'Tomo[r]+ow is.*world')
        |UNION ALL SELECT 's_r_tom_part', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE regexp_full_match(name, 'Tomorrow')
        |UNION ALL SELECT 'a_world_hello', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world') AND list_contains(toks,'hello')
        |UNION ALL SELECT 't_eq_m500', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE time = -500
        |UNION ALL SELECT 't_or', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE time = 1001 OR time = -500
        |UNION ALL SELECT 'not_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE NOT list_contains(toks,'world')
        |UNION ALL SELECT 't500_not_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE time = -500 AND NOT list_contains(toks,'world')
        |UNION ALL SELECT 'or_and_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE (time = 1001 OR time = -500) AND list_contains(toks,'world')
        |UNION ALL SELECT 'c_bob_cs', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'bob')
        |UNION ALL SELECT 'w_gt6_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world') AND weight > 6.0
        |UNION ALL SELECT 'o_time_desc_1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM (SELECT id FROM d WHERE list_contains(toks,'world') ORDER BY time DESC, id LIMIT 1)
        |UNION ALL SELECT 'o_weight_desc_1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM (SELECT id FROM d WHERE list_contains(toks,'world') ORDER BY weight DESC, id LIMIT 1)
        |UNION ALL SELECT 'o_time_asc_1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM (SELECT id FROM d WHERE list_contains(toks,'world') ORDER BY time ASC, id LIMIT 1)
        |UNION ALL SELECT 'o_weight_asc_1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM (SELECT id FROM d WHERE list_contains(toks,'world') ORDER BY weight ASC, id LIMIT 1)
        |UNION ALL SELECT 'o_joint_1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM (SELECT id FROM d WHERE list_contains(toks,'world') ORDER BY weight DESC, time DESC, id LIMIT 1)
        |UNION ALL SELECT 'g_circle', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE dist <= 200.0
        |UNION ALL SELECT 'g_circle_tom', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'tomorrow') AND dist <= 200.0
        |UNION ALL SELECT 'g_box', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE lat BETWEEN 46.5 AND 50.5 AND lon BETWEEN -0.5 AND 10.5
        |UNION ALL SELECT 'g_time_circle', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE time >= -1000 AND time < 1010 AND dist <= 1000.0
        |UNION ALL SELECT 'w_gt10', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE weight > 10.0
        |UNION ALL SELECT 'blah_gt10', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |UNION ALL SELECT 'pl_1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(pl,'1')
        |UNION ALL SELECT 'pl_4', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(pl,'4')
        |UNION ALL SELECT 'pl_7', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(pl,'7')
        |UNION ALL SELECT 'ps_2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(ps,'2')
        |UNION ALL SELECT 'ps_5', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(ps,'5')
        |UNION ALL SELECT 'ps_8', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(ps,'8')
        |UNION ALL SELECT 'd_eq1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds = 1
        |UNION ALL SELECT 'd_eq2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds = 2
        |UNION ALL SELECT 'd_eq3', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds = 3
        |UNION ALL SELECT 'd_gt2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds > 2
        |UNION ALL SELECT 'd_gte2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds >= 2
        |UNION ALL SELECT 'd_lt2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds < 2
        |UNION ALL SELECT 'd_lte2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds <= 2
        |UNION ALL SELECT 'd_neq2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds <> 2
        |UNION ALL SELECT 'r_phrase', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE text = 'Hello Bob' OR len([i FOR i IN range(1, len(toks)) IF toks[i]='hello' AND toks[i+1]='bob']) > 0
        |UNION ALL SELECT 'r_phrase_off1', CAST(greatest(count(*) - 1, 0) AS BIGINT), CAST(0 AS BIGINT) FROM d WHERE text = 'Hello Bob' OR len([i FOR i IN range(1, len(toks)) IF toks[i]='hello' AND toks[i+1]='bob']) > 0
        |UNION ALL SELECT 'r_and', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_has_all(toks, ['world','tomorrow'])
        |UNION ALL SELECT 'r_multi', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_has_any(toks, ['you','there','hello','bob'])
        |UNION ALL SELECT 'r_multi_l1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM (SELECT id FROM sc ORDER BY score DESC, id LIMIT 1)
        |UNION ALL SELECT 'r_multi_l1o1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM (SELECT id FROM sc ORDER BY score DESC, id LIMIT 1 OFFSET 1)
        |UNION ALL SELECT 'r_multi_l1o2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM (SELECT id FROM sc ORDER BY score DESC, id LIMIT 1 OFFSET 2)
        |UNION ALL SELECT 'r_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world')
        |UNION ALL SELECT 'r_range', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE time BETWEEN 1000 AND 1020
        |UNION ALL SELECT 'r_comb', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world') AND time = 1001
        |UNION ALL SELECT 'r_name_phrase', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE name = 'Hello world' OR len([i FOR i IN range(1, len(toks)) IF toks[i]='hello' AND toks[i+1]='world']) > 0
        |UNION ALL SELECT 'ed_c_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world')
        |UNION ALL SELECT 'ed_c_tomorrow_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_has_all(toks, ['tomorrow','world'])
        |UNION ALL SELECT 'ed_s_eq_tom', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE name = 'Tomorrow is the world'
        |UNION ALL SELECT 'ed_t_eq_m500', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE time = -500
        |UNION ALL SELECT 'ed_w_gt6_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world') AND weight > 6.0
        |UNION ALL SELECT 'ed_g_circle', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE dist <= 200.0
        |UNION ALL SELECT 'ed_pl_4', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(pl,'4')
        |UNION ALL SELECT 'ed_ps_5', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(ps,'5')
        |UNION ALL SELECT 'ed_d_gte2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds >= 2
        |UNION ALL SELECT 'ets_contains_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world')
        |UNION ALL SELECT 'ets_eq_tom', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE text = 'Tomorrow is the world'
        |UNION ALL SELECT 'ets_eq_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE text = 'world'
        |UNION ALL SELECT 'ets_ix_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world')""".stripMargin,
    "q_ixp_update" ->
      """WITH base AS (SELECT * FROM (VALUES
        |  (1, 'Hello world', 1001, 5.2, 48.0, 0.0, ['1','2','3'], ['1','2'], 1),
        |  (2, 'Tomorrow is the world', 1010, 8.5, 49.0, 1.0, ['4','5','6'], ['4','5'], 2),
        |  (3, 'Hello Bob, are you there?', -500, 10.1, 47.0, 10.0, ['7','8','9'], ['7','8'], 3)
        |) t(id, text, time, weight, lat, lon, pl, ps, ds)),
        |post AS (
        |  SELECT id,
        |    CASE WHEN id=3 THEN 'Bob owns the world' ELSE text END AS text,
        |    text AS name,
        |    CASE WHEN id=1 THEN 1005 WHEN id=3 THEN 2000 ELSE time END AS time,
        |    CASE WHEN id=1 THEN 11.1 WHEN id=3 THEN NULL ELSE weight END AS weight,
        |    lat, lon, pl, ps, ds
        |  FROM base WHERE id <> 2
        |  UNION ALL SELECT 4, 'I''ts all a big Bob', 'I''ts all a big Bob', -100, 11.2,
        |    48.0, 8.0, ['10','11','12'], ['10','11'], 4),
        |d AS (SELECT *,
        |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> len(t) > 1) AS toks,
        |  2*6371.0087714*asin(sqrt(pow(sin(radians(48.5-lat)/2),2)+cos(radians(48.5))*cos(radians(lat))*pow(sin(radians(0.5-lon)/2),2))) AS dist
        |  FROM post)
        |SELECT 'u_world' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(coalesce(sum(id),0) AS BIGINT) AS ids FROM d WHERE list_contains(toks,'world')
        |UNION ALL SELECT 'u_ix_world', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world')
        |UNION ALL SELECT 'u_world_w6', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'world') AND weight > 6.0
        |UNION ALL SELECT 'u_circle', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE dist <= 200.0
        |UNION ALL SELECT 'u_tom_circle', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'tomorrow') AND dist <= 200.0
        |UNION ALL SELECT 'u_time_circle', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE time >= -1000 AND time < 1010 AND dist <= 1000.0
        |UNION ALL SELECT 'u_w10', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE weight > 10.0
        |UNION ALL SELECT 'u_blah', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |UNION ALL SELECT 'u_c_bob', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(toks,'bob')
        |UNION ALL SELECT 'u_pl_10', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(pl,'10')
        |UNION ALL SELECT 'u_pl_11', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(pl,'11')
        |UNION ALL SELECT 'u_ps_10', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(ps,'10')
        |UNION ALL SELECT 'u_pl_4', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE list_contains(pl,'4')
        |UNION ALL SELECT 'u_d_eq2', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds = 2
        |UNION ALL SELECT 'u_d_eq4', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM d WHERE ds = 4""".stripMargin,
    "q_ixp_restore" ->
      """WITH p0 AS (SELECT * FROM (VALUES (1, 'first', 1, 10.2), (2, 'second', 2, 4.7)) t(id, name, time, weight)),
        |p1 AS (SELECT * FROM (VALUES (2, 'not-second', 0, 2.1), (3, 'third', 3, 11.5)) t(id, name, time, weight)),
        |p2 AS (SELECT * FROM p1 UNION ALL SELECT 1, 'first-restored', 4, 7.0),
        |s2 AS (SELECT * FROM (VALUES (1, 'first-in-second-store', 5, 4.0)) t(id, name, time, weight))
        |SELECT 'rs_p0_w4' AS caze, CAST(count(*) AS BIGINT) AS n, CAST(coalesce(sum(id),0) AS BIGINT) AS ids FROM p0 WHERE weight >= 4.0
        |UNION ALL SELECT 'rs_p1_w4', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM p1 WHERE weight >= 4.0
        |UNION ALL SELECT 'rs_p1_third_t3', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM p1 WHERE name = 'third' AND time = 3
        |UNION ALL SELECT 'rs_p1_notsecond_t0', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM p1 WHERE name = 'not-second' AND time = 0
        |UNION ALL SELECT 'rs_p2_w4', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM p2 WHERE weight >= 4.0
        |UNION ALL SELECT 'rs_p2_doc1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM p2 WHERE name = 'first-restored' AND time = 4
        |UNION ALL SELECT 'rs_s2_w4', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM s2 WHERE weight >= 4.0
        |UNION ALL SELECT 'rs_s2_doc1', CAST(count(*) AS BIGINT), CAST(coalesce(sum(id),0) AS BIGINT) FROM s2 WHERE name = 'first-in-second-store' AND time = 5""".stripMargin,
    "q_ixp_conflict" ->
      """WITH st AS (SELECT * FROM (VALUES
        |  ('g2', 1, 'the slow brown fox jumps over the lazy dog', NULL),
        |  ('g3', 1, NULL, 'jm keynes'),
        |  ('g5', 1, 'the quick brown fox jumps over the lazy dog', NULL),
        |  ('g5', 2, 'honey honey', NULL),
        |  ('g6', 1, 'honey honey', NULL),
        |  ('g7', 1, 'its a sunny day', NULL),
        |  ('g8', 1, NULL, NULL)
        |) t(gid, id, text, name)),
        |d AS (SELECT gid, id, text, name,
        |  list_filter(string_split_regex(lower(coalesce(text,'')), '[^a-z0-9]+'), t -> len(t) > 1) AS toks
        |  FROM st)
        |SELECT 'cf_del_delfield' AS caze, CAST(0 AS BIGINT) AS n
        |UNION ALL SELECT 'cf_del_modify', CAST(count(*) AS BIGINT) FROM d WHERE gid='g2' AND list_contains(toks,'brown')
        |UNION ALL SELECT 'cf_del_addfield_text', CAST(count(*) AS BIGINT) FROM d WHERE gid='g3' AND list_contains(toks,'brown')
        |UNION ALL SELECT 'cf_del_addfield_name', CAST(count(*) AS BIGINT) FROM d WHERE gid='g3' AND name = 'jm keynes'
        |UNION ALL SELECT 'cf_addfield_del_text', CAST(0 AS BIGINT)
        |UNION ALL SELECT 'cf_addfield_del_name', CAST(0 AS BIGINT)
        |UNION ALL SELECT 'cf_confadd_brown', CAST(count(*) AS BIGINT) FROM d WHERE gid='g5' AND list_contains(toks,'brown')
        |UNION ALL SELECT 'cf_confadd_sugar', CAST(count(*) AS BIGINT) FROM d WHERE gid='g5' AND list_contains(toks,'sugar')
        |UNION ALL SELECT 'cf_confadd_honey', CAST(count(*) AS BIGINT) FROM d WHERE gid='g5' AND list_contains(toks,'honey')
        |UNION ALL SELECT 'cf_lww_brown', CAST(count(*) AS BIGINT) FROM d WHERE gid='g6' AND list_contains(toks,'brown')
        |UNION ALL SELECT 'cf_lww_sugar', CAST(count(*) AS BIGINT) FROM d WHERE gid='g6' AND list_contains(toks,'sugar')
        |UNION ALL SELECT 'cf_lww_honey', CAST(count(*) AS BIGINT) FROM d WHERE gid='g6' AND list_contains(toks,'honey')
        |UNION ALL SELECT 'cf_upd_brown', CAST(count(*) AS BIGINT) FROM d WHERE gid='g7' AND list_contains(toks,'brown')
        |UNION ALL SELECT 'cf_upd_sunny', CAST(count(*) AS BIGINT) FROM d WHERE gid='g7' AND list_contains(toks,'sunny')
        |UNION ALL SELECT 'cf_updel_brown', CAST(count(*) AS BIGINT) FROM d WHERE gid='g8' AND list_contains(toks,'brown')
        |UNION ALL SELECT 'cf_updel_doc', CAST(count(*) AS BIGINT) FROM d WHERE gid='g8'""".stripMargin,
    "q_tp_cardinality" ->
      """WITH arc AS (SELECT tag, isset, v1, v2, [v1] AS p0
        |  FROM (VALUES ('colL_str', false, 'Totoro','Hiro'), ('colS_str', true, 'Totoro','Hiro'),
        |                ('colL_long', false, '1','2'), ('colS_long', true, '1','2')) t(tag,isset,v1,v2)),
        |a1 AS (SELECT *, CASE WHEN isset AND list_contains(p0,v2) THEN p0 ELSE list_append(p0,v2) END AS p1 FROM arc),
        |a2 AS (SELECT *, list_filter(p1, x -> x <> v1) AS p2 FROM a1),
        |a3 AS (SELECT *, CASE WHEN isset AND list_contains(p2,v1) THEN p2 ELSE list_append(p2,v1) END AS p3 FROM a2),
        |a4 AS (SELECT *, CASE WHEN isset AND list_contains(p3,v1) THEN p3 ELSE list_append(p3,v1) END AS p4 FROM a3)
        |SELECT tag || '_q1_initial' AS caze,
        |  CAST(CASE WHEN list_contains(p0,v1) THEN 1 ELSE 0 END AS BIGINT) AS n FROM a4
        |UNION ALL SELECT tag || '_q_both',
        |  CASE WHEN list_contains(p1,v1) AND list_contains(p1,v2) THEN 1 ELSE 0 END FROM a4
        |UNION ALL SELECT tag || '_q1_removed',
        |  CASE WHEN list_contains(p2,v1) THEN 1 ELSE 0 END FROM a4
        |UNION ALL SELECT tag || '_q2_removed',
        |  CASE WHEN list_contains(p2,v2) THEN 1 ELSE 0 END FROM a4
        |UNION ALL SELECT tag || '_q_readd',
        |  CASE WHEN list_contains(p3,v1) AND list_contains(p3,v2) THEN 1 ELSE 0 END FROM a4
        |UNION ALL SELECT tag || '_dup_cells', CAST(len(p4) AS BIGINT) FROM a4
        |UNION ALL SELECT 'colS_geo_q1_initial', 1
        |UNION ALL SELECT 'colS_geo_q_both', 1
        |UNION ALL SELECT 'colS_geo_q1_removed', 0
        |UNION ALL SELECT 'colS_geo_q2_removed', 1
        |UNION ALL SELECT 'colS_geo_q_readd', 1
        |UNION ALL SELECT 'colS_geo_dup_cells', 2
        |UNION ALL SELECT 'colS_geo_within1', 1
        |UNION ALL SELECT 'colS_geo_within2', 1
        |UNION ALL SELECT 'pc_name1', 0
        |UNION ALL SELECT 'pc_name2', 1
        |UNION ALL SELECT 'pc_uid512', 1
        |UNION ALL SELECT 'tc_name_props', 1
        |UNION ALL SELECT 'tc_name_t3', 1
        |UNION ALL SELECT 'tc_names_props', 2
        |UNION ALL SELECT 'tc_all', 2""".stripMargin,
    "q_tp_ttl" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('et_t0_v1out', CASE WHEN 0+1000 > 500 THEN 1 ELSE 0 END),
        | ('et_t0_v2out', CASE WHEN 0+4000 > 500 THEN 1 ELSE 0 END),
        | ('et_t0_v3out', 1),
        | ('et_t1_v1out', CASE WHEN 0+1000 > 1200 THEN 1 ELSE 0 END),
        | ('et_t1_v2out', CASE WHEN 0+4000 > 1200 THEN 1 ELSE 0 END),
        | ('et_t1_v3out', 1),
        | ('et_t2_v1out', CASE WHEN 0+1000 > 4500 THEN 1 ELSE 0 END),
        | ('et_t2_v2out', CASE WHEN 0+4000 > 4500 THEN 1 ELSE 0 END),
        | ('et_t2_v3out', 1),
        | ('ei_pre_vc', CASE WHEN 0+1000 > 500 THEN 1 ELSE 0 END),
        | ('ei_pre_global', CASE WHEN 0+1000 > 500 THEN 1 ELSE 0 END),
        | ('ei_post_vc', CASE WHEN 0+1000 > 1100 THEN 1 ELSE 0 END),
        | ('ei_post_global', CASE WHEN 0+1000 > 1100 THEN 1 ELSE 0 END),
        | ('pt_t1_nameplace', CASE WHEN 0+1000 > 1100 THEN 1 ELSE 0 END),
        | ('pt_t1_name', CASE WHEN 0+LEAST(42000,2000) > 1100 THEN 1 ELSE 0 END),
        | ('pt_t1_v', CASE WHEN 0+2000 > 1100 THEN 1 ELSE 0 END),
        | ('pt_t2_name', CASE WHEN 0+2000 > 2100 THEN 1 ELSE 0 END),
        | ('pt_t2_v', CASE WHEN 0+2000 > 2100 THEN 1 ELSE 0 END),
        | ('ev_t1_v1', CASE WHEN 0+2000 > 1100 THEN 1 ELSE 0 END),
        | ('ev_t1_in_likes', CASE WHEN 0+LEAST(42000,2000) > 1100 THEN 1 ELSE 0 END),
        | ('ev_t1_in_dislikes', CASE WHEN 0+LEAST(1000,2000) > 1100 THEN 1 ELSE 0 END),
        | ('ev_t1_in_indiff', CASE WHEN 0+2000 > 1100 THEN 1 ELSE 0 END),
        | ('ev_t2_v1', CASE WHEN 0+2000 > 2100 THEN 1 ELSE 0 END),
        | ('ev_t2_in_likes', CASE WHEN 0+LEAST(42000,2000) > 2100 THEN 1 ELSE 0 END),
        | ('ev_t2_in_dislikes', CASE WHEN 0+LEAST(1000,2000) > 2100 THEN 1 ELSE 0 END),
        | ('ev_t2_in_indiff', CASE WHEN 0+2000 > 2100 THEN 1 ELSE 0 END),
        | ('un_t1_v', 2),
        | ('un_t1_e', CASE WHEN 0+2000 > 2500 THEN 1 ELSE 0 END),
        | ('un_t2_v', 4),
        | ('un_t2_e', 1),
        | ('tk_e_likes', 86400),
        | ('tk_e_hasliked', 0),
        | ('tk_v_event', 1),
        | ('tk_v_plain', 0)
        |) t(caze, n)""".stripMargin,
    "q_tp_vcquery_seeded" ->
      // EVERY union arm casts n AND st back to BIGINT: DuckDB unifies a UNION
      // column to the widest arm type, and an uncast 2*SUM(i) is HUGEINT —
      // pandas renders that float64 and the driver's hash diverges on
      // value-identical results (the round-14 red row).
      """WITH an AS (SELECT DISTINCT 1 + ((CAST(1103515245 AS BIGINT)*7 + CAST(x.range AS BIGINT)*12347) % 9999) AS i
        |  FROM range(12) x)
        |SELECT 'sa_classes' AS caze, CAST(count(DISTINCT i%3) AS BIGINT) AS n, CAST(0 AS BIGINT) AS st FROM an
        |UNION ALL SELECT 'sa_out_all', CAST(2*count(*) AS BIGINT), CAST(2*SUM(i) AS BIGINT) FROM an
        |UNION ALL SELECT 'sa_in_all', CAST(2*count(*) AS BIGINT), CAST(2*SUM(i) AS BIGINT) FROM an
        |UNION ALL SELECT 'sa_both_all', CAST(4*count(*) AS BIGINT), CAST(4*SUM(i) AS BIGINT) FROM an
        |UNION ALL SELECT 'sa_out_knows',
        |  CAST(2*SUM(CASE WHEN i%3=2 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(2*SUM(CASE WHEN i%3=2 THEN i ELSE 0 END) AS BIGINT) FROM an
        |UNION ALL SELECT 'sa_out_connect',
        |  CAST(SUM(CASE WHEN i%3=0 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN i%3=0 THEN i ELSE 0 END) AS BIGINT) FROM an
        |UNION ALL SELECT 'sa_in_frienddesc',
        |  CAST(SUM(CASE WHEN i%3=1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN i%3=1 THEN i ELSE 0 END) AS BIGINT) FROM an
        |UNION ALL SELECT 'sa_out_tgte5000',
        |  CAST(2*SUM(CASE WHEN i>=5000 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(2*SUM(CASE WHEN i>=5000 THEN i ELSE 0 END) AS BIGINT) FROM an
        |UNION ALL SELECT 'sa_adj1_both', CAST(2*count(*) AS BIGINT), CAST(2*SUM(i) AS BIGINT) FROM an
        |UNION ALL SELECT 'sa_both_limit2', CAST(2*count(*) AS BIGINT), CAST(2*SUM(i) AS BIGINT) FROM an""".stripMargin,
    "q_tix_conditional" ->
      """WITH t AS (SELECT CAST(x.range AS BIGINT) AS i, CAST(x.range % 4 AS BIGINT) AS wk,
        |  CAST(2*(x.range % 5)+1 AS BIGINT) AS w2 FROM range(200) x),
        |m AS (SELECT CAST(x.range AS BIGINT) AS i, CAST(x.range % 4 AS BIGINT) AS wk,
        |  CAST(2*(x.range % 5)+1 AS BIGINT) AS w2 FROM range(100) x)
        |SELECT 'cx_s0_person' AS caze, count(*) AS n, CAST(0 AS BIGINT) AS s
        |  FROM t WHERE wk=0 AND i%2=0
        |UNION ALL SELECT 'cx_s0_person_wdesc10', count(*), CAST(SUM(w2) AS BIGINT)
        |  FROM (SELECT w2 FROM t WHERE wk=0 AND i%2=0 ORDER BY w2 DESC LIMIT 10)
        |UNION ALL SELECT 'cx_s3_org', count(*), 0 FROM t WHERE wk=3 AND i%2=1
        |UNION ALL SELECT 'cx_s1_org_wdesc10', count(*), CAST(SUM(w2) AS BIGINT)
        |  FROM (SELECT w2 FROM t WHERE wk=1 AND i%2=1 ORDER BY w2 DESC LIMIT 10)
        |UNION ALL SELECT 'cx_s0_w25_person', count(*), 0
        |  FROM t WHERE wk=0 AND i%5=2 AND i%2=0
        |UNION ALL SELECT 'cx_n2_person', count(*), 0 FROM t WHERE wk=2 AND i%2=0
        |UNION ALL SELECT 'cx_n3_person', count(*), 0 FROM t WHERE wk=3 AND i%2=0
        |UNION ALL SELECT 'cx_n0', count(*), 0 FROM t WHERE wk=0
        |UNION ALL SELECT 'cx_n2_s2_person', count(*), 0 FROM t WHERE wk=2 AND i%2=0
        |UNION ALL SELECT 'cx_n0_s0_person_winc10', count(*), CAST(SUM(w2) AS BIGINT)
        |  FROM (SELECT w2 FROM t WHERE wk=0 AND i%2=0 ORDER BY w2 ASC LIMIT 10)
        |UNION ALL SELECT 'cx_s0', count(*), 0 FROM t WHERE wk=0
        |UNION ALL SELECT 'cx_s0_winc10', count(*), CAST(SUM(w2) AS BIGINT)
        |  FROM (SELECT w2 FROM t WHERE wk=0 ORDER BY w2 ASC LIMIT 10)
        |UNION ALL SELECT 'cm_n0', count(*), 0 FROM m WHERE wk=0
        |UNION ALL SELECT 'cm_s0', count(*), 0 FROM m WHERE wk=0
        |UNION ALL SELECT 'cm_s0_flag', count(*), 0 FROM m WHERE wk=0
        |UNION ALL SELECT 'cm_n0_w15', count(*), 0 FROM m WHERE wk=0 AND i%5=1
        |UNION ALL SELECT 'cm_n0_w15_flag', count(*), 0 FROM m WHERE wk=0 AND i%5=1
        |UNION ALL SELECT 'cm_s2_w25', count(*), 0 FROM m WHERE wk=2 AND i%5=2
        |UNION ALL SELECT 'cm_s2_w25_flag', count(*), 0 FROM m WHERE wk=2 AND i%5=2
        |UNION ALL SELECT 'cm_s3_n3_w35', count(*), 0 FROM m WHERE wk=3 AND i%5=3
        |UNION ALL SELECT 'cm_s3_n3_w35_flag', count(*), 0 FROM m WHERE wk=3 AND i%5=3""".stripMargin,
    "q_array_jaccard" ->
      """WITH t AS (SELECT p_partkey AS uid,
        |  list_distinct(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), x -> length(x) > 1)) AS tok FROM part)
        |SELECT uid, CAST(len(list_intersect(tok, ['red','widget'])) AS DOUBLE) /
        |  CAST(len(tok) + 2 - len(list_intersect(tok, ['red','widget'])) AS DOUBLE) AS j
        |FROM t WHERE len(list_intersect(tok, ['red','widget'])) > 0""".stripMargin,
    "q_tp_olap_scan" ->
      """SELECT 'scan_numv' AS caze, CAST(count(*) AS BIGINT) AS n FROM range(100)
        |UNION ALL SELECT 'scan_uid_pos', count(*) FROM range(100)
        |UNION ALL SELECT 'scan_deg_total', CAST(SUM(CAST(x.range AS BIGINT) + 1) AS BIGINT)
        |  FROM range(100) x
        |UNION ALL SELECT 'scan_deg_eq_uid', count(*) FROM range(100)
        |UNION ALL SELECT 'scan_uid_props', count(*) FROM range(100)
        |UNION ALL SELECT 'scan_numvals_props', count(*) FROM range(100)
        |UNION ALL SELECT 'scan_nume', CAST(SUM(CAST(x.range AS BIGINT) + 1) AS BIGINT)
        |  FROM range(100) x""".stripMargin,
    "q_tp_olap_degree" ->
      """WITH e AS (
        |  SELECT CAST(i.range AS BIGINT) AS i,
        |         ((CAST(i.range AS BIGINT) * 31 + CAST(j.range AS BIGINT) * 17) % 100) + 1 AS dst
        |  FROM range(100) i, range(100) j WHERE j.range <= i.range)
        |SELECT i + 1 AS id, i + 1 AS deg1, CAST(SUM(dst) AS BIGINT) AS deg2
        |FROM e GROUP BY i""".stripMargin,
    "q_tp_olap_pagerank" ->
      """WITH RECURSIVE it AS (
        |  SELECT 0 AS k, CAST(1000000000000 AS BIGINT) AS r0, CAST(1000000000000 AS BIGINT) AS r1,
        |         CAST(1000000000000 AS BIGINT) AS r2, CAST(1000000000000 AS BIGINT) AS r3,
        |         CAST(1000000000000 AS BIGINT) AS r4, CAST(1000000000000 AS BIGINT) AS r5
        |  UNION ALL
        |  SELECT k + 1,
        |         150000000000 + 85 * ((6 * r1) // 100),
        |         150000000000 + 85 * ((6 * r2) // 100),
        |         150000000000 + 85 * ((6 * r3) // 100),
        |         150000000000 + 85 * ((6 * r4) // 100),
        |         150000000000 + 85 * ((6 * r5) // 100),
        |         CAST(150000000000 AS BIGINT)
        |  FROM it WHERE k < 10),
        |fin AS (SELECT * FROM it WHERE k = 10)
        |SELECT CAST(0 AS BIGINT) AS depth, CAST(1 AS BIGINT) AS n, r0 AS rank_min, r0 AS rank_max FROM fin
        |UNION ALL SELECT 1, 6, r1, r1 FROM fin
        |UNION ALL SELECT 2, 36, r2, r2 FROM fin
        |UNION ALL SELECT 3, 216, r3, r3 FROM fin
        |UNION ALL SELECT 4, 1296, r4, r4 FROM fin
        |UNION ALL SELECT 5, 7776, r5, r5 FROM fin""".stripMargin,
    "q_tp_olap_sssp" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS dist
        |  UNION ALL
        |  SELECT e.k, d.dist + e.w
        |  FROM (SELECT CAST(x.range AS BIGINT) AS k,
        |               ((1103515245 * CAST(x.range AS BIGINT) + 12345) % 2147483648)
        |                 % CAST(x.range AS BIGINT) AS p,
        |               (((1103515245 * CAST(x.range AS BIGINT) + 12345) % 2147483648) // 16)
        |                 % 3 + 1 AS w
        |        FROM range(1, 500) x) e
        |  JOIN d ON e.p = d.k)
        |SELECT k + 1 AS id, CAST(dist AS BIGINT) AS distance FROM d""".stripMargin,
    "q_tp_eventual" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('ev_tx1_name_ts100', 1),
        | ('ev_tx2_v1_pcount', 1),
        | ('ev_tx2_v1_ts_gt10', 1),
        | ('ev_tx2_v1_ts_eq100', 0),
        | ('ev_tx2_has_name', 1),
        | ('ev_tx2_address_xyz', 1),
        | ('ev_tx2_edge_in', 1),
        | ('ev_tx2_edge_byid', 1),
        | ('ev_tx3_address_still', 1),
        | ('ev_tx4_age15', 1),
        | ('ev_tx4_edge_gone', 0),
        | ('ev_tx5_age15', 1),
        | ('ev_tx5_age16', 0),
        | ('ev_upd_time25', 1),
        | ('ev_upd_time125', 1),
        | ('ev_upd_out', 1),
        | ('ev_upd_gone', 0)
        |) t(caze, n)""".stripMargin,
    "q_tp_implicit" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('impl_v_id', 1),
        | ('impl_v_label_default', 3),
        | ('impl_e_label', 1),
        | ('impl_vc_eid', 1),
        | ('impl_vc_eid_miss', 0),
        | ('impl_vc_nid', 1),
        | ('impl_vc_nid_miss', 0),
        | ('impl_edge_lookup', 1),
        | ('impl_adjacent', 1),
        | ('impl_adjacent_int', 1),
        | ('impl_array_eq', 1),
        | ('impl_array_eq_copy', 1)
        |) t(caze, n)""".stripMargin,
    "q_tp_indexretrieval" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('ji_sid8', 1400),
        | ('ji_color_yellow', 3400),
        | ('ji_joint', 200),
        | ('ci_in_label', 2),
        | ('ci_in_label_all_match', 2),
        | ('ml_bob', 1),
        | ('ml_alice', 1)
        |) t(caze, n)""".stripMargin,
    "q_tp_vc_null" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('vcn_all', 5),
        | ('vcn_t1', 1),
        | ('vcn_lt3_gt1', 1),
        | ('vcn_lt5', 3),
        | ('vcn_gt0', 3),
        | ('vcn_lt3', 2),
        | ('vcn_gt2', 1),
        | ('vcn_hasnot', 2),
        | ('vcn_all_again', 5)
        |) t(caze, n)""".stripMargin,
    "q_tp_rename" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('rn_pre_time5', 1),
        | ('rn_mgmt', 1),
        | ('rn_time5_person', 1),
        | ('rn_time5_people', 0),
        | ('rn_forced', 1),
        | ('rn_in_know', 1),
        | ('rn_in_knows', 0),
        | ('rn_out_know_t11', 1)
        |) t(caze, n)""".stripMargin,
    "q_tp_index_replay" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('ir_boy', 2),
        | ('ir_long', 1),
        | ('ir_long_age', 1),
        | ('ir_age75', 0),
        | ('ir_boy_age', 1),
        | ('ir_age_range', 2),
        | ('ir_index_ids', 3)
        |) t(caze, n)""".stripMargin,
    "q_tp_ttl_index" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('ti_ttl_decl', 1),
        | ('ti_pre_name', 1),
        | ('ti_pre_text', 1),
        | ('ti_post_name', 0),
        | ('ti_post_text', 0),
        | ('ti_post_byid', 0),
        | ('ti_pre_etext', 1),
        | ('ti_post_etext', 0)
        |) t(caze, n)""".stripMargin,
    "q_tp_collection" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('col_s1_v1', 1),
        | ('col_s2_v1', 1),
        | ('col_s2_v2', 1),
        | ('col_s3_v1', 0),
        | ('col_s3_v2', 1),
        | ('col_s4_v1', 1),
        | ('col_s4_v2', 1),
        | ('col_s5_list_cells', 1),
        | ('col_s5_set_cells', 1),
        | ('col_s6_v1', 1),
        | ('col_s6_v2', 1),
        | ('col_empty_has', 0),
        | ('col_empty_hasnot', 1),
        | ('col_geo_p1', 1),
        | ('col_geo_p2', 1),
        | ('col_geo_miss', 0),
        | ('col_text_multi', 1),
        | ('col_trav_v1', 1),
        | ('col_trav_v2', 1),
        | ('col_trav_miss', 0),
        | ('col_trav_hasnot', 1),
        | ('col_ix_v1', 1),
        | ('col_ix_v2', 1),
        | ('col_ix_dup_rows', 3),
        | ('col_auto_ix', 1)
        |) t(caze, n)""".stripMargin,
    "q_tp_index_lifecycle" ->
      """SELECT caze, CAST(1 AS BIGINT) AS n FROM (VALUES
        | ('il_sane'), ('il_pre'), ('il_disabled_scan'), ('il_disabled_force'),
        | ('il_removed_gone'), ('il_removed_scan')
        |) t(caze)""".stripMargin,
    "q_tp_io_gotg" ->
      """SELECT pre || '_' || caze AS caze, CAST(n AS BIGINT) AS n
        |FROM (VALUES ('io_base'), ('io_gson'), ('io_gryo')) p(pre)
        |CROSS JOIN (VALUES ('numv', 12), ('gods', 3), ('herc', 1),
        |  ('herc_deg', 5), ('geo', 2)) c(caze, n)""".stripMargin,
    "q_tp_create_delete" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('cd_euid111', 1),
        | ('cd_eid_obj', 1),
        | ('cd_eid_str', 1),
        | ('cd_v3_353', 1),
        | ('cd_v3_445_gone', 0),
        | ('cd_e_222', 1),
        | ('cd_e2_upd', 1),
        | ('cd2_v3_353', 1),
        | ('cd2_e_222', 1)
        |) t(caze, n)""".stripMargin,
    "q_tp_consistency" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('cm_weight', 1),
        | ('cm_name_set', 1),
        | ('cm_value_keep', 1),
        | ('cm_valuef_fork', 2),
        | ('cm_es', 1),
        | ('cm_o2o', 1),
        | ('cm_o2m', 1),
        | ('cm_em', 1),
        | ('cm_emf', 2)
        |) t(caze, n)""".stripMargin,
    "q_tp_optstrat" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('os_sv0_outE_w1', 20),
        | ('os_sv0_outE', 100),
        | ('os_sv0_out', 100),
        | ('os_sv0_local_limit10', 10),
        | ('os_sv0_local_range', 10),
        | ('os_sv0_order_decr', 100),
        | ('os_sv0_order_limit10', 10),
        | ('os_sv0_w1_order', 20),
        | ('os_sv0_w1_order_limit10', 10),
        | ('os_sv0_w1w1_range_10_15', 5),
        | ('os_sv0_inV_is50', 1),
        | ('os_sv0_otherV_is50', 1),
        | ('os_sv0_bothE_otherV', 1),
        | ('os_sv0_bothE_inV', 1),
        | ('os_props_w1', 20),
        | ('os_props', 100),
        | ('os_props_order_limit10', 10),
        | ('os_sv0_outE_values_w', 100),
        | ('os_gid20', 1),
        | ('os_gid20_w0', 1),
        | ('os_w1', 20),
        | ('os_w1_range10', 10),
        | ('os_sid', 10),
        | ('os_super_outE_w1', 200),
        | ('os_super_outE_gte1_lt3', 400),
        | ('os_super_outE_between', 400),
        | ('os_super_local_limit10', 100),
        | ('os_super_order_limit10', 100),
        | ('os_super_names', 1000)
        |) t(caze, n)""".stripMargin,
    "q_tp_ghost" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('gh_pre_in', 1),
        | ('gh_relations', 2),
        | ('gh_vertices', 1),
        | ('gh_post_edges', 1),
        | ('gh_post_in', 0)
        |) t(caze, n)""".stripMargin,
    "q_tp_partition" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('pt_one_both1', 10),
        | ('pt_one_in_even', 10),
        | ('pt_one_out_odd', 10),
        | ('pt_base_out', 9),
        | ('pt_base_in9', 1),
        | ('pt_name8', 10),
        | ('pt_gid_lookup', 1)
        |) t(caze, n)""".stripMargin,
    "q_tp_partition_olap" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('po_group_deg', 3),
        | ('po_person_deg1', 60),
        | ('po_total', 63),
        | ('po_salted_eq', 63)
        |) t(caze, n)""".stripMargin,
    "q_tp_datatypes" ->
      """SELECT pre || '_' || caze AS caze, CAST(1 AS BIGINT) AS n
        |FROM (VALUES ('dt'), ('dt2')) p(pre)
        |CROSS JOIN (VALUES ('boolval'), ('birthday'), ('num'), ('barr_len'),
        |  ('geo'), ('precise'), ('any_count'), ('any_hello'), ('any_long'),
        |  ('any_arr')) c(caze)""".stripMargin,
    "q_tp_crud" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('basic_v_byid', 1),
        | ('basic_missing', 0),
        | ('basic_by_name', 1),
        | ('basic_relations', 1),
        | ('basic_all', 1),
        | ('basic_cleared', 0),
        | ('rm_pre_v', 2),
        | ('rm_pre_v2', 1),
        | ('rm_pre_deg_v1', 1),
        | ('rm_pre_deg_v2', 1),
        | ('rm_post_deg_v1', 0),
        | ('rm_post_v', 1),
        | ('rm_post_v1', 1),
        | ('rm_post_v2', 0),
        | ('gi_v', 50),
        | ('gi_e', 49),
        | ('gi_post_v', 45),
        | ('gi_post_gte0', 45),
        | ('gi_post_e', 44)
        |) t(caze, n)""".stripMargin,
    "q_tp_medium" ->
      """SELECT caze, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('med_out10', 500),
        | ('med_out_connect5', 500),
        | ('med_both_connect10', 500),
        | ('med_both_knows10', 500),
        | ('med_props2', 500),
        | ('med_knows_uid_ok', 2500),
        | ('med_knows_name_ok', 2500),
        | ('med_name_uid_agree', 500),
        | ('med_bulk_50', 50)
        |) t(caze, n)""".stripMargin,
    "q_tp_order_noindex" ->
      """WITH v AS (
        |  SELECT ((1103515245 * (CAST(x.range AS BIGINT) + 1) + 12345) % 2147483648) % 1000 AS kid
        |  FROM range(1000) x),
        |e AS (
        |  SELECT ((1103515245 * (CAST(x.range AS BIGINT) + 7777) + 12345) % 2147483648) % 500 AS kid
        |  FROM range(1, 1000) x)
        |SELECT 'on_v_asc_500' AS caze, CAST(row_number() OVER (ORDER BY kid) AS INT) AS rn,
        |       CAST(kid AS BIGINT) AS kid
        |FROM (SELECT kid FROM v ORDER BY kid LIMIT 500)
        |UNION ALL
        |SELECT 'on_e_asc_300', CAST(row_number() OVER (ORDER BY kid) AS INT), CAST(kid AS BIGINT)
        |FROM (SELECT kid FROM e ORDER BY kid LIMIT 300)
        |UNION ALL
        |SELECT 'on_v_desc_400', CAST(row_number() OVER (ORDER BY kid DESC) AS INT), CAST(kid AS BIGINT)
        |FROM (SELECT kid FROM v ORDER BY kid DESC LIMIT 400)
        |UNION ALL
        |SELECT 'on_e_desc_200', CAST(row_number() OVER (ORDER BY kid DESC) AS INT), CAST(kid AS BIGINT)
        |FROM (SELECT kid FROM e ORDER BY kid DESC LIMIT 200)""".stripMargin,
  )

  // ---- analytics oracle generators: the TPC-H property graph re-derived in
  // ---- SQL (vertex id = tag·2⁵⁶ + key) + fixed-round iteration as chained
  // ---- MATERIALIZED CTEs (multi-referenced CTEs must not be inlined or the
  // ---- plan blows up 2^rounds).

  private val T = "72057594037927936" // 2^56 = 1L << GraphIds.TagBits

  /** vg = all vertex ids; eg = all directed edges, as SQL over the flat tables
    * (mirrors TpchGraph.load's derivation). */
  private val graphCtes: String =
    s"""vg AS MATERIALIZED (SELECT 1*$T + r_regionkey AS id FROM region
       |  UNION ALL SELECT 2*$T + n_nationkey FROM nation
       |  UNION ALL SELECT 3*$T + c_custkey FROM customer
       |  UNION ALL SELECT 4*$T + s_suppkey FROM supplier
       |  UNION ALL SELECT 5*$T + p_partkey FROM part
       |  UNION ALL SELECT 6*$T + o_orderkey FROM orders),
       |eg AS MATERIALIZED (SELECT 2*$T + n_nationkey AS src, 1*$T + n_regionkey AS dst FROM nation
       |  UNION ALL SELECT 3*$T + c_custkey, 2*$T + c_nationkey FROM customer
       |  UNION ALL SELECT 4*$T + s_suppkey, 2*$T + s_nationkey FROM supplier
       |  UNION ALL SELECT 3*$T + o_custkey, 6*$T + o_orderkey FROM orders
       |  UNION ALL SELECT 6*$T + l_orderkey, 5*$T + l_partkey FROM lineitem
       |  UNION ALL SELECT 6*$T + l_orderkey, 4*$T + l_suppkey FROM lineitem)""".stripMargin

  /** Weighted fixed-point PageRank oracle (mirrors
    * Analytics.pageRankWeightedFixedPoint bit-for-bit): contains edges
    * weigh their lineitem quantity, every other edge weighs 1; the
    * per-edge contribution uses the same overflow-safe
    * (r // Σw)·w + ((r % Σw)·w) // Σw floor decomposition. */
  private def wPageRankOracle(iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""p$k AS MATERIALIZED (SELECT vg.id,
         |  150000000000 + 85 * (CAST(COALESCE(SUM(m.c), 0) AS BIGINT) // 100) AS r
         |  FROM vg LEFT JOIN (
         |    SELECT we.dst AS id,
         |      (p${k - 1}.r // sw.s) * we.w + ((p${k - 1}.r % sw.s) * we.w) // sw.s AS c
         |    FROM we JOIN p${k - 1} ON p${k - 1}.id = we.src
         |    JOIN sw ON sw.src = we.src) m ON m.id = vg.id
         |  GROUP BY vg.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |we AS MATERIALIZED (
       |  SELECT 2*$T + n_nationkey AS src, 1*$T + n_regionkey AS dst, CAST(1 AS BIGINT) AS w FROM nation
       |  UNION ALL SELECT 3*$T + c_custkey, 2*$T + c_nationkey, 1 FROM customer
       |  UNION ALL SELECT 4*$T + s_suppkey, 2*$T + s_nationkey, 1 FROM supplier
       |  UNION ALL SELECT 3*$T + o_custkey, 6*$T + o_orderkey, 1 FROM orders
       |  UNION ALL SELECT 6*$T + l_orderkey, 5*$T + l_partkey, CAST(trunc(l_quantity) AS BIGINT) FROM lineitem
       |  UNION ALL SELECT 6*$T + l_orderkey, 4*$T + l_suppkey, 1 FROM lineitem),
       |sw AS MATERIALIZED (SELECT src, SUM(w) AS s FROM we GROUP BY 1),
       |p0 AS MATERIALIZED (SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM vg),
       |$iters
       |SELECT id, r AS rank_fp FROM p$iterations""".stripMargin
  }

  /** Fixed-point PageRank: rank' = 0.15·10¹² + 85·(Σ(rank DIV outdeg) DIV 100),
    * all-BIGINT (mirrors Analytics.pageRankFixedPoint bit-for-bit). */
  /** LSH S-curve sheet (mirrors Dedup.lshTuningTable: every exponentiation
    * is a square-and-round(12) DECIMAL(13,12) chain — bands/rows are powers
    * of two, so the chain depth is exactly log2). */
  private def lshTuningOracle(configs: Seq[(Int, Int)]): String = {
    def log2(x: Int): Int = java.lang.Integer.numberOfTrailingZeros(x)
    // each squaring is ONE wrapping subquery referencing the previous step's
    // column once — linear SQL size (an inline fold would double the
    // expression text per level)
    def sq(inner: String, times: Int): String =
      (1 to times).foldLeft(inner)((q, _) =>
        s"SELECT s_x100, CAST(ROUND(x * x, 12) AS DECIMAL(13,12)) AS x FROM ($q)")
    val selects = configs.map { case (b, r) =>
      val grid = s"""SELECT CAST(i * 5 AS INTEGER) AS s_x100,
        CAST(CAST(i * 5 AS DECIMAL(26,12)) * 0.01 AS DECIMAL(13,12)) AS x
        FROM range(1, 20) t(i)"""
      val sr = sq(grid, log2(r))
      val flipped = s"SELECT s_x100, CAST(1 - x AS DECIMAL(13,12)) AS x FROM ($sr)"
      val qb = sq(flipped, log2(b))
      s"""SELECT $b AS bands, $r AS rows, s_x100,
         |CAST(FLOOR(CAST(1 - x AS DECIMAL(26,12)) * 1000000) AS BIGINT) AS p_x1e6
         |FROM ($qb)""".stripMargin
    }
    selects.mkString("\nUNION ALL\n")
  }

  /** Katz fixed point (mirrors Analytics.katzFixedPoint: the full neighbor
    * rank flows along every in-edge, α = num/den applies once post-sum with
    * one integer floor per vertex per round). */
  private def katzOracle(alphaNum: Long, alphaDen: Long, iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""p$k AS MATERIALIZED (SELECT vg.id,
         |  1000000000000 + ($alphaNum * CAST(COALESCE(SUM(m.c), 0) AS BIGINT)) // $alphaDen AS r
         |  FROM vg LEFT JOIN (
         |    SELECT eg.dst AS id, p${k - 1}.r AS c
         |    FROM eg JOIN p${k - 1} ON p${k - 1}.id = eg.src) m ON m.id = vg.id
         |  GROUP BY vg.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |p0 AS MATERIALIZED (SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM vg),
       |$iters
       |SELECT id, r AS katz_fp FROM p$iterations""".stripMargin
  }

  private def pageRankOracle(iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""p$k AS MATERIALIZED (SELECT vg.id,
         |  150000000000 + 85 * (CAST(COALESCE(SUM(m.c), 0) AS BIGINT) // 100) AS r
         |  FROM vg LEFT JOIN (
         |    SELECT eg.dst AS id, p${k - 1}.r // deg.d AS c
         |    FROM eg JOIN p${k - 1} ON p${k - 1}.id = eg.src
         |    JOIN deg ON deg.src = eg.src) m ON m.id = vg.id
         |  GROUP BY vg.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM eg GROUP BY 1),
       |p0 AS MATERIALIZED (SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM vg),
       |$iters
       |SELECT id, r AS rank_fp FROM p$iterations""".stripMargin
  }

  /** Personalized fixed-point PageRank (mirrors
    * Analytics.personalizedPageRankFixedPoint: teleport mass concentrated on
    * the source, zero elsewhere; only non-zero ranks emitted). */
  private def pprOracle(sourceId: Long, iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""p$k AS MATERIALIZED (SELECT vg.id,
         |  (CASE WHEN vg.id = $sourceId THEN 150000000000 ELSE 0 END)
         |  + 85 * (CAST(COALESCE(SUM(m.c), 0) AS BIGINT) // 100) AS r
         |  FROM vg LEFT JOIN (
         |    SELECT eg.dst AS id, p${k - 1}.r // deg.d AS c
         |    FROM eg JOIN p${k - 1} ON p${k - 1}.id = eg.src
         |    JOIN deg ON deg.src = eg.src) m ON m.id = vg.id
         |  GROUP BY vg.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM eg GROUP BY 1),
       |p0 AS MATERIALIZED (SELECT id,
       |  CASE WHEN id = $sourceId THEN CAST(1000000000000 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS r FROM vg),
       |$iters
       |SELECT id, r AS rank_ppr FROM p$iterations WHERE r > 0""".stripMargin
  }

  /** HITS with integer max-normalization (mirrors Analytics.hitsFixedPoint:
    * hub = Σ auth over out-edges, auth = Σ hub over in-edges, each scaled to
    * 10⁶ by integer division by the round's max). */
  private def hitsOracle(iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""h${k}r AS MATERIALIZED (SELECT eg.src AS id, SUM(a${k - 1}.v) AS r
         |  FROM eg JOIN a${k - 1} ON a${k - 1}.id = eg.dst GROUP BY 1),
         |h${k}m AS MATERIALIZED (SELECT MAX(r) AS m FROM h${k}r),
         |h$k AS MATERIALIZED (SELECT vg.id,
         |  CASE WHEN (SELECT m FROM h${k}m) IS NULL OR (SELECT m FROM h${k}m) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(COALESCE(r, 0) * 1000000 // (SELECT m FROM h${k}m) AS BIGINT) END AS v
         |  FROM vg LEFT JOIN h${k}r ON h${k}r.id = vg.id),
         |a${k}r AS MATERIALIZED (SELECT eg.dst AS id, SUM(h$k.v) AS r
         |  FROM eg JOIN h$k ON h$k.id = eg.src GROUP BY 1),
         |a${k}m AS MATERIALIZED (SELECT MAX(r) AS m FROM a${k}r),
         |a$k AS MATERIALIZED (SELECT vg.id,
         |  CASE WHEN (SELECT m FROM a${k}m) IS NULL OR (SELECT m FROM a${k}m) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(COALESCE(r, 0) * 1000000 // (SELECT m FROM a${k}m) AS BIGINT) END AS v
         |  FROM vg LEFT JOIN a${k}r ON a${k}r.id = vg.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |a0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS v FROM vg),
       |$iters
       |SELECT h$iterations.id, h$iterations.v AS hub, a$iterations.v AS auth
       |FROM h$iterations JOIN a$iterations ON a$iterations.id = h$iterations.id""".stripMargin
  }

  /** Weighted Bellman-Ford (mirrors Analytics.shortestDistanceExact with
    * quantity-weighted contains edges, unit weights elsewhere). */
  private def wssspOracle(sourceId: Long, rounds: Int): String = {
    val iters = (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (SELECT p.id,
         |  CASE WHEN n.nd IS NULL THEN p.d WHEN p.d IS NULL THEN n.nd
         |       WHEN n.nd < p.d THEN n.nd ELSE p.d END AS d
         |  FROM d${k - 1} p LEFT JOIN (
         |    SELECT wg.dst AS id, MIN(q.d + wg.w) AS nd FROM wg
         |    JOIN d${k - 1} q ON q.id = wg.src WHERE q.d IS NOT NULL GROUP BY 1) n
         |  ON n.id = p.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |wg AS MATERIALIZED (
       |  SELECT 2*$T + n_nationkey AS src, 1*$T + n_regionkey AS dst, CAST(1 AS BIGINT) AS w FROM nation
       |  UNION ALL SELECT 3*$T + c_custkey, 2*$T + c_nationkey, 1 FROM customer
       |  UNION ALL SELECT 4*$T + s_suppkey, 2*$T + s_nationkey, 1 FROM supplier
       |  UNION ALL SELECT 3*$T + o_custkey, 6*$T + o_orderkey, 1 FROM orders
       |  UNION ALL SELECT 6*$T + l_orderkey, 5*$T + l_partkey, CAST(l_quantity AS BIGINT) FROM lineitem
       |  UNION ALL SELECT 6*$T + l_orderkey, 4*$T + l_suppkey, 1 FROM lineitem),
       |d0 AS MATERIALIZED (SELECT id,
       |  CASE WHEN id = $sourceId THEN CAST(0 AS BIGINT) END AS d FROM vg),
       |$iters
       |SELECT id, d AS distance FROM d$rounds WHERE d IS NOT NULL""".stripMargin
  }

  /** Shared BFS-distance CTE chain (d0..dN): fixed-round min-relaxation over
    * (vg, eg) — used by the sssp, shortest-tree and shortest-paths oracles
    * so their distance semantics cannot drift. */
  private def bfsIters(rounds: Int, sfx: String = ""): String =
    (1 to rounds).map { k =>
      s"""d$k$sfx AS MATERIALIZED (SELECT p.id,
         |  CASE WHEN n.nd IS NULL THEN p.d WHEN p.d IS NULL THEN n.nd
         |       WHEN n.nd < p.d THEN n.nd ELSE p.d END AS d
         |  FROM d${k - 1}$sfx p LEFT JOIN (
         |    SELECT eg.dst AS id, MIN(q.d + 1) AS nd FROM eg
         |    JOIN d${k - 1}$sfx q ON q.id = eg.src WHERE q.d IS NOT NULL GROUP BY 1) n
         |  ON n.id = p.id)""".stripMargin
    }.mkString(",\n")

  /** Synchronous Bellman-Ford hop distance (mirrors Analytics.shortestHopsExact). */
  private def ssspOracle(sourceId: Long, rounds: Int): String =
    s"""WITH $graphCtes,
       |d0 AS MATERIALIZED (SELECT id,
       |  CASE WHEN id = $sourceId THEN CAST(0 AS BIGINT) END AS d FROM vg),
       |${bfsIters(rounds)}
       |SELECT id, d AS distance FROM d$rounds WHERE d IS NOT NULL""".stripMargin

  /** BFS dist + deterministic min-pred tree CTEs (`dist`, `tree`): pred(v) =
    * MIN src with dist(src) = dist(v) − 1 and an edge (src, v) — equal to
    * the engine's first-reach min candidate because BFS settles every
    * vertex at its true level. */
  private def shortestTreeCtes(sourceId: Long, rounds: Int): String =
    s"""$graphCtes,
       |d0 AS MATERIALIZED (SELECT id,
       |  CASE WHEN id = $sourceId THEN CAST(0 AS BIGINT) END AS d FROM vg),
       |${bfsIters(rounds)},
       |dist AS MATERIALIZED (SELECT id, d FROM d$rounds WHERE d IS NOT NULL),
       |tree AS MATERIALIZED (SELECT di.id, di.d AS distance, p.pred
       |  FROM dist di LEFT JOIN (
       |    SELECT eg.dst AS id, MIN(eg.src) AS pred
       |    FROM eg JOIN dist a ON a.id = eg.src JOIN dist b ON b.id = eg.dst
       |    WHERE b.d = a.d + 1 GROUP BY 1) p ON p.id = di.id)""".stripMargin

  /** σ path-counting oracle (mirrors Analytics.shortestPathCounts): BFS
    * distances to `rounds`, then layer-synchronous σ sums — σ(layer r) =
    * edge-join sum over layer r−1, exact BIGINT; layers past the true depth
    * are empty and union away. */
  private def pathCountsOracle(sourceId: Long, rounds: Int): String = {
    val layers = (1 to rounds).map { r =>
      s""",s$r AS MATERIALIZED (SELECT eg.dst AS id, CAST($r AS BIGINT) AS distance,
         |  CAST(SUM(p.sigma) AS BIGINT) AS sigma
         |  FROM eg JOIN s${r - 1} p ON p.id = eg.src
         |  JOIN dist b ON b.id = eg.dst AND b.d = $r GROUP BY 1)""".stripMargin
    }.mkString("\n")
    val selects = (0 to rounds).map(r => s"SELECT id, distance, sigma FROM s$r")
      .mkString("\nUNION ALL ")
    s"""WITH $graphCtes,
       |d0 AS MATERIALIZED (SELECT id,
       |  CASE WHEN id = $sourceId THEN CAST(0 AS BIGINT) END AS d FROM vg),
       |${bfsIters(rounds)},
       |dist AS MATERIALIZED (SELECT id, d FROM d$rounds WHERE d IS NOT NULL),
       |s0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS distance,
       |  CAST(1 AS BIGINT) AS sigma FROM dist WHERE d = 0)
       |$layers
       |$selects""".stripMargin
  }

  /** Maximal-matching oracle: mirrors Analytics.maximalMatching round for
    * round over the nation/customer/order subgraph — per round, every alive
    * vertex's MIN-id alive neighbor, mutual pairs marry and retire; a
    * leftover alive edge after the round budget surfaces as the (-1,-1,-1)
    * sentinel (non-maximal = loud). */
  private def matchingCtes(rounds: Int): String = {
    val iters = (1 to rounds).map { r =>
      s""",n$r AS MATERIALIZED (SELECT e.x, e.y FROM ne e
         |  JOIN al${r - 1} a ON a.id = e.x JOIN al${r - 1} b ON b.id = e.y),
         |p$r AS MATERIALIZED (SELECT x, MIN(y) AS p FROM n$r GROUP BY 1),
         |m$r AS MATERIALIZED (SELECT a.x AS u, a.p AS v, CAST($r AS BIGINT) AS round
         |  FROM p$r a JOIN p$r b ON b.x = a.p AND b.p = a.x WHERE a.x < a.p),
         |al$r AS MATERIALIZED (SELECT id FROM al${r - 1} WHERE id NOT IN (
         |  SELECT u FROM m$r UNION ALL SELECT v FROM m$r))""".stripMargin
    }.mkString("\n")
    val mm = (1 to rounds).map(r => s"SELECT u, v FROM m$r").mkString(" UNION ALL ")
    s"""$graphCtes,
       |ue AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM (
       |  SELECT 3*$T + c_custkey AS src, 2*$T + c_nationkey AS dst FROM customer
       |  UNION ALL SELECT 4*$T + s_suppkey, 2*$T + s_nationkey FROM supplier
       |  UNION ALL SELECT 3*$T + o_custkey, 6*$T + o_orderkey FROM orders) t
       |  WHERE src <> dst),
       |ne AS MATERIALIZED (SELECT u AS x, v AS y FROM ue UNION ALL SELECT v, u FROM ue),
       |al0 AS MATERIALIZED (SELECT id FROM vg)
       |$iters
       |,mm AS MATERIALIZED ($mm)""".stripMargin
  }

  private def matchingOracle(rounds: Int): String = {
    val sel = (1 to rounds).map(r => s"SELECT u, v, round FROM m$r")
      .mkString("\nUNION ALL ")
    s"""WITH ${matchingCtes(rounds)}
       |$sel
       |UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |WHERE EXISTS (SELECT 1 FROM ne e
       |  JOIN al$rounds a ON a.id = e.x JOIN al$rounds b ON b.id = e.y)""".stripMargin
  }

  /** Contraction oracle: the matched pairs collapse onto their smaller id,
    * survivors map to themselves, edges re-wire through the map, self-loops
    * drop, parallel coarse edges aggregate to weights — mirrors
    * Analytics.contractMatching over the q_matching subgraph (the probe's
    * EDGE multiset is the pre-dedup nation/customer/order edges). */
  private def contractionOracle(rounds: Int): String =
    s"""WITH ${matchingCtes(rounds)},
       |vmap AS MATERIALIZED (SELECT v.id, COALESCE(m.rep, v.id) AS rep FROM vg v
       |  LEFT JOIN (SELECT u AS id, LEAST(u, v) AS rep FROM mm
       |             UNION ALL SELECT v, LEAST(u, v) FROM mm) m ON m.id = v.id),
       |raw AS (SELECT 3*$T + c_custkey AS src, 2*$T + c_nationkey AS dst FROM customer
       |  UNION ALL SELECT 4*$T + s_suppkey, 2*$T + s_nationkey FROM supplier
       |  UNION ALL SELECT 3*$T + o_custkey, 6*$T + o_orderkey FROM orders)
       |SELECT LEAST(a.rep, b.rep) AS src, GREATEST(a.rep, b.rep) AS dst,
       |  COUNT(*) AS weight
       |FROM raw e JOIN vmap a ON a.id = e.src JOIN vmap b ON b.id = e.dst
       |WHERE a.rep <> b.rep GROUP BY 1, 2""".stripMargin

  /** Jones–Plassmann coloring oracle: mirrors Analytics.greedyColoring
    * round for round — per round the (h, id) domination test among
    * uncolored vertices, winners take the mex of their already-colored
    * neighborhood; survivors of the budget stay NULL on both sides. */
  private def coloringOracle(rounds: Int): String = {
    val iters = (1 to rounds).map { r =>
      s""",unc$r AS MATERIALIZED (SELECT id, db, h FROM s${r - 1} WHERE color IS NULL),
         |dom$r AS MATERIALIZED (SELECT DISTINCT e.a AS id FROM und e
         |  JOIN unc$r v ON v.id = e.a JOIN unc$r u ON u.id = e.b
         |  WHERE (u.db, u.h, u.id) > (v.db, v.h, v.id)),
         |win$r AS MATERIALIZED (SELECT id FROM unc$r
         |  WHERE id NOT IN (SELECT id FROM dom$r)),
         |mex$r AS MATERIALIZED (SELECT w.id,
         |  list_filter(range(0, COALESCE(len(nc.cl), 0) + 1),
         |    i -> NOT list_contains(COALESCE(nc.cl, CAST([] AS BIGINT[])), i))[1] AS mex
         |  FROM win$r w LEFT JOIN (
         |    SELECT e.a AS id, LIST(DISTINCT s.color) AS cl FROM und e
         |    JOIN s${r - 1} s ON s.id = e.b AND s.color IS NOT NULL
         |    GROUP BY 1) nc ON nc.id = w.id),
         |s$r AS MATERIALIZED (SELECT s.id, s.db, s.h, COALESCE(s.color, m.mex) AS color
         |  FROM s${r - 1} s LEFT JOIN mex$r m ON m.id = s.id)""".stripMargin
    }.mkString("\n")
    s"""WITH $graphCtes,
       |und AS MATERIALIZED (SELECT DISTINCT a, b FROM (
       |  SELECT src AS a, dst AS b FROM eg UNION ALL SELECT dst, src FROM eg) t
       |  WHERE a <> b),
       |s0 AS MATERIALIZED (SELECT v.id,
       |  CAST(FLOOR(log2(COALESCE(dg.d, 0) + 1)) AS BIGINT) AS db,
       |  ('0x' || substr(md5(':' || CAST(v.id AS VARCHAR)), 21, 12))::BIGINT AS h,
       |  CAST(NULL AS BIGINT) AS color FROM vg v LEFT JOIN (
       |    SELECT a, COUNT(*) AS d FROM und GROUP BY 1) dg ON dg.a = v.id)
       |$iters
       |SELECT id, color FROM s$rounds""".stripMargin
  }

  /** Borůvka oracle: mirrors Analytics.minimumSpanningForest round for
    * round over the q_msf subgraph (placed + contains-to-small-parts, w =
    * the original dst id) — per outer round the per-component (w, u, v)
    * argmin, the selection's min-label flood, the component remap; a
    * still-crossing edge after the outer budget surfaces as the sentinel. */
  private def msfOracle(maxOuter: Int, maxInner: Int): String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    for (o <- 1 to maxOuter) {
      ctes += s"""ec$o AS MATERIALIZED (SELECT e.u, e.v, e.w, a.c AS cu, b.c AS cv
         |  FROM ed e JOIN c${o - 1} a ON a.id = e.u JOIN c${o - 1} b ON b.id = e.v
         |  WHERE a.c <> b.c)""".stripMargin
      ctes += s"""sel$o AS MATERIALIZED (SELECT DISTINCT u, v, w FROM (
         |  SELECT u, v, w, ROW_NUMBER() OVER (PARTITION BY comp ORDER BY w, u, v) AS rn
         |  FROM (SELECT cu AS comp, u, v, w FROM ec$o
         |        UNION ALL SELECT cv, u, v, w FROM ec$o) cc) rr WHERE rn = 1)""".stripMargin
      ctes += s"""cp$o AS MATERIALIZED (SELECT a.c AS ca, b.c AS cb FROM sel$o s
         |  JOIN c${o - 1} a ON a.id = s.u JOIN c${o - 1} b ON b.id = s.v)""".stripMargin
      ctes += s"""un$o AS MATERIALIZED (SELECT ca AS a, cb AS b FROM cp$o
         |  UNION SELECT cb, ca FROM cp$o)""".stripMargin
      ctes += s"l${o}_0 AS MATERIALIZED (SELECT DISTINCT a AS c, a AS l FROM un$o)"
      for (i <- 1 to maxInner)
        ctes += s"""l${o}_$i AS MATERIALIZED (SELECT t.c,
           |  LEAST(t.l, COALESCE(m.ln, t.l), COALESCE(g.l, t.l)) AS l
           |  FROM l${o}_${i - 1} t LEFT JOIN (
           |    SELECT u2.a AS c, MIN(p.l) AS ln FROM un$o u2
           |    JOIN l${o}_${i - 1} p ON p.c = u2.b GROUP BY 1) m ON m.c = t.c
           |  LEFT JOIN l${o}_${i - 1} g ON g.c = t.l)""".stripMargin
      ctes += s"""c$o AS MATERIALIZED (SELECT v.id, COALESCE(l.l, v.c) AS c
         |  FROM c${o - 1} v LEFT JOIN l${o}_$maxInner l ON l.c = v.c)""".stripMargin
    }
    val sel = (1 to maxOuter).map(o => s"SELECT u, v, w FROM sel$o")
      .mkString("\nUNION ALL ")
    s"""WITH $graphCtes,
       |ed AS MATERIALIZED (SELECT u, v, MIN(w) AS w FROM (
       |  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v, dst AS w FROM (
       |    SELECT 3*$T + o_custkey AS src, 6*$T + o_orderkey AS dst FROM orders
       |    UNION ALL SELECT 6*$T + l_orderkey, 5*$T + l_partkey FROM lineitem
       |    WHERE l_partkey < 200) r) t
       |  WHERE u <> v GROUP BY 1, 2),
       |c0 AS MATERIALIZED (SELECT id, id AS c FROM vg),
       |${ctes.mkString(",\n")}
       |$sel
       |UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |WHERE EXISTS (SELECT 1 FROM ed e
       |  JOIN c$maxOuter a ON a.id = e.u JOIN c$maxOuter b ON b.id = e.v
       |  WHERE a.c <> b.c)""".stripMargin
  }

  /** SCC oracle: mirrors Analytics.stronglyConnectedComponents round for
    * round over the probe's cycle-rich graph (eg + reversed placed edges) —
    * per outer round, `maxTrim` trim peels (no in- or no out-neighbor ⇒
    * singleton SCC), `maxInner` min-label forward-coloring rounds, and
    * `maxInner` backward pivot-reach rounds inside each color; survivors of
    * the outer budget surface as scc = NULL. Every phase is monotone, so
    * the engine's early convergence cannot diverge from these fixed
    * budgets (extra rounds are no-ops). */
  private def sccOracle(maxOuter: Int, maxTrim: Int, maxInner: Int): String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    val trimmedSel = scala.collection.mutable.ArrayBuffer[String]()
    val resSel = scala.collection.mutable.ArrayBuffer[String]()
    var aliveName = "a0"
    for (o <- 1 to maxOuter) {
      var prev = aliveName
      for (t <- 1 to maxTrim) {
        val e = s"e${o}t$t"
        val al = s"a${o}t$t"
        ctes += s"""$e AS MATERIALIZED (SELECT ed.src, ed.dst FROM ed
           |  JOIN $prev x ON x.id = ed.src JOIN $prev y ON y.id = ed.dst)""".stripMargin
        ctes += s"""$al AS MATERIALIZED (SELECT a.id FROM $prev a
           |  JOIN (SELECT DISTINCT src FROM $e) s ON s.src = a.id
           |  JOIN (SELECT DISTINCT dst FROM $e) d ON d.dst = a.id)""".stripMargin
        trimmedSel += s"SELECT id, id AS scc FROM $prev WHERE id NOT IN (SELECT id FROM $al)"
        prev = al
      }
      val eo = s"eo$o"
      ctes += s"""$eo AS MATERIALIZED (SELECT ed.src, ed.dst FROM ed
         |  JOIN $prev x ON x.id = ed.src JOIN $prev y ON y.id = ed.dst)""".stripMargin
      ctes += s"f${o}_0 AS MATERIALIZED (SELECT id, id AS f FROM $prev)"
      for (i <- 1 to maxInner)
        ctes += s"""f${o}_$i AS MATERIALIZED (SELECT f.id, LEAST(f.f, COALESCE(m.fm, f.f)) AS f
           |  FROM f${o}_${i - 1} f LEFT JOIN (
           |    SELECT e.dst AS id, MIN(p.f) AS fm FROM $eo e
           |    JOIN f${o}_${i - 1} p ON p.id = e.src GROUP BY 1) m ON m.id = f.id)""".stripMargin
      ctes += s"""b${o}_0 AS MATERIALIZED (SELECT id, f,
         |  CASE WHEN f = id THEN 1 ELSE 0 END AS rb FROM f${o}_$maxInner)""".stripMargin
      for (j <- 1 to maxInner)
        ctes += s"""b${o}_$j AS MATERIALIZED (SELECT b.id, b.f,
           |  GREATEST(b.rb, COALESCE(h.hit, 0)) AS rb
           |  FROM b${o}_${j - 1} b LEFT JOIN (
           |    SELECT e.src AS id, 1 AS hit FROM $eo e
           |    JOIN b${o}_${j - 1} u ON u.id = e.dst AND u.rb = 1
           |    JOIN b${o}_${j - 1} w ON w.id = e.src AND w.f = u.f
           |    GROUP BY 1) h ON h.id = b.id)""".stripMargin
      ctes += s"res$o AS MATERIALIZED (SELECT id, f AS scc FROM b${o}_$maxInner WHERE rb = 1)"
      resSel += s"SELECT id, scc FROM res$o"
      val nextAlive = s"a$o"
      ctes += s"$nextAlive AS MATERIALIZED (SELECT id FROM $prev WHERE id NOT IN (SELECT id FROM res$o))"
      aliveName = nextAlive
    }
    s"""WITH $graphCtes,
       |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM eg
       |  UNION ALL SELECT 6*$T + o_orderkey, 3*$T + o_custkey FROM orders) t),
       |a0 AS MATERIALIZED (SELECT id FROM vg),
       |${ctes.mkString(",\n")}
       |${(trimmedSel ++ resSel).mkString("\nUNION ALL ")}
       |UNION ALL SELECT id, CAST(NULL AS BIGINT) AS scc FROM $aliveName""".stripMargin
  }

  /** Stress-centrality oracle: [[pathCountsOracle]]'s forward σ layers plus
    * the backward suffix-count sweep g(v) = Σ_succ (1 + g(w)) (deepest layer
    * g = 0), mirroring Analytics.stressCentrality — stress = σ·g, 0 at the
    * source, all exact BIGINT. */
  private def stressOracle(sourceId: Long, rounds: Int): String = {
    val layers = (1 to rounds).map { r =>
      s""",s$r AS MATERIALIZED (SELECT eg.dst AS id, CAST($r AS BIGINT) AS distance,
         |  CAST(SUM(p.sigma) AS BIGINT) AS sigma
         |  FROM eg JOIN s${r - 1} p ON p.id = eg.src
         |  JOIN dist b ON b.id = eg.dst AND b.d = $r GROUP BY 1)""".stripMargin
    }.mkString("\n")
    val gBack = (rounds - 1 to 0 by -1).map { r =>
      s""",g$r AS MATERIALIZED (SELECT l.id, CAST(COALESCE(c.s, 0) AS BIGINT) AS gg
         |  FROM dist l LEFT JOIN (
         |    SELECT eg.src AS id, SUM(n.gg + 1) AS s
         |    FROM eg JOIN g${r + 1} n ON n.id = eg.dst GROUP BY 1) c ON c.id = l.id
         |  WHERE l.d = $r)""".stripMargin
    }.mkString("\n")
    val sAll = (0 to rounds).map(r => s"SELECT id, distance, sigma FROM s$r")
      .mkString("\nUNION ALL ")
    val gAllSel = (0 to rounds).map(r => s"SELECT id, gg FROM g$r")
      .mkString("\nUNION ALL ")
    s"""WITH $graphCtes,
       |d0 AS MATERIALIZED (SELECT id,
       |  CASE WHEN id = $sourceId THEN CAST(0 AS BIGINT) END AS d FROM vg),
       |${bfsIters(rounds)},
       |dist AS MATERIALIZED (SELECT id, d FROM d$rounds WHERE d IS NOT NULL),
       |s0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS distance,
       |  CAST(1 AS BIGINT) AS sigma FROM dist WHERE d = 0)
       |$layers
       |,g$rounds AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS gg
       |  FROM dist WHERE d = $rounds)
       |$gBack
       |,sall AS MATERIALIZED ($sAll),
       |gall AS MATERIALIZED ($gAllSel)
       |SELECT s.id, s.distance, s.sigma,
       |  CASE WHEN s.distance = 0 THEN CAST(0 AS BIGINT)
       |       ELSE s.sigma * g.gg END AS stress
       |FROM sall s JOIN gall g ON g.id = s.id""".stripMargin
  }

  /** HyperLogLog report (mirrors functions.Sketches.hllReport: identical
    * md5 fold, register ranks via bin-length, the exact Σ2^(50−reg)
    * integer denominator, and the same pinned estimate constants). */
  private def hllOracle(b: Int, salt: String, table: String, column: String): String = {
    val m = 1 << b
    val window = 48 - b
    val alpha = b match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val num = alpha * m.toDouble * m.toDouble * math.pow(2.0, 50)
    val thr = 2.5 * m
    s"""WITH hx AS (SELECT
       |  ('0x' || substr(md5('$salt:' || CAST($column AS VARCHAR)), 21, 12))::BIGINT AS h
       |  FROM $table WHERE $column IS NOT NULL),
       |hw AS (SELECT h % $m AS bucket, h // $m AS w FROM hx),
       |regs AS (SELECT bucket,
       |  MAX(CASE WHEN w = 0 THEN ${window + 1}
       |           ELSE ${window + 1} - length(bin(w)) END) AS reg FROM hw GROUP BY 1),
       |sk AS (SELECT COUNT(*) AS used,
       |  COALESCE(SUM(1::BIGINT << (50 - reg)), 0) AS s_used FROM regs),
       |agg AS (SELECT CAST($m AS BIGINT) AS m, CAST(used AS BIGINT) AS used,
       |  CAST(s_used + ($m - used) * (1::BIGINT << 50) AS BIGINT) AS s2,
       |  CAST($m - used AS BIGINT) AS v_empty FROM sk),
       |ex AS (SELECT CAST(COUNT(DISTINCT $column) AS BIGINT) AS exact
       |  FROM $table WHERE $column IS NOT NULL)
       |SELECT m, used, s2, v_empty,
       |  ROUND(CASE WHEN $num / CAST(s2 AS DOUBLE) <= $thr AND v_empty > 0
       |    THEN ${m.toDouble} * ROUND(ln(${m.toDouble} / CAST(v_empty AS DOUBLE)), 9)
       |    ELSE $num / CAST(s2 AS DOUBLE) END, 4) AS estimate, exact
       |FROM agg CROSS JOIN ex""".stripMargin
  }

  /** Z-order key (mirrors functions.ZOrder: min/max quantization to
    * 2^bits levels in a pinned IEEE chain, then exact bit interleave). */
  private def zorderOracle(bits: Int): String = {
    val levels = ((1L << bits) - 1).toDouble
    def lane(q: String, j: Int, n: Int): String = (0 until bits).map(i =>
      s"((($q >> $i) & 1) << ${i * n + (n - 1 - j)})").mkString(" | ")
    def quant(v: String, lo: String, hi: String): String =
      s"""CASE WHEN CAST($hi AS DOUBLE) = CAST($lo AS DOUBLE) THEN 0
         |ELSE CAST(FLOOR((CAST($v AS DOUBLE) - CAST($lo AS DOUBLE)) * $levels
         |  / (CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE))) AS BIGINT) END""".stripMargin
    s"""WITH b AS (SELECT MIN(o_totalprice) AS lo1, MAX(o_totalprice) AS hi1,
       |  MIN(o_orderkey) AS lo2, MAX(o_orderkey) AS hi2 FROM orders),
       |q AS (SELECT o_orderkey,
       |  ${quant("o_totalprice", "lo1", "hi1")} AS qa,
       |  ${quant("o_orderkey", "lo2", "hi2")} AS qb
       |  FROM orders CROSS JOIN b)
       |SELECT o_orderkey, CAST((${lane("qa", 0, 2)}) | (${lane("qb", 1, 2)}) AS BIGINT) AS zkey
       |FROM q""".stripMargin
  }

  /** Sampled Brandes betweenness (mirrors Analytics.betweennessSampled:
    * per source a BFS + σ forward pass, then the backward dependency sweep
    * with the 9-dp ratio / exact-DECIMAL product / 6-dp pin recipe; source
    * rows dropped, per-vertex DECIMAL sum rounded last). */
  private def betweennessOracle(sources: Seq[Long], rounds: Int): String =
    betweennessOracleOver(graphCtes, sources, rounds)

  /** Same layered Brandes oracle, over ANY (vg, eg) CTE block — lets a
    * synthetic fixture pin the sampled estimator at FULL diameter, where the
    * layered sweep is exact Brandes restricted to the pivot set. */
  private def betweennessOracleOver(ctes: String, sources: Seq[Long],
      rounds: Int): String = {
    val blocks = sources.zipWithIndex.map { case (src, i) =>
      val x = s"_$i"
      val layers = (1 to rounds).map { r =>
        s""",s$r$x AS MATERIALIZED (SELECT eg.dst AS id, CAST($r AS BIGINT) AS distance,
           |  CAST(SUM(p.sigma) AS BIGINT) AS sigma
           |  FROM eg JOIN s${r - 1}$x p ON p.id = eg.src
           |  JOIN dist$x b ON b.id = eg.dst AND b.d = $r GROUP BY 1)""".stripMargin
      }.mkString("\n")
      val back = (rounds - 1 to 0 by -1).map { r =>
        s""",del$r$x AS MATERIALIZED (SELECT l.id,
           |  CAST(COALESCE(c.s, 0) AS DECIMAL(21,6)) AS delta
           |  FROM dist$x l LEFT JOIN (
           |    SELECT eg.src AS id,
           |      SUM(ROUND(CAST(ROUND(CAST(sv.sigma AS DOUBLE) / CAST(sw.sigma AS DOUBLE), 9)
           |            AS DECIMAL(13,12)) * (1 + n.delta), 6)) AS s
           |    FROM eg
           |    JOIN del${r + 1}$x n ON n.id = eg.dst
           |    JOIN s${r + 1}$x sw ON sw.id = eg.dst
           |    JOIN s$r$x sv ON sv.id = eg.src
           |    GROUP BY 1) c ON c.id = l.id
           |  WHERE l.d = $r)""".stripMargin
      }.mkString("\n")
      s"""d0$x AS MATERIALIZED (SELECT id,
         |  CASE WHEN id = $src THEN CAST(0 AS BIGINT) END AS d FROM vg),
         |${bfsIters(rounds, x)},
         |dist$x AS MATERIALIZED (SELECT id, d FROM d$rounds$x WHERE d IS NOT NULL),
         |s0$x AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS distance,
         |  CAST(1 AS BIGINT) AS sigma FROM dist$x WHERE d = 0)
         |$layers
         |,del$rounds$x AS MATERIALIZED (SELECT id, CAST(0 AS DECIMAL(21,6)) AS delta
         |  FROM dist$x WHERE d = $rounds)
         |$back""".stripMargin
    }.mkString(",\n")
    val all = sources.zipWithIndex.flatMap { case (src, i) =>
      (0 to rounds).map(r => s"SELECT id, delta FROM del${r}_$i WHERE id <> $src")
    }.mkString("\nUNION ALL ")
    s"""WITH $ctes,
       |$blocks,
       |ball AS MATERIALIZED ($all)
       |SELECT id, ROUND(CAST(SUM(delta) AS DOUBLE), 6) AS betweenness
       |FROM ball GROUP BY 1""".stripMargin
  }

  /** q_betweenness_sampled fixture as SQL CTEs: the depth-5 diamond chain
    * (x_i → {u_i, w_i} → x_{i+1}), where σ(x_j) = 2^j from x_0 — exact
    * Brandes dependencies with genuinely fractional σ ratios at full
    * diameter 10. */
  private val diamondChainCtes: String =
    """vg AS MATERIALIZED (SELECT CAST(x.range AS BIGINT) + 1 AS id FROM range(6) x
      |  UNION ALL SELECT CAST(x.range AS BIGINT) + 101 FROM range(5) x
      |  UNION ALL SELECT CAST(x.range AS BIGINT) + 201 FROM range(5) x),
      |eg AS MATERIALIZED (
      |  SELECT CAST(x.range AS BIGINT) + 1 AS src, CAST(x.range AS BIGINT) + 101 AS dst FROM range(5) x
      |  UNION ALL SELECT CAST(x.range AS BIGINT) + 1, CAST(x.range AS BIGINT) + 201 FROM range(5) x
      |  UNION ALL SELECT CAST(x.range AS BIGINT) + 101, CAST(x.range AS BIGINT) + 2 FROM range(5) x
      |  UNION ALL SELECT CAST(x.range AS BIGINT) + 201, CAST(x.range AS BIGINT) + 2 FROM range(5) x)""".stripMargin

  /** The q_epoch_budget mixture (ppm), shared by probe and oracle so the
    * two can never drift. */
  private val epochBudgetWeights: Seq[(String, Long)] =
    Seq(("src0", 500000L), ("src1", 300000L), ("src2", 200000L))

  /** Mirror of TextAnalysis.epochBudget: per-source token mass, the exact
    * integer floor(B·w/T) target decomposition, and the ×10⁶ repeat factor. */
  private def epochBudgetOracle(budget: Long): String = {
    val totW = epochBudgetWeights.map(_._2).sum
    val wCase = epochBudgetWeights
      .map { case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")
    s"""WITH t AS (SELECT source,
       |  CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |w AS (SELECT source, n_tokens,
       |  CAST(CASE source $wCase ELSE 0 END AS BIGINT) AS wppm FROM t)
       |SELECT source, n_tokens,
       |  ($budget // $totW) * wppm + (($budget % $totW) * wppm) // $totW AS target_tokens,
       |  (($budget // $totW) * wppm + (($budget % $totW) * wppm) // $totW) * 1000000 // n_tokens AS epochs_x1e6,
       |  (($budget // $totW) * wppm + (($budget % $totW) * wppm) // $totW) * 1000000 // n_tokens > 4000000 AS over_budget
       |FROM w""".stripMargin
  }

  /** DSIR oracle (shared by the batch probe and its streaming twin — the
    * stream scores the same feed against the frozen λ model, so the answers
    * are identical): hashed uni+bigram buckets, add-one smoothed target/raw
    * models, 9-dp lns differenced and summed in DECIMAL per occurrence. */
  private val dsirOracleSql: String =
    """WITH w AS (SELECT doc_id, source IN ('src0', 'src1') AS t,
      |  string_split_regex(text, '\s+') AS wl FROM documents),
      |uni AS (SELECT doc_id, t, unnest(wl) AS f FROM w),
      |big AS (SELECT doc_id, t,
      |  unnest([wl[i] || ' ' || wl[i+1] for i in range(1, len(wl))]) AS f
      |  FROM w WHERE len(wl) >= 2),
      |feats AS (SELECT doc_id, t,
      |  ('0x' || substr(md5(':' || f), 21, 12))::BIGINT % 1024 AS b
      |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big) u),
      |rawc AS (SELECT b, COUNT(*) AS cr,
      |  SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ct FROM feats GROUP BY 1),
      |tot AS (SELECT SUM(cr) AS totr, SUM(ct) AS tott FROM rawc),
      |lam AS (SELECT b,
      |  CAST(ROUND(ln(CAST(ct + 1 AS DOUBLE) / CAST(tott + 1024 AS DOUBLE)), 9) AS DECIMAL(28,12))
      |  - CAST(ROUND(ln(CAST(cr + 1 AS DOUBLE) / CAST(totr + 1024 AS DOUBLE)), 9) AS DECIMAL(28,12)) AS lam
      |  FROM rawc CROSS JOIN tot)
      |SELECT doc_id, ROUND(CAST(SUM(lam) AS DOUBLE), 6) AS log_weight
      |FROM feats JOIN lam USING (b) GROUP BY 1""".stripMargin

  /** BPE-training oracle: mirrors TextAnalysis.bpeTrain round for round —
    * word-frequency vocab in spaced-unit form, per round the weighted
    * adjacent-pair argmax (cnt desc, (a,b) asc) and a corpus-wide
    * single-pass replace (the 1-row t{r} cross-joins into the rewrite). */
  private def bpeTrainOracle(numMerges: Int): String = {
    val rounds = (1 to numMerges).map { r =>
      s""",p$r AS MATERIALIZED (SELECT u[CAST(i AS INT)] AS a, u[CAST(i AS INT)+1] AS b, f FROM (
         |  SELECT unnest(range(1, len(u))) AS i, u, f FROM (
         |    SELECT list_filter(string_split(s, ' '), x -> x <> '') AS u, f
         |    FROM w${r - 1}) q) z),
         |t$r AS MATERIALIZED (SELECT a, b, CAST(SUM(f) AS BIGINT) AS cnt FROM p$r
         |  GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |w$r AS MATERIALIZED (SELECT
         |  REPLACE(s, ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' ') AS s, f
         |  FROM w${r - 1}, t$r t)""".stripMargin
    }.mkString("\n")
    val sel = (1 to numMerges)
      .map(r => s"SELECT CAST($r AS BIGINT) AS rank, a, b, cnt FROM t$r")
      .mkString("\nUNION ALL ")
    s"""WITH v AS MATERIALIZED (SELECT w, COUNT(*) AS f FROM (
       |  SELECT unnest(string_split_regex(
       |    regexp_replace(text, '[^\\x20-\\x7E]', '', 'g'), '\\s+')) AS w
       |  FROM documents) t WHERE w <> '' GROUP BY 1),
       |w0 AS MATERIALIZED (SELECT
       |  ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, f FROM v)
       |$rounds
       |$sel""".stripMargin
  }

  /** The fixed BPE merge table q_bpe_encode applies — rank-ordered; later
    * merges compose multi-char units built by earlier ones. Shared by the
    * engine probe and [[bpeEncodeOracle]] so the two can never drift. */
  private val bpeMergeTable: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "r", "s" -> "t",
    "e" -> "n", "o" -> "f")

  /** DuckDB mirror of [[graft.pipeline.TextAnalysis.bpeEncode]]: the same
    * ASCII normalization,  word-boundary sentinel, char spacing and
    * rank-ordered chained single-pass REPLACEs (both engines' REPLACE scans
    * left-to-right non-overlapping, so the chains are bit-identical). */
  private def bpeEncodeOracle: String = {
    val replaced = bpeMergeTable.foldLeft("s") { case (acc, (a, b)) =>
      s"REPLACE($acc, ' $a $b ', ' $a$b ')" }
    s"""WITH t AS (SELECT doc_id,
       |  ' ' || regexp_replace(regexp_replace(
       |    regexp_replace(text, '[^\\x20-\\x7E]', '', 'g'),
       |    '\\s+', chr(1), 'g'), '(.)', '\\1 ', 'g') AS s FROM documents),
       |m AS (SELECT doc_id,
       |  list_filter(string_split($replaced, ' '),
       |    x -> x <> '' AND x <> chr(1)) AS units FROM t)
       |SELECT doc_id, CAST(len(units) AS INT) AS n_bpe,
       |  array_to_string(list_slice(units, 1, 8), '|') AS preview FROM m""".stripMargin
  }

  /** Multi-source BFS (min-relax keyed (id, source)) — mirrors
    * Analytics.multiSourceBfs round-for-round: shared CTE chain where
    * m$rounds holds (id, s, d) with d null when unreached; harmonic sums
    * ⌊10¹²/d⌋, eccentricity takes MAX(d), both integer-exact. */
  private def multiBfsCtes(sources: Seq[Long], rounds: Int): String = {
    val srcVals = sources.map(s => s"($s)").mkString(",")
    val iters = (1 to rounds).map { k =>
      s"""m$k AS MATERIALIZED (SELECT p.id, p.s,
         |  CASE WHEN n.nd IS NULL THEN p.d WHEN p.d IS NULL THEN n.nd
         |       WHEN n.nd < p.d THEN n.nd ELSE p.d END AS d
         |  FROM m${k - 1} p LEFT JOIN (
         |    SELECT eg.dst AS id, q.s, MIN(q.d + 1) AS nd FROM eg
         |    JOIN m${k - 1} q ON q.id = eg.src WHERE q.d IS NOT NULL GROUP BY 1, 2) n
         |  ON n.id = p.id AND n.s = p.s)""".stripMargin
    }.mkString(",\n")
    s"""$graphCtes,
       |src(s) AS (VALUES $srcVals),
       |m0 AS MATERIALIZED (SELECT vg.id, src.s,
       |  CASE WHEN vg.id = src.s THEN CAST(0 AS BIGINT) END AS d FROM vg CROSS JOIN src),
       |$iters""".stripMargin
  }

  private def harmonicOracle(sources: Seq[Long], rounds: Int): String =
    s"""WITH ${multiBfsCtes(sources, rounds)}
       |SELECT id, CAST(SUM(1000000000000 // d) AS BIGINT) AS harmonic_x1e12,
       |  COUNT(*) AS reached
       |FROM m$rounds WHERE d IS NOT NULL AND d > 0 GROUP BY id""".stripMargin

  private def closenessOracle(sources: Seq[Long], rounds: Int): String =
    s"""WITH ${multiBfsCtes(sources, rounds)}
       |SELECT id, CAST(SUM(d) AS BIGINT) AS dist_sum, COUNT(*) AS reached
       |FROM m$rounds WHERE d IS NOT NULL AND d > 0 GROUP BY id""".stripMargin

  private def eccentricityOracle(sources: Seq[Long], rounds: Int): String =
    s"""WITH ${multiBfsCtes(sources, rounds)}
       |SELECT s AS source, MAX(d) AS eccentricity, COUNT(*) AS reached
       |FROM m$rounds WHERE d IS NOT NULL GROUP BY s""".stripMargin

  private def hopHistogramOracle(sources: Seq[Long], rounds: Int): String =
    s"""WITH ${multiBfsCtes(sources, rounds)}
       |SELECT s AS source, d, COUNT(*) AS n_at_d
       |FROM m$rounds WHERE d IS NOT NULL GROUP BY 1, 2""".stripMargin

  private def shortestTreeOracle(sourceId: Long, rounds: Int): String =
    s"""WITH ${shortestTreeCtes(sourceId, rounds)}
       |SELECT id, distance, pred FROM tree""".stripMargin

  /** Path materialization oracle: `rounds` pred-walk folds over the tree,
    * mirroring Analytics.shortestPaths join-for-join. */
  private def shortestPathsOracle(sourceId: Long, rounds: Int): String = {
    val folds = (1 to rounds).map { k =>
      s"""p$k AS MATERIALIZED (SELECT a.id, a.distance, t.pred AS p,
         |  CASE WHEN t.id IS NOT NULL THEN CAST(t.id AS VARCHAR) || ',' || a.path
         |       ELSE a.path END AS path
         |  FROM p${k - 1} a LEFT JOIN tree t ON t.id = a.p)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${shortestTreeCtes(sourceId, rounds)},
       |p0 AS MATERIALIZED (SELECT id, distance, pred AS p,
       |  CAST(id AS VARCHAR) AS path FROM tree),
       |$folds
       |SELECT id, distance, path FROM p$rounds""".stripMargin
  }

  /** Shared min-label-propagation CTE chain: `prefix0` must be defined by the
    * caller as (id, l) seeds and `e2` as the (src, dst) edge set; emits
    * `prefix1..prefixN`. Used by both the connected-components and the
    * transitive-dedup oracles so their propagation semantics cannot drift. */
  private def minLabelIters(prefix: String, rounds: Int): String =
    (1 to rounds).map { k =>
      s"""$prefix$k AS MATERIALIZED (SELECT p.id,
         |  CASE WHEN n.nl IS NOT NULL AND n.nl < p.l THEN n.nl ELSE p.l END AS l
         |  FROM $prefix${k - 1} p LEFT JOIN (
         |    SELECT e2.src AS id, MIN(q.l) AS nl FROM e2
         |    JOIN $prefix${k - 1} q ON q.id = e2.dst GROUP BY 1) n ON n.id = p.id)""".stripMargin
    }.mkString(",\n")

  /** Min-label propagation over the undirected edge set (mirrors
    * Analytics.connectedComponentsExact). */
  /** k-core oracle: `rounds` synchronous peel iterations (each keeps vertices
    * whose surviving-endpoint degree is ≥ k), the exact SQL mirror of
    * Analytics.kCore. The trailing sentinel row fires when round `rounds`
    * still changed the set — a too-small round budget surfaces as a
    * row-count mismatch instead of a silently-wrong core. */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val iters = (1 to rounds).map { r =>
      s"""a$r AS MATERIALIZED (SELECT e2.a AS id FROM e2
         |  JOIN a${r - 1} x ON e2.a = x.id JOIN a${r - 1} y ON e2.b = y.id
         |  GROUP BY 1 HAVING COUNT(*) >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |e2 AS MATERIALIZED (SELECT src AS a, dst AS b FROM eg UNION ALL SELECT dst, src FROM eg),
       |a0 AS MATERIALIZED (SELECT id FROM vg),
       |$iters
       |SELECT CASE id // $T WHEN 1 THEN 'region' WHEN 2 THEN 'nation' WHEN 3 THEN 'customer'
       |  WHEN 4 THEN 'supplier' WHEN 5 THEN 'part' ELSE 'order' END AS kind,
       |  id % $T AS uid FROM a$rounds
       |UNION ALL SELECT 'NOT_CONVERGED', CAST(-1 AS BIGINT)
       |WHERE (SELECT COUNT(*) FROM a$rounds) <> (SELECT COUNT(*) FROM a${rounds - 1})""".stripMargin
  }

  /** Coreness oracle: h-index iteration over the simple undirected graph,
    * mirroring Analytics.corenessConverged round for round — c₀ = degree,
    * c(v) ← max over desc-sorted neighbor values of LEAST(value, rank).
    * Monotone non-increasing, so unequal Σcore between the last two rounds
    * means the round budget was short: the NOT_CONVERGED sentinel fails the
    * compare loudly instead of certifying an upper bound. */
  private def corenessOracle(rounds: Int): String = {
    val iters = (1 to rounds).map { r =>
      s"""c$r AS MATERIALIZED (SELECT v.id, CAST(COALESCE(h.c, 0) AS BIGINT) AS core
         |  FROM vg v LEFT JOIN (
         |  SELECT a, MAX(LEAST(cb, rn)) AS c FROM (
         |    SELECT u.a, p.core AS cb,
         |      ROW_NUMBER() OVER (PARTITION BY u.a ORDER BY p.core DESC, u.b) AS rn
         |    FROM e2 u JOIN c${r - 1} p ON p.id = u.b) s GROUP BY a) h ON h.a = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |e2 AS MATERIALIZED (SELECT DISTINCT src AS a, dst AS b FROM (
       |  SELECT src, dst FROM eg UNION ALL SELECT dst, src FROM eg) t
       |  WHERE src <> dst),
       |c0 AS MATERIALIZED (SELECT v.id, CAST(COALESCE(d.c, 0) AS BIGINT) AS core
       |  FROM vg v LEFT JOIN (SELECT a, COUNT(*) AS c FROM e2 GROUP BY 1) d ON d.a = v.id),
       |$iters
       |SELECT CASE id // $T WHEN 1 THEN 'region' WHEN 2 THEN 'nation' WHEN 3 THEN 'customer'
       |  WHEN 4 THEN 'supplier' WHEN 5 THEN 'part' ELSE 'order' END AS kind,
       |  id % $T AS uid, core FROM c$rounds
       |UNION ALL SELECT 'NOT_CONVERGED', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |WHERE (SELECT SUM(core) FROM c$rounds) <> (SELECT SUM(core) FROM c${rounds - 1})""".stripMargin
  }

  /** k-truss oracle over the co-location fixture: fixed synchronous support-
    * peeling rounds (support via the naive common-neighbor join — fine at
    * oracle scale; the engine uses the oriented enumeration), mirroring
    * Analytics.kTruss round for round. Peeling is monotone, so count
    * equality of the last two rounds ⟺ set convergence; otherwise the
    * NOT_CONVERGED sentinel row fails the compare loudly. */
  private def ktrussOracle(k: Int, rounds: Int): String = {
    val T = 1L << graft.core.GraphIds.TagBits
    val cu = TpchGraph.CustomerTag.toLong * T
    val su = TpchGraph.SupplierTag.toLong * T
    val na = TpchGraph.NationTag.toLong * T
    val iters = (1 to rounds).map { r =>
      s"""b${r - 1} AS MATERIALIZED (
         |  SELECT u AS p, v AS q FROM t${r - 1} UNION ALL SELECT v, u FROM t${r - 1}),
         |t$r AS MATERIALIZED (SELECT e.u, e.v FROM t${r - 1} e
         |  JOIN b${r - 1} x ON x.p = e.u JOIN b${r - 1} y ON y.p = e.v AND y.q = x.q
         |  GROUP BY 1, 2 HAVING COUNT(*) >= ${k - 2})""".stripMargin
    }.mkString(",\n")
    s"""WITH cn AS (SELECT $cu + c_custkey AS c, c_nationkey AS nk FROM customer),
       |sn AS (SELECT $su + s_suppkey AS s, s_nationkey AS nk FROM supplier),
       |t0 AS MATERIALIZED (
       |  SELECT LEAST(c, $na + nk) AS u, GREATEST(c, $na + nk) AS v FROM cn
       |  UNION
       |  SELECT LEAST(s, $na + nk), GREATEST(s, $na + nk) FROM sn
       |  UNION
       |  SELECT LEAST(c, s), GREATEST(c, s) FROM cn JOIN sn USING (nk)),
       |$iters
       |SELECT u, v FROM t$rounds
       |UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |WHERE (SELECT COUNT(*) FROM t$rounds) <> (SELECT COUNT(*) FROM t${rounds - 1})""".stripMargin
  }

  /** Ego-network oracle: k rounds of undirected frontier expansion from the
    * seed, then the label census and induced edge count over reached ∩
    * vertex-table ids (the engine inducts against SURVIVING vertices, so a
    * dangling endpoint inside k hops contributes neither a vertex nor its
    * edge) — mirrors GraphOps.egoNetwork. */
  private def egoOracle(seedId: Long, k: Int): String = {
    // k = 0 must not leave a dangling comma after r0 (engine supports it:
    // the ego of a seed set at zero hops is the seed set itself)
    val rounds = (1 to k).map { r =>
      s""",r$r AS MATERIALIZED (SELECT id FROM r${r - 1}
         |  UNION SELECT b.v FROM b JOIN r${r - 1} x ON b.u = x.id)""".stripMargin
    }.mkString("\n")
    s"""WITH $graphCtes,
       |b AS MATERIALIZED (SELECT src AS u, dst AS v FROM eg UNION ALL SELECT dst, src FROM eg),
       |r0 AS MATERIALIZED (SELECT CAST($seedId AS BIGINT) AS id)
       |$rounds
       |,rv AS MATERIALIZED (SELECT id FROM r$k INTERSECT SELECT id FROM vg)
       |SELECT CASE id // $T WHEN 1 THEN 'region' WHEN 2 THEN 'nation'
       |  WHEN 3 THEN 'customer' WHEN 4 THEN 'supplier' WHEN 5 THEN 'part'
       |  ELSE 'order' END AS label, COUNT(*) AS cnt FROM rv GROUP BY 1
       |UNION ALL SELECT '~edges', COUNT(*) FROM eg
       |WHERE src IN (SELECT id FROM rv) AND dst IN (SELECT id FROM rv)""".stripMargin
  }

  /** Random-walks oracle (mirrors Analytics.randomWalks): ranked distinct
    * out-neighbors, then one CTE per step picking rank = (low-48-bit md5 of
    * ":walk:vertex:step") mod outdeg + 1 — md5 over identical decimal
    * renderings on both engines, non-negative so % ≡ pmod. */
  private def randomWalksOracle(seeds: Seq[Long], steps: Int,
      walksPerSeed: Int): String = {
    val starts = (for (s0 <- seeds; wk <- 1 to walksPerSeed)
      yield s"(${s0 * 100L + wk}, $s0)").mkString(", ")
    val hops = (1 to steps).map { k =>
      s""",w$k AS MATERIALIZED (SELECT p.walk, p.seed, CAST($k AS BIGINT) AS step, n.dst AS id
         |  FROM w${k - 1} p JOIN nbr n ON n.src = p.id
         |  AND n.rk = (('0x' || substr(md5(':' || CAST(p.walk AS VARCHAR) || ':' ||
         |    CAST(p.id AS VARCHAR) || ':$k'), 21, 12))::BIGINT % n.deg) + 1)""".stripMargin
    }.mkString("\n")
    val selects = (0 to steps).map(k => s"SELECT walk, seed, step, id FROM w$k")
      .mkString("\nUNION ALL ")
    s"""WITH $graphCtes,
       |nbr AS MATERIALIZED (SELECT src, dst,
       |  ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rk,
       |  COUNT(*) OVER (PARTITION BY src) AS deg
       |  FROM (SELECT DISTINCT src, dst FROM eg)),
       |w0 AS MATERIALIZED (SELECT walk, seed, CAST(0 AS BIGINT) AS step, seed AS id
       |  FROM (VALUES $starts) t(walk, seed))
       |$hops
       |$selects""".stripMargin
  }

  /** Non-backtracking-walks oracle (mirrors Analytics.nonBacktrackingWalks):
    * candidates re-rank per walk AFTER the prev-exclusion each step (the
    * rank cannot be precomputed), same md5 draw as the first-order oracle. */
  private def nonBacktrackingOracle(seeds: Seq[Long], steps: Int,
      walksPerSeed: Int): String = {
    val starts = (for (s0 <- seeds; wk <- 1 to walksPerSeed)
      yield s"(${s0 * 100L + wk}, $s0)").mkString(", ")
    val hops = (1 to steps).map { k =>
      s""",w$k AS MATERIALIZED (
         |  SELECT walk, seed, CAST($k AS BIGINT) AS step, dst AS id, cur AS prev FROM (
         |    SELECT p.walk, p.seed, p.id AS cur, n.dst,
         |      ROW_NUMBER() OVER (PARTITION BY p.walk ORDER BY n.dst) AS rk,
         |      COUNT(*) OVER (PARTITION BY p.walk) AS deg
         |    FROM w${k - 1} p JOIN nb n ON n.src = p.id
         |    WHERE p.prev IS NULL OR n.dst <> p.prev)
         |  WHERE rk = (('0x' || substr(md5(':' || CAST(walk AS VARCHAR) || ':' ||
         |    CAST(cur AS VARCHAR) || ':$k'), 21, 12))::BIGINT % deg) + 1)""".stripMargin
    }.mkString("\n")
    val selects = (0 to steps).map(k => s"SELECT walk, seed, step, id FROM w$k")
      .mkString("\nUNION ALL ")
    s"""WITH $graphCtes,
       |nb AS MATERIALIZED (SELECT DISTINCT src, dst FROM eg),
       |w0 AS MATERIALIZED (SELECT walk, seed, CAST(0 AS BIGINT) AS step, seed AS id,
       |  CAST(NULL AS BIGINT) AS prev FROM (VALUES $starts) t(walk, seed))
       |$hops
       |$selects""".stripMargin
  }

  /** Bipartite-coloring oracle: fixed UNDIRECTED BFS rounds from the seed,
    * color = distance parity over reached vertices, plus the (−1, odd-edge
    * count) sentinel over colored endpoints — mirrors
    * Analytics.bipartiteColoring (per-edge-ROW conflict counting). */
  private def bipartiteOracle(seedId: Long, rounds: Int): String = {
    val iters = (1 to rounds).map { k =>
      s"""m$k AS MATERIALIZED (SELECT p.id,
         |  CASE WHEN n.nd IS NULL THEN p.d WHEN p.d IS NULL THEN n.nd
         |       WHEN n.nd < p.d THEN n.nd ELSE p.d END AS d
         |  FROM m${k - 1} p LEFT JOIN (
         |    SELECT b.v AS id, MIN(q.d + 1) AS nd FROM b
         |    JOIN m${k - 1} q ON q.id = b.u WHERE q.d IS NOT NULL GROUP BY 1) n
         |  ON n.id = p.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |b AS MATERIALIZED (SELECT src AS u, dst AS v FROM eg UNION ALL SELECT dst, src FROM eg),
       |m0 AS MATERIALIZED (SELECT vg.id,
       |  CASE WHEN vg.id = $seedId THEN CAST(0 AS BIGINT) END AS d FROM vg),
       |$iters,
       |colors AS MATERIALIZED (SELECT id, d % 2 AS c FROM m$rounds WHERE d IS NOT NULL)
       |SELECT id, c AS color FROM colors
       |UNION ALL SELECT CAST(-1 AS BIGINT), COUNT(*) FROM eg
       |JOIN colors ca ON ca.id = eg.src JOIN colors cb ON cb.id = eg.dst
       |WHERE ca.c = cb.c""".stripMargin
  }

  /** Topological-layering oracle: fixed Kahn peeling rounds (mirrors
    * Analytics.topologicalLayers — peel r assigns layer r−1), survivors
    * after `rounds` emitted at layer −1. */
  private def topoLayersOracle(rounds: Int): String = {
    val iters = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT x.id FROM a${r - 1} x WHERE NOT EXISTS (
         |  SELECT 1 FROM eg JOIN a${r - 1} s ON s.id = eg.src WHERE eg.dst = x.id)),
         |a$r AS MATERIALIZED (SELECT id FROM a${r - 1}
         |  EXCEPT SELECT id FROM p$r)""".stripMargin
    }.mkString(",\n")
    val layerSelects = (1 to rounds).map { r =>
      s"SELECT id, CAST(${r - 1} AS BIGINT) AS layer FROM p$r" }
    s"""WITH $graphCtes,
       |a0 AS MATERIALIZED (SELECT id FROM vg),
       |$iters
       |${layerSelects.mkString("\nUNION ALL ")}
       |UNION ALL SELECT id, CAST(-1 AS BIGINT) FROM a$rounds""".stripMargin
  }

  /** Deterministic LPA oracle (mirrors Analytics.labelPropagationExact):
    * per round, per-vertex neighbor-label frequencies, adopt argmax with
    * (count DESC, label ASC) tie-break; isolated vertices keep their label. */
  private def lpaCtes(rounds: Int): String = {
    val iters = (1 to rounds).map { k =>
      s"""f$k AS MATERIALIZED (SELECT e2.src AS id, q.l AS l, COUNT(*) AS c
         |  FROM e2 JOIN a${k - 1} q ON q.id = e2.dst GROUP BY 1, 2),
         |x$k AS MATERIALIZED (SELECT id, l FROM (
         |  SELECT id, l, ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, l ASC) AS rn
         |  FROM f$k) WHERE rn = 1),
         |a$k AS MATERIALIZED (SELECT p.id, COALESCE(x.l, p.l) AS l
         |  FROM a${k - 1} p LEFT JOIN x$k x ON x.id = p.id)""".stripMargin
    }.mkString(",\n")
    s"""$graphCtes,
       |e2 AS MATERIALIZED (SELECT src, dst FROM eg UNION ALL SELECT dst, src FROM eg),
       |a0 AS MATERIALIZED (SELECT id, id AS l FROM vg),
       |$iters""".stripMargin
  }

  private def lpaOracle(rounds: Int): String =
    s"""WITH ${lpaCtes(rounds)}
       |SELECT id, l AS community FROM a$rounds""".stripMargin

  /** Community-stats oracle: LPA labels (same CTEs as q_lpa) scored with
    * communityStats' exact integer arithmetic — internal/cut per edge row,
    * volume, conductance ×1e6, and the floor-scaled modularity term. */
  private def communityStatsOracle(rounds: Int): String =
    s"""WITH ${lpaCtes(rounds)},
       |lab AS MATERIALIZED (SELECT id, l AS community FROM a$rounds),
       |el AS MATERIALIZED (SELECT a.community AS cs, b.community AS cd
       |  FROM eg JOIN lab a ON a.id = eg.src JOIN lab b ON b.id = eg.dst),
       |per AS MATERIALIZED (SELECT community,
       |  CAST(SUM(i) AS BIGINT) AS ie, CAST(SUM(cu) AS BIGINT) AS ce FROM (
       |  SELECT cs AS community, CASE WHEN cs = cd THEN 1 ELSE 0 END AS i,
       |    CASE WHEN cs <> cd THEN 1 ELSE 0 END AS cu FROM el
       |  UNION ALL SELECT cd, 0, 1 FROM el WHERE cs <> cd) t GROUP BY 1),
       |sz AS MATERIALIZED (SELECT community, COUNT(*) AS size FROM lab GROUP BY 1),
       |mt AS (SELECT COUNT(*) AS m FROM el)
       |SELECT s.community, s.size,
       |  COALESCE(p.ie, 0) AS internal_edges, COALESCE(p.ce, 0) AS cut_edges,
       |  COALESCE(p.ie, 0) * 2 + COALESCE(p.ce, 0) AS volume,
       |  CASE WHEN LEAST(COALESCE(p.ie, 0) * 2 + COALESCE(p.ce, 0),
       |      mt.m * 2 - (COALESCE(p.ie, 0) * 2 + COALESCE(p.ce, 0))) <= 0 THEN 0
       |    ELSE COALESCE(p.ce, 0) * 1000000 //
       |      LEAST(COALESCE(p.ie, 0) * 2 + COALESCE(p.ce, 0),
       |        mt.m * 2 - (COALESCE(p.ie, 0) * 2 + COALESCE(p.ce, 0))) END
       |    AS conductance_x1e6,
       |  CASE WHEN mt.m = 0 THEN 0 ELSE
       |    (1000000000000 // mt.m) * COALESCE(p.ie, 0)
       |    + ((1000000000000 % mt.m) * COALESCE(p.ie, 0)) // mt.m
       |    - (((COALESCE(p.ie, 0) * 2 + COALESCE(p.ce, 0)) * 1000000) // (mt.m * 2))
       |      * (((COALESCE(p.ie, 0) * 2 + COALESCE(p.ce, 0)) * 1000000) // (mt.m * 2)) END
       |    AS modularity_term_x1e12
       |FROM sz s LEFT JOIN per p ON p.community = s.community CROSS JOIN mt""".stripMargin

  private def ccOracle(rounds: Int): String =
    s"""WITH $graphCtes,
       |e2 AS MATERIALIZED (SELECT src, dst FROM eg UNION ALL SELECT dst, src FROM eg),
       |c0 AS MATERIALIZED (SELECT id, id AS l FROM vg),
       |${minLabelIters("c", rounds)}
       |SELECT id, l AS component FROM c$rounds""".stripMargin

  /** Transitive-dedup oracle: exact n-gram Jaccard pairs (same CTEs as
    * ngramJaccardOracle) → `rounds` min-label-propagation iterations over the
    * pair graph (clusters are tiny chains, diameter ≪ rounds ⇒ converged =
    * GraphX connectedComponents) → survivors are docs that are not a
    * non-minimum member of any component. */
  /** Semantic-dedup oracle: same deterministic centroids + nearest-centroid
    * assignment as the q_ivf_topk oracle, within-cluster cosine pairs, then
    * `rounds` min-label iterations (duplicate components are tiny — diameter
    * ≪ rounds ⇒ converged = GraphX connectedComponents). */
  /** CTE chain mirroring Similarity.kMeansCentroids over `embeddings`:
    * cents0 = the nlist vectors with the smallest md5(vec_id) (the
    * hash-sampled seed — both engines hash the identical decimal rendering
    * of the id to lowercase hex, so the order matches bit-for-bit); each
    * round r: rank-1 cosine assignment against cents{r-1}, then per-dim
    * DECIMAL(27,10)-accumulated mean rounded to 6 dp, re-listed in dim
    * order. Yields `cents{rounds}`. The 6-dp rounding on BOTH sides is what
    * makes the centroid doubles bit-identical across engines (the proven
    * q_embed_meanpool recipe). */
  private def kmeansCtes(nlist: Int, rounds: Int): String =
    kmeansCtesOver("embeddings", "", nlist, rounds)

  /** The same k-means CTE chain over an arbitrary (vec_id, embedding)
    * source CTE, every CTE name prefixed with `pre` so multiple
    * instantiations coexist in one WITH (PQ mirrors one chain per
    * subspace). `pre=""`+`src=embeddings` reproduces [[kmeansCtes]]. */
  private def kmeansCtesOver(src: String, pre: String, nlist: Int, rounds: Int): String = {
    val init =
      s"""${pre}cents0 AS MATERIALIZED (
         |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
         |    CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM $src ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nlist)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""${pre}kasg$r AS MATERIALIZED (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT e.vec_id, e.embedding, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
         |    FROM $src e CROSS JOIN ${pre}cents${r - 1} c) WHERE rn = 1),
         |${pre}cm$r AS MATERIALIZED (
         |  SELECT cid, dim, round(CAST(SUM(CAST(e AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS m FROM (
         |    SELECT cid, unnest(range(len(embedding))) AS dim, unnest(CAST(embedding AS DOUBLE[])) AS e
         |    FROM ${pre}kasg$r) GROUP BY 1, 2),
         |${pre}cents$r AS MATERIALIZED (SELECT cid, list(m ORDER BY dim) AS cvec FROM ${pre}cm$r GROUP BY 1)""".stripMargin
    }
    (init +: rs).mkString(",\n")
  }

  /** Per-subspace PQ CTE blocks: sliced source `sub{s}`, k-means chain
    * `s{s}_cents{rounds}`, rank-1 code assignment `asg{s}` (vec_id, code{s})
    * — mirrors Similarity.pqEncode CTE-for-CTE (subspace s covers 1-based
    * dims [s·sub+1, (s+1)·sub]). */
  /** `trainSrc` ≠ "embeddings" freezes codebook training on that CTE while
    * the encode (asg) still covers the full corpus — the persisted-index
    * APPEND semantics. */
  private def pqBlocks(m: Int, k: Int, rounds: Int, dim: Int,
      trainSrc: String = "embeddings"): Seq[String] = {
    val sub = dim / m
    (0 until m).map { s =>
      val train =
        if (trainSrc == "embeddings") ""
        else
          s"""subtrain$s AS MATERIALIZED (SELECT vec_id,
             |  CAST(embedding[${s * sub + 1}:${(s + 1) * sub}] AS DOUBLE[]) AS embedding FROM $trainSrc),
             |""".stripMargin
      val kSrc = if (trainSrc == "embeddings") s"sub$s" else s"subtrain$s"
      s"""sub$s AS MATERIALIZED (SELECT vec_id,
         |  CAST(embedding[${s * sub + 1}:${(s + 1) * sub}] AS DOUBLE[]) AS embedding FROM embeddings),
         |$train${kmeansCtesOver(kSrc, s"s${s}_", k, rounds)},
         |asg$s AS MATERIALIZED (
         |  SELECT vec_id, cid AS code$s FROM (
         |    SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
         |    FROM sub$s e CROSS JOIN s${s}_cents$rounds c) WHERE rn = 1)""".stripMargin
    }
  }

  private def pqEncodeOracle(m: Int, k: Int, rounds: Int, dim: Int): String = {
    val joins = (1 until m).map(s => s"JOIN asg$s USING (vec_id)").mkString(" ")
    val cols = (0 until m).map(s => s"code$s").mkString(", ")
    s"WITH ${pqBlocks(m, k, rounds, dim).mkString(",\n")}\nSELECT vec_id, $cols FROM asg0 $joins"
  }

  /** IVF-PQ top-k oracle: the UNprefixed full-vector k-means chain gives
    * coarse buckets (rank-1 per vector) and the query's nprobe nearest
    * buckets; candidates are bucket-restricted, then ADC-scored exactly as
    * in [[pqTopKOracle]] (name spaces don't collide: coarse CTEs are
    * cents/kasg/cm, subspace CTEs are s{n}_-prefixed). */
  private def ivfPqTopKOracle(nlist: Int, nprobe: Int, m: Int, k: Int,
      codes: Int, rounds: Int, dim: Int, maxQid: Int,
      trainSrc: String = "embeddings", preCtes: String = ""): String = {
    val luts = (0 until m).map { s =>
      s"""lut$s AS MATERIALIZED (
         |  SELECT q.vec_id AS qid, c.cid AS code$s,
         |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) AS sim$s
         |  FROM sub$s q CROSS JOIN s${s}_cents$rounds c WHERE q.vec_id < $maxQid)""".stripMargin
    }
    val encJoin = (1 until m).map(s => s"JOIN asg$s USING (vec_id)").mkString(" ")
    val lutJoins = (0 until m).map(s =>
      s"JOIN lut$s ON lut$s.code$s = a.code$s AND lut$s.qid = prb.qid").mkString(" ")
    val score = (0 until m).map(s => s"lut$s.sim$s").mkString(" + ")
    val codeCols = (0 until m).map(s => s"code$s").mkString(", ")
    s"""WITH $preCtes${kmeansCtesOver(trainSrc, "", nlist, rounds)},
       |bkt AS MATERIALIZED (
       |  SELECT vec_id, cid AS bucket FROM (
       |    SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cents$rounds c) WHERE rn = 1),
       |prb AS MATERIALIZED (
       |  SELECT qid, cid AS bucket FROM (
       |    SELECT q.vec_id AS qid, c.cid, ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
       |    FROM embeddings q CROSS JOIN cents$rounds c WHERE q.vec_id < $maxQid) WHERE rn <= $nprobe),
       |${(pqBlocks(m, codes, rounds, dim, trainSrc) ++ luts).mkString(",\n")},
       |scored AS (
       |  SELECT prb.qid, a.vec_id AS nid, $score AS score
       |  FROM (SELECT asg0.vec_id, $codeCols, b.bucket
       |        FROM asg0 $encJoin JOIN bkt b USING (vec_id)) a
       |  JOIN prb ON prb.bucket = a.bucket
       |  $lutJoins
       |  WHERE a.vec_id <> prb.qid)
       |SELECT qid, nid, "rank" FROM (
       |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY score DESC, nid) AS "rank" FROM scored)
       |WHERE "rank" <= $k""".stripMargin
  }

  /** Random-projection oracle: the SAME seeded ±1 direction matrix inlined
    * as a VALUES list (both sides call lshDirections), and the SAME exact
    * DECIMAL pipeline as the engine — elements pinned to 6 dp as doubles
    * before the decimal cast, the ±1 sum exact, the 1/√outDim factor the
    * identical fixed-decimal literal (invSqrtDecimal.toPlainString), and the
    * final 6-dp rounding ON THE DECIMAL, cast to double last. Rounding a
    * tie-adjacent DOUBLE quotient is where Spark (shortest-repr HALF_UP) and
    * DuckDB (full-binary nearest) disagree; exact decimals round identically
    * in both. Mirrors Similarity.randomProject cell-for-cell. */
  private def randomProjectOracle(outDim: Int, dim: Int, seed: Long = 42L): String = {
    val dirs = graft.pipeline.Similarity.lshDirections(dim, outDim, seed)
    val values = (for (j <- 0 until outDim; i <- 0 until dim)
      yield s"($j,$i,${dirs(j)(i).toInt})").mkString(",")
    val inv = graft.pipeline.Similarity.invSqrtDecimal(outDim)
    val sumP = graft.pipeline.Similarity.sumPrecision(inv)
    s"""WITH dirs(j, i, s) AS (VALUES $values),
       |e AS (SELECT vec_id, unnest([{'i': i-1, 'v': embedding[i]}
       |    for i in range(1, len(embedding)+1)], recursive := true) FROM embeddings)
       |SELECT e.vec_id, d.j AS dim,
       |  CAST(ROUND(
       |    CAST(SUM(CAST(ROUND(CAST(e.v AS DOUBLE), 6) AS DECIMAL(16,6)) * d.s) AS DECIMAL($sumP,10))
       |      * CAST(${inv.toPlainString} AS DECIMAL(${inv.precision},${inv.scale})), 6) AS DOUBLE) AS val
       |FROM e JOIN dirs d ON d.i = e.i GROUP BY 1, 2""".stripMargin
  }

  /** PQ ADC top-k oracle: the pqBlocks chains plus one per-query lookup
    * table per subspace (query subvector × every codeword), candidate score
    * = sim0 + sim1 + … in FIXED subspace order (mirrors the engine's
    * left-to-right projection), rank-1..k per query by (score desc, nid). */
  private def pqTopKOracle(m: Int, k: Int, codes: Int, rounds: Int, dim: Int,
      maxQid: Int): String = {
    val luts = (0 until m).map { s =>
      s"""lut$s AS MATERIALIZED (
         |  SELECT q.vec_id AS qid, c.cid AS code$s,
         |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) AS sim$s
         |  FROM sub$s q CROSS JOIN s${s}_cents$rounds c WHERE q.vec_id < $maxQid)""".stripMargin
    }
    val encJoin = (1 until m).map(s => s"JOIN asg$s USING (vec_id)").mkString(" ")
    val lutJoins = (0 until m).map(s =>
      s"JOIN lut$s ON lut$s.code$s = a.code$s" +
        (if (s == 0) "" else s" AND lut$s.qid = lut0.qid")).mkString(" ")
    val score = (0 until m).map(s => s"lut$s.sim$s").mkString(" + ")
    s"""WITH ${(pqBlocks(m, codes, rounds, dim) ++ luts).mkString(",\n")},
       |scored AS (
       |  SELECT lut0.qid, a.vec_id AS nid, $score AS score
       |  FROM (SELECT asg0.vec_id, ${(0 until m).map(s => s"code$s").mkString(", ")}
       |        FROM asg0 $encJoin) a
       |  $lutJoins
       |  WHERE a.vec_id <> lut0.qid)
       |SELECT qid, nid, "rank" FROM (
       |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY score DESC, nid) AS "rank" FROM scored)
       |WHERE "rank" <= $k""".stripMargin
  }

  private def semanticDedupOracle(rounds: Int, threshold: Double, nlist: Int): String = {
    val iters = minLabelIters("k", rounds)
    s"""WITH ${kmeansCtes(nlist, 2)},
       |asg AS MATERIALIZED (
       |  SELECT vec_id AS id, embedding AS v, cid FROM (
       |    SELECT e.vec_id, e.embedding, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cents2 c) WHERE rn = 1),
       |pairs AS MATERIALIZED (
       |  SELECT a.id AS ida, b.id AS idb FROM asg a JOIN asg b ON a.cid = b.cid AND a.id < b.id
       |  WHERE list_cosine_similarity(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) >= $threshold),
       |e2 AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM pairs
       |  UNION ALL SELECT idb, ida FROM pairs),
       |k0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS l FROM e2),
       |$iters
       |SELECT e.vec_id, e.label FROM embeddings e
       |WHERE NOT EXISTS (SELECT 1 FROM k$rounds c WHERE c.id = e.vec_id AND c.l <> e.vec_id)
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(-1 AS INTEGER)
       |WHERE EXISTS (SELECT 1 FROM k$rounds a JOIN k${rounds - 1} b
       |  ON a.id = b.id AND a.l <> b.l)""".stripMargin
  }

  private def dedupDocsOracle(rounds: Int): String = {
    val iters = minLabelIters("k", rounds)
    s"""WITH w AS (SELECT doc_id, string_split_regex(text,'\\s+') AS wl FROM documents),
       |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
       |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
       |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
       |pairs AS MATERIALIZED (SELECT ida, idb FROM (
       |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
       |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) p
       |  JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
       |  WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.8),
       |e2 AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM pairs
       |  UNION ALL SELECT idb, ida FROM pairs),
       |k0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS l FROM e2),
       |$iters
       |SELECT d.doc_id, d.n_chars FROM documents d
       |WHERE NOT EXISTS (SELECT 1 FROM k$rounds c WHERE c.id = d.doc_id AND c.l <> d.doc_id)
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |WHERE EXISTS (SELECT 1 FROM k$rounds a JOIN k${rounds - 1} b
       |  ON a.id = b.id AND a.l <> b.l)""".stripMargin
  }

  /** Loser→survivor remap oracle (Dedup.survivorMap): the dedupDocsOracle
    * pair graph + min-label CC (the converged label IS the component min =
    * the survivor), emitting one (loser, survivor) row per non-minimum
    * member; the same (-1, -1) NOT_CONVERGED sentinel. */
  private def survivorMapOracle(rounds: Int): String = {
    val iters = minLabelIters("k", rounds)
    s"""WITH w AS (SELECT doc_id, string_split_regex(text,'\\s+') AS wl FROM documents),
       |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
       |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
       |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
       |pairs AS MATERIALIZED (SELECT ida, idb FROM (
       |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
       |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) p
       |  JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
       |  WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.8),
       |e2 AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM pairs
       |  UNION ALL SELECT idb, ida FROM pairs),
       |k0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS l FROM e2),
       |$iters
       |SELECT id AS loser, l AS survivor FROM k$rounds WHERE l <> id
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |WHERE EXISTS (SELECT 1 FROM k$rounds a JOIN k${rounds - 1} b
       |  ON a.id = b.id AND a.l <> b.l)""".stripMargin
  }

  /** Cluster-size histogram oracle (Dedup.dedupStats): same exact-Jaccard
    * pair graph + min-label CC as dedupDocsOracle, then component sizes →
    * histogram, with unpaired docs folded in as size-1 clusters and the same
    * NOT_CONVERGED sentinel. */
  private def dedupStatsOracle(rounds: Int): String = {
    val iters = minLabelIters("k", rounds)
    s"""WITH w AS (SELECT doc_id, string_split_regex(text,'\\s+') AS wl FROM documents),
       |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
       |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
       |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
       |pairs AS MATERIALIZED (SELECT ida, idb FROM (
       |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
       |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) p
       |  JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
       |  WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.8),
       |e2 AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM pairs
       |  UNION ALL SELECT idb, ida FROM pairs),
       |k0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS l FROM e2),
       |$iters,
       |comp AS (SELECT l, COUNT(*) AS cluster_size FROM k$rounds GROUP BY 1),
       |hist AS (
       |  SELECT cluster_size, COUNT(*) AS n_clusters FROM comp GROUP BY 1
       |  UNION ALL SELECT CAST(1 AS BIGINT),
       |    (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM k$rounds))
       |SELECT cluster_size, n_clusters FROM (
       |  SELECT cluster_size, CAST(SUM(n_clusters) AS BIGINT) AS n_clusters
       |  FROM hist GROUP BY 1) WHERE n_clusters > 0
       |UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |WHERE EXISTS (SELECT 1 FROM k$rounds a JOIN k${rounds - 1} b
       |  ON a.id = b.id AND a.l <> b.l)""".stripMargin
  }

  /** Priority-survivor variant of dedupDocsOracle: within each duplicate
    * component keep the doc maximizing n_chars (ties → min doc_id), mirroring
    * Dedup.survivorsByPriority. Same CC fixed point + NOT_CONVERGED sentinel. */
  private def dedupPriorityOracle(rounds: Int): String = {
    val iters = minLabelIters("k", rounds)
    s"""WITH w AS (SELECT doc_id, string_split_regex(text,'\\s+') AS wl FROM documents),
       |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
       |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
       |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
       |pairs AS MATERIALIZED (SELECT ida, idb FROM (
       |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
       |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) p
       |  JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
       |  WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.8),
       |e2 AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM pairs
       |  UNION ALL SELECT idb, ida FROM pairs),
       |k0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS l FROM e2),
       |$iters,
       |surv AS (SELECT id FROM (
       |  SELECT c.id, row_number() OVER (PARTITION BY c.l
       |    ORDER BY d.n_chars DESC, c.id ASC) AS rn
       |  FROM k$rounds c JOIN documents d ON d.doc_id = c.id) WHERE rn = 1)
       |SELECT d.doc_id, d.n_chars FROM documents d
       |WHERE d.doc_id NOT IN (SELECT id FROM k$rounds)
       |   OR d.doc_id IN (SELECT id FROM surv)
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |WHERE EXISTS (SELECT 1 FROM k$rounds a JOIN k${rounds - 1} b
       |  ON a.id = b.id AND a.l <> b.l)""".stripMargin
  }

  /** Rates for the q_mixture_sample probe: a skewed training mix over the
    * synthetic sources (unlisted sources default to rate 0 = dropped). */
  private val MixtureRates: Map[String, Double] = Map(
    "src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)

  /** Mirror of TextAnalysis.mixtureSample(MixtureRates): md5-bucket of the
    * doc id vs the source's rate — both engines hash the identical ":<id>"
    * string, so the kept set is bit-identical. */
  private def mixtureSampleOracle: String = {
    val cases = MixtureRates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN '$s' THEN $r" }.mkString(" ")
    s"""SELECT doc_id, source FROM documents
       |WHERE CAST(('0x' || substr(md5(':' || CAST(doc_id AS VARCHAR)), 21, 12))::BIGINT % 1000000 AS DOUBLE)
       |  < (CASE source $cases ELSE 0.0 END) * 1000000.0""".stripMargin
  }

  /** Vocabulary weights for the q_quality_linear probe — a hand-weighted
    * linear model over the synthetic corpus vocabulary. */
  private val QualityVocab: Map[String, Double] = Map(
    "spark" -> 1.2, "stream" -> 0.6, "scan" -> 0.4, "hash" -> 0.3,
    "merge" -> 0.2, "window" -> -0.2, "batch" -> -0.4, "dup" -> -2.5)

  /** Mirror of TextAnalysis.scoreLinear(QualityVocab): DECIMAL(18,6) weight
    * accumulation on both engines, one DOUBLE divide per document. */
  private def qualityLinearOracle(weights: Map[String, Double],
      bias: Double, threshold: Double): String = {
    val cases = weights.toSeq.sortBy(_._1)
      .map { case (t, w) => s"WHEN '$t' THEN CAST($w AS DECIMAL(18,6))" }
      .mkString(" ")
    s"""WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
       |           FROM documents),
       |j AS (SELECT doc_id, CASE token $cases ELSE NULL END AS w FROM t),
       |g AS (SELECT doc_id, COUNT(*) AS n_tokens,
       |        round($bias + CAST(COALESCE(SUM(w), 0) AS DOUBLE) / COUNT(*), 6) AS score
       |      FROM j GROUP BY 1)
       |SELECT doc_id, n_tokens, score, score >= $threshold AS keep FROM g""".stripMargin
  }

  /** Weights for the split probes (assignment order matters). */
  private val SplitWeights: Seq[(String, Double)] = Seq(
    "train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Mirror of TextAnalysis.hashSplit: identical md5 bucket integers vs the
    * same Scala-rounded integer thresholds, so assignment is bit-identical. */
  private def hashSplitOracle(weights: Seq[(String, Double)], salt: String): String = {
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => math.round(f * 1000000.0)).dropRight(1)
    val cases = weights.map(_._1).zip(cuts)
      .map { case (n, c) => s"WHEN b < $c THEN '$n'" }.mkString(" ")
    s"""SELECT doc_id, CASE $cases ELSE '${weights.last._1}' END AS split FROM (
       |  SELECT doc_id,
       |    ('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 21, 12))::BIGINT % 1000000 AS b
       |  FROM documents)""".stripMargin
  }

  /** Mirror of TextAnalysis.stratifiedSplit: same per-stratum rank over the
    * md5 shuffle key, same IEEE cut doubles (Scala Double.toString round-trips
    * through DuckDB's parser), so the ceil boundaries agree exactly. */
  private def stratifiedSplitOracle(weights: Seq[(String, Double)], salt: String): String = {
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val cases = weights.map(_._1).zip(cuts)
      .map { case (nm, c) => s"WHEN rk <= CAST(ceil($c * n) AS BIGINT) THEN '$nm'" }
      .mkString(" ")
    s"""SELECT doc_id, source, CASE $cases ELSE '${weights.last._1}' END AS split FROM (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5('$salt:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM documents)""".stripMargin
  }

  /** Mirror of TextAnalysis.chunkDocuments: chunk i covers tokens
    * [i·stride, i·stride+maxTokens), last chunk = first window reaching the
    * end (ceil((n-maxTokens)/stride) in integer arithmetic on both sides). */
  private def chunkOracle(maxTokens: Int, overlap: Int): String = {
    val s = maxTokens - overlap
    s"""WITH w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS wl FROM documents),
       |c AS (SELECT doc_id, wl, len(wl) AS n,
       |  unnest(range(0, CASE WHEN len(wl) <= $maxTokens THEN 1
       |    ELSE CAST(ceil(CAST(len(wl) - $maxTokens AS DOUBLE) / $s) AS BIGINT) + 1 END)) AS i
       |  FROM w)
       |SELECT doc_id, i AS chunk_id,
       |  array_to_string(wl[i*$s + 1 : i*$s + $maxTokens], ' ') AS chunk_text,
       |  least($maxTokens, n - i*$s)::BIGINT AS n_tokens
       |FROM c""".stripMargin
  }

  /** Mirror of Dedup.contamination(n=8) with eval = doc_id < 20: distinct
    * 8-gram shingles per doc (same index arithmetic as the Jaccard oracles),
    * corpus side inner-joined against the eval side's distinct gram set. */
  private def contaminationOracle: String = {
    val gram = (0 until 8).map(j => if (j == 0) "wl[i]" else s"wl[i+$j]").mkString("||' '||")
    s"""WITH w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS wl FROM documents),
       |sh AS (SELECT doc_id, list_distinct([$gram for i in range(1, len(wl)-6)]) AS gs FROM w WHERE len(wl) >= 8),
       |eg AS (SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id < 20),
       |cg AS (SELECT doc_id, unnest(gs) AS g FROM sh WHERE doc_id >= 20)
       |SELECT doc_id, COUNT(*) AS n_shared FROM cg JOIN eg USING (g) GROUP BY doc_id""".stripMargin
  }

  /** Mirror of Dedup.contaminationOverlap (n=3, threshold 0.2): distinct
    * corpus trigrams LEFT-join the eval trigram set; per-doc counts give the
    * 6dp-rounded overlap fraction, thresholded identically. */
  private def contaminationOverlapOracle: String = {
    s"""WITH w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS wl FROM documents),
       |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2]
       |  for i in range(1, len(wl)-1)]) AS gs FROM w WHERE len(wl) >= 3),
       |eg AS (SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id < 20),
       |cg AS (SELECT doc_id, unnest(gs) AS g FROM sh WHERE doc_id >= 20),
       |j AS (SELECT cg.doc_id, COUNT(*) AS n_grams, COUNT(eg.g) AS n_shared
       |      FROM cg LEFT JOIN eg ON cg.g = eg.g GROUP BY cg.doc_id)
       |SELECT doc_id, n_grams, n_shared,
       |  ROUND(CAST(n_shared AS DOUBLE)/n_grams, 6) AS overlap
       |FROM j WHERE ROUND(CAST(n_shared AS DOUBLE)/n_grams, 6) >= 0.2""".stripMargin
  }

  /** Mirror of TextAnalysis.repetitionSignals: line metrics from list
    * arithmetic, top-{2,3}-gram char fraction via (chars DESC, gram DESC)
    * — the same tie-break as Spark's max(struct(chars, gram)). */
  private def repetitionOracle: String = {
    def gramCte(n: Int): String = {
      val gram = (0 until n).map(j => if (j == 0) "wl[i]" else s"wl[i+$j]").mkString("||' '||")
      s"""t$n AS (SELECT doc_id, len, g, COUNT(*) AS c FROM (
         |  SELECT doc_id, len, unnest([$gram for i in range(1, len(wl)-${n - 2})]) AS g
         |  FROM w WHERE len(wl) >= $n) GROUP BY doc_id, len, g),
         |m$n AS (SELECT doc_id, CAST(c*length(g) AS DOUBLE)/len AS f,
         |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c*length(g) DESC, g DESC) AS rn FROM t$n)""".stripMargin
    }
    s"""WITH base AS (SELECT doc_id, string_split(text, chr(10)) AS ls, length(text) AS len, text FROM documents),
       |w AS (SELECT doc_id, len, string_split_regex(text, '\\s+') AS wl FROM base),
       |lm AS (SELECT doc_id, len,
       |  CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls) AS dup_line_frac,
       |  CASE WHEN list_sum(list_transform(ls, x -> length(x))) = 0 THEN 0.0
       |    ELSE CAST(list_sum(list_transform(ls, x -> length(x))) - list_sum(list_transform(list_distinct(ls), x -> length(x))) AS DOUBLE)
       |      / list_sum(list_transform(ls, x -> length(x))) END AS dup_line_char_frac
       |  FROM base),
       |${gramCte(2)},
       |${gramCte(3)}
       |SELECT lm.doc_id, dup_line_frac, dup_line_char_frac,
       |  COALESCE(m2.f, 0.0) AS top2gram_char_frac,
       |  COALESCE(m3.f, 0.0) AS top3gram_char_frac
       |FROM lm
       |LEFT JOIN (SELECT doc_id, f FROM m2 WHERE rn = 1) m2 ON m2.doc_id = lm.doc_id
       |LEFT JOIN (SELECT doc_id, f FROM m3 WHERE rn = 1) m3 ON m3.doc_id = lm.doc_id""".stripMargin
  }

  /** Exact mirror of Similarity.lshCosinePairs(threshold=0.4, dim=64,
    * bits=64, bandBits=4, seed=42, maxBucketSize=∞): the seed-derived ±1
    * hyperplane directions are inlined as literal arrays (the same
    * driver-precomputed matrix the Spark plan uses), per-band 4-bit buckets
    * are assembled from projection signs, candidates join on (band, bucket),
    * and the true cosine verifies — both engines fold the dot product
    * left-to-right, so every projection, bucket, and cosine is bit-identical.
    * The probe disables the heavy-bucket cap to match: the SQL has no
    * equivalent exclusion, so with the default cap a skewed bucket would
    * diverge the two engines. */
  /** Shared CTE body for the banded-LSH pair join (e, bands, cand, ls). */
  private def lshPairCtes: String = {
    val dim = 64; val bits = 64; val bandBits = 4; val threshold = 0.4
    val dirs = graft.pipeline.Similarity.lshDirections(dim, bits)
    val bandSelects = (0 until bits / bandBits).map { b =>
      val bucket = (0 until bandBits).map { j =>
        val arr = dirs(b * bandBits + j).map(d => if (d > 0) "1.0" else "-1.0").mkString(",")
        s"(CASE WHEN list_dot_product(v, [$arr]) > 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $b AS band, $bucket AS bucket FROM e"
    }.mkString("\nUNION ALL\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |ls AS (SELECT ida, idb FROM cand
       |JOIN e ea ON ea.vec_id = ida JOIN e eb ON eb.vec_id = idb
       |WHERE list_cosine_similarity(ea.v, eb.v) >= $threshold)""".stripMargin
  }

  private def lshCosineOracle: String =
    s"WITH $lshPairCtes\nSELECT ida, idb FROM ls"

  /** Mirrors Similarity.lshQualityReport: exact pairs vs the banded join,
    * one agreement-counted summary row. */
  private def lshRecallOracle: String =
    s"""WITH $lshPairCtes,
       |ex AS (SELECT a.vec_id AS ida, b.vec_id AS idb FROM e a JOIN e b
       |  ON a.vec_id < b.vec_id AND list_cosine_similarity(a.v, b.v) >= 0.4),
       |ne AS (SELECT COUNT(*) AS n_exact FROM ex),
       |nl AS (SELECT COUNT(*) AS n_lsh FROM ls SEMI JOIN ex USING (ida, idb))
       |SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_lsh AS BIGINT) AS n_lsh,
       |  CAST(n_exact - n_lsh AS BIGINT) AS missed,
       |  CASE WHEN n_exact > 0 THEN CAST(n_lsh * 1000000 // n_exact AS BIGINT) END AS recall_x1e6
       |FROM ne CROSS JOIN nl""".stripMargin

  /** Mirrors Similarity.binaryQuantize: 128 inline ±1 direction rows, each
    * bit the sign of a left-to-right double dot product (DuckDB's
    * list_dot_product fold order = the engine's LshSignature order); bit 63
    * of each word is the inlined Long.MinValue literal (DuckDB rejects
    * 1::BIGINT << 63), and summing DISJOINT bits never overflows. */
  private def binaryQuantizeOracle: String = {
    val dirs = graft.pipeline.Similarity.lshDirections(64, 128)
    def word(lo: Int): String = (0 until 64).map { j =>
      val arr = dirs(lo + j).map(d => if (d > 0) "1.0" else "-1.0").mkString(",")
      s"(CASE WHEN list_dot_product(v, [$arr]) > 0 THEN (${1L << j})::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT vec_id, CAST(${word(64)} AS BIGINT) AS sig_hi,
       |  CAST(${word(0)} AS BIGINT) AS sig_lo FROM e""".stripMargin
  }

  /** SimHash with the engine-portable md5-low-48-bit token hash
    * (Dedup.md5Hash48): weighted bit votes per token, fingerprint = sign
    * bits, brute-force Hamming ≤ 2 join. With 3 16-bit bands, banding is
    * complete at distance ≤ 2, so the Spark banded plan must produce exactly
    * this brute-force result. */
  private val simHashOracle: String =
    """WITH tk AS (SELECT doc_id, w, COUNT(*) AS wgt FROM (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w FROM documents) GROUP BY doc_id, w),
      |h AS (SELECT doc_id, wgt, ('0x' || substr(md5(w), 21, 12))::BIGINT AS th FROM tk),
      |v AS (SELECT doc_id, b, SUM(CASE WHEN ((th >> b) & 1) = 1 THEN wgt ELSE -wgt END) AS s
      |  FROM h CROSS JOIN range(48) t(b) GROUP BY doc_id, b),
      |fp AS (SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS f
      |  FROM v GROUP BY doc_id)
      |SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
      |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.f, b.f)) <= 2""".stripMargin

  /** Shared oracle for exact n-gram Jaccard and (verified) MinHash-LSH — with
    * 32×4 banding the miss probability at J≥0.8 is < 1e-7, so LSH output
    * equals the exact similarity join. */
  private val ngramJaccardOracle: String =
    """WITH w AS (SELECT doc_id, string_split_regex(text,'\s+') AS wl FROM documents),
      |sh AS (SELECT doc_id, list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)]) AS gs FROM w),
      |tok AS (SELECT doc_id, unnest(gs) AS g FROM sh),
      |sizes AS (SELECT doc_id, len(gs) AS n FROM sh),
      |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
      |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT ida, idb, CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) AS jaccard
      |FROM pairs JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
      |WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.8""".stripMargin
}
