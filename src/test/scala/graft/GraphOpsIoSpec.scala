package graft

import graft.data.{GraphIO, GraphOfTheGods, TpchGraph}
import graft.functions.ArrayJaccard
import graft.olap.{GraphOps, MapReduce}
import graft.query.GraphQuery
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class GraphOpsIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  lazy val gods = GraphOfTheGods.load(spark)
  val dir = "/root/testdata/sf0.001"

  test("GraphIO: parquet save/load round-trip preserves counts and layout") {
    val path = Files.createTempDirectory("graft-io").toString
    GraphIO.save(gods, path, buckets = 2)
    val back = GraphIO.load(spark, path, gods.schema)
    assert(back.vertices.count() === 12)
    assert(back.edges.count() === 17)
  }

  test("GraphIO: Gryo binary frames round-trip every row and value exactly") {
    val path = Files.createTempDirectory("graft-gryo").toString
    val g = TpchGraph.load(spark, dir)
    val small = g.copy(
      vertices = g.vertices.filter(col("label").isin("region", "nation", "customer")),
      edges = g.edges.filter(col("label").isin("in_region", "in_nation")))
    GraphIO.exportGryo(small, path)
    val back = GraphIO.importGryo(spark, path, g.schema)
    // schema preserved (types, not just names) and full-row set equality —
    // binary encode/decode must lose nothing, in either direction
    assert(back.vertices.schema === small.vertices.schema)
    assert(back.edges.schema === small.edges.schema)
    assert(back.vertices.exceptAll(small.vertices).isEmpty)
    assert(small.vertices.exceptAll(back.vertices).isEmpty)
    assert(back.edges.exceptAll(small.edges).isEmpty)
    assert(small.edges.exceptAll(back.edges).isEmpty)
  }

  test("GraphIO: queries on a persisted+reloaded graph match the in-memory graph") {
    val path = Files.createTempDirectory("graft-io-rt").toString
    val g = TpchGraph.load(spark, dir)
    GraphIO.save(g, path, buckets = 4)
    val back = GraphIO.load(spark, path, g.schema)
    // same query through both storage paths
    def q(gr: graft.data.PropertyGraph) =
      gr.traversal.V().hasLabel("customer").has("mktsegment", "BUILDING")
        .out("placed").groupCount("orderstatus")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q(back) === q(g))
    // label-partitioned vertices: the label filter prunes to one directory
    val prof = graft.query.Profiler.profile(
      back.V().hasLabel("part").dataframe)
    assert(prof.numScans === 1)
  }

  test("Graph.Variables: set overwrites, remove deletes, JSON round-trips") {
    val s0 = graft.core.GraphSchema()
      .withVariable("a", "1").withVariable("a", "2")
      .withVariable("b", "x").removeVariable("b")
    assert(s0.variables === Map("a" -> "2"))
    val json = graft.core.SchemaJson.toJson(s0)
    assert(graft.core.SchemaJson.fromJson(json).variables === Map("a" -> "2"))
    // catalog documents written before variables existed decode to empty
    val legacy = """{"propertyKeys":[],"edgeLabels":[],"vertexLabels":[],
      |"indexes":[],"relationIndexes":[],"ttlReadTime":null}""".stripMargin
    assert(graft.core.SchemaJson.fromJson(legacy).variables === Map.empty)
  }

  test("GraphIO: GraphML export/import round-trip, typed + XML-escaped") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-gml").toString
    val v = Seq(
      (1L, "user", "AT&T <esc> \"q\"", 9.5, true, Some(7L)),
      (2L, "user", "plain", -0.25, false, None)
    ).toDF("id", "label", "name", "score", "active", "rank")
    val e = Seq((10L, 1L, 2L, "knows", 3)).toDF("id", "src", "dst", "label", "since")
    val g = graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
    GraphIO.exportGraphml(g, path)
    // concatenation property: header + nodes/* + edges/* + footer must be a
    // well-formed XML document (DOM parse proves it)
    def parts(d: String) = new java.io.File(d).listFiles().toSeq
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString("\n")
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/header.xml"))) + "\n" +
      parts(s"$path/nodes") + "\n" + parts(s"$path/edges") + "\n" +
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$path/zfooter.xml")))
    val dom = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(doc.getBytes("UTF-8")))
    assert(dom.getDocumentElement.getTagName === "graphml")
    assert(dom.getElementsByTagName("node").getLength === 2)
    assert(dom.getElementsByTagName("edge").getLength === 1)
    // typed round-trip: longs, doubles, booleans, escapes; null -> absent -> null
    val back = GraphIO.importGraphml(spark, path)
    assert(back.vertices.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
      === Map("id" -> "bigint", "label" -> "string", "name" -> "string",
        "score" -> "double", "active" -> "boolean", "rank" -> "bigint"))
    val rows = back.vertices.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("name"), r.getAs[Double]("score"), r.getAs[Boolean]("active"),
        Option(r.getAs[java.lang.Long]("rank")))).toMap
    assert(rows(1L) === (("AT&T <esc> \"q\"", 9.5, true, Some(7L))))
    assert(rows(2L) === (("plain", -0.25, false, None)))
    val er = back.edges.collect()
    assert(er.length === 1 && er(0).getAs[Long]("src") === 1L &&
      er(0).getAs[Long]("dst") === 2L && er(0).getAs[Int]("since") === 3)
  }

  test("io() dispatch: every format round-trips through write/read") {
    import spark.implicits._
    val v = Seq((1L, "u", 5L), (2L, "u", 9L)).toDF("id", "label", "score")
    val e = Seq((10L, 1L, 2L, "knows")).toDF("id", "src", "dst", "label")
    // a non-trivial catalog: every format must carry it (schema.json sidecar)
    val cat = graft.core.GraphSchema()
      .withPropertyKey(graft.core.PropertyKeyDef("score",
        org.apache.spark.sql.types.LongType, ttlSeconds = Some(3600L)))
      .withVertexLabel(graft.core.VertexLabelDef("u", static = true))
      .withEdgeLabel(graft.core.EdgeLabelDef("knows",
        srcLabels = Set("u"), dstLabels = Set("u")))
    val g = graft.data.PropertyGraph(cat, v, e)
    for (f <- Seq(GraphIO.Format.Parquet, GraphIO.Format.GraphSon,
        GraphIO.Format.Gryo, GraphIO.Format.GraphMl)) {
      val p = Files.createTempDirectory(s"graft-io-$f").toString
      GraphIO.write(g, p, f)
      val back = GraphIO.read(spark, p, f)
      assert(back.vertices.count() === 2 && back.edges.count() === 1, s"format $f")
      assert(back.vertices.select(sum("score")).head.get(0).toString === "14", s"format $f")
      assert(back.schema.propertyKey("score").ttlSeconds === Some(3600L), s"format $f")
      assert(back.schema.vertexLabel("u").static, s"format $f")
      assert(back.schema.edgeLabel("knows").dstLabels === Set("u"), s"format $f")
    }
  }

  test("GraphML: shared vertex/edge property name gets unique key ids, own types") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-gml-c").toString
    val v = Seq((1L, "u", "2020")).toDF("id", "label", "since") // string
    val e = Seq((10L, 1L, 1L, "self", 7)).toDF("id", "src", "dst", "label", "since") // int
    GraphIO.exportGraphml(graft.data.PropertyGraph(graft.core.GraphSchema(), v, e), path)
    val header = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/header.xml")))
    // unique key ids document-wide (GraphML requires it); each side keeps
    // its TRUE attr.type and attr.name stays the real property name
    assert(header.contains("""<key id="since" for="node" attr.name="since" attr.type="string"/>"""))
    assert(header.contains("""<key id="e_since" for="edge" attr.name="since" attr.type="int"/>"""))
    val back = GraphIO.importGraphml(spark, path)
    assert(back.vertices.schema("since").dataType.simpleString === "string")
    assert(back.vertices.select("since").head.getString(0) === "2020")
    assert(back.edges.schema("since").dataType.simpleString === "int")
    assert(back.edges.select("since").head.getInt(0) === 7)
  }

  test("GraphML: pathological e_-prefix chains still yield unique key ids") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-gml-k").toString
    // vertex props x AND e_x; edge props x AND e_x — naive prefixing would
    // collide twice; sequential assignment must chain until unique
    val v = Seq((1L, "u", "vx", "vex")).toDF("id", "label", "x", "e_x")
    val e = Seq((10L, 1L, 1L, "self", 7L, 9L)).toDF("id", "src", "dst", "label", "x", "e_x")
    GraphIO.exportGraphml(graft.data.PropertyGraph(graft.core.GraphSchema(), v, e), path)
    val header = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/header.xml")))
    val ids = """<key id="([^"]+)"""".r.findAllMatchIn(header).map(_.group(1)).toSeq
    assert(ids.distinct.size === ids.size, s"duplicate key ids: $ids")
    val back = GraphIO.importGraphml(spark, path)
    val vr = back.vertices.head
    assert(vr.getAs[String]("x") === "vx" && vr.getAs[String]("e_x") === "vex")
    val er = back.edges.head
    assert(er.getAs[Long]("x") === 7L && er.getAs[Long]("e_x") === 9L)
  }

  test("GraphML: vertex property named labelV/labelE cannot shadow the label keys") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-gml-lv").toString
    // a vertex property literally named labelV (and labelE) used to reuse
    // the reserved label key id — duplicate <key> ids (invalid GraphML) and
    // a corrupted label on import; the v_ chain must disambiguate
    val v = Seq((1L, "user", "customLV", "customLE")).toDF("id", "label", "labelV", "labelE")
    val e = Seq((10L, 1L, 1L, "self")).toDF("id", "src", "dst", "label")
    GraphIO.exportGraphml(graft.data.PropertyGraph(graft.core.GraphSchema(), v, e), path)
    val header = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/header.xml")))
    val ids = """<key id="([^"]+)"""".r.findAllMatchIn(header).map(_.group(1)).toSeq
    assert(ids.distinct.size === ids.size, s"duplicate key ids: $ids")
    val back = GraphIO.importGraphml(spark, path)
    val r = back.vertices.head
    assert(r.getAs[String]("label") === "user")
    assert(r.getAs[String]("labelV") === "customLV")
    assert(r.getAs[String]("labelE") === "customLE")
  }

  test("GraphML: XML-special characters in property names escape in the header") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-gml-x").toString
    val v = Seq((1L, "u", "val1", "val2")).toDF("id", "label", "a&b", "c<d\"e")
    val e = Seq((10L, 1L, 1L, "self")).toDF("id", "src", "dst", "label")
    GraphIO.exportGraphml(graft.data.PropertyGraph(graft.core.GraphSchema(), v, e), path)
    // header must stay well-formed XML despite & < " in attr names
    val header = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/header.xml")))
    javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        (header + "</graph></graphml>").getBytes("UTF-8")))
    val back = GraphIO.importGraphml(spark, path).vertices.head
    assert(back.getAs[String]("a&b") === "val1")
    assert(back.getAs[String]("c<d\"e") === "val2")
  }

  test("GraphML: timestamp/date/decimal columns re-cast to their true types on import") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-gml-t").toString
    val v = Seq((1L, "u"), (2L, "u")).toDF("id", "label")
      .withColumn("ts", when(col("id") === 1, expr("timestamp'2024-03-01 12:34:56.789123'")))
      .withColumn("d", expr("date'2021-07-04'"))
      .withColumn("amt", expr("cast(id * 1.5 as decimal(13,4))"))
    val e = Seq((10L, 1L, 2L, "self")).toDF("id", "src", "dst", "label")
      .withColumn("ets", expr("timestamp'1999-12-31 23:59:59'"))
    val g = graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
    GraphIO.exportGraphml(g, path)
    val back = GraphIO.importGraphml(spark, path)
    // schema equality: parquet → GraphML → parquet preserves the types
    assert(back.vertices.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(back.vertices.schema("d").dataType === org.apache.spark.sql.types.DateType)
    assert(back.vertices.schema("amt").dataType.simpleString === "decimal(13,4)")
    assert(back.edges.schema("ets").dataType === org.apache.spark.sql.types.TimestampType)
    // value equality, including the null timestamp and sub-second precision
    val got = back.vertices.orderBy("id")
      .select("id", "ts", "d", "amt").collect()
    val want = v.orderBy("id").select("id", "ts", "d", "amt").collect()
    assert(got.toSeq === want.toSeq)
    assert(back.edges.head.getAs[java.sql.Timestamp]("ets") ===
      e.head.getAs[java.sql.Timestamp]("ets"))
  }

  test("GraphML: empty-string property values round-trip as '', not null") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-gml-e").toString
    val v = Seq((1L, "u", ""), (2L, "u", null.asInstanceOf[String]))
      .toDF("id", "label", "note")
    val e = v.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label"))
    GraphIO.exportGraphml(graft.data.PropertyGraph(graft.core.GraphSchema(), v, e), path)
    val back = GraphIO.importGraphml(spark, path).vertices.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("note"))).toMap
    // present-but-empty survives as ""; true null (absent <data>) stays null
    assert(back === Map(1L -> Some(""), 2L -> None))
  }

  test("GraphIO: JSON export/import round-trip") {
    val path = Files.createTempDirectory("graft-json").toString
    GraphIO.exportJson(gods, path)
    val back = GraphIO.importJson(spark, path, gods.schema)
    assert(back.vertices.count() === 12)
    assert(back.edges.count() === 17)
  }

  test("GraphIO: mutations — add/delete with edge cascade") {
    import spark.implicits._
    val newV = Seq((100L, "god", "minerva", 2000)).toDF("id", "label", "name", "age")
    val g1 = GraphIO.applyMutations(gods, addVertices = Some(newV))
    assert(g1.vertices.count() === 13)
    // delete hercules: his 5 incident edges must cascade away
    val del = Seq(Tuple1(GraphOfTheGods.ids("hercules"))).toDF("id")
    val g2 = GraphIO.applyMutations(g1, deleteVertexIds = Some(del))
    assert(g2.vertices.count() === 12)
    assert(g2.edges.count() === 12)
    assert(GraphOps.ghostEdges(g2).count() === 0)
  }

  test("GraphOps: ghost edge detection + removal") {
    // fabricate a ghost by dropping a vertex without cascading
    val broken = gods.copy(vertices = gods.vertices.filter(col("name") =!= "cerberus"))
    val ghosts = GraphOps.ghostEdges(broken)
    // cerberus edges: pet(pluto→cerberus), lives(cerberus→tartarus), battled(hercules→cerberus)
    assert(ghosts.count() === 3)
    val repaired = GraphOps.removeGhosts(broken)
    assert(GraphOps.ghostEdges(repaired).count() === 0)
    assert(repaired.edges.count() === 14)
  }

  test("GraphOps: salted degree equals plain degree") {
    val g = TpchGraph.load(spark, dir)
    val plain = g.edges.groupBy(col("src")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = GraphOps.saltedDegree(g, "out", salts = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("degree")).toMap
    assert(salted === plain)
  }

  test("GraphOps: ttlView filters expired rows") {
    import spark.implicits._
    val now = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-12-31 23:00:00")),
      (2L, java.sql.Timestamp.valueOf("2025-12-01 00:00:00"))).toDF("id", "created")
    val alive = GraphOps.ttlView(df, "created", ttlSeconds = 7200, now = lit(now))
    assert(alive.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("MapReduce adapter: word histogram over vertex names") {
    import spark.implicits._
    val out = MapReduce.run[String, Int, (String, Int)](gods.vertices)(
      r => Seq((r.getAs[String]("label"), 1)))(
      (k, vs) => (k, vs.sum))
    val m = out.collect().toMap
    assert(m("god") === 3 && m("location") === 3 && m("monster") === 3)
  }

  test("ArrayJaccard: native expression semantics + SQL registration") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b")),   // duplicates collapse
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x"), Seq("y"))).toDF("l", "r")
    val got = df.select(ArrayJaccard(col("l"), col("r"))).as[Double].collect().toSeq
    assert(got === Seq(0.5, 1.0, 0.0, 0.0))
    ArrayJaccard.register(spark)
    val viaSql = df.selectExpr("array_jaccard(l, r)").as[Double].collect().toSeq
    assert(viaSql === got)
    // null propagation
    val nulls = Seq((null.asInstanceOf[Seq[String]], Seq("a"))).toDF("l", "r")
    assert(nulls.select(ArrayJaccard(col("l"), col("r"))).collect()(0).isNullAt(0))
  }

  test("TopKAggregator: map-side-combining bounded top-k equals window top-k") {
    import spark.implicits._
    val g = TpchGraph.load(spark, dir)
    val pairs = g.edges.filter(col("label") === "contains")
      .select(col("src"), col("extendedprice"), col("dst"))
      .as[(Long, Double, Long)]
    val agg = new graft.functions.TopKAggregator(2)
    val viaAgg = pairs.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn)
      .collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("extendedprice").desc, col("dst").asc)
    val viaWindow = g.edges.filter(col("label") === "contains")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("src"), col("extendedprice"), col("dst"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getDouble(1), r.getLong(2))).toSeq).toMap
    viaAgg.foreach { case (k, topk) =>
      assert(topk.toList.sortBy(x => (-x._1, x._2)) ===
        viaWindow(k).sortBy(x => (-x._1, x._2)).toList, s"key $k")
    }
  }

  test("force-index: covered query runs, uncovered or unbacked rejected") {
    // force-index accepts only queries a BACKED index can serve — the strict
    // check tests the same predicate as automatic selection, so a declared
    // index with no materialized table cannot satisfy it while the query
    // silently runs as a full scan
    val unbacked = TpchGraph.load(spark, dir)
    intercept[IllegalStateException] {
      GraphQuery.vertices(unbacked).has("uid", 7L).forceIndex().dataframe
    }
    val g = TpchGraph.loadMaterialized(spark, dir)
    // byUid composite index covers uid equality (and is backed)
    assert(GraphQuery.vertices(g).has("uid", 7L).forceIndex().dataframe.count() > 0)
    intercept[IllegalStateException] {
      GraphQuery.vertices(g).has("mktsegment", "BUILDING").forceIndex().dataframe
    }
  }

  test("sack: per-traverser accumulator rides hops, updates from element columns") {
    val g = TpchGraph.load(spark, dir)
    val sacks = g.traversal.V().hasLabel("customer").has("uid", 7L)
      .withSack(lit(0.0))
      .out("placed").sackOp(_ + col("totalprice"))
      .outE("contains").sackOp(_ + col("extendedprice"))
      .sackValues().collect().map(_.getDouble(0)).sorted
    // relational mirror of the same accumulation
    val c = spark.read.parquet(s"$dir/customer.parquet").filter(col("c_custkey") === 7L)
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val expected = c.join(o, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_totalprice") + col("l_extendedprice")).as("s"))
      .collect().map(_.getDouble(0)).sorted
    assert(sacks.length > 0 && sacks.toSeq === expected.toSeq)
    // sack requires initialization
    intercept[IllegalArgumentException] {
      g.traversal.V().hasLabel("customer").sackOp(_ + 1.0)
    }
  }

  test("local-scope terminals match their exploded-global equivalents") {
    import graft.functions.Local
    val g = TpchGraph.load(spark, dir)
    val grouped = g.traversal.V().hasLabel("customer").as("c").out("placed")
      .group("_as_c_id", "totalprice")
    val local = grouped.select(col("_as_c_id").as("cust"),
        Local.count(col("values")).as("n"),
        Local.sumD(Local.order(col("values"))).as("s"),
        Local.max(col("values")).as("mx"),
        Local.min(col("values")).as("mn"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // global mirror: explode-free groupBy aggregation over the same hop
    val global = g.traversal.V().hasLabel("customer").as("c").out("placed").toDF
      .groupBy(col("_as_c_id").as("cust"))
      .agg(count(lit(1)).as("n"), sum(col("totalprice")).as("s"),
        max(col("totalprice")).as("mx"), min(col("totalprice")).as("mn"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(local.keySet === global.keySet)
    local.foreach { case (k, (n, s, mx, mn)) =>
      val (gn, gsum, gmx, gmn) = global(k)
      assert(n === gn && mx === gmx && mn === gmn)
      assert(math.abs(s - gsum) <= 1e-6 * math.max(1.0, math.abs(gsum)),
        s"local sum $s vs global $gsum for $k") // float fold order may differ
    }
    // list-position slices: limit + tail + range partition an ordered list
    val slices = grouped.select(Local.order(col("values")).as("v"))
      .select(Local.count(Local.limit(col("v"), 2)).as("a"),
        Local.count(Local.tail(col("v"), 1)).as("b"),
        Local.count(Local.range(col("v"), 0, 2)).as("c"),
        Local.count(col("v")).as("total")).collect()
    slices.foreach { r =>
      assert(r.getLong(0) === math.min(2L, r.getLong(3)))
      assert(r.getLong(1) === math.min(1L, r.getLong(3)))
      assert(r.getLong(2) === math.min(2L, r.getLong(3)))
    }
  }

  test("inject: extra traversers join the frontier as fresh elements") {
    val g = TpchGraph.load(spark, dir)
    val nid = TpchGraph.NationTag.toLong * (1L << graft.core.GraphIds.TagBits)
    val base = g.traversal.V().hasLabel("region").toDF.count()
    val injected = g.traversal.V().hasLabel("region").inject(nid + 1L, nid + 2L)
    assert(injected.toDF.count() === base + 2)
    assert(injected.hasLabel("nation").toDF.count() === 2)
    // with path tracking, injected traversers start their own path
    val withP = g.traversal.withPath.V().hasLabel("region").inject(nid + 1L)
      .toDF.filter(col("id") === nid + 1L).select(col("_path")).collect()
    assert(withP.length === 1 && withP(0).getSeq[Long](0) === Seq(nid + 1L))
  }

  test("store/capWithin: side-effect set filters a later frontier") {
    val g = TpchGraph.load(spark, dir)
    // orders > 300k stored, then re-selected downstream: within == the set
    val kept = g.traversal.V().hasLabel("order").has("totalprice", graft.expr.P.gt(300000.0))
      .store("big").in("placed").out("placed").capWithin("big").dedup()
      .toDF.select("id").collect().map(_.getLong(0)).toSet
    val direct = g.traversal.V().hasLabel("order").has("totalprice", graft.expr.P.gt(300000.0))
      .toDF.select("id").collect().map(_.getLong(0)).toSet
    assert(kept === direct)
    // within + without partition the wandered frontier
    val without = g.traversal.V().hasLabel("order").has("totalprice", graft.expr.P.gt(300000.0))
      .store("big").in("placed").out("placed").capWithout("big").dedup()
      .toDF.select("id").collect().map(_.getLong(0)).toSet
    assert((kept intersect without).isEmpty)
    intercept[IllegalArgumentException] {
      g.traversal.V().hasLabel("order").capWithin("nope")
    }
  }

  test("traversal: choose branches and coalesce first-non-empty") {
    val t = gods.traversal.V().hasLabel("god")
      .choose(col("name") === "jupiter")(_.out("father"), identity)
      .values("name").collect().map(_.getString(0)).toSet
    assert(t === Set("saturn", "neptune", "pluto"))

    // coalesce: pet edge if present, else lives edge
    val c = gods.traversal.V().hasLabel("god")
      .coalesceSteps(_.out("pet"), _.out("lives"))
      .values("name").collect().map(_.getString(0)).toSet
    // pluto has pet → cerberus; jupiter/neptune fall through to lives → sky/sea
    assert(c === Set("cerberus", "sky", "sea"))
  }

  test("traversal: repeatEmit surfaces intermediate frontiers") {
    // hercules → father(jupiter) → father(saturn): emit both hops + start
    val got = gods.traversal.V().has("name", "hercules")
      .repeatEmit(2)(_.out("father"))
      .values("name").collect().map(_.getString(0)).toSet
    assert(got === Set("hercules", "jupiter", "saturn"))
  }

  test("meta-properties: LIST-of-struct property round-trips and is queryable") {
    import spark.implicits._
    // multi-property with annotations (docs/advschema.txt:73-92): name values
    // carrying a 'date' meta-property, modeled as ARRAY<STRUCT<value,date>>
    val df = Seq(
      (1L, "v", Seq(("alpha", 2020), ("beta", 2023))),
      (2L, "v", Seq(("gamma", 2021)))).toDF("id", "label", "names")
    val exploded = df.select(col("id"), explode(col("names")).as("p"))
      .select(col("id"), col("p._1").as("value"), col("p._2").as("date"))
    assert(exploded.filter(col("date") > 2020).count() === 2)
  }

  test("traversal: tail returns the last elements of the order") {
    val names = gods.traversal.V().has("age")
      .order("age").tail(2).values("name").collect().map(_.getString(0)).toSet
    assert(names === Set("jupiter", "saturn"))
  }

  test("save/load round-trips the schema catalog (TTL, static, multiplicity, indexes)") {
    import graft.core._
    val g0 = TpchGraph.load(spark, dir)
    val rich = g0.copy(schema = g0.schema.copy(vertexLabels =
      g0.schema.vertexLabels +
        ("region" -> VertexLabelDef("region", static = true, ttlSeconds = Some(3600L)))))
    val out = Files.createTempDirectory("graft-cat").toString
    GraphIO.save(rich, out, buckets = 2)
    // NO caller schema: everything must come back from the persisted catalog
    val back = GraphIO.load(spark, out)
    assert(back.schema.vertexLabels("region").static)
    assert(back.schema.vertexLabels("region").ttlSeconds === Some(3600L))
    assert(back.schema.edgeLabels("in_region").multiplicity === Multiplicity.MANY2ONE)
    assert(back.schema.edgeLabels("contains").signature ===
      Seq("quantity", "extendedprice", "discount", "suppkey"))
    assert(back.schema.edgeLabels("contains").sortKey === Seq("shipdate"))
    assert(back.schema.relationIndexes.contains("containsByShip"))
    assert(back.schema.indexes("byName").keys === Seq("name"))
    assert(back.schema.propertyKeys("orderdate").dataType ===
      org.apache.spark.sql.types.DateType)
    // the codec is the identity on the catalog
    assert(SchemaJson.fromJson(SchemaJson.toJson(rich.schema)) === rich.schema)
    // caller-supplied definitions override the stored ones per name
    val override0 = GraphSchema(vertexLabels = Map(
      "region" -> VertexLabelDef("region", static = false)))
    val back2 = GraphIO.load(spark, out, override0)
    assert(!back2.schema.vertexLabels("region").static)
    assert(back2.schema.edgeLabels.contains("placed")) // rest still stored
  }

  test("GraphML: foreign key declarations — reordered attributes, expanded tags, for=all") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-gml-foreign").toString
    val v = Seq((1L, "user", "ada", 3L), (2L, "user", "bob", 5L))
      .toDF("id", "label", "name", "rank")
    val e = Seq((10L, 1L, 2L, "knows", 2.5)).toDF("id", "src", "dst", "label", "w")
    GraphIO.exportGraphml(graft.data.PropertyGraph(graft.core.GraphSchema(), v, e), path)
    val before = GraphIO.importGraphml(spark, path)
    // simulate a foreign writer: same declarations, attribute order scrambled,
    // expanded (non-self-closing) tags with a <default> child, graft.type
    // sidecar absent, and one key declared for="all"
    val hdrPath = java.nio.file.Paths.get(s"$path/header.xml")
    val hdr = new String(java.nio.file.Files.readAllBytes(hdrPath), "UTF-8")
    val KeyDecl = ("""<key id="([^"]+)" for="([^"]+)" attr.name="([^"]+)" """ +
      """attr.type="([^"]+)"(?: graft\.type="[^"]*")?/>""").r
    val foreign0 = KeyDecl.replaceAllIn(hdr, m => {
      val forAttr = if (m.group(3) == "rank") "all" else m.group(2)
      s"""<key attr.name="${m.group(3)}" for="$forAttr" attr.type="${m.group(4)}" """ +
        s"""id="${m.group(1)}"><default></default></key>"""
    })
    // plus: a yEd-style tool-metadata key with NO attr.name/attr.type (must
    // be skipped with a warning, not abort the import) and a raw '>' inside
    // a quoted attribute value (legal XML; must not truncate the capture)
    val foreign = foreign0.replaceFirst("<key ",
      """<key for="node" id="d6" yfiles.type="nodegraphics"/>
        |<key id="zmeta" for="node" attr.name="a>b" attr.type="string"/>
        |<key """.stripMargin)
    assert(foreign != hdr, "fixture must actually rewrite the declarations")
    // drop the Hadoop checksum sidecar — we edit the file behind its back
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$path/.header.xml.crc"))
    java.nio.file.Files.write(hdrPath, foreign.getBytes("UTF-8"))
    val back = GraphIO.importGraphml(spark, path)
    // no DECLARED property column silently dropped; values identical to the
    // clean import (the '>'-valued a>b key adds an all-null column — proof
    // the capture survived the raw '>'; the yfiles key is skipped)
    assert((before.vertices.columns :+ "a>b").sorted === back.vertices.columns.sorted)
    assert(back.vertices.orderBy("id").select(before.vertices.columns.map(col): _*)
      .collect().map(_.toString).toSeq ===
      before.vertices.orderBy("id").collect().map(_.toString).toSeq)
    assert(back.edges.columns.contains("w") &&
      back.edges.head.getAs[Double]("w") === 2.5)

    // a data-property declaration stripped of attr.name is skipped loudly
    // (column dropped), never an aborted import
    java.nio.file.Files.write(hdrPath, foreign.replaceFirst(
      """attr\.name="name" """, "").getBytes("UTF-8"))
    val noName = GraphIO.importGraphml(spark, path)
    assert(!noName.vertices.columns.contains("name"))
    assert(noName.vertices.columns.contains("rank")) // the rest still imports

    // a declaration without even an id still throws (data cannot reference it)
    java.nio.file.Files.write(hdrPath, foreign.replaceFirst(
      """id="zmeta" """, "").getBytes("UTF-8"))
    val err = intercept[IllegalStateException](GraphIO.importGraphml(spark, path))
    assert(err.getMessage.contains("missing id"), err.getMessage)
  }

  test("checkEndpoints: opt-in validation of declared edge-label endpoints") {
    import spark.implicits._
    import graft.core._
    val v = Seq((1L, "user"), (2L, "product"), (3L, "user")).toDF("id", "label")
    val schema = GraphSchema(edgeLabels = Map("buys" -> EdgeLabelDef("buys",
      srcLabels = Set("user"), dstLabels = Set("product"))))
    // conforming data passes
    val ok = Seq((10L, 1L, 2L, "buys")).toDF("id", "src", "dst", "label")
    GraphIO.checkEndpointDeclarations(schema, v, ok)
    // undeclared labels are never checked
    val other = Seq((11L, 2L, 1L, "views")).toDF("id", "src", "dst", "label")
    GraphIO.checkEndpointDeclarations(schema, v, other)
    // a user->user 'buys' edge contradicts dstLabels
    val badDst = Seq((12L, 1L, 3L, "buys")).toDF("id", "src", "dst", "label")
    val e1 = intercept[IllegalStateException](
      GraphIO.checkEndpointDeclarations(schema, v, badDst))
    assert(e1.getMessage.contains("buys") && e1.getMessage.contains("1 edge"))
    // a ghost endpoint cannot carry any declared label -> violation
    val ghost = Seq((13L, 1L, 99L, "buys")).toDF("id", "src", "dst", "label")
    val e2 = intercept[IllegalStateException](
      GraphIO.checkEndpointDeclarations(schema, v, ghost))
    assert(e2.getMessage.contains("buys"))
    // wired into load behind the conf, off by default
    val out = Files.createTempDirectory("graft-endpoints").toString
    GraphIO.save(graft.data.PropertyGraph(schema, v, badDst), out)
    GraphIO.load(spark, out) // default: no check, loads fine
    spark.conf.set("spark.graft.schema.checkEndpoints", "true")
    try intercept[IllegalStateException](GraphIO.load(spark, out))
    finally spark.conf.unset("spark.graft.schema.checkEndpoints")
  }
}
