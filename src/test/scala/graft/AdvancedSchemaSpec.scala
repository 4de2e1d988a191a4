package graft

import graft.core._
import graft.data.{MultiProperties, PropertyGraph}
import graft.expr.{ImplicitKeys, P}
import graft.query.{Direction, VertexCentricQuery}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Advanced schema semantics — reference docs/advschema.txt: unidirected
  * edges (:96-103), multi/meta-properties (:73-92), per-type TTL (:20-70),
  * implicit keys (ImplicitKey.java:28-52), plus the match() planner and the
  * Lucene-syntax direct index query parser. */
class AdvancedSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  /** a --follows--> b (unidirected), b --likes--> c (normal). */
  lazy val uniGraph: PropertyGraph = {
    import spark.implicits._
    val schema = GraphSchema()
      .withEdgeLabel(EdgeLabelDef("follows", unidirected = true))
      .withEdgeLabel(EdgeLabelDef("likes"))
    val v = Seq((1L, "user"), (2L, "user"), (3L, "user")).toDF("id", "label")
    val e = Seq((10L, 1L, 2L, "follows"), (11L, 2L, 3L, "likes"))
      .toDF("id", "src", "dst", "label")
    PropertyGraph(schema, v, e)
  }

  test("property-key TTL nulls expired values; the element survives") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-30 00:00:00")
    val schema = GraphSchema(
      propertyKeys = Map("score" -> PropertyKeyDef("score", IntegerType,
        ttlSeconds = Some(7L * 24 * 3600))),
      ttlReadTime = Some(java.sql.Timestamp.valueOf("2024-01-31 00:00:00")))
    val v = Seq((1L, "u", 10, t0), (2L, "u", 20, t1), (3L, "u", 30, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "label", "score", "_ts")
    val g = PropertyGraph(schema, v,
      v.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
    val rows = g.V().dataframe.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    // all three elements survive; only the stale-provenance value expires;
    // a null _ts (pre-TTL-adoption row) never expires retroactively
    assert(rows === Map(1L -> None, 2L -> Some(20), 3L -> Some(30)))
    // no key TTL declared -> identity view (column untouched)
    val plain = PropertyGraph(schema.copy(propertyKeys = Map.empty), v, g.edges)
    assert(plain.V().dataframe.filter(col("score").isNull).count() === 0)
  }

  test("unidirected edge is visible from OUT but not IN/BOTH on the in-vertex") {
    // from the out-vertex: visible
    val fromA = uniGraph.traversal.V().hasId(1L).out("follows").toDF.collect()
    assert(fromA.map(_.getAs[Long]("id")).toSeq === Seq(2L))
    // from the in-vertex: invisible (the reference stores no adjacency row there)
    val fromB = uniGraph.traversal.V().hasId(2L).in("follows").toDF.collect()
    assert(fromB.isEmpty)
    val bothB = uniGraph.traversal.V().hasId(2L).both().toDF.collect()
    assert(bothB.map(_.getAs[Long]("id")).toSeq === Seq(3L)) // likes only
    // VertexCentricQuery agrees: IN edges of vertex 2 exclude the unidirected label
    val vc = VertexCentricQuery(uniGraph).onVertices(2L)
      .direction(Direction.IN).edges().collect()
    assert(!vc.exists(_.getAs[String]("label") == "follows"))
  }

  lazy val ttlGraph: PropertyGraph = {
    import spark.implicits._
    // V()/traversal scans auto-apply catalog TTL; pin the read time to an
    // instant where both session vertices are still live so the implicit-key
    // tests see the full fixture (expiry itself is tested separately below
    // and in MutationEnforcementSpec)
    val schema = GraphSchema()
      .withVertexLabel(VertexLabelDef("session", ttlSeconds = Some(3600L)))
      .withVertexLabel(VertexLabelDef("user"))
      .copy(ttlReadTime = Some(java.sql.Timestamp.valueOf("2024-01-01 00:30:00")))
    val v = Seq(
      (1L, "session", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "session", java.sql.Timestamp.valueOf("2024-01-01 02:00:00")),
      (3L, "user", java.sql.Timestamp.valueOf("2023-01-01 00:00:00")))
      .toDF("id", "label", ImplicitKeys.TimestampColumn)
    PropertyGraph(schema, v, v.limit(0).select(col("id"), col("id").as("src"),
      col("id").as("dst"), col("label")))
  }

  test("implicit keys: ~label/~timestamp predicates; ~ttl catalog constant") {
    val g = ttlGraph
    val sessions = g.traversal.V().has("~label", "session").toDF.count()
    assert(sessions === 2)
    val recent = g.traversal.V()
      .has("~timestamp", P.gt(java.sql.Timestamp.valueOf("2024-01-01 01:00:00")))
      .toDF.collect()
    assert(recent.map(_.getLong(0)).toSeq === Seq(2L))
    val ttls = g.vertices
      .select(col("id"), ImplicitKeys.resolve(g.schema, g.vertices, "~ttl", isVertex = true).as("t"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(ttls(1L) === 3600L && ttls(3L) === -1L)
  }

  test("catalog TTL view: expired elements dropped, no-TTL labels kept") {
    val g = ttlGraph
    val now = to_timestamp(lit("2024-01-01 02:30:00"))
    val live = g.vertices
      .filter(ImplicitKeys.ttlCatalogFilter(g.schema, g.vertices, isVertex = true, now))
      .collect().map(_.getLong(0)).toSet
    // session 1 expired (ts 00:00 + 1h < 02:30), session 2 live (02:00 + 1h),
    // user 3 has no TTL — kept despite being ancient
    assert(live === Set(2L, 3L))
  }

  test("multi-properties: SET add, meta filter, explode round-trip") {
    import spark.implicits._
    val base = Seq((1L, "a", "x"), (1L, "b", "y"), (2L, "c", "x"))
      .toDF("id", "v", "m")
      .select(col("id"), MultiProperties.cell(col("v"), "tag" -> col("m")).as("c"))
    val mp = MultiProperties.collect(base, col("id"), col("c"))
    // meta filter keeps only tag=x cells
    val xs = MultiProperties.explodeCells(
      mp.withColumn("cells", MultiProperties.cellsWithMeta(col("cells"), "tag", "x")), "cells")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(xs === Set((1L, "a"), (2L, "c")))
    // anyMetaEquals predicate
    val withY = mp.filter(MultiProperties.anyMetaEquals(col("cells"), "tag", "y"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(withY === Seq(1L))
    // SET-cardinality add: duplicate value is a no-op, new value appends
    val one = mp.filter(col("id") === 1L)
      .select(MultiProperties.addValueSet(col("cells"),
        MultiProperties.cell(lit("a"), "tag" -> lit("z"))).as("cells"))
    assert(one.select(size(col("cells"))).collect()(0).getInt(0) === 2)
    val two = mp.filter(col("id") === 1L)
      .select(MultiProperties.addValueSet(col("cells"),
        MultiProperties.cell(lit("new"), "tag" -> lit("z"))).as("cells"))
    assert(two.select(size(col("cells"))).collect()(0).getInt(0) === 3)
  }

  test("Lucene-syntax query parser: prefixes, groups, bare terms, multi-field") {
    import graft.index.Indexes
    // element-identifier prefixes are RECORDED (prefixed clauses resolve
    // key names, bare clauses resolve backend field names — testRawQueries)
    assert(Indexes.parseQuery("v.name:(small green)") ===
      Seq(Indexes.QueryClause("name", "small green", prefixed = true)))
    assert(Indexes.parseQuery("name:widget") ===
      Seq(Indexes.QueryClause("name", "widget")))
    assert(Indexes.parseQuery("v.name:(a b) e.brand:Brand#12") ===
      Seq(Indexes.QueryClause("name", "a b", prefixed = true),
        Indexes.QueryClause("brand", "Brand#12", prefixed = true)))
    // quoted phrase → exact-value clause; AND tokens between clauses skipped
    assert(Indexes.parseQuery("""v.text:(farm uncle) AND v.name:"Uncle B"""") ===
      Seq(Indexes.QueryClause("text", "farm uncle", prefixed = true),
        Indexes.QueryClause("name", "Uncle B", prefixed = true, phrase = true)))
    // quoted field, wildcard field, custom element identifier
    assert(Indexes.parseQuery("""v."text":(a b)""") ===
      Seq(Indexes.QueryClause("text", "a b", prefixed = true)))
    assert(Indexes.parseQuery("""v.*:"test1"""") ===
      Seq(Indexes.QueryClause("*", "test1", prefixed = true, phrase = true)))
    assert(Indexes.parseQuery("$v$text:ducks", "$v$") ===
      Seq(Indexes.QueryClause("text", "ducks", prefixed = true)))
  }

  test("asOfJoin: strictly-prior match, deterministic tie-break, null when none") {
    import graft.operators.AsOfJoin
    import spark.implicits._
    val left = Seq((100L, 1L, 10L), (101L, 1L, 20L), (102L, 2L, 5L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 1L, 10L),  // same ts as left 100 — must NOT match it (strict <)
      (201L, 1L, 15L), (202L, 1L, 15L), // tie at ts 15 — max event_id wins
      (203L, 3L, 1L))   // other key
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.join(left, right, "user_id", "ts", "event_id",
      carry = Seq("event_id"))
      .select(col("event_id"), col("event_id_asof"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(100L) === -1L)  // nothing strictly before ts 10
    assert(out(101L) === 202L) // ts 15 tie → larger event_id
    assert(out(102L) === -1L)  // user 2 has no clicks
  }

  test("asOfJoin: ordCol outside carry resolves; carrying key/ts is rejected") {
    import graft.operators.AsOfJoin
    import spark.implicits._
    val left = Seq((100L, 1L, 10L)).toDF("event_id", "user_id", "ts")
    val right = Seq((201L, 1L, 5L, "a"), (202L, 1L, 5L, "b"))
      .toDF("event_id", "user_id", "ts", "tag")
    // ordCol (event_id) NOT in carry — must still resolve on the right side
    val out = AsOfJoin.join(left, right, "user_id", "ts", "event_id",
      carry = Seq("tag")).collect()
    assert(out.length === 1 && out(0).getAs[String]("tag_asof") === "b") // ts tie → max event_id
    // carrying the key or ts column would silently break strict semantics
    intercept[IllegalArgumentException] {
      AsOfJoin.join(left, right, "user_id", "ts", "event_id", carry = Seq("ts"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.join(left, right, "user_id", "ts", "event_id", carry = Seq("user_id"))
    }
  }

  test("fold/unfold/barrier/sideEffect steps") {
    val g = graft.data.TpchGraph.load(spark, "/root/testdata/sf0.001")
    val folded = g.traversal.V().hasLabel("region").fold().collect()(0)
      .getAs[scala.collection.Seq[Long]]("ids")
    assert(folded.length === 5 && folded === folded.sorted)
    import spark.implicits._
    val arr = Seq((1L, Seq("a", "b"))).toDF("id", "xs")
    val unfolded = graft.traverse.Traversal(g, arr, isVertex = false)
      .unfold("xs").collect().map(_.getString(0)).toSeq
    assert(unfolded === Seq("a", "b"))
    var observed = -1L
    val t = g.traversal.V().hasLabel("nation")
      .sideEffect(d => observed = d.count())
      .barrier()
    assert(observed === 25L)
    assert(t.toDF.count() === 25L)
  }

  test("intervalJoin: equi-join plan (no nested loop), exact range semantics") {
    import graft.operators.IntervalJoin
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L)).toDF("pid", "ts")
    val ranges = Seq((100L, 0L, 10L), (200L, 10L, 20L), (300L, 18L, 25L))
      .toDF("rid", "s", "e")
    val out = IntervalJoin.join(points, ranges, "ts", "s", "e", widthMicros = 10L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "interval join must compile to a bucketed equi-join")
    val got = out.select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ts=5 ∈ [0,10); ts=10 ∈ [10,20); ts=19 ∈ [10,20) and [18,25); ts=20 ∈ [18,25)
    assert(got === Set((1L, 100L), (2L, 200L), (3L, 200L), (3L, 300L), (4L, 300L)))
  }

  test("intervalJoin: inverted interval rows are dropped, not exploded") {
    import graft.operators.IntervalJoin
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "ts")
    // end ≪ start: would generate a ~10⁷-element descending bucket array if
    // the explode were unguarded; must simply contribute zero matches
    val ranges = Seq((100L, 0L, 10L), (666L, 100000000L, 0L)).toDF("rid", "s", "e")
    val got = IntervalJoin.join(points, ranges, "ts", "s", "e", widthMicros = 10L)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L)))
  }

  test("matchAll orders patterns by estimated size (most selective anchors)") {
    val g = graft.data.TpchGraph.load(spark, "/root/testdata/sf0.001")
    val selective = g.traversal.V().hasLabel("region").has("name", "ASIA").as("a")
    val broad = g.traversal.V().hasLabel("region").as("a")
    val m = g.traversal.V().matchAll("a", broad, selective)
    val ids = m.toDF.select(col("_as_a_id")).distinct().collect()
    assert(ids.length === 1) // only ASIA satisfies both patterns
  }

  /** Hyper-edge remnant (advschema.txt:96-109): unidirected edges ON edges
    * and ON properties, plus meta-properties on an edge's property. */
  test("HyperEdges: unidirected edge-on-edge traverses out only; cell meta filters on edge props") {
    import spark.implicits._
    import graft.data.HyperEdges
    // users 1,2; book 3; authors 8,9 — knows-edge 20 (1→2) recorded by
    // author 8, likes-edge 21 (2→3) recorded by author 9
    val v = Seq((1L, "user", "u1"), (2L, "user", "u2"), (3L, "book", "b"),
      (8L, "author", "alice"), (9L, "author", "bob")).toDF("id", "label", "name")
    val e = Seq((20L, 1L, 2L, "knows", "web", 8L), (21L, 2L, 3L, "likes", "app", 9L))
      .toDF("id", "src", "dst", "label", "source", "author_id")
    val g = graft.data.PropertyGraph(GraphSchema(), v, e)
    val meta = HyperEdges.attachToEdges(g.edges, "author", col("author_id"))
    // src endpoint is EDGE-id-valued: the meta-edge hangs off relation 20/21
    assert(meta.select("src_edge").collect().map(_.getLong(0)).toSet === Set(20L, 21L))
    val out = HyperEdges.outV(g, meta, "author")
    val got = out.select("src_edge", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(20L -> "alice", 21L -> "bob"))
    // unidirected: the API surface has no inV — the vertex side cannot see
    // the meta-edge through any adjacency the engine exposes (the frame
    // never enters g.edges, so V().both() on 8/9 finds nothing)
    assert(g.traversal.V().hasId(8L).both().toDF.count() === 0L)

    // meta-properties on an edge property: annotate `source`, filter by meta
    val ann = HyperEdges.annotateEdgeProperty(g.edges, "source",
      "addedBy" -> col("author_id"))
    val webOnly = ann.filter(
      MultiProperties.anyMetaEquals(col("source_cells"), "addedBy", "8"))
    assert(webOnly.select("id").collect().map(_.getLong(0)).toSeq === Seq(20L))
    // null property ⇒ empty cell array, not a null-valued cell
    val annNull = HyperEdges.annotateEdgeProperty(
      e.withColumn("source", when(col("id") === 20L, col("source"))), "source")
    assert(annNull.filter(col("id") === 21L)
      .select(size(col("source_cells"))).head.getInt(0) === 0)

    // unidirected edge ON a property: the cell meta carries the vertex id
    val vp = v.filter(col("label") === "user").select(col("id"),
      array(HyperEdges.cellWithEdge(col("name"), "authoredBy", lit(9L))).as("alias_cells"))
    val resolved = HyperEdges.cellOutV(g, vp, "alias_cells", "authoredBy")
    assert(resolved.count() === 2L)
    assert(resolved.select("name").distinct().head.getString(0) === "bob")
  }
}
