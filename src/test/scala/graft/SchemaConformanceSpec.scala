package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, StringType}
import graft.core._
import graft.data.{GraphIO, PropertyGraph}

/** Catalog conformance ported from the reference's testSchemaTypes
  * (titan-test .../graphdb/TitanGraphTest.java:410-860): the full
  * property-key / edge-label / vertex-label definition matrix, its
  * inspection invariants, the maker failure modes, and the transactional
  * multiplicity enforcement the schema implies. Fixtures mirror the
  * reference's types one-for-one; assertion values are the reference's. */
class SchemaConformanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** The testSchemaTypes catalog (TitanGraphTest.java:412-439). */
  private def catalog: GraphSchema = GraphSchema()
    .withPropertyKey(PropertyKeyDef("weight", FloatType))
    .withPropertyKey(PropertyKeyDef("uid", StringType))
    .withPropertyKey(PropertyKeyDef("someid", StringType))
    .withPropertyKey(PropertyKeyDef("name", StringType, Cardinality.SET))
    .withPropertyKey(PropertyKeyDef("value", DoubleType, Cardinality.LIST))
    .withEdgeLabel(EdgeLabelDef("friend"))
    .withEdgeLabel(EdgeLabelDef("link", Multiplicity.MANY2ONE, unidirected = true))
    .withEdgeLabel(EdgeLabelDef("connect", Multiplicity.SIMPLE, signature = Seq("uid")))
    .withEdgeLabel(EdgeLabelDef("parent", Multiplicity.MANY2ONE))
    .withEdgeLabel(EdgeLabelDef("child", Multiplicity.ONE2MANY))
    .withEdgeLabel(EdgeLabelDef("spouse", Multiplicity.ONE2ONE))
    .withVertexLabel(VertexLabelDef("person"))
    .withVertexLabel(VertexLabelDef("tag"))
    .withVertexLabel(VertexLabelDef("tweet", static = true))
    .withIndex(IndexDef("uid", ElementCategory.VERTEX, Seq("uid"), unique = true))
    .withIndex(IndexDef("someid", ElementCategory.VERTEX, Seq("someid")))

  test("schema inspection invariants (testSchemaTypes:445-510)") {
    val s = catalog
    // containment + lookup (relation types share one namespace per kind)
    assert(s.propertyKeys.contains("weight") && !s.edgeLabels.contains("weight"))
    assert(s.edgeLabels.contains("connect") && !s.propertyKeys.contains("connect"))
    assert(!s.propertyKeys.contains("bla") && !s.edgeLabels.contains("bla"))
    intercept[NoSuchElementException](s.propertyKey("bla"))
    intercept[NoSuchElementException](s.edgeLabel("bla"))
    // cardinalities
    assert(s.propertyKey("weight").cardinality == Cardinality.SINGLE)
    assert(s.propertyKey("someid").cardinality == Cardinality.SINGLE)
    assert(s.propertyKey("name").cardinality == Cardinality.SET)
    assert(s.propertyKey("value").cardinality == Cardinality.LIST)
    assert(s.propertyKey("weight").dataType == FloatType)
    // index uniqueness
    assert(s.indexes("uid").unique && !s.indexes("someid").unique)
    // multiplicities
    assert(s.edgeLabel("spouse").multiplicity == Multiplicity.ONE2ONE)
    assert(s.edgeLabel("child").multiplicity == Multiplicity.ONE2MANY)
    assert(s.edgeLabel("parent").multiplicity == Multiplicity.MANY2ONE)
    assert(s.edgeLabel("friend").multiplicity == Multiplicity.MULTI)
    assert(s.edgeLabel("connect").multiplicity == Multiplicity.SIMPLE)
    // direction flags
    assert(s.edgeLabel("link").unidirected && !s.edgeLabel("child").unidirected)
    assert(!s.edgeLabel("spouse").unidirected)
    // signatures and sort keys
    assert(s.edgeLabel("friend").signature.isEmpty)
    assert(s.edgeLabel("connect").signature == Seq("uid"))
    assert(s.edgeLabel("friend").sortKey.isEmpty)
    assert(s.edgeLabel("friend").sortOrder == SortOrder.ASC)
    // population counts (5 keys, 6 edge labels, 11 relation types, 3 vlabels)
    assert(s.propertyKeys.size == 5)
    assert(s.edgeLabels.size == 6)
    assert(s.propertyKeys.size + s.edgeLabels.size == 11)
    assert(s.vertexLabels.size == 3)
    // vertex-label flags
    assert(s.vertexLabels.contains("person") && !s.vertexLabels.contains("bla"))
    assert(!s.vertexLabel("person").partitioned && !s.vertexLabel("person").static)
    assert(!s.vertexLabel("tag").partitioned)
    assert(s.vertexLabel("tweet").static)
  }

  test("maker failure modes (testSchemaTypes:512-560)") {
    val s = catalog
    // already exists — edge label, vertex label, property key
    intercept[IllegalArgumentException](
      s.withEdgeLabel(EdgeLabelDef("link", unidirected = true)))
    intercept[IllegalArgumentException](s.withVertexLabel(VertexLabelDef("tweet")))
    intercept[IllegalArgumentException](
      s.withPropertyKey(PropertyKeyDef("weight", FloatType)))
    // signature and sort-key collide
    intercept[IllegalArgumentException](s.withEdgeLabel(
      EdgeLabelDef("other", sortKey = Seq("someid", "weight"), signature = Seq("someid"))))
    // sort key requires the label to be non-constrained
    intercept[IllegalArgumentException](s.withEdgeLabel(
      EdgeLabelDef("other", Multiplicity.SIMPLE, sortKey = Seq("weight"))))
    intercept[IllegalArgumentException](s.withEdgeLabel(
      EdgeLabelDef("other", Multiplicity.MANY2ONE, sortKey = Seq("weight"))))
    // signature/sort keys must pre-exist as property keys
    intercept[NoSuchElementException](s.withEdgeLabel(
      EdgeLabelDef("test", signature = Seq("nosuchkey"))))
    // FORK does not apply to constrained types
    // (testConsistencyEnforcement:2352-2358; ManagementSystem.java:1095)
    intercept[IllegalArgumentException](s.withPropertyKey(
      PropertyKeyDef("single_fork", StringType,
        consistency = ConsistencyModifier.FORK)))
    intercept[IllegalArgumentException](s.withEdgeLabel(
      EdgeLabelDef("o2o_fork", Multiplicity.ONE2ONE,
        consistency = ConsistencyModifier.FORK)))
    // ...but unconstrained types may fork
    s.withPropertyKey(PropertyKeyDef("listy", DoubleType, Cardinality.LIST,
      consistency = ConsistencyModifier.FORK))
    s.withEdgeLabel(EdgeLabelDef("multi_fork",
      consistency = ConsistencyModifier.FORK))
  }

  /** The testSchemaTypes data fixture (TitanGraphTest.java:713-742):
    * v (uid v1), v12/v13 person, v2 tweet; parent/child/spouse/friend/
    * connect/link edges as written there. */
  private def dataGraph: PropertyGraph = {
    val v = Seq(
      (1L, "vertex", Option("v1")), (12L, "person", Option("v12")),
      (13L, "person", Option("v13")), (2L, "tweet", None)
    ).toDF("id", "label", "uid")
    val e = Seq(
      (100L, 12L, 1L, "parent", None: Option[String], Option(4.5)),
      (101L, 13L, 1L, "parent", None, Option(4.5)),
      (102L, 1L, 12L, "child", None, None),
      (103L, 1L, 13L, "child", None, None),
      (104L, 1L, 12L, "spouse", None, None),
      (105L, 1L, 12L, "friend", None, None),
      (106L, 1L, 12L, "friend", None, None), // multi edges are fine
      (107L, 1L, 12L, "connect", Option("e1"), None),
      (108L, 1L, 13L, "link", None, None),
      (109L, 2L, 13L, "link", None, None),
      (110L, 12L, 2L, "connect", None, None)
    ).toDF("id", "src", "dst", "label", "euid", "weight")
    PropertyGraph(catalog, v, e)
  }

  private def addEdge(g: PropertyGraph, id: Long, src: Long, dst: Long, lbl: String) = {
    val add = Seq((id, src, dst, lbl)).toDF("id", "src", "dst", "label")
    GraphIO.applyMutations(g, addEdges = Some(add))
  }

  test("multiplicity enforcement in transactions (testSchemaTypes:788-812)") {
    val g = dataGraph
    // parent is MANY2ONE: v12 already has an out-parent
    val e1 = intercept[IllegalArgumentException](addEdge(g, 200L, 12L, 13L, "parent"))
    assert(e1.getMessage.contains("multiplicity"))
    // child is ONE2MANY: v12 already has an in-child
    val e2 = intercept[IllegalArgumentException](addEdge(g, 201L, 13L, 12L, "child"))
    assert(e2.getMessage.contains("multiplicity"))
    // spouse is ONE2ONE: violated from either side
    val e3 = intercept[IllegalArgumentException](addEdge(g, 202L, 13L, 12L, "spouse"))
    assert(e3.getMessage.contains("multiplicity"))
    val e4 = intercept[IllegalArgumentException](addEdge(g, 203L, 1L, 13L, "spouse"))
    assert(e4.getMessage.contains("multiplicity"))
    // connect is SIMPLE: the (1,12) pair already exists
    val e5 = intercept[IllegalArgumentException](addEdge(g, 204L, 1L, 12L, "connect"))
    assert(e5.getMessage.contains("SIMPLE"))
    // more friendships are always fine (MULTI)
    val ok = addEdge(g, 205L, 1L, 12L, "friend")
    assert(ok.edges.filter(col("label") === "friend").count() == 3)
  }

  test("reserved names rejected for all three makers (ManagementTest.java:19-75)") {
    val illegal = Seq("~key", "~value", "~id", "~nid", "~label", "~adjacent",
      "~timestamp", "~ttl", "~visibility",
      "key", "vertex", "edge", "element", "property", "label",
      "~T$VertexExists", "~T$SchemaName", "~T$SchemaDefinitionProperty",
      "~T$SchemaCategory", "~T$SchemaDefinitionDescription",
      "~T$SchemaUpdateTimestamp", "~T$SchemaRelated", "~T$VertexLabel")
    for (s <- illegal) {
      val mgmt = new graft.mgmt.Management(GraphSchema())
      intercept[IllegalArgumentException](mgmt.makePropertyKey(s))
      intercept[IllegalArgumentException](mgmt.makeEdgeLabel(s))
      intercept[IllegalArgumentException](mgmt.makeVertexLabel(s))
    }
    // sane names still pass every maker
    val mgmt = new graft.mgmt.Management(GraphSchema())
    mgmt.makePropertyKey("name").make()
    mgmt.makeEdgeLabel("knows").make()
    mgmt.makeVertexLabel("person").make()
    assert(mgmt.current.propertyKeys.contains("name"))
  }

  test("index uniqueness: label-scoped and multi-key (testIndexUniqueness:4220-4282)") {
    import org.apache.spark.sql.types.LongType
    val schema = GraphSchema()
      .withPropertyKey(PropertyKeyDef("time", LongType))
      .withPropertyKey(PropertyKeyDef("text", StringType))
      .withVertexLabel(VertexLabelDef("person"))
      .withVertexLabel(VertexLabelDef("organization"))
      .withIndex(IndexDef("vindex1", ElementCategory.VERTEX, Seq("time"),
        unique = true, onlyLabel = Some("person")))
      .withIndex(IndexDef("vindex2", ElementCategory.VERTEX, Seq("time", "text"),
        unique = true))
    val noV = Seq.empty[(Long, String, Option[Long], Option[String])]
      .toDF("id", "label", "time", "text")
    val noE = spark.range(0).select(col("id"), col("id").as("src"),
      col("id").as("dst"), lit("x").as("label"))
    val base = PropertyGraph(schema, noV, noE)
    def vrow(id: Long, lbl: String, time: Long, text: Option[String] = None) =
      (id, lbl, Option(time), text)
    // Ia: same-transaction violation — two persons at time=1 in one batch
    val ia = intercept[IllegalArgumentException] {
      GraphIO.applyMutations(base, addVertices =
        Some(Seq(vrow(1L, "person", 1L), vrow(2L, "person", 1L))
          .toDF("id", "label", "time", "text")))
    }
    assert(ia.getMessage.contains("vindex1"))
    // Ib: cross-transaction violation — a person at time=1 already committed
    val g1 = GraphIO.applyMutations(base, addVertices =
      Some(Seq(vrow(1L, "person", 1L)).toDF("id", "label", "time", "text")))
    val ib = intercept[IllegalArgumentException] {
      GraphIO.applyMutations(g1, addVertices =
        Some(Seq(vrow(2L, "person", 1L)).toDF("id", "label", "time", "text")))
    }
    assert(ib.getMessage.contains("vindex1"))
    // Ic: a different label at the same time is fine (vindex1 is person-scoped)
    val g2 = GraphIO.applyMutations(g1, addVertices =
      Some(Seq(vrow(2L, "organization", 1L)).toDF("id", "label", "time", "text")))
    assert(g2.vertices.count() == 2)
    // IIa: multi-key same-transaction violation
    val iia = intercept[IllegalArgumentException] {
      GraphIO.applyMutations(g2, addVertices =
        Some(Seq(vrow(3L, "person", 2L, Some("hello")),
          vrow(4L, "person", 2L, Some("hello"))).toDF("id", "label", "time", "text")))
    }
    assert(iia.getMessage.contains("vindex2"))
    // IIb: multi-key cross-transaction violation
    val g3 = GraphIO.applyMutations(g2, addVertices =
      Some(Seq(vrow(3L, "organization", 2L, Some("hello")))
        .toDF("id", "label", "time", "text")))
    val iib = intercept[IllegalArgumentException] {
      GraphIO.applyMutations(g3, addVertices =
        Some(Seq(vrow(4L, "organization", 2L, Some("hello")))
          .toDF("id", "label", "time", "text")))
    }
    assert(iib.getMessage.contains("vindex2"))
  }

  test("open-instance registry: list with (current), force-close rules " +
      "(TitanGraphTest:1611-1622; ManagementSystem.java:177-202)") {
    val store = java.nio.file.Files.createTempDirectory("graft-instances").toString
    val r1 = graft.mgmt.InstanceRegistry.open(store, "instance-one")
    val r2 = graft.mgmt.InstanceRegistry.open(store, "instance-two")
    val open = r1.getOpenInstances()
    assert(open.size == 2)
    assert(open.contains("instance-one" + graft.mgmt.InstanceRegistry.CurrentSuffix))
    assert(open.contains("instance-two"))
    // cannot force-close the current instance
    intercept[IllegalArgumentException](r1.forceCloseInstance("instance-one"))
    // unknown instances are rejected
    intercept[IllegalArgumentException](r1.forceCloseInstance("nope"))
    // an instance registered AFTER this handle opened cannot be closed
    // (indicates a successful restart) — r3 registers after r1's view
    Thread.sleep(5)
    val r3 = graft.mgmt.InstanceRegistry.open(store, "instance-three")
    // r1 opened before r3 registered, so r1 may not reap it...
    intercept[IllegalArgumentException](r1.forceCloseInstance("instance-three"))
    // ...but r3 (newest handle) can reap the stale instance-two
    r3.forceCloseInstance("instance-two")
    assert(!r3.getOpenInstances().contains("instance-two"))
    r3.close(); r1.close()
    assert(graft.mgmt.InstanceRegistry.open(store, "probe").getOpenInstances()
      == Set("probe" + graft.mgmt.InstanceRegistry.CurrentSuffix))
  }

  test("vertex-label rename cascades through endpoint declarations and scoped indexes") {
    val s0 = GraphSchema()
      .withPropertyKey(PropertyKeyDef("uid", StringType))
      .withVertexLabel(VertexLabelDef("people"))
      .withVertexLabel(VertexLabelDef("group"))
      .withEdgeLabel(EdgeLabelDef("member",
        srcLabels = Set("people"), dstLabels = Set("group")))
      .withIndex(IndexDef("uidIx", ElementCategory.VERTEX, Seq("uid"),
        onlyLabel = Some("people")))
    val s1 = s0.renameVertexLabel("people", "person")
    assert(s1.vertexLabels.contains("person") && !s1.vertexLabels.contains("people"))
    assert(s1.edgeLabel("member").srcLabels == Set("person"))
    assert(s1.edgeLabel("member").dstLabels == Set("group"))
    assert(s1.indexes("uidIx").onlyLabel.contains("person"))
    // renaming to an existing name is rejected
    intercept[IllegalArgumentException](s1.renameVertexLabel("person", "group"))
  }

  test("buildMixedIndex rejects a declared key whose type cannot take the mapping") {
    val m = new graft.mgmt.Management(GraphSchema()
      .withPropertyKey(PropertyKeyDef("w", org.apache.spark.sql.types.DoubleType))
      .withPropertyKey(PropertyKeyDef("t", StringType)))
    // TEXT mapping applies to strings only (IndexProviderTest.testCommonSupport:422)
    val ex = intercept[IllegalArgumentException] {
      m.buildIndex("badIx", ElementCategory.VERTEX).addKey("w", Mapping.TEXT).buildMixedIndex()
    }
    assert(ex.getMessage.contains("does not support mapping"))
    // the valid pairs still build
    m.buildIndex("okIx", ElementCategory.VERTEX).addKey("t", Mapping.TEXT)
      .addKey("w").buildMixedIndex()
  }

  test("label renames cascade onlyLabel ONLY within the index's element category") {
    // a vertex label and an edge label deliberately share the name 'acme' —
    // onlyLabel names a label in the INDEX'S OWN category, so a vertex-label
    // rename must not move an EDGE index's scope (and vice versa)
    val s0 = GraphSchema()
      .withPropertyKey(PropertyKeyDef("uid", StringType))
      .withPropertyKey(PropertyKeyDef("w", StringType))
      .withVertexLabel(VertexLabelDef("acme"))
      .withEdgeLabel(EdgeLabelDef("acme"))
      .withIndex(IndexDef("vIx", ElementCategory.VERTEX, Seq("uid"),
        onlyLabel = Some("acme")))
      .withIndex(IndexDef("eIx", ElementCategory.EDGE, Seq("w"),
        onlyLabel = Some("acme")))
    val sv = s0.renameVertexLabel("acme", "corp")
    assert(sv.indexes("vIx").onlyLabel.contains("corp"))
    assert(sv.indexes("eIx").onlyLabel.contains("acme"),
      "edge-scoped index must not follow a vertex-label rename")
    val se = s0.renameEdgeLabel("acme", "works")
    assert(se.indexes("eIx").onlyLabel.contains("works"),
      "edge-scoped index must follow the edge-label rename")
    assert(se.indexes("vIx").onlyLabel.contains("acme"),
      "vertex-scoped index must not follow an edge-label rename")
  }

  test("query semantics over the schema fixture (testSchemaTypes:813-836)") {
    import graft.query.Direction
    val g = dataGraph
    def vq(id: Long) = graft.query.VertexCentricQuery(g).onVertices(id)
    // two in-parents at v, each with weight
    assert(vq(1L).direction(Direction.IN).labels("parent").edges().count() == 2)
    assert(vq(12L).direction(Direction.OUT).labels("parent").has("weight")
      .edges().count() == 1)
    // spouse other endpoint is v12
    val sp = vq(1L).direction(Direction.OUT).labels("spouse").vertexIds()
      .select("other").as[Long].collect()
    assert(sp.toSeq == Seq(12L))
    // the connect edge at v carries exactly uid=e1
    val ce = vq(1L).direction(Direction.BOTH).labels("connect").edges()
    assert(ce.count() == 1)
    assert(ce.select("euid").as[String].collect().toSeq == Seq("e1"))
    // link is unidirected: visible at v (out), invisible at v13 (in only)
    assert(vq(1L).direction(Direction.BOTH).labels("link").edges().count() == 1)
    assert(vq(13L).direction(Direction.BOTH).labels("link").edges().count() == 0)
    // v12.out(connect) → v2; v2.out(link) → v13
    val c2 = vq(12L).direction(Direction.OUT).labels("connect").vertexIds()
      .select("other").as[Long].collect()
    assert(c2.toSeq == Seq(2L))
    val l2 = vq(2L).direction(Direction.OUT).labels("link").vertexIds()
      .select("other").as[Long].collect()
    assert(l2.toSeq == Seq(13L))
    assert(g.V().vertices().count() == 4)
  }
}
