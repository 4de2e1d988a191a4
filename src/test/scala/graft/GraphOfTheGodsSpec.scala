package graft

import graft.data.GraphOfTheGods
import graft.expr.{Geo, P}
import graft.query.{Direction, VertexCentricQuery}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Canonical-graph semantics checks — the documented query examples from
  * reference docs/searchpredicates.txt:44-66 and the GraphOfTheGodsFactory
  * tutorial queries. */
class GraphOfTheGodsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  lazy val gods = GraphOfTheGods.load(spark)

  test("12 vertices, 17 edges") {
    assert(gods.vertices.count() === 12)
    assert(gods.edges.count() === 17)
  }

  test("1) find vertices named hercules") {
    val rows = gods.V().has("name", "hercules").dataframe.collect()
    assert(rows.map(_.getAs[String]("label")).toSeq === Seq("demigod"))
  }

  test("2) age gt(50)") {
    // ages: saturn 10000, jupiter 5000, neptune 4500, pluto 4000, alcmene 45, hercules 30
    assert(gods.V().has("age", P.gt(50)).count() === 4)
  }

  test("2b) age inside(1000,5000) order by age") {
    // inside = exclusive both ends in TinkerPop; Titan interval [start,end) differs;
    // the doc example uses inside(1000,5000) ⇒ {4000, 4500} (5000 exclusive)
    val asc = gods.V().has("age", P.and(P.gt(1000), P.lt(5000)))
      .orderBy("age").dataframe.collect().map(_.getAs[String]("name")).toSeq
    assert(asc === Seq("pluto", "neptune"))
  }

  test("3) edges with place within 50km of athens") {
    val n = gods.E().has("place", Geo.geoWithin(Geo.circle(37.97, 23.72, 50))).count()
    assert(n === 2) // nemean(38.1,23.7) and hydra(37.7,23.9); cerberus(39,22) is ~175km away
  }

  test("4) text predicates on reason") {
    assert(gods.E().has("reason", P.textContains("loves")).count() === 2)
    assert(gods.E().has("reason", P.textContains("loves"))
      .has("reason", P.textContains("breezes")).count() === 1)
    assert(gods.E().has("reason", P.textContainsPrefix("lov")).count() === 2)
    assert(gods.E().has("reason", P.textContainsRegex("br[ez]*s")).count() === 1)
  }

  test("5) age gt(1000) and named saturn") {
    val rows = gods.V().has("age", P.gt(1000)).has("name", "saturn").dataframe.collect()
    assert(rows.length === 1 && rows(0).getAs[Long]("id") === GraphOfTheGods.ids("saturn"))
  }

  test("hercules 2-hop: father's father is saturn") {
    val grandfather = gods.traversal.V().has("name", "hercules")
      .out("father").out("father").values("name").collect()
    assert(grandfather.map(_.getString(0)).toSeq === Seq("saturn"))
  }

  test("hercules battled monsters with time filter") {
    val battled = gods.traversal.V().has("name", "hercules")
      .outE("battled").has("time", P.gt(1)).inV().values("name")
      .collect().map(_.getString(0)).toSet
    assert(battled === Set("hydra", "cerberus"))
  }

  test("vertex-centric: battles ordered by time desc (battlesByTime index order)") {
    val herc = GraphOfTheGods.ids("hercules")
    val rows = VertexCentricQuery(gods)
      .onVertices(herc).labels("battled").direction(Direction.OUT)
      .orderBy("time", asc = false).limit(10).edges().collect()
    assert(rows.map(_.getAs[Int]("time")).toSeq === Seq(12, 2, 1))
  }

  test("BOTH direction counts each incident edge once; brother edges both ways") {
    val jupiter = GraphOfTheGods.ids("jupiter")
    val q = VertexCentricQuery(gods).onVertices(jupiter).labels("brother")
      .direction(Direction.BOTH).edgeCount().collect()
    // jupiter has brother-edges: out to neptune+pluto, in from neptune+pluto = 4
    assert(q.head.getAs[Long]("count") === 4)
  }

  test("multiplicity violations: none on canonical graph") {
    assert(gods.multiplicityViolations().count() === 0)
    assert(gods.uniqueIndexViolations().count() === 0)
  }

  test("geo cell index: pruned lookup equals brute-force geoWithin") {
    import org.apache.spark.sql.functions.col
    val ix = graft.core.IndexDef("edgePlace", graft.core.ElementCategory.EDGE,
      Seq("place"), composite = false)
    val cells = graft.index.Indexes.materializeGeo(gods, ix, col("place"), cellDeg = 1.0)
      .filter(col("cell_lat").isNotNull) // only battled edges carry a place
    val viaIndex = graft.index.Indexes.lookupGeoWithinCircle(
      gods, cells, col("place"), 37.97, 23.72, 50.0, cellDeg = 1.0,
      element = graft.core.ElementCategory.EDGE)
    val brute = gods.E().has("place", Geo.geoWithin(Geo.circle(37.97, 23.72, 50))).dataframe
    assert(viaIndex.select("id").collect().map(_.getLong(0)).toSet ===
      brute.select("id").collect().map(_.getLong(0)).toSet)
    // the 1°-cell bounding box of a 50km circle prunes to a strict subset
    assert(cells.count() > 0)
    // near-polar circle degrades to full-lon range without error
    val polar = graft.index.Indexes.lookupGeoWithinCircle(
      gods, cells, col("place"), 89.5, 0.0, 500.0, cellDeg = 1.0,
      element = graft.core.ElementCategory.EDGE)
    assert(polar.count() === 0)
  }
}
