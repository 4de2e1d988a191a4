package graft.data

import graft.core._
import graft.expr.Geo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The canonical example graph — reference:
  * tc/example/GraphOfTheGodsFactory.java:52-131 (12 vertices, 17 edges).
  * Test fixture for predicate/traversal/vertex-centric semantics (FIXTURES.md §1).
  */
object GraphOfTheGods {

  val schema: GraphSchema = GraphSchema()
    .withPropertyKey(PropertyKeyDef("name", StringType, consistency = ConsistencyModifier.LOCK))
    .withPropertyKey(PropertyKeyDef("age", IntegerType))
    .withPropertyKey(PropertyKeyDef("time", IntegerType))
    .withPropertyKey(PropertyKeyDef("reason", StringType))
    .withPropertyKey(PropertyKeyDef("place", Geo.shapeType))
    .withEdgeLabel(EdgeLabelDef("father", Multiplicity.MANY2ONE))
    .withEdgeLabel(EdgeLabelDef("mother", Multiplicity.MANY2ONE))
    .withEdgeLabel(EdgeLabelDef("battled", signature = Seq("time")))
    .withEdgeLabel(EdgeLabelDef("lives", signature = Seq("reason")))
    .withEdgeLabel(EdgeLabelDef("pet"))
    .withEdgeLabel(EdgeLabelDef("brother"))
    .withVertexLabel(VertexLabelDef("titan"))
    .withVertexLabel(VertexLabelDef("location"))
    .withVertexLabel(VertexLabelDef("god"))
    .withVertexLabel(VertexLabelDef("demigod"))
    .withVertexLabel(VertexLabelDef("human"))
    .withVertexLabel(VertexLabelDef("monster"))
    .withIndex(IndexDef("name", ElementCategory.VERTEX, Seq("name"), unique = true))
    .withIndex(IndexDef("vertices", ElementCategory.VERTEX, Seq("age"), composite = false))
    .withIndex(IndexDef("edges", ElementCategory.EDGE, Seq("reason", "place"), composite = false))
    .withRelationIndex(RelationIndexDef("battlesByTime", "battled", Seq("time"), SortOrder.DESC))

  // stable vertex ids
  val ids: Map[String, Long] = Seq("saturn", "sky", "sea", "jupiter", "neptune",
    "hercules", "alcmene", "pluto", "nemean", "hydra", "cerberus", "tartarus")
    .zipWithIndex.map { case (n, i) => n -> (i + 1).toLong }.toMap

  def load(spark: SparkSession): PropertyGraph = {
    import spark.implicits._
    val vertexRows = Seq(
      ("saturn", "titan", Some(10000)), ("sky", "location", None), ("sea", "location", None),
      ("jupiter", "god", Some(5000)), ("neptune", "god", Some(4500)),
      ("hercules", "demigod", Some(30)), ("alcmene", "human", Some(45)),
      ("pluto", "god", Some(4000)), ("nemean", "monster", None), ("hydra", "monster", None),
      ("cerberus", "monster", None), ("tartarus", "location", None))
    val vertices = vertexRows.map { case (n, l, a) => (ids(n), l, n, a) }
      .toDF("id", "label", "name", "age")
      .withColumn("age", col("age").cast(IntegerType))

    // (src, label, dst, time, reason, place(lat,lon))
    val edgeRows: Seq[(String, String, String, Option[Int], Option[String], Option[(Double, Double)])] = Seq(
      ("jupiter", "father", "saturn", None, None, None),
      ("jupiter", "lives", "sky", None, Some("loves fresh breezes"), None),
      ("jupiter", "brother", "neptune", None, None, None),
      ("jupiter", "brother", "pluto", None, None, None),
      ("neptune", "lives", "sea", None, Some("loves waves"), None),
      ("neptune", "brother", "jupiter", None, None, None),
      ("neptune", "brother", "pluto", None, None, None),
      ("hercules", "father", "jupiter", None, None, None),
      ("hercules", "mother", "alcmene", None, None, None),
      ("hercules", "battled", "nemean", Some(1), None, Some((38.1, 23.7))),
      ("hercules", "battled", "hydra", Some(2), None, Some((37.7, 23.9))),
      ("hercules", "battled", "cerberus", Some(12), None, Some((39.0, 22.0))),
      ("pluto", "brother", "jupiter", None, None, None),
      ("pluto", "brother", "neptune", None, None, None),
      ("pluto", "lives", "tartarus", None, Some("no fear of death"), None),
      ("pluto", "pet", "cerberus", None, None, None),
      ("cerberus", "lives", "tartarus", None, None, None))
    val base = edgeRows.zipWithIndex.map { case ((s, l, d, t, r, p), i) =>
      (i + 1L, ids(s), ids(d), l, t, r, p.map(_._1), p.map(_._2))
    }.toDF("id", "src", "dst", "label", "time", "reason", "lat", "lon")
    val edges = base
      .withColumn("time", col("time").cast(IntegerType))
      .withColumn("place",
        when(col("lat").isNotNull, Geo.pointCol(col("lat"), col("lon"))))
      .drop("lat", "lon")
    PropertyGraph(schema, vertices, edges)
  }
}
