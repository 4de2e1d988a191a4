package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Collection (SET/LIST) index semantics — the round-15 hardening of the
  * inverted per-element access path:
  *   - typed operand comparison (an index may only change the ACCESS PATH,
  *     never results — even when Scala's and Spark's string renderings of
  *     the operand differ, e.g. Int 5 vs double cells "5.0");
  *   - has(key, null) ≡ hasNot(key) on collection keys (empty array and
  *     null column both match — GraphCentricQueryBuilder.java:109-116);
  *   - the per-element layout is structurally distinct (cellvalue column)
  *     from a scalar string table, so a mis-registered scalar table can
  *     never masquerade as an inverted index and return empty. */
class CollectionIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import graft.core._

  private def listGraph(withIndex: Boolean): graft.data.PropertyGraph = {
    val vs = spark.range(4).select((col("id") + 1L).as("id"), lit("v").as("label"),
      when(col("id") === 0, array(lit(1.0), lit(5.0)))
        .when(col("id") === 1, array(lit(5.0)))
        .when(col("id") === 2, array().cast("array<double>"))
        .otherwise(lit(null).cast("array<double>")).as("nums"))
    val schema = GraphSchema()
      .withPropertyKey(PropertyKeyDef("nums",
        org.apache.spark.sql.types.DoubleType, Cardinality.LIST))
      .withIndex(IndexDef("byNums", ElementCategory.VERTEX, Seq("nums"),
        composite = false))
    val g = graft.data.PropertyGraph(schema, vs,
      vs.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
    if (withIndex)
      g.withIndexTable("byNums",
        graft.index.Indexes.materializeCollection(g, schema.indexes("byNums")))
    else g
  }

  test("indexed collection lookup compares TYPED values — Int operand finds double cells") {
    val scan = listGraph(withIndex = false)
    val ixd = listGraph(withIndex = true)
    // cells stringify as "5.0"; the operand is the Int 5 (String.valueOf ⇒ "5")
    // — the index path must still find both holders, same as the scan path
    val scanIds = scan.V().has("nums", 5).vertices()
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(scanIds == Seq(1L, 2L))
    val ixIds = ixd.V().has("nums", 5).forceIndex().vertices()
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ixIds == scanIds, "index changed results, not just the access path")
    // and a genuinely absent value matches nothing through the index
    assert(ixd.V().has("nums", 7).forceIndex().vertices().count() == 0)
  }

  test("materializeCollection emits the distinct per-element layout (cellvalue)") {
    val g = listGraph(withIndex = true)
    assert(g.indexTables("byNums").columns.toSet == Set("key", "cellvalue", "id"))
    // LIST duplicates: v1 holds [1.0, 5.0] → 2 cells, v2 → 1, v3 empty, v4 null
    assert(g.indexTables("byNums").count() == 3)
  }

  test("has(key, null) ≡ hasNot(key) on a collection key: null AND empty match") {
    val g = listGraph(withIndex = false)
    val viaNull = g.V().has("nums", null).vertices()
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val viaHasNot = g.V().hasNot("nums").vertices()
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaHasNot == Seq(3L, 4L), "empty array and null column are both absent")
    assert(viaNull == viaHasNot)
    // same equivalence on the Gremlin surface
    val trav = g.traversal.V().has("nums", null).toDF
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(trav == viaHasNot)
  }

  test("indexed collection lookup compares TYPED timestamp cells " +
      "(Spark cast second-fraction form vs java.sql.Timestamp.toString)") {
    // Spark renders a whole-second timestamp cell as "... 00:00:01" while
    // String.valueOf(new Timestamp(1000L)) gives "... 00:00:01.0" — the
    // string-compare bug class the typed operand cast chain fixes
    val vs = spark.range(3).select((col("id") + 1L).as("id"), lit("v").as("label"),
      array(col("id").cast("timestamp"), (col("id") + 100L).cast("timestamp")).as("when"))
    val schema = graft.core.GraphSchema()
      .withPropertyKey(graft.core.PropertyKeyDef("when",
        org.apache.spark.sql.types.TimestampType, graft.core.Cardinality.LIST))
      .withIndex(graft.core.IndexDef("byWhen", graft.core.ElementCategory.VERTEX,
        Seq("when"), composite = false))
    val g0 = graft.data.PropertyGraph(schema, vs,
      vs.limit(0).select(col("id"), col("id").as("src"), col("id").as("dst"), col("label")))
    val g = g0.withIndexTable("byWhen",
      graft.index.Indexes.materializeCollection(g0, schema.indexes("byWhen")))
    val t1 = new java.sql.Timestamp(1000L) // cell for vertex id 2 (range id 1)
    assert(String.valueOf(t1).endsWith(".0"), "precondition: Timestamp stringifies with .0")
    val ids = g.V().has("when", t1).forceIndex().vertices()
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L), "typed operand must find the timestamp cell through the index")
  }

  test("a scalar string table cannot masquerade as a collection index") {
    // register a SCALAR (key, value, id) layout under the collection index's
    // name: the planner must not take it as the inverted path (it has no
    // per-cell rows — the semi-join would wrongly return empty). The layouts
    // are structurally distinct, so the scan path answers and force-index
    // correctly reports no usable index.
    val g0 = listGraph(withIndex = false)
    val bogus = g0.vertices.filter(col("nums").isNotNull)
      .select(lit("nums").as("key"), col("nums").cast("string").as("value"), col("id"))
    val g = g0.withIndexTable("byNums", bogus)
    assert(g.V().has("nums", 5).vertices().count() == 2,
      "scan path must answer when the registered table has the wrong layout")
    intercept[IllegalStateException](g.V().has("nums", 5).forceIndex().vertices())
  }
}
