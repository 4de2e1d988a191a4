package graft.mgmt

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.ArrayType

/** Automatic schema creation on first use — the reference's
  * `DefaultSchemaMaker` hook (tc/core/schema/DefaultSchemaMaker.java,
  * tc/graphdb/tinkerpop/Tp3DefaultSchemaMaker.java; config `schema.default`,
  * docs/titanbasics.txt schema.default): Titan users routinely skip explicit
  * DDL and let the first write synthesize property keys / labels; strict
  * deployments set `schema.default=none` (DisableDefaultSchemaMaker) and get
  * an IllegalArgumentException instead.
  *
  * Here ingest is "a PropertyGraph over typed parquet frames", so first-use
  * synthesis reads the missing types off the frames themselves:
  *  - property keys: every non-reserved column absent from the catalog, with
  *    the column's EXACT parquet type (the Tp3 maker's exact-class dataType
  *    inference) — array columns become Cardinality.LIST (our SET/LIST model
  *    stores ArrayType), scalars Cardinality.SINGLE;
  *  - vertex labels: distinct `label` values absent from the catalog (plain,
  *    non-partitioned, non-static — the maker's defaults);
  *  - edge labels: distinct edge `label` values, Multiplicity.MULTI directed
  *    (Tp3DefaultSchemaMaker.makeEdgeLabel's default).
  * The distinct-label reads are driver-bounded control reads (label sets,
  * not data).
  */
object DefaultSchemaMaker {

  private val VertexReserved = Set("id", "label")
  private val EdgeReserved = Set("id", "src", "dst", "label")

  private def distinctLabels(df: DataFrame): Seq[String] =
    if (!df.columns.contains("label")) Nil
    else df.select("label").distinct().collect().map(_.getString(0)).toSeq.sorted

  private def undeclaredKeys(schema: GraphSchema, df: DataFrame,
      reserved: Set[String]): Seq[(String, org.apache.spark.sql.types.DataType)] =
    df.schema.fields.toSeq
      .filterNot(f => reserved.contains(f.name))
      .filterNot(f => schema.propertyKeys.contains(f.name))
      .map(f => f.name -> f.dataType)

  /** Auto-create every undeclared type the frames use (schema.default=default:
    * the permissive maker). Idempotent; already-declared types are untouched. */
  def complete(schema: GraphSchema, vertices: DataFrame, edges: DataFrame): GraphSchema = {
    val withKeys = (undeclaredKeys(schema, vertices, VertexReserved) ++
      undeclaredKeys(schema, edges, EdgeReserved))
      .distinctBy(_._1)
      .foldLeft(schema) { case (s, (name, dt)) =>
        val (elemType, card) = dt match {
          case ArrayType(et, _) => (et, Cardinality.LIST)
          case t => (t, Cardinality.SINGLE)
        }
        s.withPropertyKey(PropertyKeyDef(name, elemType, card))
      }
    val withV = distinctLabels(vertices)
      .filterNot(withKeys.vertexLabels.contains)
      .foldLeft(withKeys)((s, l) => s.withVertexLabel(VertexLabelDef(l)))
    distinctLabels(edges)
      .filterNot(withV.edgeLabels.contains)
      .foldLeft(withV)((s, l) => s.withEdgeLabel(EdgeLabelDef(l)))
  }

  /** Strict mode (schema.default=none, DisableDefaultSchemaMaker): reject any
    * undeclared type with the reference's IllegalArgumentException, naming
    * everything missing in one shot. */
  def require(schema: GraphSchema, vertices: DataFrame, edges: DataFrame): Unit = {
    val missing =
      undeclaredKeys(schema, vertices, VertexReserved).map(k => s"property key '${k._1}'") ++
      undeclaredKeys(schema, edges, EdgeReserved).map(k => s"property key '${k._1}'") ++
      distinctLabels(vertices).filterNot(schema.vertexLabels.contains).map(l => s"vertex label '$l'") ++
      distinctLabels(edges).filterNot(schema.edgeLabels.contains).map(l => s"edge label '$l'")
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"undeclared schema types (schema.default=none forbids automatic creation): ${missing.distinct.mkString(", ")}")
  }
}
