package graft.mgmt

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * synthesis reads the missing types off the frames themselves. This is a
  * deliberate typed-frame ADAPTATION of the Tp3 defaults, not their exact
  * behavior (the reference's Tp3 maker declares every key as
  * dataType(Object.class) with Cardinality.LIST because TinkerPop property
  * values are untyped there; a columnar engine has the exact type in the
  * parquet footer and single-valued scalars, so declaring anything weaker
  * would throw information away):
  *  - property keys: every non-reserved column absent from the catalog, with
  *    the column's EXACT parquet type — array columns become Cardinality.LIST
  *    (our SET/LIST model stores ArrayType), scalars Cardinality.SINGLE;
  *  - vertex labels: distinct `label` values absent from the catalog (plain,
  *    non-partitioned, non-static — the maker's defaults);
  *  - edge labels: distinct edge `label` values, Multiplicity.MULTI directed
  *    (Tp3DefaultSchemaMaker.makeEdgeLabel's default).
  * The distinct-label reads are driver-bounded control reads (label sets,
  * not data).
  *
  * A column name appearing in BOTH frames with conflicting types is rejected
  * (the reference throws when a write reuses an existing key at a different
  * type — property key types are immutable once created); first-use creation
  * must not silently pick a winner.
  */
object DefaultSchemaMaker {

  /** `spark.graft.schema.default` — the engine's spelling of the reference's
    * `schema.default` graph config. */
  val ConfKey = "spark.graft.schema.default"

  private val VertexReserved = Set("id", "label", graft.expr.ImplicitKeys.TimestampColumn)
  private val EdgeReserved = Set("id", "src", "dst", "label", graft.expr.ImplicitKeys.TimestampColumn)

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
    * the permissive maker). Idempotent; already-declared types are untouched.
    * Throws if the same undeclared name carries conflicting types across the
    * vertex and edge frames (type-immutability parity — see class doc). */
  def complete(schema: GraphSchema, vertices: DataFrame, edges: DataFrame): GraphSchema = {
    val candidates = undeclaredKeys(schema, vertices, VertexReserved) ++
      undeclaredKeys(schema, edges, EdgeReserved)
    val conflicts = candidates.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
    if (conflicts.nonEmpty) throw new IllegalArgumentException(
      "conflicting types for auto-created property key(s): " +
        conflicts.toSeq.sortBy(_._1).map { case (n, ts) =>
          s"'$n' (${ts.map(_._2.simpleString).distinct.mkString(" vs ")})"
        }.mkString(", "))
    val withKeys = candidates
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
    * everything missing in one shot. (Type conformance of DECLARED keys is
    * the structural check — PropertyGraph.schemaViolations — not the
    * maker's.) */
  def require(schema: GraphSchema, vertices: DataFrame, edges: DataFrame): Unit = {
    val missing =
      undeclaredKeys(schema, vertices, VertexReserved).map(k => s"property key '${k._1}'") ++
      undeclaredKeys(schema, edges, EdgeReserved).map(k => s"property key '${k._1}'") ++
      distinctLabels(vertices).filterNot(schema.vertexLabels.contains).map(l => s"vertex label '$l'") ++
      distinctLabels(edges).filterNot(schema.edgeLabels.contains).map(l => s"edge label '$l'")
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"undeclared schema types (schema.default=none forbids automatic creation): ${missing.distinct.mkString(", ")}")
  }

  /** Run the CONFIGURED maker over a pair of element frames — the hook the
    * write/load path calls (Titan runs its maker inside StandardTitanTx's
    * getOrCreate paths, so a write carrying an undeclared type transparently
    * creates it; `schema.default=none` makes the same write throw).
    * Returns the (possibly completed) schema. */
  def applyConfigured(spark: SparkSession, schema: GraphSchema,
      vertices: DataFrame, edges: DataFrame): GraphSchema =
    spark.conf.get(ConfKey, "default") match {
      case "default" => complete(schema, vertices, edges)
      case "none" => require(schema, vertices, edges); schema
      case other => throw new IllegalArgumentException(
        s"$ConfKey: unknown maker '$other' (expected 'default' or 'none')")
    }
}
