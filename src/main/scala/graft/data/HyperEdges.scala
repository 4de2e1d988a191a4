package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Limited HYPER-EDGE support — reference docs/advschema.txt:96-109:
  * unidirected edges can be added ON edges and ON properties ("where we add
  * a unidirected `author` edge on the `knows` edge to store the fact that
  * `user` added this edge"). The reference models this as a relation whose
  * out-endpoint is itself a relation; the columnar form is a META-EDGE
  * frame `(src_edge, label, dst)` whose source endpoint is EDGE-ID-valued —
  * rows join against `edges.id` instead of `vertices.id`. Unidirected
  * semantics are structural: only the edge→vertex direction exists (there
  * is deliberately no inV companion — the in-vertex is unaware of the
  * meta-edge, exactly the reference's hyperlink analogy), and, as the
  * reference warns, the pointed-at vertex is NOT existence-checked here —
  * [[graft.olap.GraphOps]] ghost-vertex removal is the resolution path.
  *
  * Meta-properties ON an edge relation's property reuse the
  * [[MultiProperties]] cell encoding (`struct<value, meta map>`) applied to
  * an edge property column — the same layout vertex properties get, so the
  * cell predicates (anyMetaEquals / cellsWithMeta / values) work unchanged.
  *
  * Scale: meta-edges are a plain 3-column frame keyed by edge id — every
  * traversal is an equi-join on `src_edge` (shuffle-pruned by the usual
  * semi-join pushdown); cells ride the edge row with no side table.
  */
object HyperEdges {

  /** Build unidirected meta-edges FROM each row of an edge selection TO the
    * vertex id `dst` evaluates to on that row. One meta-edge per edge row —
    * the id is inherited from the source edge (composite identity
    * (src_edge, label), deterministic, no id allocator needed). */
  def attachToEdges(edges: DataFrame, label: String, dst: Column): DataFrame =
    edges.select(col("id").as("src_edge"), lit(label).as("label"),
      dst.cast("long").as("dst"))

  /** OUT traversal through meta-edges: the `label` meta-edges of the given
    * frame resolved to their pointed-at vertices. Returns `src_edge`
    * followed by the full vertex row — callers join back on `src_edge` for
    * edge-side payloads. The IN direction does not exist (unidirected). */
  def outV(g: PropertyGraph, metaEdges: DataFrame, label: String): DataFrame = {
    val m = metaEdges.filter(col("label") === label)
      .select(col("src_edge"), col("dst").as("id"))
    m.join(g.vertices, Seq("id")).drop("id")
  }

  /** Meta-properties on an edge relation's property: wrap `prop` into a
    * one-cell [[MultiProperties]] column `<prop>_cells` carrying the given
    * annotations — `p1 = e.property('k', v); p1.property('source', …)` in
    * the reference's API. Null property values produce an empty cell array
    * (no property ⇒ nothing to annotate). */
  def annotateEdgeProperty(edges: DataFrame, prop: String,
      meta: (String, Column)*): DataFrame =
    edges.withColumn(s"${prop}_cells",
      when(col(prop).isNotNull, array(MultiProperties.cell(col(prop), meta: _*)))
        .otherwise(array().cast(
          s"array<struct<value:${edges.schema(prop).dataType.sql},meta:map<string,string>>>")))

  /** Unidirected edge ON a property: the target vertex id recorded as a
    * meta-annotation of the property cell (advschema.txt: "unidirected
    * edges can be added on … properties"). */
  def cellWithEdge(value: Column, edgeLabel: String, dstVertexId: Column): Column =
    MultiProperties.cell(value, edgeLabel -> dstVertexId)

  /** OUT traversal from property cells through such an annotation: explode
    * the cells of `prop` on `df` and resolve the `edgeLabel` meta-entry to
    * vertices. Returns (id, value, vertex columns…) — `id` is the OWNING
    * element's id, `value` the property value the edge hangs off. */
  def cellOutV(g: PropertyGraph, df: DataFrame, prop: String,
      edgeLabel: String): DataFrame = {
    val cells = MultiProperties.explodeCells(df, prop)
      .filter(col("meta").getItem(edgeLabel).isNotNull)
      .select(col("id"), col("value"),
        col("meta").getItem(edgeLabel).cast("long").as("__dst"))
    cells.join(g.vertices.select(g.vertices.columns.map {
        case "id" => col("id").as("__dst")
        case c => col(c)
      }: _*), Seq("__dst")).drop("__dst")
  }
}
