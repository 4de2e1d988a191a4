package graft.data

import graft.core._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Graph persistence — the engine's source/sink surface (SURVEY §2.A).
  *
  * The reference reads/writes BigTable rows via storage adapters and exports
  * GraphSON/Gryo through TinkerPop serializers (tc/graphdb/tinkerpop/
  * TitanIoRegistry.java). Here the canonical store is Parquet (columnar
  * vertices/edges + a JSON schema catalog file), and GraphSON-style JSON
  * export/import is provided for interchange.
  */
object GraphIO {

  /** Persist the graph: parquet vertices/edges. Edges are written in the
    * vertex-centric layout (bucketed by src, sorted by (src,label)) so slice
    * queries prune on min/max stats — the default layout a 100 TB deployment
    * wants (SURVEY §1.4 adjacency mapping). */
  def save(g: PropertyGraph, path: String, buckets: Int = 32): Unit = {
    // vertices partitioned by label: label-filtered scans prune whole
    // directories (the columnar analogue of the reference's per-label
    // partitioned vertex ids, IDManager.java:348-356)
    g.vertices.write.mode(SaveMode.Overwrite)
      .partitionBy("label").parquet(s"$path/vertices")
    g.edges.repartition(buckets, col("src"))
      .sortWithinPartitions(col("src"), col("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/edges")
  }

  def load(spark: SparkSession, path: String, schema: GraphSchema = GraphSchema()): PropertyGraph =
    PropertyGraph(schema,
      spark.read.parquet(s"$path/vertices"),
      spark.read.parquet(s"$path/edges"))

  /** GraphSON-style export: one JSON object per element, vertices and edges in
    * separate directories (TinkerPop 3 GraphSON is line-JSON too). */
  def exportJson(g: PropertyGraph, path: String): Unit = {
    g.vertices.write.mode(SaveMode.Overwrite).json(s"$path/vertices")
    g.edges.write.mode(SaveMode.Overwrite).json(s"$path/edges")
  }

  def importJson(spark: SparkSession, path: String,
      schema: GraphSchema = GraphSchema()): PropertyGraph =
    PropertyGraph(schema,
      spark.read.json(s"$path/vertices"),
      spark.read.json(s"$path/edges"))

  /** Mutation sink (KCVS mutate analogue, KeyColumnValueStore.java:79): apply
    * a batch of additions and deletions as a snapshot merge — last-writer-wins
    * by element id, deletions as an anti-join. Locks are N/A in snapshot batch
    * semantics (ConsistencyModifier.LOCK degenerates to the unique checks in
    * PropertyGraph.uniqueIndexViolations). */
  def applyMutations(g: PropertyGraph,
      addVertices: Option[DataFrame] = None, deleteVertexIds: Option[DataFrame] = None,
      addEdges: Option[DataFrame] = None, deleteEdgeIds: Option[DataFrame] = None): PropertyGraph = {
    var v = g.vertices
    var e = g.edges
    addVertices.foreach { av =>
      v = v.join(av.select(col("id").as("__nid")), col("id") === col("__nid"), "left_anti")
        .unionByName(av, allowMissingColumns = true)
    }
    deleteVertexIds.foreach { dv =>
      val ids = dv.select(col("id").as("__did"))
      v = v.join(ids, col("id") === col("__did"), "left_anti")
      // cascade: edges incident to deleted vertices are removed (the reference
      // deletes the adjacency row; ghosts that escape are handled by GraphOps)
      e = e.join(ids, col("src") === col("__did"), "left_anti")
        .join(ids, col("dst") === col("__did"), "left_anti")
    }
    addEdges.foreach { ae =>
      e = e.join(ae.select(col("id").as("__nid")), col("id") === col("__nid"), "left_anti")
        .unionByName(ae, allowMissingColumns = true)
    }
    deleteEdgeIds.foreach { de =>
      e = e.join(de.select(col("id").as("__did")), col("id") === col("__did"), "left_anti")
    }
    g.copy(vertices = v, edges = e)
  }
}
