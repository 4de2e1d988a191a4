package graft.data

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/** Canonical property-graph container.
  *
  * Vertices: `id: LONG, label: STRING, <property columns...>` (absent property = null,
  * LIST/SET cardinality = array column). Edges: `id: LONG, src: LONG, dst: LONG,
  * label: STRING, <property columns...>`. Every edge is stored ONCE (the reference
  * stores each edge twice, once per endpoint — docs/datamodel.txt:7 — because its
  * storage is vertex-partitioned adjacency rows; a columnar scan engine gets both
  * directions from one copy with `src = v OR dst = v`).
  */
final case class PropertyGraph(
    schema: GraphSchema,
    vertices: DataFrame,
    edges: DataFrame,
    indexTables: Map[String, DataFrame] = Map.empty) {

  def spark: SparkSession = vertices.sparkSession

  /** Register a materialized composite-index table (key columns + id) under
    * the declared index's name — the backing store the automatic index
    * selection in GraphQuery consults (reference: an index must be ENABLED
    * and backed by storage before the query planner may choose it,
    * GraphCentricQueryBuilder.java:185-323 + SchemaStatus). */
  def withIndexTable(name: String, table: DataFrame): PropertyGraph =
    copy(indexTables = indexTables + (name -> table))

  /** Property columns present on the vertex table. */
  // `_`-prefixed columns are system provenance (`_ts` write time, `_pts`
  // per-cell timestamps) surfaced through IMPLICIT keys (~timestamp/~ttl),
  // never enumerable as property elements — the reference's propertyCount()
  // counts user cells only (TitanEventualGraphTest.java:114).
  def vertexPropColumns: Seq[String] =
    vertices.columns.filterNot(c => c == "id" || c == "label" || c.startsWith("_"))
  def edgePropColumns: Seq[String] =
    edges.columns.filterNot(c =>
      c == "id" || c == "src" || c == "dst" || c == "label" || c.startsWith("_"))

  /** Entry points (reference: graph.query() / tx.query() — TitanGraphQuery). */
  def V(): graft.query.GraphQuery = graft.query.GraphQuery.vertices(this)
  def E(): graft.query.GraphQuery = graft.query.GraphQuery.edges(this)

  /** Traversal entry (Gremlin g.V() analogue). */
  def traversal: graft.traverse.TraversalSource = new graft.traverse.TraversalSource(this)

  /** Graph.Variables view (TinkerPop graph.variables().asMap() — the
    * reference backs these with its system configuration store; here they
    * live in the catalog and persist with it, [[graft.core.GraphSchema]]). */
  def variables: Map[String, String] = schema.variables

  /** Vertices by point lookup — reference: StandardTitanTx.java:383-420.
    * Reads through the catalog-TTL view (identity without TTL declarations):
    * getV of an expired vertex returns nothing, testVertexTTLWith
    * CompositeIndex (TitanGraphTest.java:4833-4834). */
  def vertexById(ids: Long*): DataFrame = {
    val live = graft.expr.ImplicitKeys.ttlAutoFilter(schema, vertices, isVertex = true)
    if (ids.size == 1) live.filter(col("id") === ids.head)
    else live.filter(col("id").isin(ids: _*))
  }

  /** Induced subgraph from an edge predicate (Gremlin SubgraphStep,
    * TinkerPop SubgraphStrategy): the matching edges plus exactly their
    * incident vertices. Distributed: edge filter (pushed to the scan) + a
    * semi-join of vertices against the incident-id set. */
  def subgraph(edgeCond: Column): PropertyGraph = {
    val e = edges.filter(edgeCond)
    val incident = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    copy(vertices = vertices.join(incident, Seq("id"), "left_semi"), edges = e)
  }

  /** Vertex-induced subgraph (the vertex criterion of TinkerPop's
    * SubgraphStrategy): the matching vertices plus exactly the edges whose
    * BOTH endpoints match. Distributed: vertex filter (pushed to the scan)
    * + two semi-joins of the edges against the kept-id set. */
  def subgraphVertices(vertexCond: Column): PropertyGraph = {
    val v = vertices.filter(vertexCond)
    val keep = v.select(col("id"))
    val e = edges
      .join(keep.select(col("id").as("__ks")), col("src") === col("__ks"), "left_semi")
      .join(keep.select(col("id").as("__kd")), col("dst") === col("__kd"), "left_semi")
    copy(vertices = v, edges = e)
  }

  /** GraphX bridge for iterative analytics. Vertex attr = label; edge attr =
    * (label, weightCol) when provided, else 1.0. */
  def toGraphX(weightCol: Option[String] = None): GxGraph[String, Double] = {
    val vrdd: RDD[(VertexId, String)] =
      vertices.select(col("id"), col("label")).rdd
        .map(r => (r.getLong(0), r.getString(1)))
    val w: Column = weightCol.map(c => coalesce(col(c).cast("double"), lit(1.0))).getOrElse(lit(1.0))
    val erdd: RDD[GxEdge[Double]] =
      edges.select(col("src"), col("dst"), w.as("w")).rdd
        .map(r => GxEdge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    GxGraph(vrdd, erdd, defaultVertexAttr = "",
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** Degenerate (id-only) GraphX graph — cheapest bridge for structure-only algorithms. */
  def toGraphXStructure: GxGraph[Unit, Unit] = {
    val erdd: RDD[GxEdge[Unit]] =
      edges.select(col("src"), col("dst")).rdd
        .map(r => GxEdge(r.getLong(0), r.getLong(1), ()))
    GxGraph.fromEdges(erdd, (),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** Validate multiplicity constraints (reference: Multiplicity.java:50-75, enforced
    * transactionally there; here a batch check returning violations).
    * Returns (label, src|dst, key, count) rows for every violated bound. */
  def multiplicityViolations(): DataFrame = {
    val checks = schema.edgeLabels.values.flatMap { el =>
      val lbl = el.name
      val base = edges.filter(col("label") === lbl)
      val out = el.multiplicity.outLimit.map { lim =>
        base.groupBy(col("src").as("key")).count()
          .filter(col("count") > lim)
          .select(lit(lbl).as("label"), lit("out").as("side"), col("key"), col("count"))
      }
      val in = el.multiplicity.inLimit.map { lim =>
        base.groupBy(col("dst").as("key")).count()
          .filter(col("count") > lim)
          .select(lit(lbl).as("label"), lit("in").as("side"), col("key"), col("count"))
      }
      val simple = if (el.multiplicity == Multiplicity.SIMPLE) Some {
        base.groupBy(col("src"), col("dst")).count().filter(col("count") > 1)
          .select(lit(lbl).as("label"), lit("pair").as("side"), col("src").as("key"), col("count"))
      } else None
      out ++ in ++ simple
    }.toSeq
    checks.reduceOption(_ union _).getOrElse(emptyViolations(Seq("label", "side", "key", "count")))
  }

  private def emptyViolations(names: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = names.map {
      case n @ ("label" | "side" | "index") => StructField(n, StringType)
      case "key" if names.contains("index") => StructField("key", StringType)
      case n => StructField(n, LongType)
    }
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields))
  }

  /** Dedup-on-write for SET-cardinality properties (§1.4: SET ⇒ ArrayType +
    * dedup at ingest, mirroring the reference's Cardinality.SET insert
    * semantics): returns a graph with array_distinct applied to every SET
    * column present on either element table. */
  def normalizedSets(): PropertyGraph = {
    val setKeys = schema.propertyKeys.values.filter(_.cardinality == Cardinality.SET).map(_.name).toSet
    def fix(df: DataFrame): DataFrame =
      df.columns.filter(setKeys.contains).foldLeft(df)((d, c) =>
        d.withColumn(c, array_distinct(col(c))))
    copy(vertices = fix(vertices), edges = fix(edges))
  }

  /** Schema conformance: every property column must exist with the cataloged
    * type (exact-type property enforcement, docs/titanbasics.txt:1404-1406 —
    * checked structurally here since parquet is already typed), and SET
    * cardinality columns must not contain duplicate elements. Returns
    * human-readable violation strings (empty = conformant). */
  def schemaViolations(): Seq[String] = {
    val structural = schema.propertyKeys.values.toSeq.flatMap { pk =>
      (vertices.schema.fields.find(_.name == pk.name) orElse
        edges.schema.fields.find(_.name == pk.name)) match {
        case None => Nil // key defined but unused — allowed
        case Some(f) if org.apache.spark.sql.types.DataType.equalsStructurally(
          f.dataType, pk.columnType, ignoreNullability = true) => Nil
        case Some(f) =>
          Seq(s"property '${pk.name}': declared ${pk.columnType.simpleString}, stored ${f.dataType.simpleString}")
      }
    }
    val setDups = schema.propertyKeys.values.toSeq
      .filter(_.cardinality == Cardinality.SET)
      .filter(pk => vertices.columns.contains(pk.name))
      .flatMap { pk =>
        val dups = vertices.filter(size(col(pk.name)) =!= size(array_distinct(col(pk.name)))).count()
        if (dups > 0) Seq(s"SET property '${pk.name}': $dups rows contain duplicate elements") else Nil
      }
    structural ++ setDups
  }

  /** Unique-index violations (composite unique index ⇔ LOCK consistency in the
    * reference — GraphOfTheGodsFactory.java:57-61). */
  def uniqueIndexViolations(): DataFrame = {
    val uniques = schema.indexes.values.filter(ix => ix.unique && ix.composite).toSeq
    val dfs = uniques.map { ix =>
      val table = if (ix.element == ElementCategory.VERTEX) vertices else edges
      val scoped = ix.onlyLabel.map(l => table.filter(col("label") === l)).getOrElse(table)
      scoped.groupBy(ix.keys.map(col): _*).count().filter(col("count") > 1)
        .select(lit(ix.name).as("index"),
          concat_ws("|", ix.keys.map(k => col(k).cast("string")): _*).as("key"),
          col("count"))
    }
    dfs.reduceOption(_ union _).getOrElse(emptyViolations(Seq("index", "key", "count")))
  }
}
