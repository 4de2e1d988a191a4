package graft.olap

import graft.data.PropertyGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph, VertexId, PartitionStrategy}
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics — the OLAP layer the reference runs through its
  * "Fulgora" BSP computer (tc/graphdb/olap/computer/FulgoraGraphComputer.java:118-300)
  * or TinkerPop SparkGraphComputer. Here: GraphX (vertex-cut partitioned,
  * message-combining aggregateMessages/Pregel), with results rejoined to the
  * vertex DataFrame — the write-back phase (FulgoraGraphComputer.java:248-300)
  * as a join instead of mutating storage.
  *
  * Scale: GraphX partitions edges with a PartitionStrategy (EdgePartition2D
  * bounds replication at sqrt(numParts) — the supernode mitigation that the
  * reference gets from partitioned vertex labels, VertexLabelMaker.partition()).
  */
object Analytics {

  /** Per-vertex degree — the reference's canonical ScanJob example
    * (tt/olap/OLAPTest.java:91-150, degree via vertex.query().edgeCount()).
    * Pure DataFrame: two partial aggregations, one shuffle each, no GraphX. */
  def degrees(g: PropertyGraph, labels: Seq[String] = Nil): DataFrame = {
    val e0 = if (labels.isEmpty) g.edges else g.edges.filter(col("label").isin(labels: _*))
    val out = e0.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_degree"))
    val in = e0.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  /** PageRank with damping 0.85 — reference tt/olap/PageRankVertexProgram.java:31-110
    * (damping constant :43, iterate until maxIter). GraphX staticPageRank:
    * same fixed-point, message-combined. Returns (id, rank). */
  def pageRank(g: PropertyGraph, iterations: Int = 20, damping: Double = 0.85): DataFrame = {
    val gx = g.toGraphXStructure.partitionBy(PartitionStrategy.EdgePartition2D)
    val ranks = gx.staticPageRank(iterations, resetProb = 1.0 - damping).vertices
    toDF(g.spark, ranks.map { case (id, r) => (id, r) }, "id", "rank")
  }

  /** Weighted single-source shortest distance — reference
    * tt/olap/ShortestDistanceVertexProgram.java:26-146 with its min-combiner
    * (ShortestDistanceMessageCombiner). GraphX Pregel with min merge. */
  def shortestDistance(g: PropertyGraph, source: Long, weightCol: Option[String] = None,
      maxIter: Int = Int.MaxValue): DataFrame = {
    val gx = g.toGraphX(weightCol).partitionBy(PartitionStrategy.EdgePartition2D)
    val init = gx.mapVertices((id, _) => if (id == source) 0.0 else Double.PositiveInfinity)
    val res = org.apache.spark.graphx.Pregel(init, Double.PositiveInfinity, maxIter)(
      vprog = (_, dist, msg) => math.min(dist, msg),
      sendMsg = t =>
        if (t.srcAttr + t.attr < t.dstAttr) Iterator((t.dstId, t.srcAttr + t.attr))
        else Iterator.empty,
      mergeMsg = math.min)
    toDF(g.spark, res.vertices.filter(_._2 < Double.PositiveInfinity), "id", "distance")
  }

  /** Connected components (undirected). */
  def connectedComponents(g: PropertyGraph): DataFrame = {
    val cc = g.toGraphXStructure.connectedComponents().vertices
    toDF(g.spark, cc.map { case (id, c) => (id, c) }, "id", "component")
  }

  /** Per-vertex triangle count (canonical orientation dedups). */
  def triangleCount(g: PropertyGraph): DataFrame = {
    val gx = g.toGraphXStructure
      .partitionBy(PartitionStrategy.EdgePartition2D)
    val tc = gx.triangleCount().vertices
    toDF(g.spark, tc.map { case (id, n) => (id, n.toLong) }, "id", "triangles")
  }

  /** Label propagation communities. */
  def labelPropagation(g: PropertyGraph, maxIter: Int = 10): DataFrame = {
    val lp = org.apache.spark.graphx.lib.LabelPropagation.run(g.toGraphXStructure, maxIter).vertices
    toDF(g.spark, lp.map { case (id, l) => (id, l) }, "id", "community")
  }

  private def toDF[T <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, rdd: org.apache.spark.rdd.RDD[T], names: String*): DataFrame = {
    val df = spark.createDataFrame(rdd)
    df.toDF(names: _*)
  }
}
