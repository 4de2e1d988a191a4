package graft.olap

import graft.data.PropertyGraph
import org.apache.spark.graphx.{Graph => GxGraph, EdgeTriplet, VertexId, PartitionStrategy}
import org.apache.spark.sql.DataFrame
import scala.reflect.ClassTag

/** BSP vertex-program contract — the user-extension surface of the reference's
  * OLAP engine (TinkerPop VertexProgram executed by
  * tc/graphdb/olap/computer/VertexProgramScanJob.java:33-157, iterated with a
  * superstep barrier by FulgoraGraphComputer.java:151-189; message combining
  * via FulgoraVertexMemory and MessageCombiner).
  *
  * Spark formulation: GraphX Pregel. `combine` is the reference's
  * MessageCombiner (applied map-side before the message shuffle), `terminate`
  * is VertexProgram.terminate(memory) evaluated on the driver between
  * supersteps, and `Memory` is the per-iteration global aggregate
  * (FulgoraMemory) — here computed with an RDD aggregate, which Spark
  * executes as a tree-reduce rather than a shared mutable map.
  */
trait VertexProgram[VD, Msg] extends Serializable {
  /** Initial vertex state (setup + loadState). */
  def initialState(id: VertexId): VD
  /** Messages a vertex emits along an out-triplet this superstep. */
  def send(superstep: Int, triplet: EdgeTriplet[VD, Double]): Iterator[(VertexId, Msg)]
  /** Combine two messages bound for the same vertex (MessageCombiner). */
  def combine(a: Msg, b: Msg): Msg
  /** New state from (old state, combined inbound message). */
  def apply(superstep: Int, id: VertexId, state: VD, msg: Option[Msg]): VD
  /** Stop when true (VertexProgram.terminate). */
  def terminate(superstep: Int, memory: Map[String, Double]): Boolean = false
  /** Per-superstep global reductions (FulgoraMemory and/or/incr/sum). */
  def memoryKeys(state: VD): Map[String, Double] = Map.empty
}

/** Two-superstep example program: superstep 0 computes each vertex's
  * in-degree; superstep 1 replaces every vertex's state with the sum of its
  * in-neighbors' in-degrees. Deterministic integer arithmetic end-to-end, so
  * the full BSP execution path (message combine, superstep barrier, state
  * write-back) is oracle-checkable against plain SQL aggregation. */
object NeighborDegree extends VertexProgram[Long, Long] {
  def initialState(id: VertexId): Long = 0L
  def send(superstep: Int, t: EdgeTriplet[Long, Double]): Iterator[(VertexId, Long)] =
    if (superstep == 0) Iterator((t.dstId, 1L)) else Iterator((t.dstId, t.srcAttr))
  def combine(a: Long, b: Long): Long = a + b
  def apply(superstep: Int, id: VertexId, state: Long, msg: Option[Long]): Long =
    msg.getOrElse(0L)
}

/** The reference OLAP suite's DegreeCounter vertex program
  * (titan-test .../olap/OLAPTest.java:375-459): superstep 0 every vertex
  * sends 1 through `MessageScope.Local.of(__::inE)` — messages travel to
  * the opposite end of in-edges, so the combined inbound sum at a vertex is
  * its OUT-degree; each further superstep forwards the stored degree one
  * more hop, so `length`=2 yields Σ outdeg(w) over out-neighbors w with
  * parallel-edge multiplicity (OLAPTest.degreeCountingDistance:307-334).
  * Run with `maxIterations = length`. */
class DegreeCounter extends VertexProgram[Long, Long] {
  def initialState(id: VertexId): Long = 0L
  def send(superstep: Int, t: EdgeTriplet[Long, Double]): Iterator[(VertexId, Long)] =
    Iterator((t.srcId, if (superstep == 0) 1L else t.dstAttr))
  def combine(a: Long, b: Long): Long = a + b
  def apply(superstep: Int, id: VertexId, state: Long, msg: Option[Long]): Long =
    msg.getOrElse(0L)
}

object VertexProgramRunner {
  /** Run a VertexProgram over the property graph, superstep barrier per
    * iteration, returning final vertex states. Matches the execution shape of
    * FulgoraGraphComputer.submit (iterate → terminate check → write-back). */
  def run[VD: ClassTag, Msg: ClassTag](
      g: PropertyGraph,
      program: VertexProgram[VD, Msg],
      maxIterations: Int,
      weightCol: Option[String] = None): GxGraph[VD, Double] = {
    var graph = g.toGraphX(weightCol).partitionBy(PartitionStrategy.EdgePartition2D)
      .mapVertices((id, _) => program.initialState(id))
    var superstep = 0
    var done = false
    while (!done && superstep < maxIterations) {
      val messages = graph.aggregateMessages[Msg](
        ctx => program.send(superstep, ctx.toEdgeTriplet).foreach {
          case (to, m) => if (to == ctx.dstId) ctx.sendToDst(m) else ctx.sendToSrc(m)
        },
        program.combine)
      val newGraph = graph.outerJoinVertices(messages) {
        (id, state, msg) => program.apply(superstep, id, state, msg)
      }
      newGraph.cache()
      val memory = newGraph.vertices
        .flatMap { case (_, st) => program.memoryKeys(st) }
        .reduceByKey(_ + _).collectAsMap().toMap
      graph.unpersistVertices(blocking = false)
      graph = newGraph
      superstep += 1
      done = program.terminate(superstep, memory)
    }
    graph
  }
}
