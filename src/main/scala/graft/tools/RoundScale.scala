package graft.tools

import graft.core.GraphSchema
import graft.data.PropertyGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diameter-growth scaling measurement (SCALE.md "diameter axis"): the 10×
  * replica test bounds VOLUME scaling only (disjoint copies leave per-
  * component round counts unchanged), so this tool drives the iterative
  * kernels on fixtures whose DIAMETER is the controlled variable —
  * an undirected path of n vertices (diameter n−1) for CC, and a directed
  * cycle of n vertices (one SCC, forward-reach distance n−1) for SCC — at
  * n = 10⁴/10⁵/10⁶. Run with spark.graft.bench.roundLog=true and count the
  * `[graft-rounds]` stderr lines: the pointer-jumped floods must grow
  * ~log(n) (a constant addend per 10×), never linearly.
  *
  * Not part of the driver contract — a measurement main like TimeQ. */
object RoundScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.bench.roundLog", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sizes = sys.env.getOrElse("ROUNDSCALE_SIZES", "10000,100000,1000000")
      .split(",").map(_.trim.toLong)

    def pathGraph(n: Long): PropertyGraph = {
      val v = spark.range(n).select(col("id"), lit("v").as("label"))
      val e = spark.range(n - 1).select(col("id"), col("id").as("src"),
        (col("id") + 1L).as("dst"), lit("e").as("label"))
      PropertyGraph(GraphSchema(), v, e)
    }
    def cycleGraph(n: Long): PropertyGraph = {
      val p = pathGraph(n)
      val closing = spark.range(1).select(lit(n - 1).as("id"),
        lit(n - 1).as("src"), lit(0L).as("dst"), lit("e").as("label"))
      p.copy(edges = p.edges.unionByName(closing))
    }
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"ROUNDSCALE $tag wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    sizes.foreach { n =>
      // CC on a path: one component; rounds must be ~log2(n)
      val comps = timed(s"cc_path_$n") {
        graft.olap.Analytics.connectedComponentsExact(pathGraph(n), iterations = 64)
          .select(col("component")).distinct().count()
      }
      println(s"ROUNDSCALE cc_path_$n components=$comps (expect 1)")
      // SCC on a directed cycle: one SCC covering everything; the coloring
      // flood's pointer jumping is what keeps inner rounds ~log2(n)
      val sccs = timed(s"scc_cycle_$n") {
        graft.olap.Analytics.stronglyConnectedComponents(
          cycleGraph(n), maxOuter = 2, maxTrim = 2, maxInner = 64)
          .agg(count_distinct(col("scc")).as("k"),
            sum(col("scc").isNull.cast("long")).as("nulls")).head
      }
      println(s"ROUNDSCALE scc_cycle_$n distinct=${sccs.getLong(0)} " +
        s"unresolved=${sccs.getLong(1)} (expect 1, 0)")
    }
    spark.stop()
  }
}
