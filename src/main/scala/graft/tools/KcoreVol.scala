package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume/round-depth measurement for kCore (dev tool): chain + hashed
  * long-range edges at n vertices, k=2 — chain-end cascades peel a few
  * vertices per round for many rounds, the decremental form's target
  * regime. Prints survivors + wall. */
object KcoreVol {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("KV_N", "10000000").toLong
    val rounds = sys.env.getOrElse("KV_ROUNDS", "30").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val v = spark.range(n).select(col("id"), lit("v").as("label"))
    val chain = spark.range(n - 1).select(col("id"), col("id").as("src"),
      (col("id") + 1L).as("dst"), lit("e").as("label"))
    val rand = spark.range(n / 2).select((col("id") + 3000000000L).as("id"),
      col("id").as("src"),
      pmod(col("id") * lit(2654435761L) + lit(12345L), lit(n)).as("dst"),
      lit("e").as("label"))
    val e = chain.unionByName(rand).filter(col("src") =!= col("dst"))
    val g = graft.data.PropertyGraph(graft.core.GraphSchema(), v, e)
    g.edges.count()
    val t0 = System.nanoTime()
    val (df, conv) = graft.olap.Analytics.kCoreConverged(g, 2, maxRounds = rounds)
    val c = df.count()
    println(f"KCOREVOL n=$n survivors=$c converged=$conv wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
