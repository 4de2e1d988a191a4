package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session flag A/B for kTruss orientation-rank reuse: because both
  * variants live in ONE build behind `reuseRanks`, a single JVM can
  * alternate them (the two-build classpath problem of [[ABBench]] does not
  * apply). Alternates reuse=false / reuse=true for SPARK_GRAFT_AB_ROUNDS
  * rounds (default 4) after one untimed warmup each, prints per-side reps
  * and minima. */
object AbKtruss {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.data.TpchGraph.load(spark, sfDir)
    def run(reuse: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.olap.Analytics.kTrussConverged(g, k = 3, maxRounds = 4,
        reuseRanks = reuse)._1.count()
      (System.nanoTime() - t0) / 1e9
    }
    run(false); run(true) // warmup both paths
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to rounds) { a += run(false); b += run(true) }
    def fmt(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString(",")
    println(f"ABKTRUSS old(min)=${a.min}%.2f reps=${fmt(a.toSeq)}")
    println(f"ABKTRUSS new(min)=${b.min}%.2f reps=${fmt(b.toSeq)}")
    println(f"ABKTRUSS ratio=${b.min / a.min}%.3f")
    spark.stop()
  }
}
