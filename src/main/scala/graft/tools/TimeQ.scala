package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc single-query timer for local iteration (not part of the driver
  * contract): times each name in TIMEQ_NAMES (default: the round's newly
  * optimized queries) twice on SPARK_GRAFT_SF_DIR and prints min. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val names = sys.env.getOrElse("TIMEQ_NAMES", "q_msf,q_scc,q_coreness").split(",")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.bench.roundLog",
        sys.env.getOrElse("TIMEQ_ROUNDLOG", "false"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // TIMEQ_COLD=true mirrors Bench's cold arm: drop every engine-owned
    // cache before each rep so PlanCache-backed operators time their
    // first-call build stage (default warm: min-of-2 measures reuse).
    val cold = sys.env.get("TIMEQ_COLD").exists(_.toBoolean)
    names.foreach { n =>
      val ts = (1 to 2).map { _ =>
        if (cold) {
          graft.core.PlanCache.clear(spark)
          spark.catalog.clearCache()
          graft.index.Indexes.clearGateDecisions(spark)
        }
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $n min=${ts.min}%.2f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
