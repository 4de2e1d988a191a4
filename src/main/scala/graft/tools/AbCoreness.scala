package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session flag A/B for the coreness h-index kernel
  * (`spark.graft.coreness.hindex` = window | histogram): both kernels live
  * in ONE build behind the conf, so a single JVM alternates them — the
  * two-build classpath problem of [[ABBench]] does not apply. Alternates
  * window / histogram for SPARK_GRAFT_AB_ROUNDS rounds (default 4) after
  * one untimed warmup each, prints per-side reps, minima, and the
  * cross-kernel result signature (must match — the kernels compute the
  * same recurrence). */
object AbCoreness {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.data.TpchGraph.load(spark, sfDir)
    def run(kernel: String): (Double, Long) = {
      spark.conf.set("spark.graft.coreness.hindex", kernel)
      val t0 = System.nanoTime()
      val sig = graft.olap.Analytics.coreness(g, maxRounds = 10)
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("core"))).head.getLong(0)
      ((System.nanoTime() - t0) / 1e9, sig)
    }
    run("window"); run("histogram") // warmup both plans
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    var sigA = 0L; var sigB = 0L
    for (_ <- 1 to rounds) {
      val (ta, sa) = run("window"); a += ta; sigA = sa
      val (tb, sb) = run("histogram"); b += tb; sigB = sb
    }
    def fmt(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString(",")
    println(f"ABCORENESS window(min)=${a.min}%.2f reps=${fmt(a.toSeq)} sig=$sigA")
    println(f"ABCORENESS histogram(min)=${b.min}%.2f reps=${fmt(b.toSeq)} sig=$sigB")
    println(f"ABCORENESS ratio=${b.min / a.min}%.3f parity=${sigA == sigB}")
    spark.stop()
  }
}
