package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans + stage timings for selected
  * bench queries (not part of the driver contract). */
object ExplainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_tpch_q3", "q_tpch_q5", "q_vc_topk")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(s"===== $n =====")
      df.explain("formatted")
      val t0 = System.nanoTime(); df.count()
      val t1 = System.nanoTime(); df.count()
      println(s"$n first=${(t1 - t0) / 1e9}s second=${(System.nanoTime() - t1) / 1e9}s")
    }
    spark.stop()
  }
}
