package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiler for q_stupid_backoff subplans (not driver contract). */
object ProfSB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = docs.filter(col("source").isin((0 to 9).map(i => s"src$i"): _*))
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profsb] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // full query, twice (warm)
    t("full-1") { TextAnalysis.stupidBackoffLogProb(docs, model).count() }
    t("full-2") { TextAnalysis.stupidBackoffLogProb(docs, model).count() }
    // pos stream alone
    val w = split(col("text"), "\\s+")
    val pos = docs.filter(size(w) >= 3)
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(w) - 3),
        i => struct(element_at(w, i + 1).as("w1"), element_at(w, i + 2).as("w2"),
          element_at(w, i + 3).as("w3")))).as("g"))
    t("pos-explode") { pos.count() }
    t("pos-explode-2") { pos.count() }
    // materialize the split array once per row first
    val pos2 = docs.select(col("doc_id"), w.as("__w")).filter(size(col("__w")) >= 3)
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("__w")) - 3),
        i => struct(element_at(col("__w"), i + 1).as("w1"),
          element_at(col("__w"), i + 2).as("w2"),
          element_at(col("__w"), i + 3).as("w3")))).as("g"))
    t("pos-mat") { pos2.count() }
    t("pos-mat-2") { pos2.count() }
    spark.stop()
  }
}
