package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: dump a SELECTED subset of SparkEntry.queries to parquet
  * (same shape Verify writes) so a single probe's oracle can be cross-checked
  * against DuckDB locally without re-running the full probe set.
  *
  * Usage: runMain graft.tools.RunQueries <sfDir> <outDir> <name> [<name>...]
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[runq] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // dump the full oracle map alongside (same shape Verify writes) so the
    // local checker can cross-check the subset without a full Verify run
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
