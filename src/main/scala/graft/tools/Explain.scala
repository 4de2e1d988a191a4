package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans for named SparkEntry queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args.headOption.toSeq.flatMap(_.split(",")).foreach { q =>
      println(s"=== $q ===")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
