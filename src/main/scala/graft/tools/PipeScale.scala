package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the PIPELINE-operator volume-axis dataset (SCALE.md round 17):
  * a disjoint 10× replica of sf0.1's `documents`/`embeddings` written to
  * `PIPESCALE_OUT` (default /tmp/sfx10p), measured afterwards by running
  * the UNMODIFIED bench queries via TimeQ with SPARK_GRAFT_SF_DIR pointed
  * here (TIMEQ_COLD=true for first-call build cost).
  *
  * The text analogue of the round-13 key-shifted graph replicas: copy k
  * suffixes every whitespace token with `_k`, so each copy's shingle /
  * n-gram / token-count structure is ISOMORPHIC to the original (same
  * within-copy near-dup pairs, same count distributions over a renamed
  * vocabulary) while cross-copy Jaccard is exactly 0 — volume grows 10×
  * with the workload shape held fixed, which is what a scaling exponent
  * needs. Plain identical copies would instead make every doc a 10-way
  * exact dup and grow the PAIR mass ~45×/doc — a different (crawl-shaped)
  * stress, not a volume axis. Embedding vectors are copied unchanged
  * (shifted ids): k-means/PQ geometry is multiplicity-invariant, so build
  * cost scales while centroids stay comparable; cosine-pair ops are NOT
  * measured on this dataset (identical cross-copy vectors would be the
  * all-pairs stress, not volume).
  *
  * The remaining sf0.1 tables are copied un-replicated so any query's side
  * reads resolve. Not part of the driver contract — a measurement main. */
object PipeScale {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("PIPESCALE_SRC", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("PIPESCALE_OUT", "/tmp/sfx10p")
    val copies = sys.env.getOrElse("PIPESCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")

    val docs10 = (0 until copies).map { k =>
      val suffixed =
        if (k == 0) docs.select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        else docs.select(
          (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            w => concat(w, lit(s"_$k")))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      suffixed
    }.reduce(_ unionByName _)
    val emb10 = (0 until copies).map { k =>
      emb.select((col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)

    docs10.repartition(cpus.toInt).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    emb10.repartition(cpus.toInt).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    // side tables un-replicated (events keeps its NANOS timestamps intact
    // only under a byte copy, so copy files rather than read+rewrite)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$src/$t.parquet"), fs,
        new org.apache.hadoop.fs.Path(s"$out/$t.parquet"), false, true,
        spark.sparkContext.hadoopConfiguration)
    }
    println(s"PIPESCALE built $out: documents=${docs10.count()} " +
      s"embeddings=${emb10.count()} (copies=$copies)")
    spark.stop()
  }
}
