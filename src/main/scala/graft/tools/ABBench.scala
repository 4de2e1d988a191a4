package graft.tools

import org.apache.spark.sql.SparkSession

/** One side of a same-session A/B benchmark.
  *
  * Cross-day bench comparisons on a shared box are inadmissible — identical
  * code has shown 4–5× rep-to-rep swings between sessions (see
  * BENCH_r09 rep_times). The admissible protocol is ALTERNATING runs of the
  * two builds back to back in one sitting, so any noise window hits both
  * sides symmetrically, comparing per-side minima across all alternated
  * runs. A single shared JVM cannot host both builds (Spark's local-mode
  * executors resolve task-closure classes from the application classpath,
  * so two versions of `graft.*` cannot coexist); instead this runner is the
  * per-build unit the alternation loop invokes:
  *
  * {{{
  * # drop this file into both trees, `sbt package` each, then:
  * for i in 1 2 3 4; do
  *   (cd treeA && sbt "runMain graft.tools.ABBench /root/testdata/sf0.1 qs...")
  *   (cd treeB && sbt "runMain graft.tools.ABBench /root/testdata/sf0.1 qs...")
  * done   # collect the ABJSON lines, compare min-over-runs per query
  * }}}
  *
  * Each invocation: one untimed warmup pass (codegen + parquet footers),
  * then `SPARK_GRAFT_AB_REPS` (default 2) interleaved timed passes, one
  * ABJSON line out. Defaults to the round-9 perf-weak five.
  */
object ABBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ABBench <sfDir> [query ...]")
    val sfDir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toVector
      else Vector("q_dedup_minhash", "q_traversal_3hop", "q_degree",
        "q_text_contains", "q_triangles")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = graft.SparkEntry.queries
    val missing = names.filterNot(queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
    // SPARK_GRAFT_AB_COLD=true — drop engine caches before each timed rep so
    // PlanCache-backed operators time their BUILD stage (the first-call cost)
    // instead of the cache hit. Uses only calls present in every tree this
    // protocol compares (PlanCache.clear + Spark's catalog cache), so the
    // same file drops into an older worktree unchanged.
    val cold = sys.env.get("SPARK_GRAFT_AB_COLD").exists(_.toBoolean)
    def dropCaches(): Unit = if (cold) {
      graft.core.PlanCache.clear(spark)
      spark.catalog.clearCache()
    }
    def once(n: String): Double = {
      dropCaches()
      val t0 = System.nanoTime()
      queries(n)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // warmup
    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (_ <- 1 to reps; n <- names)
      times(n) = times.getOrElse(n, Vector.empty) :+ once(n)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val body = names.map(n =>
      "\"" + n + "\":[" + times(n).map(fmt).mkString(",") + "]")
      .mkString("{", ",", "}")
    val mode = if (cold) "cold" else "warm"
    println(s"""ABJSON {"sf":"$sfDir","reps":$reps,"mode":"$mode","times":$body}""")
    spark.stop()
  }
}
