package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Timed repetitions per query. The box has documented multi-x run-to-run
    * variance; the per-query minimum over several reps is the stable signal
    * (min, not mean: noise on a shared box is strictly additive). Reps are
    * INTERLEAVED — the full query list runs once per round, Reps rounds — so a
    * noisy co-tenant window poisons at most one rep of each query instead of
    * all reps of one query (r5 showed q_tpch_q3 at 3.56s committed vs 0.49s
    * on a quiet re-run with the old back-to-back scheme). */
  val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    // one untimed warmup pass: absorbs session init, parquet footer reads and
    // whole-stage-codegen compilation so timings reflect steady-state execution
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch {
        case e: Throwable =>
          // warmup failures are not timings, but they must not be silent: the
          // timed reps will re-surface the error; this line flags warmup-only ones
          System.err.println(s"[bench] warmup $name: ${e.getClass.getSimpleName}")
      }
    }
    // COLD arm (SPARK_GRAFT_BENCH_COLD=true): drop every engine-owned cache
    // before EACH timed query — PlanCache entries (DSIR doc-bucket counts,
    // IVF/PQ centroids, LSH tables, analytics edge projections), Spark's
    // own CacheManager, and the index broadcast-gate decision memo — so the
    // timing includes the build stage a first-call user pays. The default
    // (warm) arm measures steady-state reuse; a regression in a
    // PlanCache-backed operator's BUILD stage is invisible warm, so the
    // quiet-bench protocol records BOTH columns (BENCH_AB.md round 17).
    val cold = sys.env.get("SPARK_GRAFT_BENCH_COLD").exists(_.toBoolean)
    def dropCaches(): Unit = if (cold) {
      graft.core.PlanCache.clear(spark)
      spark.catalog.clearCache()
      graft.index.Indexes.clearGateDecisions(spark)
    }
    // Reps interleaved rounds over the full list; keep min per query across
    // rounds and report every per-rep time so the driver can see variance.
    // A query that throws is an explicit error, never a (fast-looking) timing.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (_ <- 1 to Reps; name <- names) {
      dropCaches()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        times(name) = times.getOrElse(name, Vector.empty) :+ (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors.getOrElseUpdate(name, s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    val results = times.map { case (k, v) => k -> v.min }
    val qs = names.filter(results.contains)
      .map(k => "\"" + k + "\":" + results(k)).mkString("{", ",", "}")
    val repsJson = names.filter(times.contains)
      .map(k => "\"" + k + "\":[" + times(k).mkString(",") + "]").mkString("{", ",", "}")
    val errJson = errors
      .map { case (k, v) => "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val mode = if (cold) "cold" else "warm"
    println(s"""{"metric":"total","value":$total,"unit":"sec","mode":"$mode","reps":$Reps,"queries":$qs,"rep_times":$repsJson,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
