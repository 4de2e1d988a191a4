package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Query profiling — the reference's `profile()` / QueryProfiler surface
  * (tc/graphdb/query/profile/QueryProfiler.java; used by the test suite's
  * plan-shape assertions, TitanGraphTest.java:3227-3298 `evaluateQuery`).
  *
  * The reference annotates each backend subquery with isFitted (all
  * predicates handled by the index) and isSorted (order provided by the
  * index). The columnar equivalents: predicates reaching `PushedFilters` on
  * the scan, scan count after union pruning, window vs global sort, join
  * strategies, and codegen coverage — parsed from the formatted physical
  * plan so tests (and users) can assert plan shape, not just results. */
final case class QueryProfile(
    numScans: Int,
    scannedFiles: Seq[String],
    pushedFilters: Seq[String],
    readSchemas: Seq[String],
    hasWindow: Boolean,
    hasWindowGroupLimit: Boolean,
    usesBroadcastJoin: Boolean,
    usesSortMergeJoin: Boolean,
    hasTakeOrderedAndProject: Boolean,
    hasPartialAggregate: Boolean,
    wholeStageCodegenIds: Int) {
  /** "Fitted" in the reference's sense: at least one predicate was pushed to
    * every scan (vacuously true for scan-less plans). `pushedFilters` keeps
    * only non-empty entries, so the test is an exact per-scan count. */
  def isFitted: Boolean = numScans == 0 || pushedFilters.size == numScans
  /** "Sorted" analogue: ordering satisfied by top-k or window machinery
    * rather than nothing at all. */
  def isSorted: Boolean = hasTakeOrderedAndProject || hasWindow
}

object Profiler {
  def profile(df: DataFrame): QueryProfile = {
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val lines = plan.linesIterator.toSeq
    val files = lines.filter(_.contains("InMemoryFileIndex"))
      .flatMap(l => "[^\\s\\[\\]]+\\.parquet".r.findAllIn(l).toSeq).distinct
    val pushed = lines.filter(_.trim.startsWith("PushedFilters"))
      .map(_.trim.stripPrefix("PushedFilters:").trim).filter(s => s.nonEmpty && s != "[]")
    val schemas = lines.filter(_.trim.startsWith("ReadSchema"))
      .map(_.trim.stripPrefix("ReadSchema:").trim)
    QueryProfile(
      // formatted plans show each node in the tree AND a detail section —
      // count only the numbered detail headers
      numScans = lines.count(_.trim.matches("\\(\\d+\\) Scan parquet\\s*.*")),
      scannedFiles = files,
      pushedFilters = pushed,
      readSchemas = schemas,
      hasWindow = plan.contains("Window"),
      hasWindowGroupLimit = plan.contains("WindowGroupLimit"),
      usesBroadcastJoin = plan.contains("BroadcastHashJoin"),
      usesSortMergeJoin = plan.contains("SortMergeJoin"),
      hasTakeOrderedAndProject = plan.contains("TakeOrderedAndProject"),
      hasPartialAggregate = plan.contains("partial_"),
      wholeStageCodegenIds = "codegen id : (\\d+)".r.findAllMatchIn(plan)
        .map(_.group(1).toInt).toSet.size)
  }
}
