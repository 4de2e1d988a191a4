package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: left rows with a point column against
  * right rows with [start, end) interval columns. Spark plans a bare
  * `l.ts >= r.start AND l.ts < r.end` condition as BroadcastNestedLoop /
  * cartesian — quadratic per partition. This operator compiles it to an
  * EQUI-join by time bucketing (the standard range-join binning that managed
  * Spark offers as a hint, built from public primitives):
  *
  *   left:  one row per point, bucket = floor(point / width)
  *   right: one row per interval PER overlapped bucket (sequence + explode)
  *   join on bucket, then the exact range predicate as a residual filter.
  *
  * Each left row carries exactly one bucket, so a multi-bucket interval can
  * match it only once — no dedup step. Shuffle is keyed by bucket; explode
  * factor = avg interval width / `width`, so pick `width` near the typical
  * interval length. Skewed (hot) buckets behave like any skewed equi-join —
  * AQE skew-join or salting applies unchanged. At 100 TB this is one
  * bounded-fanout shuffle; the nested-loop alternative never finishes. */
object IntervalJoin {

  /** @param left     point side
    * @param right    interval side
    * @param pointCol timestamp/numeric column on `left` (cast to long micros
    *                 internally via unix_micros for timestamps)
    * @param startCol inclusive lower bound on `right` (same type as point)
    * @param endCol   exclusive upper bound on `right`
    * @param widthMicros bucket width in the point's long domain */
  def join(left: DataFrame, right: DataFrame, pointCol: String,
      startCol: String, endCol: String, widthMicros: Long): DataFrame = {
    val isTs = left.schema(pointCol).dataType ==
      org.apache.spark.sql.types.TimestampType
    def toLong(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
    val l = left.withColumn("__bucket", floor(toLong(col(pointCol)) / widthMicros))
    val r = right
      // an inverted interval (end <= start) can never contain a point, and an
      // unguarded sequence(lo, hi) with hi < lo would generate a huge
      // DESCENDING bucket array from a single corrupt row (OOM risk) — drop
      // such rows before the explode instead of after it
      .filter(toLong(col(endCol)) > toLong(col(startCol)))
      .withColumn("__bucket", explode(sequence(
        floor(toLong(col(startCol)) / widthMicros),
        // end is exclusive: an interval ending exactly on a bucket boundary
        // does not reach into that bucket
        floor((toLong(col(endCol)) - 1) / widthMicros))))
    l.join(r, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
