package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-exact probabilistic sketches (Flajolet et al. 2007 HyperLogLog).
  * Spark ships approx_count_distinct, but its HLL++ register bytes are not
  * reproducible outside Spark — useless under a cross-engine oracle. This
  * HLL is built from the repo's salted-md5 recipe, so registers, the
  * dyadic-rational harmonic sum, AND the final estimate are bit-identical
  * on any engine that mirrors the arithmetic: the 100 TB distinct-count
  * path you can actually regression-test.
  */
object Sketches {

  /** HyperLogLog distinct-count report over one column: m = 2^`b` registers
    * from a 48-bit md5 fold (bucket = h mod m, rank = leading-zero count of
    * the remaining window + 1), the harmonic denominator kept EXACT as the
    * integer Σ 2^(50 − M_j) (each register ≤ window+1 ≤ 39, terms dyadic —
    * no float sum), raw estimate α·m²·2⁵⁰/S, Flajolet's linear-counting
    * fallback m·ln(m/V) below 2.5m when empty registers remain. Returns ONE
    * row: (m, used, s2, v_empty, estimate, exact) — the accuracy sheet,
    * with the exact distinct count beside the estimate like
    * [[graft.pipeline.TextAnalysis.cmsEstimates]].
    *
    * Scale: one map-side-combinable max-aggregate to ≤ m register rows +
    * one exact-distinct aggregate for the report column (drop `exact` at
    * true scale — the sketch is the point); the estimate math runs on a
    * single row. */
  def hllReport(df: DataFrame, valueCol: String, b: Int = 10,
      salt: String = "hll"): DataFrame = {
    require(b >= 4 && b <= 16, "hllReport: b in [4,16]")
    val m = 1 << b
    val window = 48 - b
    val alpha = b match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // α·m²·2⁵⁰ folded into one double literal (Double.toString round-trips,
    // so the SQL oracle embeds the identical constant)
    val num = alpha * m.toDouble * m.toDouble * math.pow(2.0, 50)
    val h = conv(substring(md5(concat_ws(":", lit(salt),
      col(valueCol).cast("string"))), 21, 12), 16, 10).cast("long")
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(h.as("h"))
      .select(pmod(col("h"), lit(m.toLong)).as("bucket"),
        expr(s"h DIV $m").as("w"))
    val regs = hashed
      .select(col("bucket"),
        when(col("w") === 0L, lit(window + 1))
          .otherwise(lit(window + 1) - length(bin(col("w")))).cast("int").as("rank"))
      .groupBy(col("bucket")).agg(max(col("rank")).as("reg"))
    val sketch = regs.agg(
      count(lit(1)).as("used"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), 50 - reg)")).as("s_used"))
    val exact = df.filter(col(valueCol).isNotNull)
      .agg(count_distinct(col(valueCol)).as("exact"))
    sketch.crossJoin(exact)
      .select(lit(m.toLong).as("m"), col("used"),
        // empty registers contribute 2^(50-0) each to the harmonic sum
        (coalesce(col("s_used"), lit(0L)) +
          (lit(m.toLong) - col("used")) * lit(1L << 50)).as("s2"),
        (lit(m.toLong) - col("used")).as("v_empty"), col("exact"))
      .select(col("m"), col("used"), col("s2"), col("v_empty"),
        round(when(lit(num) / col("s2").cast("double") <= lit(2.5 * m) &&
            col("v_empty") > 0L,
          lit(m.toDouble) * round(log(lit(m.toDouble) / col("v_empty").cast("double")), 9))
          .otherwise(lit(num) / col("s2").cast("double")), 4).as("estimate"),
        col("exact"))
  }

}
