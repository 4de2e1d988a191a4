package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustering keys — multi-dimensional data layout for the
  * 100 TB path. A table range-partitioned and sorted by ONE column prunes
  * scans on that column only; interleaving the bits of several columns into
  * one key keeps rows that are close in EVERY dimension close in the file
  * order, so parquet min/max stats prune selective filters on ANY of the
  * interleaved columns (the technique behind Delta/Iceberg Z-ORDER
  * clustering and the classic Morton/Z-curve literature — Morton 1966,
  * Orenstein & Merrett 1984; all public).
  *
  * Everything here is a pure integer Column expression (codegen'd, no UDF,
  * no shuffle of its own): quantize each column to `bits` levels against
  * its min/max, then interleave. Deterministic given (data, bits) — the
  * SQL oracle mirrors the exact shift/mask arithmetic.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative integer
    * columns, first column taking the most-significant lane of each group.
    * cols.size · bits must fit a positive Long. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "interleaveBits: need at least two columns")
    require(cols.size * bits <= 62, "interleaveBits: result must fit a positive Long")
    val n = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        // bit i of column j lands at position i*n + (n-1-j): higher j →
        // lower lane, so cols are listed most-significant first
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Quantize a numeric column to [0, 2^bits) against inclusive [lo, hi]
    * bounds: ⌊(v − lo)·(2^bits − 1)/(hi − lo)⌋, hi mapping exactly to the
    * top level. Pure IEEE double chain in a pinned operation order —
    * mirrored verbatim by the SQL oracle. Degenerate bounds (hi = lo)
    * quantize to 0. */
  def quantize(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val levels = lit(((1L << bits) - 1).toDouble)
    when(hi.cast("double") === lo.cast("double"), lit(0L))
      .otherwise(floor((v.cast("double") - lo.cast("double")) * levels /
        (hi.cast("double") - lo.cast("double"))).cast("long"))
  }

  /** The Z-order key for `cols` of `df`, bounds taken from the data (one
    * tiny min/max aggregate, broadcast back): returns df plus a `zkey`
    * column. Write path: `repartitionByRange + sortWithinPartitions` on
    * zkey — every interleaved column then prunes on parquet min/max stats.
    *
    * Scale: the bounds aggregate is map-side combinable and emits ONE row;
    * the key itself is a per-row projection. The range write shuffles once
    * — the same cost as sorting by any single column, but the locality now
    * serves every dimension. */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.size >= 2,
      "withZKey: need at least two columns to interleave — sort by the " +
        "column directly for single-column clustering")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val quantized = cols.map(c =>
      quantize(col(c), col(s"__lo_$c"), col(s"__hi_$c"), bits))
    df.crossJoin(broadcast(bounds))
      .withColumn("zkey", interleaveBits(quantized, bits))
      .drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Write `df` Z-ordered on `cols`: range-partitioned and sorted by the
    * interleaved key, so min/max footer stats stay tight on every
    * clustered column. */
  def saveZOrdered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, partitions: Int = 32): Unit =
    withZKey(df, cols, bits)
      .repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)
}
