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
    // b ≤ 12: the exact harmonic sum's worst case is m·2^50 (all registers
    // empty) = 2^(b+50), which must stay under 2^63 — b = 13 already wraps
    require(b >= 4 && b <= 12, "hllReport: b in [4,12]")
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
    val regs = hllRegisters(df, valueCol, b, salt)
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

  /** The HLL register table alone: (bucket, reg), ≤ 2^`b` rows. ONE
    * aggregation over pure projections, so it runs unchanged as a
    * complete-mode Structured Streaming query — registers update per
    * micro-batch and the drained state is identical to the batch table
    * (max is order- and duplicate-insensitive). Feed it to the
    * [[hllReport]] estimate math, or merge register tables from different
    * partitions/days with a plain max — HLL's union IS the bucketwise max. */
  def hllRegisters(df: DataFrame, valueCol: String, b: Int = 10,
      salt: String = "hll"): DataFrame = {
    require(b >= 4 && b <= 16, "hllRegisters: b in [4,16]")
    val m = 1 << b
    val window = 48 - b
    val h = conv(substring(md5(concat_ws(":", lit(salt),
      col(valueCol).cast("string"))), 21, 12), 16, 10).cast("long")
    df.filter(col(valueCol).isNotNull)
      .select(h.as("h"))
      .select(pmod(col("h"), lit(m.toLong)).as("bucket"),
        expr(s"h DIV $m").as("w"))
      .select(col("bucket"),
        when(col("w") === 0L, lit(window + 1))
          .otherwise(lit(window + 1) - length(bin(col("w")))).cast("int").as("rank"))
      .groupBy(col("bucket")).agg(max(col("rank")).as("reg"))
  }

  /** The k salted-md5 bit positions of a value in a `62·words`-bit Bloom
    * filter, as (word index, single-bit mask) rows. 62 usable bits per
    * 64-bit word: shifts into bits 62/63 overflow-raise on engines with
    * checked arithmetic (DuckDB), so the top two bits stay unused. */
  private def bloomPositions(df: DataFrame, valueCol: String, words: Int,
      k: Int, salt: String, carry: Seq[Column]): DataFrame = {
    val bits = 62L * words
    df.select((carry :+ col(valueCol).as("__bv")) :+
      posexplode(array((0 until k).map(lit): _*)).as(Seq("j", "_j")): _*)
      .select(carry :+ pmod(conv(substring(md5(concat_ws(":",
        col("j").cast("string"), lit(salt), col("__bv").cast("string"))),
        21, 12), 16, 10).cast("long"), lit(bits)).as("p"): _*)
      .select(carry ++ Seq(expr("p DIV 62").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 62 AS INT))").as("mask")): _*)
  }

  /** Bit-packed BLOOM FILTER over `ref`'s values (Bloom 1970): `words`
    * 64-bit words, `k` salted-md5 hash functions, built with one bit_or
    * aggregate — at most `words` rows whatever the reference size. The
    * broadcastable membership summary for the 100 TB decontamination path:
    * ship the words, not the eval set. */
  def bloomBits(ref: DataFrame, valueCol: String, words: Int = 1024,
      k: Int = 3, salt: String = "bloom"): DataFrame = {
    require(words > 0 && k > 0, "bloomBits: words and k must be positive")
    bloomPositions(ref.filter(col(valueCol).isNotNull), valueCol, words, k,
      salt, Seq.empty)
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
  }

  /** Bloom-filter decontamination ACCURACY sheet: flag every `train` row
    * whose value hits all `k` bits of the filter built over `eval`'s
    * values, compare against exact membership, and report the confusion
    * matrix (flagged, actual, cnt) — `flagged ≥ actual` always (no false
    * negatives, the Bloom guarantee); the (true, false) row measures the
    * false-positive mass you'd over-drop at the chosen sizing.
    *
    * Scale: the filter is ≤ `words` rows (broadcast); the train side
    * explodes k rows per document, joins the words table broadcast, and
    * folds back with one bool_and — the corpus is scanned once and
    * nothing corpus-sized shuffles except (id, word) pairs. */
  def bloomContamination(train: DataFrame, eval: DataFrame,
      valueCol: String = "text", idCol: String = "doc_id",
      words: Int = 8, k: Int = 3, salt: String = "bloom"): DataFrame = {
    val bitsTable = bloomBits(eval, valueCol, words, k, salt)
    val probes = bloomPositions(train, valueCol, words, k, salt,
      Seq(col(idCol)))
      .join(broadcast(bitsTable), Seq("word"), "left")
      .select(col(idCol),
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0L).as("hit"))
      .groupBy(col(idCol)).agg(bool_and(col("hit")).as("flagged"))
    val actual = train.select(col(idCol), col(valueCol))
      .join(eval.select(col(valueCol).as("__ev")).distinct(),
        col(valueCol) === col("__ev"), "left")
      .select(col(idCol), col("__ev").isNotNull.as("actual"))
    probes.join(actual, Seq(idCol))
      .groupBy(col("flagged"), col("actual")).agg(count(lit(1)).as("cnt"))
  }
}
