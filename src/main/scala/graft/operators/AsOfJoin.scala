package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, the single most recent right row of the
  * same key with `ts` STRICTLY before the left row's (ties among right rows
  * broken by largest `ordCol`). The canonical time-series operator Spark has
  * no built-in for.
  *
  * Built by COMPOSITION (the preferred extension path — no custom physical
  * operator needed): tag both sides, union, and run one
  * `last(value, ignoreNulls)` window per carried column ordered by
  * (ts, side, ordCol) with left rows sorting BEFORE right rows at equal ts —
  * so a right row at the exact left timestamp is not yet visible (strict
  * as-of). One shuffle keyed by `keyCol`; no range-join explosion, no
  * per-row subquery. At 100 TB this is the same shuffle profile as any
  * keyed window — skew on hot keys is handled like any window (salt or AQE).
  */
object AsOfJoin {

  /** @param left    probe side (kept in full, one output row per input row)
    * @param right   reference side
    * @param keyCol  equi-join key column name (present on both sides)
    * @param tsCol   event-time column name (present on both sides)
    * @param ordCol  unique-ish order column for deterministic tie-breaks
    * @param carry   right-side columns to attach (renamed with `suffix`) */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      ordCol: String, carry: Seq[String], suffix: String = "_asof"): DataFrame = {
    // carrying the key/ts column would rename away the right side's join/order
    // inputs, silently voiding the strict as-of semantics — reject up front
    require(!carry.contains(keyCol) && !carry.contains(tsCol),
      s"carry must not contain the key ('$keyCol') or ts ('$tsCol') column")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__ord", col(ordCol))
    // right rows sort AFTER left rows at the same timestamp (side 1 < 2), so
    // a same-ts right row is outside the left row's preceding window — strict "<"
    val r = right
      .select((Seq(keyCol, tsCol, ordCol) ++ carry).distinct.map(col): _*)
      .withColumnsRenamed(carry.map(c => c -> s"$c$suffix").toMap)
      .withColumn("__side", lit(2))
      .withColumn("__ord", col(if (carry.contains(ordCol)) s"$ordCol$suffix" else ordCol))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.map(c => last(col(s"$c$suffix"), ignoreNulls = true).over(w).as(s"$c$suffix"))
    u.select((leftCols.map(col) ++ Seq(col("__side")) ++ carried): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
