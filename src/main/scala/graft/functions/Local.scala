package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.lit

/** Gremlin `Scope.local` collection terminals as Column functions.
  *
  * The reference runs TinkerPop's local-scope steps (`count(local)`,
  * `sum(local)`, `order(local)`, `range(local)`, `dedup(local)`, …) through
  * its process-suite integration (tt/blueprints/AbstractTitanGraphProvider
  * .java:57 registers the suites; the steps themselves operate on the
  * incoming collection rather than the stream). Relationally the incoming
  * collection is an array column — e.g. the output of `group`/`fold` — so
  * each local step is a native array expression: codegen'd, per-row, no
  * shuffle, which is exactly the scale behaviour the step family needs
  * (the global variants shuffle; the local ones never should).
  */
object Local {

  /** count(local) — elements in the incoming collection. */
  def count(c: Column): Column = F.size(c).cast("long")

  /** sum(local) over an integral-typed list. */
  def sum(c: Column): Column = F.aggregate(c, lit(0L), (acc, x) => acc + x)

  /** sum(local) over a double-typed list (left-to-right accumulation). */
  def sumD(c: Column): Column =
    F.aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** mean(local). Null on an empty collection, matching Gremlin's no-result. */
  def mean(c: Column): Column =
    F.when(F.size(c) > 0, sumD(c) / F.size(c))

  /** max(local) / min(local). */
  def max(c: Column): Column = F.array_max(c)
  def min(c: Column): Column = F.array_min(c)

  /** order(local) — sort the collection (ascending; `asc = false` reverses). */
  def order(c: Column, asc: Boolean = true): Column = F.sort_array(c, asc)

  /** dedup(local). */
  def dedup(c: Column): Column = F.array_distinct(c)

  /** limit(local, n) — first n elements. */
  def limit(c: Column, n: Int): Column = F.slice(c, 1, n)

  /** tail(local, n) — last n elements. */
  def tail(c: Column, n: Int): Column =
    F.when(F.size(c) <= n, c).otherwise(F.slice(c, -n, n))

  /** range(local, lo, hi) — elements [lo, hi) by 0-based position. */
  def range(c: Column, lo: Int, hi: Int): Column = F.slice(c, lo + 1, hi - lo)
}
