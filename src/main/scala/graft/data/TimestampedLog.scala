package graft.data

import graft.core.GraphSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-write-wins resolution of a timestamped mutation log — the eventual-
  * consistency write semantics the reference runs on Cassandra-class stores
  * (titan-test .../graphdb/TitanEventualGraphTest.java:77-208
  * testTimestampSetting / testTimestampedEdgeUpdates, with
  * STORE_META_TIMESTAMPS): every storage cell resolves independently by
  * commit timestamp, so a deletion whose timestamp is OLDER than the
  * standing write is a no-op (tx3 removes a property at t=200 after it was
  * written at t=1000 — the value survives), the newest put wins per
  * (element, key) regardless of arrival order, and a deletion wins a
  * timestamp tie (the Cassandra convention Titan inherits).
  *
  * Log shape — one row per element mutation:
  *   - `id` (element id), `_ts` (BIGINT commit time), `_op` ('put' | 'del'
  *     at ELEMENT granularity), `_dels` (array<string>: property keys this
  *     mutation explicitly removes), plus one column per property key
  *     (null = untouched by this mutation). Edge logs also carry
  *     src/dst/label on put rows.
  *
  * Resolution per element id:
  *   - existence: alive iff the newest element put is strictly newer than
  *     the newest element tombstone;
  *   - per property key: the winning cell is max_by (ts, isDel) over the
  *     rows that touch the key; the value survives only if the winner is a
  *     put AND newer than the element tombstone (a removed element's old
  *     cells stay dead even if the element is later re-put);
  *   - `_ts` on the output is the element's winning write time, `_pts` maps
  *     each live key to its cell timestamp (the reference's per-property
  *     `~timestamp` implicit key, TitanEventualGraphTest.java:103-116).
  *
  * Spark shape: ONE groupBy(id) aggregate per side — max_by with a
  * (ts, isDel) struct sort key is a decomposable partial aggregate, so the
  * merge is a single shuffle keyed by element id with map-side combine: the
  * same profile as a compaction pass, no window, no driver state. At 100 TB
  * the log merges at scan speed; resolving N billion mutations over K
  * distinct elements moves exactly one combined row per (task × element).
  */
object TimestampedLog {

  private val ReservedV = Set("id", "label", "_ts", "_op", "_dels")
  private val ReservedE = Set("id", "src", "dst", "label", "_ts", "_op", "_dels")

  /** Resolve one side (vertices or edges) of the log. */
  private def resolveSide(log: DataFrame, isVertex: Boolean): DataFrame = {
    val reserved = if (isVertex) ReservedV else ReservedE
    // `_`-prefixed columns are caller bookkeeping (e.g. a `_txn` sequence
    // tag), never property cells
    val propCols = log.columns.filterNot(c => reserved.contains(c) || c.startsWith("_")).toSeq
    val dels = coalesce(col("_dels"), array().cast("array<string>"))
    val isPut = col("_op") === "put"
    def cellAgg(k: String): Column = {
      val isDel = array_contains(dels, k)
      val touched = col(k).isNotNull || isDel
      max_by(
        struct(col(k).as("v"), isDel.as("d"), col("_ts").as("ts")),
        when(touched, struct(col("_ts").as("ts"), isDel.cast("int").as("d"))))
        .as(s"__w_$k")
    }
    // identity columns: latest NON-NULL put wins (a later mutation row that
    // touches only property cells carries null src/dst/label)
    def identAgg(c: String): Column =
      max_by(when(isPut && col(c).isNotNull, col(c)),
        when(isPut && col(c).isNotNull, col("_ts"))).as(s"__$c")
    val carry: Seq[Column] =
      (if (isVertex) Seq.empty[Column] else Seq(identAgg("src"), identAgg("dst"))) :+
        identAgg("label")
    // An element-CREATING put carries the element identity (label); a
    // cell-only mutation (null label) updates property cells but does NOT
    // write the exists cell — so it cannot resurrect a deleted element.
    // This is the reference's VertexExists-cell semantics, pinned by
    // TitanIndexTest.testDeleteVertexThen{Delete,Add,Modify}Property
    // (:1487-1511 via testNestedWrites): a concurrent property writer
    // committing AFTER the vertex deleter leaves the vertex dead and the
    // index empty.
    val isCreate = isPut && col("label").isNotNull
    val aggs: Seq[Column] =
      Seq(max(when(isPut, col("_ts"))).as("__ets"),
        max(when(isCreate, col("_ts"))).as("__cts"),
        max(when(col("_op") === "del", col("_ts"))).as("__dts")) ++
        carry ++ propCols.map(cellAgg)
    val resolved = log.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    // element exists iff a CREATION put is strictly newer than the newest
    // tombstone; `_ts` (the element's last write time) still reflects the
    // newest put of any kind
    val alive = resolved.filter(col("__cts").isNotNull &&
      (col("__dts").isNull || col("__cts") > col("__dts")))
    def cellLive(k: String): Column = {
      val w = col(s"__w_$k")
      w.isNotNull && !w.getField("d") &&
        (col("__dts").isNull || w.getField("ts") > col("__dts"))
    }
    val ptsEntries = propCols.map { k =>
      struct(lit(k).as("key"),
        when(cellLive(k), col(s"__w_$k").getField("ts")).as("value"))
    }
    val pts =
      if (propCols.isEmpty) map_from_entries(array().cast("array<struct<key:string,value:bigint>>"))
      else map_from_entries(filter(array(ptsEntries: _*), e => e.getField("value").isNotNull))
    val base: Seq[Column] =
      if (isVertex) Seq(col("id"), col("__label").as("label"))
      else Seq(col("id"), col("__src").as("src"), col("__dst").as("dst"),
        col("__label").as("label"))
    alive.select(base ++
      propCols.map(k => when(cellLive(k), col(s"__w_$k").getField("v")).as(k)) ++
      Seq(col("__ets").as("_ts"), pts.as("_pts")): _*)
  }

  /** Eventual convergence of a cardinality/multiplicity constraint: keep the
    * NEWEST row per constraint key — SET dedups on (element, key, value),
    * SIMPLE on (src,dst,label), ONE2MANY on (dst,label), MANY2ONE on
    * (src,label). This is the rule the reference applies when concurrent
    * unlocked writers each satisfy a constraint individually but not
    * jointly: time-based eventual consistency lets the later commit win
    * (TitanEventualGraphTest.testConsistencyModifier:263-341 — tx2 wins
    * every in-place cell, and only FORK-modified relations keep both
    * writers' copies). The window partitions by the constraint key, so at
    * scale each group is the constraint's own bounded fan-in. */
  def collapseNewest(df: DataFrame, keys: Seq[String], tsCol: String = "_ts"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(tsCol).desc, col("id").desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Merge timestamped vertex + edge mutation logs into the graph state they
    * resolve to. Edges whose endpoints resolved dead are dropped (the
    * adjacency dies with the vertex, as in the reference's vertex removal). */
  def resolve(vertexLog: DataFrame, edgeLog: DataFrame,
      schema: GraphSchema = GraphSchema()): PropertyGraph = {
    val v = resolveSide(vertexLog, isVertex = true)
    val e0 = resolveSide(edgeLog, isVertex = false)
    val ids = v.select(col("id").as("__vid"))
    val e = e0.join(ids, e0("src") === col("__vid"), "left_semi")
      .join(ids.withColumnRenamed("__vid", "__vid2"), e0("dst") === col("__vid2"), "left_semi")
    PropertyGraph(schema, v, e)
  }
}
