package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composite edge identifier — reference:
  * tc/graphdb/relations/RelationIdentifier.java:25-32 (edge id =
  * `relationId-outVertexId-typeId[-inVertexId]`, string form joined by '-').
  * The reference resolves lookups through the endpoint with smaller degree
  * (docs/titanbasics.txt:1408-1412); columnar scans make that moot — the
  * composite carries enough to filter directly, and including the endpoints
  * lets parquet min/max stats prune by src even when the edge id alone is
  * unselective. */
final case class RelationIdentifier(
    relationId: Long,
    outVertexId: Long,
    label: String,
    inVertexId: Option[Long]) {
  override def toString: String =
    (Seq(relationId.toString, outVertexId.toString, label) ++
      inVertexId.map(_.toString)).mkString("-")
}

object RelationIdentifier {
  def parse(s: String): RelationIdentifier = {
    val parts = s.split("-")
    require(parts.length == 3 || parts.length == 4, s"malformed relation id: $s")
    RelationIdentifier(parts(0).toLong, parts(1).toLong, parts(2),
      if (parts.length == 4) Some(parts(3).toLong) else None)
  }

  def of(g: PropertyGraph, relationId: Long): Option[RelationIdentifier] =
    g.edges.filter(col("id") === relationId)
      .select(col("id"), col("src"), col("label"), col("dst"))
      .collect().headOption.map(r =>
        RelationIdentifier(r.getLong(0), r.getLong(1), r.getString(2), Some(r.getLong(3))))

  /** Point lookup by composite id — equality on (id, src, label[, dst]) so the
    * scan prunes on whichever column the layout sorts by. */
  def lookup(g: PropertyGraph, rid: RelationIdentifier): DataFrame = {
    val base = g.edges.filter(
      col("id") === rid.relationId &&
      col("src") === rid.outVertexId &&
      col("label") === rid.label)
    rid.inVertexId.fold(base)(in => base.filter(col("dst") === in))
  }
}
