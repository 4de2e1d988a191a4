package graft.core

import org.apache.spark.sql.types._

/** Schema catalog for the property-graph engine.
  *
  * Mirrors the schema surface of the reference graph database
  * (titan-core/src/main/java/com/thinkaurelius/titan/core/schema/TitanManagement.java:37,
  * PropertyKeyMaker.java:22-41, EdgeLabelMaker.java:22-46, VertexLabelMaker.java:17-39)
  * as pure case classes validated at ingest / query time. Schema elements in the
  * reference are hidden vertices (IDManager.java:348-350); here they are an immutable
  * in-memory catalog — idiomatic for a batch/columnar engine.
  */

/** Property cardinality — reference: tc/core/Cardinality.java:17-28. */
sealed trait Cardinality
object Cardinality {
  case object SINGLE extends Cardinality
  case object LIST extends Cardinality
  case object SET extends Cardinality
}

/** Edge multiplicity — reference: tc/core/Multiplicity.java:20-41. */
sealed trait Multiplicity {
  /** Constraint as (maxOutDegreePerVertex, maxInDegreePerVertex); None = unbounded. */
  def outLimit: Option[Int] = None
  def inLimit: Option[Int] = None
}
object Multiplicity {
  case object MULTI extends Multiplicity
  /** At most one edge between any pair (u,v) per label. */
  case object SIMPLE extends Multiplicity
  case object ONE2MANY extends Multiplicity { override val inLimit = Some(1) }
  case object MANY2ONE extends Multiplicity { override val outLimit = Some(1) }
  case object ONE2ONE extends Multiplicity {
    override val outLimit = Some(1); override val inLimit = Some(1)
  }
}

/** Mixed-index mapping — reference: tc/core/schema/Mapping.java:18-21. */
sealed trait Mapping
object Mapping {
  case object DEFAULT extends Mapping
  case object TEXT extends Mapping      // tokenized full-text
  case object STRING extends Mapping    // exact string
  case object TEXTSTRING extends Mapping
}

/** Index lifecycle status — reference: tc/core/schema/SchemaStatus.java. */
sealed trait SchemaStatus
object SchemaStatus {
  case object INSTALLED extends SchemaStatus
  case object REGISTERED extends SchemaStatus
  case object ENABLED extends SchemaStatus
  case object DISABLED extends SchemaStatus
}

/** Index lifecycle actions — reference: tc/core/schema/SchemaAction.java:18-39. */
sealed trait SchemaAction
object SchemaAction {
  case object REGISTER_INDEX extends SchemaAction
  case object REINDEX extends SchemaAction
  case object ENABLE_INDEX extends SchemaAction
  case object DISABLE_INDEX extends SchemaAction
  case object REMOVE_INDEX extends SchemaAction
}

/** Consistency modifier — reference: tc/core/schema/ConsistencyModifier.java.
  * In a snapshot/batch engine LOCK degenerates to a uniqueness constraint check
  * and FORK to last-writer-wins merge; kept for catalog parity. */
sealed trait ConsistencyModifier
object ConsistencyModifier {
  case object DEFAULT extends ConsistencyModifier
  case object LOCK extends ConsistencyModifier
  case object FORK extends ConsistencyModifier
}

/** Element categories — reference: tc/graphdb/internal/ElementCategory.java. */
sealed trait ElementCategory
object ElementCategory {
  case object VERTEX extends ElementCategory
  case object EDGE extends ElementCategory
  case object PROPERTY extends ElementCategory
}

sealed trait SortOrder
object SortOrder { case object ASC extends SortOrder; case object DESC extends SortOrder }

/** Property key — reference: tc/core/schema/PropertyKeyMaker.java:22,38,41.
  * `dataType` uses Spark SQL types (the §1.4 mapping); exact-type enforcement
  * (docs/titanbasics.txt:1404-1406) happens at ingest validation. */
final case class PropertyKeyDef(
    name: String,
    dataType: DataType,
    cardinality: Cardinality = Cardinality.SINGLE,
    consistency: ConsistencyModifier = ConsistencyModifier.DEFAULT,
    ttlSeconds: Option[Long] = None) {
  /** Column type as stored in the canonical DataFrames: LIST/SET → ArrayType. */
  def columnType: DataType = cardinality match {
    case Cardinality.SINGLE => dataType
    case _ => ArrayType(dataType, containsNull = false)
  }
}

/** Edge label — reference: tc/core/schema/EdgeLabelMaker.java:22-46,
  * StandardEdgeLabelMaker.java:38-56. `sortKey` gives the vertex-centric
  * clustering order (docs/titanbasics.txt:844-905); in this engine it drives
  * the sorted-bucket layout (min/max-prunable slices). */
final case class EdgeLabelDef(
    name: String,
    multiplicity: Multiplicity = Multiplicity.MULTI,
    unidirected: Boolean = false,
    signature: Seq[String] = Nil,
    sortKey: Seq[String] = Nil,
    sortOrder: SortOrder = SortOrder.ASC,
    consistency: ConsistencyModifier = ConsistencyModifier.DEFAULT,
    ttlSeconds: Option[Long] = None,
    // Declared endpoint vertex-label universes (empty = undeclared/any).
    // Richer than Titan's catalog on purpose: with endpoints declared at
    // ingest, a traversal can PROVE the post-hop frontier's label set and
    // keep supernode-salting scoping across hops instead of resetting to
    // conservative-unknown. A routing hint only — never affects results. */
    srcLabels: Set[String] = Set.empty,
    dstLabels: Set[String] = Set.empty)

/** Vertex label — reference: tc/core/schema/VertexLabelMaker.java:17-39.
  * `partitioned` marks supernode labels (skew-salted in joins/aggs);
  * `static` marks immutable-after-create labels. */
final case class VertexLabelDef(
    name: String,
    partitioned: Boolean = false,
    static: Boolean = false,
    ttlSeconds: Option[Long] = None)

/** Graph index (composite or mixed) —
  * reference: tc/core/schema/TitanManagement.java:160-221. */
final case class IndexDef(
    name: String,
    element: ElementCategory,
    keys: Seq[String],
    unique: Boolean = false,
    composite: Boolean = true,            // false = mixed (text/geo-capable)
    mappings: Map[String, Mapping] = Map.empty,
    onlyLabel: Option[String] = None,     // index restricted to one label
    status: SchemaStatus = SchemaStatus.ENABLED)

/** Vertex-centric (relation) index: sort-key prefix layout for one edge label —
  * reference: TitanManagement.java:53-94 buildEdgeIndex. */
final case class RelationIndexDef(
    name: String,
    edgeLabel: String,
    sortKey: Seq[String],
    sortOrder: SortOrder = SortOrder.ASC,
    status: SchemaStatus = SchemaStatus.ENABLED)

/** The catalog. Immutable; management ops return updated copies
  * (mgmt layer holds the mutable reference). */
final case class GraphSchema(
    propertyKeys: Map[String, PropertyKeyDef] = Map.empty,
    edgeLabels: Map[String, EdgeLabelDef] = Map.empty,
    vertexLabels: Map[String, VertexLabelDef] = Map.empty,
    indexes: Map[String, IndexDef] = Map.empty,
    relationIndexes: Map[String, RelationIndexDef] = Map.empty,
    // TTL evaluation instant for catalog-TTL reads (None = wall clock).
    // Pinning it makes expiry reproducible — the analogue of the reference's
    // test-time TimestampProvider override (tc/diskstorage/util/time/*).
    ttlReadTime: Option[java.sql.Timestamp] = None,
    // Graph variables — TinkerPop Graph.Variables, which the reference backs
    // with its system configuration store (tc/graphdb/database/
    // StandardTitanGraph.variables() over GraphDatabaseConfiguration's
    // WriteConfiguration). String-valued here (the typed-Object surface
    // narrowed to the catalog's JSON document); they persist with the graph
    // and survive save/load like every other catalog entry.
    variables: Map[String, String] = Map.empty) {

  def hasVertexTtl: Boolean = vertexLabels.values.exists(_.ttlSeconds.isDefined)
  def hasEdgeTtl: Boolean = edgeLabels.values.exists(_.ttlSeconds.isDefined)
  def hasPropertyTtl: Boolean = propertyKeys.values.exists(_.ttlSeconds.isDefined)

  def propertyKey(name: String): PropertyKeyDef =
    propertyKeys.getOrElse(name, throw new NoSuchElementException(s"property key '$name' not defined"))
  def edgeLabel(name: String): EdgeLabelDef =
    edgeLabels.getOrElse(name, throw new NoSuchElementException(s"edge label '$name' not defined"))
  def vertexLabel(name: String): VertexLabelDef =
    vertexLabels.getOrElse(name, throw new NoSuchElementException(s"vertex label '$name' not defined"))

  def withPropertyKey(k: PropertyKeyDef): GraphSchema = {
    require(!propertyKeys.contains(k.name), s"property key '${k.name}' already defined (types are immutable once created)")
    // FORK cannot apply to constrained types (ManagementSystem.java:
    // 1095-1096, pinned by testConsistencyEnforcement:2352-2358): forking
    // sidesteps exactly the lock a constrained cardinality needs — only
    // LIST (unconstrained) keys may fork
    require(k.consistency != ConsistencyModifier.FORK || k.cardinality == Cardinality.LIST,
      s"property key '${k.name}': FORK does not apply to constrained cardinality ${k.cardinality}")
    copy(propertyKeys = propertyKeys + (k.name -> k))
  }
  def withEdgeLabel(l: EdgeLabelDef): GraphSchema = {
    require(!edgeLabels.contains(l.name), s"edge label '${l.name}' already defined")
    (l.signature ++ l.sortKey).foreach(propertyKey) // must pre-exist, like the reference makers
    // maker validation, as the reference's StandardRelationTypeMaker
    // (testSchemaTypes, TitanGraphTest.java:516-546): a key cannot be both
    // sort key and signature, and a sort key is only meaningful on an
    // unconstrained (MULTI) label — constrained multiplicities bound the
    // adjacency to ≤1 row, leaving nothing to sort
    require(l.sortKey.intersect(l.signature).isEmpty,
      s"edge label '${l.name}': sort key and signature share keys " +
        l.sortKey.intersect(l.signature).mkString("{", ",", "}"))
    require(l.sortKey.isEmpty || l.multiplicity == Multiplicity.MULTI,
      s"edge label '${l.name}': sort key requires MULTI multiplicity, got ${l.multiplicity}")
    // FORK cannot apply to constrained multiplicities (ManagementSystem
    // .java:1095-1096): the fork would duplicate a relation the constraint
    // says is unique
    require(l.consistency != ConsistencyModifier.FORK || l.multiplicity == Multiplicity.MULTI,
      s"edge label '${l.name}': FORK does not apply to constrained multiplicity ${l.multiplicity}")
    copy(edgeLabels = edgeLabels + (l.name -> l))
  }
  def withVertexLabel(l: VertexLabelDef): GraphSchema = {
    require(!vertexLabels.contains(l.name), s"vertex label '${l.name}' already defined")
    copy(vertexLabels = vertexLabels + (l.name -> l))
  }
  def withIndex(ix: IndexDef): GraphSchema = {
    require(!indexes.contains(ix.name), s"index '${ix.name}' already defined")
    ix.keys.foreach(propertyKey)
    copy(indexes = indexes + (ix.name -> ix))
  }
  def withRelationIndex(ix: RelationIndexDef): GraphSchema = {
    require(!relationIndexes.contains(ix.name), s"relation index '${ix.name}' already defined")
    edgeLabel(ix.edgeLabel); ix.sortKey.foreach(propertyKey)
    copy(relationIndexes = relationIndexes + (ix.name -> ix))
  }

  /** Rename a type (the only mutation the reference allows on committed types —
    * docs/titanbasics.txt:1414-1417). */
  /** Rename a property key AND cascade the new name through every catalog
    * reference — index keys/mappings, edge-label signatures and sort keys,
    * relation-index sort keys. The reference gets this for free because
    * schema elements reference each other by vertex id, not name
    * (changeName just relabels the schema vertex); a string-keyed catalog
    * must rewrite the references or leave them dangling. Frame columns are
    * data, not catalog — [[graft.olap.GraphOps.renameProperty]] renames
    * both sides together. */
  def renamePropertyKey(from: String, to: String): GraphSchema = {
    val k = propertyKey(from)
    require(!propertyKeys.contains(to), s"property key '$to' already defined")
    def ren(s: Seq[String]): Seq[String] = s.map(x => if (x == from) to else x)
    copy(
      propertyKeys = propertyKeys - from + (to -> k.copy(name = to)),
      edgeLabels = edgeLabels.view.mapValues(l =>
        l.copy(signature = ren(l.signature), sortKey = ren(l.sortKey))).toMap,
      indexes = indexes.view.mapValues(ix =>
        ix.copy(keys = ren(ix.keys),
          mappings = ix.mappings.map { case (kk, v) =>
            (if (kk == from) to else kk) -> v })).toMap,
      relationIndexes = relationIndexes.view.mapValues(r =>
        r.copy(sortKey = ren(r.sortKey))).toMap)
  }

  /** Rename an edge label, cascading through relation indexes, endpoint
    * declarations AND edge-scoped graph indexes (mgmt.changeName on an
    * EdgeLabel — testSchemaNameChange, TitanGraphTest.java:1228-1231). An
    * onlyLabel scope names a label in the INDEX'S OWN element category, so
    * only element==EDGE indexes follow an edge-label rename — a VERTEX index
    * whose scope label merely shares the name must keep it. Frame label
    * VALUES move in GraphOps.renameEdgeLabel. */
  def renameEdgeLabel(from: String, to: String): GraphSchema = {
    val l = edgeLabel(from)
    require(!edgeLabels.contains(to), s"edge label '$to' already defined")
    copy(
      edgeLabels = edgeLabels - from + (to -> l.copy(name = to)),
      indexes = indexes.view.mapValues(ix =>
        if (ix.element == ElementCategory.EDGE && ix.onlyLabel.contains(from))
          ix.copy(onlyLabel = Some(to)) else ix).toMap,
      relationIndexes = relationIndexes.view.mapValues(r =>
        if (r.edgeLabel == from) r.copy(edgeLabel = to) else r).toMap)
  }

  /** Rename a vertex label, cascading through label-scoped VERTEX indexes AND
    * the edge labels' declared endpoint universes — a stale endpoint set would
    * silently break supernode-salting scope proofs after the rename
    * (testSchemaNameChange:1240-1243). The onlyLabel cascade is guarded on
    * element==VERTEX: an EDGE index scoped to an edge label that happens to
    * share the vertex label's name is a different namespace and must not move. */
  def renameVertexLabel(from: String, to: String): GraphSchema = {
    val l = vertexLabel(from)
    require(!vertexLabels.contains(to), s"vertex label '$to' already defined")
    def ren(s: Set[String]): Set[String] = if (s.contains(from)) s - from + to else s
    copy(
      vertexLabels = vertexLabels - from + (to -> l.copy(name = to)),
      indexes = indexes.view.mapValues(ix =>
        if (ix.element == ElementCategory.VERTEX && ix.onlyLabel.contains(from))
          ix.copy(onlyLabel = Some(to)) else ix).toMap,
      edgeLabels = edgeLabels.view.mapValues(e =>
        e.copy(srcLabels = ren(e.srcLabels), dstLabels = ren(e.dstLabels))).toMap)
  }

  /** Rename a graph index (testSchemaNameChange:1245-1248). The registered
    * table moves in PropertyGraph via GraphOps.renameIndex. */
  def renameIndex(from: String, to: String): GraphSchema = {
    val ix = indexes.getOrElse(from, throw new NoSuchElementException(s"index '$from' not defined"))
    require(!indexes.contains(to), s"index '$to' already defined")
    copy(indexes = indexes - from + (to -> ix.copy(name = to)))
  }

  /** Rename a relation (vertex-centric) index (testSchemaNameChange:1233-1238). */
  def renameRelationIndex(from: String, to: String): GraphSchema = {
    val ix = relationIndexes.getOrElse(from,
      throw new NoSuchElementException(s"relation index '$from' not defined"))
    require(!relationIndexes.contains(to), s"relation index '$to' already defined")
    copy(relationIndexes = relationIndexes - from + (to -> ix.copy(name = to)))
  }

  /** Graph.Variables set/remove (TinkerPop semantics: set overwrites, remove
    * of an absent key is a no-op). */
  def withVariable(key: String, value: String): GraphSchema =
    copy(variables = variables + (key -> value))
  def removeVariable(key: String): GraphSchema = copy(variables = variables - key)

  /** Edge labels visible only from their out-vertex (EdgeLabelMaker.unidirected). */
  def unidirectedLabels: Seq[String] =
    edgeLabels.values.filter(_.unidirected).map(_.name).toSeq

  /** Vertex labels flagged partitioned (VertexLabelMaker.partition(),
    * docs/partitioning.txt) — supernode labels whose per-vertex aggregations
    * route through the salted two-phase plan transparently. */
  def partitionedLabels: Seq[String] =
    vertexLabels.values.filter(_.partitioned).map(_.name).toSeq

  /** Provable endpoint vertex-label universe of a hop over `labels`: the
    * union of the declared endpoint sets of every traversed edge label
    * (`wantSrc` collects src sides, `wantDst` dst sides — an IN hop lands on
    * srcs, OUT on dsts, BOTH on both). None — "unknown, assume anything" —
    * when the hop is label-unrestricted, any traversed label is uncataloged,
    * or a needed endpoint set is undeclared. Conservative by construction:
    * consumers treat None as the full universe. */
  def hopEndpointLabels(labels: Seq[String], wantSrc: Boolean,
      wantDst: Boolean): Option[Set[String]] = {
    if (labels.isEmpty) return None
    val defs = labels.map(edgeLabels.get)
    if (defs.exists(_.isEmpty)) return None
    val perLabel = defs.flatten.map { d =>
      val src = if (wantSrc) Some(d.srcLabels).filter(_.nonEmpty) else Some(Set.empty[String])
      val dst = if (wantDst) Some(d.dstLabels).filter(_.nonEmpty) else Some(Set.empty[String])
      for { s <- src; t <- dst } yield s union t
    }
    if (perLabel.exists(_.isEmpty)) None
    else Some(perLabel.flatten.reduce(_ union _))
  }

  /** Composite indexes usable for an equality-constrained key set
    * (the index-selection candidate set; cf. GraphCentricQueryBuilder.java:234-308). */
  def compositeIndexCandidates(element: ElementCategory, eqKeys: Set[String]): Seq[IndexDef] =
    indexes.values.toSeq
      .filter(ix => ix.composite && ix.element == element && ix.status == SchemaStatus.ENABLED)
      .filter(ix => ix.keys.forall(eqKeys.contains))
      .sortBy(-_.keys.size)

  /** ENABLED mixed indexes with a TEXT/TEXTSTRING-mapped key among the
    * query's textContains keys — the mixed-backend side of the reference's
    * index selection (GraphCentricQueryBuilder considers both composite and
    * mixed indexes; docs/searchpredicates.txt:70-86). */
  def mixedTextIndexCandidates(element: ElementCategory, textKeys: Set[String]): Seq[IndexDef] =
    indexes.values.toSeq
      .filter(ix => !ix.composite && ix.element == element && ix.status == SchemaStatus.ENABLED)
      .filter(ix => ix.keys.exists(k => textKeys.contains(k) &&
        (ix.mappings.getOrElse(k, Mapping.DEFAULT) match {
          case Mapping.TEXT | Mapping.TEXTSTRING => true
          case _ => false
        })))
}

object GraphIds {
  /** Synthesized 64-bit ids: [8-bit type tag | 56-bit local id] — mirrors the
    * reference's padded partitioned id layout (IDManager.java:429-438) without
    * the partition bits (partitioning is Spark's job here). */
  val TagBits = 56
  def vertexId(typeTag: Int, localId: Long): Long = {
    require(typeTag > 0 && typeTag < 256 && localId >= 0 && localId < (1L << TagBits))
    (typeTag.toLong << TagBits) | localId
  }
  def typeTag(id: Long): Int = (id >>> TagBits).toInt
  def localId(id: Long): Long = id & ((1L << TagBits) - 1)
}
