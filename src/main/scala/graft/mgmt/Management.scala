package graft.mgmt

import graft.core._
import org.apache.spark.sql.types.DataType

/** Schema/index DDL surface — the reference's `TitanManagement`
  * (tc/core/schema/TitanManagement.java:37, maker builders
  * PropertyKeyMaker/EdgeLabelMaker/VertexLabelMaker, index lifecycle
  * :306-330 updateIndex/awaitGraphIndexStatus with SchemaAction
  * REGISTER/REINDEX/ENABLE/DISABLE/REMOVE and SchemaStatus transitions).
  *
  * A management "transaction": builders mutate a staged copy of the catalog;
  * `commit()` atomically publishes it. Index builds in the storage engine are
  * batch jobs (graft.index.Indexes.materialize); the state machine here tracks
  * their lifecycle the way ManagementSystem does.
  */
object Management {
  /** Names a user-defined type may not take (ManagementSystem's name check —
    * Token.isSystemName + Graph.Hidden; pinned by ManagementTest.java:19-75):
    * the `~` prefix is the hidden/system namespace (implicit keys, `~T$*`
    * schema internals), and the TinkerPop element-token words are reserved
    * by the query grammar. */
  private[mgmt] val ReservedTokens =
    Set("key", "vertex", "edge", "element", "property", "label")
  private[mgmt] def checkName(name: String): Unit = {
    require(name != null && name.nonEmpty, "type name must be non-empty")
    require(!name.startsWith("~"),
      s"name '$name' is in the system namespace (prefix '~')")
    require(!ReservedTokens.contains(name),
      s"name '$name' is a reserved element token")
  }
}

final class Management(initial: GraphSchema) {
  private var staged: GraphSchema = initial
  private var committed = false

  def current: GraphSchema = staged

  // ---- makers ----
  final class PropertyKeyMaker(name: String) {
    Management.checkName(name)
    private var dt: DataType = org.apache.spark.sql.types.StringType
    private var card: Cardinality = Cardinality.SINGLE
    def dataType(d: DataType): PropertyKeyMaker = { dt = d; this }
    def cardinality(c: Cardinality): PropertyKeyMaker = { card = c; this }
    def make(): PropertyKeyDef = {
      val k = PropertyKeyDef(name, dt, card)
      staged = staged.withPropertyKey(k); k
    }
  }
  final class EdgeLabelMaker(name: String) {
    Management.checkName(name)
    private var mult: Multiplicity = Multiplicity.MULTI
    private var sig: Seq[String] = Nil
    private var sort: Seq[String] = Nil
    private var ord: SortOrder = SortOrder.ASC
    private var unidir = false
    def multiplicity(m: Multiplicity): EdgeLabelMaker = { mult = m; this }
    def signature(keys: String*): EdgeLabelMaker = { sig = keys; this }
    def sortKey(keys: String*): EdgeLabelMaker = { sort = keys; this }
    def sortOrder(o: SortOrder): EdgeLabelMaker = { ord = o; this }
    def unidirected(): EdgeLabelMaker = { unidir = true; this }
    def make(): EdgeLabelDef = {
      val l = EdgeLabelDef(name, mult, unidir, sig, sort, ord)
      staged = staged.withEdgeLabel(l); l
    }
  }
  final class VertexLabelMaker(name: String) {
    Management.checkName(name)
    private var part = false; private var stat = false
    def partition(): VertexLabelMaker = { part = true; this }
    def setStatic(): VertexLabelMaker = { stat = true; this }
    def make(): VertexLabelDef = {
      val l = VertexLabelDef(name, part, stat)
      staged = staged.withVertexLabel(l); l
    }
  }
  final class IndexBuilder(name: String, element: ElementCategory) {
    private var keys: Vector[String] = Vector.empty
    private var uniq = false
    private var maps: Map[String, Mapping] = Map.empty
    private var only: Option[String] = None
    def addKey(k: String, mapping: Mapping = Mapping.DEFAULT): IndexBuilder = {
      keys :+= k; maps += (k -> mapping); this
    }
    def unique(): IndexBuilder = { uniq = true; this }
    def indexOnly(label: String): IndexBuilder = { only = Some(label); this }
    /** Composite index is immediately ENABLED when built in the same mgmt tx
      * as its keys (the reference's fast path for new-type indexes). */
    def buildCompositeIndex(): IndexDef = {
      val ix = IndexDef(name, element, keys, uniq, composite = true, maps, only, SchemaStatus.ENABLED)
      staged = staged.withIndex(ix); ix
    }
    /** Mixed index starts INSTALLED; requires REGISTER + ENABLE lifecycle.
      * Each key's (type, mapping) pair must pass the provider capability
      * matrix — the reference rejects an unsupported addIndexKey at build
      * time (ManagementSystem checks IndexProvider.supports(); e.g. a TEXT
      * mapping on a Double key throws, IndexProviderTest.testCommonSupport). */
    def buildMixedIndex(): IndexDef = {
      keys.foreach { k =>
        // The reference's addIndexKey takes a PropertyKey OBJECT, so the key
        // necessarily exists before the index is built — an undeclared name
        // here would skip the capability check entirely and let an
        // unsupported (type, mapping) pair in once the default schema maker
        // types the key later. Require the declaration up front.
        val pk = staged.propertyKeys.getOrElse(k,
          throw new IllegalArgumentException(
            s"index '$name': key '$k' is not declared — make the property " +
              "key (with its data type) before buildMixedIndex, so the " +
              "provider capability matrix can validate the mapping"))
        val m = maps.getOrElse(k, Mapping.DEFAULT)
        require(graft.index.Indexes.supports(pk.dataType, m),
          s"index '$name': key '$k' of type ${pk.dataType.simpleString} " +
            s"does not support mapping $m")
      }
      val ix = IndexDef(name, element, keys, unique = false, composite = false, maps, only,
        SchemaStatus.INSTALLED)
      staged = staged.withIndex(ix); ix
    }
  }

  def makePropertyKey(name: String) = new PropertyKeyMaker(name)
  def makeEdgeLabel(name: String) = new EdgeLabelMaker(name)
  def makeVertexLabel(name: String) = new VertexLabelMaker(name)
  def buildIndex(name: String, element: ElementCategory) = new IndexBuilder(name, element)

  def buildEdgeIndex(edgeLabel: String, name: String, sortKey: Seq[String],
      order: SortOrder = SortOrder.ASC): RelationIndexDef = {
    val ix = RelationIndexDef(name, edgeLabel, sortKey, order)
    staged = staged.withRelationIndex(ix); ix
  }

  /** Index lifecycle — SchemaAction transitions
    * (tc/core/schema/SchemaAction.java:18-39):
    * INSTALLED →REGISTER_INDEX→ REGISTERED →ENABLE_INDEX→ ENABLED
    * ENABLED →DISABLE_INDEX→ DISABLED →REMOVE_INDEX→ (gone)
    * REINDEX: REGISTERED/ENABLED → ENABLED (rebuild is the caller's batch job). */
  def updateIndex(name: String, action: SchemaAction): SchemaStatus = {
    val ix = staged.indexes.getOrElse(name,
      throw new NoSuchElementException(s"index '$name' not defined"))
    import SchemaAction._
    import SchemaStatus._
    val next: SchemaStatus = (ix.status, action) match {
      case (INSTALLED, REGISTER_INDEX) => REGISTERED
      case (REGISTERED, ENABLE_INDEX) => ENABLED
      case (REGISTERED, REINDEX) => ENABLED
      case (ENABLED, REINDEX) => ENABLED
      case (ENABLED, DISABLE_INDEX) => DISABLED
      case (DISABLED, REMOVE_INDEX) =>
        staged = staged.copy(indexes = staged.indexes - name)
        return DISABLED
      case (s, a) => throw new IllegalStateException(s"cannot apply $a to index in status $s")
    }
    staged = staged.copy(indexes = staged.indexes + (name -> ix.copy(status = next)))
    next
  }

  /** awaitGraphIndexStatus analogue — in a synchronous catalog the status is
    * immediately observable. */
  def indexStatus(name: String): SchemaStatus = staged.indexes(name).status

  def renamePropertyKey(from: String, to: String): Unit =
    staged = staged.renamePropertyKey(from, to)

  /** Publish the staged catalog. */
  def commit(): GraphSchema = { committed = true; staged }
  def rollback(): GraphSchema = { staged = initial; initial }
}
