package graft.core

import org.apache.spark.sql.types.DataType

/** JSON (de)serialization of the schema catalog — the persistence half the
  * reference keeps as hidden schema vertices inside the store
  * (IDManager.java:348-350: schema elements live IN the graph, so
  * opening a Titan graph recovers every type definition). Here the catalog
  * travels as one small JSON document next to the parquet frames
  * ([[graft.data.GraphIO.save]]/load), so TTLs, static/partitioned flags,
  * multiplicities, signatures, sort keys and index definitions survive a
  * save/load round-trip instead of being re-derived (and therefore
  * weakened) by the first-use maker.
  *
  * Uses the Jackson shipped with Spark; property data types round-trip
  * through Spark's own `DataType.json`/`fromJson`. Encoding is
  * deterministic (entries sorted by name) so the document is stable for
  * diffing and content-addressed storage.
  */
object SchemaJson {
  import com.fasterxml.jackson.databind.ObjectMapper
  import scala.jdk.CollectionConverters._

  private def mapper = new ObjectMapper()

  // ---------- encode ----------

  private def jm(kvs: (String, Any)*): java.util.LinkedHashMap[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    kvs.foreach { case (k, v) =>
      v match {
        case Some(x) => m.put(k, x)
        case None => // omit
        case seq: Seq[_] => m.put(k, seq.asJava)
        case mp: Map[_, _] =>
          val inner = new java.util.LinkedHashMap[Any, Any]()
          mp.toSeq.sortBy(_._1.toString).foreach { case (a, b) => inner.put(a, b) }
          m.put(k, inner)
        case other => m.put(k, other)
      }
    }
    m
  }

  def toJson(s: GraphSchema): String = {
    val root = jm(
      "propertyKeys" -> s.propertyKeys.values.toSeq.sortBy(_.name).map(k => jm(
        "name" -> k.name, "dataType" -> k.dataType.json,
        "cardinality" -> k.cardinality.toString,
        "consistency" -> k.consistency.toString,
        "ttlSeconds" -> k.ttlSeconds)),
      "edgeLabels" -> s.edgeLabels.values.toSeq.sortBy(_.name).map(l => jm(
        "name" -> l.name, "multiplicity" -> l.multiplicity.toString,
        "unidirected" -> l.unidirected, "signature" -> l.signature,
        "sortKey" -> l.sortKey, "sortOrder" -> l.sortOrder.toString,
        "consistency" -> l.consistency.toString, "ttlSeconds" -> l.ttlSeconds,
        "srcLabels" -> l.srcLabels.toSeq.sorted,
        "dstLabels" -> l.dstLabels.toSeq.sorted)),
      "vertexLabels" -> s.vertexLabels.values.toSeq.sortBy(_.name).map(l => jm(
        "name" -> l.name, "partitioned" -> l.partitioned, "static" -> l.static,
        "ttlSeconds" -> l.ttlSeconds)),
      "indexes" -> s.indexes.values.toSeq.sortBy(_.name).map(ix => jm(
        "name" -> ix.name, "element" -> ix.element.toString, "keys" -> ix.keys,
        "unique" -> ix.unique, "composite" -> ix.composite,
        "mappings" -> ix.mappings.map { case (k, v) => k -> v.toString },
        "onlyLabel" -> ix.onlyLabel, "status" -> ix.status.toString)),
      "relationIndexes" -> s.relationIndexes.values.toSeq.sortBy(_.name).map(r => jm(
        "name" -> r.name, "edgeLabel" -> r.edgeLabel, "sortKey" -> r.sortKey,
        "sortOrder" -> r.sortOrder.toString, "status" -> r.status.toString)),
      "ttlReadTime" -> s.ttlReadTime.map(_.toInstant.toString),
      "variables" -> {
        val m = new java.util.LinkedHashMap[String, String]()
        s.variables.toSeq.sortBy(_._1).foreach { case (k, v) => m.put(k, v) }
        m
      })
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  // ---------- decode ----------

  private def cardinality(s: String): Cardinality = s match {
    case "SINGLE" => Cardinality.SINGLE
    case "LIST" => Cardinality.LIST
    case "SET" => Cardinality.SET
    case other => throw new IllegalArgumentException(s"unknown cardinality '$other'")
  }
  private def multiplicity(s: String): Multiplicity = s match {
    case "MULTI" => Multiplicity.MULTI
    case "SIMPLE" => Multiplicity.SIMPLE
    case "ONE2MANY" => Multiplicity.ONE2MANY
    case "MANY2ONE" => Multiplicity.MANY2ONE
    case "ONE2ONE" => Multiplicity.ONE2ONE
    case other => throw new IllegalArgumentException(s"unknown multiplicity '$other'")
  }
  private def consistency(s: String): ConsistencyModifier = s match {
    case "DEFAULT" => ConsistencyModifier.DEFAULT
    case "LOCK" => ConsistencyModifier.LOCK
    case "FORK" => ConsistencyModifier.FORK
    case other => throw new IllegalArgumentException(s"unknown consistency '$other'")
  }
  private def sortOrder(s: String): SortOrder =
    if (s == "DESC") SortOrder.DESC else SortOrder.ASC
  private def element(s: String): ElementCategory = s match {
    case "VERTEX" => ElementCategory.VERTEX
    case "EDGE" => ElementCategory.EDGE
    case "PROPERTY" => ElementCategory.PROPERTY
    case other => throw new IllegalArgumentException(s"unknown element '$other'")
  }
  private def mapping(s: String): Mapping = s match {
    case "DEFAULT" => Mapping.DEFAULT
    case "TEXT" => Mapping.TEXT
    case "STRING" => Mapping.STRING
    case "TEXTSTRING" => Mapping.TEXTSTRING
    case other => throw new IllegalArgumentException(s"unknown mapping '$other'")
  }
  private def status(s: String): SchemaStatus = s match {
    case "INSTALLED" => SchemaStatus.INSTALLED
    case "REGISTERED" => SchemaStatus.REGISTERED
    case "ENABLED" => SchemaStatus.ENABLED
    case "DISABLED" => SchemaStatus.DISABLED
    case other => throw new IllegalArgumentException(s"unknown status '$other'")
  }

  private type JMap = java.util.Map[String, Any]
  private def str(m: JMap, k: String): String = m.get(k).asInstanceOf[String]
  private def bool(m: JMap, k: String): Boolean =
    Option(m.get(k)).exists(_.asInstanceOf[Boolean])
  private def strs(m: JMap, k: String): Seq[String] =
    Option(m.get(k)).map(_.asInstanceOf[java.util.List[String]].asScala.toSeq).getOrElse(Nil)
  private def optLong(m: JMap, k: String): Option[Long] =
    Option(m.get(k)).map(v => v.asInstanceOf[Number].longValue())
  private def optStr(m: JMap, k: String): Option[String] =
    Option(m.get(k)).map(_.asInstanceOf[String])
  private def objs(root: JMap, k: String): Seq[JMap] =
    Option(root.get(k))
      .map(_.asInstanceOf[java.util.List[JMap]].asScala.toSeq).getOrElse(Nil)

  def fromJson(json: String): GraphSchema = {
    val root = mapper.readValue(json, classOf[java.util.Map[String, Any]])
    val pks = objs(root, "propertyKeys").map { m =>
      PropertyKeyDef(str(m, "name"), DataType.fromJson(str(m, "dataType")),
        cardinality(str(m, "cardinality")), consistency(str(m, "consistency")),
        optLong(m, "ttlSeconds"))
    }
    val els = objs(root, "edgeLabels").map { m =>
      EdgeLabelDef(str(m, "name"), multiplicity(str(m, "multiplicity")),
        bool(m, "unidirected"), strs(m, "signature"), strs(m, "sortKey"),
        sortOrder(str(m, "sortOrder")), consistency(str(m, "consistency")),
        optLong(m, "ttlSeconds"),
        // absent in pre-endpoint catalog documents → undeclared
        strs(m, "srcLabels").toSet, strs(m, "dstLabels").toSet)
    }
    val vls = objs(root, "vertexLabels").map { m =>
      VertexLabelDef(str(m, "name"), bool(m, "partitioned"), bool(m, "static"),
        optLong(m, "ttlSeconds"))
    }
    val ixs = objs(root, "indexes").map { m =>
      val maps = Option(m.get("mappings"))
        .map(_.asInstanceOf[java.util.Map[String, String]].asScala.toMap)
        .getOrElse(Map.empty[String, String])
        .map { case (k, v) => k -> mapping(v) }
      IndexDef(str(m, "name"), element(str(m, "element")), strs(m, "keys"),
        bool(m, "unique"), bool(m, "composite"), maps, optStr(m, "onlyLabel"),
        status(str(m, "status")))
    }
    val rixs = objs(root, "relationIndexes").map { m =>
      RelationIndexDef(str(m, "name"), str(m, "edgeLabel"), strs(m, "sortKey"),
        sortOrder(str(m, "sortOrder")), status(str(m, "status")))
    }
    GraphSchema(
      propertyKeys = pks.map(k => k.name -> k).toMap,
      edgeLabels = els.map(l => l.name -> l).toMap,
      vertexLabels = vls.map(l => l.name -> l).toMap,
      indexes = ixs.map(i => i.name -> i).toMap,
      relationIndexes = rixs.map(r => r.name -> r).toMap,
      ttlReadTime = optStr(root, "ttlReadTime")
        .map(s => java.sql.Timestamp.from(java.time.Instant.parse(s))),
      // absent in pre-variables documents — default empty (backwards compat)
      variables = Option(root.get("variables"))
        .map(_.asInstanceOf[java.util.Map[String, String]].asScala.toMap)
        .getOrElse(Map.empty))
  }
}
