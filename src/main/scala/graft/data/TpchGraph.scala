package graft.data

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maps the driver's TPC-H-ish parquet tables onto the canonical property graph
  * (FIXTURES.md §4). Vertex ids are `typeTag << 56 | uid` (disjoint across
  * labels — mirrors the reference's padded id layout, IDManager.java:429-438).
  *
  * Scale notes: every derived frame is a narrow projection over one parquet
  * scan — column pruning reaches the file scan; unions are partition-local.
  * The ONE load-time shuffle is the row_number window on (l_orderkey,
  * l_linenumber) that disambiguates duplicate lineitem rows for edge ids; use
  * `loadMaterialized` to pay it exactly once per data directory (the derived
  * vertex/edge tables are written to a label-partitioned parquet layout and
  * every query reads the materialized files — also giving partition pruning
  * on `label` filters instead of re-deriving a 12-branch union per query).
  */
object TpchGraph {
  // vertex type tags
  val RegionTag = 1; val NationTag = 2; val CustomerTag = 3
  val SupplierTag = 4; val PartTag = 5; val OrderTag = 6
  // edge type tags (for edge ids)
  private val EInRegion = 1L; private val EInNationC = 2L; private val EInNationS = 3L
  private val EPlaced = 4L; private val EContains = 5L; private val ESuppliedBy = 6L

  def vid(tag: Int, uid: org.apache.spark.sql.Column) =
    (lit(tag.toLong * (1L << GraphIds.TagBits)) + uid.cast(LongType)).as("id")
  private def eid(tag: Long, local: org.apache.spark.sql.Column) =
    (lit(tag * (1L << GraphIds.TagBits)) + local.cast(LongType)).as("id")

  /** The engine-level schema catalog for this graph. */
  val schema: GraphSchema = GraphSchema()
    .withPropertyKey(PropertyKeyDef("uid", LongType))
    .withPropertyKey(PropertyKeyDef("name", StringType))
    .withPropertyKey(PropertyKeyDef("acctbal", DoubleType))
    .withPropertyKey(PropertyKeyDef("mktsegment", StringType))
    .withPropertyKey(PropertyKeyDef("brand", StringType))
    .withPropertyKey(PropertyKeyDef("ptype", StringType))
    .withPropertyKey(PropertyKeyDef("size", IntegerType))
    .withPropertyKey(PropertyKeyDef("retailprice", DoubleType))
    .withPropertyKey(PropertyKeyDef("orderdate", DateType))
    .withPropertyKey(PropertyKeyDef("totalprice", DoubleType))
    .withPropertyKey(PropertyKeyDef("orderstatus", StringType))
    .withPropertyKey(PropertyKeyDef("orderpriority", StringType))
    .withPropertyKey(PropertyKeyDef("quantity", DoubleType))
    .withPropertyKey(PropertyKeyDef("extendedprice", DoubleType))
    .withPropertyKey(PropertyKeyDef("discount", DoubleType))
    .withPropertyKey(PropertyKeyDef("tax", DoubleType))
    .withPropertyKey(PropertyKeyDef("returnflag", StringType))
    .withPropertyKey(PropertyKeyDef("linestatus", StringType))
    .withPropertyKey(PropertyKeyDef("shipdate", DateType))
    .withPropertyKey(PropertyKeyDef("linenumber", IntegerType))
    .withPropertyKey(PropertyKeyDef("suppkey", LongType))
    .withVertexLabel(VertexLabelDef("region"))
    .withVertexLabel(VertexLabelDef("nation"))
    .withVertexLabel(VertexLabelDef("customer"))
    .withVertexLabel(VertexLabelDef("supplier"))
    .withVertexLabel(VertexLabelDef("part"))
    .withVertexLabel(VertexLabelDef("order"))
    // endpoint label sets declared at ingest: they let traversals PROVE the
    // post-hop frontier label universe (supernode-salting scope survives hops)
    .withEdgeLabel(EdgeLabelDef("in_region", Multiplicity.MANY2ONE,
      srcLabels = Set("nation"), dstLabels = Set("region")))
    .withEdgeLabel(EdgeLabelDef("in_nation", Multiplicity.MANY2ONE,
      srcLabels = Set("customer", "supplier"), dstLabels = Set("nation")))
    .withEdgeLabel(EdgeLabelDef("placed", Multiplicity.MULTI, sortKey = Seq("orderdate"),
      srcLabels = Set("customer"), dstLabels = Set("order")))
    .withEdgeLabel(EdgeLabelDef("contains", Multiplicity.MULTI,
      signature = Seq("quantity", "extendedprice", "discount", "suppkey"),
      sortKey = Seq("shipdate"),
      srcLabels = Set("order"), dstLabels = Set("part")))
    .withEdgeLabel(EdgeLabelDef("supplied_by", Multiplicity.MULTI,
      srcLabels = Set("order"), dstLabels = Set("supplier")))
    .withIndex(IndexDef("byUid", ElementCategory.VERTEX, Seq("uid"), unique = false))
    .withIndex(IndexDef("byName", ElementCategory.VERTEX, Seq("name"), unique = false))
    .withRelationIndex(RelationIndexDef("containsByShip", "contains", Seq("shipdate")))
    .withRelationIndex(RelationIndexDef("placedByDate", "placed", Seq("orderdate")))

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** All vertex property columns, in canonical order. Absent props are null. */
  private val vertexProps = Seq(
    "uid" -> LongType, "name" -> StringType, "acctbal" -> DoubleType,
    "mktsegment" -> StringType, "brand" -> StringType, "ptype" -> StringType,
    "size" -> IntegerType, "retailprice" -> DoubleType, "orderdate" -> DateType,
    "totalprice" -> DoubleType, "orderstatus" -> StringType, "orderpriority" -> StringType)

  def load(spark: SparkSession, dir: String): PropertyGraph = {
    def pad(df: DataFrame): DataFrame = {
      val present = df.columns.toSet
      val cols = Seq(col("id"), col("label")) ++ vertexProps.map { case (n, t) =>
        if (present(n)) col(n).cast(t).as(n) else lit(null).cast(t).as(n)
      }
      df.select(cols: _*)
    }
    val region = table(spark, dir, "region").select(
      vid(RegionTag, col("r_regionkey")), lit("region").as("label"),
      col("r_regionkey").cast(LongType).as("uid"), col("r_name").as("name"))
    val nation = table(spark, dir, "nation").select(
      vid(NationTag, col("n_nationkey")), lit("nation").as("label"),
      col("n_nationkey").cast(LongType).as("uid"), col("n_name").as("name"))
    val customer = table(spark, dir, "customer").select(
      vid(CustomerTag, col("c_custkey")), lit("customer").as("label"),
      col("c_custkey").as("uid"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"), col("c_mktsegment").as("mktsegment"))
    val supplier = table(spark, dir, "supplier").select(
      vid(SupplierTag, col("s_suppkey")), lit("supplier").as("label"),
      col("s_suppkey").as("uid"), col("s_name").as("name"), col("s_acctbal").as("acctbal"))
    val part = table(spark, dir, "part").select(
      vid(PartTag, col("p_partkey")), lit("part").as("label"),
      col("p_partkey").as("uid"), col("p_name").as("name"), col("p_brand").as("brand"),
      col("p_type").as("ptype"), col("p_size").as("size"), col("p_retailprice").as("retailprice"))
    val orders = table(spark, dir, "orders").select(
      vid(OrderTag, col("o_orderkey")), lit("order").as("label"),
      col("o_orderkey").as("uid"), col("o_orderdate").cast(DateType).as("orderdate"),
      col("o_totalprice").as("totalprice"), col("o_orderstatus").as("orderstatus"),
      col("o_orderpriority").as("orderpriority"))
    val vertices = Seq(region, nation, customer, supplier, part, orders).map(pad).reduce(_ unionAll _)

    // ---- edges ----
    val eProps = Seq("orderdate" -> DateType, "quantity" -> DoubleType,
      "extendedprice" -> DoubleType, "discount" -> DoubleType, "tax" -> DoubleType,
      "returnflag" -> StringType, "linestatus" -> StringType,
      "shipdate" -> DateType, "linenumber" -> IntegerType, "suppkey" -> LongType)
    def padE(df: DataFrame): DataFrame = {
      val present = df.columns.toSet
      val cols = Seq(col("id"), col("src"), col("dst"), col("label")) ++ eProps.map { case (n, t) =>
        if (present(n)) col(n).cast(t).as(n) else lit(null).cast(t).as(n)
      }
      df.select(cols: _*)
    }
    val nationT = table(spark, dir, "nation")
    val inRegion = nationT.select(
      eid(EInRegion, col("n_nationkey")),
      vid(NationTag, col("n_nationkey")).as("src"),
      vid(RegionTag, col("n_regionkey")).as("dst"), lit("in_region").as("label"))
    val custT = table(spark, dir, "customer")
    val inNationC = custT.select(
      eid(EInNationC, col("c_custkey")),
      vid(CustomerTag, col("c_custkey")).as("src"),
      vid(NationTag, col("c_nationkey")).as("dst"), lit("in_nation").as("label"))
    val suppT = table(spark, dir, "supplier")
    val inNationS = suppT.select(
      eid(EInNationS, col("s_suppkey")),
      vid(SupplierTag, col("s_suppkey")).as("src"),
      vid(NationTag, col("s_nationkey")).as("dst"), lit("in_nation").as("label"))
    val ordT = table(spark, dir, "orders")
    val placed = ordT.select(
      eid(EPlaced, col("o_orderkey")),
      vid(CustomerTag, col("o_custkey")).as("src"),
      vid(OrderTag, col("o_orderkey")).as("dst"), lit("placed").as("label"),
      col("o_orderdate").cast(DateType).as("orderdate"))
    // lineitem local id: collision-FREE composite `orderkey·256 + linenumber·32
    // + dupSeq`. The synthetic data repeats (orderkey, linenumber) pairs (up to
    // 6×), so dupSeq disambiguates via a row_number window keyed on the pair.
    // The window order is TOTAL over every attribute that distinguishes rows
    // (rows identical on all of them are interchangeable by definition), so
    // dupSeq is deterministic across branches and task retries — the same eid
    // always carries the same attributes in both the contains and supplied_by
    // edge sets. A truncated 56-bit hash would hit birthday collisions at the
    // 10⁸+ rows this engine targets. Bounds: linenumber ≤ 7, dupSeq ≤ 31,
    // orderkey < 2⁴⁸ — fits the 56-bit local space far beyond 100 TB scale,
    // and violations raise at materialization time instead of silently
    // colliding into neighbor ids. Cost: one window shuffle keyed
    // (l_orderkey, l_linenumber) — paid once per data dir via
    // `loadMaterialized`, never inside a query plan.
    val liW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_shipdate"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"))
    val liT = table(spark, dir, "lineitem")
      .withColumn("__dup", row_number().over(liW) - 1)
    val boundsOk = col("l_linenumber") < 8 && col("__dup") < 32 &&
      col("l_orderkey") >= 0 && col("l_orderkey") < (1L << 48)
    val liLocal = when(boundsOk,
      col("l_orderkey").cast(LongType) * 256L +
        col("l_linenumber").cast(LongType) * 32L + col("__dup").cast(LongType))
      .otherwise(raise_error(concat(lit("lineitem edge id out of packing bounds: orderkey="),
        col("l_orderkey"), lit(" linenumber="), col("l_linenumber"), lit(" dup="), col("__dup"))))
    val contains = liT.select(
      eid(EContains, liLocal),
      vid(OrderTag, col("l_orderkey")).as("src"),
      vid(PartTag, col("l_partkey")).as("dst"), lit("contains").as("label"),
      col("l_quantity").as("quantity"), col("l_extendedprice").as("extendedprice"),
      col("l_discount").as("discount"), col("l_tax").as("tax"),
      col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"),
      col("l_shipdate").cast(DateType).as("shipdate"), col("l_linenumber").as("linenumber"),
      col("l_suppkey").as("suppkey"))
    val suppliedBy = liT.select(
      eid(ESuppliedBy, liLocal),
      vid(OrderTag, col("l_orderkey")).as("src"),
      vid(SupplierTag, col("l_suppkey")).as("dst"), lit("supplied_by").as("label"),
      col("l_shipdate").cast(DateType).as("shipdate"), col("l_linenumber").as("linenumber"))
    val edges = Seq(inRegion, inNationC, inNationS, placed, contains, suppliedBy)
      .map(padE).reduce(_ unionAll _)

    PropertyGraph(schema, vertices, edges)
  }

  /** Bump when the derivation in `load` changes — invalidates materialized
    * layouts written by earlier versions. */
  private val LayoutVersion = 2

  /** Ingest-time materialization: derive the graph once, write it to a
    * label-partitioned parquet layout under `cacheRoot`, and serve all queries
    * from the materialized files. This is the layout a production deployment
    * would bulk-load into (reference: TitanHadoop bulk loading,
    * th/formats/util/input/TitanHadoopSetupCommon.java): the edge-id window
    * and the 12-branch union analysis are paid once per data directory, not
    * once per query, and `label = ...` filters prune to single partitions at
    * file-listing time. Idempotent: a layout with _SUCCESS markers is reused
    * (testdata dirs are immutable by contract). */
  def loadMaterialized(spark: SparkSession, dir: String,
      cacheRoot: String = defaultCacheRoot): PropertyGraph = {
    // sanitized name + hash of the raw dir: two distinct dirs that sanitize
    // to the same string must not collide onto one layout
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_") +
      f"-${dir.hashCode & 0xffffffffL}%08x"
    val base = s"$cacheRoot/v$LayoutVersion/$key"
    val vPath = s"$base/vertices"
    val ePath = s"$base/edges"
    // Hadoop FS probe so non-local cacheRoots (hdfs://, s3a://) work too.
    def ready(p: String): Boolean = {
      val path = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
    }
    // Concurrent first-loaders of the same dir write to a private temp
    // directory and publish with one atomic rename — a reader (or a racing
    // writer's frozen file listing) can never observe a partially written
    // layout. The loser of the publish race discards its copy; both copies
    // are byte-equivalent (derived deterministically from an immutable dir).
    def writeAtomic(write: String => Unit, finalPath: String): Unit = {
      val dest = new org.apache.hadoop.fs.Path(finalPath)
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(
        finalPath + ".__tmp-" + java.util.UUID.randomUUID().toString)
      write(tmp.toString)
      // a dest without _SUCCESS is a partial layout from a crashed writer
      // (never readable: `ready` gates every load) — replace it rather than
      // keeping it forever; only a COMPLETE dest wins the publish race
      if (fs.exists(dest) && !ready(finalPath)) fs.delete(dest, true)
      if (fs.exists(dest) || !fs.rename(tmp, dest)) fs.delete(tmp, true)
    }
    if (!ready(vPath) || !ready(ePath)) {
      val g = load(spark, dir)
      // repartition by the partition column so each label writes few files
      if (!ready(vPath)) writeAtomic(p => g.vertices.repartition(col("label"))
        .write.partitionBy("label").parquet(p), vPath)
      if (!ready(ePath)) writeAtomic(p => g.edges.repartition(col("label"))
        .write.partitionBy("label").parquet(p), ePath)
    }
    // restore canonical column order (partition columns read back last)
    def reorder(df: DataFrame, lead: Seq[String]): DataFrame = {
      val rest = df.columns.filterNot(lead.contains).toSeq
      df.select((lead ++ rest).map(col): _*)
    }
    val g0 = PropertyGraph(schema,
      reorder(spark.read.parquet(vPath), Seq("id", "label")),
      reorder(spark.read.parquet(ePath), Seq("id", "src", "dst", "label")))
    // materialize every enabled composite index once (key columns + id) and
    // register it — the backing store automatic index selection requires
    val withIx = schema.indexes.values
      .filter(ix => ix.composite && ix.status == graft.core.SchemaStatus.ENABLED)
      .foldLeft(g0) { (g, ix) =>
        val ixPath = s"$base/indexes/${ix.name}"
        if (!ready(ixPath))
          writeAtomic(p =>
            graft.index.Indexes.materialize(g0, ix).write.parquet(p), ixPath)
        g.withIndexTable(ix.name, spark.read.parquet(ixPath))
      }
    withIx
  }

  private def defaultCacheRoot: String =
    sys.env.getOrElse("GRAFT_LAYOUT_DIR",
      s"${sys.props.getOrElse("user.dir", "/tmp")}/target/graft-layout")
}
