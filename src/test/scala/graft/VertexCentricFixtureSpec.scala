package graft

import graft.core._
import graft.data.PropertyGraph
import graft.expr.P
import graft.query.{Direction, VertexCentricQuery}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §2 — the reference's vertex-centric query-semantics graph
  * (TitanGraphTest.java:2522-2840 testVertexCentricQuery): hub vertices u,v +
  * N spokes, one edge per direction per hub per label family; edge i carries
  * time=i, weight=i%4+0.5, name="e"+i, number=i%5. Exercises sort-key slices,
  * ASC/DESC order, interval/point/IN predicates, per-vertex limits,
  * adjacent(), multi-label unions, BOTH-direction counting.
  */
class VertexCentricFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val N = 500
  val VId = 1L; val UId = 2L
  def spokeId(i: Int): Long = 100L + i

  lazy val fixture: PropertyGraph = {
    import spark.implicits._
    val schema = GraphSchema()
      .withPropertyKey(PropertyKeyDef("time", IntegerType))
      .withPropertyKey(PropertyKeyDef("weight", DoubleType))
      .withPropertyKey(PropertyKeyDef("name", StringType))
      .withPropertyKey(PropertyKeyDef("number", LongType))
      .withEdgeLabel(EdgeLabelDef("connect", sortKey = Seq("time")))
      .withEdgeLabel(EdgeLabelDef("connectDesc", sortKey = Seq("time"), sortOrder = SortOrder.DESC))
      .withEdgeLabel(EdgeLabelDef("friend", sortKey = Seq("weight", "time"), signature = Seq("number")))
      .withEdgeLabel(EdgeLabelDef("knows", sortKey = Seq("number", "weight")))
      .withEdgeLabel(EdgeLabelDef("follows"))
    val vertices = ((Seq((VId, "hub"), (UId, "hub")) ++
      (1 to N).map(i => (spokeId(i), "spoke"))))
      .toDF("id", "label")
    // per spoke i and hub h: one out-edge h→spoke and one in-edge spoke→h,
    // labels cycling over the families as in the reference
    val labels = Seq("connect", "connectDesc", "friend", "knows", "follows")
    var eid = 0L
    val rows = for {
      (hub, hubIdx) <- Seq(VId, UId).zipWithIndex
      i <- 1 to N
      (src, dst, dirTag) <- Seq((hub, spokeId(i), 0), (spokeId(i), hub, 1))
    } yield {
      eid += 1
      val lbl = labels(i % labels.size)
      (eid, src, dst, lbl, i, i % 4 + 0.5, "e" + i, (i % 5).toLong)
    }
    val edges = rows.toDF("id", "src", "dst", "label", "time", "weight", "name", "number")
    PropertyGraph(schema, vertices, edges)
  }

  def q: VertexCentricQuery = VertexCentricQuery(fixture).onVertices(VId)

  test("interval slice on sort key: time ∈ [10, 100), OUT, connect") {
    val got = q.labels("connect").direction(Direction.OUT)
      .interval("time", 10, 100).edges().collect()
    val exp = (10 until 100).count(i => i % 5 == 0) // label 'connect' ⇔ i%5==0
    assert(got.length === exp)
    assert(got.forall(r => r.getAs[Int]("time") >= 10 && r.getAs[Int]("time") < 100))
  }

  test("per-vertex ordered limit ASC and DESC agree with sort key") {
    val asc = q.labels("connect").direction(Direction.OUT)
      .orderBy("time").limit(5).edges().collect().map(_.getAs[Int]("time")).toSeq
    assert(asc === asc.sorted && asc.length === 5)
    val desc = q.labels("connectDesc").direction(Direction.OUT)
      .orderBy("time", asc = false).limit(5).edges().collect().map(_.getAs[Int]("time")).toSeq
    assert(desc === desc.sorted.reverse && desc.length === 5)
  }

  test("compound sort key: weight then time (friend)") {
    val got = q.labels("friend").direction(Direction.OUT)
      .orderBy("weight").orderBy("time").limit(20).edges()
      .collect().map(r => (r.getAs[Double]("weight"), r.getAs[Int]("time"))).toSeq
    assert(got === got.sortBy(identity) && got.length === 20)
  }

  test("IN-point multiplication: number ∈ {1,3} + time interval") {
    val got = q.labels("knows").direction(Direction.OUT)
      .has("number", P.within(1L, 3L)).interval("time", 0, 250)
      .edges().collect()
    val exp = (1 until 250).count(i => i % 5 == 3 && (i % 5 == 1 || i % 5 == 3))
    // label 'knows' ⇔ i%5==3; number=i%5=3 ⇒ the IN picks only number==3
    assert(got.length === exp)
  }

  test("adjacent(): only edges to the named other vertex") {
    val got = q.labels("connect", "connectDesc", "friend", "knows", "follows")
      .direction(Direction.BOTH).adjacent(spokeId(7)).edges().collect()
    assert(got.length === 2) // v→spoke7 and spoke7→v
    assert(got.forall(_.getAs[Long]("other") === spokeId(7)))
  }

  test("multi-label union with per-vertex limit") {
    val got = q.labels("connect", "follows").direction(Direction.OUT)
      .orderBy("time").limit(10).edges().collect().map(_.getAs[Int]("time")).toSeq
    // connect ⇔ i%5==0, follows ⇔ i%5==4 — first 10 times across both
    val exp = (1 to N).filter(i => i % 5 == 0 || i % 5 == 4).sorted.take(10).toSeq
    assert(got === exp)
  }

  test("BOTH direction: per-hub edgeCount sees both orientations") {
    val cnt = q.labels("connect").direction(Direction.BOTH).edgeCount()
      .collect().head.getAs[Long]("count")
    assert(cnt === 2L * (1 to N).count(_ % 5 == 0))
  }

  test("multiQuery over both hubs at once (frontier join)") {
    import spark.implicits._
    val frontier = Seq(VId, UId).toDF("vid")
    val perHub = VertexCentricQuery(fixture).onFrontier(frontier)
      .labels("friend").direction(Direction.OUT).edgeCount()
      .collect().map(r => r.getAs[Long]("vid") -> r.getAs[Long]("count")).toMap
    val expPerHub = (1 to N).count(_ % 5 == 2)
    assert(perHub === Map(VId -> expPerHub.toLong, UId -> expPerHub.toLong))
  }

  test("limit caps counts (reference: limit applies to edgeCount too)") {
    val cnt = q.labels("connect").direction(Direction.OUT)
      .orderBy("time").limit(7).edgeCount().collect().head.getAs[Long]("count")
    assert(cnt === 7)
  }
}
