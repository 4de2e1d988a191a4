package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.P

/** Multi-variable match() and n-ary choose().option() — the two Gremlin
  * generality gaps VERDICT r5 flagged (TinkerPop MatchStep joins patterns on
  * EVERY shared variable; ChooseStep is a general value switch). */
class MatchChooseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"
  lazy val g = graft.data.TpchGraph.load(spark, dir)

  test("matchOnAll joins on the full alias tuple; single-alias matchOn over-matches") {
    // p1: a --placed--> b with totalprice > 300k ; p2: BUILDING a --placed--> b < 400k
    def p1 = g.traversal.V().hasLabel("customer").as("a")
      .out("placed").has("totalprice", P.gt(300000.0)).as("b")
    def p2 = g.traversal.V().hasLabel("customer").has("mktsegment", "BUILDING").as("a")
      .out("placed").has("totalprice", P.lt(400000.0)).as("b")
    val multi = p1.matchOnAll(p2, Seq("a", "b")).toDF
      .select(col("_as_a_id"), col("_as_b_id")).distinct().count()
    val single = p1.matchOn(p2, "a").toDF
      .select(col("_as_a_id"), col("_as_b_id")).distinct().count()
    // ground truth: (customer, order) pairs satisfying BOTH patterns' conditions
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val expected = cust.join(ord, col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("o_totalprice") > 300000.0 && col("o_totalprice") < 400000.0)
      .select(col("c_custkey"), col("o_orderkey")).distinct().count()
    assert(multi == expected)
    // the single-alias form accepts (a, b>400k) rows whenever customer a has
    // ANY qualifying order in p2 — a strict superset on this data
    assert(single > multi,
      s"single-alias should over-match: single=$single multi=$multi")
  }

  test("matchAllShared joins each pattern on exactly the aliases it shares") {
    // p1 binds (a, b); p2 binds (a, b); p3 binds only a — heterogeneous sets
    def p1 = g.traversal.V().hasLabel("customer").as("a")
      .out("placed").has("totalprice", P.gt(300000.0)).as("b")
    def p2 = g.traversal.V().hasLabel("customer").has("mktsegment", "BUILDING").as("a")
      .out("placed").has("totalprice", P.lt(400000.0)).as("b")
    def p3 = g.traversal.V().hasLabel("customer").has("acctbal", P.gt(0.0)).as("a")
    val got = g.traversal.V().matchAllShared(p1, p2, p3).toDF
      .select(col("_as_a_id"), col("_as_b_id")).distinct().count()
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val expected = cust.join(ord, col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 0.0 &&
        col("o_totalprice") > 300000.0 && col("o_totalprice") < 400000.0)
      .select(col("c_custkey"), col("o_orderkey")).distinct().count()
    assert(got == expected)
    // a disconnected pattern (no shared alias) must be rejected, not crossed
    val disconnected = g.traversal.V().hasLabel("supplier").as("z")
    assertThrows[IllegalArgumentException] {
      g.traversal.V().matchAllShared(p1, disconnected).toDF.count()
    }
  }

  test("chooseOption routes by selector value; none branch catches the rest") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val nBuildingOrders = spark.read.parquet(s"$dir/orders.parquet")
      .join(cust.filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey")).count()
    val nMachinery = cust.filter(col("c_mktsegment") === "MACHINERY").count()
    val nOther = cust.filter(!col("c_mktsegment").isin("BUILDING", "MACHINERY")).count()
    val t = g.traversal.V().hasLabel("customer")
      .chooseOption(col("mktsegment"),
        Seq[(Any, graft.traverse.Traversal => graft.traverse.Traversal)](
          "BUILDING" -> (_.out("placed")),
          "MACHINERY" -> (t => t)),
        none = Some(_.out("in_nation"))).toDF
    assert(t.count() == nBuildingOrders + nMachinery + nOther)
    assert(t.filter(col("label") === "order").count() == nBuildingOrders)
    assert(t.filter(col("label") === "customer").count() == nMachinery)
    assert(t.filter(col("label") === "nation").count() == nOther)
    // without a none branch, non-matching traversers are DROPPED (Pick.none)
    val dropped = g.traversal.V().hasLabel("customer")
      .chooseOption(col("mktsegment"),
        Seq[(Any, graft.traverse.Traversal => graft.traverse.Traversal)](
          "MACHINERY" -> (t => t))).toDF
    assert(dropped.count() == nMachinery)
  }

  test("kCoreConverged surfaces non-convergence instead of a silent superset") {
    val (_, converged) = graft.olap.Analytics.kCoreConverged(g, k = 2, maxRounds = 0)
    assert(!converged)
    val (survivors, done) = graft.olap.Analytics.kCoreConverged(g, k = 2, maxRounds = 50)
    assert(done)
    assert(survivors.count() > 0)
  }
}
