package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every SparkEntry query runs and yields rows at sf0.001, and every
  * query key has (or deliberately omits) an oracle. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("entry yields rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs with rows > 0") {
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.count() > 0)
    }
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }
}
