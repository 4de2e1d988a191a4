package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.data.TimestampedLog

/** Unit semantics of the last-write-wins mutation-log resolver that the
  * q_tp_eventual / q_tp_consistency conformance probes build on — in
  * particular the TIE rules the probes' fixtures never hit: a deletion wins
  * a timestamp tie (the Cassandra convention the reference inherits on
  * eventually-consistent stores), both at cell and at element granularity. */
class TimestampedLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val noEdges = Seq.empty[(Long, Option[Long], Option[Long],
    Option[String], Long, String, Option[Seq[String]])]
    .toDF("id", "src", "dst", "label", "_ts", "_op", "_dels")

  test("cell tie: deletion at the same timestamp beats the put") {
    val vlog = Seq(
      (1L, Option("v"), 100L, "put", None: Option[Seq[String]], Option("a")),
      // same element, same ts: one mutation deletes the key, one writes it
      (1L, None, 200L, "put", Option(Seq("name")), None),
      (1L, None, 200L, "put", None, Option("b"))
    ).toDF("id", "label", "_ts", "_op", "_dels", "name")
    val g = TimestampedLog.resolve(vlog, noEdges)
    val row = g.vertices.select("name").collect()
    assert(row.length == 1 && row(0).isNullAt(0)) // delete wins the tie
  }

  test("element tie: tombstone at the same timestamp kills the element") {
    val vlog = Seq(
      (1L, Option("v"), 300L, "put", None: Option[Seq[String]], Option("a")),
      (1L, None, 300L, "del", None, None),
      (2L, Option("v"), 300L, "put", None, Option("b"))
    ).toDF("id", "label", "_ts", "_op", "_dels", "name")
    val g = TimestampedLog.resolve(vlog, noEdges)
    assert(g.vertices.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("element re-put strictly after the tombstone resurrects WITHOUT old cells") {
    val vlog = Seq(
      (1L, Option("v"), 100L, "put", None: Option[Seq[String]], Option("old")),
      (1L, None, 200L, "del", None, None),
      (1L, Option("v"), 300L, "put", None, None) // re-put, no name written
    ).toDF("id", "label", "_ts", "_op", "_dels", "name")
    val g = TimestampedLog.resolve(vlog, noEdges)
    val rows = g.vertices.select("id", "name").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L && rows(0).isNullAt(1))
  }

  test("edges referencing a dead endpoint are dropped by resolution") {
    val vlog = Seq(
      (1L, Option("v"), 100L, "put", None: Option[Seq[String]]),
      (2L, Option("v"), 100L, "put", None),
      (2L, None, 200L, "del", None)
    ).toDF("id", "label", "_ts", "_op", "_dels")
    val elog = Seq(
      (10L, Option(1L), Option(2L), Option("knows"), 100L, "put", None: Option[Seq[String]]),
      (11L, Option(1L), Option(1L), Option("self"), 100L, "put", None)
    ).toDF("id", "src", "dst", "label", "_ts", "_op", "_dels")
    val g = TimestampedLog.resolve(vlog, elog)
    assert(g.edges.select("id").as[Long].collect().toSeq == Seq(11L))
  }

  test("cell-only write after the tombstone does NOT resurrect the element " +
      "(testDeleteVertexThenModifyProperty, TitanIndexTest:1487-1511)") {
    // vertexDeleter commits @200; propDeleter commits @201 writing only the
    // property cell — the vertex must stay dead and has(foo) stay empty
    val vlog = Seq(
      (1L, Option("v"), 100L, "put", None: Option[Seq[String]], Option("bar")),
      (1L, None, 200L, "del", None, None),
      (1L, None, 201L, "put", None, Option("changed")) // cell-only: no label
    ).toDF("id", "label", "_ts", "_op", "_dels", "foo")
    val g = TimestampedLog.resolve(vlog, noEdges)
    assert(g.vertices.count() == 0)
    assert(g.V().has("foo").vertices().count() == 0)
  }

  test("collapseNewest keeps exactly the newest row per constraint key") {
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L),
      (4L, "b", 100L)
    ).toDF("id", "k", "_ts")
    val got = TimestampedLog.collapseNewest(df, Seq("k"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 4L))
  }
}
