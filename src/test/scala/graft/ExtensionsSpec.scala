package graft

import graft.data.{GraphOfTheGods, RelationIdentifier, TpchGraph}
import graft.functions.ArrayJaccard
import graft.plans.{GraftExtensions, JaccardLengthPrefilter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  /** A dedicated session with the rule installed. withExtensions only binds
    * for a freshly built session (getOrCreate would return the shared test
    * session), so use the supported in-session injection point. */
  lazy val extSpark: SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(JaccardLengthPrefilter)
    s
  }

  test("JaccardLengthPrefilter injects size guards into the optimized plan") {
    // parquet-backed (a LocalRelation would be eagerly folded away)
    val docs = extSpark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val probe = array(lit("key"), lit("agg"), lit("row"), lit("scan"))
    val q = docs.filter(
      ArrayJaccard(graft.pipeline.Dedup.words(col("text")), probe) >= 0.5)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("size("), s"no size guard in: $optimized")
    // semantics preserved vs the plain session
    val plain = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(ArrayJaccard(graft.pipeline.Dedup.words(col("text")), probe) >= 0.5)
    assert(q.count() === plain.count())
  }

  test("prefilter preserves semantics across thresholds") {
    import extSpark.implicits._
    val data = (1 to 50).map { i =>
      (Seq.tabulate(5 + i % 7)(j => s"w${(i + j) % 13}"),
        Seq.tabulate(4 + i % 5)(j => s"w${(i + 2 * j) % 13}"))
    }
    val df = data.toDF("l", "r")
    for (t <- Seq(0.2, 0.5, 0.8)) {
      val withExt = df.filter(ArrayJaccard(col("l"), col("r")) >= t).count()
      // same computation in the plain session (no rewrite)
      val plain = {
        import spark.implicits._
        data.toDF("l", "r").filter(ArrayJaccard(col("l"), col("r")) >= t).count()
      }
      assert(withExt === plain, s"threshold $t")
    }
  }

  test("rule is idempotent (no guard stacking across optimizer passes)") {
    import extSpark.implicits._
    val df = Seq((Seq("a"), Seq("a"))).toDF("l", "r")
    val q = df.filter(ArrayJaccard(col("l"), col("r")) >= 0.5)
    val once = JaccardLengthPrefilter(q.queryExecution.optimizedPlan)
    assert(once.toString === q.queryExecution.optimizedPlan.toString)
  }

  test("RelationIdentifier: format/parse round-trip and point lookup") {
    val rid = RelationIdentifier(10L, GraphOfTheGods.ids("hercules"), "battled",
      Some(GraphOfTheGods.ids("nemean")))
    assert(RelationIdentifier.parse(rid.toString) === rid)
    val gods = GraphOfTheGods.load(spark)
    val row = RelationIdentifier.lookup(gods, rid).collect()
    assert(row.length === 1 && row(0).getAs[Int]("time") === 1)
    // resolve an id back to its composite
    val resolved = RelationIdentifier.of(gods, 10L).get
    assert(resolved === rid)
  }
}
