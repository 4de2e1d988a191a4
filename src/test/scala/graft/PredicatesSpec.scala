package graft

import graft.expr.{Cmp, Contain, Text}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Parity tests for the predicate algebra against an in-test reference
  * evaluator implementing the exact semantics of tc/core/attribute/Cmp.java,
  * Text.java (tokenize :165-176), Contain.java. */
class PredicatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Reference tokenizer: maximal letter-or-digit runs, length > 1 kept. */
  private def refTokenize(s: String): List[String] = {
    val tokens = scala.collection.mutable.ListBuffer[String]()
    var prev = 0
    for (p <- 0 until s.length) {
      if (!s.charAt(p).isLetterOrDigit) {
        if (p > prev + 1) tokens += s.substring(prev, p)
        prev = p + 1
      }
    }
    if (prev + 1 < s.length) tokens += s.substring(prev)
    tokens.toList
  }

  private def refContains(value: String, terms: String): Boolean = {
    val tokens = refTokenize(value.toLowerCase).toSet
    val t = terms.trim
    val condTokens = refTokenize(t.toLowerCase)
    if (t.nonEmpty && condTokens.isEmpty) false
    else condTokens.forall(tokens.contains)
  }

  private def evalText(values: Seq[String], colFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Boolean] = {
    values.toDF("v").select(coalesce(colFn(col("v")), lit(false))).as[Boolean].collect().toSeq
  }

  test("textContains matches reference semantics") {
    val values = List("", "a", "ab", "spark fast", "Hello World",
      "x-y_z", "12ab 3 cd45", "Ümlaut Café", "one,two;three", "ab cd ab")
    for (term <- Seq("ab", "spark", "hello world", "one two", "a", "", "  ", "xy")) {
      val got = evalText(values, c => Text.contains(c, term))
      val exp = values.map(v => refContains(v, term))
      assert(got === exp, s"term='$term' values=$values")
    }
  }

  test("textContainsPrefix matches reference semantics") {
    val values = List("", "ab", "spark fast", "Hello World", "x-y_z", "12ab 3 cd45")
    for (prefix <- Seq("sp", "he", "12", "xy", "ab")) {
      val got = evalText(values, c => Text.containsPrefix(c, prefix))
      val exp = values.map(v => refTokenize(v.toLowerCase).exists(_.startsWith(prefix.toLowerCase.trim)))
      assert(got === exp, s"prefix='$prefix'")
    }
  }

  test("textContainsRegex matches whole-token regex") {
    val values = List("gizmo parts", "gaze", "fuzzy", "")
    val got = evalText(values, c => Text.containsRegex(c, "g.z.*"))
    assert(got === List(true, true, false, false))
  }

  test("textPrefix / textRegex are whole-string and case-sensitive") {
    val values = List("Hello World", "hello", "help")
    assert(evalText(values, c => Text.prefix(c, "Hel")) === List(true, false, false))
    assert(evalText(values, c => Text.regex(c, "hel.*")) === List(false, true, true))
  }

  test("Cmp null semantics (Cmp.java:16-202)") {
    val df = Seq[(java.lang.Integer, String)]((1, "a"), (null, "b"), (3, "c")).toDF("x", "tag")
    // EQUAL(value, null) ⇔ value IS NULL
    assert(df.filter(Cmp.eq(col("x"), null)).select("tag").as[String].collect().toSet === Set("b"))
    // NOT_EQUAL(value, null) ⇔ value IS NOT NULL
    assert(df.filter(Cmp.neq(col("x"), null)).select("tag").as[String].collect().toSet === Set("a", "c"))
    // NOT_EQUAL(null, 1) = true (reference: !condition.equals(value))
    assert(df.filter(Cmp.neq(col("x"), 1)).select("tag").as[String].collect().toSet === Set("b", "c"))
    // orderings are false on null
    assert(df.filter(Cmp.lt(col("x"), 5)).select("tag").as[String].collect().toSet === Set("a", "c"))
    assert(df.filter(Cmp.gte(col("x"), 1)).select("tag").as[String].collect().toSet === Set("a", "c"))
  }

  test("Contain.IN / NOT_IN null semantics") {
    val df = Seq[(java.lang.Integer, String)]((1, "a"), (null, "b"), (3, "c")).toDF("x", "tag")
    assert(df.filter(Contain.in(col("x"), Seq(1, 2))).select("tag").as[String].collect().toSet === Set("a"))
    // NOT_IN(null, col) = true — collection without null does not contain null
    assert(df.filter(Contain.notIn(col("x"), Seq(1, 2))).select("tag").as[String].collect().toSet === Set("b", "c"))
    assert(df.filter(Contain.in(col("x"), Nil)).count() === 0)
  }

  test("property-based: tokenizer parity on random strings") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', '-', '_', '.', '!')))
      .map(_.mkString)
    val samples = (0 until 200).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    // batch: one Spark job for all samples
    val got = samples.toDF("v").select(col("v"), Text.tokens(col("v")))
      .as[(String, Seq[String])].collect().toMap
    samples.foreach { s =>
      assert(got(s).toList === refTokenize(s.toLowerCase), s"input='$s'")
    }
  }
}
