package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's predicate algebra (`TitanPredicate`) re-expressed as Catalyst
  * `Column` combinators. Everything here compiles to built-in (codegen'd)
  * expressions — no UDFs — so pushdown/boolean-simplification stay free.
  *
  * Null semantics follow tc/core/attribute/Cmp.java:16-202 exactly:
  *   - EQUAL(value, null)      ⇔ value IS NULL            (null-safe `<=>`)
  *   - NOT_EQUAL(value, null)  ⇔ value IS NOT NULL
  *   - NOT_EQUAL(null, c)      = true for non-null c      (`NOT (v <=> c)`)
  *   - orderings on null value = false                    (coalesce(..., false))
  * and tc/core/attribute/Contain.java:21-48:
  *   - IN(null, col)    = col contains null  (we require non-null literals ⇒ false)
  *   - NOT_IN(null, col) = true
  */
object Cmp {
  def eq(c: Column, v: Any): Column =
    if (v == null) c.isNull else c <=> lit(v)
  def neq(c: Column, v: Any): Column =
    if (v == null) c.isNotNull else !(c <=> lit(v))
  // Orderings are left as bare comparisons: in filter context NULL drops the
  // row, which IS the reference's "false on null" — and unlike a
  // coalesce(...,false) wrapper, a bare comparison stays a pushable source
  // filter (PushedFilters reaches the parquet scan).
  def lt(c: Column, v: Any): Column = c < lit(v)
  def lte(c: Column, v: Any): Column = c <= lit(v)
  def gt(c: Column, v: Any): Column = c > lit(v)
  def gte(c: Column, v: Any): Column = c >= lit(v)
}

object Contain {
  /** IN: bare isin stays pushable (In source filter); NULL value drops the
    * row — the reference's contains(null)=false for null-free conditions. */
  def in(c: Column, vs: Seq[Any]): Column =
    if (vs.isEmpty) lit(false) else c.isin(vs: _*)
  /** NOT_IN(null, col) must be TRUE (Contain.java:38-48) — here the coalesce
    * is semantically required, not just cosmetic. */
  def notIn(c: Column, vs: Seq[Any]): Column =
    if (vs.isEmpty) lit(true) else !coalesce(c.isin(vs: _*), lit(false))
}

/** A graph-query predicate: a column transformer, named for plan introspection.
  * Mirrors TinkerPop's `P` / TitanPredicate pairing (predicate + condition value).
  * Being a plain function over `Column`, arbitrary boolean structure (And/Or/Not,
  * QNF — QueryUtil.constraints2QNF:162-226 in the reference) is delegated to
  * Catalyst's BooleanSimplification. */
final case class P(name: String, apply: Column => Column,
    op: String = "", operand: Any = null) {
  def negate: P = P(s"not($name)", c => !apply(c))
}

object P {
  def eq(v: Any): P = P(s"=$v", Cmp.eq(_, v))
  def neq(v: Any): P = P(s"<>$v", Cmp.neq(_, v))
  def lt(v: Any): P = P(s"<$v", Cmp.lt(_, v))
  def lte(v: Any): P = P(s"<=$v", Cmp.lte(_, v))
  def gt(v: Any): P = P(s">$v", Cmp.gt(_, v))
  def gte(v: Any): P = P(s">=$v", Cmp.gte(_, v))
  def between(lo: Any, hi: Any): P = P(s"[$lo,$hi)", c => Cmp.gte(c, lo) && Cmp.lt(c, hi))
  def within(vs: Any*): P = P(s"within", Contain.in(_, vs))
  def without(vs: Any*): P = P(s"without", Contain.notIn(_, vs))
  // op/operand expose the predicate's identity to the query planner (mixed
  // text-index selection needs the terms, GraphCentricQueryBuilder parity)
  def textContains(terms: String): P =
    P(s"textContains($terms)", Text.contains(_, terms), "textContains", terms)
  def textContainsPrefix(p: String): P = P(s"textContainsPrefix($p)", Text.containsPrefix(_, p))
  def textContainsRegex(r: String): P = P(s"textContainsRegex($r)", Text.containsRegex(_, r))
  def textPrefix(p: String): P = P(s"textPrefix($p)", Text.prefix(_, p))
  def textRegex(r: String): P = P(s"textRegex($r)", Text.regex(_, r))
  def and(ps: P*): P = P("and", c => ps.map(_.apply(c)).reduce(_ && _))
  def or(ps: P*): P = P("or", c => ps.map(_.apply(c)).reduce(_ || _))
}

/** Tokenized-text predicates — exact semantics of tc/core/attribute/Text.java:27-176.
  *
  * Tokenization (Text.java:165-176): maximal runs of letter-or-digit characters;
  * tokens of length < 2 are dropped (MIN_TOKEN_LENGTH=1, kept when length > 1);
  * CONTAINS* variants lowercase first. Implemented with `split` + higher-order
  * array functions — stays inside whole-stage codegen.
  */
object Text {
  /** Lowercased token array of a text column. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^\\p{L}\\p{N}]+"), t => length(t) > 1)

  /** Case-preserving token array (for PREFIX/REGEX-style callers and indexQuery scoring). */
  def tokensCased(c: Column): Column =
    filter(split(c, "[^\\p{L}\\p{N}]+"), t => length(t) > 1)

  private def tokenizeCondition(s: String): Seq[String] =
    s.split("[^\\p{L}\\p{N}]+").filter(_.length > 1).toSeq

  /** Text.CONTAINS — every term token occurs as a token of the value (case-insensitive).
    * A non-blank condition with no valid tokens matches nothing (Text.java:41). */
  def contains(c: Column, terms: String): Column = {
    val t = terms.trim
    val condTokens = tokenizeCondition(t.toLowerCase)
    if (t.nonEmpty && condTokens.isEmpty) lit(false)
    else if (condTokens.isEmpty) c.isNotNull
    else condTokens.map(term => array_contains(tokens(c), term)).reduce(_ && _)
  }

  /** Text.CONTAINS_PREFIX — some token starts with the prefix (case-insensitive). */
  def containsPrefix(c: Column, prefix: String): Column = {
    val p = prefix.toLowerCase.trim
    exists(tokens(c), t => t.startsWith(p))
  }

  /** Text.CONTAINS_REGEX — some token matches the regex in full (case-insensitive
    * tokens; `String.matches` is whole-string ⇒ anchor for rlike). */
  def containsRegex(c: Column, regexStr: String): Column =
    exists(tokens(c), t => t.rlike(anchored(regexStr)))

  /** Text.PREFIX — whole string starts with prefix (case-sensitive, trimmed
    * condition). Bare startsWith ⇒ pushable StringStartsWith source filter. */
  def prefix(c: Column, p: String): Column = c.startsWith(p.trim)

  /** Text.REGEX — whole string matches (case-sensitive). */
  def regex(c: Column, r: String): Column = c.rlike(anchored(r))

  private def anchored(r: String): String = "^(?:" + r + ")$"
}
