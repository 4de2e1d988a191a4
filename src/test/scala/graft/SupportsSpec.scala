package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Provider capability matrix — a line-by-line port of
  * IndexProviderTest.testCommonSupport (titan-test diskstorage/indexing/
  * IndexProviderTest.java:415-444): the supports() contract both reference
  * providers satisfy, exposed so management can reject index builds the
  * backend cannot serve. */
class SupportsSpec extends AnyFunSuite {
  import graft.core.{Cardinality, Mapping}
  val I = graft.index.Indexes
  val geo = graft.expr.Geo.shapeType

  test("type + mapping support matrix (:417-432)") {
    assert(I.supports(StringType))
    assert(I.supports(StringType, Mapping.TEXT))
    assert(I.supports(StringType, Mapping.STRING))
    assert(I.supports(DoubleType))
    assert(!I.supports(DoubleType, Mapping.TEXT),
      "TEXT mapping applies to strings only")
    assert(I.supports(LongType))
    assert(I.supports(LongType, Mapping.DEFAULT))
    assert(I.supports(IntegerType))
    assert(I.supports(ShortType))
    assert(I.supports(ByteType))
    assert(I.supports(FloatType))
    assert(I.supports(geo))
    assert(!I.supports(BinaryType), "arbitrary Object types are not indexable")
    assert(!I.supports(CalendarIntervalType))
  }

  test("predicate support matrix (:434-443)") {
    assert(I.supportsPredicate(DoubleType, "eq"))
    assert(I.supportsPredicate(DoubleType, "gte"))
    assert(I.supportsPredicate(DoubleType, "lt"))
    assert(I.supportsPredicate(DoubleType, "lt", Mapping.DEFAULT))
    assert(!I.supportsPredicate(DoubleType, "lt", Mapping.TEXT),
      "invalid mapping rejects every predicate")
    assert(I.supportsPredicate(geo, "geoWithin"))
    assert(I.supportsPredicate(geo, "geoIntersect"))
    assert(!I.supportsPredicate(DoubleType, "geoIntersect"))
    assert(!I.supportsPredicate(LongType, "textContains"))
    assert(!I.supportsPredicate(geo, "geoDisjoint"),
      "DISJOINT is not index-servable (Geo.java:44-67 evaluates in memory)")
  }

  test("text-mapping predicate split (storeTest :227-253)") {
    // TEXT mapping: tokenized family only
    assert(I.supportsPredicate(StringType, "textContains", Mapping.TEXT))
    assert(I.supportsPredicate(StringType, "textContainsPrefix", Mapping.TEXT))
    assert(I.supportsPredicate(StringType, "textContainsRegex", Mapping.TEXT))
    assert(!I.supportsPredicate(StringType, "textPrefix", Mapping.TEXT))
    assert(!I.supportsPredicate(StringType, "textRegex", Mapping.TEXT))
    assert(!I.supportsPredicate(StringType, "eq", Mapping.TEXT))
    // STRING mapping: exact family only
    assert(I.supportsPredicate(StringType, "eq", Mapping.STRING))
    assert(I.supportsPredicate(StringType, "neq", Mapping.STRING))
    assert(I.supportsPredicate(StringType, "textPrefix", Mapping.STRING))
    assert(I.supportsPredicate(StringType, "textRegex", Mapping.STRING))
    assert(!I.supportsPredicate(StringType, "textContains", Mapping.STRING))
    // TEXTSTRING: both families through the one dual index
    assert(I.supportsPredicate(StringType, "textContains", Mapping.TEXTSTRING))
    assert(I.supportsPredicate(StringType, "eq", Mapping.TEXTSTRING))
    assert(I.supportsPredicate(StringType, "textPrefix", Mapping.TEXTSTRING))
  }
}
