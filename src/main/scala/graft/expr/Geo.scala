package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Geoshape + Geo predicates — reference: tc/core/attribute/Geoshape.java:38-255,
  * tc/core/attribute/Geo.java:18-124.
  *
  * Shapes are `STRUCT<type: STRING, coords: ARRAY<DOUBLE>>`:
  *   point  → coords [lat, lon]
  *   circle → coords [lat, lon, radiusKm]
  *   box    → coords [swLat, swLon, neLat, neLon]
  *
  * The reference delegates relation math to spatial4j; we implement the point /
  * circle / box cases directly with haversine great-circle distance
  * (EARTH_MEAN_RADIUS_KM, same constant spatial4j uses). Circle↔box relations are
  * computed against the circle's bounding interval per axis — a documented
  * deterministic approximation (exact for the point/circle/circle and box/box
  * cases that the reference's own tests exercise).
  *
  * Everything compiles to built-in Catalyst expressions (no UDFs): predicates
  * stay codegen-friendly and usable in pushed-down filters.
  */
object Geo {
  val EarthRadiusKm = 6371.0087714 // DistanceUtils.EARTH_MEAN_RADIUS_KM

  val shapeType: DataType = StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("coords", ArrayType(DoubleType, containsNull = false), nullable = false)))

  // ---- constructors (Geoshape.point/circle/box) ----
  def point(lat: Double, lon: Double): Column =
    struct(lit("point").as("type"), array(lit(lat), lit(lon)).as("coords"))
  def circle(lat: Double, lon: Double, radiusKm: Double): Column =
    struct(lit("circle").as("type"), array(lit(lat), lit(lon), lit(radiusKm)).as("coords"))
  def box(swLat: Double, swLon: Double, neLat: Double, neLon: Double): Column =
    struct(lit("box").as("type"), array(lit(swLat), lit(swLon), lit(neLat), lit(neLon)).as("coords"))
  def pointCol(lat: Column, lon: Column): Column =
    struct(lit("point").as("type"), array(lat.cast("double"), lon.cast("double")).as("coords"))
  def circleCol(lat: Column, lon: Column, radiusKm: Column): Column =
    struct(lit("circle").as("type"),
      array(lat.cast("double"), lon.cast("double"), radiusKm.cast("double")).as("coords"))

  private def typ(s: Column) = s.getField("type")
  private def coord(s: Column, i: Int) = s.getField("coords").getItem(i)

  /** Haversine great-circle distance in km between two (lat,lon) pairs (degrees). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Distance between the center points of two shapes (point/circle). */
  def distanceKm(a: Column, b: Column): Column =
    haversineKm(coord(a, 0), coord(a, 1), coord(b, 0), coord(b, 1))

  private def radiusOf(s: Column): Column =
    when(typ(s) === "circle", coord(s, 2)).otherwise(lit(0.0))

  /** Per-axis interval [min,max] of a shape. For circles the lat half-width is
    * r/111.195 deg and lon half-width r/(111.195*cos(lat)) — the standard
    * bounding-box of a small circle. */
  private val KmPerDegLat = math.Pi * EarthRadiusKm / 180.0
  private def latInterval(s: Column): (Column, Column) = {
    val halfLat = radiusOf(s) / lit(KmPerDegLat)
    val lo = when(typ(s) === "box", coord(s, 0)).otherwise(coord(s, 0) - halfLat)
    val hi = when(typ(s) === "box", coord(s, 2)).otherwise(coord(s, 0) + halfLat)
    (lo, hi)
  }
  private def lonInterval(s: Column): (Column, Column) = {
    val halfLon = radiusOf(s) / (lit(KmPerDegLat) * greatest(cos(radians(coord(s, 0))), lit(1e-9)))
    val lo = when(typ(s) === "box", coord(s, 1)).otherwise(coord(s, 1) - halfLon)
    val hi = when(typ(s) === "box", coord(s, 3)).otherwise(coord(s, 1) + halfLon)
    (lo, hi)
  }

  private def bothCircular(a: Column, b: Column): Column =
    typ(a).isin("point", "circle") && typ(b).isin("point", "circle")

  /** Optional fixed-scale rounding of the great-circle distance before the
    * relation comparison. Engines differ in the last ulp of libm trig, so a
    * cross-engine-reproducible predicate (e.g. against a SQL oracle) rounds
    * the distance to `scale` decimals on both sides — at scale 3 (meters) a
    * disagreement needs a distance within ~1e-9 km of a rounding boundary. */
  private def maybeRound(c: Column, scale: Option[Int]): Column =
    scale.fold(c)(s => round(c, s))

  /** Geo.INTERSECT — non-empty intersection (Geo.java:18-41). */
  def intersects(a: Column, b: Column, roundScale: Option[Int] = None): Column = {
    val circ = maybeRound(distanceKm(a, b), roundScale) <= radiusOf(a) + radiusOf(b)
    val (aLatLo, aLatHi) = latInterval(a); val (aLonLo, aLonHi) = lonInterval(a)
    val (bLatLo, bLatHi) = latInterval(b); val (bLonLo, bLonHi) = lonInterval(b)
    val boxes = aLatLo <= bLatHi && bLatLo <= aLatHi && aLonLo <= bLonHi && bLonLo <= aLonHi
    coalesce(when(bothCircular(a, b), circ).otherwise(boxes), lit(false))
  }

  /** Geo.DISJOINT — empty intersection (Geo.java:44-67). */
  def disjoint(a: Column, b: Column, roundScale: Option[Int] = None): Column =
    coalesce(!intersects(a, b, roundScale), lit(false))

  /** Geo.WITHIN — a completely contained in b (Geo.java:70-93). */
  def within(a: Column, b: Column, roundScale: Option[Int] = None): Column = {
    val circ = maybeRound(distanceKm(a, b), roundScale) + radiusOf(a) <= radiusOf(b)
    val (aLatLo, aLatHi) = latInterval(a); val (aLonLo, aLonHi) = lonInterval(a)
    val (bLatLo, bLatHi) = latInterval(b); val (bLonLo, bLonHi) = lonInterval(b)
    val boxes = aLatLo >= bLatLo && aLatHi <= bLatHi && aLonLo >= bLonLo && aLonHi <= bLonHi
    coalesce(when(bothCircular(a, b), circ).otherwise(boxes), lit(false))
  }

  def geoWithin(shape: Column): P = P("geoWithin", c => within(c, shape))
  def geoIntersect(shape: Column): P = P("geoIntersect", c => intersects(c, shape))
  def geoDisjoint(shape: Column): P = P("geoDisjoint", c => disjoint(c, shape))
}
