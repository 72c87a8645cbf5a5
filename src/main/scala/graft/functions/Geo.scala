package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column helpers (SURVEY.md §2.8 geo family; reference
  * README.md:84-86's lat/lon "Space object" capability).
  *
  * All pure column expressions — codegen'd, no UDFs. `haversineKm` uses
  * trig built-ins whose libm rounding differs across engines by ULPs,
  * so it is ScalaTest-covered (tolerance), NOT oracle-hashed; the
  * oracle-checkable distance is `degreeDistSq` (pure arithmetic).
  */
object Geo {

  /** Great-circle distance in km (mean Earth radius 6371.0088). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    // clamp: rounding can push a to 1+2ulp for near-antipodal points,
    // where sqrt(a) > 1 would make asin return NaN
    lit(2 * 6371.0088) * asin(sqrt(least(a, lit(1.0))))
  }

  /** Squared equirectangular distance in degree² — deterministic pure
    * arithmetic, the oracle-safe proximity measure (monotone in true
    * distance over small extents). */
  def degreeDistSq(lat: Column, lon: Column, clat: Column, clon: Column): Column =
    (lat - clat) * (lat - clat) + (lon - clon) * (lon - clon)

  /** Bounding-box containment predicate (half-open on the max edges). */
  def inBBox(lat: Column, lon: Column,
             latMin: Double, lonMin: Double,
             latMax: Double, lonMax: Double): Column =
    lat >= latMin && lat < latMax && lon >= lonMin && lon < lonMax
}
