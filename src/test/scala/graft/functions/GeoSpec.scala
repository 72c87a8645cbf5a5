package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpecBase

class GeoSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm($"a", $"b", $"c", $"d")).head().getDouble(0)

  test("haversine: one degree of latitude is ~111.19 km anywhere") {
    assert(math.abs(hav(0, 0, 1, 0) - 111.19) < 0.1)
    assert(math.abs(hav(50, 7, 51, 7) - 111.19) < 0.1)
  }

  test("haversine: longitude degrees shrink with latitude; symmetric; zero at identity") {
    val equator = hav(0, 0, 0, 1)
    val mid = hav(60, 0, 60, 1)
    assert(math.abs(equator - 111.19) < 0.1)
    assert(math.abs(mid - equator / 2) < 0.3) // cos(60 deg) = 0.5
    assert(hav(12, 34, 12, 34) == 0.0)
    assert(math.abs(hav(10, 20, 30, 40) - hav(30, 40, 10, 20)) < 1e-9)
  }

  test("bbox predicate is half-open on max edges") {
    val rows = Seq((0.0, 0.0), (59.999, 119.999), (60.0, 0.0), (0.0, 120.0))
      .toDF("lat", "lon")
      .filter(Geo.inBBox($"lat", $"lon", -60, -120, 60, 120))
    assert(rows.count() == 2)
  }
}
