package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Geo search: haversine sanity, box containment, and the guards. */
class GeoSpec extends SparkSpec {

  test("haversine matches known distances") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.0, 0.0, 0.0, 1.0),   // 1° of longitude on the equator
      (2L, 0.0, 0.0, 1.0, 0.0),   // 1° of latitude
      (3L, 0.0, 0.0, 0.0, 180.0), // antipodal on the equator: πR
      (4L, 12.3, 45.6, 12.3, 45.6)).toDF("id", "a", "b", "c", "d")
    val out = df.select(col("id"),
      Geo.haversineKm(col("a"), col("b"), col("c"), col("d")).as("km"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 111.195) < 0.01)
    assert(math.abs(out(2L) - 111.195) < 0.01)
    assert(math.abs(out(3L) - math.Pi * Geo.EarthRadiusKm) < 0.01)
    assert(out(4L) == 0.0)
  }

  test("bounding box contains the radius circle and guards the edges") {
    val (latLo, latHi, lonLo, lonHi) = Geo.boundingBox(12.3, 45.6, 1500.0)
    assert(latLo < 12.3 && latHi > 12.3 && lonLo < 45.6 && lonHi > 45.6)
    // a point ON the circle due east must fall inside the box
    val eastLonDeg = 45.6 + 1500.0 /
      (111.320 * math.cos(math.toRadians(12.3)))
    assert(eastLonDeg < lonHi, "parallel-degree shrink must be covered")
    intercept[IllegalArgumentException](Geo.boundingBox(86.0, 0.0, 1000.0))
    intercept[IllegalArgumentException](Geo.boundingBox(48.2, -170.0, 3000.0))
  }

  test("withinRadius keeps exactly the in-circle points") {
    import spark.implicits._
    val pts = Seq(
      (1L, 12.3, 45.6),   // the center
      (2L, 13.0, 46.0),   // ~90 km away
      (3L, 25.0, 45.6),   // ~1400 km north: inside 1500
      (4L, 12.3, 61.0),   // ~1670 km east: outside, but inside the box? no
      (5L, -70.0, 45.6)). // far outside the box entirely
      toDF("id", "lat", "lon")
    val got = Geo.withinRadius(pts, 12.3, 45.6, 1500.0, "id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L), got.toString)
  }
}
