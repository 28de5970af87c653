package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GEO-DISTANCE SEARCH (the Elasticsearch geo_distance / PostGIS
  * ST_DWithin query class): radius and k-nearest search over
  * (lat, lon) points as a BOUNDING-BOX prefilter + exact haversine
  * verify. The box predicate is two plain range comparisons, so it
  * pushes into the parquet scan (PushedFilters → row-group zone maps
  * skip everything outside the box) — the same data-skipping shape the
  * zonemap row proves; the transcendental haversine only ever runs on
  * the boxed candidates. At 100 TB the table would be written
  * range-clustered on (lat, lon) (the ZOrder layout), making the box a
  * file-level prune; the operator is unchanged.
  *
  * Determinism: distances are irrational (asin/sqrt) — rounded to 3
  * decimals, and the RADIUS filter and ORDER both use the rounded value
  * so engines flip identically. Box bounds are computed once,
  * driver-side, rounded OUTWARD to 4 decimals, and the same literals
  * feed both the plan and the SQL oracle.
  */
object Geo {

  val EarthRadiusKm = 6371.0

  /** Haversine great-circle distance in km. Written sin·sin (not pow) —
    * the SQL oracles mirror the exact same operation tree. */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val dphi = radians(lat2 - lat1) / 2
    val dlmb = radians(lon2 - lon1) / 2
    val a = sin(dphi) * sin(dphi) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dlmb) * sin(dlmb)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Bounding box around (qlat, qlon) that CONTAINS the radius circle:
    * Δlat from the meridian degree (110.574 km), Δlon from the parallel
    * degree at the box's worst (most polar) latitude — an over-
    * approximation by construction, then rounded outward to 4 dp so the
    * literal is reproducible in oracle SQL. Returns
    * (latLo, latHi, lonLo, lonHi); callers must keep |lat|+Δ under the
    * pole (guarded). */
  def boundingBox(qlat: Double, qlon: Double,
                  radiusKm: Double): (Double, Double, Double, Double) = {
    val dLat = radiusKm / 110.574
    val maxAbsLat = math.abs(qlat) + dLat
    require(maxAbsLat < 89.0, s"box reaches the pole (|lat| = $maxAbsLat); " +
      "polar caps need a longitude-complete scan, not a box")
    val dLon = radiusKm / (111.320 * math.cos(math.toRadians(maxAbsLat)))
    def out(x: Double, up: Boolean): Double =
      (if (up) math.ceil(x * 10000) else math.floor(x * 10000)) / 10000
    val box = (out(qlat - dLat, up = false), out(qlat + dLat, up = true),
      out(qlon - dLon, up = false), out(qlon + dLon, up = true))
    require(box._3 >= -180.0 && box._4 <= 180.0,
      s"box wraps the antimeridian (lon ${box._3}..${box._4}); " +
        "split the search into two boxes and union the candidates")
    box
  }

  /** All points within `radiusKm` of (qlat, qlon): box prefilter (scan-
    * pushable) then rounded-haversine verify. `points` carries idCol,
    * "lat", "lon". */
  def withinRadius(points: DataFrame, qlat: Double, qlon: Double,
                   radiusKm: Double, idCol: String): DataFrame = {
    val (latLo, latHi, lonLo, lonHi) = boundingBox(qlat, qlon, radiusKm)
    points
      .filter(col("lat") >= latLo && col("lat") <= latHi &&
        col("lon") >= lonLo && col("lon") <= lonHi)
      .withColumn("dist_km",
        round(haversineKm(col("lat"), col("lon"), lit(qlat), lit(qlon)), 3))
      .filter(col("dist_km") <= radiusKm)
      .select(col(idCol), col("lat"), col("lon"), col("dist_km"))
      .orderBy(idCol)
  }

  /** k nearest points to (qlat, qlon) among those within `searchKm` —
    * the bounded-search form every geo index serves (the caller picks
    * searchKm from expected density; an empty shortfall means widen, the
    * expanding-ring retry a serving layer does driver-side). Ordered by
    * (rounded distance, id) — a total order both engines replay. */
  def nearestK(points: DataFrame, qlat: Double, qlon: Double,
               searchKm: Double, k: Int, idCol: String): DataFrame = {
    val (latLo, latHi, lonLo, lonHi) = boundingBox(qlat, qlon, searchKm)
    points
      .filter(col("lat") >= latLo && col("lat") <= latHi &&
        col("lon") >= lonLo && col("lon") <= lonHi)
      .withColumn("dist_km",
        round(haversineKm(col("lat"), col("lon"), lit(qlat), lit(qlon)), 3))
      .select(col(idCol), col("lat"), col("lon"), col("dist_km"))
      .orderBy(col("dist_km"), col(idCol))
      .limit(k)
  }
}
