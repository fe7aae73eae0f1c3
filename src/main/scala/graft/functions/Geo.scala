package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial distance/containment as pure Column expressions — shared by
  * the `$geoNear` pipeline stage and the `$geoWithin`/`$near`/`$nearSphere`
  * query operators (the reference passes all of these through to the
  * server, /root/reference/db/wrapper.go:88-94,452-481).
  *
  * Point columns are 2-element `[lon, lat]` arrays (for GeoJSON Point
  * struct columns, address the array with a dotted `field.coordinates`
  * path). Query geometry is literal, so every test below folds into
  * whole-stage codegen: no join, no UDF, scan-fused at any scale.
  */
object Geo {

  /** IUGG mean earth radius (meters) — the sphere every spherical
    * distance here is measured on. */
  val EarthRadiusMeters = 6371008.8

  def lon(point: Column): Column = point.getItem(0).cast("double")
  def lat(point: Column): Column = point.getItem(1).cast("double")

  /** Great-circle (haversine) distance in meters from a literal point. */
  def haversineMeters(lonC: Column, latC: Column,
      nearLon: Double, nearLat: Double): Column = {
    val half = lit(0.5)
    val a = pow(sin(radians(latC - nearLat) * half), 2) +
      cos(radians(lit(nearLat))) * cos(radians(latC)) *
        pow(sin(radians(lonC - nearLon) * half), 2)
    lit(2.0 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** Planar Euclidean distance from a literal point (legacy 2d). */
  def planarDistance(xC: Column, yC: Column, x: Double, y: Double): Column =
    sqrt(pow(xC - x, 2) + pow(yC - y, 2))

  /** Planar point-in-polygon (even-odd ray casting). The polygon is
    * literal, so the crossing tests unroll to a fixed expression tree at
    * compile time. An unclosed ring is closed implicitly (Mongo allows
    * both for `$polygon`). */
  def pointInPolygon(xC: Column, yC: Column,
      ring: Seq[(Double, Double)]): Column = {
    require(ring.size >= 3, s"polygon needs >= 3 vertices: ${ring.size}")
    val closed = if (ring.head == ring.last) ring.dropRight(1) else ring
    val crossings = closed.indices.map { i =>
      val (xi, yi) = closed(i)
      val (xj, yj) = closed((i + 1) % closed.size)
      // edge crosses the horizontal ray from (x, y) to +inf
      if (yi == yj) lit(0) // horizontal edge never crosses the open ray
      else when(
        (lit(yi) > yC) =!= (lit(yj) > yC),
        when(xC < (yC - yi) * ((xj - xi) / (yj - yi)) + xi, 1).otherwise(0)
      ).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }
}
