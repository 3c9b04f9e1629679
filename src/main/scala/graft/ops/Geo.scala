package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftColumns

/** Even-odd ray-casting point-in-polygon test. Kept as a standalone static
  * method so the interpreted eval, the generated code, and the DuckDB
  * oracle all execute the identical float expression (same operand order).
  */
object GeoMath {
  /** poly = flat (x0, y0, x1, y1, ...); closed ring expected but the wrap
    * edge is harmless either way (degenerate edge never crosses).
    */
  def rayCast(x: Double, y: Double, poly: Array[Double]): Boolean = {
    var inside = false
    val n = poly.length / 2
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = poly(2 * i); val yi = poly(2 * i + 1)
      val xj = poly(2 * j); val yj = poly(2 * j + 1)
      if (((yi > y) != (yj > y)) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    inside
  }
}

/** Column API over the native PointInPolygon expression
  * (org.apache.spark.sql.graft.PointInPolygon).
  */
object Geo {
  def point_in_polygon(lon: Column, lat: Column, poly: Array[Double]): Column =
    GraftColumns.pointInPolygon(lon, lat, poly)

  def inTssNorthbound(lon: Column, lat: Column): Column =
    point_in_polygon(lon, lat, TssZones.Northbound)

  def inTssSouthbound(lon: Column, lat: Column): Column =
    point_in_polygon(lon, lat, TssZones.Southbound)
}
