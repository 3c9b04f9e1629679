package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col, lit}
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

  /** [[rayCast]] over Spark's columnar ArrayData (the dynamic-polygon
    * form [[org.apache.spark.sql.graft.PointInPolygonDyn]] evaluates —
    * a polygon that arrives as DATA from a zones dimension row rather
    * than as a plan constant). Reads elements in place, no copy; the
    * float expression is operand-for-operand identical to the static
    * form so the two can never disagree on a boundary case.
    */
  def rayCastData(x: Double, y: Double,
      poly: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    var inside = false
    val n = poly.numElements() / 2
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = poly.getDouble(2 * i); val yi = poly.getDouble(2 * i + 1)
      val xj = poly.getDouble(2 * j); val yj = poly.getDouble(2 * j + 1)
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

  /** Dynamic-polygon form: the ring is a column (array<double> flat
    * (x0,y0,…)). Foldable rings fold back to the static form + pushable
    * bbox via the PipBoundingBox rule.
    */
  def point_in_polygon(lon: Column, lat: Column, poly: Column): Column =
    GraftColumns.pointInPolygonDyn(lon, lat, poly)

  def inTssNorthbound(lon: Column, lat: Column): Column =
    point_in_polygon(lon, lat, TssZones.Northbound)

  def inTssSouthbound(lon: Column, lat: Column): Column =
    point_in_polygon(lon, lat, TssZones.Southbound)

  /** N×M zone membership matrix (SURVEY §2.3 R4's general form): every
    * (point, zone) pair where the point lies inside the zone polygon.
    * `zones` is a DIMENSION table — (zone_id long, poly array<double>
    * flat closed ring) — of the kind a VTS/curation deployment maintains
    * as reference data, replacing the two compile-time TSS constants.
    *
    * Shape at 100 TB:
    *  - the dim is collected once (tiny by definition: every polygon a
    *    deployment draws fits in KBs) and its UNION bounding box becomes
    *    plan-time literals on the point coordinates — plain comparisons
    *    that reach the parquet reader as PushedFilters, so row groups
    *    outside every zone's bbox are never read (ExtensionsSpec pins
    *    this);
    *  - the polygons then BROADCAST (broadcast nested-loop join — the
    *    condition is spatial, not equi) with per-zone bbox COLUMNS ahead
    *    of the ray cast in the join condition, so a candidate pair pays
    *    four comparisons before the O(vertices) cast and each point
    *    matches only the zones whose box it is in;
    *  - output is one row per (point, zone) containment — the matrix —
    *    so downstream groupBys can pivot either way.
    * The fact side never shuffles; the only data movement is the
    * broadcast of the dim.
    */
  def zoneMatrix(points: DataFrame, zones: DataFrame,
      lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val zrows = zones.select(col("zone_id"), col("poly")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(zrows.nonEmpty, "zone dimension is empty")
    def bbox(p: Array[Double]) = {
      val xs = p.indices.collect { case i if i % 2 == 0 => p(i) }
      val ys = p.indices.collect { case i if i % 2 == 1 => p(i) }
      (xs.min, xs.max, ys.min, ys.max)
    }
    val boxes = zrows.map { case (id, p) => (id, p, bbox(p)) }
    val (minX, maxX, minY, maxY) = (
      boxes.map(_._3._1).min, boxes.map(_._3._2).max,
      boxes.map(_._3._3).min, boxes.map(_._3._4).max)
    val spark = points.sparkSession
    import spark.implicits._
    val dim = boxes.toSeq.map { case (id, p, (bx0, bx1, by0, by1)) =>
      (id, p.toSeq, bx0, bx1, by0, by1)
    }.toDF("zone_id", "poly", "bminx", "bmaxx", "bminy", "bmaxy")
    val lon = col(lonCol); val lat = col(latCol)
    points
      // union bbox of the whole dim: foldable → pushed to the scan
      .filter(lon >= lit(minX) && lon <= lit(maxX) &&
        lat >= lit(minY) && lat <= lit(maxY))
      .join(broadcast(dim),
        lon >= col("bminx") && lon <= col("bmaxx") &&
          lat >= col("bminy") && lat <= col("bmaxy") &&
          point_in_polygon(lon, lat, col("poly")))
      .drop("poly", "bminx", "bmaxx", "bminy", "bmaxy")
  }
}
