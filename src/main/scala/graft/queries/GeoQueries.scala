package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Geo, TssZones}

/** Spatial operator coverage (SURVEY R4): point-in-polygon against the
  * reference's TSS zone polygons, driven over the events table (synthetic
  * deterministic lon/lat derived from event ids — the driver testdata has
  * no geo columns).
  *
  * The DuckDB oracle replays the IDENTICAL even-odd ray cast in pure SQL:
  * an edge VALUES table per polygon and a crossing-parity count, with the
  * same operand order as [[graft.ops.GeoMath.rayCast]] so float results
  * match bit-for-bit. Scale note: the Spark side is a single narrow
  * projection + codegen'd predicate — no join, no shuffle; the polygon is
  * a per-task reference object.
  */
object GeoQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic synthetic coordinates over the Malacca-strait bbox. */
  private def points(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).select(
      $"event_id", $"user_id",
      (lit(100.5) + (($"event_id" * 37 + $"user_id") % 400).cast("double") / lit(100.0)).as("lon"),
      (lit(0.8) + (($"event_id" * 17 + $"user_id" * 3) % 280).cast("double") / lit(100.0)).as("lat"))
  }

  /** Synthetic zones 3 and 4 for the N×M matrix (q109): a rectangular
    * anchorage box and a triangular approach area inside the synthetic
    * point bbox. Closed rings; literals shared verbatim with the oracle
    * (never derived arithmetically on one side — the parity rule).
    */
  private[queries] val Anchorage: Array[Double] = Array(
    101.0, 1.8, 102.0, 1.8, 102.0, 2.6, 101.0, 2.6, 101.0, 1.8)
  private[queries] val Approach: Array[Double] = Array(
    103.0, 1.0, 104.0, 1.0, 103.5, 2.0, 103.0, 1.0)

  val queries: Map[String, Q] = Map(
    // R4 membership detail: every point, both zones.
    "q14_point_in_polygon" -> ((s, d) => {
      import s.implicits._
      points(s, d).select(
        $"event_id", $"lon", $"lat",
        Geo.inTssNorthbound($"lon", $"lat").as("in_north"),
        Geo.inTssSouthbound($"lon", $"lat").as("in_south"))
    }),

    // R4 + R6: the reference's flagship tail — distinct vessels (users)
    // inside TSS-Northbound (ais_analysis.py:483-494).
    "q15_zone_count" -> ((s, d) => {
      import s.implicits._
      points(s, d)
        .filter(Geo.inTssNorthbound($"lon", $"lat"))
        .agg(count(lit(1)).as("n_points"),
             countDistinct($"user_id").as("n_users"))
    }),

    // R4's general N×M form: a zones DIMENSION table (both TSS lanes +
    // two synthetic areas) broadcast-nested-loop joined onto the points
    // with per-zone bbox short-circuit and a plan-time union-bbox
    // pushdown — see Geo.zoneMatrix. The oracle replays the ray cast
    // per zone and unions the per-zone memberships.
    "q109_zone_matrix" -> ((s, d) => {
      import s.implicits._
      val zones = Seq(
        (1L, TssZones.Northbound.toSeq), (2L, TssZones.Southbound.toSeq),
        (3L, Anchorage.toSeq), (4L, Approach.toSeq))
        .toDF("zone_id", "poly")
      Geo.zoneMatrix(points(s, d), zones)
        .select($"event_id", $"user_id", $"zone_id")
    }),

    // R8 (batch replica): per-vessel zone entry/exit counters over
    // event-time order (ais_webSocketServerDb.py:226-260 replayed).
    "q16_zone_transitions" -> ((s, d) => {
      import s.implicits._
      val pts = Tables.events(s, d).select(
        $"user_id", $"event_id", $"ts",
        (lit(100.5) + (($"event_id" * 37 + $"user_id") % 400).cast("double") / lit(100.0)).as("lon"),
        (lit(0.8) + (($"event_id" * 17 + $"user_id" * 3) % 280).cast("double") / lit(100.0)).as("lat"))
      graft.ops.ZoneTracker.perUserSummary(pts)
    }),
  )

  /** (xPrev, yPrev, xCur, yCur) edge VALUES rows for a closed ring. */
  private def edgeValues(poly: Array[Double]): String = {
    val n = poly.length / 2
    (1 until n).map { i =>
      val xp = poly(2 * (i - 1)); val yp = poly(2 * (i - 1) + 1)
      val xc = poly(2 * i); val yc = poly(2 * i + 1)
      s"(CAST('$xp' AS DOUBLE), CAST('$yp' AS DOUBLE), CAST('$xc' AS DOUBLE), CAST('$yc' AS DOUBLE))"
    }.mkString(", ")
  }

  private val ptsCte =
    """pts AS (
       SELECT event_id, user_id, ts,
         100.5 + CAST((event_id * 37 + user_id) % 400 AS DOUBLE) / 100.0 AS lon,
         0.8 + CAST((event_id * 17 + user_id * 3) % 280 AS DOUBLE) / 100.0 AS lat
       FROM events)"""

  /** Crossing-parity CTE mirroring GeoMath.rayCast operand order exactly. */
  private def crossCte(name: String, edges: String): String =
    s"""$name AS (
       SELECT p.event_id,
         count(*) FILTER (WHERE ((e.yc > p.lat) != (e.yp > p.lat))
           AND p.lon < (e.xp - e.xc) * (p.lat - e.yc) / (e.yp - e.yc) + e.xc) AS c
       FROM pts p CROSS JOIN (VALUES $edges) AS e(xp, yp, xc, yc)
       GROUP BY p.event_id)"""

  val oracleSql: Map[String, String] = Map(
    "q14_point_in_polygon" ->
      s"""WITH $ptsCte,
          ${crossCte("nc", edgeValues(TssZones.Northbound))},
          ${crossCte("sc", edgeValues(TssZones.Southbound))}
          SELECT p.event_id, p.lon, p.lat,
                 (nc.c % 2 = 1) AS in_north, (sc.c % 2 = 1) AS in_south
          FROM pts p
          JOIN nc ON p.event_id = nc.event_id
          JOIN sc ON p.event_id = sc.event_id""",
    "q15_zone_count" ->
      s"""WITH $ptsCte,
          ${crossCte("nc", edgeValues(TssZones.Northbound))}
          SELECT count(*) AS n_points, count(DISTINCT p.user_id) AS n_users
          FROM pts p JOIN nc ON p.event_id = nc.event_id
          WHERE nc.c % 2 = 1""",
    "q109_zone_matrix" ->
      s"""WITH $ptsCte,
          ${crossCte("z1", edgeValues(TssZones.Northbound))},
          ${crossCte("z2", edgeValues(TssZones.Southbound))},
          ${crossCte("z3", edgeValues(Anchorage))},
          ${crossCte("z4", edgeValues(Approach))}
          SELECT p.event_id, p.user_id, CAST(1 AS BIGINT) AS zone_id
            FROM pts p JOIN z1 ON p.event_id = z1.event_id WHERE z1.c % 2 = 1
          UNION ALL
          SELECT p.event_id, p.user_id, CAST(2 AS BIGINT) AS zone_id
            FROM pts p JOIN z2 ON p.event_id = z2.event_id WHERE z2.c % 2 = 1
          UNION ALL
          SELECT p.event_id, p.user_id, CAST(3 AS BIGINT) AS zone_id
            FROM pts p JOIN z3 ON p.event_id = z3.event_id WHERE z3.c % 2 = 1
          UNION ALL
          SELECT p.event_id, p.user_id, CAST(4 AS BIGINT) AS zone_id
            FROM pts p JOIN z4 ON p.event_id = z4.event_id WHERE z4.c % 2 = 1""",
    "q16_zone_transitions" ->
      s"""WITH $ptsCte,
          ${crossCte("nc", edgeValues(TssZones.Northbound))},
          flags AS (
            SELECT p.user_id, p.event_id, p.ts, (nc.c % 2 = 1) AS in_n
            FROM pts p JOIN nc ON p.event_id = nc.event_id),
          seq AS (
            SELECT user_id, in_n,
              lag(in_n) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_n,
              last_value(in_n) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_n
            FROM flags)
          SELECT user_id,
            count(CASE WHEN in_n AND (prev_n IS NULL OR NOT prev_n) THEN 1 END) AS n_enters,
            count(CASE WHEN NOT in_n AND prev_n THEN 1 END) AS n_exits,
            max(final_n) AS inside_at_end
          FROM seq GROUP BY user_id""",
  )
}
