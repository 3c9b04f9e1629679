package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative fixpoint dataflow — the recursive-CTE class Spark has no
  * native operator for (SQL `WITH RECURSIVE`). Expressed as a driver
  * loop of joins (the same shape as k-means training): each round joins
  * the frontier to the edge table, anti-joins out already-visited
  * nodes, and stops when the frontier empties. Deterministic; the
  * DuckDB oracle replays it as an actual recursive CTE.
  *
  * Scale: each iteration is one equi-join + one anti-join, both
  * shuffled on the node key — at 100 TB the edge table is bucketed on
  * `src` so every round's join is co-partitioned; rounds = graph
  * diameter, and the frontier/visited sets are checkpoint candidates
  * once lineage depth grows (localCheckpoint every ~10 rounds keeps
  * the plan from re-deriving all prior iterations).
  */
object Graph {

  /** All nodes reachable from `start` over directed `edges(src, dst)`,
    * including the start node. `maxIters` bounds runaway cycles
    * (diameter guard, not a semantic knob — the loop exits at fixpoint).
    */
  def reachable(spark: SparkSession, edges: DataFrame, start: Long,
                maxIters: Int = 50): DataFrame = {
    import spark.implicits._
    // the edge table is the only big input: materialize it ONCE —
    // otherwise every round re-derives it (scan + distinct shuffle x
    // diameter). Frontier and visited stay broadcast-sized (<= node
    // count), so each round is a broadcast join + broadcast anti-join:
    // zero per-round shuffles of the edge table.
    val e = edges.cache()
    var visited = Seq(start).toDF("node")
    var frontier = visited
    var iter = 0
    var done = false
    while (iter < maxIters && !done) {
      val next = e
        .join(broadcast(frontier), e("src") === frontier("node"))
        .select(col("dst").as("node"))
        .distinct()
        .join(broadcast(visited), Seq("node"), "left_anti")
        .cache()
      if (next.count() == 0) done = true
      else {
        val prev = frontier
        visited = visited.unionByName(next).cache()
        frontier = next
        prev.unpersist(blocking = false)
      }
      iter += 1
    }
    e.unpersist(blocking = false)
    visited
  }
}
