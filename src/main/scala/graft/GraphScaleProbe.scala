package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Connected-components scale probe on the shapes the two algorithms
  * exist for (SCALE.md): star contraction's O(log n) round bound is
  * pinned in GraphSpec on a 41-node chain, while the 50k-doc corpus
  * probes only ever see near-clique dedup graphs — this probe puts
  * MEASURED round counts and wall time on synthetic long chains (the
  * O(diameter) killer) and seeded expanders (low diameter, high edge
  * redundancy) at 10^3..10^5 nodes, star vs forced-min-label.
  *
  * Star runs with `finishEdgeLimit = 0` (pure distributed fixpoint —
  * the endgame tier would otherwise absorb the tail rounds the probe
  * exists to count). Min-label runs tier-2-forced (`driverEdgeLimit =
  * 0`, `fallbackToStar = false`) with maxIters capped: on a chain it
  * needs ~diameter rounds, so past the cap the probe reports the
  * non-convergence honestly instead of burning hours (that cliff is
  * the measurement).
  *
  * Usage: runMain graft.GraphScaleProbe [chain sizes, default 1000,10000,100000]
  * Prints one JSON line per (shape, n, algo).
  */
object GraphScaleProbe {

  private def chain(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n - 1).select(($"id" + 1L).as("src"), $"id".as("dst"))
  }

  /** Seeded pseudo-random graph with 2n edges over n nodes (expander-
    * like: diameter O(log n) with high probability). Endpoints from the
    * repo's multiplicative hash — deterministic, partition-independent.
    */
  private def expander(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, 2L * n).select(
      pmod($"id" * 2654435761L + 13L, lit(n)).as("src"),
      pmod($"id" * 40503L + 2531011L, lit(n)).as("dst"))
      .filter($"src" =!= $"dst")
  }

  def main(args: Array[String]): Unit = {
    // 64 is the contrast row: a diameter min-label can still converge
    // under the cap, so the table shows rounds 63-vs-6 side by side
    // before the larger chains hit the cap cliff
    val sizes = if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
                else Seq(64L, 1000L, 10000L, 100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)

    def report(shape: String, n: Long, algo: String, sec: Double,
               rounds: String, comps: Long): Unit =
      println(s"""{"probe":"graph_scale","shape":"$shape","n":$n,""" +
        f""""algo":"$algo","sec":$sec%.2f,"rounds":$rounds,"components":$comps}""")

    def run(shape: String, n: Long, edges: DataFrame): Unit = {
      // star: pure distributed fixpoint, round count from the probe hook
      val t0 = System.nanoTime()
      val nStar = Graph.connectedComponentsStar(spark, edges,
        maxIters = 60, finishEdgeLimit = 0L)
        .select(countDistinct(col("component"))).head().getLong(0)
      val tStar = (System.nanoTime() - t0) / 1e9
      graft.ext.Dedup.clearSignatureCaches(blocking = true)
      report(shape, n, "star", tStar, Graph.lastStarRounds.toString, nStar)

      // min-label, tier-2 forced; cap rounds so a 100k chain cannot run
      // for hours — non-convergence at the cap IS the honest result.
      // checkpointEvery = 1: min-label's plan doubles per round, so its
      // default cadence 10 (sized for 2-3-round near-clique graphs)
      // OOMs the driver with 2^10-leaf plans on a 63-round chain —
      // cadence 1 is both survivable and the fair per-round cost
      // comparison against star (which always runs cadence 1)
      val cap = 70
      val t1 = System.nanoTime()
      try {
        val nMl = Graph.connectedComponents(spark, edges, maxIters = cap,
          checkpointEvery = 1, driverEdgeLimit = 0L, fallbackToStar = false)
          .select(countDistinct(col("component"))).head().getLong(0)
        val tMl = (System.nanoTime() - t1) / 1e9
        report(shape, n, "minlabel", tMl, Graph.lastLabelRounds.toString, nMl)
      } catch {
        case _: IllegalStateException =>
          val tMl = (System.nanoTime() - t1) / 1e9
          report(shape, n, "minlabel_UNCONVERGED", tMl, s""""> $cap"""", -1L)
      }
    }

    for (n <- sizes) run("chain", n, chain(spark, n))
    for (n <- sizes) run("expander", n, expander(spark, n))
    spark.stop()
  }
}
