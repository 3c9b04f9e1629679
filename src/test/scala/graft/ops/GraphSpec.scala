package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Fixpoint reachability must return the same closure on every physical
  * path: broadcast-hinted rounds, pure shuffled rounds (the high-fanout
  * escape hatch), and tight checkpoint cadences on graphs deeper than
  * the cadence.
  */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 0→1→…→8 chain with branches (i → i+3 for even i), plus a separate
  // unreachable component 100→101→102. Depth ~8: enough rounds to cross
  // several checkpoint generations at cadence 2 while keeping the
  // per-round planning/codegen cost of a driver-loop test bounded.
  private def edgeSeq: Seq[(Long, Long)] =
    (0L until 8L).map(i => (i, i + 1)) ++
      (0L until 6L by 2).map(i => (i, i + 3)) ++
      Seq((100L, 101L), (101L, 102L))

  private def expected: Set[Long] = {
    val adj = edgeSeq.groupMap(_._1)(_._2)
    var seen = Set(0L)
    var front = Set(0L)
    while (front.nonEmpty) {
      val nxt = front.flatMap(n => adj.getOrElse(n, Nil)) -- seen
      seen ++= nxt
      front = nxt
    }
    seen
  }

  private def run(broadcastRows: Long, checkpointEvery: Int,
      driverNodeLimit: Int, driverEdgeLimit: Long = 0L): Set[Long] = {
    import spark.implicits._
    val edges = edgeSeq.toDF("src", "dst")
    Graph.reachable(spark, edges, start = 0L,
        broadcastRows = broadcastRows, checkpointEvery = checkpointEvery,
        driverNodeLimit = driverNodeLimit, driverEdgeLimit = driverEdgeLimit)
      .as[Long].collect().toSet
  }

  test("tier-0 in-memory BFS (edge table fits the driver) matches") {
    assert(run(broadcastRows = 1000000L, checkpointEvery = 10,
      driverNodeLimit = 5000, driverEdgeLimit = 500000L) === expected)
  }

  test("tier-1 driver-set BFS matches brute-force closure") {
    assert(run(broadcastRows = 1000000L, checkpointEvery = 10,
      driverNodeLimit = 5000) === expected)
  }

  test("tier-2 broadcast-join path matches") {
    // driverNodeLimit 0 spills to the DataFrame loop on round one
    assert(run(broadcastRows = 1000000L, checkpointEvery = 10,
      driverNodeLimit = 0) === expected)
  }

  test("tier-2 shuffled-join path (frontier too big to broadcast) matches") {
    // also kill Spark's own auto-broadcast so the join is genuinely shuffled
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(run(broadcastRows = 0L, checkpointEvery = 10,
      driverNodeLimit = 0) === expected)
    finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("tier-2 checkpoint cadence shorter than graph depth matches") {
    // depth ~8 with cadence 2: several checkpoint generations retire
    assert(run(broadcastRows = 1000000L, checkpointEvery = 2,
      driverNodeLimit = 0) === expected)
  }

  test("connected components: union-find tier == label-propagation tier") {
    import spark.implicits._
    // three components: {1,2,3,4}, {10,11}, {20,21,22}; edges undirected-ish
    val comps = Seq((1L, 2L), (2L, 3L), (4L, 3L), (10L, 11L),
      (21L, 20L), (21L, 22L)).toDF("src", "dst")
    val expectedCC = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    val t0 = Graph.connectedComponents(spark, comps)
      .as[(Long, Long)].collect().toMap
    assert(t0 === expectedCC)
    val t2 = Graph.connectedComponents(spark, comps,
        driverEdgeLimit = 0L, checkpointEvery = 2)
      .as[(Long, Long)].collect().toMap
    assert(t2 === expectedCC)
  }

  test("connected components: unconverged labels fail loudly when pinned") {
    import spark.implicits._
    // a 5-node path needs ~4 min-label rounds; 1 round cannot converge.
    // Unconverged labels LOOK valid (every node gets one), so returning
    // them silently is the failure mode this guards against.
    val path = (1L to 4L).map(i => (i, i + 1)).toDF("src", "dst")
    assertThrows[IllegalStateException] {
      Graph.connectedComponents(spark, path, maxIters = 1, driverEdgeLimit = 0L,
        fallbackToStar = false)
    }
  }

  test("connected components: maxIters overflow falls back to star contraction") {
    import spark.implicits._
    // same starved budget, default behavior: the answer must come back
    // CORRECT via the O(log n) star path, never as unconverged labels
    val path = (1L to 4L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Graph.connectedComponents(spark, path, maxIters = 1,
        driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got === (1L to 5L).map(n => n -> 1L).toMap)
  }

  test("mid-BFS spill from tier 1 to tier 2 matches") {
    // limit 6: tier 1 runs a few rounds, then the growing closure
    // overflows the driver budget and tier 2 finishes the fixpoint
    assert(run(broadcastRows = 1000000L, checkpointEvery = 2,
      driverNodeLimit = 6) === expected)
  }

  test("star-contraction components == union-find on adversarial shapes") {
    import spark.implicits._
    // the three shapes that stress star contraction differently: a long
    // chain (the O(diameter) killer min-label exists to avoid), a clique
    // (max edge redundancy), and seeded random graphs (arbitrary merges)
    val chain = (0L until 40L).map(i => (i + 1, i))
    val clique = for (a <- 50L to 56L; b <- (a + 1) to 56L) yield (a, b)
    val rnd = new scala.util.Random(17)
    val random = (0 until 60).map { _ =>
      (100L + rnd.nextInt(30), 100L + rnd.nextInt(30))
    }.filter { case (a, b) => a != b }
    val edges = (chain ++ clique ++ random).toDF("src", "dst")
    val expectedCC = Graph.connectedComponents(spark, edges)
      .as[(Long, Long)].collect().toMap // tier-0 union-find reference
    // pure star (endgame tier disabled) AND the default (on this
    // driver-sized graph the endgame runs one distributed large-star
    // pass and finishes with union-find) must both equal union-find —
    // the endgame tier is an optimization, not a semantic knob
    val starPure = Graph.connectedComponentsStar(spark, edges,
        checkpointEvery = 2, finishEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(starPure === expectedCC)
    val starDefault = Graph.connectedComponentsStar(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(starDefault === expectedCC)
    // mid-contraction handoff: a smaller finishEdgeLimit makes full
    // distributed rounds run BEFORE the multiset fits, so union-find
    // composes with a partially-contracted multiset — must still match
    val starMid = Graph.connectedComponentsStar(spark, edges,
        finishEdgeLimit = 60L)
      .as[(Long, Long)].collect().toMap
    assert(starMid === expectedCC)
    // the 41-node chain must converge in O(log n) rounds, far under the
    // ~40 min-label would need: maxIters = 12 must suffice (pure star —
    // the endgame tier would otherwise absorb the tail rounds)
    val chainOnly = chain.toDF("src", "dst")
    val starChain = Graph.connectedComponentsStar(spark, chainOnly,
        maxIters = 12, finishEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(starChain === (0L to 40L).map(n => n -> 0L).toMap)
  }

  test("reachable refuses to return a truncated closure (all tiers)") {
    import spark.implicits._
    // a 10-deep chain with maxIters=3: a silent partial closure loses
    // rows in downstream joins with no signal — every tier must throw
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    assertThrows[IllegalStateException] { // tier 0 (edges fit driver)
      Graph.reachable(spark, chain, start = 0L, maxIters = 3)
    }
    assertThrows[IllegalStateException] { // tier 1 (driver-set BFS)
      Graph.reachable(spark, chain, start = 0L, maxIters = 3,
        driverEdgeLimit = 0L)
    }
    assertThrows[IllegalStateException] { // tier 2 (join loop)
      Graph.reachable(spark, chain, start = 0L, maxIters = 3,
        driverEdgeLimit = 0L, driverNodeLimit = 1)
    }
  }

  test("star-contraction handles empty edge sets and self-loops") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.connectedComponentsStar(spark, empty).count() === 0)
    // self-loops carry no connectivity; (7,7) alone yields node 7 as
    // its own singleton component... which matches union-find's contract
    val loops = Seq((7L, 7L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.connectedComponentsStar(spark, loops)
      .as[(Long, Long)].collect().toMap
    val ref = Graph.connectedComponents(spark, loops)
      .as[(Long, Long)].collect().toMap
    assert(got === ref)
  }
}
