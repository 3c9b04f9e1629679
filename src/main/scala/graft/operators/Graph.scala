package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative fixpoint dataflow — the recursive-CTE class Spark has no
  * native operator for (SQL `WITH RECURSIVE`). Expressed as a driver
  * loop (the same shape as k-means training), with a size-tiered
  * physical strategy:
  *
  * Tier 0 (the edge table fits on the driver, `driverEdgeLimit` rows):
  * one collect + an in-memory BFS — two jobs total.
  *
  * Tier 1 (edges are big but the closure fits, `driverNodeLimit`): BFS
  * with in-memory frontier/visited sets — each round is ONE two-stage
  * job (InSet filter over the cached edge table + distinct + collect).
  * A DataFrame-join round costs ~6 stages of planning + codegen + a
  * broadcast exchange regardless of data size, so for the common
  * small-closure case the set version is ~5x less per-round overhead.
  *
  * Tier 2 (closure outgrows the driver): per-round equi-join +
  * anti-join DataFrames. While frontier/visited stay under
  * `broadcastRows` they ride as broadcast hints; past that — high-
  * fanout graphs where the frontier is O(nodes) and a broadcast would
  * OOM the driver — the loop switches to plain shuffled joins, which at
  * 100 TB are co-partitioned when the edge table is bucketed on `src`.
  * Lineage is truncated with an EAGER `localCheckpoint` every
  * `checkpointEvery` rounds so round k's plan does not re-derive rounds
  * 1..k-1. The previous checkpoint is only unpersisted AFTER the next
  * one has materialized — local checkpoints are non-recoverable, so
  * dropping one that a lazy successor still needs would lose the data,
  * not just the cache.
  *
  * Deterministic; the DuckDB oracle replays it as a recursive CTE.
  */
object Graph {

  /** Round counters for the last completed fixpoint run on this driver —
    * DIAGNOSTIC ONLY (GraphScaleProbe reads them to report measured
    * round counts next to wall time). Written once at the end of each
    * run; racy under concurrent queries, so never used for control flow.
    */
  @volatile private[graft] var lastStarRounds: Int = -1
  @volatile private[graft] var lastLabelRounds: Int = -1

  /** All nodes reachable from `start` over directed `edges(src, dst)`,
    * including the start node. `maxIters` bounds runaway cycles
    * (diameter guard, not a semantic knob — the loop exits at fixpoint).
    */
  def reachable(spark: SparkSession, edges: DataFrame, start: Long,
                maxIters: Int = 50, broadcastRows: Long = 1000000L,
                checkpointEvery: Int = 10,
                driverNodeLimit: Int = 5000,
                driverEdgeLimit: Long = 500000L): DataFrame = {
    import spark.implicits._
    // the edge table is the only big input: materialize it ONCE —
    // otherwise every round re-derives it (scan + distinct shuffle x
    // diameter).
    val e = edges.cache()

    // ---- tier 0: whole graph fits the driver -----------------------
    // a per-round Spark job costs ~100 ms of scheduling regardless of
    // data; when the EDGE TABLE itself is driver-sized, the entire
    // closure is one collect + an in-memory BFS (2 jobs total instead
    // of jobs x diameter)
    // A closure deeper than maxIters must FAIL, not silently truncate:
    // a partial "reachable" set looks valid and downstream joins lose
    // rows with no signal (same contract as connectedComponents).
    def truncatedError(): Nothing = {
      e.unpersist(blocking = false)
      throw new IllegalStateException(
        s"reachable did not converge in $maxIters rounds: the closure is " +
          "deeper than the iteration budget. maxIters must exceed the " +
          "graph's depth from the start node; raise it for this graph.")
    }

    if (e.count() <= driverEdgeLimit) {
      val adj = e.select(col("src"), col("dst")).as[(Long, Long)]
        .collect().groupMap(_._1)(_._2)
      var seen = Set(start)
      var front = Set(start)
      var it = 0
      while (it < maxIters && front.nonEmpty) {
        front = front.iterator.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
          .filterNot(seen).toSet
        seen ++= front
        it += 1
      }
      if (front.nonEmpty) truncatedError()
      e.unpersist(blocking = false)
      return seen.toSeq.toDF("node")
    }

    // ---- tier 1: driver-set BFS ------------------------------------
    var visitedSet = Set(start)
    var frontierSet = Set(start)
    var iter = 0
    var spilled = false
    while (iter < maxIters && frontierSet.nonEmpty && !spilled) {
      // limit+1 bounds the collect: if one expansion overflows the
      // driver budget the partial result is DISCARDED (limit picks an
      // arbitrary subset) and tier 2 recomputes the round
      val nextArr = e.filter(col("src").isin(frontierSet.toSeq: _*))
        .select(col("dst")).distinct()
        .limit(driverNodeLimit + 1).as[Long].collect()
      if (nextArr.length > driverNodeLimit) spilled = true // truncated: size unknown
      else {
        // spill on the TRUE closure size, not nextArr + visited — an
        // expansion dominated by already-visited nodes (dense graphs)
        // must not push a closure that still fits onto the join tier
        val fresh = nextArr.toSet -- visitedSet
        if (visitedSet.size + fresh.size > driverNodeLimit) spilled = true
        else {
          frontierSet = fresh
          visitedSet ++= fresh
          iter += 1
        }
      }
    }
    if (!spilled) {
      if (frontierSet.nonEmpty) truncatedError()
      e.unpersist(blocking = false)
      return visitedSet.toSeq.toDF("node")
    }

    // ---- tier 2: DataFrame loop, seeded from tier-1 state ----------
    var visited = visitedSet.toSeq.toDF("node").localCheckpoint(true)
    var lastCheckpoint = visited
    var frontier = frontierSet.toSeq.toDF("node").cache()
    var frontierRows = frontierSet.size.toLong
    var visitedRows = visitedSet.size.toLong
    var done = false
    while (iter < maxIters && !done) {
      val f = if (frontierRows <= broadcastRows) broadcast(frontier) else frontier
      val v = if (visitedRows <= broadcastRows) broadcast(visited) else visited
      val next = e
        .join(f, e("src") === f("node"))
        .select(col("dst").as("node"))
        .distinct()
        .join(v, Seq("node"), "left_anti")
        .cache()
      frontierRows = next.count()
      if (frontierRows == 0) {
        done = true
        // convergence round: neither the final (empty) next nor the
        // last frontier is consumed again — release both or they stay
        // cached for the session (the else-branch cleanup never runs)
        next.unpersist(blocking = false)
        frontier.unpersist(blocking = false)
      }
      else {
        val prevFrontier = frontier
        val prevVisited = visited
        visitedRows += frontierRows
        if ((iter + 1) % checkpointEvery == 0) {
          // eager: materialized HERE, self-contained after this call —
          // only then is retiring the previous checkpoint safe
          visited = visited.unionByName(next).localCheckpoint(true)
          if (prevVisited ne lastCheckpoint) prevVisited.unpersist(blocking = false)
          lastCheckpoint.unpersist(blocking = false)
          lastCheckpoint = visited
        } else {
          // between checkpoints the union chain stays shallow; the
          // retired intermediate is recomputable from lastCheckpoint
          visited = visited.unionByName(next).cache()
          if (prevVisited ne lastCheckpoint) prevVisited.unpersist(blocking = false)
        }
        frontier = next
        prevFrontier.unpersist(blocking = false)
      }
      iter += 1
    }
    if (!done) {
      frontier.unpersist(blocking = false)
      truncatedError()
    }
    e.unpersist(blocking = false)
    visited
  }

  /** Driver union-find with MIN-root unions (path-compressed): returns
    * the find function — every node resolves to its component's
    * minimum id. The tier-0 body of [[connectedComponents]], shared so
    * the streaming ingest's within-delta component drop computes the
    * same labels without a Dataset round-trip.
    */
  def minRootFind(es: Array[(Long, Long)]): Long => Long = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    find
  }

  /** Every edge-list node that is NOT its component's minimum — the
    * within-cluster drop list (keep each cluster's min id), computed
    * entirely on the driver. Equal by construction to
    * `connectedComponents(es).filter(node =!= component)`.
    */
  def minRootNonRoots(es: Array[(Long, Long)]): Array[Long] = {
    val find = minRootFind(es)
    es.iterator.flatMap(p => Iterator(p._1, p._2)).toArray
      .distinct.filter(n => find(n) != n)
  }

  /** The dedup drop list — every node that is NOT its component's
    * minimum — with ONE Spark action on the common path. The callers
    * (batch curation stage 4, the incremental delta's within-batch
    * components) all run `connectedComponents(...).filter(node =!=
    * component)` over a pair list that is dup-density-sized, which at
    * bench scale took THREE actions before any drop was known: cache +
    * count (the tier gate), collect (tier 0), plus the caller's own
    * isEmpty probe. Here the pair list is fetched CAPPED in one job
    * (each partition yields at most cap+1 pairs, so the driver holds
    * ≤ (cap+1)·partitions transiently and a Some is complete — the
    * [[graft.queries.Curation]] cappedFetch discipline), union-find
    * runs on the driver ([[minRootNonRoots]], equal by construction to
    * the cc filter), and an empty pair list costs exactly the one
    * probe job. Over the cap the caller gets Right(distributed drop
    * frame) over the STILL-CACHED edge table — the
    * [[connectedComponents]] fixpoint, identical drop set.
    */
  def componentNonRootsCapped(spark: SparkSession, edges: DataFrame,
      cap: Long = 500000L): Either[Array[Long], DataFrame] = {
    import org.apache.spark.sql.catalyst.InternalRow
    // cached FIRST so the capped fetch materializes it and an over-cap
    // fallback re-reads blocks instead of re-running the (expensive)
    // pair-generation pipeline; registered query-scoped like the other
    // signature caches
    val e = graft.ext.Dedup.cached(edges.select(col("src"), col("dst")))
    val perPart = math.min(cap + 1L, Int.MaxValue.toLong).toInt
    val chunks = spark.sparkContext.runJob(
      e.queryExecution.toRdd,
      (it: Iterator[InternalRow]) =>
        it.take(perPart).map(r => (r.getLong(0), r.getLong(1))).toArray)
    val total = chunks.iterator.map(_.length.toLong).sum
    if (total > cap)
      Right(connectedComponents(spark, e)
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id")))
    else Left(minRootNonRoots(Array.concat(chunks.toIndexedSeq: _*)))
  }

  /** Connected components over undirected `edges(src, dst)`: every node
    * appearing in an edge is assigned its component's MINIMUM node id.
    * The dedup endgame — LSH pair lists become duplicate clusters with
    * a canonical (min-id) representative. Same size tiering as
    * [[reachable]]: union-find on the driver while the edge list fits
    * `driverEdgeLimit`; past that, min-label propagation as a join
    * loop — labels only decrease, so sum(label) is a monotone
    * convergence fingerprint (fixpoint iff the sum is stable), and the
    * label table is eagerly localCheckpoint'ed on a cadence exactly
    * like the reachability loop. The DuckDB oracle replays it as
    * min-reachable-label over a recursive CTE.
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
      maxIters: Int = 50, checkpointEvery: Int = 10,
      driverEdgeLimit: Long = 500000L, verbose: Boolean = false,
      fallbackToStar: Boolean = true): DataFrame = {
    import spark.implicits._
    val e = edges.cache()

    if (e.count() <= driverEdgeLimit) {
      // tier 0: classic union-find, two jobs total
      val es = e.select(col("src"), col("dst")).as[(Long, Long)].collect()
      e.unpersist(blocking = false)
      val find = minRootFind(es)
      val nodes = es.iterator.flatMap(p => Iterator(p._1, p._2)).toSeq.distinct
      return nodes.map(n => (n, find(n))).toDF("node", "component")
    }

    // tier 2: distributed min-label propagation
    val und = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint(true)
    var lastCheckpoint = labels
    var fingerprint = labels.agg(sum(col("lbl"))).as[Long].head()
    var iter = 0
    var done = false
    while (iter < maxIters && !done) {
      val viaNeighbor = und
        .join(labels, und("dst") === labels("node"))
        .select(und("src").as("node"), col("lbl"))
      val next = labels.select(col("node"), col("lbl"))
        .unionByName(viaNeighbor)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
      val prev = labels
      labels =
        if ((iter + 1) % checkpointEvery == 0) {
          val cp = next.localCheckpoint(true)
          if (prev ne lastCheckpoint) prev.unpersist(blocking = false)
          lastCheckpoint.unpersist(blocking = false)
          lastCheckpoint = cp
          cp
        } else next.cache()
      val fp = labels.agg(sum(col("lbl"))).as[Long].head()
      if (verbose)
        System.err.println(s"[cc] iter=${iter + 1} fingerprint=$fp")
      if (fp == fingerprint) done = true
      else fingerprint = fp
      // release prev on EVERY path incl. the convergence round — the
      // done branch previously skipped it, leaving the prior label
      // table cached for the session
      if ((prev ne lastCheckpoint) && (prev ne labels)) prev.unpersist(blocking = false)
      iter += 1
    }
    und.unpersist(blocking = false)
    lastLabelRounds = iter
    // Unlike reachable — where hitting maxIters merely under-approximates
    // a closure — unconverged labels here LOOK valid but are wrong for
    // every component whose diameter exceeds the iteration budget. Never
    // return them: a diameter > maxIters graph is exactly the long-chain
    // shape star contraction finishes in O(log n) rounds, so delegate
    // (default), or fail loudly when the caller pinned the algorithm.
    if (!done) {
      labels.unpersist(blocking = false)
      if (lastCheckpoint ne labels) lastCheckpoint.unpersist(blocking = false)
      if (fallbackToStar) {
        if (verbose) System.err.println(
          s"[cc] min-label hit maxIters=$maxIters; falling back to star contraction")
        // hand the STILL-CACHED edge table to the star pass — passing the
        // raw `edges` would re-run its upstream pipeline (LSH pair
        // generation) from scratch on a graph that already paid maxIters
        // failed rounds. e's lifecycle moves to the query-scoped registry
        // (star's eAll derives from it; released by clearSignatureCaches).
        graft.ext.Dedup.cached(e)
        return connectedComponentsStar(spark, e)
      }
      e.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations: " +
          "label sums were still decreasing. maxIters must exceed the " +
          "largest component's diameter; raise it for this graph, or leave " +
          "fallbackToStar on to delegate to the O(log n)-round variant.")
    }
    e.unpersist(blocking = false)
    labels.select(col("node"), col("lbl").as("component"))
  }

  /** Connected components by alternating star contraction (the
    * large-star/small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): same contract as
    * [[connectedComponents]] — every node appearing in an edge maps to
    * its component's minimum id — but **O(log n) rounds instead of
    * O(diameter)**, so it is the variant for graphs with long chains
    * (lineage graphs, session stitches). Dedup similarity graphs are
    * near-cliques (diameter 2–3), where min-label's cheaper rounds win;
    * this exists for the other shape and is property-tested equal to
    * union-find on both.
    *
    * Each round is two groupBy-min + join passes (no per-node adjacency
    * arrays — a skewed high-degree node never materializes its neighbor
    * list in one task):
    *  - large-star: every node u points its LARGER neighbors at
    *    m(u) = min(Γ(u) ∪ u) — halves long chains;
    *  - small-star: with edges directed larger→smaller, every node's
    *    smaller neighbors and u itself re-point at the minimum —
    *    flattens partial stars.
    * The edge multiset shrinks monotonically toward the star fixpoint
    * {(v, min(C)) : v ∈ C}; convergence = (count, hash-sum) stable,
    * checked once per round on the cached edge table.
    *
    * `checkpointEvery` defaults to 1 — NOT the laxer cadence of the
    * other fixpoint loops — because one star round references the
    * previous round's frame ~12× in the LOGICAL plan (e twice in the
    * symmetrized adjacency, again under both groupBy-min tables, again
    * on each join side), so an uncheckpointed k-round lineage is a
    * ~12^k-node plan that stalls canonicalization/cache-lookup long
    * before execution is the problem (measured: cadence 5 on a 41-node
    * chain wedged plan canonicalization for minutes; cadence 1 runs the
    * whole fixpoint in seconds). Min-label only doubles per round, which
    * is why IT can afford cadence 10. The checkpoint is LAZY and the
    * round's fingerprint aggregate materializes it, so each round is
    * one job, not a checkpoint job plus an aggregate job.
    *
    * `finishEdgeLimit`: star contraction shrinks the edge multiset
    * monotonically, so every run ENDS driver-sized — and the last
    * rounds of a ~1 s-per-round distributed loop on a few hundred
    * surviving edges are pure scheduling overhead. Once the current
    * fingerprint (which carries the exact count for free) shows the
    * multiset fits, the loop runs ONE distributed large-star pass and
    * collects ITS output — |large-star(e)| ≤ |e|, so the collect is
    * bounded by the same limit — then finishes with union-find on the
    * driver. Soundness: each star operation preserves the connected
    * components of the edge multiset (Kiveris et al. §3), components
    * of any intermediate multiset are the original components
    * restricted to its nodes, and no node with a real edge leaves the
    * multiset before fixpoint — so union-find over any intermediate
    * multiset IS the star fixpoint's answer. The distributed
    * contraction is therefore always exercised (the endgame itself is
    * a cluster-side large-star round, just materialized by the collect
    * instead of a checkpoint + fingerprint + collect job chain); 0
    * disables the tier entirely (pure star, the property-test pin).
    * This is the endgame hybridization a 100 TB run wants: O(log n)
    * distributed rounds while big, one bounded collect when the
    * contraction has done its job.
    */
  def connectedComponentsStar(spark: SparkSession, edges: DataFrame,
      maxIters: Int = 30, checkpointEvery: Int = 1,
      finishEdgeLimit: Long = 100000L): DataFrame = {
    import spark.implicits._
    // `dedup = false` skips the post-re-pointing distinct: the output
    // still has ≤ |e| rows (each undirected edge contributes exactly one
    // dst > src row into the join), so a consumer that tolerates
    // duplicate edges — the endgame union-find — saves a whole shuffle
    // of the multiset. The loop path keeps the distinct: it is what
    // shrinks the multiset round over round.
    def largeStar(e: DataFrame, dedup: Boolean = true): DataFrame = {
      val und = e.select(col("src"), col("dst"))
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = und.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      val repointed = und.filter(col("dst") > col("src"))
        .join(m, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
      if (dedup) repointed.distinct() else repointed
    }
    // small-star FUSED to large-star's output contract: every large-star
    // edge is already directed larger→smaller (the emitted (v, m) has
    // v > u ≥ m) and already distinct, so the generic small-star's input
    // re-normalization (greatest/least + distinct) is an identity on
    // this composition — skipping it saves one shuffle per round with a
    // bit-identical result frame.
    def smallStarOnDirected(dir: DataFrame): DataFrame = {
      val m = dir.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val viaNeighbors = dir.join(m, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
      val self = m.select(col("src"), col("m").as("dst"))
      viaNeighbors.union(self)
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // The input projection is cached ONCE and every derivation (the
    // contraction loop, the node roster, the singleton anti-join) reads
    // it — `edges` is typically the far end of an expensive pipeline
    // (LSH pair generation), and the roster referencing it directly
    // would re-run that pipeline inside the OUTPUT plan. Registered in
    // the query-scoped cache registry so Verify/Bench release it
    // between timings like the signature tables.
    val eAll = graft.ext.Dedup.cached(edges.select(col("src"), col("dst")))
    // contract: every node APPEARING in an edge gets a component row —
    // including self-loop-only nodes, which the contraction below drops
    // (a self-loop carries no connectivity). No node with a REAL edge
    // ever leaves the multiset before fixpoint (the component min stays
    // a join/groupBy key and every non-min node survives as either a
    // re-pointed source or a star leaf), so the only roster the output
    // needs beyond the fixpoint edges is the self-loop endpoints — a
    // pushed-down filter over the cached input, NOT the full-roster
    // union+distinct over 2|E| rows the earlier formulation paid.
    val selfLoopers = eAll.filter(col("src") === col("dst"))
      .select(col("src").as("node")).distinct()
    // round 1 normalizes the raw input itself: large-star tolerates
    // duplicate edges, both orientations, and self-loops (dups collapse
    // in its distinct; self-loops die in the dst > src filter) — the
    // dedicated filter+distinct+cache pass the loop used to pay before
    // round 1 was a whole extra shuffle of the pair table.
    var e = eAll
    // change detector: (row count, order-independent hash sum) — src+dst
    // sums can collide across distinct edge sets under re-pointing
    def fingerprint(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)),
        sum(hash(col("src"), col("dst")).cast("long"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var fp = fingerprint(e)
    var iter = 0
    var done = fp._1 == 0
    var lastCheckpoint: DataFrame = e
    // eAll belongs to the query-scoped registry — never retire it here
    def release(d: DataFrame): Unit =
      if (d ne eAll) d.unpersist(blocking = false)
    while (iter < maxIters && !done) {
      // endgame tier (see Scaladoc): the multiset is driver-sized, so
      // run one distributed large-star pass, collect its (bounded)
      // output, and finish with union-find — two stage waves instead
      // of a full round + checkpoint + fingerprint + collect chain
      if (finishEdgeLimit > 0 && fp._1 <= finishEdgeLimit) {
        lastStarRounds = iter
        val es = largeStar(e, dedup = false).as[(Long, Long)].collect()
        release(e)
        // when checkpointEvery > 1 the endgame can fire on a
        // non-checkpoint round where e is a cache() frame layered on an
        // OLDER localCheckpoint — release that frame too or it stays
        // pinned for the session (r9 advice)
        if (lastCheckpoint ne e) release(lastCheckpoint)
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        es.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val nodes = es.iterator.flatMap(p => Iterator(p._1, p._2)).toSeq.distinct
        val mapped = nodes.map(n => (n, find(n))).toDF("node", "component")
        // mapped is driver-local and ≤ 2*finishEdgeLimit nodes by
        // construction — broadcast the anti-join probe side
        val singletons = selfLoopers
          .join(broadcast(mapped), Seq("node"), "left_anti")
          .select(col("node"), col("node").as("component"))
        return mapped.union(singletons)
      }
      val next0 = smallStarOnDirected(largeStar(e))
      val prev = e
      // LAZY checkpoint/cache: the fingerprint aggregate below is the
      // first action and materializes it — one job per round. Retiring
      // prev must wait until AFTER that job (the lazy checkpoint still
      // reads prev's blocks while materializing).
      val isCp = (iter + 1) % checkpointEvery == 0
      e = if (isCp) next0.localCheckpoint(false) else next0.cache()
      val nfp = fingerprint(e)
      if (isCp) {
        if (prev ne lastCheckpoint) release(prev)
        release(lastCheckpoint)
        lastCheckpoint = e
      }
      // an empty multiset is trivially the fixpoint (self-loop-only
      // inputs contract to nothing in one round — don't run two more
      // rounds on empty frames just to see the fingerprint stabilize)
      if (nfp == fp || nfp._1 == 0) done = true
      else fp = nfp
      // release prev on every path incl. the convergence round (same
      // leak shape as the min-label loop)
      if ((prev ne lastCheckpoint) && (prev ne e)) release(prev)
      iter += 1
    }
    lastStarRounds = iter
    if (!done) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIters rounds — " +
        "the bound is O(log n); raise maxIters only for astronomically " +
        "large graphs, otherwise suspect an edge-generation bug.")
    // fixpoint edges are the stars (v → component min); centers map to
    // themselves; nodes that fell out (self-loop-only) are their own
    // singleton components
    val stars = e.select(col("src").as("node"), col("dst").as("component"))
    val centers = e.select(col("dst")).distinct()
      .select(col("dst").as("node"), col("dst").as("component"))
    val mapped = stars.union(centers).distinct()
    val singletons = selfLoopers.join(mapped, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    mapped.union(singletons)
  }
}
