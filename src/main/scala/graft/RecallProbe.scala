package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.Similarity

/** ANN recall-vs-cost probe (SCALE.md): measured recall@k of the
  * approximate retrieval paths against the exact brute-force baseline —
  * ivfTopK across an nprobe sweep, rpTopK (multi-probe random
  * hyperplane LSH), and bucketedTopK (single sign bucket) — on the
  * driver-provided embeddings table. The recall SPECS pin a floor at
  * sf0.01; this prints the measured curve at a chosen SF so the
  * recall-vs-cost tradeoff is a recorded number, not an assumption.
  *
  * Usage: runMain graft.RecallProbe [sfDir] [k] [nQueries]
  *    or: runMain graft.RecallProbe --clustered [n] [k] [nQueries]
  *
  * The `--clustered` mode swaps the (uniform) driver embeddings for a
  * seeded mixture-of-Gaussians fixture and measures trained
  * ([[Similarity.kmeansCentroids]]) against untrained (first-N)
  * coarse quantization, reporting the SCANNED FRACTION next to each
  * recall so "recall >> scan fraction" is a measured claim: on uniform
  * data any 16-way partition gives recall ~ scan fraction (there is no
  * cluster structure to exploit), so the trained-centroid payoff only
  * shows on clustered data — which is what real embedding corpora are.
  *
  * Prints one JSON line per variant: mean recall@k + wall seconds
  * (+ scanned corpus fraction for the IVF variants).
  */
object RecallProbe {

  /** Seeded mixture-of-Gaussians: `nClusters` unit-scale Gaussian
    * centers, each vector = center + sigma*noise, cluster drawn
    * per-row from the same seeded stream (so the first 16 vec_ids are
    * NOT one-per-cluster — untrained first-N centroids start from a
    * biased sample, as they would in production).
    */
  def clusteredFixture(spark: SparkSession, n: Int, dim: Int = 64,
                       nClusters: Int = 16, sigma: Double = 0.25,
                       seed: Long = 20260813L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      val c = rnd.nextInt(nClusters)
      val v = Array.tabulate(dim)(d => (centers(c)(d) + sigma * rnd.nextGaussian()).toFloat).toSeq
      (i.toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label").repartition(8)
  }

  /** Incremental-IVF drift probe (`--drift [nBase] [growth]`): train on
    * the base fixture, grow the corpus growth:1 with vectors from a
    * DIFFERENT seeded mixture (16 Gaussian centers the trained index
    * has never seen), ingest assignment-only ([[Similarity.ivfAssign]]),
    * and measure what staleness costs: recall at fixed nprobe for
    * base-distribution vs drifted queries, plus the cell-skew ratio
    * (max cell share × nCells — 1.0 = perfectly balanced). The same
    * sweep repeats under RETRAINED centroids (full Lloyd on the grown
    * corpus) so the gap IS the retrain payoff. SCALE.md's retrain
    * trigger rule is calibrated from these rows.
    */
  private def runDrift(spark: SparkSession, args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val nBase = args.lift(1).map(_.toInt).getOrElse(10000)
    val growth = args.lift(2).map(_.toInt).getOrElse(4)
    // how many NEW clusters the drifted mass concentrates in: 16 (the
    // default) models gradual topic drift; small values model a burst
    // (one new domain flooding in) — the case that skews cells hardest
    val driftClusters = args.lift(3).map(_.toInt).getOrElse(16)
    val k = 10
    val nQ = 16 // per regime (base-drawn + drift-drawn)
    val base = clusteredFixture(spark, nBase).cache()
    val drift = clusteredFixture(spark, nBase * growth,
        nClusters = driftClusters, seed = 20260814L)
      .select((col("vec_id") + nBase).as("vec_id"), col("embedding"),
        col("label")).cache()
    val grown = base.unionAll(drift).cache()
    val n = grown.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (stale, tStale) = time { Similarity.kmeansCentroids(base, 16, 5) }
    val (retrained, tRe) = time { Similarity.kmeansCentroids(grown, 16, 5) }
    println(f"""{"probe":"ivf_drift","n_base":$nBase,"growth":$growth,"drift_clusters":$driftClusters,"train_stale_sec":$tStale%.2f,"retrain_sec":$tRe%.2f}""")

    val queryIds = (0L until nQ.toLong) ++
      (nBase.toLong until (nBase + nQ).toLong)
    // exact ground truth per query over the GROWN corpus
    val truth: Map[Long, Set[Long]] = queryIds.map { q =>
      q -> Similarity.bruteForceTopK(grown, q, k)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    }.toMap

    for ((srcName, cents) <- Seq("stale_base_trained" -> stale,
        "retrained_full" -> retrained)) {
      val cellSizes = Similarity.ivfAssign(grown, cents)
        .groupBy(col("cell")).count().collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // skew: max cell share × nCells (1.0 = balanced); stale centroids
      // let the drifted mass pile into few old cells
      val skew = cellSizes.map(_._2).max.toDouble * cents.size / n
      // the CHEAP online trigger: mean best-cosine of each row to its
      // assigned centroid, split by regime — computed for free during
      // ingest assignment, and it drops for drifted rows long before
      // anyone measures recall (no ground truth or retrain needed)
      import org.apache.spark.sql.functions.{array, array_max, avg, typedLit, when}
      val bestCos = array_max(array(cents.map(c =>
        Similarity.cosine(col("embedding"), typedLit(c._2))): _*))
      val assignCos = grown.select(
          when(col("vec_id") < nBase, "base").otherwise("drift").as("regime"),
          bestCos.as("c"))
        .groupBy(col("regime")).agg(avg(col("c")).as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      for (nprobe <- Seq(1, 2, 4)) {
        val byQ = queryIds.map { q =>
          q -> Similarity.ivfTopK(grown, q, k, nCentroids = 16,
              nprobe = nprobe, centroids = Some(cents))
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        }.toMap
        def recallOver(qs: Seq[Long]): Double =
          qs.map(q => byQ(q).count(truth(q)).toDouble / truth(q).size)
            .sum / qs.size
        val rBase = recallOver(queryIds.filter(_ < nBase))
        val rDrift = recallOver(queryIds.filter(_ >= nBase))
        println(f"""{"probe":"ivf_drift","variant":"$srcName%s","nprobe":$nprobe,"recall_base":$rBase%.4f,"recall_drift":$rDrift%.4f,"cell_skew":$skew%.2f,"assign_cos_base":${assignCos("base")}%.4f,"assign_cos_drift":${assignCos("drift")}%.4f}""")
      }
    }
  }

  /** PQ recall probe (`--pq [n]`): seed vs L2-Lloyd-trained codebooks
    * at m ∈ {4, 8} on the clustered fixture, recall@10 against exact
    * L2 over 16 queries — the measured version of the Pq scaladoc's
    * "trained codebooks recover recall" claim, and the sizing basis
    * for how much the tier-3 float re-rank must widen (r/k) under each
    * codebook regime.
    */
  private def runPq(spark: SparkSession, args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.ext.Pq
    val n = args.lift(1).map(_.toInt).getOrElse(4000)
    val ksub = args.lift(2).map(_.toInt).getOrElse(16)
    val k = 10
    val nQ = 16
    val all = clusteredFixture(spark, n).cache()
    val vecs = all.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def sdot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += (a(i) * b(i)).toDouble; i += 1 }
      acc
    }
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      sdot(a, a) - 2.0 * sdot(a, b) + sdot(b, b)
    val truth: Map[Long, Set[Long]] = (0L until nQ.toLong).map { q =>
      val qv = vecs.find(_._1 == q).get._2
      q -> vecs.filter(_._1 != q)
        .sortBy { case (id, v) => (l2(qv, v), id) }.take(k).map(_._1).toSet
    }.toMap
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def l2kInt(a: Seq[Float], b: Seq[Float]): Long =
      math.floor(l2(a, b) * 1e6 + 0.5).toLong
    for (m <- Seq(4, 8)) {
      val seed = Pq.seedCodebooks(all, m, ksub)
      val (trained, tTrain) = time(Pq.trainCodebooks(all, m, ksub, iters = 3))
      val d = 64 / m
      for ((name, cbs, ts) <- Seq(("seed", seed, 0.0),
          ("trained_l2_lloyd", trained, tTrain))) {
        // driver replay of the gated encode/ADC (engine parity is
        // spec-pinned; the probe sweeps r, which needs many rankings)
        val codes: Array[(Long, Array[Int])] = vecs.map { case (id, v) =>
          id -> (0 until m).map { j =>
            val sub = v.slice(j * d, j * d + d)
            cbs(j).minBy { case (c, cv) => (l2kInt(sub, cv), c) }._1.toInt
          }.toArray
        }
        def adcRank(q: Long): Seq[Long] = {
          val qv = vecs.find(_._1 == q).get._2
          val tbl = (0 until m).map { j =>
            val qsub = qv.slice(j * d, j * d + d)
            cbs(j).sortBy(_._1).map { case (_, cv) => l2kInt(qsub, cv) }.toArray
          }
          codes.filter(_._1 != q).map { case (id, cs) =>
            (id, (0 until m).map(j => tbl(j)(cs(j))).sum)
          }.sortBy { case (id, dd) => (dd, id) }.map(_._1).toSeq
        }
        // raw ADC@k, and the TIERED pipeline: ADC top-r -> exact-float
        // re-rank -> top-k (the SCALE.md three-tier shape; r/k is the
        // re-rank width the codebook quality buys down)
        val rs = Seq(50, 100, 200)
        val sums = Array.fill(rs.size + 1)(0.0)
        for (q <- 0L until nQ.toLong) {
          val qv = vecs.find(_._1 == q).get._2
          val ranked = adcRank(q)
          sums(0) += ranked.take(k).count(truth(q)).toDouble / k
          for ((r, i) <- rs.zipWithIndex) {
            val rerank = ranked.take(r)
              .map(id => (id, l2(qv, vecs.find(_._1 == id).get._2)))
              .sortBy { case (id, dd) => (dd, id) }.take(k).map(_._1)
            sums(i + 1) += rerank.count(truth(q)).toDouble / k
          }
        }
        val raw = sums(0) / nQ
        val rr = rs.zipWithIndex
          .map { case (r, i) => s""""rerank_at_$r":${f"${sums(i + 1) / nQ}%.4f"}""" }
          .mkString(",")
        println(s"""{"probe":"pq_recall","n":$n,"m":$m,"ksub":$ksub,"codebooks":"$name","adc_raw":${f"$raw%.4f"},$rr,"train_sec":${f"$ts%.2f"}}""")
      }
    }
    all.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val clustered = args.headOption.contains("--clustered")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)
    if (args.headOption.contains("--drift")) {
      try runDrift(spark, args) finally spark.stop()
      return
    }
    if (args.headOption.contains("--pq")) {
      try runPq(spark, args) finally spark.stop()
      return
    }
    import org.apache.spark.sql.functions.col

    val (emb, sfDir, k, nQ) =
      if (clustered) {
        val n = args.lift(1).map(_.toInt).getOrElse(20000)
        (clusteredFixture(spark, n).cache(),
          s"clustered_fixture_n$n",
          args.lift(2).map(_.toInt).getOrElse(10),
          args.lift(3).map(_.toInt).getOrElse(32))
      } else {
        val d = args.headOption.getOrElse("/root/testdata/sf0.1")
        (Tables.embeddings(spark, d).cache(), d,
          args.lift(1).map(_.toInt).getOrElse(10),
          args.lift(2).map(_.toInt).getOrElse(32))
      }
    val n = emb.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // exact ground truth for query ids [0, nQ): one batch pass
    val (exactRows, tExact) = time {
      Similarity.batchTopK(emb, nQ, k).collect()
    }
    val exact: Map[Long, Set[Long]] = exactRows
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap

    def recallOf(byQuery: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        byQuery.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
      }
      per.sum / per.size
    }

    def report(variant: String, recall: Double, sec: Double,
               scannedFrac: Option[Double] = None): Unit = {
      val extra = scannedFrac.map(f => f""","scanned_frac":$f%.4f""").getOrElse("")
      println(s"""{"probe":"ann_recall","sf_dir":"$sfDir","n_vectors":$n,""" +
        s""""k":$k,"n_queries":$nQ,"variant":"$variant",""" +
        f""""recall_at_k":$recall%.4f,"sec":$sec%.2f$extra}""")
    }

    report("exact_batch_baseline", 1.0, tExact)

    // rpTopK: batch-shaped, same query ids, one pass
    val (rpRows, tRp) = time { Similarity.rpTopK(emb, nQ, k).collect() }
    val rpBy = rpRows.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    report("rp_lsh_multiprobe", recallOf(rpBy), tRp)

    // centroid sources to sweep: untrained first-16, and (clustered mode)
    // Lloyd's-trained — same assignment/probe plan, different centroids
    val firstN = emb.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val centroidSources: Seq[(String, Seq[(Long, Seq[Float])])] =
      if (clustered) {
        val (trained, tTrain) = time { Similarity.kmeansCentroids(emb, 16, 5) }
        println(s"""{"probe":"ann_recall","sf_dir":"$sfDir","variant":"kmeans_train",""" +
          f""""iters":5,"sec":$tTrain%.2f}""")
        // sampled training (10% deterministic hash-sample per Lloyd
        // iteration): the 100 TB recipe SCALE.md prescribes — this row
        // is what makes "sampling works" a measured claim, not a note
        val (sampled, tSampled) = time {
          Similarity.kmeansCentroids(emb, 16, 5, samplePermille = 100)
        }
        println(s"""{"probe":"ann_recall","sf_dir":"$sfDir","variant":"kmeans_train_s10pct",""" +
          f""""iters":5,"sec":$tSampled%.2f}""")
        // 1% floor: ~n/100 training points across 16 cells — where the
        // sampling curve is EXPECTED to start costing recall
        val (sampled1, tSampled1) = time {
          Similarity.kmeansCentroids(emb, 16, 5, samplePermille = 10)
        }
        println(s"""{"probe":"ann_recall","sf_dir":"$sfDir","variant":"kmeans_train_s1pct",""" +
          f""""iters":5,"sec":$tSampled1%.2f}""")
        Seq("first16" -> firstN, "trained" -> trained,
          "trained_s10pct" -> sampled, "trained_s1pct" -> sampled1)
      } else Seq("first16" -> firstN)

    // query vectors once (driver-side; nQ x dim floats)
    val qVecs: Map[Long, Seq[Float]] = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap

    for ((srcName, cents) <- centroidSources) {
      // cell sizes under this centroid set — for the measured scan fraction
      val cellSizes: Map[Long, Long] = emb
        .withColumn("cell", Similarity.nearestCentroid(cents, col("embedding")))
        .groupBy(col("cell")).count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      for (nprobe <- Seq(1, 2, 4, 8)) {
        // mean scanned fraction: per query, the probed cells' share of n
        // (probe selection shared with ivfTopK so ties resolve identically)
        val scanned = qVecs.values.map { qv =>
          Similarity.probeCells(cents, qv, nprobe)
            .map(cellSizes.getOrElse(_, 0L)).sum.toDouble / n
        }.sum / qVecs.size
        val (byQ, tIvf) = time {
          (0L until nQ.toLong).map { q =>
            q -> Similarity.ivfTopK(emb, q, k, nCentroids = 16, nprobe = nprobe,
                centroids = Some(cents))
              .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          }.toMap
        }
        report(s"ivf_${srcName}_nprobe_$nprobe", recallOf(byQ), tIvf, Some(scanned))
      }
    }

    // single sign-bucket ANN (q24's path) for context
    val (bkByQ, tBk) = time {
      (0L until nQ.toLong).map { q =>
        q -> Similarity.bucketedTopK(emb, q, k)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      }.toMap
    }
    report("sign_bucket", recallOf(bkByQ), tBk)

    spark.stop()
  }
}
