package graft

import org.apache.spark.sql.SparkSession

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
  * Prints one JSON line per variant: mean recall@k + wall seconds.
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nQ = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)
    import org.apache.spark.sql.functions.col

    val emb = Tables.embeddings(spark, sfDir).cache()
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

    def report(variant: String, recall: Double, sec: Double): Unit =
      println(s"""{"probe":"ann_recall","sf_dir":"$sfDir","n_vectors":$n,""" +
        s""""k":$k,"n_queries":$nQ,"variant":"$variant",""" +
        f""""recall_at_k":$recall%.4f,"sec":$sec%.2f}""")

    report("exact_batch_baseline", 1.0, tExact)

    // rpTopK: batch-shaped, same query ids, one pass
    val (rpRows, tRp) = time { Similarity.rpTopK(emb, nQ, k).collect() }
    val rpBy = rpRows.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    report("rp_lsh_multiprobe", recallOf(rpBy), tRp)

    // ivfTopK: per-query path, nprobe sweep
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val (byQ, tIvf) = time {
        (0L until nQ.toLong).map { q =>
          q -> Similarity.ivfTopK(emb, q, k, nCentroids = 16, nprobe = nprobe)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        }.toMap
      }
      report(s"ivf_nprobe_$nprobe", recallOf(byQ), tIvf)
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
