package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.ext.{Dedup, Pii, TextStats}

/** Round-5 corpus operators: PII redaction, snapshot diff, bounded
  * inverted index, keeper-policy drop list, Bloom-prefiltered
  * decontamination. Each bounded/pre-filtered scale path is asserted
  * EQUAL to its naive reference formulation — the same discipline the
  * interval-join and hamming-blocking specs use.
  */
class CorpusOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // the sweep drives SparkEntry.queries, whose SQL-TVF members
    // (q111/q118/q119) assume the Verify/Bench session contract
    org.apache.spark.sql.graft.GraftExtensions.install(s)
    s
  }

  test("Pii.redact masks each planted PII class exactly once, in order") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach bob@x.io or 10.2.3.4 call 555-1234 end"),
      (2L, "no pii here just words and 3.14 and 1.2"),
      (3L, "multi a@b.co c.d@e.org 1.2.3.4 9.9.9.9 111-2222 333-4444")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id",
      Pii.emailCount($"text").as("e"),
      Pii.ipv4Count($"text").as("i"),
      Pii.phoneCount($"text").as("p"),
      Pii.redact($"text").as("red"))
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 1L, 1L, 1L,
      "reach <EMAIL> or <IP> call <PHONE> end")))
    assert(got(1) === ((2L, 0L, 0L, 0L,
      "no pii here just words and 3.14 and 1.2")))
    assert(got(2) === ((3L, 2L, 2L, 2L,
      "multi <EMAIL> <EMAIL> <IP> <IP> <PHONE> <PHONE>")))
  }

  test("Pii.redact is idempotent and ignores 4000-octet near-IPs") {
    import spark.implicits._
    val df = Seq(
      (1L, "u1@ex.com 10.0.0.1 555-0000"),
      (2L, "ver 10.20.30.4000 is not an address, 12-3456 not a phone")
    ).toDF("doc_id", "text")
    val once = df.select($"doc_id", Pii.redact($"text").as("red"))
    val twice = once.select($"doc_id", Pii.redact($"red").as("red"))
    assert(once.collect().toSet === twice.collect().toSet)
    val r2 = once.filter($"doc_id" === 2).select($"red").as[String].head()
    assert(r2 === "ver 10.20.30.4000 is not an address, 12-3456 not a phone")
  }

  test("q78 snapshot diff emits exactly the simulated delta") {
    import spark.implicits._
    val got = graft.queries.LlmQueries.queries("q78_snapshot_diff")(spark, sf)
      .as[(Long, String)].collect().toSet
    val ids = Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val want =
      ids.filter(_ % 17 == 0).map(i => (i, "removed")) ++
        ids.filter(i => i % 10 == 0 && i % 17 != 0).map(i => (i, "changed")) ++
        ids.filter(_ % 23 == 0).map(i => (i + 1000000000000L, "added"))
    assert(got === want)
  }

  test("q79 bounded posting sample == collect-sort-slice reference") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val bg = Dedup.bigramCodes(TextStats.tokenCodesOf($"text"))
    val posting = docs.select($"doc_id", explode_outer(bg).as("code"))
      .filter($"code".isNotNull)
    val ref = posting.groupBy($"code")
      .agg(count(lit(1)).as("df"),
        array_join(transform(
          slice(sort_array(collect_set($"doc_id")), 1, 10),
          x => x.cast("string")), ",").as("post_sample"))
      .orderBy($"df".desc, $"code").limit(20)
      .as[(Long, Long, String)].collect().toSet
    val got = graft.queries.LlmQueries.queries("q79_inverted_index")(spark, sf)
      .as[(Long, Long, String)].collect().toSet
    assert(got === ref)
    assert(got.size === 20)
  }

  test("q80 keeper is each cluster's longest doc (doc_id tiebreak)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashPairs(docs, minJaccard = 0.7)
      .select($"doc1".as("src"), $"doc2".as("dst"))
    val members = graft.operators.Graph.connectedComponents(spark, pairs)
      .join(docs.select($"doc_id".as("node"), $"n_chars"), Seq("node"))
    val w = Window.partitionBy($"component")
      .orderBy($"n_chars".desc, $"node")
    val keepers = members.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"component", $"node".as("keep_doc_id"))
    val ref = members.join(keepers, Seq("component"))
      .filter($"node" =!= $"keep_doc_id")
      .select($"node", $"keep_doc_id")
      .as[(Long, Long)].collect().toSet
    val got = graft.queries.LlmQueries
      .queries("q80_dedup_keep_longest")(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(got === ref)
    assert(got.nonEmpty)
    // tiebreak sanity: a keeper is never itself in the drop list
    assert(got.map(_._1).intersect(got.map(_._2)).isEmpty)
    Dedup.clearSignatureCaches()
  }

  test("contaminationBloom == contamination (prune never changes output)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .withColumn("b", pmod($"doc_id" * 48271L, lit(10L)))
    val train = docs.filter($"b" < 7).drop("b")
    val test_ = docs.filter($"b" >= 7).drop("b")
    val exact = Dedup.contamination(train, test_)
      .as[(Long, Long)].collect().toSet
    for (fpp <- Seq(0.5, 0.03, 0.001)) {
      val bloomed = Dedup.contaminationBloom(train, test_, fpp)
        .as[(Long, Long)].collect().toSet
      assert(bloomed === exact, s"fpp=$fpp")
    }
    assert(exact.nonEmpty)
    Dedup.clearSignatureCaches()
  }

  test("q82 vocab is exactly the global top-20; OOV counts tie out") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", explode_outer(TextStats.tokenCodesOf($"text")).as("code"))
      .filter($"code".isNotNull)
    val freq = toks.groupBy($"code").count()
      .as[(Long, Long)].collect()
      .sortBy { case (code, cnt) => (-cnt, code) }
    val vocab = freq.take(20).map(_._1).toSet
    val ref = toks.as[(Long, Long)].collect()
      .groupBy(_._1).map { case (doc, rows) =>
        val n = rows.length.toLong
        val oov = rows.count(r => !vocab.contains(r._2)).toLong
        (doc, n, oov,
          math.floor(oov.toDouble / n * 10000 + 0.5) / 10000)
      }.toSet
    val got = graft.queries.LlmQueries.queries("q82_vocab_coverage")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === ref)
  }

  test("q83 bigram NLL matches a local model on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "a b c"),
      (3L, "c c c c"),
      (4L, "z")  // no bigrams -> must drop out
    ).toDF("doc_id", "text")
    val P = TextStats.P
    def tcode(t: String): Long =
      t.foldLeft(0L)((h, c) => (h * 31 + c) % P)
    val corpus = Seq("a b a b a", "a b c", "c c c c", "z")
      .map(_.split(" ").toSeq.map(tcode))
    val pairs = corpus.flatMap(cs => cs.zip(cs.drop(1)))
    val cA = pairs.groupBy(_._1).view.mapValues(_.size).toMap
    // bigrams keyed by the exact (a, b) pair, as the operator does
    val cAB = pairs.groupBy(identity).view.mapValues(_.size).toMap
    val vs = corpus.flatten.distinct.size
    def lp4(a: Long, b: Long): Long = {
      val p = (cAB((a, b)) + 1.0) / (cA(a) + vs)
      math.floor(math.log(p) * 10000 + 0.5).toLong
    }
    val ref = corpus.zipWithIndex.flatMap { case (cs, i) =>
      val bs = cs.zip(cs.drop(1))
      if (bs.isEmpty) None
      else {
        val s4 = bs.map { case (a, b) => lp4(a, b) }.sum
        Some((i + 1L, bs.size.toLong,
          math.floor(-s4.toDouble / (bs.size * 10000.0) * 10000 + 0.5) / 10000))
      }
    }.toSet
    val got = graft.ext.LangModel.bigramNll(docs)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === ref)
    assert(!got.exists(_._1 == 4L), "a bigram-less doc must drop out")
    // the repetitive doc is the most predictable: lowest avg_nll
    val byDoc = got.map(t => t._1 -> t._3).toMap
    assert(byDoc(3L) < byDoc(1L) && byDoc(1L) < byDoc(2L))
    Dedup.clearSignatureCaches()
  }

  test("q84 max_by assignment == window-argmax reference; cells partition corpus") {
    import spark.implicits._
    import graft.ext.Similarity
    import graft.queries.Num.{r => rnd}
    val emb = Tables.embeddings(spark, sf)
    val cents = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cell"), $"embedding".as("cvec"))
    val scored = emb.crossJoin(broadcast(cents))
      .select($"vec_id",
        $"cell", rnd(Similarity.cosine($"embedding", $"cvec"), 6).as("cos"))
    val w = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"cell")
    val refAssign = scored.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"vec_id", $"cell")
      .as[(Long, Long)].collect().toMap
    val gotProfile = graft.queries.LlmQueries
      .queries("q84_cluster_profile")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    // cells partition the corpus
    assert(gotProfile.map(_._2).sum === emb.count())
    // per-cell counts match the window-argmax assignment
    val refCounts = refAssign.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(gotProfile.map(t => t._1 -> t._2).toMap === refCounts)
    // a centroid is its own nearest centroid (cos 1.0 beats everything)
    (0L until 8L).foreach(c => assert(refAssign(c) === c))
  }

  test("q98 outlier cosine matches an exact driver-side integer replay") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Seq[Float])].collect()
    // exact integer replay of the documented pipeline: micro-quantize,
    // average per label (rounded once), integer dot/norms, one division
    def micro(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong)
    val byLabel = emb.groupBy(_._2)
    val cm: Map[Int, Seq[Long]] = byLabel.view.mapValues { vs =>
      val ms = vs.map(t => micro(t._3))
      val n = ms.size
      (0 until ms.head.size).map { i =>
        math.floor(ms.map(_(i)).sum.toDouble / n + 0.5).toLong
      }
    }.toMap
    val want = emb.map { case (vid, label, v) =>
      val vm = micro(v); val c = cm(label)
      val dot = vm.zip(c).map { case (a, b) => a * b }.sum
      val cos = dot.toDouble /
        (math.sqrt(vm.map(a => a * a).sum.toDouble) *
          math.sqrt(c.map(b => b * b).sum.toDouble))
      (vid, math.floor(cos * 1000000 + 0.5) / 1000000)
    }.toMap
    val got = graft.queries.LlmQueries
      .queries("q98_embedding_outliers")(spark, sf)
      .select($"vec_id", $"cos_centroid", $"is_outlier")
      .as[(Long, Double, Boolean)].collect()
    assert(got.length === emb.length)
    got.foreach { case (vid, cos, outlier) =>
      assert(cos === want(vid), s"vec $vid")
      assert(outlier === (cos < 0.0), s"vec $vid flag")
    }
    // the screen is live: both cohort members and outliers exist
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("Pii scrub runs unchanged on a stream (stateless narrow map)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "mail a@b.co and 10.1.2.3"),
      (2L, "call 555-6789 now"),
      (3L, "clean text only"))
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("doc_id", "text")
      .select($"doc_id", Pii.redact($"text").as("red"),
        (Pii.emailCount($"text") + Pii.ipv4Count($"text") +
          Pii.phoneCount($"text")).as("n_pii"))
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("pii_stream")
        .as[(Long, String, Long)].collect().toSet
      val want = rows.toDF("doc_id", "text")
        .select($"doc_id", Pii.redact($"text").as("red"),
          (Pii.emailCount($"text") + Pii.ipv4Count($"text") +
            Pii.phoneCount($"text")).as("n_pii"))
        .as[(Long, String, Long)].collect().toSet
      assert(got === want)
      assert(got.exists(_._2 == "mail <EMAIL> and <IP>"))
    } finally q.stop()
  }

  test("q85 corpus report ties out against its constituent queries") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val r = graft.queries.LlmQueries.queries("q85_corpus_report")(spark, sf)
      .collect().head
    val nDocs = docs.count()
    assert(r.getAs[Long]("n_docs") === nDocs)
    assert(r.getAs[Long]("n_exact_dup_docs") ===
      nDocs - docs.select($"text").distinct().count())
    val nKeep = graft.queries.LlmQueries
      .queries("q67_repetition_filter")(spark, sf)
      .filter($"keep").count()
    assert(r.getAs[Double]("quality_keep_rate") ===
      math.floor(nKeep.toDouble / nDocs * 10000 + 0.5) / 10000)
    val ent = r.getAs[Double]("lang_entropy")
    val nLangs = docs.select($"lang").distinct().count()
    assert(ent >= 0.0 && ent <= math.log(nLangs.toDouble) + 1e-4)
  }

  test("PrefixSum two-phase scan == window cumsum (randomized, skewed)") {
    import spark.implicits._
    import graft.operators.PrefixSum
    for (seed <- Seq(7, 21)) {
      val rnd = new scala.util.Random(seed)
      // 90% of rows in one key -> the giant group a window would put
      // through a single task; several small keys; values 0..99
      val rows = (0 until 3000).map { i =>
        val k = if (rnd.nextInt(10) > 0) "big" else s"k${rnd.nextInt(5)}"
        (k, i.toLong, rnd.nextInt(100).toLong)
      }
      val df = rows.toDF("key", "ord", "v")
      val got = PrefixSum.cumSumByKey(df, "key", Seq("ord"), "v")
        .select($"key", $"ord", $"cum")
        .as[(String, Long, Long)].collect().toSet
      val w = Window.partitionBy($"key").orderBy($"ord")
      val want = df.withColumn("cum", sum($"v").over(w))
        .select($"key", $"ord", $"cum")
        .as[(String, Long, Long)].collect().toSet
      assert(got === want, s"seed=$seed")
      Dedup.clearSignatureCaches()
    }
  }

  test("PrefixSum matches window-sum NULL semantics on leading nulls") {
    import spark.implicits._
    import graft.operators.PrefixSum
    // sum() OVER is NULL until the frame's first non-null value; a key
    // whose leading rows are all null must emit NULL cums, not 0 —
    // including when the null run crosses partitions (key "n" below is
    // large enough to span range partitions)
    val rows =
      (0 until 200).map(i => ("n", i.toLong, Option.empty[Long])) ++
        Seq(("n", 200L, Some(5L)), ("n", 201L, None), ("n", 202L, Some(3L))) ++
        Seq(("m", 0L, Some(1L)), ("m", 1L, None))
    val df = rows.toDF("key", "ord", "v")
    val got = PrefixSum.cumSumByKey(df, "key", Seq("ord"), "v")
      .select($"key", $"ord", $"cum")
      .as[(String, Long, Option[Long])].collect().toSet
    val w = Window.partitionBy($"key").orderBy($"ord")
    val want = df.withColumn("cum", sum($"v").over(w))
      .select($"key", $"ord", $"cum")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got === want)
    // spot-pin the shape: all-null prefix is None, then sums ignore nulls
    val n = got.filter(_._1 == "n").toSeq.sortBy(_._2)
    assert(n.take(200).forall(_._3.isEmpty), "leading nulls must be NULL")
    assert(n(200)._3 === Some(5L) && n(201)._3 === Some(5L) && n(202)._3 === Some(8L))
    Dedup.clearSignatureCaches()
  }

  test("PrefixSum fails loud on high-cardinality keys (driver-state guard)") {
    import spark.implicits._
    import graft.operators.PrefixSum
    // keyed by a unique id: driver state would be (partitions x rows) —
    // the guard must trip instead of silently shipping it to the driver
    val df = (0 until 500).map(i => (s"doc$i", i.toLong, 1L))
      .toDF("key", "ord", "v")
    val e = intercept[Exception] {
      PrefixSum.cumSumByKey(df, "key", Seq("ord"), "v",
        maxKeysPerPartition = 16).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("distinct"), s"unexpected failure: $e")
    Dedup.clearSignatureCaches()
    // and the same data keyed low-cardinality still flows
    val ok = df.withColumn("key", lit("one"))
    assert(PrefixSum.cumSumByKey(ok, "key", Seq("ord"), "v").count() === 500)
    Dedup.clearSignatureCaches()
  }

  test("q86 factors upsample every language to ~the largest one") {
    import spark.implicits._
    val got = graft.queries.LlmQueries
      .queries("q86_rebalance_upsample")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val counts = Tables.documents(spark, sf).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val maxN = counts.values.max
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val factor = rows.head._3
      assert(factor === math.max(1L, maxN / counts(lang)))
      // one aggregate row per replica, each covering every doc once
      assert(rows.map(_._4).sorted.toSeq === (1L to factor))
      assert(rows.forall(_._5 === counts(lang)))
      assert(rows.map(_._6).distinct.length === 1, "replica id_sum equal")
    }
  }

  test("kernels survive null, empty, and non-ASCII text") {
    import spark.implicits._
    // null text must not NPE any pair generator or kernel; identical
    // unicode docs must still pair as near-dups (kernels are UTF-16
    // self-consistent even where the frozen ASCII oracles don't reach)
    val uni = "emoji 😀 text 中文 mixed rtl שלום " +
      "tail one two three four five six seven"
    val docs = Seq(
      (1L, uni), (2L, uni),
      (3L, null.asInstanceOf[String]), (4L, ""), (5L, "solo")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, minJaccard = 0.7)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(Dedup.bigramJaccardPairs(docs, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // empty/null docs are EXCLUDED (round 8): they used to share a
    // degenerate sentinel simhash and pair quadratically — the guard
    // now mirrors the jaccard generators (oracle filters len(tset)>0)
    assert(Dedup.hammingPairs(docs, maxDist = 3)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    val red = docs.select(Pii.redact($"text")).as[String].collect()
    assert(red.count(_ == null) === 1)
    val fps = docs.select(TextStats.fingerprint($"text")).collect()
    assert(fps.length === 5)
    Dedup.clearSignatureCaches()
  }

  test("every corpus operator executes on a degenerate corpus (no ANSI crashes)") {
    import spark.implicits._
    // null, empty, whitespace, sub-n-gram, unicode, and one honest doc:
    // the inputs a real crawl corpus contains and the driver corpus
    // doesn't — every documents-family operator must EXECUTE (row
    // counts are free to differ; crashing on a short doc is the bug)
    val dir = java.nio.file.Files.createTempDirectory("nasty").toString
    Seq(
      (0L, null.asInstanceOf[String], "en", "src0"),
      (1L, "", "en", "src0"),
      (2L, "   ", "de", "src1"),
      (3L, "one", "fr", "src1"),
      (4L, "two words", "es", "src2"),
      (5L, "three little words here", "zh", "src2"),
      (6L, "😀 中文 rtl שלום mixed", "en", "src0"),
      (7L, "an honest document with enough tokens to shingle properly end",
        "en", "src3")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", coalesce(length($"text"), lit(0L)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the corpus family reads documents + embeddings only
    spark.read.parquet(s"$sf/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val advancedDocQueries = Seq("q33_simhash64_pairs",
      "q44_corpus_minhash", "q48_frame_sample", "q51_train_test_split",
      "q52_stratified_sample", "q57_text_clean", "q58_top_bigrams",
      "q59_array_funcs", "q74_corpus_overlap")
      .map(n => n -> graft.SparkEntry.queries(n))
    val failures = (graft.queries.LlmQueries.queries.toSeq ++
      graft.queries.Mixing.queries.toSeq ++ advancedDocQueries)
      .sortBy(_._1)
      .flatMap { case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
    Dedup.clearSignatureCaches()
    graft.ext.Dedup.clearSignatureCaches()
  }

  test("every corpus operator executes on an EMPTY documents table") {
    import spark.implicits._
    // a fresh pipeline's first run sees zero docs; every documents-
    // family operator must return an empty (or degenerate-aggregate)
    // result, not crash on head()/div-by-zero/empty-reduce
    val dir = java.nio.file.Files.createTempDirectory("empty").toString
    Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", coalesce(length($"text"), lit(0L)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val docQueries = (graft.queries.LlmQueries.queries.toSeq ++
      graft.queries.Mixing.queries.toSeq)
      .filterNot { case (n, _) => // embeddings-family: corpus unaffected
        Seq("q23", "q24", "q25", "q32", "q64", "q70", "q72", "q84")
          .exists(n.startsWith)
      }
    val failures = docQueries.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    Dedup.clearSignatureCaches()
  }

  test("every corpus operator executes on PATHOLOGICAL documents") {
    import spark.implicits._
    // the shapes that break tokenizers and per-doc loops: a 200k-char
    // doc of normal tokens (50k tokens), a single 100k-char TOKEN (one
    // giant word — shingle/gram windows must not blow up on it), a
    // whitespace-only doc, repeated-token floods (modal-count paths),
    // a unicode/combining-mark doc, and a handful of normal docs so
    // joins/aggregates have structure
    val dir = java.nio.file.Files.createTempDirectory("patho").toString
    val huge = Seq.fill(50000)("tok").zipWithIndex
      .map { case (t, i) => s"$t$i" }.mkString(" ")         // 50k distinct tokens
    val giantTok = "x" * 100000                              // one 100k-char token
    val flood = Seq.fill(30000)("same").mkString(" ")        // 30k identical tokens
    val unicode = ("café Å " * 2000).trim
    val rows = Seq(
      (0L, huge, "en", "web"), (1L, giantTok, "en", "web"),
      (2L, "   \t  \n  ", "en", "web"), (3L, flood, "en", "web"),
      (4L, unicode, "de", "book")
    ) ++ (5L until 30L).map(i => (i, s"normal doc $i words here", "en", "web"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", coalesce(length($"text"), lit(0)).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val docQueries = (graft.queries.LlmQueries.queries.toSeq ++
      graft.queries.Mixing.queries.toSeq)
      .filterNot { case (n, _) =>
        Seq("q23", "q24", "q25", "q32", "q64", "q70", "q72", "q84")
          .exists(n.startsWith)
      }
    val failures = docQueries.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    Dedup.clearSignatureCaches()
  }

  test("embedding operators execute on zero and extreme vectors") {
    import spark.implicits._
    // a zero vector makes cosine NaN; huge magnitudes stress the dot
    // kernel; every embedding-family operator must execute (NaN
    // placement is pinned separately by the TopKByScore ordering spec)
    val dir = java.nio.file.Files.createTempDirectory("nasty_emb").toString
    val dim = 64
    val rnd = new scala.util.Random(5)
    val rows = Seq(
      (0L, Array.fill(dim)(0.0f), 0L),
      (1L, Array.fill(dim)(1e30f), 1L),
      (2L, Array.fill(dim)(-1e-30f), 0L)
    ) ++ (3L until 20L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() - 0.5f), i % 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables.documents(spark, sf).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val embQueries = Seq("q23_cosine_topk", "q24_ann_bucketed",
      "q25_embedding_near_dup", "q32_ivf_ann", "q40_vector_centroid",
      "q64_embedding_quantize", "q70_batch_ann", "q72_rp_lsh_topk",
      "q84_cluster_profile",
      // the trained/composed ANN family: Lloyd training, batch IVF,
      // semantic dedup, PQ encode/ADC and IVF-PQ all run over the same
      // zero/huge/tiny vectors (NaN cosines land in the assignment and
      // probe orderings; the L2 keys hit ±Inf*1e6 float->long edges)
      "q101_ivf_trained", "q106_ivf_batch", "q108_semantic_dedup",
      "q115_pq_adc", "q116_ivf_pq")
    val failures = embQueries.flatMap { name =>
      try { graft.SparkEntry.queries(name)(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("contaminationBloom on disjoint corpora is empty") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    assert(Dedup.contaminationBloom(a, b).count() === 0L)
    Dedup.clearSignatureCaches()
  }

  test("Retrieval.bm25TopK matches a plain-Scala BM25 on a hand fixture") {
    import spark.implicits._
    // d4's empty text must still count toward N and avgdl; d3 matches
    // nothing and must not appear; d1 repeats a term (tf=2 saturation).
    val docs = Seq(
      (1L, "spark table spark"),
      (2L, "hash"),
      (3L, "x y z w"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = graft.ext.Retrieval
      .bm25TopK(docs, Seq("spark", "table", "hash"), 20)
      .as[(Long, Long, Double)].collect().toList
    Dedup.clearSignatureCaches()

    // independent reference: same formulas in plain Scala doubles
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val n = 4L; val avgdl = 8.0 / 4.0
    def idfR(df: Long) =
      r4(math.log((n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0))
    def tfs(tf: Long, dl: Long) =
      tf.toDouble * 2.2 / (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl))
    def s4(tf: Long, dl: Long, df: Long) =
      math.floor(idfR(df) * tfs(tf, dl) * 10000 + 0.5).toLong
    val d1 = r4((s4(2, 3, 1) + s4(1, 3, 1)).toDouble / 10000.0)
    val d2 = r4(s4(1, 1, 1).toDouble / 10000.0)
    val expect = List((1L, 2L, d1), (2L, 1L, d2))
      .sortBy { case (id, _, sc) => (-sc, id) }
    assert(got === expect)
    // with df=1 of N=4 everywhere, the 2-term doc must outrank the 1-term doc
    assert(got.head._1 === 1L)
  }

  test("bm25TopK ranks an unmatched corpus empty and caps at k") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, s"w$i filler tokens here"))
      .toDF("doc_id", "text")
    assert(graft.ext.Retrieval.bm25TopK(docs, Seq("absent"), 20).count() === 0L)
    val hits = (1L to 30L).map(i => (i, "needle plus some padding"))
      .toDF("doc_id", "text")
    val top = graft.ext.Retrieval.bm25TopK(hits, Seq("needle"), 20)
      .as[(Long, Long, Double)].collect()
    Dedup.clearSignatureCaches()
    // identical docs -> identical scores; k cap + doc_id tiebreak
    assert(top.length === 20)
    assert(top.map(_._1).toList === (1L to 20L).toList)
    assert(top.map(_._3).distinct.length === 1)
  }

  test("bm25TopK treats NULL text as empty (dl = 0, counted in avgdl)") {
    import spark.implicits._
    // legacy size(null) = -1 would have fed dl = -1 into sum_dl; the
    // coalesce makes a NULL-text corpus identical to an empty-text one
    val withNull = Seq((1L, "needle in a stack"), (2L, null), (3L, "needle"))
      .toDF("doc_id", "text")
    val withEmpty = Seq((1L, "needle in a stack"), (2L, ""), (3L, "needle"))
      .toDF("doc_id", "text")
    val a = graft.ext.Retrieval.bm25TopK(withNull, Seq("needle"), 10)
      .as[(Long, Long, Double)].collect().toList
    Dedup.clearSignatureCaches()
    val b = graft.ext.Retrieval.bm25TopK(withEmpty, Seq("needle"), 10)
      .as[(Long, Long, Double)].collect().toList
    Dedup.clearSignatureCaches()
    assert(a === b)
    assert(a.map(_._1).toSet === Set(1L, 3L))
  }

  test("bm25TopKIndexed through a prebuilt index is hash-identical to bm25BatchTopK, batch by batch") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    val vocab = Vector.tabulate(9)(i => s"w$i")
    val docs = (0L until 90L).map { i =>
      (i, Seq.fill(rnd.nextInt(24))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    // the index is built ONCE; three disjoint "micro-batches" of queries
    // (incl. a null-text-adjacent no-match and a repeated-term query)
    // are then served through it and must match the batch path exactly
    val idx = graft.ext.Retrieval.bm25Index(docs)
    assert(idx.n === 90L)
    val batches = Seq(
      Seq((0L, Seq("w1", "w3")), (1L, Seq("nope"))),
      Seq((2L, Seq("w5", "w5", "w0"))),
      Seq((3L, Seq("w8")), (4L, Seq("w2", "w7", "w4"))))
    for ((qs, i) <- batches.zipWithIndex) {
      val queries = qs.toDF("query_id", "terms")
      val served = graft.ext.Retrieval.bm25TopKIndexed(idx, queries, 6)
        .as[(Long, Long, Long, Double)].collect().sorted.toList
      val batch = graft.ext.Retrieval.bm25BatchTopK(docs, queries, 6)
        .as[(Long, Long, Long, Double)].collect().sorted.toList
      assert(served === batch, s"batch $i diverged")
    }
    Dedup.clearSignatureCaches()
  }

  test("bm25BatchTopK: per-query results equal single-query runs; set semantics; no-match queries vanish") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vocab = Vector.tabulate(8)(i => s"v$i")
    val docs = (0L until 80L).map { i =>
      (i, Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val queries = Seq(
      (0L, Seq("v1", "v3")),
      (1L, Seq("absent_term")),
      (2L, Seq("v1", "v1", "v3")), // repeated term — must equal query 0
      (3L, Seq("v5"))
    ).toDF("query_id", "terms")
    val got = graft.ext.Retrieval.bm25BatchTopK(docs, queries, 7)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap
    Dedup.clearSignatureCaches()
    def single(terms: Seq[String]): List[(Long, Double)] = {
      val r = graft.ext.Retrieval.bm25TopK(docs, terms, 7)
        .as[(Long, Long, Double)].collect().toList.map(x => (x._1, x._3))
      Dedup.clearSignatureCaches()
      r
    }
    val q0 = single(Seq("v1", "v3"))
    val q3 = single(Seq("v5"))
    def ranked(xs: List[(Long, Double)], qid: Long) =
      xs.zipWithIndex.map { case ((id, sc), i) => (qid, (i + 1).toLong, id, sc) }
    assert(got(0L) === ranked(q0, 0L))
    assert(!got.contains(1L), "no-match query must emit no rows")
    assert(got(2L) === ranked(q0, 2L), "repeated terms must score once (set semantics)")
    assert(got(3L) === ranked(q3, 3L))
  }

  test("bm25BatchTopK equals the plain-Scala reference on randomized corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(4321)
    val vocab = Vector.tabulate(10)(i => s"t$i")
    val queries = Seq(
      (10L, Seq("t1", "t3", "t7")),
      (11L, Seq("t0")),
      (12L, Seq("t2", "t9")))
    def ref(docs: Seq[(Long, String)], terms: Seq[String],
        k: Int): List[(Long, Double)] = {
      def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
      val toks = docs.map { case (id, t) =>
        (id, t.split(" ").filter(_.nonEmpty).toSeq)
      }
      val n = docs.size.toLong
      val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n.toDouble
      val tf = toks.flatMap { case (id, ts) =>
        ts.filter(terms.contains).groupBy(identity).toSeq.map {
          case (term, occ) => (id, ts.size.toLong, term, occ.size.toLong)
        }
      }
      val df = tf.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      def idfR(d: Long) =
        r4(math.log((n.toDouble - d.toDouble + 0.5) / (d.toDouble + 0.5) + 1.0))
      val s4 = tf.map { case (id, dl, term, c) =>
        val tfs = c.toDouble * 2.2 /
          (c.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl))
        (id, math.floor(idfR(df(term)) * tfs * 10000 + 0.5).toLong)
      }
      s4.groupBy(_._1).toList.map { case (id, xs) =>
        (id, r4(xs.map(_._2).sum.toDouble / 10000.0))
      }.sortBy { case (id, sc) => (-sc, id) }.take(k)
    }
    for (round <- 1 to 3) {
      val docs = (0L until 60L).map { i =>
        (i, Seq.fill(rnd.nextInt(26))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // per-query df caveat: the reference computes df over the query's
      // OWN terms only, which matches the batch engine because df is
      // per-term regardless of which query asked
      val got = graft.ext.Retrieval
        .bm25BatchTopK(docs.toDF("doc_id", "text"),
          queries.toDF("query_id", "terms"), 12)
        .as[(Long, Long, Long, Double)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(x => (x._3, x._4)).toList).toMap
      Dedup.clearSignatureCaches()
      queries.foreach { case (qid, terms) =>
        assert(got.getOrElse(qid, Nil) === ref(docs, terms.distinct, 12),
          s"round $round query $qid")
      }
    }
  }

  test("rrfFuse: exact integer contributions, cross-system sums, single-system fallback") {
    import spark.implicits._
    def s8(rank: Long) = math.floor(100000000.0 / (60.0 + rank)).toLong
    // system A: query 1 ranks docs 10, 11; query 2 ranks doc 20
    val a = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 20L))
      .toDF("query_id", "rank", "doc_id")
    // system B: query 1 ranks docs 11, 10 (reversed); query 3 only here
    val b = Seq((1L, 1L, 11L), (1L, 2L, 10L), (3L, 1L, 30L))
      .toDF("query_id", "rank", "doc_id")
    val got = graft.ext.Retrieval.rrfFuse(Seq(a, b), k = 5)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap
    // query 1: both docs sum rank-1 + rank-2 contributions -> TIE on
    // the exact integer sum, broken by doc_id asc
    val tie = s8(1) + s8(2)
    assert(got(1L) === List((1L, 1L, 10L, tie), (1L, 2L, 11L, tie)))
    // single-system queries fall through with one contribution
    assert(got(2L) === List((2L, 1L, 20L, s8(1))))
    assert(got(3L) === List((3L, 1L, 30L, s8(1))))
  }

  test("bm25TopK equals the plain-Scala reference on randomized corpora") {
    import spark.implicits._
    // seeded-random corpora over a 10-token vocabulary, query = 3 of the
    // tokens: every (tf, dl, df, avgdl) combination the formula can see,
    // including empty docs and docs with no query term
    val rnd = new scala.util.Random(1234)
    val vocab = Vector.tabulate(10)(i => s"t$i")
    val terms = Seq("t1", "t3", "t7")
    def refBm25(docs: Seq[(Long, String)], k: Int): List[(Long, Long, Double)] = {
      def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
      val toks = docs.map { case (id, t) =>
        (id, t.split(" ").filter(_.nonEmpty).toSeq)
      }
      val n = docs.size.toLong
      val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n.toDouble
      val tf = toks.flatMap { case (id, ts) =>
        ts.filter(terms.contains).groupBy(identity).toSeq.map {
          case (term, occ) => (id, ts.size.toLong, term, occ.size.toLong)
        }
      }
      val df = tf.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      def idfR(d: Long) =
        r4(math.log((n.toDouble - d.toDouble + 0.5) / (d.toDouble + 0.5) + 1.0))
      val s4 = tf.map { case (id, dl, term, c) =>
        val tfs = c.toDouble * 2.2 /
          (c.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl))
        (id, math.floor(idfR(df(term)) * tfs * 10000 + 0.5).toLong)
      }
      s4.groupBy(_._1).toList.map { case (id, xs) =>
        (id, xs.size.toLong, r4(xs.map(_._2).sum.toDouble / 10000.0))
      }.sortBy { case (id, _, sc) => (-sc, id) }.take(k)
    }
    for (round <- 1 to 3) {
      val docs = (0L until 60L).map { i =>
        val nt = rnd.nextInt(26) // 0 => empty doc
        (i, Seq.fill(nt)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = graft.ext.Retrieval
        .bm25TopK(docs.toDF("doc_id", "text"), terms, 15)
        .as[(Long, Long, Double)].collect().toList
      Dedup.clearSignatureCaches()
      assert(got === refBm25(docs, 15), s"round $round")
    }
  }

  test("vocabRichness equals the reference on randomized heavy-dup corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = Vector("a", "b", "c", "d", "e")
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val docs = (0L until 120L).map { i =>
      val nt = rnd.nextInt(31)
      (i, Seq.fill(nt)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = graft.ext.TextStats
      .vocabRichness(docs.toDF("doc_id", "text"), "text")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toList
    val expect = docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val cnt = toks.groupBy(identity).view.mapValues(_.size)
      val (nt, ty, hp) = (toks.size.toLong, cnt.size.toLong,
        cnt.count(_._2 == 1).toLong)
      if (nt == 0) (id, 0L, 0L, 0L, None, None)
      else (id, nt, ty, hp,
        Some(r4(ty.toDouble / nt)), Some(r4(hp.toDouble / nt)))
    }.toList
    assert(got === expect)
  }

  test("vocabRichness rejects pass-through columns that collide with its outputs") {
    import spark.implicits._
    // a pass-through column named like an output would duplicate the
    // name and surface as an ambiguous-reference AnalysisException in
    // the ratio stage; the guard must fail loud up front instead
    for (bad <- Seq("n_tokens", "n_types", "n_hapax", "ttr", "hapax_ratio", "__vs")) {
      val df = Seq((1L, 7L, "a b c")).toDF("doc_id", bad, "text")
      val e = intercept[IllegalArgumentException] {
        graft.ext.TextStats.vocabRichness(df, "text")
      }
      assert(e.getMessage.contains(bad))
    }
    for (bad <- Seq("n_tokens", "n_types", "n_hapax", "__srt")) {
      val df = Seq((1L, 7L, "a b c")).toDF("doc_id", bad, "text")
      val e = intercept[IllegalArgumentException] {
        graft.ext.TextStats.vocabRichnessHof(df, "text")
      }
      assert(e.getMessage.contains(bad))
    }
    // a TEXT column named like an output is consumed, not passed through
    // — it must keep working (this is the q103 shape if the text column
    // were ever renamed)
    val ok = graft.ext.TextStats.vocabRichness(
      Seq((1L, "a b a")).toDF("doc_id", "ttr"), "ttr")
    assert(ok.columns.toSeq ===
      Seq("doc_id", "n_tokens", "n_types", "n_hapax", "ttr", "hapax_ratio"))
    assert(ok.count() === 1L)
  }

  test("vocabRichness stays linear on a 50k-token document") {
    import spark.implicits._
    // regression guard for the inlined-lambda form: with the sorted
    // array re-evaluated per scan position this doc costs ~50k * 50k
    // token-hash operations and the test effectively hangs. The live
    // path is the native vocab_stats kernel (one pass + long[] sort);
    // the staged-HOF form survives only as the vocabRichnessHof parity
    // reference. Counts checked vs a plain word-count reference.
    val rnd = new scala.util.Random(5)
    val toks = Seq.fill(50000)(s"w${rnd.nextInt(1000)}")
    val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val Array(row) = graft.ext.TextStats.vocabRichness(df, "text")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].collect()
    val cnt = toks.groupBy(identity).view.mapValues(_.size)
    assert(row._2 === 50000L)
    assert(row._3 === cnt.size.toLong)
    assert(row._4 === cnt.count(_._2 == 1).toLong)
  }

  test("TextStats.vocabRichness equals a word-count reference on edge docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b a"),        // a:3 b:2 c:1 -> hapax 1
      (2L, "same same same same"), // one type, no hapax
      (3L, "all unique words here"), // every token hapax
      (4L, ""),                   // empty -> zero row, null ratios
      (5L, "  padded   spaces  "), // multi-space tokenisation
      (6L, "solo")                // single token: type=hapax=1, ratios 1.0
    ).toDF("doc_id", "text")
    val got = graft.ext.TextStats.vocabRichness(docs, "text")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toList
    def ref(id: Long, text: String) = {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val cnt = toks.groupBy(identity).view.mapValues(_.size)
      val (nt, ty, hp) = (toks.size.toLong, cnt.size.toLong,
        cnt.count(_._2 == 1).toLong)
      def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
      val (ttr, hr) =
        if (nt == 0) (None, None)
        else (Some(r4(ty.toDouble / nt)), Some(r4(hp.toDouble / nt)))
      (id, nt, ty, hp, ttr, hr)
    }
    val expect = Seq(1L -> "a b c a b a", 2L -> "same same same same",
      3L -> "all unique words here", 4L -> "", 5L -> "  padded   spaces  ",
      6L -> "solo").map { case (i, t) => ref(i, t) }.toList
    assert(got === expect)
  }
}
