package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.ext.Dedup

/** Round-6 mixing/monitoring operators (q88–q93): each bounded or
  * packed-score formulation is asserted EQUAL to its naive reference
  * form, plus the semantic invariants a pipeline relies on (weights
  * normalize, temperature flattens, histogram masses reconcile).
  */
class MixingSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q88 temperature weights normalize and flatten toward uniform") {
    import spark.implicits._
    val rows = graft.queries.Mixing.queries("q88_temperature_sampling")(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_._4).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    val esum = rows.map(_._5).sum
    assert(math.abs(esum - 10000L) <= rows.length,
      s"epoch docs sum to $esum (rounding slack <= one per language)")
    // alpha < 1 boosts rare languages: every language's sampling weight
    // must be >= its natural share iff it is below-average-sized
    val (rare, big) = rows.partition(r => r._4 > r._3)
    assert(rare.forall(r => big.forall(b => r._2 <= b._2)),
      "every boosted language must be no larger than every damped one")
  }

  test("TopKByLong stays exact beyond the double-packing regime") {
    import spark.implicits._
    // counts ~2^40: the old cnt*2^31 - code double packing sits at
    // ~2^71, far past the 53-bit mantissa — distinct (cnt, code) pairs
    // collapse to the SAME double and the tiebreak is lost
    val big = 1L << 40
    val p1 = (big + 5).toDouble * 2147483648.0 - 3.0
    val p2 = (big + 5).toDouble * 2147483648.0 - 10.0
    assert(p1 === p2, "double packing should collapse here (why we moved off it)")
    // the native long aggregator keeps the exact (cnt desc, code asc) order
    val topk = udaf(new graft.ext.TopKByLong(3))
    val got = Seq((big + 5, 10L), (big + 5, 3L), (big + 4, 1L), (big + 3, 99L))
      .toDF("cnt", "code").repartition(4) // force merge() across partials
      .agg(topk($"cnt", $"code").as("top"))
      .select(explode($"top").as("r")).select($"r._1", $"r._2")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((big + 5, 3L), (big + 5, 10L), (big + 4, 1L)))
  }

  test("q92 emits exactly one NULL-kl row when half A is empty") {
    import spark.implicits._
    // every even doc_id (the A half) empty or null: no code has ca > 0.
    // The oracle's ungrouped sum yields one row with NULL s4 — the
    // Spark side must agree (a groupBy over the filtered-empty set
    // would return zero rows and hash-mismatch the gate).
    val dir = java.nio.file.Files.createTempDirectory("q92_degen").toString
    Seq((0L, "", "en", "s", 0L),
      (1L, "alpha beta gamma", "en", "s", 16L),
      (2L, null.asInstanceOf[String], "en", "s", 0L),
      (3L, "delta epsilon", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Mixing.queries("q92_token_kl_drift")(spark, dir)
      .collect()
    assert(rows.length === 1, s"got ${rows.length} rows")
    val r = rows.head
    assert(r.getAs[Long]("n_tokens_a") === 0L)
    assert(r.getAs[Long]("n_tokens_b") === 5L)
    assert(r.getAs[Long]("n_codes") === 5L)
    assert(r.isNullAt(r.fieldIndex("kl_ab")), "KL undefined when A is empty")
  }

  test("q97 exact-k sample == window reference, exactly min(k, n) per lang") {
    import spark.implicits._
    val got = graft.queries.Mixing.queries("q97_exact_k_sample")(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    val t = Tables.documents(spark, sf)
      .select($"lang", $"doc_id",
        pmod($"doc_id" * 2654435761L + 17L, lit(1000000007L)).as("h"))
    val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
    val want = t.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 25)
      .select($"lang", $"rank", $"doc_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got === want)
    // exact count per stratum: min(25, n_lang), never a binomial draw
    val perLang = got.groupBy(_._1).view.mapValues(_.size).toMap
    val nLang = Tables.documents(spark, sf).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    nLang.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) === math.min(25L, n).toInt, lang)
    }
  }

  test("q89 long-score top-k == window row_number reference") {
    import spark.implicits._
    val got = graft.queries.Mixing.queries("q89_lang_heavy_hitters")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    val cnts = Tables.documents(spark, sf)
      .select($"lang", explode_outer(
        graft.ext.TextStats.tokenCodesOf($"text")).as("code"))
      .filter($"code".isNotNull)
      .groupBy($"lang", $"code").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"code")
    val want = cnts.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"lang", $"rank", $"code", $"cnt")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q90 histogram mass reconciles with q65 components") {
    import spark.implicits._
    val hist = graft.queries.Mixing.queries("q90_cluster_size_histogram")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val comp = graft.queries.LlmQueries.queries("q65_dedup_components")(spark, sf)
      .as[(Long, Long)].collect()
    Dedup.clearSignatureCaches()
    assert(hist.map(_._2).sum === comp.length, "cluster count")
    assert(hist.map(_._3).sum === comp.map(_._2).sum, "doc mass")
    assert(hist.forall(h => h._1 >= 2), "components are >= 2 docs")
    assert(hist.forall(h => h._3 === h._1 * h._2))
  }

  test("q91 novelty: duplicated docs score 0, unique-shingle mass reconciles") {
    import spark.implicits._
    val got = graft.queries.Mixing.queries("q91_shingle_novelty")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    Dedup.clearSignatureCaches()
    assert(got.nonEmpty)
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(got.forall(r => r._3 <= r._2))
    // independent recomputation of the global unique-shingle count
    val pos = Dedup.shingleSets(Tables.documents(spark, sf))
      .select($"doc_id", explode($"tset").as("code"))
    val nUnique = pos.groupBy($"code").agg(count(lit(1)).as("df"))
      .filter($"df" === 1).count()
    assert(got.map(_._3).sum === nUnique)
    // exact-dup pair: all shingles shared -> both ends have novelty 0
    val dupIds = Tables.documents(spark, sf)
      .groupBy($"text").agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") > 1 && length($"text") > 50)
      .select(explode($"ids").as("doc_id")).as[Long].collect().toSet
    if (dupIds.nonEmpty)
      assert(got.filter(r => dupIds(r._1)).forall(_._4 === 0.0))
  }

  test("q92 KL drift == driver-side reference on the same counts") {
    import spark.implicits._
    val Seq((na, nb, v, kl)) =
      graft.queries.Mixing.queries("q92_token_kl_drift")(spark, sf)
        .as[(Long, Long, Long, Double)].collect().toSeq
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", explode_outer(
        graft.ext.TextStats.tokenCodesOf($"text")).as("code"))
      .filter($"code".isNotNull)
      .select($"doc_id", $"code").as[(Long, Long)].collect()
    val ca = toks.filter(_._1 % 2 == 0).groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val cb = toks.filter(_._1 % 2 == 1).groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val na2 = ca.values.sum; val nb2 = cb.values.sum
    val v2 = (ca.keySet ++ cb.keySet).size.toLong
    assert((na, nb, v) === ((na2, nb2, v2)))
    val s4 = ca.toSeq.map { case (code, c) =>
      c * math.floor(math.log((c.toDouble / na2) /
        ((cb.getOrElse(code, 0L) + 1).toDouble / (nb2 + v2))) * 10000 + 0.5).toLong
    }.sum
    val want = math.floor(s4.toDouble / (na2 * 10000.0) * 1e6 + 0.5) / 1e6
    assert(kl === want)
  }

  test("q94 containment: planted prefix doc scores 1.0 where jaccard can't") {
    import spark.implicits._
    // doc 2 extends doc 1 by ~50%: close enough in size that the
    // Jaccard-tuned banding still collides (the documented recall
    // envelope), yet diluted enough that symmetric jaccard is below
    // any near-dup bar while containment is exactly 1.0
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val docs = Seq(
      (1L, base),
      (2L, base + " rho sigma"),
      (3L, "completely different words nothing shared at all here friend")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, minContainment = 0.95)
      .as[(Long, Long, Double)].collect()
    Dedup.clearSignatureCaches()
    // doc 1 is a strict prefix of doc 2: every 5-gram of 1 appears in 2
    assert(got.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(got.head._3 === 1.0)
    // ...while symmetric jaccard on the same pair is dilution-bound:
    // |A|/|B| = 12/14 ≈ 0.857, under containment's own 0.95 bar
    val jac = Dedup.minhashPairs(docs, minJaccard = 0.0)
      .as[(Long, Long, Double)].collect()
      .find(p => p._1 == 1L && p._2 == 2L)
    Dedup.clearSignatureCaches()
    assert(jac.exists(_._3 < 0.9), s"jaccard should be dilution-bound: $jac")
  }

  test("q94 containment >= jaccard on every corpus pair") {
    import spark.implicits._
    val cont = graft.queries.Mixing.queries("q94_containment_dedup")(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)) -> p._3).toMap
    val jac = graft.queries.LlmQueries.queries("q21_minhash_pairs")(spark, sf)
      .as[(Long, Long, Double)].collect()
    Dedup.clearSignatureCaches()
    assert(cont.nonEmpty)
    // every strong-jaccard pair must also clear the containment bar
    // (containment >= jaccard pointwise), with the score no smaller
    for ((d1, d2, j) <- jac if j >= 0.8)
      assert(cont.get((d1, d2)).exists(_ >= j), s"($d1,$d2) j=$j")
  }

  test("q95 histogram quantiles == Spark's exact percentile aggregate") {
    import spark.implicits._
    val got = graft.queries.Mixing.queries("q95_length_quantiles")(spark, sf)
      .as[(String, Double, Double)].collect()
      .map { case (l, q, v) => (l, q) -> v }.toMap
    val want = Tables.documents(spark, sf)
      .select($"lang", coalesce(size(
        graft.ext.TextStats.tokens($"text")), lit(0)).cast("long").as("v"))
      .groupBy($"lang")
      .agg(expr("percentile(v, array(0.25, 0.50, 0.75, 0.95))").as("p"))
      .select($"lang", posexplode($"p").as(Seq("i", "pv")))
      .as[(String, Int, Double)].collect()
      .map { case (l, i, v) =>
        (l, Seq(0.25, 0.50, 0.75, 0.95)(i)) ->
          math.floor(v * 1e6 + 0.5) / 1e6
      }.toMap
    assert(got.keySet === want.keySet)
    for ((k, v) <- want) assert(got(k) === v, s"$k")
    assert(got.size === 4 * Tables.documents(spark, sf)
      .select($"lang").distinct().count())
  }

  test("q93 shards cover the corpus with bounded skew") {
    import spark.implicits._
    val got = graft.queries.Mixing.queries("q93_shard_balance")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.forall(r => r._1 >= 0 && r._1 < 16))
    assert(got.map(_._2).sum === Tables.documents(spark, sf).count())
    // multiplicative hashing should spread 500 docs across all 16
    // shards with no empty shard and max/mean below 2
    assert(got.length === 16)
    val mean = got.map(_._2).sum.toDouble / 16
    assert(got.map(_._2).max < 2 * mean, got.map(_._2).mkString(","))
  }

  test("sequence packing: contiguous stream, exact straddles, plain-Scala parity") {
    import spark.implicits._
    // hand fixture exercising each shape: boundary-aligned doc, doc
    // exactly filling a sequence, multi-sequence straddler, zero-token
    // doc (drops out without shifting the stream), 1-token doc
    val L = 8L
    val docs = Seq(
      (0L, "a b c d e f g h"),  // 8 toks: fills seq 0 exactly
      (1L, ""),                 // 0 toks: no row, no shift
      (2L, "x y z"),            // 3 toks: seq 1, off 0
      (3L, Seq.fill(14)("t").mkString(" ")), // 14: straddles seqs 1..3
      (4L, "q")                 // 1 tok: seq 3, off 1
    ).toDF("doc_id", "text")
    val got = graft.ext.Packing.packPlan(docs, L)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toList
    graft.ext.Dedup.clearSignatureCaches()
    assert(got === List(
      (0L, 8L, 0L, 0L, 0L, 0L, 1L),
      (2L, 3L, 8L, 1L, 0L, 1L, 1L),
      (3L, 14L, 11L, 1L, 3L, 3L, 3L),
      (4L, 1L, 25L, 3L, 1L, 3L, 1L)))
    // randomized corpus vs a plain-Scala fold of the same definition
    val rnd = new scala.util.Random(11)
    val rdocs = (0L until 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(40))("w").mkString(" "))
    }
    val want = {
      var cum = 0L
      rdocs.flatMap { case (id, text) =>
        val n = text.split(" ").count(_.nonEmpty).toLong
        val start = cum
        cum += n
        if (n == 0) None
        else Some((id, n, start, start / 2048, start % 2048,
          (start + n - 1) / 2048, (start + n - 1) / 2048 - start / 2048 + 1))
      }.toList
    }
    val got2 = graft.ext.Packing.packPlan(rdocs.toDF("doc_id", "text"), 2048L)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toList
    graft.ext.Dedup.clearSignatureCaches()
    assert(got2 === want)
    // stream contiguity: every row starts where the previous ended
    got2.sliding(2).foreach {
      case List(a, b) => assert(a._3 + a._2 === b._3, s"gap after doc ${a._1}")
      case _ => ()
    }
  }

  test("sequence manifest: every sequence holds exactly L tokens except the last; doc/token mass conserved") {
    import spark.implicits._
    val L = 8L
    val rnd = new scala.util.Random(23)
    val docs = (0L until 120L).map { i =>
      (i, Seq.fill(rnd.nextInt(20))("w").mkString(" "))
    }.toDF("doc_id", "text")
    val m = graft.ext.Packing.sequenceManifest(docs, L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    graft.ext.Dedup.clearSignatureCaches()
    val totalTok = m.map(_._3).sum
    // seq ids are a gapless 0..N prefix; every seq full except the last
    assert(m.map(_._1) === m.indices.map(_.toLong).toList)
    m.init.foreach { r => assert(r._3 === L, s"seq ${r._1} not full: $r") }
    assert(m.last._3 === (if (totalTok % L == 0) L else totalTok % L))
    // doc spans tile: first_doc of seq s+1 == last_doc of s (straddler)
    // or last_doc + 1 (clean cut)
    m.sliding(2).foreach {
      case List(a, b) =>
        assert(b._4 === a._5 || b._4 === a._5 + 1, s"span break at ${b._1}")
      case _ => ()
    }
    // token mass: manifest total == packPlan total == corpus tokens
    val plan = graft.ext.Packing.packPlan(docs, L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    graft.ext.Dedup.clearSignatureCaches()
    assert(totalTok === plan.map(_._2).sum)
  }

  test("q113 PPS sample: pick mass conserved per lang; parity with plain-Scala systematic walk") {
    import spark.implicits._
    val got = graft.queries.Mixing.queries("q113_pps_sample")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toList
    graft.ext.Dedup.clearSignatureCaches()
    // plain-Scala reference: same hash order, same weighted line, count
    // multiples of step inside each doc's interval
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"doc_id",
        coalesce(size(graft.ext.TextStats.tokens($"text")), lit(0))
          .cast("long").as("n_tok"))
      .as[(String, Long, Long)].collect()
    def h(id: Long) = Math.floorMod(id * 2654435761L + 17L, 1000000007L)
    val want = docs.groupBy(_._1).toList.flatMap { case (lang, rows) =>
      val ordered = rows.sortBy(r => h(r._2))
      val tw = ordered.map(_._3).sum
      val step = math.max(tw / 25, 1L)
      var cum = 0L
      ordered.flatMap { case (_, id, n) =>
        val start = cum
        cum += n
        val picks =
          if (n == 0) 0L
          else (start + n - 1) / step - (if (start == 0) 0L else (start - 1) / step)
        if (picks > 0) Some((lang, id, n, picks)) else None
      }
    }
    assert(got.toSet === want.toSet)
    // mass conservation: Σpicks per lang = tw DIV step (every multiple
    // of step on the line lands in exactly one doc interval)
    val gotMass = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    for ((lang, rows) <- docs.groupBy(_._1)) {
      val tw = rows.map(_._3).sum
      val step = math.max(tw / 25, 1L)
      assert(gotMass.getOrElse(lang, 0L) === tw / step, s"lang $lang")
    }
  }
}
