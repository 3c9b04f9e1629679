package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** The extensions surface: the optimizer rule must rewrite declarative
  * HOF cosine into the fused native expression (same plan users would
  * hand-write), and the native kernels must be callable from SQL.
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.install(s)
    s
  }

  /** Non-foldable float vectors (derived from range, not literals —
    * literal input constant-folds the whole plan before the rule's
    * effect is observable).
    */
  private def vecsDf = {
    val dims = (0 until 11)
    spark.range(32).select(
      array(dims.map(i => (pmod(col("id") * (i + 3), lit(17)) - 8).cast("float")): _*).as("a"),
      array(dims.map(i => (pmod(col("id") * (i + 5), lit(19)) - 9).cast("float")): _*).as("b"))
  }

  test("optimizer rule fuses HOF cosine into the native expression") {
    val df = vecsDf.select(Similarity.cosineHof(col("a"), col("b")).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_similarity"), optimized)
    assert(!optimized.contains("aggregate(zip_with"), optimized)
    // and the rewrite is bit-preserving vs the unfused form on a plan
    // the rule cannot touch (native column built directly)
    val fused = df.collect().map(_.getDouble(0))
    val native = vecsDf.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    fused.zip(native).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(x) === java.lang.Double.doubleToLongBits(y))
    }
  }

  test("pip filter gains bounding-box predicates that push into the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pip_bbox").toString
    // raw coordinate columns in parquet — the at-scale layout (gold
    // tables store lon/lat); row-group stats make the bbox prunable
    (0 until 2000).map { i =>
      (i.toLong, (i % 50).toDouble / 5.0, (i / 50).toDouble / 5.0)
    }.toDF("id", "lon", "lat").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val poly = Array(2.0, 2.0, 5.0, 2.5, 4.5, 6.0, 2.2, 5.5) // quad
    val filtered = pts.filter(
      org.apache.spark.sql.graft.GraftColumns.pointInPolygon($"lon", $"lat", poly))

    // 1) the optimized plan carries the bbox conjuncts + the marked pip
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(opt.contains("point_in_polygon"), opt)
    assert(opt.contains(">= 2.0") && opt.contains("<= 5.0"), opt)
    // 2) the bounds reach the parquet reader as pushed filters — the
    //    100 TB payoff: row groups outside the zone bbox never load
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") &&
      phys.contains("GreaterThanOrEqual(lon,2.0)"), phys.take(2000))
    // 3) semantics preserved vs the un-rewritten evaluation
    val expected = (0 until 2000).filter { i =>
      graft.ops.GeoMath.rayCast((i % 50).toDouble / 5.0,
        (i / 50).toDouble / 5.0, poly)
    }.map(_.toLong).toSet
    assert(filtered.select($"id").as[Long].collect().toSet === expected)
    assert(expected.nonEmpty, "polygon must contain grid points")
    // 4) idempotent under the fixed-point rule batch: exactly one pip,
    //    one pair of lon bounds (no repeated expansion)
    assert("point_in_polygon".r.findAllIn(opt).size === 1, opt)
    assert("\\(lon#\\d+ >= 2\\.0\\)".r.findAllIn(opt).size === 1, opt)
  }

  test("pip bbox rewrite skips null-sensitive contexts, descends And/Or") {
    import org.apache.spark.sql.graft.GraftColumns.pointInPolygon
    import spark.implicits._
    val poly = Array(2.0, 2.0, 5.0, 2.5, 4.5, 6.0, 2.2, 5.5)
    // lat NULL + lon outside bbox: pip = NULL, expanded conjunction =
    // FALSE. Under NOT these differ (NULL drops, TRUE keeps) — the rule
    // must leave NOT(pip) alone.
    // parquet-backed (a LocalRelation would be constant-folded before
    // the rule's effect is observable in the plan)
    val dir = java.nio.file.Files.createTempDirectory("pip_null").toString
    Seq(
      (1L, Some(100.0), None: Option[Double]), // lon outside, lat NULL
      (2L, Some(3.0), Some(3.0)),              // inside polygon
      (3L, Some(100.0), Some(100.0))           // outside, non-null
    ).toDF("id", "lon", "lat").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val negated = pts.filter(!pointInPolygon($"lon", $"lat", poly))
    val optNeg = negated.queryExecution.optimizedPlan.toString
    assert(!optNeg.contains(">= 2.0"),
      "bbox must not be expanded under NOT:\n" + optNeg)
    // NOT(NULL)=NULL drops row 1; only the honest outside row survives
    assert(negated.select($"id").as[Long].collect().toSet === Set(3L))
    // ...but pip under OR (null-insensitive position) still gains the bbox
    val orCase = pts.filter(pointInPolygon($"lon", $"lat", poly) || $"id" === 3L)
    val optOr = orCase.queryExecution.optimizedPlan.toString
    assert(optOr.contains(">= 2.0"),
      "bbox must be expanded under And/Or:\n" + optOr)
    assert(orCase.select($"id").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("dim-row polygon (foldable) folds to static pip; bbox reaches PushedFilters") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pip_dim").toString
    (0 until 2000).map { i =>
      (i.toLong, (i % 50).toDouble / 5.0, (i / 50).toDouble / 5.0)
    }.toDF("id", "lon", "lat").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    // the polygon arrives as DATA: a zones DIMENSION row collected and
    // inlined as a foldable literal — not a hand-written Scala constant
    val zoneDim = Seq((7L, Seq(2.0, 2.0, 5.0, 2.5, 4.5, 6.0, 2.2, 5.5)))
      .toDF("zone_id", "poly")
    val polyFromDim = zoneDim.select($"poly").collect().head.getSeq[Double](0)
    val filtered = pts.filter(
      Geo.point_in_polygon($"lon", $"lat", typedLit(polyFromDim)))
    // the rule folds the dynamic form back to the static expression and
    // the bbox conjuncts reach the reader exactly as in the constant case
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(opt.contains("point_in_polygon"), opt)
    assert(opt.contains(">= 2.0") && opt.contains("<= 5.0"), opt)
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") &&
      phys.contains("GreaterThanOrEqual(lon,2.0)"), phys.take(2000))
    // membership identical to the static form
    val static = pts.filter(org.apache.spark.sql.graft.GraftColumns
      .pointInPolygon($"lon", $"lat", polyFromDim.toArray))
      .select($"id").as[Long].collect().toSet
    assert(filtered.select($"id").as[Long].collect().toSet === static)
    assert(static.nonEmpty)
    // same story through the SQL surface with an array literal
    pts.createOrReplaceTempView("pts_dim")
    val sqlDf = spark.sql(
      """SELECT id FROM pts_dim
         WHERE point_in_polygon(lon, lat,
           array(2.0D, 2.0D, 5.0D, 2.5D, 4.5D, 6.0D, 2.2D, 5.5D))""")
    assert(sqlDf.queryExecution.executedPlan.toString
      .contains("GreaterThanOrEqual(lon,2.0)"))
    assert(sqlDf.as[Long].collect().toSet === static)
  }

  test("zoneMatrix: BNLJ on the broadcast dim; union bbox pushed to the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zone_mx").toString
    (0 until 2000).map { i =>
      (i.toLong, (i % 50).toDouble / 5.0, (i / 50).toDouble / 5.0)
    }.toDF("id", "lon", "lat").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val quad = Array(2.0, 2.0, 5.0, 2.5, 4.5, 6.0, 2.2, 5.5)
    val tri = Array(6.0, 0.5, 8.0, 0.5, 7.0, 3.0, 6.0, 0.5)
    val box = Array(1.0, 7.0, 3.0, 7.0, 3.0, 9.0, 1.0, 9.0, 1.0, 7.0)
    val zones = Seq((1L, quad.toSeq), (2L, tri.toSeq), (3L, box.toSeq))
      .toDF("zone_id", "poly")
    val mx = Geo.zoneMatrix(pts, zones)
    val phys = mx.queryExecution.executedPlan.toString
    // spatial join = broadcast nested loop (non-equi), never a shuffle
    // of the fact side or a plain cartesian
    assert(phys.contains("BroadcastNestedLoopJoin"), phys.take(1500))
    assert(!phys.contains("CartesianProduct") && !phys.contains("SortMergeJoin"),
      phys.take(1500))
    // the union bbox over ALL dim rows (lon >= 1.0, the box's min) is a
    // plan-time literal and reaches the scan as a pushed filter
    assert(phys.contains("PushedFilters") &&
      phys.contains("GreaterThanOrEqual(lon,1.0)"), phys.take(2000))
    // membership == union of the per-zone static filters
    val expected = Seq((1L, quad), (2L, tri), (3L, box)).flatMap { case (z, p) =>
      pts.filter(org.apache.spark.sql.graft.GraftColumns
        .pointInPolygon($"lon", $"lat", p))
        .select($"id").as[Long].collect().map(id => (id, z))
    }.toSet
    assert(mx.select($"id", $"zone_id").as[(Long, Long)].collect().toSet
      === expected)
    assert(expected.nonEmpty)
    // every zone matched something (the matrix is genuinely N×M)
    assert(mx.select($"zone_id").distinct().as[Long].collect().toSet
      === Set(1L, 2L, 3L))
  }

  test("native kernels callable from SQL") {
    vecsDf.createOrReplaceTempView("vecs_ext")
    val r = spark.sql(
      """SELECT cosine_similarity(a, b) AS c, sign_bucket(a, 8) AS sb
         FROM vecs_ext""").collect()
    assert(r.length === 32)
    assert(r.forall(row => math.abs(row.getDouble(0)) <= 1.0 + 1e-9))
    val tc = spark.sql(
      "SELECT token_codes('the quick fox') AS t, simhash64(token_codes('the quick fox')) AS s")
      .collect().head
    assert(tc.getSeq[Long](0).length === 3)
  }

  test("nfc_normalize canonicalizes decomposed text so hashes converge") {
    import spark.implicits._
    // e + COMBINING ACUTE (U+0065 U+0301) vs precomposed U+00E9:
    // byte-different, canonically identical -- the pair dedup misses
    // without canonicalization. Explicit escapes: raw unicode in source
    // would silently depend on the editor's own normalization.
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    assert(decomposed != composed)
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS d, nfc_normalize('$composed') AS c")
      .collect().head
    assert(r.getString(0) === composed, "decomposed must normalize to composed")
    assert(r.getString(1) === composed, "already-NFC text is identity")
    // and the downstream hash kernel now agrees on the two spellings
    val codes = Seq(decomposed, composed).toDF("text")
      .selectExpr("token_codes(nfc_normalize(text)) AS t")
      .collect().map(_.getSeq[Long](0))
    assert(codes(0) === codes(1), "canonicalized spellings must hash equal")
    // Angstrom sign U+212B -> A-with-ring U+00C5 (NFC singleton)
    assert(spark.sql("SELECT nfc_normalize('\u212b') AS a").collect()
      .head.getString(0) === "\u00c5")
    // null flows through as null (UnaryExpression null-safety)
    assert(spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS n")
      .collect().head.isNullAt(0))
  }

  test("asof_join SQL table function equals the Scala helper, tie case included") {
    import spark.implicits._
    // the q7-style fixture with all three edge shapes: no predecessor,
    // backward-INCLUSIVE tie at on=100, and a per-mmsi miss — plus the
    // (by, on)-tied right rows whose deterministic resolution is the
    // helper's documented contract
    val pos = Seq(
      (100L, 10L, 1.0), (200L, 10L, 2.0), (50L, 10L, 0.5),
      (100L, 20L, 9.0), (45L, 30L, 3.0)).toDF("ts", "mmsi", "sog")
    val stat = Seq(
      (90L, 10L, "A"), (100L, 10L, "B"), (150L, 10L, "C"),
      (500L, 20L, "Z"),
      (40L, 30L, "T1"), (40L, 30L, "T2")) // (by, on) tie -> greatest wins
      .toDF("ts", "mmsi", "shipName")
    pos.createOrReplaceTempView("asof_pos")
    stat.createOrReplaceTempView("asof_stat")
    val viaSql = spark.sql(
      """SELECT ts, mmsi, sog, shipName
         FROM asof_join('asof_pos', 'asof_stat', 'ts', 'mmsi', 'shipName')""")
      .as[(Long, Long, Double, Option[String])].collect().toSet
    val viaScala = graft.operators.AsofJoin
      .asofJoin(pos, stat, on = "ts", by = Seq("mmsi"),
        rightCols = Seq("shipName"))
      .select($"ts", $"mmsi", $"sog", $"shipName")
      .as[(Long, Long, Double, Option[String])].collect().toSet
    assert(viaSql === viaScala)
    assert(viaSql === Set(
      (50L, 10L, 0.5, None), (100L, 10L, 1.0, Some("B")),
      (200L, 10L, 2.0, Some("C")), (100L, 20L, 9.0, None),
      (45L, 30L, 3.0, Some("T2"))))
    // composes like any FROM-clause relation (outer filter + agg on top)
    val agg = spark.sql(
      """SELECT shipName, count(*) AS n
         FROM asof_join('asof_pos', 'asof_stat', 'ts', 'mmsi', 'shipName')
         WHERE shipName IS NOT NULL GROUP BY shipName""")
      .as[(String, Long)].collect().toMap
    assert(agg === Map("B" -> 1L, "C" -> 1L, "T2" -> 1L))
  }

  test("bm25_topk SQL table function equals the Scala helper") {
    import spark.implicits._
    // corpus with null text (the dl=-1 hazard the helper coalesces),
    // repeated terms, and non-matching docs
    val docs = Seq(
      (1L, "spark table spark hash join"),
      (2L, "table scan"),
      (3L, null.asInstanceOf[String]),
      (4L, "nothing relevant here"),
      (5L, "hash hash hash")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("bm25_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, n_terms, score
         FROM bm25_topk('bm25_docs', 'spark,table,hash', 3)""")
      .as[(Long, Long, Double)].collect().toSeq
    val viaScala = graft.ext.Retrieval
      .bm25TopK(docs, Seq("spark", "table", "hash"), 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaSql === viaScala)
    assert(viaSql.map(_._1).toSet.subsetOf(Set(1L, 2L, 5L)))
    // composes like any FROM-clause relation
    val n = spark.sql(
      """SELECT count(*) AS n
         FROM bm25_topk('bm25_docs', 'spark,table,hash', 3)
         WHERE score > 0""").as[Long].collect().head
    assert(n === 3L)
    graft.ext.Dedup.clearSignatureCaches()
  }

  test("semantic_drop_list SQL table function equals the Scala path") {
    import spark.implicits._
    val dims = 0 until 8
    val emb = spark.range(64).select($"id".as("vec_id"),
      array(dims.map(i =>
        // two vectors per id-pair are near-identical -> real drops
        ((pmod($"id" / 2 * (i + 3), lit(17)) - 8) +
          (pmod($"id", lit(2)) * lit(0.001))).cast("float")): _*)
        .as("embedding"))
    val docs = spark.range(64).select($"id".as("doc_id"),
      concat(lit("lang"), pmod($"id", lit(3))).as("lang"),
      ($"id" * 7 % 100).cast("long").as("n_chars"))
    emb.createOrReplaceTempView("sdl_emb")
    docs.createOrReplaceTempView("sdl_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, cell, dup_of, max_cos, n_dups, lang, n_chars
         FROM semantic_drop_list('sdl_emb', 'sdl_docs', 0.95)""")
      .collect().map(_.toSeq).toSet
    graft.ext.Dedup.clearSignatureCaches()
    val trained = Similarity.kmeansCentroids(emb, k = 16, iters = 1, roundTo = 4)
    val viaScala = graft.ext.Dedup
      .semanticDropList(emb, docs, trained, minCos = 0.95)
      .collect().map(_.toSeq).toSet
    assert(viaSql === viaScala)
    assert(viaSql.nonEmpty, "fixture must produce real drops")
    graft.ext.Dedup.clearSignatureCaches()
  }

  test("pii_redact SQL function matches the Column-function scrub") {
    import spark.implicits._
    val texts = Seq(
      "mail a@b.co from 10.1.2.3 call 555-1234",
      "no pii, just 1.2 and 12-345")
    val viaSql = texts.map(t =>
      spark.sql(s"SELECT pii_redact('$t')").collect().head.getString(0))
    val viaCol = texts.toDF("t")
      .select(graft.ext.Pii.redact($"t")).as[String].collect().toSeq
    assert(viaSql === viaCol)
    assert(viaSql.head === "mail <EMAIL> from <IP> call <PHONE>")
  }
}
