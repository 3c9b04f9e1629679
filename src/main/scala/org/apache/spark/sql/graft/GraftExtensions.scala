/* Catalyst-internal surface (Rule, FunctionRegistry, analyzed lambda
 * trees) — packaged under org.apache.spark.sql like any third-party
 * Spark extension library.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Matches the analyzed form of the declarative float dot product
  * `aggregate(zip_with(l, r, (x, y) => x * y), 0.0, (acc, v) => acc + v)`:
  * ArrayAggregate(ZipWith(l, r, λ multiply), 0.0, λ(acc + cast(v as
  * double)), λ identity). The Cast pins element type float — the only
  * case the fused kernel's numerics reproduce exactly.
  */
private object DotHof {
  def unapply(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(l, r,
          LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(
          Add(_: NamedLambdaVariable, Cast(_: NamedLambdaVariable, DoubleType, _, _), _), _, _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _))
        if fin.exprId == arg.exprId =>
      Some((l, r))
    case _ => None
  }
}

/** Optimizer rule: rewrite the declarative cosine
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` over float arrays into
  * the fused native CosineSimilarity expression — users keep the
  * composable `functions._` formulation, the plan gets the single-pass
  * codegen kernel (three interpreted CodegenFallback trees -> one
  * generated call; measured ~100x on the brute-force top-k). Numerics
  * are bit-identical (VecMathSpec), so the rewrite is semantics-
  * preserving in the strictest sense.
  */
object RewriteHofCosine extends Rule[LogicalPlan] {
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(
        DotHof(a, b),
        Multiply(Sqrt(DotHof(a2, a3)), Sqrt(DotHof(b2, b3)), _), _)
        if a.semanticEquals(a2) && a.semanticEquals(a3) &&
          b.semanticEquals(b2) && b.semanticEquals(b3) &&
          isFloatArray(a) && isFloatArray(b) =>
      CosineSimilarity(a, b)
  }
}

/** Optimizer rule: inside Filter conditions, rewrite
  * `point_in_polygon(lon, lat)` into
  * `lon BETWEEN minX AND maxX AND lat BETWEEN minY AND maxY AND pip`.
  *
  * Three-valued-logic scope: with one coordinate NULL and the other
  * outside the bbox, pip evaluates NULL while the expanded conjunction
  * evaluates FALSE. A Filter treats both as "drop", so the rewrite is
  * safe exactly where NULL and FALSE are indistinguishable — positions
  * reachable from the Filter root through And/Or ONLY. Under
  * null-sensitive wrappers (NOT, isnull, <=>, coalesce) the two differ
  * (e.g. NOT(NULL)=NULL drops, NOT(FALSE)=TRUE keeps), so the rewrite
  * deliberately does NOT descend past anything but And/Or.
  *
  * Why it matters at scale: the bounds are PLAIN comparisons on the
  * coordinate columns, so when the filter sits over a parquet scan they
  * reach the reader as PushedFilters — row groups whose lon/lat min/max
  * statistics fall outside the zone's bounding box are skipped without
  * being read. The ray cast itself is an opaque engine expression no
  * format can evaluate; the rewrite extracts the part of its geometry
  * that IS pushable. Rows that survive pushdown short-circuit on four
  * comparisons before the O(vertices) cast. Scoped to Filter conditions
  * only — in a projection the conjunction is pure overhead.
  */
object PipBoundingBox extends Rule[LogicalPlan] {
  private def expand(p: PointInPolygon): Expression = {
    val poly = p.poly
    var minX = Double.MaxValue; var maxX = -Double.MaxValue
    var minY = Double.MaxValue; var maxY = -Double.MaxValue
    var i = 0
    while (i + 1 < poly.length) {
      val x = poly(i); val y = poly(i + 1)
      if (x < minX) minX = x
      if (x > maxX) maxX = x
      if (y < minY) minY = y
      if (y > maxY) maxY = y
      i += 2
    }
    And(
      And(GreaterThanOrEqual(p.left, Literal(minX)),
        LessThanOrEqual(p.left, Literal(maxX))),
      And(
        And(GreaterThanOrEqual(p.right, Literal(minY)),
          LessThanOrEqual(p.right, Literal(maxY))),
        p.copy(bboxApplied = true)))
  }

  /** Descend through And/Or only — every other node is a potentially
    * null-sensitive context where FALSE-for-NULL changes the result.
    */
  private def rewriteCond(e: Expression): Expression = e match {
    case And(l, r) => And(rewriteCond(l), rewriteCond(r))
    case Or(l, r)  => Or(rewriteCond(l), rewriteCond(r))
    case p @ PointInPolygon(lon, lat, poly, false)
        if lon.deterministic && lat.deterministic && poly.length >= 6 =>
      expand(p)
    // dynamic-polygon form with a FOLDABLE ring (an array literal — e.g.
    // a zone polygon inlined from a collected dimension row, or the SQL
    // point_in_polygon function called with a constant): evaluate the
    // ring at optimization time and fall through to the static expansion
    // — the dim-sourced polygon gets the identical pushable bbox
    // conjuncts as the hand-written constant. A null element can't
    // occur (containsNull = false input type); a null/short ring is
    // left as-is for runtime null semantics.
    case d @ PointInPolygonDyn(lon, lat, polyExpr)
        if lon.deterministic && lat.deterministic && polyExpr.foldable =>
      polyExpr.eval(null) match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData
            if a.numElements() >= 6 =>
          expand(PointInPolygon(lon, lat, a.toDoubleArray()))
        case _ => d
      }
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ logical.Filter(cond, _) =>
      val newCond = rewriteCond(cond)
      if (newCond fastEquals cond) f else f.copy(condition = newCond)
  }
}

/** Session extensions: the production registration path
  * (`spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`)
  * injecting the optimizer rule and the native kernels as SQL
  * functions. `install` applies the same to an already-running session
  * (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofCosine)
    ext.injectOptimizerRule(_ => PipBoundingBox)
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
  }
}

object GraftExtensions {
  private def intArg(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  private def strArg(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a constant string")
    val v = e.eval(null)
    require(v != null, s"$what must not be null")
    v.toString
  }

  private def namesArg(e: Expression, what: String): Seq[String] =
    strArg(e, what).split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def dblArg(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a constant number")
    e.eval(null) match {
      // SQL numeric literals with a fraction parse as DecimalType
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$what must be numeric, got $other")
    }
  }

  /** SQL table functions (SURVEY §4 optional (b)): `asof_join(left,
    * right, on, by, right_cols)` — the backward-inclusive as-of join as
    * a FROM-clause citizen, so SQL users get the exact union-window
    * rewrite ([[graft.operators.AsofJoin]]) the Scala helper builds,
    * tie discipline included, instead of hand-writing a correlated
    * subquery that plans as a range join. `left`/`right` name catalog
    * tables or temp views; `by`/`right_cols` are comma-separated column
    * lists. The builder runs at analysis time on the driver: it
    * resolves both relations through the session catalog, applies the
    * Scala rewrite, and splices the resulting analyzed plan into the
    * outer query — one hash shuffle + in-partition sort, same as the
    * Scala path, because it IS the Scala path.
    */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("asof_join"),
      new ExpressionInfo(graft.operators.AsofJoin.getClass.getName, "asof_join"),
      (es: Seq[Expression]) => {
        require(es.size == 5,
          "asof_join(left_table, right_table, on_col, by_cols, right_cols)")
        val spark = SparkSession.active
        val plan = graft.operators.AsofJoin.asofJoin(
          spark.table(strArg(es(0), "left_table")),
          spark.table(strArg(es(1), "right_table")),
          strArg(es(2), "on_col"),
          namesArg(es(3), "by_cols"),
          namesArg(es(4), "right_cols"))
        plan.queryExecution.analyzed
      }),
    // Lexical retrieval as a FROM-clause citizen: `bm25_topk(corpus,
    // 'term1,term2', k)` splices graft.ext.Retrieval.bm25TopK's analyzed
    // plan — the identical filter-before-explode / broadcast-stats /
    // integer-scaled scoring shape the Scala gate (q102) pins, so the
    // SQL surface can never drift from the Scala one.
    (FunctionIdentifier("bm25_topk"),
      new ExpressionInfo(graft.ext.Retrieval.getClass.getName, "bm25_topk"),
      (es: Seq[Expression]) => {
        require(es.size == 3, "bm25_topk(corpus_table, terms_csv, k)")
        val spark = SparkSession.active
        graft.ext.Retrieval.bm25TopK(
          spark.table(strArg(es(0), "bm25_topk: corpus_table")),
          namesArg(es(1), "bm25_topk: terms_csv"),
          intArg(es(2)))
          .queryExecution.analyzed
      }),
    // Semantic near-dup drop list as a table function:
    // `semantic_drop_list(embeddings, documents, min_cos)` trains the
    // q101/q108 k=16 one-iteration Lloyd index (a driver-side action at
    // plan-build time — k×dim floats, the same collect the Scala call
    // path performs) and splices graft.ext.Dedup.semanticDropList's
    // cell-scoped pair plan. Tables need (vec_id, embedding) and
    // (doc_id, lang, n_chars) columns respectively.
    (FunctionIdentifier("semantic_drop_list"),
      new ExpressionInfo(graft.ext.Dedup.getClass.getName, "semantic_drop_list"),
      (es: Seq[Expression]) => {
        require(es.size == 3,
          "semantic_drop_list(embeddings_table, documents_table, min_cos)")
        val spark = SparkSession.active
        val emb = spark.table(strArg(es(0), "semantic_drop_list: embeddings_table"))
        val docs = spark.table(strArg(es(1), "semantic_drop_list: documents_table"))
        val trained = graft.ext.Similarity.kmeansCentroids(
          emb, k = 16, iters = 1, roundTo = 4)
        graft.ext.Dedup.semanticDropList(emb, docs, trained,
          dblArg(es(2), "semantic_drop_list: min_cos"))
          .queryExecution.analyzed
      }))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("sign_bucket"),
      new ExpressionInfo(classOf[SignBucket].getName, "sign_bucket"),
      (es: Seq[Expression]) => SignBucket(es(0), if (es.size > 1) intArg(es(1)) else 8)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    (FunctionIdentifier("token_codes"),
      new ExpressionInfo(classOf[TokenCodes].getName, "token_codes"),
      (es: Seq[Expression]) => TokenCodes(es(0))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalize(es(0))),
    (FunctionIdentifier("vocab_stats"),
      new ExpressionInfo(classOf[VocabStats].getName, "vocab_stats"),
      (es: Seq[Expression]) => VocabStats(es(0))),
    (FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (es: Seq[Expression]) => RepetitionStats(es(0))),
    (FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      (es: Seq[Expression]) => SimHash16(es(0))),
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (es: Seq[Expression]) => RollingHash(es(0))),
    (FunctionIdentifier("rp_bucket"),
      new ExpressionInfo(classOf[RpBucket].getName, "rp_bucket"),
      (es: Seq[Expression]) => RpBucket(es(0),
        if (es.size > 1) intArg(es(1)) else 8,
        if (es.size > 2) intArg(es(2)) else 64)),
    (FunctionIdentifier("gram_codes"),
      new ExpressionInfo(classOf[GramCodes].getName, "gram_codes"),
      (es: Seq[Expression]) => GramCodes(es(0),
        if (es.size > 1) intArg(es(1)) else 5)),
    // SQL surface for the R4 spatial predicate: with a constant ring the
    // PipBoundingBox rule folds it to the static form + pushable bbox;
    // with a column ring it is the per-row zone-join predicate
    (FunctionIdentifier("point_in_polygon"),
      new ExpressionInfo(classOf[PointInPolygonDyn].getName, "point_in_polygon"),
      (es: Seq[Expression]) => PointInPolygonDyn(es(0), es(1), es(2))),
    // PII scrub as a SQL function: the same ordered email -> IPv4 ->
    // phone masking graft.ext.Pii.redact builds with Column functions,
    // composed here from the built-in (codegen'd) RegExpReplace so SQL
    // users get the identical semantics
    (FunctionIdentifier("pii_redact"),
      new ExpressionInfo(classOf[RegExpReplace].getName, "pii_redact"),
      (es: Seq[Expression]) => {
        def rep(child: Expression, pat: String, to: String) =
          RegExpReplace(child, Literal(pat), Literal(to))
        rep(rep(rep(es(0),
          graft.ext.Pii.EmailPat, "<EMAIL>"),
          graft.ext.Pii.Ipv4Pat, "<IP>"),
          graft.ext.Pii.PhonePat, "<PHONE>")
      }))

  /** Register the rules + SQL functions on a live session. */
  def install(spark: SparkSession): Unit = {
    Seq(RewriteHofCosine, PipBoundingBox).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
    // graft-required AQE setting, injected so a deployment gets the
    // measured skew-join split without hand configuration: the
    // decontamination operator aggregates ABOVE its join (count per
    // doc_id), which imposes a distribution requirement on the join
    // output, and OptimizeSkewedJoin then declines by default even
    // though the "extra" shuffle it fears is one the plan pays anyway
    // (the aggregate re-exchanges on doc_id regardless). With Spark's
    // default skew thresholds (256 MB partitions) this is inert at
    // test scale — it only engages on partitions that are genuinely
    // skewed at cluster scale, exactly when the split is wanted.
    // Respect explicit intent from EITHER surface: the launch
    // SparkConf (builder/config file) or a runtime `spark.conf.set`
    // made before install. RuntimeConfig.getOption cannot distinguish
    // "unset" from "at default" (it falls back to the default value),
    // but SQLConf.contains checks only the explicitly-set session
    // entries — exactly the signal wanted here.
    val skewKey = "spark.sql.adaptive.forceOptimizeSkewedJoin"
    if (!spark.sparkContext.conf.contains(skewKey) &&
        !spark.sessionState.conf.contains(skewKey))
      spark.conf.set(skewKey, "true")
    // Second graft-required AQE setting (same respect-explicit-intent
    // rule): the curation/dedup chains materialize intermediates
    // through `Dedup.cached`, and with this at its false default AQE
    // partition coalescing is DISABLED inside every cached-plan
    // materialization — each cache stage runs the full static shuffle
    // partition count however small its data. Measured on the composed
    // pipeline (q117, sf0.1, local[32]): 1584 tasks / 111 s summed task
    // time -> 95 tasks / 4.5 s with the flag on, identical rows. At
    // cluster scale the same flag sizes cached partitions by
    // `advisoryPartitionSizeInBytes` instead of the static count —
    // scale-adaptive in both directions. Cost: a consumer that could
    // have reused the cache's exact hash partitioning may re-shuffle,
    // but every such consumer here re-exchanges anyway (stage
    // boundaries are anti-joins/aggregations on different keys).
    val cacheAqeKey =
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    if (!spark.sparkContext.conf.contains(cacheAqeKey) &&
        !spark.sessionState.conf.contains(cacheAqeKey))
      spark.conf.set(cacheAqeKey, "true")
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
    val treg = spark.sessionState.tableFunctionRegistry
    tableFunctions.foreach { case (id, info, builder) =>
      treg.registerFunction(id, info, builder)
    }
  }
}
