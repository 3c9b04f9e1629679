/* Lives under org.apache.spark.sql so it can use the private[sql] Catalyst
 * surface (AbstractDataType, ExpressionUtils) — the standard packaging for
 * third-party native expressions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, DoubleType, FloatType, LongType}

/** Point-in-polygon as a native Catalyst expression (SURVEY R4): the
  * reference's `gpd.sjoin(..., predicate='within')` (ais_analysis.py:483-489)
  * and per-event zone test (ais_webSocketServerDb.py:169-260).
  *
  * A custom Expression (not a UDF) keeps the predicate inside whole-stage
  * codegen: no serialization, null handling inlined, and the polygon rides
  * along as a per-task reference object. Boundary semantics are even-odd
  * ray casting (shapely 'within' excludes exact-boundary points — a
  * measure-zero difference on float data; documented deviation).
  *
  * `bboxApplied` is the [[PipBoundingBox]] rewrite marker: once the
  * optimizer has prepended the bounding-box predicates it flips the flag
  * so the (fixed-point) rule batch cannot re-expand the same node.
  */
case class PointInPolygon(left: Expression, right: Expression, poly: Array[Double],
    bboxApplied: Boolean = false)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    graft.ops.GeoMath.rayCast(lon.asInstanceOf[Double], lat.asInstanceOf[Double], poly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val polyRef = ctx.addReferenceObj("poly", poly, "double[]")
    nullSafeCodeGen(ctx, ev, (lon, lat) =>
      s"${ev.value} = graft.ops.GeoMath.rayCast($lon, $lat, $polyRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Point-in-polygon with the polygon as a third EXPRESSION child — the
  * N×M zone-join form, where the flat (x0,y0,x1,y1,…) ring arrives as
  * DATA from a zones dimension row (array<double> column after a
  * broadcast join) instead of as a plan constant.
  *
  * Two regimes:
  *  - polygon FOLDABLE (a literal inlined from a collected dim row, or
  *    the SQL function called with an array literal): the
  *    [[PipBoundingBox]] rule evaluates it at optimization time and
  *    rewrites to the static [[PointInPolygon]] + pushable bbox
  *    conjuncts — identical plan to the hand-written constant form.
  *  - polygon non-foldable (a real join-side attribute): evaluated
  *    per row via the zero-copy ArrayData ray cast; the caller is
  *    expected to provide bbox COLUMNS for the short-circuit (see
  *    graft.ops.Geo.zoneMatrix), since no per-row bbox can be pushed
  *    to a scan.
  * Both paths execute the operand-for-operand identical float
  * expression (GeoMath.rayCast / rayCastData), so membership can never
  * differ between the constant and dynamic forms.
  */
case class PointInPolygonDyn(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override def nullSafeEval(lon: Any, lat: Any, poly: Any): Any =
    graft.ops.GeoMath.rayCastData(lon.asInstanceOf[Double],
      lat.asInstanceOf[Double], poly.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, poly) =>
      s"${ev.value} = graft.ops.GeoMath.rayCastData($lon, $lat, $poly);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Cosine similarity over two float-embedding arrays as a native expression.
  *
  * Replaces the `aggregate(zip_with(...))` form: those higher-order
  * functions are CodegenFallback and the cosine needs three of them
  * (dot + two norms), so at sf0.1 the brute-force top-k spent 36 s in
  * interpreted lambda dispatch. This is one generated call into a tight
  * JVM loop (graft.ext.VecMath.cosine) — single pass, no allocation —
  * and stays inside whole-stage codegen. Numerics are bit-identical to
  * the declarative form (see VecMath's scaladoc), so the frozen DuckDB
  * oracles still hash-match.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // NULL on a ragged pair or null element, matching the declarative
  // reference (zip_with null-pads ragged lengths and propagates null
  // elements, so the HOF cosine is NULL) — the kernel alone would
  // silently truncate to min(length) and rank garbage rows in top-k
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (!graft.ext.VecMath.cosineComparable(aa, bb)) null
    else graft.ext.VecMath.cosine(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         if (graft.ext.VecMath.cosineComparable($a, $b)) {
           ${ev.value} = graft.ext.VecMath.cosine($a, $b);
         } else {
           ${ev.isNull} = true;
         }
       """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Tokenize-and-hash as one native expression: string -> array<long> of
  * per-token polynomial hashes (see VecMath.tokenCodes). Replaces a
  * triple-nested higher-order-function chain that interpreted three
  * lambda trees per token per row.
  */
case class TokenCodes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_codes"

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.tokenCodes(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.tokenCodes($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document vocabulary statistics as ONE codegen'd pass:
  * struct(n_tokens, n_types, n_hapax) from tokenize + hash + sort +
  * run-scan (graft.ext.VecMath.vocabStats — identical token codes to
  * TokenCodes). The declarative form needs array_sort + array_distinct
  * + a per-position filter lambda, all CodegenFallback with
  * intermediate array materializations; this stays inside whole-stage
  * codegen with a primitive long[] sort.
  */
case class VocabStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_types", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_hapax", LongType, nullable = false)))
  override def prettyName: String = "vocab_stats"

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.vocabStats(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.vocabStats($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document repetition statistics as ONE codegen'd pass:
  * struct(n_tokens, n_distinct, top_tok_freq, top_bigram_freq) —
  * mode-of-a-list over exact token strings and word bigrams
  * (graft.ext.VecMath.repStats). Declaratively this is a quadratic
  * CodegenFallback chain (count each distinct against the whole list);
  * as a ScalaUDF it paid the generic converter round-trip and was the
  * last UDF on the surface — the UDF survives in TextStats as the
  * bit-parity reference.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_tok_freq", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_bigram_freq", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.repStats(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.repStats($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC canonicalization as a codegen'd unary expression — the
  * canonicalize-before-hashing step of a text pipeline (see
  * graft.ext.VecMath.nfcNormalize for why dedup needs it). Stays inside
  * whole-stage codegen like the rest of the kernel family.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.nfcNormalize(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.nfcNormalize($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<long> token-code set, codegen'd: the
  * per-bit majority vote needs 64 aggregate() trees in declarative form
  * (all CodegenFallback) — as a native expression it is one generated
  * call into a tight two-level loop (graft.ext.VecMath.simhash64).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.simhash64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.simhash64($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 16-bit SimHash over array<long> (majority vote of code bit k). */
case class SimHash16(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"
  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.simhash16(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.simhash16($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ordered rolling polynomial hash over array<long> (doc fingerprint). */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.rollingHash(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.rollingHash($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full AIS sentence-group decode as a native expression:
  * array<string> fragments -> the AisDecoded union struct (null on any
  * validation/parse failure, matching the reference's drop semantics).
  *
  * vs the round-2 ScalaUDF: same opaque kernel (a bit parser cannot be
  * declarative), but the expression skips the UDF's generic converter
  * round-trip on both sides and sits directly in the whole-stage-
  * codegen stage — see graft.ais.AisDecodeKernel.
  */
case class AisDecode(child: Expression, extended: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = graft.ais.AisDecodeKernel.schema
  override def nullable: Boolean = true
  override def prettyName: String = "ais_decode"

  override def nullSafeEval(a: Any): Any =
    graft.ais.AisDecodeKernel.decodeRow(a.asInstanceOf[ArrayData], extended)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.ais.AisDecodeKernel.decodeRow($a, $extended);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RP-LSH bucket id: ±1 hyperplanes mixing ALL dims (bit p set when
  * dot(vec, plane_p) > 0), codegen'd. Plane constants live in
  * VecMath.planes == Similarity.rpPlanes == the q72 oracle SQL.
  */
case class RpBucket(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rp_bucket"

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.rpBucket(a.asInstanceOf[ArrayData], nPlanes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.rpBucket($a, $nPlanes, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling word n-gram codes over an array<long> of token codes,
  * position-preserving with null tails — the codegen'd form of the
  * shifted zip_with chain (see graft.ext.VecMath.gramCodes for the
  * exact semantics contract).
  */
case class GramCodes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "gram_codes"

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.gramCodes(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.gramCodes($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH sign-bucket id (bit d set when dim d > 0), codegen'd. */
/** PQ subspace encode ([[graft.ext.Pq]]): array<float> embedding →
  * array<long> of `m` codebook codes, the argmin-L2 assignment per
  * subspace as ONE codegen'd kernel pass instead of m × ksub
  * struct-array HOF candidates (the q115/q116 hot path — same
  * retire-the-declarative-form move as VocabStats/RepetitionStats,
  * with the HOF form retained in Pq.encodeHof for the bit-parity
  * spec). Codebooks and their precomputed self-dots ride along as
  * per-task reference objects.
  */
case class PqEncode(child: Expression, m: Int, keyBound: Double,
    cb: Array[Array[Float]], dbb: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def d: Int = cb.head.length

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.pqEncode(a.asInstanceOf[ArrayData], m, d, keyBound,
      cb, dbb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "float[][]")
    val dbbRef = ctx.addReferenceObj("pqDbb", dbb, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.ext.VecMath.pqEncode($a, $m, $d, $keyBound, $cbRef, $dbbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SignBucket(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bucket"

  override def nullSafeEval(a: Any): Any =
    graft.ext.VecMath.signBucket(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.VecMath.signBucket($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftColumns {
  /** Driver-side evaluation of Spark's `xxhash64` on one string —
    * bit-identical to `functions.xxhash64(col)` (same expression, same
    * default seed), so a lookup client can compute which hash bucket a
    * term's postings were exported under WITHOUT running a Spark job.
    */
  def xxhash64String(s: String, seed: Long = 42L): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)), seed)
      .eval(null).asInstanceOf[Long]

  def pointInPolygon(lon: Column, lat: Column, poly: Array[Double]): Column =
    ExpressionUtils.column(PointInPolygon(
      ExpressionUtils.expression(lon), ExpressionUtils.expression(lat), poly))

  def pointInPolygonDyn(lon: Column, lat: Column, poly: Column): Column =
    ExpressionUtils.column(PointInPolygonDyn(
      ExpressionUtils.expression(lon), ExpressionUtils.expression(lat),
      ExpressionUtils.expression(poly)))

  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def signBucket(vec: Column, bits: Int): Column =
    ExpressionUtils.column(SignBucket(ExpressionUtils.expression(vec), bits))

  def pqEncode(vec: Column, m: Int, keyBound: Double,
      cb: Array[Array[Float]], dbb: Array[Double]): Column =
    ExpressionUtils.column(
      PqEncode(ExpressionUtils.expression(vec), m, keyBound, cb, dbb))

  def rpBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    ExpressionUtils.column(
      RpBucket(ExpressionUtils.expression(vec), nPlanes, dim))

  def simhash64(codes: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(codes)))

  def tokenCodes(text: Column): Column =
    ExpressionUtils.column(TokenCodes(ExpressionUtils.expression(text)))

  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))

  def vocabStats(text: Column): Column =
    ExpressionUtils.column(VocabStats(ExpressionUtils.expression(text)))

  def repetitionStats(text: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(text)))

  def simhash16(codes: Column): Column =
    ExpressionUtils.column(SimHash16(ExpressionUtils.expression(codes)))

  def gramCodes(codes: Column, n: Int): Column =
    ExpressionUtils.column(GramCodes(ExpressionUtils.expression(codes), n))

  def rollingHash(codes: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(codes)))

  def aisDecode(sentences: Column, extended: Boolean = false): Column =
    ExpressionUtils.column(
      AisDecode(ExpressionUtils.expression(sentences), extended))

  /** Codegen'd Bloom-filter membership probe over a serialized
    * `org.apache.spark.util.sketch.BloomFilter` (the format
    * `DataFrameStatFunctions.bloomFilter` produces). Reuses Spark's own
    * `BloomFilterMightContain` — the expression behind runtime join
    * filtering — so the probe stays inside whole-stage codegen instead
    * of a per-row Scala UDF. The filter bytes ride the plan as a binary
    * literal: MB-scale for benchmark-holdout-sized item counts, which
    * is the intended regime.
    */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Literal(bloomBytes), ExpressionUtils.expression(value)))

  /** Generic bridge for further native expressions. */
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
