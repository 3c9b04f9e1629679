package graft.ais

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StructType

/** Static decode kernel behind the native `AisDecode` expression: one
  * JVM call from generated code, array<string> fragments in,
  * InternalRow (the full AisDecoded union struct) or null out.
  *
  * The round-2 form was a ScalaUDF: correct, but every row paid the
  * generic CatalystTypeConverters round-trip (boxed Seq[String] in,
  * reflective case-class walk out). Here the input is read straight
  * off the ArrayData and the output goes through a cached Catalyst
  * serializer (codegen'd once per thread) — the same kernel-behind-
  * expression pattern as VecMath (expressions.scala), which measured
  * ~100x over interpreted paths for the scalar kernels.
  */
object AisDecodeKernel {

  private val encoder = ExpressionEncoder[AisDecoded]()

  /** Schema of the decoded union struct — identical to the UDF's
    * reflective derivation, so every frozen oracle is unchanged.
    */
  val schema: StructType = encoder.schema

  // Serializer instances are stateful (reused UnsafeRow buffer) — one
  // per thread, and .copy() on the way out because downstream operators
  // may buffer the row.
  private val ser =
    ThreadLocal.withInitial[ExpressionEncoder.Serializer[AisDecoded]](
      () => encoder.createSerializer())

  def decodeRow(arr: ArrayData): InternalRow = decodeRow(arr, false)

  def decodeRow(arr: ArrayData, extended: Boolean): InternalRow = {
    if (arr == null) return null
    val n = arr.numElements()
    val sentences = new Array[String](n)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      sentences(i) = if (u == null) null else u.toString
      i += 1
    }
    AisDecoder.decode(sentences.toSeq, extended) match {
      case Some(d) => ser.get()(d).copy()
      case None => null
    }
  }
}
