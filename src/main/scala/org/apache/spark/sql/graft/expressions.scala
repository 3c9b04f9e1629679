/* Lives under org.apache.spark.sql so it can use the private[sql] Catalyst
 * surface (AbstractDataType, ExpressionUtils) — the standard packaging for
 * third-party native expressions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, DoubleType}

/** Point-in-polygon as a native Catalyst expression (SURVEY R4): the
  * reference's `gpd.sjoin(..., predicate='within')` (ais_analysis.py:483-489)
  * and per-event zone test (ais_webSocketServerDb.py:169-260).
  *
  * A custom Expression (not a UDF) keeps the predicate inside whole-stage
  * codegen: no serialization, null handling inlined, and the polygon rides
  * along as a per-task reference object. Boundary semantics are even-odd
  * ray casting (shapely 'within' excludes exact-boundary points — a
  * measure-zero difference on float data; documented deviation).
  */
case class PointInPolygon(left: Expression, right: Expression, poly: Array[Double])
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

object GraftColumns {
  def pointInPolygon(lon: Column, lat: Column, poly: Array[Double]): Column =
    ExpressionUtils.column(PointInPolygon(
      ExpressionUtils.expression(lon), ExpressionUtils.expression(lat), poly))

  /** Generic bridge for further native expressions. */
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
