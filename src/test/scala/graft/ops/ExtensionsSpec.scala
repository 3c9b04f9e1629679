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
}
