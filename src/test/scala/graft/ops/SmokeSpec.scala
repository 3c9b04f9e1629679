package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must RUN end-to-end at sf0.001 — a failure here
  * is caught at build time instead of at the driver's verify pass.
  * (Hash correctness is the DuckDB gate's job; this is the
  * does-it-execute floor, including queries with no oracle.)
  */
class SmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // the TVF-backed queries (q111/q118/q119) need the extensions; in a
    // full `sbt test` the shared session may come from ANY suite, so
    // install here instead of depending on suite order
    org.apache.spark.sql.graft.GraftExtensions.install(s)
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("every SparkEntry query executes at sf0.001") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry flagship returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("no query plan degrades to an unbroadcast cartesian product") {
    // repo-wide contract: every deliberate cross join in the surface has
    // a broadcast-sized side (BroadcastNestedLoopJoin); a raw
    // CartesianProductExec means a lost broadcast hint or a join that
    // dropped its keys — shuffle-everything-times-everything at scale
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def offenders(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case a: AdaptiveSparkPlanExec => offenders(a.executedPlan)
        case _: CartesianProductExec => 1
      }.sum
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan
          graft.ext.Dedup.clearSignatureCaches()
          if (offenders(plan) > 0) Some(name) else None
        } catch { case _: Throwable => None } // execution floor is the other test
    }
    assert(bad.isEmpty, s"cartesian product in: ${bad.mkString(", ")}")
  }

  test("every oracle key has a query and every oracle is non-empty SQL") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql
    val dangling = os.keySet.diff(qs)
    assert(dangling.isEmpty, s"oracle without query: $dangling")
    assert(os.values.forall(_.trim.nonEmpty))
  }
}
