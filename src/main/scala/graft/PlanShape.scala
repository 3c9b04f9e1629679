package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Physical-plan shape counters, shared by the `graft.Explain --audit`
  * sweep and PlanSpec's pinned scan contracts so the two can never
  * disagree about what "one scan" means. The traversal is the subtle
  * part: AQE wraps the real plan (children invisible to a plain
  * `collect`), and cached relations embed their build plan inside every
  * InMemoryTableScan — each cache materializes ONCE, so its inner scans
  * are counted once no matter how many consumers read it.
  */
object PlanShape {

  final case class Counts(
      scans: Map[String, Int], exchanges: Int, cartesians: Int, codegen: Int) {
    def tableScans(table: String): Int = scans.getOrElse(table, 0)
  }

  def count(root: SparkPlan): Counts = {
    val seenCaches = scala.collection.mutable.Set[Int]()
    val seenSubqueries = scala.collection.mutable.Set[Int]()
    var scans = Map.empty[String, Int].withDefaultValue(0)
    var ex = 0; var cart = 0; var cg = 0
    def walk(p: SparkPlan): Unit = p.foreach { node =>
      // Scans can hide inside expression-embedded subquery plans
      // (ScalarSubquery / InSubqueryExec) — descend into them too, once
      // per physical subquery so a ReusedSubqueryExec isn't double-counted.
      node.subqueries.foreach { sq =>
        if (seenSubqueries.add(System.identityHashCode(sq))) walk(sq)
      }
      node match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case f: FileSourceScanExec =>
          // attribute the scan to EVERY distinct table among its root
          // paths — a multi-root scan with documents second would
          // otherwise hide from the single-scan contract (review finding)
          f.relation.location.rootPaths
            .map(_.getName.stripSuffix(".parquet")).distinct
            .foreach(t => scans = scans.updated(t, scans(t) + 1))
        case m: InMemoryTableScanExec =>
          if (seenCaches.add(System.identityHashCode(m.relation.cacheBuilder)))
            walk(m.relation.cachedPlan)
        case _: ShuffleExchangeLike => ex += 1
        case _: CartesianProductExec => cart += 1
        case _: WholeStageCodegenExec => cg += 1
        case _ => ()
      }
    }
    walk(root)
    Counts(scans, ex, cart, cg)
  }

  /** All shuffle exchanges under `root`, AQE wrappers, frozen query
    * stages and cached relations descended — for contracts on the
    * shuffle KEYS themselves (e.g. the exact-dedup stages must lead
    * their text partitioning with the 8-byte hash).
    */
  def shuffles(root: SparkPlan): Seq[ShuffleExchangeLike] = {
    val out = scala.collection.mutable.ArrayBuffer[ShuffleExchangeLike]()
    val seenCaches = scala.collection.mutable.Set[Int]()
    def walk(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case e: ShuffleExchangeLike => out += e
      case m: InMemoryTableScanExec =>
        if (seenCaches.add(System.identityHashCode(m.relation.cacheBuilder)))
          walk(m.relation.cachedPlan)
      case _ => ()
    }
    walk(root)
    out.toSeq
  }

  /** All FileSourceScanExec nodes under `root`, AQE wrappers and cached
    * relations descended — for contracts on the scans themselves
    * (partition filters, pushed filters, selected-partition counts).
    */
  def fileScans(root: SparkPlan): Seq[FileSourceScanExec] = {
    val out = scala.collection.mutable.ArrayBuffer[FileSourceScanExec]()
    val seenCaches = scala.collection.mutable.Set[Int]()
    def walk(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // after execution AQE freezes materialized stages as leaves —
      // their real subtree hangs off `plan`
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case f: FileSourceScanExec => out += f
      case m: InMemoryTableScanExec =>
        if (seenCaches.add(System.identityHashCode(m.relation.cacheBuilder)))
          walk(m.relation.cachedPlan)
      case _ => ()
    }
    walk(root)
    out.toSeq
  }
}
