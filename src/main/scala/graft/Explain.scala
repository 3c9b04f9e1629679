package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of one or more
  * SparkEntry queries without executing them.
  *
  * Usage: runMain graft.Explain <query>[,<query>...] [sfDir]
  * Every operator's plan should be re-read here after a change — the
  * first plan that passes is not necessarily the plan you want.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q1_agg"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shared engine session factory — plan dumps carry the same session
    // shape the bench and the correctness harness run
    val spark = Sessions.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if (names == Seq("--audit")) audit(spark, sfDir)
    else names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query: $n")
      }
    }
    spark.stop()
  }

  /** Sweep EVERY query and print one JSON line of plan-shape counters:
    * parquet scans per table (a table at >1 without a cache = the
    * q92/q95 double-scan smell), exchanges, cartesians, codegen spans.
    * `runMain graft.Explain --audit [sfDir]` — the mechanical form of
    * the per-query `.explain` read; PlanSpec pins the known-critical
    * ones, this surfaces new smells before they're pinned.
    */
  private def audit(spark: SparkSession, sfDir: String): Unit = {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val c = PlanShape.count(fn(spark, sfDir).queryExecution.executedPlan)
        graft.ext.Dedup.clearSignatureCaches()
        val scanStr = c.scans.toSeq.sorted
          .map { case (t, n) => s""""$t":$n""" }.mkString("{", ",", "}")
        val multi = c.scans.collect { case (t, n) if n > 1 => s"$t x$n" }
        println(s"""{"query":"$name","scans":$scanStr,"exchanges":${c.exchanges},""" +
          s""""cartesians":${c.cartesians},"codegen_spans":${c.codegen}""" +
          (if (multi.nonEmpty) s""","multi_scan":"${multi.mkString(", ")}"""" else "") + "}")
      } catch {
        case e: Throwable =>
          println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}""")
      }
    }
  }
}
