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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
