package graft

import org.apache.spark.sql.SparkSession

/** Materialize a K×-replicated documents corpus (ScaleProbe's
  * namespace-disjoint replication — see its Scaladoc for why verbatim
  * duplication would measure output explosion instead of engine
  * scaling) as `<outDir>/documents.parquet`, so the HEAVY-FAMILY
  * oracle gate can run at sf1-class volume: `Verify <outDir> <dump>
  * <heavy query subset>` + `tools/check.py <outDir> <dump>` (symlink
  * the remaining sf tables into outDir first — check.py binds views
  * for all of them).
  *
  * Usage: runMain graft.BuildScaled <sfDir> <mult> <outDir>
  */
object BuildScaled {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, mult, outDir) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = ScaleProbe.scaled(spark, sfDir, mult.toInt)
    df.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"""{"built":"$outDir/documents.parquet","mult":$mult,"rows":${
      spark.read.parquet(s"$outDir/documents.parquet").count()}}""")
    spark.stop()
  }
}
