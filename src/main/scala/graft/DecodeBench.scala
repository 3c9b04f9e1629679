package graft

import org.apache.spark.sql.SparkSession

/** Decode-throughput micro-bench: synthetic datalog -> full GoldJob
  * decode (fragment parse, reassembly, validation, native decode
  * expression), printed as msg/s. Mirrors the measurement protocol of
  * SCALE.md's "decode throughput vs the reference" table: warm one
  * pass, time the second.
  *
  *   sbt "runMain graft.DecodeBench [nMessages] [cpus]"
  */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val cpus = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val lines = graft.ais.Synth.datalogLines(n).toDF("value")
      .repartition(cpus).cache()
    lines.count()

    def pass(): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = graft.jobs.GoldJob.decode(lines).count()
      (c, (System.nanoTime() - t0) / 1e9)
    }
    pass() // warm: JIT + codegen
    val (decoded, sec) = (1 to 3).map(_ => pass()).minBy(_._2)
    println(f"""{"metric":"decode_rate","decoded":$decoded,"sec":$sec%.3f,"msg_per_sec":${(decoded / sec).toLong},"cpus":$cpus}""")
    spark.stop()
  }
}
