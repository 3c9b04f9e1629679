package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ais.Fixtures

class WarehouseStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming warehouse: datalog file stream fans out to four tables") {
    val in = Files.createTempDirectory("wh_in").toString
    val out = Files.createTempDirectory("wh_out").toString
    val ckpt = Files.createTempDirectory("wh_ckpt").toString
    val lines = Fixtures.sentenceGroups
      .flatMap { case (fx, ss) => ss.map(s => s"\\s:stn,q:u,c:${1673222400L + fx}*00$s") }
    Files.write(java.nio.file.Paths.get(in, "datalog.txt"),
      lines.mkString("\n").getBytes)

    // single query: one decode per trigger, all four routes fed the
    // identical micro-batch slice
    val q = WarehouseStream.start(
      spark,
      graft.sources.Sources.datalogStream(spark, in),
      out, ckpt, Trigger.AvailableNow(), evictionTimeout = None)
    try q.awaitTermination(120000)
    finally q.stop()

    val pos = spark.read.parquet(s"$out/position")
    val stat = spark.read.parquet(s"$out/static")
    val t21 = spark.read.parquet(s"$out/type21")
    val tel = spark.read.parquet(s"$out/type6_533")
    assert(pos.count() === 3)   // fixture types 1/2/3
    assert(stat.count() === 1)  // the 2-fragment type 5
    assert(t21.count() === 1)
    assert(tel.count() === 3)   // DAC533 fids 1/2/4
    // schema alignment holds through the streaming path
    assert(tel.columns.contains("buoy_led_power"))
  }
}
