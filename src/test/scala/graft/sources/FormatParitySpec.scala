package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format parity: the documents corpus written and re-read
  * through every batch file format Spark ships (ORC, CSV, JSON-lines)
  * must reproduce the parquet source EXACTLY — schema-aligned values,
  * row for row. Guards the assumption (baked into every oracle) that
  * operators are format-agnostic: a corpus landing as CSV or JSONL
  * feeds the same pipeline unchanged.
  */
class FormatParitySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("documents round-trip bit-exact through ORC, CSV, and JSON-lines") {
    import spark.implicits._
    val src = graft.Tables.documents(spark, sf)
    val want = src.as[(Long, String, String, String, Long)].collect().toSet
    assert(want.nonEmpty)
    val dir = Files.createTempDirectory("fmt_parity").toString

    src.write.mode("overwrite").orc(s"$dir/docs.orc")
    val orc = spark.read.orc(s"$dir/docs.orc")

    // CSV needs explicit schema (inference would widen ints) and
    // quoting for free-text fields
    src.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(s"$dir/docs.csv")
    val csv = spark.read.schema(src.schema)
      .option("header", "true").csv(s"$dir/docs.csv")

    src.write.mode("overwrite").json(s"$dir/docs.json")
    val json = spark.read.schema(src.schema).json(s"$dir/docs.json")

    for ((name, df) <- Seq(("orc", orc), ("csv", csv), ("json", json))) {
      val got = df.select(src.columns.map(col): _*)
        .as[(Long, String, String, String, Long)].collect().toSet
      assert(got === want, s"format $name diverged")
    }

    // and an operator runs identically on the re-read corpus
    val fpParquet = src.select($"doc_id",
      graft.ext.TextStats.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toSet
    val fpOrc = orc.select($"doc_id",
      graft.ext.TextStats.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toSet
    assert(fpOrc === fpParquet)
  }
}
