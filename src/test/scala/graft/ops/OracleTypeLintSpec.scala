package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Oracle result-type lint (round-5 verdict, next-round item #2).
  *
  * The driver's correctness gate canonicalizes results WITH their types,
  * so an oracle column DuckDB types HUGEINT (any un-cast `sum` over an
  * integer column) or DECIMAL hash-diverges from Spark's BIGINT even
  * when every value matches — q86 failed round 5 exactly this way while
  * the value-level check passed. This spec feeds the LIVE
  * `SparkEntry.oracleSql` to `tools/oracle_type_lint.py`, which binds
  * (without executing) every query against the sf0.001 tables in DuckDB
  * and fails on any banned result type — so a dropped cast in a future
  * oracle fails `sbt test`, not round N+1's CORRECTNESS file.
  *
  * DuckDB is oracle-side tooling, not a library dependency: the spec
  * cancels (never silently passes) when python3+duckdb or the testdata
  * are absent.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private def haveDuckDb: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  test("no oracle result column types as HUGEINT/UHUGEINT/DECIMAL") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
    assume(new java.io.File(s"$sfDir/documents.parquet").exists(),
      s"testdata at $sfDir not present")
    assume(new java.io.File("tools/oracle_type_lint.py").exists(),
      "lint tool not present (spec must run from the repo root)")
    assume(haveDuckDb, "python3+duckdb (oracle-side tooling) not present")

    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t")
    val json = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.write(tmp, json.getBytes(UTF_8))

    val out = new StringBuilder
    val code = Process(
      Seq("python3", "tools/oracle_type_lint.py", sfDir, tmp.toString))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle type lint failed:\n${
      out.toString.linesIterator.filter(_.startsWith("FAIL")).mkString("\n")}")
  }
}
