package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The corpus fingerprint keys every prebuilt serving artifact
  * (q123–q125's exports and persisted store), so it must change when
  * the CONTENT changes — even under the adversarial in-place rewrite
  * that preserves file length AND mtime, which the round-12
  * (name, length, mtime) form could not see. Stale-artifact serving
  * would surface as a confusing oracle-gate failure, so the hole is
  * closed at the fingerprint. Driver-only; no SparkSession.
  */
final class FingerprintSpec extends AnyFunSuite {

  test("a same-length same-mtime content rewrite changes the fingerprint") {
    val dir = Files.createTempDirectory("fp_spec").toString
    val table = new java.io.File(dir, "documents.parquet")
    assert(table.mkdirs())
    val part = new java.io.File(table, "part-00000")
    Files.write(part.toPath, Array.fill[Byte](128 * 1024)(1))
    val mtime = 1700000000000L
    assert(part.setLastModified(mtime))
    val fp1 = graft.Tables.fingerprint(dir, Seq("documents"))

    // in-place rewrite: same byte length, mtime restored afterwards —
    // only the content (incl. the tail where a parquet footer lives)
    // differs
    Files.write(part.toPath, Array.fill[Byte](128 * 1024)(2))
    assert(part.setLastModified(mtime))
    val fp2 = graft.Tables.fingerprint(dir, Seq("documents"))
    assert(part.length === 128L * 1024 && part.lastModified === mtime)
    assert(fp1 !== fp2,
      "the tail checksum must catch a metadata-preserving content swap")

    // and it is stable: recomputing over unchanged bytes is identical
    assert(graft.Tables.fingerprint(dir, Seq("documents")) === fp2)
  }

  test("a head-only rewrite beyond the 64 KiB tail is invisible by design") {
    // documents the bound: the checksum covers the LAST 64 KiB (parquet
    // footer + page index). A >64 KiB file whose first byte changes
    // under preserved (length, mtime) is outside the contract — parquet
    // rewrites always rewrite the footer, so this cannot happen to a
    // real parquet file without changing the tail too.
    val dir = Files.createTempDirectory("fp_spec_head").toString
    val table = new java.io.File(dir, "documents.parquet")
    assert(table.mkdirs())
    val part = new java.io.File(table, "part-00000")
    val big = Array.fill[Byte](128 * 1024)(1)
    Files.write(part.toPath, big)
    val mtime = 1700000000000L
    assert(part.setLastModified(mtime))
    val fp1 = graft.Tables.fingerprint(dir, Seq("documents"))
    big(0) = 9 // first byte only — outside the tail window
    Files.write(part.toPath, big)
    assert(part.setLastModified(mtime))
    assert(graft.Tables.fingerprint(dir, Seq("documents")) === fp1)
  }
}
