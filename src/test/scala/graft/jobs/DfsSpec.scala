package graft.jobs

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The filesystem seam's contracts that need no Spark: canonical path
  * resolution (symlink aliasing would split the lease/version/pin
  * keyspaces) and the atomic-replace guarantee `writeStringAtomic`
  * gives the epoch-pointer/lease/version protocols — including the
  * NEGATIVE form: under an emulated object-store rename (copy+delete,
  * non-atomic) a concurrent reader observes the missing-pointer
  * window. That executed violation is WHY MIGRATION.md routes
  * `s3a://` deployments through a table format or pointer service
  * instead of these file-rename protocols; `file://`/HDFS are the
  * schemes the protocols bless.
  */
class DfsSpec extends AnyFunSuite {

  test("qualified resolves symlink aliases to one canonical spelling") {
    val real = Files.createTempDirectory("dfs_real")
    val alias = Paths.get(real.getParent.toString,
      s"dfs_alias_${System.nanoTime()}")
    Files.createSymbolicLink(alias, real)
    assert(Dfs.qualified(alias.toString) === Dfs.qualified(real.toString),
      "two spellings of one directory must map to one registry key")
    // a not-yet-existing child under the alias resolves through it —
    // a store about to be CREATED on the aliased spelling must still
    // collapse to the real path
    assert(Dfs.qualified(s"$alias/store/_lease") ===
      Dfs.qualified(s"$real/store/_lease"))
  }

  test("atomic replace: racing reader sees old-or-new, never absence; the non-atomic shim breaks exactly that") {
    val dir = Files.createTempDirectory("dfs_atomic")
    val ptr = new Path(Dfs.qualified(dir.toString), "_LATEST")
    Dfs.writeString(ptr, "epoch-0")
    @volatile var stop = false
    @volatile var sawAbsent = false
    @volatile var sawTorn = false
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val v = Dfs.readString(ptr)
          if (!v.startsWith("epoch-")) sawTorn = true
        } catch {
          case _: java.io.FileNotFoundException => sawAbsent = true
          case _: java.io.IOException => sawTorn = true
        }
      }
    })
    reader.start()
    try {
      // PHASE 1 — the real file:// path (java.nio ATOMIC_MOVE): hammer
      // the swap under the concurrent reader. The pointer must never
      // be absent and never read torn (lengths VARY across epochs, so
      // a stat-then-read pairing mismatch would surface here).
      (1 to 500).foreach(i => Dfs.writeStringAtomic(ptr, s"epoch-$i"))
      assert(!sawAbsent && !sawTorn,
        "atomic replace exposed absence or a torn read on file://")

      // PHASE 2 — the emulated OBJECT-STORE rename: the commit becomes
      // copy+delete with a visible window in which dst does not exist.
      // The same reader must catch the violation — the pinned reason
      // the durable protocols refuse to rely on rename atomicity off
      // file://'/HDFS.
      Dfs.nonAtomicRenameShim = Some { (tmp, dst) =>
        val bytes = Dfs.readString(tmp)
        Dfs.delete(dst, recursive = false) // dst vanishes…
        Thread.sleep(2)                    // …for a visible window…
        Dfs.writeString(dst, bytes)        // …before the new content lands
        Dfs.delete(tmp, recursive = false)
        ()
      }
      try {
        var i = 0
        while (!sawAbsent && i < 500) {
          i += 1; Dfs.writeStringAtomic(ptr, s"epoch-x$i")
        }
      } finally Dfs.nonAtomicRenameShim = None
      assert(sawAbsent,
        "the emulated copy+delete rename must expose the missing-pointer " +
          "window — the contract violation MIGRATION.md's table-format " +
          "requirement exists to prevent")
    } finally { stop = true; reader.join() }
  }
}
