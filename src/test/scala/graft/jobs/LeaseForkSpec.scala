package graft.jobs

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CurationStream

/** The lease battery against a REAL second JVM ([[LeaseProbe]] spawned
  * via ProcessBuilder on the same store directory) — retiring the one
  * modeling assumption in CurationStreamSpec's lease races, which
  * impersonate "another process" with a `tokenOverride` ThreadLocal
  * inside one JVM. Here the child holds the lease under its production
  * `pid@host:startTime` token, and every denial, reclaim, fence and
  * release-no-op is exercised through two genuinely separate processes
  * racing over one local filesystem.
  */
class LeaseForkSpec extends AnyFunSuite {

  /** A running child probe with line-at-a-time request/response. */
  private final class Probe(storeDir: String) {
    private val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
    private val pb = new ProcessBuilder(
      javaBin.getAbsolutePath,
      "-Xmx256m",
      "-cp", System.getProperty("java.class.path"),
      "graft.jobs.LeaseProbe", storeDir)
    pb.redirectErrorStream(false)
    val proc: Process = pb.start()
    private val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"), true)
    private val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
    // drain stderr so the child can never block on a full pipe
    locally {
      val err = proc.getErrorStream
      val t = new Thread(() => {
        val buf = new Array[Byte](4096)
        while (err.read(buf) >= 0) {}
      })
      t.setDaemon(true)
      t.start()
    }

    /** Next stdout line; fails the test after `timeoutMs`. */
    def expectLine(timeoutMs: Long = 60000): String = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!in.ready()) {
        assert(System.currentTimeMillis() < deadline,
          "child probe produced no output before the deadline")
        if (!proc.isAlive && !in.ready())
          fail(s"child probe died silently (exit ${proc.exitValue()})")
        Thread.sleep(20)
      }
      in.readLine()
    }

    def send(cmd: String): Unit = out.println(cmd)

    def ask(cmd: String): String = { send(cmd); expectLine() }

    def close(): Unit = {
      if (proc.isAlive) {
        send("exit")
        if (!proc.waitFor(30, TimeUnit.SECONDS)) proc.destroyForcibly()
      }
      ()
    }
  }

  private def leaseTokenOf(lease: Path): String =
    Dfs.readString(lease).linesIterator.next().trim
  private def leaseEpochOf(lease: Path): Long =
    Dfs.readString(lease).split("\n")(1).trim.toLong

  test("fork-JVM battery: denial, production-token acquire, stale reclaim, cross-process fencing, release no-op") {
    val storeDir = Files.createTempDirectory("cur_fork").toString
    CurationStream.recoverStore(storeDir)
    val lease = new Path(Dfs.qualified(storeDir), "_lease")

    // leg 1: the parent holds a fresh lease — a second PROCESS starting
    // on the same store is denied through the file alone
    CurationStream.acquireLease(storeDir)
    val deniedProbe = new Probe(storeDir)
    val denial = deniedProbe.expectLine()
    assert(deniedProbe.proc.waitFor(30, TimeUnit.SECONDS))
    assert(deniedProbe.proc.exitValue() === 2,
      s"a denied child must exit 2, said: $denial")
    assert(denial.startsWith("DENIED") &&
      denial.contains("leased by another writer"),
      s"the child must be denied by the parent's live lease, got: $denial")
    val parentEpoch = leaseEpochOf(lease)
    CurationStream.releaseLease(storeDir)

    // leg 2: the child acquires under its REAL pid@host:startTime token
    val probe = new Probe(storeDir)
    try {
      assert(probe.expectLine() === "ACQUIRED")
      val childToken = leaseTokenOf(lease)
      assert(childToken.matches("""\d+@.+:\d+"""),
        s"the child's token must be the production pid@host:startTime " +
          s"identity, got: $childToken")
      assert(childToken.split("@")(0).toLong ==
        probe.proc.pid(),
        "the lease must carry the CHILD process's pid, not the parent's")
      assert(leaseEpochOf(lease) === parentEpoch + 1L,
        "the child's acquisition must take the next generation")
      // the parent — a different process — is denied while the child
      // lives, and the child's own heartbeat still succeeds
      val deniedHere = intercept[IllegalStateException](
        CurationStream.acquireLease(storeDir))
      assert(deniedHere.getMessage.contains("leased by another writer"))
      assert(probe.ask("hb") === "HB-OK")
      assert(probe.ask("fence") === "FENCE-OK")

      // leg 3: the child stalls (no heartbeats); its lease ages out and
      // the parent reclaims through the claim-marker arbitration
      assert(new java.io.File(storeDir, "_lease").setLastModified(1000L))
      CurationStream.acquireLease(storeDir)
      assert(leaseTokenOf(lease) !== childToken,
        "the reclaim must replace the stalled child's token")
      assert(leaseEpochOf(lease) === parentEpoch + 2L,
        "the reclaim must bump the generation past the child's")

      // leg 4: the stalled child wakes — heartbeat AND write fence both
      // reject it, through nothing but the shared filesystem
      val hb = probe.ask("hb")
      assert(hb.startsWith("HB-REFUSED") && hb.contains("fenced off"),
        s"the reclaimed child's heartbeat must fence, got: $hb")
      val fence = probe.ask("fence")
      assert(fence.startsWith("FENCE-REFUSED") &&
        fence.contains("write fenced off"),
        s"the reclaimed child's write fence must reject, got: $fence")

      // leg 5: the fenced child's release must NOT delete the parent's
      // lease (compare-and-delete sees a foreign token)
      assert(probe.ask("release") === "RELEASE-OK")
      assert(Dfs.isFile(lease), "the winner's lease must survive")
      assert(leaseTokenOf(lease) !== childToken,
        "a fenced child's release must leave the new owner's lease intact")
    } finally probe.close()
    assert(probe.proc.waitFor(30, TimeUnit.SECONDS) &&
      probe.proc.exitValue() === 0, "the child must exit cleanly")
    CurationStream.releaseLease(storeDir)
    assert(!Dfs.isFile(lease))
  }
}
