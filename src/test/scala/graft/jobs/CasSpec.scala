package graft.jobs

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CurationStream

/** The object-store deployment path, executed: MIGRATION.md's
  * "consistent pointer service" alternative as the [[CasControl]]
  * adapter behind [[Dfs]] (`cas://` scheme). Every control-file
  * protocol primitive maps to one linearizable service operation, so
  * the epoch-pointer and lease protocols run green with BOTH
  * non-atomic rename shims armed to fail loudly — proof that nothing
  * on this path depends on filesystem rename atomicity, which is the
  * property object stores lack.
  */
class CasSpec extends AnyFunSuite {

  private def withToken[T](token: String)(body: => T): T = {
    val t = new Thread(null, null: Runnable, "cas-tok", 0) {
      @volatile var out: Either[Throwable, T] = null
      override def run(): Unit = {
        CurationStream.tokenOverride.set(token)
        try out = Right(body)
        catch { case e: Throwable => out = Left(e) }
        finally CurationStream.tokenOverride.remove()
      }
    }
    t.start(); t.join(60000)
    assert(!t.isAlive, s"impersonated body hung (token $token)")
    t.out match { case Right(v) => v case Left(e) => throw e }
  }

  /** Arm both shims so ANY rename on the exercised path explodes: the
    * cas adapter must never reach one.
    */
  private def armShims[T](body: => T): T = {
    Dfs.nonAtomicRenameShim = Some((_, _) =>
      throw new AssertionError("cas:// must never commit via rename"))
    Dfs.nonAtomicDirRenameShim = Some((_, _) =>
      throw new AssertionError("cas:// must never move via rename"))
    try body
    finally {
      Dfs.nonAtomicRenameShim = None
      Dfs.nonAtomicDirRenameShim = None
    }
  }

  test("epoch pointer on cas://: replace is service-atomic — a hammering reader sees old-or-new, never absence, with rename shims armed") {
    CasControl.reset("ptr")
    val ptr = new Path("cas://ptr/_LATEST")
    Dfs.writeString(ptr, "epoch-0")
    @volatile var stop = false
    @volatile var violation: Option[String] = None
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val v = Dfs.readString(ptr)
          if (!v.startsWith("epoch-")) violation = Some(s"torn: $v")
        } catch {
          case _: java.io.FileNotFoundException =>
            violation = Some("absent")
        }
      }
    })
    reader.start()
    try armShims {
      (1 to 2000).foreach(i => Dfs.writeStringAtomic(ptr, s"epoch-$i"))
    } finally { stop = true; reader.join() }
    assert(violation.isEmpty,
      s"the cas pointer swap must be atomic, saw: $violation")
    assert(Dfs.readString(ptr) === "epoch-2000")
    CasControl.reset("ptr")
  }

  test("lease battery on cas://: acquire, deny, stale reclaim via claim arbitration, epoch fencing and release — with rename shims armed") {
    CasControl.reset("vol1")
    val storeDir = "cas://vol1/store"
    val lease = new Path("cas://vol1/store/_lease")
    armShims {
      // fresh acquire: generation 1, create-exclusive through the
      // service's putIfAbsent
      CurationStream.acquireLease(storeDir)
      val body = Dfs.readString(lease).split("\n")
      assert(body(1).trim.toLong === 1L)
      // a second writer is denied by the fresh lease
      val denied = intercept[IllegalStateException](
        withToken("other@proc:1")(CurationStream.acquireLease(storeDir)))
      assert(denied.getMessage.contains("leased by another writer"))
      // the service's conditional write IS the claim gate: of two
      // racing claimants on a stale lease, exactly one wins
      CasControl.age(lease, 1000L)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val losses = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (1 to 2).map { i =>
        new Thread(() => {
          CurationStream.tokenOverride.set(s"claimant-$i@cas:1")
          try { CurationStream.acquireLease(storeDir)
            wins.incrementAndGet() }
          catch { case _: IllegalStateException =>
            losses.incrementAndGet() }
          finally CurationStream.tokenOverride.remove()
          ()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(60000))
      assert(wins.get() === 1 && losses.get() === 1,
        s"cas reclaim must be single-winner, got ${wins.get()} wins")
      val reclaimed = Dfs.readString(lease).split("\n")
      assert(reclaimed(0).trim.startsWith("claimant-"))
      assert(reclaimed(1).trim.toLong === 2L,
        "the reclaim must take the next generation")
      assert(!Dfs.isFile(new Path("cas://vol1/store/_lease.claim")),
        "no arbitration debris on the service")
      // the ORIGINAL owner is fenced at heartbeat AND at the write
      val hb = intercept[IllegalStateException](
        CurationStream.heartbeatLease(storeDir))
      assert(hb.getMessage.contains("fenced off"))
      val wf = intercept[IllegalStateException](
        CurationStream.verifyWriteFence(storeDir))
      assert(wf.getMessage.contains("write fenced off"))
      // its release is a no-op on the new owner's lease
      CurationStream.releaseLease(storeDir)
      assert(Dfs.isFile(lease),
        "a fenced writer's release must not delete the winner's lease")
      // the winner's release deletes; the generation watermark
      // survives, so the NEXT acquire cannot reuse a spent epoch
      val winner = reclaimed(0).trim
      withToken(winner)(CurationStream.releaseLease(storeDir))
      assert(!Dfs.isFile(lease))
      withToken("late@cas:9")(CurationStream.acquireLease(storeDir))
      assert(Dfs.readString(lease).split("\n")(1).trim.toLong === 3L,
        "epochs must stay strictly monotonic across release on cas://")
      withToken("late@cas:9")(CurationStream.releaseLease(storeDir))
    }
    CasControl.reset("vol1")
  }
}
