package graft.jobs

/** Shared provider-engagement proof for the state-store-parameterized
  * suites: the checkpoint must contain the CONFIGURED provider's own
  * artifacts, so a conf typo fails loudly instead of silently
  * re-testing the default store. HDFS-backed writes `.delta` per
  * commit; RocksDB uploads `.zip` snapshots or `.changelog` increments.
  */
trait StateStoreCheck { self: org.scalatest.funsuite.AnyFunSuite =>

  /** File extensions the configured provider persists per commit. */
  protected def stateFileMarkers: Seq[String] = Seq(".delta")

  protected def assertProviderEngaged(ckpt: String): Unit = {
    val stateDir = java.nio.file.Paths.get(ckpt, "state")
    val walk = java.nio.file.Files.walk(stateDir)
    try {
      val found = walk.iterator()
      var hit = false
      while (found.hasNext && !hit) {
        val name = found.next().getFileName.toString
        hit = stateFileMarkers.exists(name.endsWith)
      }
      assert(hit, s"no ${stateFileMarkers.mkString("/")} state file under " +
        s"$stateDir — wrong state-store provider engaged")
    } finally walk.close()
  }
}
