package graft.jobs

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, FileStatus, Options,
  Path}

/** Filesystem seam for the durable-artifact protocols — the curation
  * store's journaled partition swaps, the index-export epoch pointer,
  * the store lease/version markers and the corpus fingerprint walk.
  * Every path operation goes through the Hadoop [[FileContext]] API, so
  * ONE code path addresses `file://` (tests, single node), `hdfs://`
  * and any mounted DFS; the previous `java.io.File` form could not even
  * spell a scheme-qualified URI.
  *
  * Why FileContext and not FileSystem: `FileSystem.get` for `file://`
  * returns the CHECKSUMMED LocalFileSystem, which shadows every write
  * with a `.crc` sidecar — a rename through a different layer then
  * leaves a stale sidecar that fails the next checksummed read.
  * FileContext's local implementation is the raw local filesystem (no
  * sidecars, thin wrapper over java.io with atomic POSIX renames), and
  * its `rename(…, Options.Rename)` makes the overwrite contract
  * EXPLICIT — the pointer swap needs overwrite-atomic, the partition
  * swaps need fail-if-exists.
  *
  * Rename-atomicity contract per scheme (the commit points of the swap
  * journal and the epoch pointer assume atomic rename):
  *  - `file://`, `hdfs://`: rename is atomic — the protocols hold as
  *    proven by the crash-state specs.
  *  - object stores (`s3a://` …): rename is copy+delete, NOT atomic. A
  *    deployment there must front the store with a table format (the
  *    MIGRATION.md recommendation) or a consistent pointer service;
  *    this seam makes the paths addressable but does not hide that
  *    contract difference.
  *
  * No SparkSession required — the no-Spark local lookup tier resolves
  * epochs through this same seam. FileContext instances are cached per
  * (scheme, authority).
  */
object Dfs {

  private lazy val conf = new Configuration()
  private val contexts = new ConcurrentHashMap[String, FileContext]()

  private def fc(p: Path): FileContext = {
    val u = p.toUri
    val key = s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}"
    contexts.computeIfAbsent(key, _ =>
      if (u.getScheme == null) FileContext.getFileContext(conf)
      else FileContext.getFileContext(u, conf))
  }

  /** Scheme-qualified, normalized form of a path string — the ONE
    * canonical spelling every in-memory key (epoch pins, leases, store
    * versions) and every listing-derived path shares, so a relative or
    * `.`-segmented caller spelling can never split the keyspace. Local
    * paths additionally resolve SYMLINKS to their real path: two
    * aliased spellings of one store directory must map to one registry
    * key, or a second in-process writer on the alias would bypass the
    * single-writer guard (the lease file is re-entrant for the same
    * JVM token, so only the keyspace can catch that case).
    */
  def qualified(s: String): Path = {
    val p = new Path(s)
    val q = fc(p).makeQualified(p)
    if (q.toUri.getScheme != "file") q
    else new Path("file", null,
      realLocal(java.nio.file.Paths.get(q.toUri.getPath)).toString)
  }

  /** Real (symlink-free) form of a local path. The path may not exist
    * yet (a store about to be created): resolve the longest existing
    * ancestor and re-append the remainder verbatim.
    */
  private def realLocal(p: java.nio.file.Path): java.nio.file.Path =
    try p.toRealPath()
    catch {
      case _: java.io.IOException =>
        val parent = p.getParent
        if (parent == null) p
        else realLocal(parent).resolve(p.getFileName)
    }

  def exists(p: Path): Boolean = fc(p).util.exists(p)
  def isFile(p: Path): Boolean =
    try fc(p).getFileStatus(p).isFile catch {
      case _: java.io.FileNotFoundException => false
    }
  def isDirectory(p: Path): Boolean =
    try fc(p).getFileStatus(p).isDirectory catch {
      case _: java.io.FileNotFoundException => false
    }
  def status(p: Path): Option[FileStatus] =
    try Some(fc(p).getFileStatus(p)) catch {
      case _: java.io.FileNotFoundException => None
    }

  /** Children of a directory; empty for a missing or non-dir path. */
  def list(p: Path): Seq[FileStatus] =
    try fc(p).util.listStatus(p).toSeq catch {
      case _: java.io.FileNotFoundException => Seq.empty
    }

  def mkdirs(p: Path): Unit = {
    fc(p).mkdir(p, null, true)
    ()
  }

  def delete(p: Path, recursive: Boolean = true): Boolean =
    try fc(p).delete(p, recursive) catch {
      case _: java.io.FileNotFoundException => false
    }

  /** Read a small control file fully (pointer/lease/version marker).
    * Reads to EOF on the ONE opened stream — the previous form stat'ed
    * the path separately for its length, and a reader racing an atomic
    * replace could pair the NEW file's length with the OLD file's
    * descriptor (a torn read the pointer protocols forbid).
    */
  def readString(p: Path): String = {
    val in = fc(p).open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Read the LAST `n` bytes of a file (the fingerprint tail sum). */
  def readTail(st: FileStatus, n: Int): Array[Byte] = {
    val p = st.getPath
    val len = math.min(st.getLen, n.toLong).toInt
    val buf = new Array[Byte](len)
    if (len > 0) {
      val in = fc(p).open(p)
      try in.readFully(st.getLen - len, buf) finally in.close()
    }
    buf
  }

  /** Plain (non-atomic) small-file write — for control files whose
    * readers tolerate absence, like the swap journal marker (written
    * before any destructive step; a torn marker reads as garbage and
    * recovery treats the bucket name from the FILENAME, not the body).
    */
  def writeString(p: Path, s: String, overwrite: Boolean = true): Unit = {
    val flags = if (overwrite)
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE)
    else java.util.EnumSet.of(CreateFlag.CREATE)
    val out = fc(p).create(p, flags,
      Options.CreateOpts.createParent())
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Atomically REPLACE the file at `dst` with content `s`: write a
    * temp sibling, rename with OVERWRITE. A reader racing the swap sees
    * the old content or the new, never a partial write or a missing
    * file. Scheme split, because the OVERWRITE contract differs:
    * HDFS's FileContext rename is the atomic rename2; the LOCAL
    * AbstractFileSystem default emulates OVERWRITE as delete-then-
    * rename — a window with NO file at `dst`, which the concurrent
    * re-export spec catches — so local paths take java.nio's
    * ATOMIC_MOVE+REPLACE_EXISTING (one atomic POSIX rename).
    */
  def writeStringAtomic(dst: Path, s: String): Unit = {
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    writeString(tmp, s)
    nonAtomicRenameShim match {
      case Some(shim) => shim(tmp, dst); return
      case None => ()
    }
    val scheme = dst.toUri.getScheme
    if (scheme == null || scheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } else fc(dst).rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  /** TEST-ONLY seam: when set, [[writeStringAtomic]]'s commit rename is
    * delegated to the shim, which can emulate an object store's
    * copy+delete "rename" — a visible window in which `dst` is absent
    * or partial. A spec drives a concurrent reader through that window
    * to pin WHY the durable protocols (epoch pointer, swap journal,
    * lease) demand an atomic-rename scheme and why MIGRATION.md routes
    * `s3a://` deployments through a table format instead. Never set
    * outside tests; `None` leaves the real per-scheme paths untouched.
    */
  @volatile private[graft] var nonAtomicRenameShim:
    Option[(Path, Path) => Unit] = None

  /** Atomic rename that FAILS if `dst` exists (the partition-swap
    * moves: the destination must have been cleared by the protocol).
    */
  def rename(src: Path, dst: Path): Unit =
    fc(src).rename(src, dst, Options.Rename.NONE)

  /** Bump a file's mtime to now (lease heartbeat). */
  def touch(p: Path): Unit =
    fc(p).setTimes(p, System.currentTimeMillis(), -1)
}
