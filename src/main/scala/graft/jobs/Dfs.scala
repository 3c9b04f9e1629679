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
    * `.`-segmented caller spelling can never split the keyspace.
    */
  def qualified(s: String): Path = {
    val p = new Path(s)
    fc(p).makeQualified(p)
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

  /** Read a small control file fully (pointer/lease/version marker). */
  def readString(p: Path): String = {
    val in = fc(p).open(p)
    try {
      val n = fc(p).getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](n)
      in.readFully(0, buf)
      new String(buf, StandardCharsets.UTF_8)
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

  /** Atomic rename that FAILS if `dst` exists (the partition-swap
    * moves: the destination must have been cleared by the protocol).
    */
  def rename(src: Path, dst: Path): Unit =
    fc(src).rename(src, dst, Options.Rename.NONE)

  /** Bump a file's mtime to now (lease heartbeat). */
  def touch(p: Path): Unit =
    fc(p).setTimes(p, System.currentTimeMillis(), -1)
}
