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

  private def casVol(p: Path): Option[CasControl.Volume] =
    if (p.toUri.getScheme == CasControl.Scheme)
      Some(CasControl.volume(Option(p.toUri.getAuthority).getOrElse("")))
    else None
  private def casKey(p: Path): String = {
    val k = p.toUri.getPath
    if (k == null || k.isEmpty) "/" else k
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
    // a cas:// pointer-service path is already canonical: flat keys
    // under an authority, no symlinks, no working directory
    if (p.toUri.getScheme == CasControl.Scheme) return p
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

  def exists(p: Path): Boolean = casVol(p) match {
    case Some(v) => v.exists(casKey(p))
    case None => fc(p).util.exists(p)
  }
  def isFile(p: Path): Boolean = casVol(p) match {
    case Some(v) => v.isFile(casKey(p))
    case None =>
      try fc(p).getFileStatus(p).isFile catch {
        case _: java.io.FileNotFoundException => false
      }
  }
  def isDirectory(p: Path): Boolean = casVol(p) match {
    case Some(v) => v.isDirectory(casKey(p))
    case None =>
      try fc(p).getFileStatus(p).isDirectory catch {
        case _: java.io.FileNotFoundException => false
      }
  }
  def status(p: Path): Option[FileStatus] = casVol(p) match {
    case Some(v) => v.status(p, casKey(p))
    case None =>
      try Some(fc(p).getFileStatus(p)) catch {
        case _: java.io.FileNotFoundException => None
      }
  }

  /** Children of a directory; empty for a missing or non-dir path. */
  def list(p: Path): Seq[FileStatus] = casVol(p) match {
    case Some(v) => v.list(p, casKey(p))
    case None =>
      try fc(p).util.listStatus(p).toSeq catch {
        case _: java.io.FileNotFoundException => Seq.empty
      }
  }

  def mkdirs(p: Path): Unit = casVol(p) match {
    case Some(_) => () // flat key namespace: directories are implicit
    case None =>
      fc(p).mkdir(p, null, true)
      ()
  }

  def delete(p: Path, recursive: Boolean = true): Boolean =
    casVol(p) match {
      case Some(v) => v.delete(casKey(p), recursive)
      case None =>
        try fc(p).delete(p, recursive) catch {
          case _: java.io.FileNotFoundException => false
        }
    }

  /** Read a small control file fully (pointer/lease/version marker).
    * Reads to EOF on the ONE opened stream — the previous form stat'ed
    * the path separately for its length, and a reader racing an atomic
    * replace could pair the NEW file's length with the OLD file's
    * descriptor (a torn read the pointer protocols forbid).
    */
  def readString(p: Path): String = {
    casVol(p).foreach { v =>
      return new String(v.read(casKey(p)), StandardCharsets.UTF_8)
    }
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
    casVol(p).foreach { v =>
      if (overwrite) v.put(casKey(p), s.getBytes(StandardCharsets.UTF_8))
      else v.putIfAbsent(p, casKey(p),
        s.getBytes(StandardCharsets.UTF_8))
      return
    }
    val flags = if (overwrite)
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE)
    else java.util.EnumSet.of(CreateFlag.CREATE)
    val out = fc(p).create(p, flags,
      Options.CreateOpts.createParent())
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Create-EXCLUSIVE small-file write: succeeds iff `p` did not exist,
    * atomically — the arbitration primitive the lease and claim gates
    * are built on (exactly one of N racing creators may win). The
    * Hadoop LOCAL AbstractFileSystem's CREATE-only create is
    * check-then-create — a TOCTOU window two racing claimants can BOTH
    * pass, each believing it created the file (the 20-round reclaim
    * race spec caught exactly that as a dual takeover) — so local
    * paths take java.nio's CREATE_NEW (one O_EXCL open). Other schemes
    * keep the FileContext create, whose exclusivity is enforced
    * server-side (one namenode op on HDFS). The nio existence failure
    * is rethrown as the Hadoop [[FileAlreadyExistsException]] so
    * callers see ONE exception type across schemes.
    */
  def writeStringExclusive(p: Path, s: String): Unit = {
    casVol(p).foreach { v =>
      v.putIfAbsent(p, casKey(p), s.getBytes(StandardCharsets.UTF_8))
      return
    }
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val out =
        try java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              p.toString)
        }
      try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
    } else writeString(p, s, overwrite = false)
  }

  /** Atomically REPLACE the file at `dst` with content `s`: write a
    * temp sibling, rename with OVERWRITE. A reader racing the swap sees
    * the old content or the new, never a partial write or a missing
    * file. Scheme split, because the OVERWRITE contract differs:
    * HDFS's FileContext rename is the atomic rename2; the LOCAL
    * AbstractFileSystem default emulates OVERWRITE as delete-then-
    * rename — a window with NO file at `dst`, which the concurrent
    * re-export spec catches — so local paths take java.nio's
    * ATOMIC_MOVE+REPLACE_EXISTING (one atomic POSIX rename). The temp
    * sibling is UNIQUE per call: concurrent replacers of one control
    * file (a reclaim takeover racing a heartbeat restore) each commit
    * their own rename — last writer wins — instead of colliding on a
    * shared temp name (one mover succeeded, the other found its source
    * already moved and died on ENOENT).
    */
  def writeStringAtomic(dst: Path, s: String): Unit = {
    // a cas:// replace is one consistent-service put — atomic by the
    // service's contract, with no rename for a shim to tear: this is
    // the MIGRATION.md deployment path for schemes whose rename is
    // copy+delete
    casVol(dst).foreach { v =>
      v.put(casKey(dst), s.getBytes(StandardCharsets.UTF_8))
      return
    }
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp." +
      java.util.UUID.randomUUID().toString.take(8))
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

  /** TEST-ONLY seam, the [[rename]] mirror of [[nonAtomicRenameShim]]:
    * emulates an object store's DIRECTORY "rename" (recursive copy +
    * per-file delete — a window in which src and dst BOTH exist, each
    * possibly partial, and a crash strands that state). The swap
    * journal's marker contract — "a `_swap_<b>` marker implies its
    * staging directory is complete" — holds ONLY because a real rename
    * makes the staging dir vanish-or-move atomically; the negative
    * spec drives a compaction swap through this shim with a crash in
    * the delete phase and pins [[graft.streaming.CurationStream
    * .recoverStore]]'s roll-forward then installing a PARTIAL
    * partition — the executable reason MIGRATION.md refuses these
    * protocols on copy+delete schemes. Never set outside tests; `None`
    * leaves the real per-scheme rename untouched.
    */
  @volatile private[graft] var nonAtomicDirRenameShim:
    Option[(Path, Path) => Unit] = None

  /** Atomic rename that FAILS if `dst` exists (the partition-swap
    * moves: the destination must have been cleared by the protocol).
    */
  def rename(src: Path, dst: Path): Unit = casVol(src) match {
    case Some(v) => v.rename(src, casKey(src), casKey(dst))
    case None =>
      nonAtomicDirRenameShim match {
        case Some(shim) => shim(src, dst)
        case None => fc(src).rename(src, dst, Options.Rename.NONE)
      }
  }

  /** Bump a file's mtime to now (lease heartbeat). */
  def touch(p: Path): Unit = casVol(p) match {
    case Some(v) => v.touch(p, casKey(p))
    case None => fc(p).setTimes(p, System.currentTimeMillis(), -1)
  }

}

/** In-memory "consistent pointer service" — the MIGRATION.md
  * alternative for object-store deployments, demonstrated end-to-end:
  * the durable CONTROL-file protocols (index-export epoch pointer,
  * store lease/claim/generation markers) address it through the same
  * [[Dfs]] API under the `cas://<volume>/<key>` scheme, and every
  * operation the protocols rely on maps to one linearizable service
  * primitive — replace = put, create-exclusive = putIfAbsent, rename =
  * one CAS move — so NOTHING depends on filesystem rename atomicity
  * (CasSpec runs the full lease battery and a pointer-swap hammer with
  * both non-atomic rename shims engaged). A production deployment
  * swaps this map for DynamoDB/etcd/ZooKeeper conditional writes; data
  * files (parquet buckets, export epochs) stay on the object store,
  * only the small control keys route here. Volumes are process-local:
  * this adapter demonstrates the seam, it is not itself a distributed
  * service.
  */
private[graft] object CasControl {
  import scala.jdk.CollectionConverters._

  val Scheme = "cas"

  final case class Entry(bytes: Array[Byte], mtime: Long)

  final class Volume {
    private[CasControl] val entries = new ConcurrentHashMap[String, Entry]()

    private def childPrefix(key: String): String =
      if (key == "/") "/" else key + "/"

    def exists(key: String): Boolean = isFile(key) || isDirectory(key)
    def isFile(key: String): Boolean = entries.containsKey(key)
    def isDirectory(key: String): Boolean = {
      val pre = childPrefix(key)
      !entries.containsKey(key) &&
        (key == "/" || entries.keySet.asScala.exists(_.startsWith(pre)))
    }

    def status(p: Path, key: String): Option[FileStatus] =
      Option(entries.get(key)) match {
        case Some(e) =>
          Some(new FileStatus(e.bytes.length.toLong, false, 1, 0L,
            e.mtime, p))
        case None if isDirectory(key) =>
          Some(new FileStatus(0L, true, 1, 0L, 0L, p))
        case None => None
      }

    def list(p: Path, key: String): Seq[FileStatus] = {
      val pre = childPrefix(key)
      val names = entries.keySet.asScala.toSeq
        .filter(k => k.startsWith(pre) && k != key)
        .map(_.stripPrefix(pre).takeWhile(_ != '/'))
        .distinct
      names.map { n =>
        val child = new Path(p, n)
        status(child, s"$pre$n").getOrElse(
          new FileStatus(0L, true, 1, 0L, 0L, child))
      }
    }

    def read(key: String): Array[Byte] =
      Option(entries.get(key)).map(_.bytes).getOrElse(
        throw new java.io.FileNotFoundException(key))

    def put(key: String, bytes: Array[Byte]): Unit = {
      entries.put(key, Entry(bytes, System.currentTimeMillis())); ()
    }

    def putIfAbsent(p: Path, key: String, bytes: Array[Byte]): Unit =
      if (entries.putIfAbsent(key,
          Entry(bytes, System.currentTimeMillis())) != null)
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          p.toString)

    def touch(p: Path, key: String): Unit =
      if (entries.computeIfPresent(key,
          (_, e) => e.copy(mtime = System.currentTimeMillis())) == null)
        throw new java.io.FileNotFoundException(p.toString)

    def delete(key: String, recursive: Boolean): Boolean =
      if (entries.remove(key) != null) true
      else if (recursive) {
        val pre = childPrefix(key)
        val victims = entries.keySet.asScala.filter(_.startsWith(pre))
          .toSeq
        victims.foreach(entries.remove)
        victims.nonEmpty
      } else false

    /** Fail-if-exists move, files and key-prefix "directories" — one
      * synchronized transition, mirroring the scheme contract
      * [[Dfs.rename]] documents for real filesystems.
      */
    def rename(src: Path, sk: String, dk: String): Unit = synchronized {
      if (entries.containsKey(dk) || isDirectory(dk))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(dk)
      Option(entries.remove(sk)) match {
        case Some(e) => entries.put(dk, e); ()
        case None if isDirectory(sk) =>
          val pre = childPrefix(sk)
          entries.keySet.asScala.filter(_.startsWith(pre)).toSeq
            .foreach { k =>
              Option(entries.remove(k)).foreach(e =>
                entries.put(childPrefix(dk) + k.stripPrefix(pre), e))
            }
        case None =>
          throw new java.io.FileNotFoundException(src.toString)
      }
    }
  }

  private val volumes = new ConcurrentHashMap[String, Volume]()
  def volume(auth: String): Volume =
    volumes.computeIfAbsent(auth, _ => new Volume)

  /** TEST-ONLY: drop a volume (spec isolation). */
  private[graft] def reset(auth: String): Unit = { volumes.remove(auth); () }

  /** TEST-ONLY: backdate a key's mtime (lease-staleness legs). */
  private[graft] def age(p: Path, mtime: Long): Unit = {
    val v = volume(Option(p.toUri.getAuthority).getOrElse(""))
    val key = Option(p.toUri.getPath).filter(_.nonEmpty).getOrElse("/")
    v.entries.computeIfPresent(key, (_, e) => e.copy(mtime = mtime))
    ()
  }
}
