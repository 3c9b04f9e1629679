package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * All queries take an `sfDir` so the same code runs at any scale factor;
  * at cluster scale the same call reads a partitioned table directory.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations (which Spark 4.x rejects outright — [PARQUET_TYPE_ILLEGAL] —
    * unless read as a raw nano count via `nanosAsLong`) and as
    * TIMESTAMP(MICROS) in others. Adapt on schema: a Long column is a nano
    * count converted with integer division (`DIV`, not `/` — double division
    * loses precision at 1e18); a timestamp column is cast to the session
    * TimestampType so downstream ops see one type either way. The driver
    * data is micro-aligned, so both paths are lossless.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _        => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** Version token folded into every [[fingerprint]]. Bump when the
    * FORMAT of any fingerprint-keyed artifact changes (the IndexExport
    * layout, the persisted curation store, the centroid encoding): a
    * new token is a new artifact directory, so a code change can never
    * serve bytes a previous layout wrote — the stale-artifact failure
    * mode would otherwise surface as a confusing oracle-gate mismatch
    * instead of a rebuild.
    */
  val LayoutVersion = 2

  /** Driver-side corpus fingerprint: (name, length, mtime, tail
    * checksum) of every data file under the named tables, hashed
    * together with [[LayoutVersion]]. The serving twins (q123–q125) key
    * their prebuilt artifacts — index exports, the persisted curation
    * store — on this, so a corpus whose CONTENT changes under the same
    * path can never be served stale prebuilt bytes: a different
    * fingerprint is a different artifact directory. The tail checksum
    * (MD5 over the last 64 KiB — where a parquet file's footer and
    * page-index metadata live) closes the (length, mtime)-preserving
    * in-place rewrite hole: same-size same-mtime content swaps now
    * change the fingerprint too. Pure driver reads, bounded at 64 KiB
    * per file; zero Spark jobs.
    */
  def fingerprint(sfDir: String, names: Seq[String]): String = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    import graft.jobs.Dfs
    // the walk rides the Hadoop FileSystem seam (graft.jobs.Dfs), so a
    // corpus on hdfs:// fingerprints through the same code as local
    // test data; pure driver reads, bounded at 64 KiB per file
    def files(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory)
        Dfs.list(st.getPath).sortBy(_.getPath.getName).flatMap(files)
      else if (st.isFile) Seq(st)
      else Seq.empty
    def tailSum(st: FileStatus): String = {
      val buf = Dfs.readTail(st, 65536)
      if (buf.isEmpty) "empty"
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(buf).map(b => f"$b%02x").mkString
      }
    }
    val sig = names
      .flatMap(n => Dfs.status(
        new Path(Dfs.qualified(sfDir), s"$n.parquet")).toSeq.flatMap(files))
      .map(st => s"${st.getPath.getName}:${st.getLen}:" +
        s"${st.getModificationTime}:${tailSum(st)}")
      .mkString("|")
    java.lang.Long.toHexString(org.apache.spark.sql.graft.GraftColumns
      .xxhash64String(s"v$LayoutVersion|$sfDir|$sig"))
  }
}
