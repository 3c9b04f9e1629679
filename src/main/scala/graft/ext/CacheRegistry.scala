package graft.ext

import org.apache.spark.sql.DataFrame

/** Query-scoped cache registry: operators register the frames they
  * persist, and the harness mains (Verify/Bench) release them between
  * queries/timings via `clear`. One lifecycle implementation shared by
  * Dedup's signature tables and StreamOps' static stream indexes —
  * previously two identical copies that had to be kept in sync.
  *
  * Spark's cache manager keys entries on the analyzed plan, so repeated
  * registration over the SAME frame shares one cache entry; every
  * DISTINCT frame stays pinned until `clear` runs.
  */
final class CacheRegistry {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register an ALREADY-persisted (or about-to-be-persisted) frame. */
  def register(df: DataFrame): DataFrame = { frames.add(df); df }

  /** Test hook: the currently registered frames. */
  def snapshot: Seq[DataFrame] = {
    val it = frames.iterator()
    val buf = Seq.newBuilder[DataFrame]
    while (it.hasNext) buf += it.next()
    buf.result()
  }

  /** Unpersist and drop every registered frame. An unpersisted
    * dependency recomputes, so calling early is safe, just slow.
    */
  def clear(blocking: Boolean = false): Unit = {
    var df = frames.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = frames.poll()
    }
  }
}
