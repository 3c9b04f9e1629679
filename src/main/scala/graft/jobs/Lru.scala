package graft.jobs

/** Small bounded LRU for long-lived serving caches (readers, footers,
  * plan fragments). A serving process that cycles exports or codebooks
  * must not grow driver memory without bound — the unbounded
  * ConcurrentHashMaps these replace leaked one entry per epoch/codebook
  * forever. Access-ordered, evicts the least-recently-used entry past
  * `maxEntries`; `remove` lets an exporter invalidate the epochs it
  * just pruned instead of relying on callers to remember a clear call.
  */
private[graft] final class Lru[K, V](maxEntries: Int) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > maxEntries
  }

  /** Get-or-compute under the cache lock: `mk` runs at most once per
    * live key (same contract as ConcurrentHashMap.computeIfAbsent).
    */
  def get(k: K)(mk: K => V): V = m.synchronized {
    val v = m.get(k)
    if (v != null) v
    else {
      val nv = mk(k)
      m.put(k, nv)
      nv
    }
  }

  /** Peek without computing (tests). */
  def peek(k: K): Option[V] = m.synchronized(Option(m.get(k)))

  def removeIf(pred: K => Boolean): Unit = m.synchronized {
    val it = m.keySet().iterator()
    while (it.hasNext) if (pred(it.next())) it.remove()
  }

  def clear(): Unit = m.synchronized(m.clear())

  def size: Int = m.synchronized(m.size())
}
