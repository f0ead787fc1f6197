package graft.io

/** A small bounded LRU (access-ordered) with monitor synchronization —
  * ONE definition for the driver-side planning caches
  * ([[FeatherChanges]]' head-schema cache, the write gate's legacy
  * union cache). Two hand-rolled LinkedHashMap copies of this idiom
  * drifted before this existed. `cap` is by-name so test seams can
  * lower it live. Eviction beyond the cap removes the least recently
  * READ entry — under a fixed key set a hash-ordered victim would be
  * the same table every time, which would pay its full rebuild on
  * every access while the rest stayed cached forever. */
private[graft] final class LruMap[K, V](cap: () => Int) {
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > cap()
  }
  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
  def put(k: K, v: V): Unit = m.synchronized(m.put(k, v)): Unit
  /** Put after evicting every key matching `stale` — the
    * superseded-generation eviction the planning caches share. */
  def putEvicting(k: K, v: V)(stale: K => Boolean): Unit =
    m.synchronized {
      m.keySet.removeIf(kk => stale(kk))
      m.put(k, v): Unit
    }
  def size: Int = m.synchronized(m.size)
  def clear(): Unit = m.synchronized(m.clear())
}
