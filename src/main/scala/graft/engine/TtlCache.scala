package graft.engine

import java.util.concurrent.ConcurrentHashMap

/** Driver-side TTL memo — the engine's counterpart of the reference's
  * `@st.cache_data(ttl=...)` metadata caches (X7; app:89, app:108,
  * app:135) with explicit invalidation (app:195, app:199). Caches
  * driver-side METADATA (stage lists, class lists), never data frames
  * — executor-side data caching stays `df.cache()`.
  */
final class TtlCache[K, V](ttlMs: Long, clock: () => Long = () => System.currentTimeMillis()) {
  private case class Entry(value: V, at: Long)
  private val map = new ConcurrentHashMap[K, Entry]()

  def getOrElseUpdate(key: K)(compute: => V): V = {
    // atomic check-then-act: expiry is re-evaluated inside the mapping
    // function so concurrent callers neither double-compute nor stomp a
    // fresher entry (or resurrect a concurrently invalidated key)
    map.compute(key, (_, cur) => {
      val now = clock()
      if (cur != null && now - cur.at < ttlMs) cur
      else Entry(compute, now)
    }).value
  }

  /** Explicit invalidation (app:195/199: clear-on-save/delete). */
  def invalidate(key: K): Unit = map.remove(key)
  def invalidateAll(): Unit = map.clear()
}
