package graft.engine

import java.util.concurrent.ConcurrentHashMap

/** Driver-side TTL memo — the engine's counterpart of the reference's
  * `@st.cache_data(ttl=...)` metadata caches (X7; app:89, app:108,
  * app:135) with explicit invalidation (app:195, app:199). Caches
  * driver-side METADATA (stage lists, class lists), never data frames
  * — executor-side data caching stays `df.cache()`.
  */
final class TtlCache[K, V](ttlMs: Long, clock: () => Long = () => System.currentTimeMillis()) {
  // The value is a lazy holder: compute() installs cheaply inside the
  // map's bin lock (mapping functions must be short — the thunk may be
  // a multi-second Spark job), while the holder's own lazy val
  // synchronization guarantees exactly-once computation shared by all
  // concurrent callers of the same key.
  private final class Holder(thunk: () => V) { lazy val value: V = thunk() }
  private case class Entry(holder: Holder, at: Long)
  private val map = new ConcurrentHashMap[K, Entry]()

  def getOrElseUpdate(key: K)(compute: => V): V = {
    val entry = map.compute(key, (_, cur) => {
      val now = clock()
      if (cur != null && now - cur.at < ttlMs) cur
      else Entry(new Holder(() => compute), now)
    })
    entry.holder.value // forced OUTSIDE the bin lock
  }

  /** Explicit invalidation (app:195/199: clear-on-save/delete). */
  def invalidate(key: K): Unit = map.remove(key)
  def invalidateIf(pred: K => Boolean): Unit =
    map.keySet.removeIf(k => pred(k))
  def invalidateAll(): Unit = map.clear()
}
