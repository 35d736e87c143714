package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class TtlCacheSpec extends AnyFunSuite {

  test("serves within TTL, recomputes after, honors invalidation (X7)") {
    var now = 0L
    val cache = new TtlCache[String, Int](ttlMs = 100, clock = () => now)
    var computes = 0
    def get() = cache.getOrElseUpdate("k") { computes += 1; computes }
    assert(get() == 1 && get() == 1) // cached
    now = 150
    assert(get() == 2) // ttl expired
    cache.invalidate("k")
    assert(get() == 3) // explicit invalidation
  }

  test("concurrent cold reads compute exactly once (atomic compute)") {
    val cache = new TtlCache[String, Int](ttlMs = 60000)
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 16).map(_ => pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int = cache.getOrElseUpdate("k") {
          Thread.sleep(20)
          computes.incrementAndGet()
        }
      }))
      val results = tasks.map(_.get()).toSet
      assert(results == Set(1), s"all callers must observe one computation: $results")
      assert(computes.get() == 1)
    } finally pool.shutdown()
  }
}
