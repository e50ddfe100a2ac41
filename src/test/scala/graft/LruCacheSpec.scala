package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LruCache

/** The bounded memo behind Similarity's ivfCache: at the bound the
  * least-recently-USED entry evicts — hot entries survive (the round-9
  * clear-all rebuilt every centroid set at once when a long-lived
  * multi-table JVM crossed the bound). */
class LruCacheSpec extends AnyFunSuite {

  test("miss builds once, hit returns the cached value without rebuilding") {
    val c = new LruCache[String, Int](4)
    var builds = 0
    def get(k: String) = c.getOrElseUpdate(k, { builds += 1; k.length })
    assert(get("aa") == 2 && builds == 1)
    assert(get("aa") == 2 && builds == 1)
    assert(get("bbb") == 3 && builds == 2)
  }

  test("at the bound the LRU entry evicts; recently-used entries survive") {
    val c = new LruCache[String, Int](3)
    var builds = 0
    def get(k: String) = c.getOrElseUpdate(k, { builds += 1; k.length })
    get("a"); get("b"); get("c")   // cache: a b c (LRU → MRU)
    get("a")                       // bump a: b c a
    get("d")                       // evicts b (the LRU), not a
    assert(c.size == 3 && c.keys == Seq("c", "a", "d"))
    builds = 0
    get("a"); get("c"); get("d")   // all hot entries still cached
    assert(builds == 0, "hot entries must survive the eviction")
    get("b")                       // only the evicted key rebuilds
    assert(builds == 1)
  }

  test("single eviction per overflow — never a clear-all") {
    val c = new LruCache[Int, Int](8)
    (0 until 64).foreach(i => c.getOrElseUpdate(i, i))
    assert(c.size == 8, "bound holds")
    assert(c.keys == (56 until 64), "exactly the 8 most recent keys remain")
  }
}
