package lucy.query

import org.scalatest.funsuite.AnyFunSuite
import lucy.index.PostingBlock

/** BlockCache unit behavior: size accounting, LRU eviction under the
  * byte cap, access-order refresh, and idempotent puts. (Equivalence of
  * cached vs uncached SEARCH results is covered by WandEquivalenceSpec
  * + the bench warm path; this pins the cache mechanics themselves.)
  */
class BlockCacheSpec extends AnyFunSuite {

  private def groupsOf(term: String, nBytes: Int) = {
    val b = PostingBlock(lucy.Hashing.termHash(term), term, 0, 0, 1L, 1L, 1, 1, 5,
      new Array[Byte](nBytes), Array[Byte](0), Array[Byte](5),
      PostingBlock.encodePositions(Array(0)))
    Seq(((0, 0), Array(b)))
  }

  test("put/get roundtrip; re-put is a no-op; size accounted") {
    val c = new BlockCache(maxBytes = 10000)
    assert(c.get("a").isEmpty)
    c.put("a", groupsOf("a", 100))
    val sz = c.sizeBytes
    assert(sz > 100, "payload + overhead accounted")
    c.put("a", groupsOf("a", 100)) // idempotent
    assert(c.sizeBytes === sz)
    assert(c.get("a").nonEmpty)
  }

  test("LRU eviction under the byte cap keeps recently-used terms") {
    val entryBytes = {
      val c0 = new BlockCache(); c0.put("probe", groupsOf("probe", 1000)); c0.sizeBytes
    }
    val c = new BlockCache(maxBytes = entryBytes * 3)
    c.put("t1", groupsOf("t1", 1000))
    c.put("t2", groupsOf("t2", 1000))
    c.put("t3", groupsOf("t3", 1000))
    assert(c.get("t1").nonEmpty && c.get("t2").nonEmpty && c.get("t3").nonEmpty)
    // touch t1 so t2 is the LRU victim when t4 overflows the cap
    c.get("t1")
    c.put("t4", groupsOf("t4", 1000))
    assert(c.get("t2").isEmpty, "LRU entry must be evicted")
    assert(c.get("t1").nonEmpty && c.get("t3").nonEmpty && c.get("t4").nonEmpty)
    assert(c.sizeBytes <= entryBytes * 3)
  }

  test("an entry larger than the cap still serves (evicts everything else)") {
    val c = new BlockCache(maxBytes = 10)
    c.put("big", groupsOf("big", 1000))
    assert(c.get("big").nonEmpty, "the just-put term is never self-evicted")
  }

  test("TombstonedIndex guards: sortedness and the compact-first cap") {
    import lucy.index.{Deletes, LucyIndex, TombstonedIndex}
    val inner = LucyIndex("/nonexistent") // never touched by the guards
    intercept[IllegalArgumentException] {
      TombstonedIndex(inner, Array(5L, 3L))
    }
    val e = intercept[IllegalArgumentException] {
      TombstonedIndex(inner, Array.tabulate(Deletes.maxTombstones + 1)(_.toLong))
    }
    assert(e.getMessage.contains("compact"))
  }
}
