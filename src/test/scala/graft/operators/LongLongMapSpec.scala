package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The primitive map under the dedup local-finish union-find. */
class LongLongMapSpec extends AnyFunSuite {

  test("put/getOrDefault round-trips, absent keys take the default") {
    val m = new LongLongMap(16)
    assert(m.getOrDefault(42L, -1L) == -1L)
    m.put(42L, 7L)
    assert(m.getOrDefault(42L, -1L) == 7L)
    m.put(42L, 8L) // overwrite, size unchanged
    assert(m.getOrDefault(42L, -1L) == 8L)
    assert(m.size == 1)
  }

  test("key 0 is a valid key, distinct from the empty-slot sentinel") {
    val m = new LongLongMap(16)
    assert(m.getOrDefault(0L, 99L) == 99L)
    m.put(0L, 5L)
    assert(m.getOrDefault(0L, 99L) == 5L)
    assert(m.size == 1)
    assert(m.keysIterator.toSet == Set(0L))
    m.put(0L, 6L)
    assert(m.getOrDefault(0L, 99L) == 6L)
    assert(m.size == 1)
  }

  test("grows past initial capacity without losing entries") {
    val m = new LongLongMap(16)
    val n = 100000
    (1 to n).foreach(i => m.put(i.toLong, -i.toLong))
    assert(m.size == n)
    (1 to n).foreach(i => assert(m.getOrDefault(i.toLong, 0L) == -i.toLong))
    assert(m.keysIterator.size == n)
  }

  test("random fuzz vs scala.collection.mutable.Map (incl. negative keys)") {
    val rnd = new Random(20260812L)
    val m = new LongLongMap(16)
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    (1 to 50000).foreach { _ =>
      val k = rnd.nextLong() >> (rnd.nextInt(48)) // mix of huge + clustered keys
      val v = rnd.nextLong()
      m.put(k, v); ref(k) = v
    }
    assert(m.size == ref.size)
    ref.foreach { case (k, v) => assert(m.getOrDefault(k, v - 1) == v) }
    assert(m.keysIterator.toSet == ref.keySet)
  }

  test("value-only puts during keysIterator are safe (union-find contract)") {
    val m = new LongLongMap(16)
    (1L to 1000L).foreach(k => m.put(k, k + 1))
    val seen = m.keysIterator.map { k =>
      m.put(k, 0L) // compress: value update on an existing key, no insert
      k
    }.toSet
    assert(seen == (1L to 1000L).toSet)
    (1L to 1000L).foreach(k => assert(m.getOrDefault(k, -1L) == 0L))
  }
}
