package graft.operators

/** Primitive open-addressing long→long hash map for the dedup local-finish
  * union-find (see [[Dedup.duplicateClusters]]).
  *
  * Two parallel `long[]` arrays + linear probing ≈ 16 B/entry, vs ~80 B/entry
  * for a boxed `java.util.HashMap[Long, Long]` — at the 10 M-edge design
  * point the single local-finish task holds ~0.5 GB instead of multi-GB.
  *
  * Key 0 is a valid key: the key array's 0 means "empty slot", so key 0 is
  * stored out-of-band in a dedicated slot. Capacity is always a power of
  * two; the table grows (re-hash) when occupancy crosses ~0.7.
  *
  * Iteration contract: `keysIterator` walks the live arrays. Value-only
  * `put`s on EXISTING keys during iteration are safe (entries never move);
  * inserting a NEW key during iteration is not supported (a resize would
  * invalidate the cursor) — the union-find finish only compresses paths
  * (value updates) while iterating, never inserts.
  */
final class LongLongMap(initialCapacity: Int) extends Serializable {
  private[this] var cap: Int = {
    val want = math.max(initialCapacity, 16)
    // smallest power of two >= want
    Integer.highestOneBit(want - 1) << 1
  }
  private[this] var mask: Int = cap - 1
  private[this] var keys: Array[Long] = new Array[Long](cap)
  private[this] var values: Array[Long] = new Array[Long](cap)
  private[this] var used: Int = 0 // non-zero keys stored
  private[this] var hasZero: Boolean = false
  private[this] var zeroValue: Long = 0L

  def size: Int = used + (if (hasZero) 1 else 0)

  // SplitMix64 finalizer: full-avalanche scramble so sequential ids don't
  // form linear-probe clusters
  @inline private[this] def slot(k: Long): Int = {
    var h = k
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (((h ^ (h >>> 31)) & 0x7fffffffL).toInt) & mask
  }

  def getOrDefault(k: Long, default: Long): Long = {
    if (k == 0L) return if (hasZero) zeroValue else default
    var i = slot(k)
    var kk = keys(i)
    while (kk != 0L) {
      if (kk == k) return values(i)
      i = (i + 1) & mask
      kk = keys(i)
    }
    default
  }

  def put(k: Long, v: Long): Unit = {
    if (k == 0L) {
      if (!hasZero) { hasZero = true }
      zeroValue = v
      return
    }
    var i = slot(k)
    var kk = keys(i)
    while (kk != 0L && kk != k) {
      i = (i + 1) & mask
      kk = keys(i)
    }
    if (kk == 0L) {
      keys(i) = k
      values(i) = v
      used += 1
      if (used + (used >> 1) > cap) grow() // load factor ~0.67
    } else {
      values(i) = v
    }
  }

  private[this] def grow(): Unit = {
    val oldKeys = keys
    val oldValues = values
    cap <<= 1
    mask = cap - 1
    keys = new Array[Long](cap)
    values = new Array[Long](cap)
    var j = 0
    while (j < oldKeys.length) {
      val k = oldKeys(j)
      if (k != 0L) {
        var i = slot(k)
        while (keys(i) != 0L) i = (i + 1) & mask
        keys(i) = k
        values(i) = oldValues(j)
      }
      j += 1
    }
  }

  /** Lazy iterator over stored keys (including key 0 if present). Safe to
    * interleave with value-only `put`s on existing keys — see class doc.
    */
  def keysIterator: Iterator[Long] = {
    val nonZero = new Iterator[Long] {
      private[this] var i = 0
      private[this] def advance(): Unit = { while (i < keys.length && keys(i) == 0L) i += 1 }
      advance()
      def hasNext: Boolean = i < keys.length
      def next(): Long = { val k = keys(i); i += 1; advance(); k }
    }
    if (hasZero) Iterator.single(0L) ++ nonZero else nonZero
  }
}
