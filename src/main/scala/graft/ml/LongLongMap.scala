package graft.ml

/** Minimal open-addressing long→long hash map for the LM hot path.
  *
  * The n-gram model is consulted ~(order+2) times per token per ensemble
  * member — billions of probes per corpus pass — and a boxed
  * `immutable.Map[Long, Long]` (HAMT) pays an allocation and several
  * pointer hops per probe; this was measured as the dominant CPU term of
  * the whole cascade (the model-feature stage: ~60 % of all task-core-
  * seconds at 2M docs). Linear probing over two primitive arrays makes a
  * probe a couple of cache lines with zero allocation, and the arrays
  * serialize compactly through the broadcast.
  *
  * Lookup semantics are exactly `Map.getOrElse`: same keys in → same
  * values out (FeatureSpec pins model behavior; the F1 gates are
  * unchanged by construction). Immutable after build; thread-safe to
  * read. Slot 0 is the empty marker, so a genuine 0L key (possible —
  * keys are hashes) gets a dedicated side slot.
  */
final class LongLongMap private (
    keys: Array[Long],
    vals: Array[Long],
    mask: Int,
    hasZero: Boolean,
    zeroVal: Long,
    val size: Int) extends Serializable {

  /** splitmix64 finalizer: the stored keys are already murmur-mixed, but
    * linear probing needs avalanche on the low bits specifically. */
  @inline private def slot(k: Long): Int = {
    var h = k
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    (h & mask).toInt
  }

  def getOrElse(k: Long, default: Long): Long = {
    if (k == 0L) return if (hasZero) zeroVal else default
    var i = slot(k)
    var kk = keys(i)
    while (kk != 0L) {
      if (kk == k) return vals(i)
      i = (i + 1) & mask
      kk = keys(i)
    }
    default
  }

  def contains(k: Long): Boolean =
    if (k == 0L) hasZero
    else {
      var i = slot(k)
      var kk = keys(i)
      while (kk != 0L && kk != k) { i = (i + 1) & mask; kk = keys(i) }
      kk == k
    }

  def foreach(f: (Long, Long) => Unit): Unit = {
    if (hasZero) f(0L, zeroVal)
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0L) f(keys(i), vals(i))
      i += 1
    }
  }
}

object LongLongMap {
  val empty: LongLongMap = fromPairs(Array.empty[(Long, Long)])

  /** Last write wins on duplicate keys (same as Map ++). Load factor ≤ 0.5. */
  def fromPairs(pairs: Iterable[(Long, Long)]): LongLongMap = {
    val n = pairs.size
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val vals = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    var zeroVal = 0L
    var size = 0
    pairs.foreach { case (k, v) =>
      if (k == 0L) {
        if (!hasZero) size += 1
        hasZero = true; zeroVal = v
      } else {
        var h = k
        h ^= h >>> 33
        h *= 0xff51afd7ed558ccdL
        h ^= h >>> 33
        var i = (h & mask).toInt
        while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
        if (keys(i) == 0L) size += 1
        keys(i) = k; vals(i) = v
      }
    }
    new LongLongMap(keys, vals, mask, hasZero, zeroVal, size)
  }
}
