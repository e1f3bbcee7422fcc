package graft.functions

/** Fixed-size Bloom bit array over the same md5-slice addressing as the
  * relational form in [[graft.operators.SketchOps.BloomSeen]] (position
  * k of `key` = pHash28(s"k:key") mod m). This is the production 100 TB
  * build shape: each partition ORs inserts into its own m/8-byte local
  * array, partials merge associatively (ONE fixed-size array per
  * partition crosses the wire, vs the ≤m distinct-position rows the
  * relational form shuffles), and probes are pure bit tests.
  * SketchOpsSpec pins byte-array decisions ≡ relational
  * DISTINCT-positions decisions on the same hash family, the OR-merge
  * law, and no-false-negatives.
  */
object BloomBits {

  def empty(mBits: Int): Array[Byte] = {
    require(mBits > 0 && mBits % 8 == 0, s"mBits must be a positive multiple of 8: $mBits")
    new Array[Byte](mBits / 8)
  }

  /** Driver/executor-local twin of the Column-side addressing
    * (`pHash28(concat(k, ':', key)) % m` — [[PortableHash.pHash28]]).
    */
  def position(k: Int, key: String, mBits: Int): Int =
    (java.lang.Long.parseLong(
      PortableHash.md5Hex(s"$k:$key").substring(0, 7), 16) % mBits).toInt

  def add(bits: Array[Byte], key: String, kHashes: Int): Unit = {
    val m = bits.length * 8
    var k = 0
    while (k < kHashes) {
      val p = position(k, key, m)
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
      k += 1
    }
  }

  def maybeContains(bits: Array[Byte], key: String, kHashes: Int): Boolean = {
    val m = bits.length * 8
    var k = 0
    while (k < kHashes) {
      val p = position(k, key, m)
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      k += 1
    }
    true
  }

  /** Associative, commutative partial-merge: bitwise OR. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"bloom partials differ in size: ${a.length} vs ${b.length}")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
    out
  }
}
