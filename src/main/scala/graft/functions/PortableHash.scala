package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * Spark's native hash functions (murmur3 `hash`, `xxhash64`) have no DuckDB
  * equivalent, which forced the sketch-based queries (SimHash, MinHash, KMV)
  * into weaker rows-only verification in round 1. MD5 is the one hash both
  * engines compute bit-identically, so every sketch hash here is derived
  * from an MD5 prefix:
  *
  *   Spark : `conv(substring(md5(x), 1, k), 16, 10)` cast to long
  *   DuckDB: `('0x' || substr(md5(x), 1, k))::BIGINT`
  *
  * The result is a uniform nonnegative integer of 4k bits — small enough to
  * keep downstream modular arithmetic inside exact 64-bit range on BOTH
  * engines (DuckDB errors on BIGINT overflow rather than wrapping, so the
  * bounds are load-bearing, not cosmetic).
  *
  * Cost note: MD5 is ~5× murmur3 per call, still O(100ns) — invisible next
  * to the shuffle these hashes exist to shrink. Determinism across engines
  * (and across Spark versions — murmur3 seeds are config-sensitive) is worth
  * more at 100 TB than the nanoseconds.
  */
object PortableHash {

  /** 60-bit hash (15 hex chars): uniform in [0, 2^60). Value-identical to
    * `conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")`
    * — the native kernel reads the 60 bits off the digest instead of
    * materializing and re-parsing the hex string
    * ([[graft.plans.PortableHashExpression]], randomized differential in
    * its spec).
    */
  def pHash60(c: Column): Column =
    graft.plans.PortableHashExpression.md5_prefix60(c)

  /** 28-bit hash (7 hex chars): uniform in [0, 2^28). Small enough that
    * `a*h + b` with 31-bit coefficients stays under 2^63. Same native
    * kernel as [[pHash60]].
    */
  def pHash28(c: Column): Column =
    graft.plans.PortableHashExpression.md5_prefix28(c)

  /** Driver-side MD5 hex (lowercase) of a UTF-8 string — same value both
    * engines' `md5()` returns. Used to bake deterministic constants (e.g.
    * LSH hyperplane signs) into plans at build time.
    */
  def md5Hex(s: String): String =
    md5Hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Raw-byte MD5 hex — the digest a payload comparison must use.
    * Round-tripping binary payloads through a String first collapses
    * invalid-UTF-8 sequences to U+FFFD, so DISTINCT payloads (images,
    * gzip, any real WARC body) could digest identically; hashing the
    * bytes directly cannot. For pure-ASCII payloads the two overloads
    * agree, which is why the fixture oracles replay `md5(text)`.
    */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"${b & 0xff}%02x").mkString
  }
}
