package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (SURVEY §4 names both as the candidates worth
  * writing): a one-pass map-sum and a KMV distinct sketch. Registered via
  * `functions.udaf` where a DataFrame column API is wanted.
  */
object Aggregators {

  /** A4 in one pass: sum `Map[Int, Long]` histograms key-wise without the
    * explode → groupBy → map_from_entries round trip. The explode path is
    * the default (it shuffles narrow rows and codegens); this aggregator
    * is for map-heavy rows where explode would blow row counts by the map
    * arity. Output keys sorted for deterministic downstream hashing.
    */
  object MapSum extends Aggregator[Map[Int, Long], Map[Int, Long], Map[Int, Long]] {
    def zero: Map[Int, Long] = Map.empty
    def reduce(acc: Map[Int, Long], row: Map[Int, Long]): Map[Int, Long] = merge(acc, row)
    def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] = {
      val (small, large) = if (a.size < b.size) (a, b) else (b, a)
      small.foldLeft(large) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    }
    def finish(acc: Map[Int, Long]): Map[Int, Long] =
      scala.collection.immutable.SortedMap.from(acc)
    def bufferEncoder: Encoder[Map[Int, Long]] = Encoders.kryo[Map[Int, Long]]
    def outputEncoder: Encoder[Map[Int, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Long]]()
  }

  /** KMV (k-minimum-values) distinct-count sketch family: keep the k
    * smallest distinct hash values; estimate from the kth minimum.
    * Fixed-size state (≤ k longs), associative+commutative merge — the
    * sketch family the reference's `np.unique`-on-driver could never scale
    * to, and the reason the shuffle cost is independent of row count.
    */
  final case class KmvBuffer(mins: Vector[Long])

  /** Shared k-min-values state ops (signed ascending order — callers map
    * their hash domain into it).
    */
  private object Kmv {
    /** Per-row insert keeps `mins` sorted-distinct as an invariant: binary
      * search for the insertion point, O(log k) and zero allocation on the
      * (dominant at scale) reject/duplicate paths — a distinct.sorted
      * rebuild per accepted row is O(k log k) allocation in the tightest
      * loop of the sketch.
      */
    def insert(mins: Vector[Long], h: Long, k: Int): Vector[Long] =
      if (mins.length >= k && h >= mins.last) mins
      else {
        import scala.collection.Searching._
        mins.search(h) match {
          case Found(_) => mins // already present
          case InsertionPoint(i) =>
            val grown = mins.patch(i, Vector(h), 0)
            if (grown.length > k) grown.dropRight(1) else grown
        }
      }
    def merge(a: Vector[Long], b: Vector[Long], k: Int): Vector[Long] =
      (a ++ b).distinct.sorted.take(k)
  }

  /** KMV over raw (un-hashed) long values: hashes with byteswap64 into full
    * unsigned-64 space. Engine-private hashing — spec-verified tolerance,
    * not oracle-replayable; see [[KmvPortable]] for the cross-engine form.
    */
  class KmvSketch(k: Int) extends Aggregator[Long, KmvBuffer, Double] {
    require(k >= 2)
    def zero: KmvBuffer = KmvBuffer(Vector.empty)
    def reduce(b: KmvBuffer, value: Long): KmvBuffer =
      // flip to unsigned order so the signed-ascending core ranks correctly
      KmvBuffer(Kmv.insert(b.mins,
        scala.util.hashing.byteswap64(value) ^ Long.MinValue, k))
    def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
      KmvBuffer(Kmv.merge(a.mins, b.mins, k))
    def finish(b: KmvBuffer): Double =
      if (b.mins.length < k) b.mins.length.toDouble
      else {
        // kth smallest of n uniform [0,1) draws ≈ k/(n+1) ⇒ n ≈ k/u_k - 1;
        // the standard KMV estimator uses (k-1)/u_k
        val uk = (b.mins.last.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
        (k - 1).toDouble / uk
      }
    def bufferEncoder: Encoder[KmvBuffer] = Encoders.kryo[KmvBuffer]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV over PRE-HASHED portable values ([[PortableHash.pHash60]] longs in
    * [0, 2^60), already nonnegative so signed order == value order):
    * estimates (k-1) / (h_k / 2^60). The estimator's constants and single
    * divide are the exact IEEE expression the DuckDB oracle computes, so
    * results stay hash-verifiable
    * ([[graft.operators.AnalyticOps.ApproxDistinct]]).
    */
  class KmvPortable(k: Int) extends Aggregator[Long, KmvBuffer, Double] {
    require(k >= 2)
    def zero: KmvBuffer = KmvBuffer(Vector.empty)
    def reduce(b: KmvBuffer, h: Long): KmvBuffer =
      KmvBuffer(Kmv.insert(b.mins, h, k))
    def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
      KmvBuffer(Kmv.merge(a.mins, b.mins, k))
    def finish(b: KmvBuffer): Double =
      if (b.mins.length < k) b.mins.length.toDouble
      // (k-1) * 2^60 / h_k — both constants exactly representable, one
      // divide: bit-identical to the oracle's CASE arm
      else (k - 1).toDouble * 1.152921504606846976e18 / b.mins.last.toDouble
    def bufferEncoder: Encoder[KmvBuffer] = Encoders.kryo[KmvBuffer]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** SimHash as a one-pass aggregator over portable token hashes: each
    * occurrence votes ±1 on every bit of its hash; finish takes the sign
    * per bit. Σ over occurrences of ±1 ≡ Σ over distinct tokens of ±tf, so
    * this is value-identical to the tf-weighted relational formulation —
    * but the plan needs NO per-(doc,token) pre-aggregation and NO
    * explode-by-bits: partial state is a fixed `bits` counters per group,
    * where the exploded form shuffled 60 rows per (doc, token).
    */
  class SimHashAgg(bits: Int) extends Aggregator[Long, Array[Long], Long] {
    require(bits > 0 && bits <= 63)
    def zero: Array[Long] = new Array[Long](bits)
    def reduce(acc: Array[Long], h: Long): Array[Long] = {
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      acc
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bits) { a(i) += b(i); i += 1 }
      a
    }
    def finish(acc: Array[Long]): Long = {
      var out = 0L
      var b = 0
      while (b < bits) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
