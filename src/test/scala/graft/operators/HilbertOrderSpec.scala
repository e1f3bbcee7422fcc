package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hilbert-key proofs: the engine's fold ≡ an independent plain-Scala
  * xy2d on grids and random points; the curve's defining adjacency
  * property (consecutive indices are always grid neighbors — false for
  * Morton, which jumps at power-of-two seams); bijectivity; and the
  * locality payoff the operator exists for, measured against Z-order on
  * the actual corpus points.
  */
class HilbertOrderSpec extends SparkSpec {

  private val N = 256

  /** Reference xy2d (standard iterative rotate-and-accumulate). */
  private def xy2d(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = N / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Reference d2xy (the inverse walk). */
  private def d2xy(d0: Long): (Long, Long) = {
    var t = d0; var x = 0L; var y = 0L
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  private def morton(x: Long, y: Long): Long =
    (0 until 8).map(i => (((x >> i) & 1) << (2 * i)) |
      (((y >> i) & 1) << (2 * i + 1))).sum

  test("engine fold ≡ reference xy2d on a grid and random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x411B)
    val pts = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)) ++
      Seq.fill(500)((rnd.nextInt(N).toLong, rnd.nextInt(N).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", LayoutOps.HilbertOrder.hilbertExpr.as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) == xy2d(x, y), s"mismatch at ($x,$y)")
  }

  test("reference round-trips and is a bijection on the grid") {
    for (d <- 0L until (N.toLong * N)) {
      val (x, y) = d2xy(d)
      assert(xy2d(x, y) == d, s"round-trip failed at d=$d")
    }
  }

  test("adjacency: consecutive Hilbert indices are always grid neighbors") {
    var maxJump = 0L
    for (d <- 0L until (N.toLong * N - 1)) {
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      val dist = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(dist == 1, s"non-adjacent step at d=$d")
      maxJump = math.max(maxJump, dist)
    }
    // Morton, by contrast, jumps: x=255,y=0 -> x=0,y=1 style seams
    val mortonJumps = (0L until 65535L).count { m =>
      // invert morton by brute bit de-interleave
      def deinter(v: Long, off: Int): Long =
        (0 until 8).map(i => ((v >> (2 * i + off)) & 1) << i).sum
      val (x1, y1) = (deinter(m, 0), deinter(m, 1))
      val (x2, y2) = (deinter(m + 1, 0), deinter(m + 1, 1))
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0, "Morton should have seams (sanity)")
  }

  test("locality: Hilbert buckets have no larger mean bbox area than Morton on the corpus points") {
    val pts = graft.Graft.table(spark, sf, "part")
      .select(col("p_size").cast("long").as("x"),
        (graft.functions.PortableHash.pHash28(
          concat(lit("z:"), col("p_partkey").cast("string"))) % 256).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def meanBoxArea(key: (Long, Long) => Long): Double = {
      val buckets = pts.groupBy { case (x, y) => key(x, y) / 1024 }
      val areas = buckets.values.map { ps =>
        val xs = ps.map(_._1); val ys = ps.map(_._2)
        ((xs.max - xs.min + 1) * (ys.max - ys.min + 1)).toDouble
      }
      areas.sum / areas.size
    }
    val hArea = meanBoxArea(xy2d)
    val mArea = meanBoxArea(morton)
    assert(hArea <= mArea,
      s"Hilbert mean bucket box $hArea > Morton $mArea on the corpus points")
  }
}
