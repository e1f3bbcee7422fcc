package graft.props

import graft.functions.Aggregators
import graft.images.{Detection, ImageOps}
import graft.plans.VectorExpressions
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suites (SURVEY §5.4) over the pure (non-Spark)
  * kernels — sbt runs these natively via the scalacheck test framework.
  */
object EngineProperties extends Properties("graft") {

  // ---- letterbox invariants (M5) --------------------------------------
  private val genDims = for {
    w <- Gen.choose(1, 4000); h <- Gen.choose(1, 4000)
  } yield (w, h)

  property("letterbox.fitsTarget") = forAll(genDims) { case (w, h) =>
    val lb = Detection.letterbox(w, h)
    lb.outW <= lb.target && lb.outH <= lb.target &&
      (lb.outW == lb.target || lb.outH == lb.target || lb.scale >= 1f ||
        // integer floor can undershoot by <1 px on the max side
        math.max((w * lb.scale).toInt, (h * lb.scale).toInt) >= lb.target - 1)
  }

  property("letterbox.scaleIsMinRatio") = forAll(genDims) { case (w, h) =>
    val lb = Detection.letterbox(w, h)
    lb.scale == math.min(416f / w, 416f / h)
  }

  // ---- NMS postconditions (M7) ----------------------------------------
  private val genBox = for {
    x1 <- Gen.choose(0f, 300f); y1 <- Gen.choose(0f, 300f)
    w <- Gen.choose(1f, 100f); h <- Gen.choose(1f, 100f)
    s <- Gen.choose(0f, 1f); c <- Gen.choose(0, 79)
  } yield Detection.Box(x1, y1, x1 + w, y1 + h, s, c)

  property("nms.keptPairwiseBelowThreshold") =
    forAll(Gen.listOfN(25, genBox)) { boxes =>
      val kept = Detection.nms(boxes, 0.3f)
      kept.indices.forall(i => (i + 1 until kept.size).forall(j =>
        Detection.iou(kept(i), kept(j)) <= 0.3f))
    }

  property("nms.orderInvariant") = forAll(Gen.listOfN(15, genBox)) { boxes =>
    Detection.nms(boxes).toSet == Detection.nms(boxes.reverse).toSet
  }

  // ---- quantization (vector determinism kernel) -----------------------
  private val genF = Gen.choose(-0.6f, 0.6f)

  property("quantize.withinHalfUnit") = forAll(genF) { x =>
    math.abs(VectorExpressions.quantize(x) - x.toDouble * 1e6) <= 0.5
  }

  property("quantize.oddSymmetry") = forAll(genF) { x =>
    VectorExpressions.quantize(-x) == -VectorExpressions.quantize(x)
  }

  // ---- aggregator algebra ---------------------------------------------
  private val genMap = Gen.mapOf(Gen.zip(Gen.choose(0, 20), Gen.choose(-5L, 5L)))

  property("mapSum.commutative") = forAll(genMap, genMap) { (a, b) =>
    Aggregators.MapSum.merge(a, b) == Aggregators.MapSum.merge(b, a)
  }

  property("mapSum.associative") = forAll(genMap, genMap, genMap) { (a, b, c) =>
    Aggregators.MapSum.merge(Aggregators.MapSum.merge(a, b), c) ==
      Aggregators.MapSum.merge(a, Aggregators.MapSum.merge(b, c))
  }

  property("kmv.mergeCommutative") = forAll(
    Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
    val s = new Aggregators.KmvSketch(8)
    val bx = xs.foldLeft(s.zero)(s.reduce)
    val by = ys.foldLeft(s.zero)(s.reduce)
    s.finish(s.merge(bx, by)) == s.finish(s.merge(by, bx))
  }

  // ---- native-expression kernels (round 2) ----------------------------
  import graft.plans.{LshExpression, ShingleExpression, WinnowExpression}
  import org.apache.spark.unsafe.types.UTF8String

  private val genWord = Gen.resize(8, Gen.nonEmptyListOf(Gen.alphaLowerChar)).map(_.mkString)
  private val genText = Gen.resize(40, Gen.listOf(genWord)).map(_.mkString(" "))

  property("shingle.countMatchesNaiveSliding") = forAll(genText) { t =>
    val toks = t.trim.split("[ \t\n\f\r]+", -1)
    val naive =
      if (toks.length < 2) 0
      else toks.sliding(2).map(_.mkString(" ")).toSeq.distinct.length
    ShingleExpression.strings(UTF8String.fromString(t), 2).numElements == naive
  }

  private def md5Prefix28(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
  }

  property("winnow.fingerprintsAreGramHashes_sortedDistinct") = forAll(genText) { t =>
    val bytes = t.getBytes("UTF-8")
    val fps = WinnowExpression.fps(bytes, 8, 4)
    val all: Set[Long] =
      if (bytes.length < 8) Set.empty
      else (0 to bytes.length - 8).map(i => md5Prefix28(bytes.slice(i, i + 8))).toSet
    val vals = (0 until fps.numElements()).map(fps.getLong)
    vals.forall(all.contains) &&
      vals == vals.distinct.sorted &&
      (bytes.length < 8 || vals.nonEmpty)
  }

  property("winnow.sharedSubstringSharesFingerprint") = forAll(
    genWord, genWord, Gen.listOfN(16, Gen.alphaLowerChar).map(_.mkString)) {
    (pre, suf, core) =>
      // winnowing guarantee: a shared substring of length ≥ k+w-1 (=11)
      // yields at least one shared fingerprint (one full window lies inside
      // the shared region in both docs)
      val a = WinnowExpression.fps((pre + core).getBytes("UTF-8"), 8, 4)
      val b = WinnowExpression.fps((core + suf).getBytes("UTF-8"), 8, 4)
      val sa = (0 until a.numElements()).map(a.getLong).toSet
      val sb = (0 until b.numElements()).map(b.getLong).toSet
      sa.intersect(sb).nonEmpty
  }

  property("simhash.orderInvariant") = forAll(Gen.listOf(Gen.long)) { hs =>
    val agg = new Aggregators.SimHashAgg(60)
    def run(xs: Seq[Long]) = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    run(hs) == run(hs.reverse)
  }

  property("simhash.mergeIsConcat") = forAll(
    Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
    val agg = new Aggregators.SimHashAgg(60)
    def buf(zs: Seq[Long]) = zs.foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(buf(xs), buf(ys))) == agg.finish(buf(xs ++ ys))
  }

  private val genH60 = Gen.choose(0L, (1L << 60) - 1)

  property("kmvPortable.duplicateInsensitive") = forAll(Gen.listOf(genH60)) { hs =>
    val agg = new Aggregators.KmvPortable(8)
    def run(zs: Seq[Long]) = agg.finish(zs.foldLeft(agg.zero)(agg.reduce))
    run(hs ++ hs) == run(hs)
  }

  property("lsh.keysNamespacedPerTable") = forAll(
    Gen.listOfN(64, Gen.choose(-500000L, 500000L))) { q =>
    val planes = (for (t <- 0 until 8; p <- 0 until 4)
      yield graft.similarity.Similarity.signPlane(t, p, 64)).toArray
    val keys = LshExpression.keys(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray),
      planes, 8, 4)
    (0 until 8).forall { t =>
      val k = keys.getInt(t)
      (k >> 4) == t && (k & 15) >= 0
    }
  }

  // ---- scan-side SimHash expression -----------------------------------
  private val genTok = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("simhashExpr.tokenOrderInvariant") = forAll(
    Gen.listOfN(12, genTok), Gen.long) { (words, permSeed) =>
    // SimHash votes per occurrence — permuting tokens must not change it.
    // The permutation derives from a GENERATED seed so a failure replays
    // from the ScalaCheck seed alone (global Random would not).
    def sh(ws: Seq[String]) = graft.plans.SimHashExpression.simhash(
      org.apache.spark.unsafe.types.UTF8String.fromString(ws.mkString(" ")), 60)
    sh(words) == sh(new scala.util.Random(permSeed).shuffle(words))
  }

  property("simhashExpr.inBitRange") = forAll(Gen.listOfN(6, genTok)) { words =>
    val h = graft.plans.SimHashExpression.simhash(
      org.apache.spark.unsafe.types.UTF8String.fromString(words.mkString(" ")), 60)
    h >= 0L && h < (1L << 60)
  }

  property("countEq.boundsAndSelfIdentity") = forAll(
    Gen.listOfN(16, Gen.long), Gen.listOfN(16, Gen.long)) { (xs, ys) =>
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(zs: Seq[Long]) = new GenericArrayData(zs.toArray)
    val ab = VectorExpressions.countEqArrays(arr(xs), arr(ys))
    val aa = VectorExpressions.countEqArrays(arr(xs), arr(xs))
    val ba = VectorExpressions.countEqArrays(arr(ys), arr(xs))
    ab >= 0 && ab <= 16 && aa == 16 && ab == ba // bounded, reflexive, symmetric
  }

  // ---- average color bounds (M2) --------------------------------------
  property("averageColor.inRange") = forAll(
    Gen.choose(1, 8), Gen.choose(1, 8), Gen.listOfN(64, Gen.choose(0, 0xFFFFFF))) {
    (w, h, px) =>
      val img = ImageOps.Image(w, h, px.take(w * h).toArray.padTo(w * h, 0))
      val (r, g, b) = ImageOps.averageColor(img)
      Seq(r, g, b).forall(v => v >= 0 && v <= 255)
  }
}
