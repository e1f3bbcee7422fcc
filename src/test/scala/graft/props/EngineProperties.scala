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

  // ---- average color bounds (M2) --------------------------------------
  property("averageColor.inRange") = forAll(
    Gen.choose(1, 8), Gen.choose(1, 8), Gen.listOfN(64, Gen.choose(0, 0xFFFFFF))) {
    (w, h, px) =>
      val img = ImageOps.Image(w, h, px.take(w * h).toArray.padTo(w * h, 0))
      val (r, g, b) = ImageOps.averageColor(img)
      Seq(r, g, b).forall(v => v >= 0 && v <= 255)
  }
}
