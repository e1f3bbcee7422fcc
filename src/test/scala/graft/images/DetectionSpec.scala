package graft.images

import org.scalatest.funsuite.AnyFunSuite
import Detection._

class DetectionSpec extends AnyFunSuite {

  test("letterbox: scale is the min ratio, output fits target (M5)") {
    val lb = letterbox(800, 400)
    assert(lb.scale == 416f / 800f)
    assert(lb.outW == 416 && lb.outH == 208)
    val lb2 = letterbox(100, 300)
    assert(lb2.scale == 416f / 300f)
    assert(lb2.outH == 416)
  }

  test("letterboxImage: always target² with 114 padding") {
    val img = ImageOps.Image(100, 50, Array.fill(100 * 50)(0xFF0000))
    val out = letterboxImage(img)
    assert(out.width == TargetSize && out.height == TargetSize)
    // below the scaled region, pixels are pad gray
    val pad = (PadValue << 16) | (PadValue << 8) | PadValue
    assert(out.pixels(TargetSize * 300) == pad)
    // inside the scaled region, content preserved
    assert(out.pixels(0) == 0xFF0000)
  }

  private def randomBoxes(rnd: scala.util.Random, n: Int): Seq[Box] =
    Seq.fill(n) {
      val x1 = rnd.nextFloat() * 300f; val y1 = rnd.nextFloat() * 300f
      Box(x1, y1, x1 + 1f + rnd.nextFloat() * 100f, y1 + 1f + rnd.nextFloat() * 100f,
        rnd.nextFloat(), rnd.nextInt(80))
    }

  test("NMS postconditions: kept boxes pairwise IoU ≤ threshold, scores descending (M7)") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 100) {
      val boxes = randomBoxes(rnd, 30)
      val kept = nms(boxes, 0.3f)
      // no surviving pair overlaps beyond threshold
      for (i <- kept.indices; j <- i + 1 until kept.size)
        assert(iou(kept(i), kept(j)) <= 0.3f)
      // scores non-increasing (greedy order)
      assert(kept.sliding(2).forall {
        case Seq(a, b) => a.score >= b.score
        case _ => true
      })
      // every dropped box overlaps a kept higher-priority box
      assert(boxes.toSet.diff(kept.toSet).forall(d => kept.exists(k => iou(k, d) > 0.3f)))
    }
  }

  test("NMS keeps the higher-score of two heavy overlaps") {
    val a = Box(0, 0, 10, 10, 0.9f, 1)
    val b = Box(1, 1, 11, 11, 0.5f, 1)
    assert(nms(Seq(b, a)) == Seq(a))
  }

  test("NMS is deterministic under ties (total candidate order)") {
    val ts = Seq(Box(0, 0, 10, 10, 0.5f, 1), Box(50, 0, 60, 10, 0.5f, 2))
    assert(nms(ts) == nms(ts.reverse).sortBy(b => (-b.score, b.x1, b.y1, b.x2, b.y2, b.cls)))
  }

  test("classHistogram applies the 0.4 gate (A8)") {
    val boxes = Seq(
      Box(0, 0, 1, 1, 0.39f, 0), Box(0, 0, 1, 1, 0.41f, 0),
      Box(0, 0, 1, 1, 0.9f, 2), Box(0, 0, 1, 1, 0.8f, 2))
    assert(classHistogram(boxes) == Map(0 -> 1L, 2 -> 2L))
  }

  test("iou: disjoint 0, identical 1") {
    val a = Box(0, 0, 10, 10, 1f, 0)
    assert(iou(a, Box(20, 20, 30, 30, 1f, 0)) == 0f)
    assert(iou(a, a) == 1f)
  }
}
