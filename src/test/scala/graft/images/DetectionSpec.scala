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

  test("toCHWFloat: channel-planar layout, BGR order (M5 tensor shape)") {
    val img = ImageOps.Image(2, 1, Array(0x010203, 0x040506)) // (r,g,b) pairs
    val t = toCHWFloat(img) // BGR planes
    assert(t.toSeq == Seq(3f, 6f, 2f, 5f, 1f, 4f))
    assert(toCHWFloat(img, bgr = false).toSeq == Seq(1f, 4f, 2f, 5f, 3f, 6f))
  }

  test("decodeRawOutputs: grid/stride math and conf gate (demo_postprocess)") {
    val n = anchorCount() // 416 → 52²+26²+13² = 3549
    assert(n == 3549)
    val raw = new Array[Float](n * 85)
    // anchor at stride 8, cell (gx=3, gy=2) → index gy*52+gx = 107
    val o = 107 * 85
    raw(o) = 0.5f; raw(o + 1) = 0.25f                  // cx=(0.5+3)*8=28, cy=(0.25+2)*8=18
    raw(o + 2) = math.log(2.0).toFloat                  // w=2*8=16
    raw(o + 3) = 0f                                     // h=1*8=8
    raw(o + 4) = 0.9f; raw(o + 5 + 7) = 0.8f            // obj*cls7 = 0.72
    // a second anchor below the conf gate must be dropped
    val o2 = (52 * 52 + 5) * 85 // stride-16 region
    raw(o2 + 4) = 0.4f; raw(o2 + 5) = 0.5f              // 0.2 < 0.3
    val boxes = decodeRawOutputs(raw)
    assert(boxes.length == 1)
    val b = boxes.head
    assert(b.cls == 7)
    assert(math.abs(b.score - 0.72f) < 1e-6)
    assert(b.x1 == 28f - 8f && b.x2 == 28f + 8f)       // w=16 around cx=28
    assert(b.y1 == 18f - 4f && b.y2 == 18f + 4f)
  }

  test("raw decode chains into NMS + histogram (the ONNX seam end-to-end)") {
    val raw = new Array[Float](anchorCount() * 85)
    // two overlapping confident anchors of the same class at stride 8
    for ((cell, obj) <- Seq((107, 0.9f), (108, 0.85f))) {
      val o = cell * 85
      raw(o) = 0.5f; raw(o + 1) = 0.5f
      raw(o + 2) = math.log(4.0).toFloat; raw(o + 3) = math.log(4.0).toFloat
      raw(o + 4) = obj; raw(o + 5 + 2) = 0.9f
    }
    val kept = nms(decodeRawOutputs(raw))
    assert(kept.length == 1) // 32×32 boxes one cell apart overlap >> 0.3
    assert(classHistogram(kept) == Map(2 -> 1L))
  }

  test("golden head tensor: decode → NMS → histogram, exact boxes at all strides") {
    // A synthetically recorded YOLOX-tiny head (3549 anchors × 85) with six
    // hand-placed anchors spanning every stride and every gate:
    //   A stride-8  (10,5):  cx=(10.5)·8=84,  cy=44, w=e^ln4·8=32, h=16, 0.9·0.8=0.72, cls 17
    //   B stride-8  (11,5):  cx=92, same size → IoU(A,B)=384/640=0.6 → NMS-suppressed
    //                        despite cls 3 ≠ 17 (NMS is class-AGNOSTIC, boxes.py:56)
    //   C stride-16 (3,2):   cx=48, cy=32, w=h=e^ln2·16=32 → (32,16,64,48), 0.75·0.8=0.6, cls 17
    //   D stride-32 (6,6):   cx=cy=(6.25)·32=200 → (184,184,216,216), 0.9·0.5=0.45, cls 0
    //   E stride-16 (20,20): (312,312,328,328), 0.7·0.5=0.35 — decoded (≥0.3),
    //                        kept by NMS, but UNDER the 0.4 histogram gate
    //   F stride-8  (0,0):   0.5·0.5=0.25 < 0.3 — never decoded
    val raw = new Array[Float](anchorCount() * 85)
    def put(idx: Int, cxOff: Float, cyOff: Float, lnW: Double, lnH: Double,
        obj: Float, cls: Int, p: Float): Unit = {
      val o = idx * 85
      raw(o) = cxOff; raw(o + 1) = cyOff
      raw(o + 2) = lnW.toFloat; raw(o + 3) = lnH.toFloat
      raw(o + 4) = obj; raw(o + 5 + cls) = p
    }
    val ln2 = math.log(2.0); val ln4 = math.log(4.0)
    put(5 * 52 + 10, 0.5f, 0.5f, ln4, ln2, 0.9f, 17, 0.8f)              // A
    put(5 * 52 + 11, 0.5f, 0.5f, ln4, ln2, 0.8f, 3, 0.8f)               // B
    put(52 * 52 + 2 * 26 + 3, 0f, 0f, ln2, ln2, 0.75f, 17, 0.8f)        // C
    put(52 * 52 + 26 * 26 + 6 * 13 + 6, 0.25f, 0.25f, 0.0, 0.0, 0.9f, 0, 0.5f) // D
    put(52 * 52 + 20 * 26 + 20, 0f, 0f, 0.0, 0.0, 0.7f, 42, 0.5f)       // E
    put(0, 0.5f, 0.5f, 0.0, 0.0, 0.5f, 9, 0.5f)                          // F

    val decoded = decodeRawOutputs(raw)
    assert(decoded.length == 5) // F gated at decode
    def close(a: Float, b: Float) = math.abs(a - b) < 1e-3
    val Seq(a, b, c, e, d) = decoded // stride-major, then cell order
    assert(a.cls == 17 && close(a.score, 0.72f) &&
      close(a.x1, 68) && close(a.y1, 36) && close(a.x2, 100) && close(a.y2, 52))
    assert(b.cls == 3 && close(b.score, 0.64f) && close(b.x1, 76) && close(b.x2, 108))
    assert(c.cls == 17 && close(c.score, 0.6f) &&
      close(c.x1, 32) && close(c.y1, 16) && close(c.x2, 64) && close(c.y2, 48))
    assert(d.cls == 0 && close(d.score, 0.45f) &&
      close(d.x1, 184) && close(d.y1, 184) && close(d.x2, 216) && close(d.y2, 216))
    assert(e.cls == 42 && close(e.score, 0.35f) && close(e.x1, 312))

    val kept = nms(decoded)
    assert(kept.map(_.cls) == Seq(17, 17, 0, 42)) // B suppressed by A cross-class
    assert(classHistogram(kept) == Map(17 -> 2L, 0 -> 1L)) // E under the 0.4 gate
  }

  test("iou: disjoint 0, identical 1") {
    val a = Box(0, 0, 10, 10, 1f, 0)
    assert(iou(a, Box(20, 20, 30, 30, 1f, 0)) == 0f)
    assert(iou(a, a) == 1f)
  }
}
