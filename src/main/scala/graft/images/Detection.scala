package graft.images

/** Detection postprocessing (SURVEY §2.7 M5–M7): letterbox preprocess,
  * class-agnostic greedy NMS, score gating, and the pluggable `Detector`
  * trait with a deterministic stub (the environment has no torch/onnx;
  * SURVEY §5.6).
  */
object Detection {

  /** One detection box, xyxy pixel coords + combined score + class id
    * (shape per `yolox.zip!yolox/utils/boxes.py:50-51`).
    */
  final case class Box(x1: Float, y1: Float, x2: Float, y2: Float,
      score: Float, cls: Int)

  /** M5 — letterbox geometry: scale = min ratio to fit `target`×`target`
    * preserving aspect; the rest is padding value 114
    * (`yolox.zip!yolox/data/data_augment.py:142-158`; 416 from
    * `yolox.zip!yolox/exp/default/yolox_tiny.py:15-18`).
    */
  final case class Letterbox(scale: Float, outW: Int, outH: Int, target: Int)

  val TargetSize = 416
  val PadValue = 114

  def letterbox(w: Int, h: Int, target: Int = TargetSize): Letterbox = {
    val r = math.min(target.toFloat / w, target.toFloat / h)
    Letterbox(r, (w * r).toInt, (h * r).toInt, target)
  }

  /** Apply the letterbox to a decoded image: bilinear-resize to the scaled
    * box (the reference preproc's `cv2.INTER_LINEAR`,
    * `yolox.zip!yolox/data/data_augment.py:149-153` — NOT the color
    * pipeline's area filter), pad the remainder with 114 (gray).
    */
  def letterboxImage(img: ImageOps.Image, target: Int = TargetSize): ImageOps.Image = {
    val lb = letterbox(img.width, img.height, target)
    val scaled = ImageOps.resizeBilinear(img, math.max(lb.outW, 1), math.max(lb.outH, 1))
    val pad = (PadValue << 16) | (PadValue << 8) | PadValue
    val out = Array.fill(target * target)(pad)
    var y = 0
    while (y < scaled.height) {
      System.arraycopy(scaled.pixels, y * scaled.width, out, y * target, scaled.width)
      y += 1
    }
    ImageOps.Image(target, target, out)
  }

  /** IoU of two xyxy boxes. */
  def iou(a: Box, b: Box): Float = {
    val ix = math.max(0f, math.min(a.x2, b.x2) - math.max(a.x1, b.x1))
    val iy = math.max(0f, math.min(a.y2, b.y2) - math.max(a.y1, b.y1))
    val inter = ix * iy
    val ua = (a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1) - inter
    if (ua <= 0f) 0f else inter / ua
  }

  /** M7 — class-agnostic greedy IoU NMS, the algorithm of
    * `yolox.zip!yolox/utils/demo_utils.py:17-45` with the reference's
    * thresholds (NMS IoU 0.3, `pyspark_yolox.py:40-41`). Total order on
    * candidates (score desc, then coords) pins tie behavior — the
    * reference left ties to torch sort stability (SURVEY §7 risk list).
    */
  def nms(boxes: Seq[Box], iouThreshold: Float = 0.3f): Seq[Box] = {
    val sorted = boxes.sortBy(b => (-b.score, b.x1, b.y1, b.x2, b.y2, b.cls))
    val kept = scala.collection.mutable.ArrayBuffer.empty[Box]
    sorted.foreach { b =>
      if (!kept.exists(k => iou(k, b) > iouThreshold)) kept += b
    }
    kept.toSeq
  }

  /** Final score gate: `obj*cls > 0.4` (`pyspark_yolox.py:101,107`). */
  val ScoreThreshold = 0.4f

  /** A8 — per-image class histogram from gated detections
    * (`pyspark_yolox.py:100-111`).
    */
  def classHistogram(boxes: Seq[Box], threshold: Float = ScoreThreshold): Map[Int, Long] =
    boxes.filter(_.score > threshold).groupBy(_.cls).map { case (c, bs) => c -> bs.size.toLong }

  /** HWC packed-RGB → CHW float32 tensor data, the YOLOX input layout
    * (`yolox.zip!yolox/data/data_augment.py:156-157`: transpose(2,0,1), no
    * normalization with legacy=False). `bgr=true` emits OpenCV channel
    * order — what the reference's weights were trained on.
    */
  def toCHWFloat(img: ImageOps.Image, bgr: Boolean = true): Array[Float] = {
    val n = img.width * img.height
    val out = new Array[Float](3 * n)
    var i = 0
    while (i < n) {
      val p = img.pixels(i)
      val r = ((p >> 16) & 0xFF).toFloat
      val g = ((p >> 8) & 0xFF).toFloat
      val b = (p & 0xFF).toFloat
      if (bgr) { out(i) = b; out(n + i) = g; out(2 * n + i) = r }
      else { out(i) = r; out(n + i) = g; out(2 * n + i) = b }
      i += 1
    }
    out
  }

  /** Decode raw YOLOX head outputs (n_anchors × (5+numClasses), flattened
    * row-major) into gated candidate boxes — the math of
    * `yolox.zip!yolox/utils/demo_utils.py:99-125` (demo_postprocess) plus
    * the class-argmax/conf-mask of `yolox.zip!yolox/utils/boxes.py:32-56`:
    *
    *  - anchors enumerate strides [8,16,32], each a (size/stride)² meshgrid
    *    in row-major (y outer, x inner) order;
    *  - cx,cy = (raw + grid) * stride; w,h = exp(raw) * stride;
    *  - cxcywh → xyxy; score = obj * max-class-prob, gated at `confThre`
    *    (the reference's test_conf 0.3, `pyspark_yolox.py:40`).
    *
    * Feed the result to [[nms]]. This is the seam an ONNX Runtime forward
    * pass plugs into: session output → decodeRawOutputs → nms → histogram.
    */
  def decodeRawOutputs(raw: Array[Float], inputSize: Int = TargetSize,
      numClasses: Int = 80, confThre: Float = 0.3f): Seq[Box] = {
    val strides = Seq(8, 16, 32)
    val stride5 = 5 + numClasses
    val boxes = scala.collection.mutable.ArrayBuffer.empty[Box]
    var a = 0
    strides.foreach { s =>
      val cells = inputSize / s
      var gy = 0
      while (gy < cells) {
        var gx = 0
        while (gx < cells) {
          val o = a * stride5
          if (o + stride5 <= raw.length) {
            val cx = (raw(o) + gx) * s
            val cy = (raw(o + 1) + gy) * s
            val w = math.exp(raw(o + 2).toDouble).toFloat * s
            val h = math.exp(raw(o + 3).toDouble).toFloat * s
            val obj = raw(o + 4)
            var best = 0; var bestP = Float.MinValue
            var c = 0
            while (c < numClasses) {
              val p = raw(o + 5 + c)
              if (p > bestP) { bestP = p; best = c }
              c += 1
            }
            val score = obj * bestP
            if (score >= confThre)
              boxes += Box(cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, score, best)
          }
          a += 1; gx += 1
        }
        gy += 1
      }
    }
    boxes.toSeq
  }

  /** Total anchor count for an input size (sanity for raw buffers). */
  def anchorCount(inputSize: Int = TargetSize): Int =
    Seq(8, 16, 32).map(s => (inputSize / s) * (inputSize / s)).sum

  /** M6 — the inference seam. Implementations must be serializable: one
    * instance is constructed per executor partition via `mapPartitions`
    * (amortizing model load, the intent of the reference's model broadcast,
    * `pyspark_yolox.py:49-50`). A production impl would wrap ONNX Runtime
    * Java here; the environment is offline, so tests use [[StubDetector]].
    */
  trait Detector extends Serializable {
    def detect(img: ImageOps.Image): Seq[Box]
  }

  /** Deterministic stub: emits boxes derived from image content (average
    * color channels pick class and count), so pipeline-level semantics
    * (letterbox → detect → NMS → gate → histogram) are testable without
    * weights.
    */
  final class StubDetector extends Detector {
    def detect(img: ImageOps.Image): Seq[Box] = {
      val (r, g, b) = ImageOps.averageColor(img)
      val cls = (r / 86) % 3 // 0..2 by red channel
      val n = 1 + (g % 3)    // 1..3 boxes by green channel
      (0 until n).map { i =>
        val off = i * 20f
        Box(off, off, off + 10f + (b % 10), off + 10f, 0.5f + 0.1f * i, cls)
      }
    }
  }
}
