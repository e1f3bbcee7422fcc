package graft.images

import org.scalatest.funsuite.AnyFunSuite

/** The ONNX backend seam: in this container the runtime jar is absent, so
  * the spec proves the FALLBACK contract (orStub picks the stub, the lazy
  * session never loads at construction). When a runtime + model are
  * present (env `GRAFT_YOLOX_ONNX`), the real forward path runs instead.
  */
class OnnxDetectorSpec extends AnyFunSuite {

  private val modelEnv = sys.env.get("GRAFT_YOLOX_ONNX")

  test("orStub falls back to StubDetector without runtime/model") {
    val d = OnnxDetector.orStub(None)
    assert(d.isInstanceOf[Detection.StubDetector])
    val d2 = OnnxDetector.orStub(Some("/nonexistent/model.onnx"))
    assert(d2.isInstanceOf[Detection.StubDetector])
  }

  test("constructing OnnxDetector is lazy: no classloading until detect") {
    // must not throw even though ai.onnxruntime is absent here
    val d = new OnnxDetector("/nonexistent/model.onnx")
    if (!OnnxDetector.available) {
      val img = ImageOps.Image(4, 4, Array.fill(16)(0x808080))
      intercept[Throwable](d.detect(img)) // first use fails, not construction
    }
  }

  test("real ONNX forward pass (runs only when a model is provided)") {
    assume(OnnxDetector.available && modelEnv.exists(p => new java.io.File(p).isFile),
      "onnxruntime or GRAFT_YOLOX_ONNX model not present — stub covers CI")
    val d = OnnxDetector.orStub(modelEnv)
    assert(d.isInstanceOf[OnnxDetector])
    val img = ImageOps.Image(64, 48, Array.fill(64 * 48)(0x336699))
    val boxes = d.detect(img)
    // decode contract: gated candidates, finite coords
    assert(boxes.forall(b => b.score >= 0.3f && b.x2 >= b.x1 && b.y2 >= b.y1))
  }
}
