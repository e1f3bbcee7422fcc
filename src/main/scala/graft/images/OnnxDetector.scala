package graft.images

/** M6 — the real inference backend behind [[Detection.Detector]]: a YOLOX
  * forward pass through ONNX Runtime's Java API, loaded REFLECTIVELY so the
  * engine compiles and runs in environments without the `onnxruntime` jar
  * (this container has none — [[available]] is false here and
  * [[Detection.StubDetector]] stands in; see `pyspark_yolox.py:62-87` for
  * the reference's equivalent torch path).
  *
  * Deployment contract (mirrors the reference's broadcast-once intent,
  * `pyspark_yolox.py:49-50`): construct ONE OnnxDetector per partition
  * inside `mapPartitions` — the session loads lazily on first `detect`
  * and is reused for every row of the partition. The instance is
  * serializable (only the model path and thresholds ship to executors;
  * the session itself is `@transient lazy`).
  */
final class OnnxDetector(
    modelPath: String,
    inputName: String = "images",
    numClasses: Int = 80,
    confThre: Float = 0.3f) extends Detection.Detector {

  @transient private lazy val envAndSession: (AnyRef, AnyRef) = {
    val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
    val env = envCls.getMethod("getEnvironment").invoke(null)
    val session = envCls
      .getMethod("createSession", classOf[String])
      .invoke(env, modelPath)
    (env, session)
  }

  def detect(img: ImageOps.Image): Seq[Detection.Box] = {
    val (env, session) = envAndSession
    val size = Detection.TargetSize
    val chw = Detection.toCHWFloat(Detection.letterboxImage(img, size))

    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
    val tensor = tensorCls
      .getMethod("createTensor", envCls, classOf[java.nio.FloatBuffer],
        classOf[Array[Long]])
      .invoke(null, env, java.nio.FloatBuffer.wrap(chw),
        Array(1L, 3L, size.toLong, size.toLong))
    try {
      val runM = session.getClass.getMethod("run", classOf[java.util.Map[_, _]])
      runM.setAccessible(true)
      val inputs = java.util.Collections.singletonMap(inputName, tensor)
      val result = runM.invoke(session, inputs)
      try {
        val value = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        val raw = value.getClass.getMethod("getValue").invoke(value)
        // head output: float[1][anchors][5 + numClasses] — flatten row-major
        val flat = raw.asInstanceOf[Array[Array[Array[Float]]]](0).flatten
        Detection.decodeRawOutputs(flat, size, numClasses, confThre)
      } finally result.getClass.getMethod("close").invoke(result)
    } finally tensorCls.getMethod("close").invoke(tensor)
  }
}

object OnnxDetector {

  /** True iff ONNX Runtime's Java API is on the classpath. */
  def available: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: ClassNotFoundException => false }

  /** Production seam: the real backend when the runtime AND a model file
    * are present, the deterministic stub otherwise (CI, this container).
    */
  def orStub(modelPath: Option[String]): Detection.Detector =
    modelPath match {
      case Some(p) if available && new java.io.File(p).isFile =>
        new OnnxDetector(p)
      case _ => new Detection.StubDetector
    }
}
