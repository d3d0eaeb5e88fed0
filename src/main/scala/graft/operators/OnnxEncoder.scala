package graft.operators

/** An ONNX Runtime inference session behind the [[Encoders.BatchModel]]
  * seam — the last `real_encoder.py:1-74` delta (a real transformer
  * session inside the batched mapPartitions plumbing), closed without
  * shipping a runtime or weights (VERDICT r12 §next-6; the container
  * is zero-egress, so neither can be bundled).
  *
  * The ONNX Runtime Java API (`ai.onnxruntime`, public Apache-2.0
  * package) is reached REFLECTIVELY: the library carries no
  * compile-time dependency, and construction fails loudly with a
  * pointed message when the jar is absent. At a site with
  * `onnxruntime` on the executor classpath and a model file on shared
  * storage, this class drops into [[Encoders.encodeBatchedModel]]
  * unchanged — same broadcast shipping, same per-partition (here:
  * per-JVM, `@transient lazy`) construction, same batch geometry, same
  * plan shape (OnnxSpec, gated on `SPARK_GRAFT_ONNX_MODEL`).
  *
  * Model contract (the common sentence-encoder export):
  *  - inputs: `input_ids` (int64 [batch, seq]) and, when
  *    `withAttentionMask`, `attention_mask` (int64 [batch, seq], 1 on
  *    real tokens, 0 on padding);
  *  - output 0: either pooled float [batch, dim] (used as-is) or
  *    token-level float [batch, seq, dim] (mean-pooled here over
  *    non-pad positions — the sentence-transformers pooling rule).
  *
  * Tokenization is a constructor parameter: a REAL deployment passes
  * its model's tokenizer (e.g. a WordPiece vocab lookup); the default
  * is the library's deterministic whitespace+polynomial-hash scheme so
  * the seam is exercisable with any integer-vocabulary model. The
  * tokenizer must be serializable — it ships inside the broadcast
  * object like the weights of every other [[Encoders.BatchModel]].
  */
final class OnnxEncoder(
    modelPath: String,
    vocabSize: Long = 30522L,
    maxSeq: Int = 128,
    withAttentionMask: Boolean = true,
    tokenizeOpt: Option[String => Array[Long]] = None)
  extends Encoders.BatchModel {

  // the default tokenizer follows the CONSTRUCTOR's vocabSize (a
  // plain default-arg expression would not)
  private val tokenize: String => Array[Long] =
    tokenizeOpt.getOrElse(OnnxEncoder.hashTokenizer(vocabSize))

  // one session per JVM (executor), constructed lazily on first batch —
  // the per-partition init point of the seam; never serialized
  @transient private lazy val sess: OnnxEncoder.Session =
    OnnxEncoder.openSession(modelPath)

  override def encode(texts: Seq[String]): Seq[Array[Double]] = {
    if (texts.isEmpty) return Nil
    val idsRagged = texts.map { t =>
      val ids = tokenize(if (t == null) "" else t)
      if (ids.length > maxSeq) ids.take(maxSeq) else ids
    }
    val seq = math.max(1, idsRagged.map(_.length).max)
    val ids = idsRagged.map(r => r ++ Array.fill(seq - r.length)(0L)).toArray
    val mask = idsRagged.map(r =>
      Array.fill(r.length)(1L) ++ Array.fill(seq - r.length)(0L)).toArray
    val out = sess.run(ids, if (withAttentionMask) Some(mask) else None)
    out match {
      // pooled export: [batch, dim]
      case pooled: Array[Array[Float]] =>
        pooled.toSeq.map(_.map(_.toDouble))
      // token-level export: [batch, seq, dim] → mask-weighted mean pool
      case tok: Array[Array[Array[Float]]] =>
        tok.toSeq.zip(mask.toSeq).map { case (rows, m) =>
          val dim = if (rows.isEmpty) 0 else rows(0).length
          val acc = new Array[Double](dim)
          var n = 0
          var i = 0
          while (i < rows.length) {
            if (i < m.length && m(i) == 1L) {
              var j = 0
              while (j < dim) { acc(j) += rows(i)(j); j += 1 }
              n += 1
            }
            i += 1
          }
          if (n > 0) { var j = 0; while (j < dim) { acc(j) /= n; j += 1 } }
          acc
        }
      case other => throw new IllegalStateException(
        s"unsupported ONNX output shape: ${other.getClass}")
    }
  }
}

object OnnxEncoder {
  /** Deterministic whitespace + polynomial-hash tokenizer — the
    * library's standard hashing scheme mapped into an integer vocab,
    * so the session seam runs against any integer-input model without
    * shipping a real tokenizer. (A real deployment substitutes its
    * model's own.) */
  def hashTokenizer(vocabSize: Long): String => Array[Long] = { text =>
    text.split(" ").iterator.filter(_.nonEmpty).map { tok =>
      var h = 0L
      tok.codePoints().toArray.foreach(c => h = (h * 31 + c) % graft.functions.HashP)
      // keep 0 reserved for padding
      1L + (h % (vocabSize - 1))
    }.toArray
  }

  /** Minimal reflective facade over ai.onnxruntime — resolved once per
    * JVM; absence of the runtime fails with a pointed message instead
    * of a bare ClassNotFoundException deep in an executor stack. */
  private[graft] final class Session(
      private val env: AnyRef,
      private val session: AnyRef,
      private val envCls: Class[_],
      private val inputNames: java.util.List[String]) {

    def run(ids: Array[Array[Long]], mask: Option[Array[Array[Long]]]): AnyRef = {
      val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
      val create = tensorCls.getMethod("createTensor", envCls, classOf[Object])
      val inputs = new java.util.LinkedHashMap[String, AnyRef]()
      inputs.put(inputNames.get(0), create.invoke(null, env, ids))
      mask.foreach { m =>
        if (inputNames.size() > 1)
          inputs.put(inputNames.get(1), create.invoke(null, env, m))
      }
      val sessCls = Class.forName("ai.onnxruntime.OrtSession")
      val result = sessCls.getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(session, inputs)
      try {
        val value = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        Class.forName("ai.onnxruntime.OnnxValue")
          .getMethod("getValue").invoke(value)
      } finally {
        result.getClass.getMethod("close").invoke(result)
        inputs.values().forEach { t =>
          tensorCls.getMethod("close").invoke(t)
        }
      }
    }
  }

  private[graft] def openSession(modelPath: String): Session = {
    val envCls =
      try Class.forName("ai.onnxruntime.OrtEnvironment")
      catch {
        case e: ClassNotFoundException => throw new IllegalStateException(
          "ONNX Runtime not on the classpath: OnnxEncoder needs the " +
            "ai.onnxruntime jar (com.microsoft.onnxruntime:onnxruntime) " +
            "on driver AND executors, plus a model file reachable from " +
            "every executor", e)
      }
    val env = envCls.getMethod("getEnvironment").invoke(null)
    val session = envCls.getMethod("createSession", classOf[String])
      .invoke(env, modelPath)
    // input ORDER from the model itself (a Set in the API; stabilized
    // here so input_ids is addressed by the model's declared order)
    val namesObj = Class.forName("ai.onnxruntime.OrtSession")
      .getMethod("getInputNames").invoke(session)
    val names = new java.util.ArrayList[String]()
    namesObj.asInstanceOf[java.lang.Iterable[String]].forEach(n => names.add(n))
    new Session(env, session, envCls, names)
  }
}
