package graft.operators

/** A REAL (if tiny) learned text encoder for the batched-inference
  * seam — the in-repo stand-in for the reference's transformer path
  * (embeddings/real_encoder.py:1-74: load a trained model once, feed
  * it fixed-size text batches, collect dense vectors). The container
  * ships no model weights, so the weights are TRAINED HERE: a
  * multinomial logistic probe over hashing-TF features, fit by
  * deterministic batch gradient descent on (text, label) samples. The
  * point is not the model's quality — it is that the
  * [[Encoders.encodeBatchedWith]] plumbing demonstrably carries a
  * non-stub model: parameters learned from data, broadcast to
  * executors, constructed once per partition, applied batch-wise
  * (asserted in EncodersSpec).
  */
object LinearProbe {

  /** Frozen trained probe: `w(l)(f)` weight of feature f for label l,
    * `b(l)` bias. The encode output is the logit vector — a learned
    * dense embedding of the text (D = number of labels). Serializable
    * by construction (plain arrays): ships to executors as a broadcast
    * or closure constant, exactly how real weight blobs travel. */
  final case class Model(featDim: Int, w: Array[Array[Double]],
                         b: Array[Double]) extends Encoders.BatchModel {
    /** Batch encode — the real-model counterpart of
      * [[Encoders.stubModelEncode]]: same signature, same batch
      * geometry, learned parameters instead of hash arithmetic. */
    def encode(texts: Seq[String]): Seq[Array[Double]] =
      texts.map(t => logits(features(t, featDim)))

    private[operators] def logits(x: Array[Double]): Array[Double] = {
      val out = new Array[Double](w.length)
      var l = 0
      while (l < w.length) {
        var s = b(l)
        val wl = w(l)
        var f = 0
        while (f < featDim) { s += wl(f) * x(f); f += 1 }
        out(l) = s
        l += 1
      }
      out
    }
  }

  /** Hashing-TF feature vector, L2-normalized — the same public
    * feature map as [[Encoders.hashingTf]] (polynomial hash → bucket →
    * count), recomputed locally because the probe runs inside
    * mapPartitions where no Column API exists. */
  def features(text: String, featDim: Int): Array[Double] = {
    val x = new Array[Double](featDim)
    if (text != null) {
      val toks = text.split(" ")
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.nonEmpty) {
          var h = 0L
          t.codePoints().forEach(c => h = (h * 31 + c) % graft.functions.HashP)
          x((h % featDim).toInt) += 1.0
        }
        i += 1
      }
      var n2 = 0.0
      var f = 0
      while (f < featDim) { n2 += x(f) * x(f); f += 1 }
      if (n2 > 0) {
        val inv = 1.0 / math.sqrt(n2)
        f = 0
        while (f < featDim) { x(f) *= inv; f += 1 }
      }
    }
    x
  }

  /** Deterministic full-batch gradient descent on softmax
    * cross-entropy. Returns the trained model, the label order (row
    * index of `w` ↔ label), and the loss trajectory (head = initial
    * loss at the zero weights, last = final) so callers can ASSERT the
    * model actually learned rather than trust it did. Driver-side by
    * contract: the sample is bounded (a probe fits on hundreds of
    * rows), the heavy distributed half is the encode that follows. */
  def train(samples: Seq[(String, String)], featDim: Int = 256,
            epochs: Int = 300, lr: Double = 8.0)
      : (Model, Seq[String], Seq[Double]) = {
    require(samples.nonEmpty, "empty training sample")
    val labels = samples.map(_._2).distinct.sorted
    val lIdx = labels.zipWithIndex.toMap
    val xs = samples.map(s => features(s._1, featDim)).toArray
    val ys = samples.map(s => lIdx(s._2)).toArray
    val nL = labels.length
    val n = xs.length
    val w = Array.fill(nL)(new Array[Double](featDim))
    val b = new Array[Double](nL)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 0 to epochs) {
      val gw = Array.fill(nL)(new Array[Double](featDim))
      val gb = new Array[Double](nL)
      var loss = 0.0
      var i = 0
      while (i < n) {
        val x = xs(i)
        // softmax with max-shift for numerical stability
        val z = Model(featDim, w, b).logits(x)
        var zmax = z(0)
        var l = 1
        while (l < nL) { if (z(l) > zmax) zmax = z(l); l += 1 }
        var zsum = 0.0
        l = 0
        while (l < nL) { z(l) = math.exp(z(l) - zmax); zsum += z(l); l += 1 }
        loss -= math.log(z(ys(i)) / zsum)
        l = 0
        while (l < nL) {
          val p = z(l) / zsum
          val g = p - (if (l == ys(i)) 1.0 else 0.0)
          gb(l) += g
          val gwl = gw(l)
          var f = 0
          while (f < featDim) { gwl(f) += g * x(f); f += 1 }
          l += 1
        }
        i += 1
      }
      losses += loss / n
      var l = 0
      while (l < nL) {
        var f = 0
        while (f < featDim) { w(l)(f) -= lr * gw(l)(f) / n; f += 1 }
        b(l) -= lr * gb(l) / n
        l += 1
      }
    }
    (Model(featDim, w, b), labels, losses.toSeq)
  }
}
