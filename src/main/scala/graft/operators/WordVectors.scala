package graft.operators

/** EXTERNAL-weights text encoder for the batched-inference seam — the
  * closest in-container analog of the reference's pretrained-model
  * path (embeddings/real_encoder.py:1-74: load trained weights from
  * outside the process, feed the model fixed-size text batches,
  * collect dense vectors). [[LinearProbe]] proved the seam carries a
  * model TRAINED in-repo; this proves it carries weights LOADED FROM A
  * FILE: a word-embedding table in the public word2vec/fastText `.vec`
  * TEXT format (optional "n dim" header, then one
  * `token v1 v2 ... v_dim` line per word — the format every published
  * embedding distribution ships), parsed locale-independently,
  * broadcast to executors, and applied batch-wise with mean pooling
  * (the standard bag-of-word-vectors sentence embedding; fastText's
  * own `get_sentence_vector` does the same).
  *
  * No actual pretrained blob ships in this container (zero egress), so
  * specs generate a deterministic `.vec` fixture — the LOADER, the
  * broadcast shipping, the per-partition construction and the batch
  * geometry are exactly what a downloaded GloVe/fastText file would
  * exercise; only the bytes in the file differ.
  */
object WordVectors {

  /** A loaded word-vector table. Serializable plain structures: ships
    * to executors as ONE broadcast, the way real weight blobs travel. */
  final case class WordVecModel(dim: Int, vocab: Map[String, Array[Float]])
      extends Encoders.BatchModel {

    /** Batch encode — same signature and batch geometry as
      * [[Encoders.stubModelEncode]] / [[LinearProbe.Model.encode]]:
      * mean of the known tokens' vectors; unknown tokens drop (the
      * fastText OOV-less convention for .vec files); empty / all-OOV /
      * null text encodes to the zero vector. */
    def encode(texts: Seq[String]): Seq[Array[Double]] =
      texts.map { t0 =>
        val out = new Array[Double](dim)
        val t = if (t0 == null) "" else t0
        var n = 0
        t.split(" ").foreach { tok =>
          if (tok.nonEmpty) vocab.get(tok).foreach { v =>
            var j = 0
            while (j < dim) { out(j) += v(j); j += 1 }
            n += 1
          }
        }
        if (n > 0) {
          var j = 0
          while (j < dim) { out(j) /= n; j += 1 }
        }
        out
      }
  }

  /** Parse a word2vec/fastText text-format vector file. Accepts both
    * the headered form ("n dim" first line — word2vec's
    * save_word2vec_format, fastText .vec) and the headerless GloVe
    * form; the header, when present, is validated against the parsed
    * rows. Whitespace-split, `Float.parseFloat` (locale-independent by
    * spec). Malformed lines fail loudly — silently skipping rows of a
    * weights file would serve wrong embeddings. */
  def load(path: String): WordVecModel = {
    // STREAMED line-by-line (ADVICE r12): published embedding files
    // are multi-GB, and a transient readAllLines List would roughly
    // double peak memory on top of the vocab map — only the builder
    // state is retained here
    val reader = java.nio.file.Files.newBufferedReader(
      java.nio.file.Paths.get(path))
    try {
      val firstLine = reader.readLine()
      require(firstLine != null, s"empty vector file: $path")
      // a header is TWO INTEGER fields ("n dim") — a 2-field data line
      // like a headerless dim-1 GloVe row ("hello 0.5") is data
      val first = firstLine.trim.split("\\s+")
      val declared =
        if (first.length == 2 && first.forall(_.forall(_.isDigit)))
          Some((first(0).toInt, first(1).toInt))
        else None
      var dim = declared.map(_._2).getOrElse(-1)
      val vocab = Map.newBuilder[String, Array[Float]]
      var n = 0
      var i = if (declared.isDefined) 1 else 0
      var line = if (declared.isDefined) reader.readLine() else firstLine
      while (line != null) {
        // trim FIRST: a whitespace-only line is blank, not a ragged row
        // that would poison dim inference
        val parts = line.trim.split("\\s+")
        if (parts.length > 1 || (parts.length == 1 && parts(0).nonEmpty)) {
          require(parts.length >= 2,
            s"malformed vector line ${i + 1}: token with no values")
          if (dim < 0) dim = parts.length - 1
          require(parts.length == dim + 1,
            s"malformed vector line ${i + 1}: ${parts.length - 1} values, expected $dim")
          val v = new Array[Float](dim)
          var j = 0
          while (j < dim) { v(j) = java.lang.Float.parseFloat(parts(j + 1)); j += 1 }
          vocab += parts(0) -> v
          n += 1
        }
        i += 1
        line = reader.readLine()
      }
      val result = vocab.result()
      // duplicate tokens would silently shadow rows while still matching
      // the header's line count — a weights file must not half-load
      require(result.size == n,
        s"duplicate token(s) in $path: $n rows, ${result.size} distinct")
      declared.foreach { case (dn, dd) =>
        require(dn == n, s"header declares $dn rows, file has $n")
        require(dd == dim, s"header declares dim $dd, rows have $dim")
      }
      require(dim > 0 && n > 0, s"no vectors parsed from $path")
      WordVecModel(dim, result)
    } finally reader.close()
  }

  /** Write a model in the headered .vec text format — the round-trip
    * half used by specs to create fixtures and by pipelines to export
    * a table another tool can load. Deterministic and exact:
    * sorted vocabulary, Float.toString (shortest decimal that
    * round-trips the float, locale-independent by spec). */
  def save(model: WordVecModel, path: String): Unit = {
    val sb = new StringBuilder
    sb ++= s"${model.vocab.size} ${model.dim}\n"
    model.vocab.toSeq.sortBy(_._1).foreach { case (tok, v) =>
      sb ++= tok
      v.foreach { x => sb += ' '; sb ++= x.toString }
      sb += '\n'
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }
}
