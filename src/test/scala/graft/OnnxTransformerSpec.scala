package graft

import graft.search.OnnxTransformer
import graft.search.OnnxTransformer.{TransformerEmbedder, TransformerWeights}

/** The ONNX attention subset: a real single-head transformer encoder block
  * parsed from genuine ONNX protobuf bytes and executed bit-identically to
  * an independent float32 replay of the architecture — closing the model
  * runtime's architecture family down to "real pretrained weights" (which
  * a zero-egress sandbox cannot fetch).
  */
class OnnxTransformerSpec extends SparkTestBase {

  private val w = OnnxTransformer.seededWeights(42L)

  // ---- independent replay of the encoder block (plain loops, float32,
  // written against the ONNX op definitions — NOT the executor code) ------

  /** One encoder block applied to x — shared by the single-model and
    * stacked replays.
    */
  private def replayBlock(m: TransformerWeights, x: Array[Array[Float]],
      heads: Int): Array[Array[Float]] = {
    val n = x.length; val d = m.d; val dh = d / heads
    require(d % heads == 0)
    def lin(x: Array[Array[Float]], wt: Array[Float], b: Array[Float],
        out: Int): Array[Array[Float]] =
      x.map { row =>
        Array.tabulate(out) { o =>
          var acc = if (b.isEmpty) 0f else b(o)
          var k = 0
          while (k < row.length) { acc += row(k) * wt(o * row.length + k); k += 1 }
          acc
        }
      }
    def addRows(a: Array[Array[Float]], b: Array[Array[Float]]) =
      a.indices.map(i => a(i).indices.map(j => a(i)(j) + b(i)(j)).toArray).toArray
    def layernorm(x: Array[Array[Float]], g: Array[Float], b: Array[Float]) =
      x.map { row =>
        var sum = 0f
        row.foreach(sum += _)
        val mean = sum / row.length
        var vs = 0f
        row.foreach { v => val dd = v - mean; vs += dd * dd }
        val inv = (1.0 / Math.sqrt((vs / row.length + m.eps).toDouble)).toFloat
        row.indices.map(j => (row(j) - mean) * inv * g(j) + b(j)).toArray
      }
    val q = lin(x, m.wq, m.bq, d)
    val k = lin(x, m.wk, m.bk, d)
    val v = lin(x, m.wv, m.bv, d)
    // per-head attention over column slices [h*dh, (h+1)*dh); heads == 1
    // degenerates to the single-head formulation with scale sqrt(d)
    val scale = Math.sqrt(dh.toDouble).toFloat
    val ctx = Array.tabulate(n)(_ => new Array[Float](d))
    for (h <- 0 until heads) {
      val lo = h * dh
      val a = Array.tabulate(n) { i =>
        val s = Array.tabulate(n) { j =>
          var acc = 0f
          var c = 0
          while (c < dh) { acc += q(i)(lo + c) * k(j)(lo + c); c += 1 }
          acc / scale
        }
        val mx = s.max
        val e = s.map(x => StrictMath.exp((x - mx).toDouble).toFloat)
        var sum = 0f
        e.foreach(sum += _)
        e.map(_ / sum)
      }
      for (i <- 0 until n; c <- 0 until dh) {
        var acc = 0f
        var j = 0
        while (j < n) { acc += a(i)(j) * v(j)(lo + c); j += 1 }
        ctx(i)(lo + c) = acc
      }
    }
    val n1 = layernorm(addRows(lin(ctx, m.wo, m.bo, d), x), m.ln1g, m.ln1b)
    val f1 = lin(n1, m.w1, m.b1, m.hidden).map(_.map(v => ffnAct(m, v)))
    layernorm(addRows(lin(f1, m.w2, m.b2, d), n1), m.ln2g, m.ln2b)
  }

  /** Independent erf: Abramowitz–Stegun 7.1.26, written from the handbook
    * formula (same polynomial the executor pins, implemented separately).
    */
  private def erfRef(x: Double): Double = {
    val a1 = 0.254829592; val a2 = -0.284496736; val a3 = 1.421413741
    val a4 = -1.453152027; val a5 = 1.061405429; val p = 0.3275911
    val t = 1.0 / (1.0 + p * Math.abs(x))
    // Horner order — part of the determinism contract the executor pins
    val y = 1.0 -
      ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * StrictMath.exp(-x * x)
    if (x >= 0.0) y else -y
  }

  /** FFN activation replay: node-boundary float32 rounding, exactly the
    * per-node sequence the executor's decomposed graphs produce.
    */
  private def ffnAct(m: TransformerWeights, v: Float): Float = m.activation match {
    case "Relu" => if (v < 0f) 0f else v
    case "Tanh" => StrictMath.tanh(v.toDouble).toFloat
    case "Gelu" =>
      val g0 = v / Math.sqrt(2.0).toFloat
      val g1 = erfRef(g0.toDouble).toFloat
      val g2 = g1 + 1f
      v * g2 * 0.5f
  }

  private def embedRows(m: TransformerWeights, ids: Array[Int]): Array[Array[Float]] = {
    require(m.pos.isEmpty || ids.length <= m.pos.length / m.d)
    ids.zipWithIndex.map { case (id, p) =>
      Array.tabulate(m.d)(c => m.e(id * m.d + c) +
        (if (m.pos.isEmpty) 0f else m.pos(p * m.d + c)))
    }
  }

  private def meanPool(x: Array[Array[Float]]): Array[Float] =
    Array.tabulate(x.head.length) { c =>
      var sum = 0f
      var r = 0
      while (r < x.length) { sum += x(r)(c); r += 1 }
      sum / x.length
    }

  private def replay(m: TransformerWeights, ids: Array[Int],
      heads: Int = 1): Array[Float] =
    meanPool(replayBlock(m, embedRows(m, ids), heads))

  test("writer is deterministic and the fixture is byte-reproducible") {
    val bytes = OnnxTransformer.toBytes(w)
    assert(bytes.sameElements(OnnxTransformer.toBytes(w)))
    val fixture = getClass.getResourceAsStream("/fixtures/tiny_attention.onnx")
    assert(fixture != null, "fixtures/tiny_attention.onnx missing from test resources")
    val checked = try fixture.readAllBytes() finally fixture.close()
    assert(bytes.sameElements(checked),
      "checked-in tiny_attention.onnx is not byte-identical to seededWeights(42)")
  }

  test("parse round-trips every weight bit-exactly") {
    val g = OnnxTransformer.parse(OnnxTransformer.toBytes(w))
    assert(g.vocab == w.vocab && g.outputDim == w.d)
    assert(g.inits("E").a.sameElements(w.e))
    assert(g.inits("Wq").a.sameElements(w.wq) && g.inits("bq").a.sameElements(w.bq))
    assert(g.inits("W2").a.sameElements(w.w2))
    assert(g.inits("sqrt_d").a.sameElements(Array(Math.sqrt(w.d.toDouble).toFloat)))
    assert(g.nodes.map(_.op) == Seq("Gather", "Gemm", "Gemm", "Gemm",
      "Transpose", "MatMul", "Div", "Softmax", "MatMul", "Gemm", "Add",
      "LayerNormalization", "Gemm", "Relu", "Gemm", "Add",
      "LayerNormalization", "ReduceMean"))
  }

  test("execution is bit-identical to the independent replay") {
    val g = OnnxTransformer.parse(OnnxTransformer.toBytes(w))
    for (ids <- Seq(Array(3), Array(0, 7, 31), Array.tabulate(16)(i => (i * 5) % 32))) {
      val got = g.run(ids)
      val want = replay(w, ids)
      assert(got.length == want.length)
      got.indices.foreach { i =>
        assert(java.lang.Float.floatToIntBits(got(i)) ==
          java.lang.Float.floatToIntBits(want(i)),
          s"ids=${ids.mkString(",")} component $i: ${got(i)} != ${want(i)}")
      }
    }
  }

  test("architecture properties: token-sensitive, permutation-invariant pool") {
    val g = OnnxTransformer.parse(OnnxTransformer.toBytes(w))
    val a = g.run(Array(1, 2, 3, 4))
    assert(a.sameElements(g.run(Array(1, 2, 3, 4))))
    // a changed TOKEN changes the embedding
    assert(!a.sameElements(g.run(Array(1, 2, 3, 5))))
    // mean-pool over a permuted sequence is (near-)invariant: self-attention
    // without positional input is permutation-EQUIVARIANT, so this is a
    // correctness property of the architecture as written, not a defect
    val b = g.run(Array(4, 3, 2, 1))
    assert(a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-5f })
  }

  test("positional table: bit-identical to replay, order-SENSITIVE, seq bounded") {
    val wp = OnnxTransformer.seededWeights(43L, posRows = 8)
    val g = OnnxTransformer.parse(OnnxTransformer.toBytes(wp))
    assert(g.seqLimit == 8)
    for (ids <- Seq(Array(3), Array(0, 7, 31), Array(5, 1, 5, 2))) {
      val got = g.run(ids)
      val want = replay(wp, ids)
      got.indices.foreach { i =>
        assert(java.lang.Float.floatToIntBits(got(i)) ==
          java.lang.Float.floatToIntBits(want(i)),
          s"ids=${ids.mkString(",")} component $i: ${got(i)} != ${want(i)}")
      }
    }
    // with positions in the input, permuting the tokens changes the output
    assert(!g.run(Array(1, 2, 3, 4)).sameElements(g.run(Array(4, 3, 2, 1))))
    // 9 tokens exceed the 8-row positional table -> loud failure
    val ex = intercept[IllegalArgumentException] {
      g.run(Array.tabulate(9)(i => i % 32))
    }
    assert(ex.getMessage.contains("positional"))
    // the embedder honors the table bound without failing
    val emb = TransformerEmbedder(g, seqCap = 64)
    assert(emb.embedBatch(Seq((1 to 20).map(i => s"tok$i").mkString(" ")))
      .head.length == wp.d)
  }

  test("multi-head attention: bit-identical to replay, differs from single-head") {
    val g4 = OnnxTransformer.parse(OnnxTransformer.toMultiHeadBytes(w, heads = 4))
    val g1 = OnnxTransformer.parse(OnnxTransformer.toBytes(w))
    assert(g4.vocab == w.vocab && g4.outputDim == w.d)
    for (ids <- Seq(Array(3), Array(0, 7, 31), Array(5, 1, 5, 2, 30))) {
      val got = g4.run(ids)
      val want = replay(w, ids, heads = 4)
      got.indices.foreach { i =>
        assert(java.lang.Float.floatToIntBits(got(i)) ==
          java.lang.Float.floatToIntBits(want(i)),
          s"ids=${ids.mkString(",")} component $i: ${got(i)} != ${want(i)}")
      }
    }
    // 4-head attention is a different function from single-head
    assert(!g4.run(Array(0, 7, 31)).sameElements(g1.run(Array(0, 7, 31))))
    // heads = 1 delegates to the canonical single-head bytes
    assert(OnnxTransformer.toMultiHeadBytes(w, heads = 1)
      .sameElements(OnnxTransformer.toBytes(w)))
    intercept[IllegalArgumentException] {
      OnnxTransformer.toMultiHeadBytes(w, heads = 3) // 3 does not divide 16
    }
  }

  test("stacked encoder: two chained blocks bit-identical to the chained replay") {
    val b2 = OnnxTransformer.seededWeights(99L)
    val g = OnnxTransformer.parse(
      OnnxTransformer.toStackedBytes(Seq(w, b2), heads = 2))
    assert(g.vocab == w.vocab && g.outputDim == w.d)
    for (ids <- Seq(Array(3), Array(0, 7, 31), Array(5, 1, 5, 2, 30))) {
      val got = g.run(ids)
      val want = meanPool(
        replayBlock(b2, replayBlock(w, embedRows(w, ids), 2), 2))
      got.indices.foreach { i =>
        assert(java.lang.Float.floatToIntBits(got(i)) ==
          java.lang.Float.floatToIntBits(want(i)),
          s"ids=${ids.mkString(",")} component $i: ${got(i)} != ${want(i)}")
      }
    }
    // a one-block stack computes the same function as the multi-head writer
    val s1 = OnnxTransformer.parse(
      OnnxTransformer.toStackedBytes(Seq(w), heads = 4))
    val m4 = OnnxTransformer.parse(OnnxTransformer.toMultiHeadBytes(w, heads = 4))
    assert(s1.run(Array(0, 7, 31)).sameElements(m4.run(Array(0, 7, 31))))
  }

  test("embedder contract: unit norm, determinism, null/blank -> zero vector") {
    val emb = TransformerEmbedder(OnnxTransformer.parse(OnnxTransformer.toBytes(w)))
    assert(emb.dim == w.d)
    val Seq(v1, v2, zNull, zBlank) =
      emb.embedBatch(Seq("hello world", "hello world", null, "   "))
    assert(v1.sameElements(v2))
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    assert(zNull.forall(_ == 0f) && zBlank.forall(_ == 0f))
    assert(!v1.sameElements(emb.embedBatch(Seq("different text")).head))
  }

  test("registry lifecycle: the artifact parses once per JVM") {
    import graft.search.ModelRegistry
    val key = s"onnx-attention-spec-${System.nanoTime()}"
    val loader = OnnxTransformer.resourceLoader("/fixtures/tiny_attention.onnx")
    val e1 = ModelRegistry.getOrLoad(key)(() => loader(key, w.d))
    val e2 = ModelRegistry.getOrLoad(key)(() => loader(key, w.d))
    assert(e1 eq e2)
    assert(ModelRegistry.loadCount(key) == 1)
    assert(e1.embedBatch(Seq("tokyo tower")).head.length == w.d)
  }

  test("gelu FFN: decomposed Div/Erf/Add/Mul graph bit-identical to replay") {
    val wg = OnnxTransformer.seededWeights(42L).copy(activation = "Gelu")
    val bytes = OnnxTransformer.toBytes(wg)
    val g = OnnxTransformer.parse(bytes)
    // writer emitted the decomposition, not a fused op
    assert(g.nodes.map(_.op).containsSlice(
      Seq("Div", "Erf", "Add", "Mul", "Mul")))
    assert(g.inits.contains("gelu_sqrt2") && g.inits.contains("gelu_halfc"))
    for (ids <- Seq(Array(3), Array(0, 7, 31), Array.tabulate(12)(i => (i * 5) % 32))) {
      val got = g.run(ids)
      val want = replay(wg, ids)
      got.indices.foreach { i =>
        assert(java.lang.Float.floatToIntBits(got(i)) ==
          java.lang.Float.floatToIntBits(want(i)),
          s"gelu ids=${ids.mkString(",")} component $i: ${got(i)} != ${want(i)}")
      }
    }
    // the activation genuinely changes the function (negative FFN inputs
    // pass scaled instead of clamping to zero)
    val relu = OnnxTransformer.parse(OnnxTransformer.toBytes(w)).run(Array(0, 7, 31))
    assert(!g.run(Array(0, 7, 31)).sameElements(relu))
  }

  test("tanh FFN: bit-identical to replay; stacked blocks share activation") {
    val wt = OnnxTransformer.seededWeights(42L).copy(activation = "Tanh")
    val g = OnnxTransformer.parse(OnnxTransformer.toBytes(wt))
    val ids = Array(1, 8, 17)
    assert(g.run(ids).sameElements(replay(wt, ids)))
    // stacked writer threads the activation through every layer
    val b2 = OnnxTransformer.seededWeights(99L).copy(activation = "Tanh")
    val stacked = OnnxTransformer.parse(OnnxTransformer.toStackedBytes(Seq(wt, b2)))
    val x1 = replayBlock(wt, embedRows(wt, ids), 1)
    val want = meanPool(replayBlock(b2, x1, 1))
    assert(stacked.run(ids).sameElements(want))
    // mixed activations are rejected
    val ex = intercept[IllegalArgumentException] {
      OnnxTransformer.toStackedBytes(Seq(wt, OnnxTransformer.seededWeights(99L)))
    }
    assert(ex.getMessage.contains("activation"))
  }

  test("relu fixture bytes are unchanged by the activation plumbing") {
    // guards the byte-reproducibility contract: activation="Relu" must
    // write the exact pre-activation-support bytes
    val bytes = OnnxTransformer.toBytes(OnnxTransformer.seededWeights(42L))
    val fixture = getClass.getResourceAsStream("/fixtures/tiny_attention.onnx")
    val checked = try fixture.readAllBytes() finally fixture.close()
    assert(bytes.sameElements(checked))
  }

  test("graphs outside the subset fail loudly") {
    // the MLP fixture has a FLOAT graph input and no Gather — not a
    // token-embedding graph
    val in = getClass.getResourceAsStream("/fixtures/tiny_mlp.onnx")
    assert(in != null)
    val mlpBytes = try in.readAllBytes() finally in.close()
    val ex = intercept[IllegalArgumentException] {
      OnnxTransformer.parse(mlpBytes).vocab
    }
    assert(ex.getMessage.contains("Gather"))
  }

  test("masked export shape: all-ones mask reproduces the unmasked graph bit-exactly") {
    // the standard sentence-transformer export declares attention_mask and
    // compiles the Cast/Unsqueeze/(1-m)·(-1e4)/masked-mean chain; with the
    // batch-1 all-ones mask it must be a bit-exact no-op vs the unmasked
    // graph (whose execution is replay-proven above) — adding -0.0 to the
    // scores and pooling via Σ(1·h)/n instead of ReduceMean are exact
    for (heads <- Seq(1, 4)) {
      val gm = OnnxTransformer.parse(OnnxTransformer.toMaskedBytes(w, heads))
      assert(gm.maskInputName.contains("attention_mask"))
      assert(gm.intInits.keySet == Set("unsq_axes", "rs_axes"),
        gm.intInits.keySet)
      assert(gm.intInits("rs_axes").toSeq == Seq(-1L))
      val gu = OnnxTransformer.parse(
        if (heads == 1) OnnxTransformer.toBytes(w)
        else OnnxTransformer.toMultiHeadBytes(w, heads))
      for (ids <- Seq(Array(3), Array(0, 7, 31), Array(5, 1, 5, 2, 30))) {
        val got = gm.run(ids) // mask defaults to all ones
        val want = gu.run(ids)
        got.indices.foreach { i =>
          assert(java.lang.Float.floatToIntBits(got(i)) ==
            java.lang.Float.floatToIntBits(want(i)),
            s"heads=$heads ids=${ids.mkString(",")} component $i: " +
              s"${got(i)} != ${want(i)}")
        }
      }
    }
  }

  test("masked export shape: a padded run is bit-identical to the unpadded run") {
    // the mask's semantic contract: padded key columns get -1e4 before
    // softmax (exp underflows to exactly 0), padded rows drop out of the
    // masked mean — so appending pad tokens under a 0-mask must change
    // NOTHING, bitwise. This is the masked-specific replay: the unpadded
    // run (equal to the replay-proven unmasked graph) is the oracle.
    val gm = OnnxTransformer.parse(OnnxTransformer.toMaskedBytes(w, heads = 4))
    for (ids <- Seq(Array(3), Array(0, 7, 31), Array(5, 1, 5, 2, 30))) {
      for (pad <- Seq(1, 3)) {
        val padded = ids ++ Array.fill(pad)(0)
        val mask = Array.fill(ids.length)(1f) ++ Array.fill(pad)(0f)
        val got = gm.run(padded, mask)
        val want = gm.run(ids)
        got.indices.foreach { i =>
          assert(java.lang.Float.floatToIntBits(got(i)) ==
            java.lang.Float.floatToIntBits(want(i)),
            s"ids=${ids.mkString(",")} pad=$pad component $i: " +
              s"${got(i)} != ${want(i)}")
        }
      }
    }
    intercept[IllegalArgumentException] {
      gm.run(Array(1, 2, 3), Array(1f, 1f)) // mask length mismatch
    }
  }

  test("padded-batch embedder: batch composition cannot change any result bit") {
    // PaddedSubwordTransformerEmbedder pads each embedBatch call to the
    // batch max — under Spark the batch is partition-dependent, so its
    // determinism contract is exactly "a row's vector is independent of
    // its batch-mates". Embed each fixture text alone, then in one mixed
    // batch, then in shuffled sub-batches: all bit-identical.
    val fx = graft.queries.EncoderFixture
    val e = fx.buildMaskedEmbedder()
    val texts = fx.Sentences.take(6)
    val alone = texts.map(t => e.embedBatch(Seq(t)).head)
    val together = e.embedBatch(texts)
    val shuffledBack = {
      val perm = Seq(5, 2, 0, 4, 1, 3)
      val out = e.embedBatch(perm.map(texts))
      perm.zip(out).sortBy(_._1).map(_._2)
    }
    for ((want, gots) <- alone.zip(together.zip(shuffledBack));
         got <- Seq(gots._1, gots._2); i <- want.indices)
      assert(java.lang.Float.floatToIntBits(want(i)) ==
        java.lang.Float.floatToIntBits(got(i)), s"component $i drifted")
    // empty/null rows still map to the zero vector inside a padded batch
    val withBlank = e.embedBatch(Seq(texts.head, null, ""))
    assert(withBlank(1).forall(_ == 0f) && withBlank(2).forall(_ == 0f))
    // the padded embedder refuses an unmasked export: padding without a
    // mask input would let pad rows leak into attention
    intercept[IllegalArgumentException] {
      OnnxTransformer.PaddedSubwordTransformerEmbedder(
        OnnxTransformer.parse(OnnxTransformer.toMultiHeadBytes(
          OnnxTransformer.seededWeights(fx.Seed, vocab = fx.VocabSize + 1,
            d = fx.Dim, hidden = fx.Hidden, posRows = fx.SeqCap), fx.Heads)),
        fx.vocab, fx.MaxPieceLen, fx.SeqCap)
    }
  }

  test("masked STACK: all-ones == unmasked stack bit-exactly; padded == unpadded") {
    val b2 = OnnxTransformer.seededWeights(99L)
    val gm = OnnxTransformer.parse(
      OnnxTransformer.toMaskedStackedBytes(Seq(w, b2), heads = 2))
    val gu = OnnxTransformer.parse(
      OnnxTransformer.toStackedBytes(Seq(w, b2), heads = 2))
    assert(gm.maskInputName.contains("attention_mask"))
    for (ids <- Seq(Array(3), Array(0, 7, 31), Array(5, 1, 5, 2, 30))) {
      val got = gm.run(ids)
      val want = gu.run(ids)
      got.indices.foreach { i =>
        assert(java.lang.Float.floatToIntBits(got(i)) ==
          java.lang.Float.floatToIntBits(want(i)),
          s"ids=${ids.mkString(",")} component $i: ${got(i)} != ${want(i)}")
      }
      // pad under a 0-mask: the mask must hold through BOTH layers
      val padded = ids ++ Array.fill(2)(0)
      val mask = Array.fill(ids.length)(1f) ++ Array(0f, 0f)
      val gp = gm.run(padded, mask)
      gp.indices.foreach { i =>
        assert(java.lang.Float.floatToIntBits(gp(i)) ==
          java.lang.Float.floatToIntBits(want(i)),
          s"padded ids=${ids.mkString(",")} component $i: ${gp(i)} != ${want(i)}")
      }
    }
  }

  test("Reshape/Expand/ReduceSum execute on INT64 shape operands; bad shapes fail loudly") {
    import OnnxTransformer.{GraphModel, Mat, Node}
    val d = 2
    val e = Mat(4, d, Array.tabulate(4 * d)(i => 0.25f * (i + 1)))
    def g(nodes: Seq[Node], intInits: Map[String, Array[Long]],
        extraInits: Map[String, Mat] = Map.empty, outDim: Int = d) =
      GraphModel(Map("E" -> e) ++ extraInits, intInits, nodes,
        "ids", None, None, "y", outDim)
    // Reshape [n,d] -> [1, n·d] (with -1 inference) then per-row sum -> 1x1
    val rs = g(Seq(
      Node("Gather", Seq("E", "ids"), Seq("x"), Map.empty, Map.empty, Map.empty),
      Node("Reshape", Seq("x", "shp"), Seq("xr"), Map.empty, Map.empty, Map.empty),
      Node("ReduceSum", Seq("xr"), Seq("y"), Map.empty, Map.empty,
        Map("axes" -> Seq(-1L)))),
      Map("shp" -> Array(1L, -1L)), outDim = 1)
    val ids = Array(0, 2, 1)
    val want = ids.map(id => (0 until d).map(c => e(id, c)).sum).sum
    assert(math.abs(rs.run(ids)(0) - want) < 1e-5)
    // Expand a 1xd row to n x d, add to the gathered rows, column-sum
    val ex = g(Seq(
      Node("Gather", Seq("E", "ids"), Seq("x"), Map.empty, Map.empty, Map.empty),
      Node("Expand", Seq("c", "shp3"), Seq("cx"), Map.empty, Map.empty, Map.empty),
      Node("Add", Seq("x", "cx"), Seq("xa"), Map.empty, Map.empty, Map.empty),
      Node("ReduceSum", Seq("xa"), Seq("y"), Map.empty, Map.empty,
        Map("axes" -> Seq(0L)))),
      Map("shp3" -> Array(3L, d.toLong)),
      Map("c" -> Mat(1, d, Array(10f, 20f))))
    val got = ex.run(ids)
    (0 until d).foreach { c =>
      val want = ids.map(id => e(id, c)).sum + 3 * (if (c == 0) 10f else 20f)
      assert(math.abs(got(c) - want) < 1e-4, s"col $c: ${got(c)} != $want")
    }
    // out-of-subset still loud: >2 real dims, element-count mismatch,
    // narrowing Cast
    intercept[IllegalArgumentException] {
      g(Seq(
        Node("Gather", Seq("E", "ids"), Seq("x"), Map.empty, Map.empty, Map.empty),
        Node("Reshape", Seq("x", "bad"), Seq("y"), Map.empty, Map.empty, Map.empty)),
        Map("bad" -> Array(2L, 3L, 4L))).run(ids)
    }
    intercept[IllegalArgumentException] {
      g(Seq(
        Node("Gather", Seq("E", "ids"), Seq("x"), Map.empty, Map.empty, Map.empty),
        Node("Reshape", Seq("x", "bad2"), Seq("y"), Map.empty, Map.empty, Map.empty)),
        Map("bad2" -> Array(5L, 7L))).run(ids)
    }
    intercept[IllegalArgumentException] {
      g(Seq(
        Node("Gather", Seq("E", "ids"), Seq("x"), Map.empty, Map.empty, Map.empty),
        Node("Cast", Seq("x"), Seq("y"), Map.empty, Map("to" -> 3L), Map.empty)),
        Map.empty).run(ids)
    }
  }

  test("Cast int targets are identities ONLY on the mask chain; value-changing targets throw") {
    import OnnxTransformer.{GraphModel, Mat, Node}
    val d = 2
    val e = Mat(4, d, Array.tabulate(4 * d)(i => 0.25f * (i + 1)))
    val ids = Array(0, 2, 1)
    // int64 round-trip on the mask chain (the exporter's
    // attention_mask.unsqueeze(...).to(...) form): 0/1 values, identity
    val mg = GraphModel(Map("E" -> e), Map.empty, Seq(
      Node("Gather", Seq("E", "ids"), Seq("x"), Map.empty, Map.empty, Map.empty),
      Node("Cast", Seq("attention_mask"), Seq("m7"), Map.empty,
        Map("to" -> 7L), Map.empty),
      Node("Cast", Seq("m7"), Seq("y"), Map.empty, Map("to" -> 1L), Map.empty)),
      "ids", None, Some("attention_mask"), "y", ids.length)
    assert(mg.run(ids, Array(1f, 0f, 1f)).toSeq == Seq(1f, 0f, 1f))
    // the SAME to=7 off the mask chain would need trunc semantics -> loud
    intercept[IllegalArgumentException] {
      GraphModel(Map("E" -> e), Map.empty, Seq(
        Node("Gather", Seq("E", "ids"), Seq("x"), Map.empty, Map.empty, Map.empty),
        Node("Cast", Seq("x"), Seq("y"), Map.empty, Map("to" -> 7L), Map.empty)),
        "ids", None, Some("attention_mask"), "y", d).run(ids, Array(1f, 1f, 1f))
    }
    // float16 (to=10) rounds stored values — never an identity, anywhere
    intercept[IllegalArgumentException] {
      GraphModel(Map("E" -> e), Map.empty, Seq(
        Node("Gather", Seq("E", "ids"), Seq("x"), Map.empty, Map.empty, Map.empty),
        Node("Cast", Seq("attention_mask"), Seq("y"), Map.empty,
          Map("to" -> 10L), Map.empty)),
        "ids", None, Some("attention_mask"), "y", ids.length)
        .run(ids, Array(1f, 0f, 1f))
    }
  }

  test("embeds run distributed through mapPartitions (plumbing, not collect)") {
    import org.apache.spark.sql.functions._
    val emb = TransformerEmbedder(OnnxTransformer.parse(OnnxTransformer.toBytes(w)))
    val texts = (1 to 40).map(i => (i.toLong, s"doc number $i about topic ${i % 5}"))
    val df = spark.createDataFrame(texts).toDF("id", "text").repartition(8)
    val s = spark
    import s.implicits._
    val vecs = df.as[(Long, String)].mapPartitions { it =>
      val rows = it.toSeq
      rows.iterator.zip(emb.embedBatch(rows.map(_._2)).iterator)
        .map { case ((id, _), v) => (id, v) }
    }.toDF("id", "vec").collect()
    assert(vecs.length == 40)
    val local = emb.embedBatch(texts.map(_._2))
    val byId = vecs.map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    texts.indices.foreach { i =>
      assert(byId(texts(i)._1).sameElements(local(i)),
        s"row ${texts(i)._1} distributed != local")
    }
  }
}
