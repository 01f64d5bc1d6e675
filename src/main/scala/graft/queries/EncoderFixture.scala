package graft.queries

import graft.ops.Subword
import graft.search.{Embedder, OnnxTransformer, SingletonEmbedder, VectorSearchClient}
import graft.search.OnnxTransformer.{PaddedSubwordTransformerEmbedder, SubwordTransformerEmbedder}

/** Shared fixture for `encoder_search_topk` — the gate query where the
  * ENGINE computes the embeddings (the reference's full embed dataflow,
  * model/search/vector.py:64-78,123,164: prefix → tokenize → encoder →
  * normalize → search), closing the one dataflow edge r8's VERDICT called
  * out as spec-only.
  *
  * Everything here is a pure function of compile-time constants, which is
  * what makes the gate hash-exact (the `ja_token_stats` shared-constant
  * recipe): the WordPiece vocabulary is induced from [[Sentences]] by
  * [[Subword.induceLocal]], the encoder weights derive from [[Seed]] via
  * the byte-reproducible ONNX writer, and the runtime is float32 with
  * fixed accumulation order (spec-asserted bit-identical across JVMs). The
  * ENGINE embeds per corpus row on executors through the once-per-JVM
  * [[graft.search.ModelRegistry]]; the ORACLE consumes the same functions'
  * driver-side outputs as SQL literals. Both sides derive from the same
  * pure computation, so they cannot drift — while the distributed side
  * genuinely runs text → subword ids → transformer → vector per row.
  *
  * The corpus texts are fixture sentences salted onto doc ids
  * (`doc_id % N`) exactly like `ja_token_stats`' Japanese fixture: the
  * synthetic corpus alone can't exercise subword morphology, and N
  * distinct texts keep the oracle's literal table bounded. No quote
  * characters (the sentences interpolate into SQL literals); BMP-only.
  */
object EncoderFixture {

  val Dim = 16
  val Hidden = 32
  val Heads = 2
  val VocabSize = 160
  val MaxPieceLen = 4
  val SeqCap = 48
  val Seed = 0x10c0de5caffeL

  /** Overlapping morphology on purpose — shared stems decompose into
    * shared pieces, so the subword step has real work to do; two spaced
    * Japanese lines keep the CJK path exercised.
    */
  val Sentences: Seq[String] = Seq(
    "the search engine finds matching documents quickly",
    "a searcher searches the document corpus for matches",
    "vector embeddings encode document meaning into numbers",
    "the encoder transforms tokens into dense vectors",
    "tokenizers split words into smaller subword pieces",
    "unmatched words become unknown tokens in the vocabulary",
    "distributed engines process documents in parallel partitions",
    "the query vector ranks documents by cosine distance",
    "near duplicate documents cluster under the same hash",
    "streaming ingestion appends new documents to the index",
    "approximate search probes a few buckets instead of all",
    "quality scoring filters noisy documents from training data",
    "検索 エンジン は 文書 を 探す",
    "トークン は 小さい 部分 に 分かれる")

  val QueryText = "searching for the documents that match the query"

  /** WordPiece vocab induced from the sentences (pure driver function —
    * the Spark-side induction is gated separately by `wordpiece_vocab`).
    */
  lazy val vocab: Map[(String, Boolean), Long] =
    Subword.induceLocal(Sentences, VocabSize, MaxPieceLen)

  /** One fresh runtime instance — used by the registry loader on each
    * executor JVM and by the driver-side literal computation alike.
    */
  def buildEmbedder(): SubwordTransformerEmbedder = {
    val w = OnnxTransformer.seededWeights(Seed, vocab = VocabSize + 1,
      d = Dim, hidden = Hidden, posRows = SeqCap)
    val bytes = OnnxTransformer.toMultiHeadBytes(w, Heads)
    SubwordTransformerEmbedder(OnnxTransformer.parse(bytes), vocab,
      MaxPieceLen, SeqCap)
  }

  val ModelName = "graft-subword-encoder"

  /** The MASKED export of the SAME seeded weights (the standard
    * sentence-transformer export shape: attention_mask input, additive
    * `(1-mask)·(-10^4)` masked softmax, masked mean-pool), wrapped in the
    * padded-batch embedder — the dataflow the reference's batch encode()
    * runs (model/search/vector.py:64-78). Per embedBatch call every
    * sequence pads to the batch max with a real 0/1 mask, so the
    * executor-side pass exercises the mask arithmetic on genuinely
    * variable-length fixture sentences.
    */
  def buildMaskedEmbedder(): PaddedSubwordTransformerEmbedder = {
    val w = OnnxTransformer.seededWeights(Seed, vocab = VocabSize + 1,
      d = Dim, hidden = Hidden, posRows = SeqCap)
    val bytes = OnnxTransformer.toMaskedBytes(w, Heads)
    PaddedSubwordTransformerEmbedder(OnnxTransformer.parse(bytes), vocab,
      MaxPieceLen, SeqCap)
  }

  val MaskedModelName = "graft-subword-encoder-masked"

  def maskedEmbedder: Embedder =
    SingletonEmbedder(MaskedModelName, Dim, (_, _) => buildMaskedEmbedder())

  /** Driver-side masked-path literals: ALL prefixed sentences embedded in
    * ONE padded batch (lengths differ, so most rows really are padded+
    * masked). The masked graph's padding-invariance makes these equal to
    * each sentence embedded alone — which is exactly the property the
    * `encoder_search_masked_topk` hash gate verifies end-to-end against
    * the executor-side partition-dependent batches.
    */
  lazy val maskedDocVectors: Seq[Array[Float]] =
    buildMaskedEmbedder().embedBatch(
      Sentences.map(VectorSearchClient.DocPrefix + _))

  lazy val maskedQueryVector: Array[Float] =
    buildMaskedEmbedder()
      .embedBatch(Seq(VectorSearchClient.QueryPrefix + QueryText)).head

  /** `(i, txt, v)` VALUES rows for the masked-path oracle table. */
  def maskedSentencesValuesSql: String =
    Sentences.zipWithIndex.map { case (s, i) =>
      s"($i, '$s', ${vecSql(maskedDocVectors(i))})"
    }.mkString(", ")

  /** What ships to executors: (name, dim, loader) — the model itself
    * materializes once per JVM via the registry, like every model artifact
    * here.
    */
  def embedder: Embedder =
    SingletonEmbedder(ModelName, Dim, (_, _) => buildEmbedder())

  /** Driver-side oracle literals: the prefixed-sentence embeddings and the
    * prefixed-query embedding, computed by the same runtime the executors
    * run.
    */
  lazy val docVectors: Seq[Array[Float]] = {
    val e = buildEmbedder()
    Sentences.map(s => e.embedOne(VectorSearchClient.DocPrefix + s))
  }

  lazy val queryVector: Array[Float] =
    buildEmbedder().embedOne(VectorSearchClient.QueryPrefix + QueryText)

  /** Exact-valued SQL literal for a float vector: each component printed
    * as its exact double widening (Float.toString would round-trip the
    * FLOAT but parse to a different DOUBLE — the engine compares in
    * double space, so the literal must be the double value).
    */
  def vecSql(v: Array[Float]): String =
    v.map(f => f.toDouble.toString).mkString("[", ", ", s"]::DOUBLE[$Dim]")

  /** `(i, txt, v)` VALUES rows for the oracle's sentence table. */
  def sentencesValuesSql: String =
    Sentences.zipWithIndex.map { case (s, i) =>
      s"($i, '$s', ${vecSql(docVectors(i))})"
    }.mkString(", ")
}
