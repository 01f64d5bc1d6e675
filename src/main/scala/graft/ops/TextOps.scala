package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (north star; the reference's dormant tokenizer surface is
  * model/utils/tokenizer.py:8-37 — generalized here to a pluggable,
  * SQL-mirrorable token pipeline).
  *
  * Everything here is built from codegen'd Spark built-ins (no UDFs) and has
  * an exact DuckDB-SQL equivalent, so every operator is oracle-checkable.
  * Tokenization is single-space split to match `string_split(text, ' ')` in
  * the oracle; a pluggable [[Tokenizer]] covers richer strategies.
  */
object TextOps {

  /** Stopword list used by quality scoring and language markers. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

  /** Language marker words for the n-gram/stopword language-ID heuristic.
    * Deterministic and SQL-expressible; not a real langid model (no MeCab/
    * fasttext in a zero-egress JVM — SURVEY §7.3 risk 6).
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "is",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "les",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das",
    "zh" -> "de", "zh" -> "shi", "zh" -> "bu", "zh" -> "le")

  /** Whitespace tokens (empty tokens preserved — matches DuckDB
    * `string_split(text, ' ')`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Language guess over a token array: argmax of [[LangMarkers]] hit
    * counts, ties to the alphabetically first language, zero hits -> "und".
    * A pure scan-projection expression — no exploded token table, no
    * shuffle: per-row cost is O(tokens × markers) with a compile-time
    * marker list, the right trade at corpus scale (cf. the bm25 inline
    * tier). Exactly mirrors the SQL formulation
    * `row_number() OVER (ORDER BY cnt DESC, lang ASC) = 1` + left join.
    */
  def langGuess(toks: Column): Column = {
    val langs = LangMarkers.map(_._1).distinct.sorted
    // argmax via greatest(struct(cnt, idx)): idx reverses the sorted lang
    // order so the struct maximum breaks count ties toward the
    // alphabetically FIRST language
    val scored = langs.zipWithIndex.map { case (lang, i) =>
      val words = LangMarkers.collect { case (l, w) if l == lang => w }
      val cnt = words.map(w =>
        size(filter(toks, x => x === lit(w))).cast("long")).reduce(_ + _)
      struct(cnt.as("cnt"), lit(langs.size - 1 - i).as("ri"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("cnt") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Word n-grams as space-joined strings ("shingles"), via the codegen'd
    * [[graft.functions.WordNGrams]] expression — this is the hot loop of
    * every shingle pipeline (Jaccard joins, MinHash, components, funnel,
    * decontamination); the HOF transform-slice-concat encoding it replaces
    * stayed interpreted and allocated a slice per gram. Null text yields an
    * empty array (parity with the original when/otherwise guard).
    */
  def wordNGrams(text: Column, n: Int): Column =
    coalesce(graft.functions.word_ngrams(tokens(text), n),
      array().cast("array<string>"))

  /** Canonical text normalization — the cleaning step that PRECEDES every
    * dedup/tokenize/fingerprint stage (decomposed and precomposed accents
    * must hash identically; stray control bytes must not split tokens).
    * Order pinned, each step engine-replicable (DuckDB: regexp_replace with
    * 'g' + nfc_normalize + lower):
    * 1. control bytes ([\x00-\x1f\x7f]) → space;
    * 2. Unicode NFC ([[graft.functions.nfc_normalize]]);
    * 3. lowercase; 4. collapse runs of spaces; 5. trim.
    * A pure scan projection — zero shuffles, stays in codegen.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      lower(graft.functions.nfc_normalize(
        regexp_replace(text, "[\\x00-\\x1f\\x7f]", " "))),
      " +", " "))

  /** Control characters that signal encoding damage (C0 minus \t\n\r, plus
    * DEL) — shared between [[encodingStats]] and its oracle replay.
    */
  val ControlCharClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Encoding-damage QA per document — the web-crawl cleaning signal run
    * BEFORE tokenization (a page decoded with the wrong charset litters
    * U+FFFD replacement characters and stray control bytes; such text
    * poisons every downstream n-gram/embedding stage, so it is filtered at
    * the door). Output: (idCol, n_chars, n_replacement, n_control,
    * bad_ppm) — ONE ROW PER INPUT DOC (NULL text → all zeros), where
    * `bad_ppm` = (n_replacement + n_control)·10^6 div max(n_chars, 1),
    * integer fixed-point so the whole statistic replays bit-exact in SQL.
    *
    * Counting is by LENGTH DIFFERENCE under a remove-all regexp_replace:
    * every match is a single character, so removed length == match count —
    * engine-portable without a regexp_count dependency. A pure scan
    * projection: zero shuffles, stays in codegen.
    */
  def encodingStats(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    def cnt(pat: String): Column =
      (length(text) - length(regexp_replace(text, pat, ""))).cast("long")
    docs.select(col(idCol),
        coalesce(length(text).cast("long"), lit(0L)).as("n_chars"),
        coalesce(cnt("�"), lit(0L)).as("n_replacement"),
        coalesce(cnt(ControlCharClass), lit(0L)).as("n_control"))
      .withColumn("bad_ppm",
        expr("(n_replacement + n_control) * 1000000L div greatest(n_chars, 1L)"))
  }

  /** Keep documents whose encoding damage stays under `maxBadPpm`
    * (NULL-text docs score 0 and survive — emptiness is a different
    * filter's job). Left-semi on the scan-side stats, no extra shuffle
    * beyond the semi-join itself.
    */
  def encodingFilter(docs: DataFrame, idCol: String, text: Column,
      maxBadPpm: Long): DataFrame =
    docs.join(
      encodingStats(docs, idCol, text)
        .where(col("bad_ppm") <= maxBadPpm).select(idCol),
      Seq(idCol), "left_semi")

  /** BPE-ish sub-word token estimate: alphanumeric runs + individual
    * non-space symbol characters (lookaround-free so the DuckDB/RE2 oracle
    * can replicate it exactly).
    */
  def approxBpeTokenCount(text: Column): Column = {
    val runs = size(filter(split(text, "[^A-Za-z0-9]+"), t => length(t) > 0)).cast("long")
    val symbols = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("long")
    runs + symbols
  }

  /** Document fingerprint: md5 of case/whitespace-normalized text.
    * (Rolling-hash shingle fingerprints live in [[graft.functions.SimHash]].)
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Distinct-token count (the numerator of a Gopher-style duplicate-token
    * signal: `1 - distinct/total`). Scan-side array expression, no shuffle.
    */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Number of word n-grams (`max(tokens - n + 1, 0)`). */
  def nGramCount(text: Column, n: Int): Column =
    greatest(tokenCount(text) - lit(n - 1), lit(0L))

  /** Occurrence count of the MOST FREQUENT word n-gram — the numerator of
    * the Gopher repetition signal "fraction of characters/tokens in the top
    * n-gram". Computed per row with zero shuffle via the codegen'd
    * [[graft.functions.MaxEqualRun]] (sort the grams, take the longest
    * equal-adjacent run — O(g log g) per doc, compiled; the interpreted
    * `aggregate`-accumulator encoding it replaces allocated a struct per
    * gram). The explode → corpus-wide groupBy formulation would shuffle
    * ~2× the corpus bytes for a strictly per-document statistic — the
    * wrong shape at 100 TB.
    */
  def topNGramCount(text: Column, n: Int): Column =
    graft.functions.max_equal_run(wordNGrams(text, n))

  /** Gopher-style repetition gate from integer signals (integer arithmetic
    * only, so cross-engine comparison is exact — no float rounding):
    * top 2-gram > 1/5 of 2-grams, top 3-gram > 1/6 of 3-grams, or duplicate
    * tokens > `dupTauTimes10`/10 of tokens (default 3/10, the Gopher
    * setting; corpora with naturally small vocabularies want it looser —
    * integer so the cross-engine comparison stays exact).
    * The n-gram terms require minimum evidence
    * (>= 5 2-grams / >= 6 3-grams): below that, top-n-gram >= 1 by
    * construction makes the ratio test fire on every short document.
    */
  def repetitiveFlag(nTokens: Column, nDistinct: Column,
      top2: Column, n2: Column, top3: Column, n3: Column,
      dupTauTimes10: Int = 3): Column =
    (top2 * 5 > n2 && n2 >= 5) || (top3 * 6 > n3 && n3 >= 6) ||
      (nTokens - nDistinct) * 10 > nTokens * dupTauTimes10

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column = {
    val stripped = regexp_replace(text, "[.,;:!?'\"()]", "")
    (length(text) - length(stripped)).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
  }

  /** Ratio of stopword tokens to all tokens. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val sw = filter(t, x => x.isin(Stopwords: _*))
    size(sw).cast("double") / greatest(size(t).cast("double"), lit(1.0))
  }

  /** Mean token length over non-empty tokens. */
  def meanTokenLen(text: Column): Column = {
    val t = filter(tokens(text), x => length(x) > 0)
    when(size(t) > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long")).cast("double") /
        size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Overlapping fixed-size token chunks — the context-window packing step
    * of a training pipeline. Chunk i covers tokens [i·stride, i·stride+size);
    * the last start is the first multiple of stride whose window reaches the
    * final token, so every token is covered, consecutive chunks overlap by
    * size-stride, and no chunk is a suffix of its predecessor. Returns an
    * array of space-joined chunk strings (posexplode at the call site keeps
    * the chunk index). Pure column expression — chunking 10^9 docs is a
    * scan-parallel projection, no shuffle.
    */
  def chunks(text: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val t = tokens(text)
    val n = org.apache.spark.sql.functions.size(t)
    val lastStart =
      greatest(ceil((n - lit(size)).cast("double") / stride), lit(0L)) * stride
    // explicit null-in/null-out: greatest() skips the null from size(null)
    // and would otherwise manufacture a single empty chunk for null text
    when(text.isNotNull,
      transform(sequence(lit(0L), lastStart.cast("long"), lit(stride.toLong)),
        start => concat_ws(" ", slice(t, start.cast("int") + lit(1), lit(size)))))
  }

  /** Chunk statistics over a PRE-TOKENIZED array: one
    * `struct(n_chunk_tokens, chunk_fp)` per chunk, same windowing as
    * [[chunks]]. Takes the token-array column (not the text) so the
    * expensive tokenization is evaluated exactly once per document in its
    * own projection — passing `tokens(text)` directly here would embed the
    * split inside the per-chunk lambda and re-tokenize per chunk (measured
    * 22x slower at sf0.1). The two references to `toks` (window count +
    * slice) also keep `CollapseProject` from inlining an upstream
    * `split(...).as("toks")` alias into this expression.
    */
  def chunkStats(toks: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val n = org.apache.spark.sql.functions.size(toks)
    val lastStart =
      greatest(ceil((n - lit(size)).cast("double") / stride), lit(0L)) * stride
    when(toks.isNotNull,
      transform(sequence(lit(0L), lastStart.cast("long"), lit(stride.toLong)),
        start => {
          val sl = slice(toks, start.cast("int") + lit(1), lit(size))
          struct(
            org.apache.spark.sql.functions.size(sl).cast("long").as("n_chunk_tokens"),
            md5(concat_ws(" ", sl)).as("chunk_fp"))
        }))
  }

  /** How many query terms the BM25 scorer will inline as per-term columns
    * before switching to the exploded/broadcast-join formulation.
    */
  val Bm25InlineTermLimit: Int = 16

  /** BM25 relevance scores for a RUNTIME query-term list: output
    * (idCol, score), one row per document matching at least one term.
    *
    * Terms are a runtime argument; two plans by term count:
    *  - <= [[Bm25InlineTermLimit]] terms (the interactive-query case): tf per
    *    term is counted directly on the token array in the scan projection —
    *    ZERO shuffles end to end. Corpus stats (avgdl, N) and per-term doc
    *    frequencies come from one broadcast aggregate over the same per-doc
    *    frame; scoring is a projection and top-k is TakeOrderedAndProject.
    *    Per-doc CPU is O(tokens * terms), which is why this tier is capped.
    *  - above it (batch/expansion queries): explode + broadcast-join the
    *    term table (non-query tokens never reach a shuffle), aggregate
    *    (doc, term) with doc length riding along, window-count doc
    *    frequencies over the tiny tf frame — one map-side-combined shuffle
    *    of matched tokens, independent of term count.
    * Neither tier persists or blocks.
    */
  def bm25(df: DataFrame, idCol: String, toks: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      inlineTermLimit: Int = Bm25InlineTermLimit): DataFrame = {
    // dedupe up front: a repeated term would double-count linearly in the
    // inline tier but double tf (nonlinear saturation) in the exploded one —
    // distinct makes the two tiers agree and matches scoring a term set
    val uniq = terms.distinct
    require(uniq.nonEmpty, "bm25 needs at least one query term")
    // null token arrays (null text) drop out entirely — same corpus-stat
    // denominator as an explode-based formulation, which emits no rows for
    // null docs
    val base = df.select(col(idCol), toks.as("__t")).where(col("__t").isNotNull)
    if (uniq.size <= inlineTermLimit) bm25Inline(base, idCol, uniq, k1, b)
    else bm25Exploded(base, idCol, uniq, k1, b)
  }

  private def bm25Inline(base: DataFrame, idCol: String, terms: Seq[String],
      k1: Double, b: Double): DataFrame = {
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      size(filter(col("__t"), x => x === lit(term))).cast("long").as(s"__tf$i")
    }
    val perDoc = base.select(
      col(idCol) +: size(col("__t")).cast("long").as("__dl") +: tfCols: _*)
    val statCols =
      avg("__dl").as("__avgdl") +: count(lit(1)).cast("double").as("__n") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).cast("double").as(s"__df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val termScores = terms.indices.map { i =>
      val tf = col(s"__tf$i"); val dfc = col(s"__df$i")
      when(tf > 0,
        log(lit(1.0) + (col("__n") - dfc + 0.5) / (dfc + 0.5)) *
          (tf * (k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(stats))
      .where(terms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col(idCol), termScores.reduce(_ + _).as("score"))
  }

  private def bm25Exploded(base: DataFrame, idCol: String, terms: Seq[String],
      k1: Double, b: Double): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val termsDf = terms.toDF("__term")
    val matched = base.select(col(idCol), size(col("__t")).cast("long").as("__dl"),
        explode(col("__t")).as("__tk"))
      .join(broadcast(termsDf), col("__tk") === col("__term"))
      .select(col(idCol), col("__dl"), col("__tk"))
    val tf = matched.groupBy(col(idCol), col("__dl"), col("__tk"))
      .agg(count(lit(1)).as("__tf"))
    val stats = base.select(size(col("__t")).cast("long").as("__len"))
      .agg(avg("__len").as("__avgdl"), count(lit(1)).cast("double").as("__n"))
    tf.withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("__tk")))
      .crossJoin(broadcast(stats))
      .withColumn("__s",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)) *
          (col("__tf") * (k1 + 1.0)) /
          (col("__tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol)).agg(sum(col("__s")).as("score"))
  }

  /** Composite quality score in [0,1]: length band + punctuation sanity +
    * stopword presence — the standard cheap pre-filter for LLM corpora.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.5))
    val swOk = when(stopwordRatio(text).between(0.05, 0.6), lit(1.0)).otherwise(lit(0.5))
    round((lenScore * 0.5 + punctOk * 0.25 + swOk * 0.25), 6)
  }
}

/** Pluggable tokenizer contract mirroring the reference's
  * `BaseTokenizer.tokenize` (model/utils/tokenizer.py:8-24; MeCab impl at
  * :27-37, Janome alternative dead code at :40-63 — evidence the strategy is
  * intentionally pluggable). JVM has no MeCab; the default is whitespace.
  */
trait Tokenizer extends Serializable {
  /** Space-joined token string — the reference's wakati contract. */
  def tokenize(text: String): String
}

/** Whitespace tokenizer (defaults match TextOps.tokens). */
final class WhitespaceTokenizer extends Tokenizer {
  override def tokenize(text: String): String =
    if (text == null) "" else text.trim.split("\\s+").mkString(" ")
}

/** Character n-gram tokenizer — the no-dictionary fallback for CJK text
  * (the reference's corpus is Japanese lyrics; char n-grams are the standard
  * segmentation-free approach).
  */
final class CharNGramTokenizer(n: Int = 2) extends Tokenizer {
  override def tokenize(text: String): String =
    if (text == null || text.length < n) ""
    else text.sliding(n).mkString(" ")
}

/** Dictionary-based Japanese segmenter — the reference's actual tokenizer
  * use case (MeCab wakati, model/utils/tokenizer.py:27-37) behind the same
  * [[Tokenizer]] trait, in pure Scala with a checked-in lexicon (no native
  * MeCab on the JVM; see SURVEY §7.3). Greedy longest-match against the
  * lexicon; where no entry matches, the fallback token is the maximal run
  * of one character class (kanji / hiragana / katakana+ー / alnum / other),
  * cut early where a dictionary word begins — the classic MaxMatch +
  * char-class heuristic. Deterministic and pure, so driver-side
  * tokenizations of fixture sentences are shareable constants for a SQL
  * oracle (the hyperplane-literal recipe), while executors run the same
  * code per row.
  *
  * Linguistic quality is bounded by the tiny default lexicon — the
  * pluggable contract is the point: swap in a full dictionary (or a real
  * morphological analyzer) without touching any consumer.
  */
final class JapaneseTokenizer(
    lexicon: Set[String] = JapaneseTokenizer.DefaultLexicon) extends Tokenizer {
  require(lexicon.nonEmpty, "empty lexicon — use CharNGramTokenizer instead")
  private val maxLen = lexicon.iterator.map(_.length).max

  private def charClass(c: Char): Int =
    if (c >= 0x3040 && c <= 0x309f) 1 // hiragana
    else if (c >= 0x30a0 && c <= 0x30ff) 2 // katakana incl. ー (0x30fc)
    else if ((c >= 0x4e00 && c <= 0x9fff) || c == 0x3005) 3 // kanji + 々
    else if (c.isLetterOrDigit) 4 // latin / digits / full-width alnum
    else 5 // punctuation & everything else

  private def dictAt(text: String, i: Int): String = {
    var m = math.min(maxLen, text.length - i)
    while (m >= 1) {
      val cand = text.substring(i, i + m)
      if (lexicon.contains(cand)) return cand
      m -= 1
    }
    null
  }

  override def tokenize(text: String): String = {
    if (text == null) return ""
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      if (text.charAt(i).isWhitespace) i += 1
      else {
        val hit = dictAt(text, i)
        if (hit != null) { out += hit; i += hit.length }
        else {
          val cls = charClass(text.charAt(i))
          var j = i + 1
          while (j < n && !text.charAt(j).isWhitespace &&
              charClass(text.charAt(j)) == cls && dictAt(text, j) == null)
            j += 1
          out += text.substring(i, j)
          i = j
        }
      }
    }
    out.mkString(" ")
  }
}

object JapaneseTokenizer {
  /** Minimal demonstration lexicon: particles, copulas and aux forms,
    * common nouns, verb stems and adjectives — enough to segment simple
    * sentences the way wakati output reads. Longest-match prefers the
    * longest entry, so 好き beats 好, でした beats で.
    */
  val DefaultLexicon: Set[String] = Set(
    // particles / copulas / auxiliaries
    "は", "が", "を", "に", "で", "と", "の", "も", "へ", "や",
    "から", "まで", "より", "です", "ます", "でした", "ました",
    "する", "した", "して", "いる", "ある", "ない", "たい",
    // common nouns
    "私", "猫", "犬", "本", "水", "空", "歌", "声", "夢", "心",
    "言葉", "世界", "音楽", "日本", "東京", "学校", "学生", "先生",
    "今日", "明日", "昨日", "時間", "友達",
    // verb stems / adjectives
    "食べ", "飲み", "行き", "来", "見", "読み", "書き", "聞き",
    "歌い", "走り", "好き", "嫌い", "大きい", "小さい", "新しい",
    "高い", "楽しい", "美しい")
}
