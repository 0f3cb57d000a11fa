package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines, expressed as pure
  * Catalyst column functions (codegen'd, no UDFs — SURVEY §2.9 UDF note).
  * Every function here has a DuckDB-equivalent SQL shape used by the
  * oracle queries in SparkEntry; the portability contract is:
  * tokenization = regex whitespace split with empties dropped, hashes =
  * md5 hex strings (identical across engines), arithmetic in double with
  * fixed operand order.
  *
  * These extend the reference's surface (vers has no text ops) per the
  * driver's north star; they reuse the engine's dedup/top-k shapes.
  */
object TextOps {

  /** Whitespace tokens with empties removed (empty text → empty array). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > lit(0))

  /** Fixed-size token chunks with stride — the embedding-pipeline
    * preprocessor (chunk → embed → index): chunk i covers tokens
    * [i·stride, i·stride + chunkSize). stride < chunkSize overlaps
    * chunks (context continuity); the tail chunk may be short; an
    * empty doc yields one empty chunk (callers filter it). Pure
    * codegen column fn — chunking is a narrow map at any scale.
    * Hot paths should project [[tokens]] first and call
    * [[chunkTokensOf]] on the materialized column (else the tokenize
    * expression re-splits the text once per chunk — see
    * [[winnowOfGrams]]). */
  def chunkTokens(text: Column, chunkSize: Int, stride: Int): Column =
    chunkTokensOf(tokens(text), chunkSize, stride)

  /** [[chunkTokens]] over an already-materialized token column. */
  def chunkTokensOf(toks: Column, chunkSize: Int, stride: Int): Column = {
    transform(
      sequence(lit(0),
        greatest(((size(toks) - 1) / lit(stride)).cast("int"), lit(0))),
      i => concat_ws(" ", slice(toks, i * stride + 1, lit(chunkSize))))
  }

  /** Canonical text for normalization-aware exact dedup: lowercase,
    * strip non-alphanumerics (ASCII classes — engine-portable, unlike
    * unicode property classes), collapse whitespace runs, trim. Two
    * docs differing only in case/punctuation/spacing normalize equal.
    * Pure codegen column fn — a narrow map at any scale. */
  /** Content-defined chunking (CDC) at token granularity — the
    * storage-dedup boundary rule (rsync/LBFS lineage) lifted to text:
    * a chunk boundary falls AFTER token i iff
    * `hash60(token_{i−1} ⊔ token_i) mod avgLen == 0`, so boundaries are
    * functions of local CONTENT, not position. Insert one token at the
    * head of a document and every fixed-window chunk
    * ([[chunkTokens]]) shifts and re-digests; CDC chunks re-align at
    * the first boundary and every chunk after it keeps its digest —
    * which is what makes chunk-level dedup robust to edits
    * (DedupSpec gates exactly this property).
    *
    * Output: (idCol, chunk_idx, n_toks, chunk, digest) — one row per
    * chunk, expected length ≈ avgLen tokens (geometric; no min/max
    * clamp: a clamp makes each boundary depend on the previous one,
    * turning the narrow window pass into a sequential per-doc scan.
    * Degenerate runs of one repeated token pair produce degenerate
    * chunking, the documented CDC trade).
    *
    * Plan shape: one posexplode, one per-doc window cumsum (doc-sized
    * partitions), one per-(doc, chunk) aggregate — corpus-linear, and
    * the chunk digests are the only thing downstream dedup shuffles. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                avgLen: Int = 16): DataFrame = {
    require(avgLen >= 2 && avgLen <= (1 << 16),
      s"avgLen=$avgLen out of range [2, 65536]")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).cast("long").as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    toks
      .withColumn("bnd", when(pmod(Sketches.hash60(
          concat_ws(" ", lag(col("tok"), 1, "").over(w), col("tok"))),
        lit(avgLen.toLong)) === 0L, 1L).otherwise(0L))
      .withColumn("chunk_idx", coalesce(
        sum(col("bnd")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .groupBy(col("id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_toks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("chunk"))
      .select(col("id").as(idCol), col("chunk_idx"), col("n_toks"),
        col("chunk"), md5(col("chunk")).as("digest"))
  }

  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Word n-gram shingles joined by single spaces; docs with fewer than
    * `n` tokens get an empty list. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash prime modulus (2³¹−1). */
  val MinhashP = 2147483647L

  /** Per-shingle hash-pair column: ONE md5 per shingle, split into two
    * 60-bit hex prefixes reduced mod p. All numHashes components derive
    * from this pair (Kirsch–Mitzenmacher double hashing) — 12× fewer
    * digests than hashing per component. Engine-portable: DuckDB parses
    * the same hex via CAST('0x…' AS BIGINT). */
  def minhashPairs(shingleCol: Column): Column =
    transform(shingleCol, s => {
      val d = md5(s)
      struct(
        pmod(conv(substring(d, 1, 15), 16, 10).cast("long"), lit(MinhashP)).as("h1"),
        pmod(conv(substring(d, 17, 15), 16, 10).cast("long"), lit(MinhashP)).as("h2"))
    })

  /** MinHash component i from a [[minhashPairs]] column:
    * min over shingles of (h1 + i·h2) mod p. */
  def minhashFromPairs(pairsCol: Column, i: Int): Column =
    array_min(transform(pairsCol, h =>
      pmod(h.getField("h1") + lit(i.toLong) * h.getField("h2"), lit(MinhashP))))

  /** One md5 digest per token — the shared input of the 16 SimHash bit
    * votes (compute once behind a projection boundary; CollapseProject
    * keeps non-cheap multi-referenced aliases separate). */
  def md5Digests(text: Column): Column = transform(tokens(text), t => md5(t))

  /** 16-bit SimHash from per-token digests: bit j is the sign of Σ±1
    * where a token votes +1 iff the (j+1)-th nibble of its md5 has its
    * high bit set. Portable variant of Charikar's simhash (same
    * structure, md5-nibble hash family). */
  def simhash16FromDigests(digests: Column): Column = {
    val highNibble = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    (0 until 16).map { j =>
      val vote = aggregate(digests, lit(0), (acc, d) =>
        acc + when(substring(d, j + 1, 1).isin(highNibble: _*), lit(1))
          .otherwise(lit(-1)))
      when(vote > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Convenience single-expression form (recomputes digests per bit —
    * prefer a two-step projection via [[md5Digests]] in hot paths). */
  def simhash16(text: Column): Column = simhash16FromDigests(md5Digests(text))

  /** 64-bit SimHash from per-token digests — two bits per md5 nibble
    * (the 8-bit for bits 0..31, the 4-bit for bits 32..63), same vote
    * structure as [[simhash16FromDigests]]; see
    * [[TextHashFast.simhash64]] for the fast-path twin and the scale
    * rationale (16 bits saturate beyond ~10⁴ docs). */
  def simhash64FromDigests(digests: Column): Column = {
    val bit8 = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bit4 = Seq("4", "5", "6", "7", "c", "d", "e", "f")
    (0 until 64).map { bit =>
      val (nibblePos, hexSet) =
        if (bit < 32) (bit + 1, bit8) else (bit - 32 + 1, bit4)
      val vote = aggregate(digests, lit(0), (acc, d) =>
        acc + when(substring(d, nibblePos, 1).isin(hexSet: _*), lit(1))
          .otherwise(lit(-1)))
      when(vote > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  def simhash64(text: Column): Column = simhash64FromDigests(md5Digests(text))

  /** Set fingerprint: md5 of the space-joined sorted distinct token set —
    * content-defined doc identity robust to token order/repeats. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** BPE-ish regex tokenizer: letter runs, digit runs, single
    * punctuation marks — the subword-style segmentation a token-count
    * estimator uses when no real BPE vocab is available. */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** md5 hashes of the k-char grams of the raw text (rolling-hash
    * family, engine-portable); empty when the text is shorter than k. */
  def charGramHashes(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(sequence(lit(1), length(text) - lit(k - 1)),
        i => md5(text.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Winnow step over an ALREADY-MATERIALIZED gram-hash column: min
    * hash of every w-window of consecutive k-gram hashes, distinct.
    * Texts with fewer than w grams contribute their single global min.
    *
    * `h` must be a bound attribute (the output of a previous
    * projection), NOT the [[charGramHashes]] expression inline: the
    * lambda body references it once per window, and an inline
    * expression re-evaluates EVERY md5 per window — O(len²) md5s per
    * doc (measured: dedup_winnow 827 s at sf0.1; the two-projection
    * form is ~20×+ cheaper). Catalyst's CollapseProject keeps the
    * boundary because the alias is non-cheap and multiply-referenced. */
  def winnowOfGrams(h: Column, w: Int = 4): Column =
    when(size(h) >= w,
      array_distinct(transform(sequence(lit(1), size(h) - lit(w - 1)),
        i => array_min(slice(h, i, lit(w))))))
      .when(size(h) > 0, array(array_min(h)))
      .otherwise(array().cast("array<string>"))

  /** Winnowing fingerprints (Schleimer et al. document fingerprinting)
    * as one composed Column — convenience form for small frames; hot
    * paths should project [[charGramHashes]] first and apply
    * [[winnowOfGrams]] to the materialized column (see its scaladoc). */
  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    winnowOfGrams(charGramHashes(text, k), w)

  /** Stopword lists for the n-gram/stopword language heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "los", "es", "y", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"))

  private def stopHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang).map(lit): _*)))

  /** Heuristic language ID: argmax of stopword hits with the fixed
    * tie-break order en > de > es > fr; no hits at all → "und". */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val s = Map(
      "en" -> stopHits(toks, "en"), "de" -> stopHits(toks, "de"),
      "es" -> stopHits(toks, "es"), "fr" -> stopHits(toks, "fr"))
    when(s("en") + s("de") + s("es") + s("fr") === 0, lit("und"))
      .when(s("en") >= s("de") && s("en") >= s("es") && s("en") >= s("fr"), lit("en"))
      .when(s("de") >= s("es") && s("de") >= s("fr"), lit("de"))
      .when(s("es") >= s("fr"), lit("es"))
      .otherwise(lit("fr"))
  }

  /** Quality score ∈ [0,1]: 0.4·min(1, tokens/100) + 0.3·(1−punct ratio)
    * + 0.3·stopword ratio. All double arithmetic, fixed operand order
    * (oracle-portable). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val punct = when(length(text) > 0,
      length(regexp_replace(text, "[a-z0-9 ]", ""))
        .cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))
    val stops = (stopHits(toks, "en") + stopHits(toks, "de") +
      stopHits(toks, "es") + stopHits(toks, "fr")).cast("double")
    val lenScore = least(lit(1.0), nTok / lit(100.0))
    lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punct) +
      lit(0.3) * when(nTok > 0, stops / nTok).otherwise(lit(0.0))
  }

  /** Gopher-style repetition-free quality rules (the public heuristic
    * battery every web-pretraining pipeline runs — word-count bounds,
    * mean-word-length bounds, alphabetic-word fraction, minimum
    * stopword evidence). Each metric is a pure codegen column over a
    * MATERIALIZED token column (HOF discipline: callers project
    * [[tokens]] first), engine-portable: integer sums are exact, the
    * two ratios are single double divisions.
    *
    * Returns (n_words, mean_wlen, frac_alpha, n_stops) as Columns;
    * combine with [[gopherKeep]] for the admission boolean.
    */
  def gopherMetrics(toks: Column): (Column, Column, Column, Column) = {
    val n = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
    val meanLen = when(n > 0, sumLen.cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
    val alpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val fracAlpha = when(n > 0, alpha.cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
    val stops = (stopHits(toks, "en") + stopHits(toks, "de") +
      stopHits(toks, "es") + stopHits(toks, "fr")).cast("long")
    (n, meanLen, fracAlpha, stops)
  }

  /** Feature-hashing text embedding (the hashing trick, Weinberger et
    * al.) — a MODEL-FREE embedding: token t adds sign(t) ∈ {−1, +1} to
    * dimension h(t) mod dim, both md5-derived (engine-portable). The
    * result is an integer-valued ARRAY<BIGINT> whose dot products
    * estimate token-multiset similarity, so every downstream ANN /
    * embedding-dedup operator works on raw text with no trained model
    * in the loop. Pure narrow per-row fold (no shuffle) — the oracle
    * replays it relationally (explode → group), proving the map ≡
    * the aggregation.
    */
  def hashEmbedding(toks: Column, dim: Int = 16): Column = {
    require(dim >= 2 && dim <= 256, s"hashEmbedding: dim in [2,256], got $dim")
    // two-step shape (the round-7 HOF lesson): hash each token ONCE
    // into an (index, sign) pair, THEN fold — an md5 referenced inside
    // the inner per-dimension lambda would re-hash every token `dim`
    // times (measured 3.6 s → 0.9 s at sf0.1 for dim=16)
    val pairs = transform(toks, t => struct(
      pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"),
        lit(dim.toLong)).as("i"),
      when(substring(md5(t), 9, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), lit(-1L))
        .otherwise(lit(1L)).as("s")))
    aggregate(pairs, array_repeat(lit(0L), lit(dim)), (acc, p) =>
      transform(acc, (x, i) =>
        x + when(i.cast("long") === p.getField("i"), p.getField("s"))
          .otherwise(lit(0L))))
  }

  /** The Gopher admission rule over [[gopherMetrics]]: word count in
    * [minWords, maxWords], mean word length in [minMeanLen, maxMeanLen],
    * alphabetic-word fraction ≥ minFracAlpha, stopword hits ≥ minStops.
    * Defaults are the published Gopher thresholds scaled to this
    * corpus's short synthetic docs only where noted by the caller.
    */
  def gopherKeep(toks: Column,
                 minWords: Long = 50L, maxWords: Long = 100000L,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 minFracAlpha: Double = 0.8, minStops: Long = 2L): Column = {
    val (n, meanLen, fracAlpha, stops) = gopherMetrics(toks)
    n >= minWords && n <= maxWords &&
      meanLen >= minMeanLen && meanLen <= maxMeanLen &&
      fracAlpha >= minFracAlpha && stops >= minStops
  }
}
