package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column combinators for large-scale document pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, shingling.
  * All pure `org.apache.spark.sql.functions` compositions — they stay inside
  * whole-stage codegen and push down through Catalyst (no UDF boundary),
  * which is what keeps a 100 TB documents scan CPU-bound instead of
  * serialization-bound.
  */
object TextFunctions {

  /** ASCII-only lowercasing via `translate` (a plain char map). Spark 4's
    * `lower()` routes through ICU collation support whose first heavy use
    * stalls for tens of seconds under many threads (contended
    * BreakIteratorCache) — a pure char-map is codegen'd and constant-cost.
    * Downstream normalization strips non-[a-z0-9] anyway, so full-Unicode
    * case mapping would be erased for every path that uses this.
    */
  def asciiLower(c: Column): Column =
    translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

  /** Strip null bytes and other C0 control chars except tab/newline/CR —
    * the reference scrubs null bytes out of dump payloads before load
    * (prontuario_gcs/tasks.py:489-495).
    */
  def stripControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")

  /** Header surgery: drop a `TO_CHAR(...)`-style wrapper that some DATASUS
    * exports leave in the first CSV header cell (reference:
    * datasus_ftp/datasus/utils.py:55-94).
    */
  def stripFunctionWrapper(c: Column): Column =
    regexp_replace(c, "(?i)TO_CHAR\\(([^)]*)\\)", "$1")

  /** Whitespace tokens; empty/blank text → empty array; null → null.
    * Deliberately HOF-free: after trim, a "\\s+" split can only produce an
    * empty token for empty input, so a `when` guard replaces the
    * interpreted `filter` lambda and the whole expression stays inside
    * whole-stage codegen.
    */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(length(t) > 0, split(t, "\\s+"))
      .when(t.isNotNull, array().cast("array<string>"))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-space symbols — a deterministic regex approximation of a
    * byte-pair-encoded token stream for cost estimation.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("bigint")

  /** Fixed-size overlapping token windows — the document→training-sample
    * chunking step: each chunk is `chunkTokens` whitespace tokens, starting
    * every `chunkTokens - overlap` tokens. The grid stops at the first start
    * whose window reaches end-of-doc, so a short tail is kept only when it
    * contains tokens no earlier window covers (never a pure sub-window of
    * the previous chunk). Returns `array<struct<start, n_tokens, chunk>>`
    * where `start` is the 0-based token offset.
    *
    * HOF-based (`transform` over a `sequence` of starts): chunking emits
    * whole new strings per element, so per-element interpreted eval is
    * dwarfed by the string building itself — unlike the hash kernels this
    * is not a bit-parity hot path (and the output IS replayable: slicing
    * and joining tokens is deterministic in any engine).
    */
  def chunkByTokens(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    val toks = tokens(text)
    // Stop the grid at the first start whose window reaches end-of-doc:
    // a later start would emit a tail already contained in that window.
    val lastStart = greatest(lit(0),
      (ceil((size(toks) - lit(chunkTokens)).cast("double") / lit(step)) * step).cast("int"))
    val starts = sequence(lit(0), lastStart, lit(step))
    transform(starts, s => struct(
      s.cast("long").as("start"),
      least(lit(chunkTokens), size(toks) - s).cast("long").as("n_tokens"),
      array_join(slice(toks, s + 1, lit(chunkTokens)), " ").as("chunk")))
  }

  /** Content-defined chunking: split the token stream at positions where
    * the rolling window's portable hash has `maskBits` low zero bits —
    * boundaries move WITH the content, so inserting one sentence shifts
    * block frames instead of invalidating every downstream block (the
    * property fixed-size chunking lacks, and the reason CDC is the
    * shift-resistant block-dedup primitive). Expected block length ≈
    * 2^maskBits tokens.
    *
    * Returns `array<struct<start, n_tokens, block_hash>>` where
    * `block_hash` is the portable md5-60bit hash of the block's joined
    * tokens — group blocks by hash across the corpus to find shared
    * passages between partially-overlapping documents. Window hashes are
    * the same `md5h60` primitive as the MinHash pipeline, so any engine
    * replays boundaries and hashes bit-for-bit.
    */
  def cdcBlocks(text: Column, w: Int, maskBits: Int): Column =
    cdcBlocksFromTokens(tokens(text), w, maskBits)

  /** CDC over an ALREADY-MATERIALIZED token array column. Codegen'd single
    * pass per row ([[CdcBlocksFromTokens]]) — the rolling-window scan,
    * boundary test, and per-block hash run as one fused primitive loop
    * inside whole-stage codegen; values are bit-identical to the HOF
    * composition ([[cdcBlocksFromTokensHof]], kept as the parity
    * reference).
    */
  def cdcBlocksFromTokens(toks: Column, w: Int, maskBits: Int): Column = {
    require(w >= 1 && maskBits >= 1 && maskBits < 32,
      s"need w >= 1 and 1 <= maskBits < 32, got w=$w maskBits=$maskBits")
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CdcBlocksFromTokens(Bridge.expression(toks), w, maskBits))
  }

  /** The interpreted HOF composition [[cdcBlocksFromTokens]]'s kernel
    * replaces — retained ONLY as the bit-parity reference for the spec
    * (TextExpressionsSpec runs both forms side by side). Not for hot
    * paths: `transform`/`filter`/`zip_with` are CodegenFallback, and the
    * lambdas re-evaluate the referenced token subtree once per element.
    */
  private[graft] def cdcBlocksFromTokensHof(toks: Column, w: Int, maskBits: Int): Column = {
    require(w >= 1 && maskBits >= 1 && maskBits < 32,
      s"need w >= 1 and 1 <= maskBits < 32, got w=$w maskBits=$maskBits")
    val mask = (1L << maskBits) - 1
    def h60(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val n = size(toks)
    val windows =
      if (w == 1) toks else wordNgramsFromTokens(toks, w)
    // cut BEFORE token i+w when window i (0-based) hash has maskBits low zeros
    val cuts = filter(
      transform(windows, (g, i) =>
        when(h60(g).bitwiseAND(lit(mask)) === 0, i + lit(w)).otherwise(lit(-1))),
      x => x >= 0 && x < n) // a cut at n would only create an empty tail
    val starts = concat(array(lit(0)), cuts)
    val ends = concat(cuts, array(n))
    val blocks = zip_with(starts, ends, (s, e) => struct(
      s.cast("long").as("start"),
      (e - s).cast("long").as("n_tokens"),
      h60(array_join(slice(toks, s + 1, e - s), " ")).as("block_hash")))
    filter(blocks, b => b("n_tokens") > 0)
  }

  /** Punctuation-to-character ratio (0 for empty text). */
  def punctRatio(text: Column): Column = {
    val punct = size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0)))
    when(length(text) > 0, punct.cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))
  }

  private val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "on", "for", "with", "as", "at", "by", "be", "this", "that", "from")

  /** Fraction of tokens that are (English) stopwords — a standard
    * fluency/quality signal for pretraining corpora.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(asciiLower(text))
    val sw = filter(toks, t => t.isin(stopwords.map(lit(_)): _*))
    when(size(toks) > 0, size(sw).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean token length in characters (0 for empty text). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * moderate token length, penalizes punctuation soup. Deterministic and
    * fully codegen'd; thresholds follow common corpus-filtering heuristics
    * (Gopher-style rules).
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(tokenCount(text).between(5, 100000), lit(0.4)).otherwise(lit(0.0))
    val swOk = when(stopwordRatio(text) >= 0.05, lit(0.3)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) <= 0.2, lit(0.3)).otherwise(lit(0.0))
    round(lenOk + swOk + punctOk, 1)
  }

  /** Word n-grams of a document as strings ("a b", "b c", ... for n=2),
    * DUPLICATES AND ORDER KEPT — the multiset the repetition signal needs
    * (contrast [[wordShingles]], which deduplicates for MinHash). Sliding
    * windows over the whitespace tokens via slice+zip — no explode, no
    * shuffle; the array lives and dies inside the row's projection.
    */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsFromTokens(tokens(text), n)

  /** N-grams from an already-materialized token array (see
    * [[cdcBlocksFromTokens]] for the projection-boundary rationale; here
    * `toks` only appears as slice ARGUMENTS — evaluated once — so inline
    * use is safe, but hot paths should still bind it).
    */
  def wordNgramsFromTokens(toks: Column, n: Int): Column = {
    require(n >= 2, s"n-grams need n >= 2, got $n (n=1 is tokens())")
    val m = greatest(size(toks) - lit(n - 1), lit(0)) // n-gram count (>= 0)
    val base = slice(toks, lit(1), m)
    (1 until n).foldLeft(base) { (acc, i) =>
      zip_with(acc, slice(toks, lit(i + 1), m),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Fraction of word n-grams that are repeats of an earlier n-gram in the
    * same document — the Gopher-class repetition signal (boilerplate,
    * keyword stuffing, decode loops score high; clean prose scores near 0).
    * `1 - distinct/total`; 0 for documents with fewer than n tokens. Counts
    * are integers and the one division is IEEE-exact, so any engine replays
    * the ratio bit-for-bit.
    */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val grams = wordNgrams(text, n)
    val total = size(grams)
    when(total > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "pt" -> Seq("o", "os", "de", "que", "e"))

  /** N-gram/stopword-marker language ID heuristic: counts occurrences of
    * each language's top function words and picks the argmax (ties broken
    * by fixed language order, `und` = undetermined when nothing matches).
    * This is the classic cheap lang-ID used as a pre-filter before an
    * expensive model pass.
    */
  def langId(text: Column): Column = {
    val toks = tokens(asciiLower(text))
    val scores: Seq[(String, Column)] = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Canonical text normalization for fingerprinting: lower, strip
    * non-alphanumerics to single spaces, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(asciiLower(text), "[^a-z0-9]+", " "))

  /** Deterministic document fingerprint = md5 of the normalized text.
    * Used for exact near-canonical dedup; stable across engines.
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Word n-gram shingles as an array column (distinct, order of first
    * occurrence dropped by array_distinct semantics).
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(normalized(text)), n)

  /** Shingles from an ALREADY-MATERIALIZED token array column.
    *
    * Callers in hot paths must pass a bound column (project the token array
    * first), not the raw `tokens(...)` expression: higher-order functions
    * re-evaluate subtrees referenced inside the lambda once PER ELEMENT, so
    * an inline tokens() subtree turns shingling into O(tokens²) regex work
    * per document. Catalyst won't collapse an expensive multi-referenced
    * alias back into the lambda, so a projection boundary is a real fence.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    // size < n would make sequence(0, size-n) run DOWNWARD (Spark's default
    // step is -1 for stop < start) and feed slice() a 0 index — guard to [].
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** 64-bit rolling-hash style fingerprints of every shingle (xxhash64 over
    * the shingle string with per-document-stable seed).
    */
  def shingleHashes(text: Column, n: Int): Column =
    transform(wordShingles(text, n), s => xxhash64(s))

  /** MinHash signature: for each of `k` hash families, the minimum over the
    * document's shingles of a family-specific rehash. Shingle strings are
    * hashed ONCE (xxhash64) and each family remixes the resulting long with
    * its index — k array passes of integer hashing instead of k passes of
    * string building, which is what keeps signature cost linear in shingles
    * (not shingle *bytes*) at corpus scale.
    */
  def minHashSignature(text: Column, n: Int, k: Int): Column =
    minHashFromHashes(transform(wordShingles(text, n), s => xxhash64(s)), k)

  /** Signature from pre-hashed shingles (see [[minHashSignature]]).
    * Codegen'd single pass ([[MinHashFromHashes]]) — k×n integer remixes
    * per row with no intermediate arrays; values identical to the
    * `array_min(transform(h, xxhash64(h, i)))` composition.
    */
  def minHashFromHashes(hashes: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinHashFromHashes(Bridge.expression(hashes), k))
  }

  /** SimHash-64 over word tokens: per bit, sum +1/-1 weighted votes of each
    * token's xxhash64, then collapse signs into a 64-bit long. Expressed as
    * an `aggregate` over the token array — one pass per row, no explode, no
    * shuffle.
    */
  def simHash64(text: Column): Column = {
    val toks = array_distinct(tokens(normalized(text)))
    val hashes = transform(toks, t => xxhash64(t))
    // per-bit ±1 votes, accumulated in one pass over the token array
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(
        acc,
        array((0 until 64).map(b =>
          when(shiftright(h, b).bitwiseAND(1L) === 1L, lit(1L))
            .otherwise(lit(-1L))): _*),
        (a, v) => a + v))
    // positive vote → bit set; bit values are Scala-side literals
    val bitVals = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(votes, bitVals, (v, bv) => when(v > 0, bv).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** PII patterns for Brazilian health-pipeline text: formatted CPF,
    * e-mail, and BR phone. Simple enough (character classes + bounded
    * quantifiers) to behave identically under Java regex and RE2-style
    * engines — a redaction a 100 TB corpus scrub must be able to replay
    * anywhere.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "\\d{3}\\.\\d{3}\\.\\d{3}-\\d{2}" -> "[CPF]",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\(\\d{2}\\)\\s?\\d{4,5}-\\d{4}" -> "[PHONE]")

  /** Redact PII spans with type markers — the anonymization pass a
    * training-data pipeline runs before any text leaves the secure zone.
    * Pure chained `regexp_replace` (codegen'd, no UDF).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, marker)) =>
      regexp_replace(c, pat, marker)
    }

  /** Count of PII matches per pattern type, for scrub auditing. */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (pat, marker) =>
      marker -> size(regexp_extract_all(text, lit(pat), lit(0))).cast("bigint")
    }
}
