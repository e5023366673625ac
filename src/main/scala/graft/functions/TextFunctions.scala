package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, language ID, quality scoring, document
  * fingerprinting. All pure Column expressions (codegen'd builtins and
  * higher-order functions — no UDFs), so they run at scan speed over
  * 100 TB of documents and stay portable to the DuckDB oracle.
  *
  * Everything is deterministic by construction: rule-based scoring,
  * fixed stopword regexes, md5-based hashes — no trained models, no RNG.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text; empty string → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Canonical text form — the normalize-before-hash pass of a
    * curation pipeline (exact dedup over raw bytes misses trivially
    * reformatted copies): strip non-whitespace control characters,
    * collapse every whitespace run to one space, trim. Two
    * regexp_replace passes in fixed order, identical semantics in any
    * RE2/Java-regex engine; tabs/newlines inside text collapse, so
    * normalize(a) == normalize(b) iff the documents differ only in
    * formatting. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),
      "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Count of regex matches — codegen'd, no match-array
    * materialization ([[graft.plans.RegexCount]]; same java.util.regex
    * engine as `regexp_extract_all`, so counts are identical). */
  private def regexCount(text: Column, pattern: String): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.RegexCount(
        org.apache.spark.sql.graft.bridge.expression(text), pattern))

  /** BPE-ish token count: word pieces + isolated punctuation, the usual
    * `\w+|[^\w\s]` pre-tokenizer shape. */
  def bpeishTokenCount(text: Column): Column =
    regexCount(text, "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]")

  /** Punctuation-mark count. */
  def punctCount(text: Column): Column =
    regexCount(text, "[.!?,;:]")

  /** Uppercase-letter count. */
  def upperCount(text: Column): Column =
    regexCount(text, "[A-Z]")

  // ---- encoding-quality signals (x120) ----
  // Shared regex constants feed BOTH the Spark expressions and the
  // generated DuckDB oracle SQL; the escape syntax used (\xHH ranges,
  // literal chars) parses identically under java.util.regex and RE2.
  /** U+FFFD — what a decoder emits for undecodable bytes. */
  val ReplacementCharPattern = "�"
  /** C0 control chars except \t\n\r, plus DEL: never legitimate in
    * text-modality training data. */
  val CtrlCharPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  /** Classic UTF-8-bytes-read-as-cp1252 digraphs: `â€` prefixes every
    * mangled smart quote/dash/ellipsis, and `Ã`/`Â` + Latin-1 accent
    * covers the mangled accented letters. Fixed literal alternation —
    * no overlap between alternatives, so counts are engine-portable by
    * construction. */
  val MojibakePattern =
    "(â€|Ã©|Ã¨|Ã¢|Ã¤|Ã¶|Ã¼|Ã±|Ã§|Â°|Â£)"
  /** Printable-ASCII char class (space..tilde). */
  val AsciiPrintablePattern = "[ -~]"

  def replacementCount(text: Column): Column =
    regexCount(text, ReplacementCharPattern).cast("long")
  def ctrlCount(text: Column): Column =
    regexCount(text, CtrlCharPattern).cast("long")
  def mojibakeCount(text: Column): Column =
    regexCount(text, MojibakePattern).cast("long")
  /** Printable-ASCII fraction of characters, portable-rounded to 4 dp;
    * NULL for an empty document. */
  def asciiPrintableRatio(text: Column): Column =
    when(length(text) === 0, lit(null).cast("double"))
      .otherwise(portableRound(
        regexCount(text, AsciiPrintablePattern).cast("double") /
          length(text).cast("double"), 4))

  /** Stopword lists per language — compact, fixed, ASCII. The zh list is
    * romanized particles (the synthetic corpus is ASCII; real CJK would
    * use codepoint-range features instead). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "une", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men")
  )

  private def stopRegex(words: Seq[String]): String =
    "\\b(" + words.mkString("|") + ")\\b"

  /** Hits of `lang`'s stopword list in lowercased text. */
  def stopwordHits(text: Column, lang: String): Column =
    regexCount(lower(text), stopRegex(stopwords.toMap.apply(lang)))

  /** Combined any-language stopword hit count (quality signal). */
  def anyStopwordHits(text: Column): Column =
    regexCount(lower(text), stopRegex(stopwords.flatMap(_._2).distinct))

  /** n-gram-heuristic language ID: argmax of per-language stopword hits,
    * ties broken by the fixed language order, zero hits → "und". */
  def langId(text: Column): Column = {
    val hits = stopwords.map { case (lang, _) => lang -> stopwordHits(text, lang) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val cascade = hits.foldRight(lit("und")) { case ((lang, h), tail) =>
      when(h === best && best > 0, lit(lang)).otherwise(tail)
    }
    // foldRight keeps declaration order: first language reaching the max wins
    cascade
  }

  /** Rule-based quality score ∈ [0,1], rounded to 4:
    *   0.4 · min(1, tokens/100)            — enough content
    * + 0.3 · min(1, stopword_ratio · 3)    — natural-language-ness
    * + 0.2 · (1 − min(1, punct_ratio ·10)) — not punctuation soup
    * + 0.1 · (1 − upper_ratio)             — not shouting
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = greatest(length(text), lit(1)).cast("double")
    val lenScore = least(lit(1.0), nTok / lit(100.0))
    val stopRatio = anyStopwordHits(text).cast("double") / greatest(nTok, lit(1.0))
    val punctRatio = punctCount(text).cast("double") / nChar
    val upperRatio = upperCount(text).cast("double") / nChar
    portableRound(
      lenScore * lit(0.4) +
        least(lit(1.0), stopRatio * lit(3.0)) * lit(0.3) +
        (lit(1.0) - least(lit(1.0), punctRatio * lit(10.0))) * lit(0.2) +
        (lit(1.0) - upperRatio) * lit(0.1), 4)
  }

  /** Fixed weights of the logistic quality classifier — the
    * fasttext-style "does this read like reference text" gate (DCLM /
    * CCNet shape): a linear model over cheap scan-time features, frozen
    * here as literals so the Spark expression and the DuckDB oracle
    * share one source of truth. In production the weights come from a
    * trained model; the ENGINE contract is only "logistic over
    * scan-computable features", which is what this encodes. */
  val ClassifierBias: Double = -3.0
  val ClassifierW: Seq[(String, Double)] = Seq(
    "log_n_tok" -> 0.55, // ln(tokens+1): substance
    "stop_ratio" -> 3.0, // stopword density: natural-language-ness
    "punct_per_char" -> -8.0, // punctuation soup
    "upper_per_char" -> -4.0, // shouting
    "mean_tok_len" -> 0.12) // fragment-vs-word balance

  /** Classifier probability in [0,1], portable-rounded to 4 dp. One
    * pass of codegen'd builtins per row — at 100 TB this is a
    * scan-time projection like [[qualityScore]], no shuffle, no model
    * service in the loop. exp/ln are IEEE libm on both engines; the
    * 1e-4 rounding absorbs ULP-level divergence (the x67 recipe). */
  def classifierProb(text: Column): Column = {
    val w = ClassifierW.toMap
    val nTok = tokenCount(text).cast("double")
    val nChar = greatest(length(text), lit(1)).cast("double")
    val logNTok = log(nTok + lit(1.0))
    val stopRatio = anyStopwordHits(text).cast("double") / greatest(nTok, lit(1.0))
    val punctPc = punctCount(text).cast("double") / nChar
    val upperPc = upperCount(text).cast("double") / nChar
    val meanTokLen =
      length(array_join(tokens(text), "")).cast("double") /
        greatest(nTok, lit(1.0))
    val z = lit(ClassifierBias) +
      lit(w("log_n_tok")) * logNTok +
      lit(w("stop_ratio")) * stopRatio +
      lit(w("punct_per_char")) * punctPc +
      lit(w("upper_per_char")) * upperPc +
      lit(w("mean_tok_len")) * meanTokLen
    portableRound(lit(1.0) / (lit(1.0) + exp(lit(0.0) - z)), 4)
  }

  /** PII redaction patterns — ordered (URLs can contain @, so they
    * redact first). Plain regex only (no lookarounds): portable between
    * Java regex and RE2-based engines. */
  val redactionRules: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "\\+?[0-9][0-9()\\- ]{7,}[0-9]" -> "<PHONE>"
  )

  /** Redact URLs, emails, and phone-ish digit runs from text. */
  def redactPii(text: Column): Column =
    redactionRules.foldLeft(text) { case (c, (pattern, token)) =>
      regexp_replace(c, pattern, token)
    }

  /** URL canonicalization rules, applied IN ORDER after lowercasing:
    * fragment, tracking parameters (mid-query then trailing, so the
    * separators stay well-formed), dangling separators, default
    * ports, trailing slash. No capture-group references — Java regex
    * spells them `$1`, RE2 `\1`, so portable rules avoid them
    * entirely; alternation uses non-capturing groups both engines
    * accept. Shared with the oracle SQL (one edit point). */
  val urlCanonRules: Seq[(String, String)] = Seq(
    "#.*$" -> "",
    "(?:utm_[a-z0-9]+|fbclid|gclid)=[^&#]*&" -> "",
    "[?&](?:utm_[a-z0-9]+|fbclid|gclid)=[^&#]*$" -> "",
    "[?&]$" -> "",
    ":80/" -> "/", ":443/" -> "/", ":80$" -> "", ":443$" -> "",
    "/$" -> "")

  /** Canonicalize a URL for crawl-frontier dedup: lowercase, then the
    * [[urlCanonRules]] pipeline. Lowercasing the WHOLE url (not just
    * scheme+host) is a deliberate canonical choice — group-reference
    * replacements are not engine-portable, and for dedup purposes a
    * case-folded path collides strictly more, never less. */
  def canonicalizeUrl(url: Column): Column =
    urlCanonRules.foldLeft(lower(url)) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }

  /** Engine-portable positive-value rounding: floor(x·10ⁿ + 0.5)/10ⁿ.
    * Spark's `round` (exact-BigDecimal HALF_UP) and DuckDB's `round`
    * (scale-then-std::round) disagree when the scaled double lands
    * exactly on .5; this form is the same IEEE ops in any engine. */
  def portableRound(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Same rule for JVM-side code (mapPartitions decoders etc.) — keep
    * every copy of the rounding rule routed through these two. */
  def portableRoundJvm(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    math.floor(x * p + 0.5) / p
  }

  /** Unicode script ranges for [[scriptCounts]], as EXPLICIT
    * `\x{...}` codepoint ranges — `\p{Latin}`-style script classes
    * spell differently in java.util.regex (`\p{IsLatin}`) and RE2
    * (`\p{Latin}`), and RE2 rejects `￿` escapes, so `\x{...}`
    * range classes are the one form both engines read identically.
    * Shared with oracles. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{C0}-\\x{24F}]",
    "cyrillic" -> "[\\x{400}-\\x{4FF}]",
    "cjk" -> "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}]",
    "digit" -> "[0-9]")

  /** Script-mix ratios per document — the langid complement that
    * catches what stopword hit-counts can't: mixed-script spam,
    * transliteration artifacts, mislabeled CJK in a "latin" corpus.
    * Returns one count column per [[scriptRanges]] entry plus the
    * non-space total; callers derive ratios (exact integers until one
    * rounded division, the x04 discipline). */
  def scriptCounts(text: Column): Seq[(String, Column)] =
    scriptRanges.map { case (name, cls) =>
      name -> regexCountPublic(text, cls)
    } :+ ("nonspace" -> regexCountPublic(text, "[^\\s]"))

  /** Compression-ratio quality signal ([[graft.plans.DeflateLen]] /
    * raw byte length, rounded): repetitive or templated text
    * compresses far below natural prose — the CCNet/Gopher-class
    * filter that catches boilerplate token-level rules miss. Empty
    * text → NULL (no bytes to compress). */
  def compressRatio(text: Column, roundTo: Int = 4): Column = {
    val dl = deflateLen(text)
    when(octet_length(text) > 0,
      portableRound(dl.cast("double") /
        octet_length(text).cast("double"), roundTo))
  }

  /** Raw deflate byte length of the UTF-8 text ([[graft.plans.DeflateLen]]
    * — BEST_COMPRESSION, nowrap). Exposed for callers that need the
    * length itself rather than [[compressRatio]]'s quotient: bound
    * checks (deflate's stored-block format caps the output at
    * raw + 5·⌈raw/65535⌉ bytes, the x163 oracle's cross-check) and
    * storage budgeting. */
  def deflateLen(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.DeflateLen(
        org.apache.spark.sql.graft.bridge.expression(text)))

  /** [[regexCount]] for library callers that need to share the exact
    * pattern with an oracle (the private one keeps its narrow use). */
  def regexCountPublic(text: Column, pattern: String): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.RegexCount(
        org.apache.spark.sql.graft.bridge.expression(text), pattern))

  /** HTML strip patterns, applied in order (script/style payloads die
    * whole, then comments, then every remaining tag → one space).
    * Shared with oracles — RE2 and java.util.regex agree on these
    * constructs ((?si) inline flags, non-greedy, char classes), which
    * is exactly why the patterns stay this simple. */
  val htmlStripPatterns: Seq[String] = Seq(
    "(?si)<script[^>]*>.*?</script>",
    "(?si)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->",
    "(?s)<[^>]*>")

  /** The entity subset worth decoding without an HTML parser; `&amp;`
    * is deliberately LAST so `&amp;lt;` decodes to the literal text
    * `&lt;` (one pass, no re-scan), the way C4's extractor behaves. */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML → text: the extraction step between "crawled page" and every
    * text operator in this engine (quality rules, dedup keys,
    * tokenizers all assume markup-free text). Regex-pipeline shape, not
    * a DOM parse — the deterministic, codegen-friendly 80 % that both
    * engines can replay byte-for-byte; a production pipeline puts a
    * real extractor (trafilatura-class) at ingest and THIS as the
    * cheap re-derivable fallback. */
  def htmlToText(html: Column): Column = {
    val stripped = htmlStripPatterns.foldLeft(html)((c, p) =>
      regexp_replace(c, p, " "))
    val decoded = htmlEntities.foldLeft(stripped) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    normalizeText(decoded)
  }

  /** Unicode normalization (TR#15) via the codegen'd
    * [[graft.plans.UnicodeNormalize]] — canonical-equivalence
    * canonicalization BEFORE any hash/dedup key over multilingual
    * text (composed vs decomposed accents are distinct bytes,
    * identical glyphs). `form` ∈ NFC/NFD/NFKC/NFKD. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.UnicodeNormalize(
        org.apache.spark.sql.graft.bridge.expression(text), form))

  /** Document fingerprint: md5 of the sorted distinct lowercased word
    * set (the key-collision/OpenRefine fingerprint — word order and
    * duplication invariant). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))))

  /** Portable 60-bit hash of a string: first 15 hex digits of md5.
    * Identical in any engine with md5 + hex→int conversion; used as the
    * base hash for minhash/simhash so oracles can reproduce signatures. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Codegen'd `transform(tokens(lower(text)), md5Hash60)` — the
    * per-doc hashed-token array of the n-gram LM family, hash-for-hash
    * identical to the Column composition but without the interpreted
    * per-element lambda (measured 2.0× the stage at sf1; see
    * [[graft.plans.HashedTokens]] for the exact-parity argument). */
  def hashedTokens(text: Column): Column = {
    import org.apache.spark.sql.graft.{bridge => ExpressionUtils}
    ExpressionUtils.column(graft.plans.HashedTokens(
      ExpressionUtils.expression(text)))
  }

  /** Driver-side twin of [[md5Hash60]] — bit-identical to the Column
    * form (first 15 hex digits of the md5 of the UTF-8 bytes, parsed
    * base 16), for the rare constant-sized structure computed once on
    * the driver and embedded as a literal (e.g. a consistent-hash
    * ring) rather than re-hashed per row. */
  def md5Hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
