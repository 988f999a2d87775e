package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines (beyond
 * the reference surface, per the project north star): tokenization, quality
 * stats, stopword/marker scoring, language-ID heuristic, fingerprinting,
 * shingling.
 *
 * Everything is a pure Column tree over built-ins (split/transform/filter/
 * aggregate lambdas, md5) — codegen-friendly, no UDFs, no driver-side state;
 * at 100 TB these are embarrassingly parallel map operators.
 */
object TextFunctions {

  /** ASCII whitespace, spelled as an explicit class: Java's `\s` includes
    * vertical tab (\x0B) but RE2's (the DuckDB oracle's engine) does not —
    * an explicit class is the only spelling both engines read identically. */
  private[llm] val Ws = " \\t\\n\\x0B\\f\\r"

  /** Whitespace tokens of a document. */
  def tokens(text: Column): Column = split(trim(text), s"[$Ws]+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Total characters across tokens (i.e. non-whitespace characters). */
  def tokenChars(text: Column): Column =
    aggregate(transform(tokens(text), t => length(t).cast("long")), lit(0L), _ + _)

  /** How many tokens fall in `words` (stopword/marker counting). */
  def markerCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*))).cast("long")

  /** Exact-integer (1e6-scaled) type-token ratio: distinct/total tokens. */
  def typeTokenRatioMicro(text: Column): Column =
    round(distinctTokenCount(text).cast("double") / tokenCount(text) * 1000000).cast("long")

  /** Exact-integer (1e6-scaled) mean token length. */
  def meanTokenLenMicro(text: Column): Column =
    round(tokenChars(text).cast("double") / tokenCount(text) * 1000000).cast("long")

  /**
   * GPT-2-style pre-tokenizer units (the BPE-ish token count the brief for
   * model-facing pipelines needs — whitespace words under-count punctuation
   * and digit runs badly). RE2-safe subset: optionally-space-prefixed
   * letter runs, digit runs, punctuation runs — no lookahead and no `\s`
   * shorthand (see [[Ws]]), so the same pattern text runs in Java regex
   * (Spark) and RE2 (DuckDB oracle) identically.
   */
  val BpeTokenPattern = s" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9$Ws]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(trim(text), lit(BpeTokenPattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  /** Content fingerprint: md5 of the normalized (lower/trim) document. */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** Normalization regexes, shared verbatim with the oracle (RE2-safe:
    * explicit classes only — see [[Ws]]). Drop is applied AFTER lowercasing. */
  val NormDropPattern = s"[^a-z0-9$Ws]"
  val NormSpacePattern = s"[$Ws]+"

  /**
   * Canonical text normalization for dedup/matching keys: lowercase, strip
   * everything outside [a-z0-9 whitespace], collapse whitespace runs to a
   * single space, trim. Deliberately aggressive (non-Latin scripts are
   * dropped entirely) — this is a MATCHING key, not a display form; pair it
   * with language routing upstream. Pure codegen'd Column tree, no shuffle.
   */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), NormDropPattern, ""),
      NormSpacePattern, " "))

  /**
   * Rabin-style polynomial rolling fingerprint: a strict left fold
   * `h := (h*257 + codepoint) mod (2^31-1)` over the document's characters.
   * Sequential fold order is part of the contract (bit-identical across
   * engines); linear per document and embarrassingly parallel across them.
   * [[fingerprint]] (md5, codegen'd) is the fast path; this is the classic
   * incremental-hash building block for winnowing/content-defined chunking.
   *
   * Contract bound: BMP text only. For astral characters (emoji), Spark's
   * `ascii()` surfaces the UTF-16 high surrogate while DuckDB's `ord()`
   * surfaces the full code point, so the folds diverge — normalize or strip
   * non-BMP content first (the test corpus is pure ASCII).
   */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(trim(text), ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => pmod(h * lit(257L) + c, lit(2147483647L)))

  /** 1e6-scaled ratio of punctuation characters to total characters. */
  def punctRatioMicro(text: Column): Column = {
    val t = trim(text)
    val punct = length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))
    round(punct.cast("double") / length(t) * 1000000).cast("long")
  }

  /** 1e6-scaled stopword ratio over the given marker set. */
  def stopwordRatioMicro(text: Column, words: Seq[String]): Column =
    round(markerCount(text, words).cast("double") / tokenCount(text) * 1000000).cast("long")

  /**
   * Rule-based quality gate for training-data filtering — the classic
   * cheap pre-filter (Gopher/C4-style): length band, mean-token-length
   * band, lexical diversity floor, stopword-presence floor. Every signal
   * is an exact integer, so the verdict reproduces anywhere.
   */
  def qualityFlag(text: Column,
                  minTokens: Long = 10, maxTokens: Long = 100000,
                  minMeanTokenLenMicro: Long = 2000000,
                  maxMeanTokenLenMicro: Long = 12000000,
                  minTtrMicro: Long = 100000,
                  minStopMicro: Long = 10000): Column = {
    val stop = stopwordRatioMicro(text, LangMarkers.flatMap(_._2))
    tokenCount(text).between(minTokens, maxTokens) &&
      meanTokenLenMicro(text).between(minMeanTokenLenMicro, maxMeanTokenLenMicro) &&
      typeTokenRatioMicro(text) >= minTtrMicro &&
      stop >= minStopMicro
  }

  /** Word n-gram shingles, space-joined (the near-dup dedup unit). */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Fraction (micro-scaled) of repeated word n-gram INSTANCES:
    * `1 − distinct/total` over the document's own n-gram multiset — the
    * Gopher-style within-document repetition signal (boilerplate, keyword
    * stuffing, degenerate generations). Docs shorter than n tokens collapse
    * to one whole-doc shingle → ratio 0. */
  def dupShingleRatioMicro(text: Column, n: Int): Column =
    dupShingleRatioFromTokens(tokens(text), n)

  /** [[dupShingleRatioMicro]] over an already-materialized token array —
    * prefer behind an exchange (see [[shinglesFromTokens]]'s HOF note). */
  def dupShingleRatioFromTokens(w: Column, n: Int): Column = {
    val sh = shinglesFromTokens(w, n)
    round((lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)) * 1000000)
      .cast("long")
  }

  /**
   * N-gram shingles from an ALREADY-MATERIALIZED token-array column.
   *
   * Prefer this over [[wordShingles]] when the tokens column sits behind an
   * exchange/aggregation boundary: higher-order functions are interpreted
   * (no codegen), so a `split` nested inside the lambda would re-run once
   * per element access — O(tokens²) per row. On a materialized array the
   * element accesses are O(1).
   */
  def shinglesFromTokens(w: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    val count = size(w) - (n - 1)
    when(count <= 0, array(concat_ws(" ", w))) // short doc: one shingle = all tokens
      .otherwise(transform(sequence(lit(1), count), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
  }

  /** Character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    // native one-pass shingler (r17): the HOF form
    // `transform(sequence(1, len-(n-1)), i => trim(t).substr(i, n))`
    // re-evaluated trim() per element and paid substr's from-the-start
    // char scan per shingle — O(len²) per document, measured as the whole
    // cost of q_text_jaccard's shingle job. Bit-equal (spec-locked).
    graft.functions.CharShinglesExpr(text, n)
  }

  /**
   * Marker-word language-ID heuristic: score each candidate language by its
   * function-word hits; highest score wins, earlier language wins ties.
   * Cheap, deterministic, fully distributed — the classic fastText/cld fall-
   * back for pipelines that cannot afford a model pass per document.
   */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) => lang -> markerCount(text, words) }

  // -- PII scrubbing (C4-style pre-release redaction) ------------------------

  /** RE2-safe patterns (no lookaround, no Java-only classes) — the SAME
    * regex text runs in Spark (Java regex) and DuckDB (RE2), which agree on
    * every construct used here. Deliberately high-recall/simple: redaction
    * is a pre-release safety net, not an extraction task. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d{1,2}[- ]\\d{3}[- ]\\d{3}[- ]\\d{4}|\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Count of pattern occurrences in the ORIGINAL text (counts are
    * independent per category; redaction order does not affect them). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)),
    "n_ips" -> regexp_count(text, lit(Ipv4Re)),
    "n_phones" -> regexp_count(text, lit(PhoneRe)))

  /** Redact emails → `<EMAIL>`, IPv4s → `<IP>`, phone numbers → `<PHONE>`,
    * applied IN THAT ORDER (fixed order keeps the output deterministic when
    * categories could overlap textually). Pure codegen'd Column tree. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Winning language (ties → first in [[LangMarkers]] order); "und"
    * (undetermined) when no marker hits at all. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
