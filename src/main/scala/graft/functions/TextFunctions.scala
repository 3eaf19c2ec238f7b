package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for a training-data pipeline, composed from
 * `org.apache.spark.sql.functions` plus the engine's own codegen'd
 * Catalyst kernels (ArrayKernels.scala) so every operator stays inside
 * whole-stage codegen — no UDFs, no JVM⇄interpreter boundaries (the exact
 * failure mode of the reference's per-record Python lambda, SURVEY §3.1).
 * The shingle family in particular is kernel-backed: the builtin
 * `transform`-HOF forms are CodegenFallbacks re-entering the interpreter
 * once per SHINGLE, which made corpus shingling the engine's widest
 * interpreted hot spot (it feeds the whole dedup/contamination family).
 *
 * ANSI-mode note (Spark 4 default): all hash arithmetic here is built from
 * 32-bit `hash()` values widened to long before multiply/add, so no
 * expression can overflow and throw.
 */
object TextFunctions {

  /** Whitespace tokens, empty-safe: `""` and all-blank → empty array.
    * `array_remove(_, "")` rather than a `filter` HOF (interpreted):
    * `\s+`-split can only produce empty strings at the array edges
    * (empty input, or non-space leading whitespace that `trim` — which
    * strips 0x20 only — leaves behind), so removing `""` keeps exactly
    * the `filter(length > 0)` result while staying codegen'd. */
  def tokens(text: Column): Column =
    array_remove(split(trim(text), "\\s+"), "")

  /** Token count without materializing the token array. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish subword count: word-pieces + digits + punctuation as separate
   * tokens — a cheap deterministic proxy for a real tokenizer's token
   * count (≈ GPT-style regex pre-tokenization).
   */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /**
   * PERFORMANCE RULE for the shingle family: prefer the `*From*`
   * variants fed a *materialized column* (stage `tokens`/`normText` in
   * a prior projection) so the tokenization isn't re-derived under
   * every expression that references the shingles. The historical
   * per-ELEMENT hazard — HOF lambdas re-computing captured expressions
   * once per shingle — is gone now that the family is kernel-backed,
   * but per-REFERENCE re-computation of an unmaterialized input is
   * still real (CollapseProject duplicates cheap-looking inputs).
   */

  /** Word n-gram shingles from a materialized token-array column
    * (codegen'd kernel; spec-asserted ≡ the HOF form element for
    * element). */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    GraftFunctions.graftWordShingles(ts, n)

  /** Word n-gram shingles (n ≥ 1), joined with single spaces. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Lowercased, whitespace-normalized text (stage before charShingles). */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Character n-gram shingles from a materialized normalized column
    * (codegen'd codepoint-addressed kernel; spec-asserted ≡ the
    * `substring`-HOF form, astral-plane cases included). */
  def charShinglesFromNorm(norm: Column, n: Int): Column =
    GraftFunctions.graftCharShingles(norm, n)

  /** Character n-gram shingles over the lowercased, space-normalized text. */
  def charShingles(text: Column, n: Int): Column =
    charShinglesFromNorm(normText(text), n)

  /**
   * Document fingerprint: min-of-shingle-hashes (winnowing-style). Two
   * documents sharing their rarest shingle collide — a cheap 1-long
   * near-dup signal; the full MinHash signature lives in [[graft.operators.Dedup]].
   */
  def fingerprint(text: Column, n: Int = 3): Column = {
    val hs = transform(shingles(text, n), s => xxhash64(s))
    when(size(hs) === 0, xxhash64(trim(text))).otherwise(array_min(hs))
  }

  /** Fingerprint from materialized token-array + raw-text columns (the
    * at-scale form; see the performance rule above). Measured at sf0.1:
    * this doc-local HOF form beats the explode+min-agg form 2× (2.0s vs
    * 3.9s) — one hash per shingle means the agg's shuffle dominates,
    * the opposite tradeoff to MinHash's 64-hashes-per-shingle. */
  def fingerprintFromTokens(ts: Column, text: Column, n: Int = 3): Column = {
    val hs = transform(shinglesFromTokens(ts, n), s => xxhash64(s))
    when(size(hs) === 0, xxhash64(trim(text))).otherwise(array_min(hs))
  }

  /** [[fingerprintFromTokens]] with the portable md5-derived hash, so the
    * driver's DuckDB oracle can recompute the identical fingerprint
    * (same shingles, same 60-bit hash, same min). Semantics otherwise
    * identical; use the xxhash64 form when no cross-engine replay is
    * needed (md5 costs ~3× murmur). */
  def fingerprintPortableFromTokens(ts: Column, text: Column, n: Int = 3): Column = {
    val hs = transform(shinglesFromTokens(ts, n), s => PortableHash.h60(s))
    when(size(hs) === 0, PortableHash.h60(trim(text))).otherwise(array_min(hs))
  }

  /**
   * Quality signals (ratios rounded to 4 decimals for oracle stability):
   * character/token counts, punctuation and digit and uppercase density,
   * mean token length. All single-pass over the string.
   */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0)))

  def digitRatio(text: Column): Column =
    round(size(regexp_extract_all(text, lit("[0-9]"), lit(0))) /
      greatest(length(text), lit(1)).cast("double"), 4)

  def upperRatio(text: Column): Column =
    round(size(regexp_extract_all(text, lit("[A-Z]"), lit(0))) /
      greatest(length(text), lit(1)).cast("double"), 4)

  /** Mean token length. Σ token lengths is computed as
    * `length(concat_ws("", ts))` — codepoint count of the separator-
    * free concatenation, exactly the `aggregate(ts, 0, acc + length(t))`
    * fold it replaces (that HOF re-entered the interpreter per token). */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    round(
      length(concat_ws("", ts)).cast("long") /
        greatest(size(ts), lit(1)).cast("double"), 4)
  }

  /**
   * Shannon entropy of the character distribution (bits/char) — the
   * classic gibberish/boilerplate signal (~4.1 for English prose, ≪ for
   * repeated padding, ≫ for random bytes). Exact frequencies via
   * entropy = log2(n) − (Σ cnt·log2 cnt)/n, folded over the SORTED
   * distinct characters so the float accumulation order is deterministic
   * and oracle-mirrorable. Kernel-backed ([[expressions.CharDistEntropy]];
   * the HOF composition re-scanned the array interpreted once per
   * distinct character — O(distinct × len) per row). For corpus-scale
   * per-doc entropy prefer the explode + groupBy path (SparkEntry's
   * charEntropyPerDoc) which shares counting across the shuffle.
   */
  def charEntropyFromChars(cs: Column): Column =
    round(GraftFunctions.graftCharEntropy(cs), 4)

  /** Convenience form (tests / small inputs). */
  def charEntropy(text: Column): Column =
    charEntropyFromChars(split(text, ""))

  /** Stopword density: hits on the English function-word list per token
    * — the classic boilerplate/gibberish discriminator (near 0 for code
    * or keyword-stuffed spam, ~0.3-0.5 for running prose). */
  def stopwordRatio(text: Column): Column =
    round(stopwordHits(text, englishStopwords) /
      greatest(tokenCount(text), lit(1)).cast("double"), 4)

  /** Scrub URLs and email addresses (training-data hygiene). Patterns
    * are valid and identical in Java regex and RE2 (no backreferences,
    * no lookaround) so the oracle can mirror them. */
  def scrubUrlsEmails(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "https?://\\S+", ""),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "")

  /** Stopword-hit count for a language's function words (langid
    * signal). Words are regex-QUOTED: a caller-supplied word carrying
    * regex syntax ("c++", "(x)") would otherwise compile to a
    * different pattern — or fail to compile mid-job. (\Q…\E is valid
    * and identical in Java regex and RE2, so oracles can mirror it.) */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + words.map(java.util.regex.Pattern.quote).mkString("|") +
        ")\\b"), lit(0)))

  /**
   * N-gram/function-word language ID over the langs the heuristic knows;
   * ties broken by fixed priority order (en first). Returns the language
   * code with the most stopword hits, or "und" when none hit.
   */
  /** Bound by key, not position — [[stopwordRatio]]'s oracle hardcodes
    * this list; reordering langStopwords must not change it. */
  lazy val englishStopwords: Seq[String] =
    langStopwords.collectFirst { case ("en", ws) => ws }.get

  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "para", "con", "por", "del"),
    "it" -> Seq("il", "la", "che", "di", "non", "una", "per", "sono", "con", "del")
  )

  def langId(text: Column): Column = {
    val scored = langStopwords.map { case (code, words) =>
      (code, stopwordHits(text, words))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // fixed priority: first language reaching the max wins
    val pick = scored.reverse.foldLeft(lit("und")) { case (acc, (code, hits)) =>
      when(hits > 0 && hits === best, lit(code)).otherwise(acc)
    }
    pick
  }
}
