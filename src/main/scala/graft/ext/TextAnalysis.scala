package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language-ID (stopword heuristic),
  * and document fingerprinting. All pure `Column` expressions built
  * from codegen'd builtins — no UDFs — so they stay inside
  * whole-stage codegen and scale linearly per-partition (no shuffle,
  * no state; at 100 TB these run map-side only).
  *
  * Counterpart of the reference's scalar-expression surface
  * (SURVEY.md §2.4) generalized to documents.
  */
object TextAnalysis {

  /** Whitespace-token count. */
  def tokenCount(c: Column): Column =
    size(split(trim(c), "\\s+")).cast("bigint")

  /** BPE-ish pre-tokenizer count (GPT-2-style boundary regex:
    * contraction suffixes, letter runs, digit runs, punctuation runs —
    * each optionally space-prefixed). Counts the segments a byte-pair
    * tokenizer would start from; ~proportional to LLM token counts,
    * deterministic, codegen'd.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+"

  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpePattern)).cast("bigint")

  /** Count of punctuation characters (fixed portable set). */
  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))).cast("bigint")

  /** Occurrences of a literal substring (replace-count trick: exact,
    * portable, codegen'd — no regex engine differences).
    */
  def occurrences(c: Column, word: String): Column =
    ((length(c) - length(call_function("replace", c, lit(word), lit(""))))
      / lit(word.length)).cast("bigint")

  /** Normalization fingerprint: md5 of whitespace-collapsed lowercase
    * text. Detects near-exact duplicates that differ only in casing /
    * whitespace. Deterministic and identical to DuckDB's md5().
    */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))

  /** Heuristic quality score in [0,1]:
    *   length factor  × punctuation sanity × stopword presence.
    * Deterministic double arithmetic (identical in the SQL oracle).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    // padded-lowercase probe frame, same as [[langId]]: on raw text
    // the space-delimited lowercase literals miss every capitalized or
    // line-initial stopword ("The cat… And then…" would score
    // stopHits=0 and halve a clean document's quality)
    // whitespace is NORMALIZED to plain spaces first (the tokenizer
    // splits on \s+, so "chat\net" holds a real "et" token that the
    // space-delimited probe would otherwise never see — a multi-line
    // document would undercount every line-adjacent stopword), then
    // spaces are DOUBLED so consecutive stopwords each get their own
    // delimiters: non-overlapping replace-count over " the the the "
    // sees only 2 matches (adjacent matches share a space); over
    // "  the  the  the  " it sees all 3
    val p = call_function("replace",
      concat(lit(" "), regexp_replace(lower(text), "\\s", " "), lit(" ")),
      lit(" "), lit("  "))
    val stopHits = (occurrences(p, " the ") + occurrences(p, " and ")
      + occurrences(p, " a ")).cast("double")
    val stopRatio = stopHits / greatest(nTok, lit(1.0))
    round(
      least(nTok, lit(200.0)) / lit(200.0)
        * (lit(1.0) - least(punctRatio * 5.0, lit(1.0)))
        * (lit(0.5) + lit(0.5) * least(stopRatio * 10.0, lit(1.0))),
      4)
  }

  /** ORDERED word n-gram sequence (winnowing needs positions, so no
    * dedup). Zip-of-shifted-slices form — no per-element re-evaluation
    * of outer expressions (see [[graft.ext.Dedup.shingleSeq]]).
    */
  def ngramSeq(t: Column, n: Int = 3): Column =
    graft.ext.Dedup.shingleSeq(t, n)

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every
    * n-gram, keep the minimum of each sliding window of `w` hashes,
    * dedupe. Guarantees any match of length ≥ n+w−1 tokens shares a
    * fingerprint, with ~1/w of the hashes kept — the standard
    * rolling-hash document fingerprint for plagiarism/near-dup at
    * scale. The window-min is a `least`-zip of `w` shifted slices of
    * the hash array — per-row O(w·|hashes|), with no per-element
    * re-evaluation of the (possibly inline) `hashes` expression.
    */
  def winnowFromHashes(hashes: Column, w: Int = 4): Column =
    graft.ext.Dedup.bound(hashes) { h =>
      val m = size(h) - (w - 1) // number of complete windows
      val shifted = (0 until w).map(i => slice(h, lit(i + 1), m))
      val winMins = shifted.reduceLeft((a, b) => zip_with(a, b, (x, y) => least(x, y)))
      when(size(h) >= w, array_distinct(winMins))
        .otherwise(when(size(h) > 0, array(array_min(h)))
          .otherwise(array().cast("array<bigint>")))
    }

  /** Rule-based document filter for training-data curation: composes
    * the analysis columns into a keep/drop decision plus the FIRST
    * failing rule as a reason (deterministic precedence, so drop
    * reasons are stable for pipeline debugging). All codegen'd column
    * arithmetic — at 100 TB this is a map-side pass over the corpus.
    */
  def qualityFilter(text: Column,
      minTokens: Int = 5, maxTokens: Int = 100000,
      maxPunctRatio: Double = 0.2): Column = {
    val nTok = tokenCount(text)
    val punctRatio = punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    // NULL text is an explicit drop, not a fall-through: every rule
    // below evaluates to NULL on NULL input, so without this branch a
    // NULL-text row would reach `otherwise` and be classified "keep" —
    // and then silently vanish downstream (the chunker emits no rows
    // for it while group-replacement merges still delete its prior
    // state; see StreamingCuration's store invariant)
    when(text.isNull, lit("null_text"))
      .when(nTok < minTokens, lit("too_short"))
      .when(nTok > maxTokens, lit("too_long"))
      .when(punctRatio > maxPunctRatio, lit("punct_soup"))
      .otherwise(lit("keep"))
  }

  /** Within-document repetition ratio (the Gopher/CCNet-style quality
    * signal): fraction of word n-grams that are duplicates of an
    * earlier one — 1 − |distinct n-grams| / |n-grams|. Boilerplate,
    * keyword-stuffed, and looping documents score high. Map-side
    * column arithmetic over [[graft.ext.Dedup.shingleSeq]]; 0.0 for
    * documents shorter than n tokens.
    */
  def repetitionRatio(t: Column, n: Int = 5): Column =
    graft.ext.Dedup.bound(graft.ext.Dedup.shingleSeq(t, n)) { g =>
      when(size(g) > 0,
        round(lit(1.0) -
          size(array_distinct(g)).cast("double") / size(g).cast("double"), 6))
        .otherwise(lit(0.0))
    }

  /** PII scrubbing for training corpora: emails → `<EMAIL>`, URLs →
    * `<URL>`, long digit runs (phone/account numbers) → `<NUM>`.
    * Fixed precedence (emails first — a URL pattern could otherwise
    * eat `user@host` text), portable regexes (no lookarounds, so Java
    * and RE2 dialects agree), codegen'd map-side pass.
    */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "[0-9]{9,}", "<NUM>")
  }

  /** Stopword/char-class language heuristic over {en,fr,es,de,zh}.
    * Precedence chain is deterministic: CJK chars win, then the
    * highest stopword hit count in fixed order fr → es → de → en.
    */
  def langId(text: Column): Column = {
    // whitespace normalized then spaces doubled: newline/tab-adjacent
    // stopwords match and each occurrence owns its delimiters, so
    // consecutive repeats all count (see [[qualityScore]])
    val padded = call_function("replace",
      concat(lit(" "), regexp_replace(lower(text), "\\s", " "), lit(" ")),
      lit(" "), lit("  "))
    val en = occurrences(padded, " the ") + occurrences(padded, " and ")
    val fr = occurrences(padded, " le ") + occurrences(padded, " la ") +
      occurrences(padded, " et ")
    val es = occurrences(padded, " el ") + occurrences(padded, " los ") +
      occurrences(padded, " y ")
    val de = occurrences(padded, " der ") + occurrences(padded, " und ") +
      occurrences(padded, " die ")
    val hasCjk = length(regexp_replace(text, "[\\u4e00-\\u9fff]", "")) < length(text)
    when(hasCjk, lit("zh"))
      .when(fr > en && fr >= es && fr >= de, lit("fr"))
      .when(es > en && es >= de, lit("es"))
      .when(de > en, lit("de"))
      .otherwise(lit("en"))
  }
}
