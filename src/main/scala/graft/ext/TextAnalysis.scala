package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting. All are
  * pure column expressions (whole-stage codegen, no UDFs, no shuffles) —
  * they scale embarrassingly with partitions at 100 TB.
  */
object TextAnalysis {

  /** Whitespace token count; 0 for blank/empty text. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Count of tokens (split on single spaces) in `words`. Native
    * expression — the composed `size(filter(split(...)))` form runs its
    * lambda interpreted per token, and x2/x3/x4 evaluate it up to 8× per
    * row (see [[graft.functions.StopwordCount]]). */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    graft.functions.StopwordCount.stopword_count(text, words)

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  /** Composite quality score in [0, 100]: stopword density (50), length
    * band (30), punctuation presence (20). Integer-ratio arithmetic only
    * (bit-stable across engines). */
  def qualityScore(nChars: Column, nWs: Column, nStop: Column, nPunct: Column): Column =
    when(nWs === 0, 0.0).otherwise(
      least(lit(50.0), nStop.cast("double") / nWs.cast("double") * 100.0 * 2.5) +
        when(nChars.between(100, 2000), 30.0).otherwise(0.0) +
        when(nPunct > 0, 20.0).otherwise(0.0))

  /** Count of maximal `[aeiou]+` runs in the lowered text — the cheap
    * syllable proxy. Counted portably as length(runs→"~") −
    * length(runs→"") (each run contributes exactly one char to the
    * first and zero to the second), so any regexp engine without a
    * count-matches primitive reproduces it bit-identically. */
  def vowelRuns(text: Column): Column =
    (length(regexp_replace(lower(text), "[aeiou]+", "~")) -
      length(regexp_replace(lower(text), "[aeiou]+", ""))).cast("long")

  /** Words with no vowel at all ("123", "xyz", bare punctuation) — the
    * +1-syllable floor the per-text run count can't see. One
    * higher-order filter per row; acceptable off the hot path (the x2
    * token counters that run 8× per row are native expressions). */
  def vowellessWords(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L)).otherwise(
      size(filter(split(trim(lower(text)), "\\s+"),
        w => !w.rlike("[aeiou]"))).cast("long"))

  /** Per-document Flesch-reading-ease proxy in exact e3 fixed point:
    * `fre_e3 = 206835 − 1015·w DIV s − 84600·syl DIV w` with
    * w = whitespace words, s = terminal-mark count ([.!?], floor 1),
    * syl = vowel runs + vowel-less-word floor. The classic
    * 206.835 − 1.015(w/s) − 84.6(syl/w) with every coefficient scaled
    * ×1000 and every division integer-truncated IDENTICALLY in the
    * oracle — the readability gate stays hash-provable instead of
    * float-fuzzy. Empty docs (w = 0) are excluded, documented.
    *
    * 100 TB posture: pure scan-side column math, zero exchanges —
    * embarrassingly parallel like the rest of this module. `passthrough`
    * carries rollup keys (e.g. source) through the projection so the
    * caller never joins the corpus back to itself for them.
    * Output: (doc_id, n_words, n_sentences, n_syllables, passthrough…,
    * fre_e3). */
  def readability(docs: DataFrame, id: Column, text: Column,
      passthrough: Seq[String] = Nil): DataFrame =
    docs.select(
        (id.as("doc_id") +: text.as("__text__") +: passthrough.map(col)): _*)
      .select(
        (col("doc_id") +:
          wsTokenCount(col("__text__")).cast("long").as("n_words") +:
          greatest(lit(1L), size(regexp_extract_all(col("__text__"),
            lit("[.!?]"), lit(0))).cast("long")).as("n_sentences") +:
          (vowelRuns(col("__text__")) +
            vowellessWords(col("__text__"))).as("n_syllables") +:
          passthrough.map(col)): _*)
      .where(col("n_words") > 0)
      .withColumn("fre_e3",
        expr("206835 - 1015 * n_words DIV n_sentences " +
          "- 84600 * n_syllables DIV n_words"))

  /** Stopword lists per language for the heuristic language ID. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Heuristic language ID: CJK characters → zh, else argmax of per-lang
    * stopword hits (ties resolved in list order en > es > de > fr). */
  def langId(text: Column): Column = {
    val scores = langStopwords.map { case (l, ws) => l -> stopwordCount(text, ws) }
    val Seq(en, es, de, fr) = scores.map(_._2)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Stable content fingerprint: md5 of lowercased, trimmed text. */
  def fingerprintMd5(text: Column): Column = md5(lower(trim(text)))

  /** Canonical text form for dedup: lowercase, trim, collapse internal
    * whitespace runs to single spaces — the standard normalization in
    * front of exact/near dedup so formatting noise doesn't defeat the
    * content hash. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Sentence count via terminal-punctuation runs (`.!?`). */
  def sentenceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.!?]+"), lit(0)))

  // ---- PII redaction ----

  /** Portable (Java regex ∩ RE2) patterns so the redaction is
    * reproducible in the oracle engine. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern = "[0-9]{6,}"

  /** Scrub emails then long digit runs (ids, phones, account numbers) —
    * the standard pre-training privacy pass. Emails go first: the email
    * pattern can span digits that the number pattern would otherwise
    * split. Pure codegen regexp_replace — zero shuffle at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<ID>")

  /** Occurrences of `pattern` in `text` (for redaction audit counts). */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  // ---- repetition / duplication quality signals (Gopher-style) ----

  /** Fraction of repeated words: `1 - distinct/total` (0 for blank). */
  def dupWordRatio(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    val n = size(words)
    when(length(trim(text)) === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(words)).cast("double") / n.cast("double"))
  }

  /** Fraction of repeated word bigrams: `1 - distinct/total`; 0 when the
    * doc has fewer than 2 words. High values flag boilerplate/spam that
    * per-word stats miss (WordShingles dedups, so its size IS the
    * distinct count). */
  def dupBigramRatio(text: Column): Column = {
    val n = wsTokenCount(text)
    when(n < 2, 0.0).otherwise(
      lit(1.0) -
        size(graft.ext.Dedup.shingles(text, 2)).cast("double") /
          (n - 1).cast("double"))
  }

  // ---- C4/Gopher-style document filter signals ----

  /** Mean word length: non-whitespace chars / whitespace tokens (0 for
    * blank). Integer/integer, one IEEE division — oracle-exact. */
  def meanWordLen(text: Column): Column = {
    val n = wsTokenCount(text)
    when(n === 0, 0.0).otherwise(
      length(regexp_replace(text, "\\s", "")).cast("double") / n.cast("double"))
  }

  /** Lines of `text` (split on \n). */
  def lines(text: Column): Column = split(text, "\n")

  /** Lines whose last non-blank char is terminal punctuation (C4 keeps
    * sentence-like lines). */
  def terminalLineCount(text: Column): Column =
    size(filter(lines(text), l => substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"")))

  /** Lines that look like list bullets. */
  def bulletLineCount(text: Column): Column =
    size(filter(lines(text), l => {
      val t = ltrim(l)
      t.startsWith("-") || t.startsWith("*") || t.startsWith("•")
    }))

  /** Composite C4/Gopher keep decision from the individual signals.
    * Thresholds are the published ones (C4: mean word length in [3,10],
    * "lorem ipsum" ban; Gopher: word-count floor, bullet-ratio cap).
    * The comparisons are pure integer arithmetic (`bullets*10 <= lines*9`
    * instead of a float ratio) so the decision is bit-exact on any
    * engine. */
  def c4Keep(nWords: Column, meanLen: Column, hasLorem: Column,
      bullets: Column, nLines: Column): Column =
    (nWords >= 5 && meanLen >= 3.0 && meanLen <= 10.0 &&
      !hasLorem && bullets * 10 <= nLines * 9).cast("int")

  /** Corpus-contrast keywords: the words most characteristic of the
    * `inGroupA` slice vs the rest — Monroe et al. 2008's "Fightin'
    * Words" log-odds with the family's rational treatment: the additive
    * prior survives as add-one smoothing, the corpus-constant group-size
    * factor is dropped (monotone for ranking), and the monotone log is
    * removed, leaving the integer score `⌊scale·(ca+1)/(cb+1)⌋` —
    * engine-exact, no IEEE transcendental (x41/x67/x78's rule).
    *
    * `minTotal` floors `ca+cb`: a hapax seen once in A and never in B
    * posts 2·scale/1 on pure noise — the same noise-floor rationale as
    * [[Vocab.bigramPmi]]'s `minCount`.
    *
    * Overflow envelope: `(ca+1)·scale ≤ 2^63` → per-word occurrences
    * ≤ ~9.2e10 at the default scale; shrink `scale` beyond that.
    *
    * 100 TB posture: tokens explode scan-side with the group flag
    * computed in the same projection; ONE combinable aggregation
    * (conditional sums per word) is the only corpus-scale exchange, and
    * the top-k is a TakeOrderedAndProject, never a global sort. */
  /** Per-document SIMPSON lexical diversity: the probability that two
    * uniformly drawn token positions hold DIFFERENT words,
    * `1 − Σ(c_i/n)²` — the diversity complement of the repetition
    * ratios ([[dupWordRatio]] flags verbatim re-runs; Simpson scores
    * the whole distribution, so a doc cycling three words forever
    * scores low where dup-ratio alone can look moderate). Computed as
    * the integer `(n² − Σc_i²)·scale div n²` — exact on any engine,
    * no IEEE division.
    *
    * Overflow envelope: `n²·scale ≤ 2^63` → per-DOC length ≤ ~30M
    * tokens at the default scale=10,000 — a per-document bound (not a
    * corpus bound), far above any real document.
    *
    * 100 TB posture: two combinable aggregations (per-doc word counts,
    * then per-doc moments) — a word count's plan, scan-side tokenize,
    * no joins. Output: (doc_id, n_tokens, n_distinct, simpson_div). */
  def simpsonDiversity(docs: DataFrame, id: Column, text: Column,
      scale: Long = 10000L): DataFrame = {
    require(scale >= 1, s"scale must be positive, got $scale")
    docs.where(trim(text) =!= "")
      .select(id.as("doc_id"), explode(split(trim(text), "\\s+")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("c")).as("sumsq"))
      .withColumn("simpson_div",
        expr(s"(n_tokens * n_tokens - sumsq) * ${scale}L DIV (n_tokens * n_tokens)"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("simpson_div"))
  }

  def contrastKeywords(docs: DataFrame, text: Column, inGroupA: Column,
      k: Int, minTotal: Long = 5L, scale: Long = 100000000L): DataFrame = {
    require(k > 0 && minTotal >= 1 && scale >= 1)
    docs.select(split(trim(text), "\\s+").as("t"),
        inGroupA.cast("boolean").as("in_a"))
      .select(explode(col("t")).as("w"), col("in_a"))
      .groupBy(col("w"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("cb"))
      .where(col("ca") + col("cb") >= minTotal)
      .withColumn("odds_a", expr(s"((ca + 1L) * ${scale}L) DIV (cb + 1L)"))
      .select(col("w"), col("ca"), col("cb"), col("odds_a"))
      .orderBy(col("odds_a").desc, col("w"))
      .limit(k)
  }

  /** Per-stratum vocabulary statistics: token count, TYPE count
    * (distinct tokens), hapax count (types seen exactly once in the
    * stratum), type-token ratio and hapax share (×1e6, floor) — the
    * vocabulary-richness / boilerplate-contamination screen (a scraped
    * corpus whose hapax share collapses is template spam; one whose TTR
    * explodes is OCR noise). Tokens are `[a-z0-9]+` runs of the
    * lowercased text — the regex both engines implement identically.
    *
    * 100 TB posture: tokens explode scan-side, then ONE combinable
    * (stratum, token) groupBy — key space is the vocabulary, not the
    * corpus — and a vocabulary-sized rollup per stratum. No windows, no
    * joins. Output: (stratum, n_tokens, n_types, n_hapax, ttr_e6,
    * hapax_share_e6). */
  def vocabStats(docs: DataFrame, stratum: Column, text: Column): DataFrame =
    docs.select(stratum.as("stratum"),
        explode(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy("stratum", "w").agg(count(lit(1)).as("c"))
      .groupBy("stratum").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("stratum"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("n_types * 1000000L DIV n_tokens").as("ttr_e6"),
        expr("n_hapax * 1000000L DIV n_types").as("hapax_share_e6"))

  /** Tokenizer fertility per language: chars-per-BPE-token and
    * bytes-per-char ratios — the two numbers that decide whether a
    * tokenizer (here the [[BpeTokenPattern]] proxy) is fair to a
    * language before a mixture ships. High chars/token means the
    * language fragments into more tokens per unit text (it pays more
    * compute per sentence); bytes/char ≫ 1e6 flags non-Latin scripts
    * whose BYTE budgets (not char budgets) dominate storage. Ratios in
    * exact ppm with DECIMAL(38) numerators (char totals × 1e6 pass 2^63
    * at the design point); NULL when a denominator is empty.
    *
    * 100 TB posture: all five counters are scan-side column arithmetic
    * folded by ONE combinable groupBy(lang) — no explode (unlike
    * [[vocabStats]], nothing needs the token STREAM, only counts), no
    * join, no window. Output: (lang, n_docs, n_chars, n_bytes, n_ws,
    * n_bpe, chars_per_bpe_ppm, bytes_per_char_ppm). */
  def tokenizerFertility(docs: DataFrame, lang: Column, text: Column)
      : DataFrame =
    docs.select(lang.as("lang"),
        length(text).cast("long").as("nc"),
        octet_length(text).cast("long").as("nb"),
        wsTokenCount(text).cast("long").as("nw"),
        bpeTokenCount(text).cast("long").as("np"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        sum(col("nb")).as("n_bytes"), sum(col("nw")).as("n_ws"),
        sum(col("np")).as("n_bpe"))
      .withColumn("chars_per_bpe_ppm",
        when(col("n_bpe") > 0,
          expr("CAST(CAST(n_chars AS DECIMAL(38,0)) * 1000000 DIV n_bpe AS BIGINT)"))
          .otherwise(lit(null).cast("long")))
      .withColumn("bytes_per_char_ppm",
        when(col("n_chars") > 0,
          expr("CAST(CAST(n_bytes AS DECIMAL(38,0)) * 1000000 DIV n_chars AS BIGINT)"))
          .otherwise(lit(null).cast("long")))

  /** Cohen's κ agreement between two raters over the same rows — the
    * chance-corrected score behind "is the heuristic labeler actually
    * agreeing with the annotation, or just guessing the majority
    * class?" (x104's confusion matrix shows WHERE they disagree; κ says
    * whether the agreement beats chance at all). Fully rational:
    * κ = (N·Σdiag − Σᵢ rᵢ·cᵢ) / (N² − Σᵢ rᵢ·cᵢ) with row/column
    * marginals r/c, so one truncating DIV yields an exact kappa_e6 —
    * hash-provable, no floats. po/pe ship as independent exact ppm
    * floors. A degenerate table (pe = 1: both raters constant and
    * equal) reads NULL.
    *
    * 100 TB posture: ONE combinable cell rollup (|A-classes| ×
    * |B-classes| rows — for label vocabularies, dozens), then marginals
    * and the κ algebra on the broadcast cell table; the corpus never
    * shuffles anything wider than (a, b) pairs. DECIMAL(38) envelope:
    * N² at 10¹³ rows is 10²⁶ < 10³⁸.
    * Output: one row (n, n_agree, po_ppm, pe_ppm, kappa_e6). */
  def kappaAgreement(df: DataFrame, raterA: Column, raterB: Column)
      : DataFrame = {
    val cells = df.select(raterA.cast("string").as("a"),
        raterB.cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // cell-scale; feeds three aggregates
    val rm = cells.groupBy("a").agg(sum(col("c")).as("r"))
    val cm = cells.groupBy("b").agg(sum(col("c")).as("cc"))
    val prods = rm.join(cm, col("a") === col("b"))
      .agg(sum(expr("CAST(r AS DECIMAL(38,0)) * cc")).as("sum_rc"))
    val diag = cells.agg(
      sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("n_agree"))
    diag.crossJoin(broadcast(prods))
      .select(col("n"), col("n_agree"),
        expr("CAST(CAST(n_agree AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)")
          .as("po_ppm"),
        expr("CAST(coalesce(sum_rc, 0) * 1000000 DIV " +
          "(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("pe_ppm"),
        expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * n - coalesce(sum_rc, 0) <> 0 " +
          "THEN CAST((CAST(n AS DECIMAL(38,0)) * n_agree - coalesce(sum_rc, 0)) " +
          "* 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n - coalesce(sum_rc, 0)) " +
          "AS BIGINT) ELSE NULL END").as("kappa_e6"))
  }

  /** McNemar's test on two PAIRED binary keep-filters — "do the length
    * gate and the stopword gate disagree symmetrically, or does one
    * systematically keep what the other drops?" Only the discordant
    * counts matter: b = A-keep∧B-drop, c = A-drop∧B-keep; the
    * continuity-corrected statistic (|b−c|−1)²/(b+c) is rational → one
    * exact truncating DIV (mcnemar_ppm), NULL when b+c = 0 (no
    * disagreement — the test is undefined, not significant).
    * `significant` flags the χ²₁ 95% line (3.841459e6 ppm), the same
    * threshold constant as x212/x218.
    *
    * 100 TB posture: the whole test is ONE combinable 4-cell rollup
    * (two boolean columns folded scan-side); nothing but four counters
    * ever leaves the scan. Output: one row
    * (n, n_both, n_neither, b, c, mcnemar_ppm, significant). */
  def mcnemarPaired(df: DataFrame, keepA: Column, keepB: Column)
      : DataFrame =
    df.select(keepA.cast("boolean").as("ka"), keepB.cast("boolean").as("kb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ka") && col("kb"), 1L).otherwise(0L)).as("n_both"),
        sum(when(!col("ka") && !col("kb"), 1L).otherwise(0L)).as("n_neither"),
        sum(when(col("ka") && !col("kb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("ka") && col("kb"), 1L).otherwise(0L)).as("c"))
      .select(col("n"), col("n_both"), col("n_neither"), col("b"), col("c"),
        expr("CASE WHEN b + c > 0 THEN " +
          "CASE WHEN abs(b - c) <= 1 THEN 0L ELSE " +
          "CAST(CAST(abs(b - c) - 1 AS DECIMAL(38,0)) * (abs(b - c) - 1) " +
          "* 1000000 DIV (b + c) AS BIGINT) END " +
          "ELSE NULL END").as("mcnemar_ppm"))
      .withColumn("significant",
        when(col("mcnemar_ppm") > 3841459L, 1).otherwise(0).cast("int"))

  /** Capture–recapture (Chapman) estimate of a DEFECT POPULATION from
    * two independent audit rules — the data-quality census trick: rule
    * A catches n₁ defects, rule B catches n₂, they agree on m, so the
    * bias-corrected total is N̂ = (n₁+1)(n₂+1)/(m+1) − 1 and the gap to
    * the seen union |A∪B| estimates what BOTH audits missed. The
    * estimator assumes independent detectors (correlated rules bias N̂
    * low — stated in the output contract, not hidden); undefined when
    * either rule catches nothing → NULL. All integers, one DIV.
    *
    * 100 TB posture: the whole census is ONE scan-side 3-counter
    * aggregate — the McNemar plan shape. Output: one row (n_a, n_b,
    * n_both, n_seen, chapman_est, unseen_est). */
  def captureRecapture(df: DataFrame, hitA: Column, hitB: Column)
      : DataFrame =
    df.select(hitA.cast("boolean").as("a"), hitB.cast("boolean").as("b"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n_both"))
      .select(col("n_a"), col("n_b"), col("n_both"),
        (col("n_a") + col("n_b") - col("n_both")).as("n_seen"),
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN " +
          "CAST(CAST(n_a + 1 AS DECIMAL(38,0)) * (n_b + 1) " +
          "DIV (n_both + 1) - 1 AS BIGINT) ELSE NULL END")
          .as("chapman_est"))
      .withColumn("unseen_est",
        when(col("chapman_est").isNotNull,
          greatest(col("chapman_est") - col("n_seen"), lit(0L)))
          .otherwise(lit(null).cast("long")))

  /** Good–Turing coverage per stratum: the probability the NEXT token
    * is an unseen type is f₁/N (Turing's estimate — exact ppm), and the
    * smoothed count for singletons is r*₁ = 2·f₂/f₁ (e6 — how much a
    * count-1 observation is really worth). The sampling-theory
    * companion to x170's Chao1 (Chao1 bounds how many types are
    * missing; Good–Turing prices the mass they carry). f₁ = 0 reads
    * zero unseen mass; r*₁ is NULL when f₁ = 0.
    *
    * 100 TB posture: one explode + two combinable rollups (token
    * counts, then frequency-of-frequencies) — x170's exact plan.
    * Output per stratum: (s, n_tokens, n_distinct, f1, f2,
    * unseen_ppm, r1_star_e6). */
  def goodTuring(docs: DataFrame, stratum: Column, text: Column)
      : DataFrame = {
    val tc = docs.select(stratum.as("s"),
        explode(split(trim(text), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("s", "tok").agg(count(lit(1)).as("c"))
    tc.groupBy("s")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("s"), col("n_tokens"), col("n_distinct"), col("f1"),
        col("f2"),
        expr("CAST(CAST(f1 AS DECIMAL(38,0)) * 1000000 DIV n_tokens " +
          "AS BIGINT)").as("unseen_ppm"),
        expr("CASE WHEN f1 > 0 THEN " +
          "CAST(2 * CAST(f2 AS DECIMAL(38,0)) * 1000000 DIV f1 AS BIGINT) " +
          "ELSE NULL END").as("r1_star_e6"))
  }

  /** Structural code-vs-prose signals — the format detector a
    * code-data curation pipeline runs before routing documents to the
    * code or prose quality gates (neither x3's prose-quality counts nor
    * x42's C4 rules see STRUCTURE): per document, the line count,
    * indented-line count (2+ spaces or a tab — code's visual signature),
    * code-symbol count (braces / brackets / semicolons / operators),
    * and keyword hits (a fixed 10-word cross-language list, word-
    * boundary matched), plus two exact ppm densities and a conjunctive
    * flag. Thresholds are integer constants so the verdict is
    * engine-reproducible: `code_flag` = (symbol density >= 3% AND >= 20%
    * of lines indented) OR >= 3 keyword hits.
    *
    * 100 TB posture: ONE scan-side projection — every signal is a
    * regex count or a line-array fold on the row, zero exchanges
    * (the output ORDER BY is the only shuffle any consumer pays).
    * Output: (doc_id, n_chars, n_lines, n_indent, n_sym, n_kw,
    * sym_ppm, indent_ppm, code_flag). */
  def codeSignals(df: DataFrame, id: Column, text: Column): DataFrame = {
    val ls = lines(text)
    df.select(id.as("doc_id"),
        length(text).cast("long").as("n_chars"),
        size(ls).cast("long").as("n_lines"),
        size(filter(ls, l => l.rlike("^(  |\t)"))).cast("long")
          .as("n_indent"),
        size(regexp_extract_all(text, lit("[{}();=<>\\[\\]]"), lit(0)))
          .cast("long").as("n_sym"),
        size(regexp_extract_all(text,
          lit("\\b(def|class|import|return|function|const|var|void|public|static)\\b"),
          lit(0))).cast("long").as("n_kw"))
      .withColumn("sym_ppm",
        expr("n_sym * 1000000L DIV greatest(n_chars, 1L)"))
      .withColumn("indent_ppm",
        expr("n_indent * 1000000L DIV greatest(n_lines, 1L)"))
      .withColumn("code_flag",
        ((col("sym_ppm") >= 30000L && col("indent_ppm") >= 200000L) ||
          col("n_kw") >= 3L).cast("int"))
  }
}
