package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * language ID, quality scoring, fingerprinting. All pure Column expressions
  * (codegen'd, no UDFs) so they stay inside whole-stage codegen and scale
  * embarrassingly — no shuffle, no state, applied at scan speed on 100 TB.
  */
object TextOps {

  /** Whitespace tokens with empties dropped; the cross-engine-portable
    * tokenization (DuckDB: `list_filter(string_split_regex(...))`).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words plus extra tokens for every 4
    * characters beyond the first 4 of each word (a common ~4-chars/token
    * heuristic), digits and punctuation counted separately.
    */
  def tokenEstimate(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, w) => acc + lit(1L) + floor((length(w) - 1) / lit(4)).cast("long")) +
      length(regexp_replace(text, "[^0-9.,;:!?]", ""))

  private val stop: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ich", "ein", "zu", "mit"),
    "fr" -> Seq("le", "les", "des", "une", "du", "est", "dans", "et", "pour", "que"))

  def stopwordScore(text: Column, lang: String): Column =
    size(filter(tokens(text), w => w.isin(stop(lang).map(x => x: Any): _*)))

  /** N-gram-heuristic language ID over stopword hit counts with a fixed
    * tie-break order (en > es > de > fr). Returns "unknown" when no stopword
    * of any list occurs — deterministic and SQL-expressible, so the DuckDB
    * oracle can replicate it exactly.
    */
  def langId(text: Column): Column = {
    val en = stopwordScore(text, "en")
    val es = stopwordScore(text, "es")
    val de = stopwordScore(text, "de")
    val fr = stopwordScore(text, "fr")
    when(en + es + de + fr === 0, "unknown")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Oracle SQL fragment equivalent to [[langId]] (DuckDB dialect). */
  def langIdSql(textCol: String): String = {
    def score(lang: String): String = {
      val list = stop(lang).map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(list_filter(string_split_regex(lower($textCol), '\\s+'), w -> w != ''), w -> list_contains($list, w)))"
    }
    s"""CASE WHEN ${score("en")} + ${score("es")} + ${score("de")} + ${score("fr")} = 0 THEN 'unknown'
       | WHEN ${score("en")} >= ${score("es")} AND ${score("en")} >= ${score("de")} AND ${score("en")} >= ${score("fr")} THEN 'en'
       | WHEN ${score("es")} >= ${score("de")} AND ${score("es")} >= ${score("fr")} THEN 'es'
       | WHEN ${score("de")} >= ${score("fr")} THEN 'de'
       | ELSE 'fr' END""".stripMargin
  }

  /** Punctuation-character count (sentence-ish enders + separators). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", ""))

  /** Mean token length over a STAGED tokens column — exact integer sums
    * divided once, so Spark and the oracle produce bit-identical doubles.
    */
  def avgWordLenOfTokens(ws: Column): Column =
    when(size(ws) === 0, lit(0.0))
      .otherwise(aggregate(ws, lit(0L), (a, w) => a + length(w)).cast("double") / size(ws))

  /** Convenience over raw text (stage [[tokens]] anywhere hot). */
  def avgWordLen(text: Column): Column = avgWordLenOfTokens(tokens(text))

  /** Quality heuristics bundle used by [[graft.queries.PipelineQueries]]. */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0).otherwise(stopwordScore(text, "en").cast("double") / n)
  }

  /** [[stopwordRatio]] over a STAGED tokens column — `ws` must be an
    * attribute reference: the inline form re-tokenizes per use site (this
    * ratio has three), which multiplies regex work everywhere the score
    * lands in more than one operator (filter + project + both join sides).
    */
  def stopwordRatioOfTokens(ws: Column, lang: String = "en"): Column = {
    val hits = size(filter(ws, w => w.isin(stop(lang).map(x => x: Any): _*)))
    when(size(ws) === 0, 0.0).otherwise(hits.cast("double") / size(ws))
  }

  /** Character-class histogram of a document as one struct — letters,
    * digits, whitespace, other, total. Pure Column (four codegen'd regex
    * removals + lengths), zero shuffle; stage the struct as its own column
    * before feeding [[classEntropyOfCounts]] so the counts compute once.
    */
  def charClassCounts(text: Column): Column = {
    val n = length(text).cast("long")
    val letters = n - length(regexp_replace(text, "[A-Za-z]", "")).cast("long")
    val digits = n - length(regexp_replace(text, "[0-9]", "")).cast("long")
    val spaces = n - length(regexp_replace(text, "\\s", "")).cast("long")
    struct(
      letters.as("letters"), digits.as("digits"), spaces.as("spaces"),
      (n - letters - digits - spaces).as("other"), n.as("n"))
  }

  /** Shannon entropy (nats) over the 4-class character histogram — the
    * gibberish/minified-content quality signal (natural prose sits near
    * ~0.8–1.0 nats on this alphabet; base64 blobs, digit dumps and
    * single-class junk collapse toward 0). The per-class log-likelihoods
    * are FLOORED onto the 1e-6 integer grid before the weighted sum (the
    * text_perplexity discipline), so the result is bit-replayable
    * cross-engine despite libm ln differences. Empty text scores 0.
    */
  def classEntropyOfCounts(cs: Column): Column = {
    val n = cs("n")
    def term(c: Column): Column =
      when(c > 0, c * floor(log(c.cast("double") / n) * 1000000.0).cast("long"))
        .otherwise(0L)
    when(n === 0, 0.0).otherwise(
      round(
        -(term(cs("letters")) + term(cs("digits")) + term(cs("spaces")) + term(cs("other")))
          .cast("double") / (n.cast("double") * 1000000.0),
        4))
  }

  /** Canonical-form fingerprint: lowercase, collapse whitespace, md5. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Rolling (polynomial) content hash over tokens — order-sensitive,
    * unlike [[fingerprint]]'s normalization: h ← (h·31 + xxhash64(w)) mod p
    * with p = 1e9+7. The modulus keeps every intermediate ≤ 31·p + p, far
    * from Long range, so ANSI-mode overflow checking never trips.
    */
  def rollingHash(text: Column): Column = {
    val p = 1000000007L
    aggregate(tokens(text), lit(0L), (acc, w) => pmod(acc * 31L + pmod(xxhash64(w), lit(p)), lit(p)))
  }

  /** [[rollingHash]] with a cross-engine-replayable token hash: the first
    * 8 hex chars of md5(w) parsed as an integer (then mod p), instead of
    * xxhash64. Same polynomial, same modulus, same empty-text result (0) —
    * every step replays in any SQL engine with md5 (DuckDB folds the same
    * values with `list_reduce`), which puts the order-sensitive content
    * hash under the cross-engine oracle. Production corpora should prefer
    * [[rollingHash]]: xxhash64 is several times faster per token and uses
    * all 64 hash bits.
    */
  def rollingHashReplayable(text: Column): Column = {
    val p = 1000000007L
    aggregate(
      tokens(text),
      lit(0L),
      (acc, w) =>
        pmod(acc * 31L + pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(p)), lit(p)))
  }

  /** Sentence-ish units: split on periods, trimmed, empties dropped. Stage
    * the result as its own column before feeding [[dupUnitFraction]] — the
    * usual HOF discipline (an inline expression re-splits per reference).
    */
  def sentenceUnits(text: Column): Column =
    filter(transform(split(text, "\\."), u => trim(u)), u => u =!= "")

  /** Fraction of repeated units in a STAGED units column — the
    * intra-document repetition signal (Gopher-style "rep. removal" family):
    * boilerplate and templated spam score high, prose scores ~0.
    * Integer-count arithmetic divided once, so cross-engine bit-exact.
    */
  def dupUnitFraction(units: Column): Column =
    when(size(units) === 0, lit(0.0))
      .otherwise((size(units) - size(array_distinct(units))).cast("double") / size(units))


  /** Gopher-style rule mask (Rae et al. 2021, public filtering rules,
    * thresholds adapted): per document, an integer BITMASK of violated
    * quality rules — the full-report form of a quality gate (a first-fail
    * verdict hides how often each rule fires; per-rule counts are what a
    * corpus dashboard tracks). Rules over the staged token array:
    *
    *  - bit 0: word count outside [minWords, 100 000]
    *  - bit 1: mean word length outside [3, 10]
    *  - bit 2: fewer than 2 DISTINCT english stopwords present (the
    *    "is this prose at all" check)
    *  - bit 3: duplicate-word fraction > 0.3 (templated spam)
    *
    * `mask = 0` is the pass. All comparisons are integer-or-single-
    * division arithmetic — bit-exact cross-engine. Null/empty token
    * arrays trip bit 0 (and bit 2), never error.
    */
  def gopherRuleMask(ws: Column, minWords: Int = 50): Column = {
    val nw = size(ws)
    val awl = avgWordLenOfTokens(ws)
    val stops = size(array_intersect(array_distinct(ws),
      typedLit(stop("en"))))
    val dupf = dupUnitFraction(ws)
    when(nw < minWords || nw > 100000, 1).otherwise(0) +
      when(awl < 3.0 || awl > 10.0, 2).otherwise(0) +
      when(stops < 2, 4).otherwise(0) +
      when(dupf > 0.3, 8).otherwise(0)
  }

  /** PII scrub patterns, applied in order (emails before IPs before
    * phone-like digit runs, so the broad digit pattern never eats an
    * address the earlier passes would have labeled). Deliberately restricted
    * to syntax Java regex and RE2 share (character classes, bounded repeats,
    * `\b` — no lookaround, no backrefs) so the DuckDB oracle replays them
    * verbatim; the phone pattern is a ≥9-char digit-run heuristic by design.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d()\\-. ]{7,}\\d" -> "<PHONE>")

  /** Redact emails / IPv4s / phone-like digit runs. Pure Column expression
    * chain — scan-speed, no shuffle, stays in whole-stage codegen.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Oracle SQL fragment equivalent to [[redactPii]] (DuckDB needs the 'g'
    * flag for replace-all). Patterns embed VERBATIM: DuckDB single-quoted
    * strings are raw — doubling backslashes would turn `\b` into a literal
    * backslash for RE2.
    */
  def redactPiiSql(textCol: String): String =
    piiPatterns.foldLeft(textCol) { case (e, (p, r)) =>
      s"regexp_replace($e, '$p', '$r', 'g')"
    }

  /** Payment-card-shaped runs: 13–19 digits allowing single spaces/dashes
    * between groups. No lookarounds (RE2, the oracle's engine, has none);
    * greedy quantifiers resolve identically in Java regex and RE2 here.
    */
  val cardPattern = "[0-9][0-9 -]{11,17}[0-9]"

  /** Luhn checksum validity of an already-CLEANED digit string (the
    * mod-10 check every real payment card satisfies — validating
    * candidates cuts PII false positives by ~10× versus shape alone).
    * Pure integer Column arithmetic: positions walk from the RIGHT, every
    * second digit doubles (minus 9 past 9), total ≡ 0 (mod 10). Length
    * must already be in the card range — combine with a length predicate
    * as [[cardScan]] does.
    */
  def luhnValid(clean: Column): Column = {
    val n = length(clean)
    val total = aggregate(
      sequence(lit(0), n - 1),
      lit(0),
      (acc, r) => {
        val d = clean.substr(n - r, lit(1)).cast("int")
        acc + when(r % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    (total % 10 === 0) && (n > 0)
  }

  /** Per-document card-PII counters: `n_card_candidates` (shape matches)
    * and `n_card_valid` (13–19 digits after cleaning AND Luhn-valid).
    * Pure Column chain — scan-speed, zero shuffle, whole-stage codegen.
    */
  def cardScan(text: Column): (Column, Column) = {
    val matches = regexp_extract_all(text, lit(cardPattern), lit(0))
    val valid = filter(matches, m => {
      val clean = regexp_replace(m, "[^0-9]", "")
      length(clean).between(13, 19) && luhnValid(clean)
    })
    (size(matches).as("n_card_candidates"), size(valid).as("n_card_valid"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010) — fully relational, no
    * UDF: candidate phrases are maximal stopword-free token runs
    * (gaps-and-islands on the stopword positions), each word's score is
    * `deg/freq` over the document's candidates (deg = summed length of
    * the phrases its occurrences sit in), and a phrase scores the sum of
    * its words' scores. Scores live on the exact integer grid
    * `(10⁶·deg) div freq` — integer division of exact counts, so ranking
    * and the driver hash replay cross-engine with no float division.
    * Identical phrase texts within a document collapse to one candidate
    * (same words ⇒ same score, so the dedup is lossless).
    *
    * Scale shape: one positioned-token explode, the per-doc run window,
    * and two doc-keyed aggregations — everything partitions by document
    * id, so the whole extraction is embarrassingly parallel with
    * corpus-sized shuffles of (id, word) pairs only; top-`k` per doc is
    * a bounded window over candidates-per-doc.
    */
  def rakePhrases(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int,
      lang: String = "en"): DataFrame = {
    require(topK >= 1, "topK must be positive")
    // the typed kernel carries the id as Long — non-integral ids must fail
    // loudly, not cast to null (the Dedup.duplicateSpans contract)
    Dedup.requireIntegralId(df, idCol)
    val stops = stop(lang).toSet
    // RAKE is a pure PER-DOCUMENT function (stop-word run segmentation,
    // per-doc word freq/deg, per-phrase score, per-doc rank) — the r12
    // formulation spread it over three checkpoints, four joins and two
    // windows, all keyed by doc id, i.e. six shuffles for work a single
    // compiled map does per row (3.05 s → sub-second at sf0.1). Integer
    // arithmetic is replicated exactly (floor divisions on longs); the
    // rank's phrase tie-break compares UTF-8 BYTES, matching the
    // engine's binary string order even off-ASCII.
    val sp = df.sparkSession
    import sp.implicits._
    // densifyCpu: widen-only on scans, explicit AQE-exempt width on derived
    // inputs — see that helper's doc for the cascade measurement
    Partitioning.densifyCpu(
      df.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        rakeTopPhrases(text, stops, topK).map {
          case (phrase, score, rank) => (id, phrase, score, rank)
        }
      }
      .toDF(idCol, "phrase", "score", "rank")
  }

  /** Compiled RAKE scorer for one document — see [[rakePhrases]] for the
    * semantics it replicates bit-for-bit: tokens split on `\s+` after
    * lowercasing, candidate phrases are maximal stop-word-free runs
    * (joined in position order), word score `ws = (10⁶·deg) div freq`
    * over the doc's occurrences, phrase score the sum of its occurrences'
    * word scores, duplicate (phrase, score) rows collapsed, rank by
    * (score DESC, phrase ASC in UTF-8 byte order), top `k` kept.
    */
  private def rakeTopPhrases(
      text: String,
      stops: Set[String],
      k: Int): Seq[(String, Long, Int)] = {
    if (text == null) return Seq.empty
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return Seq.empty
    // runs of consecutive non-stop words, keyed like the window form
    // (run id = stops seen so far); each run keeps its words in order
    val runs = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    toks.foreach { w =>
      if (stops.contains(w)) {
        if (cur.nonEmpty) { runs += cur.toArray; cur = scala.collection.mutable.ArrayBuffer.empty }
      } else cur += w
    }
    if (cur.nonEmpty) runs += cur.toArray
    if (runs.isEmpty) return Seq.empty
    // per-word freq / deg over ALL occurrences in candidate phrases
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    val deg = scala.collection.mutable.HashMap.empty[String, Long]
    runs.foreach { r =>
      val plen = r.length.toLong
      r.foreach { w =>
        freq.update(w, freq.getOrElse(w, 0L) + 1L)
        deg.update(w, deg.getOrElse(w, 0L) + plen)
      }
    }
    val ws = freq.keysIterator.map(w => w -> (1000000L * deg(w)) / freq(w)).toMap
    // phrase score = sum of occurrence word scores; duplicate phrases
    // collapse (identical words ⇒ identical score by construction)
    val scored = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    runs.foreach { r =>
      val phrase = r.mkString(" ")
      if (!scored.contains(phrase)) scored.update(phrase, r.map(ws).sum)
    }
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    scored.toSeq
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && utf8Lt(a._1, b._1)))
      .take(k)
      .zipWithIndex
      .map { case ((p, s), i) => (p, s, i + 1) }
  }

  /** Whitespace-collapsed lowercase form — stage this as its own column
    * before calling [[charShinglesOfNorm]]: an inline expression inside a
    * lambda body is re-evaluated per element (O(len²) interpreted regex),
    * an attribute reference is read from the row once.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Character n-gram shingles over an already-normalized column. */
  def charShinglesOfNorm(norm: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(length(norm) - n, lit(0))),
        i => norm.substr(i + 1, lit(n))))

  /** Character n-gram shingles of raw text (convenience; prefer staging
    * [[normalize]] when the shingles feed pairwise comparisons).
    */
  def charShingles(text: Column, n: Int): Column =
    charShinglesOfNorm(normalize(text), n)

  /** Word n-gram shingles over an already-staged tokens column. `ws` MUST be
    * an attribute reference: `slice(ws, …)` sits inside the per-shingle
    * lambda, so an inline `tokens(text)` is re-tokenized PER SHINGLE —
    * O(words²) interpreted regex per row.
    */
  def wordShinglesOfTokens(ws: Column, n: Int): Column =
    when(size(ws) < n, array(concat_ws(" ", ws)))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(0), size(ws) - n),
            i => concat_ws(" ", slice(ws, i + 1, lit(n))))))

  /** Word n-gram shingles of raw text (convenience; stage [[tokens]] as its
    * own column and use [[wordShinglesOfTokens]] anywhere hot — see its doc).
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOfTokens(tokens(text), n)

  /** ALL word n-grams of a STAGED tokens column, duplicates KEPT — the
    * counting-mode companion of [[wordShinglesOfTokens]] (which dedups for
    * set comparisons). Repetition signals need the multiset: the
    * most-frequent n-gram's share of a document is a top Gopher-style
    * boilerplate detector, and it is precisely the duplicates that carry
    * the signal. Empty when the document has fewer than n tokens.
    */
  def wordNgramsAllOfTokens(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))))

  /** Compiled replica of [[wordShingles]] (same tokenization, same
    * shorter-than-n fallback, distinct set) for per-row hot paths.
    */
  /** Compiled replica of `tokens → wordNgramsAllOfTokens`: ALL word
    * n-grams as space-joined strings, duplicates KEPT, document order,
    * empty when the doc has fewer than n tokens. Exists because the
    * Column-HOF form re-tokenizes once per gram: CollapseProject inlines
    * the staged tokenizer into the per-gram lambda (the measured 3× trap
    * from the prefix-join shingle probe — see [[mattrPerDoc]]), and the
    * lambda itself dispatches interpreted per element.
    */
  def wordNgramsAllScala(text: String, n: Int): Array[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array.empty[String]
    else {
      val out = new Array[String](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      out
    }
  }

  def wordShinglesScala(text: String, n: Int): Array[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array(toks.mkString(" "))
    else {
      val seen = new scala.collection.mutable.LinkedHashSet[String]
      toks.sliding(n).foreach(w => seen += w.mkString(" "))
      seen.toArray
    }
  }

  /** Moving-Average Type-Token Ratio (Covington & McFall 2010 — the
    * length-robust lexical-diversity measure; raw TTR shrinks with
    * document length, MATTR averages TTR over every fixed-size token
    * window so long and short documents compare honestly). Exact integer
    * output: `mattr_ppm = (Σ_w distinct_w) · 10⁶ DIV (window · n_windows)`;
    * documents shorter than the window take one whole-document window
    * (`distinct · 10⁶ DIV n`). Token-free documents exit.
    *
    * Runs as a COMPILED per-row kernel (the [[wordShinglesScala]]
    * discipline) with an O(n) sliding multiset — the Column-HOF form
    * would re-tokenize per window: `slice(ws, i, w)` sits inside the
    * per-position lambda, so CollapseProject inlines the tokenizer into
    * it (the measured 3× trap from the prefix-join shingle probe).
    * One scan, zero shuffles, doc-sized output.
    */
  def mattrPerDoc(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 50): org.apache.spark.sql.DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val sp = df.sparkSession
    import sp.implicits._
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        if (n == 0) None
        else if (n <= window) {
          val distinct = toks.toSet.size.toLong
          Some((id, n.toLong, 1L, distinct * 1000000L / n))
        } else {
          val counts = new scala.collection.mutable.HashMap[String, Int]
          var live = 0L
          var i = 0
          while (i < window) {
            val c = counts.getOrElse(toks(i), 0)
            if (c == 0) live += 1
            counts.update(toks(i), c + 1)
            i += 1
          }
          var sumDistinct = live
          while (i < n) {
            val out = toks(i - window)
            val co = counts(out)
            if (co == 1) { counts.remove(out); live -= 1 }
            else counts.update(out, co - 1)
            val in = toks(i)
            val ci = counts.getOrElse(in, 0)
            if (ci == 0) live += 1
            counts.update(in, ci + 1)
            sumDistinct += live
            i += 1
          }
          val nWindows = (n - window + 1).toLong
          Some((id, n.toLong, nWindows,
            sumDistinct * 1000000L / (window.toLong * nWindows)))
        }
      }
      .toDF(idCol, "n_tokens", "n_windows", "mattr_ppm")
  }

  /** Yule's K per group (Yule 1944 — the classic repeat-rate measure of
    * lexical richness; unlike TTR/MATTR it is length-INSENSITIVE in
    * expectation, the property that makes it usable across documents of
    * wildly different sizes): `K = 10⁴·(Σ_m m²·V_m − N)/N²` where `V_m`
    * counts types occurring exactly m times and `N` is total tokens.
    * `Σ m²·V_m = Σ_types count²` comes off the exact (group, word) counts;
    * the one division lands on the 10⁴·2²⁰ grid with the numerator and
    * `N²` assembled in DECIMAL(38,0) (the [[Sampling.neymanAllocation]]
    * overflow discipline — `N²` alone exceeds Int64 past N ≈ 3·10⁹, and
    * the grid-scaled numerator far earlier).
    *
    * Scale shape: one token explode, one (group, word) count, one group
    * aggregate — the [[Vocab]] family's two-shuffle profile; output is
    * group-sized. Higher K = more repetitive (boilerplate screens);
    * groups with N < 2 are excluded (K undefined).
    */
  def yuleK(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(groupCol), explode(tokens(col(textCol))).as("__w"))
      .groupBy(col(groupCol), col("__w"))
      .agg(count(lit(1)).as("__m"))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__m")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__m") * col("__m")).as("s2"))
      .filter(col("n_tokens") >= 2)
      .select(col(groupCol), col("n_tokens"), col("n_types"), col("s2"),
        expr(
          """CAST((CAST(10485760000 AS DECIMAL(38,0)) * (s2 - n_tokens))
            | DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)
            | AS BIGINT)""".stripMargin).as("yule_k_grid"))

  /** Per-document n-gram NOVELTY against the whole corpus in doc-id order
    * (the freshness screen a training-data pipeline runs before paying
    * for a document: how much of it is text the corpus has not already
    * seen in any EARLIER document): a document's distinct word n-grams
    * are `novel` when their globally FIRST occurrence (minimum doc id) is
    * this document. Returns `(id, n_grams, n_novel, novelty_ppm)` with
    * the exact integer fraction; documents with fewer than n tokens
    * carry zero grams and are excluded.
    *
    * Scale shape: one gram explode with per-doc DISTINCT (map-side), one
    * gram-keyed min-aggregate (the only corpus shuffle — gram-sized,
    * exactly [[Dedup.ngramJaccardPairs]]'s posting volume), one count per
    * doc on each side, one id-keyed join of two doc-sized frames. No
    * windows, no pairs, no iteration.
    */
  def ngramNovelty(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    // tokens staged as a multi-consumer attribute (size + slices) so the
    // regex split runs once per DOC, not once per gram (the lambda-
    // inlining trap measured in SCALE.md)
    val grams = df
      .filter(col(textCol).isNotNull)
      .withColumn("__ws", tokens(col(textCol)))
      .select(col(idCol).cast("long").as("__id"),
        explode(array_distinct(wordNgramsAllOfTokens(col("__ws"), n))).as("__g"))
    val perDoc = grams.groupBy("__id").agg(count(lit(1)).as("n_grams"))
    val novel = grams.groupBy("__g").agg(min(col("__id")).as("__id"))
      .groupBy("__id").agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("coalesce(n_novel, 0) * 1000000 DIV n_grams").as("novelty_ppm"))
  }
}
