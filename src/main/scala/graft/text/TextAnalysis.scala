package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification, document fingerprinting.
  * Everything except langid/fingerprint is pure Column expressions
  * (codegen'd); those two are deterministic Scala kernels applied in a
  * typed map.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword token estimate: split on word/punct boundaries the
    * way byte-pair tokenizers pre-segment (letters+digits runs vs single
    * punctuation marks), via one regexp scan.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
      t => length(t) > 0 && t =!= " ")).cast("long")

  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it")

  // ---- CJK routing ----------------------------------------------------
  // Whitespace tokenization yields ONE token for unspaced scripts
  // (zh/ja/th/ko), collapsing repetition signals and near-dup recall.
  // Texts whose non-space codepoints are ≥30% CJK/Thai route to
  // character tokens. Content-based (not the lang column), so
  // space-delimited rows — including every oracle row — are untouched.

  private def isCjkCodepoint(cp: Int): Boolean =
    (cp >= 0x1100 && cp <= 0x11FF) || // Hangul Jamo
    (cp >= 0x3040 && cp <= 0x30FF) || // Hiragana + Katakana
    (cp >= 0x3400 && cp <= 0x4DBF) || // CJK ext A
    (cp >= 0x4E00 && cp <= 0x9FFF) || // CJK unified
    (cp >= 0xAC00 && cp <= 0xD7AF) || // Hangul syllables
    (cp >= 0xF900 && cp <= 0xFAFF) || // CJK compat
    (cp >= 0x0E00 && cp <= 0x0E7F)    // Thai

  /** One whitespace definition for BOTH the Scala kernels and the Column
    * mirrors: the Unicode White_Space set, written out explicitly.
    * Java's `Character.isWhitespace` and Java-regex `\s` (ASCII-only by
    * default) each cover a DIFFERENT subset — notably U+3000 IDEOGRAPHIC
    * SPACE, ubiquitous in real CJK text, is isWhitespace-true but
    * `\s`-false, which made the two routing predicates disagree at the
    * 30% boundary (round-5 review). An explicit class keeps the two
    * implementations equal by construction.
    */
  val WhitespaceClass: String = "[\\t\\n\\x0B\\f\\r \\u0085\\u00A0" +
    "\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"

  /** Scala mirror of [[WhitespaceClass]]. */
  def isWhitespaceCp(cp: Int): Boolean =
    (cp >= 0x09 && cp <= 0x0D) || cp == 0x20 || cp == 0x85 ||
    cp == 0xA0 || cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200A) ||
    cp == 0x2028 || cp == 0x2029 || cp == 0x202F || cp == 0x205F ||
    cp == 0x3000

  /** ≥30% of non-space codepoints in CJK/Thai blocks. */
  def isCjkText(s: String): Boolean = {
    var cjk = 0; var nonSpace = 0; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!isWhitespaceCp(cp)) {
        nonSpace += 1
        if (isCjkCodepoint(cp)) cjk += 1
      }
      i += Character.charCount(cp)
    }
    nonSpace > 0 && cjk * 10 >= nonSpace * 3
  }

  /** Column mirror of [[isCjkText]] via two codegen'd regexp_replace
    * lengths (Spark `length` counts codepoints, matching the Scala side).
    */
  def isCjkCol(t: Column): Column = {
    val CjkClass = "[\\x{1100}-\\x{11FF}\\x{3040}-\\x{30FF}" +
      "\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}" +
      "\\x{F900}-\\x{FAFF}\\x{0E00}-\\x{0E7F}]"
    val nonSpace = length(regexp_replace(t, WhitespaceClass, ""))
    val cjk = length(t) - length(regexp_replace(t, CjkClass, ""))
    nonSpace > 0 && cjk * 10 >= nonSpace * 3
  }

  /** Repetition signals per document (Gopher/C4-style quality rules:
    * Rae et al. 2021 §A1.1 use duplicate n-gram fractions and
    * most-common-word share to drop boilerplate/spam): token counts,
    * distinct-token count, the top token's multiplicity, duplicate
    * bigram count, and their single-division ratios (cross-engine
    * IEEE-exact).
    *
    * Scale shape: in-row Column kernels for everything except the top
    * token, which is a (doc_id, token) hash-aggregate — map-side
    * combined, shuffling one row per distinct (doc, token), the same
    * shape as the mention scan; no per-row O(tokens²) expression.
    */
  def repetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // same tokenizer as [[quality]] (trim + \s+) for spaced text: the two
    // signal tables must agree on what n_tokens means (round-4 pass-3
    // review). CJK/Thai rows route to character tokens (whitespace
    // splitting would report n_tokens = 1, dup_bigram_n = 0 for every
    // unspaced doc); content-routed, so spaced rows are byte-identical.
    val wordToks = filter(split(trim(t), "\\s+"), w => w =!= "")
    val charToks = filter(
      split(regexp_replace(t, WhitespaceClass + "+", ""), ""),
      c => length(c) > 0)
    val toks = when(isCjkCol(t), charToks).otherwise(wordToks)
    val base = docs
      .withColumn("__toks", toks)
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_distinct",
        size(array_distinct(col("__toks"))).cast("long"))
      .withColumn("n_bigrams",
        greatest(col("n_tokens") - 1, lit(0L)))
      .withColumn("n_distinct_bigrams", when(col("n_tokens") < 2, lit(0L))
        .otherwise(size(array_distinct(transform(
          sequence(lit(0), col("n_tokens") - 2),
          i => concat(element_at(col("__toks"), (i + 1).cast("int")), lit(" "),
            element_at(col("__toks"), (i + 2).cast("int")))))).cast("long")))
    val top = base
      .select(col("doc_id"), explode(col("__toks")).as("__tok"))
      .groupBy("doc_id", "__tok").agg(count(lit(1)).as("__c"))
      .groupBy("doc_id").agg(max(col("__c")).as("top_token_n"))
    base
      .join(top, Seq("doc_id"), "left")
      .withColumn("top_token_n", coalesce(col("top_token_n"), lit(0L)))
      .withColumn("dup_bigram_n", col("n_bigrams") - col("n_distinct_bigrams"))
      .withColumn("top_token_share",
        when(col("n_tokens") > 0,
          col("top_token_n").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") > 0,
          col("dup_bigram_n").cast("double") / col("n_bigrams"))
          .otherwise(lit(0.0)))
      .drop("__toks")
  }

  /** Shannon token entropy per document, in deterministic micro-nats —
    * the gibberish/boilerplate signal (near-zero entropy = one token
    * repeated; high entropy at given length = diverse vocabulary) the
    * quality funnel thresholds alongside [[repetition]]'s counts.
    * H = ln n − (Σ c·ln c)/n over the per-doc token histogram,
    * quantized so BOTH engines agree bit-exactly: ln is taken ONLY
    * over small integer counts and scaled to micro-nats BEFORE the
    * multiply — `c · round(ln(c)·1e6)` is integer arithmetic, the sum
    * is an exact BIGINT (order-invariant, unlike a float Σ whose
    * last-ulp depends on reduce order), and the final `div` is floor
    * division. A raw `round(c·ln(c)·1e6)` would put the rounding
    * boundary at magnitude ~1e9 where the two libms' 1-ulp
    * disagreements flip it with probability ~1e-6 PER TERM — at 1e6
    * (doc, token) terms that flakes every other run; over integer-only
    * ln args (≤ max token count) the set of rounding decisions is
    * small, fixed, and verified once by the driver's oracle compare.
    *
    * Scale shape: one explode + one (doc, token)-keyed
    * map-side-combined agg + one doc-keyed agg — the repetition/BM25
    * shape, no O(tokens²) work. Docs with zero tokens are absent (no
    * histogram rows), matching the SQL replay.
    */
  def entropy(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = filter(split(col(textCol), " "), w => w =!= "")
    docs.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * round(log(col("c")) * 1e6).cast("long"))
          .as("s_micro"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (round(log(col("n_tokens")) * 1e6).cast("long") -
          expr("s_micro div n_tokens")).as("entropy_micro"))
  }

  /** Bigram collocations by Dunning's log-likelihood ratio (G², the
    * standard collocation statistic — Dunning 1993): over the corpus
    * bigram contingency table (k11 = count(a b), row sum R = a-as-left
    * count, column sum C = b-as-right count, N = total bigrams),
    *
    *   G² = 2·[Σ k·ln k − R·ln R − (N−R)·ln(N−R)
    *            − C·ln C − (N−C)·ln(N−C) + N·ln N]
    *
    * — every term is c·ln c over an INTEGER count, so the
    * [[entropy]] micro-nat quantization applies verbatim: ln over
    * integers only, scaled before the multiply, exact BIGINT sums,
    * engine-stable. Output: top-k pairs by (g2_micro DESC, a, b) — a
    * total order, so LIMIT is deterministic on both engines.
    *
    * Scale shape: bigrams explode IN-ROW (adjacent array elements — no
    * self-join on position), one (a, b)-keyed map-side-combined count;
    * the bigram-TYPE table is then checkpointed and reused for the
    * row/column/total marginals (type counts, not token counts — the
    * standard collocation working set). N is a 1-row scalar broadcast
    * (PlanGuard's allowlisted category). Top-k is TakeOrdered, no
    * global sort.
    */
  def collocations(docs: DataFrame, topK: Int,
                   textCol: String = "text"): DataFrame = {
    val toks = filter(split(col(textCol), " "), w => w =!= "")
    val bc = docs.select(toks.as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] AS a, w[i + 1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("k11"))
      .localCheckpoint()
    val r = bc.groupBy("a").agg(sum("k11").as("ra"))
    val c = bc.groupBy("b").agg(sum("k11").as("cb"))
    val n = bc.agg(sum("k11").as("n"))
    def s(x: org.apache.spark.sql.Column) =
      when(x > 0, x * round(log(x) * 1e6).cast("long")).otherwise(0L)
    bc.join(r, Seq("a")).join(c, Seq("b")).crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("k11"),
        (lit(2L) * (s(col("k11")) + s(col("ra") - col("k11")) +
          s(col("cb") - col("k11")) +
          s(col("n") - col("ra") - col("cb") + col("k11")) -
          s(col("ra")) - s(col("n") - col("ra")) -
          s(col("cb")) - s(col("n") - col("cb")) + s(col("n"))))
          .as("g2_micro"))
      .orderBy(desc("g2_micro"), col("a"), col("b"))
      .limit(topK)
  }

  /** Quality features per document: lengths, ratios, stopword share —
    * integer counts + single final divisions (cross-engine exact).
    */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(trim(t), "\\s+")
    docs
      .withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_punct",
        (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("long"))
      .withColumn("n_stopwords",
        size(filter(toks, w => w.isin(Stopwords.map(lit): _*))).cast("long"))
      .withColumn("mean_token_len",
        when(col("n_tokens") > 0,
          (col("n_chars_m") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(col("n_chars_m") > 0, col("n_punct").cast("double") / col("n_chars_m"))
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0, col("n_stopwords").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
  }

  /** Model-based quality filtering with a FIXED-WEIGHT integer linear
    * model — the classifier tier of an LLM curation funnel (the
    * fastText/DCLM-style "quality classifier" shape) made fully
    * deterministic: a real deployment swaps in trained weights, the
    * operator plan is identical. Features are integer micro-ratios of
    * [[quality]]'s exact counts (each a NON-NEGATIVE floor division, so
    * Spark's truncating `div` and the oracle's `//` agree); the score is
    * their weighted integer sum (no post-division — negative totals
    * would floor differently across engines) and `keep` thresholds it.
    * One codegen'd projection per row; nothing shuffles.
    *
    * Weights encode the standard prose priors: stopword share up
    * (connected English prose), punctuation density down (boilerplate /
    * code soup), saturating length bonus, mean-token-length term
    * (gibberish has extreme means).
    */
  def classify(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val q = quality(docs, textCol)
    val fStop = when(col("n_tokens") > 0,
      expr("(1000000 * n_stopwords) div n_tokens")).otherwise(lit(0L))
    val fPunct = when(col("n_chars_m") > 0,
      expr("(1000000 * n_punct) div n_chars_m")).otherwise(lit(0L))
    val fLen = least(lit(1000000L), expr("(1000000 * n_tokens) div 400"))
    val fMtl = when(col("n_tokens") > 0,
      expr("(1000000 * (n_chars_m - n_tokens + 1)) div (6 * n_tokens)"))
      .otherwise(lit(0L))
    q.withColumn("f_stop", fStop)
      .withColumn("f_punct", fPunct)
      .withColumn("f_len", fLen)
      .withColumn("f_mtl", fMtl)
      .withColumn("score",
        lit(3L) * col("f_stop") - lit(4L) * col("f_punct") +
          lit(2L) * col("f_len") + col("f_mtl") - lit(1500000L))
      .withColumn("keep", col("score") >= 0L)
  }

  /** Flesch–Kincaid grade level (Kincaid et al. 1975) in exact integer
    * micro-units — the classic readability signal curation recipes keep
    * next to [[quality]]'s ratio features (C4/Gopher-era heuristic
    * filtering bins documents by grade band). Counts are exact
    * integers: whitespace words, sentence marks as `[.!?]+` runs
    * (clamped to ≥1 so fragments still score), and the standard
    * syllable PROXY of vowel-group runs (`[aeiouyAEIOUY]+`, counted
    * case-insensitively via the class itself — no `lower()`, whose
    * locale edge cases differ across engines). The grade
    * `0.39·W/S + 11.8·Y/W − 15.59` becomes
    * `(390000·W) div S + (11800000·Y) div W − 15590000`: both floor
    * divisions are non-negative (Spark `div` ≡ DuckDB `//` there), the
    * only possibly-negative step is the final subtraction, so the score
    * replays bit-for-bit on any engine. Empty docs get the 0 sentinel.
    *
    * One codegen'd projection per row (two regexp counters + one
    * split); nothing shuffles.
    */
  def readability(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val words = when(length(trim(t)) === 0, lit(0L))
      .otherwise(size(split(trim(t), "\\s+")).cast("long"))
    val sents = greatest(lit(1L),
      regexp_count(t, lit("[.!?]+")).cast("long"))
    val syll = regexp_count(t, lit("[aeiouyAEIOUY]+")).cast("long")
    docs.select(col("doc_id"), words.as("n_words"), sents.as("n_sents"),
        syll.as("n_syll"))
      .withColumn("fk_micro",
        when(col("n_words") > 0,
          expr("(390000 * n_words) div n_sents") +
            expr("(11800000 * n_syll) div n_words") - lit(15590000L))
          .otherwise(lit(0L)))
  }

  // ---- Language identification (character n-gram heuristic) -----------

  /** Tiny deterministic char-trigram profiles per language, derived from
    * public-domain sample phrases (written here, not fetched). A real
    * deployment would train profiles offline; the operator shape —
    * broadcast profiles + one pass per doc — is the production shape.
    */
  private val SeedText: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it runs " +
      "away with all of the other animals in the big green field they said"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und " +
      "dann läuft er mit allen anderen tieren auf dem großen grünen feld weg"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et " +
      "puis il court avec tous les autres animaux dans le grand champ vert"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y luego " +
      "corre con todos los demás animales en el gran campo verde dijeron"),
    "it" -> ("la rapida volpe marrone salta sopra il cane pigro e poi corre " +
      "con tutti gli altri animali nel grande campo verde hanno detto")
  )

  private def trigrams(s: String): Map[String, Double] = {
    val padded = " " + s.toLowerCase.replaceAll("[^\\p{L} ]", "") + " "
    val grams = padded.sliding(3).toSeq
    val n = grams.size.toDouble
    grams.groupBy(identity).map { case (g, xs) => g -> xs.size / n }
  }

  lazy val Profiles: Map[String, Map[String, Double]] = SeedText.map {
    case (lang, txt) => lang -> trigrams(txt)
  }

  /** Cosine-ish overlap score against each profile; argmax wins (ties
    * broken by language code order for determinism).
    */
  def detectLanguage(text: String): String = {
    if (text == null || text.trim.isEmpty) return "und"
    val tg = trigrams(text)
    Profiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      val score = tg.iterator.map { case (g, w) => prof.getOrElse(g, 0.0) * w }.sum
      (lang, score)
    }.maxBy(_._2) match {
      case (lang, s) if s > 0 => lang
      case _ => "und"
    }
  }

  def withLanguage(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val f = udf((t: String) => detectLanguage(t))
    docs.withColumn("detected_lang", f(col(textCol)))
  }

  /** Integer trigram profiles: (gram → count, total grams) per language
    * — the quantized basis [[langId]] scores against. Raw counts, not
    * the float frequencies [[Profiles]] carries, so scores stay in
    * exact BIGINT arithmetic end-to-end.
    */
  lazy val ProfileCounts: Map[String, (Map[String, Long], Long)] =
    SeedText.map { case (lang, txt) =>
      val padded = " " + txt.toLowerCase.replaceAll("[^\\p{L} ]", "") + " "
      val grams = padded.sliding(3).toSeq
      lang -> (grams.groupBy(identity).map { case (g, xs) =>
        g -> xs.size.toLong
      }, grams.size.toLong)
    }

  /** UDF-free language ID ([[detectLanguage]]'s declarative sibling):
    * per-doc char-trigram counts joined to the broadcast profile table,
    * scored in exact integers —
    *
    *   score_micro(doc, lang) = (Σ_g profCount(lang,g)·docCount(doc,g))
    *                            · 10^6 div nProf(lang)
    *
    * (the doc-side 1/nDoc normalization of the float scorer is constant
    * across languages per doc, so it cannot change the argmax and is
    * dropped; the lang-side 1/nProf is kept, floor-divided at micro
    * scale). Argmax ties break by language code; docs with zero
    * profile-gram hits are "und". Everything is Column arithmetic in
    * whole-stage codegen — no UDF — and the scores replay bit-exactly
    * in any engine with integer division.
    *
    * Scale shape: trigram explode IN-ROW (one substring per position),
    * one (doc, gram)-keyed map-side-combined count, one broadcast join
    * against the ~650-row profile table, one (doc, lang) agg, and a
    * single-struct min per doc — the repetition/entropy shuffle shape,
    * nothing corpus-quadratic.
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val profDf = ProfileCounts.toSeq.flatMap { case (lang, (m, np)) =>
      m.toSeq.map { case (g, c) => (lang, g, c, np) }
    }.toDF("lang", "gram", "pc", "nprof")
    val padded = concat(lit(" "),
      regexp_replace(lower(col(textCol)), "[^\\p{L} ]", ""), lit(" "))
    val grams = docs.select(col("doc_id"), padded.as("p"))
      .withColumn("gs", expr(
        "CASE WHEN length(p) >= 3 THEN " +
          "transform(sequence(1, length(p) - 2), i -> substring(p, i, 3)) " +
          "ELSE CAST(array() AS array<string>) END"))
      .select(col("doc_id"), explode(col("gs")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("dc"))
    val scores = grams
      .join(broadcast(profDf), Seq("gram"))
      .groupBy(col("doc_id"), col("lang"), col("nprof"))
      .agg(sum(col("pc") * col("dc")).as("raw"))
      .select(col("doc_id"), col("lang"),
        expr("raw * 1000000 div nprof").as("score_micro"))
    val best = scores
      .groupBy("doc_id")
      .agg(min(struct((-col("score_micro")).as("ns"), col("lang"))).as("m"))
      .select(col("doc_id"), col("m.lang").as("lang_pred"),
        (-col("m.ns")).as("score_micro"))
    docs.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang_pred"), lit("und")).as("lang_pred"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  // ---- Fingerprinting (rolling hash / winnowing) ----------------------

  /** Polynomial rolling hashes of token windows; the document fingerprint
    * is the minimum window hash (winnowing with one global window) plus
    * the full set for containment checks.
    */
  def windowHashes(text: String, window: Int): Seq[Long] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < window) {
      if (toks.isEmpty) Seq.empty else Seq(polyHash(toks))
    } else toks.sliding(window).map(polyHash).toSeq
  }

  /** (1-based window position, hash) pairs for docs with ≥ `window`
    * tokens; shorter docs yield nothing (no full window exists). The
    * positional variant backs span-level exact-substring dedup, where
    * WHERE a duplicate window sits in the doc matters, not just that
    * one exists.
    */
  def windowHashesPos(text: String, window: Int): Seq[(Int, Long)] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < window) Seq.empty
    else toks.sliding(window).zipWithIndex
      .map { case (w, i) => (i + 1, polyHash(w)) }.toSeq
  }

  private def polyHash(toks: Array[String]): Long = {
    var h = 1469598103934665603L
    for (t <- toks) {
      var i = 0
      while (i < t.length) { h ^= t.charAt(i); h *= 1099511628211L; i += 1 }
      h ^= ' '
      h *= 1099511628211L
    }
    h
  }

  /** (doc_id, fingerprint) — equal fingerprints ⇒ shared window content;
    * used for containment/overlap detection across documents.
    */
  def fingerprints(docs: DataFrame, window: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val hs = windowHashes(t, window)
        (id, if (hs.isEmpty) 0L else hs.min, hs.length.toLong)
      }
      .toDF("doc_id", "fingerprint", "n_windows")
  }

  /** Per-document top-k keyword extraction by tf-idf — the classic
    * salience signal for corpus exploration and weak topic labels over
    * a training corpus. The idf factor is the INTEGER proxy
    * `score = tf·10^6 div df`: monotone in tf/df like tf·ln(N/df) for
    * ranking within a document (N is constant per corpus snapshot and
    * df's ordering survives the log), but exactly replayable — a float
    * ln would leave the ranking hostage to lib-specific last-ulp
    * rounding at ties.
    *
    * Plan shape: ONE corpus scan — the (doc, term) tf hash agg is
    * localCheckpointed and feeds both join sides, because df is just
    * the tf relation re-aggregated by term (tf rows are already
    * distinct per (doc, term), so a plain count IS the document
    * frequency — no second scan, no countDistinct). The checkpoint is
    * deliberate: the two consumers' canonical plans differ enough that
    * ReuseExchange does NOT fire (measured — 2 scans without it), and
    * re-deriving tf means re-scanning and re-exploding the corpus; the
    * materialized relation is hash-width (doc_id, term, tf), a small
    * fraction of the text it came from. The join on term keeps the
    * vocabulary-scale df side broadcastable under AQE; the per-doc
    * top-k is a `row_number() <= k` filter that Spark 4's
    * InsertWindowGroupLimits bounds BELOW the exchange (Partial
    * WindowGroupLimit — ≤ k rows per doc per map task cross the wire,
    * the same verified shape as dd_domain_cap / WindowGroupLimitSpec).
    * Ties break on term ascending — total order, deterministic.
    */
  def keywords(docs: DataFrame, topK: Int = 5): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .select(col("doc_id"), col("term"),
        expr("(tf * 1000000) div df").as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select("doc_id", "term", "score", "rnk")
  }

  /** Context-window chunking with overlap — the step that turns curated
    * documents into fixed-size training sequences while keeping `overlap`
    * tokens of left context at every boundary (the standard chunking
    * shape for pretraining and RAG indexing; contrast [[graft.mix.Mix]]'s
    * txt_pack, which concatenates ACROSS documents without overlap).
    *
    * Entirely in-row: tokens, chunk count and every chunk's slice come
    * from one codegen'd projection + one `explode(sequence(...))` —
    * no shuffle at all (the ideal shape for a full-corpus rewrite; the
    * output is written straight back out partition-aligned with the
    * input). Chunk arithmetic is integer: stride = window − overlap,
    * nChunks = 1 if n ≤ window else ceil((n − window)/stride) + 1 —
    * the last chunk always ends exactly at the document end or earlier
    * chunks cover it, and every token index < n appears in ≥ 1 chunk.
    *
    * Returns (doc_id, chunk_idx, start, chunk, n_toks).
    */
  def chunk(docs: DataFrame, window: Int = 64, overlap: Int = 16)
      : DataFrame = {
    require(window > overlap && overlap >= 0,
      s"need window > overlap >= 0, got $window/$overlap")
    val stride = window - overlap
    docs
      .withColumn("toks",
        filter(split(col("text"), " "), t => t =!= ""))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("nc", expr(
        s"case when n <= $window then 1L " +
          s"else ((n - $window) + ${stride - 1}) div $stride + 1L end"))
      .select(col("doc_id"),
        explode(expr("sequence(0L, nc - 1)")).as("chunk_idx"),
        col("toks"), col("n"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start"),
        array_join(expr(
          s"slice(toks, int(chunk_idx * $stride) + 1, $window)"), " ")
          .as("chunk"),
        least(lit(window.toLong), col("n") - col("chunk_idx") * stride)
          .as("n_toks"))
  }
}
