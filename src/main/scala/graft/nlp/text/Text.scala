package graft.nlp.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives (SURVEY.md §2.8 F9–F15): tokenize, stopwords, n-grams,
  * sentence split — pure Column expressions so they stay inside whole-stage
  * codegen (no UDFs on the hot path).
  */
object Text {

  /** Minimal english stopword list (reference ships NLTK/sklearn lists;
    * F13). Kept as a resource-style constant — parity fixtures use the same
    * list on the oracle side.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for")

  /** F9–F11: lowercase, strip punctuation/digits, whitespace tokenize.
    * The leading `\x0B → ' '` normalization pins down the one character
    * where Java's `\s` ([ \t\n\x0B\f\r]) and DuckDB/RE2's `\s`
    * ([ \t\n\f\r]) disagree: without it, a vertical tab splits tokens here
    * but is *stripped* (gluing its neighbors together) by the oracle's
    * `[^\w\s]` — a latent cross-engine divergence (ADVICE r02). `\w` is
    * ASCII-identical in both engines, so no other class differs.
    * OracleSql.toks applies the same normalization.
    */
  def tokens(c: Column): Column =
    filter(
      split(regexp_replace(regexp_replace(
        regexp_replace(lower(c), "\\x0B", " "), "[^\\w\\s]", ""), "\\d+", ""), "\\s+"),
      t => t =!= "")

  /** F13: drop stopwords from a token array. */
  def removeStopwords(toks: Column): Column = {
    val stops = array(stopwords.map(lit): _*)
    filter(toks, t => !array_contains(stops, t))
  }

  /** F12: sentence split on terminal punctuation (regex baseline; punkt
    * parity not required — SURVEY.md §7.4.6).
    */
  def sentences(c: Column): Column =
    filter(split(c, "(?<=[.!?])\\s+"), s => trim(s) =!= "")

  /** F14: rule-based lemmatizer (reference: WordNet lemmatizer,
    * word_wizard.py:591,603 — no JVM WordNet here, so a deterministic
    * first-match-wins suffix ruleset + small irregular table; documented
    * non-parity per SURVEY.md §7.3). Pure when/rlike chain — identical
    * CASE logic is expressible in the oracle SQL.
    */
  val irregulars: Map[String, String] = Map(
    "children" -> "child", "men" -> "man", "women" -> "woman",
    "feet" -> "foot", "mice" -> "mouse", "geese" -> "goose")

  def lemma(t: Column): Column = {
    val irr = irregulars.foldLeft(when(lit(false), t)) {
      case (acc, (from, to)) => acc.when(t === from, lit(to))
    }
    irr
      .when(t.rlike("sses$"), regexp_replace(t, "es$", ""))
      .when(t.rlike("....ies$"), regexp_replace(t, "ies$", "y"))
      .when(t.rlike("...ing$"), regexp_replace(t, "ing$", ""))
      .when(t.rlike("...ed$"), regexp_replace(t, "ed$", ""))
      .when(t.rlike("..[^su]s$"), regexp_replace(t, "s$", ""))
      .otherwise(t)
  }

  /** F14 over a token array. */
  def lemmatize(toks: Column): Column = transform(toks, t => lemma(t))

  /** F15: word n-grams (shingles) from a token array, joined by a space.
    * transform over a sliced range keeps it codegen-friendly. Docs shorter
    * than n tokens yield an empty array (slice(start=0) would throw).
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
    .otherwise(array().cast("array<string>"))
}
