package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's content cleaner re-expressed as pure Column expressions
  * (reference: content_cleaner.py:5-131; operators P4–P12, F1–F3 in
  * SURVEY.md §2.2/§2.8).
  *
  * Protocol (two-phase, as in the reference): normalize whitespace/HTML →
  * flag bad cells to NULL (blacklist phrases, boilerplate regex, min length,
  * whitespace-only) → drop rows where any required column is null. All rules
  * are `when`/`rlike`/`length` chains — whole-stage codegen'd, no UDFs, and
  * they push down/compose freely under Catalyst.
  */
object Cleaner {

  /** Boilerplate phrases that invalidate a cell (content_cleaner.py:72-78),
    * matched case-insensitively as substrings.
    */
  val blacklist: Seq[String] = Seq(
    "javascript", "cookie", "subscribe", "newsletter", "sign up", "sign in",
    "log in", "login", "privacy policy", "terms of service", "all rights reserved",
    "copyright", "advertisement")

  private val blacklistRe = "(?i)(" + blacklist.map(java.util.regex.Pattern.quote).mkString("|") + ")"

  /** Content patterns that invalidate a cell on substring match
    * (content_cleaner.py:56-61): URLs, emails, phone numbers, html tags.
    */
  val removalRe: String =
    "(https?://\\S+|www\\.\\S+|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|\\+?\\d[\\d\\s().-]{7,}\\d|<[^>]+>)"

  /** F1: collapse whitespace runs / strip html-ish tags, then trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "[\\n\\t ]+", " "))

  /** P7: cell → null when it contains any blacklist phrase. */
  def nullIfBlacklisted(c: Column): Column =
    when(c.rlike(blacklistRe), lit(null)).otherwise(c)

  /** P9: cell → null when it matches a boilerplate content pattern. */
  def nullIfBoilerplate(c: Column): Column =
    when(c.rlike(removalRe), lit(null)).otherwise(c)

  /** P8: cell → null when shorter than the per-column minimum
    * (content_cleaner.py:88-94: title 20, description 100, body 400,
    * paragraph 150).
    */
  def nullIfShort(c: Column, minLen: Int): Column =
    when(length(c) < minLen, lit(null)).otherwise(c)

  /** P10: whitespace-only cell → null. */
  def nullIfBlank(c: Column): Column =
    when(c.rlike("^\\s*$"), lit(null)).otherwise(c)

  val minLens: Map[String, Int] =
    Map("title" -> 20, "description" -> 100, "body" -> 400, "paragraph" -> 150)

  /** Full flag-then-drop chain over the canonical article columns present in
    * `df` (P7→P9→P8→P10 then P11 dropna). Column list is dynamic, as in the
    * reference's suffix-convention schema (§1.2).
    *
    * `body` is exempt from the blacklist (P7) and boilerplate-pattern (P9)
    * null-outs — the reference applies those only to title/paragraph/
    * description ("Replaces all entries except bodies",
    * content_cleaner.py:81-85; the removal loop at content_cleaner.py:121-122
    * covers title/paragraph/description only). A URL or the word "cookie"
    * inside an article body must NOT drop the row; min-length and blank
    * rules still apply to body.
    */
  def clean(df: DataFrame, cols: Seq[String] = Seq("title", "description", "body", "paragraph")): DataFrame = {
    val present = cols.filter(df.columns.contains)
    // Stage 1: normalize each column ONCE into a plain attribute. This is a
    // separate projection on purpose: stage 2 references each normalized
    // value several times, and CollapseProject keeps the boundary when a
    // non-cheap producer expression is consumed more than once — so the
    // regexp_replace chain is never duplicated into the flag CASEs.
    val normalized = present.foldLeft(df) { (d, name) =>
      d.withColumn(name, normalize(col(name)))
    }
    // Stage 2: one flat CASE per column ORing every null-out rule
    // (P7 | P9 | P8 | P10). Each rule independently maps the cell to NULL,
    // so rule order is immaterial and a single `when` replaces the previous
    // 4-deep nest — whose repeated `.otherwise(c)` branches doubled the
    // expression tree per layer and pushed the fused Project past janino's
    // 64 KB per-method limit, silently dropping the whole ETL clean stage
    // to interpreted evaluation.
    val flagged = present.foldLeft(normalized) { (d, name) =>
      val c = col(name)
      val contentBad =
        if (name == "body") lit(false)
        else c.rlike(blacklistRe) || c.rlike(removalRe)
      d.withColumn(name,
        when(contentBad || length(c) < minLens.getOrElse(name, 1) ||
          c.rlike("^\\s*$"), lit(null)).otherwise(c))
    }
    flagged.na.drop("any", present)
  }

  /** P12: pick the longer of two strings; EXACT tie → "" — the reference's
    * initialize-then-overwrite quirk (content_cleaner.py:106-113), kept
    * when `strictParity` (FIXTURES.md quirk 1), else ties keep `a`.
    */
  def longestOf(a: Column, b: Column, strictParity: Boolean = true): Column =
    if (strictParity)
      when(length(a) > length(b), a)
        .when(length(a) < length(b), b).otherwise(lit(""))
    else when(length(b) > length(a), b).otherwise(a)

  /** The full ETL cleaning stage over the merged links×content frame
    * (content_cleaner.py:5-131): fillna "" (P5) → longest-of body/title
    * coalesce (P12) → rename to canonical names (P4) → flag-then-drop
    * (P7–P11) → canonical 8-column projection (P6). Pure column
    * expressions end to end — no shuffle; two staged codegen projections
    * (normalize, then flag) sized to stay under janino's 64 KB method
    * limit so the ETL clean path actually runs compiled, not interpreted.
    */
  def cleanArticles(df: DataFrame, strictParity: Boolean = false): DataFrame = {
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    val filled = df.na.fill("", strCols)
    val coalesced = filled
      .withColumn("body", longestOf(col("n3k_body"), col("bs_body"), strictParity))
      .withColumn("title", longestOf(col("n3k_title"), col("bs_title"), strictParity))
      .withColumn("title",
        when(length(col("se_title")) > length(col("title")), col("se_title"))
          .otherwise(col("title")))
      .withColumnRenamed("se_link", "link")
      .withColumnRenamed("se_description", "description")
      .withColumnRenamed("se_source", "source")
    clean(coalesced)
      .select("article_index", "engine", "link", "source",
        "title", "description", "body", "paragraph")
  }
}
