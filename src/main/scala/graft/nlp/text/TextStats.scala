package graft.nlp.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for a training-data pipeline: language ID
  * (char-n-gram profiles), quality scoring, token counting, and winnowing
  * document fingerprints. All pure Column expressions / relational plans —
  * no UDFs, everything stays in whole-stage codegen and scales linearly in
  * corpus size (profiles are tiny broadcast dimensions).
  */
object TextStats {

  /** Cavnar–Trenkle-style language ID: per-language top-`profileSize` char
    * trigram profiles learned from the labeled corpus itself, then each doc
    * classified by |doc-trigrams ∩ profile| with deterministic tie-break on
    * language code. Output: (id, lang, pred_lang, correct).
    *
    * Plan shape, sized for a 100 TB corpus:
    *  - The profile aggregation shuffles (lang, tri) COUNTS, never (doc,
    *    tri) rows — hash-agg partial combine collapses each partition to
    *    its distinct trigram set first, so the exchange is
    *    ~|langs × alphabet³| rows, corpus-size-independent.
    *  - The finished profile (≤ profileSize·|langs| rows — a bounded model,
    *    like KMeans centroids) is collected and inlined as a LITERAL into
    *    the classify projection: pred_lang = argmax over langs of
    *    size(array_intersect(doc_trigrams, profile(lang))), computed
    *    entirely map-side in one codegen'd pass over the corpus. No
    *    explode at doc grain, no join, no per-doc aggregation, no window —
    *    the per-doc stage is a scan-project at any scale. (The previous
    *    formulation exploded every doc's distinct trigrams and re-shuffled
    *    them through a groupBy + rank window — 4 extra corpus-grain
    *    stages for the same answer.)
    */
  def langIdByTrigram(df: DataFrame, idCol: String, textCol: String,
                      langCol: String, profileSize: Int = 20): DataFrame = {
    val tris = transform(sequence(lit(1), length(col(textCol)) - 2),
      i => col(textCol).substr(i, lit(3)))
    val profile = df.filter(length(col(textCol)) >= 3)
      .select(col(langCol), explode(tris).as("tri"))
      .groupBy(col(langCol), col("tri"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(langCol)).orderBy(col("cnt").desc, col("tri"))))
      .filter(col("rk") <= profileSize)
      .select(col(langCol).as("prof_lang"), col("tri"))
    // driver boundary is fine HERE: the profile is corpus-size-independent
    // (a few hundred rows at most), exactly like collecting fitted model
    // coefficients. The corpus itself is never collected.
    val profArrays: Seq[(String, Seq[String])] = profile.collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) => l -> rows.map(_.getString(1)).toSeq }
      .toSeq.sortBy(_._1)
    if (profArrays.isEmpty)
      return df.select(col(idCol), col(langCol),
        lit(null).cast("string").as("pred_lang"),
        lit(null).cast("boolean").as("correct"))
    // per-lang overlap against the doc's distinct-trigram set, argmax with
    // lang-code tie-break via sort on struct(-overlap, lang); zero overlap
    // everywhere → null (matches the join-based formulation, where such
    // docs simply had no candidate rows)
    val distTris = array_distinct(tris)
    val scored = sort_array(array(profArrays.map { case (l, ts) =>
      struct(
        (-size(array_intersect(distTris, array(ts.map(lit): _*)))).as("neg"),
        lit(l).as("lang"))
    }: _*))
    val best = element_at(scored, 1)
    val pred = when(length(col(textCol)) >= 3 && best.getField("neg") < 0,
      best.getField("lang"))
    df.select(col(idCol), col(langCol), pred.as("pred_lang"))
      .withColumn("correct", col(langCol) === col("pred_lang"))
  }

  /** Heuristic quality features + a composite score in [0,1]:
    * length saturation × type-token diversity × (1 − stopword ratio).
    * Output columns: n_tokens, n_distinct, stopword_ratio, chars_per_token,
    * quality (ratios rounded to 6 dp; quality computed from raw ratios).
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val stops = array(Text.stopwords.map(lit): _*)
    val nTok = size(col("toks")).cast("long")
    val nStop = size(filter(col("toks"), t => array_contains(stops, t)))
    // divisions guarded: under ANSI (Spark 4 default) plan reshuffling can
    // evaluate the projection on zero-token rows the filter later drops
    val safeTok = when(nTok > 0, nTok.cast("double"))
    val stopRatio = nStop / safeTok
    val nDist = size(array_distinct(col("toks"))).cast("long")
    df.withColumn("toks", toks)
      .filter(size(col("toks")) > 0)
      .withColumn("n_tokens", nTok)
      .withColumn("n_distinct", nDist)
      .withColumn("stopword_ratio", round(stopRatio, 6))
      .withColumn("chars_per_token",
        round(length(col(textCol)) / safeTok, 6))
      // quality stays UNROUNDED: it is a ratio of small integers whose
      // exact decimal value can sit on a .5e-7 rounding boundary, where
      // engines' round() implementations disagree; the raw double is
      // bit-identical across engines (same IEEE ops, same order) and the
      // harness canonicalizes at 9 dp.
      .withColumn("quality",
        least(nTok / lit(100.0), lit(1.0)) *
          (nDist.cast("double") / safeTok) * (lit(1.0) - stopRatio))
      .drop("toks")
  }

  /** Token counting three ways: whitespace tokens, regex (BPE-ish
    * pre-tokenizer: letter runs / digit runs / single other chars), and a
    * chars/4 subword estimate. Output: tokens_ws, tokens_re, tokens_bpe_est.
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("tokens_ws",
        size(filter(split(col(textCol), " "), t => t =!= "")).cast("long"))
      .withColumn("tokens_re",
        // whitespace spelled out (incl. \x0B): Java's \s has VT, RE2's does
        // not — the shorthand diverges across engines (ADVICE r02/r04)
        regexp_count(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]")).cast("long"))
      .withColumn("tokens_bpe_est",
        ceil(length(col(textCol)) / lit(4.0)).cast("long"))

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03 — public
    * algorithm): hash every k-token shingle (first 8 hex chars of md5),
    * take the min in each sliding window of `window` shingles, and
    * fingerprint = md5 of the sorted distinct window-minima. Robust to
    * local edits; two docs sharing most shingles share most minima.
    * Output: (id, fingerprint, n_hashes) for docs with ≥ k tokens.
    */
  def winnowFingerprint(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, window: Int = 4): DataFrame = {
    // Fully in-row (r21): the sliding-window minima are per-document state
    // over a bounded shingle array, so the whole fingerprint is a
    // scan-project — ZERO shuffles at any corpus size. The previous
    // relational formulation (explode shingles → per-doc rank window →
    // DISTINCT → groupBy collect_list) moved every shingle hash through
    // THREE corpus-grain exchanges to compute the same per-row value.
    // Stage boundaries (separate selects) keep each multi-use array a plain
    // attribute so CollapseProject can't duplicate the producer expression.
    val tok = df.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
    val hashed = tok.select(col(idCol),
      transform(Text.ngrams(col("toks"), k),
        g => substring(md5(g), 1, 8)).as("h"))
    val wins = hashed.select(col(idCol),
      array_distinct(transform(sequence(lit(1), size(col("h"))),
        i => array_min(slice(col("h"), i, lit(window))))).as("wm"))
    wins.select(col(idCol),
      md5(array_join(array_sort(col("wm")), "")).as("fingerprint"),
      size(col("wm")).cast("long").as("n_hashes"))
  }
}
