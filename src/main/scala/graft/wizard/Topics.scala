package graft.wizard

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Topic modeling via class-based TF-IDF (reference word_wizard.py:561-647,
  * operators A2+A7+W3+J2 — the fully-relational parity centerpiece, B8).
  *
  * Semantics: treat each cluster's documents as one mega-document; weigh
  * term frequency within the cluster against the term's corpus-wide count:
  * tf(c,w) = t(c,w) / Σ_w t(c,w);   idf(w) = ln(m / Σ_c t(c,w));
  * score = tf·idf with m = total row count (word_wizard.py:635).
  *
  * Spark plan: one explode → two partial-aggregated shuffles (cluster-term
  * counts, then term totals) → broadcast of the scalar m → per-cluster top-n
  * window. No driver-side collect: m travels as a broadcast crossJoin, so
  * the same plan runs at 100 TB (the shuffle is bounded by |vocabulary|,
  * not corpus size, thanks to map-side combine).
  */
object Topics {

  /** Per-cluster term counts with tf·idf scores at (cluster, term) grain.
    * Totals come from two window sums OVER the (cluster, term) count frame
    * — the expensive corpus-grain explode+aggregate runs ONCE; the naive
    * formulation (separate groupBys for cluster totals and term totals,
    * joined back) re-evaluates that subtree three times, since Catalyst
    * does not reuse common subplans across joins. Counts are integers, so
    * the window sums are exact and order-independent — no float-parity
    * risk. Both windows shuffle only |vocabulary|-grain rows.
    */
  def cTfIdf(df: DataFrame, clusterCol: String, termCol: Column): DataFrame = {
    val tok = df.select(col(clusterCol), explode(termCol).as("term"))
      .filter(col("term") =!= "")
    val t = tok.groupBy(col(clusterCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val m = df.agg(count(lit(1)).as("m"))
    // term_total FIRST, cluster_total LAST: the downstream top-n rank window
    // ([[topTerms]]) partitions by the cluster key, so ending on the
    // cluster-partitioned window lets the rank window reuse that exchange
    // (3 vocabulary-grain shuffles → 2; the sums are independent, so order
    // doesn't change a single value).
    t.withColumn("term_total",
        sum($("cnt")).over(Window.partitionBy($("term"))))
      .withColumn("cluster_total",
        sum($("cnt")).over(Window.partitionBy(col(clusterCol))))
      .crossJoin(broadcast(m))
      .withColumn("score",
        ($("cnt") / $("cluster_total")) * log($("m") / $("term_total")))
  }

  /** Top-n terms per cluster, scores rounded for float parity (the only
    * transcendental is one ln; round(6) absorbs cross-engine ulp noise).
    * Ranking is on the ROUNDED score: two terms whose scores differ only
    * in final ulps must tie (then break by term) identically in every
    * engine, or the rank order itself diverges.
    */
  def topTerms(df: DataFrame, clusterCol: String, termCol: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy($("score6").desc, $("term"))
    cTfIdf(df, clusterCol, termCol)
      .withColumn("score6", round($("score"), 6))
      .withColumn("rk", row_number().over(w))
      .filter($("rk") <= n)
      .select(col(clusterCol), $("rk"), $("term"), $("score6").as("score"))
  }

  private def $(s: String): Column = col(s)
}
