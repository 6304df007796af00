package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.nlp.text.Text
import graft.wizard.{Topics, Sentiment, Ner, Medoids}

/** Oracle queries for the NLP-relational operators (SURVEY.md §2.10 —
  * the WordWizard chain's relational skeletons, oracled per §5.2.3).
  * Cluster key = `lang` on documents / `label` on embeddings, standing in
  * for the learned cluster column with identical dataflow.
  */
object NlpQueries {

  private val stopListSql = Text.stopwords.map(s => s"'$s'").mkString(", ")

  // Text.tokens replicated in DuckDB — see OracleSql.toks (ADVICE r01).
  private val toksExpr = OracleSql.toks("text")

  /** q16: topic modeling via c-TF-IDF — the parity centerpiece (B8). */
  def q16Topics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.balanced(spark, dir, "documents")
    Topics.topTerms(docs, "lang",
        Text.removeStopwords(Text.tokens($"text")), 20)
      .withColumn("rk", $"rk".cast("long"))
      .orderBy($"lang", $"rk")
  }

  val q16Sql: String =
    s"""WITH tok AS (
      |  SELECT lang, unnest($toksExpr) AS term FROM documents
      |), t AS (
      |  SELECT lang, term, COUNT(*) AS cnt FROM tok
      |  WHERE term <> '' AND term NOT IN ($stopListSql)
      |  GROUP BY lang, term
      |), ct AS (
      |  SELECT lang, CAST(SUM(cnt) AS BIGINT) AS cluster_total FROM t GROUP BY lang
      |), tt AS (
      |  SELECT term, CAST(SUM(cnt) AS BIGINT) AS term_total FROM t GROUP BY term
      |), m AS (SELECT COUNT(*) AS m FROM documents
      |), scored AS (
      |  SELECT t.lang, t.term,
      |    ROUND((t.cnt / ct.cluster_total) * ln(m.m / tt.term_total), 6) AS score
      |  FROM t JOIN ct ON t.lang = ct.lang JOIN tt ON t.term = tt.term, m
      |), ranked AS (
      |  SELECT lang, term, score,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rk
      |  FROM scored)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, term, score FROM ranked
      |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin

  /** q17: weighted entity top-k per cluster (A3+W4): first-10-token "title
    * zone" weighs ×3, the rest ×1; candidates are tokens of length ≥ 5.
    */
  def q17WeightedNer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.balanced(spark, dir, "documents")
      .withColumn("toks", Text.tokens($"text"))
    Ner.topEntities(docs, "lang",
        zones = Seq(
          (slice($"toks", 1, 10), 3),
          (slice($"toks", lit(11), greatest(size($"toks") - 10, lit(0))), 1)),
        minLen = 5, n = 5)
      .withColumn("rk", $"rk".cast("long"))
      .orderBy($"lang", $"rk")
  }

  val q17Sql: String =
    s"""WITH tk AS (
      |  SELECT lang, $toksExpr AS toks FROM documents
      |), toks AS (
      |  SELECT lang,
      |    unnest(toks) AS term,
      |    unnest(generate_series(1, len(toks))) AS pos
      |  FROM tk
      |), weighted AS (
      |  SELECT lang, term, CASE WHEN pos <= 10 THEN 3 ELSE 1 END AS weight
      |  FROM toks WHERE LENGTH(term) >= 5
      |), counted AS (
      |  SELECT lang, term, CAST(SUM(weight) AS BIGINT) AS wsum
      |  FROM weighted GROUP BY lang, term
      |), ranked AS (
      |  SELECT lang, term, wsum,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY wsum DESC, term) AS rk
      |  FROM counted)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, term, wsum FROM ranked
      |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin

  /** q18: sentiment with distinct→score→join dataflow (A10/B4). */
  def q18Sentiment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sentiment.score(Tables.balanced(spark, dir, "documents"), "text", "sentiment")
      .select($"doc_id", $"sentiment")
      .orderBy($"doc_id")
  }

  val q18Sql: String = {
    val pos = Sentiment.positive.map(s => s"'$s'").mkString(", ")
    val neg = Sentiment.negative.map(s => s"'$s'").mkString(", ")
    s"""WITH d AS (SELECT DISTINCT text FROM documents
      |), s AS (
      |  SELECT text,
      |    len(list_filter($toksExpr, t -> t IN ($pos))) AS pos,
      |    len(list_filter($toksExpr, t -> t IN ($neg))) AS neg
      |  FROM d)
      |SELECT doc_id,
      |  CASE WHEN pos > neg THEN 2 WHEN pos < neg THEN 0 ELSE 1 END AS sentiment
      |FROM documents JOIN s USING (text) ORDER BY doc_id""".stripMargin
  }

  /** q19: KMeans-style medoids — n closest to centroid per cluster (W1). */
  def q19Medoids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Medoids.byCentroid(Tables.balanced(spark, dir, "embeddings"),
        "vec_id", "label", "embedding", 2)
      .withColumn("medoid_rank", $"medoid_rank".cast("long"))
      .orderBy($"label", $"vec_id")
  }

  val q19Sql: String =
    """WITH dims AS (
      |  SELECT vec_id, label,
      |    unnest(embedding) AS v,
      |    unnest(generate_series(1, len(embedding))) AS dim
      |  FROM embeddings
      |), cent AS (
      |  SELECT label, dim, AVG(CAST(v AS DOUBLE)) AS c FROM dims GROUP BY label, dim
      |), sq AS (
      |  SELECT vec_id, d.label,
      |    SUM((CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c)) AS sqdist
      |  FROM dims d JOIN cent ON d.label = cent.label AND d.dim = cent.dim
      |  GROUP BY vec_id, d.label
      |), r AS (
      |  SELECT vec_id, label,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY sqdist, vec_id) AS rk
      |  FROM sq)
      |SELECT vec_id, label, CAST(rk AS BIGINT) AS medoid_rank FROM r
      |WHERE rk <= 2 ORDER BY label, vec_id""".stripMargin

  /** q20: HDBSCAN-style medoids — smallest mean pairwise distance (W2/J5).
    * O(n²) within cluster; the byCentroid path is the scale-out default.
    */
  def q20MedoidsPairwise(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Medoids.byPairwise(Tables.balanced(spark, dir, "embeddings"),
        "vec_id", "label", "embedding", 1)
      .withColumn("medoid_rank", $"medoid_rank".cast("long"))
      .orderBy($"label")
  }

  val q20Sql: String =
    """WITH pair AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
      |    unnest(a.embedding) AS x, unnest(b.embedding) AS y
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id <> b.vec_id
      |), d AS (
      |  SELECT a_id, label, b_id,
      |    sqrt(SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))) AS dist
      |  FROM pair GROUP BY a_id, label, b_id
      |), ad AS (
      |  SELECT label, a_id, SUM(dist) / COUNT(*) AS avg_dist FROM d GROUP BY label, a_id
      |), r AS (
      |  SELECT a_id, label,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY avg_dist, a_id) AS rk
      |  FROM ad)
      |SELECT a_id AS vec_id, label, CAST(rk AS BIGINT) AS medoid_rank FROM r
      |WHERE rk <= 1 ORDER BY label""".stripMargin

  /** q21: extractive lead-k summaries on medoid rows only, left-joined back
    * (B5 dataflow: filter(medoid) → summarize → join; non-medoids stay
    * null). The expensive kernel runs on ~2k rows regardless of corpus size.
    */
  def q21SummarizeMedoids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.balanced(spark, dir, "documents")
    val medoids = Medoids.byCentroid(Tables.balanced(spark, dir, "embeddings"),
      "vec_id", "label", "embedding", 2)
    // Both small sides are bounded at clusters × n rows (medoid ids, then
    // medoid summaries) at ANY corpus size — broadcast them explicitly so
    // neither join ever shuffles the corpus: without the hints the static
    // planner picked the corpus as the build side of the first join and a
    // SortMergeJoin (full doc_id shuffle + sort of the docs table) for the
    // summary attach (r21 plan audit).
    val summaries = docs
      .join(broadcast(medoids), docs("doc_id") === medoids("vec_id"))
      .withColumn("summary",
        array_join(slice(split($"text", " "), 1, 20), " "))
      .select($"doc_id", $"summary")
    docs.join(broadcast(summaries), Seq("doc_id"), "left")
      .select($"doc_id", $"summary")
      .orderBy($"doc_id")
  }

  val q21Sql: String =
    """WITH dims AS (
      |  SELECT vec_id, label,
      |    unnest(embedding) AS v,
      |    unnest(generate_series(1, len(embedding))) AS dim
      |  FROM embeddings
      |), cent AS (
      |  SELECT label, dim, AVG(CAST(v AS DOUBLE)) AS c FROM dims GROUP BY label, dim
      |), sq AS (
      |  SELECT vec_id, d.label,
      |    SUM((CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c)) AS sqdist
      |  FROM dims d JOIN cent ON d.label = cent.label AND d.dim = cent.dim
      |  GROUP BY vec_id, d.label
      |), r AS (
      |  SELECT vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY sqdist, vec_id) AS rk
      |  FROM sq
      |), summ AS (
      |  SELECT doc_id,
      |    array_to_string(list_slice(string_split(text, ' '), 1, 20), ' ') AS summary
      |  FROM documents JOIN r ON doc_id = vec_id AND rk <= 2)
      |SELECT d.doc_id, s.summary
      |FROM documents d LEFT JOIN summ s USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q22: the notebook's viz frame (MVP.ipynb cell 12 — F20 element access
    * + A5 cluster-size broadcast): x/y from the vector + group count.
    */
  def q22VizFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"label")
    Tables.balanced(spark, dir, "embeddings")
      .select($"vec_id", $"label",
        element_at($"embedding", 1).cast("double").as("x"),
        element_at($"embedding", 2).cast("double").as("y"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .orderBy($"vec_id")
  }

  val q22Sql: String =
    """SELECT vec_id, label,
      |  CAST(embedding[1] AS DOUBLE) AS x,
      |  CAST(embedding[2] AS DOUBLE) AS y,
      |  COUNT(*) OVER (PARTITION BY label) AS cluster_size
      |FROM embeddings ORDER BY vec_id""".stripMargin
}
