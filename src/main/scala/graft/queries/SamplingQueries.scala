package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sampling.Sampling

/** Oracle queries for deterministic sampling / split assignment — training-
  * data-mix primitives. Both engines evaluate the identical md5-threshold
  * predicate, so row membership (not just counts) is oracle-checked.
  */
object SamplingQueries {

  private val t80 = Sampling.hexThreshold(0.8)
  private val t90 = Sampling.hexThreshold(0.9)
  private val t20 = Sampling.hexThreshold(0.2)
  private val t50 = Sampling.hexThreshold(0.5)

  /** q42: 80/10/10 train/val/test assignment by doc_id hash, rolled up per
    * (lang, split) — the reproducible-split primitive: a row's split never
    * changes with partitioning, cluster size, or corpus growth.
    */
  def q42HashSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sampling.hashSplit(Tables(spark, dir, "documents"), $"doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"split")
  }

  val q42Sql: String =
    s"""SELECT lang,
      |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '$t80' THEN 'train'
      |       WHEN md5(CAST(doc_id AS VARCHAR)) < '$t90' THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n
      |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** q43: stratified deterministic sample — keep 20% of 'en' docs and 50%
    * of every other language (training-mix reweighting), row-level output
    * so the oracle checks exact membership.
    */
  def q43StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = md5($"doc_id".cast("string"))
    Tables(spark, dir, "documents")
      .filter(when($"lang" === "en", h < lit(t20)).otherwise(h < lit(t50)))
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  val q43Sql: String =
    s"""SELECT doc_id, lang FROM documents
      |WHERE CASE WHEN lang = 'en'
      |  THEN md5(CAST(doc_id AS VARCHAR)) < '$t20'
      |  ELSE md5(CAST(doc_id AS VARCHAR)) < '$t50' END
      |ORDER BY doc_id""".stripMargin

  /** q44: sequence packing — assign documents in doc_id order to fixed
    * token-budget training sequences (bin = start-offset ÷ seqLen over the
    * running token count) and report per-bin stats. The running count is
    * [[graft.util.Ids.prefixSum]] — a distributed two-phase scan — where
    * the oracle (single-node anyway) uses a plain cumulative window; the
    * naive Spark translation of that window would move the corpus to one
    * partition. Integer math throughout → exact parity.
    */
  def q44PackSequences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seqLen = 2048L
    // Whitespace spelled out (incl. \x0B) rather than `\s`: Java's \s
    // contains vertical tab, DuckDB/RE2's does not, so the shorthand counts
    // a VT as a token on one engine only (ADVICE r02/r04). The explicit
    // class is identical bytes on both sides.
    val toks = Tables(spark, dir, "documents")
      .select($"doc_id",
        regexp_count($"text", lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]"))
          .cast("long").as("nt"))
    graft.util.Ids.prefixSum(toks, "cum", "nt", "doc_id")
      .withColumn("bin", (($"cum" - $"nt") / seqLen).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"nt").as("sum_tokens"))
      .orderBy($"bin")
  }

  val q44Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]')) AS BIGINT) AS nt
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, nt,
      |    SUM(nt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t)
      |SELECT CAST((cum - nt) // 2048 AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS sum_tokens
      |FROM c GROUP BY 1 ORDER BY bin""".stripMargin
}
