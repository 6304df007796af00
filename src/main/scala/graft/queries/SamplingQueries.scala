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
}
