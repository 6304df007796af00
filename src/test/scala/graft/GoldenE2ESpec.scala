package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.PipelineExecutor
import graft.wizard.WordWizard

/** Golden end-to-end (SURVEY.md §5.2.4): fixture ingest → clean →
  * full WordWizard chain, asserting the complete reference output schema
  * and cross-run determinism of the whole stack.
  */
class GoldenE2ESpec extends SparkSpec {
  import spark.implicits._

  private val emb = "paragraph_sentence_embeddings"
  private val goldenCols = Seq(
    "article_index", "engine", "link", "source", "title", "description",
    "body", "paragraph", "sentences", emb, s"${emb}_clusters",
    s"${emb}_clusters_medoids", s"${emb}_clusters_medoids_summaries",
    "paragraph_clusters_NER", "paragraph_sentiment", "topics",
    "paragraph_reduced_dimensions_word_embeddings")

  private def runChain(dir: String) = {
    val clean = new PipelineExecutor(dir)
      .execute(spark, "golden run", maxArticles = 15)
    WordWizard(clean, "paragraph")
      .createSentenceEmbeddings()
      .clusterEmbeddings(k = Some(3))
      .entityRecognition(minLen = 4)
      .summarizeMedoids()
      .findSentiment()
      .topicModelling(nWords = 5)
      .reduceDimensionality()
      .df
  }

  test("pipeline + full wizard chain: golden schema and determinism") {
    val out1 = runChain(Files.createTempDirectory("golden1").toString).cache()
    assert(goldenCols.forall(out1.columns.contains),
      s"missing: ${goldenCols.filterNot(out1.columns.contains)}")
    val n = out1.count()
    assert(n > 0)
    // medoids: 3 clusters x 2 = 6 flagged rows, summaries only there
    assert(out1.filter(col(s"${emb}_clusters_medoids")).count() == 6)
    assert(out1.filter(col(s"${emb}_clusters_medoids_summaries").isNotNull)
      .count() == 6)
    // NER + topics constant within cluster
    val variances = out1.groupBy(col(s"${emb}_clusters"))
      .agg(countDistinct(col("paragraph_clusters_NER")).as("ners"),
           countDistinct(to_json(col("topics"))).as("tps"))
      .filter($"ners" > 1 || $"tps" > 1).count()
    assert(variances == 0)

    // cross-run determinism: full row-hash over stable columns
    val out2 = runChain(Files.createTempDirectory("golden2").toString)
    def fingerprint(df: org.apache.spark.sql.DataFrame) = df
      .select(md5(to_json(struct(goldenCols.map(col): _*))).as("h"))
      .agg(md5(array_join(array_sort(collect_list($"h")), "")).as("fp"))
      .head.getString(0)
    assert(fingerprint(out1) == fingerprint(out2))
    out1.unpersist()
  }
}
