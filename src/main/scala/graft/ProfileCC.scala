package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate connected-components round overhead on synthetic
  * graphs (chain = worst-case diameter, cliques = LSH-bucket shape).
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.dedup.Dedup

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[cc] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    // clique-ish: 100 components of 5 nodes (LSH-bucket shape)
    val cliques = (0 until 100).flatMap { c =>
      val base = c * 10L
      (1 to 4).map(i => (base, base + i))
    }.toDF("doc_a", "doc_b")
    // chain of 256 nodes: diameter stress
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")

    t("warmup cliques") { Dedup.connectedComponents(cliques).count() }
    t("cliques x500") { Dedup.connectedComponents(cliques).count() }
    t("chain-256") { Dedup.connectedComponents(chain).count() }
    spark.stop()
  }
}
