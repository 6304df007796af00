package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the same
  * logical plan runs unchanged from sf0.001 smoke to a 100 TB lake — only the
  * path (and the files' partition count) changes. Reads are plain parquet
  * scans: Catalyst handles column pruning + predicate pushdown, so callers
  * should express filters/projections declaratively and never pre-collect.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
