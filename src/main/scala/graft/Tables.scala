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

  /** Read a table and spread it across the cluster when the file layout
    * under-parallelizes the scan. A parquet file is splittable only at
    * row-group boundaries, so a single-row-group file (the benchmark
    * fixtures; also common for small dimension snapshots in a lake) scans
    * as ONE task — and every per-row compute downstream (hashing,
    * tokenizing, n-gramming) serializes on one core until the first
    * shuffle. For compute-heavy operators we pay one tiny exchange up
    * front to engage the whole cluster. At scale the guard is a no-op:
    * 100 TB of parquet has orders of magnitude more row groups than
    * cores, so `getNumPartitions >= target` and no shuffle is added.
    * Catalyst still prunes columns and pushes filters through the
    * round-robin exchange.
    */
  def balanced(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = apply(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Persist a table bucketed (and sorted within buckets) by a join key.
    * Repeated joins/aggregations on that key then read co-located buckets
    * and skip the exchange entirely — at 100 TB the difference between
    * re-shuffling the fact table per query and never shuffling it (the
    * shuffle is paid ONCE, at write time). Spark bucketing requires the
    * catalog (`saveAsTable`) — plain parquet paths carry no bucket spec.
    * Join both sides with the same bucket count; TablesSpec asserts the
    * exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keyCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(table)
}
