package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Deterministic dense row ids (SURVEY.md P13) without a global window.
  *
  * `row_number().over(Window.orderBy(key))` is the obvious translation of
  * pandas' `reset_index`, but it funnels EVERY row through one partition
  * (WindowExec's "No Partition Defined" path) — fine for a bounded link
  * table, fatal for a corpus. This helper produces the same 0..n-1
  * numbering fully distributed:
  *
  *  1. range-repartition + sort within partitions by the key (total order
  *     across partitions, each partition sorted — no single-point sort);
  *  2. one lightweight count-per-partition job;
  *  3. map each partition with its exclusive-prefix-sum offset.
  *
  * Determinism requires the key to be unique (range boundaries are sampled,
  * so ties may land in either of two adjacent partitions; with unique keys
  * the final numbering is order-isomorphic to the key and thus unique and
  * stable across runs/cluster sizes — the property the oracle compare
  * needs).
  */
object Ids {

  /** Salted equi-join for skewed keys — the manual fallback when AQE's
    * skew-join split doesn't apply (broadcast-ineligible dimension, hot
    * keys known in advance, stream-stream). The small side is replicated
    * across `salts` buckets; each big-side row routes to exactly one
    * bucket by a deterministic hash of `routeBy` (NOT rand() — retries
    * and speculative tasks must route identically), so one hot key's rows
    * spread over `salts` tasks instead of one.
    * Semantics = `big.join(small, Seq(key), "inner")` exactly; cost =
    * small side ×salts (pick salts ≪ cluster cores, small ≪ big).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 routeBy: String, salts: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val b = big.withColumn("__salt",
      pmod(xxhash64(col(routeBy)), lit(salts.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt"), "inner").drop("__salt")
  }

  def denseIndex(df: DataFrame, outCol: String, keyCols: String*): DataFrame =
    // the inclusive scan of the constant 1 is 1-based rank; shift to 0..n-1
    scanOrdered(df, outCol, _ => 1L, keyCols)
      .withColumn(outCol, col(outCol) - 1)

  /** Distributed inclusive prefix sum of `valueOf(row)` in `keyCols` order
    * — the scalable replacement for `sum(...).over(Window.orderBy(key))`,
    * which funnels the whole table through ONE partition. Same two-phase
    * shape as [[denseIndex]] (which is the prefix sum of the constant 1):
    * range-partition + sort, one per-partition-totals job, then a mapped
    * pass adding each partition's exclusive offset. Integer math → exact
    * and order-independent across any partitioning.
    */
  def prefixSum(df: DataFrame, outCol: String, valueCol: String,
                keyCols: String*): DataFrame = {
    val idx = df.schema.fieldIndex(valueCol)
    scanOrdered(df, outCol, _.getLong(idx), keyCols)
  }

  private def scanOrdered(df: DataFrame, outCol: String,
                          valueOf: Row => Long,
                          keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val keys = keyCols.map(col)
    val sorted = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    val rdd = sorted.rdd
    rdd.cache()
    val totals = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        Iterator(pid -> it.map(valueOf).sum)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val withSum = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var acc = bc.value(pid)
      it.map { row => acc += valueOf(row); Row.fromSeq(row.toSeq :+ acc) }
    }
    // the cached sorted RDD serves both the totals job and the caller's
    // materialization; LRU eviction reclaims it afterwards (block-level,
    // recompute is deterministic: range sampling is seeded per partition)
    spark.createDataFrame(withSum, sorted.schema.add(outCol, LongType))
  }
}
