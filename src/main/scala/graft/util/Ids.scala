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
    // localCheckpoint, NOT cache (ADVICE r03): a cache()d block evicted
    // after the totals job would be recomputed, and with duplicate keys the
    // re-sampled range boundaries could land ties in a different partition
    // — silently corrupt (non-dense) numbering. localCheckpoint truncates
    // lineage, so a lost block is a LOUD job failure instead; blocks are
    // dropped by the ContextCleaner once the RDD is unreferenced (no
    // session-lifetime accumulation).
    val rdd = sorted.rdd.localCheckpoint()
    val keyIdx = keyCols.map(sorted.schema.fieldIndex)
    // one job: per-partition totals + duplicate-key detection. Rows are
    // sorted, so equal keys are adjacent; a within-partition scan plus a
    // boundary compare between consecutive partitions sees every duplicate.
    val totals = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var sum = 0L
        var first: Seq[Any] = null
        var prev: Seq[Any] = null
        var dup = false
        it.foreach { row =>
          sum += valueOf(row)
          val k = keyIdx.map(row.get)
          if (first == null) first = k
          if (prev == k) dup = true
          prev = k
        }
        Iterator((pid, sum, Option(first), Option(prev), dup))
      }
      .collect().sortBy(_._1)
    require(!totals.exists(_._5),
      s"scanOrdered keys (${keyCols.mkString(",")}) are not unique — " +
        "numbering would not be deterministic (SURVEY P13 contract)")
    totals.map(t => (t._3, t._4)).filter(_._1.isDefined).sliding(2).foreach {
      case Array((_, Some(lastA)), (Some(firstB), _)) =>
        require(lastA != firstB,
          s"scanOrdered keys (${keyCols.mkString(",")}) are not unique " +
            "(duplicate straddles a partition boundary)")
      case _ => ()
    }
    val offsets = totals.map(_._2).scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val withSum = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var acc = bc.value(pid)
      it.map { row => acc += valueOf(row); Row.fromSeq(row.toSeq :+ acc) }
    }
    spark.createDataFrame(withSum, sorted.schema.add(outCol, LongType))
  }
}
