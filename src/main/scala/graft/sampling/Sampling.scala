package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * `df.sample()` / `rand(seed)` are seeded PER PARTITION, so the selected
  * rows change with partitioning and cluster size — useless for a
  * reproducible training mix or an oracle check. These operators decide
  * per ROW from a content hash: row r is sampled iff md5(key(r)) falls
  * below a threshold encoding the fraction. Properties:
  *
  *  - deterministic on any cluster, any partitioning, any engine with md5
  *    (the DuckDB oracle runs the identical predicate);
  *  - stable under corpus growth: a row's split never changes when other
  *    rows arrive (critical so yesterday's test set doesn't leak into
  *    tomorrow's train set);
  *  - map-side only — a filter/projection, no shuffle, no state.
  *
  * The threshold for fraction f is the 32-hex-digit string ⌊f·2¹²⁸⌋ —
  * md5 output is uniform over [0, 2¹²⁸), so P(md5 < threshold) = f to
  * 2⁻¹²⁸ precision. String comparison works because fixed-width lowercase
  * hex orders identically to the integers it encodes.
  */
object Sampling {

  private val Space = BigInt(1) << 128

  /** 32-hex-digit threshold = ⌊frac · 2¹²⁸⌋ (frac clamped to [0,1]). */
  def hexThreshold(frac: Double): String = {
    val f = math.min(math.max(frac, 0.0), 1.0)
    val t = (BigDecimal(Space) * BigDecimal(f)).toBigInt
    if (t >= Space) "g" // > any hex digit → selects everything
    else {
      val hex = t.toString(16)
      ("0" * (32 - hex.length)) + hex
    }
  }

  /** Keep each row with probability `frac`, decided by md5(key). */
  def deterministicSample(df: DataFrame, key: Column, frac: Double): DataFrame =
    df.filter(md5(key.cast("string")) < lit(hexThreshold(frac)))

  /** md5(key) mapped to a uniform double in [0,1) — for callers whose
    * sampling fraction is itself a column (e.g. cap/size per group) and so
    * can't be folded into a driver-side hex threshold. Uses the top 15 hex
    * digits (60 bits); the 2⁻⁵³ double precision loss is irrelevant for
    * sampling decisions.
    */
  def hashFrac(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("double") /
      lit(1.152921504606846976e18) // 16^15

  /** Assign every row a split label from `splits` (label → weight,
    * weights normalized to sum 1) by cumulative hash ranges:
    * train [0, w₁), val [w₁, w₁+w₂), ... — disjoint and exhaustive.
    */
  def hashSplit(df: DataFrame, key: Column,
                splits: Seq[(String, Double)],
                outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum > 0, "need non-negative weights, positive sum")
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
    val h = md5(key.cast("string"))
    // last split takes the remainder (floating cum may end at 0.9999…)
    val expr = splits.init.zip(cum.tail.init).foldLeft(when(lit(false), "")) {
      case (acc, ((label, _), upper)) =>
        acc.when(h < lit(hexThreshold(upper)), label)
    }.otherwise(lit(splits.last._1))
    df.withColumn(outCol, expr)
  }
}
