package graft

import org.apache.spark.sql.functions._
import graft.sampling.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("hexThreshold encodes fractions as ordered 32-hex-digit strings") {
    assert(Sampling.hexThreshold(0.0) == "0" * 32)
    assert(Sampling.hexThreshold(0.5) == "8" + "0" * 31)
    assert(Sampling.hexThreshold(1.0) == "g")
    assert(Sampling.hexThreshold(0.25) < Sampling.hexThreshold(0.75))
  }

  test("deterministicSample hits the fraction within tolerance, stable under repartition") {
    val a = Sampling.deterministicSample(ids, $"id", 0.3)
      .as[Long].collect().toSet
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    val b = Sampling.deterministicSample(ids.repartition(13), $"id", 0.3)
      .as[Long].collect().toSet
    assert(a == b)
  }

  test("nested samples: a smaller fraction is a subset of a larger one") {
    val small = Sampling.deterministicSample(ids, $"id", 0.1).as[Long].collect().toSet
    val big = Sampling.deterministicSample(ids, $"id", 0.4).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("hashSplit partitions rows exhaustively and disjointly at the weights") {
    val split = Sampling.hashSplit(ids, $"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    assert(counts.keySet == Set("train", "val", "test"))
    // growth stability: ids 0..999's split unchanged when 1000 more arrive
    val first = Sampling.hashSplit((0L until 1000L).toDF("id"), $"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first.forall { case (k, v) => grown(k) == v })
  }

  test("hashFrac lands in [0,1) and agrees with the hex-threshold decision") {
    val fracs = ids.select(Sampling.hashFrac($"id").as("f"))
      .as[Double].collect()
    assert(fracs.forall(f => f >= 0.0 && f < 1.0))
    // same sampling decision as deterministicSample for the same fraction
    // (hashFrac truncates md5 to 60 bits — a disagreement needs a key whose
    // top 60 bits sit exactly on the threshold, ~2⁻⁶⁰ per key)
    val viaFrac = ids.filter(Sampling.hashFrac($"id") < 0.3)
      .as[Long].collect().toSet
    val viaHex = Sampling.deterministicSample(ids, $"id", 0.3)
      .as[Long].collect().toSet
    assert(viaFrac == viaHex)
  }
}
