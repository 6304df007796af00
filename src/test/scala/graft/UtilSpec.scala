package graft

import org.apache.spark.sql.functions._
import graft.util.Ids
import graft.functions.VecAgg

class UtilSpec extends SparkSpec {
  import spark.implicits._

  test("denseIndex assigns 0..n-1 in key order, distributed") {
    val df = Seq("delta", "alpha", "echo", "bravo", "charlie")
      .toDF("k").repartition(4)
    val got = Ids.denseIndex(df, "idx", "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha" -> 0L, "bravo" -> 1L, "charlie" -> 2L,
      "delta" -> 3L, "echo" -> 4L))
  }

  test("denseIndex is stable across input partitioning") {
    val rows = (0 until 500).map(i => f"key_$i%04d")
    val a = Ids.denseIndex(rows.toDF("k").repartition(7), "idx", "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Ids.denseIndex(rows.toDF("k").repartition(13), "idx", "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (0L until 500L))
  }

  test("saltedJoin equals the plain join on skewed keys") {
    // 900 of 1000 rows share one hot key
    val big = (0 until 1000)
      .map(i => (if (i < 900) "hot" else s"k$i", i.toLong)).toDF("k", "id")
    val small = Seq(("hot", 1.0), ("k950", 2.0), ("absent", 3.0)).toDF("k", "w")
    val plain = big.join(small, Seq("k"), "inner")
      .select($"k", $"id", $"w").collect().map(_.toSeq).toSet
    val salted = Ids.saltedJoin(big, small, "k", "id", salts = 8)
      .select($"k", $"id", $"w").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 901)
  }

  test("prefixSum equals the single-partition window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 300).map(i => ((i * 7 % 300).toLong, (i % 13 + 1).toLong))
      .toDF("k", "v").repartition(5)
    val got = Ids.prefixSum(df, "cum", "v", "k")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = df.withColumn("cum",
        sum($"v").over(Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("denseIndex/prefixSum reject duplicate keys loudly") {
    // ADVICE r03: with non-unique keys a recomputed block could land ties
    // in a different range partition — assert instead of documenting
    val df = Seq("a", "b", "b", "c").toDF("k").repartition(3)
    val e = intercept[IllegalArgumentException] {
      Ids.denseIndex(df, "idx", "k").collect()
    }
    assert(e.getMessage.contains("not unique"))
  }

  test("vecAvg computes the element-wise mean per group") {
    val df = Seq(
      ("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 6.0)), ("b", Seq(10.0, 20.0))
    ).toDF("g", "v")
    val got = df.groupBy($"g").agg(VecAgg.vecAvg($"v").as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(2.0, 4.0))
    assert(got("b") == Seq(10.0, 20.0))
  }

  test("vecAvg fails loudly on ragged vector lengths") {
    // ADVICE r03: min(length) truncation was a silently-wrong mean
    val df = Seq(("a", Seq(1.0, 2.0)), ("a", Seq(3.0))).toDF("g", "v")
    val e = intercept[Throwable] {
      df.groupBy($"g").agg(VecAgg.vecAvg($"v").as("c")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("length mismatch")))
  }

  test("vecAvg ignores null vectors; all-null group yields null") {
    val df = Seq(
      ("a", Option(Seq(2.0, 4.0))), ("a", None), ("b", None)
    ).toDF("g", "v")
    val got = df.groupBy($"g").agg(VecAgg.vecAvg($"v").as("c"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq)
      .contains(Seq(2.0, 4.0)))
    assert(got("b").isEmpty)
  }
}
