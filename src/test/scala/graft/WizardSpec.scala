package graft

import org.apache.spark.sql.functions._
import graft.wizard.{Topics, Sentiment, Ner, Medoids}
import graft.nlp.text.Text

class WizardSpec extends SparkSpec {
  import spark.implicits._

  test("cTfIdf matches hand-computed scores on a tiny corpus") {
    // cluster A: "x x y" ; cluster B: "y z". m = 2 docs total.
    val df = Seq(("A", "x x y"), ("B", "y z")).toDF("cl", "text")
    val got = Topics.cTfIdf(df, "cl", Text.tokens($"text"))
      .select($"cl", $"term", $"score")
      .collect.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // t(A,x)=2, clusterTotal(A)=3, termTotal(x)=2 -> (2/3)*ln(2/2)=0
    assert(math.abs(got(("A", "x"))) < 1e-12)
    // t(A,y)=1, total 3, termTotal(y)=2 -> (1/3)*ln(1) = 0
    assert(math.abs(got(("A", "y"))) < 1e-12)
    // t(B,z)=1, clusterTotal(B)=2, termTotal(z)=1 -> (1/2)*ln(2)
    assert(math.abs(got(("B", "z")) - 0.5 * math.log(2)) < 1e-12)
  }

  test("topTerms returns at most n per cluster, ranked desc with term tiebreak") {
    val df = Seq(("A", "a a a b b c"), ("B", "d d e")).toDF("cl", "text")
    val got = Topics.topTerms(df, "cl", Text.tokens($"text"), 2)
    assert(got.groupBy($"cl").count().collect.forall(_.getLong(1) <= 2))
    val ranks = got.filter($"cl" === "A").orderBy($"rk").collect.map(_.getInt(1))
    assert(ranks.toSeq == Seq(1, 2))
  }

  test("sentiment scores each distinct text once and joins back") {
    val df = Seq((0, "fast big win"), (1, "fast big win"), (2, "slow crash day"),
      (3, "mixed bag here")).toDF("id", "text")
    val got = Sentiment.score(df, "text", "s")
      .collect.map(r => r.getAs[Int]("id") -> r.getAs[Int]("s")).toMap
    assert(got(0) == 2 && got(1) == 2) // positive, dup agrees
    assert(got(2) == 0)                // negative
    assert(got(3) == 1)                // neutral
  }

  test("ner weighted zones: title weight dominates body count") {
    val df = Seq(("A", Seq("apple"), Seq("banana", "banana"))).toDF("cl", "title", "body")
    val got = Ner.topEntities(df, "cl",
        Seq((col("title"), 3), (col("body"), 1)), minLen = 4, n = 2)
      .orderBy($"rk").collect.map(r => (r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("apple", 3L), ("banana", 2L)))
  }

  test("medoids byCentroid picks the central point") {
    // cluster 0: points at 0, 1, 10 on a line -> centroid 11/3≈3.67, closest is 1
    val df = Seq(
      (0L, 0, Array(0.0f)), (1L, 0, Array(1.0f)), (2L, 0, Array(10.0f)),
      (3L, 1, Array(5.0f)), (4L, 1, Array(6.0f))
    ).toDF("id", "cl", "vec")
    val got = Medoids.byCentroid(df, "id", "cl", "vec", 1)
      .collect.map(r => r.getInt(1) -> r.getLong(0)).toMap
    assert(got(0) == 1L)
    assert(Set(3L, 4L).contains(got(1)))
  }

  test("medoids byPairwise picks min mean-pairwise-distance point") {
    // 0,1,2 at x=0,1,4: mean dists 0:(1+4)/2=2.5, 1:(1+3)/2=2, 2:(4+3)/2=3.5
    val df = Seq(
      (0L, 0, Array(0.0f)), (1L, 0, Array(1.0f)), (2L, 0, Array(4.0f))
    ).toDF("id", "cl", "vec")
    val got = Medoids.byPairwise(df, "id", "cl", "vec", 1).head
    assert(got.getLong(0) == 1L)
  }

  test("medoids byPairwise caps oversized clusters by deterministic subsample") {
    val df = (0 until 60).map(i => (i.toLong, 0, Array(i.toFloat)))
      .toDF("id", "cl", "vec")
    // capped run == exact medoids over the md5(id) hash-sample subset
    val capped = Medoids.byPairwise(df, "id", "cl", "vec", 2, maxClusterSize = 10)
    val sample = df.filter(graft.sampling.Sampling.hashFrac($"id") < 10.0 / 60)
    assert(sample.count() < 60) // the cap actually bit
    val expected = Medoids.byPairwise(sample, "id", "cl", "vec", 2)
    assert(capped.collect.toSet == expected.collect.toSet)
    // clusters at/under the cap are bit-identical to the unguarded form
    val atCap = Medoids.byPairwise(df, "id", "cl", "vec", 2, maxClusterSize = 60)
    val full = Medoids.byPairwise(df, "id", "cl", "vec", 2)
    assert(atCap.collect.toSet == full.collect.toSet)
    // a cap that can't yield n medoids is a loud config error
    intercept[IllegalArgumentException] {
      Medoids.byPairwise(df, "id", "cl", "vec", 5, maxClusterSize = 3)
    }
  }
}
