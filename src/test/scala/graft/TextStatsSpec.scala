package graft

import org.apache.spark.sql.functions._
import graft.nlp.text.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("qualityScore features on a known doc") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val r = TextStats.qualityScore(df, "text").head
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct") == 5)   // "the" twice
    // stopwords in list: the, on, the -> 3/6
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
    assert(r.getAs[Double]("quality") > 0 && r.getAs[Double]("quality") <= 1)
  }

  test("tokenCounts three ways") {
    val df = Seq((1L, "ab cd ef")).toDF("id", "text")
    val r = TextStats.tokenCounts(df, "text").head
    assert(r.getAs[Long]("tokens_ws") == 3)
    assert(r.getAs[Long]("tokens_re") == 3)
    assert(r.getAs[Long]("tokens_bpe_est") == 2) // ceil(8/4)
  }

  test("winnowFingerprint: deterministic, edit-sensitive, dup-invariant") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota")
    ).toDF("id", "text")
    val fp = TextStats.winnowFingerprint(df, "id", "text")
      .collect.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("winnowFingerprint skips docs shorter than k tokens") {
    val df = Seq((0L, "a b"), (1L, "a b c d")).toDF("id", "text")
    val ids = TextStats.winnowFingerprint(df, "id", "text")
      .collect.map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("langIdByTrigram: short docs get null prediction; empty profile corpus safe") {
    // doc 2 is under 3 chars → no trigrams → excluded from profile AND
    // classified null ('und' at the query layer)
    val df = Seq((1L, "aaa bbb aaa bbb", "aa"), (2L, "x", "aa"))
      .toDF("id", "text", "lang")
    val got = TextStats.langIdByTrigram(df, "id", "text", "lang", 5)
      .collect.map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got(1L).contains("aa"))
    assert(got(2L).isEmpty)
    // all-short corpus → empty profile → all predictions null, no crash
    val empty = Seq((1L, "x", "aa"), (2L, "yz", "bb")).toDF("id", "text", "lang")
    val got2 = TextStats.langIdByTrigram(empty, "id", "text", "lang", 5)
    assert(got2.count() == 2)
    assert(got2.filter($"pred_lang".isNotNull).count() == 0)
  }

  test("langIdByTrigram recovers the language on separable corpora") {
    // two 'languages' with disjoint character distributions
    val aa = (1 to 8).map(i => (i.toLong, "aaa bbb aab abb baa " + "ab" * i, "aa"))
    val zz = (9 to 16).map(i => (i.toLong, "zzz yyy zzy zyy yzz " + "zy" * i, "zz"))
    val df = (aa ++ zz).toDF("id", "text", "lang")
    val got = TextStats.langIdByTrigram(df, "id", "text", "lang", 10)
    val acc = got.filter($"correct").count().toDouble / got.count()
    assert(acc == 1.0)
  }
}
