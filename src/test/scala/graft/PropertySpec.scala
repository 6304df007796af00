package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.clean.Cleaner
import graft.dedup.Dedup
import graft.nlp.text.{Text, TextStats}
import graft.wizard.Topics

/** Property-style suites (SURVEY.md §5.2.2): ScalaCheck generators build a
  * messy corpus once (fixed seed — deterministic CI), each property is
  * asserted over the whole frame in one Spark pass (per-case Spark jobs
  * would be 100× slower for the same coverage).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "the", "a",
    "subscribe", "cookie", "x", "Data2", "naïve", "foo-bar", "", " ")
  private val textGen = Gen.chooseNum(0, 60)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private val corpus: Seq[String] = {
    val seed = rng.Seed(42L)
    Gen.listOfN(120, textGen).apply(Gen.Parameters.default, seed).get
  }
  private lazy val df = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text").cache()

  test("property: clean is idempotent and only shrinks") {
    val t = df.withColumn("title", $"text").withColumn("paragraph", $"text")
    val once = Cleaner.clean(t, Seq("title", "paragraph")).cache()
    val twice = Cleaner.clean(once, Seq("title", "paragraph"))
    assert(once.count() <= t.count())
    assert(twice.count() == once.count())
    assert(twice.exceptAll(once).count() == 0)
  }

  test("property: tokens are lowercase, non-empty, digit/punct-free") {
    val bad = df.select(explode(Text.tokens($"text")).as("t"))
      .filter($"t" === "" || $"t" =!= lower($"t") || $"t".rlike("[0-9]|[^\\w]"))
    assert(bad.count() == 0)
  }

  test("property: ngram count = max(tokens - n + 1, 0)") {
    val n = 3
    val bad = df.select(size(Text.tokens($"text")).as("nt"),
        size(Text.ngrams(Text.tokens($"text"), n)).as("ns"))
      .filter($"ns" =!= greatest($"nt" - (n - 1), lit(0)))
    assert(bad.count() == 0)
  }

  test("property: exact dedup partitions the id space") {
    val g = Dedup.exact(df, "doc_id", "text")
    assert(g.agg(sum($"n_dups")).head.getLong(0) == df.count())
    assert(g.count() == df.select("text").distinct().count())
  }

  test("property: minhash yields exactly numHashes rows per doc with shingles") {
    val sig = Dedup.minHashSignatures(df, "doc_id", "text", 3, 6)
    val counts = sig.groupBy($"doc_id").count().select("count").distinct()
      .as[Long].collect().toSet
    assert(counts.subsetOf(Set(6L)))
    val withShingles = df
      .filter(size(Text.tokens($"text")) >= 3).count()
    assert(sig.select("doc_id").distinct().count() == withShingles)
  }

  test("property: estimated and exact jaccard live in [0,1]") {
    val sig = Dedup.minHashWide(df, "doc_id", "text", 3, 6).cache()
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 2).cache()
    assert(pairs.filter($"est_jaccard" < 0 || $"est_jaccard" > 1).count() == 0)
    val ver = Dedup.verifyPairs(pairs, df, "doc_id", "text")
    assert(ver.filter($"jaccard" < 0 || $"jaccard" > 1).count() == 0)
  }

  test("property: connectedComponents matches a reference union-find on random graphs") {
    // 150 random edges over 60 nodes (fixed seed): mixed chains, cliques,
    // singletons-by-absence — checked against an in-memory reference for
    // BOTH physical paths (single-task union-find and iterative label
    // propagation)
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 59L)
      b0 <- Gen.chooseNum(0L, 58L)
    } yield { // shift avoids a==b without a filter (filters can exhaust Gen)
      val b = if (b0 >= a) b0 + 1 else b0
      (math.min(a, b), math.max(a, b))
    }
    val edges = Gen.listOfN(150, edgeGen)
      .apply(Gen.Parameters.default, rng.Seed(7L)).get.distinct
    val expected: Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val pairsDf = edges.toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairsDf, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expected)
    assert(dist == expected)
  }

  test("property: topTerms emits at most n per cluster with rk 1..n dense") {
    val clustered = df.withColumn("cl", ($"doc_id" % 5).cast("int"))
    val top = Topics.topTerms(clustered, "cl", Text.tokens($"text"), 7).cache()
    val sizes = top.groupBy($"cl").agg(count(lit(1)).as("n"), max($"rk").as("mx"))
    assert(sizes.filter($"n" > 7 || $"mx" =!= $"n").count() == 0)
  }

  test("property: quality score bounded in [0,1], ratios valid") {
    val q = TextStats.qualityScore(df, "text")
    assert(q.filter($"quality" < 0 || $"quality" > 1).count() == 0)
    assert(q.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() == 0)
    assert(q.filter($"n_distinct" > $"n_tokens").count() == 0)
  }
}
