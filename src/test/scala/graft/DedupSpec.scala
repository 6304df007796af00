package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),
    (1L, "alpha beta gamma delta epsilon zeta"),          // exact dup of 0
    (2L, "alpha beta gamma delta epsilon eta"),           // near dup of 0
    (3L, "one two three four five six seven eight nine")  // unrelated
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val got = Dedup.exact(docs, "doc_id", "text")
    assert(got.count() == 3)
    val dupRow = got.filter($"n_dups" === 2).head
    assert(dupRow.getAs[Long]("keep_id") == 0L)
  }

  test("identical docs share the full minhash signature") {
    val sig = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 8)
    assert(sig.filter($"doc_id" === 0).count() == 8)
    val s0 = sig.filter($"doc_id" === 0).orderBy($"seed").collect.map(_.getString(2))
    val s1 = sig.filter($"doc_id" === 1).orderBy($"seed").collect.map(_.getString(2))
    assert(s0.toSeq == s1.toSeq)
  }

  test("LSH emits the exact-dup pair; estimate and exact jaccard agree at 1.0") {
    val sig = Dedup.minHashWide(docs, "doc_id", "text", 3, 8)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 2)
    val got = pairs.collect.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)))
    assert(!got.exists { case (a, b) => b == 3L || a == 3L })
    val est = pairs
      .filter($"doc_a" === 0 && $"doc_b" === 1).head.getDouble(2)
    assert(est == 1.0)
    val exact = Dedup.verifyPairs(pairs, docs, "doc_id", "text")
      .filter($"doc_a" === 0 && $"doc_b" === 1).head.getDouble(2)
    assert(exact == 1.0)
  }

  test("emit-once: exact dups agree in all bands but the pair appears once") {
    // docs 0/1 share the full signature → every band matches; without the
    // first-band filter the join would emit the pair once per band
    val sig = Dedup.minHashWide(docs, "doc_id", "text", 3, 8)
    val rows = Dedup.lshCandidatePairs(sig, "doc_id", 2)
      .filter($"doc_a" === 0 && $"doc_b" === 1).collect()
    assert(rows.length == 1)
    val sh = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 3)
      .filter($"doc_a" === 0 && $"doc_b" === 1).collect()
    assert(sh.length == 1)
  }

  test("minhash values are 8-hex 32-bit words; sig shorter than a band emits nothing") {
    val wide = Dedup.minHashWide(docs, "doc_id", "text", 3, 8)
    assert(wide.select(explode($"sig")).collect
      .forall(_.getString(0).matches("[0-9a-f]{8}")))
    // ADVICE r03: nBands=0 must yield no bands, not a band=-1 garbage row
    val shortSig = Seq((1L, Seq("aaaaaaaa")), (2L, Seq("aaaaaaaa")))
      .toDF("doc_id", "sig")
    assert(Dedup.lshCandidatePairs(shortSig, "doc_id", bandRows = 2).count() == 0)
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatePairs(wide, "doc_id", bandRows = 0)
    }
  }

  test("wide and row-grain minhash signatures agree") {
    val wide = Dedup.minHashWide(docs, "doc_id", "text", 3, 8)
      .collect.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val narrow = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 8)
      .collect.groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    assert(wide.view.mapValues(_.toSeq).toMap == narrow)
  }

  test("simhash: 64 bits, equal for dups, close for near-dups, far for unrelated") {
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(sh(0L) == sh(1L))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(sh(0L), sh(2L)) < ham(sh(0L), sh(3L)))
  }

  test("connectedComponents merges chains and keeps singletons apart") {
    // 1-2, 2-3 chain; 5-6 pair; 8-9, 9-10, 8-10 triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L), (8L, 10L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      8L -> 8L, 9L -> 8L, 10L -> 8L))
  }

  test("connectedComponents on an empty pair graph returns an empty frame") {
    // ADVICE r02: the Observation-based convergence sum is null on zero
    // rows — must short-circuit, not NPE.
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
    assert(got.columns.toSeq == Seq("doc_id", "component"))
    assert(got.count() == 0)
  }

  test("connectedComponents distributed path agrees with union-find path") {
    // force the iterative branch with a threshold below the edge count
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (12L, 11L))
      .toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(pairs)
      .collect.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, localEdgeThreshold = 0L)
      .collect.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("verifyPairs with shingles: stricter than unigram jaccard on reordered text") {
    val reordered = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "delta gamma beta alpha")   // same unigrams, no shared 2-grams
    ).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val uni = Dedup.verifyPairs(pairs, reordered, "doc_id", "text").head.getDouble(2)
    assert(uni == 1.0)
    val bi = Dedup.verifyPairs(pairs, reordered, "doc_id", "text", ngramSize = 2)
    assert(bi.count() == 0) // zero shared bigrams -> pair never joins
  }

  test("verifyPairs semi-join prune: non-participant docs change nothing") {
    // r21: the gram-set projection runs only over docs that appear in a
    // candidate pair — verify the prune is output-invariant by adding
    // corpus rows no pair references.
    val base = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val extra = base.unionByName(Seq(
      (7L, "totally unrelated words here"),
      (8L, "more bystander text rows")).toDF("doc_id", "text"))
    val pairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val a = Dedup.verifyPairs(pairs, base, "doc_id", "text").collect().toSeq
    val b = Dedup.verifyPairs(pairs, extra, "doc_id", "text").collect().toSeq
    assert(a == b && a.size == 1)
  }

  test("simhashNearDup: exact dups at hamming 0, unrelated docs excluded") {
    val got = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 3)
      .collect.map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.get((0L, 1L)).contains(0))
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("jaccardWithinGroups computes exact set jaccard") {
    val grouped = docs.withColumn("g", lit("x"))
    val j = Dedup.jaccardWithinGroups(grouped, "doc_id", "text", Seq("g"))
      .filter($"doc_a" === 0 && $"doc_b" === 2).head.getDouble(2)
    assert(math.abs(j - 5.0 / 7.0) < 1e-12) // 5 shared of 7 distinct tokens
  }
}
