package graft

import org.apache.spark.sql.functions._
import graft.nlp.text.Text

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("t").select(c).head.get(0)

  test("tokens lowercases, strips punct/digits, drops empties") {
    val got = Seq("Hello, World!  42 foo_bar").toDF("t")
      .select(Text.tokens($"t")).head.getSeq[String](0)
    assert(got == Seq("hello", "world", "foo_bar"))
  }

  test("tokens on empty/whitespace text yields empty array") {
    val got = Seq("  ", "").toDF("t")
      .select(Text.tokens($"t")).collect.map(_.getSeq[String](0))
    assert(got.forall(_.isEmpty))
  }

  test("removeStopwords drops exactly the stoplist") {
    val got = Seq("the quick fox and a dog").toDF("t")
      .select(Text.removeStopwords(Text.tokens($"t"))).head.getSeq[String](0)
    assert(got == Seq("quick", "fox", "dog"))
  }

  test("ngrams emits size-n shingles in order") {
    val got = Seq("a b c d").toDF("t")
      .select(Text.ngrams(Text.tokens($"t"), 3)).head.getSeq[String](0)
    assert(got == Seq("a b c", "b c d"))
  }

  test("ngrams on doc shorter than n is empty, not an error") {
    val got = Seq("a b").toDF("t")
      .select(Text.ngrams(Text.tokens($"t"), 3)).head.getSeq[String](0)
    assert(got.isEmpty)
  }

  test("lemma: irregulars, suffix rules, first-match-wins") {
    val in = Seq("children", "classes", "bodiesies", "running", "walked",
      "tables", "glass", "bus", "is").toDF("t")
    val got = in.select(graft.nlp.text.Text.lemma($"t")).collect.map(_.getString(0))
    assert(got.toSeq == Seq("child", "class", "bodiesy", "runn", "walk",
      "table", "glass", "bus", "is")) // "is"/"bus"/"glass" too short / s-suffixed
  }

  test("sentences splits on terminal punctuation") {
    val got = Seq("One two. Three! Four? five").toDF("t")
      .select(Text.sentences($"t")).head.getSeq[String](0)
    assert(got == Seq("One two.", "Three!", "Four?", "five"))
  }
}
