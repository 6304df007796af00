package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** Typed UDAFs for vector columns (SURVEY.md §2.11 — the one place a custom
  * `Aggregator` genuinely beats built-ins).
  *
  * Element-wise vector mean: the relational alternative posexplodes every
  * dimension of every row and shuffles (cluster, dim)-grain rows — dims×
  * the data — then needs a join to reassemble. This Aggregator keeps a
  * (Σ, n) buffer per group: partial sums combine map-side (ObjectHashAgg),
  * so the exchange carries one dims-length array per (group × partition),
  * independent of row count. At 100 TB that is the difference between
  * shuffling the corpus ×dims and shuffling |clusters × partitions| tiny
  * buffers.
  */
object VecAgg {

  private class VecAvgAgg
      extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

    def reduce(b: (Array[Double], Long), a: Seq[Double]): (Array[Double], Long) =
      if (a == null) b
      else {
        val s = if (b._1.isEmpty) new Array[Double](a.length) else b._1
        // ragged input is a data bug — truncating to min(length) would
        // silently drop trailing dims while still counting the row
        // (ADVICE r03): fail loudly instead
        require(s.length == a.length,
          s"vecAvg: vector length mismatch (${a.length} vs ${s.length})")
        var i = 0
        while (i < s.length) { s(i) += a(i); i += 1 }
        (s, b._2 + 1)
      }

    def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
      if (x._1.isEmpty) y
      else if (y._1.isEmpty) x
      else {
        require(x._1.length == y._1.length,
          s"vecAvg: vector length mismatch (${y._1.length} vs ${x._1.length})")
        var i = 0
        while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }

    def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0L) null
      else {
        val out = new Array[Double](b._1.length)
        var i = 0
        while (i < b._1.length) { out(i) = b._1(i) / b._2; i += 1 }
        out.toSeq
      }

    def bufferEncoder: ExpressionEncoder[(Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: ExpressionEncoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** `vecAvg(col)` — element-wise mean of an `array<double>` column
    * (cast float vectors first). Null/empty groups yield null.
    */
  val vecAvg: UserDefinedFunction = udaf(new VecAvgAgg)
}
