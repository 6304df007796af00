package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(Float/Double) columns using higher-order
  * functions (F16; SURVEY.md §2.11). `aggregate(zip_with(...))` folds the
  * array sequentially — deterministic summation order, unlike a shuffled
  * SUM — and stays inside Catalyst (no UDF serialization per row).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ — dot product, sequential fold (order-deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ (aᵢ−bᵢ)² — squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (‖a‖‖b‖) */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
