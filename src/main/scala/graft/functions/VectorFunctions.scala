package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives.
  *
  * Determinism: all arithmetic is IEEE double with an ascending-index
  * fold — the same sequential order DuckDB's list_dot_product uses —
  * so cosine scores are reproducible bit-for-bit across engines.
  *
  * The hot path (`dot`) is a custom codegen'd Catalyst expression
  * (expr.DotProduct): Spark's higher-order functions are
  * CodegenFallback (interpreted, boxing per element), which dominates
  * O(n²) similarity stages. Call `VectorFunctions.register(spark)` (or
  * expr.VectorExpressions.register) once per session before using it.
  */
object VectorFunctions {

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.expr.VectorExpressions.register(spark)

  /** Cast float embeddings up-front so every product is computed in
    * double (float*float would round differently). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Pure-builtin fallback form (no registration needed); same fold
    * order, interpreted. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit signature: 1 bit per dimension, no float arithmetic at
    * all — the random-hyperplane LSH with axis-aligned planes. Bucket on
    * a prefix for ANN candidate generation at scale. */
  def signBits(v: Column): Column =
    array_join(transform(v, x => when(x > 0, "1").otherwise("0")), "")
}
