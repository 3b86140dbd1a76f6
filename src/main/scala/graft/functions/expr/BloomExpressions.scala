package graft.functions.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-callable handles on Spark's OWN Bloom-filter expressions (the
  * machinery behind runtime row-level filtering): `BloomFilterAggregate`
  * builds the filter distributedly (map-side partial filters OR-merged
  * at the reducer — no corpus-sized collect anywhere), and
  * `BloomFilterMightContain` is a codegen'd membership probe against a
  * foldable binary filter. Both are public classes in spark-catalyst;
  * registering builders makes them reachable from `call_function`
  * without the non-public Expression→Column converters.
  *
  * Contract (mirrors Spark's runtime-filter injection): the value child
  * of BOTH expressions must be the `xxhash64(...)` of the probed column,
  * and the filter side of the probe must be foldable (a binary literal
  * holding the serialized filter).
  */
object BloomExpressions {
  /** Register SQL-callable forms once per session; idempotent.
    *   graft_bloom_agg(xxhash64(c), estItems, numBits) -> binary
    *   graft_bloom_contains(filterBytes, xxhash64(c))  -> boolean */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
