package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness of the custom TopKPerKey operator against the window
  * formulation it replaces, on inputs that stress the heap logic:
  * many input partitions (partial pass sees each key several times),
  * keys with fewer than k rows, duplicate sort values with tie-breaks,
  * and negative/descending orders. */
class TopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def windowTop(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .drop("rk").as[(Long, Long, Double)].collect().toSet
  }

  private def heapTop(df: org.apache.spark.sql.DataFrame, k: Int) =
    graft.plans.GraftOps.topKPerKey(df, Seq("key"), k, "-v", "+id")
      .as[(Long, Long, Double)].collect().toSet

  test("matches the window form on a many-partition skewed input") {
    val df = spark.range(0, 5000).select(
      (col("id") % 7).as("key"), col("id"),
      ((col("id") * 37 % 101).cast("double")).as("v"))
      .repartition(13)
    assert(heapTop(df, 5) == windowTop(df, 5))
  }

  test("keys with fewer than k rows keep all their rows") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 2.0), (2L, 20L, 5.0))
      .toDF("key", "id", "v").repartition(4)
    assert(heapTop(df, 3) == Set((1L, 10L, 1.0), (1L, 11L, 2.0), (2L, 20L, 5.0)))
  }

  test("ties resolve by the tie-break column, exactly as the window") {
    // every v identical: top-k must be the k smallest ids per key
    val df = spark.range(0, 400).select(
      (col("id") % 3).as("key"), col("id"), lit(1.0).as("v"))
      .repartition(8)
    assert(heapTop(df, 4) == windowTop(df, 4))
  }

  test("k of 1 selects exactly the per-key argmax") {
    val df = spark.range(0, 1000).select(
      (col("id") % 50).as("key"), col("id"),
      (col("id") % 997).cast("double").as("v")).repartition(6)
    assert(heapTop(df, 1) == windowTop(df, 1))
  }
}
