package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExactAgg

/** ExactAgg.chunkedSums must equal a direct decimal(38,0) sum on any
  * input — the chunked long re-sum is exact integer arithmetic, so the
  * equality is bit-for-bit, not approximate. Randomized over signed
  * magnitudes up to the documented 2^44 per-row bound, skewed group
  * sizes, and row counts that straddle chunk boundaries.
  */
class ExactAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dec38 = DecimalType(38, 0)

  private def directSums(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "a", "b")
      .groupBy("k")
      .agg(sum(col("a").cast(dec38)).as("a"), sum(col("b").cast(dec38)).as("b"),
        count(lit(1)).as("_cnt"))
      .collect().map(r => (r.getString(0),
        (r.getDecimal(1), r.getDecimal(2), r.getLong(3)))).toMap
  }

  private def chunked(rows: Seq[(String, Long, Long)], partitions: Int) = {
    import spark.implicits._
    val df = rows.toDF("k", "a", "b").repartition(partitions)
    ExactAgg.chunkedSums(df, Seq("k"), Seq("a", "b"))
      .collect().map(r => (r.getString(0),
        (r.getDecimal(1), r.getDecimal(2), r.getLong(3)))).toMap
  }

  test("empty input produces no groups") {
    import spark.implicits._
    val out = ExactAgg.chunkedSums(
      Seq.empty[(String, Long)].toDF("k", "a"), Seq("k"), Seq("a"))
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("k", "a", "_cnt"))
  }

  test("measure dtype is decimal(38,0), count is long") {
    import spark.implicits._
    val out = ExactAgg.chunkedSums(
      Seq(("x", 1L)).toDF("k", "a"), Seq("k"), Seq("a"))
    assert(out.schema("a").dataType === dec38)
    assert(out.schema("_cnt").dataType.typeName === "long")
  }

  test("extreme per-row magnitudes at the documented bound stay exact") {
    // every row at ±(2^44 - 1): the worst case the contract allows
    val m = ExactAgg.MaxRowMagnitude - 1
    val rows = Seq.fill(64)(("hot", m, -m)) ++ Seq.fill(64)(("hot", -m, m))
    assert(chunked(rows, 3) === directSums(rows))
  }

  test("property: chunkedSums ≡ direct decimal sum (signed, skewed, multi-partition)") {
    val keyGen = Gen.frequency(6 -> Gen.const("hot"), 3 -> Gen.oneOf("a", "b"),
      1 -> Gen.alphaLowerStr.map(_.take(3)))
    val vGen = Gen.frequency(
      7 -> Gen.chooseNum(-1000000L, 1000000L),
      3 -> Gen.chooseNum(-(ExactAgg.MaxRowMagnitude - 1), ExactAgg.MaxRowMagnitude - 1))
    val rowsGen = for {
      n <- Gen.chooseNum(0, 400)
      rows <- Gen.listOfN(n, Gen.zip(keyGen, vGen, vGen))
      parts <- Gen.chooseNum(1, 7)
    } yield (rows, parts)
    val prop = Prop.forAll(rowsGen) { case (rows, parts) =>
      chunked(rows, parts) == directSums(rows)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
