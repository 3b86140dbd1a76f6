package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-level equivalence of the native Catalyst expressions
  * against the interpreted Column compositions they replaced in round
  * 6. The oracle gate proves corpus-path parity and ExpressionSpec
  * pins hand-picked edge cases; these properties close the gap in
  * between — randomized arrays including NaN, ±Infinity, ±0, extreme
  * magnitudes and empties, asserting BIT-COMPATIBLE results (NaN-aware
  * equality) between the native expression and the composition the
  * queries used before the rewrite. Each trial evaluates a small batch
  * of rows in one Spark job so 15 trials stay cheap.
  */
class ExpressionPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def deq(a: Double, b: Double): Boolean = (a.isNaN && b.isNaN) || a == b
  private def seqEq(a: Seq[Double], b: Seq[Double]): Boolean =
    a.size == b.size && a.lazyZip(b).forall(deq)

  private val special = Seq(Double.NaN, Double.PositiveInfinity,
    Double.NegativeInfinity, 0.0, -0.0, 1e300, -1e-300)
  private val elemGen: Gen[Double] =
    Gen.frequency(8 -> Gen.chooseNum(-1000.0, 1000.0), 2 -> Gen.oneOf(special))
  private def vecGen(maxLen: Int): Gen[List[Double]] =
    Gen.chooseNum(0, maxLen).flatMap(n => Gen.listOfN(n, elemGen))

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  /** The interpreted compositions predate ANSI mode: x / 0.0 must give
    * the IEEE Inf/NaN the native expressions reproduce, not the ANSI
    * DIVIDE_BY_ZERO error (zero vectors / zero scales never occur in
    * the corpus, which is why the queries run fine under ANSI — the
    * equivalence contract is the IEEE semantics both paths share). */
  private def withoutAnsi[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try body finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("property: graft_dot ≡ aggregate(zip_with(*)) left fold (incl NaN/Inf/empty)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // equal lengths: the interpreted zip_with form was only ever used
    // on equal-dim embeddings (the min-length native behavior is pinned
    // separately in ExpressionSpec)
    val pairGen = for {
      n <- Gen.chooseNum(0, 12)
      a <- Gen.listOfN(n, elemGen); b <- Gen.listOfN(n, elemGen)
    } yield (a, b)
    val prop = Prop.forAll(Gen.listOfN(6, pairGen)) { random =>
      val rows = (List.empty[Double], List.empty[Double]) ::
        (List(0.0, -0.0), List(Double.NaN, 1.0)) :: random
      rows.toDF("a", "b").select(
        call_function("graft_dot", col("a"), col("b")).as("nat"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("itp"))
        .collect().forall(r => deq(r.getDouble(0), r.getDouble(1)))
    }
    check(prop)
  }

  test("property: graft_unit ≡ transform(x / sqrt(dot(e,e))) (incl zero/NaN/Inf/empty)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val prop = Prop.forAll(Gen.listOfN(6, vecGen(12))) { random => withoutAnsi {
      val rows = List.empty[Double] :: List(Double.PositiveInfinity, 1.0) :: random
      rows.toDF("e").select(col("e"),
        call_function("graft_unit", col("e")).as("nat"),
        transform(col("e"), x => x / sqrt(
          aggregate(zip_with(col("e"), col("e"), (p, q) => p * q),
            lit(0.0), (acc, v) => acc + v))).as("itp"))
        .collect().forall { r =>
          val e = r.getAs[scala.collection.Seq[Double]](0)
          // exactly-zero norm (all-zero vector, or denormals whose
          // squares underflow to 0) is OUTSIDE the shared domain:
          // Spark's Divide returns NULL for a zero divisor in
          // non-ANSI mode (never IEEE x/0), while the native pass
          // gives the IEEE NaN the callers treat as never-matching —
          // that divergence is pinned in ExpressionSpec
          e.map(v => v * v).sum == 0.0 && e.nonEmpty ||
            seqEq(r.getAs[scala.collection.Seq[Double]](1).toSeq,
              r.getAs[scala.collection.Seq[Double]](2).toSeq)
        }
    } }
    check(prop)
  }

  test("property: graft_sq8 ≡ array_max(abs) + round HALF_UP reconstruction (incl NaN/Inf/empty)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val prop = Prop.forAll(Gen.listOfN(6, vecGen(12))) { random => withoutAnsi {
      val rows = List.empty[Double] :: List(2.5, -2.5, 127.0) ::
        List(Double.NaN, 1.0) :: random
      def interpScale(e: Column) = array_max(transform(e, x => abs(x)))
      rows.toDF("e").select(col("e"),
        call_function("graft_sq8", col("e")).as("nat"),
        struct(
          interpScale(col("e")).as("scale"),
          transform(col("e"),
            x => round(x / interpScale(col("e")) * 127) * interpScale(col("e")) / 127)
            .as("r")).as("itp"))
        .collect().forall { r =>
          val e = r.getAs[scala.collection.Seq[Double]](0)
          val (n, i) = (r.getStruct(1), r.getStruct(2))
          val scaleOk =
            if (n.isNullAt(0) || i.isNullAt(0)) n.isNullAt(0) == i.isNullAt(0)
            else deq(n.getDouble(0), i.getDouble(0))
          // all-zero input ⇒ scale 0: same zero-divisor domain edge as
          // graft_unit (Spark Divide → NULL, native → IEEE NaN); the
          // corpus never quantizes a zero vector
          e.nonEmpty && e.forall(_ == 0.0) ||
            (scaleOk && seqEq(n.getAs[scala.collection.Seq[Double]](1).toSeq,
              i.getAs[scala.collection.Seq[Double]](1).toSeq))
        }
    } }
    check(prop)
  }

  test("property: graft_hamming ≡ interpreted per-char diff + length delta (incl empty/unequal)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val bitsGen = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('0', '1')).map(_.mkString))
    val pairGen = for { a <- bitsGen; b <- bitsGen } yield (a, b)
    val prop = Prop.forAll(Gen.listOfN(8, pairGen)) { random =>
      val rows = ("", "") :: ("", "101") :: ("1100", "1010") :: random
      def interp(a: Column, b: Column): Column = {
        val n = least(length(a), length(b))
        val diffs = when(n === 0, lit(0)).otherwise(
          aggregate(zip_with(slice(split(a, ""), lit(1), n), slice(split(b, ""), lit(1), n),
            (x, y) => when(x === y, 0).otherwise(1)), lit(0), (acc, v) => acc + v))
        abs(length(a) - length(b)) + diffs
      }
      rows.toDF("a", "b").select(
        call_function("graft_hamming", col("a"), col("b")).as("nat"),
        interp(col("a"), col("b")).as("itp"))
        .collect().forall(r => r.getInt(0) == r.getInt(1))
    }
    check(prop)
  }
}
