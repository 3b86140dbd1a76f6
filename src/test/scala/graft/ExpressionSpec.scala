package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case pins for the native expressions. The oracle gate proves
  * corpus-path parity, but the synthetic corpus contains no empty
  * arrays, 1-word docs, or zero vectors — these inputs only ever show
  * up in production data, so their behavior is pinned here. */
class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("shingles2: empty for <2 words, space-joined pairs otherwise") {
    import spark.implicits._
    graft.functions.expr.TextExpressions.register(spark)
    def gs(words: Seq[String]): Seq[String] =
      one[scala.collection.Seq[String]](Seq(words).toDF("ws")
        .select(call_function("graft_shingles2", col("ws")))).toSeq
    assert(gs(Nil) === Nil)
    assert(gs(Seq("a")) === Nil) // NOT the sequence(0,-1) null garbage
    assert(gs(Seq("a", "b")) === Seq("a b"))
    assert(gs(Seq("a", "b", "c")) === Seq("a b", "b c"))
  }

  test("maxfreq: null on empty, exact count under ties and runs") {
    import spark.implicits._
    graft.functions.expr.TextExpressions.register(spark)
    def mf(xs: Seq[String]): Any =
      Seq(xs).toDF("xs").select(call_function("graft_maxfreq", col("xs")))
        .collect().head.get(0)
    assert(mf(Nil) === null) // matches array_max over no elements
    assert(mf(Seq("a")) === 1)
    assert(mf(Seq("a", "b", "a", "b")) === 2) // tie — count, not element
    assert(mf(Seq("x", "x", "x", "y")) === 3)
  }

  test("entropy_q: null on empty, known values, order-free, uniform = ln(k)") {
    import spark.implicits._
    graft.functions.expr.TextExpressions.register(spark)
    def eq(xs: Seq[String]): Any =
      Seq(xs).toDF("xs").select(call_function("graft_entropy_q", col("xs")))
        .collect().head.get(0)
    assert(eq(Nil) === null)
    assert(eq(Seq("a")) === 0L) // p=1 → 1·ln(1) = 0
    // uniform over 4 distinct: H = ln(4); each term = 0.25·ln(0.25)·1e9
    val term = { val v = 0.25 * math.log(0.25) * 1e9; -math.round(-v) }
    assert(eq(Seq("a", "b", "c", "d")) === 4 * term)
    // permutation invariance (the order-free quantized fold)
    assert(eq(Seq("a", "a", "b", "c")) === eq(Seq("c", "b", "a", "a")))
    // skewed: (3/4)ln(3/4) + (1/4)ln(1/4), per-term half-away rounding
    val t1 = { val v = 0.75 * math.log(0.75) * 1e9; -math.round(-v) }
    val t2 = { val v = 0.25 * math.log(0.25) * 1e9; -math.round(-v) }
    assert(eq(Seq("x", "x", "x", "y")) === t1 + t2)
  }

  test("unit vector: normalized, empty passthrough, zero vector → NaN (as before)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    def u(xs: Seq[Double]): Seq[Double] =
      one[scala.collection.Seq[Double]](Seq(xs).toDF("e")
        .select(call_function("graft_unit", col("e")))).toSeq
    assert(u(Seq(3.0, 4.0)) === Seq(0.6, 0.8))
    assert(u(Nil) === Nil)
    // zero vector divides by zero — same NaNs the interpreted
    // transform(x / sqrt(dot)) produced; callers treat them as
    // never-matching scores
    assert(u(Seq(0.0, 0.0)).forall(_.isNaN))
  }

  test("sq8: HALF_UP rounding incl. negative halves, empty input") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    def sq8(xs: Seq[Double]): (Any, Seq[Double]) = {
      val r = Seq(xs).toDF("e")
        .select(call_function("graft_sq8", col("e")).as("sr"))
        .select(col("sr.scale"), col("sr.r")).collect().head
      (r.get(0), r.getAs[scala.collection.Seq[Double]](1).toSeq)
    }
    // scale 127 makes codes = round(x): 2.5 → 3 and -2.5 → -3
    // (HALF_UP / half-away-from-zero — Math.round would give -2)
    val (s1, r1) = sq8(Seq(2.5, -2.5, 127.0))
    assert(s1 === 127.0)
    assert(r1 === Seq(3.0, -3.0, 127.0))
    val (s0, r0) = sq8(Nil)
    assert(s0 === null && r0 === Nil)
  }

  test("deflate_len: zlib-exact on a known vector, repetitive << diverse, stable") {
    import spark.implicits._
    graft.functions.expr.TextExpressions.register(spark)
    def dl(s: String): Int =
      one[Int](Seq(s).toDF("t").select(call_function("graft_deflate_len", col("t"))))
    // cross-implementation vector: python zlib.compress(_, 6) lengths
    val rep = ("the quick brown fox jumps over the lazy dog " * 10).trim
    assert(dl(rep) === 56) // 439 raw bytes -> 56
    assert(dl("spark group query row data slow small filter customer line") === 60)
    // the quality signal's core property: repetition deflates, diversity doesn't
    assert(dl(rep).toDouble / rep.length < 0.2)
    // deterministic across evaluations
    assert(dl(rep) === dl(rep))
    // the production frame (library form of the registry entry)
    val df = graft.queries.TextQueries.deflateCompressionRatio(
      spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("doc_id", "n_bytes", "deflate_bytes", "compression_ratio"))
    assert(df.limit(5).collect().forall(r =>
      r.getAs[Double]("compression_ratio") > 0))
  }

  test("compress_bits: hand-computed order-0 code length; repetitive << diverse") {
    import spark.implicits._
    graft.functions.expr.TextExpressions.register(spark)
    def cb(s: String): Long =
      one[Long](Seq(s).toDF("t").select(
        call_function("graft_compress_bits", split(col("t"), " "))))
    // ["a","a","a","b"]: n=4; a: c=3, bitlen(4/3=1)=1 → 3 bits;
    // b: c=1, bitlen(4)=3 → 3 bits; total 6
    assert(cb("a a a b") === 6L)
    // all-distinct: every token costs bitlen(n) = bitlen(4) = 3 → 12
    assert(cb("a b c d") === 12L)
    // all-same: n/c = 1 → 1 bit/token
    assert(cb("x x x x") === 4L)
    // ordering property shared with DEFLATE: repetition estimates low
    val rep = ("the quick brown fox jumps over the lazy dog " * 10).trim
    val div = "spark group query row data slow small filter customer line"
    assert(cb(rep).toDouble / rep.split(" ").length <
      cb(div).toDouble / div.split(" ").length)
    // bitlen restatement used by the DuckDB oracle: length(to_base(v,2))
    assert((64 - java.lang.Long.numberOfLeadingZeros(1L)) == 1)
    assert((64 - java.lang.Long.numberOfLeadingZeros(1023L)) == 10)
  }

  test("graft_vecsum_q equals the posexplode round-sum arithmetic, through the merge path") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // adversarial values: negatives, exact .5 quanta both signs (HALF_UP
    // away from zero under Spark's BigDecimal rounding), the famous
    // double just under .5 whose +0.5 rounds UP in naive float math
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val v = Seq.tabulate(8) {
        case 0 => 2.5e-9 // round(2.5) = 3
        case 1 => -2.5e-9 // round(-2.5) = -3 (HALF_UP, not HALF_EVEN)
        case 2 => 0.49999999999999994e-9 // rounds to 0, not 1
        case _ => rnd.nextDouble() * 2 - 1
      }
      (i.toLong % 7, v)
    }
    // 13 partitions force partial buffers through serialize+merge
    val df = rows.toDF("g", "e").repartition(13)
    val got = df.groupBy("g")
      .agg(call_function("graft_vecsum_q", col("e")).as("sq"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val want = df
      .select(col("g"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("g", "pos")
      .agg(sum(round(col("v") * 1e9).cast("long")).as("s"))
      .groupBy("g")
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("p"))
      .select(col("g"), transform(col("p"), x => x.getField("s")).as("sq"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(got == want, s"vecsum_q diverged from the explode form")
    // mixed dims in one group refuse loudly (the explode form would
    // silently mis-fold ragged vectors)
    val e = intercept[org.apache.spark.SparkException] {
      Seq((0L, Seq(1.0, 2.0)), (0L, Seq(1.0, 2.0, 3.0))).toDF("g", "e")
        .groupBy("g").agg(call_function("graft_vecsum_q", col("e"))).collect()
    }
    assert(e.getMessage.contains("mixed vector dims") ||
      Option(e.getCause).exists(_.getMessage.contains("mixed vector dims")),
      e.getMessage)
  }

  test("quantCentroid null semantics match the explode form: non-null divisor, all-null group absent") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // group 0: {(2,4), null} → centroid (2,4) over n_assigned=1 (the
    // explode form divided by the NON-null count; count(*) would halve
    // it); group 1: all null → absent (not a null centroid that would
    // sort below every real distance and win each assign argmin)
    val df = Seq(
      (0L, 10L, Option(Seq(2.0, 4.0))), (0L, 11L, Option.empty[Seq[Double]]),
      (1L, 12L, Option.empty[Seq[Double]]), (1L, 13L, Option.empty[Seq[Double]]),
      (2L, 14L, Option(Seq(1.0, 3.0))), (2L, 15L, Option(Seq(3.0, 5.0))))
      .toDF("cell", "vec_id", "e")
    val got = graft.operators.IvfMaintenance
      .quantCentroid(spark, df, Seq(col("cell")), Seq("cell"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toVector, r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, Vector(2.0, 4.0), 1L),
      (2L, Vector(2.0, 4.0), 2L)), got.mkString(", "))
  }
}
