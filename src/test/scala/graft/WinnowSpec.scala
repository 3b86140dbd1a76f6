package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native WinnowEnc expression (graft_winnow45) element-for-
  * element against the relational transform/slice/array_min formulation
  * it replaces — the same formulation the DuckDB oracle runs. The
  * corpus-path oracle proves parity on fixture text; these cases pin
  * the edges the fixture never produces: sub-window docs, exact
  * w-boundary lengths, multibyte code points, tie runs. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = 4
  private val W = 5

  /** The interpreted reference: enc(i) = hash(gram_i)·10⁶ + i (1-based),
    * windowed min over w encodings, distinct in first-occurrence order.
    * Built from Spark SQL primitives only, exactly like the oracle. */
  private def relational(text: String): Seq[Long] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(expr(
        // guard first: Spark sequence(1, 0) yields [1, 0] (descending),
        // not empty, so sub-window docs need the explicit array() branch
        s"""case when length(text) < ${K + W - 1}
           |then cast(array() as array<bigint>)
           |else array_distinct(transform(
           |  sequence(1, length(text) - ${K + W - 2}),
           |  j -> array_min(slice(
           |    transform(sequence(1, length(text) - ${K - 1}),
           |      i -> cast(conv(substring(md5(substring(text, i, $K)), 1, 8),
           |                     16, 10) as bigint) * 1000000 + i),
           |    j, $W)))) end""".stripMargin))
      .collect().head.getAs[scala.collection.Seq[Long]](0).toSeq
  }

  private def native(text: String): Seq[Long] = {
    import spark.implicits._
    graft.functions.expr.TextExpressions.register(spark)
    Seq(text).toDF("text")
      .select(call_function("graft_winnow45", col("text")))
      .collect().head.getAs[scala.collection.Seq[Long]](0).toSeq
  }

  private def pin(text: String): Unit =
    assert(native(text) === relational(text), s"text=${text.take(40)}")

  test("sub-window docs return empty (no full window, both forms)") {
    assert(native("") === Nil)
    assert(native("abc") === Nil) // shorter than k
    assert(native("abcdefg") === Nil) // k+w-2 = 7 grams short of a window
    assert(relational("abcdefg") === Nil)
  }

  test("exact w-boundary: length k+w-1 yields exactly one window") {
    val t = "abcdefgh" // length 8 = k+w-1 → 5 grams, 1 window
    val r = relational(t)
    assert(r.length === 1)
    assert(native(t) === r)
  }

  test("boundary +1: two windows, distinct-by-first-occurrence") {
    pin("abcdefghi")
  }

  test("ascii prose matches element-for-element") {
    pin("the quick brown fox jumps over the lazy dog")
    pin("aaaaaaaaaaaaaaaa") // degenerate tie run: every gram identical
    pin("abab abab abab abab") // periodic text, repeated minima
  }

  test("multibyte code points: positions count code points, hashes UTF-8 bytes") {
    // é/ü are 2-byte UTF-8; CJK are 3-byte; both engines index by
    // code point (Spark substring / DuckDB substr semantics)
    pin("héllo wörld — naïve café résumé")
    pin("数据质量是模型质量的上限，重复数据必须去除")
    pin("mixed 中文 and ascii グラム text ここ")
  }

  test("position packing: fp and pos unpack to the encoded hash and 1-based gram index") {
    val t = "abcdefgh"
    val u = native(t).head
    val pos = u % 1000000L
    assert(pos >= 1 && pos <= 5, s"pos=$pos must be a 1-based gram index")
    val h = u / 1000000L
    assert(h >= 0 && h <= 0xffffffffL, s"fp=$h must be a 32-bit md5 prefix")
  }

  test("windowed-min guarantee: any shared substring of length >= w+k-1 shares a fingerprint") {
    val shared = "zqxwvutsr" // 9 chars >= w+k-1 = 8
    val a = native(s"prefix one $shared suffix alpha")
    val b = native(s"a different beginning $shared and end")
    val sharedFps = a.map(_ / 1000000L).toSet intersect b.map(_ / 1000000L).toSet
    assert(sharedFps.nonEmpty, "winnowing's coverage guarantee")
  }
}
