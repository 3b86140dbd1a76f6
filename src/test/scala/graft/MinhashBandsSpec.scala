package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 MinHashBands rewrite: the byte-aligned integer-minimum
  * fast path must be byte-identical to the lexicographic-min-of-hex
  * formulation (the DuckDB oracle's MIN(substr(md5(s), off, w))) — the
  * property the whole banded-LSH key space rests on. The reference here
  * is an INDEPENDENT recompute (JDK digest + %02x formatting), not the
  * expression's own generic path, so a shared bug cannot self-confirm.
  */
class MinhashBandsSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def refMins(shingles: Seq[String], offsets: Seq[Int], width: Int): Seq[String] =
    offsets.map { off =>
      shingles.map(s => md5hex(s).substring(off - 1, off - 1 + width)).min
    }

  private def evalExpr(shingles: Seq[String], offsets: Seq[Int], width: Int): Seq[String] = {
    val arr = new GenericArrayData(
      shingles.map(s => UTF8String.fromString(s)).toArray[Any])
    val e = graft.functions.expr.MinHashBands(Literal(null), offsets, width)
    e.nullSafeEval(arr) match {
      case null => null
      case out: ArrayData =>
        (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
    }
  }

  test("aligned fast path (registered 1/9/17/25 x 8) equals the hex reference") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val shingles = Seq.fill(1 + rnd.nextInt(40))(
        Seq.fill(3)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
          .mkString(" "))
      assert(evalExpr(shingles, Seq(1, 9, 17, 25), 8) ==
        refMins(shingles, Seq(1, 9, 17, 25), 8))
    }
  }

  test("multi-byte UTF-8 shingles hash their UTF-8 bytes on both paths") {
    val shingles = Seq("héllo wörld déjà", "日本 語 テスト", "ascii only here")
    assert(evalExpr(shingles, Seq(1, 9, 17, 25), 8) ==
      refMins(shingles, Seq(1, 9, 17, 25), 8))
  }

  test("non-aligned offsets take the generic path and match the reference") {
    val shingles = Seq("a b c", "b c d", "c d e", "zz yy xx")
    assert(evalExpr(shingles, Seq(2, 10), 7) == refMins(shingles, Seq(2, 10), 7))
  }

  test("empty shingle array yields null") {
    assert(evalExpr(Seq.empty, Seq(1, 9, 17, 25), 8) == null)
  }
}
