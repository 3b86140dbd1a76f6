package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-pipeline expressions.
  *
  * Spark's higher-order functions interpret their lambda per element
  * (CodegenFallback + boxing); for shingling and MinHash that means
  * ~10 interpreted expression evals per shingle. These expressions do
  * the whole loop in one JVM call per row — CodegenFallback at the row
  * level is fine because the per-row work (dozens of md5s) dwarfs one
  * virtual call.
  */

/** Word 3-gram shingles: ["a","b","c","d"] → ["a b c", "b c d"].
  * Matches TextFunctions.shingles3 and the DuckDB oracle CTE exactly
  * (empty array for <3 words). */
case class Shingles3(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < 3) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 2)
      var i = 0
      while (i < n - 2) {
        out(i) = UTF8String.concatWs(UTF8String.fromString(" "),
          words.getUTF8String(i), words.getUTF8String(i + 1), words.getUTF8String(i + 2))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** MinHash band signatures from a shingle array: one md5 per shingle,
  * k bands carved from the hex digest as substrings (1-based offsets,
  * fixed width), lexicographic min per band. Returns array<string> of
  * length offsets.size; null when the shingle array is empty (callers
  * filter those rows, mirroring the oracle's GROUP BY over no rows).
  *
  * Hex is lowercase and min is byte-wise — identical to DuckDB's
  * MIN(substr(md5(s), off, w)). */
case class MinHashBands(child: Expression, offsets: Seq[Int], width: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // an EMPTY shingle array yields null even when the input is
  // non-nullable; without this the optimizer would prune the callers'
  // isNotNull filters
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<string>, got ${other.simpleString}")
  }

  @transient private lazy val hexChars = "0123456789abcdef".toCharArray

  /** The registered bands (offsets 1/9/17/25, width 8) are byte-aligned
    * slices of the digest, and fixed-width lowercase hex compares
    * lexicographically exactly like the unsigned integer it spells — so
    * the per-band minimum can be tracked as a plain long and formatted
    * to hex ONCE per row instead of allocating a 32-char hex string plus
    * `k` substrings per SHINGLE (r17: the signature pass is the hottest
    * per-row loop in the dedup family; identical bytes out, ~7 fewer
    * allocations per shingle). Non-aligned offsets (none registered)
    * take the original string path. */
  @transient private lazy val aligned =
    width % 2 == 0 && width <= 14 && offsets.forall(o => (o - 1) % 2 == 0)

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    if (n == 0) return null
    if (aligned) evalAligned(shingles, n) else evalGeneric(shingles, n)
  }

  private def evalAligned(shingles: ArrayData, n: Int): Any = {
    val k = offsets.size
    val bytesPer = width / 2
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val digest = md.digest(shingles.getUTF8String(i).getBytes)
      var b = 0
      while (b < k) {
        val start = (offsets(b) - 1) / 2
        var v = 0L
        var j = 0
        while (j < bytesPer) { v = (v << 8) | (digest(start + j) & 0xffL); j += 1 }
        if (v < mins(b)) mins(b) = v
        b += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var b = 0
    while (b < k) {
      val hex = new Array[Byte](width)
      var v = mins(b)
      var j = width - 1
      while (j >= 0) { hex(j) = hexChars((v & 0xfL).toInt).toByte; v >>>= 4; j -= 1 }
      out(b) = UTF8String.fromBytes(hex)
      b += 1
    }
    new GenericArrayData(out)
  }

  private def evalGeneric(shingles: ArrayData, n: Int): Any = {
    val mins = new Array[String](offsets.size)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val digest = md.digest(shingles.getUTF8String(i).getBytes)
      md.reset()
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = hexChars((digest(j) >> 4) & 0xf)
        hex(2 * j + 1) = hexChars(digest(j) & 0xf)
        j += 1
      }
      val full = new String(hex)
      var b = 0
      while (b < offsets.size) {
        val sub = full.substring(offsets(b) - 1, offsets(b) - 1 + width)
        if (mins(b) == null || sub.compareTo(mins(b)) < 0) mins(b) = sub
        b += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash-16 from a word array, row-locally: one md5 per word, the
  * first 16 hex digits vote +1 (digit >= 8) / -1 per bit position,
  * positive sums become '1'. Identical math to the oracle's exploded
  * SUM(CASE substr(md5(w), b, 1) >= '8' ...) formulation — but the
  * per-doc fold never leaves the row, so the signature is a pure map
  * over the corpus instead of a full word shuffle + aggregation. */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val votes = new Array[Int](16)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val digest = md.digest(words.getUTF8String(i).getBytes)
      md.reset()
      // first 16 hex digits = first 8 bytes, two nibbles each; a hex
      // digit >= '8' is exactly a nibble with its high bit set
      var b = 0
      while (b < 8) {
        votes(2 * b) += (if (((digest(b) >> 4) & 0x8) != 0) 1 else -1)
        votes(2 * b + 1) += (if ((digest(b) & 0x8) != 0) 1 else -1)
        b += 1
      }
      i += 1
    }
    val out = new Array[Char](16)
    var b = 0
    while (b < 16) { out(b) = if (votes(b) > 0) '1' else '0'; b += 1 }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Word 2-gram shingles: ["a","b","c"] → ["a b", "b c"]; empty for <2
  * words (matches the oracle's range(len-1) which is empty there —
  * NOT the interpreted sequence(0, size-2) form, whose descending
  * sequence on 1-word docs yields null-element garbage). */
case class Shingles2(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles2 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        out(i) = UTF8String.concatWs(UTF8String.fromString(" "),
          words.getUTF8String(i), words.getUTF8String(i + 1))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Count of the most frequent element in a string array (null for an
  * empty array, matching array_max over no elements). One hash pass —
  * replaces the interpreted O(distinct × n)
  * array_max(transform(array_distinct(gs), g -> size(filter(gs, = g))))
  * composition on the repetition-filter hot path. */
case class MaxFreq(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"maxfreq expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[UTF8String, java.lang.Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val k = xs.getUTF8String(i)
      val prev = counts.get(k)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(k, c)
      if (c > best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Length in bytes of the zlib-DEFLATE stream of the input string's
  * UTF-8 bytes, at FIXED level 6 / default strategy — the
  * compression-ratio quality signal (CCNet/RefinedWeb-style): highly
  * repetitive text deflates far below its raw size. Deterministic for
  * a fixed input on a fixed zlib build (the JDK bundles one), and a
  * pure per-row loop in one JVM call — no UDF boxing. NOT
  * oracle-reproducible in SQL engines (no DEFLATE there), so consumers
  * get the rows-only driver check plus property specs. */
case class DeflateLen(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Quantized Shannon word entropy: Σ_w round(p_w · ln(p_w) · 1e9) over
  * the DISTINCT words of a string array, as one BIGINT per row (null
  * for an empty array). The caller derives H = −sum/1e9.
  *
  * Quantizing each TERM to an integer before summing makes the fold
  * order-free (associative integer adds — no float-sum ordering
  * contract between engines), and 1e-9 absorbs any ln() ulp skew (the
  * t_dsir_weights policy). Rounding is half-away-from-zero on the
  * magnitude — the ROUND semantics of both Spark and DuckDB — because
  * p·ln(p) is negative. One hash pass + one loop per row replaces the
  * interpreted O(distinct × n) HOF composition. */
case class WordEntropyQ(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"entropy expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[UTF8String, java.lang.Integer](n * 2)
    var i = 0
    while (i < n) {
      val k = xs.getUTF8String(i)
      val prev = counts.get(k)
      counts.put(k, if (prev == null) 1 else prev.intValue() + 1)
      i += 1
    }
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().intValue().toDouble / n
      val v = p * math.log(p) * 1e9
      sum += (if (v >= 0) math.round(v) else -math.round(-v))
    }
    sum
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003) in
  * one pass: hash every k-char gram (first 8 hex chars of md5, as a
  * 32-bit int), encode (hash, 1-based position) as hash·10⁶ + pos,
  * take each w-gram window's minimum with a monotonic deque — O(n)
  * total vs the O(n·w) interpreted nested-HOF formulation — and emit
  * the DISTINCT selections in first-occurrence order.
  *
  * Exactly matches the relational form (and the DuckDB oracle):
  * `array_distinct(transform(sequence(1, n-w+1), j ->
  *   array_min(slice(enc, j, w))))` over
  * `enc = transform(sequence(1, length(text)-k+1), i ->
  *   conv(substring(md5(substring(text, i, k)), 1, 8), 16, 10)·10⁶ + i)`.
  * Gram positions count CODE POINTS (Spark `length`/`substring` and
  * DuckDB `len`/`substr` semantics), bytes are UTF-8 for the md5.
  * Returns an empty array when the text is shorter than w+k-1 (no
  * full window) — callers filter those rows to mirror the oracle. */
case class WinnowEnc(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val enc = new Array[Long](n)
    var i = 0
    while (i < n) {
      val gram = new String(cps, i, k).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = md.digest(gram)
      // first 4 digest bytes == first 8 lowercase hex chars
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      enc(i) = h * 1000000L + (i + 1)
      i += 1
    }
    // monotonic ascending deque of candidate minima over the w-window
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val out = new java.util.ArrayList[Any]()
    val seen = new java.util.HashSet[Long]()
    var j = 0
    while (j < n) {
      while (tail > head && enc(deque(tail - 1)) >= enc(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) {
        val m = enc(deque(head))
        if (seen.add(m)) out.add(m)
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Order-0 entropy-coding size estimate over a token array, in BITS —
  * the ORACLE-CHECKABLE compressibility signal: for n tokens with
  * per-token counts c_w, charge each occurrence of w the integer code
  * length bitlen(floor(n / c_w)) (bitlen x = 64 - nlz(x), i.e.
  * floor(log2)+1 — within 1 bit/token of the Shannon optimum -log2(c/n))
  * and return Σ c_w · bitlen(n/c_w). Repetitive text (few distinct
  * tokens, high counts) estimates far below diverse prose, the same
  * ordering DEFLATE produces, but in PURE INTEGER arithmetic both
  * engines reproduce bit-for-bit: DuckDB restates bitlen(v) as
  * length(to_base(v, 2)). One hash pass per row (the MaxFreq idiom),
  * zero shuffle. Null for an empty array. */
case class CompressBitsQ(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"compress_bits expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[UTF8String, java.lang.Integer](n * 2)
    var i = 0
    while (i < n) {
      val k = xs.getUTF8String(i)
      val prev = counts.get(k)
      counts.put(k, if (prev == null) 1 else prev.intValue() + 1)
      i += 1
    }
    var bits = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      val v = (n / c).toLong // >= 1 since c <= n
      bits += c.toLong * (64 - java.lang.Long.numberOfLeadingZeros(v))
    }
    bits
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object TextExpressions {
  /** Register SQL-callable forms once per session; idempotent.
    * graft_minhash4 = 4 bands of 8 hex chars at offsets 1/9/17/25. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deflate_len", exprs => DeflateLen(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_compress_bits", exprs => CompressBitsQ(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles3", exprs => Shingles3(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles2", exprs => Shingles2(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash4", exprs => MinHashBands(exprs.head, Seq(1, 9, 17, 25), 8), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash16", exprs => SimHash16(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_maxfreq", exprs => MaxFreq(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_entropy_q", exprs => WordEntropyQ(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow45", exprs => WinnowEnc(exprs.head, 4, 5), "built-in")
  }
}
