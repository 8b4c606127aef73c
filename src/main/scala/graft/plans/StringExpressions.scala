package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression (SURVEY.md §2.10 escape hatch, same
  * rationale as [[DoubleArrayDot]]): byte-wise Hamming distance between
  * two equal-length strings, with real `doGenCode` so the candidate
  * verification of the blocked fuzzy join (graft.api.Fuzzy) stays
  * inside whole-stage codegen. The built-in surface has no Hamming
  * function; the HOF formulation
  * `size(filter(zip_with(split(a,''), split(b,''), ...), ...))`
  * allocates two char arrays and evaluates an interpreted lambda per
  * character per pair (the q_text_tfidf round-7 lesson: HOF lambdas
  * never enter whole-stage codegen), which is exactly wrong for the
  * hot candidate stream of a similarity join.
  *
  * Semantics: the number of differing BYTE positions of the two
  * strings' UTF-8 encodings — identical to per-character Hamming for
  * ASCII inputs (the testdata's name/text domains), and the convention
  * DuckDB's `hamming()` applies to ASCII, so the oracle can replay it.
  * Null input → null; byte lengths differ → null (Hamming is undefined
  * across lengths; null filters out of a `<= maxDist` predicate, which
  * is the join-friendly behavior — DuckDB's hamming() instead errors,
  * so oracles must guard with a length-equality predicate).
  */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hamming_distance requires string inputs, got $l / $r")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    if (x.numBytes() != y.numBytes()) null
    else {
      val n = x.numBytes()
      var d = 0
      var i = 0
      while (i < n) { if (x.getByte(i) != y.getByte(i)) d += 1; i += 1 }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("dist")
      // length mismatch → null result, mirroring nullSafeEval
      s"""
         |int $n = $a.numBytes();
         |if ($n != $b.numBytes()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getByte($i) != $b.getByte($i)) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash over the code points of a string, mod
  * 1e9+7 — the q_text_fingerprint kernel as ONE compiled pass.
  * Replaces the interpreted `aggregate(split(text, ''), ...)` HOF,
  * which evaluated a lambda per CHARACTER (array length = document
  * length) and dropped its stage out of whole-stage codegen — the
  * identical defect class the round-8 §18.21 measurements put at
  * 6–40× per-row CPU elsewhere. Here the fold walks the UTF8String's
  * bytes in place, decoding UTF-8 code points with zero allocation.
  *
  * Semantics pinned bit-equal to the HOF formulation (ExpressionSpec,
  * real data ×2 SFs): `split(text, '')` yields one single-code-point
  * string per character (Java regex split keeps surrogate pairs
  * together) and `ascii(c)` is that code point, so the fold is
  * acc ← (acc·31 + codepoint) mod 1e9+7 over code points; DuckDB's
  * `ascii()` is the same code point, so the oracle replays it
  * unchanged. Empty string → 0, matching the HOF's `[""]` → ascii 0
  * quirk ((0·31+0) mod p = 0). Null → null.
  */
case class CharPolyHash(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_poly_hash requires a string input, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "char_poly_hash"

  override def nullSafeEval(a: Any): Any =
    CharPolyHash.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.CharPolyHash.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): CharPolyHash = copy(child = newChild)
}

object CharPolyHash {
  private final val Mod = 1000000007L

  def compute(text: UTF8String): Long = {
    val n = text.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = text.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      // Malformed input guard: every continuation read is bounds-checked
      // (UTF8String.getByte is an UNCHECKED unsafe read), and only valid
      // leader bytes select a multibyte branch — a bare continuation byte
      // (0x80–0xBF), a 0xF8+ leader, or a sequence truncated at the buffer
      // end is consumed as its single leading byte. Well-formed UTF-8
      // (every UTF8String Spark itself constructs) never takes the
      // fallback, so the bit-equality pin vs the HOF formulation holds.
      if (b < 0x80) { cp = b }
      else if ((b & 0xE0) == 0xC0 && i + 1 < n) {
        cp = ((b & 0x1F) << 6) | (text.getByte(i + 1) & 0x3F); len = 2
      } else if ((b & 0xF0) == 0xE0 && i + 2 < n) {
        cp = ((b & 0x0F) << 12) | ((text.getByte(i + 1) & 0x3F) << 6) |
          (text.getByte(i + 2) & 0x3F); len = 3
      } else if ((b & 0xF8) == 0xF0 && i + 3 < n) {
        cp = ((b & 0x07) << 18) | ((text.getByte(i + 1) & 0x3F) << 12) |
          ((text.getByte(i + 2) & 0x3F) << 6) | (text.getByte(i + 3) & 0x3F)
        len = 4
      } else { cp = b }
      acc = (acc * 31L + cp) % Mod
      i += len
    }
    acc
  }
}

/** The q_text_gopher repetition statistics — token count, longest
  * equal run of the sorted token array (= max term frequency), and
  * distinct-bigram count — as ONE compiled pass returning a struct.
  * Replaces three interpreted O(len) lambda passes per row (the
  * run-length fold and the bigram transform never enter whole-stage
  * codegen; only the sort inside them was compiled). Field types are
  * INT to keep q_text_gopher's output schema byte-identical to the
  * HOF formulation it replaces (size() and the fold both produced
  * ints). Semantics pinned bit-equal on real data in ExpressionSpec:
  *  - n_tokens   = size(split(text, ' '))  (split("")→[""], so ≥ 1)
  *  - top_tok    = longest equal-adjacent run of sort(tokens)
  *  - n_bi_distinct = distinct count of space-joined adjacent pairs,
  *    0 when fewer than 2 tokens (the HOF's IF guard).
  * Null text → null.
  */
case class RepetitionStats(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires a string input, got $t")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_tokens", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("top_tok", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_bi_distinct", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(a: Any): Any =
    RepetitionStats.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.RepetitionStats.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats = copy(child = newChild)
}

object RepetitionStats {
  private val SPACE = UTF8String.fromString(" ")
  private val cmp: java.util.Comparator[UTF8String] =
    (x: UTF8String, y: UTF8String) => x.compareTo(y)

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.split(SPACE, -1)
    val m = toks.length
    // longest equal run of the sorted copy (sort a copy: `toks` is
    // needed in document order for the bigram pass below)
    val sorted = java.util.Arrays.copyOf(toks, m)
    java.util.Arrays.sort(sorted, cmp)
    var best = 0
    var i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && sorted(j).equals(sorted(i))) j += 1
      if (j - i > best) best = j - i
      i = j
    }
    var nBi = 0
    if (m >= 2) {
      val grams = new Array[UTF8String](m - 1)
      var k = 0
      while (k < m - 1) {
        grams(k) = UTF8String.concatWs(SPACE, toks(k), toks(k + 1))
        k += 1
      }
      java.util.Arrays.sort(grams, cmp)
      var g = 0
      while (g < grams.length) {
        var h = g + 1
        while (h < grams.length && grams(h).equals(grams(g))) h += 1
        nBi += 1
        g = h
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m, best, nBi))
  }
}
