package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column as ONE codegen'd
  * per-row pass — tokenize + window + join + distinct, replacing the
  * interpreted HOF lambda in [[graft.api.Dedup.shingles]].
  *
  * Why (the round-8 x10 chain of findings, BASELINE.md): the lambda
  * formulation costs ~7-8 s per forced pass over 1M docs at x10, and
  * — much worse — any `Generate`/filter that inlines it drops its
  * whole stage out of whole-stage codegen (measured 40.1 s vs 0.64 s
  * for the same explode over materialized arrays). A compiled
  * expression removes both: the per-row work is a tight loop, and
  * plans over it stay inside codegen.
  *
  * Bit-compatibility: tokenization calls the SAME
  * `UTF8String.split(pattern, -1)` the built-in `split(text, ' ')`
  * evaluates (keeps empty tokens, including trailing), shingles are
  * `concatWs(" ", window)` (= concat_ws over never-null tokens), and
  * distinct keeps FIRST-occurrence order (LinkedHashSet) — exactly
  * `array_distinct`. ExpressionSpec compares against the old lambda
  * formulation over the full real documents table and pins 0
  * differing rows.
  *
  * Semantics: fewer than n tokens → EMPTY array; null text → EMPTY
  * array (matching the lambda: `size(null) >= n` is null → CASE falls
  * to ELSE array()). The output is therefore never null.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"shingle width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordShingles.EMPTY()
    else WordShingles.compute(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val resultCode =
      code"${childGen.code}" +
        code"org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = " +
        code"${childGen.isNull} ? graft.plans.WordShingles.EMPTY() " +
        code": graft.plans.WordShingles.compute(${childGen.value}, ${n.toString});"
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

/** The exact-dedup normalization key — sorted distinct token set
  * joined by ' ' — as one compiled per-row pass, replacing
  * `array_join(array_sort(array_distinct(split(text, ' '))), ' ')`.
  *
  * Why: the native chain measured ~19 s for a single forced pass over
  * 1M docs at x10 (~600 µs/doc — per-element interpreted evaluation
  * and array churn in the collection expressions), and every exact /
  * cross-corpus dedup pass pays it per corpus side. This pass is a
  * split + LinkedHashSet dedup + binary sort + byte join.
  *
  * Bit-compatibility: tokens come from the same `UTF8String.split`
  * the built-in evaluates; the sort is `UTF8String.compareTo` =
  * unsigned byte order, the same binary (UTF8_BINARY collation)
  * ordering `array_sort` applies to strings; `array_distinct` keeps
  * first occurrence, and since the set is then sorted, WHICH
  * duplicate survives is unobservable. ExpressionSpec pins equality
  * against the native chain over the full real documents table.
  * Null text → null (native null propagation).
  */
case class SortedTokenSetKey(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_token_set_key requires a string input, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_token_set_key"

  override def nullSafeEval(a: Any): Any =
    SortedTokenSetKey.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SortedTokenSetKey.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): SortedTokenSetKey = copy(child = newChild)
}

object SortedTokenSetKey {
  private val SPACE = UTF8String.fromString(" ")

  def compute(text: UTF8String): UTF8String = {
    val toks = text.split(SPACE, -1)
    val seen = new java.util.LinkedHashSet[UTF8String](toks.length * 2)
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    val arr = seen.toArray(new Array[UTF8String](seen.size))
    java.util.Arrays.sort(arr, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    UTF8String.concatWs(SPACE, arr: _*)
  }
}

/** Per-row term frequencies — (token, tf) for each distinct token of
  * the text — as one compiled pass: split (the same UTF8String.split
  * as the built-in), binary sort (= sort_array's UTF8_BINARY order),
  * run-length count of equal adjacents. Replaces q_text_tfidf's
  * three-pass interpreted run-length lambda (the round-8 fix of the
  * round-7 regression kept the shuffle-free SHAPE but still paid
  * interpreted per-element lambdas; this keeps the shape at compiled
  * speed). Null text → null (the lambda's null propagation — the row
  * then drops out of the explode). ExpressionSpec pins equality
  * against the lambda formulation over the full real table. */
case class TokenRunLengths(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_run_lengths requires a string input, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_run_lengths"

  override def nullSafeEval(a: Any): Any =
    TokenRunLengths.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.TokenRunLengths.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): TokenRunLengths = copy(child = newChild)
}

object TokenRunLengths {
  private val SPACE = UTF8String.fromString(" ")

  def compute(text: UTF8String): ArrayData = {
    val toks = text.split(SPACE, -1)
    java.util.Arrays.sort(toks, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    val out = new java.util.ArrayList[Any](math.min(toks.length, 64))
    var i = 0
    while (i < toks.length) {
      var j = i + 1
      while (j < toks.length && toks(j).equals(toks(i))) j += 1
      out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](toks(i), (j - i).toLong)))
      i = j
    }
    new GenericArrayData(out.toArray)
  }
}

/** Per-row word n-gram frequencies — (token, tf) for each distinct
  * word n-gram of the text, n-grams joined by ' ' — as one compiled
  * pass: split, slide the n-window (concatWs, the [[WordShingles]]
  * convention), binary sort, run-length count of equal adjacents.
  * [[TokenRunLengths]] is exactly the n = 1 case; this is the bigram/
  * trigram generalization the LM-scoring queries (q_text_bigram_ll)
  * build their frequency models from, keeping the corpus pass
  * shuffle-free and inside whole-stage codegen like every other
  * expression in this file.
  *
  * Semantics: fewer than n tokens → EMPTY array (the doc has no
  * n-grams and drops out of the explode); null text → null (the
  * TokenRunLengths null convention). Output field types match
  * TokenRunLengths so downstream plans are shape-identical.
  */
case class NgramRunLengths(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"ngram width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_run_lengths requires a string input, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_run_lengths"

  override def nullSafeEval(a: Any): Any =
    NgramRunLengths.compute(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.NgramRunLengths.compute($a, ${n.toString});")

  override protected def withNewChildInternal(
      newChild: Expression): NgramRunLengths = copy(child = newChild)
}

object NgramRunLengths {
  private val SPACE = UTF8String.fromString(" ")
  private val emptyArray = new GenericArrayData(new Array[Any](0))

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val m = toks.length
    if (m < n) return emptyArray
    val grams = new Array[UTF8String](m - n + 1)
    var i = 0
    while (i <= m - n) {
      if (n == 1) grams(i) = toks(i)
      else {
        val window = new Array[UTF8String](n)
        System.arraycopy(toks, i, window, 0, n)
        grams(i) = UTF8String.concatWs(SPACE, window: _*)
      }
      i += 1
    }
    java.util.Arrays.sort(grams, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    val out = new java.util.ArrayList[Any](math.min(grams.length, 64))
    i = 0
    while (i < grams.length) {
      var j = i + 1
      while (j < grams.length && grams(j).equals(grams(i))) j += 1
      out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](grams(i), (j - i).toLong)))
      i = j
    }
    new GenericArrayData(out.toArray)
  }
}

object WordShingles {
  private val SPACE = UTF8String.fromString(" ")
  private val emptyArray = new GenericArrayData(new Array[Any](0))

  /** Java-callable accessor for the generated code. */
  def EMPTY(): ArrayData = emptyArray

  /** Shared by interpreted eval and codegen: split on the same
    * UTF8String.split the built-in `split` uses, slide the n-window,
    * concatWs, first-occurrence distinct. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val m = toks.length
    if (m < n) return emptyArray
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, (m - n + 1) * 2))
    var i = 0
    while (i <= m - n) {
      val window = new Array[UTF8String](n)
      System.arraycopy(toks, i, window, 0, n)
      seen.add(UTF8String.concatWs(SPACE, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Rolling polynomial digests of every `len`-token span — the
  * q_text_longest_dup_span search kernel as ONE compiled O(n) pass.
  * Replaces the interpreted Karp-Rabin DOUBLING formulation (log n
  * zip_with/transform levels per row — HOF lambdas evaluate
  * interpreted and the level table needed a corpus-sized DISK_ONLY
  * persist; measured 103.6 s cold at x10 against 6.9 s at sf0.1 —
  * the per-element-lambda trap this file exists to remove).
  *
  * digest(i) = Σ_{j<len} fnv64(tok_{i+j}) · B^{len-1-j} mod 2^64,
  * computed rolling (subtract the leading term, multiply by B, add
  * the trailing hash — Java long arithmetic wraps mod 2^64 by
  * definition, no overflow concern outside ANSI SQL). Digests steer
  * the caller's binary SEARCH only; reported spans are re-grouped by
  * exact strings, so a collision can at worst aim the search one
  * length high and the caller's guard steps down (spec-covered).
  *
  * Semantics: fewer than `len` tokens → EMPTY array (no spans);
  * null text → null (the TokenRunLengths convention). */
case class SpanDigests(child: Expression, len: Int)
  extends UnaryExpression {

  require(len >= 1, s"span length must be positive, got $len")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_digests requires a string input, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "span_digests"

  override def nullSafeEval(a: Any): Any =
    SpanDigests.compute(a.asInstanceOf[UTF8String], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SpanDigests.compute($a, ${len.toString});")

  override protected def withNewChildInternal(
      newChild: Expression): SpanDigests = copy(child = newChild)
}

object SpanDigests {
  private val SPACE = UTF8String.fromString(" ")
  private final val B = 1000000007L

  def compute(text: UTF8String, len: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    if (n < len)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = fnv64(toks(i)); i += 1 }
    var bl = 1L // B^(len-1), wrapping
    i = 1
    while (i < len) { bl *= B; i += 1 }
    val out = new Array[Long](n - len + 1)
    var d = 0L
    i = 0
    while (i < len) { d = d * B + h(i); i += 1 }
    out(0) = d
    i = 1
    while (i <= n - len) {
      d = (d - h(i - 1) * bl) * B + h(i + len - 1)
      out(i) = d
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** FNV-1a over the token's UTF-8 bytes — cheap, allocation-free. */
  private[plans] def fnv64(s: UTF8String): Long = {
    var hash = 0xcbf29ce484222325L
    val nb = s.numBytes()
    var i = 0
    while (i < nb) { hash ^= (s.getByte(i) & 0xFFL); hash *= 0x100000001b3L; i += 1 }
    hash
  }
}


/** Exact span strings at a GIVEN list of 0-based token positions —
  * the second phase of q_text_dedup_trim: digests nominate candidate
  * positions (tiny vs the corpus), this expression renders only those
  * spans as exact strings for the collision-free duplicate grouping.
  * One compiled pass per row: tokenize once, concatWs per requested
  * position. Positions outside [0, n − len] are skipped (they cannot
  * start a full span); output structs keep the input position order.
  *
  * Null text or null positions → null; empty positions → empty. */
case class SpansAt(left: Expression, right: Expression, len: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(len >= 1, s"span length must be positive, got $len")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"spans_at requires (string, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("span", StringType,
        nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "spans_at"

  override def nullSafeEval(t: Any, ps: Any): Any =
    SpansAt.compute(t.asInstanceOf[UTF8String], ps.asInstanceOf[ArrayData], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, ps) =>
      s"${ev.value} = graft.plans.SpansAt.compute($t, $ps, ${len.toString});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpansAt =
    copy(left = newLeft, right = newRight)
}

object SpansAt {
  private val SPACE = UTF8String.fromString(" ")

  def compute(text: UTF8String, ps: ArrayData, len: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    val m = ps.numElements()
    val window = new Array[UTF8String](len)
    val out = new scala.collection.mutable.ArrayBuffer[Any](m)
    var i = 0
    while (i < m) {
      val p = ps.getInt(i)
      if (p >= 0 && p + len <= n) {
        System.arraycopy(toks, p, window, 0, len)
        out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](p, UTF8String.concatWs(SPACE, window: _*)))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Surviving SEGMENTS of a document after excising every span
  * [s, s+len) for the given 0-based start positions — the REMOVE half
  * of q_text_dedup_trim (Lee et al. 2022's actual intervention: drop
  * every occurrence of a duplicated span beyond the first). Removal
  * SPLITS the document instead of splicing the remainder together:
  * each output segment is a contiguous run of surviving tokens, so no
  * seam n-gram is fabricated across a cut — which is what makes the
  * whole operator IDEMPOTENT (every window of a segment is a window
  * of the original document; see the dedupTrim scaladoc for the
  * proof the spec pins).
  *
  * `starts` must be sorted ascending (the caller sort_array's it);
  * overlapping and adjacent intervals union via a single
  * coverage-sweep pointer. Empty starts → one segment, the whole
  * text. Fully-covered text → empty array. Null text or null starts
  * → null. */
case class TrimSpans(left: Expression, right: Expression, len: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(len >= 1, s"span length must be positive, got $len")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"trim_spans requires (string, array<int>), got ($l, $r)")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "trim_spans"

  override def nullSafeEval(t: Any, ss: Any): Any =
    TrimSpans.compute(t.asInstanceOf[UTF8String], ss.asInstanceOf[ArrayData], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, ss) =>
      s"${ev.value} = graft.plans.TrimSpans.compute($t, $ss, ${len.toString});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrimSpans =
    copy(left = newLeft, right = newRight)
}

object TrimSpans {
  private val SPACE = UTF8String.fromString(" ")

  def compute(text: UTF8String, starts: ArrayData, len: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    val m = starts.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val seg = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var coverEnd = -1L // exclusive end of the union of intervals seen
    var si = 0
    var i = 0
    while (i < n) {
      while (si < m && starts.getInt(si) <= i) {
        val e = starts.getInt(si).toLong + len
        if (e > coverEnd) coverEnd = e
        si += 1
      }
      if (i < coverEnd) {
        if (seg.nonEmpty) {
          out += UTF8String.concatWs(SPACE, seg.toSeq: _*)
          seg.clear()
        }
      } else seg += toks(i)
      i += 1
    }
    if (seg.nonEmpty) out += UTF8String.concatWs(SPACE, seg.toSeq: _*)
    new GenericArrayData(out.toArray)
  }
}
