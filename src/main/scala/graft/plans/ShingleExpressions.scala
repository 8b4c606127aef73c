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
    if (v == null) WordShingles.EMPTY
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
