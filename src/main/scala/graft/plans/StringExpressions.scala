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
