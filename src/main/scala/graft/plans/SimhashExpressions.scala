package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row 64-bit majority-vote SimHash signature over a shingle
  * array — the signature stage of [[graft.api.Dedup.simhash]] as one
  * codegen'd expression, replacing explode → md5/conv → 64-column
  * vote groupBy (the same explode-was-the-cost finding as
  * [[MinhashSignature]]; that expression's scaladoc carries the x10
  * decomposition).
  *
  * Hash family is UNCHANGED and portable (BASELINE.md round-6/7
  * simhash record): per-shingle MD5 over the UTF-8 bytes, h1/h2 = the
  * first two big-endian 4-byte windows as unsigned 32-bit values —
  * exactly `conv(substring(md5(cast(sh AS binary)), 1, 8), 16, 10)` /
  * `(…, 9, 8)` — then bit j of a shingle's vote is
  * ((h1·a_j + h2·b_j) >> 15) & 1 over the deterministic 30-bit plane
  * constants ([[graft.api.Dedup.simhashPlanes]], shared literally).
  * Every product stays < 2^62 and the sum < 2^63, so Java's long
  * arithmetic equals the ANSI column arithmetic it replaces, and the
  * DuckDB oracle's replay is untouched. ExpressionSpec reconstructs
  * the old explode/groupBy plan verbatim and pins 0 differing docs.
  *
  * Semantics: null or EMPTY array → null (a shingle-less doc had no
  * exploded rows, hence no signature row — call sites filter
  * isNotNull). Elements assumed non-null (shingles() output).
  */
case class SimhashSignature(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_signature requires array<string> input, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_signature"

  override def nullSafeEval(a: Any): Any =
    SimhashSignature.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sig")
      s"""
         |Long $r = graft.plans.SimhashSignature.compute($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimhashSignature = copy(child = newChild)
}

object SimhashSignature {
  private val planesA: Array[Long] =
    graft.api.Dedup.simhashPlanes.map(_._1).toArray
  private val planesB: Array[Long] =
    graft.api.Dedup.simhashPlanes.map(_._2).toArray

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and codegen: one MD5 per shingle, 64
    * multiply-shift votes, majority-packed long. Boxed so codegen can
    * branch on the empty-array null. */
  def compute(arr: ArrayData): java.lang.Long = {
    val m = arr.numElements()
    if (m == 0) return null
    val votes = new Array[Int](64)
    val md = md5Local.get()
    var j = 0
    while (j < m) {
      val bytes = arr.getUTF8String(j).getBytes
      val d = md.digest(bytes) // digest() resets the instance
      val h1 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      val h2 = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
      var p = 0
      while (p < 64) {
        votes(p) += (((h1 * planesA(p) + h2 * planesB(p)) >> 15) & 1L).toInt
        p += 1
      }
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < 64) {
      if (votes(p) * 2 > m) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
