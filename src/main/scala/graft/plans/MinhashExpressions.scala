package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row MinHash signature over a shingle array — the whole
  * signature stage of [[graft.api.Dedup.minhashLsh]] as ONE codegen'd
  * expression, replacing explode → 32 × xxhash64 → 64-column min
  * groupBy.
  *
  * Why this is the §2.10(b) escape hatch and not premature
  * optimization (x10 decomposition, BASELINE.md round-8): the explode
  * materializes ~48M shingle ROWS (~25 s of the 27 s signature stage
  * at 1M docs — the 8→32 hash-seed increment added only 1.5 s), and
  * the min-groupBy is an exchange whose keys are the doc ids the rows
  * STARTED on. Per-row evaluation needs neither: every shingle of a
  * doc is already in its array.
  *
  * Bit-compatibility: reproduces `xxhash64(sh, lit(i))` exactly —
  * Spark's XxHash64 chains children, hashing the string with the 42L
  * default seed and then the Int literal seed-index with the string's
  * hash as seed (XXH64.hashUTF8String → XXH64.hashInt). Because the
  * string hash does not depend on i, it is computed ONCE per shingle
  * and the per-seed work collapses to one hashInt mix — ~numSeeds×
  * less string hashing than the column formulation on top of the
  * eliminated explode/exchange. f_{2i} / f_{2i+1} are the unsigned
  * 32-bit halves (min over shingles), identical to the old
  * `min(shiftright(h,32) & 0xFFFFFFFF)` / `min(h & 0xFFFFFFFF)`
  * columns, so band keys — and therefore candidates and output — are
  * bit-identical (ChunkOccupancySpec and the minhash oracle re-prove
  * both).
  *
  * Semantics: null or EMPTY array → null (a doc with no shingles had
  * no exploded rows, hence no signature row — the isNotNull filter at
  * the call site preserves that exclusion). Elements assumed non-null
  * (shingles() output).
  */
case class MinhashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(a: Any): Any =
    MinhashSignature.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.plans.MinhashSignature.compute($a, $numHashes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSignature = copy(child = newChild)
}

object MinhashSignature {
  /** Shared by interpreted eval and codegen: one string hash per
    * shingle, one hashInt mix per seed, running unsigned-32-bit-half
    * minima. Returns null for an empty array. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return null
    val numSeeds = (numHashes + 1) / 2
    val minHi = new Array[Long](numSeeds)
    val minLo = new Array[Long](numSeeds)
    java.util.Arrays.fill(minHi, Long.MaxValue)
    java.util.Arrays.fill(minLo, Long.MaxValue)
    var j = 0
    while (j < m) {
      val h1 = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < numSeeds) {
        val h = XXH64.hashInt(i, h1)
        val hi = h >>> 32
        val lo = h & 0xFFFFFFFFL
        if (hi < minHi(i)) minHi(i) = hi
        if (lo < minLo(i)) minLo(i) = lo
        i += 1
      }
      j += 1
    }
    val out = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = if (k % 2 == 0) minHi(k / 2) else minLo(k / 2)
      k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
