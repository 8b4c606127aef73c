package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a NON-CONSTANT bloom-filter column — the probe
  * side of the partitioned cross-corpus dedup (api.Dedup.crossCorpus).
  *
  * Spark's own `BloomFilterMightContain` requires its filter input to be
  * a constant or scalar subquery: the driver must hold the whole
  * serialized filter, which is exactly the scale bound the partitioned
  * form removes (a 10^10-key reference at 1% fpp is a ~12 GB filter —
  * past any driver/broadcast budget). Here the filters live in a
  * (bucket, filter_bytes) RELATION, the probe rows equi-join on bucket,
  * and this expression evaluates membership row by row.
  *
  * Deserialization is cached per BUCKET ID, not per byte-array: an
  * UnsafeRow's getBinary returns a fresh copy every call, so reference
  * identity never matches, and content comparison is O(filter size) per
  * row. The bucket→filter mapping within one query is functional (the
  * filters come from a groupBy(bucket)), so a bucket-keyed cache is
  * sound and O(1) per row. A sort-merge join on bucket clusters rows of
  * one bucket together, so each task deserializes each of its buckets
  * once.
  *
  * Thread safety: the codegen path keeps the cache in generated-class
  * instance fields (one instance per task). The interpreted path may
  * share one expression instance across local-mode threads, so its
  * cache is a ThreadLocal.
  */
case class BloomMightContainKeyed(bucket: Expression, filter: Expression,
    valueHash: Expression) extends TernaryExpression with Predicate {

  override def first: Expression = bucket
  override def second: Expression = filter
  override def third: Expression = valueHash
  override def prettyName: String = "graft_bloom_might_contain_keyed"

  override def checkInputDataTypes(): TypeCheckResult =
    (bucket.dataType, filter.dataType, valueHash.dataType) match {
      case (LongType, BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (b, f, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, binary, bigint), got ($b, $f, $v)")
    }

  @transient private lazy val localCache =
    new ThreadLocal[(java.lang.Long, BloomFilter)]

  override def nullSafeEval(b: Any, f: Any, h: Any): Any = {
    val bk = b.asInstanceOf[Long]
    val cached = localCache.get()
    val bf =
      if (cached != null && cached._1.longValue() == bk) cached._2
      else {
        val fresh = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(f.asInstanceOf[Array[Byte]]))
        localCache.set((bk, fresh))
        fresh
      }
    bf.mightContainLong(h.asInstanceOf[Long])
  }

  /** Hand-rolled (not nullSafeCodeGen): the filter child must be
    * evaluated ONLY on a bucket-cache miss. nullSafeCodeGen splices
    * every child's evaluation before the body, and the filter child is
    * typically an UnsafeRow getBinary — a fresh O(filter-size) byte
    * copy PER ROW. Measured round-11 at x100: a 7 MB single-bucket
    * filter probed by a 450M-position stream allocated ~3 PB of
    * short-lived arrays — the executor sat at 100% old-gen with 13k
    * concurrent-GC cycles. With the lazy evaluation each task copies
    * each of its buckets once. Sound under the operator contract
    * (bucket → filter is functional, from a groupBy(bucket)): a bucket
    * whose filter is null is null on EVERY row (crossCorpus' left
    * join), so the null path never caches and never misreports. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val bEv = bucket.genCode(ctx)
    val hEv = valueHash.genCode(ctx)
    val fEv = filter.genCode(ctx)
    val has = ctx.addMutableState("boolean", "graftBloomHas")
    val last = ctx.addMutableState("long", "graftBloomLastBucket")
    val bf = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloomFilter")
    val resultCode =
      code"""
         |${bEv.code}
         |${hEv.code}
         |boolean ${ev.isNull} = ${bEv.isNull} || ${hEv.isNull};
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) {
         |  if (!$has || $last != ${bEv.value}) {
         |    ${fEv.code}
         |    if (${fEv.isNull}) {
         |      ${ev.isNull} = true;
         |    } else {
         |      try {
         |        $bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
         |          new java.io.ByteArrayInputStream(${fEv.value}));
         |      } catch (java.io.IOException e) {
         |        throw new RuntimeException(e);
         |      }
         |      $last = ${bEv.value};
         |      $has = true;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $bf.mightContainLong(${hEv.value});
         |  }
         |}
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BloomMightContainKeyed =
    copy(bucket = newFirst, filter = newSecond, valueHash = newThird)
}
