package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Planted-skew rehearsal probe (round 7): runs on a `ScaleGen … skew`
  * dir (one hot customer holds ~20% of orders, one hot user ~20% of
  * events) and proves the two skew mitigations WORK at rehearsal scale,
  * not just on the sf0.1 fixture ScaleJoinSpec pins:
  *
  *   1. AQE skew-join split: the unsalted orders⋈customer sort-merge
  *      join must report numSkewedPartitions ≥ 1 and numSkewedSplits ≥ 2
  *      (the runtime metric, not the plan label), with the answer
  *      byte-equal to a broadcast-join reference. The skew thresholds
  *      are set proportionate to the miniature (4 MB/1 MB vs the 256 MB
  *      default a real cluster would use): at 100 TB the hot partition
  *      is tens of GB and crosses the default bar by itself; what is
  *      scale-invariant — and what this probe asserts — is the
  *      hot-partition : median ratio that makes AQE fire.
  *   2. The salted join (Relational.joinSkewSalted, the manual fallback
  *      when AQE can't help): its answer must equal the same reference
  *      on the skewed data.
  *
  * Exits nonzero on any violated assertion. Output: one JSON line
  * {hot_cust_frac, hot_user_frac, skewed_partitions, skewed_splits,
  * salted_matches, rows}.
  *
  * Usage: runMain graft.SkewProbe <skewScaleGenDir>
  */
object SkewProbe {
  private def collectExec(plan: SparkPlan): Seq[SparkPlan] =
    plan.collect {
      case a: AdaptiveSparkPlanExec => collectExec(a.executedPlan)
      case qs: QueryStageExec => qs +: collectExec(qs.plan)
      case p => Seq(p)
    }.flatten

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SkewProbe <skewScaleGenDir>")
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // proportionate-to-the-miniature skew bars (see scaladoc): the
      // planted hot partition is ~7 MB at x10 vs ~1 MB median
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the planted fractions, asserted so a non-skew dir fails fast
    val orders = Tables.orders(spark, dir)
    val events = Tables.events(spark, dir)
    val nOrd = orders.count()
    val hotCust = orders.filter($"o_custkey" === 0).count()
    val hotUser = events.filter($"user_id" === 0).count().toDouble / events.count()
    val hotFrac = hotCust.toDouble / nOrd
    require(hotFrac > 0.15 && hotFrac < 0.25,
      s"expected ~20% of orders on custkey 0, got $hotFrac — is $dir a skew dir?")

    // reference answer: broadcast join (no skew exposure at all)
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment")
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("string").as("revenue"))
        .orderBy($"c_mktsegment")
        .collect().map(_.toSeq).toSeq
    val reference = agg(orders.join(broadcast(cust), $"o_custkey" === $"c_custkey"))

    // 1. unsalted sort-merge join under AQE: broadcast disabled so the
    // exchange actually carries the hot key
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val (aqeAnswer, skewedParts, skewedSplits) = try {
      val j = orders.join(cust, $"o_custkey" === $"c_custkey")
      val answer = agg(j)
      val reads = collectExec(j.queryExecution.executedPlan)
        .filter(_.nodeName.contains("AQEShuffleRead"))
      (answer,
        reads.flatMap(_.metrics.get("numSkewedPartitions")).map(_.value).sum,
        reads.flatMap(_.metrics.get("numSkewedSplits")).map(_.value).sum)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    require(aqeAnswer == reference, "AQE skew-split join answer drifted from broadcast reference")
    require(skewedParts >= 1,
      s"expected >=1 skewed partition reported at ${nOrd} orders, got $skewedParts")
    require(skewedSplits >= 2,
      s"expected the hot partition split >=2 ways, got $skewedSplits")

    // 2. the manual salted fallback must agree on the same skewed data
    val salted = ops.Relational.joinSkewSalted(spark, dir)
      .select($"c_mktsegment", $"n_orders").collect().map(_.toSeq).toSeq
    val plainCounts = reference.map(r => Seq(r(0), r(1)))
    val saltedMatches = salted == plainCounts
    require(saltedMatches, s"salted join drifted on skewed data: $salted vs $plainCounts")

    println(String.format(java.util.Locale.ROOT,
      """{"hot_cust_frac":%.4f,"hot_user_frac":%.4f,"skewed_partitions":%d,""" +
        """"skewed_splits":%d,"salted_matches":%b,"orders":%d,"dir":"%s"}""",
      Double.box(hotFrac), Double.box(hotUser), Long.box(skewedParts),
      Long.box(skewedSplits), Boolean.box(saltedMatches), Long.box(nOrd), dir))
    spark.stop()
  }
}
