package graft

import graft.Schemas.Event
import graft.ops.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The two join shapes that only matter at scale: watermarked
  * stream-stream interval joins (state-bounded on both sides) and
  * bucketed co-located batch joins (no shuffle at read time). */
class ScaleJoinSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, typ: String): Event =
    Event(id, ts(t), user, typ, 1.0, "{}")

  test("stream-stream interval join: purchase matches clicks within 30min") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val c = clicks.toDF.select($"event_id".as("click_id"), $"ts".as("click_ts"), $"user_id".as("c_user"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.toDF.select($"event_id".as("purchase_id"), $"ts".as("purchase_ts"), $"user_id".as("p_user"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = p.join(c,
      $"p_user" === $"c_user" &&
      $"click_ts" <= $"purchase_ts" &&
      $"click_ts" >= $"purchase_ts" - expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    try {
      clicks.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "click"),
        ev(2, "2024-01-01 10:50:00", 1, "click"),
        ev(3, "2024-01-01 10:00:00", 2, "click")))
      purchases.addData(Seq(
        ev(10, "2024-01-01 11:00:00", 1, "purchase"),  // within 30m of click 2 only
        ev(11, "2024-01-01 12:00:00", 2, "purchase"))) // no click within 30m
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ss_join")
      .select($"purchase_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((10L, 2L)), rows.toString)
  }

  test("signLshBuckets: occupancy-bounded refinement splits a skewed bucket") {
    import spark.implicits._
    // skewed fixture: ALL vectors share the 6 base sign bits (one hot
    // base bucket of 2000 — over the cap), but are uniformly sign-
    // separable in the 4 refinement coords
    val n = 2000
    val data = (0 until n).map { i =>
      val refinement = (0 until 4).map(b => if (((i >> (3 - b)) & 1) == 1) 0.5f else -0.5f)
      (i.toLong, (Seq.fill(6)(0.5f) ++ refinement).toArray)
    }.toDF("vec_id", "embedding")
    val bucketed = graft.api.Similarity.signLshBuckets(
      data, "vec_id", "embedding", nBits = 6, extraBits = 4, maxOccupancy = 32)
    val occ = bucketed.groupBy($"bucket").count().collect()
    // the hot bucket split into all 16 refinement buckets of n/16 each
    assert(occ.length == 16, s"expected 16 refined buckets, got ${occ.length}")
    assert(occ.map(_.getLong(1)).max == n / 16,
      s"max occupancy ${occ.map(_.getLong(1)).max} != ${n / 16}")
    // per-block join work: unrefined blocking would be one n² block;
    // refinement bounds the candidate pair count to ~1/16 of that
    val pairs = occ.map(c => c.getLong(1) * (c.getLong(1) - 1) / 2).sum
    assert(pairs <= n.toLong * (n - 1) / 2 / 10, s"pair count $pairs not bounded")
  }

  test("salted join: hot key's max shuffle group shrinks ~1/S, result unchanged") {
    import spark.implicits._
    val salts = 8
    // genuinely hot key: 8000 of 8100 left rows share k=1
    val left = ((0 until 8000).map(i => (1L, i.toLong)) ++
      (0 until 100).map(i => (2L + i % 50, (8000 + i).toLong))).toDF("k", "row_id")
    val right = (1L to 51L).map(k => (k, s"seg${k % 5}")).toDF("rk", "seg")
    // max rows landing in one shuffle group = the max-task input proxy
    // (each group hashes to exactly one reducer task)
    val unsaltedMax = left.groupBy($"k").count()
      .agg(max($"count")).head().getLong(0)
    val salted = left.withColumn("salt", pmod(xxhash64($"row_id"), lit(salts.toLong)))
    val saltedMax = salted.groupBy($"k", $"salt").count()
      .agg(max($"count")).head().getLong(0)
    assert(unsaltedMax == 8000L)
    assert(saltedMax <= unsaltedMax / salts * 13 / 10, // ~1/S with hash noise
      s"salted max group $saltedMax vs unsalted $unsaltedMax")
    // the salted join must produce EXACTLY the plain join's answer
    val rightRep = right.withColumn("salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    val plain = left.join(right, $"k" === $"rk")
      .groupBy($"seg").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaSalt = salted.join(rightRep,
        salted("k") === rightRep("rk") && salted("salt") === rightRep("salt"))
      .groupBy($"seg").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(plain == viaSalt, s"salted answer drifted: $viaSalt vs $plain")
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    import spark.implicits._
    // thresholds tuned down so the fixture's hot key (3MB partition vs
    // ~KB median) crosses AQE's skew bar: partition > threshold AND >
    // factor x median
    val tuned = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val payload = "x" * 64
      val left = ((1 to 60000).map(i => (1L, s"$payload$i")) ++
        (1 to 2000).map(i => ((i % 500) + 2L, s"$payload$i"))).toDF("k", "pay")
      val right = (1L to 501L).map(k => (k, s"r$k")).toDF("rk", "rv")
      // the plan under inspection is the JOIN itself: a downstream
      // keyed aggregate would impose a distribution requirement that
      // makes AQE decline the split (it won't add a shuffle unless
      // forceOptimizeSkewedJoin)
      val j = left.join(right, $"k" === $"rk").select($"rv")
      assert(j.collect().length == 62000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + finalPlan.take(1200))
      // beyond the plan marker: the AQEShuffleRead must REPORT skewed
      // partitions it actually split (the runtime metric, not just the
      // node label), and the split count quantifies the salting-free
      // mitigation — the hot key's reducer input is divided across
      // that many tasks, the same ~1/S effect the manual salted form
      // above engineers by hand. docs/PLANS.md "Skew" section carries
      // the executed-plan evidence.
      val aqeReads = collectExec(j.queryExecution.executedPlan)
        .filter(_.nodeName.contains("AQEShuffleRead"))
      val skewed = aqeReads.flatMap(_.metrics.get("numSkewedPartitions")).map(_.value).sum
      val splits = aqeReads.flatMap(_.metrics.get("numSkewedSplits")).map(_.value).sum
      assert(skewed >= 1, s"expected >=1 skewed partition reported, got $skewed")
      assert(splits >= 2, s"expected the hot partition split >=2 ways, got $splits")
      info(s"AQE reported $skewed skewed partition(s) split $splits ways — " +
        "unsalted plan, same mitigation the salted test builds manually")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join-order robustness: a mis-ordered 3-table join still broadcasts the dim") {
    import spark.implicits._
    // The contract under test (documented in docs/PLANS.md): Spark's
    // broadcast decision is PER-JOIN and size-estimate driven, so it is
    // independent of the order the user wrote the joins in — a dim
    // joined dead last, after a fact⋈fact join, still broadcasts. (True
    // cost-based join REORDERING needs catalog stats this engine's raw
    // parquet reads don't have; hand-sane ordering + AQE runtime
    // re-planning is the contract, and this test pins the half Spark
    // gives us for free.)
    val dir = "/root/testdata/sf0.001"
    // threshold between the PRUNED estimates: Catalyst scales the file
    // size by the read-column fraction, so orders (35 KB file, 2 of 9
    // columns read ≈ 8 KB) must stay above it and customer (7 KB file,
    // 2 of 8 columns ≈ 2 KB) below — the fact⋈fact join must NOT
    // broadcast, the trailing dim must
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4KB")
    try {
      val li = Tables.lineitem(spark, dir)
      val ord = Tables.orders(spark, dir)
      val cust = Tables.customer(spark, dir)
      // user-hostile order: the two facts first, the dim last
      val q = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(cust("c_mktsegment")).agg(sum(li("l_quantity")).as("sum_qty"))
      assert(q.collect().nonEmpty)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "dim did not broadcast despite small size:\n" + plan.take(1200))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        plan.take(1200))
      // and the fact⋈fact side really was too big to broadcast — the
      // broadcast we saw is the dim, not everything
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "fact join unexpectedly broadcast — threshold fixture broken:\n" + plan.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("Bucketed.ordersLineitem: real fact⋈fact join runs with no exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (o, l) = graft.sources.Bucketed.ordersLineitem(spark, "/root/testdata/sf0.001")
      val j = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(o("o_orderpriority"), l("l_extendedprice"))
      val n = j.count()
      assert(n > 0)
      val nodes = collectExec(j.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
        "bucketed fact join still shuffles:\n" + nodes.mkString("\n").take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dynamic partition pruning: a runtime dim filter prunes fact partitions") {
    import spark.implicits._
    // DPP needs (a) a partitioned FILE scan joined on the partition
    // column, (b) a FILE-source dim with a selective filter on a
    // DIFFERENT column — a filter on the join column itself is
    // constant-propagated and pruned STATICALLY (no DPP needed), and a
    // LocalRelation dim never triggers the rule. Size heuristics are
    // relaxed for the fixture (defaults target real table sizes).
    val dest = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.partitionBy("o_orderpriority").mode("overwrite").parquet(dest)
    val part = spark.read.parquet(dest)
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"),
      ("4-NOT SPECIFIED", "drop"), ("5-LOW", "drop")).toDF("prio", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val tuned = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = part.join(dim.filter($"tag" === "keep"),
          part("o_orderpriority") === dim("prio"))
        .agg(count(lit(1)).as("n"))
      val n = q.head().getLong(0)
      // only the 1-URGENT partition's rows survive
      val urgent = Tables.orders(spark, "/root/testdata/sf0.001")
        .filter($"o_orderpriority" === "1-URGENT").count()
      assert(n == urgent, s"DPP changed the answer: $n vs $urgent")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        "no dynamicpruning expression in PartitionFilters:\n" + plan.take(1200))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter: selective dim filter injects might_contain on the fact") {
    import spark.implicits._
    // InjectRuntimeFilter pre-filters the fact side of a shuffle join
    // with a bloom built from the filtered dim — semi-join reduction
    // before the shuffle, the pattern that matters when the fact is
    // 100 TB and the surviving dim keys are few. Size thresholds are
    // relaxed (defaults: application side > 10 GB).
    val tuned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "50MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.01"
      val li = Tables.lineitem(spark, dir)
      val ord = Tables.orders(spark, dir).filter($"o_orderpriority" === "1-URGENT")
      val q = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .agg(sum($"l_quantity").as("s"))
      assert(q.head().getDouble(0) > 0)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        "no bloom runtime filter on the fact scan:\n" + plan.take(1200))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables co-locate: join plan has no shuffle exchange") {
    import spark.implicits._
    // warehouse.dir is a static conf — managed tables land in the default
    // ./spark-warehouse; DROP TABLE below removes the files.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val orders = Seq((1L, 10L, 100.0), (2L, 11L, 200.0), (3L, 10L, 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((10L, "A"), (11L, "B")).toDF("c_custkey", "c_mktsegment")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    // disable auto-broadcast so the co-located sort-merge path is exercised
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() == 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
