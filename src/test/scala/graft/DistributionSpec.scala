package graft

import org.apache.spark.sql.functions._

/** Distribution operators — the knobs that control where rows live
  * (repartition by hash / range, coalesce) and therefore what a
  * downstream stage shuffles. Asserted at the plan/partition level,
  * not just row counts. */
class DistributionSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    (1L to 1000L).map(i => (i, i % 7, s"v$i")).toDF("id", "k", "v")
  }

  test("repartition(n, col) hash-partitions: same key never splits") {
    import spark.implicits._
    val parts = df.repartition(8, $"k")
      .select($"k", spark_partition_id().as("pid"))
      .distinct()
      .groupBy($"k").agg(countDistinct($"pid").as("n_pids"))
      .collect()
    assert(parts.forall(_.getLong(1) == 1L), "a key spans multiple partitions")
  }

  test("repartitionByRange orders partitions by key ranges") {
    import spark.implicits._
    val ranges = df.repartitionByRange(4, $"id")
      .select($"id", spark_partition_id().as("pid"))
      .groupBy($"pid").agg(min($"id").as("lo"), max($"id").as("hi"))
      .orderBy($"pid").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // consecutive partitions must not overlap
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, ranges.mkString(","))
      case _ =>
    }
  }

  test("coalesce reduces partitions without a shuffle") {
    val c = df.repartition(16).coalesce(4)
    assert(c.rdd.getNumPartitions == 4)
    val plan = c.queryExecution.executedPlan.toString
    // coalesce appears as Coalesce, not as an Exchange after the repartition
    assert(plan.contains("Coalesce"), plan.take(300))
    assert(c.count() == 1000)
  }

  test("sortWithinPartitions keeps partition-local order, no global sort") {
    import spark.implicits._
    val s = df.repartition(4, $"k").sortWithinPartitions($"id")
    val plan = s.queryExecution.executedPlan.toString
    assert(plan.contains("Sort") && !plan.toLowerCase.contains("rangepartitioning"),
      plan.take(400))
  }
}
