package graft

import graft.plans.BandJoinRewrite
import org.apache.spark.sql.functions._

/** The band-join optimizer rule: plan transformation (BNL → equi hash
  * join), result equality with the naive plan, and non-interference
  * with joins the rule must not touch. */
class BandJoinSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BandJoinRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  private lazy val prices = {
    import spark.implicits._
    Seq(1L -> 10.0, 2L -> 10.9, 3L -> 11.0, 4L -> 12.05, 5L -> 13.0, 6L -> 25.0)
      .toDF("id", "price")
  }

  private def naive() = {
    import spark.implicits._
    prices.as("a").join(prices.as("b"),
      abs($"a.price" - $"b.price") <= 1.0 && $"a.id" =!= $"b.id")
      .select($"a.id".as("a_id"), $"b.id".as("b_id"))
  }

  test("rewrites equi-less band join from BNL to hash join, same rows") {
    val before = naive().queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin"), before.take(300))
    val rowsBefore = naive().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val after = naive().queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin"), after.take(400))
      assert(after.contains("HashJoin") || after.contains("SortMergeJoin"), after.take(400))
      val rowsAfter = naive().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rowsAfter == rowsBefore && rowsBefore.nonEmpty)
    }
  }

  test("boundary pairs survive the rewrite (|a-b| exactly w, band edges)") {
    import spark.implicits._
    withRule {
      val rows = naive().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((1L, 3L)) && rows.contains((3L, 1L))) // 10.0 vs 11.0: |diff| = w exactly
      assert(!rows.contains((3L, 4L))) // 11.0 vs 12.05: diff 1.05 > w — must be absent
    }
  }

  test("does not touch joins that already have equi keys") {
    import spark.implicits._
    withRule {
      val j = prices.as("a").join(prices.as("b"),
        $"a.id" === $"b.id" && abs($"a.price" - $"b.price") <= 1.0)
      val plan = j.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__band_l"), plan.take(300))
      assert(j.count() == 6) // self equi join
    }
  }

  test("SQL-text DECIMAL width now triggers the rewrite (was silently BNL)") {
    withRule {
      prices.createOrReplaceTempView("bj_prices")
      // '1.0' parses as DECIMAL(2,1) — the case the advice flagged
      val j = spark.sql(
        """SELECT a.id AS a_id, b.id AS b_id
          |FROM bj_prices a JOIN bj_prices b
          |  ON abs(a.price - b.price) <= 1.0 AND a.id <> b.id""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
      val naiveRows = naive().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sqlRows = j.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sqlRows == naiveRows && sqlRows.nonEmpty)
    }
  }

  test("declines widths whose Double widening is inexact (stays BNL, stays correct)") {
    import spark.implicits._
    withRule {
      val big = Seq(1L -> 1L, 2L -> 3L).toDF("id", "v")
      // (2^53 + 1) does not round-trip through Double — the rule must
      // decline rather than build a band grid narrower than the predicate
      val w = (1L << 53) + 1
      val j = big.as("a").join(big.as("b"),
        abs($"a.v" - $"b.v") <= w && $"a.id" =!= $"b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
      assert(j.count() == 2) // both cross pairs qualify — nothing dropped
    }
  }
}
