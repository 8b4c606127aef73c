package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Shuffle-count pins for the analytics queries whose Scaladoc makes a
  * specific exchange claim. Prose claims drift; these execute the query
  * and count the actual ShuffleExchange nodes in the executed plan, so
  * a regression that adds a shuffle (a changed partitioning, a lost
  * reuse) fails a test instead of silently doubling the 100 TB cost.
  * Counts are on the EXECUTED adaptive plan via collectExec.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def hashShuffles(df: DataFrame): Int = {
    // collect() executes THIS Dataset's QueryExecution and finalizes its
    // adaptive plan; count() would build a separate aggregated
    // QueryExecution and leave df's plan un-executed (its exchange count
    // would then be the static estimate, not what actually ran)
    df.collect()
    collectExec(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike])
  }

  test("funnel: ONE user_id shuffle serves both window passes and the aggregate") {
    // window 1, window 2 and the groupBy all key on user_id — Spark must
    // reuse the partitioning; the only other exchange is the final
    // deterministic ORDER BY's range shuffle
    val n = hashShuffles(graft.ops.Relational.eventsFunnel(spark, dir))
    assert(n == 2, s"expected 2 exchanges (1 user_id hash + 1 output sort), got $n")
  }

  test("basket pairs: groupBy+HOF expansion keeps the fact table to one scan chain") {
    // distinct(ok, pk) → groupBy(ok) reuses nothing (different key) →
    // pair groupBy(p1, p2) → output sort: 4 exchanges total, and
    // crucially NO join node anywhere (the self-join formulation would
    // add two more fact-wide exchanges)
    val df = graft.ops.Relational.basketPairs(spark, dir)
    val n = hashShuffles(df)
    assert(n <= 4, s"expected ≤4 exchanges, got $n")
    val joins = collectExec(df.queryExecution.executedPlan)
      .count(p => p.nodeName.toLowerCase.contains("join"))
    assert(joins == 0, s"basket pairs must not plan a join, got $joins join nodes")
  }

  test("exact dedup: one key shuffle plus spread and output sort, no join") {
    // the VERDICT-table claim "one shuffle on normalized key": the only
    // exchanges are the narrow-input spread repartition, the groupBy on
    // the normalized key, and the deterministic output sort — and the
    // plan must contain no join node at any size
    val df = graft.ops.Text.dedupExact(spark, dir)
    val n = hashShuffles(df)
    assert(n <= 3, s"expected ≤3 exchanges (spread + key groupBy + sort), got $n")
    val joins = collectExec(df.queryExecution.executedPlan)
      .count(p => p.nodeName.toLowerCase.contains("join"))
    assert(joins == 0, s"exact dedup must not plan a join, got $joins")
  }

  test("cohort retention: both big shuffles key on user_id") {
    val df = graft.ops.Relational.cohortRetention(spark, dir)
    val n = hashShuffles(df)
    // min-week agg + distinct activity (both user_id) + cell agg + sort;
    // the cohort join itself must NOT add an exchange beyond these
    assert(n <= 5, s"expected ≤5 exchanges, got $n")
  }
}
