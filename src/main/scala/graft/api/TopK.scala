package graft.api

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}

import graft.plans.{TopKPerKeyNode, TopKPerKeyStrategy}

/** Public surface for the [[graft.plans.TopKPerKeyNode]] custom operator
  * (SURVEY.md §2/§8 escalation step (c): LogicalPlan + SparkStrategy +
  * SparkPlan). See TopKPerKey.scala's scaladoc for why this beats the
  * `row_number().over(...) <= k` window formulation at scale: the partial
  * stage bounds the exchange to k rows per key per task instead of
  * shuffling + sorting the whole corpus.
  */
object TopK {

  /** Idempotently register the planning strategy on an existing session.
    * `spark.experimental.extraStrategies` is public API, and — unlike an
    * optimizer rule — a Strategy is inert for every plan that does not
    * contain the node it matches, so session-wide registration cannot
    * change the plan of any other query (no call-order hazard). */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
  }

  /** First k rows per distinct key under `order` (ascending unless the
    * Column carries .desc), rows passed through unchanged. Callers
    * wanting deterministic output must make `order` a total order (add a
    * unique tiebreak) — same contract as rank-based SQL.
    *
    * `maxPartialKeys` caps the map-side heap table: past it the eldest
    * key's heap is flushed to the shuffle early (correct — the final
    * stage merges; costs only combine effectiveness). The default holds
    * ≤ 256k·k rows per task; lower it for very wide rows or large k. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      maxPartialKeys: Int = 1 << 18): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val keyExprs = keys.map(GraftExpressionBridge.eagerExpression)
    val sortExprs = order.map { c =>
      GraftExpressionBridge.eagerExpression(c) match {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending)
      }
    }
    GraftExpressionBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, sortExprs, k, maxPartialKeys, df.queryExecution.analyzed))
  }
}
