package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.plans.TopKPerKeyExec

/** The custom TopKPerKey operator (graft.plans + api.TopK): result
  * equality with the window-rank formulation, the partial/final plan
  * shape with exactly one exchange and no Sort, bounded partial output,
  * and exchange elision when the child is already clustered. */
class TopKSpec extends SparkSpec {

  // 4 keys × 50 rows with deliberate duplicate values in v (ties resolved
  // by the unique id tiebreak — the operator's documented contract)
  private lazy val df = {
    import spark.implicits._
    (0 until 200).map(i => (i % 4, i.toLong, (i * 7919 % 23).toDouble))
      .toDF("key", "id", "v")
      .repartition(8) // several input partitions → real partial stage
  }

  private def topk(k: Int) = {
    import spark.implicits._
    api.TopK.topKPerKey(df, Seq($"key"), Seq($"v".desc, $"id"), k)
  }

  private def windowed(k: Int) = {
    import spark.implicits._
    val w = Window.partitionBy($"key").orderBy($"v".desc, $"id")
    df.withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
  }

  private def rows(dfr: org.apache.spark.sql.DataFrame): Set[(Int, Long, Double)] =
    dfr.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet

  test("matches the window row_number formulation, including ties") {
    for (k <- Seq(1, 3, 10)) {
      val got = rows(topk(k))
      val want = rows(windowed(k))
      assert(got == want, s"k=$k: ${got.diff(want)} extra, ${want.diff(got)} missing")
      assert(got.size == 4 * k)
    }
  }

  test("k >= group size emits every row exactly once") {
    assert(rows(topk(1000)) == rows(df) && topk(1000).count() == 200)
  }

  private def ensureReqExchanges(nodes: Seq[org.apache.spark.sql.execution.SparkPlan]) =
    nodes.collect {
      case s: ShuffleExchangeExec if s.shuffleOrigin == ENSURE_REQUIREMENTS => s
    }

  test("plan shape: partial + final exec, one planner exchange, no Sort anywhere") {
    val q = topk(3)
    q.collect() // finalize the adaptive plan before inspecting
    val nodes = collectExec(q.queryExecution.executedPlan)
    val topks = nodes.collect { case t: TopKPerKeyExec => t }
    assert(topks.map(_.partial).sorted == Seq(false, true), nodes.mkString("\n"))
    // exactly one EnsureRequirements exchange between partial and final
    // (the fixture's own repartition(8) round-robin shuffle is separate)
    assert(ensureReqExchanges(nodes).size == 1, nodes.mkString("\n"))
    assert(!nodes.exists(_.isInstanceOf[SortExec]), nodes.mkString("\n"))
  }

  test("partial stage bounds its output to k rows per key per task") {
    import spark.implicits._
    // partial output rows ≤ numInputPartitions · keys · k, counted by
    // running ONLY the partial stage (strategy applied, final dropped)
    val analyzed = topk(2).queryExecution.executedPlan
    val partialOnly = collectExec(analyzed).collectFirst {
      case t: TopKPerKeyExec if t.partial => t
    }.get
    val n = partialOnly.execute().count()
    assert(n <= 8L * 4 * 2, s"partial emitted $n rows")
    assert(n >= 4 * 2L) // at least k rows per key overall
  }

  test("partial-stage eviction (tiny maxPartialKeys) loses no rows") {
    import spark.implicits._
    // cap of 2 live heaps over 4 interleaved keys forces constant
    // evict-and-emit; the final stage must still merge to the exact result
    for (k <- Seq(1, 3)) {
      val q = api.TopK.topKPerKey(df, Seq($"key"), Seq($"v".desc, $"id"), k,
        maxPartialKeys = 2)
      assert(rows(q) == rows(windowed(k)), s"k=$k under eviction")
    }
  }

  test("empty keys rejected with a clear message at construction") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      api.TopK.topKPerKey(df, Seq.empty, Seq($"v".desc), 3)
    }
    assert(e.getMessage.contains("orderBy(...).limit(k)"), e.getMessage)
  }

  test("exchange elided when the child is already clustered on the keys") {
    import spark.implicits._
    val pre = df.repartition($"key")
    val q = api.TopK.topKPerKey(pre, Seq($"key"), Seq($"v".desc, $"id"), 3)
    q.collect()
    val nodes = collectExec(q.queryExecution.executedPlan)
    // the only shuffle is the explicit repartition($"key") —
    // EnsureRequirements added none between partial and final
    assert(ensureReqExchanges(nodes).isEmpty, nodes.mkString("\n"))
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1, nodes.mkString("\n"))
    assert(rows(q) == rows(windowed(3)))
  }
}
