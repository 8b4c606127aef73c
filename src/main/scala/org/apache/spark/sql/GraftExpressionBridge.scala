package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters
  * (Spark 4 split the public Column API from catalyst; building a Column
  * from a custom Expression requires classic.ExpressionUtils, which is
  * sql-package-private). This is the entire surface we borrow — no
  * internal behavior is overridden.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a plain catalyst Expression tree.
    * `ExpressionUtils.expression` wraps the column's node in a LAZY
    * `ColumnNodeExpression` placeholder that only built-in Dataset
    * operators unwrap during their own analysis — inside a custom
    * LogicalPlan it survives to execution unresolved (and
    * unserializable). This converter produces the real tree up front
    * (UnresolvedAttributes inside it resolve generically); `$"x".desc`
    * style nodes come back as catalyst SortOrder. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Stable unique id of a classic session (`sessionUUID` is
    * private[sql]); used for memo keys that must not survive a session
    * restart — identity hash codes are reused after GC, a real UUID is
    * not. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Register a SQL-callable function on an existing (classic) session. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
  }

  /** Build a DataFrame from a hand-constructed logical plan (used to
    * apply a graft optimizer rule eagerly to ONE query instead of
    * registering it session-wide). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(classic, plan)
  }

  /** Swap a cached DataFrame's handle for one whose LOGICAL PLAN is the
    * registered InMemoryRelation LEAF itself (guide §3.3 "truncate the
    * plan", without the localCheckpoint recompute): every Dataset
    * operation re-runs the analyzer over the whole logical tree, so a
    * consumer stack built on a 15-join sketch relation pays ~0.5-1 s of
    * driver time PER QUERY re-analyzing a tree whose execution is one
    * cached-scan anyway (measured: q_dedup_embed warm run spent 0.79 s
    * of its 1.30 s in DataFrame construction). With the IMR as the leaf
    * the analyzer sees a one-node relation. Execution is IDENTICAL —
    * the CacheManager would have substituted this exact IMR node at
    * planning time; we substitute it at handle-construction time.
    *
    * The original plan stays registered in the CacheManager, so
    * independent queries that rebuild the full tree still cache-match
    * it, and clearCache() still governs the storage. Returns the input
    * unchanged when it has no registered cache entry.
    *
    * The leaf carries the CALLER's output attributes (round-15 ADVICE):
    * lookupCachedData matches by canonicalized plan (names/exprIds
    * erased), so a hit on an earlier-registered semantically-equal plan
    * with different output names would otherwise return a leaf whose
    * columns don't bind to the caller's — the same `withOutput`
    * re-binding CacheManager.useCachedData applies at substitution
    * time. */
  def cachedLeaf(df: DataFrame): DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    classic.sharedState.cacheManager
      .lookupCachedData(ds)
      .map(cd => org.apache.spark.sql.classic.Dataset.ofRows(classic,
          cd.cachedRepresentation.withOutput(ds.queryExecution.analyzed.output))
        .asInstanceOf[DataFrame])
      .getOrElse(df)
  }

  /** Eagerly register the driver-side StateStoreCoordinator RPC
    * endpoint. Round-15 robustness finding, fixed at the root in
    * round-16: the FIRST batch transformWithState query of a fresh
    * session could fail CANNOT_LOAD_STATE_STORE because a RocksDB
    * maintenance thread's snapshot-upload report reaches the
    * coordinator endpoint before anything driver-side has registered
    * it (batch mode never starts a StreamingQuery, so the manager's
    * lazy coordinator is never touched). forDriver is idempotent — a
    * second call returns the existing endpoint ref. */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get, classic.sessionState.conf)
    ()
  }

  /** Validity probe for memoized localCheckpoint()-backed handles
    * (round-15 ADVICE): localCheckpoint blocks do not survive executor
    * loss, and a lost block has NO lineage to recompute through — a
    * memo that trusts the handle unconditionally turns every subsequent
    * same-key call into a permanent failure. This checks, driver-side
    * with zero jobs, that every partition block of every LogicalRDD
    * leaf is still registered with the block manager master; any
    * inspection failure reads as NOT alive (safe: the caller rebuilds).
    * Non-LogicalRDD leaves pass — they have lineage. */
  def localCheckpointAlive(df: DataFrame): Boolean = {
    import org.apache.spark.storage.{BlockId, RDDBlockId}
    try {
      val master = org.apache.spark.SparkEnv.get.blockManager.master
      df.queryExecution.analyzed.collectLeaves().forall {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          val rdd = l.rdd
          val n = rdd.getNumPartitions
          n == 0 || {
            val ids = Array.tabulate(n)(i => RDDBlockId(rdd.id, i): BlockId)
            master.getLocations(ids).forall(_.nonEmpty)
          }
        case _ => true
      }
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  /** Inject the same function via SparkSessionExtensions at build time. */
  def injectFunction(
      ext: SparkSessionExtensions,
      name: String,
      builder: Seq[Expression] => Expression,
      className: String = "graft.plans.DoubleArrayDot"): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      builder))
  }
}
