package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-text entry point: temp views + spark.sql(...). Subqueries are
  * the interesting cases — Catalyst decorrelates them into joins
  * (RewriteCorrelatedScalarSubquery, exists→left-semi), so the physical
  * plans are the same shuffle-friendly shapes as the DataFrame API's;
  * none of these executes a per-row subquery at any scale.
  */
object Sql {

  private def withViews(spark: SparkSession, dir: String): Unit = {
    Tables.part(spark, dir).createOrReplaceTempView("part")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
  }

  /** Scalar subquery: parts priced above the mean part price. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)
    spark.sql(
      """SELECT p_partkey, p_retailprice
        |FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** IN subquery: customers having at least one 400k+ order. */
  def inSubquery(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated EXISTS: nations where some customer holds > 9000 balance. */
  def existsCorrelated(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)
    spark.sql(
      """SELECT n_nationkey, n_name
        |FROM nation
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_nationkey = n_nationkey AND c_acctbal > 9000.0)
        |ORDER BY n_nationkey""".stripMargin)
  }

  /** TPC-H Q4-shaped: orders placed in one quarter having at least one
    * line shipped after the order date, counted by priority — the
    * canonical correlated-EXISTS aggregate (decorrelates to a semi
    * join). */
  def tpchQ4(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate <  TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Correlated LATERAL subquery: top-2 orders by price per customer —
    * SQL's "for each row, run this parameterized subquery" surface.
    * Catalyst decorrelates the ORDER BY + LIMIT lateral into a
    * rank-filtered join (one shuffle on the correlation key), NOT a
    * per-row nested loop — exactly what survives a 100 TB outer side.
    * Raw price values flow through unaggregated, so no rounding is
    * needed for the oracle hash. */
  def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)
    spark.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * per-(priority,status), per-priority, and grand-total rows in one
    * pass — Catalyst expands then aggregates, still partial+final. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |       count(*) AS n_orders,
        |       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin)
  }

  /** TPC-H Q3-shaped query through the SQL surface: top-10 highest-revenue
    * undelivered orders for one market segment. DECIMAL revenue (exact,
    * order-independent) with the same casts as the oracle. */
  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)
    spark.sql(
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate  > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin)
  }
}
