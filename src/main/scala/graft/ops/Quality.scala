package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit over the warehouse (the validation stage every
  * production pipeline runs before trusting a load): referential
  * integrity across the star schema, null checks on required columns,
  * primary-key uniqueness, and domain checks — one row per check with
  * its violation count. Each check is a single anti-join or aggregate
  * (no row-by-row validation; everything shuffles on the checked key).
  */
object Quality {

  def qualityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val p = Tables.part(spark, dir)

    def check(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), $"n_violations")

    val checks = Seq(
      // referential integrity: facts must resolve to their dimensions
      check("lineitem_orphan_orderkey",
        li.join(o, $"l_orderkey" === $"o_orderkey", "left_anti")),
      check("lineitem_orphan_partkey",
        li.join(p, $"l_partkey" === $"p_partkey", "left_anti")),
      check("orders_orphan_custkey",
        o.join(c, $"o_custkey" === $"c_custkey", "left_anti")),
      // required-column nulls
      check("orders_null_orderdate", o.filter($"o_orderdate".isNull)),
      check("lineitem_null_quantity", li.filter($"l_quantity".isNull)),
      // primary-key uniqueness (violating key values)
      check("orders_duplicate_pk",
        o.groupBy($"o_orderkey").count().filter($"count" > 1)),
      check("lineitem_duplicate_pk",
        li.groupBy($"l_orderkey", $"l_linenumber").count().filter($"count" > 1)),
      // domain constraints
      check("lineitem_nonpositive_qty", li.filter($"l_quantity" <= 0.0)),
      check("lineitem_discount_range",
        li.filter($"l_discount" < 0.0 || $"l_discount" > 1.0)),
      check("orders_status_domain",
        o.filter(!$"o_orderstatus".isin("F", "O", "P"))),
    )
    checks.reduce(_.unionByName(_)).orderBy($"check_name")
  }
}
