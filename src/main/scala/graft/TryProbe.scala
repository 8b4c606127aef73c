package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the DUALBENCH q_fn_try finding: which try_ expression
  * carries the 10 s materialization cost at sf0.1 (count() reads
  * 0.065 s). Each expression timed alone through the noop sink.
  * Findings in BASELINE.md round-13 dual-reading section. */
object TryProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    def t(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"TRY $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    t("baseline_key_only", o.select($"o_orderkey"))
    t("try_divide", o.select(round(try_divide($"o_totalprice", ($"o_custkey" % 7).cast("double")), 6)))
    t("try_cast_always_fail", o.select(expr("try_cast(o_orderpriority AS INT)")))
    t("try_cast_always_ok", o.select(expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")))
    t("try_add_overflow", o.select(expr("try_add(o_orderkey, 9223372036854775800L)")))
    spark.stop()
  }
}
