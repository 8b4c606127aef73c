package graft

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

/** The custom codegen'd DoubleArrayDot expression must agree exactly
  * with the interpreted HOF formulation (same sequential fold order →
  * bit-identical doubles), survive nulls, and reject wrong types. */
class ExpressionSpec extends SparkSpec {

  test("dotFast equals HOF dotD bit-for-bit on random-ish vectors") {
    import spark.implicits._
    val rows = (1 to 100).map { i =>
      val a = Array.tabulate(64)(j => math.sin(i * 64 + j))
      val b = Array.tabulate(64)(j => math.cos(i * 64 + j))
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
        (V.dotFast($"a", $"b") - V.dotD($"a", $"b")).as("d"))
      .agg(max(abs($"d"))).head.getDouble(0)
    assert(diff == 0.0, s"codegen vs interpreted drift: $diff")
  }

  test("dotFast null semantics: null array → null result") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(V.dotFast($"a", $"b")).head
    assert(r.isNullAt(0))
  }

  test("dotFast rejects non-double arrays at analysis time") {
    import spark.implicits._
    val df = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(V.dotFast($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("double_array_dot") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"), e.getMessage)
  }

  test("dotFast handles length mismatch by folding the shorter prefix") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0))).toDF("a", "b")
    assert(df.select(V.dotFast($"a", $"b")).head.getDouble(0) == 50.0)
  }

  test("normalizeFast equals the HOF normalize bit-for-bit (float and double inputs)") {
    import spark.implicits._
    val rowsF = (1 to 100).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    }
    val dfF = rowsF.toDF("id", "v")
    val hof = dfF
      .withColumn("__nrm", V.l2Norm($"v"))
      .select(transform($"v", x =>
        when($"__nrm" =!= 0.0, x.cast("double") / $"__nrm")
          .otherwise(lit(0.0))).as("nemb"))
    val fast = dfF.select(V.normalizeFast($"v").as("nemb"))
    val drift = hof.select(explode($"nemb").as("x")).withColumn("rid", monotonically_increasing_id())
      .join(fast.select(explode($"nemb").as("y")).withColumn("rid", monotonically_increasing_id()), "rid")
      .agg(max(abs($"x" - $"y"))).head.getDouble(0)
    assert(drift == 0.0, s"codegen vs interpreted normalize drift: $drift")
    // double input path too
    val dfD = Seq((1L, Array(3.0, 4.0))).toDF("id", "v")
    val r = dfD.select(V.normalizeFast($"v")).head.getSeq[Double](0)
    assert(r == Seq(0.6, 0.8))
  }

  test("normalizeFast: zero vector → zeros; null array → null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(0.0f, 0.0f, 0.0f))),
      (2L, Option.empty[Array[Float]])
    ).toDF("id", "v")
    val rows = df.select($"id", V.normalizeFast($"v").as("n")).orderBy($"id").collect()
    assert(rows(0).getSeq[Double](1) == Seq(0.0, 0.0, 0.0))
    assert(rows(1).isNullAt(1))
  }

  test("normalizeFast rejects non-numeric-array input at analysis time") {
    import spark.implicits._
    val df = Seq((Array("a", "b"))).toDF("v")
    val e = intercept[Exception] {
      df.select(V.normalizeFast($"v")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("double_array_normalize") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"), e.getMessage)
  }

  test("double_array_dot is SQL-callable after GraftFunctions.register") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("dot_in")
    val r = spark.sql("SELECT double_array_dot(a, b) AS d FROM dot_in").head.getDouble(0)
    assert(r == 11.0)
  }
}
