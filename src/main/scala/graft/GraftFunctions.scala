package graft

import graft.plans.DoubleArrayDot
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{GraftExpressionBridge => B}

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql("SELECT double_array_dot(a, b) ...")` works alongside the
  * Column API (`VectorFunctions.dotFast`).
  *
  * Two registration paths:
  *  - [[GraftFunctions.register]] — on an existing session (the harness
  *    hands us pre-built sessions, so this is the path the engine uses).
  *  - [[GraftExtensions]] — a SparkSessionExtensions hook for users who
  *    control session creation:
  *    `SparkSession.builder.withExtensions(new GraftExtensions)` or
  *    `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftFunctions {
  val names: Seq[String] = Seq("double_array_dot", "hamming_distance",
    "double_array_normalize", "word_shingles", "sorted_token_set_key",
    "token_run_lengths", "ngram_run_lengths")

  def register(spark: SparkSession): Unit = {
    B.registerFunction(spark, "double_array_dot",
      args => {
        require(args.length == 2, "double_array_dot(a, b) takes exactly 2 arguments")
        DoubleArrayDot(args(0), args(1))
      })
    B.registerFunction(spark, "hamming_distance",
      args => {
        require(args.length == 2, "hamming_distance(a, b) takes exactly 2 arguments")
        graft.plans.HammingDistance(args(0), args(1))
      })
    B.registerFunction(spark, "double_array_normalize",
      args => {
        require(args.length == 1, "double_array_normalize(v) takes exactly 1 argument")
        graft.plans.DoubleArrayNormalize(args(0))
      })
    B.registerFunction(spark, "word_shingles",
      args => {
        require(args.length == 2, "word_shingles(text, n) takes exactly 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles' n must be an integer literal, got $other")
        }
        graft.plans.WordShingles(args(0), n)
      })
    B.registerFunction(spark, "sorted_token_set_key",
      args => {
        require(args.length == 1, "sorted_token_set_key(text) takes exactly 1 argument")
        graft.plans.SortedTokenSetKey(args(0))
      })
    B.registerFunction(spark, "token_run_lengths",
      args => {
        require(args.length == 1, "token_run_lengths(text) takes exactly 1 argument")
        graft.plans.TokenRunLengths(args(0))
      })
    B.registerFunction(spark, "char_poly_hash",
      args => {
        require(args.length == 1, "char_poly_hash(text) takes exactly 1 argument")
        graft.plans.CharPolyHash(args(0))
      })
    B.registerFunction(spark, "repetition_stats",
      args => {
        require(args.length == 1, "repetition_stats(text) takes exactly 1 argument")
        graft.plans.RepetitionStats(args(0))
      })
    B.registerFunction(spark, "ngram_run_lengths",
      args => {
        require(args.length == 2, "ngram_run_lengths(text, n) takes exactly 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ngram_run_lengths' n must be an integer literal, got $other")
        }
        graft.plans.NgramRunLengths(args(0), n)
      })
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    B.injectFunction(ext, "double_array_dot",
      args => {
        require(args.length == 2, "double_array_dot(a, b) takes exactly 2 arguments")
        DoubleArrayDot(args(0), args(1))
      })
    B.injectFunction(ext, "hamming_distance",
      args => {
        require(args.length == 2, "hamming_distance(a, b) takes exactly 2 arguments")
        graft.plans.HammingDistance(args(0), args(1))
      },
      className = "graft.plans.HammingDistance")
    B.injectFunction(ext, "double_array_normalize",
      args => {
        require(args.length == 1, "double_array_normalize(v) takes exactly 1 argument")
        graft.plans.DoubleArrayNormalize(args(0))
      },
      className = "graft.plans.DoubleArrayNormalize")
    B.injectFunction(ext, "sorted_token_set_key",
      args => {
        require(args.length == 1, "sorted_token_set_key(text) takes exactly 1 argument")
        graft.plans.SortedTokenSetKey(args(0))
      },
      className = "graft.plans.SortedTokenSetKey")
    B.injectFunction(ext, "token_run_lengths",
      args => {
        require(args.length == 1, "token_run_lengths(text) takes exactly 1 argument")
        graft.plans.TokenRunLengths(args(0))
      },
      className = "graft.plans.TokenRunLengths")
    B.injectFunction(ext, "ngram_run_lengths",
      args => {
        require(args.length == 2, "ngram_run_lengths(text, n) takes exactly 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ngram_run_lengths' n must be an integer literal, got $other")
        }
        graft.plans.NgramRunLengths(args(0), n)
      },
      className = "graft.plans.NgramRunLengths")
    B.injectFunction(ext, "word_shingles",
      args => {
        require(args.length == 2, "word_shingles(text, n) takes exactly 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles' n must be an integer literal, got $other")
        }
        graft.plans.WordShingles(args(0), n)
      },
      className = "graft.plans.WordShingles")
    // naive abs(a-b) <= w joins become banded equi joins automatically
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}
