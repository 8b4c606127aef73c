package graft.api

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** One-pass pipeline metrics via Spark's Observation API — the
  * instrumentation pattern a 100 TB pipeline needs: row counts and
  * checksums of intermediate stages collected as ACCUMULATOR-style
  * side-channel aggregates while the action runs, with ZERO extra jobs
  * and zero extra scans (a `count()` per stage would re-execute the
  * corpus-sized upstream once per metric).
  *
  * Usage:
  * {{{
  *   val (df, obs) = Observe.observed(stage, "stage1",
  *     count(lit(1)).as("rows"), sum($"n_tok").as("toks"))
  *   // ... build downstream plan on df, run ONE action ...
  *   val rows = obs.get("rows")
  * }}}
  */
object Observe {

  /** Attach named observation metrics to a DataFrame; returns the
    * (transparent) observed frame and the Observation handle whose
    * `get` blocks until the first action over the frame completes.
    * Metrics must be aggregate expressions without distinct. */
  def observed(df: DataFrame, name: String, metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observed: at least one metric is required")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
