package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable event-time operators. Both shuffle each key's rows exactly
  * once (window over the key partition) — no range join, no per-row
  * subquery, state bounded by the partition.
  */
object Temporal {

  /** Appends a per-key `session_id` (1-based) that increments whenever
    * the gap to the previous event exceeds gapSeconds. tieCol breaks
    * equal-timestamp ordering deterministically. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev_ts", lag(col(tsCol), 1).over(byKey))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__new_session")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }

  /** Bounded-duration interval-OVERLAP self-join within a key: pairs
    * (a, b) with a.id < b.id whose [start, end] windows intersect.
    * PRECONDITION: every interval's duration ≤ maxDurSeconds.
    *
    * Spark executes a raw overlap condition (two inequalities) as an
    * O(n²) nested-loop join; here overlap ⟹ |startA − startB| ≤ maxDur
    * ⟹ their floor(start/maxDur) band ids differ by ≤ 1, so one side
    * carries 3 candidate bands and the join is EQUI on (key, band) with
    * the exact overlap predicate as residual — shuffle-partitionable at
    * any scale (the plans.BandJoinRewrite trick, applied at the API
    * level because the predicate spans two columns per side). Each
    * qualifying pair matches in exactly one band, so no dedup pass.
    * Banding uses second-truncated epochs; a truncated gap of
    * maxDur + 1 implies a true gap > maxDur, so truncation never drops
    * a qualifying pair. The residual compares full-precision
    * timestamps.
    *
    * The precondition is ENFORCED, not assumed: a violating interval
    * could reach qualifying pairs whose bands differ by > 1, which would
    * silently drop them — indistinguishable from a correct result. The
    * guard is folded into the band column itself (an unused assertion
    * column would be pruned away), so any row with e − s > maxDurSeconds
    * raises with its id instead of losing pairs; per-row cost is one
    * codegen'd compare, no extra pass or job. */
  def intervalOverlapSelfJoin(df: DataFrame, idCol: String, keyCol: String,
      startCol: String, endCol: String, maxDurSeconds: Long): DataFrame = {
    require(maxDurSeconds > 0)
    val base = df.select(col(idCol).as("id"), col(keyCol).as("key"),
      col(startCol).as("s"), col(endCol).as("e"),
      when(unix_timestamp(col(endCol)) - unix_timestamp(col(startCol)) > maxDurSeconds,
        raise_error(concat(
          lit(s"intervalOverlapSelfJoin: interval duration > maxDurSeconds=$maxDurSeconds for id "),
          col(idCol).cast("string"))))
        .otherwise(floor(unix_timestamp(col(startCol)) / maxDurSeconds))
        .as("band"))
    val probes = base.withColumn("band",
      explode(array(col("band") - 1, col("band"), col("band") + 1)))
    base.as("a").join(probes.as("b"),
        col("a.key") === col("b.key") && col("a.band") === col("b.band") &&
        col("a.id") < col("b.id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.key").as("key"), col("a.id").as("a_id"), col("b.id").as("b_id"))
  }

  /** Regular-grid resample with forward fill (LOCF): aggregate rows to
    * per-(key, bucket) observations, generate each key's complete
    * bucket grid between its first and last observation, and carry the
    * last observed value across gap buckets. The 100 TB shape: the
    * grid comes from a per-key min/max aggregate (tiny) exploded by
    * `sequence` — never a driver-side loop or a global calendar cross
    * join — the gap-fill join is equi on (key, bucket), and the fill
    * itself is one ordered window pass per key; every stage shuffles
    * on the key. Output: (key, bucket_start, n_events, filled_max,
    * is_gap) where filled_max LOCFs the per-bucket max (max is
    * order-independent, so it cross-checks exactly — a summed measure
    * would need the DECIMAL treatment). */
  def resampleLocf(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      truncUnit: String = "hour"): DataFrame = {
    // the unit must be valid for BOTH date_trunc and an interval
    // literal ("quarter" truncates but is not an interval unit — it
    // would otherwise fail with a parse error deep inside the plan;
    // and truncUnit reaches expr() so it must never be free text)
    require(Set("year", "month", "week", "day", "hour", "minute", "second")
      .contains(truncUnit.toLowerCase),
      s"resampleLocf: unsupported bucket unit '$truncUnit'")
    val hourly = df
      .groupBy(col(keyCol).as("key"), date_trunc(truncUnit, col(tsCol)).as("bucket_start"))
      .agg(count(lit(1)).as("n_obs"), max(col(valCol)).as("bmax"))
    val grid = hourly
      .groupBy(col("key")).agg(min(col("bucket_start")).as("lo"), max(col("bucket_start")).as("hi"))
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"), expr(s"INTERVAL 1 $truncUnit"))).as("bucket_start"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("key", "bucket_start"), "left")
      .withColumn("filled_max", last(col("bmax"), ignoreNulls = true).over(w))
      .select(col("key"), col("bucket_start"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        round(col("filled_max"), 6).as("filled_max"),
        when(col("n_obs").isNull, 1).otherwise(0).as("is_gap"))
  }

  /** As-of join: for each left row, the id of the latest right row with
    * the same key and rightTs ≤ leftTs (an equal-timestamp right row
    * matches). Among right rows tied on (key, ts) the winner is the one
    * sorting last under (length, value) string ordering of its id —
    * numeric order for non-negative integer ids, deterministic-but-
    * lexicographic for other id types. Implemented as union + one
    * window pass — each key's rows shuffle once.
    * Returns (left id, matched right id or null). */
  def asofJoin(
      left: DataFrame, leftId: String, leftKey: String, leftTs: String,
      right: DataFrame, rightId: String, rightKey: String, rightTs: String): DataFrame = {
    // id columns keep their OWN types on both sides (a shared column
    // would make unionByName coerce, e.g. string UUID → BIGINT throws
    // under ANSI); the union-wide tiebreak is a string rendering, used
    // only to order equal-timestamp rows deterministically
    val leftIdType = left.schema(leftId).dataType
    val rightIdType = right.schema(rightId).dataType
    val l = left.select(col(leftId).as("__lid"), col(leftKey).as("__key"),
      col(leftTs).as("__ts"), lit(1).as("__is_left"),
      col(leftId).cast("string").as("__tie"),
      lit(null).cast(rightIdType).as("__right_id"))
    val r = right.select(lit(null).cast(leftIdType).as("__lid"), col(rightKey).as("__key"),
      col(rightTs).as("__ts"), lit(0).as("__is_left"),
      col(rightId).cast("string").as("__tie"),
      col(rightId).as("__right_id"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__is_left"), length(col("__tie")), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__matched", last(col("__right_id"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(col("__lid").as(leftId), col("__key").as(leftKey), col("__matched").as("matched_id"))
  }
}
