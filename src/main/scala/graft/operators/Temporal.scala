package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators for event-shaped data (beyond-the-reference
  * surface — the reference has no time-keyed joins at all; these are the
  * standard operators an event/training-log pipeline needs that Spark lacks
  * as built-ins).
  *
  * Scale design:
  *  - [[asofJoin]] never materializes a join: both sides union into one
  *    frame, ONE shuffle on the key, and a running `last(ignoreNulls)`
  *    window carries the latest right row onto each left row. This is the
  *    merge-join formulation of as-of — per-key sorted streams — and it is
  *    immune to the candidate blow-up a band-join formulation has when a
  *    left row's lookback spans many right rows.
  *  - [[rangeJoin]] bounds the pair space by compound key (key, time-bucket):
  *    the left side explodes to the buckets its band covers (≤ span/width+1
  *    rows), the right side keeps its exact bucket, and the exact band
  *    predicate filters after the equi-join. Shuffle keys are (key, long);
  *    a hot key's history splits across buckets instead of colliding into
  *    one task the way a plain key-equi-join + post-filter would.
  */
object Temporal {

  /** As-of join, backward by default: for each left row, the single most
    * recent right row of the same key with `right.tsCol <= left.tsCol`
    * (inclusive — a right row AT the left timestamp matches), optionally
    * within `toleranceMicros`. With `forward = true`, the NEAREST right
    * row at-or-after instead (`right.tsCol >= left.tsCol` — "signup →
    * first purchase after"), mirroring DuckDB's `ASOF JOIN ... ON l.ts <=
    * r.ts`. Left rows with no qualifying right row are dropped
    * when `leftOuter = false` (inner semantics; DuckDB/pandas `ASOF JOIN`
    * parity) or kept with null right columns when `leftOuter = true`
    * (`ASOF LEFT JOIN`). A tolerance-stale match counts as no match.
    *
    * Output = all left columns + the matched right timestamp as
    * `<prefix><rightTsCol>` + each `rightValCols` as `<prefix><col>`.
    *
    * Ties: right rows sharing (key, ts) are resolved deterministically by
    * the largest carried struct (field order `rightTsCol +: rightValCols`);
    * callers wanting external-engine parity should keep (key, ts) unique on
    * the right, which native ASOF implementations also assume.
    *
    * Timestamps are plain numeric columns (e.g. epoch micros) so the same
    * arithmetic replays exactly in any engine.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightValCols: Seq[String],
      prefix: String = "asof_",
      toleranceMicros: Option[Long] = None,
      leftOuter: Boolean = false,
      forward: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin requires at least one key column")
    val carriedCols = tsCol +: rightValCols
    val rv = struct(carriedCols.map(col): _*)
    val rvType = {
      val rs = right.select(carriedCols.map(col): _*).schema
      StructType(rs.fields)
    }
    val leftPayload = struct(left.columns.map(col).toSeq: _*)
    val lvType = StructType(left.schema.fields)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(1).as("_side"),
        leftPayload.as("_lv"), lit(null).cast(rvType).as("_rv")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lvType).as("_lv"), rv.as("_rv")): _*)
    // right rows order BEFORE left rows at the same timestamp (side 0 < 1)
    // ⇒ inclusive match; _rv last in the ordering makes same-ts right rows
    // deterministic (max struct wins). `forward` flips only the timestamp
    // scan direction: the descending window sees exactly the rows with
    // ts >= current, turning "most recent at-or-before" into "nearest
    // at-or-after" with every other property (inclusivity, tie rule,
    // ONE shuffle on the key, no join operator) unchanged.
    val tsOrd = if (forward) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, col("_side").asc, col("_rv").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = last(col("_rv"), ignoreNulls = true).over(w)
    val leftRows = l.unionByName(r)
      .withColumn("_m", carried)
      .filter(col("_side") === 1)
    // a stale match (outside tolerance) is NO match: null the struct so
    // outer keeps the row with null right columns and inner drops it
    val tolerant = toleranceMicros match {
      case Some(t) =>
        val gap = if (forward) col("_m")(tsCol) - col("_ts")
          else col("_ts") - col("_m")(tsCol)
        leftRows.withColumn("_m", when(gap <= t, col("_m")))
      case None => leftRows
    }
    val matched =
      if (leftOuter) tolerant else tolerant.filter(col("_m").isNotNull)
    val outRight = carriedCols.map(c => col("_m")(c).as(prefix + c))
    matched.select(col("_lv.*") +: outRight: _*)
  }

  /** Banded interval join: all pairs (l, r) with equal `keyCols` and
    * `r.tsCol − l.tsCol` in `(lowMicros, highMicros]` — e.g. "every error
    * within 6 hours after each click". Output = `leftValCols` (aliased
    * `l_*`) + `rightValCols` (aliased `r_*`) + `delta_us`.
    *
    * The equi-join key is (keyCols…, bucket): the left row explodes to every
    * `bucketMicros`-wide bucket its band `[ts+low, ts+high]` covers, the
    * right row lives in exactly one. `bucketMicros` defaults to the band
    * width ⇒ ≤ 2 buckets per left row — candidate volume is bounded by
    * 2·|L| + band density, never |L_key|·|R_key|.
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, lowMicros: Long, highMicros: Long,
      leftValCols: Seq[String], rightValCols: Seq[String],
      bucketMicros: Long = 0L): DataFrame = {
    require(highMicros > lowMicros, s"empty band ($lowMicros, $highMicros]")
    val width = if (bucketMicros > 0) bucketMicros else highMicros - lowMicros
    // exact floor division, no doubles anywhere: a double divide loses
    // integer precision past 2^53 (nanosecond epochs), where the left
    // cover and the right bucket could disagree by one at band edges and
    // silently drop qualifying pairs. Subtracting pmod first makes the
    // dividend an exact multiple (pmod ≥ 0 ⇒ floor semantics for negative
    // timestamps too), so the decimal quotient is an exact integer that no
    // result-scale rounding can perturb.
    def bucketOf(ts: Column): Column = {
      val x = ts.cast("long")
      ((x - pmod(x, lit(width))).cast("decimal(38,0)") / width).cast("long")
    }
    val l = left.select(
      keyCols.map(col) ++
        (col(tsCol).as("_lts") +: leftValCols.map(c => col(c).as(s"l_$c"))) :+
        explode(sequence(
          bucketOf(col(tsCol) + lowMicros),
          bucketOf(col(tsCol) + highMicros))).as("_bkt"): _*)
    val r = right.select(
      keyCols.map(col) ++
        (col(tsCol).as("_rts") +: rightValCols.map(c => col(c).as(s"r_$c"))) :+
        bucketOf(col(tsCol)).as("_bkt"): _*)
    l.join(r, keyCols :+ "_bkt")
      .filter(col("_rts") - col("_lts") > lowMicros &&
        col("_rts") - col("_lts") <= highMicros)
      .withColumn("delta_us", col("_rts") - col("_lts"))
      .drop("_bkt", "_lts", "_rts")
  }

  /** Interval-overlap join: all pairs of CLOSED intervals with equal keys
    * that overlap (`l.start <= r.end AND r.start <= l.end`) — sessions ×
    * outage windows, spans × annotation ranges. The interval×interval
    * sibling of [[rangeJoin]]'s point-in-band.
    *
    * Both sides explode to the `bucketMicros`-wide buckets their interval
    * covers and equi-join on (key, bucket); a pair sharing several
    * buckets is kept ONLY in the later of the two start buckets —
    * `greatest(bucket(l.start), bucket(r.start))` — the first bucket
    * where both intervals are live, so each pair emits exactly once
    * with no DISTINCT pass. Candidate volume is bounded by span/bucket
    * fanout per row, never |L_key|·|R_key|; size `bucketMicros` near the
    * typical interval length (≤ ~2 buckets per row). */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String,
      leftValCols: Seq[String], rightValCols: Seq[String],
      bucketMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "intervalJoin requires at least one key column")
    require(bucketMicros >= 1)
    def bucketOf(ts: Column): Column = {
      val x = ts.cast("long")
      ((x - pmod(x, lit(bucketMicros))).cast("decimal(38,0)") / bucketMicros)
        .cast("long")
    }
    def side(df: DataFrame, p: String, valCols: Seq[String]): DataFrame =
      df.select(
        keyCols.map(col) ++
          Seq(col(startCol).as(s"${p}_$startCol"), col(endCol).as(s"${p}_$endCol")) ++
          valCols.map(c => col(c).as(s"${p}_$c")) :+
          explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol))))
            .as("_bkt"): _*)
    val ls = col(s"l_$startCol"); val le = col(s"l_$endCol")
    val rs = col(s"r_$startCol"); val re = col(s"r_$endCol")
    side(left, "l", leftValCols).join(side(right, "r", rightValCols),
        keyCols :+ "_bkt")
      .filter(ls <= re && rs <= le &&
        col("_bkt") === greatest(bucketOf(ls), bucketOf(rs)))
      .withColumn("overlap_us", least(le, re) - greatest(ls, rs))
      .drop("_bkt")
  }

  /** Per-key rolling aggregates over the last `window` events — the moving
    * average / running stats shape of event analytics (anomaly baselines,
    * rate smoothing). Ordered by (ts, id) so the frame is total and
    * deterministic under ties.
    *
    * Scale shape: ONE shuffle on the key, then a per-partition sorted pass
    * with a bounded rows-frame (WindowExec streams each key group; frame
    * state is `window` rows, never the key's history). No global sort, no
    * single-partition exchange — the same contract as the asof merge. */
  def rollingStats(
      df: DataFrame, keyCol: String, idCol: String, tsCol: String,
      valCol: String, window: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1, "window must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    df.select(col(keyCol), col(idCol),
      count(lit(1)).over(w).as("w_n"),
      (round(sum(col(valCol)).over(w), 6) + lit(0.0)).as("w_sum"),
      (round(avg(col(valCol)).over(w), 6) + lit(0.0)).as("w_avg"),
      max(col(valCol)).over(w).as("w_max"))
  }

  /** Per-key rolling z-score anomaly flags: each event scored against the
    * PRECEDING `window` events' mean/stddev (the current event is
    * excluded from its own baseline, so a spike can't mask itself).
    * Keys warm up: no score until `minPeriods` baseline events.
    *
    * Exactness: the value scales to an integer (`scale` = its decimal
    * resolution, e.g. 100 for cents) before the frame power sums, so
    * every sum is EXACT in double and the final divisions are
    * bit-identical in any engine — frame-sum accumulation order (Spark's
    * running window vs a segment tree) can't shift a mean onto a
    * rounding boundary, and a constant baseline yields variance exactly
    * 0 (the z is scale-invariant, so z on cents == z on dollars).
    *
    * Scale shape: identical to [[rollingStats]] — ONE key shuffle,
    * bounded rows-frame, no global sort. */
  def rollingZscore(
      df: DataFrame, keyCol: String, idCol: String, tsCol: String,
      valCol: String, window: Int, minPeriods: Int = 5,
      threshold: Double = 3.0, scale: Long = 100): DataFrame = {
    require(window >= minPeriods && minPeriods >= 2)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window, -1)
    val x = col(valCol).cast("double")
    val c = round(x * scale)
    val n = count(c).over(w).cast("double")
    val s1 = sum(c).over(w)
    val s2 = sum(c * c).over(w)
    val mu = s1 / n
    val sd = sqrt(greatest(s2 / n - mu * mu, lit(0.0)))
    val z = when(n >= minPeriods && sd > 0,
      round((c - mu) / sd, 4) + lit(0.0))
    // round the mean IN INTEGER SPACE (scale-2 halves of an integer/n
    // quotient are binary-exact, so both engines see a true half and
    // agree), THEN descale — round(mu/scale) would manufacture
    // shortest-decimal halves whose binary sits below the midpoint,
    // where Spark (rounds the decimal string) and engines that round
    // the binary value disagree
    df.select(col(keyCol), col(idCol), x.as("value"),
      when(n >= minPeriods, round(mu, 2) / scale + lit(0.0)).as("baseline_mean"),
      z.as("zscore"),
      coalesce(abs(z) > threshold, lit(false)).as("is_anomaly"))
  }

  /** Time-weighted average per (key, tumbling window) over an irregular
    * event series — the metrics-pipeline aggregate where a plain avg()
    * over-weights bursts: each event's value holds until the key's next
    * event INSIDE the window (left-step function; the window's last event
    * carries no weight), `twa = Σ value·Δt / Σ Δt`. Single-event windows
    * drop (no held span).
    *
    * Exactness: values scale to integers (`scale`) and hold durations
    * truncate to milliseconds, so every product and group sum is exact in
    * double (magnitudes bounded far under 2^53 for day-scale windows) —
    * the final division is the ONLY inexact op and runs on identical
    * operands in any engine, so the raw double needs no rounding at all.
    *
    * Scale shape: one lead() window + one (key, window) aggregate — one
    * key shuffle, frame state one row. */
  def timeWeightedAvg(
      df: DataFrame, keyCol: String, idCol: String, tsCol: String,
      valCol: String, windowMicros: Long, scale: Long = 100): DataFrame = {
    require(windowMicros >= 1000)
    val wcol = expr(s"$tsCol div ${windowMicros}L")
    val w = Window.partitionBy(col(keyCol), col("_w"))
      .orderBy(col(tsCol), col(idCol))
    val c = round(col(valCol).cast("double") * scale)
    // exact integer ms division (subtract-pmod, like rangeJoin's buckets —
    // a double divide + cast can land an ulp under an exact quotient)
    val dUs = lead(col(tsCol), 1).over(w) - col(tsCol)
    val dMs = ((dUs - pmod(dUs, lit(1000L))).cast("decimal(38,0)") / 1000)
      .cast("long")
    df.withColumn("_w", wcol)
      .select(col(keyCol), col("_w"), c.as("_c"), dMs.as("_d"))
      .filter(col("_d").isNotNull)
      .groupBy(col(keyCol), col("_w"))
      .agg(sum(col("_c") * col("_d")).as("_s1"), sum(col("_d")).as("_s2"),
        count(lit(1)).as("n_spans"))
      .filter(col("_s2") > 0)
      .select(col(keyCol), (col("_w") * windowMicros).as("window_start_us"),
        col("n_spans"), col("_s2").as("held_ms"),
        (col("_s1").cast("double") / col("_s2") / scale + lit(0.0)).as("twa"))
  }

  /** Regular-grid resampling with forward fill (gap fill + LOCF — the
    * time-series normalization step metric/telemetry pipelines run before
    * any windowed model): per key, bucket events onto a fixed
    * `stepMicros` grid (bucket value = the LAST event in the bucket,
    * deterministic (ts, value) struct-max tiebreak), densify the grid
    * between the key's first and last observed bucket, and carry the
    * last observation forward across empty buckets. Emits one row per
    * (key, grid bucket): `bucket_start_us`, the filled `value` (rounded
    * 6), and `is_gap` (true where the bucket had no event).
    *
    * Scale shape: one (key, bucket) partial aggregation, a per-key
    * bounds aggregate, the grid explode (≤ span/step rows per key —
    * bounded by the OUTPUT size, which the caller chose by picking the
    * step), one equi-join back, and one per-key ordered window for the
    * fill. No global sort; timestamps are plain numeric micros so every
    * step replays exactly in any engine. */
  def resampleFfill(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      stepMicros: Long): DataFrame = {
    require(stepMicros >= 1, s"stepMicros must be >= 1, got $stepMicros")
    // SQL `div` (integer division) — a double divide + cast would round
    // half-buckets instead of flooring; epochs are non-negative by contract
    val bucket = expr(s"$tsCol div ${stepMicros}L")
    val perBucket = df
      .groupBy(col(keyCol), bucket.as("_b"))
      .agg(max(struct(col(tsCol).as("t"), col(valCol).as("v")))
        .getField("v").as("_v"))
    val grid = perBucket.groupBy(col(keyCol))
      .agg(min(col("_b")).as("_lo"), max(col("_b")).as("_hi"))
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("_b"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq(keyCol, "_b"), "left")
      .select(col(keyCol),
        (col("_b") * stepMicros).as("bucket_start_us"),
        (round(last(col("_v"), ignoreNulls = true).over(w), 6) + lit(0.0))
          .as("value"),
        col("_v").isNull.as("is_gap"))
  }
}
