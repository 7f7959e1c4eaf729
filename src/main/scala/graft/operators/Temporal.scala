package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-ordered relational operators stock Spark lacks as built-ins.
  *
  * Spark-first shape: an as-of join is NOT a range cross-join (the
  * naive `l.ts >= r.ts` theta-join explodes to |L|×|R| per key before
  * aggregation, and Catalyst plans it as BroadcastNestedLoop when the
  * key is absent). The classic distributed form is a per-key MERGE:
  * union the two sides tagged, one exchange on the key, one sort by
  * (time, tag), and a running `last(_, ignoreNulls)` window carries the
  * most recent right-side row forward into each left row. Cost is one
  * shuffle + one sort — the same as any per-key window — with O(1)
  * carried state per row, at any corpus size; skew is bounded by
  * per-key row counts exactly like sessionization.
  */
object Temporal {

  /** Backward (most-recent-at-or-before) as-of join.
    *
    * For every `left` row, attaches the `right` row with the largest
    * `rightTime <= leftTime` within the same `keys` group: the matched
    * time as `asof_time` plus each of `rightCols` as `asof_<col>`
    * (all null when no right row precedes). Equal timestamps match
    * (inclusive, ASOF-standard); when several right rows share (keys,
    * rightTime), the lexicographically greatest `rightCols` tuple wins
    * — a DETERMINISTIC tie-break any SQL oracle can replay.
    * `tolerance` (same units as the time columns) nulls out matches
    * older than `leftTime - tolerance` without re-sorting.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    val k = keys.map(col)
    // dedup right to one row per (keys, time): max struct = greatest tuple
    val r = right
      .groupBy((k :+ col(rightTime).as("_t")): _*)
      .agg(max(struct(rightCols.map(col): _*)).as("_rv"))
      .select(k ++ Seq(col("_t"), lit(0).as("_tag"),
        struct(col("_t").as("_rt"), col("_rv")).as("_m")): _*)
    val lCols = left.columns.toSeq
    val l = left.select(
      (k ++ Seq(col(leftTime).as("_t"), lit(1).as("_tag"),
        lit(null).cast(r.schema("_m").dataType).as("_m"),
        struct(lCols.map(col): _*).as("_lrow"))): _*)
    val rAligned = r.withColumn("_lrow", lit(null).cast(l.schema("_lrow").dataType))
      .select(l.columns.map(col): _*)
    // right rows (tag 0) sort BEFORE left rows at equal time → inclusive
    val w = Window.partitionBy(k: _*).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(rAligned)
      .withColumn("_c", last(col("_m"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val inTol = tolerance match {
      case Some(t) => col("_c").isNotNull && (col("_t") - col("_c._rt") <= t)
      case None => col("_c").isNotNull
    }
    val matched = when(inTol, col("_c"))
    carried.select(
      lCols.map(c => col(s"_lrow.$c").as(c)) ++
        (matched.getField("_rt").as("asof_time") +:
          rightCols.map(c =>
            matched.getField("_rv").getField(c).as(s"asof_$c"))): _*)
  }

  /** Forward (earliest-at-or-after) as-of join — the mirror of
    * [[asofJoin]]: for every `left` row, attaches the `right` row with
    * the SMALLEST `rightTime >= leftTime` within the same `keys` group
    * (the "next scheduled maintenance / next price tick" shape). Same
    * distributed form — union tagged, ONE keyed exchange, one sort, a
    * `first(_, ignoreNulls)` window over FOLLOWING rows — and the same
    * deterministic tie-break (greatest `rightCols` tuple at equal
    * (keys, time)). `tolerance` nulls matches later than
    * `leftTime + tolerance`.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    val k = keys.map(col)
    val r = right
      .groupBy((k :+ col(rightTime).as("_t")): _*)
      .agg(max(struct(rightCols.map(col): _*)).as("_rv"))
      .select(k ++ Seq(col("_t"), lit(1).as("_tag"),
        struct(col("_t").as("_rt"), col("_rv")).as("_m")): _*)
    val lCols = left.columns.toSeq
    val l = left.select(
      (k ++ Seq(col(leftTime).as("_t"), lit(0).as("_tag"),
        lit(null).cast(r.schema("_m").dataType).as("_m"),
        struct(lCols.map(col): _*).as("_lrow"))): _*)
    val rAligned = r.withColumn("_lrow", lit(null).cast(l.schema("_lrow").dataType))
      .select(l.columns.map(col): _*)
    // left rows (tag 0) sort BEFORE right rows at equal time, and the
    // window looks FORWARD → equal-time right rows are visible: inclusive
    val w = Window.partitionBy(k: _*).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = l.unionByName(rAligned)
      .withColumn("_c", first(col("_m"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 0)
    val inTol = tolerance match {
      case Some(t) => col("_c").isNotNull && (col("_c._rt") - col("_t") <= t)
      case None => col("_c").isNotNull
    }
    val matched = when(inTol, col("_c"))
    carried.select(
      lCols.map(c => col(s"_lrow.$c").as(c)) ++
        (matched.getField("_rt").as("asof_time") +:
          rightCols.map(c =>
            matched.getField("_rv").getField(c).as(s"asof_$c"))): _*)
  }

  /** Point-in-interval range join, bucketized to an equi-join.
    *
    * Stock Spark plans `p BETWEEN start AND end` as BroadcastNestedLoop
    * (|P|×|I| comparisons per key). Here every interval is exploded to
    * the `bucketWidth`-sized time buckets it covers and every point to
    * the ONE bucket containing it, the sides meet on a (keys, bucket)
    * equi-join — shuffled, partial-pruned, AQE-broadcastable like any
    * equi-join — and the exact BETWEEN predicate filters the bucket-
    * local candidates. No dedup step: a point matches an interval's
    * copy only in the point's own bucket. Integer `div` bucketing, so
    * bucket edges are engine-exact.
    *
    * `bucketWidth` trades interval duplication ((len/width)+1 copies)
    * against candidate selectivity: pick it near the typical interval
    * length. Inner join; output is every point column plus the matched
    * interval's non-key columns (names must not collide).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn("_bk",
      explode(expr(s"sequence(`$startCol` div ${bucketWidth}L, " +
        s"`$endCol` div ${bucketWidth}L)")))
    val pt = points.withColumn("_bk", expr(s"`$pointCol` div ${bucketWidth}L"))
    pt.join(iv, keys :+ "_bk")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bk")
  }
}
