package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_retention / q_cube / q_pivot / q_interarrival / q_anomaly:
  * invariants of the relational OLAP surface plus cross-checks against
  * independently computed answers on synthetic frames.
  */
class OlapSpec extends SparkSpec {

  private lazy val events =
    graft.graph.GraphLoader.eventsTable(spark, sfDir)

  test("retention: offset-0 cell is the full cohort, permille ≤ 1000") {
    val r = Olap.retention(events, "purchase").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val size = row.getAs[Long]("cohort_size")
      val act = row.getAs[Long]("n_active")
      val pm = row.getAs[Long]("permille")
      assert(act >= 1 && act <= size)
      assert(pm == 1000L * act / size)
      if (row.getAs[Long]("offset_days") == 0L)
        assert(act == size, "every cohort member is active on day 0")
    }
    // cohorts partition the users: sizes sum to distinct purchasers
    val users = events.filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    val sizes = r.filter(_.getAs[Long]("offset_days") == 0L)
      .map(_.getAs[Long]("cohort_size")).sum
    assert(sizes == users)
  }

  test("retention is partitioning-invariant") {
    val a = Olap.retention(events.repartition(2), "purchase").collect()
    val b = Olap.retention(events.repartition(11), "purchase").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("rollup: grand total row aggregates the whole table") {
    val li = graft.graph.GraphLoader.table(spark, sfDir, "lineitem")
    val r = Olap.rollupSummary(li).collect()
    val total = r.filter(_.getAs[Long]("gid") == 3L)
    assert(total.length == 1)
    assert(total.head.getAs[Long]("n_rows") == li.count())
    // level sums agree: Σ cells == Σ subtotals == grand total
    def sumAt(gid: Long) = r.filter(_.getAs[Long]("gid") == gid)
      .map(_.getAs[Long]("sum_price_cents")).sum
    assert(sumAt(0) == sumAt(1) && sumAt(1) == sumAt(3))
  }

  test("pivot: per-row priority counts sum to total, totals sum to table") {
    val orders = graft.graph.GraphLoader.table(spark, sfDir, "orders")
    val r = Olap.pivotCounts(orders).collect()
    val names = Seq("p_urgent", "p_high", "p_medium", "p_notspec", "p_low")
    r.foreach { row =>
      assert(names.map(row.getAs[Long](_)).sum == row.getAs[Long]("total"))
    }
    assert(r.map(_.getAs[Long]("total")).sum == orders.count())
  }

  test("interarrival: deltas positive, n = events - sequences") {
    val r = Olap.interArrival(events).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("min_us") >= 0L)
      assert(row.getAs[Long]("min_us") <= row.getAs[Long]("max_us"))
      val med = row.getAs[Double]("median_us")
      assert(med >= row.getAs[Long]("min_us") && med <= row.getAs[Long]("max_us"))
    }
    val nTotal = r.map(_.getAs[Long]("n")).sum
    val nEvents = events.count()
    val nSeqs = events.select("user_id", "event_type").distinct().count()
    assert(nTotal == nEvents - nSeqs, "one delta per event after the first of each sequence")
  }

  test("anomaly: integer test agrees with the float 3σ definition") {
    import spark.implicits._
    // one group: 100 values at 10.0 + two spikes — spikes are > 3σ out
    val vals = Seq.fill(100)(10.0) ++ Seq(500.0, -400.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
      .toDF("event_id", "event_type", "value")
    val r = Olap.anomaly(df).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_outliers") == 2L)
    assert(r.head.getAs[Long]("first_outlier_id") == 100L)
    // and the no-outlier case
    val flat = (1 to 50).map(i => (i.toLong, "g", 10.0 + (i % 3) * 0.001))
      .toDF("event_id", "event_type", "value")
    val r2 = Olap.anomaly(flat).collect()
    assert(r2.head.getAs[Long]("n_outliers") == 0L)
  }

  test("anomaly is partitioning-invariant (exact decimal sums)") {
    val a = Olap.anomaly(events.repartition(3)).collect()
    val b = Olap.anomaly(events.repartition(17)).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("skyline: single point and duplicate points degenerate correctly") {
    import spark.implicits._
    val one = Seq((100.0, 5.0), (100.0, 5.0))
      .toDF("l_extendedprice", "l_quantity")
    val r = Olap.skyline(one).collect()
    assert(r.length == 1 && r(0).getLong(0) == 10000L && r(0).getLong(1) == 5L)
    // a strictly dominated point disappears; an incomparable one stays
    val three = Seq((100.0, 5.0), (200.0, 3.0), (50.0, 9.0))
      .toDF("l_extendedprice", "l_quantity")
    val sky = Olap.skyline(three).collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(sky.toSeq == Seq((5000L, 9L)), s"$sky")
  }

  test("retention: a single-day user is a size-1 cohort at offset 0 only") {
    import spark.implicits._
    import java.sql.Timestamp
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-03 10:00:00"), 9L, "purchase", 1.0, ""),
      (2L, Timestamp.valueOf("2024-01-03 11:00:00"), 9L, "purchase", 1.0, ""),
      (3L, Timestamp.valueOf("2024-01-05 10:00:00"), 8L, "purchase", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Olap.retention(df, "purchase").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSet == Set((2L, 0L, 1L, 1L, 1000L), (4L, 0L, 1L, 1L, 1000L)))
  }

  test("paa: segments cover all events, integer means bounded by extremes") {
    val r = Olap.paa(events).collect()
    assert(r.map(_.getAs[Long]("n")).sum == events.count())
    r.foreach { row =>
      val n = row.getAs[Long]("n"); val s = row.getAs[Long]("sum_vm")
      assert(row.getAs[Long]("paa_milli") == s / n)
      assert(row.getAs[Long]("segment") >= 0L)
    }
  }

  test("skyline: no returned point dominates another; none is dominated") {
    val li = graft.graph.GraphLoader.table(spark, sfDir, "lineitem")
    val sky = Olap.skyline(li).collect()
      .map(r => (r.getAs[Long]("price_cents"), r.getAs[Long]("qty")))
    assert(sky.nonEmpty)
    // strictly increasing in BOTH dims along the price order — the 2D
    // skyline signature (cheaper points must have strictly lower qty)
    sky.sliding(2).foreach { case Array((p1, q1), (p2, q2)) =>
      assert(p1 < p2 && q1 < q2, s"($p1,$q1) vs ($p2,$q2)")
    case _ => ()
    }
    // and no input point dominates any skyline point
    val pts = li.selectExpr(
      "CAST(round(l_extendedprice * 100) AS BIGINT) AS p",
      "CAST(l_quantity AS BIGINT) AS q").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    sky.foreach { case (p, q) =>
      assert(!pts.exists { case (op, oq) =>
        op <= p && oq >= q && (op < p || oq > q) }, s"($p,$q) is dominated")
    }
  }

  test("decileBands: 10 bands per group, sizes within 1, ranges ordered") {
    val docs = graft.graph.GraphLoader.table(spark, sfDir, "documents")
    val r = Olap.decileBands(docs).collect()
    val byLang = r.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == 10, s"$lang has ${rows.length} bands")
      val sizes = rows.map(_.getAs[Long]("n"))
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
      // band value ranges are non-overlapping in decile order
      rows.sortBy(_.getAs[Long]("decile")).sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("max_chars") <= b.getAs[Long]("min_chars"))
        case _ => ()
      }
    }
  }

  test("decileBands equals the grouped NTILE window on a skewed corpus") {
    // 9:1 group skew — the shape the distributed prefix-sum rank exists
    // for: the grouped-window form would sort the hot group in ONE task
    import spark.implicits._
    val rows = (1 to 900).map(i => ("en", i.toLong, (i * 37 % 211).toLong)) ++
      (1 to 100).map(i => ("fr", (1000 + i).toLong, (i * 53 % 97).toLong)) ++
      (1 to 7).map(i => ("de", (2000 + i).toLong, i.toLong)) // n < tiles
    val df = rows.toDF("lang", "doc_id", "n_chars")
    val got = Olap.decileBands(df.repartition(7))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    val want = df.withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("lang", "decile")
      .agg(count(lit(1)).cast("long").as("n"),
        min(col("n_chars")).cast("long").as("min_chars"),
        max(col("n_chars")).cast("long").as("max_chars"))
    assert(sortedRowsOf(got) == sortedRowsOf(want))
    // and partitioning-invariant
    assert(sortedRowsOf(Olap.decileBands(df.repartition(1))) == sortedRowsOf(got))
  }

  test("skyline: local pre-filter result is partitioning-invariant") {
    val li = graft.graph.GraphLoader.table(spark, sfDir, "lineitem")
    val a = Olap.skyline(li.repartition(2)).collect().map(_.toSeq).toSeq
    val b = Olap.skyline(li.repartition(17)).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("frequentTriples: hand-planted baskets, a-priori equals the definition") {
    import spark.implicits._
    // (1,2,3) together in 3 orders; (1,2,4) once; duplicates in o1 collapse
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 3L), (12L, 4L),
      (13L, 1L), (13L, 2L), (13L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = Olap.frequentTriples(li, minSupport = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getAs[Long]("support")).toMap
    assert(got == Map((1L, 2L, 3L) -> 3L), s"got $got")
    // support 2 admits nothing else ((1,2,4) has support 2 and all its
    // pairs are frequent at 2)
    val got2 = Olap.frequentTriples(li, minSupport = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getAs[Long]("support")).toMap
    assert(got2 == Map((1L, 2L, 3L) -> 3L, (1L, 2L, 4L) -> 2L))
  }

  test("frequentTriples: a hot basket of infrequent items stays cheap (L1 + early L2 cuts)") {
    import spark.implicits._
    // one pathological basket with 1000 singleton items (raw pair count
    // would be C(1000,2) ≈ 500k before any threshold) + a planted
    // frequent triple in 3 small baskets
    val hot = (0 until 1000).map(i => (99L, 10000L + i))
    val planted = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 3L))
    val li = (hot ++ planted).toDF("l_orderkey", "l_partkey")
    val (b, fp, freq2) = Olap.frequentTriplesPairs(li, 3L, col("l_partkey"))
    // L1 removed every hot-basket item before pair enumeration
    assert(b.count() == 9L, "only the 3 frequent items' 9 basket rows survive L1")
    assert(freq2.count() == 3L) // (1,2), (1,3), (2,3)
    // the pruned pair frame the third leg fans out from: 3 baskets × 3
    // frequent pairs — NOT half a million hot-basket pairs
    assert(fp.count() == 9L)
    // and the answer is still exactly the definition
    val got = Olap.frequentTriples(li, minSupport = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getAs[Long]("support")).toMap
    assert(got == Map((1L, 2L, 3L) -> 3L))
  }

  test("frequentTriples plan: the (x,y) semi-join sits BELOW the third-leg join") {
    import spark.implicits._
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val df = Olap.frequentTriples(li, minSupport = 1)
    // the checkpointed pair frame is already freq2-semi-joined before
    // the third basket leg: walking the physical plan, the first
    // LeftSemi above the pair scan must appear strictly below the
    // inner join that introduces the z leg
    val plan = df.queryExecution.sparkPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    val semis = joins.filter(_.joinType ==
      org.apache.spark.sql.catalyst.plans.LeftSemi)
    assert(semis.size == 3, s"three a-priori semi-joins, got ${semis.size}")
    // the z-introducing inner join must CONTAIN a LeftSemi in its left
    // subtree (the explicit early prune) — i.e. at least one semi is a
    // descendant of an inner join
    val inner = joins.filter(_.joinType ==
      org.apache.spark.sql.catalyst.plans.Inner)
    assert(inner.exists(j => j.left.collect {
      case s: org.apache.spark.sql.execution.joins.BaseJoinExec
        if s.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => s
    }.nonEmpty), "the (x,y) freq2 semi-join must execute below the triple expansion")
  }

  test("movingAggregates: trailing 3-row frame on a known sequence") {
    import spark.implicits._
    import java.sql.Timestamp
    val df = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 00:00:01"), 1.0),
      (1L, 2L, Timestamp.valueOf("2024-01-01 00:00:02"), 2.0),
      (1L, 3L, Timestamp.valueOf("2024-01-01 00:00:03"), 3.0),
      (1L, 4L, Timestamp.valueOf("2024-01-01 00:00:04"), 4.0),
      (2L, 5L, Timestamp.valueOf("2024-01-01 00:00:05"), 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = Olap.movingAggregates(df).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("mov_sum3"), r.getAs[Long]("mov_n"),
          r.getAs[Long]("mov_avg_milli")))).toMap
    assert(got(1L) == ((1000L, 1L, 1000000L)))
    assert(got(2L) == ((3000L, 2L, 1500000L)))
    assert(got(3L) == ((6000L, 3L, 2000000L)))
    assert(got(4L) == ((9000L, 3L, 3000000L)))  // window slid past 1
    assert(got(5L) == ((10000L, 1L, 10000000L))) // separate user
  }

  test("activeUsers: hand-computed DAU/WAU on a planted log") {
    import spark.implicits._
    def ev(id: Long, u: Long, day: Int) = (id,
      java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00"),
      u, "view", 0.0, "")
    // day 0: users 1,2 ; day 1: user 1 (twice) ; day 8: user 3
    val events = Seq(ev(1, 1, 0), ev(2, 2, 0), ev(3, 1, 1), ev(4, 1, 1),
      ev(5, 3, 8)).toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val got = Olap.activeUsers(events, windowDays = 7).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // day 0: dau {1,2}; wau days -6..0 = {1,2}
    // day 1: dau {1};   wau days -5..1 = {1,2}
    // day 8: dau {3};   wau days  2..8 = {3} (day 0/1 aged out)
    assert(got == Map(0L -> ((2L, 2L)), 1L -> ((1L, 2L)), 8L -> ((1L, 1L))))
  }

  test("activeUsers is partitioning-invariant") {
    val a = Olap.activeUsers(events.repartition(2)).collect()
    val b = Olap.activeUsers(events.repartition(11)).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq && a.nonEmpty)
  }

  test("activeUsers: a 1-day window collapses WAU to DAU; WAU >= DAU always") {
    val one = Olap.activeUsers(events, windowDays = 1).collect()
    assert(one.nonEmpty)
    one.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"windowDays=1 must make wau == dau: ${r.toSeq}"))
    val seven = Olap.activeUsers(events, windowDays = 7).collect()
    seven.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"trailing window can only add users: ${r.toSeq}"))
  }
}
