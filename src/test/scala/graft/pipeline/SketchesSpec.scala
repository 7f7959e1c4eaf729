package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_hll: HyperLogLog semantics — register-table shape, shard
  * mergeability (THE property the sketch exists for), partitioning
  * invariance, and estimate accuracy on a known cardinality.
  */
class SketchesSpec extends SparkSpec {

  private def synth(n: Int, parts: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"g${i % 2}")).toDF("v", "g")
      .repartition(parts)
  }

  test("register table: ≤ m buckets per group, registers in [1, 53]") {
    val regs = Sketches.hllRegisters(synth(5000, 4), "v", "g").collect()
    val byG = regs.groupBy(_.getAs[String]("grp"))
    assert(byG.forall(_._2.length <= 256))
    assert(regs.forall { r =>
      val reg = r.getAs[Int]("register"); reg >= 1 && reg <= 53
    })
    assert(regs.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < 256
    })
  }

  test("shard merge == whole-corpus sketch (mergeability)") {
    val df = synth(8000, 8)
    // per-group sketches merged...
    val perGroup = Sketches.hllRegisters(df, "v", "g")
    val merged = Sketches.hllMerge(perGroup, "__all__")
    // ...must equal the sketch computed over everything at once
    val direct = Sketches.hllRegisters(
      df.withColumn("one", lit("__all__")), "v", "one")
    val a = merged.select("bucket", "register").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = direct.select("bucket", "register").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
  }

  test("sketch is partitioning-invariant") {
    val s1 = Sketches.hllSummary(synth(6000, 2), "v", "g").collect()
    val s2 = Sketches.hllSummary(synth(6000, 13), "v", "g").collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
  }

  test("estimate within 10% of a known cardinality (m=256 → SE 6.5%)") {
    val out = Sketches.hllSummary(synth(20000, 8), "v", "g").collect()
    assert(out.length == 3) // g0, g1, __all__
    out.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("n_exact")
      assert(math.abs(est - exact) <= 0.1 * exact,
        s"${r.getAs[String]("grp")}: est $est vs exact $exact")
      assert(r.getAs[Long]("within_10pct") == 1L)
    }
  }

  test("CMS never underestimates and is exact without collisions") {
    import spark.implicits._
    // 100 keys, key i appears i times
    val df = (1 to 100).flatMap(i => Seq.fill(i)(i.toLong)).toDF("k")
    val cms = Sketches.cmsSketch(df, "k", d = 4, w = 256)
    val probes = (1 to 100).map(_.toLong).toDF("k")
    val est = Sketches.cmsEstimate(cms, probes, "k", d = 4, w = 256)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("est")).toMap
    (1 to 100).foreach { i =>
      assert(est(i.toLong) >= i.toLong, s"CMS underestimated key $i")
    }
    // sketch is tiny regardless of input size
    assert(cms.count() <= 4L * 256L)
  }

  test("CMS shard merge (cell-wise sum) == whole-stream sketch") {
    import spark.implicits._
    val a = (1 to 50).flatMap(i => Seq.fill(3)(i.toLong)).toDF("k")
    val b = (25 to 75).flatMap(i => Seq.fill(2)(i.toLong)).toDF("k")
    val merged = Sketches.cmsSketch(a, "k").unionByName(Sketches.cmsSketch(b, "k"))
      .groupBy("r", "bucket").agg(sum("cnt").cast("long").as("cnt"))
    val direct = Sketches.cmsSketch(a.unionByName(b), "k")
    val x = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val y = direct.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(x == y)
  }

  test("Bloom: zero false negatives; shard union == whole-set filter") {
    import spark.implicits._
    val keys = (1 to 2000).map(_.toLong).toDF("k")
    val m = Sketches.bloomSize(2000)
    val bits = Sketches.bloomBits(keys, "k", m)
    val hits = Sketches.bloomProbe(bits, keys, "k", m).collect()
    assert(hits.forall(_.getAs[Long]("hit") == 1L), "false negative!")
    // shard merge = plain union/distinct of bit positions
    val half1 = Sketches.bloomBits((1 to 1000).map(_.toLong).toDF("k"), "k", m)
    val half2 = Sketches.bloomBits((1001 to 2000).map(_.toLong).toDF("k"), "k", m)
    val mergedPos = half1.unionByName(half2).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(mergedPos == bits.collect().map(_.getLong(0)).toSet)
  }

  test("Bloom auto-size keeps the false-positive rate bounded") {
    import spark.implicits._
    val keys = (1 to 3000).map(_.toLong).toDF("k")
    val m = Sketches.bloomSize(3000)
    val bits = Sketches.bloomBits(keys, "k", m)
    val absent = (100001 to 102000).map(_.toLong).toDF("k")
    val fp = Sketches.bloomProbe(bits, absent, "k", m)
      .filter(col("hit") === 1L).count()
    // envelope at 16 bits/key, k=5 is ~0.0014; allow 4x slack on 2000 probes
    assert(fp <= 12, s"false-positive count $fp out of 2000 absent probes")
  }

  test("duplicates do not move the sketch") {
    import spark.implicits._
    val once = (1 to 3000).map(i => (i.toLong, "g")).toDF("v", "g")
    val thrice = once.unionAll(once).unionAll(once)
    val a = Sketches.hllSummary(once, "v", "g").collect().map(_.toSeq).toSeq
    val b = Sketches.hllSummary(thrice, "v", "g").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("qhist: <= 64 buckets per group; shard merge == whole histogram") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, s"g${i % 3}")).toDF("v", "g")
      .repartition(7)
    val hg = Sketches.qhistSketch(df, "v", "g")
    assert(hg.groupBy("grp").count().collect().forall(_.getLong(1) <= 64))
    val merged = Sketches.qhistMerge(hg, "__all__")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val direct = Sketches.qhistSketch(
      df.withColumn("one", lit("__all__")), "v", "one")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(merged == direct)
  }

  test("qsketch: uniform 1..100 pins p50 exactly; error contract holds") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, "g")).toDF("v", "g")
    val out = Sketches.qsketchSummary(df, "v", "g").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // rank 50 falls in bucket 6 ([32,63], 32 values): interpolation
    // lands exactly on the true median
    assert(out(("g", "p50")) == ((50L, 50L, 1L)))
    assert(out.forall { case (_, (_, _, within)) => within == 1L })
    // __all__ merged row equals the single group's values here
    assert(out(("__all__", "p50")) == out(("g", "p50")))
  }

  test("qsketch is partitioning-invariant (order-insensitive state)") {
    import spark.implicits._
    def mk(parts: Int) = (1 to 4000).map(i => (i.toLong * 7 % 2551, s"g${i % 2}"))
      .toDF("v", "g").repartition(parts)
    val a = Sketches.qsketchSummary(mk(2), "v", "g").collect().map(_.toSeq).toSeq
    val b = Sketches.qsketchSummary(mk(13), "v", "g").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("kmv: ≤ k rows per set, shard-mergeable by union-then-re-min") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, s"s${i % 2}")).toDF("k", "s")
    val mins = Sketches.kmvMins(df, "k", "s", k = 64)
    val byS = mins.collect().groupBy(_.getString(0))
    assert(byS.size == 2 && byS.forall(_._2.length == 64))
    // merge property: the k smallest of (shard1 k-mins ∪ shard2 k-mins)
    // equal the whole-set k-mins — every global k-min survives sharding
    val sh1 = df.filter(col("k") % 3 === 0)
    val sh2 = df.filter(col("k") % 3 =!= 0)
    val shardMins = Sketches.kmvMins(sh1, "k", "s", 64)
      .unionByName(Sketches.kmvMins(sh2, "k", "s", 64))
    import org.apache.spark.sql.expressions.Window
    val remin = shardMins
      .withColumn("rk", row_number().over(Window.partitionBy("s").orderBy("h")))
      .filter(col("rk") <= 64).select("s", "h")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val directSet = Sketches.kmvMins(df, "k", "s", 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(remin == directSet)
  }

  test("kmv intersection: estimates within 3/sqrt(k) of exact") {
    import spark.implicits._
    // sets share exactly half their members: A = 1..2000, B = 1001..3000
    val df = ((1 to 2000).map(i => (i.toLong, "a")) ++
      (1001 to 3000).map(i => (i.toLong, "b"))).toDF("k", "s")
    val r = Sketches.kmvIntersectSummary(df, "k", "s", "a", "b", k = 64)
      .collect()(0)
    assert(r.getAs[Long]("exact_inter") == 1000L)
    assert(r.getAs[Long]("exact_union") == 3000L)
    assert(r.getAs[Long]("exact_a_not_b") == 1000L)
    val tol = 3.0 / math.sqrt(64.0) // ~0.375 relative
    val estU = r.getAs[Long]("est_union").toDouble
    val estI = r.getAs[Long]("est_inter").toDouble
    assert(math.abs(estU - 3000) <= tol * 3000, s"union est $estU")
    assert(math.abs(estI - 1000) <= tol * 1000 + 200, s"inter est $estI")
    assert(r.getAs[Long]("n_inter") <= 64L)
  }

  test("kmv: disjoint sets estimate zero intersection, exact A-not-B") {
    import spark.implicits._
    val df = ((1 to 800).map(i => (i.toLong, "a")) ++
      (10001 to 10800).map(i => (i.toLong, "b"))).toDF("k", "s")
    val r = Sketches.kmvIntersectSummary(df, "k", "s", "a", "b", k = 64)
      .collect()(0)
    assert(r.getAs[Long]("exact_inter") == 0L)
    assert(r.getAs[Long]("n_inter") == 0L)
    assert(r.getAs[Long]("est_inter") == 0L)
    assert(r.getAs[Long]("exact_a_not_b") == 800L)
    // A∖B estimate within the sketch tolerance
    val est = r.getAs[Long]("est_a_not_b").toDouble
    assert(math.abs(est - 800) <= 0.5 * 800, s"est_a_not_b $est")
  }

  test("kmv pre-prune: kmvMins equals the definitional per-set k-min under skew") {
    import spark.implicits._
    // one hot set holding 98% of the rows — the shape the per-partition
    // pre-prune exists for (naive: the whole set sorts on one reducer)
    val df = ((1 to 9800).map(i => (i.toLong, "hot")) ++
      (1 to 200).map(i => (i.toLong * 31, "cold"))).toDF("k", "s")
    val got = Sketches.kmvMins(df.repartition(13), "k", "s", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // definition: 64 smallest distinct hashes per set, computed directly
    val want = df
      .select(col("s"),
        shiftright(TextOps.md5Hash60(
          concat(lit("kmv:"), col("k").cast("string"))), 8).as("h"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .flatMap { case (_, hs) => hs.sortBy(_._2).take(64).toSeq }
      .toSet
    assert(got == want)
    // and partitioning-invariant (the pre-prune depends on partition
    // layout; the RESULT must not)
    val got1 = Sketches.kmvMins(df.repartition(1), "k", "s", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got1 == got)
  }

  test("kmv summary is partitioning-invariant") {
    import spark.implicits._
    def mk(parts: Int) = ((1 to 500).map(i => (i.toLong, "a")) ++
      (250 to 800).map(i => (i.toLong, "b"))).toDF("k", "s").repartition(parts)
    val a = Sketches.kmvIntersectSummary(mk(2), "k", "s", "a", "b").collect()
    val b = Sketches.kmvIntersectSummary(mk(13), "k", "s", "a", "b").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
