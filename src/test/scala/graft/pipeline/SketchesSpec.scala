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

  test("duplicates do not move the sketch") {
    import spark.implicits._
    val once = (1 to 3000).map(i => (i.toLong, "g")).toDF("v", "g")
    val thrice = once.unionAll(once).unionAll(once)
    val a = Sketches.hllSummary(once, "v", "g").collect().map(_.toSeq).toSeq
    val b = Sketches.hllSummary(thrice, "v", "g").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
