package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_mine: margin-based cross-set mining semantics on planted geometry. */
class MineSpec extends SparkSpec {

  private def df(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("exact matches mine with margin > 1; hub is not chosen") {
    // A = basis vectors; B = the same basis vectors (ids 10+i) plus a
    // hub (id 99) moderately similar to EVERYTHING. Every a_i must pick
    // its exact twin b_i, not the hub, and stand out of the field.
    val s3 = 1.0 / math.sqrt(3.0)
    val a = df(0L -> Seq(1.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0),
      2L -> Seq(0.0, 0.0, 1.0))
    val b = df(10L -> Seq(1.0, 0.0, 0.0), 11L -> Seq(0.0, 1.0, 0.0),
      12L -> Seq(0.0, 0.0, 1.0), 99L -> Seq(s3, s3, s3))
    val out = Ann.minePairs(a, b, k = 2).collect()
    assert(out.length == 3)
    val byA = out.map(r => r.getAs[Long]("a_id") ->
      ((r.getAs[Long]("b_id"), r.getAs[Double]("margin")))).toMap
    assert(byA(0L)._1 == 10L && byA(1L)._1 == 11L && byA(2L)._1 == 12L)
    assert(byA.values.forall(_._2 > 1.0))
  }

  test("mining is partitioning-invariant") {
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 8 + j).abs + 0.01))
    }
    val a = vecs.take(20).toDF("vec_id", "embedding")
    val b = vecs.drop(20).toDF("vec_id", "embedding")
    val r1 = Ann.minePairs(a.repartition(2), b.repartition(3))
      .collect().map(_.toSeq).toSeq
    val r2 = Ann.minePairs(a.repartition(7), b.repartition(1))
      .collect().map(_.toSeq).toSeq
    assert(r1.nonEmpty && r1 == r2)
  }

  test("guard refuses corpus-sized inputs") {
    import spark.implicits._
    val big = (0 until 20).map(i => (i.toLong, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Ann.minePairs(big, big, maxRows = 10L)
    }
    assert(ex.getMessage.contains("lshTopK"))
  }
}
