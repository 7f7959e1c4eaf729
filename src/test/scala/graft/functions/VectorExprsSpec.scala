package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native dot/l2norm expressions: values must be bit-identical to the
  * interpreted HOF formulation (left-to-right double summation) in both
  * the codegen and interpreted (eval) paths.
  */
class VectorExprsSpec extends SparkSpec {

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  test("graft_dot and graft_l2norm match the HOF formulation bit-for-bit") {
    import spark.implicits._
    VectorExprs.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.25f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val rows = df.select(
      VectorExprs.dot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd"),
      VectorExprs.l2norm(col("a")).as("nn"),
      sqrt(aggregate(transform(col("a"), x => x.cast(DoubleType) * x.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x)).as("hn")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("expressions callable from plain SQL after registration") {
    VectorExprs.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
      "graft_l2norm(array(3.0D, 4.0D)) AS n").collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
    // the extensions entry point builds the same expressions
    val ext = new GraftExtensions()
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }

  test("sliding min: monotonic deque matches brute force, edges handled") {
    import spark.implicits._
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(7)
    val arr = Array.fill(200)(rnd.nextLong() % 1000)
    val w = 5
    val got = Seq(Tuple1(arr)).toDF("a")
      .select(VectorExprs.slidingMin(col("a"), lit(w)))
      .collect()(0).getSeq[Long](0)
    val brute = arr.sliding(w).map(_.min).toSeq
    assert(got == brute)
    // n < w → empty; null → null
    val edge = Seq((Some(Array(1L, 2L)), 1)).toDF("a", "x")
      .select(VectorExprs.slidingMin(col("a"), lit(5)).as("small"),
        VectorExprs.slidingMin(lit(null).cast("array<long>"), lit(2)).as("nul"))
      .collect()(0)
    assert(edge.getSeq[Long](0).isEmpty && edge.isNullAt(1))
  }

  test("shingle hashes match the HOF xxhash64 formulation exactly") {
    import spark.implicits._
    VectorExprs.register(spark)
    val df = Seq("the quick brown fox jumps over the lazy dog", "a b", "one")
      .toDF("text")
      .select(split(trim(col("text")), "\\s+").as("toks"))
    val k = 3
    val n = size(col("toks")) - (k - 1)
    val hof = when(n <= 0, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(0), greatest(n - 1, lit(0))),
        i => xxhash64(array_join(slice(col("toks"), i + 1, lit(k)), " "))))
    val rows = df.select(
      VectorExprs.shingleHashes(col("toks"), lit(k)).as("native"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("minhash signature kernel matches the explode+groupBy-min formulation") {
    import spark.implicits._
    VectorExprs.register(spark)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs and more words here"))
      .toDF("doc_id", "text")
    val numHashes = 16
    val withSh = docs.select(col("doc_id"),
      graft.pipeline.Dedup.shingleHashes(col("text"), 3).as("sh"))
    val batch = graft.pipeline.Dedup
      .minhashSignatures(withSh, numHashes, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = withSh.select(col("doc_id"),
      VectorExprs.minhashSig(col("sh"), lit(numHashes)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == batch)
  }

  test("simhash bits kernel matches the explode+groupBy bit-counter formulation") {
    import spark.implicits._
    VectorExprs.register(spark)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "sphinx of black quartz judge my vow and several more words"))
      .toDF("doc_id", "text")
    val withSh = docs.select(col("doc_id"),
      graft.pipeline.Dedup.shingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val agg = graft.pipeline.Dedup.simhashBitsFrameAgg(withSh, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val native = graft.pipeline.Dedup.simhashBitsFrame(withSh, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native == agg)
  }

  test("shingle md5-60 matches the HOF md5Hash60 formulation exactly") {
    import spark.implicits._
    VectorExprs.register(spark)
    val df = Seq("the quick brown fox jumps over the lazy dog", "a b", "one",
        "padded   whitespace  here", "ünïcödé tökens mätter too yes")
      .toDF("text")
      .select(split(trim(col("text")), "\\s+").as("toks"))
    val k = 3
    val n = size(col("toks")) - (k - 1)
    val hof = when(n <= 0, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(0), greatest(n - 1, lit(0))),
        i => graft.pipeline.TextOps.md5Hash60(
          array_join(slice(col("toks"), i + 1, lit(k)), " "))))
    val rows = df.select(
      VectorExprs.shingleMd5(col("toks"), lit(k)).as("native"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      s"native ${r.getSeq[Long](0)} != hof ${r.getSeq[Long](1)}"))
  }

  test("hyperplane keys match the HOF formulation bit-for-bit") {
    import spark.implicits._
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(20)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val df = vecs.map(Tuple1(_)).toDF("v")
    for (salt <- Seq(0, 3)) {
      val rows = df.select(
        graft.pipeline.Ann.hyperplaneKey(col("v"), planes = 8, lit(salt)).as("native"),
        graft.pipeline.Ann.hyperplaneKeyHof(col("v"), planes = 8, lit(salt)).as("hof"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    }
  }

  test("null arrays yield null; double arrays accepted") {
    import spark.implicits._
    VectorExprs.register(spark)
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(
      VectorExprs.dot(col("a"), col("a")).as("aa"),
      VectorExprs.dot(col("a"), col("b")).as("ab"),
      VectorExprs.l2norm(col("b")).as("nb")).collect()(0)
    assert(r.getDouble(0) == 5.0)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }
}
