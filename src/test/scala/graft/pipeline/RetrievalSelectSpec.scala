package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_bm25 / q_dsir: semantics + the plan shapes their 100 TB story
  * depends on (row-local scoring, single-row broadcast stats, top-k as
  * TakeOrderedAndProject, no doc- or token-keyed exchange on the
  * scoring path).
  */
class RetrievalSelectSpec extends SparkSpec {

  private lazy val docs =
    graft.graph.GraphLoader.table(spark, sfDir, "documents")
  private val terms = Seq("spark", "query", "filter", "join", "stream")

  test("bm25: scores decrease, ranks are dense, score matches a hand replay") {
    val out = TextOps.bm25(docs, terms, topK = 10).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse, "scores must be non-increasing")
    assert(out.forall(_.getAs[Long]("n_terms") >= 1L))

    // hand replay of doc #1's score from raw counts
    val top = out.head
    val id = top.getAs[Long]("doc_id")
    val row = docs.filter(col("doc_id") === id)
      .select(split(lower(trim(col("text"))), "\\s+").as("ws"))
      .head()
    val ws = row.getSeq[String](0)
    val all = docs.select(split(lower(trim(col("text"))), "\\s+").as("ws"))
      .select(size(col("ws")).cast("long").as("dl"))
      .collect().map(_.getLong(0))
    val nDocs = all.length.toLong
    val avgdl = all.sum.toDouble / nDocs
    val dfs = terms.map { t =>
      docs.select(split(lower(trim(col("text"))), "\\s+").as("ws"))
        .filter(array_contains(col("ws"), t)).count()
    }
    val dl = ws.length.toDouble
    val score = terms.zip(dfs).map { case (t, df) =>
      val tf = ws.count(_ == t).toDouble
      if (tf == 0) BigDecimal(0)
      else {
        val idf = BigDecimal(math.log(1.0 +
          ((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5)))
          .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
        val tfp = (tf * (1.2 + 1.0)) /
          (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl)))
        BigDecimal(idf * tfp).setScale(7, BigDecimal.RoundingMode.HALF_UP)
      }
    }.sum
    val expected = BigDecimal(score.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getAs[Double]("score") == expected)
  }

  test("bm25 plan: top-k is TakeOrderedAndProject; no join or exchange keyed by doc/token") {
    val plan = TextOps.bm25(docs, terms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must plan as per-partition heaps, not a global sort+limit")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "scoring must be row-local — the only join is the one-row stats broadcast")
    assert(!plan.contains("Exchange hashpartitioning"),
      "nothing may shuffle by doc or token; the stats agg is SinglePartition")
  }

  test("dsir: selects ceil(20%) of the raw pool, ranks dense, weights non-increasing") {
    val raw = docs.filter(
      conv(substring(md5(concat(lit("dsir:"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 1000 >= 200)
    val nRaw = raw.count()
    val m = ((nRaw * 20 + 99) / 100).toInt
    val out = TextOps.dsirSelect(docs).collect()
    assert(out.length == m, s"expected ceil(20% of $nRaw) = $m rows")
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to m.toLong))
    val wsv = out.map(_.getAs[Double]("avg_w")).toSeq
    assert(wsv == wsv.sorted.reverse)
    // selected docs come from the raw pool only, never the target split
    val rawIds = raw.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => rawIds(r.getAs[Long]("doc_id"))))
  }

  test("dsir plan: selection is the distributed prefix-sum rank — no driver " +
      "top-m merge, no corpus-sized single-task window, no doc-keyed exchange") {
    // r21 (the r20 verdict #1 fix): m = 20% of the corpus, so the old
    // orderBy.limit(m) TakeOrderedAndProject (per-partition heaps of m
    // rows merged ON THE DRIVER) + partitionless rank window (ONE task)
    // was the round's scale-killer. The selection now range-partitions
    // by the global order and ranks via broadcast per-partition offsets.
    // dsirSelect returns a checkpoint-backed frame (the frozen-range-
    // partitioning contract), so capture the executed plans of the
    // actions it runs via a QueryExecutionListener instead of reading
    // the (post-checkpoint, opaque) result plan.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      TextOps.dsirSelect(docs)
      // listener delivery is async on the shared bus — poll until the
      // checkpoint plan (the one with the range exchange) has arrived
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!plans.iterator().hasNext && System.nanoTime() < deadline)
        Thread.sleep(50)
      var all = ""
      while ({
        import scala.jdk.CollectionConverters._
        all = plans.iterator().asScala.mkString("\n=====\n")
        !all.contains("rangepartitioning") && System.nanoTime() < deadline
      }) Thread.sleep(50)
      assert(all.contains("rangepartitioning"),
        s"selection must range-partition by the global order:\n$all")
      assert(!all.contains("TakeOrderedAndProject"),
        s"no data-derived top-m heap merge on the driver:\n$all")
      assert(!all.contains("SortMergeJoin") && !all.contains("ShuffledHashJoin"),
        s"scoring must stay row-local; offsets attach by broadcast:\n$all")
      // hash exchanges only on bounded keys: the B-row bucket-count agg
      // and the P-row _pid offsets agg — never a doc- or token-keyed one
      val hashLines = all.linesIterator
        .filter(_.contains("Exchange hashpartitioning")).toVector
      assert(hashLines.forall(l => l.contains("b#") || l.contains("_pid")),
        s"unexpected hash exchange (doc/token-keyed?):\n${hashLines.mkString("\n")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("dsir: selection is partitioning-invariant (distributed rank " +
      "equals the global order at any input layout)") {
    val base = TextOps.dsirSelect(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("avg_w"))).sortBy(_._2)
    for (p <- Seq(1, 7)) {
      val got = TextOps.dsirSelect(docs.repartition(p)).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
          r.getAs[Double]("avg_w"))).sortBy(_._2)
      assert(got.toSeq == base.toSeq, s"repartition($p) changed the selection")
    }
  }

  test("dsir selection size derives from the data (auto-sizing rule)") {
    val half = docs.filter(col("doc_id") % 2 === 0)
    val rawHalf = half.filter(
      conv(substring(md5(concat(lit("dsir:"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 1000 >= 200).count()
    val mHalf = ((rawHalf * 20 + 99) / 100).toInt
    assert(TextOps.dsirSelect(half).count() == mHalf.toLong)
  }
}
