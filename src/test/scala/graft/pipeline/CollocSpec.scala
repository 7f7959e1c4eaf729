package graft.pipeline

import graft.SparkSpec

/** q_colloc: PMI-lift collocation semantics — exact rational arithmetic
  * on a hand-computable corpus, the minCount guard, and the property the
  * lift exists for: an exclusive pair outranks merely-frequent pairs.
  */
class CollocSpec extends SparkSpec {

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("lift is the exact rational c_xy*N/(c_x*c_y)") {
    // 10 identical docs: bigrams per doc are (alpha beta), (beta common),
    // (common common) -> each count 10, N = 30.
    // w1 marginals: alpha 10, beta 10, common 10; w2: beta 10, common 20.
    val docs = docsOf(Seq.fill(10)("alpha beta common common"): _*)
    val out = TextOps.collocations(docs, minCount = 5, topN = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("alpha", "beta")) == ((10L, 10L, 10L, 3.0)))   // 10*30/(10*10)
    assert(out(("beta", "common")) == ((10L, 10L, 20L, 1.5)))  // 10*30/(10*20)
    assert(out(("common", "common")) == ((10L, 10L, 20L, 1.5)))
  }

  test("exclusive pair outranks a frequent-word pair (hubness suppression)") {
    // "rare pair" co-occurs exclusively; "the end" pairs two hub words
    val docs = docsOf(
      (Seq.fill(6)("rare pair") ++ Seq.fill(20)("the end the story the end"))
        .mkString(" \n ") // one doc is fine; tokens split on whitespace
    )
    val top = TextOps.collocations(docs, minCount = 5, topN = 3).collect()
    // the exclusive cluster also emits the back-bigram (pair, rare) at
    // the SAME exact lift (marginals scale identically) — both outrank
    // every hub pair; assert the winner is from the exclusive cluster
    val win = Set(top.head.getString(0), top.head.getString(1))
    assert(win == Set("rare", "pair"), s"top pair was $win")
    val hubLift = top.collectFirst {
      case r if r.getString(0) == "the" => r.getDouble(5)
    }
    assert(hubLift.forall(_ < top.head.getDouble(5)))
  }

  test("minCount floors out rare pairs") {
    val docs = docsOf(Seq.fill(4)("alpha beta"): _*) // c_xy = 4 < 5
    assert(TextOps.collocations(docs, minCount = 5, topN = 10).count() == 0L)
  }
}
