package graft

/** r21 pay-once memos (the pqBooks precedent): the gate's shared
  * derived frames — phash near-dup pairs, the BPE training run, the
  * (64,8,4) walk corpus — are computed once per (session, dir, data
  * generation) and shared across their consumer queries, invalidated
  * by the bench reset hook, and value-identical to the un-memoized
  * paths.
  */
class MemoSpec extends SparkSpec {

  test("q_dedup_phash memoizes its pair frame — second call is the same instance") {
    SparkEntry.invalidatePairs(spark)
    val a = SparkEntry.queries("q_dedup_phash")(spark, sfDir)
    val b = SparkEntry.queries("q_dedup_phash")(spark, sfDir)
    assert(a eq b, "cache miss on the second call — the memo is broken")
    // the reset hook invalidates: a fresh instance (equal values) after
    SparkEntry.invalidatePairs(spark)
    val c = SparkEntry.queries("q_dedup_phash")(spark, sfDir)
    assert(!(c eq a), "invalidatePairs must evict the memo")
    assert(sortedRowsOf(c) == sortedRowsOf(a))
  }

  test("q_walks memoizes the (64,8,4) walk corpus shared with q_walk_pmi/q_pmi_embed") {
    SparkEntry.invalidatePairs(spark)
    val a = SparkEntry.queries("q_walks")(spark, sfDir)
    val b = SparkEntry.queries("q_walks")(spark, sfDir)
    assert(a eq b)
    SparkEntry.invalidatePairs(spark)
  }

  test("q_bpe_tokens via the shared trained table equals the standalone retrain path") {
    SparkEntry.invalidatePairs(spark)
    val docs = graft.graph.GraphLoader.table(spark, sfDir, "documents")
    // q_bpe_vocab first: its training run populates the memo q_bpe_tokens reads
    val vocab = SparkEntry.queries("q_bpe_vocab")(spark, sfDir).collect()
    val viaMemo = SparkEntry.queries("q_bpe_tokens")(spark, sfDir).collect()
    val standalone = pipeline.TextOps.bpeTokenCounts(docs, merges = 8).collect()
    assert(viaMemo.map(_.toSeq).toSeq == standalone.map(_.toSeq).toSeq,
      "memoized token counts must be value-identical to the retrain path")
    val standaloneVocab = pipeline.TextOps.bpeMerges(docs, merges = 8).collect()
    assert(vocab.map(_.toSeq).toSeq == standaloneVocab.map(_.toSeq).toSeq)
    SparkEntry.invalidatePairs(spark)
  }
}
