package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Materializes an N× (default 10×) id-offset copy of a testdata
  * directory for the standing scale rehearsal (`tools/bench10x.sh`).
  *
  * Every table is replicated `copies` times with all key/foreign-key
  * columns shifted by `copy * OFFSET`, so each copy is an internally
  * consistent shard of the same star schema — joins stay key-correct,
  * graph shape replicates, cardinalities scale linearly. Non-key columns
  * (including document text and embeddings) are byte-identical across
  * copies; that is fine for a throughput rehearsal and deliberately
  * stresses the dedup operators with true duplicates.
  *
  * Usage: runMain graft.tools.Scale10x <outDir> [copies]
  * Env: SPARK_GRAFT_SRC_SF_DIR (default /root/testdata/sf0.1)
  */
object Scale10x {
  /** Key shift per copy — far above any key at the source scale. */
  private val OFFSET = 10000000L

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
  )

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_sf10x")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    keyCols.foreach { case (table, keys) =>
      val df = spark.read.parquet(s"$src/$table.parquet")
      val replicated = df
        .withColumn("__copy", explode(typedLit((0 until copies).toArray)))
      val shifted = keys.foldLeft(replicated) { (d, k) =>
        val orig = df.schema(k).dataType
        d.withColumn(k, (col(k).cast("long") + col("__copy") * OFFSET).cast(orig))
      }.drop("__copy")
      shifted.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      System.err.println(s"[scale10x] $table x$copies -> $outDir")
    }
    spark.stop()
  }
}
