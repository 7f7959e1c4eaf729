package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the test-corpus property graph from the TPC-H-ish parquet star
  * schema (see /root/repo/SURVEY.md §3).
  *
  * Mirrors the reference benchmark's graph shape (User-TRIGGERED->Event,
  * Item RELATED_TO Item; reference: benchmark/src/queries.ts) over the
  * richer TPC-H entities. Everything here is lazy DataFrame definitions —
  * building the graph schedules no jobs.
  */
object GraphLoader {
  import PropertyGraph.{ID, SRC, DST, EID}

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Derived Part->Part co-occurrence edges: two parts appearing in the
    * same order, directed by key order (acyclic by construction — keeps
    * var-length traversals finite and mirrors the reference benchmark's
    * RELATED_TO). Scale note: per-order pair blowup is quadratic in order
    * size; TPC-H orders are ≤7 lines, and real deployments should cap
    * per-group size before pairing (documented, enforced via the
    * maxPerGroup arg).
    */
  def relatedToEdges(li: DataFrame, maxPerGroup: Int = 50): DataFrame = {
    val pairs = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val capped = pairs
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("ok").orderBy("pk")))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
    val a = capped.select(col("ok"), col("pk").as("p1"))
    val b = capped.select(col("ok").as("ok2"), col("pk").as("p2"))
    a.join(b, col("ok") === col("ok2") && col("p1") < col("p2"))
      .select(col("p1").as(SRC), col("p2").as(DST)).distinct()
      .withColumn(EID, xxhash64(lit("RELATED_TO"), col(SRC), col(DST)))
  }

  def load(spark: SparkSession, dir: String): PropertyGraph = {
    def t(name: String) = table(spark, dir, name)

    val region = t("region")
    val nation = t("nation")
    val customer = t("customer")
    val supplier = t("supplier")
    val part = t("part")
    val orders = t("orders")
    val lineitem = t("lineitem")
    val events = t("events")
    val documents = t("documents")
    val embeddings = t("embeddings")

    def eid(relType: String, cols: org.apache.spark.sql.Column*) =
      xxhash64((lit(relType) +: cols): _*)

    val nodes = Map(
      "Region" -> region.withColumn(ID, col("r_regionkey").cast("long")),
      "Nation" -> nation.withColumn(ID, col("n_nationkey").cast("long")),
      "Customer" -> customer.withColumn(ID, col("c_custkey").cast("long")),
      "Supplier" -> supplier.withColumn(ID, col("s_suppkey").cast("long")),
      "Part" -> part.withColumn(ID, col("p_partkey").cast("long")),
      "Order" -> orders.withColumn(ID, col("o_orderkey").cast("long")),
      "User" -> events.select(col("user_id").cast("long").as(ID)).distinct()
        .withColumn("user_id", col(ID)),
      "Event" -> events.withColumn(ID, col("event_id").cast("long")),
      "Document" -> documents.withColumn(ID, col("doc_id").cast("long")),
      "Embedding" -> embeddings.withColumn(ID, col("vec_id").cast("long"))
    )

    val edges = Map(
      EdgeType("IN_REGION", "Nation", "Region") ->
        nation.select(col("n_nationkey").cast("long").as(SRC),
          col("n_regionkey").cast("long").as(DST))
          .withColumn(EID, eid("IN_REGION", col(SRC), col(DST))),
      EdgeType("IN_NATION", "Customer", "Nation") ->
        customer.select(col("c_custkey").cast("long").as(SRC),
          col("c_nationkey").cast("long").as(DST))
          .withColumn(EID, eid("IN_NATION_C", col(SRC), col(DST))),
      EdgeType("IN_NATION", "Supplier", "Nation") ->
        supplier.select(col("s_suppkey").cast("long").as(SRC),
          col("s_nationkey").cast("long").as(DST))
          .withColumn(EID, eid("IN_NATION_S", col(SRC), col(DST))),
      EdgeType("PLACED", "Customer", "Order") ->
        orders.select(col("o_custkey").cast("long").as(SRC),
          col("o_orderkey").cast("long").as(DST))
          .withColumn(EID, eid("PLACED", col(SRC), col(DST))),
      EdgeType("CONTAINS", "Order", "Part") ->
        lineitem.select(
          col("l_orderkey").cast("long").as(SRC),
          col("l_partkey").cast("long").as(DST),
          col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
          .withColumn(EID, eid("CONTAINS", col(SRC), col("l_linenumber"))),
      EdgeType("SUPPLIES", "Supplier", "Part") ->
        lineitem.select(col("l_suppkey").cast("long").as(SRC),
          col("l_partkey").cast("long").as(DST)).distinct()
          .withColumn(EID, eid("SUPPLIES", col(SRC), col(DST))),
      EdgeType("TRIGGERED", "User", "Event") ->
        events.select(col("user_id").cast("long").as(SRC),
          col("event_id").cast("long").as(DST), col("ts"))
          .withColumn(EID, eid("TRIGGERED", col(SRC), col(DST))),
      EdgeType("RELATED_TO", "Part", "Part") -> relatedToEdges(lineitem)
    )

    new PropertyGraph(nodes, edges,
      smallLabels = Set("Region", "Nation", "Supplier"),
      smallTypes = Set("IN_REGION", "IN_NATION"))
  }
}
