package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("CSV round-trip preserves rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val nation = graft.graph.GraphLoader.table(spark, sfDir, "nation")
    Tables.writeCsv(nation, s"$tmp/nation")
    val back = Tables.readCsv(spark, s"$tmp/nation")
    assert(back.count() == nation.count())
    assert(back.columns.toSeq == nation.columns.toSeq)
    assert(sortedRowsOf(back.select("n_name")) == sortedRowsOf(nation.select("n_name")))
  }

  test("JSON round-trip preserves rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-json").toString
    val region = graft.graph.GraphLoader.table(spark, sfDir, "region")
    Tables.writeJson(region, s"$tmp/region")
    val back = Tables.readJson(spark, s"$tmp/region")
    assert(back.count() == region.count())
    assert(sortedRowsOf(back.select("r_name")) == sortedRowsOf(region.select("r_name")))
  }

  test("catalog report lists every label and edge class with counts") {
    val report = Tables.catalogReport(graph, spark).collect()
    val names = report.map(_.getString(1)).toSet
    assert(graph.labels.toSet.subsetOf(names))
    assert(names.exists(_.startsWith("PLACED(")))
    assert(report.forall(_.getLong(2) > 0))
    assert(report.forall(_.getString(3).nonEmpty))
  }

  test("bucketed tables join without a shuffle exchange") {
    val cust = graft.graph.GraphLoader.table(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val ords = graft.graph.GraphLoader.table(spark, sfDir, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    Tables.writeBucketed(cust, "bkt_customer", "c_custkey", buckets = 8)
    Tables.writeBucketed(ords, "bkt_orders", "c_custkey", buckets = 8)
    val joined = Tables.joinBucketed(spark, "bkt_customer", "bkt_orders", "c_custkey")
    // same row count as the unbucketed join
    val expected = cust.join(ords, "c_custkey").count()
    assert(joined.count() == expected)
    // the whole point: no hash-partitioning exchange on either join side
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
  }

  test("partitioned write prunes directories on partition-column filters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = graft.graph.GraphLoader.table(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars", "lang")
    Tables.writePartitioned(docs, s"$tmp/docs", "lang")
    val back = Tables.readPartitioned(spark, s"$tmp/docs")
    val filtered = back.filter(col("lang") === "en")
    // correctness: pruned read equals the filtered source
    assert(filtered.count() == docs.filter(col("lang") === "en").count())
    // the point: the filter lands in PartitionFilters (planning-time
    // directory pruning), and the scan reads ONLY the en partition
    val scans = filtered.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in the pruned plan")
    val scan = scans.head
    assert(scan.metadata("PartitionFilters").contains("lang"),
      s"partition filter not pushed: ${scan.metadata}")
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "fixture needs multiple partitions to prove pruning")
    assert(scan.inputRDDs().nonEmpty)
    val readFiles = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).map(_.files.size).sum
    val allFiles = scan.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
    assert(readFiles < allFiles,
      s"pruning read all $allFiles files (expected fewer, got $readFiles)")
  }

  test("metadataRowCount: exact on projected parquet scans, None when rows can change") {
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    // plain scan and row-preserving projections hit the footer path
    assert(Tables.metadataRowCount(cust).contains(cust.count()))
    val projected = cust.select(col("c_custkey"))
      .withColumn("k2", col("c_custkey") * 2)
    assert(Tables.metadataRowCount(projected).contains(cust.count()))
    // anything that can change cardinality must fall back
    assert(Tables.metadataRowCount(cust.filter(col("c_acctbal") > 0)).isEmpty)
    assert(Tables.metadataRowCount(cust.select(countDistinct(col("c_custkey")))).isEmpty)
    assert(Tables.metadataRowCount(cust.limit(3)).isEmpty)
    assert(Tables.metadataRowCount(cust.union(cust)).isEmpty)
    import spark.implicits._
    assert(Tables.metadataRowCount(Seq(1, 2).toDF("x")).isEmpty)
    // the catalog report built on it matches real counts frame-for-frame
    val rep = Tables.catalogReport(graph, spark).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rep("Customer") == cust.count())
  }

  test("graph snapshot save/load round-trips with escaped names") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-snap").toString
    import spark.implicits._
    val nodes = Seq((1L, "x"), (2L, "y")).toDF("_id", "prop")
    val edges = Seq((1L, 2L, 77L)).toDF("_src", "_dst", "_eid")
    val g0 = graft.graph.PropertyGraph(
      Map("Weird__Label" -> nodes),
      Map(graft.graph.EdgeType("REL__TYPE", "Weird__Label", "Weird__Label") -> edges))
    g0.save(tmp)
    val g1 = graft.graph.PropertyGraph.load(spark, tmp)
    assert(g1.labels == Seq("Weird__Label"))
    assert(g1.edgeClasses.head.relType == "REL__TYPE")
    assert(g1.nodeFrame("Weird__Label").count() == 2)
    assert(g1.edgeFrame(g1.edgeClasses.head).count() == 1)
  }
}
