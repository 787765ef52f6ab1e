package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SQL-addressable event logs through the DSv2 TableCatalog. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[EventLogCatalog].getName)
    s
  }
  import spark.implicits._

  test("CREATE / INSERT / SELECT / DROP an event log as a SQL table") {
    EventLogRegistry.drop("cat1")
    spark.sql("CREATE TABLE graft.cat1 TBLPROPERTIES ('partitions'='2')")
    assert(EventLogRegistry.exists("cat1"))
    assert(EventLogRegistry.get("cat1").numPartitions == 2)

    Seq("a", "b", "c", "d").toDF("body").createOrReplaceTempView("cat1_staged")
    spark.sql("INSERT INTO graft.cat1 SELECT body FROM cat1_staged")
    val got = spark.sql(
      "SELECT CAST(body AS STRING) AS s FROM graft.cat1 ORDER BY s")
      .as[String].collect().toSeq
    assert(got == Seq("a", "b", "c", "d"))
    assert(spark.sql("SELECT count(*) FROM graft.cat1").as[Long].head() == 4L)

    spark.sql("DROP TABLE graft.cat1")
    assert(!EventLogRegistry.exists("cat1"))
  }

  test("existing registry logs are visible; missing tables fail analysis") {
    EventLogRegistry.drop("cat2")
    val log = EventLogRegistry.create("cat2", 2)
    for (p <- 0 until 2; i <- 0 until 5)
      log.append(p, Event(s"$p-$i".getBytes("UTF-8"), (i + 1) * 1000000L))
    val counts = spark.sql(
      "SELECT partition, count(*) AS n FROM graft.cat2 GROUP BY 1 ORDER BY 1")
      .as[(String, Long)].collect().toSeq
    assert(counts == Seq(("0", 5L), ("1", 5L)))
    assert(spark.sql("SHOW TABLES IN graft").as[(String, String, Boolean)]
      .collect().exists(_._2 == "cat2"))
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.no_such_log").collect())
    assert(e.getMessage.toLowerCase.contains("table") ||
      e.getMessage.contains("no_such_log"))
  }

  test("streaming reads work through the catalog (readStream.table)") {
    EventLogRegistry.drop("cat4")
    val log = EventLogRegistry.create("cat4", 2)
    for (p <- 0 until 2; i <- 0 until 30)
      log.append(p, Event(s"$p-$i".getBytes, (i + 1) * 1000000L))
    val q = spark.readStream.table("graft.cat4")
      .writeStream.format("memory").queryName("cat4_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("cat4_out").count() == 60)
  }

  test("parquet-backed logs are SQL-addressable and read-only via the catalog") {
    val path = s"${SparkTestSession.sf0001}/events.parquet"
    val n = spark.sql(s"SELECT count(*) FROM graft.`parquet:$path#4`").as[Long].head()
    assert(n == 1000L)
    val perPart = spark.sql(
      s"SELECT partition, count(*) AS c FROM graft.`parquet:$path#4` GROUP BY 1 ORDER BY 1")
      .as[(String, Long)].collect()
    assert(perPart.map(_._2).sum == 1000L && perPart.length == 4)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`parquet:$path#4` SELECT 'x' AS body")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("read-only")))
  }

  test("TBLPROPERTIES flow into the table conf (admission control from pure SQL)") {
    EventLogRegistry.drop("cat5")
    spark.sql("""CREATE TABLE graft.cat5 TBLPROPERTIES (
      'partitions'='2', 'maxEventsPerTrigger'='6',
      'startingPosition'='{"seqNo":2}', 'consumerGroup'='sqlgrp')""")
    val log = EventLogRegistry.get("cat5")
    for (p <- 0 until 2; i <- 0 until 10)
      log.append(p, Event(s"$p-$i".getBytes, (i + 1) * 1000000L))
    val q = spark.readStream.table("graft.cat5")
      .writeStream.format("memory").queryName("cat5_out").start()
    try {
      q.processAllAvailable()
      // startingPosition seqNo 2 skips 2 rows per partition
      assert(spark.table("cat5_out").count() == 16L)
      // maxEventsPerTrigger=6 paces admission: the 16 rows need >= 3 batches
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3 && batches.forall(_.numInputRows <= 6),
        batches.map(_.numInputRows).mkString(","))
    } finally q.stop()
    // a fresh loadTable sees the same stored properties
    spark.sql("DROP TABLE graft.cat5")
    assert(!EventLogRegistry.exists("cat5"))
  }

  test("consumer-group namespaces: same log, isolated throttling, no create/drop") {
    EventLogRegistry.drop("cat6")
    spark.sql("CREATE TABLE graft.cat6 TBLPROPERTIES ('partitions'='2')")
    Seq("a", "b", "c", "d").toDF("body").createOrReplaceTempView("cat6_staged")
    spark.sql("INSERT INTO graft.cat6 SELECT body FROM cat6_staged")
    // graft.<group>.<log> reads the SAME log...
    val viaGroup = spark.sql(
      "SELECT CAST(body AS STRING) AS s FROM graft.grpA.cat6 ORDER BY s")
      .as[String].collect().toSeq
    assert(viaGroup == Seq("a", "b", "c", "d"))
    // ...with the group wired into the conf => its own throttler key
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = new EventLogCatalog
    cat.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    val flat = cat.loadTable(Identifier.of(Array.empty, "cat6"))
      .asInstanceOf[EventLogTable].conf
    val grouped = cat.loadTable(Identifier.of(Array("grpA"), "cat6"))
      .asInstanceOf[EventLogTable].conf
    assert(grouped.consumerGroup == "grpA" && flat.consumerGroup == "$Default")
    assert(grouped.throttlerKey != flat.throttlerKey && grouped.name == flat.name)
    assert(cat.tableExists(Identifier.of(Array("anyGroup"), "cat6")))
    assert(!cat.tableExists(Identifier.of(Array("a", "b"), "cat6")))
    // groups address existing logs; they cannot create or drop the shared log
    intercept[Exception](
      spark.sql("CREATE TABLE graft.grpB.nope TBLPROPERTIES ('partitions'='2')"))
    intercept[Exception](spark.sql("DROP TABLE graft.grpA.cat6"))
    assert(EventLogRegistry.exists("cat6"), "group DROP must not destroy the log")
    spark.sql("DROP TABLE graft.cat6")
    assert(!EventLogRegistry.exists("cat6"))
  }

  test("pushdown flows through the catalog path identically") {
    EventLogRegistry.drop("cat3")
    val log = EventLogRegistry.create("cat3", 1)
    for (i <- 0 until 100) log.append(0, Event(s"e$i".getBytes, (i + 1) * 1000000L))
    val df = spark.sql("SELECT sequenceNumber FROM graft.cat3 WHERE sequenceNumber >= 90")
    assert(df.count() == 10)
    val scanSchema = df.queryExecution.executedPlan.collectLeaves().head.schema
    assert(scanSchema.fieldNames.toSet == Set("sequenceNumber"))
  }
}
