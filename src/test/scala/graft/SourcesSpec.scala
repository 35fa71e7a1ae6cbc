package graft

import graft.functions.GraftFunctions
import graft.sources.EdgeListSource
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("edge-list source reads SNAP-style files like the reference's input") {
    val f = Files.createTempFile("edges", ".txt")
    Files.writeString(f,
      """# comment line
        |0 1
        |1 0
        |1 2
        |2 2
        |3 4
        |""".stripMargin)
    val g = EdgeListSource.graphFromEdgeList(spark, f.toString)
    // canonical: dedup of 0-1/1-0, self-loop 2-2 dropped
    val edges = g.edges.as[(Long, Long)].collect().toSet
    assert(edges == Set((0L, 1L), (1L, 2L), (3L, 4L)))
    assert(g.vertices.as[Long].collect().toSet == Set(0L, 1L, 2L, 3L, 4L))
    val deg = g.degrees.as[(Long, Long)].collect().toMap
    assert(deg(1L) == 2 && deg(3L) == 1)
  }

  test("edge-list source reproduces the reference's facebook graph stats") {
    // the reference's actual input (SNAP ego-Facebook); skip if absent.
    // Known public stats: 4039 vertices, 88234 undirected edges.
    val path = "/root/reference/facebook/facebook_combined.txt"
    assume(new java.io.File(path).exists())
    val g = EdgeListSource.graphFromEdgeList(spark, path)
    assert(g.vertices.count() == 4039L)
    assert(g.edges.count() == 88234L)
    val deg = g.degrees
    assert(deg.agg(org.apache.spark.sql.functions.max("degree"))
      .head().getLong(0) == 1045L) // known hub
  }

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |             array(cast(1.0 as float), cast(0.0 as float))) AS cs,
        |  simhash64(array('a','b')) AS sh,
        |  jaccard_sorted(array('a','b','c'), array('b','c','d')) AS js
        |""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
    assert(row.getLong(1) != 0L)
    assert(math.abs(row.getDouble(2) - 0.5) < 1e-9)
  }

  test("minhash_sig from SQL estimates jaccard of identical sets as 1") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT equal_fraction(minhash_sig(array('x','y','z')),
        |                      minhash_sig(array('z','y','x'))) AS f
        |""".stripMargin).head().getDouble(0)
    assert(r == 1.0)
  }

  test("JSONL docs source: clean/corrupt split, derived ids, ingest report") {
    import graft.sources.JsonDocsSource
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("docs.jsonl")
    java.nio.file.Files.writeString(f,
      Seq(
        """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
        """{"text": "no id line", "lang": "en", "source": "web"}""",
        """{"doc_id": 3, "text": "missing meta"}""",
        """{"doc_id": 4, "lang": "en", "source": "web"}""",
        """this is not json at all""",
        """{"doc_id": 5, "text": "ok again", "lang": "de", "source": "books"}"""
      ).mkString("\n"))
    val (clean, corrupt) = JsonDocsSource.readDocs(spark, f.toString)
    val rows = clean.orderBy("doc_id")
      .as[(Long, String, String, String, Long)].collect()
    // 4 clean docs; the no-text object and the non-JSON line quarantine
    assert(rows.length == 4)
    assert(corrupt.count() == 2)
    // explicit ids survive; defaults fill missing metadata
    assert(rows.exists(r => r._1 == 1L && r._2 == "hello world" &&
      r._5 == 11L))
    assert(rows.exists(r => r._1 == 3L && r._3 == "und" && r._4 == "unknown"))
    // the derived id is the deterministic text hash — re-reading the
    // same file yields the same id
    val derived = rows.filter(r => !Set(1L, 3L, 5L).contains(r._1))
    assert(derived.length == 1 && derived.head._2 == "no id line")
    val (clean2, _) = JsonDocsSource.readDocs(spark, f.toString)
    assert(clean2.orderBy("doc_id")
      .as[(Long, String, String, String, Long)].collect()
      .toSeq == rows.toSeq)
    // report: per-source counts + the corrupt quarantine row
    val repRows = JsonDocsSource.ingestReport(spark, f.toString)
      .as[(String, Long, Long)].collect()
    assert(repRows.map(_._1).toSet ==
      Set("_corrupt", "web", "books", "unknown"))
    assert(repRows.find(_._1 == "_corrupt").get._2 == 2L)
    assert(repRows.find(_._1 == "web").get._2 == 2L)
  }

  test("registerTables: full surface reachable from spark.sql") {
    GraftSession.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT c_mktsegment, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(r.length > 0 && r.forall(_.getLong(1) > 0))
    // graft's native functions compose with the views in one statement
    val sim = spark.sql(
      """SELECT avg(cosine_sim(embedding, embedding)) AS s
        |FROM embeddings""".stripMargin).head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
  }

  test("zValue interleaves bits and preserves order along both axes") {
    import graft.sources.ZOrder
    import org.apache.spark.sql.functions._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xAL, 0x5L), (3L, 7L)).toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L)  // a on even bits
    assert(rows((0L, 1L)) == 2L)  // b on odd bits
    assert(rows((1L, 1L)) == 3L)
    // a=1010, b=0101 -> z = a-even ∪ b-odd = 0b01100110 = 0x66
    assert(rows((0xAL, 0x5L)) == 0x66L)
    // 3=0b11, 7=0b111: even bits 0101, odd bits 101010 -> 0b101111
    assert(rows((3L, 7L)) == 0x2FL)
  }

  test("z-ordered layout: every file covers a bounded rectangle of BOTH keys") {
    import graft.sources.ZOrder
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sf).lineitem.select("l_partkey", "l_orderkey")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    ZOrder.writeZOrdered(t, zDir, "l_partkey", "l_orderkey", files = 16)
    // baseline: linear sort by partkey only, same file count
    t.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)
    def perFileSpan(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).collect()(0).getDouble(0)
      spans
    }
    val (loZ, hiZ) = (perFileSpan(zDir, "l_partkey"), perFileSpan(zDir, "l_orderkey"))
    val (loL, hiL) = (perFileSpan(linDir, "l_partkey"), perFileSpan(linDir, "l_orderkey"))
    // the linear layout prunes partkey perfectly but every file spans
    // ~the whole orderkey range; z-order bounds BOTH dimensions — the
    // second-column span must drop by at least 2x
    assert(hiZ < hiL / 2.0,
      s"orderkey span: z=$hiZ linear=$hiL — no multi-dim locality")
    // and z-order must still keep partkey spans bounded (not the full
    // range that a random layout would give): strictly narrower than
    // the full key range
    val full = t.agg((max("l_partkey") - min("l_partkey")).cast("double"))
      .collect()(0).getDouble(0)
    assert(loZ < full * 0.6, s"partkey span $loZ vs full range $full")
  }

  test("day-partitioned layout: time predicates prune at the directory") {
    import graft.sources.ZOrder
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("daypart").toString
    ZOrder.writeDayPartitioned(Tables(spark, sf).events, dir)
    val days = spark.read.parquet(dir)
      .select(countDistinct("event_date")).collect()(0).getLong(0)
    assert(days > 1, "need multiple day partitions to test pruning")
    val firstDay = spark.read.parquet(dir)
      .agg(min("event_date")).collect()(0).getDate(0)
    val q = spark.read.parquet(dir)
      .filter(col("event_date") === lit(firstDay))
    // the day predicate must land in PartitionFilters (directory
    // pruning), NOT in the data filters — and the scan must report
    // reading only that day's partition
    val scan = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty, "predicate not on partition col")
    assert(scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).map(_.files.size).sum <
      scan.relation.location.listFiles(Nil, Nil).map(_.files.size).sum,
      "partition pruning read every file")
    // correctness: pruned read equals a full-scan filter
    val want = Tables(spark, sf).events
      .filter(to_date(col("ts")) === lit(firstDay)).count()
    assert(q.count() == want)
  }
}
