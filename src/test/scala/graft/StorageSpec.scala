package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalOps
import graft.sources.{Sinks, Tables}

class StorageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned parquet: date-partition pruning reaches PartitionFilters") {
    val dir = Files.createTempDirectory("graft-part").toString + "/orders"
    val orders = Tables(spark, TestSpark.Sf0001).orders
      .withColumn("order_year", year($"o_orderdate"))
    Sinks.writePartitioned(orders, dir, Seq("order_year"))
    val pruned = spark.read.parquet(dir).filter($"order_year" === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"), plan.take(1500))
    assert(pruned.count() ==
      Tables(spark, TestSpark.Sf0001).orders.filter(year($"o_orderdate") === 1996).count())
  }

  test("jsonl round-trip: gzip-compressed lines, explicit-schema read, values exact") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/docs"
    val docs = Tables(spark, TestSpark.Sf0001).documents
      .select($"doc_id", $"source", $"text", $"n_chars")
    Sinks.writeJsonl(docs, dir)
    // the shipped files really are gzip members
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty, "expected .json.gz part files")
    val back = Sinks.readJsonl(spark, dir,
      "doc_id LONG, source STRING, text STRING, n_chars LONG")
    assert(back.count() == docs.count())
    val a = docs.orderBy($"doc_id").collect().map(_.toSeq)
    val b = back.select($"doc_id", $"source", $"text", $"n_chars")
      .orderBy($"doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("orc round-trip: values exact, filters pushed to the orc scan") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/docs"
    val docs = Tables(spark, TestSpark.Sf0001).documents
      .select($"doc_id", $"source", $"n_chars")
    Sinks.writeOrc(docs, dir)
    val back = Sinks.readOrc(spark, dir)
    assert(back.count() == docs.count())
    val filtered = back.filter($"n_chars" > 200)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,200)]"),
      plan.take(1500))
    assert(filtered.count() == docs.filter($"n_chars" > 200).count())
  }

  test("parquet mergeSchema: reads the union schema across evolved files") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir + "/gen=1")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(dir + "/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "gen"))
    val rows = merged.select($"id", $"v1", $"v2")
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, Some("a"), None), (2L, None, Some(3.5))))
  }

  test("csv PERMISSIVE mode: malformed rows land in the corrupt-record column") {
    val dir = Files.createTempDirectory("graft-corrupt")
    Files.write(dir.resolve("in.csv"), "1,ok\nnot_a_number,bad\n3,fine".getBytes)
    val df = spark.read
      .schema("id LONG, label STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir.toString)
      .cache() // corrupt-record column requires a materialized frame to filter on
    try {
      val good = df.filter($"_corrupt_record".isNull).select($"id").as[Long].collect().sorted
      val bad = df.filter($"_corrupt_record".isNotNull).select($"_corrupt_record")
        .as[String].collect()
      assert(good.toSeq == Seq(1L, 3L))
      assert(bad.toSeq == Seq("not_a_number,bad"))
    } finally df.unpersist()
  }

  test("range-clustered write: per-file key ranges are disjoint (zone-map layout)") {
    val dir = Files.createTempDirectory("graft-zone").toString + "/orders"
    val t = Tables(spark, TestSpark.Sf0001)
    Sinks.writeRangeClustered(t.orders, dir, Seq("o_orderkey"), nFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length >= 2, s"expected multiple files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min($"o_orderkey"), max($"o_orderkey"))
        .as[(Long, Long)].collect().head
      r
    }.sortBy(_._1)
    // repartitionByRange ⇒ contiguous non-overlapping ranges: every file's
    // max is below the next file's min, so footer min/max prunes any range
    // predicate down to the few files that can match
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, ranges.mkString(","))
      case _                        =>
    }
    // and the predicate itself still reaches the scan
    val plan = spark.read.parquet(dir).filter($"o_orderkey" < 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(o_orderkey"),
      plan.take(1200))
    // round-trip completeness
    assert(spark.read.parquet(dir).count() == t.orders.count())
  }

  test("range-clustered bloom filters: planted miss fails the row-group bloom probe") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-bloom").toString + "/orders"
    val t = Tables(spark, TestSpark.Sf0001)
    // cluster on the date-ish key, bloom on the HIGH-CARDINALITY point-
    // lookup column — the case footer min/max cannot skip (o_custkey is
    // unordered within every o_orderkey range)
    Sinks.writeRangeClustered(t.orders, dir, Seq("o_orderkey"), nFiles = 2,
      bloomFilterCols = Seq("o_custkey"))
    val present = t.orders.select($"o_custkey").as[Long].head()
    val absent = -987654321L // custkeys are positive; never written
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    var groups = 0
    var presentHits = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRowGroups.asScala.foreach { rg =>
        val cc = rg.getColumns.asScala
          .find(_.getPath.toDotString == "o_custkey")
          .getOrElse(fail("o_custkey chunk missing"))
        val bf = r.readBloomFilter(cc)
        assert(bf != null, s"bloom filter missing in ${f.getName}")
        // the planted miss MUST fail the probe — this is exactly the
        // row-group skip decision parquet-mr takes for `o_custkey = absent`
        assert(!bf.findHash(bf.hash(absent)), "planted miss passed the bloom probe")
        if (bf.findHash(bf.hash(present))) presentHits += 1
        groups += 1
      } finally r.close()
    }
    assert(groups > 0)
    // a value that IS in the data must pass in at least one row group
    // (blooms have no false negatives)
    assert(presentHits > 0)
    // and the bloom option didn't perturb the data: round-trip exact
    assert(spark.read.parquet(dir).count() == t.orders.count())
  }

  test("zkey2 matches the hand-computed Morton table on the 4x4 grid") {
    import graft.operators.ZOrder
    val got = (for { y <- 0 to 3; x <- 0 to 3 } yield (x, y)).toDF("x", "y")
      .select($"x", $"y", ZOrder.zkey2($"x", $"y").as("z"))
      .as[(Int, Int, Long)].collect().map { case (x, y, z) => (x, y) -> z }.toMap
    val expected = Map(
      (0, 0) -> 0L, (1, 0) -> 1L, (0, 1) -> 2L, (1, 1) -> 3L,
      (2, 0) -> 4L, (3, 0) -> 5L, (2, 1) -> 6L, (3, 1) -> 7L,
      (0, 2) -> 8L, (1, 2) -> 9L, (0, 3) -> 10L, (1, 3) -> 11L,
      (2, 2) -> 12L, (3, 2) -> 13L, (2, 3) -> 14L, (3, 3) -> 15L)
    assert(got == expected)
  }

  test("z-ordered write: every file covers a bounded rectangle in BOTH dimensions") {
    import graft.operators.ZOrder
    val dir = Files.createTempDirectory("graft-zorder").toString + "/grid"
    // complete 64x64 grid, one sorted partition split at exact 1024-row
    // boundaries -> each file is exactly one 32x32 quadrant (z < 1024 iff
    // x < 32 and y < 32, etc.)
    val grid = (for { y <- 0 until 64; x <- 0 until 64 } yield (x, y)).toDF("x", "y")
    ZOrder.writeZOrdered(grid, dir, "x", "y", nFiles = 1, maxRecordsPerFile = 1024L)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 4, s"expected 4 quadrant files, got ${files.length}")
    val boxes = files.map { f =>
      spark.read.parquet(f).agg(min($"x"), max($"x"), min($"y"), max($"y"))
        .as[(Int, Int, Int, Int)].collect().head
    }.toSet
    assert(boxes == Set((0, 31, 0, 31), (32, 63, 0, 31), (0, 31, 32, 63), (32, 63, 32, 63)))
    // so a predicate on EITHER x or y alone prunes to half the files by
    // footer min/max — the property single-column range clustering lacks
  }

  test("zkeyN generalizes zkey2: identical key at d=2, closed-form at d=3") {
    import graft.operators.ZOrder
    val pts = (for { y <- 0 to 40; x <- 0 to 40 } yield (x * 997, y * 1501)).toDF("x", "y")
    val diff = pts.select(
      (ZOrder.zkeyN(Seq($"x", $"y"), 16) =!= ZOrder.zkey2($"x", $"y")).as("ne"))
      .filter($"ne").count()
    assert(diff == 0)
    // d=3, 2 bits/dim: interleave (x,y,z) bit-by-bit — enumerate all 64
    val cube = (for { z <- 0 to 3; y <- 0 to 3; x <- 0 to 3 } yield (x, y, z))
      .toDF("x", "y", "z")
    val got = cube.select($"x", $"y", $"z",
      ZOrder.zkeyN(Seq($"x", $"y", $"z"), 2).as("k"))
      .as[(Int, Int, Int, Long)].collect()
    got.foreach { case (x, y, z, k) =>
      val expect = (0 until 2).map { i =>
        (((x >> i) & 1) << (i * 3)) | (((y >> i) & 1) << (i * 3 + 1)) |
          (((z >> i) & 1) << (i * 3 + 2))
      }.reduce(_ | _)
      assert(k == expect, s"($x,$y,$z)")
    }
  }

  test("3-dim z-ordered write: every file covers a bounded BOX in all three dims") {
    import graft.operators.ZOrder
    val dir = Files.createTempDirectory("graft-zorder3").toString + "/cube"
    // complete 16x16x16 cube, one sorted partition split at exact 512-row
    // boundaries -> each file is exactly one 8x8x8 octant
    val cube = (for { z <- 0 until 16; y <- 0 until 16; x <- 0 until 16 } yield (x, y, z))
      .toDF("x", "y", "z")
    ZOrder.writeZOrdered(cube, dir, Seq("x", "y", "z"), bitsPerDim = 4,
      nFiles = 1, maxRecordsPerFile = 512L)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 8, s"expected 8 octant files, got ${files.length}")
    val boxes = files.map { f =>
      spark.read.parquet(f)
        .agg(min($"x"), max($"x"), min($"y"), max($"y"), min($"z"), max($"z"))
        .as[(Int, Int, Int, Int, Int, Int)].collect().head
    }.toSet
    val expected = for { zo <- Set(0, 8); yo <- Set(0, 8); xo <- Set(0, 8) }
      yield (xo, xo + 7, yo, yo + 7, zo, zo + 7)
    assert(boxes == expected)
    // a predicate on ANY single dimension prunes half the files by footer
    // min/max — the d-dim generalization of the quadrant property above
  }

  test("bucketed tables join with zero exchanges") {
    val t = Tables(spark, TestSpark.Sf0001)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Sinks.writeBucketed(t.lineitem.select("l_orderkey", "l_quantity"), "li_b", "l_orderkey")
      Sinks.writeBucketed(t.orders.select("o_orderkey", "o_totalprice"), "ord_b", "o_orderkey")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      val li = t.lineitem
      val ord = t.orders
      assert(joined.count() == li.join(ord, li("l_orderkey") === ord("o_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("saltedJoin equals plain join on a skewed key") {
    val big = spark.range(10000)
      .select(when($"id" % 10 === 0, lit("hot")).otherwise(concat(lit("k"), $"id")).as("k"),
        $"id".as("v"))
    val small = Seq(("hot", 1), ("k5", 2), ("k17", 3)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
    val salted = RelationalOps.saltedJoin(big, small, "k").select("k", "v", "w")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("sink formats round-trip: csv, json, orc") {
    val dir = Files.createTempDirectory("graft-sinks")
    val df = Tables(spark, TestSpark.Sf0001).region
    Sinks.writeCsv(df, dir.resolve("csv").toString)
    Sinks.writeJson(df, dir.resolve("json").toString)
    Sinks.writeOrc(df, dir.resolve("orc").toString)
    assert(spark.read.option("header", "true").csv(dir.resolve("csv").toString).count() == 5)
    assert(spark.read.json(dir.resolve("json").toString).count() == 5)
    assert(spark.read.orc(dir.resolve("orc").toString).count() == 5)
  }

  test("nullProfile counts nulls per column") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("x", "y")
    val r = RelationalOps.nullProfile(df, Seq("x", "y")).collect()(0)
    assert(r.getAs[Long]("x_nulls") == 1 && r.getAs[Long]("y_nulls") == 1)
    assert(r.getAs[Long]("x_total") == 3)
  }
}
