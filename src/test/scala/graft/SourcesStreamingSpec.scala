package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Sources

class SourcesStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("price scan pushes date/sid predicates and prunes columns (S1)") {
    // write a small price panel and scan it back with pushdown params
    val dir = Files.createTempDirectory("graft-prices").toString
    Seq(
      ("A", "2024-01-01", 1.0, 10.0), ("A", "2024-02-01", 2.0, 20.0),
      ("B", "2024-01-01", 3.0, 30.0))
      .toDF("sid", "date", "close", "volume")
      .withColumn("date", to_date($"date"))
      .write.mode("overwrite").parquet(dir)
    val q = Sources.PriceQuery(
      startDate = Some("2024-01-01"), endDate = Some("2024-01-31"),
      sids = Seq("A"), fields = Seq("close"))
    val df = Sources.prices(spark, dir, q)
    assert(df.columns.toSeq == Seq("sid", "date", "close")) // volume pruned
    assert(df.count() == 1) // date + sid predicates applied
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
  }

  test("price scan: excludeSids and times filters (S1, base.py:1243-1249)") {
    val dir = Files.createTempDirectory("graft-prices2").toString
    Seq(
      ("A", "2024-01-01", "09:30:00", 1.0), ("A", "2024-01-01", "15:30:00", 2.0),
      ("B", "2024-01-01", "09:30:00", 3.0), ("B", "2024-01-01", "15:30:00", 4.0),
      ("C", "2024-01-01", "09:30:00", 5.0))
      .toDF("sid", "date", "time", "close")
      .withColumn("date", to_date($"date"))
      .write.mode("overwrite").parquet(dir)
    val q = Sources.PriceQuery(
      excludeSids = Seq("C"), times = Seq("15:30:00"))
    val rows = Sources.prices(spark, dir, q)
      .collect().map(r => r.getAs[String]("sid") -> r.getAs[Double]("close")).toMap
    assert(rows == Map("A" -> 2.0, "B" -> 4.0))
  }

  test("universes resolve to sid predicates pushed to the scan " +
    "(base.py:1240-1245)") {
    val dir = Files.createTempDirectory("graft-prices3").toString
    Seq(
      ("A", "2024-01-01", 1.0), ("B", "2024-01-01", 2.0),
      ("C", "2024-01-01", 3.0), ("D", "2024-01-01", 4.0))
      .toDF("sid", "date", "close")
      .withColumn("date", to_date($"date"))
      .write.mode("overwrite").parquet(dir)
    val membership = Seq(
      ("tech", "A"), ("tech", "B"), ("fin", "B"), ("fin", "C"))
      .toDF("universe", "sid")
    val q = Sources.PriceQuery(
      universes = Seq("tech", "fin"), excludeUniverses = Seq("fin"))
    val df = Sources.prices(spark, dir, q, Some(membership))
    // tech ∪ fin = {A,B,C}; minus fin = {A} (B is in both → excluded)
    assert(df.collect().map(_.getAs[String]("sid")).toSeq == Seq("A"))
    // the resolved sid predicates reach the parquet scan as pushed
    // filters (driver-side resolution, not a panel-shuffling semi-join)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("In(sid") || plan.contains("EqualTo(sid") ||
      plan.contains("Not(In(sid"), plan)
    // explicit sids union with universe members
    val union = Sources.prices(spark, dir,
      Sources.PriceQuery(sids = Seq("D"), universes = Seq("tech")),
      Some(membership))
    assert(union.collect().map(_.getAs[String]("sid")).sorted.toSeq ==
      Seq("A", "B", "D"))
    // unknown universe name → ParameterError, like the service
    intercept[ParameterError] {
      Sources.prices(spark, dir,
        Sources.PriceQuery(universes = Seq("nope")), Some(membership))
    }
    // universes without a membership table → ParameterError
    intercept[ParameterError] {
      Sources.prices(spark, dir, Sources.PriceQuery(universes = Seq("tech")))
    }
  }

  test("universe resolution above MaxIsinSids falls back to a broadcast " +
    "semi/anti join — no giant literal filter, unchanged results") {
    val dir = Files.createTempDirectory("graft-prices-guard").toString
    Seq(
      ("A", "2024-01-01", 1.0), ("B", "2024-01-01", 2.0),
      ("C", "2024-01-01", 3.0), ("D", "2024-01-01", 4.0))
      .toDF("sid", "date", "close")
      .withColumn("date", to_date($"date"))
      .write.mode("overwrite").parquet(dir)
    // membership where "big" has MaxIsinSids+2 members (A, B + filler
    // sids absent from the panel) and "fin" stays literal-sized
    val big = spark.range(Sources.MaxIsinSids)
      .select(lit("big").as("universe"), concat(lit("x"), $"id").as("sid"))
      .union(Seq(("big", "A"), ("big", "B"), ("fin", "B"), ("fin", "C"))
        .toDF("universe", "sid"))
    val df = Sources.prices(spark, dir,
      Sources.PriceQuery(sids = Seq("D"), universes = Seq("big"),
        excludeUniverses = Seq("fin")),
      Some(big))
    // big ∪ {D} = {A,B,D,filler}; minus fin = {A,D}
    assert(df.collect().map(_.getAs[String]("sid")).sorted.toSeq ==
      Seq("A", "D"))
    val plan = df.queryExecution.executedPlan.toString
    // the include side is a semi join, not a 10k-literal In(sid, ...) —
    // no filler member may appear as a plan literal (the small exclude
    // side legitimately pushes Not(In(sid, [B,C])))
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("x17"), plan)
    // same query through the literal path (pre-resolved) agrees
    val pre = Sources.resolveUniverses(
      Sources.PriceQuery(sids = Seq("D"), universes = Seq("big"),
        excludeUniverses = Seq("fin")), big)
    val lit_ = Sources.prices(spark, dir, pre)
    assert(lit_.collect().map(_.getAs[String]("sid")).sorted.toSeq ==
      Seq("A", "D"))
    // a big EXCLUDE side also joins (anti) instead of a literal
    val anti = Sources.prices(spark, dir,
      Sources.PriceQuery(excludeUniverses = Seq("big")), Some(big))
    assert(anti.collect().map(_.getAs[String]("sid")).sorted.toSeq ==
      Seq("C", "D"))
    assert(anti.queryExecution.executedPlan.toString.contains("LeftAnti"))
  }

  test("forStrategy appends the benchmark sid to a restricted scan " +
    "(base.py:1227-1234) and fills the lookback from the strategy") {
    def strat(bSid: Option[String], bDb: Option[org.apache.spark.sql.DataFrame] = None,
        lookback: Int = 0) =
      new graft.pipeline.Strategy {
        val code = "fs"
        override def benchmarkSid: Option[String] = bSid
        override def benchmarkPrices: Option[org.apache.spark.sql.DataFrame] = bDb
        override def lookbackWindow: Int = lookback
        def pricesToSignals(p: org.apache.spark.sql.DataFrame) = p
      }
    val restricted = Sources.PriceQuery(sids = Seq("A", "B"))
    // appended when sids restrict and the benchmark must come from the panel
    assert(Sources.forStrategy(restricted, strat(Some("SPY"))).sids ==
      Seq("A", "B", "SPY"))
    // universes restrict the scan the same way
    assert(Sources.forStrategy(Sources.PriceQuery(universes = Seq("tech")),
      strat(Some("SPY"))).sids == Seq("SPY"))
    // NOT appended: unrestricted scan reads the whole store anyway
    assert(Sources.forStrategy(Sources.PriceQuery(), strat(Some("SPY"))).sids.isEmpty)
    // NOT appended: BENCHMARK_DB supplies the benchmark separately
    val db = Seq(("SPY", "2024-01-01", 1.0)).toDF("sid", "date", "close")
    assert(Sources.forStrategy(restricted, strat(Some("SPY"), bDb = Some(db))).sids ==
      Seq("A", "B"))
    // NOT duplicated when already queried
    assert(Sources.forStrategy(
      Sources.PriceQuery(sids = Seq("SPY", "A")), strat(Some("SPY"))).sids ==
      Seq("SPY", "A"))
    // lookback fills from the strategy unless the query set its own
    assert(Sources.forStrategy(restricted, strat(None, lookback = 20)).lookbackBars == 20)
    assert(Sources.forStrategy(restricted.copy(lookbackBars = 5),
      strat(None, lookback = 20)).lookbackBars == 5)
  }

  test("CONT_FUT selects the pre-adjusted variant (raising when absent) " +
    "and DB_DATA_FREQUENCY picks a frequency subdirectory when present " +
    "(base.py:1247, 1250)") {
    val root = Files.createTempDirectory("graft-variants").toString
    def write(sub: String, rows: Seq[(String, String, Double)]): Unit =
      rows.toDF("sid", "date", "close").withColumn("date", to_date($"date"))
        .write.mode("overwrite").parquet(s"$root/$sub")
    write("cont_fut=concat", Seq(("FUT1", "2024-01-01", 100.0)))
    write("daily", Seq(("A", "2024-01-01", 1.0)))
    // raw store files live at the root itself
    Seq(("A", "2024-01-01", 2.0), ("A", "2024-01-02", 3.0))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
      .write.mode("overwrite").parquet(s"$root/raw")

    // contFut routes to the pre-adjusted variant
    val fut = Sources.prices(spark, root,
      Sources.PriceQuery(contFut = Some("concat")))
    assert(fut.collect().map(_.getAs[Double]("close")).toSeq == Seq(100.0))
    // naming a mode with no published variant raises — scanning raw
    // futures prices as if adjusted would silently corrupt returns
    intercept[ParameterError] {
      Sources.prices(spark, s"$root/raw", Sources.PriceQuery(contFut = Some("concat")))
    }
    // data frequency picks the subdirectory when it exists…
    val daily = Sources.prices(spark, root,
      Sources.PriceQuery(dataFrequency = Some("daily")))
    assert(daily.collect().map(_.getAs[Double]("close")).toSeq == Seq(1.0))
    // …and is ignored when it doesn't (the reference's non-Zipline rule)
    val ignored = Sources.prices(spark, s"$root/raw",
      Sources.PriceQuery(dataFrequency = Some("daily")))
    assert(ignored.count() == 2)
    intercept[ParameterError] {
      Sources.prices(spark, root, Sources.PriceQuery(dataFrequency = Some("hourly")))
    }
  }

  test("pricesUnion scans several stores as one panel, null-filling " +
    "disjoint fields, with predicates pushed into every branch " +
    "(multi-DB codes, base.py:1220-1223)") {
    val d1 = Files.createTempDirectory("graft-db1").toString
    val d2 = Files.createTempDirectory("graft-db2").toString
    Seq(("A", "2024-01-01", 1.0, 100.0), ("B", "2024-01-01", 2.0, 200.0))
      .toDF("sid", "date", "close", "volume")
      .withColumn("date", to_date($"date"))
      .write.mode("overwrite").parquet(d1)
    // second store carries a different field set (no volume, adds vwap)
    Seq(("C", "2024-01-01", 3.0, 3.1), ("D", "2024-01-01", 4.0, 4.1))
      .toDF("sid", "date", "close", "vwap")
      .withColumn("date", to_date($"date"))
      .write.mode("overwrite").parquet(d2)
    val df = Sources.pricesUnion(spark, Seq(d1, d2),
      Sources.PriceQuery(excludeSids = Seq("D")))
    val rows = df.collect().map(r => r.getAs[String]("sid") ->
      (r.getAs[Double]("close"), Option(r.getAs[Any]("volume")),
        Option(r.getAs[Any]("vwap")))).toMap
    assert(rows.keySet == Set("A", "B", "C"))
    assert(rows("A") == ((1.0, Some(100.0), None))) // vwap null-filled
    assert(rows("C") == ((3.0, None, Some(3.1)))) // volume null-filled
    // the sid predicate reaches BOTH parquet scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.sliding("PushedFilters".length).count(_ == "PushedFilters") >= 2 ||
      "PushedFilters".r.findAllIn(plan).size >= 2, plan)
    intercept[ParameterError] { Sources.pricesUnion(spark, Nil) }
  }

  test("lookback widening converts trading days to calendar days + buffer (W7)") {
    // reference constants (base.py:1146-1181): 365/235 conversion
    assert(Sources.widenedStart("2024-06-01", 0) == "2024-06-01")
    // 5 bars → ceil(5×365/235)=8 + 2 buffer = 10 days
    assert(Sources.widenedStart("2024-06-01", 5) == "2024-05-22")
    // 252 bars → ceil(252×365/235)=392 + 10 buffer = 402 days
    assert(Sources.widenedStart("2024-06-01", 252) ==
      java.time.LocalDate.parse("2024-06-01").minusDays(402).toString)
  }

  test("withNlv: currency → equity map to per-security NLV; CASH uses the " +
    "Symbol's base currency; missing currencies raise (base.py:1117-1139)") {
    val master = Seq(
      ("FI1", "STK", "USD", "AAPL"),
      ("FI2", "STK", "JPY", "7203"),
      ("FI3", "CASH", "USD", "EUR.USD")) // NLV keyed by EUR, not USD
      .toDF("sid", "secType", "currency", "symbol")
    val withNlv = Sources.withNlv(master,
      Map("USD" -> 100000.0, "JPY" -> 9000000.0, "EUR" -> 80000.0))
      .collect().map(r => r.getAs[String]("sid") -> r.getAs[Double]("nlv")).toMap
    assert(withNlv == Map("FI1" -> 100000.0, "FI2" -> 9000000.0, "FI3" -> 80000.0))

    val e = intercept[IllegalArgumentException] {
      Sources.withNlv(master, Map("USD" -> 100000.0, "JPY" -> 9000000.0))
    }
    assert(e.getMessage ==
      "NLV dict is missing values for required currencies: EUR")
  }

  test("ResultCache: computes once, reuses until a dependency is newer (S7)") {
    val cacheDir = Files.createTempDirectory("graft-cache").toString
    val cache = new Sources.ResultCache(spark, cacheDir)
    var computes = 0
    def compute = {
      computes += 1
      Seq((1, "a"), (2, "b")).toDF("id", "v")
    }
    val first = cache.getOrCompute("test-key")(compute)
    assert(first.count() == 2 && computes == 1)
    val second = cache.getOrCompute("test-key")(compute)
    assert(second.count() == 2 && computes == 1) // cache hit, no recompute

    // a dependency file newer than the cache invalidates it
    val dep = Files.createTempFile("graft-dep", ".txt")
    Files.writeString(dep, "x")
    val third = cache.getOrCompute("test-key", dependsOn = Seq(dep.toString))(compute)
    assert(third.count() == 2 && computes == 2)
  }

  test("structured streaming: exact dedup on content hash matches batch " +
    "(LLM-pipeline streaming path)") {
    // stream the documents table; keep the first occurrence of each
    // content hash. dropDuplicatesWithinWatermark bounds the dedup state
    // for continuous ingest (the batch path is Dedup.dropExactDuplicates).
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    val streamed = spark.readStream
      .schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    val qname = "doc_dedup_out"
    val q = streamed
      .withColumn("content_md5", md5(col("text")))
      .withColumn("__ingest", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withWatermark("__ingest", "1 hour")
      .dropDuplicatesWithinWatermark("content_md5")
      .writeStream
      .outputMode("append")
      .format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val batchDistinct = raw.select(md5(col("text"))).distinct().count()
    assert(spark.table(qname).count() == batchDistinct)
  }

  test("structured streaming: native expressions (cleanText, " +
    "GopherSignals, NfcNormalize) run in streaming plans and match batch") {
    import graft.text.TextAnalysis
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    val streamed = spark.readStream
      .schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    def curate(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      md5(TextAnalysis.cleanText(col("text"))).as("clean_md5"),
      TextAnalysis.gopherKeepNative(col("text")).as("keep"))
    val qname = "native_stream_out"
    val q = curate(streamed).writeStream
      .outputMode("append")
      .format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val stream = spark.table(qname).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    val batch = curate(raw).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("structured streaming: hourly windowed aggregation matches batch (§2.10 extra)") {
    // stream the events table with Trigger.AvailableNow into memory
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val streamed = spark.readStream
      .schema(raw.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    def hourly(df: org.apache.spark.sql.DataFrame) = {
      // events.ts arrives as a nanos long under
      // spark.sql.legacy.parquet.nanosAsLong, or as TIMESTAMP(_NTZ)
      // without it — handle both (the Queries.events contract)
      val ts =
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros((col("ts") / 1000).cast("long"))
        else col("ts").cast("timestamp")
      df.withColumn("__ts", ts)
        .withWatermark("__ts", "1 hour")
        .groupBy(window(col("__ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    }
    val qname = "ev_stream_out"
    val q = hourly(streamed).writeStream
      .outputMode("complete")
      .format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamCount = spark.sql(s"SELECT sum(n) FROM $qname").head.getLong(0)
    assert(streamCount == raw.count())
    val batchGroups = hourly(raw).count()
    assert(spark.table(qname).count() == batchGroups)
  }
}
