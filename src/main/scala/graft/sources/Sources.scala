package graft.sources

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftError, ParameterError}

/** File-based connectors replacing the reference's HTTP data services
  * (SURVEY §2.1 S1-S9; reference base.py:1183-1282, 1088-1144).
  *
  * Every `get_prices` kwarg that the reference pushes into its data-service
  * query (base.py:1238-1251) becomes a Catalyst filter here, so parquet
  * row-group pruning + column pruning do the same work the service did —
  * check `.explain` for PushedFilters/ReadSchema.
  */
object Sources {

  /** S1 price-scan predicate pack, mirroring get_prices kwargs. */
  final case class PriceQuery(
      startDate: Option[String] = None,
      endDate: Option[String] = None,
      sids: Seq[String] = Nil,
      excludeSids: Seq[String] = Nil, // exclude_sids, base.py:1243
      universes: Seq[String] = Nil, // UNIVERSES, base.py:1242
      excludeUniverses: Seq[String] = Nil, // EXCLUDE_UNIVERSES, base.py:1244
      fields: Seq[String] = Nil, // column pruning (DB_FIELDS, base.py:1248)
      times: Seq[String] = Nil, // times-of-day filter, base.py:1249
      lookbackBars: Int = 0, // W7 widening — see widenedStart
      contFut: Option[String] = None, // CONT_FUT, base.py:1247 — see resolveDataDir
      dataFrequency: Option[String] = None) // DB_DATA_FREQUENCY, base.py:1250

  /** Reference get_prices sid assembly (base.py:1224-1234): the strategy's
    * BENCHMARK sid is auto-appended to the queried sids when
    *  - the strategy names a benchmark,
    *  - no BENCHMARK_DB is configured (the benchmark must come from the
    *    price panel itself), and
    *  - the query restricts the scan by sids or universes (an
    *    unrestricted scan reads the whole store, benchmark included).
    * Without the append, a SIDS-restricted strategy with a BENCHMARK
    * would scan a panel missing the benchmark's rows and the backtest
    * would raise D19's benchmark-missing error. Also fills the W7
    * lookback widening from the strategy (base.py:1217-1218) when the
    * query didn't set its own. */
  def forStrategy(q: PriceQuery, strategy: graft.pipeline.Strategy): PriceQuery = {
    val widened =
      if (q.lookbackBars == 0 && strategy.effectiveLookback > 0)
        q.copy(lookbackBars = strategy.effectiveLookback)
      else q
    strategy.benchmarkSid match {
      case Some(b)
        if strategy.benchmarkPrices.isEmpty &&
          (widened.sids.nonEmpty || widened.universes.nonEmpty) &&
          !widened.sids.contains(b) =>
        widened.copy(sids = widened.sids :+ b)
      case _ => widened
    }
  }

  /** Above this many resolved members per side, [[prices]] /
    * [[pricesUnion]] / [[pricesTable]] stop materializing a driver-side
    * `isin` literal (a multi-million-sid universe would serialize a
    * giant predicate into every task and round-trip the members through
    * the driver) and instead filter with a broadcast LEFT SEMI
    * (includes) / LEFT ANTI (excludes) join against the membership
    * table. Below it, the literal wins: it reaches the parquet reader
    * as PushedFilters, which no join can. The membership dimension is
    * ≪ the panel by contract, so broadcast is the right join side; on
    * the bucketed [[pricesTable]] layout the probe needs no exchange at
    * all, and date-partition pruning is independent of the sid filter
    * either way. */
  val MaxIsinSids: Int = 10000

  /** Above this many resolved members per side, the fallback join drops
    * its broadcast hint too: a broadcast still collects every member to
    * the driver to build the torrent, so a multi-million-sid universe
    * would trade the giant isin literal for a driver/broadcast-ceiling
    * OOM. Past this bound the semi/anti join runs as a plain shuffle
    * join (the planner/AQE pick) — the panel pays one exchange, which
    * is the honest cost of filtering by a membership side that big. */
  val MaxBroadcastSids: Long = 1000000L

  /** Resolve universe names into sid predicates via a `(universe, sid)`
    * membership table (reference base.py:1240-1245: UNIVERSES /
    * EXCLUDE_UNIVERSES ride the same service query as sids — here the
    * membership table plays the data service's universe registry).
    *
    * Resolution is a driver-side collect over the membership dimension —
    * bounded like the master (universe membership ≪ panel) — so the
    * result is a plain `isin` that reaches the parquet scan as
    * PushedFilters; a semi-join would shuffle the panel instead. Keep the
    * membership `sid` dtype equal to the panel's so the pushed predicate
    * stays cast-free. Unknown universe names raise ParameterError
    * (mirroring the service's no-such-universe failure). Universe sids
    * UNION with explicit sids (and likewise for excludes), matching the
    * service's semantics.
    *
    * This eager-literal form is for master-bounded universes; the scan
    * entry points guard on [[MaxIsinSids]] and switch to semi-join
    * resolution above it (see [[MaxIsinSids]]). */
  def resolveUniverses(q: PriceQuery, membership: DataFrame): PriceQuery = {
    if (q.universes.isEmpty && q.excludeUniverses.isEmpty) return q
    def members(names: Seq[String]): Seq[String] =
      if (names.isEmpty) Nil
      else {
        val rows = membership
          .where(col("universe").isin(names: _*))
          .select(col("universe"), col("sid").cast("string"))
          .distinct().collect()
        val missing = names.toSet -- rows.map(_.getString(0)).toSet
        if (missing.nonEmpty)
          throw new ParameterError(
            s"no such universe(s): ${missing.toSeq.sorted.mkString(", ")}")
        rows.map(_.getString(1)).toSeq
      }
    q.copy(
      sids = (q.sids ++ members(q.universes)).distinct,
      excludeSids = (q.excludeSids ++ members(q.excludeUniverses)).distinct,
      universes = Nil,
      excludeUniverses = Nil)
  }

  /** W7 lookback planner (reference base.py:1146-1181): the scan start is
    * widened backward so the first tradeable date has `lookbackBars` bars
    * of history; results are truncated back at the requested start
    * (`Backtest.Config.startDate`). Trading-day → calendar-day conversion
    * assumes 260 weekdays − 25 holidays per year, plus a window-scaled
    * buffer — the reference's exact constants. */
  def widenedStart(startDate: String, lookbackBars: Int): String = {
    if (lookbackBars <= 0) return startDate
    val daysPerYear = 365.0
    val tradingDaysPerYear = 260.0 - 25.0
    val buffer = if (lookbackBars <= 5) 2 else 10
    val back = math.ceil(lookbackBars * daysPerYear / tradingDaysPerYear).toLong + buffer
    java.time.LocalDate.parse(startDate).minusDays(back).toString
  }

  /** S1: long/field-pivoted price panel scan with pushdown. All filters are
    * plain Column predicates → pushed to the parquet reader.
    *
    * Joins against this scan: dimensions (master, allocations, rates)
    * are broadcast at every join site in this library. For a dimension
    * too big to broadcast but much smaller than the panel — with a hot
    * key (one sid dominating the fact rows) that AQE's runtime skew
    * split can't touch because the layout was pre-partitioned —
    * [[graft.panel.Skew.saltedJoin]] spreads the hot key across
    * reducers with identical join semantics. For REPEATED large joins,
    * prefer publishing the panel bucketed by sid via [[writePrices]]:
    * co-located joins need no shuffle at all. */
  def prices(
      spark: SparkSession,
      path: String,
      q: PriceQuery = PriceQuery(),
      universeMembership: Option[DataFrame] = None): DataFrame =
    applyQuery(spark.read.parquet(resolveDataDir(path, q)),
      resolve(q, universeMembership))

  /** S1 multi-DB scan (`DB` as a list, base.py:1220-1223): one PriceQuery
    * over several stores, unioned by column name — stores may carry
    * different field sets (a history db next to a realtime-aggregate db);
    * absent columns null-fill, like the reference's cross-db concat. The
    * query's predicates push into EVERY union branch (Catalyst pushes
    * filters through Union), so each store prunes independently. */
  def pricesUnion(
      spark: SparkSession,
      paths: Seq[String],
      q: PriceQuery = PriceQuery(),
      universeMembership: Option[DataFrame] = None): DataFrame = {
    if (paths.isEmpty) throw new ParameterError("paths must be non-empty")
    val resolved = resolve(q, universeMembership)
    val scans = paths.map(p => spark.read.parquet(resolveDataDir(p, q)))
    applyQuery(
      scans.reduce(_.unionByName(_, allowMissingColumns = true)), resolved)
  }

  /** Storage-variant resolution for the two kwargs the reference pushes
    * into the data service itself rather than the predicate pack:
    *
    *  - CONT_FUT (base.py:1247): continuous-futures rollover adjustment
    *    happens at PUBLISH time in this engine — the storage contract is
    *    a pre-adjusted variant panel at `path/cont_fut=<mode>/` written
    *    alongside the raw panel. A query naming a mode with no such
    *    variant RAISES: silently scanning unadjusted futures prices
    *    would corrupt every downstream return (the loud-failure stance).
    *  - DB_DATA_FREQUENCY (base.py:1250): stores that publish both bar
    *    frequencies keep them at `path/daily/` and `path/minute/`; the
    *    selector picks the subdirectory when it exists and is otherwise
    *    ignored (the reference ignores data_frequency for non-Zipline
    *    dbs the same way). Values other than daily/minute raise. */
  private[graft] def resolveDataDir(path: String, q: PriceQuery): String = {
    val afterContFut = q.contFut match {
      case None => path
      case Some(mode) =>
        val variant = s"$path/cont_fut=$mode"
        if (!Files.isDirectory(Paths.get(variant)))
          throw new ParameterError(
            s"CONT_FUT=$mode requested but no pre-adjusted variant exists at " +
              s"$variant — publish the rollover-adjusted panel there (see " +
              "resolveDataDir's storage contract)")
        variant
    }
    q.dataFrequency match {
      case None => afterContFut
      case Some(freq) =>
        if (freq != "daily" && freq != "minute")
          throw new ParameterError(
            s"DB_DATA_FREQUENCY must be daily or minute: $freq")
        val variant = s"$afterContFut/$freq"
        if (Files.isDirectory(Paths.get(variant))) variant else afterContFut
    }
  }

  /** A resolved query plus the semi-join fallback sides: `include` /
    * `exclude` are distinct-sid frames (column `sid`, string) present
    * only when that side's universe resolution crossed [[MaxIsinSids]]. */
  private final case class Resolved(
      q: PriceQuery,
      include: Option[DataFrame] = None,
      exclude: Option[DataFrame] = None)

  private def resolve(q: PriceQuery, membership: Option[DataFrame]): Resolved =
    membership match {
      case Some(m) => resolveGuarded(q, m)
      case None =>
        if (q.universes.nonEmpty || q.excludeUniverses.nonEmpty)
          throw new ParameterError(
            "query names universes but no universe membership table was " +
              "provided — pass universeMembership or pre-resolve with " +
              "resolveUniverses")
        Resolved(q)
    }

  /** Size-guarded universe resolution: one bounded per-universe count
    * pass decides the strategy per side — ≤ [[MaxIsinSids]] members
    * collect to an `isin` literal (pushdown), above it the side becomes
    * a semi/anti join frame, avoiding the giant per-task literal (the
    * members are NOT driver-free below [[MaxBroadcastSids]]: the
    * broadcast hint applied there still collects them once to build
    * the torrent — what the guard removes is the literal serialized
    * into every task; above MaxBroadcastSids the hint is dropped too
    * and the join shuffles). Explicit sids OR with universe members,
    * so in fallback mode they union INTO the include frame; explicit
    * excludeSids are AND-ed exclusions and stay literal either way. */
  private def resolveGuarded(q: PriceQuery, m: DataFrame): Resolved = {
    if (q.universes.isEmpty && q.excludeUniverses.isEmpty) return Resolved(q)
    val names = (q.universes ++ q.excludeUniverses).distinct
    val counts = m.where(col("universe").isin(names: _*))
      .groupBy(col("universe"))
      .agg(count_distinct(col("sid")).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = names.toSet -- counts.keySet
    if (missing.nonEmpty)
      throw new ParameterError(
        s"no such universe(s): ${missing.toSeq.sorted.mkString(", ")}")
    def memberFrame(ns: Seq[String]): DataFrame = m
      .where(col("universe").isin(ns: _*))
      .select(col("sid").cast("string").as("sid")).distinct()
    // sum over universes is an upper bound (shared sids double-count) —
    // crossing the guard slightly early is the safe direction
    def small(ns: Seq[String]): Boolean = ns.map(counts).sum <= MaxIsinSids
    // fallback-side hint: broadcast only below MaxBroadcastSids (the
    // same upper-bound counts — not broadcasting slightly early is the
    // safe direction); above it the join shuffles instead of pushing a
    // multi-million-row build through the driver
    def hinted(f: DataFrame, ns: Seq[String]): DataFrame =
      if (ns.map(counts).sum <= MaxBroadcastSids) broadcast(f) else f
    def literal(ns: Seq[String]): Seq[String] =
      memberFrame(ns).collect().map(_.getString(0)).toSeq
    val (incSids, incFrame) =
      if (q.universes.isEmpty) (q.sids, None)
      else if (small(q.universes))
        ((q.sids ++ literal(q.universes)).distinct, None)
      else {
        val base = memberFrame(q.universes)
        val withExplicit =
          if (q.sids.isEmpty) base
          else base.union(
            m.sparkSession.createDataset(q.sids)(
              org.apache.spark.sql.Encoders.STRING).toDF("sid")).distinct()
        (Nil, Some(hinted(withExplicit, q.universes)))
      }
    val (excSids, excFrame) =
      if (q.excludeUniverses.isEmpty) (q.excludeSids, None)
      else if (small(q.excludeUniverses))
        ((q.excludeSids ++ literal(q.excludeUniverses)).distinct, None)
      else (q.excludeSids,
        Some(hinted(memberFrame(q.excludeUniverses), q.excludeUniverses)))
    Resolved(
      q.copy(sids = incSids, excludeSids = excSids,
        universes = Nil, excludeUniverses = Nil),
      incFrame, excFrame)
  }

  /** The PriceQuery → Catalyst-predicate translation shared by the path
    * scan ([[prices]]) and the catalog scan ([[pricesTable]]). */
  private def applyQuery(source: DataFrame, r: Resolved): DataFrame = {
    val q = r.q
    var df = source
    q.startDate.foreach(s =>
      df = df.where(col("date") >= lit(widenedStart(s, q.lookbackBars))))
    q.endDate.foreach(e => df = df.where(col("date") <= lit(e)))
    if (q.sids.nonEmpty) df = df.where(col("sid").isin(q.sids: _*))
    if (q.excludeSids.nonEmpty) df = df.where(!col("sid").isin(q.excludeSids: _*))
    if (q.times.nonEmpty) df = df.where(col("time").isin(q.times: _*))
    // guarded-universe fallback (see MaxIsinSids): membership sides too
    // big for an isin literal filter as semi/anti joins — the broadcast
    // hint (or its absence, above MaxBroadcastSids) was decided at
    // resolve time where the member counts are known
    r.include.foreach(inc =>
      df = df.join(inc, Seq("sid"), "left_semi"))
    r.exclude.foreach(exc =>
      df = df.join(exc, Seq("sid"), "left_anti"))
    if (q.fields.nonEmpty) {
      val keep = Seq("sid", "date", "time").filter(df.columns.contains) ++ q.fields
      df = df.select(keep.distinct.map(col): _*)
    }
    df
  }

  /** S1 storage contract at scale: publish a panel date-partitioned and
    * sid-bucketed.
    *
    *  - `partitionBy(date)`: every query in this library pushes a date
    *    predicate (start/end, signal-date slice), which becomes partition
    *    PRUNING — untouched dates are never listed, let alone read.
    *  - `bucketBy(buckets, sid)` + `sortBy(sid)`: scans report
    *    hash-partitioning on sid, so per-sid windows (lag/ffill/rolling —
    *    the whole §2.6 family) and equi-joins against anything bucketed
    *    the same way run with ZERO exchanges (BucketingSpec proves the
    *    plan shape). Bucket metadata only exists in the catalog, so this
    *    is a `saveAsTable`, not a path write.
    *
    * Size `buckets` so one bucket ≈ one executor-core's working set at
    * the target scale (100 TB / 32 buckets is far too coarse; thousands
    * are normal on a cluster — the local[32] default here mirrors the
    * test shuffle parallelism). */
  def writePrices(
      df: DataFrame,
      table: String,
      buckets: Int = 32,
      partitionCol: Option[String] = Some("date"),
      bucketCol: String = "sid"): Unit = {
    val spark = df.sparkSession
    // With a persistent metastore DROP also removes the managed location.
    // An in-memory catalog (fresh session) forgets the table but leaves
    // the directory, which then blocks CREATE — clear the orphan too.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val orphan = Paths.get(warehouse, table.toLowerCase)
    if (Files.exists(orphan)) {
      val stream = Files.walk(orphan)
      try stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally stream.close()
    }
    var w = df.write.mode("overwrite").format("parquet")
    partitionCol.foreach(p => w = w.partitionBy(p))
    w.bucketBy(buckets, bucketCol).sortBy(bucketCol).saveAsTable(table)
  }

  /** Catalog-table variant of [[prices]]: the same PriceQuery pushdown
    * over a [[writePrices]]-published table. Date predicates prune
    * partitions; the bucketed layout carries sid hash-partitioning into
    * downstream joins and windows. */
  def pricesTable(
      spark: SparkSession,
      table: String,
      q: PriceQuery = PriceQuery(),
      universeMembership: Option[DataFrame] = None): DataFrame =
    applyQuery(spark.table(table), resolve(q, universeMembership))

  /** S2: securities master — small dimension; callers wrap in
    * `broadcast()` at the join site. priceMagnifier/multiplier nulls
    * default to 1 (reference base.py:1899-1904). */
  def master(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("priceMagnifier", coalesce(col("priceMagnifier"), lit(1.0)))
      .withColumn("multiplier", coalesce(col("multiplier"), lit(1.0)))

  /** Infer the strategy timezone from the securities master when none is
    * set explicitly (reference base.py:1117-1125): exactly one distinct
    * master timezone infers; several raise the reference's error.
    * Driver-side distinct over the broadcast-sized dimension. */
  def inferTimezone(master: DataFrame, explicit: Option[String] = None): String =
    explicit.getOrElse {
      val tzs = master.select("timezone").distinct()
        .collect().map(_.getString(0)).filter(_ != null).sorted
      if (tzs.length > 1)
        throw new ParameterError(
          "cannot infer timezone because multiple timezones are present " +
            s"in data, please specify TIMEZONE explicitly (timezones: ${tzs.mkString(", ")})")
      require(tzs.nonEmpty,
        "cannot infer timezone: securities master has no timezone values")
      tzs.head
    }

  /** Append per-security NLV from a currency → equity map (reference
    * base.py:1117-1139): each security's currency selects its account
    * equity; CASH pairs use the Symbol's base currency ("EUR.USD" → EUR);
    * a currency with no NLV raises the reference's error. The per-sid
    * `nlv` column then drives min-commission floors (D8).
    * Validation is a driver-side distinct over the broadcast-sized
    * master. */
  def withNlv(master: DataFrame, nlvByCurrency: Map[String, Double]): DataFrame = {
    val currencyExpr =
      if (master.columns.contains("symbol"))
        when(col("secType") === "CASH",
          split(col("symbol"), "\\.").getItem(0)).otherwise(col("currency"))
      else col("currency")
    val required = master.select(currencyExpr.as("__c")).distinct()
      .collect().map(_.getString(0)).toSet
    val missing = required -- nlvByCurrency.keySet
    if (missing.nonEmpty)
      throw new ParameterError(
        "NLV dict is missing values for required currencies: " +
          missing.toSeq.sorted.mkString(", "))
    val nlvMap = map(nlvByCurrency.toSeq
      .flatMap { case (c, v) => Seq(lit(c), lit(v)) }: _*)
    master.withColumn("nlv", element_at(nlvMap, currencyExpr))
  }

  /** S3/S4/S5: tiny live-state tables (balances, FX rates, positions,
    * open orders) — plain reads; format chosen by extension. */
  def stateTable(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".json")) spark.read.json(path)
    else if (path.endsWith(".csv")) spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    else spark.read.parquet(path)

  /** S7 cached price fetch (reference base.py:1258-1279): the scan result
    * is cached keyed by (path, query); like the reference, an open-ended
    * query (no endDate = "give me up-to-date history") is invalidated
    * whenever the source dataset has been modified since caching, while a
    * bounded query trusts the cache; `noCache` bypasses entirely
    * (backtest(no_cache=True)). */
  def cachedPrices(
      spark: SparkSession,
      path: String,
      q: PriceQuery,
      cache: ResultCache,
      noCache: Boolean = false): DataFrame =
    if (noCache) prices(spark, path, q)
    else cache.getOrCompute(
      s"prices|$path|$q",
      dependsOn = if (q.endDate.isEmpty) Seq(path) else Nil) {
      prices(spark, path, q)
    }

  /** S7 result cache (reference _cache.py:59-184): parquet keyed by a
    * SHA-224 of the logical key, invalidated when any listed dependency
    * file is newer than the cached copy. Replaces pickle-on-/tmp with a
    * distributed-filesystem-friendly parquet directory + manifest. */
  final class ResultCache(spark: SparkSession, cacheDir: String) {

    private def keyHash(key: String): String =
      MessageDigest.getInstance("SHA-224")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString

    def getOrCompute(key: String, dependsOn: Seq[String] = Nil)(
        compute: => DataFrame): DataFrame = {
      val dir = Paths.get(cacheDir, keyHash(key))
      val okMarker = dir.resolve("_SUCCESS")
      val fresh = Files.exists(okMarker) && {
        val cachedAt = Files.getLastModifiedTime(okMarker).toMillis
        dependsOn.forall { dep =>
          val p = Paths.get(dep)
          !Files.exists(p) || Files.getLastModifiedTime(p).toMillis <= cachedAt
        }
      }
      if (fresh) spark.read.parquet(dir.toString)
      else {
        val df = compute
        // Atomic publish: write to a session-unique temp dir, then rename
        // into place. A crash mid-write leaves only an orphaned .tmp dir
        // (never a half-written entry that a later session would read as
        // valid-but-truncated), and two sessions racing on the same key
        // each write their own temp — whichever renames last wins, which
        // is the same last-writer-wins contract as mode("overwrite").
        val tmp = Paths.get(
          cacheDir, s".tmp-${keyHash(key)}-${java.util.UUID.randomUUID}")
        df.write.mode("overwrite").parquet(tmp.toString)
        deleteRecursively(dir) // stale entry (incl. marker-less wreckage)
        try
          Files.move(tmp, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // a concurrent writer published between our delete and move —
          // their entry is complete (rename is all-or-nothing); use it.
          // Linux surfaces rename-onto-nonempty-dir as ENOTEMPTY
          // (DirectoryNotEmptyException), not FileAlreadyExists.
          case _: java.nio.file.FileAlreadyExistsException |
              _: java.nio.file.DirectoryNotEmptyException =>
            deleteRecursively(tmp)
        }
        spark.read.parquet(dir.toString)
      }
    }

    private def deleteRecursively(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        val stream = Files.walk(p)
        try
          stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => Files.deleteIfExists(f))
        finally stream.close()
      }
  }
}
