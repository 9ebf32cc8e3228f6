package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central accessors for the driver's synthetic parquet corpus
  * (`/root/testdata/sf*`, see TESTDATA.md). One function per table so every
  * query reads through the same normalization (notably the ns-precision
  * `events.ts`).
  *
  * Scale notes: each accessor is a plain parquet scan — Catalyst handles
  * column pruning + predicate pushdown, so callers should express filters on
  * the returned DataFrame and NOT pre-collect. At 100 TB the same accessors
  * work unchanged; only partition sizing (`spark.sql.files.maxPartitionBytes`)
  * changes.
  */
object Tables {
  // memoized per (session, path): each spark.read.parquet call re-lists
  // the file and re-reads the footer (~80 ms measured) — 50+ registry
  // queries × 1-3 tables adds seconds of pure listing. The analyzed
  // DataFrame is immutable, so caching it is the engine's "metastore".
  // Weakly keyed by session, and the DataFrames are held through
  // SoftReferences: a cached DataFrame strongly references its session, so
  // a strongly-held value would keep its own WeakHashMap key reachable and
  // no entry could ever be evicted. Soft values break that cycle — under
  // memory pressure the JVM clears them (a re-read is just the ~80 ms
  // listing), after which a stopped session's key really is collectible.
  // Caveat, like any metastore cache: the file listing snapshots at first
  // access — correct for the read-only corpus, not for tables rewritten
  // mid-session. The get-then-put below is deliberately NOT atomic: two
  // concurrent first readers may both miss and both run the ~80 ms
  // listing; DataFrames are immutable so last-write-wins is benign, and a
  // putIfAbsent loop would buy nothing but code.
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, java.lang.ref.SoftReference[DataFrame]]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap
          .empty[String, java.lang.ref.SoftReference[DataFrame]]
        cache.put(spark, m)
      }
      m
    }
    val path = s"$dir/$name.parquet"
    val raw = Option(perSession.get(path).orNull).flatMap(r => Option(r.get)) match {
      case Some(df) => df
      case None =>
        val df = spark.read.parquet(path)
        perSession.put(path, new java.lang.ref.SoftReference(df))
        df
    }
    // OPT-IN session table cache (`spark.graft.cacheTables=true`, set by
    // Bench): the single-row-group bench corpus pins every parquet scan
    // to ONE task, while DuckDB decodes a row group with all cores AND
    // rides the OS page cache across its 78 oracle queries. Caching the
    // hot tables in-memory is Spark's standard answer for a session
    // running a suite over the same tables (spark.catalog.cacheTable) —
    // the in-memory columnar scan is parallel, restoring symmetry.
    // Default OFF: Verify, tests and library users keep cold parquet
    // scans, so predicate-pushdown/pruning plans (PlanSpec) and the
    // production posture are unchanged; at 100 TB you do not cache a
    // fact table, and nothing here does so implicitly.
    if (spark.conf.getOption("spark.graft.cacheTables").contains("true"))
      Caches.sharedIndex(spark, s"table:$path") {
        // persist PARALLEL, but SIZE-PROPORTIONAL: caching the 1-task
        // scan as-is would pin every cached read to one partition, while
        // always fanning to all cores makes every small join pay ~cores
        // task launches per stage (measured: q11/q57/q39-class lost
        // 0.2-0.4 s each at 32 cached partitions). ~1 MB per cached
        // partition, capped at the core count; tiny dims stay as-is.
        val cores = spark.sparkContext.defaultParallelism
        // `File.length` on a DIRECTORY (Spark-written parquet — part
        // files under a dir, e.g. ScaleCheck's scaled corpus) returns
        // the ~4 KiB dirent size, which computes parts=0 and silently
        // leaves the cache at the serial scan's partitioning. Sum the
        // contained data files instead.
        val bytes = {
          val f = new java.io.File(path)
          if (f.isDirectory)
            Option(f.listFiles).map(_.filter(_.isFile).map(_.length).sum)
              .getOrElse(0L)
          else f.length
        }
        val parts = math.min(cores.toLong, bytes >> 20).toInt
        if (parts >= 2) raw.repartition(parts) else raw
      }
    else raw
  }

  /** Fan a SMALL scan out to the session's default parallelism before
    * CPU-heavy per-row work (hashing every shingle / word). A parquet
    * file below the split threshold — or with a single row group, like
    * the bench corpus — plans as ONE task, serializing everything
    * downstream of it onto one core (measured 2.5× on the shingle+md5
    * pipeline). At cluster scale the scan already carries ≥ cores
    * partitions and this is the IDENTITY — the probe inspects the planned
    * RDD without running a job — so the 100 TB path never pays the extra
    * shuffle. Callers should project the needed columns FIRST so the
    * round-robin exchange moves only those.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (plannedPartitions(df) < cores) df.repartition(cores) else df
  }

  // The probe (`df.rdd.getNumPartitions`) forces physical planning + RDD
  // DAG construction — ~10–40 ms per call, and fanOut sits under 11 query
  // builders that Bench re-invokes every pass. The planned partition count
  // is a pure function of the canonicalized plan (same files, same
  // maxPartitionBytes), so memoize per (session, semanticHash). The key is
  // an Int, not the plan itself: a held plan would strongly reference its
  // session and pin the WeakHashMap entry (same cycle Tables.cache breaks
  // with soft refs). A semanticHash collision would only mis-skip the
  // fan-out (perf, never correctness) and is vanishingly unlikely within
  // one session's query set.
  private val fanOutCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[Int, Int]]()

  private def plannedPartitions(df: DataFrame): Int = {
    val perSession = fanOutCache.synchronized {
      var m = fanOutCache.get(df.sparkSession)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[Int, Int]
        fanOutCache.put(df.sparkSession, m)
      }
      m
    }
    perSession.getOrElseUpdate(
      df.queryExecution.analyzed.canonicalized.semanticHash(),
      df.rdd.getNumPartitions)
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Normalize an events frame's `ts` to the canonical pair every consumer
    * sees — `ts`: TimestampType (µs, UTC session) and `ts_ns`: long nanos
    * since epoch — regardless of the on-disk representation. The driver's
    * generator has shipped the column both as parquet TIMESTAMP(NANOS)
    * (reads as long under `spark.sql.legacy.parquet.nanosAsLong`) and as
    * TIMESTAMP(MICROS) (reads as timestamp / timestamp_ntz); both land on
    * the identical derived schema, so a corpus regeneration cannot change
    * query output types. Pure projection — works on streaming frames too.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          // integer `div`, NOT `/`: Spark's `/` is double division, and
          // ~1.7e18 ns exceeds the 53-bit exact double range —
          // floor(ns/1000.0) can be off by 1µs near microsecond boundaries
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall times are UTC by corpus convention, but a bare
        // NTZ→TZ cast binds the SESSION zone — on a non-UTC
        // externally-built session that would shift every instant by
        // the zone offset relative to the nanos representation. Compute
        // epoch micros as pure WALL arithmetic instead (NTZ − NTZ epoch
        // is zone-free on any session), then derive the instant from
        // those micros — no session-zone binding anywhere (pinned for
        // UTC vs America/New_York in TablesSpec).
        raw.withColumn("ts_ns",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            * lit(1000L))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        // TimestampType: already an absolute instant (parquet
        // isAdjustedToUTC) — unix_micros is session-tz-independent
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }

  /** Events table with the canonical (`ts`, `ts_ns`) schema — see
    * [[normalizeEventTs]]. Truncation to µs matches DuckDB's
    * `ts::TIMESTAMP` cast on the nanos representation.
    *
    * The nanosAsLong conf SHOULD be set at SparkSession build time (all
    * in-repo entry points do); for externally-built sessions this accessor
    * self-heals by setting the runtime-settable conf — a DOCUMENTED
    * session-wide side effect, preferred over failing every events-reading
    * query when the corpus carries TIMESTAMP(NANOS) (without the conf that
    * read throws at schema inference, so nanos are never silently misread).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }
}
