package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`; multi-file dirs
  * work identically (`spark.read.parquet` globs natively — this is the
  * Spark-side equivalent of the reference's whole-bucket load,
  * `idr_pipeline_from_server/dags/idr_load.py:83-92`).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations, so the loader adapts to
    * whatever the footer declares instead of hard-coding one physical type.
    * NANOS is unreadable by Spark's vectorized reader without the legacy
    * nanosAsLong flag; the footer PROBE sets it save/restore-scoped, and
    * only a genuinely NANOS file sets it on the session (the reader needs
    * it again at execution) — MICROS/MILLIS callers' conf is never touched.
    * A NANOS column loads as LongType
    * (raw epoch-nanos) and is integer-truncated to µs — exactly what DuckDB
    * does internally (its TIMESTAMP is µs), with `div` (not `/ 1000`)
    * avoiding double-precision loss on epoch-nanos. MICROS/MILLIS columns
    * are untouched by the flag and load as a timestamp directly. Either way
    * the result is TIMESTAMP_NTZ at µs precision, matching the source's
    * isAdjustedToUTC=false and DuckDB's naive TIMESTAMP; session TZ is UTC
    * so wall-clock values are identical across all paths.
    */
  private val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  /** Run `body` with the legacy nanos flag set, then RESTORE the caller's
    * value — schema inference happens eagerly inside `load`, so the flag is
    * only needed for the duration of the probe. */
  private def probeWithNanosFlag[T](spark: SparkSession, body: => T): T = {
    val prev = spark.conf.getOption(NanosFlag)
    spark.conf.set(NanosFlag, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(NanosFlag, v)
      case None    => spark.conf.unset(NanosFlag)
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    // eventsRawTsType leaves the session flag set iff the file is NANOS —
    // which the scan below then needs at execution time
    eventsRawTsType(spark, dir) match {
      case LongType =>
        load(spark, dir, "events")
          .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampNTZType => load(spark, dir, "events")
      case _ =>
        load(spark, dir, "events").withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }

  /** The dtype the (flag-adjusted) parquet reader materializes for
    * `events.ts` — LongType when the footer says NANOS (legacy-flag path),
    * a timestamp type for MICROS/MILLIS. The streaming readers derive their
    * explicit `readStream` schemas and ts-decode expressions from THIS, so
    * batch and streaming can never disagree about the same file again
    * (r5 regression: five hard-coded LongType stream schemas silently read
    * micros as nanos after a testdata regen).
    */
  def eventsRawTsType(spark: SparkSession, dir: String): org.apache.spark.sql.types.DataType = {
    val t = probeWithNanosFlag(spark, load(spark, dir, "events").schema("ts").dataType)
    // A genuinely-NANOS file needs the flag again when the (batch or
    // streaming) scan EXECUTES, so it must outlive the probe — set it
    // persistently for this one physical shape only, logged. MICROS/MILLIS/
    // instant files never mutate caller conf.
    if (t == org.apache.spark.sql.types.LongType) {
      org.slf4j.LoggerFactory.getLogger("graft.Tables").info(
        s"events: NANOS-typed ts at $dir — setting $NanosFlag=true for this session " +
          "(required by the parquet reader at execution time)")
      spark.conf.set(NanosFlag, "true")
    }
    t
  }

  /** events schema for `readStream.schema(...)`, with `ts` typed per the
    * actual parquet footer (see [[eventsRawTsType]]). */
  def eventsRawSchema(tsType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** SQL expr decoding the raw streaming `ts` to a TIMESTAMP instant (what
    * watermarks require). Session TZ is UTC, so the wall-clock value equals
    * the batch loader's NTZ value on every path. */
  def eventsTsInstantExpr(tsType: org.apache.spark.sql.types.DataType): String =
    tsType match {
      case org.apache.spark.sql.types.LongType => "timestamp_micros(ts div 1000)"
      case _                                   => "cast(ts as timestamp)"
    }

  /** SQL expr decoding the raw streaming `ts` to integer epoch-µs (the
    * timer-session state machine keys on integer ms/µs, not timestamps). */
  def eventsTsMicrosExpr(tsType: org.apache.spark.sql.types.DataType): String =
    tsType match {
      case org.apache.spark.sql.types.LongType => "ts div 1000"
      case _ => "unix_micros(cast(ts as timestamp))"
    }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** EXACT row count from parquet FOOTER metadata — zero Spark jobs (r7
    * verdict #6): every parquet footer records per-row-group row counts,
    * so the count an ANN/banding auto-sizer needs is a metadata read, not
    * a cluster scan. Cached per path for the JVM lifetime (the testdata
    * tables are immutable); at 100 TB this is the same O(files) metadata
    * walk the manifest/catalog layer already does per query — never a data
    * pass. Use for `knownCount` parameters wherever the frame is a
    * straight table load (any filter/sample invalidates it — pass -1 and
    * let the operator count in that case).
    *
    * The walk is RECURSIVE (a hive-partitioned layout nests data files
    * under key=value directories; a flat listStatus would silently
    * undercount), skipping hidden (`_`/`.`) files and directories as
    * Spark's own file index does. The cache key is a digest of the whole
    * listing — every visible file's (path, mtime, length) plus the max
    * directory mtime observed — so a rewrite confined to nested partition
    * subdirectories (which leaves the ROOT mtime untouched) still
    * invalidates, as does a same-mtime-granularity rewrite that changes
    * file names or sizes. Stale keys for the same root are evicted on
    * insert, so repeated rewrites don't grow the cache without bound.
    * The walk itself is the same O(files) metadata listing a cache miss
    * needs anyway — the cache only ever saves the FOOTER reads.
    */
  private val rowCountCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def footerRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val root = fs.getFileStatus(p)
    var maxDirM = root.getModificationTime
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] = {
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Seq.empty
      else if (st.isDirectory) {
        maxDirM = math.max(maxDirM, st.getModificationTime)
        fs.listStatus(st.getPath).toSeq.flatMap(walk)
      } else Seq(st)
    }
    val files = if (root.isDirectory) fs.listStatus(p).toSeq.flatMap(walk)
                else Seq(root)
    val sig = files.sortBy(_.getPath.toString)
      .map(f => s"${f.getPath}:${f.getModificationTime}:${f.getLen}")
      .mkString("|")
    val key = s"$path@$maxDirM#${java.util.UUID.nameUUIDFromBytes(sig.getBytes("UTF-8"))}"
    val cached = rowCountCache.get(key)
    if (cached != null) cached.longValue()
    else {
      val cnt = files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
        try r.getRecordCount finally r.close()
      }.sum
      // evict superseded keys for this root OUTSIDE any map callback
      // (ConcurrentHashMap forbids mutating other mappings inside compute*)
      rowCountCache.keySet.removeIf(k => k.startsWith(s"$path@") && k != key)
      rowCountCache.put(key, cnt)
      cnt
    }
  }

  /** Test hook: number of live cache entries for a root path (eviction proof). */
  private[graft] def rowCountCacheKeysForTest(path: String): Int = {
    var n = 0
    rowCountCache.keySet.forEach(k => if (k.startsWith(s"$path@")) n += 1)
    n
  }

  /** [[footerRowCount]] for a named testdata table. */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long =
    footerRowCount(spark, s"$sfDir/$name.parquet")
}
