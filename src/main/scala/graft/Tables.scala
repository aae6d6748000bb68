package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Reference semantics: RDW's warehouse tables (exams, students, orgs —
  * see /root/reference/docs/Architecture.md) map onto the TPC-H-ish star
  * schema here: org hierarchy → region/nation, students → customer,
  * assessments → part, exam results → orders/lineitem, event stream →
  * events (SURVEY.md §1).
  *
  * Scale note: these are plain parquet scans so Catalyst pushes filters
  * and prunes columns into the file source; at cluster scale the same
  * loaders work unchanged against a partitioned table root because the
  * path is the only binding.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns every table must expose — enforced at load so a schema
    * drift in the source fails fast with a clear message instead of an
    * AnalysisException deep inside some query. */
  val expectedColumns: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  private def checked(name: String, df: DataFrame): DataFrame = {
    val missing = expectedColumns.getOrElse(name, Nil).filterNot(df.columns.contains)
    require(missing.isEmpty, s"table $name is missing expected columns: $missing")
    df
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else checked(name, spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Register every table as a temp view (plus graft's native SQL
    * functions), making the whole engine reachable from `spark.sql`:
    *
    *   Tables.registerAll(spark, sfDir)
    *   spark.sql("SELECT minhash_shingles(text, 8, 32) FROM documents")
    *
    * Views are lazy — each still plans as a plain pushdown-friendly
    * parquet scan (events keeps its ns→µs loader semantics). */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
    org.apache.spark.sql.graftbridge.SqlBridge.registerGraftFunctions(spark)
  }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS). How Spark surfaces that
    * column shifted across engine versions, so the loader dispatches on
    * the schema it actually got instead of assuming one read mode:
    *
    *   - `LongType` (legacy `nanosAsLong` read mode): epoch-nanos —
    *     convert via integral `ts DIV 1000` (not `/`: ~1.7e18 nanos
    *     overflows double precision) into a µs TimestampType.
    *   - `TimestampNTZType` (Spark 4.1+ native NANOS read): the engine
    *     already truncated nanos→µs; cast to TimestampType. Every graft
    *     session pins `spark.sql.session.timeZone=UTC`, so the cast
    *     reinterprets the wall clock as a UTC instant — the identical µs
    *     values DuckDB reads from the same file.
    *   - `TimestampType`: already the contract — pass through.
    *
    * The generator emits whole-microsecond values, so every path is
    * lossless; TablesSpec pins both the type AND a known first-row µs
    * value against future read-mode drift. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = eventsRaw(s, d)
    val converted = raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: TimestampNTZType =>
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events loader requires spark.sql.session.timeZone=UTC for a lossless NTZ→instant cast")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case other =>
        throw new IllegalStateException(s"events.ts loaded as unexpected type $other")
    }
    checked("events", converted)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Row count from parquet footer metadata: a driver-side footer read
    * per file — no Spark job, no data scan. Index builds (IVF list
    * sizing, training-sample caps) need only the corpus cardinality at
    * planning time; a full `count()` would launch a cluster-wide scan
    * per query for a number the file footers already hold. */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // recursive: partitioned datasets nest their files under
    // key=value directories
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    if (fs.getFileStatus(p).isFile) files += fs.getFileStatus(p)
    else {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) files += f
      }
    }
    // fail fast: a silent 0 would make trainingSample pass the WHOLE
    // corpus to a fit (n <= cap) — the exact failure the cap prevents
    require(files.nonEmpty, s"no parquet files under $path — cannot derive row count")
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Embeddings cardinality via footer metadata (no scan). */
  def embeddingsCount(s: SparkSession, d: String): Long =
    parquetRowCount(s, s"$d/embeddings.parquet")

  /** Documents cardinality via footer metadata (no scan). */
  def documentsCount(s: SparkSession, d: String): Long =
    parquetRowCount(s, s"$d/documents.parquet")
}
