package graft.ingest

import graft.schema.GreenTaxi
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Strictly-validated CSV → typed DataFrame ingest with the semantics of the
  * reference's part 1 (/root/reference/01.py:168-240), re-expressed as a
  * distributed Spark pipeline:
  *
  *   S2 header validation — driver reads ONLY the first line via Hadoop FS
  *      (no whole-file buffering, unlike the reference's BytesIO at
  *      01.py:255-258 which holds the dataset in RAM twice and would not
  *      survive 100 TB).
  *   S3 blank-line skip — `length(trim(value)) > 0` filter.
  *   S4 row normalization — rows with >20 fields keep the first 20
  *      (trailing-empty truncation, regex identical in spirit to
  *      01.py:154-157); rows with <20 fields FAIL the job (strict mode),
  *      mirroring InvalidDataError (01.py:164-165, 200-203).
  *   S5 typed parse — from_csv with an all-string schema, then per-column
  *      casts: Y/N → boolean (Arrow true_values/false_values,
  *      01.py:215-221 — Spark CSV has no such option, so it is expression
  *      level), '' → null, decimals parsed exactly (no double detour),
  *   S6 naive timestamps attributed to America/New_York and stored as UTC
  *      instants (01.py:71-86).
  *
  * Everything after the one-line header read is executor-side and scales
  * with input splits; the strict-validation counts are computed in the same
  * job graph (no extra pass over the raw text).
  */
object Ingest {

  final class InvalidHeaderException(msg: String) extends RuntimeException(msg)
  final class InvalidDataException(msg: String) extends RuntimeException(msg)

  /** First `NumColumns` comma-separated fields; empty match ⇒ malformed. */
  private[graft] val RowRegex = s"\\A((?:[^,]*,){${GreenTaxi.NumColumns - 1}}[^,\\r\\n]*)"

  /** S1 remote leg: stream an HTTP(S) URL to a local file and return its
    * `file:` URI, mirroring the reference's smart-open HTTPS entry point
    * (/root/reference/01.py:168-205, URL at 01.py:247-250) without its
    * in-memory buffering: `BodyHandlers.ofFile` copies the socket straight
    * to disk, so peak memory is a socket buffer regardless of body size.
    * This is deliberately a *driver-side* fetch — an HTTPS endpoint is a
    * single byte stream with no split points, so there is nothing to
    * distribute; the 100 TB path is object-store URIs that `ingest` reads
    * directly as splittable Hadoop-FS paths. */
  def fetchToLocal(url: String): String = {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .build()
    // Overall request timeout: a stalled server must fail the job, not
    // hang it. Generous because the body is a full dataset.
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMinutes(30))
      .GET().build()
    val dest = java.nio.file.Files.createTempFile("graft-ingest-", ".csv")
    dest.toFile.deleteOnExit() // staging copy, not a product of the job
    try {
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofFile(dest))
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"GET $url returned HTTP ${resp.statusCode()}")
      dest.toUri.toString
    } catch {
      case e: Throwable =>
        // a timeout/reset mid-body must not strand a partial download
        java.nio.file.Files.deleteIfExists(dest)
        throw e
    }
  }

  /** S1+S2–S6: ingest directly from an HTTP(S) URL (reference parity with
    * 01.py's default invocation). */
  def ingestUrl(spark: SparkSession, url: String, strict: Boolean = true): DataFrame =
    ingest(spark, fetchToLocal(url), strict)

  /** Scheme-dispatching entry point — the smart-open parity surface
    * (/root/reference/01.py:168-181 accepts http(s)/s3/gs/file paths
    * uniformly). Dispatch:
    *   - `http:`/`https:` — single unsplittable byte stream, so it is
    *     staged driver-side via [[fetchToLocal]] and read locally;
    *   - `s3:` — rewritten to Hadoop's `s3a:` (the maintained S3
    *     connector scheme; smart-open's `s3://bucket/key` and Hadoop's
    *     `s3a://bucket/key` name the same object), then read as a
    *     SPLITTABLE distributed source — unlike HTTP, object-store reads
    *     scale out, which is the 100 TB ingest path;
    *   - everything else (`gs:`, `abfss:`, `hdfs:`, `file:`, bare paths)
    *     — handed to the mounted Hadoop FileSystem as-is.
    * Object-store schemes require their connector jars on the classpath
    * (hadoop-aws / gcs-connector); without them Hadoop fails fast with
    * "No FileSystem for scheme" — an environment gap, not a code path
    * gap, and the error names the missing piece. */
  def ingestAny(spark: SparkSession, uri: String, strict: Boolean = true): DataFrame = {
    // The scheme is detected by RFC 3986 shape (case-insensitively), NOT
    // by java.net.URI parsing: an s3 key or URL path may contain
    // URI-illegal characters (spaces are legal in S3 object keys) and
    // must still dispatch by its scheme, while a bare local path — no
    // scheme-like prefix at all — dispatches as a plain path.
    val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):".r.unanchored
    val scheme = SchemeRe.findPrefixMatchOf(uri).map(_.group(1).toLowerCase)
    scheme match {
      case Some("http") | Some("https") => ingestUrl(spark, uri, strict)
      case Some("s3") =>
        ingest(spark, "s3a:" + uri.substring(uri.indexOf(':') + 1), strict)
      case _ => ingest(spark, uri, strict)
    }
  }

  /** S2: read just the first line of the file (driver-side, bounded I/O). */
  def readHeaderLine(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      Option(reader.readLine()).getOrElse("")
    } finally in.close()
  }

  def validateHeader(headerLine: String): Unit = {
    val fields = headerLine.split(",", -1).toSeq
    if (fields != GreenTaxi.CsvHeader)
      throw new InvalidHeaderException(
        s"header mismatch: expected ${GreenTaxi.CsvHeader.mkString(",")} got $headerLine")
  }

  /** Y/N → boolean; any other non-null value is invalid (checked in strict
    * mode). '' was already nullified by from_csv's nullValue handling. */
  private def ynBool(c: Column): Column =
    when(c === "Y", lit(true)).when(c === "N", lit(false)).otherwise(lit(null).cast(BooleanType))

  private def typed(name: String, dt: DataType, c: Column): Column = (dt match {
    case BooleanType => ynBool(c)
    case TimestampType =>
      // Parse the naive string in the source zone, producing a UTC instant:
      // to_utc_timestamp reinterprets the NTZ wall-clock as NY local time.
      to_utc_timestamp(to_timestamp_ntz(c, lit(GreenTaxi.TimestampFormat)),
        GreenTaxi.SourceTimeZone)
    case dt => c.cast(dt)
  }).as(name)

  /** Full ingest: raw CSV path → typed DataFrame (S1–S6). */
  def ingest(spark: SparkSession, path: String, strict: Boolean = true): DataFrame = {
    validateHeader(readHeaderLine(spark, path))

    val raw = spark.read.text(path)
    val headerLit = GreenTaxi.CsvHeader.mkString(",")
    val dataLines = raw
      .filter(length(trim(col("value"))) > 0)       // S3 blank lines
      .filter(col("value") =!= headerLit)           // drop header row
    val normalized = dataLines
      .select(regexp_extract(col("value"), RowRegex, 1).as("line"))

    if (strict) {
      // InvalidDataError analog: any non-blank row that did not yield
      // exactly NumColumns fields aborts the job. One count over the same
      // scan (Spark re-reads, but no driver buffering).
      val bad = normalized.filter(col("line") === "").count()
      if (bad > 0)
        throw new InvalidDataException(s"$bad row(s) with fewer than ${GreenTaxi.NumColumns} fields")
    }

    val rawSchema = StructType(GreenTaxi.Columns.map(StructField(_, StringType, nullable = true)))
    val parsed = normalized.select(
      from_csv(col("line"), rawSchema,
        Map("nullValue" -> "", "quote" -> "", "mode" -> "FAILFAST")).as("r"))

    val typedCols = GreenTaxi.Columns.zip(GreenTaxi.ColumnTypes).map {
      case (n, dt) => typed(n, dt, col(s"r.$n"))
    }
    val out = parsed.select(typedCols: _*)

    if (strict) {
      // Y/N-domain check (Arrow errors on unexpected boolean tokens).
      val flagRaw = parsed.select(col("r.Store_and_fwd_flag").as("f"))
      val badFlags = flagRaw.filter(col("f").isNotNull && col("f") =!= "Y" && col("f") =!= "N").count()
      if (badFlags > 0)
        throw new InvalidDataException(s"$badFlags invalid Store_and_fwd_flag value(s)")
    }
    out
  }

  /** S7: parquet sink (single file like the reference's golden output —
    * coalesce(1) is ONLY for golden-parity; at scale, drop it). */
  def writeParquet(df: DataFrame, outPath: String, singleFile: Boolean = false): Unit = {
    val target = if (singleFile) df.coalesce(1) else df
    target.write.mode("overwrite").parquet(outPath)
  }

  /** The 100 TB strict path: ingest + validate + write in ONE pass.
    *
    * `ingest(strict = true)` above runs two extra counting jobs, i.e. three
    * scans of the raw text — fine at golden-file scale, wrong at 100 TB.
    * Here the validation counters ride on `Dataset.observe` (accumulator
    * metrics computed DURING the write job), so the raw text is read
    * exactly once; if any malformed row or boolean token was seen, the
    * just-written output is deleted and the job fails with the same
    * exceptions as the multi-pass path.
    */
  def ingestAndWriteSinglePass(spark: SparkSession, path: String,
      outPath: String): Unit = {
    validateHeader(readHeaderLine(spark, path))

    val headerLit = GreenTaxi.CsvHeader.mkString(",")
    val normalized = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .filter(col("value") =!= headerLit)
      .select(regexp_extract(col("value"), RowRegex, 1).as("line"))

    val rawSchema = StructType(GreenTaxi.Columns.map(StructField(_, StringType, nullable = true)))
    // PERMISSIVE here (not FAILFAST): a failed regex extract leaves an
    // empty line that FAILFAST would explode on mid-job with a raw
    // SparkException; the observe counters are the strictness gate and
    // produce the same typed error AFTER the single pass completes.
    val parsed = normalized.select(
      col("line"),
      from_csv(col("line"), rawSchema,
        Map("nullValue" -> "", "quote" -> "", "mode" -> "PERMISSIVE")).as("r"))

    val typedCols = GreenTaxi.Columns.zip(GreenTaxi.ColumnTypes).map {
      case (n, dt) => typed(n, dt, col(s"r.$n"))
    }
    val flag = col("r.Store_and_fwd_flag")
    val obs = new org.apache.spark.sql.Observation("ingest_validation")
    val out = parsed
      .observe(obs,
        sum(when(col("line") === "", 1L).otherwise(0L)).as("bad_rows"),
        sum(when(flag.isNotNull && flag =!= "Y" && flag =!= "N", 1L)
          .otherwise(0L)).as("bad_flags"))
      .select(typedCols: _*)

    out.write.mode("overwrite").parquet(outPath)

    val m = obs.get
    val badRows = m("bad_rows").asInstanceOf[Long]
    val badFlags = m("bad_flags").asInstanceOf[Long]
    if (badRows > 0 || badFlags > 0) {
      // poison output must not survive a failed validation
      val p = new org.apache.hadoop.fs.Path(outPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      if (badRows > 0)
        throw new InvalidDataException(
          s"$badRows row(s) with fewer than ${GreenTaxi.NumColumns} fields")
      throw new InvalidDataException(s"$badFlags invalid Store_and_fwd_flag value(s)")
    }
  }
}
