package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** HTTP-protocol external table — the reference's most-used external
  * protocol: `CREATE EXTERNAL TABLE ... LOCATION ('http://h/a', 'http://
  * h/b')` (`src/backend/access/external/url_curl.c`; the server half is
  * `src/bin/gpfdist/` — see [[GpfdistLite]]). PG/GP semantics: each URI
  * in the LOCATION list is fetched by exactly one segment, so the table
  * is the union of the URIs and parallelism = number of URIs. Spark
  * rendition: a DSv2 batch source with ONE INPUT PARTITION PER URL; each
  * partition streams its response body line-by-line ON THE EXECUTOR (the
  * driver never sees a byte of data — no buffering of the whole body).
  *
  * Row parsing and error handling are the shared delimited-external
  * contract ([[SrehLineParser]], cdbsreh.c): malformed lines divert to a
  * per-partition reject file, the scan fails past `reject_limit`, and a
  * non-200 response or connect failure FAILS the scan (url_curl.c errors
  * the same way — an unreachable URL must not read as an empty table).
  * Transient connect failures retry with backoff (`retries`, default 3 —
  * url_curl.c's retry loop).
  *
  * Options: `urls` (comma-separated), `columns` (`"n bigint, s string"`),
  * `delimiter` (default `|`), `compression` (`gzip` — url_curl.c handles
  * Content-Encoding the same way), `reject_limit`, `reject_dir`,
  * `retries`, `timeout_ms`.
  *
  * Scale: embarrassingly parallel (one connection per partition, streamed
  * decode), no shuffle, no driver materialization; to saturate a
  * 1000-executor cluster the LOCATION list carries many URLs (exactly how
  * gpfdist deployments shard: N gpfdist daemons × M files each).
  */
class HttpSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExecSource.parseColumns(options.getOrDefault("columns", "line string"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val urls = opts.getOrDefault("urls", "").split(",").map(_.trim).filter(_.nonEmpty)
    require(urls.nonEmpty, "http source requires at least one url in `urls`")
    new HttpTable(
      ExecSource.parseColumns(opts.getOrDefault("columns", "line string")),
      urls,
      opts.getOrDefault("delimiter", "|"),
      opts.getOrDefault("compression", ""),
      opts.getOrDefault("reject_limit", "0").toInt,
      Option(opts.get("reject_dir")),
      opts.getOrDefault("retries", "3").toInt,
      opts.getOrDefault("timeout_ms", "15000").toInt)
  }
}

private[sources] class HttpTable(schema0: StructType, urls: Array[String],
                                 delimiter: String, compression: String,
                                 rejectLimit: Int, rejectDir: Option[String],
                                 retries: Int, timeoutMs: Int)
  extends Table with SupportsRead {
  override def name(): String = s"http(${urls.length} urls)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpScanBuilder(schema0, urls, delimiter, compression, rejectLimit,
      rejectDir, retries, timeoutMs)
}

private[sources] class HttpScanBuilder(full: StructType, urls: Array[String],
                                       delimiter: String, compression: String,
                                       rejectLimit: Int, rejectDir: Option[String],
                                       retries: Int, timeoutMs: Int)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new HttpScan(full, required, urls, delimiter, compression, rejectLimit,
      rejectDir, retries, timeoutMs)
}

private[sources] class HttpScan(full: StructType, required: StructType,
                                urls: Array[String], delimiter: String,
                                compression: String, rejectLimit: Int,
                                rejectDir: Option[String], retries: Int,
                                timeoutMs: Int)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"HttpScan urls=${urls.length} cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    urls.zipWithIndex.map { case (u, i) => HttpPartition(i, u) }.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpReaderFactory(full, required, delimiter, compression, rejectLimit,
      rejectDir, retries, timeoutMs)
}

private[sources] case class HttpPartition(id: Int, url: String) extends InputPartition

private[sources] class HttpReaderFactory(schema0: StructType, required: StructType,
                                         delimiter: String, compression: String,
                                         rejectLimit: Int, rejectDir: Option[String],
                                         retries: Int, timeoutMs: Int)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HttpPartition]
    new PartitionReader[InternalRow] {
      private var conn: java.net.HttpURLConnection = _
      private var lines: java.io.BufferedReader = _
      private var row: InternalRow = _
      private val sreh =
        new SrehLineParser(schema0, required, delimiter, rejectLimit, rejectDir, p.id)

      private def connect(): Unit = {
        var attempt = 0
        var lastErr: Throwable = null
        while (lines == null && attempt <= retries) {
          try {
            val c = new java.net.URI(p.url).toURL.openConnection()
              .asInstanceOf[java.net.HttpURLConnection]
            c.setConnectTimeout(timeoutMs)
            c.setReadTimeout(timeoutMs)
            // the reference identifies segments via X-GP-* headers
            // (url_curl.c builds them from GpIdentity); same contract
            c.setRequestProperty("X-GRAFT-SEGMENT-ID", p.id.toString)
            val code = c.getResponseCode
            if (code != 200) {
              c.disconnect()
              throw new IllegalStateException(
                s"http source GET ${p.url} returned $code in partition ${p.id}")
            }
            val raw = c.getInputStream
            val in =
              if (compression.equalsIgnoreCase("gzip") ||
                  "gzip".equalsIgnoreCase(c.getContentEncoding))
                new java.util.zip.GZIPInputStream(raw)
              else raw
            conn = c
            lines = new java.io.BufferedReader(
              new java.io.InputStreamReader(in, "UTF-8"))
          } catch {
            // a definitive HTTP status is not retriable; connect/IO is
            case e: IllegalStateException => throw e
            case e: java.io.IOException =>
              lastErr = e
              attempt += 1
              if (attempt <= retries) Thread.sleep(100L * attempt)
          }
        }
        if (lines == null)
          throw new IllegalStateException(
            s"http source failed to connect to ${p.url} after ${retries + 1} attempts", lastErr)
      }

      override def next(): Boolean = {
        if (lines == null) connect()
        var line = lines.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            row = sreh.parse(line)
            if (row != null) return true
          }
          line = lines.readLine()
        }
        false
      }

      override def get(): InternalRow = row

      override def close(): Unit = {
        sreh.flush()
        if (lines != null) lines.close()
        if (conn != null) conn.disconnect()
      }
    }
  }
}

/** Minimal in-process gpfdist — the server half of the reference's HTTP
  * external-table surface (`src/bin/gpfdist/gpfdist.c`: an HTTP daemon
  * that serves flat files from a root directory to segments). Serves GET
  * requests rooted at a directory over a JDK HttpServer on an ephemeral
  * port; `.gz` files are served with `Content-Encoding: gzip` (gpfdist
  * does the same for pre-compressed files). One daemon per JVM per root,
  * kept for the JVM's lifetime (like a real gpfdist deployment, it
  * outlives any one query).
  *
  * This is a test/dev harness for [[HttpSource]] — production points the
  * LOCATION list at real gpfdist daemons or any HTTP server.
  */
object GpfdistLite {
  private val servers = scala.collection.concurrent.TrieMap.empty[String, Int]

  /** Start (or reuse) a daemon serving `root`; returns its port. */
  def ensure(root: String): Int = synchronized {
    servers.getOrElseUpdate(java.nio.file.Paths.get(root).toAbsolutePath.toString, {
      val rootPath = java.nio.file.Paths.get(root).toAbsolutePath.normalize()
      java.nio.file.Files.createDirectories(rootPath)
      // HttpServer.start() spawns its dispatcher from the CALLING thread
      // and inherits its daemon flag — start from a daemon thread so the
      // server never pins the JVM open after Verify/Bench finish
      val portF = new java.util.concurrent.CompletableFuture[Integer]()
      val starter = new Thread(() => {
        try {
          val srv = com.sun.net.httpserver.HttpServer.create(
            new java.net.InetSocketAddress("127.0.0.1", 0), 0)
          srv.createContext("/", new com.sun.net.httpserver.HttpHandler {
            override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
              try {
                val rel = ex.getRequestURI.getPath.stripPrefix("/")
                val f = rootPath.resolve(rel).normalize()
                // refuse path escapes and missing files with 404 (gpfdist 404s too)
                if (!f.startsWith(rootPath) || !java.nio.file.Files.isRegularFile(f)) {
                  ex.sendResponseHeaders(404, -1)
                } else {
                  val bytes = java.nio.file.Files.readAllBytes(f)
                  if (rel.endsWith(".gz"))
                    ex.getResponseHeaders.set("Content-Encoding", "gzip")
                  ex.sendResponseHeaders(200, bytes.length.toLong)
                  ex.getResponseBody.write(bytes)
                }
              } finally ex.close()
            }
          })
          srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
            val t = new Thread(r, "gpfdist-lite"); t.setDaemon(true); t
          }))
          srv.start()
          portF.complete(srv.getAddress.getPort)
        } catch { case e: Throwable => portF.completeExceptionally(e) }
      }, "gpfdist-lite-starter")
      starter.setDaemon(true)
      starter.start()
      portF.get(10, java.util.concurrent.TimeUnit.SECONDS).intValue()
    })
  }
}
