package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Directory tables — Cloudberry's managed-file-catalog relation
  * (`src/backend/catalog/pg_directory_table.c`, the feature's own
  * catalog; `src/backend/commands/dirtablecmds.c:270` builds the
  * `directory_table()` SRF tuple {scoped_file_url, relative_path, tag,
  * size, last_modified, md5, content}; `src/backend/commands/
  * copyfrom.c:887` "Copy From file to directory table" assembles the
  * file location and records {relative_path, size, last_modified, md5,
  * tag} in the catalog row; grammar at `src/backend/parser/gram.y:9045`
  * CREATE DIRECTORY TABLE, `:5095` COPY BINARY DIRECTORY TABLE, with
  * the per-file `tag` COPY option at `src/backend/commands/copy.c:868`).
  *
  * The reference stores each uploaded file in a tablespace (local FS or
  * object store via the ufile FileAm) and keeps one catalog row per
  * file, distributed by `relative_path`; `SELECT * FROM
  * directory_table(t)` streams file CONTENT next to the metadata, and
  * utility calls (`remove_file`) mutate catalog + storage together.
  *
  * Spark-first rendition:
  *  - the CATALOG is a parquet relation {relative_path, tag, size,
  *    mtime_epoch, md5} — exactly the reference's five metadata
  *    columns;
  *  - BULK upload (the gpdirtableload path) is a distributed
  *    `mapPartitions` over the source relation: every executor writes
  *    its slice of files straight to the SHARED store and emits the
  *    catalog rows — content never moves through the driver, so upload
  *    bandwidth scales with the cluster exactly like the reference's
  *    per-segment ufile writes. All storage I/O (upload, COPY,
  *    remove_file, the doc-7 glob) goes through the Hadoop
  *    `FileSystem` API resolved from the table root's scheme — the
  *    ufile-FileAm analog: the same code writes file:/, hdfs:/ or
  *    s3a:/ roots, and executors open the FS from a broadcast Hadoop
  *    conf rather than touching their local disk (which on a real
  *    cluster the driver-side read could never see);
  *  - the `directory_table()` READ is Spark's `binaryFile` source (one
  *    row per file: path, length, modificationTime, content) joined to
  *    the broadcast catalog — the content relation STREAMS, so a 100 TB
  *    directory scan is one pass with no shuffle;
  *  - single-statement ops run through a parsed DDL/utility text
  *    front-end: CREATE DIRECTORY TABLE, COPY BINARY DIRECTORY TABLE
  *    't' 'rel' FROM 'file' WITH (tag '…'), SELECT remove_file(t, p).
  *
  * Determinism for the cross-engine oracle: file mtimes are SET at
  * upload (epoch base + doc_id — the reference records upload time;
  * any fixed clock works) and md5/size derive from content, so DuckDB
  * re-derives every catalog column from `documents` alone.
  */
object DirTable {

  private val EpochBase = 1600000000L
  private val ReadmeEpoch = EpochBase + 100000L

  /** Fixed content for the single-file COPY demonstration. Kept free of
    * quotes so the identical literal rides inside the oracle SQL. */
  val ReadmeText: String =
    "graft directory table demo\nmanaged file storage catalog\n"

  private val CreateRe =
    """(?is)^\s*CREATE\s+DIRECTORY\s+TABLE\s+(\w+)\s*;?\s*$""".r
  private val CopyRe =
    ("""(?is)^\s*COPY\s+BINARY\s+DIRECTORY\s+TABLE\s+(\w+)\s+'([^']+)'\s+""" +
      """FROM\s+'([^']+)'(?:\s+WITH\s*\(\s*tag\s+'([^']*)'\s*\))?\s*;?\s*$""").r
  private val RemoveRe =
    """(?is)^\s*SELECT\s+remove_file\s*\(\s*'(\w+)'\s*,\s*'([^']+)'\s*\)\s*;?\s*$""".r

  private def md5hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  /** Write one file via the Hadoop FS, stamping the catalog mtime. */
  private def putFile(fs: FileSystem, p: Path, bytes: Array[Byte],
      mtimeEpoch: Long): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
    fs.setTimes(p, mtimeEpoch * 1000L, -1L)
  }

  /** One directory-table build per (JVM, sf dir) — later queries and
    * bench re-runs reuse the layout, like GpDdl.create's build-once. */
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def rootFor(dir: String): String =
    s"target/derived/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/dirtable_doc_store"

  /** The table's file store as a FULLY-QUALIFIED Hadoop path (scheme
    * included), plus its FileSystem — executors re-resolve the same URI
    * against the shipped conf, so driver and executors always address
    * one shared store. */
  private def filesFs(s: SparkSession, root: String): (FileSystem, Path) = {
    val raw = new Path(root, "files")
    val fs = raw.getFileSystem(s.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(raw))
  }

  /** Build the directory table: bulk-upload `documents`, then run the
    * parsed single-statement ops (CREATE / COPY one staged file with a
    * tag / remove_file on doc 7's file). Returns the table root. */
  private def setup(s: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, { _ =>
      val root = rootFor(dir)
      val (fs0, filesQual) = filesFs(s, root)
      val rootQual = fs0.makeQualified(new Path(root))
      if (fs0.exists(rootQual)) fs0.delete(rootQual, true)

      // CREATE DIRECTORY TABLE (gram.y:9045) — parsed, names the table
      val tableName = exec(s, root, "CREATE DIRECTORY TABLE doc_store")

      // bulk upload (the gpdirtableload path): executors write files +
      // emit catalog rows; the parquet write FORCES the distributed
      // upload before any utility statement runs. The Hadoop conf rides
      // a broadcast (serialized as key/value pairs — Configuration
      // itself is not Serializable) so object-store credentials and
      // defaultFS reach the executors.
      import s.implicits._
      val confEntries = {
        val c = s.sparkContext.hadoopConfiguration
        val it = c.iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
        buf.toArray
      }
      val bcConf = s.sparkContext.broadcast(confEntries)
      val filesUri = filesQual.toString
      val docs = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .as[(Long, String, String, String)]
      docs.repartition(8).mapPartitions { it =>
        val conf = new Configuration(false)
        bcConf.value.foreach { case (k, v) => conf.set(k, v) }
        val base = new Path(filesUri)
        val fs = base.getFileSystem(conf)
        it.map { case (id, lang, source, text) =>
          val rel = f"$lang%s/doc_$id%05d.txt"
          val bytes = text.getBytes(StandardCharsets.UTF_8)
          putFile(fs, new Path(base, rel), bytes, EpochBase + id)
          (rel, bytes.length.toLong, EpochBase + id, md5hex(bytes), source)
        }
      }.toDF("relative_path", "size", "mtime_epoch", "md5", "tag")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$root/catalog_upload.parquet")

      // single-file COPY with a tag (gram.y:5095 + copy.c:868): stage a
      // file (dispatcher-side, like COPY FROM's source), then COPY it
      // into the table under a relative path
      val stage = fs0.makeQualified(new Path(new Path(root, "stage"), "README.txt"))
      val out = fs0.create(stage, true)
      try out.write(ReadmeText.getBytes(StandardCharsets.UTF_8)) finally out.close()
      exec(s, root,
        s"COPY BINARY DIRECTORY TABLE $tableName 'meta/README.txt' " +
          s"FROM '$stage' WITH (tag 'meta')")

      // remove_file utility (catalog + storage together): doc 7's file,
      // located by its upload naming rule via a storage glob
      val seven = Option(fs0.globStatus(new Path(filesQual, "*/doc_00007.txt")))
        .toSeq.flatten.headOption
        .map { st =>
          val full = st.getPath.toUri.getPath
          full.substring(full.indexOf("/files/") + "/files/".length)
        }
        .getOrElse(sys.error("dirtable: doc 7 not found after upload"))
      exec(s, root, s"SELECT remove_file('$tableName', '$seven')")

      // commit the final catalog state: upload ∪ COPY'd rows − removed
      val pending = pendingRows.remove(root).getOrElse(Seq.empty)
      val removed = removedPaths.remove(root).getOrElse(Set.empty)
      val extra = s.createDataFrame(pending.map { r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5)
      }.asJava, s.read.parquet(s"$root/catalog_upload.parquet").schema)
      s.read.parquet(s"$root/catalog_upload.parquet")
        .unionByName(extra)
        .filter(!col("relative_path").isin(removed.toSeq: _*))
        .repartition(1)
        .write.mode("overwrite").parquet(s"$root/catalog.parquet")
      root
    })

  private implicit class SeqAsJava[A](private val s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.length)
      s.foreach(l.add)
      l
    }
  }

  private val pendingRows =
    new scala.collection.concurrent.TrieMap[String, Seq[(String, Long, Long, String, String)]]()
  private val removedPaths =
    new scala.collection.concurrent.TrieMap[String, Set[String]]()

  /** Parse + execute one directory-table statement against `root`.
    * Returns the table name. Loud errors on unsupported text. All
    * storage mutations go through the root's Hadoop FileSystem. */
  def exec(s: SparkSession, root: String, stmt: String): String = stmt match {
    case CreateRe(name) =>
      val (fs, files) = filesFs(s, root)
      fs.mkdirs(files)
      name.toLowerCase
    case CopyRe(name, rel, from, tagOrNull) =>
      val (fs, files) = filesFs(s, root)
      val src = new Path(from)
      val in = src.getFileSystem(s.sparkContext.hadoopConfiguration).open(src)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
      putFile(fs, new Path(files, rel), bytes, ReadmeEpoch)
      val tag = Option(tagOrNull).orNull
      pendingRows.updateWith(root)(prev => Some(prev.getOrElse(Seq.empty) :+
        ((rel, bytes.length.toLong, ReadmeEpoch, md5hex(bytes), tag))))
      name.toLowerCase
    case RemoveRe(name, rel) =>
      val (fs, files) = filesFs(s, root)
      require(fs.delete(new Path(files, rel), false),
        s"remove_file: no such file '$rel'")
      removedPaths.updateWith(root)(prev => Some(prev.getOrElse(Set.empty) + rel))
      name.toLowerCase
    case other => throw new IllegalArgumentException(
      s"directory table: unsupported statement '$other'")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- dt01: the directory table CATALOG after CREATE + bulk upload +
    //    tagged single-file COPY + remove_file — one row per managed
    //    file with the reference's metadata columns (dirtablecmds.c:270
    //    column set, minus content). scoped_file_url is the
    //    tablespace-scoped URL the SRF prepends. The oracle re-derives
    //    every column from `documents` (sizes/md5 from content, mtimes
    //    from the upload clock rule), proving the distributed write
    //    recorded exactly the right metadata --
    "dt01_directory_table" -> { (s, dir) =>
      val root = setup(s, dir)
      s.read.parquet(s"$root/catalog.parquet")
        .select(
          concat(lit("dirtable://doc_store/"), col("relative_path"))
            .as("scoped_file_url"),
          col("relative_path"), col("tag"), col("size"),
          col("mtime_epoch"), col("md5"))
        .orderBy(col("relative_path"))
    },

    // -- dt02: the directory_table() READ path — binaryFile streams
    //    {path, length, modificationTime, content} one row per file,
    //    joins the broadcast catalog on relative_path, and the rollup
    //    AUDITS the round-trip: md5(content) must equal the catalog md5
    //    recorded at upload, ditto mtime/size; content decodes back to
    //    text and feeds a token census (the "train straight from the
    //    directory table" pipeline step). The oracle states the
    //    invariant from `documents` — any corruption, lost file, or
    //    metadata drift breaks a count --
    "dt02_directory_table_read" -> { (s, dir) =>
      val root = setup(s, dir)
      val (_, filesQual) = filesFs(s, root)
      val files = s.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(filesQual.toString)
      val cat = s.read.parquet(s"$root/catalog.parquet")
      files
        .select(
          regexp_extract(col("path"), "files/(.+)$", 1).as("relative_path"),
          col("length").as("fs_size"),
          unix_timestamp(col("modificationTime")).as("fs_mtime"),
          md5(col("content")).as("content_md5"),
          decode(col("content"), "UTF-8").as("txt"))
        .join(broadcast(cat), Seq("relative_path"))
        .groupBy(col("tag"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("fs_size")).cast("bigint").as("bytes"),
          sum((col("content_md5") === col("md5")).cast("long"))
            .cast("bigint").as("n_md5_ok"),
          sum((col("fs_mtime") === col("mtime_epoch")).cast("long"))
            .cast("bigint").as("n_mtime_ok"),
          sum(expr("size(filter(split(txt, ' '), x -> x <> ''))"))
            .cast("bigint").as("n_tokens"))
        .orderBy(col("tag"))
    }
  )

  private def readmeLit: String = ReadmeText.replace("\n", "\\n")

  def oracle: Map[String, String] = Map(
    // E'…' escapes: DuckDB parses \n in e-strings; the same literal
    // bytes Spark staged. doc 7 is the remove_file target.
    "dt01_directory_table" -> s"""
      WITH f AS (
        SELECT lang || '/doc_' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || '.txt'
                 AS relative_path,
               source AS tag,
               CAST(strlen(text) AS BIGINT) AS size,
               CAST($EpochBase + doc_id AS BIGINT) AS mtime_epoch,
               md5(text) AS md5
        FROM documents WHERE doc_id <> 7
        UNION ALL
        SELECT 'meta/README.txt', 'meta',
               CAST(strlen(E'$readmeLit') AS BIGINT),
               CAST($ReadmeEpoch AS BIGINT), md5(E'$readmeLit'))
      SELECT 'dirtable://doc_store/' || relative_path AS scoped_file_url,
             relative_path, tag, size, mtime_epoch, md5
      FROM f ORDER BY relative_path""",

    "dt02_directory_table_read" -> s"""
      WITH f AS (
        SELECT source AS tag, strlen(text) AS size,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
        FROM documents WHERE doc_id <> 7
        UNION ALL
        SELECT 'meta', strlen(E'$readmeLit'),
               len(list_filter(string_split(E'$readmeLit', ' '), x -> x <> '')))
      SELECT tag,
             CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(size) AS BIGINT) AS bytes,
             CAST(count(*) AS BIGINT) AS n_md5_ok,
             CAST(count(*) AS BIGINT) AS n_mtime_ok,
             CAST(sum(toks) AS BIGINT) AS n_tokens
      FROM f GROUP BY tag ORDER BY tag"""
  )
}
