package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-consistent reads for the corpus-sized raw store — the
  * single-box analog of a table format's manifest commit, for the table
  * the [[Rollup]] snapshot tier deliberately does NOT cover (the rollup
  * is aggregate-small, so [[Rollup.publish]] copies it whole per merge;
  * the raw store is the corpus, so its maintenance must REWRITE ONCE
  * and never copy).
  *
  * The problem it closes (measured in the composed lifecycle soak): the
  * in-place partition swap of [[Retention]]/[[Compaction]]
  * (write-tmp → delete → rename) invalidates the file list of any query
  * planned before the swap that executes after it — FILE_NOT_EXIST under
  * a 30 s maintenance cadence, bounded but real (3/1455 requests with
  * one fixed retry, 1/1428 with backoff).
  *
  * Mechanism — paths are never reused or moved, only eventually deleted:
  *  - a tiny `_MANIFEST` file at the table root (atomic
  *    rename-overwrite, same discipline as [[Rollup.publish]]'s
  *    `_CURRENT`) maps rewritten days to immutable GENERATION dirs under
  *    `.gen/g<seq>/` and lists RETIRED paths with their retirement time;
  *  - a maintenance rewrite writes the day's survivors to a fresh
  *    generation, flips the manifest, and retires the old path;
  *  - a maintenance drop just flips the manifest and retires the path;
  *  - retired paths are physically deleted only by [[reap]] after a
  *    grace window — an in-flight reader's resolved file list stays
  *    VALID (and consistently pre-swap) for the whole window.
  *
  * Readers go through [[read]]: resolve the manifest once (one atomic
  * file read), then scan live `p_date=` dirs that are neither retired
  * nor remapped plus the active generation dirs. A bare
  * `spark.read(dir)` keeps working but observes retired-not-yet-reaped
  * content — tables under graceful maintenance must be read through
  * this resolver.
  *
  * Contracts (both enforced upstream, both load-bearing here):
  *  - SINGLE WRITER: one maintenance actor owns the manifest
  *    (read-modify-write is not concurrency-safe); the collector never
  *    touches it — it appends plain `p_date=` dirs only.
  *  - NO APPENDS TO REMAPPED DAYS: ingest writes the open day; only
  *    closed days are rewritten ([[Compaction]]'s `closedBefore`
  *    contract) — an append into a remapped day's PLAIN dir would be
  *    invisible to the resolver.
  *
  * At 100 TB the production substrate is a real table format
  * (Iceberg/Delta manifest lists + snapshot retention); this module is
  * that commit protocol reduced to one directory, and it exists so the
  * engine's composed lifecycle is race-free on a bare filesystem too.
  */
object RawStore {

  private val ManifestName = "_MANIFEST"
  private val GenRoot = ".gen"

  /** seq: next generation number; active: day (ISO date) → relpath of
    * its generation dir; retired: relpath → retirement epoch ms.
    */
  case class Manifest(seq: Long, active: Map[String, String],
                      retired: Map[String, Long]) {
    def isEmpty: Boolean = active.isEmpty && retired.isEmpty && seq == 0L
  }
  val EmptyManifest: Manifest = Manifest(0L, Map.empty, Map.empty)

  def readManifest(fs: FileSystem, dir: String): Manifest = {
    val p = new Path(dir, ManifestName)
    if (!fs.exists(p)) return EmptyManifest
    // RAW fs open: the manifest is written sidecar-free (see
    // writeManifest), and a checksummed open would race a .crc pair
    // rename — the ChecksumException flavor of the very race this
    // module closes (observed on Rollup's _CURRENT in the soak)
    val in = Rollup.rawFs(fs).open(p)
    val bos = new java.io.ByteArrayOutputStream()
    try { // read to EOF from one handle (same TOCTOU discipline as
      // Rollup.servedTable: never pre-size from a separate stat)
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    val lines = new String(bos.toByteArray, "UTF-8").split('\n')
      .map(_.trim).filter(_.nonEmpty)
    require(lines.headOption.contains("v1"),
      s"unrecognized manifest version in $p: ${lines.headOption.getOrElse("<empty>")}")
    var seq = 0L
    val active = Map.newBuilder[String, String]
    val retired = Map.newBuilder[String, Long]
    lines.tail.foreach { l =>
      l.split(' ') match {
        case Array("seq", n) => seq = n.toLong
        case Array("active", day, rel) => active += day -> rel
        case Array("retired", rel, at) => retired += rel -> at.toLong
        case other => throw new IllegalStateException(
          s"corrupt manifest line in $p: '$l'")
      }
    }
    Manifest(seq, active.result(), retired.result())
  }

  /** Atomic replace via FileContext rename-OVERWRITE — readers see the
    * old or the new manifest, never a partial one.
    */
  def writeManifest(fs: FileSystem, dir: String, m: Manifest): Unit = {
    val root = new Path(dir)
    val sb = new StringBuilder("v1\n").append(s"seq ${m.seq}\n")
    m.active.toSeq.sorted.foreach { case (d, r) => sb.append(s"active $d $r\n") }
    m.retired.toSeq.sorted.foreach { case (r, at) => sb.append(s"retired $r $at\n") }
    val tmp = new Path(root, s".${ManifestName}.tmp")
    // sidecar-free write (see readManifest): no .crc, no pair race
    val out = Rollup.rawFs(fs).create(tmp, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(root.toUri, fs.getConf)
      .rename(tmp, new Path(root, ManifestName),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Active (day, path) pairs: live `p_date=` dirs that are neither
    * retired nor remapped, plus the manifest's generation dirs.
    * Unparseable partition values are skipped (same rule as
    * [[Retention]]: maintenance must never touch what it can't prove).
    */
  def activeDays(fs: FileSystem, dir: String,
                 m: Manifest): Seq[(java.time.LocalDate, Path)] = {
    val root = new Path(dir)
    val plain =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(_.getName.startsWith("p_date="))
        .filter(p => !m.retired.contains(p.getName))
        .flatMap { p =>
          scala.util.Try(java.time.LocalDate
            .parse(p.getName.stripPrefix("p_date="))).toOption
            .filterNot(d => m.active.contains(d.toString))
            .map(d => d -> p)
        }
    val gens = m.active.toSeq.map { case (day, rel) =>
      java.time.LocalDate.parse(day) -> new Path(dir, rel)
    }
    (plain ++ gens).sortBy(_._1)
  }

  /** Resolve the manifest and read the table's ACTIVE state. `schema`
    * is the full table schema including `p_date` and any sub-partition
    * columns (the caller knows it; this is the collector-sink read
    * path). Generation dirs carry no `p_date=` path component, so the
    * day is restored as a literal column per generation.
    */
  def read(spark: SparkSession, dir: String, schema: String,
           format: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = readManifest(fs, dir)
    if (m.isEmpty)
      return spark.read.schema(schema).format(format).load(dir)
    // plain dirs by NAME (not parsed date): an unparseable partition
    // value (__HIVE_DEFAULT_PARTITION__) is never remapped or retired
    // and must stay visible — the resolver's semantics are "the bare
    // read, minus retired content, plus generations"
    val plainPaths = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("p_date="))
      .filter(p => !m.retired.contains(p.getName))
      .filter(p => !m.active.contains(p.getName.stripPrefix("p_date=")))
    val parts =
      (if (plainPaths.nonEmpty)
        Seq(spark.read.schema(schema).format(format)
          .option("basePath", dir).load(plainPaths.map(_.toString): _*))
      else Seq.empty) ++
        m.active.toSeq.sortBy(_._1).map { case (day, rel) =>
          spark.read.schema(schema).format(format)
            .load(new Path(dir, rel).toString)
            .withColumn("p_date",
              org.apache.spark.sql.functions.lit(day).cast("date"))
        }
    if (parts.isEmpty)
      spark.read.schema(schema).format(format).load(dir).limit(0)
    else parts.reduce(_.unionByName(_))
  }

  /** Replace `day`'s active content with `survivors`, gracefully: write
    * a fresh generation, flip the manifest, retire the old path. The
    * old files stay valid until [[reap]]'s grace expires. Preserves
    * `batch_id` sub-partitioning like [[Retention]]'s in-place rewrite.
    */
  def swapDay(spark: SparkSession, fs: FileSystem, dir: String, m: Manifest,
              day: java.time.LocalDate, survivors: DataFrame, format: String,
              nowMs: Long = System.currentTimeMillis()): Manifest = {
    val rel = s"$GenRoot/g${m.seq}"
    val w = survivors.write.mode("overwrite").format(format)
    (if (survivors.columns.contains("batch_id")) w.partitionBy("batch_id") else w)
      .save(new Path(dir, rel).toString)
    val oldRel = m.active.getOrElse(day.toString, s"p_date=$day")
    val next = Manifest(m.seq + 1,
      m.active + (day.toString -> rel),
      m.retired + (oldRel -> nowMs))
    writeManifest(fs, dir, next)
    next
  }

  /** Drop `day` gracefully: flip the manifest, retire its path. */
  def dropDay(fs: FileSystem, dir: String, m: Manifest,
              day: java.time.LocalDate,
              nowMs: Long = System.currentTimeMillis()): Manifest = {
    val oldRel = m.active.getOrElse(day.toString, s"p_date=$day")
    val next = Manifest(m.seq, m.active - day.toString,
      m.retired + (oldRel -> nowMs))
    writeManifest(fs, dir, next)
    next
  }

  /** Physically delete retired paths older than `graceMs`. Call at the
    * top of each maintenance pass: grace must exceed the slowest
    * reader's plan-to-finish span (soak evidence: p95 well under 1 s
    * against a 30 s cadence — a few seconds of grace is orders of
    * magnitude of headroom).
    */
  def reap(fs: FileSystem, dir: String, graceMs: Long,
           nowMs: Long = System.currentTimeMillis()): Manifest = {
    val m = readManifest(fs, dir)
    val (expired, kept) = m.retired.partition { case (_, at) => nowMs - at >= graceMs }
    if (expired.isEmpty) return m
    expired.keys.foreach(rel => fs.delete(new Path(dir, rel), true))
    val next = m.copy(retired = kept)
    writeManifest(fs, dir, next)
    next
  }
}
