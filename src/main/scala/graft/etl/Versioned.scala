package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet tables: immutable data files + an atomic
  * manifest pointer — the transactional-table-format core (what
  * Iceberg/Delta do under the jars this offline environment cannot
  * load), hand-rolled over plain parquet.
  *
  * Layout:
  * {{{
  *   <root>/data/<commit-uuid>/part-*.parquet   // immutable once committed
  *   <root>/_manifests/v00001.manifest          // one line per data file
  * }}}
  *
  * A commit writes its data files into a FRESH directory under `data/`
  * and then publishes exactly one new manifest via an atomic
  * link(2)-based create (EEXIST = a racing writer won).
  * Everything the reference's durability story needs falls out of that
  * ordering:
  *
  *  - **Readers never see a half-commit**: a manifest either exists in
  *    full or not at all; data files are never listed by directory scan,
  *    only via a manifest, so files from an in-flight or crashed commit
  *    are invisible.
  *  - **Crash safety**: a crash before the manifest publish leaves an
  *    orphan data directory that no reader resolves; [[expire]] garbage-
  *    collects it later. No recovery step is ever required to read.
  *  - **Compaction does not disturb readers**: [[compact]] writes NEW
  *    files and a NEW manifest; a reader holding version N keeps reading
  *    version N's untouched files (contrast [[Sinks.compact]], which
  *    stages the live directory out from under pinned readers).
  *  - **Time travel**: [[read]] takes an explicit version; old snapshots
  *    stay readable until [[expire]] drops their manifests.
  *  - **Single writer, fail-loud**: the manifest publish is the commit
  *    CAS (link(2) fails EEXIST atomically) — if the target version
  *    already exists the commit throws instead of clobbering. On an
  *    object store the same structure swaps the link for a conditional PUT or a
  *    catalog pointer swap (Iceberg's catalog commit); data-file
  *    immutability makes everything else carry over unchanged.
  *
  * Scale: the manifest is O(files), read once at planning time by the
  * driver; data files are listed explicitly so there is no directory-
  * listing storm at 100 TB file counts, and pruning/pushdown behave as
  * for any parquet scan. Reference durability counterpart:
  * dags/utils/db.py:45-65 (Postgres upsert swap). */
object Versioned {

  private def manifestsDir(root: String) = new java.io.File(root, "_manifests")
  private def dataDir(root: String) = new java.io.File(root, "data")
  // {5,} not {5}: %05d WIDENS past five digits (version 100000 writes
  // v100000.manifest), and a fixed-width match would make that commit
  // invisible — silent row loss, then every later append conflicts
  private val ManifestName = """v(\d{5,})\.manifest""".r

  private def manifestFile(root: String, v: Long) =
    new java.io.File(manifestsDir(root), f"v$v%05d.manifest")

  /** All committed versions, ascending (empty for a fresh root). */
  def versions(root: String): Seq[Long] = {
    val fs = manifestsDir(root).listFiles()
    if (fs == null) Seq.empty
    else fs.toSeq.flatMap(_.getName match {
      case ManifestName(d) => Some(d.toLong)
      case _ => None
    }).sorted
  }

  /** Latest committed version, 0 for a fresh root. */
  def currentVersion(root: String): Long = versions(root).lastOption.getOrElse(0L)

  /** Full manifest entry lines (path, optionally "\tmin\tmax" stats),
    * comments/headers stripped. */
  private def readManifestRaw(root: String, v: Long): Seq[String] = {
    val f = manifestFile(root, v)
    require(f.isFile, s"versioned: no manifest for version $v at $root")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().filter(l => l.nonEmpty && !l.startsWith("#")).toList
    finally src.close()
  }

  /** Data-file paths only (stats columns dropped). */
  private def readManifest(root: String, v: Long): Seq[String] =
    readManifestRaw(root, v).map(_.split("\t")(0))

  /** The commit key a version was published under, if any ("#key="
    * header). Deliberately NOT memoized: any cache identity short of
    * the file content can alias (a same-millisecond table rebuild with
    * an equal-length manifest defeats a (size, mtime) key), and a stale
    * hit makes versionForKey silently skip a keyed append — a lost
    * micro-batch with no error. A content-faithful identity would have
    * to open the file anyway, at which point reading the one header
    * line IS the lookup. Cost: one small driver-side file open per
    * retained version per versionForKey scan, bounded by retention. */
  private def keyOf(root: String, v: Long): Option[String] = {
    val src = scala.io.Source.fromFile(manifestFile(root, v), "UTF-8")
    try src.getLines().collectFirst {
      case l if l.startsWith("#key=") => l.stripPrefix("#key=")
    } finally src.close()
  }

  /** The version already committed under `key`, if any. Scans
    * newest-first (streaming replays hit recent keys) over the
    * memoized headers — driver-side, bounded by retained versions. */
  def versionForKey(root: String, key: String): Option[Long] =
    versions(root).reverseIterator.find(v => keyOf(root, v).contains(key))

  /** Publish `files` (paths relative to `root`) as version `next`.
    * The link-create is the commit point: atomic on POSIX, and it
    * FAILS if the target exists — a commit is pinned to the base version it
    * read, so two writers racing from the same base cannot both win
    * (optimistic concurrency, Iceberg's commit rule). Package-private
    * so the spec can drive the conflict path directly. */
  private[graft] def publishAt(root: String, next: Long, files: Seq[String],
                               key: Option[String] = None): Long = {
    key.foreach(k => require(!k.contains("\n") && !k.contains("\r"),
      "versioned: commit key must be single-line"))
    val dir = manifestsDir(root)
    if (!dir.isDirectory && !dir.mkdirs() && !dir.isDirectory)
      throw new java.io.IOException(s"versioned: cannot create $dir")
    val target = manifestFile(root, next)
    val tmp = new java.io.File(dir,
      s".tmp-${java.util.UUID.randomUUID().toString}")
    val w = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(tmp), "UTF-8")
    try {
      key.foreach(k => w.write(s"#key=$k\n"))
      files.foreach(f => w.write(f + "\n")); w.flush()
    } finally w.close()
    // fail-loud CAS via link(2): hard-linking the temp file to the
    // target fails with EEXIST ATOMICALLY if the version was published
    // first — unlike rename(2), which silently REPLACES an existing
    // target (so check-then-rename has a race window where both writers
    // "win" and one commit's rows vanish)
    try {
      java.nio.file.Files.createLink(target.toPath, tmp.toPath)
      tmp.delete()
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        tmp.delete()
        throw new IllegalStateException(
          s"versioned: concurrent writer detected — version $next already " +
            s"published at $root (rebase: reread the head and retry)")
    }
  }

  /** Write `df` as a new commit: data files land in a fresh directory
    * under `data/` first, the manifest publishes second.
    *
    * `key` makes the commit IDEMPOTENT: if a retained manifest already
    * carries this key, the append is a no-op returning that version —
    * the manifest itself is the dedup record, so a retried batch job or
    * a replayed streaming micro-batch (same key, e.g. the micro-batch
    * id) commits exactly once even across a crash between data write
    * and publish (the orphaned files are invisible; the retry writes
    * fresh ones). Retention caveat: [[expire]] drops old manifests AND
    * their keys — keep at least the replay horizon. Returns the new
    * (or already-committed) version. */
  def append(df: DataFrame, root: String, key: Option[String] = None): Long =
    key.flatMap(versionForKey(root, _)).getOrElse {
      // pin the base BEFORE writing: the commit publishes base+1 or
      // fails, so a writer that slipped in mid-flight conflicts instead
      // of being silently built upon (whose files we never read)
      val base = currentVersion(root)
      // carry RAW lines: prior commits' per-file stats survive verbatim
      val carried = if (base == 0) Seq.empty else readManifestRaw(root, base)
      publishAt(root, base + 1, carried ++ writeCommitDir(df, root, None), key)
    }

  /** Shared writer for commit data: `df` lands in a fresh directory
    * under `data/`, returning its manifest lines — with per-file
    * min/max stats for `statsCol` when given (one grouped job over the
    * just-written directory, not one driver-dispatched job per file). */
  private def writeCommitDir(df: DataFrame, root: String,
                             statsCol: Option[String]): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString
    val rel = s"data/$commitId"
    val outDir = new java.io.File(root, rel)
    df.write.parquet(outDir.getAbsolutePath)
    statsCol match {
      case None => listParquet(outDir).map(f => s"$rel/${f.getName}")
      case Some(sc) =>
        val spark = df.sparkSession
        import org.apache.spark.sql.functions.{col => c, input_file_name,
          max => mx, min => mn}
        val statsByFile = spark.read.parquet(outDir.getAbsolutePath)
          .groupBy(input_file_name().as("__f"))
          .agg(mn(c(sc)).cast("long").as("__mn"),
            mx(c(sc)).cast("long").as("__mx"))
          .collect()
          .flatMap { r =>
            if (r.isNullAt(1)) None // all-null file: no stats
            else Some(r.getString(0).split('/').last ->
              (r.getLong(1), r.getLong(2)))
          }.toMap
        listParquet(outDir).map { f =>
          statsByFile.get(f.getName) match {
            case Some((mnV, mxV)) => s"$rel/${f.getName}\t$mnV\t$mxV"
            case None => s"$rel/${f.getName}"
          }
        }
    }
  }

  /** Rewrite the CURRENT snapshot into ~`targetFiles` files (optionally
    * folding rows) and publish the result as a new version that
    * references ONLY the rewritten files. Prior versions keep reading
    * their own untouched files — compaction is invisible to pinned
    * readers and to time travel until [[expire]].
    *
    * `clusterBy` turns the compaction into a CLUSTERED rewrite
    * (OPTIMIZE ... CLUSTER BY): rows are range-partitioned and sorted
    * on the column, per-file min/max stats land in the manifest, and
    * [[readPruned]] range scans skip rewritten files — ingest-ordered
    * appends (which arrive with no useful clustering) become prunable
    * after the fact, the file-layout lever for selective scans over
    * 100 TB. Without it, a plain hash repartition (bin-packing only). */
  def compact(spark: SparkSession, root: String, targetFiles: Int = 1,
              fold: DataFrame => DataFrame = identity,
              clusterBy: Option[String] = None): Long = {
    require(targetFiles >= 1, "versioned compact: targetFiles >= 1")
    val base = currentVersion(root) // pinned: rewrite of THIS snapshot
    import org.apache.spark.sql.functions.{col => c}
    val folded = fold(read(spark, root, Some(base)))
    val arranged = clusterBy match {
      case Some(cb) =>
        folded.repartitionByRange(targetFiles, c(cb)).sortWithinPartitions(cb)
      case None => folded.repartition(targetFiles)
    }
    publishAt(root, base + 1, writeCommitDir(arranged, root, clusterBy))
  }

  /** Read a snapshot: the latest by default, or any still-retained
    * `version` (time travel). Files are enumerated from the manifest —
    * never from a directory listing — so in-flight commits, crashed
    * commits, and compactions published after this call's manifest read
    * are all invisible. */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None,
           mergeSchema: Boolean = false): DataFrame = {
    val v = version.getOrElse(currentVersion(root))
    require(v >= 1, s"versioned: no committed version at $root")
    val files = readManifest(root, v)
      .map(relative => new java.io.File(root, relative).getAbsolutePath)
    require(files.nonEmpty, s"versioned: version $v is empty at $root")
    // mergeSchema = schema evolution across commits: a later commit may
    // ADD columns; the merged read backfills nulls for files written
    // before the column existed. Off by default (footer union costs a
    // planning pass over every file's schema).
    spark.read.option("mergeSchema", mergeSchema).parquet(files: _*)
  }

  /** [[append]] recording per-file min/max of `statsCol` (a LONG-typed
    * column) in the manifest — Iceberg-style FILE PRUNING metadata:
    * [[readPruned]] later skips whole files from the manifest alone,
    * before any footer or row is touched. Commit-time cost is one
    * bounded aggregate per data file over the just-written batch
    * (O(batch), like the sketch appends); carried-forward files keep
    * whatever stats their own commit recorded. */
  def appendWithStats(df: DataFrame, root: String, statsCol: String,
                      key: Option[String] = None): Long =
    key.flatMap(versionForKey(root, _)).getOrElse {
      val base = currentVersion(root)
      val carried = if (base == 0) Seq.empty else readManifestRaw(root, base)
      publishAt(root, base + 1,
        carried ++ writeCommitDir(df, root, Some(statsCol)), key)
    }

  /** Snapshot read that SKIPS files whose recorded [min, max] range for
    * `statsCol` cannot intersect [lo, hi] — pruning decided from the
    * manifest alone (files without recorded stats are always read).
    * The surviving files still get the row-level filter, so the result
    * is exact; pruning only cuts IO. With range-clustered commits
    * (time-ordered ingest, Z-ordered rewrites) a selective range scan
    * over 100 TB opens a handful of files instead of all of them. */
  def readPruned(spark: SparkSession, root: String, statsCol: String,
                 lo: Long, hi: Long,
                 version: Option[Long] = None): DataFrame = {
    require(lo <= hi, s"versioned readPruned: lo <= hi, got $lo..$hi")
    val v = version.getOrElse(currentVersion(root))
    require(v >= 1, s"versioned: no committed version at $root")
    val kept = readManifestRaw(root, v).flatMap { line =>
      line.split("\t") match {
        case Array(path, mn, mx) =>
          if (mx.toLong >= lo && mn.toLong <= hi) Some(path) else None
        case Array(path) => Some(path) // no stats: cannot prune
        case other => Some(other(0))
      }
    }
    import org.apache.spark.sql.functions.{col => c}
    if (kept.isEmpty)
      read(spark, root, Some(v))
        .filter(c(statsCol) >= lo && c(statsCol) <= hi).limit(0)
    else
      spark.read.parquet(kept.map(relative =>
          new java.io.File(root, relative).getAbsolutePath): _*)
        .filter(c(statsCol) >= lo && c(statsCol) <= hi)
  }

  /** Incremental read: the rows added between `fromVersion` (exclusive)
    * and `toVersion` (inclusive, default head) — the CDC surface that
    * lets a downstream consumer process each commit's delta instead of
    * rescanning the table (checkpoint the last version consumed, read
    * changes, advance). Because data files are immutable and appends
    * only ADD files, the delta is exactly the manifest file-set
    * difference — no diffing of row contents, no extra columns.
    *
    * Fail-loud contract: the range must be append-only. A compaction
    * (or any rewrite) inside the range replaces the file set, so a
    * file diff would misread rewritten history as new rows; that range
    * throws — consume a full snapshot read instead and re-anchor. */
  def readChanges(spark: SparkSession, root: String, fromVersion: Long,
                  toVersion: Option[Long] = None): DataFrame = {
    val to = toVersion.getOrElse(currentVersion(root))
    require(fromVersion >= 1 && to >= fromVersion,
      s"versioned readChanges: need 1 <= from <= to, got $fromVersion..$to")
    val fromFiles = readManifest(root, fromVersion).toSet
    val toFiles = readManifest(root, to)
    if (!fromFiles.subsetOf(toFiles.toSet))
      throw new IllegalStateException(
        s"versioned readChanges: $fromVersion..$to is not append-only " +
          s"(a compaction/rewrite replaced files in the range) — " +
          s"re-anchor on a full snapshot read")
    val added = toFiles.filterNot(fromFiles)
      .map(relative => new java.io.File(root, relative).getAbsolutePath)
    if (added.isEmpty)
      read(spark, root, Some(to)).limit(0) // empty delta, right schema
    else spark.read.parquet(added: _*)
  }

  /** The table's commit history as a DataFrame — the snapshots
    * metadata table (Iceberg's `table$snapshots`): one row per
    * retained version with its commit key and file count. Driver-side
    * manifest reads only; the operational surface behind "which
    * version do I pin / re-anchor / expire to". */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(root)
      .map(v => (v, keyOf(root, v).orNull, readManifest(root, v).size))
      .toDF("version", "commit_key", "n_files")
  }

  /** The downstream-consumer loop over [[readChanges]], packaged:
    * reads the last-consumed version from `checkpointFile`, hands the
    * delta up to the current head to `process`, then atomically
    * advances the checkpoint. Checkpoint-after-process = at-least-once
    * delivery; pair `process` with keyed commits or an idempotent
    * merge for exactly-once end to end. A first run (no checkpoint)
    * consumes the full snapshot. Returns the (from, to] range
    * consumed, or None when already caught up. Throws readChanges'
    * not-append-only error if a compaction broke the range — delete
    * the checkpoint and re-anchor on a snapshot read. */
  def consumeChanges(spark: SparkSession, root: String,
                     checkpointFile: String)
                    (process: DataFrame => Unit): Option[(Long, Long)] = {
    val ck = new java.io.File(checkpointFile)
    val from =
      if (!ck.isFile) 0L
      else {
        val src = scala.io.Source.fromFile(ck, "UTF-8")
        try src.mkString.trim.toLong finally src.close()
      }
    val to = currentVersion(root)
    if (to <= from) None
    else {
      process(
        if (from == 0L) read(spark, root, Some(to))
        else readChanges(spark, root, from, Some(to)))
      Option(ck.getParentFile).foreach(_.mkdirs())
      val tmp = new java.io.File(checkpointFile + ".tmp")
      val w = new java.io.FileWriter(tmp)
      try w.write(to.toString) finally w.close()
      java.nio.file.Files.move(tmp.toPath, ck.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Some((from, to))
    }
  }

  /** Split a manifest's RAW lines into (touched, carried) by whether a
    * file's recorded [min, max] stats range can intersect [lo, hi]:
    * a file that cannot is carried forward VERBATIM (stats included,
    * zero IO); everything else — including files with no recorded
    * stats — must be read and rewritten. */
  private def splitByRange(lines: Seq[String], lo: Long, hi: Long)
      : (Seq[String], Seq[String]) =
    lines.partition { line =>
      line.split("\t") match {
        case Array(_, mn, mx) => mx.toLong >= lo && mn.toLong <= hi
        case _ => true // no stats: must read
      }
    }

  private def readLines(spark: SparkSession, root: String,
                        lines: Seq[String]): DataFrame =
    spark.read.parquet(lines.map(l =>
      new java.io.File(root, l.split("\t")(0)).getAbsolutePath): _*)

  /** Copy-on-write row-level DELETE (Iceberg/Delta CoW semantics): the
    * head snapshot minus every row matching `predicate`, published as a
    * new version. `pruneRange = Some((statsCol, lo, hi))` — a caller
    * promise that matching rows satisfy lo <= statsCol <= hi — lets
    * files whose recorded stats cannot intersect be carried forward BY
    * REFERENCE: on a range-clustered 100 TB table a targeted delete
    * rewrites the handful of files holding the range, not the corpus.
    * Rewritten files re-record stats when pruning metadata is in play;
    * prior versions still time-travel to the pre-delete snapshot, and a
    * `key` makes the whole delete an exactly-once retryable commit. */
  def deleteWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column,
                  pruneRange: Option[(String, Long, Long)] = None,
                  key: Option[String] = None): Long =
    key.flatMap(versionForKey(root, _)).getOrElse {
      val base = currentVersion(root)
      require(base >= 1, s"versioned deleteWhere: no committed version at $root")
      val lines = readManifestRaw(root, base)
      val (touched, carried) = pruneRange match {
        case Some((_, lo, hi)) => splitByRange(lines, lo, hi)
        case None => (lines, Seq.empty[String])
      }
      if (touched.isEmpty) base // no file can hold a match: commit elided
      else {
        // DELETE drops rows where the predicate is TRUE; a NULL
        // predicate KEEPS the row (SQL DELETE semantics) — a bare
        // filter(!p) would silently drop the null-predicate rows too
        val kept = readLines(spark, root, touched).filter(
          org.apache.spark.sql.functions.not(
            org.apache.spark.sql.functions.coalesce(predicate,
              org.apache.spark.sql.functions.lit(false))))
        publishAt(root, base + 1,
          carried ++ writeCommitDir(kept, root, pruneRange.map(_._1)), key)
      }
    }

  /** Copy-on-write MERGE (upsert): rows of `updates` REPLACE head rows
    * sharing a `keyCol` value; unmatched `updates` rows are inserted.
    * With `statsCol` (the table's recorded pruning column), file
    * skipping prunes against the updates' own key range — computed in
    * one tiny aggregate, since updates is the small side by contract —
    * and matched-row removal is a broadcast left_anti join, so the
    * rewrite costs (touched files + |updates|), never O(table).
    * `updates` must carry the table's columns (any order).
    *
    * `statsCol`, when set, MUST equal `keyCol`: pruning compares the
    * updates' key range against stats recorded for statsCol, so stats
    * on any other column would let matched rows in carried files
    * survive the anti-join — duplicate keys, silent corruption. The
    * parameter stays an Option (None = no pruning) but the value is
    * enforced rather than trusted. */
  def mergeInto(spark: SparkSession, root: String, updates: DataFrame,
                keyCol: String, statsCol: Option[String] = None,
                key: Option[String] = None): Long =
    key.flatMap(versionForKey(root, _)).getOrElse {
      require(statsCol.forall(_ == keyCol),
        s"versioned mergeInto: pruning stats must be recorded on the " +
          s"merge key (statsCol=${statsCol.get}, keyCol=$keyCol) — " +
          "stats on another column would carry matched rows past the " +
          "anti-join and duplicate keys")
      val base = currentVersion(root)
      require(base >= 1, s"versioned mergeInto: no committed version at $root")
      import org.apache.spark.sql.functions.{broadcast, col => c,
        max => mx, min => mn}
      val range = updates.agg(mn(c(keyCol)).cast("long"),
        mx(c(keyCol)).cast("long")).head()
      if (range.isNullAt(0)) base // empty updates: no-op
      else {
        val lines = readManifestRaw(root, base)
        val (touched, carried) =
          if (statsCol.isDefined)
            splitByRange(lines, range.getLong(0), range.getLong(1))
          else (lines, Seq.empty[String])
        val survivors =
          if (touched.isEmpty) updates.limit(0)
          else readLines(spark, root, touched)
            .join(broadcast(updates.select(c(keyCol))), Seq(keyCol),
              "left_anti")
        publishAt(root, base + 1, carried ++
          writeCommitDir(survivors.unionByName(updates), root, statsCol), key)
      }
    }

  /** Retention: keep the newest `keepLast` manifests, drop the rest,
    * then delete every data directory no surviving manifest references
    * (which also collects orphans from crashed commits). Single-writer
    * scope: not concurrent with an in-flight [[append]]/[[compact]] —
    * a commit's files exist before its manifest does, and would look
    * orphaned. Returns (manifestsDeleted, dataDirsDeleted). */
  def expire(root: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "versioned expire: keepLast >= 1")
    val vs = versions(root)
    val dropped = vs.dropRight(keepLast)
    dropped.foreach(v => manifestFile(root, v).delete())
    val live = versions(root).flatMap(readManifest(root, _))
      .map(_.split("/")(1)).toSet // data/<commit-uuid>/file -> commit-uuid
    val dirs = dataDir(root).listFiles()
    val orphans =
      if (dirs == null) Array.empty[java.io.File]
      else dirs.filter(d => d.isDirectory && !live.contains(d.getName))
    orphans.foreach(rm)
    (dropped.size, orphans.length)
  }

  private def listParquet(dir: java.io.File): Seq[java.io.File] = {
    val fs = dir.listFiles()
    require(fs != null, s"versioned: commit wrote nothing at $dir")
    fs.toSeq.filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
  }

  private[graft] def rm(f: java.io.File): Unit = {
    val fs = f.listFiles(); if (fs != null) fs.foreach(rm); f.delete(); ()
  }
}
