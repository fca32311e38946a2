package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table snapshots with time travel — the poor-lakehouse's
  * Delta/Iceberg version history on plain parquet: each write lands a
  * complete immutable snapshot under `<table>/v=N/`, readers resolve
  * "latest" or any pinned N, and two versions diff through
  * [[graft.ops.Diff]]'s added/removed/changed classification.
  *
  * Scale + atomicity shape:
  *  - version resolution is one directory LISTING (driver metadata, the
  *    FileIndex class of work — no data moves);
  *  - writes stage to a dotted tmp dir and RENAME into `v=N` — readers
  *    can never observe a half-written version (dot-prefixed dirs are
  *    invisible to them), and a crash leaves only the tmp to sweep;
  *  - snapshots are full copies by design: storage ∝ versions retained,
  *    each read stays a plain one-dir scan with zero log replay —
  *    retention is the caller dropping old `v=N` dirs, and incremental
  *    states (U9–U13 / the CDC changelog) remain the engine's
  *    delta-sized alternative when full copies are too dear. */
object Versioned {

  private val VersionRe = "^v=(\\d+)$".r

  /** All committed versions under `tablePath`, ascending. */
  def versions(spark: SparkSession, tablePath: String): Seq[Long] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(s => VersionRe.findFirstMatchIn(s.getPath.getName).map(_.group(1).toLong))
      .sorted
  }

  def latestVersion(spark: SparkSession, tablePath: String): Option[Long] =
    versions(spark, tablePath).lastOption

  /** Commit `df` as the next snapshot; returns its version number. */
  def write(df: DataFrame, tablePath: String): Long = {
    val spark = df.sparkSession
    val next = latestVersion(spark, tablePath).fold(1L)(_ + 1)
    val fs = new Path(tablePath).getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(tablePath, s".v=$next.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale tmp from an aborted commit
    df.write.parquet(tmp.toString)
    val dest = new Path(tablePath, s"v=$next")
    require(!fs.exists(dest),
      s"Versioned.write: $dest already exists — concurrent writer? refusing to clobber")
    require(fs.rename(tmp, dest), s"Versioned.write: commit rename $tmp -> $dest failed")
    next
  }

  /** Read a pinned version, or latest when `version` is None. */
  def read(spark: SparkSession, tablePath: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, tablePath)).getOrElse(
      throw new IllegalArgumentException(
        s"Versioned.read: no committed versions under $tablePath"))
    require(versions(spark, tablePath).contains(v),
      s"Versioned.read: version $v not present under $tablePath " +
        s"(have: ${versions(spark, tablePath).mkString(", ")})")
    spark.read.parquet(s"$tablePath/v=$v")
  }

  /** Retention GC: drop all but the newest `keep` versions. Returns the
    * versions removed. Storage ∝ versions retained is the snapshot
    * model's cost — this is the knob. Refuses keep < 1 (a table with no
    * versions is not retention, it is deletion — be explicit). */
  def retain(spark: SparkSession, tablePath: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"retain needs keep >= 1, got $keep")
    val vs = versions(spark, tablePath)
    val drop = vs.dropRight(keep)
    val fs = new Path(tablePath).getFileSystem(spark.sessionState.newHadoopConf())
    drop.foreach(v => fs.delete(new Path(tablePath, s"v=$v"), true))
    drop
  }

  /** added/removed/changed rows between two committed versions
    * ([[graft.ops.Diff.snapshotDiff]] semantics; `keys` identify rows). */
  def diff(spark: SparkSession, tablePath: String, from: Long, to: Long,
           keys: Seq[String]): DataFrame =
    graft.ops.Diff.snapshotDiff(
      read(spark, tablePath, Some(from)), read(spark, tablePath, Some(to)), keys)
}
