package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Pointer-file commit protocol for [[Merge]] / [[graft.streaming.MergeSink]]
 * snapshots on filesystems WITHOUT atomic directory rename — i.e. object
 * stores, the reference pipeline's actual substrate
 * (`/root/reference/README.md:76` lands data on S3): an S3 "directory
 * rename" is a non-atomic per-object copy+delete, so the park/promote
 * swap that is safe on HDFS can tear there. This protocol never renames
 * and never overwrites:
 *
 *  - data lives in IMMUTABLE generation dirs, written once at their
 *    final path: `<dir>/data/g-<v>` (whole-snapshot mode) or
 *    `<dir>/data/<partCol>=<val>/g-<v>` (partition-scoped mode);
 *  - the atomic flip is the EXISTENCE of a new small commit file
 *    `<dir>/_graft_commit-<v>` naming the live generation dir(s); a
 *    commit object is created once and never rewritten;
 *  - readers resolve through the newest commit file that parses WHOLE
 *    (header + entry-count trailer), so a torn write from a crash
 *    mid-commit is skipped, not half-read;
 *  - crash debris (staged-but-uncommitted generations, torn or
 *    superseded commit files) is garbage-collected by the next
 *    application's preamble — recovery never depends on the crash
 *    point.
 *
 * Single writer per snapshot (the same assumption the rename protocol
 * makes — foreachBatch serializes batches). Readers racing a commit may
 * see the previous generation until they re-resolve; a reader holding
 * paths into a superseded generation across a later cleanup must retry,
 * the same exposure the rename swap has with a dropped parked dir.
 */
private[graft] object ManifestCommit {

  private val Prefix = "_graft_commit-"

  /** live entries are paths relative to `<dir>/data`: either
    * `g-<v>` (whole-snapshot) or `<leaf>/g-<v>` (partition-scoped) */
  case class State(version: Long, live: Seq[String])

  def dataDir(dir: Path): Path = new Path(dir, "data")

  def genName(v: Long): String = f"g-$v%012d"

  private def commitName(v: Long): String = f"$Prefix$v%012d"

  def exists(fs: FileSystem, dir: Path): Boolean =
    fs.exists(dir) &&
      fs.listStatus(dir).exists(_.getPath.getName.startsWith(Prefix))

  /** Newest commit file whose content parses whole; torn writes from a
    * crash mid-commit fail the trailer check and fall through to the
    * previous commit. */
  def read(fs: FileSystem, dir: Path): Option[State] = {
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(Prefix))
      .sortBy(_.getName).reverseIterator
      .flatMap(p => parse(fs, p))
      .nextOption()
  }

  private def parse(fs: FileSystem, p: Path): Option[State] =
    try {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = txt.split("\n", -1).toSeq
      val header = lines.head.split(" ")
      if (header.length != 3 || header(0) != "graft-commit" || header(1) != "v1")
        None
      else {
        val body = lines.tail.takeWhile(!_.startsWith("end "))
        if (!lines.lift(1 + body.size).contains(s"end ${body.size}")) None
        else Some(State(header(2).toLong, body))
      }
    } catch { case _: Exception => None }

  /** One small object, created once, never overwritten or renamed — the
    * flip IS the object's existence. Line format with an entry-count
    * trailer so a partial upload is detectably torn. */
  def write(fs: FileSystem, dir: Path, st: State): Unit = {
    val out = fs.create(new Path(dir, commitName(st.version)), false)
    try out.write((s"graft-commit v1 ${st.version}\n" +
      st.live.map(_ + "\n").mkString + s"end ${st.live.size}\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Preamble/cleanup GC: drop commit files other than the newest two
    * parseable-or-not (the newest is live; one predecessor is kept as
    * paranoia headroom), and generation dirs the live commit does not
    * reference — orphans of a crashed stage, or generations a crashed
    * post-commit cleanup left behind. Runs BEFORE any staging, so a
    * re-delivered batch re-stages into clean paths. */
  def gc(fs: FileSystem, dir: Path): Unit = {
    if (!fs.exists(dir)) return
    val st = read(fs, dir)
    val commits = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(Prefix)).sortBy(_.getName)
    // keep the live commit + its immediate predecessor (fallback
    // headroom); everything else goes — in particular any file ABOVE
    // the live one is a torn write (read would have picked it
    // otherwise) and must clear out so a re-delivered batch can
    // re-create the same version number
    val liveIdx = st.map(s => commits.indexWhere(_.getName == commitName(s.version)))
      .getOrElse(-1)
    commits.zipWithIndex.foreach { case (p, i) =>
      if (i != liveIdx && i != liveIdx - 1) fs.delete(p, false)
    }
    val data = dataDir(dir)
    if (fs.exists(data)) {
      val live = st.map(_.live.toSet).getOrElse(Set.empty[String])
      // the superseded-commit fallback only matters if the live commit
      // object is lost; its generations are already superseded and are
      // reclaimed here
      fs.listStatus(data).filter(_.isDirectory).foreach { child =>
        val n = child.getPath.getName
        if (n.startsWith("g-")) {
          if (!live(n)) fs.delete(child.getPath, true)
        } else {
          fs.listStatus(child.getPath).filter(_.isDirectory).foreach { g =>
            if (!live(n + "/" + g.getPath.getName)) fs.delete(g.getPath, true)
          }
          if (fs.listStatus(child.getPath).isEmpty)
            fs.delete(child.getPath, false)
        }
      }
    }
  }
}
