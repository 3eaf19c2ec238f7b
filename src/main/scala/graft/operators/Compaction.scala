package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/**
 * Small-file compaction for streaming sink output (SURVEY §7.3 item 5).
 *
 * Micro-batch sinks produce one file per partition per trigger; the
 * reference solves this in batch with `repartition(1)` (README.md:304 —
 * a full shuffle to one task, with the OOM caveat the reference itself
 * notes at README.md:299). This job rewrites a directory to
 * size-targeted files instead: bytes/targetFileBytes output files via
 * `coalesce` when shrinking (no shuffle) — run it periodically against
 * hive-partitioned table directories.
 */
object Compaction {

  /** Rewrite `dir` (parquet) into ≈`targetFileBytes`-sized files.
    * Returns (filesBefore, filesAfter). */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def parquetFiles(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap {
        case f if f.isDirectory => parquetFiles(f)
        case f if f.getName.endsWith(".parquet") => Seq(f)
        case _ => Nil
      }
    val before = parquetFiles(new java.io.File(dir))
    val bytes = before.map(_.length()).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(dir)
    // write to a sibling tmp dir, then atomically swap
    val tmp = dir.stripSuffix("/") + ".compact_tmp"
    df.coalesce(n).write.mode(SaveMode.Overwrite).parquet(tmp)
    val dirFile = new java.io.File(dir)
    val bak = new java.io.File(dir.stripSuffix("/") + ".compact_bak")
    require(dirFile.renameTo(bak), s"could not move $dir aside")
    require(new java.io.File(tmp).renameTo(dirFile), s"could not promote $tmp")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
    }
    rm(bak)
    (before.size, parquetFiles(new java.io.File(dir)).size)
  }
}
