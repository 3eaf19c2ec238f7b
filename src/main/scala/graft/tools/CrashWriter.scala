package graft.tools

import org.apache.spark.sql.SparkSession

/** REAL-process crash fixture (not part of the driver contract):
  * stages a generation into a manifest snapshot and then dies ABRUPTLY
  * (`Runtime.halt` — no shutdown hooks, no finally blocks, no
  * streaming-side cleanup: the closest a test can get to kill -9
  * without an external supervisor). MergeCrashSpec's in-process death
  * points simulate the disk states; the subprocess test that runs this
  * main proves the simulation faithful — a genuinely dead JVM leaves
  * exactly the debris the recovery path is specced against.
  *
  * Usage: CrashWriter <snapshotDir> <mode>
  *   mode = seed       — commit v1 normally, exit 0
  *   mode = die-staged — stage v2's generation dir fully, then halt(137)
  *                       BEFORE the commit file (the mid-death point:
  *                       staged-but-unreferenced debris)
  */
object CrashWriter {
  def main(args: Array[String]): Unit = {
    val Array(dir, mode) = args.take(2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    mode match {
      case "seed" =>
        graft.streaming.MergeSink.applyBatch(spark,
          Seq((1L, "I", "a", 1.0, 1L)).toDF("k", "op", "name", "bal", "seq"),
          dir, "k", "op", "seq", manifestCommit = true)
        spark.stop()
      case "die-staged" =>
        graft.operators.Merge.commitWholeGeneration(spark, dir) {
          (genPath, _) =>
            Seq((2L, "half", 2.0)).toDF("k", "name", "bal")
              .write.mode("overwrite").parquet(genPath)
            // the process dies HERE: generation staged at its final
            // nonce path, no commit file will ever name it
            Runtime.getRuntime.halt(137)
        }
      case other => sys.error(s"unknown mode $other")
    }
  }
}
