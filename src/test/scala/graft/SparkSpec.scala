package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, forked by sbt). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // same knob as the Bench/Verify mains: fall back to non-codegen
      // for stages whose generated method can never JIT (> 8 KB
      // bytecode) — tests run the plans users run
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sf0001 = "/root/testdata/sf0.001"

  /** Await a self-terminating stream, and on timeout STOP it before
    * failing: a discarded `awaitTermination(ms) == false` leaks a live
    * query that keeps running micro-batches under later suites and
    * races session teardown (the r16 flaky-test class). */
  def awaitDrained(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long): Unit =
    if (!q.awaitTermination(timeoutMs)) {
      q.stop()
      fail(s"streaming query did not terminate within $timeoutMs ms")
    }
}
