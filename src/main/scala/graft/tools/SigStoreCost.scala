package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (not part of the driver contract): the bucketed
  * signature store's MUTATION costs — the dedup-side twin of
  * [[LifecycleCost]], built to price the r15 location lever (the
  * bucketed layout used as its own location index:
  * `Bucketing.prunedScan` behind delete's existence check, the
  * append's re-delivery anti, and the reclaim's discovery/rest
  * scans). For each `synth:N:B:K` spec (N docs, B buckets, K-id
  * batch):
  *
  *  - build the bucketed store, timed;
  *  - FLOOR: delete 100 never-stored ids — pure location work, the
  *    number that must go corpus-independent when location is pruned;
  *  - DELETE K stored ids (tombstones + existence check);
  *  - UPSERT K mutated docs (tombstone → targeted file-level reclaim
  *    → admit), the CDC replacement path;
  *  - audit the net store against the expected corpus (every live
  *    id's sig AND band rows ≡ the net text's; membership exact) —
  *    the run is only reported if the audit is clean.
  *
  * One JSON line per spec.
  */
object SigStoreCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    import graft.operators.Dedup

    // deterministic distinct-ish docs: 18 words drawn from a per-doc
    // affine stream — enough shingle mass for 5-shingles, no two docs
    // near-dup unless mutated into each other
    def synthDocs(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 18).map(w =>
          concat(lit("w"), ((col("id") * 1103515245L + w * 12345L)
            % 50021L).cast("string"))): _*).as("text"))

    def mutate(d: DataFrame): DataFrame = d.select(col("doc_id"),
      concat_ws(" ", reverse(split(col("text"), "\\s+"))).as("text"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { spec =>
      val Array(_, nS, bS, kS) = spec.split(":")
      val (n, buckets, k) = (nS.toInt, bS.toInt, kS.toInt)
      val table = s"sigcost_${n}_$buckets"
      Seq(s"${table}_sigs", s"${table}_bands", s"${table}_deleted")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val docs = synthDocs(n).localCheckpoint(true)
      val (_, tBuild) = timed {
        Dedup.buildSignatureStoreBucketed(docs, "doc_id", "text",
          table, buckets = buckets, numHashes = 64, bands = 8,
          shingleN = 5)
      }
      // pure location floor: ids that were never stored
      val novel = spark.range(100).select((col("id") + n + 1000000L)
        .as("doc_id")).localCheckpoint(true)
      val (floorFiled, tFloor) = timed {
        Dedup.deleteSignaturesBucketed(spark, novel, table)
      }
      // takedown of k stored ids (doc_id % 7 == 2 slice, capped)
      val delIds = docs.filter(col("doc_id") % 7 === 2)
        .select("doc_id").limit(k).localCheckpoint(true)
      val (delFiled, tDelete) = timed {
        Dedup.deleteSignaturesBucketed(spark, delIds, table)
      }
      // CDC replacement of k other ids (doc_id % 5 == 1 slice, capped)
      val upDocs = mutate(docs.filter(col("doc_id") % 5 === 1).limit(k))
        .localCheckpoint(true)
      val (_, tUpsert) = timed {
        Dedup.upsertSignaturesBucketed(spark, upDocs, "doc_id", "text",
          table, buckets = buckets, numHashes = 64, bands = 8,
          shingleN = 5)
      }
      // net expectation: delIds down (unless later upserted — the
      // upsert REVIVES by design), upDocs replaced
      val effDel = delIds.join(upDocs.select("doc_id"),
        Seq("doc_id"), "left_anti")
      val expected = docs
        .join(effDel, Seq("doc_id"), "left_anti")
        .join(upDocs.select(col("doc_id"), col("text").as("t2")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("t2"), col("text")).as("text"))
      val audit = Dedup.auditSignatureStoreBucketed(spark, expected,
        "doc_id", "text", table, numHashes = 64, bands = 8,
        shingleN = 5).localCheckpoint(true)
      val auditOk = audit.count() == expected.count() &&
        audit.filter(!col("sig_ok") || !col("bands_ok")).count() == 0
      println(s"""{"spec":"$spec","n":$n,"buckets":$buckets,"k":$k,""" +
        s""""build_s":${f"$tBuild%.2f"},"floor_s":${f"$tFloor%.2f"},""" +
        s""""floor_filed":$floorFiled,"delete_s":${f"$tDelete%.2f"},""" +
        s""""delete_filed":$delFiled,"upsert_s":${f"$tUpsert%.2f"},""" +
        s""""audit_ok":$auditOk}""")
      Seq(s"${table}_sigs", s"${table}_bands", s"${table}_deleted")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    spark.stop()
  }
}
