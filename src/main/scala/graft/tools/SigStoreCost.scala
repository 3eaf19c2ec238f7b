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
  *
  * `loc:N:B:K` specs run the r16 LOCATION head-to-head instead: the
  * per-batch corpus-proportional term the r15 verdict named — the
  * delete existence check's / append anti-join's narrow CATALOG scan
  * (`Dedup.deleteSignaturesBucketed`, `appendSignaturesBucketed`) —
  * timed against the bucket-PRUNED file read of the same table, with
  * the selectivity guard both respected and force-bypassed, so the
  * guard's boundary is measured on both sides at every scale point.
  * The table is a synthetic sigs-table TWIN (id + 64-long array,
  * bucketed+sorted by id, compacted one-file-per-bucket steady
  * state): the scans under test read ONLY the id column, so the
  * minhash content is irrelevant to their cost while the row width
  * and file layout stay honest — which is what makes a 10M-doc point
  * affordable to build. Three sweeps per strategy, alternating order;
  * report all sweeps, read the min.
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

    // ---- loc:N:B:K — location-strategy head-to-head (r16) ----
    def runLoc(n: Long, buckets: Int, k: Int, spec: String): Unit = {
      import graft.operators.Bucketing
      val table = s"sigloc_${n}_$buckets"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      // sigs-table twin: id + 64-long sig, one file per bucket (the
      // compacted steady state every maintenance cadence returns to)
      val (_, tBuild) = timed {
        spark.range(n)
          .select(col("id"), array((0 until 64).map(h =>
            pmod(col("id") * 1103515245L + h * 12345L,
              lit(1000003L))): _*).as("sig"))
          .repartition(buckets, col("id"))
          .write.format("parquet").bucketBy(buckets, "id").sortBy("id")
          .saveAsTable(table)
      }
      // K stored ids spread evenly — K distinct buckets in the worst
      // case, the CDC-batch shape the mutation paths see
      val batch = spark.range(k)
        .select((col("id") * (n / k).max(1L)).as("id"))
        .localCheckpoint(true)
      val nBuck = batch
        .select(pmod(hash(col("id")), lit(buckets)).as("b"))
        .distinct().count()
      val admits = nBuck * 2 < buckets
      def semiCount(scan: DataFrame): Long =
        batch.join(scan.select("id"), Seq("id"), "left_semi").count()
      // the three strategies, 3 sweeps each, order alternating so no
      // strategy always pays the cold footer/listing caches
      val strategies = Seq[(String, () => Long)](
        ("cat", () => semiCount(spark.table(table))),
        ("pruned", () => semiCount(
          Bucketing.prunedScan(spark, table, batch))),
        ("forced", () => semiCount(Bucketing.prunedScanImpl(
          spark, table, batch, guard = false))))
      val times = scala.collection.mutable.Map[String,
        List[Double]]().withDefaultValue(Nil)
      (0 until 3).foreach { s =>
        val order = if (s % 2 == 0) strategies else strategies.reverse
        order.foreach { case (name, f) =>
          val (c, t) = timed(f())
          require(c == batch.count(),
            s"$name located $c of ${batch.count()} batch ids")
          times(name) = times(name) :+ t
        }
      }
      def fmt(name: String): String =
        times(name).map(t => f"$t%.2f").mkString("[", ",", "]")
      println(s"""{"spec":"$spec","n":$n,"buckets":$buckets,"k":$k,""" +
        s""""build_s":${f"$tBuild%.1f"},"batch_buckets":$nBuck,""" +
        s""""guard_admits":$admits,"cat_s":${fmt("cat")},""" +
        s""""pruned_s":${fmt("pruned")},"forced_s":${fmt("forced")}}""")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }

    args.foreach { spec =>
      if (spec.startsWith("loc:")) {
        val Array(_, nS, bS, kS) = spec.split(":")
        runLoc(nS.toLong, bS.toInt, kS.toInt, spec)
      } else {
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
    }
    spark.stop()
  }
}
