package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized net-state equivalence for the bucketed signature store's
  * mutation lifecycle: under RANDOM corpus sizes, bucket counts, band
  * configs, write-task layouts, takedown sets and replacement sets,
  * a build + delete + upsert sequence must leave the store EXACTLY
  * equal to the net corpus — every live id's stored sig AND band rows
  * equal the net text's (the q141/q142 audit), no resurrections, no
  * duplicate physical rows. This is the property form of the r15
  * file-targeted-reclaim work: the deterministic specs pin the known
  * layouts (the 4-bands-over-8-buckets always-misses shape that
  * caught the key-level-heal bug); the generator walks the layout
  * space the next such bug would hide in. */
object SigLifecycleProperties extends Properties("sigLifecycle") {

  private lazy val spark = SparkSpec.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private case class Case(nDocs: Int, parts: Int, buckets: Int,
      bands: Int, delIds: Set[Long], upIds: Set[Long])

  private val caseGen: Gen[Case] = for {
    nDocs <- Gen.chooseNum(6, 40)
    parts <- Gen.chooseNum(1, 4)
    buckets <- Gen.oneOf(2, 4, 8)
    bands <- Gen.oneOf(2, 4, 8, 16)
    dels <- Gen.someOf(0L until nDocs.toLong)
    ups <- Gen.someOf(0L until nDocs.toLong)
  } yield Case(nDocs, parts, buckets, bands, dels.toSet, ups.toSet)

  private def txt(i: Long) = s"property document $i with its own " +
    s"words p$i q$i r$i s$i t$i u$i v$i w$i"
  private def rev(s: String) = s.split("\\s+").reverse.mkString(" ")

  property("build + delete + upsert ≡ net corpus on random layouts and batches") =
    Prop.forAll(caseGen) { c =>
      import spark.implicits._
      val table = "sigprop"
      Seq(s"${table}_sigs", s"${table}_bands", s"${table}_deleted")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val docs = (0L until c.nDocs.toLong).map(i => (i, txt(i)))
        .toDF("doc_id", "text").repartition(c.parts)
      Dedup.buildSignatureStoreBucketed(docs, "doc_id", "text", table,
        buckets = c.buckets, numHashes = 64, bands = c.bands,
        shingleN = 5)
      if (c.delIds.nonEmpty)
        Dedup.deleteSignaturesBucketed(spark,
          c.delIds.toSeq.toDF("doc_id"), table)
      if (c.upIds.nonEmpty)
        Dedup.upsertSignaturesBucketed(spark,
          c.upIds.toSeq.map(i => (i, rev(txt(i)))).toDF("doc_id", "text"),
          "doc_id", "text", table, buckets = c.buckets, numHashes = 64,
          bands = c.bands, shingleN = 5)
      // net: deletes stay down unless upserted (upsert revives);
      // upserted ids carry the reversed text
      val live = (0L until c.nDocs.toLong)
        .filter(i => !c.delIds.contains(i) || c.upIds.contains(i))
      val net = live.map(i =>
          (i, if (c.upIds.contains(i)) rev(txt(i)) else txt(i)))
        .toDF("doc_id", "text")
      val audit = Dedup.auditSignatureStoreBucketed(spark, net,
        "doc_id", "text", table, numHashes = 64, bands = c.bands,
        shingleN = 5)
      val auditRows = audit.count()
      val badRows = audit.filter(!col("sig_ok") || !col("bands_ok")).count()
      val dupSigs = spark.table(s"${table}_sigs").groupBy("id").count()
        .filter(col("count") > 1).count()
      Seq(s"${table}_sigs", s"${table}_bands", s"${table}_deleted")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Prop(auditRows == live.size.toLong) :|
          s"audit rows $auditRows != ${live.size}" &&
        Prop(badRows == 0L) :|
          s"$badRows live ids mismatch the net corpus" &&
        Prop(dupSigs == 0L) :| s"$dupSigs duplicated sig rows"
    }
}
