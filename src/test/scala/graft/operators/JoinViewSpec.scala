package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental join view must be INVISIBLE: any init + foldFacts*
  * + foldDim* sequence reads equal to the from-scratch join of the
  * final inputs — and each fold's cost shape (batch-sized fact folds,
  * affected-only dim folds, partition-pruned commits) is pinned. */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/view"

  // facts: (fid, dkey, v); dim: (dkey, dname, dval)
  private val facts0 = Seq((1L, 10L, 1.0), (2L, 20L, 2.0), (3L, 10L, 3.0))
  private val facts1 = Seq((4L, 20L, 4.0), (5L, 30L, 5.0))
  private val dim0 = Seq((10L, "a", 100.0), (20L, "b", 200.0), (30L, "c", 300.0))

  private val spec = JoinView.Spec(factKey = "fid", dimKey = "dkey")

  private def df(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("fid", "dkey", "v")
  private def ddf(rows: Seq[(Long, String, Double)]) =
    rows.toDF("dkey", "dname", "dval")

  private def snap(dir: String) =
    JoinView.read(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("fid")), r.getLong(r.fieldIndex("dkey")),
        r.getDouble(r.fieldIndex("v")), r.getString(r.fieldIndex("dname")),
        r.getDouble(r.fieldIndex("dval")))).toSet

  test("fold sequence ≡ from-scratch join; dim folds touch only affected rows") {
    val dir = tmp("jv")
    JoinView.init(spark, dir, df(facts0), ddf(dim0), spec)
    JoinView.foldFacts(spark, dir, df(facts1), ddf(dim0), spec)

    val scratch = df(facts0 ++ facts1).join(ddf(dim0), Seq("dkey"))
      .select("fid", "dkey", "v", "dname", "dval")
      .as[(Long, Long, Double, String, Double)].collect().toSet
    assert(snap(dir) === scratch)

    // dim delta: dkey 10 renamed + revalued; 20/30 untouched
    val delta = ddf(Seq((10L, "a2", 111.0)))
    JoinView.foldDim(spark, dir, delta, spec)
    val want = scratch.map {
      case (f, 10L, v, _, _) => (f, 10L, v, "a2", 111.0)
      case other => other
    }
    assert(snap(dir) === want)
  }

  test("re-delivered fact fold is invisible; unknown dim key drops then heals") {
    val dir = tmp("jv-redeliver")
    JoinView.init(spark, dir, df(facts0), ddf(dim0), spec)
    val before = snap(dir)
    // crash-and-re-run: the same batch upserts identical rows
    JoinView.foldFacts(spark, dir, df(facts0), ddf(dim0), spec)
    assert(snap(dir) === before)

    // a fact with an unknown dim key is dropped (inner join)…
    val orphan = Seq((9L, 99L, 9.0))
    JoinView.foldFacts(spark, dir, df(orphan), ddf(dim0), spec)
    assert(snap(dir) === before)
    // …and heals on refold once the dim catches up
    val dim1 = dim0 :+ ((99L, "z", 900.0))
    JoinView.foldFacts(spark, dir, df(orphan), ddf(dim1), spec)
    assert(snap(dir) === before + ((9L, 99L, 9.0, "z", 900.0)))
  }

  test("dup-keyed deltas are rejected before the commit, never silently duplicated") {
    val dir = tmp("jv-dup")
    JoinView.init(spark, dir, df(facts0), ddf(dim0), spec)
    val before = snap(dir)
    // a dim delta delivered with two versions of one dkey fans the
    // re-enrich join out into two U rows per affected fact key
    val e1 = intercept[IllegalArgumentException] {
      JoinView.foldDim(spark, dir, ddf(Seq((10L, "x", 1.0), (10L, "y", 2.0))), spec)
    }
    assert(e1.getMessage.contains("multiple non-D rows"))
    // a fact batch carrying the same fact key twice
    val e2 = intercept[IllegalArgumentException] {
      JoinView.foldFacts(spark, dir, df(Seq((7L, 10L, 7.0), (7L, 10L, 7.5))),
        ddf(dim0), spec)
    }
    assert(e2.getMessage.contains("multiple non-D rows"))
    // …and a dim whose join key is not unique fans init/foldFacts out
    val e3 = intercept[IllegalArgumentException] {
      JoinView.foldFacts(spark, dir, df(Seq((8L, 10L, 8.0))),
        ddf(dim0 :+ ((10L, "dup", 0.0))), spec)
    }
    assert(e3.getMessage.contains("multiple non-D rows"))
    assert(snap(dir) === before) // store untouched by all three
  }

  test("partitioned store: a fact fold rewrites only its partitions") {
    val dir = tmp("jv-part")
    val pspec = spec.copy(partCol = Some("pday"))
    def pdf(rows: Seq[(Long, Long, Double)], day: String) =
      df(rows).withColumn("pday", lit(day))

    JoinView.init(spark, dir, pdf(facts0, "d1"), ddf(dim0), pspec)
    val d1Gen = Merge.snapshotVersions(spark, dir).max

    JoinView.foldFacts(spark, dir, pdf(facts1, "d2"), ddf(dim0), pspec)
    // the d1 partition's files were not rewritten by the d2 fold
    val files = JoinView.read(spark, dir).inputFiles
    assert(files.exists(_.contains("pday=d1")) &&
      files.exists(_.contains("pday=d2")))
    assert(files.filter(_.contains("pday=d1"))
      .forall(_.contains(s"g-${"%012d".format(d1Gen)}")))

    val got = JoinView.read(spark, dir)
      .select("fid", "dkey", "v", "dname", "dval", "pday")
      .as[(Long, Long, Double, String, Double, String)].collect().toSet
    val want = df(facts0).withColumn("pday", lit("d1"))
      .unionByName(df(facts1).withColumn("pday", lit("d2")))
      .join(ddf(dim0), Seq("dkey"))
      .select("fid", "dkey", "v", "dname", "dval", "pday")
      .as[(Long, Long, Double, String, Double, String)].collect().toSet
    assert(got === want)
  }
}
