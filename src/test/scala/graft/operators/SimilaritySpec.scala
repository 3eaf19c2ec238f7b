package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sf0001, "embeddings")

  test("bruteForceTopK returns k ranked neighbors per query") {
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
    val byQ = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(byQ.keySet === Set(0L, 1L, 2L))
    assert(byQ.values.forall(_ === 5L))
    // ranks are 1..k and cos is non-increasing within a query
    val q0 = out.filter(col("query_id") === 0).orderBy("rank")
      .select("cos").as[Double].collect()
    assert(q0.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("ivfTopK: one list per item (no duplicate candidates), sane recall") {
    val queries = emb.filter(col("vec_id") < 3)
    val out = Similarity.ivfTopK(emb, queries, k = 5, nlist = 4, nprobe = 4)
    // nprobe = nlist ⇒ exhaustive probing ⇒ identical to brute force
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().toSet
    val got = out.select("query_id", "item_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === exact)
    // pairs are unique even with multi-probe
    val pairs = out.select("query_id", "item_id").as[(Long, Long)].collect()
    assert(pairs.length === pairs.distinct.length)
  }

  test("lshTopK recall: approximate top-1 appears in exact top-5") {
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "item_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.lshTopK(emb, queries, k = 1, bits = 4, tables = 8)
      .select("query_id", "item_id").as[(Long, Long)].collect()
    // LSH is approximate: require each returned top-1 to be a plausible
    // neighbor (member of the exact top-5) for at least 2 of 3 queries
    val hits = approx.count { case (q, i) => exact(q).contains(i) }
    assert(hits >= 2, s"approx=${approx.toSeq} exact=$exact")
  }
}
