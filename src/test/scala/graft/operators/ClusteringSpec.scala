package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Assignment must be nearest-centroid (verified against a driver-side
  * brute force on the same centroid pick), and the profile must cover
  * every vector exactly once. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("every vector lands on its max-cosine centroid (brute-force cross-check)") {
    val df = corpus(80, 8)
    val assigned = Clustering.assign(df, k = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // recompute nearest centroid on the driver from the same data
    val vecs = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); if (n == 0) v else v.map(_ / n)
    }
    val centers = vecs.toSeq
      .sortBy { case (id, _) =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes).map("%02x".format(_)).mkString, id)
      }
      .take(4).map(_._2).map(unit).zipWithIndex
    vecs.foreach { case (id, v) =>
      val u = unit(v)
      val best = centers.map { case (c, lid) =>
        (c.zip(u).map { case (a, b) => a * b }.sum, lid)
      }.maxBy { case (d, lid) => (d, lid) }._2
      assert(assigned(id) === best, s"vec $id")
    }
  }

  test("profile covers the corpus: sizes sum to n, shares sum to ~1, cohesion in [-1,1]") {
    val df = corpus(120, 8)
    val prof = Clustering.profile(df, k = 4).collect()
    assert(prof.map(_.getAs[Long]("n")).sum === 120L)
    val shares = prof.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 0.01, s"shares sum $shares")
    prof.foreach { r =>
      val c = r.getAs[Double]("avg_cos")
      assert(c >= -1.0001 && c <= 1.0001, s"avg_cos $c")
    }
  }
}
