package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.SparkSpec

/** The two connected-components algorithms must agree with each other
  * and with a driver-side union-find oracle on random graphs — including
  * the path graphs that stress large-star/small-star's O(log n) claim. */
object ComponentsProperties extends Properties("components") {

  private lazy val spark = SparkSpec.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val edgeGen: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(0L, 30L)
    b <- Gen.chooseNum(0L, 30L) if a != b
  } yield (a, b)

  /** Driver-side union-find ground truth. */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(f: (org.apache.spark.sql.DataFrame, String, String) => org.apache.spark.sql.DataFrame,
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    f(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
  }

  property("label propagation matches union-find on random graphs") =
    Prop.forAll(Gen.listOfN(25, edgeGen)) { edges =>
      edges.isEmpty || run(Dedup.connectedComponents(_, _, _), edges) == oracle(edges)
    }

  // the size gate routes small graphs (every graph above) through the
  // LOCAL union-find; these two pin the DISTRIBUTED loop explicitly so
  // both paths stay property-covered, and assert path-equivalence
  property("the distributed loop (fast path disabled) matches union-find") =
    Prop.forAll(Gen.listOfN(25, edgeGen)) { edges =>
      edges.isEmpty ||
        run(Dedup.connectedComponents(_, _, _, localMaxEdges = 0), edges) ==
          oracle(edges)
    }

  property("local fast path ≡ distributed loop on random graphs") =
    Prop.forAll(Gen.listOfN(25, edgeGen)) { edges =>
      edges.isEmpty ||
        run(Dedup.connectedComponents(_, _, _), edges) ==
          run(Dedup.connectedComponents(_, _, _, localMaxEdges = 0), edges)
    }

  property("large-star/small-star matches union-find on random graphs") =
    Prop.forAll(Gen.listOfN(25, edgeGen)) { edges =>
      edges.isEmpty || run(Dedup.connectedComponentsStar(_, _, _), edges) == oracle(edges)
    }

  property("incremental fold of a random edge split matches from-scratch CC") =
    Prop.forAll(Gen.listOfN(25, edgeGen), Gen.listOfN(10, edgeGen)) {
      (hist, fresh) =>
        import spark.implicits._
        (hist.isEmpty || fresh.isEmpty) || {
          val labels = Dedup.connectedComponents(
            hist.toDF("id_a", "id_b"), "id_a", "id_b")
          val got = Dedup.incrementalComponents(
              labels, fresh.toDF("id_a", "id_b"))
            .as[(Long, Long)].collect().toMap
          got == oracle(hist ++ fresh)
        }
    }

  property("both algorithms agree on a path graph (the worst case for propagation)") = {
    val path = (0L until 16L).map(i => (i, i + 1)).toSeq
    val want = (0L to 16L).map(_ -> 0L).toMap
    Prop(run(Dedup.connectedComponents(_, _, _, localMaxEdges = 0), path) == want &&
      run(Dedup.connectedComponents(_, _, _), path) == want &&
      run(Dedup.connectedComponentsStar(_, _, _), path) == want)
  }

  property("reliable (dir-backed) checkpointing matches union-find") = {
    // production mode: per-round snapshots go to the context's
    // checkpoint dir (survive executor loss) instead of local blocks
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val path = (0L until 12L).map(i => (i, i + 1)).toSeq
    val want = (0L to 12L).map(_ -> 0L).toMap
    val ok = // localMaxEdges = 0: the reliable mode only exists on the
      // distributed loop, so pin that path explicitly
      run(Dedup.connectedComponents(_, _, _, 20, reliable = true,
        localMaxEdges = 0), path) == want &&
        run(Dedup.connectedComponentsStar(_, _, _, 30, reliable = true), path) == want
    Prop(ok)
  }
}
