package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** [[Dedup.duplicateClusters]] must equal union-find connected components
  * on ARBITRARY edge lists — not just the near-clique shapes duplicate
  * corpora usually produce. Random sparse graphs cover multi-component
  * mixes; the path graph is the adversarial diameter case (min-label
  * propagation needs ~diameter rounds, so a silent iteration cap returns
  * wrong clusters exactly there).
  */
class ClustersPropSpec extends SparkSpec {

  /** Scalar union-find ground truth → (vertex → component-min). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  /** None = exercise the library's own default cap. */
  private def clustersOf(edges: Seq[(Long, Long)],
      maxIter: Option[Int] = None): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("id_a", "id_b")
    maxIter.fold(Dedup.duplicateClusters(df))(Dedup.duplicateClusters(df, _))
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("duplicateClusters ≡ union-find on 15 random sparse graphs") {
    val edgeGen = Gen.listOfN(40, for {
      a <- Gen.choose(0L, 29L)
      b <- Gen.choose(0L, 29L)
    } yield (a, b)).map(_.filter { case (a, b) => a != b })
    (1 to 15).foreach { i =>
      val edges = edgeGen.sample.get
      if (edges.nonEmpty)
        assert(clustersOf(edges) == unionFind(edges), s"CC divergence on case $i")
    }
  }

  test("duplicateClusters: long path fails loudly at a tight cap, never silently wrong") {
    // diameter 29 > an explicit cap of 10: label propagation CANNOT
    // finish. The contract is a loud error (caller raises maxIter), not
    // wrong clusters that downstream keep-one-per-cluster would act on.
    val path = (0L until 29L).map(i => (i, i + 1))
    val loud = intercept[IllegalStateException] { clustersOf(path, Some(10)) }
    assert(loud.getMessage.contains("maxIter"),
      s"error must name the knob: ${loud.getMessage}")
    // the DEFAULT backstop must absorb this chain (stationarity exits
    // early, so the higher default costs converged graphs nothing)
    assert(clustersOf(path) == unionFind(path),
      "path graph must collapse to a single min-labeled component")
  }
}
