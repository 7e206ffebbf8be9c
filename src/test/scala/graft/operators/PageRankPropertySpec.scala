package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property for the exact-integer PageRank walk
  * ([[VectorSearch.pageRankWalk]]): for ANY random undirected
  * multigraph, BOTH hybrid paths (driver fast walk, forced distributed
  * rounds) must equal a reference driver replay bit-for-bit — the
  * integer formulation's whole point is that parallelism and
  * aggregation order cannot change the answer, so any divergence is a
  * real defect, never float noise. Multi-edges are legal and act as
  * weights (degree counts them; contributions repeat). */
object PageRankPropertySpec extends Properties("PageRankWalk") {

  // each iteration runs 10 distributed join+agg rounds; 8 graphs over
  // sparse and clumped regimes cover the shape space
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.GraftSession.local(4)

  private val gen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    m <- Gen.choose(1, 80)
    dense <- Gen.oneOf(n, math.max(2, n / 4))
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, dense - 1)
      b <- Gen.choose(0, dense - 1) if a != b   // no self-loops in a kNN graph
    } yield (a.toLong, b.toLong))
  } yield edges

  property("both hybrid paths equal the exact integer reference replay") =
    Prop.forAll(gen) { halfEdges =>
      import spark.implicits._
      val und = halfEdges ++ halfEdges.map { case (a, b) => (b, a) }
      // reference replay
      val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      var rank = deg.keys.map(_ -> 1000000L).toMap
      (1 to 10).foreach { _ =>
        val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        und.foreach { case (a, b) => in(b) += rank(a) / deg(a) }
        rank = in.map { case (v, s) => v -> (150000L + (85L * s) / 100L) }.toMap
      }
      val fast = VectorSearch.pageRankWalk(spark, und.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set("graft.vector.pagerank.localEdgeThreshold", "0")
      val dist =
        try VectorSearch.pageRankWalk(spark, und.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally spark.conf.unset("graft.vector.pagerank.localEdgeThreshold")
      val ok = fast == rank && dist == rank
      if (!ok) println(s"MISMATCH n=${deg.size} m=${und.size}\n" +
        s" want=$rank\n fast=$fast\n dist=$dist")
      ok
    }
}
