package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property for the star-contraction connected components —
  * the algorithm every clustering, labeling, and image-dedup operator
  * stands on: for ANY random multigraph (self-loops, duplicate and
  * reversed edges, stars, chains, dense blobs, sparse forests), the
  * distributed [[Dedup.connectedComponentsStar]] must produce exactly
  * the components of a driver-side union-find, with every vertex
  * labeled by its component minimum. The fixture suites pin specific
  * shapes (deep chain, forest, empty); this drives the algorithm over
  * the space of graphs those shapes don't cover. */
object CCPropertySpec extends Properties("StarCC") {

  // each iteration is a full iterative Spark job; 12 random graphs over
  // three density regimes cover far more shape variety than the
  // default 100 would add
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = graft.GraftSession.local(4)

  private val gen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 60)                      // vertex id space
    m <- Gen.choose(1, 120)                     // edge count
    dense <- Gen.oneOf(n, math.max(2, n / 4))   // sparse vs clumped ids
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, dense - 1)
      b <- Gen.frequency(
        (8, Gen.choose(0, dense - 1)),
        (1, Gen.const(a)))                      // forced self-loops
    } yield (a.toLong, b.toLong))
  } yield edges

  property("labels equal a driver union-find's min-labeled components") =
    Prop.forAll(gen) { edges =>
      import spark.implicits._
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val want = verts.map(v => v -> find(v)).toMap
      // default dial: these graphs take the driver union-find fast path
      val (labFast, roundsFast) = Dedup.connectedComponentsStar(
        spark, edges.toDF("x", "y"))
      val gotFast = labFast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // threshold 0: force the DISTRIBUTED contraction on the same graph
      spark.conf.set("graft.dedup.cc.localEdgeThreshold", "0")
      val (labDist, rounds) =
        try Dedup.connectedComponentsStar(spark, edges.toDF("x", "y"))
        finally spark.conf.unset("graft.dedup.cc.localEdgeThreshold")
      val gotDist = labDist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ok = gotFast == want && gotDist == want && roundsFast == 0
      if (!ok) println(s"[ccprop] edges=$edges\n  fast=$gotFast\n  dist=$gotDist\n  want=$want")
      // rounds must stay in the contraction class, not the diameter class
      ok && rounds <= 25
    }
}
