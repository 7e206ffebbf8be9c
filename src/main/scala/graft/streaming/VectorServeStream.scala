package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A query vector routed to one probe cell (exploded ×nprobe). */
case class ProbedQuery(qid: Long, qv: Array[Double], qnrm: Double, cell: Int)

/** One served result row: top-k rank for an arriving query. */
case class ServedHit(qid: Long, rn: Int, vec_id: Long, cos: Double)

/** STREAMING ANN serving: arriving query vectors answered with exact
  * IVF-flat top-k against the STATIC corpus — the online form of
  * `vector_ann_ivf_flat` (operators/VectorSearch.scala), bit-identical
  * to the batch path for the same queries.
  *
  * Shape: coarse centroids are collected ONCE at stream construction
  * (16 rows — the codebook is driver-sized by design) and probe
  * assignment is a STATELESS mapPartitions over the arriving batch
  * (same sequential-fold float arithmetic as the `dot_product`
  * Catalyst expression, so scores agree bitwise). Candidates come from
  * a cell-keyed STREAM-STATIC equi-join against the cell-assigned
  * corpus — each micro-batch reads only the probed cells' rows, never
  * the full corpus — and per-query top-k folds the candidate iterator
  * through a bounded insertion buffer in `flatMapGroupsWithState`
  * (state: none kept — every query is answered within its own batch;
  * the stateful operator is used for its per-key iterator, the
  * streaming-legal form of the batch path's rank window).
  *
  * At 100 TB: the static side is the bucketed/partitioned codes or
  * embeddings table; the per-batch scan term is nprobe/C of it, the
  * same serve economics as the batch IVF path, with query admission
  * riding the connector's backpressure dials. */
object VectorServeStream {

  /** The shared retrieve front half: cell-assigned static corpus
    * (persisted) + the arriving queries routed to their `nprobe`
    * nearest coarse cells (stateless mapPartitions over a collected,
    * driver-sized codebook — same float fold as the batch path). */
  private[streaming] def probeWithCorpus(queries: DataFrame, dir: String,
      nprobe: Int): (Dataset[ProbedQuery], DataFrame, Int) = {
    val spark = queries.sparkSession
    import spark.implicits._
    val (assigned, cents) = graft.operators.VectorSearch.ivfFlatAssign(spark, dir)
    val corpus = assigned.select($"cell", $"vec_id", $"v", $"nrm").persist()
    val centArr: Array[(Int, Array[Double])] = cents.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    // centArr.length is the authoritative cell count — consumers that
    // scale by C (the balance monitor's load factor) must derive it here
    // rather than re-stating the codebook-size dial.
    (probeQueries(queries, centArr, nprobe), corpus, centArr.length)
  }

  /** Route arriving query vectors to their `nprobe` nearest coarse
    * cells: a stateless mapPartitions over the broadcast-by-closure
    * driver-sized codebook, the same sequential float fold as the
    * `dot_product` expression (scores agree bitwise with the batch
    * path). Shared by the fixture-corpus serves (via
    * [[probeWithCorpus]]) and the chain-corpus serve
    * ([[MmrServeStream.serveChainRefreshed]], whose codebook is
    * re-derived per admitted epoch). */
  private[streaming] def probeQueries(queries: DataFrame,
      centArr: Array[(Int, Array[Double])],
      nprobe: Int): Dataset[ProbedQuery] = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries
      .select($"vec_id",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (qid, qv) =>
          var s = 0.0
          var i = 0
          while (i < qv.length) { s += qv(i) * qv(i); i += 1 }
          val qnrm = math.sqrt(s)
          centArr.map { case (cell, c) =>
            var cc = 0.0
            var qc = 0.0
            var j = 0
            while (j < c.length) { cc += c(j) * c(j); qc += qv(j) * c(j); j += 1 }
            (cc - 2.0 * qc, cell)
          }.sortBy(identity).take(nprobe)
            .map { case (_, cell) => ProbedQuery(qid, qv, qnrm, cell) }
        }
      }
  }

  /** L2 norm, the probe/kernel sequential fold. */
  private[streaming] def normOf(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** Nearest coarse cell of `v` under `centArr` — argmin of
    * c·c − 2·v·c with ties to the LOWER cell, the same float fold and
    * tie rule as [[probeQueries]] (probe and corpus must agree on
    * geometry). Returns −1 on an empty codebook. */
  private[streaming] def cellOf(centArr: Array[(Int, Array[Double])],
      v: Array[Double]): Int = {
    var bestCell = -1
    var bestScore = Double.MaxValue
    centArr.foreach { case (cell, c) =>
      var cc = 0.0
      var vc = 0.0
      var j = 0
      while (j < c.length) { cc += c(j) * c(j); vc += v(j) * c(j); j += 1 }
      val score = cc - 2.0 * vc
      if (score < bestScore) { bestScore = score; bestCell = cell }
    }
    bestCell
  }

  /** Content-addressed coarse codebook COLLECTED from a parquet
    * embeddings table: the `nCells` lowest vec_ids (the
    * `vector_ann_ivf_flat` random-sample-init discipline) — the
    * driver-sized PARAMETER form the admit-time-indexed chain takes at
    * start, exactly as a deployment ships the previous snapshot's
    * codebook (refresh on drift is the retrain loop's job, not the
    * ingest path's). */
  private[graft] def codebookFrom(spark: SparkSession, path: String,
      nCells: Int = 16): Array[(Int, Array[Double])] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select($"vec_id",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .orderBy($"vec_id").limit(nCells)
      .as[(Long, Array[Double])].collect()
      .sortBy(_._1).map(_._2).zipWithIndex.map { case (c, i) => (i, c) }
  }

  def serve(queries: DataFrame, dir: String, k: Int = 10,
      nprobe: Int = 2): Dataset[ServedHit] = {
    val spark = queries.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftexpr.VectorFunctions.dot_product
    val (probed, corpus, _) = probeWithCorpus(queries, dir, nprobe)
    val cand = probed.toDF()
      .join(corpus, Seq("cell"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        (dot_product($"qv", $"v") / ($"qnrm" * $"nrm")).as("cos"))
      .as[(Long, Long, Double)]
    cand.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[Long]) =>
          val top = rows.map { case (_, v, c) => (v, c) }.toArray
            .sortBy { case (v, c) => (-c, v) }.take(k)
          top.iterator.zipWithIndex.map { case ((v, c), i) =>
            ServedHit(qid, i + 1, v, c)
          }
      }
  }
}
