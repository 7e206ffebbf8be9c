package graft.streaming

import graft.SparkSuite
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE SYSTEM AS A SYSTEM: the composed ingest→serve chain
  * ([[PipelineE2E]]) run end to end on sf0.001, every terminal table
  * pinned EXACTLY against the batch twin over the same input —
  * composition is what this spec owns; each stage's arrival-order and
  * restart semantics live in that stage's own suite.
  *
  * Corpus choice: fp-rank-1 docs only (content-unique). Within a single
  * drained micro-batch `dropDuplicatesWithinWatermark`'s survivor is
  * partition-order-dependent (CurationComposedStreamSpec's subject, and
  * pinned there with a multi-batch fixture); a content-unique corpus
  * makes every downstream table deterministic so the CHAIN can be
  * hash-exact. Gate-failing docs (< 20 tokens) stay in — the CDC and
  * curation stages must do their real work.
  */
class PipelineE2ESpec extends SparkSuite {

  private val Cap = 18
  private val Budget = 2000L

  /** content-unique corpus: min doc_id per fingerprint class. */
  private def uniqueDocs: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.Tables.load(spark, sf0001, "documents")
      .withColumn("rk", row_number().over(
        Window.partitionBy(TextFns.fingerprint(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
  }

  test("composed chain: every terminal table equals its batch twin") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e").toFile.getAbsolutePath
    try {
      val docs = uniqueDocs.localCheckpoint()
      val stages = PipelineE2E.run(spark, docs, root, sf0001,
        cap = Cap, budget = Budget, nprobe = 16)
      val rows = stages.map(s => s.name -> s.rowsOut).toMap

      // ---- stage sanity: depth-replicated ops in, deduped ops out ----
      val nDocs = docs.count()
      val depthOf: Long => Long = id => if (id % 2 == 0) 3L else 2L
      val wantOps = docs.select($"doc_id").as[Long].collect().map(depthOf).sum
      assert(rows("fixture") == wantOps, s"fixture ops ${rows("fixture")} != $wantOps")
      assert(rows("ingest") == nDocs, s"quorum dedup must emit once per doc: ${rows("ingest")} != $nDocs")

      // ---- apply: materialized store == the corpus that entered CDC ----
      // read via the leaf-dir glob (each epoch dir its own root): reading
      // the parent would partition-discover `batch=` and append a 5th col
      val applied = spark.read.schema(PipelineE2E.docSchema)
        .parquet(PipelineE2E.docsGlob(root))
      assert(applied.count() == nDocs)
      assert(applied.exceptAll(docs).isEmpty && docs.exceptAll(applied).isEmpty,
        "materialized document store drifted from the CDC input corpus")

      // ---- curation: gate → (no-op dedup) → cap → split, exact ----
      import org.apache.spark.sql.expressions.Window
      val gated = docs.select($"doc_id", $"source", $"lang",
          size(TextFns.tokens($"text")).cast("long").as("n_tokens"),
          md5($"doc_id".cast("string")).as("mh"))
        .filter($"n_tokens" >= CurationStream.QualityMinTokens)
      val batchCurated = gated
        .withColumn("cap_rk", row_number().over(
          Window.partitionBy($"source").orderBy($"mh", $"doc_id")))
        .filter($"cap_rk" <= Cap)
        .withColumn("h2", substring($"mh", 1, 2))
        .select($"doc_id", $"source", $"lang", $"n_tokens",
          when($"h2" < "cd", "train").when($"h2" < "e6", "val")
            .otherwise("test").as("split"))
      val curated = spark.read.schema(PipelineE2E.curatedSchema).parquet(s"$root/curated")
      assert(curated.exceptAll(batchCurated).isEmpty &&
        batchCurated.exceptAll(curated).isEmpty,
        "curated manifest != batch gate→cap→split replay")
      // both cap branches must be exercised for the pin to mean anything
      val perSource = gated.groupBy($"source").count().as[(String, Long)].collect()
      assert(perSource.exists(_._2 > Cap) && perSource.exists(_._2 <= Cap),
        "fixture no longer exercises both cap branches")

      // ---- budget: admitted == batch 2-phase selection over curated ----
      val curatedBase = graft.operators.Pipeline.budgetBaseFrom(
        curated.select($"doc_id", $"lang")
          .join(applied.select($"doc_id", $"text"), "doc_id")).localCheckpoint()
      val batchAdmit = graft.operators.Pipeline.budgetSelect2Phase(curatedBase, Budget)
      val admitted = spark.read.schema(PipelineE2E.admitSchema).parquet(s"$root/admitted")
      assert(admitted.exceptAll(batchAdmit).isEmpty &&
        batchAdmit.exceptAll(admitted).isEmpty,
        "admitted manifest != batch budgetSelect2Phase over the curated corpus")
      assert(admitted.count() > 0 && admitted.count() < curated.count(),
        "budget must admit a strict non-empty subset for the pin to bite")

      // ---- pack: layout (read back THROUGH the index sink) == batch FFD ----
      val layout = spark.read.json(s"$root/layout/ffd")
        .select($"data.doc_id", $"data.lang", $"data.n_tokens",
          $"data.bin_first", $"data.bin_last")
      val batchLayout = graft.operators.Pipeline.packFfdLayoutFrom(
        admitted.select($"doc_id", $"lang", $"n_tokens"))
      assert(layout.exceptAll(batchLayout).isEmpty &&
        batchLayout.exceptAll(layout).isEmpty,
        "published FFD layout != batch packFfdLayout over the admitted set")

      // ---- serve: retrieve→MMR over THE ADMITTED CORPUS — the loop the
      // chain closes. nprobe = 16 = C covers every cell, so the driver
      // replay is brute force over the admitted vectors through the
      // exact streamed kernel (same fold order, same HALF_UP micros) ----
      val served = spark.read.parquet(s"$root/served")
        .select($"qid", $"step", $"vec_id", $"mmr_score")
      val vecs: Map[Long, Array[Double]] =
        graft.Tables.load(spark, sf0001, "embeddings")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
          .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
      def nrm(v: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.sqrt(s)
      }
      val admittedIds = admitted.select($"doc_id").as[Long].collect().toSet
      val wantServe = (0L until 8L).flatMap { qid =>
        val qv = vecs(qid); val qn = nrm(qv)
        val cands = admittedIds.toSeq.filter(_ != qid).sorted.map { id =>
          val v = vecs(id); val n = nrm(v)
          var s = 0.0; var i = 0
          while (i < v.length) { s += qv(i) * v(i); i += 1 }
          MmrCand(qid, id, s / (qn * n), v, n)
        }
        MmrServeStream.rerank(qid, cands.iterator, 20, 5)
      }.map(h => (h.qid, h.step, h.vec_id, h.mmr_score))
        .toDF("qid", "step", "vec_id", "mmr_score")
      assert(served.exceptAll(wantServe).isEmpty &&
        wantServe.exceptAll(served).isEmpty,
        "served MMR selection != kernel replay over the admitted corpus")
      // nothing outside the admitted corpus is ever served
      assert(served.filter(!$"vec_id".isin(admittedIds.toSeq: _*)).isEmpty)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }
}
