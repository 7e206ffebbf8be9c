package graft.operators

import graft.SparkSuite
import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixture-coverage gate for the MinHash-band candidate generation
  * (round-8 ADVICE): `dedup_minhash_lsh` (and through the materialized
  * label table, `dedup_labels` / `split_leakage_safe` /
  * `mix_dedup_weighted` / `dedup_survivors` / `dedup_cluster_stats`)
  * and `dedup_snapshot_neardup` emit band-join candidates verified by
  * exact Jaccard, while their DuckDB oracles compute the exact
  * all-pairs set. The 16×4 banding misses a qualifying pair with
  * probability (1-j^4)^16 — ~3e-2 at the j = 1/2 verification
  * threshold, ~4e-9 at planted near-dup similarity — so a REGENERATED
  * fixture could in principle plant a just-over-threshold pair the
  * bands skip, and the first symptom would be an opaque oracle hash
  * mismatch in the driver gate. This spec asserts the superset
  * property directly on both fixture scales the gates use (sf0.001
  * for ScalaTest, sf0.01 for the driver's DuckDB gate), so a
  * coverage-breaking fixture fails HERE with the missing pairs named.
  */
class BandCoverageSpec extends SparkSuite {
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** exact qualifying pairs (3·|∩| ≥ n1+n2, i.e. Jaccard ≥ 1/2) within
    * one (doc_id, text) frame — the oracle's inverted-index join,
    * re-expressed in Spark. */
  private def exactSelfPairs(d: DataFrame): Set[(Long, Long)] = {
    val sh = d.select($"doc_id", TextFns.shingleSet($"text").as("sh"))
      .filter(size($"sh") > 0)
    val ex = sh.select($"doc_id", size($"sh").as("n"), explode($"sh").as("s"))
    ex.as("a").join(ex.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"), $"a.n".as("n1"), $"b.n".as("n2"))
      .groupBy($"d1", $"d2")
      .agg(count(lit(1)).as("inter"), first($"n1").as("n1"), first($"n2").as("n2"))
      .filter($"inter" * 3 >= $"n1" + $"n2")
      .select($"d1", $"d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** the band-join candidate pairs the operator would verify. */
  private def bandSelfCandidates(d: DataFrame): Set[(Long, Long)] = {
    val bands = Dedup.minhashBandRows(spark, d)
    bands.as("x")
      .join(bands.as("y"),
        $"x.b" === $"y.b" && $"x.bh" === $"y.bh" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("16x4 band candidates cover the exact pair set on every gate fixture " +
      "(dedup_minhash_lsh and all label-table consumers)") {
    dirs.foreach { dir =>
      val d = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
      val exact = exactSelfPairs(d)
      assert(exact.nonEmpty, s"$dir: fixture should contain planted near-dups")
      val missed = exact -- bandSelfCandidates(d)
      assert(missed.isEmpty,
        s"$dir: the regenerated fixture plants qualifying pairs the 16x4 MinHash " +
          s"banding does not produce as candidates: $missed. This is the known " +
          "~3e-2-per-pair band miss at the j=1/2 threshold, NOT a code bug — " +
          "dedup_minhash_lsh, dedup_labels, split_leakage_safe, " +
          "mix_dedup_weighted, dedup_survivors and dedup_cluster_stats will " +
          "hash-mismatch their exact all-pairs DuckDB oracles until the banding " +
          "is widened (more bands / fewer rows per band) for this fixture.")
    }
  }

  test("band candidates cover the exact pair set of the REVISED v2 snapshot " +
      "(dedup_labels_incremental's full-relabel oracle)") {
    dirs.foreach { dir =>
      val d = Tables.load(spark, dir, "documents")
      val bk = substring(md5($"doc_id".cast("string")), 1, 1)
      val v2 = d.filter(!bk.isin("0", "f", "1", "2")).select($"doc_id", $"text")
        .unionAll(d.filter(bk.isin("f", "1", "2"))
          .select($"doc_id",
            when(bk.isin("1", "2"), concat($"text", lit(" rev2")))
              .otherwise($"text").as("text")))
      val exact = exactSelfPairs(v2)
      assert(exact.nonEmpty, s"$dir: v2 snapshot should contain near-dups")
      val missed = exact -- bandSelfCandidates(v2)
      assert(missed.isEmpty,
        s"$dir: v2 qualifying pairs missed by the banding: $missed — " +
          "dedup_labels_incremental will hash-mismatch its exact oracle " +
          "(band miss, not a code bug).")
    }
  }

  test("cross-snapshot band candidates cover the exact v1-vs-fresh pair set " +
      "(dedup_snapshot_neardup)") {
    dirs.foreach { dir =>
      val d = Tables.load(spark, dir, "documents")
      // the snapshotNeardup v1 / fresh derivation, verbatim
      val h = substring(md5($"doc_id".cast("string")), 1, 1)
      val v1 = d.filter(h =!= "f").select($"doc_id", $"text")
      val fresh = d.filter(h.isin("f", "1", "2"))
        .select($"doc_id",
          when(h.isin("1", "2"), concat($"text", lit(" rev2")))
            .otherwise($"text").as("text"))
      def ex(side: DataFrame) = side
        .select($"doc_id", TextFns.shingleSet($"text").as("sh"))
        .filter(size($"sh") > 0)
        .select($"doc_id", size($"sh").as("n"), explode($"sh").as("s"))
      val exact = ex(fresh).as("f").join(ex(v1).as("p"), $"f.s" === $"p.s")
        .select($"f.doc_id".as("new_id"), $"p.doc_id".as("prev_id"),
          $"f.n".as("n2"), $"p.n".as("n1"))
        .groupBy($"new_id", $"prev_id")
        .agg(count(lit(1)).as("inter"), first($"n1").as("n1"), first($"n2").as("n2"))
        .filter($"inter" * 3 >= $"n1" + $"n2")
        .select($"new_id", $"prev_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty, s"$dir: snapshot fixture should contain cross-version near-dups")
      val pb = Dedup.minhashBandRows(spark, v1).select($"doc_id".as("prev_id"), $"b", $"bh")
      val fb = Dedup.minhashBandRows(spark, fresh).select($"doc_id".as("new_id"), $"b", $"bh")
      val cand = fb.join(pb, Seq("b", "bh"))
        .select($"new_id", $"prev_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val missed = exact -- cand
      assert(missed.isEmpty,
        s"$dir: cross-snapshot qualifying pairs missed by the band index: $missed. " +
          "dedup_snapshot_neardup will hash-mismatch its exact oracle until the " +
          "banding is widened for this fixture (band miss, not a code bug).")
    }
  }
}
