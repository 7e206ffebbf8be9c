package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Deduplication operators over the `documents` table — the
  * training-data-pipeline family: exact (content hash), exact-Jaccard
  * set similarity, MinHash+LSH banding, and SimHash.
  *
  * Scale design (100 TB):
  *  - exact dedup is a single hash aggregation (map-side combined);
  *  - the Jaccard joins go through an inverted shingle index
  *    (explode → equi-join on shingle) — never an O(n²) cross join;
  *  - MinHash replaces the full inverted index with 64 LSH band keys
  *    per document, so the self-join key space is tiny and collisions
  *    are candidate pairs only (ICDE 2020 "Distributed Streaming Set
  *    Similarity Join" banding pattern, per PAPERS.md);
  *  - SimHash reduces each document to one 64-bit signature and joins
  *    on 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal).
  *
  * Float-free verification: Jaccard(j) ≥ 1/2 is tested as
  * `3*inter ≥ n1+n2` in exact integer arithmetic, so the DuckDB oracle
  * matches bit-for-bit with no FP-rounding hazard.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** MinHash sketch width (64 hashes = 16 bands × 4 rows). */
  private[graft] val MinHashK = 64
  private val MinHashSeeds: Array[Long] =
    Array.tabulate(MinHashK)(i => 0x9e3779b97f4a7c15L * (i + 1))

  /** FNV-1a 64-bit string fingerprint (public-domain algorithm). */
  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 finalizer (public-domain algorithm) — the per-seed
    * "permutation" applied to a shingle fingerprint. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** text → 64-wide MinHash sketch over distinct 3-word shingles, one
    * tight pass, no intermediate arrays beyond the shingle-dedup set.
    * Must shingle exactly like [[TextFns.shingleSet]] (space-tokenize,
    * drop empties, space-join 3-grams) so candidate verification and
    * the exact oracle agree on the underlying sets. */
  private[graft] def sketchText(text: String): Option[Array[Long]] = {
    if (text == null) return None   // match string_split(NULL) row-drop
    val toks = text.split(' ').filter(_.nonEmpty)
    if (toks.length < 3) return None
    val seen = new java.util.HashSet[String]()
    val mh = Array.fill(MinHashK)(Long.MaxValue)
    var p = 0
    while (p + 2 < toks.length) {
      val sstr = toks(p) + " " + toks(p + 1) + " " + toks(p + 2)
      if (seen.add(sstr)) {
        val f = fnv1a64(sstr)
        var i = 0
        while (i < MinHashK) {
          val h = splitmix64(f + MinHashSeeds(i))
          if (h < mh(i)) mh(i) = h
          i += 1
        }
      }
      p += 1
    }
    Some(mh)
  }

  /** text → SORTED distinct 3-shingle FNV-1a fingerprints, one tight
    * pass (tokenize, shingle, hash, dedup) — the same kernel pattern as
    * [[sketchText]]. Shingle identity travels as an 8-byte long instead
    * of a ~30-byte string, so the inverted index, the window sort, the
    * candidate equi-join and the verification intersections all move
    * 4× less data; the set sizes (what the oracle checks) are identical
    * to the string sets barring a 64-bit collision among the corpus's
    * distinct shingles (≈ d²/2⁶⁵ — vanishing). */
  private[graft] def shingleHashes(text: String): Option[Array[Long]] = {
    if (text == null) return None   // match string_split(NULL) row-drop
    val toks = text.split(' ').filter(_.nonEmpty)
    if (toks.length < 3) return None
    val set = new java.util.TreeSet[java.lang.Long]()
    var p = 0
    while (p + 2 < toks.length) {
      set.add(fnv1a64(toks(p) + " " + toks(p + 1) + " " + toks(p + 2)))
      p += 1
    }
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    Some(arr)
  }

  /** distinct shingle-hash sets per doc, dropping docs too short to
    * shingle.
    *
    * persist() is load-bearing: the signature frame is referenced many
    * times downstream (the inverted index, both sides of the candidate
    * join, verification). Without a materialization barrier Catalyst's
    * CollapseProject inlines the whole tokenize→shingle pipeline into
    * EVERY reference site. At 100 TB the same principle holds: compute
    * signatures once, materialize, reuse. */
  private def shingleSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // repartition first: the fixture is a single parquet file (1 input
    // split), which would otherwise serialize all shingle computation
    // into one task; on a real multi-split corpus this is a no-op cost.
    // Width dial (round-19 A/B, tools.ShingleWidthProbe): 0/unset =
    // unpinned repartition($"doc_id") — AQE may coalesce at fixture
    // scale, trading a serial ~250 ms shingle kernel for a single
    // 2 MB CountMin with no merge; N pins N-wide — parallel kernel,
    // N sketches tree-merged. The probe prices the two arms
    // interleaved in one JVM; the default stays unpinned.
    val pin = s.conf.getOption("graft.dedup.shingles.pinnedWidth")
      .map(_.toInt).getOrElse(0)
    (if (pin > 0) docs(s, dir).repartition(pin, $"doc_id")
     else docs(s, dir).repartition($"doc_id"))
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        shingleHashes(text).map(a => (id, a))
      })
      .toDF("doc_id", "sh")
      // localCheckpoint, not persist: this frame is referenced FOUR
      // times in the pair pipeline (inverted index + both verification
      // sides); persist() would cache the data but every reference
      // still carries the full analyzed subtree, and the self-join
      // downstream makes Catalyst's DeduplicateRelations/analysis cost
      // explode combinatorially (measured: driver main thread pinned
      // for tens of seconds in AttributeMap.apply before any task ran).
      // Truncating the lineage keeps downstream plans O(small).
      .localCheckpoint()
  }

  private val shingleSetSql =
    """sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(len(toks)-2),
      |                       i -> array_to_string(toks[i+1:i+3], ' '))) AS shset
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
      |        FROM documents)
      |  WHERE len(toks) >= 3
      |)""".stripMargin

  /** exact-pair ground truth: inverted-index join + integer Jaccard
    * filter; used as the oracle for both ngram and minhash queries. */
  private val exactPairSql = Some(s"""
    WITH $shingleSetSql,
    ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
    pairs AS (
      SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
             ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, CAST(inter AS BIGINT) AS inter_size,
           CAST(n1 + n2 - inter AS BIGINT) AS union_size
    FROM pairs
    WHERE 3 * inter >= n1 + n2
    ORDER BY d1, d2
  """)

  /** DEDUP THRESHOLD CURVE: near-dup pair and affected-document counts
    * at Jaccard ≥ {0.5, 0.7, 0.9} in ONE pass — the planning table a
    * curation pipeline consults BEFORE committing to a threshold (how
    * much does the corpus shrink per notch of aggressiveness). The
    * candidate machinery runs ONCE at the loosest threshold
    * ([[ngramJaccard]]'s CMS prefix filter at t = 0.5 — lossless for
    * every t ≥ 0.5, so the one candidate set serves all three
    * points); each candidate is verified once, then the three
    * integer-exact threshold tests ((100+pct)·inter ≥ pct·(n1+n2))
    * fan the tiny verified frame out by a broadcast 3-row threshold
    * table. Zero-pair thresholds keep their row (left join from the
    * threshold table, identical on both engines).
    *
    * Scale shape: identical to [[ngramJaccard]] up to verification —
    * the curve adds two aggregations over the verified-PAIR frame
    * (near-dup-mass-sized, not corpus-sized). */
  val thresholdCurve: Q = Q(
    "dedup_threshold_curve",
    (s, dir) => {
      import s.implicits._
      val t = 0.5
      val sh = shingleSets(s, dir)
      val ranked = cmsPrefixRanked(s, sh, t)
      val cand = ranked.as("a")
        .join(ranked.as("b"), $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id"
          && $"a.n" <= $"b.n" * 2 && $"b.n" <= $"a.n" * 2)
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
        // spread the verify kernel wide — see ngramJaccardVerified
        .repartition(graft.GraftSession.spreadWidth(s), $"d1", $"d2")
      val s1 = sh.select($"doc_id".as("d1"), $"sh".as("sh1"))
      val s2 = sh.select($"doc_id".as("d2"), $"sh".as("sh2"))
      val verified = cand.join(s1, "d1").join(s2, "d2")
        .withColumn("inter", size(array_intersect($"sh1", $"sh2")).cast("long"))
        .withColumn("n1", size($"sh1").cast("long"))
        .withColumn("n2", size($"sh2").cast("long"))
        .filter($"inter" * 3 >= $"n1" + $"n2")
        .select($"d1", $"d2", $"inter", $"n1", $"n2")
        .localCheckpoint()   // scanned by both curve aggregations
      val thr = Seq(50L, 70L, 90L).toDF("thr_pct")
      val hits = verified.crossJoin(broadcast(thr))
        .filter((lit(100L) + $"thr_pct") * $"inter" >= $"thr_pct" * ($"n1" + $"n2"))
        .localCheckpoint()
      val nPairs = hits.groupBy($"thr_pct").agg(count(lit(1)).as("n_pairs"))
      val nDocs = hits.select($"thr_pct", explode(array($"d1", $"d2")).as("doc"))
        .groupBy($"thr_pct").agg(count_distinct($"doc").as("n_docs"))
      thr.join(nPairs, Seq("thr_pct"), "left")
        .join(nDocs, Seq("thr_pct"), "left")
        .select($"thr_pct",
          coalesce($"n_pairs", lit(0L)).as("n_pairs"),
          coalesce($"n_docs", lit(0L)).as("n_docs"))
        .orderBy($"thr_pct")
    },
    Some(s"""
      WITH $shingleSetSql,
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      pairs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      thr(thr_pct) AS (VALUES (CAST(50 AS BIGINT)), (70), (90)),
      q AS (SELECT thr_pct, d1, d2 FROM pairs, thr
            WHERE (100 + thr_pct) * inter >= thr_pct * (n1 + n2)),
      p AS (SELECT thr_pct, CAST(COUNT(*) AS BIGINT) n_pairs FROM q GROUP BY 1),
      d AS (SELECT thr_pct, CAST(COUNT(DISTINCT doc) AS BIGINT) n_docs FROM (
              SELECT thr_pct, d1 doc FROM q
              UNION ALL SELECT thr_pct, d2 FROM q) GROUP BY 1)
      SELECT thr.thr_pct, COALESCE(n_pairs, 0) n_pairs, COALESCE(n_docs, 0) n_docs
      FROM thr LEFT JOIN p USING (thr_pct) LEFT JOIN d USING (thr_pct)
      ORDER BY thr_pct
    """)
  )

  /** Exact dedup: group by content hash, keep the lowest doc_id as
    * canonical. One shuffle on a 128-bit key; at 100 TB this is the
    * cheapest possible full-corpus dedup. */
  val exact: Q = Q(
    "dedup_exact",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .groupBy(md5($"text").as("content_md5"))
        .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .select($"canonical_id", $"n_copies", $"content_md5")
        .orderBy($"canonical_id")
    },
    Some("""
      SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies, md5(text) AS content_md5
      FROM documents
      GROUP BY md5(text)
      ORDER BY canonical_id
    """)
  )

  /** Count-min sketch over 64-bit shingle fingerprints: `depth` rows ×
    * `width` counters, splitmix-mixed row indexes. Properties the
    * prefix filter leans on: NEVER underestimates (so true hub
    * shingles always rank at the end), bounded memory independent of
    * the shingle universe (2 MB at 4×65536 — broadcastable at any
    * corpus size, where an exact per-shingle df table grows with the
    * corpus and was this operator's scale ceiling), and deterministic
    * (same data → same sketch → same ranking on every executor). Width
    * is the accuracy dial: size ~O(distinct hubs), not O(universe). */
  private[graft] final class CountMin(
      val depth: Int, val width: Int) extends Serializable {
    // idx masks with (width-1): anything else silently collapses the
    // hash space onto a subset of counters and inflates every estimate
    require(width > 0 && (width & (width - 1)) == 0,
      s"CountMin width must be a power of two, got $width")
    private val rows = Array.ofDim[Long](depth, width)
    private def idx(i: Int, h0: Long): Int = {
      var x = h0 + 0x9e3779b97f4a7c15L * (i + 1)
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      ((x ^ (x >>> 31)) & (width - 1)).toInt
    }
    def add(h: Long): Unit = {
      var i = 0
      while (i < depth) { rows(i)(idx(i, h)) += 1; i += 1 }
    }
    def estimate(h: Long): Long = {
      var m = Long.MaxValue
      var i = 0
      while (i < depth) { m = math.min(m, rows(i)(idx(i, h))); i += 1 }
      m
    }
    def mergeInPlace(o: CountMin): CountMin = {
      var i = 0
      while (i < depth) {
        var j = 0
        while (j < width) { rows(i)(j) += o.rows(i)(j); j += 1 }
        i += 1
      }
      this
    }
  }

  /** The CMS-ranked prefix stage [[ngramJaccard]] runs — factored out
    * (like [[VectorSearch.lshCandidates]]) so [[graft.tools.JaccardProbe]]
    * measures the operator's own code path, not a copy that can drift.
    * Input: (doc_id, sh: array<long>) distinct-shingle frame. Output:
    * (doc_id, h, n) — each doc's |s|−⌈t·|s|⌉+1 rarest shingles under
    * the broadcast count-min ranking, localCheckpoint'd because every
    * caller self-joins it. */
  /** One bounded per-partition CMS pass + associative driver merge,
    * broadcast back out — the shared sketch build behind every
    * rarity-ordered stage, factored so [[cmsPrefixRanked]] and
    * [[cmsPositioned]] can never drift onto different orders. */
  private[graft] def cmsSketch(
      s: SparkSession, sh: DataFrame,
      depth: Int, width: Int): org.apache.spark.broadcast.Broadcast[CountMin] = {
    import s.implicits._
    // treeReduce, not fold (the BloomFilter builder's discipline,
    // line ~2205): fold ships EVERY partition's 2 MB sketch to the
    // driver and merges serially — with the sketch pass now pinned
    // 32-wide that is ~64 MB of driver deserialize+merge per query;
    // the tree merges on executors and the driver sees ≤√P sketches.
    // (mapPartitions emits exactly one sketch per partition, so the
    // RDD is never empty and treeReduce is total.)
    val sketch = sh.select($"sh").as[Seq[Long]].rdd
      .mapPartitions { it =>
        val c = new CountMin(depth, width)
        it.foreach(_.foreach(c.add))
        Iterator.single(c)
      }
      .treeReduce(_.mergeInPlace(_), depth = 2)
    s.sparkContext.broadcast(sketch)
  }

  private[graft] def cmsPrefixRanked(
      s: SparkSession, sh: DataFrame, t: Double,
      depth: Int = 4, width: Int = 65536): DataFrame = {
    import s.implicits._
    val bc = cmsSketch(s, sh, depth, width)
    sh.select($"doc_id", $"sh").as[(Long, Seq[Long])]
      .mapPartitions { it =>
        val c = bc.value
        it.flatMap { case (doc, set) =>
          val n = set.size
          val keep = n - math.ceil(t * n).toInt + 1
          if (keep <= 0) Iterator.empty
          else set.map(h => (c.estimate(h), h)).sorted.iterator
            .take(keep).map { case (_, h) => (doc, h, n) }
        }
      }
      .toDF("doc_id", "h", "n")
      .localCheckpoint()   // lineage barrier: callers self-join this frame
  }

  /** EVERY shingle of every doc with its 1-based rank position under
    * the same (cms-estimate, hash) total order [[cmsPrefixRanked]]
    * uses — the position-annotated inverted index the containment
    * join's positional filter needs. Map-side only: sorting each doc's
    * own array against the broadcast sketch; no shuffle. */
  private[graft] def cmsPositioned(
      s: SparkSession, sh: DataFrame,
      depth: Int = 4, width: Int = 65536): DataFrame = {
    import s.implicits._
    val bc = cmsSketch(s, sh, depth, width)
    sh.select($"doc_id", $"sh").as[(Long, Seq[Long])]
      .mapPartitions { it =>
        val c = bc.value
        it.flatMap { case (doc, set) =>
          val n = set.size
          set.map(h => (c.estimate(h), h)).sorted.iterator.zipWithIndex
            .map { case ((_, h), i) => (doc, h, i + 1, n) }
        }
      }
      .toDF("doc_id", "h", "pos", "n")
      .localCheckpoint()   // lineage barrier: callers self-join this frame
  }

  /** Exact n-gram Jaccard near-dup pairs (j ≥ 0.5) with PREFIX
    * FILTERING (the set-similarity-join technique of PAPERS.md's ICDE
    * 2020 entry): candidates are generated only from each document's
    * prefix — its |s| − ⌈t·|s|⌉ + 1 rarest shingles — which is provably
    * sufficient for Jaccard ≥ t under ANY total order both documents
    * agree on, then verified exactly. The hub shingles that make a
    * naive inverted-index self-join quadratic are excluded from
    * candidate generation entirely (~10× at sf0.1), while the output —
    * and hence the DuckDB oracle — is the exact pair set.
    *
    * Rarity ranking uses a broadcast [[CountMin]] sketch rather than an
    * exact global df table (the round-4 refinement note): losslessness
    * needs only a CONSISTENT order — rarest-first merely minimizes
    * candidate volume, and CMS keeps exactly the property that matters
    * for that (hubs never underestimated → never in a prefix) — so the
    * exploded shingle stream no longer shuffles through a frequency
    * join + per-doc rank window at all. Sketch build is one bounded
    * per-partition pass + an associative driver merge (the RDD
    * aggregate idiom; 2 MB × partitions), and prefix selection
    * becomes a map-side sort of each doc's own shingle array. Two
    * pre-candidate shuffles of the widest frame in the query → zero. */
  /** [[ngramJaccard]]'s verified pair frame WITHOUT the output sort —
    * the form internal consumers (the edit-distance verify cascade)
    * compose on; the catalog op adds the presentation orderBy. */
  private def ngramJaccardVerified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = 0.5
    val sh = shingleSets(s, dir)
    val ranked = cmsPrefixRanked(s, sh, t)
    // candidate equi-join on the 8-byte fingerprint, with the
    // LOSSLESS size-ratio filter (j ≥ t ⇒ max(n1,n2) ≤ n/t·min):
    // at t=0.5 a pair whose set sizes differ over 2× cannot qualify,
    // so it never even enters the distinct()
    val cand = ranked.as("a")
      .join(ranked.as("b"), $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id"
        && $"a.n" <= $"b.n" * 2 && $"b.n" <= $"a.n" * 2)
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
      // spread the VERIFY kernel (guide §2.5/§2.3 — shuffle keys, not
      // payloads): the pair keys are 16 bytes, but the array_intersect
      // verify is this stage's CPU, and AQE folds the distinct's
      // exchange to 1–2 partitions at fixture scale, serializing it
      // (round-20 JobProfile: ~1.5 s of verify task time on 2 tasks).
      // Repartitioning the TINY pair frame wide before the shingle
      // arrays attach runs the verify spreadWidth-wide; the shingle
      // sides broadcast, so no payload bytes ride this exchange.
      .repartition(graft.GraftSession.spreadWidth(s), $"d1", $"d2")
    // exact verification on candidates only
    val s1 = sh.select($"doc_id".as("d1"), $"sh".as("sh1"))
    val s2 = sh.select($"doc_id".as("d2"), $"sh".as("sh2"))
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
      .withColumn("n1", size($"sh1")).withColumn("n2", size($"sh2"))
      .filter($"inter" * 3 >= $"n1" + $"n2")
      .select($"d1", $"d2", $"inter".cast("long").as("inter_size"),
        ($"n1" + $"n2" - $"inter").cast("long").as("union_size"))
  }

  val ngramJaccard: Q = Q(
    "dedup_ngram_jaccard",
    (s, dir) => ngramJaccardVerified(s, dir).orderBy(col("d1"), col("d2")),
    exactPairSql
  )

  /** MinHash + LSH near-dup: 64 min-hashes per shingle set, banded
    * 16×4; band-key self-join yields candidates, exact integer Jaccard
    * verifies. With j ≥ 0.9 planted pairs, the per-pair miss
    * probability is (1-j⁴)^16 ≈ 4e-9, so the verified output equals
    * the exact-pair oracle. */
  /** the MinHash+LSH candidate→verify pipeline over any (doc_id,
    * text) frame — shared by [[minhashLsh]] (the raw corpus) and
    * [[minhashLshLww]] (the LWW-collapsed versioned corpus). `d` is
    * consumed twice (sketching and candidate verification); callers
    * pass a frame that is cheap to recompute or checkpointed. */
  private def minhashLshPairsFrom(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    {
      // 64-hash MinHash sketch in ONE mapPartitions pass straight from
      // the text — tokenize, shingle, fingerprint, min-update with
      // primitive arrays; no corpus-wide shingle arrays materialized.
      // Chosen over the declarative alternatives measured on sf0.1: a
      // higher-order `transform(sequence(...), i -> array_min(...))`
      // lambda is interpreted row-at-a-time (~50× slower), 64 separate
      // `min(xxhash64(f, i))` aggregate columns paid ~500ns/row/col in
      // aggregate-buffer updates, and building shingle arrays for the
      // whole corpus cost more than the sketch itself.
      //
      // repartition before the sketch (the shingleSets discipline,
      // guide §2.5 input skew): a single-row-group parquet fixture is
      // ONE input split, which would fuse the whole CPU-bound sketch
      // kernel into a single task. The width is pinned (cores-derived,
      // see [[graft.GraftSession.spreadWidth]]) because an unpinned
      // repartition(col) is AQE-coalescible and folds back to one
      // partition at fixture scale.
      val minhashes = d.repartition(graft.GraftSession.spreadWidth(s), $"doc_id")
        .select($"doc_id", $"text").as[(Long, String)]
        .mapPartitions(_.flatMap { case (doc, text) =>
          sketchText(text).map(mh => (doc, mh))
        })
        .toDF("doc_id", "mh")
      // 16 bands × 4 rows: band collision needs j^4, so the huge mass
      // of low-similarity pairs (j≈0.03-0.07 here) almost never
      // produces a false candidate (~16·j^4·n² pairs), while the
      // planted j≥0.9 pairs miss with prob (1-0.9^4)^16 ≈ 4e-9.
      // (64 bands × 2 rows collided on ~10^5 background pairs and
      // verification dominated the runtime.)
      val bandStructs = (0 until 16).map { b =>
        struct(lit(b).as("b"),
          xxhash64(element_at($"mh", 4 * b + 1), element_at($"mh", 4 * b + 2),
            element_at($"mh", 4 * b + 3), element_at($"mh", 4 * b + 4)).as("bh"))
      }
      val bands = minhashes
        .select($"doc_id", explode(array(bandStructs: _*)).as("band"))
        .select($"doc_id", $"band.b".as("b"), $"band.bh".as("bh"))
      val cand = bands.as("x")
        .join(bands.as("y"), $"x.b" === $"y.b" && $"x.bh" === $"y.bh" && $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"))
        .distinct()
        // lineage barrier: cand is referenced three times below (the
        // doc semi-join + both sides of the verify join) and itself
        // contains the band self-join — without truncation the
        // analyzed tree (and driver analysis time) grows combinatorially
        .localCheckpoint()
      // verification only needs shingle sets for CANDIDATE docs (a few
      // hundred), not the corpus: semi-join the doc table down first.
      val candDocs = cand.select(explode(array($"d1", $"d2")).as("doc_id")).distinct()
      val shCand = d
        .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select($"doc_id", TextFns.shingleSet($"text").as("sh"))
        .localCheckpoint()   // referenced by both verify sides
      val s1 = shCand.select($"doc_id".as("d1"), $"sh".as("sh1"))
      val s2 = shCand.select($"doc_id".as("d2"), $"sh".as("sh2"))
      cand.join(s1, "d1").join(s2, "d2")
        .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
        .withColumn("n1", size($"sh1")).withColumn("n2", size($"sh2"))
        .filter($"inter" * 3 >= $"n1" + $"n2")
        .select($"d1", $"d2", $"inter".cast("long").as("inter_size"),
          ($"n1" + $"n2" - $"inter").cast("long").as("union_size"))
    }
  }

  /** [[minhashLsh]]'s pair set WITHOUT the output sort — the form
    * internal consumers (clustering, labeling, cross-modal union,
    * edit-distance verify) compose on. They group/join the pairs
    * immediately, so the catalog op's presentation orderBy would be
    * pure waste there — and worse than waste when the consumer
    * persists the composed frame: the cached plan pins the sort AND
    * its range-partition sampling pass (a second full execution of
    * the pipeline) that EliminateSorts can no longer remove across
    * the cache boundary. */
  private def minhashLshPairs(s: SparkSession, dir: String): DataFrame =
    minhashLshPairsFrom(docs(s, dir).select(col("doc_id"), col("text")))

  val minhashLsh: Q = Q(
    "dedup_minhash_lsh",
    (s, dir) => minhashLshPairs(s, dir).orderBy(col("d1"), col("d2")),
    exactPairSql
  )

  /** UPDATE-AWARE MinHash+LSH — the compaction-time batch twin of the
    * streaming gate's LWW form ([[graft.streaming.NearDupStream]]
    * `registerLww`/`applyLww`): over a VERSIONED corpus (the same
    * deterministic synthetic wave as `corpus_budget_update_lww` —
    * every doc_id ≡ 0 (mod 7) gets a ver-2 revision, here with its
    * TOKEN ORDER REVERSED so the revision shares almost no 3-gram
    * shingles with the original), near-dup pairs are computed over
    * newest versions ONLY: LWW collapse (`max_by(ver)`, one doc_id
    * exchange, no skew term) → the exact [[minhashLsh]] pipeline.
    * A planted near-dup pair one of whose members was updated away
    * DISAPPEARS from the output — the semantic the streaming gate
    * enforces live by RETIRING a superseded version's band claims,
    * pinned here in fully-oracled batch form.
    *
    * LSH exactness on this corpus, restated for the revision wave:
    * reversal preserves bimodality — a pair BOTH of whose members
    * reversed keeps its high Jaccard (both shingle sets permute the
    * same way), a pair with ONE member reversed drops to background
    * (~0), so every surviving pair is still j ≥ 0.9 and the verified
    * output equals the exact-pair oracle as for [[minhashLsh]].
    *
    * Scale shape: the collapse adds one keyed exchange before the
    * audited [[minhashLsh]] shape; the collapsed frame is
    * localCheckpoint'd because the pipeline consumes it twice
    * (sketch + candidate verification). */
  val minhashLshLww: Q = Q(
    "dedup_minhash_lsh_lww",
    (s, dir) => {
      import s.implicits._
      val base = docs(s, dir).select($"doc_id", $"text")
      val versioned = base.withColumn("ver", lit(1L))
        .unionByName(base.filter($"doc_id" % 7 === 0)
          .select($"doc_id",
            array_join(reverse(filter(split($"text", " "),
              x => x =!= lit(""))), " ").as("text"),
            lit(2L).as("ver")))
      val lww = versioned.groupBy($"doc_id")
        .agg(max_by($"text", $"ver").as("text"))
        .localCheckpoint()
      minhashLshPairsFrom(lww).orderBy($"d1", $"d2")
    },
    Some(s"""
      WITH versioned AS (
        SELECT doc_id, text, 1 AS ver FROM documents
        UNION ALL
        SELECT doc_id,
               array_to_string(list_reverse(list_filter(string_split(text, ' '),
                 x -> x <> '')), ' ') AS text,
               2 AS ver
        FROM documents WHERE doc_id % 7 = 0
      ),
      lww AS (
        SELECT doc_id, arg_max(text, ver) AS text FROM versioned GROUP BY doc_id
      ),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(toks)-2),
                             i -> array_to_string(toks[i+1:i+3], ' '))) AS shset
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
              FROM lww)
        WHERE len(toks) >= 3
      ),
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      pairs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT d1, d2, CAST(inter AS BIGINT) AS inter_size,
             CAST(n1 + n2 - inter AS BIGINT) AS union_size
      FROM pairs
      WHERE 3 * inter >= n1 + n2
      ORDER BY d1, d2
    """)
  )

  /** text → 64-bit SimHash signature: per-bit majority vote over the
    * hashes of the document's 3-word shingles (with multiplicity), one
    * tight pass with a primitive vote array — the same
    * mapPartitions-kernel pattern as [[sketchText]]. Shingles, not
    * unigrams: over a small vocabulary unigram multisets collide across
    * unrelated documents, while the 3-gram feature space keeps
    * unrelated signatures near-independent (hamming ≈ 32) and near-dup
    * signatures within a few bits.
    *
    * The per-shingle hash is the FIRST 8 BYTES OF MD5 (big-endian
    * unsigned) rather than the fnv/splitmix fingerprint the MinHash
    * kernel uses: md5 exists verbatim in DuckDB, which makes the whole
    * operator — signature bits included — SQL-expressible, so the
    * driver gets a full hash-compare oracle instead of a rows-only
    * check. Hash quality is equivalent for vote purposes.
    * (The original declarative form — a nested
    * `aggregate(sequence(0,63), … aggregate(th, …))` lambda — was
    * CodegenFallback: 64 interpreted passes over every token-hash array
    * per row.) */
  private[operators] def simhashText(text: String): Option[Long] = {
    if (text == null) return None   // match string_split(NULL) row-drop
    val toks = text.split(' ').filter(_.nonEmpty)
    if (toks.length < 3) return None
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    var p = 0
    while (p + 2 < toks.length) {
      val d = md.digest((toks(p) + " " + toks(p + 1) + " " + toks(p + 2))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      p += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    Some(sig)
  }

  /** SimHash near-dup: 64-bit signature (sign of per-bit shingle-hash
    * vote) computed in one mapPartitions pass, 4×16-bit chunk banding
    * (pigeonhole: hamming ≤ 3 ⇒ some chunk equal — the banding is
    * LOSSLESS at this radius), hamming ≤ 3 verification via
    * bit_count(xor).
    *
    * Fully DuckDB-oracled: the md5-based shingle hash (see
    * [[simhashText]]) is reproduced in SQL by extracting bit j of the
    * first-16-hex-chars value from hex nibble 16−⌊j/4⌋ (1-based,
    * big-endian), voting per (doc, bit) over the un-deduplicated
    * shingle stream, folding the sign vector into a 64-char bit string,
    * and counting differing positions over all pairs. The oracle's
    * all-pairs join is fine at oracle scale; the operator itself stays
    * banded. DedupSpec additionally gates the output as EXACTLY EQUAL
    * to the kernel's definition recomputed on the driver and pins
    * precision ≥ 0.9 / recall ≥ 0.45 vs the exact j ≥ 0.5 pair set —
    * short-document vote noise bounds radius-3 recall here; the
    * high-recall text near-dup path is [[minhashLsh]], which is gated
    * EQUAL to the exact pair set. */
  val simhash: Q = Q(
    "dedup_simhash",
    (s, dir) => {
      import s.implicits._
      val sig = docs(s, dir)
        .repartition(graft.GraftSession.spreadWidth(s), $"doc_id")   // single-file fixture → spread the work (width pinned: AQE would coalesce)
        .select($"doc_id", $"text").as[(Long, String)]
        .mapPartitions(_.flatMap { case (doc, text) =>
          simhashText(text).map(sim => (doc, sim))
        })
        .toDF("doc_id", "sim")
        .persist()   // barrier: chunk explode reads `sim` 2× per chunk
      val chunks = sig.select($"doc_id", $"sim",
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('c', c, 'cv', shiftright(sim, c*16) & 65535))"))
          .as("ch"))
        .select($"doc_id", $"sim", $"ch.c".as("c"), $"ch.cv".as("cv"))
      chunks.as("x")
        .join(chunks.as("y"), $"x.c" === $"y.c" && $"x.cv" === $"y.cv" && $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"),
          expr("bit_count(x.sim ^ y.sim)").as("hamming"))
        .distinct()
        .filter($"hamming" <= 3)
        .orderBy($"d1", $"d2")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
        FROM documents
      ),
      shm AS (
        SELECT doc_id,
               unnest(list_transform(range(len(toks)-2),
                      i -> array_to_string(toks[i+1:i+3], ' '))) AS s
        FROM t WHERE len(toks) >= 3
      ),
      hx AS (SELECT doc_id, substring(md5(s), 1, 16) AS h FROM shm),
      votes AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (strpos('0123456789abcdef',
                                     substring(h, CAST(16 - j // 4 AS INT), 1)) - 1)
                            // (CASE WHEN j % 4 = 0 THEN 1 WHEN j % 4 = 1 THEN 2
                                    WHEN j % 4 = 2 THEN 4 ELSE 8 END) % 2 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM hx, (SELECT unnest(range(64)) AS j) bits
        GROUP BY doc_id, j
      ),
      sig AS (
        SELECT doc_id,
               string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sig
        FROM votes GROUP BY doc_id
      ),
      p AS (
        SELECT a.doc_id d1, b.doc_id d2,
               CAST(len(list_filter(range(64),
                    i -> substring(a.sig, CAST(i + 1 AS INT), 1)
                         <> substring(b.sig, CAST(i + 1 AS INT), 1))) AS INT) AS hamming
        FROM sig a, sig b
        WHERE a.doc_id < b.doc_id
      )
      SELECT d1, d2, hamming FROM p WHERE hamming <= 3 ORDER BY d1, d2
    """)
  )

  /** DuckDB recomputation of [[graft.multimodal.Multimodal.phash]]'s
    * 24-bit dHash from the generator's closed-form pixels (dims, 4×4
    * block means, gradient signs) — ends in `sig(doc_id, phash)`.
    * Shared by [[imagePhash]] and [[crossModal]]. */
  private val phashSigSql =
    """dims AS (
      |  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS width,
      |         CAST(8 + (doc_id * 7) % 16 AS INT) AS height
      |  FROM documents
      |),
      |t AS (
      |  SELECT doc_id, width, height,
      |         list_transform(range(0, 16), k ->
      |           CAST(list_aggregate(
      |                  flatten(list_transform(
      |                    range((k // 4) * height // 4, ((k // 4) + 1) * height // 4),
      |                    y -> list_transform(
      |                      range((k % 4) * width // 4, ((k % 4) + 1) * width // 4),
      |                      x -> (doc_id * 31 + x * 7 + y * 13) % 256))),
      |                  'sum')
      |                // ((((k // 4) + 1) * height // 4 - (k // 4) * height // 4)
      |                   * (((k % 4) + 1) * width // 4 - (k % 4) * width // 4))
      |             AS INT)) AS thumb
      |  FROM dims
      |),
      |sig AS (
      |  SELECT doc_id,
      |         CAST(list_aggregate(list_transform(range(0, 12), k ->
      |                CASE WHEN thumb[CAST((k // 3) * 4 + (k % 3) AS INT) + 1]
      |                        < thumb[CAST((k // 3) * 4 + (k % 3) AS INT) + 2]
      |                     THEN CAST(1 AS BIGINT) << CAST(23 - k AS INT)
      |                     ELSE CAST(0 AS BIGINT) END), 'sum')
      |            + list_aggregate(list_transform(range(0, 12), k ->
      |                CASE WHEN thumb[CAST((k // 4) * 4 + (k % 4) AS INT) + 1]
      |                        < thumb[CAST((k // 4) * 4 + (k % 4) AS INT) + 5]
      |                     THEN CAST(1 AS BIGINT) << CAST(11 - k AS INT)
      |                     ELSE CAST(0 AS BIGINT) END), 'sum')
      |           AS BIGINT) AS phash
      |  FROM t
      |)""".stripMargin

  /** IMAGE near-dup, end to end: perceptual-hash the image corpus
    * (real PNG decode → 4×4 block-average → 24-bit dHash,
    * [[graft.multimodal.Multimodal.phash]]), find hamming ≤ 2 pairs
    * with the [[simhash]] chunk-band machinery (3×8-bit chunks;
    * pigeonhole: hamming ≤ 2 ⇒ some chunk equal — LOSSLESS at this
    * radius), then label near-dup clusters with the O(log d) star
    * contraction and emit (canonical_id, doc_id, cluster_size) — the
    * image twin of [[clustersStar]].
    *
    * The load-bearing scale move is HASH CONTRACTION: docs connect iff
    * their hashes are equal or within hamming 2, so the doc-level
    * component structure factors through the DISTINCT-hash graph. One
    * groupBy(phash) collapses every exact-duplicate group to a vertex
    * carrying (min doc_id, doc count); banding, verification and CC
    * then run over ≤ 2²⁴ hash vertices REGARDLESS of corpus size — at
    * 100 TB the iterative part of the job is bounded by the hash
    * space, not the image count, and members re-attach with one
    * equi-join on phash (AQE broadcasts the label frame when small; a
    * 64-bit production hash falls back to a shuffle join, same plan
    * shape). Production dials: 64-bit dHash (8×8 raster) with
    * 4×16-bit chunks — same code shape; 24 bits here keeps the hash
    * DuckDB-recomputable so decode→hash→band→CC is oracle-gated END TO
    * END (the generator's closed-form pixels make every bit
    * deterministic).
    *
    * MultimodalSpec proves planted-recall directly: byte-identical
    * images (the generator repeats every 256 doc_ids) always share a
    * cluster, and the clustering equals the transitive closure of the
    * doc-level hamming ≤ 2 pair graph. */
  val imagePhash: Q = Q(
    "dedup_image_phash",
    (s, dir) => {
      import s.implicits._
      // phashFrame, not phash.run: the catalog op's presentation
      // orderBy would ride INTO the persisted decode plan (the cache
      // boundary pins the sort and its range-sampling pass — one full
      // extra decode of the corpus, visible as a second multi-second
      // single-task job in the job profile)
      val sig = graft.multimodal.Multimodal.phashFrame(s, docs(s, dir))
        .select($"doc_id", $"phash")
        .persist()   // decode once: read again by the member re-attach
      // hash contraction: one vertex per distinct hash
      val hstats = sig.groupBy($"phash")
        .agg(min($"doc_id").as("dmin"), count(lit(1)).as("ndocs"))
        .localCheckpoint()   // read by banding + label join; truncates decode lineage
      val chunks = hstats.select($"phash",
        explode(expr(
          "transform(sequence(0, 2), c -> named_struct('c', c, 'cv', shiftright(phash, c*8) & 255))"))
          .as("ch"))
        .select($"phash", $"ch.c".as("c"), $"ch.cv".as("cv"))
      val hpairs = chunks.as("x")
        .join(chunks.as("y"),
          $"x.c" === $"y.c" && $"x.cv" === $"y.cv" && $"x.phash" < $"y.phash")
        .select($"x.phash".as("d1"), $"y.phash".as("d2"))
        .distinct()
        .filter(expr("bit_count(d1 ^ d2) <= 2"))
      val (hlab, _) = connectedComponentsStar(s, hpairs)
      // hash → component; hashes in no cross-hash pair component to themselves
      val labeled = hstats
        .join(hlab.withColumnRenamed("v", "phash"), Seq("phash"), "left")
        .withColumn("hcomp", coalesce($"lab", $"phash"))
      // per-component doc stats; singleton DOCS (unique hash, no
      // neighbor) are not near-dups and drop out here
      val comp = labeled.groupBy($"hcomp")
        .agg(min($"dmin").as("canonical_id"), sum($"ndocs").as("cluster_size"))
        .filter($"cluster_size" > 1)
      sig.join(labeled.select($"phash", $"hcomp"), "phash")
        .join(comp, "hcomp")
        .select($"canonical_id", $"doc_id", $"cluster_size")
        .orderBy($"canonical_id", $"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $phashSigSql,
      p AS (
        SELECT a.doc_id d1, b.doc_id d2
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 2
      ),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v),
      sz AS (SELECT lab, COUNT(*) AS cluster_size FROM cc GROUP BY lab)
      SELECT cc.lab AS canonical_id, cc.v AS doc_id, sz.cluster_size
      FROM cc JOIN sz USING (lab)
      ORDER BY canonical_id, doc_id
    """)
  )

  /** CROSS-MODAL duplicate consolidation: one clustering over the
    * UNION of the text near-dup graph ([[minhashLsh]]'s verified exact
    * pair set) and the image near-dup graph ([[imagePhash]]'s hamming
    * ≤ 2 dHash pairs) — a multimodal corpus's real duplicate relation,
    * where the same article re-hosted with a recompressed image and
    * the same image under a paraphrased caption both collapse into one
    * cluster. Emits (canonical_id, doc_id, cluster_size) like the
    * per-modality clusterings; docs duplicated in NEITHER modality
    * drop out.
    *
    * Scale design: each modality contributes edges through ITS OWN
    * scale machinery — banded MinHash candidates for text, hash
    * contraction for images. The image side's edge list is LINEAR in
    * docs (one star edge doc→min-doc per phash group, plus inter-hash
    * edges over the ≤ 2²⁴ distinct-hash space) rather than the
    * quadratic within-group pair set, so union + star-CC runs over
    * O(docs + text pairs) edges. The doc-level components are
    * unchanged by the contraction: equal-hash docs are hamming-0
    * neighbors, and any cross-group hamming ≤ 2 doc pair is spanned
    * through the two group representatives. */
  val crossModal: Q = Q(
    "dedup_crossmodal",
    (s, dir) => {
      import s.implicits._
      // the two modality pipelines are independent until the edge
      // union — overlap them (guide §2.6): the text side's eager
      // candidate/verify barriers otherwise serialize ahead of the
      // image decode
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val tpairsF = Future(
        minhashLshPairs(s, dir).select($"d1", $"d2").localCheckpoint())
      val sig = graft.multimodal.Multimodal.phashFrame(s, docs(s, dir))
        .select($"doc_id", $"phash")
        .persist()   // decode once: read by the star edges AND the group min
      val hstats = sig.groupBy($"phash").agg(min($"doc_id").as("dmin"))
        .localCheckpoint()   // truncates decode lineage; read twice below
      val chunks = hstats.select($"phash",
        explode(expr(
          "transform(sequence(0, 2), c -> named_struct('c', c, 'cv', shiftright(phash, c*8) & 255))"))
          .as("ch"))
        .select($"phash", $"ch.c".as("c"), $"ch.cv".as("cv"))
      val hpairs = chunks.as("x")
        .join(chunks.as("y"),
          $"x.c" === $"y.c" && $"x.cv" === $"y.cv" && $"x.phash" < $"y.phash")
        .select($"x.phash".as("p1"), $"y.phash".as("p2"))
        .distinct()
        .filter(expr("bit_count(p1 ^ p2) <= 2"))
      val interHash = hpairs
        .join(hstats.select($"phash".as("p1"), $"dmin".as("m1")), "p1")
        .join(hstats.select($"phash".as("p2"), $"dmin".as("m2")), "p2")
        .select($"m1".as("d1"), $"m2".as("d2"))
      val sameHash = sig.join(hstats, "phash")
        .filter($"doc_id" =!= $"dmin")
        .select($"dmin".as("d1"), $"doc_id".as("d2"))
      // CC barriers its input twice (verts + edges); truncate the
      // expensive two-modality edge plan ONCE here so signatures,
      // banding and decode don't replay per barrier
      val tpairs = Await.result(tpairsF, Duration.Inf)
      val allEdges = tpairs.union(interHash).union(sameHash).localCheckpoint()
      val (lab, _) = connectedComponentsStar(s, allEdges)
      val sizes = lab.groupBy($"lab").agg(count(lit(1)).as("cluster_size"))
      lab.join(broadcast(sizes), "lab")
        .select($"lab".as("canonical_id"), $"v".as("doc_id"), $"cluster_size")
        .orderBy($"canonical_id", $"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $shingleSetSql,
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      prs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      tp AS (SELECT d1, d2 FROM prs WHERE 3 * inter >= n1 + n2),
      $phashSigSql,
      ip AS (
        SELECT a.doc_id d1, b.doc_id d2
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 2
      ),
      p AS (SELECT d1, d2 FROM tp UNION SELECT d1, d2 FROM ip),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v),
      sz AS (SELECT lab, COUNT(*) AS cluster_size FROM cc GROUP BY lab)
      SELECT cc.lab AS canonical_id, cc.v AS doc_id, sz.cluster_size
      FROM cc JOIN sz USING (lab)
      ORDER BY canonical_id, doc_id
    """)
  )

  /** Maximum corpus size the exact all-pairs baseline will accept —
    * beyond this the O(n²) pair space is a scale-killer by construction
    * and the operator refuses to run rather than silently planning a
    * cartesian product. Overridable per session via
    * `graft.dedup.embedding.maxRows`. */
  val EmbeddingBruteForceMaxRows: Long = 100000L

  private def embeddingMaxRows(s: SparkSession): Long =
    s.conf.getOption("graft.dedup.embedding.maxRows").map(_.toLong)
      .getOrElse(EmbeddingBruteForceMaxRows)

  /** Embedding-cosine near-dup — the EXACT ALL-PAIRS ORACLE BASELINE,
    * deliberately fenced: all pairs with cosine ≥ 0.45, O(n²) dot
    * products, refused above [[EmbeddingBruteForceMaxRows]] vectors.
    * Dot products as left-fold doubles so the DuckDB oracle is
    * bit-identical. At scale use the bucketed paths instead:
    * [[VectorSearch.annLsh]] (sign-LSH buckets) or
    * [[VectorSearch.annIvf]] (IVF cells). */
  val embeddingCosine: Q = Q(
    "dedup_embedding",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.graftexpr.VectorFunctions.dot_product
      val e = Tables.load(s, dir, "embeddings")
        .repartition(graft.GraftSession.spreadWidth(s), $"vec_id")   // single-file fixture → spread the work (width pinned: AQE would coalesce)
        .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", sqrt(dot_product($"v", $"v")))
        .persist()   // norms computed once, not per pair
      val n = e.count()   // scale fence: never silently go quadratic
      val cap = embeddingMaxRows(s)
      require(n <= cap,
        s"dedup_embedding is the exact all-pairs baseline (O(n^2) dot products): " +
        s"corpus has $n vectors > $cap. " +
        "Use vector_ann_lsh or vector_ann_ivf for a bucketed scale path.")
      val a = e.select($"vec_id".as("i"), $"v".as("va"), $"nrm".as("na"))
      val b = e.select($"vec_id".as("j"), $"v".as("vb"), $"nrm".as("nb"))
      a.join(b, $"i" < $"j")
        .withColumn("cos", dot_product($"va", $"vb") / ($"na" * $"nb"))
        .filter($"cos" >= 0.45)
        .select($"i", $"j", $"cos")
        .orderBy($"i", $"j")
    },
    Some("""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      n AS (SELECT vec_id, v,
              sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1]*s[2]), (a, b) -> a + b)) nrm
            FROM e)
      SELECT a.vec_id i, b.vec_id j,
             list_reduce(list_transform(list_zip(a.v, b.v), s -> s[1]*s[2]), (x, y) -> x + y)
               / (a.nrm * b.nrm) AS cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(list_zip(a.v, b.v), s -> s[1]*s[2]), (x, y) -> x + y)
              / (a.nrm * b.nrm) >= 0.45
      ORDER BY i, j
    """)
  )

  /** Near-dup CLUSTERING: connected components over the verified
    * near-dup pair graph, labeling every member with the component's
    * minimum doc_id (the canonical survivor) — the step an actual dedup
    * pipeline runs after pair generation, since near-duplication is
    * transitive in effect (A~B, B~C ⇒ keep one of {A,B,C}).
    *
    * Algorithm: iterative min-label propagation to fixpoint, the
    * standard distributed CC shape — each round is one equi-join
    * (labels ⋈ edges) + one min-aggregation, both partial-aggregated;
    * rounds ≤ graph diameter (near-dup components are shallow — dup
    * clusters, not social graphs). Every round's frame is
    * lineage-truncated (the iterative-algorithm variant of the
    * localCheckpoint rule: without it the plan doubles per round). At
    * 100 TB the refinement is alternating large-star/small-star —
    * implemented as [[connectedComponentsStar]] / [[clustersStar]],
    * which contracts the diameter instead of walking it.
    *
    * Pairs come from [[minhashLsh]] (the scale path); its verified
    * output equals the exact pair set (see its gate), so the DuckDB
    * oracle can compute the same components from the exact pairs with
    * a recursive transitive-closure CTE — fine at oracle scale, and
    * exactly the kind of query the distributed form replaces. */
  val clusters: Q = Q(
    "dedup_clusters",
    (s, dir) => {
      import s.implicits._
      val pairs = minhashLshPairs(s, dir).select($"d1", $"d2")
      val edges = pairs.union(pairs.select($"d2", $"d1"))
        .toDF("a", "b")
        .localCheckpoint()
      var lab = edges.select($"a".as("v")).distinct()
        .withColumn("lab", $"v")
        .localCheckpoint()
      // labels are monotone non-increasing over a fixed vertex set, so
      // the label-sum strictly decreases iff any label changed — one
      // scalar aggregate per round detects the fixpoint without a
      // join+count (half the per-round jobs)
      def labSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
        df.agg(sum($"lab".cast("decimal(38,0)"))).head().getDecimal(0)
      var prevSum = labSum(lab)
      var changed = true
      var rounds = 0
      while (changed && rounds < 50) {
        val nb = edges.join(lab, edges("a") === lab("v"))
          .select($"b".as("v"), $"lab")
        val next = lab.union(nb)
          .groupBy($"v").agg(min($"lab").as("lab"))
          .localCheckpoint()
        val nextSum = labSum(next)
        changed = nextSum.compareTo(prevSum) != 0
        prevSum = nextSum
        lab = next
        rounds += 1
      }
      // a silent non-converged exit would report one true cluster as
      // several with wrong canonicals — fail loudly instead (diameter
      // > 50 means this corpus needs the large-star/small-star variant)
      require(!changed,
        s"dedup_clusters: label propagation did not converge in $rounds rounds; " +
          "component diameter exceeds the bound — use the large-star/small-star variant")
      val sizes = lab.groupBy($"lab").agg(count(lit(1)).as("cluster_size"))
      lab.join(broadcast(sizes), "lab")
        .select($"lab".as("canonical_id"), $"v".as("doc_id"), $"cluster_size")
        .orderBy($"canonical_id", $"doc_id")
    },
    clustersOracle
  )

  /** Transitive-closure oracle shared by BOTH connected-components
    * implementations ([[clusters]] and [[clustersStar]]): same pair
    * graph, same canonical-min labeling, so the two algorithms must
    * hash-match each other through the oracle. */
  private lazy val clustersOracle: Option[String] = Some(s"""
      WITH RECURSIVE $shingleSetSql,
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      prs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      p AS (SELECT d1, d2 FROM prs WHERE 3 * inter >= n1 + n2),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v),
      sz AS (SELECT lab, COUNT(*) AS cluster_size FROM cc GROUP BY lab)
      SELECT cc.lab AS canonical_id, cc.v AS doc_id, sz.cluster_size
      FROM cc JOIN sz USING (lab)
      ORDER BY canonical_id, doc_id
    """)

  /** Alternating large-star/small-star connected components — the
    * 100 TB-scale refinement [[clusters]] names. Min-label propagation
    * needs ~diameter rounds; star contraction CONTRACTS the graph
    * instead of walking it and converges in O(log² n) worst case
    * (≈2·log₂ d in practice), which is the difference between 12
    * rounds and 4000 on a deep chain.
    *
    * Each round is two half-steps over the undirected edge list
    * (canonical (a<b) form), each one partial-aggregated min + one
    * equi-join:
    *  - LARGE-STAR: every node u links each strictly-larger neighbor
    *    to m(u) = min of u's closed neighborhood — deep chains fold
    *    onto local minima;
    *  - SMALL-STAR: every node u links its not-larger neighbors and
    *    itself to its minimum neighbor — partial stars flatten.
    * Fixpoint (edge set unchanged — checked exactly via one tagged-union
    * aggregation, no probabilistic checksum) is reached precisely when
    * every edge runs root→member for its component's minimum. Per
    * round the edge frame is lineage-truncated (iterative
    * localCheckpoint rule) so plan size stays O(1) in rounds.
    *
    * Returns (labels (v, lab), rounds); rounds = 0 marks the
    * size-guarded driver union-find fast path (see the hybrid note in
    * the body). Non-convergence within maxRounds fails loudly,
    * mirroring [[clusters]].
    *
    * Lineage-truncation dial: by default each round's frame is
    * `localCheckpoint()` — executor-memory-pinned and NOT fault
    * tolerant (an executor loss mid-job kills the query, the round-8
    * verdict's caveat). Passing `reliableCheckpointDir` (or setting
    * session conf `graft.dedup.cc.checkpointDir`) switches every
    * barrier to reliable `checkpoint()` into that directory: each
    * round's edge frame is written to storage, so a 100 TB labeling
    * job survives executor churn and re-plans from files instead of
    * recomputing rounds. Measured premium at 20× fixture scale:
    * 1.7× warm wall clock (5.9 s → 10.0 s, SCALING.md round-9) — the
    * per-round write price, worth paying exactly when rounds are
    * expensive enough that re-running them on executor loss costs
    * more than persisting them. */
  private[operators] def connectedComponentsStar(
      s: SparkSession,
      pairs: org.apache.spark.sql.DataFrame,
      maxRounds: Int = 30,
      reliableCheckpointDir: Option[String] = None): (org.apache.spark.sql.DataFrame, Int) = {
    import s.implicits._
    val ckptDir = reliableCheckpointDir
      .orElse(s.conf.getOption("graft.dedup.cc.checkpointDir"))
    ckptDir.foreach(s.sparkContext.setCheckpointDir)
    def barrier(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (ckptDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val p0 = pairs.toDF("x", "y")
    val verts = barrier(p0.select(explode(array($"x", $"y")).as("v"))
      .distinct())
    var edges = barrier(p0.filter($"x" =!= $"y")
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
      .distinct())
    // SIZE-GUARDED HYBRID (the broadcast-join-threshold discipline
    // applied to iterative graph work): every distributed round costs
    // a fixed ~4 jobs of scheduler/shuffle overhead regardless of
    // graph size — measured ~1.5 s/round on a 127-vertex contracted
    // hash graph, i.e. the fixture-scale CC ops were paying ~7 s to
    // label a graph that fits in a cache line. When the DEDUPED edge
    // set is at most `graft.dedup.cc.localEdgeThreshold` (default
    // 100k edges ≈ 1.6 MB — far below what a driver already holds for
    // a broadcast join), finish with a driver union-find instead;
    // larger graphs take the O(log d) distributed contraction exactly
    // as before. Both paths share the min-label contract and the
    // output join shape; CCPropertySpec forces and equates both.
    val localThreshold = s.conf.getOption("graft.dedup.cc.localEdgeThreshold")
      .map(_.toLong).getOrElse(100000L)
    // ONE take(threshold+1) instead of count + collect: on the
    // checkpointed edge frame take() terminates early, the length
    // tells small from large exactly as the count did, and the small
    // case already holds its edges — one job saved per CC invocation
    // (CC runs inside six catalog queries). An EMPTY edge set takes
    // the local path too (empty union-find labels every vertex to
    // itself — same output the distributed loop produced via its
    // isEmpty fast-exit) unless the threshold dial is 0, which keeps
    // forcing the distributed contraction for probes/specs.
    val cap = math.min(localThreshold, Int.MaxValue - 1L).toInt
    val es0 = edges.take(cap + 1)
    // compare against CAP, not the raw threshold (round-19 ADVICE): a
    // threshold configured above Int.MaxValue-1 clamps the take(), and
    // es0.length <= threshold would then run union-find on a TRUNCATED
    // edge set; length <= cap can only hold when take() was exhaustive
    if (es0.length <= cap && localThreshold > 0) {
      val es = es0.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labArr = parent.keys.toArray.map(v => (v, find(v)))
      val labMap = s.createDataset(labArr.toSeq).toDF("v", "lab")
      val labels = verts.join(broadcast(labMap.withColumnRenamed("lab", "l")), Seq("v"), "left")
        .select($"v", coalesce($"l", $"v").as("lab"))
      return (labels, 0)
    }
    var rounds = 0
    var done = edges.isEmpty
    while (!done && rounds < maxRounds) {
      val prev = edges
      val nbrs = edges.select($"a".as("u"), $"b".as("v"))
        .union(edges.select($"b".as("u"), $"a".as("v")))
      // m(u) over the CLOSED neighborhood: min neighbor, clamped by u
      val mins = nbrs.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"u", $"mn").as("m"))
      // large-star: (v, m(u)) for v > u; m ≤ u < v keeps (a,b) canonical
      val large = barrier(nbrs.join(mins, "u").filter($"v" > $"u")
        .select($"m".as("a"), $"v".as("b"))
        .filter($"a" =!= $"b").distinct())
      // small-star over larger→smaller directed edges: u = b side
      val dir = large.select($"b".as("u"), $"a".as("v"))
      val joined = dir.join(dir.groupBy($"u").agg(min($"v").as("m")), "u")
      val small = barrier(joined.select($"m".as("a"), $"v".as("b")).filter($"a" =!= $"b")
        .union(joined.select($"m".as("a"), $"u".as("b")))
        .distinct())
      edges = small
      // exact fixpoint in ONE job (was count + count + anti-join):
      // both sides are distinct sets, so the edge set is unchanged iff
      // every (a,b) carries BOTH tags in the tagged union (sum == 3) —
      // a single partial-aggregated shuffle over 2·|E| checkpointed rows
      done = prev.select($"a", $"b", lit(1L).as("s"))
        .unionAll(edges.select($"a", $"b", lit(2L).as("s")))
        .groupBy($"a", $"b").agg(sum($"s").as("t"))
        .filter($"t" =!= 3L).isEmpty
      rounds += 1
    }
    require(done,
      s"dedup_clusters_star: star contraction did not converge in $rounds rounds")
    val labels = verts.join(edges.select($"b".as("v"), $"a".as("lab")), Seq("v"), "left")
      .select($"v", coalesce($"lab", $"v").as("lab"))
    (labels, rounds)
  }

  /** [[clusters]] recomputed through [[connectedComponentsStar]]: same
    * pair graph, same output contract, same shared DuckDB oracle — so
    * the contraction algorithm is hash-gated against the recursive-CTE
    * ground truth (and, transitively, against the propagation form). */
  val clustersStar: Q = Q(
    "dedup_clusters_star",
    (s, dir) => {
      import s.implicits._
      val pairs = minhashLshPairs(s, dir).select($"d1", $"d2")
      val (lab, _) = connectedComponentsStar(s, pairs)
      val sizes = lab.groupBy($"lab").agg(count(lit(1)).as("cluster_size"))
      lab.join(broadcast(sizes), "lab")
        .select($"lab".as("canonical_id"), $"v".as("doc_id"), $"cluster_size")
        .orderBy($"canonical_id", $"doc_id")
    },
    clustersOracle
  )

  /** Materialized corpus-version LABEL TABLE — the production form the
    * label consumers' scaladocs promise: star-CC labels computed ONCE
    * per corpus version and persisted as a doc_id-bucketed,
    * doc_id-sorted managed table, so every downstream consumer
    * (split/mix/survivors/stats) equi-joins it on doc_id with ZERO
    * exchange contributed by the label side — the BandIndexSpec
    * discipline applied to labels (pinned by LabelStoreSpec).
    *
    * Memoized per (application, corpus dir): the first consumer in a
    * session pays the O(log d) labeling + one 8-bucket write of a
    * frame that only holds docs IN near-dup pairs (a small fraction of
    * the corpus); every later consumer is a bucketed scan. `force`
    * re-materializes (the [[labelsQ]] catalog entry uses it so its
    * bench time is always the honest labeling cost, never a cache
    * hit). Synchronized: suites sharing the JVM session must not race
    * the overwrite. */
  private val labelTableLock = new Object
  private val labelTables =
    scala.collection.mutable.Map.empty[(String, String), String]

  private[graft] def labelTable(s: SparkSession, dir: String,
      force: Boolean = false): String = labelTableLock.synchronized {
    import s.implicits._
    val key = (s.sparkContext.applicationId, dir)
    val name = "graft_dedup_labels_" + Integer.toHexString(dir.hashCode)
    if (force || !labelTables.contains(key)) {
      // a previous JVM's warehouse files survive while its in-memory
      // catalog doesn't — clear both so the CTAS below never trips the
      // non-empty-location check
      s.sql(s"DROP TABLE IF EXISTS $name")
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(wh, name))
      val (lab, _) = connectedComponentsStar(
        s, minhashLshPairs(s, dir).select($"d1", $"d2"))
      lab.select($"v".as("doc_id"), $"lab".as("canonical_id"))
        .write.mode("overwrite")
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable(name)
      labelTables(key) = name
    }
    labelTables(key)
  }

  /** The label table as a catalog entry: (re)materializes
    * [[labelTable]] and returns it — the once-per-corpus-version
    * labeling job a production pipeline schedules, hash-gated against
    * the same recursive-CTE ground truth as both CC algorithms. Bench
    * runs this with force=true, so its time IS the labeling cost and
    * the four consumers' times are what a real pipeline pays after
    * materialization. */
  val labelsQ: Q = Q(
    "dedup_labels",
    (s, dir) => {
      import s.implicits._
      s.table(labelTable(s, dir, force = true)).orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $shingleSetSql,
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      prs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      p AS (SELECT d1, d2 FROM prs WHERE 3 * inter >= n1 + n2),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v)
      SELECT v AS doc_id, lab AS canonical_id FROM cc ORDER BY doc_id
    """)
  )

  /** verified near-dup pair set (d1 < d2) of an arbitrary
    * (doc_id, text) frame — [[minhashLsh]]'s band-candidate + exact-
    * Jaccard-verify pipeline generalized off the `documents` table, so
    * versioned-corpus operators ([[labelsIncremental]]) can pair
    * ARBITRARY snapshots. */
  private[graft] def neardupPairs(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val dd = d.localCheckpoint()   // scanned by bands AND the verify semi-join
    val bands = minhashBandRows(s, dd)
    val cand = bands.as("x")
      .join(bands.as("y"),
        $"x.b" === $"y.b" && $"x.bh" === $"y.bh" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"))
      .distinct()
      .localCheckpoint()
    val candDocs = cand.select(explode(array($"d1", $"d2")).as("doc_id")).distinct()
    val sh = dd.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .select($"doc_id", TextFns.shingleSet($"text").as("sh"))
      .localCheckpoint()
    cand.join(sh.select($"doc_id".as("d1"), $"sh".as("sh1")), "d1")
      .join(sh.select($"doc_id".as("d2"), $"sh".as("sh2")), "d2")
      .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
      .withColumn("n1", size($"sh1")).withColumn("n2", size($"sh2"))
      .filter($"inter" * 3 >= $"n1" + $"n2")
      .select($"d1", $"d2")
  }

  /** The v1-snapshot artifacts a production labeling job persists and
    * the incremental refresh consumes: verified pair list, star-CC
    * labels, and the MinHash band index — materialized ONCE per
    * (application, corpus dir) as bucketed managed tables (the
    * [[labelTable]] discipline; bucketed by join key so consumers read
    * them exchange-free), so [[labelsIncremental]]'s measured cost is
    * the REFRESH, not a rebuild of what the previous version's job
    * already wrote. */
  private val v1ArtifactLock = new Object
  private val v1Artifacts =
    scala.collection.mutable.Map.empty[(String, String), (String, String, String)]

  private[graft] def v1LabelArtifacts(s: SparkSession, dir: String): (String, String, String) =
    v1ArtifactLock.synchronized {
      import s.implicits._
      val key = (s.sparkContext.applicationId, dir)
      val sfx = Integer.toHexString(dir.hashCode)
      val names = (s"graft_v1_pairs_$sfx", s"graft_v1_labels_$sfx", s"graft_v1_bands_$sfx")
      if (!v1Artifacts.contains(key)) {
        val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
        def reset(name: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $name")
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(new java.io.File(wh, name))
        }
        Seq(names._1, names._2, names._3).foreach(reset)
        val bk = substring(md5($"doc_id".cast("string")), 1, 1)
        val v1 = docs(s, dir).filter(bk =!= "f").select($"doc_id", $"text")
        val pairs1 = neardupPairs(s, v1).localCheckpoint()
        pairs1.write.mode("overwrite").bucketBy(8, "d1").sortBy("d1")
          .saveAsTable(names._1)
        val (lab1, _) = connectedComponentsStar(s, pairs1.select($"d1", $"d2"))
        lab1.select($"v".as("doc_id"), $"lab")
          .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
          .saveAsTable(names._2)
        minhashBandRows(s, v1)
          .write.mode("overwrite").bucketBy(8, "b", "bh")
          .saveAsTable(names._3)
        v1Artifacts(key) = names
      }
      v1Artifacts(key)
    }

  /** INCREMENTAL label-table refresh — the versioned-corpus answer to
    * "a snapshot refresh must not re-label 100 TB": when v2 arrives,
    * near-dup cluster labels are recomputed ONLY for components the
    * diff touches, and every other component's labels are carried over
    * from the v1 table VERBATIM.
    *
    * The algorithm (sound because an edge between two UNCHANGED
    * documents can neither appear nor disappear across versions):
    *   1. fresh pairs — band-sketch only the added∪changed slice,
    *      equi-join it against the v2 band index, exact-verify
    *      candidates (the [[snapshotNeardup]] shape; covers
    *      fresh↔unchanged AND fresh↔fresh);
    *   2. surviving edges — v1's persisted pair list minus edges
    *      incident to removed∪changed docs;
    *   3. affected closure — components (by v1 label) containing any
    *      dirty doc or any fresh-pair endpoint; every edge of the new
    *      graph is then provably INSIDE either the affected set or the
    *      untouched set (a surviving edge spans one v1 component; a
    *      fresh edge's endpoints are affected by construction);
    *   4. star-CC only over the affected slice's edges; untouched docs
    *      keep their v1 label, singletons canonicalize to themselves.
    *
    * Hash-gated against the FULL v2 labeling (the oracle recomputes
    * everything with the recursive-CTE walker), so the carry-over
    * logic cannot silently drift — and DedupSpec additionally pins
    * that the affected slice is a strict minority of the corpus, i.e.
    * the incremental path actually skips the bulk of the work.
    *
    * Scale shape: pairs1 + labels1 + the v1 band index come from the
    * memoized bucketed tables [[v1LabelArtifacts]] persists (what the
    * previous version's labeling job wrote); the refresh sketches ONLY
    * the ~3/16 fresh slice — v2's band index is the persisted v1 bands
    * minus dirty docs plus the fresh bands, because an unchanged doc's
    * bands are version-invariant — and the iterative CC, the only
    * super-linear stage, runs over the affected subgraph instead of
    * the corpus. */
  val labelsIncremental: Q = Q(
    "dedup_labels_incremental",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val bk = substring(md5($"doc_id".cast("string")), 1, 1)
      // v1 artifacts: persisted once by the previous version's labeling
      // job (memoized bucketed tables — the labelTable discipline)
      val (pairsT, labelsT, bandsT) = v1LabelArtifacts(s, dir)
      val pairs1 = s.table(pairsT)
      val labels1 = s.table(labelsT)
      // OVERLAP the independent legs (guide §2.6; round-20 JobProfile:
      // 43 jobs, GAP-dominated — job spans 1.9 s, driver gaps 1.8 s —
      // so the critical path IS the serial barrier chain, not any one
      // kernel). fresh ∥ dirty first (independent corpus slices); then
      // v2 ∥ the fresh-side band sketch ∥ the v1 PAIR-TABLE leg
      // (surviving needs only dirty), which reads the persisted
      // bucketed table beside the whole fresh-side sketch chain.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      // the v2 snapshot: drop bucket '0', revise {1,2}, add 'f'
      val freshF = Future(d.filter(bk.isin("f", "1", "2"))
        .select($"doc_id",
          when(bk.isin("1", "2"), concat($"text", lit(" rev2")))
            .otherwise($"text").as("text"))
        .localCheckpoint())   // banded AND shingled
      val dirtyF = Future(d.filter(bk.isin("0", "1", "2")).select($"doc_id")
        .localCheckpoint())
      val fresh = Await.result(freshF, Duration.Inf)
      val dirty = Await.result(dirtyF, Duration.Inf)
      val v2F = Future(d.filter(!bk.isin("0", "f", "1", "2"))
        .select($"doc_id", $"text").unionAll(fresh)
        .localCheckpoint())   // the verify shingles AND the output spine
      // 2. surviving v1 edges: no endpoint dirty — the v1-table leg,
      // materialized IN PARALLEL with the fresh-side sketch below
      val survivingF = Future(pairs1
        .join(dirty.withColumnRenamed("doc_id", "d1"), Seq("d1"), "left_anti")
        .join(dirty.withColumnRenamed("doc_id", "d2"), Seq("d2"), "left_anti")
        .localCheckpoint())
      // 1. fresh pairs vs the whole v2. The fresh slice is the ONLY
      // text sketched — and fresh×v2 factors as fresh×unchanged ∪
      // fresh×fresh, so the persisted (b,bh)-bucketed band table is
      // joined DIRECTLY (its bucketing intact — only the fresh side
      // routes into the bucket layout, the BandIndexSpec discipline;
      // unioning fresh bands into the index first would discard the
      // bucketing and shuffle the index every refresh). An unchanged
      // doc's bands are version-invariant, so the index needs only the
      // broadcast anti-join against the dirty list.
      val fb = minhashBandRows(s, fresh).select($"doc_id".as("fid"), $"b", $"bh")
        .localCheckpoint()   // both factors below
      val hb = s.table(bandsT)
        .join(broadcast(dirty), Seq("doc_id"), "left_anti")
        .select($"doc_id".as("vid"), $"b", $"bh")
      val candOld = fb.join(hb, Seq("b", "bh"))
        .select(least($"fid", $"vid").as("d1"), greatest($"fid", $"vid").as("d2"))
      val candFresh = fb.as("x")
        .join(fb.select($"fid".as("fid2"), $"b", $"bh").as("y"), Seq("b", "bh"))
        .filter($"fid" < $"fid2")
        .select($"fid".as("d1"), $"fid2".as("d2"))
      val cand = candOld.unionAll(candFresh)
        .distinct()
        .localCheckpoint()
      val v2 = Await.result(v2F, Duration.Inf)
      val candDocs = cand.select(explode(array($"d1", $"d2")).as("doc_id")).distinct()
      val sh = v2.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select($"doc_id", TextFns.shingleSet($"text").as("sh"))
        .localCheckpoint()
      val freshPairs = cand
        .join(sh.select($"doc_id".as("d1"), $"sh".as("sh1")), "d1")
        .join(sh.select($"doc_id".as("d2"), $"sh".as("sh2")), "d2")
        .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
        .withColumn("n1", size($"sh1")).withColumn("n2", size($"sh2"))
        .filter($"inter" * 3 >= $"n1" + $"n2")
        .select($"d1", $"d2")
        .localCheckpoint()
      val surviving = Await.result(survivingF, Duration.Inf)
      // 3. affected closure via v1 labels
      val touched = dirty
        .unionAll(freshPairs.select(explode(array($"d1", $"d2")).as("doc_id")))
        .distinct()
      val affectedLabs = labels1
        .join(touched, Seq("doc_id"), "left_semi")
        .select($"lab").distinct()
      val affected = labels1.join(affectedLabs, Seq("lab"), "left_semi")
        .select($"doc_id").unionAll(touched).distinct()
        .localCheckpoint()
      // 4. re-label only the affected slice
      val edges2 = surviving.select($"d1", $"d2").unionAll(freshPairs).distinct()
      val edgesAffected = edges2
        .join(affected.withColumnRenamed("doc_id", "d1"), Seq("d1"), "left_semi")
      val (lab2, _) = connectedComponentsStar(s, edgesAffected.select($"d1", $"d2"))
      val labels2 = lab2.select($"v".as("doc_id"), $"lab".as("newlab"))
      v2.select($"doc_id")
        .join(affected.withColumn("is_affected", lit(true)), Seq("doc_id"), "left")
        .join(labels1.withColumnRenamed("lab", "oldlab"), Seq("doc_id"), "left")
        .join(labels2, Seq("doc_id"), "left")
        .select($"doc_id",
          when(coalesce($"is_affected", lit(false)), coalesce($"newlab", $"doc_id"))
            .otherwise(coalesce($"oldlab", $"doc_id")).as("canonical_id"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH RECURSIVE v2 AS (
        SELECT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('1', '2')
                    THEN text || ' rev2' ELSE text END AS text
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
      ),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(toks)-2),
                             i -> array_to_string(toks[i+1:i+3], ' '))) AS shset
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
              FROM v2)
        WHERE len(toks) >= 3
      ),
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      prs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      p AS (SELECT d1, d2 FROM prs WHERE 3 * inter >= n1 + n2),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v)
      SELECT d.doc_id, COALESCE(cc.lab, d.doc_id) AS canonical_id
      FROM v2 d LEFT JOIN cc ON cc.v = d.doc_id
      ORDER BY d.doc_id
    """)
  )

  /** Dedup SAVINGS report: the cluster-size histogram of the near-dup
    * graph — for each component size, how many components exist and
    * how many documents deduplication removes (size−1 per component).
    * The "what did dedup buy" readout a curation run reports before
    * committing a corpus version; pairs with the corpus-diff and
    * survivor ops as the human-facing summary of the dedup family.
    *
    * Scale shape: reads the materialized [[labelTable]] (no labeling
    * recomputed), then two tiny aggregations — per-cluster rollup on
    * the label frame and a histogram whose key space is |distinct
    * sizes|, vanishingly small at any corpus scale. */
  val clusterStats: Q = Q(
    "dedup_cluster_stats",
    (s, dir) => {
      import s.implicits._
      s.table(labelTable(s, dir))
        .groupBy($"canonical_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy($"cluster_size")
        .agg(count(lit(1)).as("n_clusters"))
        .withColumn("dup_docs", ($"cluster_size" - 1) * $"n_clusters")
        .orderBy($"cluster_size")
    },
    clustersOracle.map(cc => s"""
      SELECT cluster_size,
             COUNT(*) AS n_clusters,
             CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS dup_docs
      FROM (SELECT DISTINCT canonical_id, cluster_size FROM ($cc))
      GROUP BY cluster_size
      ORDER BY cluster_size
    """)
  )

  /** Benchmark decontamination: flag every training document that
    * shares at least one 8-token shingle with the held-out benchmark
    * set — the standard n-gram-overlap contamination check a
    * pretraining pipeline runs before any eval (the reference has no
    * analog; this is pure LLM-pipeline surface). The benchmark split
    * is content-addressed (first md5 byte ≥ 'f0', ~6% of docs — the
    * [[Pipeline.splitAssign]] idiom), so both engines and every run
    * agree on it with no RNG. 8-gram matches on this vocabulary are
    * ~(1/V)⁸ by chance, so a hit means a genuinely copied span, not a
    * common phrase.
    *
    * Scale shape (100 TB): real benchmark sets are FIXED and TINY
    * (thousands of docs) while the train corpus is the 100 TB side —
    * so the distinct benchmark shingle set is BROADCAST and the train
    * corpus is scanned exactly once with a map-side hash-join probe:
    * the corpus never shuffles, and per-doc hit counts partial-
    * aggregate. If the benchmark side ever outgrew broadcast the same
    * plan degrades gracefully to a shuffle equi-join on a 64-bit
    * shingle fingerprint ([[fnv1a64]]); the join here stays on the
    * raw shingle string only so the DuckDB oracle is byte-identical. */
  /** (doc_id, bucket, g): each document's DISTINCT 8-token shingles,
    * exploded, with its content-addressed split bucket. Stateless, so
    * it applies unchanged to a document STREAM (see
    * ContaminationStreamSpec — the probe is a stream-static join). */
  private[graft] def contaminationShingles(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val n = 8
    df.select(c("doc_id"),
        substring(md5(c("doc_id").cast("string")), 1, 2).as("bucket"),
        TextFns.tokens(c("text")).as("toks"))
      .filter(size(c("toks")) >= n)
      .select(c("doc_id"), c("bucket"),
        explode(array_distinct(TextFns.shingles(c("toks"), n))).as("g"))
  }

  /** Probe `trainShingles` against the broadcast benchmark gram set and
    * count hits per doc. `count`, not `countDistinct`: shingles are
    * array_distinct'd per doc BEFORE the explode, so the counts are
    * equal — and plain count drops the two-phase distinct aggregate
    * from the plan and keeps the probe legal in streaming aggregation
    * (countDistinct is not). Unsorted: callers order (batch oracle) or
    * can't (streaming). */
  private[graft] def contaminationProbe(
      trainShingles: DataFrame, benchGrams: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    trainShingles
      .join(broadcast(benchGrams), "g")
      .groupBy(c("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  val contamination: Q = Q(
    "dedup_contamination",
    (s, dir) => {
      import s.implicits._
      val sh = contaminationShingles(docs(s, dir))
      val bench = sh.filter($"bucket" >= "f0").select($"g").distinct()
      contaminationProbe(sh.filter($"bucket" < "f0"), bench)
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
      ),
      sh AS (
        SELECT doc_id, bucket,
               unnest(list_distinct(list_transform(range(1, len(toks) - 8 + 2),
                 i -> array_to_string(toks[i:i+7], ' ')))) AS g
        FROM t WHERE len(toks) >= 8
      ),
      bench AS (SELECT DISTINCT g FROM sh WHERE bucket >= 'f0')
      SELECT s.doc_id, COUNT(DISTINCT s.g) AS n_hits
      FROM sh s JOIN bench USING (g)
      WHERE s.bucket < 'f0'
      GROUP BY s.doc_id
      ORDER BY s.doc_id
    """)
  )

  /** Near-dup SURVIVOR selection — the step that actually shrinks the
    * corpus: from every near-dup cluster keep only the canonical
    * (minimum doc_id) member, keep every unclustered doc, and carry
    * `n_merged` (how many docs the survivor absorbed, 1 for
    * singletons) for mixture re-weighting. [[clusters]]/[[clustersStar]]
    * LABEL the components; this emits the deduplicated corpus a
    * training run consumes. Reads the materialized [[labelTable]]
    * (star-CC computed once per corpus version, never here); survivors
    * come from a LEFT ANTI join on the duplicate ids (shuffle keyed on
    * doc_id — AQE converts it to broadcast whenever the dup set is
    * small, but it stays correct when near-dup rates are high and the
    * dup set is corpus-sized) plus a broadcast of the per-canonical
    * sizes (one row per CLUSTER, always small relative to the
    * corpus). */
  val survivors: Q = Q(
    "dedup_survivors",
    (s, dir) => {
      import s.implicits._
      val labT = s.table(labelTable(s, dir))
      val dupes = labT.filter($"doc_id" =!= $"canonical_id").select($"doc_id")
      val sizes = labT.groupBy($"canonical_id").agg(count(lit(1)).as("n_merged"))
        .withColumnRenamed("canonical_id", "doc_id")
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang", $"source")
        .join(dupes, Seq("doc_id"), "left_anti")
        .join(broadcast(sizes), Seq("doc_id"), "left")
        .select($"doc_id", $"lang", $"source",
          coalesce($"n_merged", lit(1L)).as("n_merged"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $shingleSetSql,
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      prs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      p AS (SELECT d1, d2 FROM prs WHERE 3 * inter >= n1 + n2),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v),
      sz AS (SELECT lab, COUNT(*) AS n_merged FROM cc GROUP BY lab)
      SELECT d.doc_id, d.lang, d.source,
             COALESCE(sz.n_merged, 1) AS n_merged
      FROM documents d
      LEFT JOIN cc ON d.doc_id = cc.v
      LEFT JOIN sz ON d.doc_id = sz.lab
      WHERE cc.v IS NULL OR cc.v = cc.lab
      ORDER BY d.doc_id
    """)
  )

  /** Embedding near-dup at SCALE — the LSH-bucketed path that
    * [[embeddingCosine]]'s fence points to, now shipped as a first-class
    * operator instead of a scaladoc promise. Each vector gets the
    * 8-plane sign bucket shared with the ANN path
    * ([[VectorSearch.signBucket]] — same literal hyperplanes), then
    * candidate pairs are vectors whose buckets differ in ≤ 2 bits (the
    * same default radius as the ANN multiprobe dial), found by a
    * bucket EQUI-join against a 37-mask multiprobe explode — never an
    * all-pairs product. Exact cosine verifies candidates at the same
    * 0.45 threshold as the brute-force baseline, so precision is 1 by
    * construction.
    *
    * The probe algebra dedups itself: for an unordered pair {x,y} with
    * hamming(bx,by) ≤ 2 exactly one direction passes the `vec_id < j`
    * gate for the single mask that maps one bucket onto the other, so
    * no distinct is needed and vectors ride the join into the verify.
    * Deterministic (literal planes, exact arithmetic) → FULL oracle.
    *
    * Recall is the sign-LSH collision curve: a plane agrees with
    * probability 1 − θ/π, so at cos ≥ 0.9 (true dup territory — the
    * regime this operator is FOR) P[hamming ≤ 2 of 8] ≈ 0.90, which
    * DedupSpec PROVES on planted near-identical vectors; at this
    * fixture's borderline threshold (pairs sit at cos 0.45–0.51,
    * θ ≈ 60°) the curve decays fast — measured 1/7 on the fixture with
    * a ≥ 0.1 floor asserted in DedupSpec as the documented trade, with
    * [[embeddingCosine]] as the exact fallback below its row fence.
    *
    * Scale dial: p planes → 2^p buckets, and the verify term is
    * quadratic-within-bucket (~37·n²/2^p pair evaluations), so the
    * plane count is what holds a 100 TB corpus sub-quadratic — 8
    * planes (256 buckets) fits this fixture; production would use
    * 16–24 (65k–16M buckets, same code path: [[VectorSearch.signBucket]]
    * generalizes per plane seq) so per-bucket populations stay
    * executor-sized and the bucket key carries enough parallelism. */
  /** plane-parameterized core of [[embeddingLsh]] (and of
    * `tools.EmbedDedupScaleProbe`, which dials the plane count to
    * measure the 2^p sub-quadratic knob): sign-bucket the corpus at
    * `nPlanes` planes, bucket-equi-join against the ≤2-bit-flip
    * multiprobe explode, exact-cosine verify at 0.45. */
  private[graft] def embeddingLshPairs(
      s: SparkSession, dir: String, nPlanes: Int,
      minCos: Double = 0.45): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graftexpr.VectorFunctions.dot_product
    val masks = (0 until (1 << nPlanes)).filter(m => Integer.bitCount(m) <= 2)
    val e = Tables.load(s, dir, "embeddings")
      // UNPINNED on purpose: tiny vector frame — 32 pinned partitions
      // taxed every downstream stage ~1.3-2x (measured round 19)
      .repartition($"vec_id")
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(dot_product($"v", $"v")))
      .withColumn("bucket", VectorSearch.signBucket($"v", VectorSearch.planesFor(nPlanes)))
      .persist()   // norms+buckets computed once, reused on both join sides
    val probes = e.select($"vec_id".as("j"), $"v".as("vb"), $"nrm".as("nb"),
      explode(expr(
        s"transform(array(${masks.mkString(",")}), m -> cast(bucket ^ m as int))"))
        .as("bucket"))
    e.join(probes, Seq("bucket"))
      .filter($"vec_id" < $"j")
      .withColumn("cos", dot_product($"v", $"vb") / ($"nrm" * $"nb"))
      .filter($"cos" >= minCos)
      .select($"vec_id".as("i"), $"j", $"cos")
  }

  val embeddingLsh: Q = Q(
    "dedup_embedding_lsh",
    (s, dir) => embeddingLshPairs(s, dir, 8).orderBy("i", "j"),
    Some(s"""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
                 FROM embeddings),
      n AS (SELECT vec_id, v,
              sqrt(${VectorSearch.sqlDot("v", "v")}) nrm,
              CAST(${VectorSearch.sqlSignBucket("v")} AS INT) AS bucket
            FROM e),
      probes AS (SELECT vec_id j, v vb, nrm nb, CAST(xor(bucket, m) AS INT) AS bucket
                 FROM n CROSS JOIN (SELECT unnest([${VectorSearch.probeMasks(2).mkString(", ")}]) AS m)),
      cand AS (SELECT a.vec_id i, p.j,
                 ${VectorSearch.sqlDot("a.v", "p.vb")} / (a.nrm * p.nb) AS cos
               FROM n a JOIN probes p USING (bucket)
               WHERE a.vec_id < p.j)
      SELECT i, j, cos FROM cand WHERE cos >= 0.45 ORDER BY i, j
    """)
  )

  /** Shingle width for substring-granularity dedup: 8 tokens on the
    * short-doc fixture (production corpora use 50, per the Lee et al.
    * finding that ~50-token repeats are near-always boilerplate; the
    * dial is this one constant). */
  val SubstringK: Int = 8

  /** Maximal duplicated-substring spans, the substring-granularity
    * dedup the doc-level family (exact/minhash/simhash/jaccard) can't
    * see: a k-token shingle whose hash occurs ≥2 times ANYWHERE in the
    * corpus (other docs or elsewhere in the same doc — both are
    * training-set repetition) marks its start position duplicated;
    * runs of duplicated starts ≤k apart merge into maximal spans
    * (contiguous duplicated coverage), the shingle-granularity
    * approximation of Lee et al.'s suffix-array repeated substrings.
    *
    * 100 TB shape: ONE shuffle of the exploded shingle stream on the
    * shingle hash, with the corpus-wide occurrence count as a
    * whole-partition window over that hash (never a join of the
    * exploded stream against itself, and no second corpus scan — the
    * positions ride the same shuffle the count uses), then a per-doc
    * window bounded by document length. No all-pairs anything; cost is
    * linear in corpus token count.
    *
    * Returns (doc_id, span_start, span_end inclusive, span_tokens,
    * n_dup_shingles), token positions 0-based. */
  private def substringSpans(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val sh = Tables.load(s, dir, "documents")
      .select($"doc_id", TextFns.tokens($"text").as("toks"))
      .select($"doc_id", posexplode(TextFns.shingles($"toks", k)))
      .select($"doc_id", $"pos".cast("long").as("pos"), md5($"col").as("h"))
    // corpus-wide occurrence count as a whole-partition window over the
    // hash, NOT groupBy-count + semi-join back: one shuffle of the
    // exploded stream and ONE scan of the corpus instead of two scans
    // joined on the hash (the explode is cheaper to carry through the
    // shuffle once than to recompute and re-join at 100 TB)
    val wh = org.apache.spark.sql.expressions.Window.partitionBy($"h")
    val hits = sh
      .withColumn("n_occ", count(lit(1)).over(wh))
      .filter($"n_occ" >= 2)
      .select($"doc_id", $"pos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    hits
      .withColumn("prev", lag($"pos", 1).over(w))
      .withColumn("island",
        sum(when($"prev".isNull || $"pos" - $"prev" > k, 1L).otherwise(0L)).over(w))
      .groupBy($"doc_id", $"island")
      .agg(
        min($"pos").as("span_start"),
        (max($"pos") + (k - 1)).as("span_end"),
        (max($"pos") - min($"pos") + k).as("span_tokens"),
        count(lit(1)).as("n_dup_shingles"))
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens", $"n_dup_shingles")
  }

  /** shared oracle prefix: duplicated-shingle islands at width k (the
    * window SUM is CAST BIGINT — DuckDB window sums go HUGEINT). */
  private def spansOracleCte(k: Int): String = s"""
      WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                 FROM documents),
      sh AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - ${k - 1}), i ->
               struct_pack(pos := i, h := md5(array_to_string(toks[i + 1 : i + $k], ' '))))) s
             FROM t WHERE len(toks) >= $k),
      dup AS (SELECT s.h h FROM sh GROUP BY s.h HAVING count(*) >= 2),
      hits AS (SELECT doc_id, s.pos pos FROM sh WHERE s.h IN (SELECT h FROM dup)),
      lagd AS (SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) prev
               FROM hits),
      isl AS (SELECT doc_id, pos,
                CAST(SUM(CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) island
              FROM lagd),
      spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) span_start,
                       CAST(max(pos) + ${k - 1} AS BIGINT) span_end,
                       CAST(max(pos) - min(pos) + $k AS BIGINT) span_tokens,
                       CAST(count(*) AS BIGINT) n_dup_shingles
                FROM isl GROUP BY doc_id, island)"""

  val substringDetect: Q = Q(
    "dedup_substring",
    (s, dir) => {
      import s.implicits._
      substringSpans(s, dir, SubstringK).orderBy($"doc_id", $"span_start")
    },
    Some(s"""
      ${spansOracleCte(SubstringK)}
      SELECT doc_id, span_start, span_end, span_tokens, n_dup_shingles
      FROM spans ORDER BY doc_id, span_start
    """)
  )

  /** The apply side of [[substringDetect]]: remove every token covered by a
    * duplicated span and reconstruct the cleaned document — the actual
    * corpus transformation substring dedup exists for. Per-doc span
    * lists are collected (order-independent membership test, so
    * `collect_list` nondeterminism is harmless) and joined back to the
    * corpus; the planner broadcasts the spans side while it is small
    * (the usual case — spans ∝ duplicated content, not corpus size)
    * and falls back to a shuffle join when it is not. */
  val substringClean: Q = Q(
    "dedup_substring_clean",
    (s, dir) => {
      import s.implicits._
      val spans = substringSpans(s, dir, SubstringK)
        .groupBy($"doc_id")
        .agg(collect_list(struct($"span_start".as("s"), $"span_end".as("e"))).as("sp"))
      Tables.load(s, dir, "documents")
        .select($"doc_id", TextFns.tokens($"text").as("toks"))
        .join(spans, Seq("doc_id"), "left")
        .select($"doc_id", $"toks",
          coalesce($"sp", array().cast("array<struct<s:bigint,e:bigint>>")).as("sp"))
        .select($"doc_id", $"toks",
          filter($"toks", (_, i) =>
            !exists($"sp", p => p.getField("s") <= i && i <= p.getField("e"))).as("kept"))
        .select($"doc_id",
          size($"toks").cast("long").as("n_tokens"),
          (size($"toks") - size($"kept")).cast("long").as("n_removed"),
          concat_ws(" ", $"kept").as("clean_text"))
        .orderBy($"doc_id")
    },
    Some(s"""
      ${spansOracleCte(SubstringK)},
      bydoc AS (SELECT doc_id, list(struct_pack(s := span_start, e := span_end)) sp
                FROM spans GROUP BY doc_id),
      j AS (SELECT t.doc_id, toks, coalesce(sp, []) sp
            FROM t LEFT JOIN bydoc ON t.doc_id = bydoc.doc_id)
      SELECT doc_id, CAST(len(toks) AS BIGINT) n_tokens,
             CAST(len(toks) - len(kept) AS BIGINT) n_removed,
             coalesce(array_to_string(kept, ' '), '') clean_text
      FROM (SELECT doc_id, toks,
              list_filter(toks, (x, i) ->
                len(list_filter(sp, p -> p.s <= i - 1 AND i - 1 <= p.e)) = 0) kept
            FROM j)
      ORDER BY doc_id
    """)
  )

  /** SEMANTIC dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space coarsely, then prune within-cluster
    * pairs above a cosine threshold — semantically-redundant documents
    * that near-dup text methods can't see. Reuses the content-addressed
    * IVF-Flat codebook ([[VectorSearch.ivfFlatAssign]] — the 16
    * lowest-vec_id vectors, broadcast, argmin assignment), which keeps
    * the whole operator deterministic and fully DuckDB-oracled, unlike
    * a KMeans quantizer. A vector is flagged when SOME lower-vec_id
    * member of its cell sits at cos ≥ 0.45 (the corpus-wide threshold
    * shared with [[embeddingCosine]]); `dup_of` is the smallest such
    * survivor — min-id canonicalization, same convention as
    * [[clusters]].
    *
    * 100 TB shape: this is THE reason SemDeDup clusters first — the
    * quadratic term drops from n² to C·(n/C)² = n²/C, bounded per cell
    * and embarrassingly parallel across cells (one shuffle on the cell
    * id). Scale the cell count ~√n (here the oracle-able fixture
    * codebook is 16) and per-cell work stays constant; a skewed cell
    * re-splits with the same two-phase pattern as
    * [[Pipeline.sourceCap2Phase]]. Cosine is exact inside the cell, so
    * precision is 1 by construction; recall misses only cross-cell
    * pairs (the documented SemDeDup trade vs the all-pairs baseline
    * this catalog also carries, fence-bounded, in [[embeddingCosine]]). */
  val semantic: Q = Q(
    "dedup_semantic",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.graftexpr.VectorFunctions.dot_product
      val (assigned, _) = VectorSearch.ivfFlatAssign(s, dir)
      val m = assigned.select($"cell", $"vec_id", $"v", $"nrm")
      val x = m.select($"cell", $"vec_id".as("i"), $"v".as("va"), $"nrm".as("na"))
      val y = m.select($"cell", $"vec_id".as("j"), $"v".as("vb"), $"nrm".as("nb"))
      x.join(y, Seq("cell")).filter($"j" < $"i")
        .withColumn("cos", dot_product($"va", $"vb") / ($"na" * $"nb"))
        .filter($"cos" >= 0.45)
        .groupBy($"cell", $"i")
        .agg(min($"j").as("dup_of"),
          round(max($"cos") * 1e6).cast("long").as("cos_micro"))
        .select($"i".as("vec_id"), $"cell", $"dup_of", $"cos_micro")
        .orderBy($"vec_id")
    },
    Some("""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
                 FROM embeddings),
      n AS (SELECT vec_id, v,
              sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1]*s[2]), (a, b) -> a + b)) nrm
            FROM e),
      cents AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec FROM n WHERE vec_id < 16),
      sc AS (SELECT n.vec_id, cell,
               list_reduce(list_transform(list_zip(cvec, cvec), s -> s[1]*s[2]), (x, y) -> x + y)
                 - 2.0 * list_reduce(list_transform(list_zip(v, cvec), s -> s[1]*s[2]), (x, y) -> x + y)
                 AS score
             FROM n, cents),
      assign AS (SELECT vec_id, cell FROM (
                   SELECT vec_id, cell,
                          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) rn
                   FROM sc) WHERE rn = 1),
      m AS (SELECT a.cell, n.vec_id, n.v, n.nrm FROM assign a JOIN n USING (vec_id)),
      p AS (SELECT x.cell, x.vec_id AS i, y.vec_id AS j,
              list_reduce(list_transform(list_zip(x.v, y.v), s -> s[1]*s[2]), (a, b) -> a + b)
                / (x.nrm * y.nrm) AS cos
            FROM m x JOIN m y ON x.cell = y.cell AND y.vec_id < x.vec_id)
      SELECT i AS vec_id, cell, MIN(j) AS dup_of,
             CAST(ROUND(MAX(cos) * 1e6) AS BIGINT) AS cos_micro
      FROM p WHERE cos >= 0.45
      GROUP BY i, cell
      ORDER BY vec_id
    """)
  )

  /** Boilerplate-chunk detection (the RefinedWeb / CCNet repeated-
    * paragraph stage at chunk granularity): a chunk whose content hash
    * appears in ≥ 2 DISTINCT documents is boilerplate (headers,
    * footers, license blocks, templated spans — cross-document
    * repetition, where [[substringDetect]] counts raw occurrences
    * including within-doc repeats). Chunking is the same win=32 /
    * stride=24 scheme as `doc_chunks`, so this composes with the RAG
    * path. Output is the per-document audit row — total chunk
    * instances and how many are cross-doc-shared — the rate a curation
    * pipeline monitors before applying removal.
    *
    * 100 TB shape: ONE corpus scan + explode (linear in corpus
    * tokens), immediately partial-aggregated to (fp, doc_id)
    * granularity with map-side combine — within-doc repeats collapse
    * before anything shuffles — then the document frequency is a
    * whole-partition window count over fp on that collapsed stream
    * (the same one-scan-instead-of-rescan-and-join lesson as
    * [[substringDetect]]), and the per-doc audit rollup is the final
    * small-keyed aggregation. Three shuffles total, all at collapsed
    * granularity; the corpus text is read and tokenized exactly once. */
  val boilerplate: Q = Q(
    "dedup_boilerplate",
    (s, dir) => {
      import s.implicits._
      val c = docs(s, dir)
        .select($"doc_id", TextFns.tokens($"text").as("toks"))
        .filter(size($"toks") > 0)
        .select($"doc_id", explode(expr(
          "transform(sequence(0, size(toks) - 1, 24), " +
            "st -> md5(concat_ws(' ', slice(toks, st + 1, 32))))")).as("fp"))
      val perDoc = c.groupBy($"fp", $"doc_id").agg(count(lit(1)).as("n_inst"))
      val wf = org.apache.spark.sql.expressions.Window.partitionBy($"fp")
      perDoc.withColumn("df", count(lit(1)).over(wf))
        .groupBy($"doc_id")
        .agg(sum($"n_inst").as("n_chunks"),
          coalesce(sum(when($"df" >= 2, $"n_inst")), lit(0L)).as("n_boiler"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
      ),
      c AS (
        SELECT doc_id,
               unnest(list_transform(range(0, len(toks), 24),
                 st -> md5(array_to_string(toks[st + 1 : st + 32], ' ')))) AS fp
        FROM t WHERE len(toks) > 0
      ),
      b AS (
        SELECT fp, 1 AS is_b FROM c GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
      )
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(COUNT(is_b) AS BIGINT) AS n_boiler
      FROM c LEFT JOIN b USING (fp)
      GROUP BY doc_id
      ORDER BY doc_id
    """)
  )

  // ---------------------------------------------------------------------
  // Incremental-ingest dedup: admit only new-batch documents whose
  // content is absent from the historical corpus.
  // ---------------------------------------------------------------------

  /** The fixture's deterministic "daily ingest" split: documents whose
    * content-addressed md5(doc_id) bucket starts below '8' are the
    * historical corpus (~half), the rest are today's batch. Production
    * would read two different tables; the split keeps the operator
    * self-contained and fully oracled on the shared `documents` table. */
  private def ingestSplit(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val d = docs(s, dir)
      .select($"doc_id", $"source", md5($"text").as("content_md5"),
        substring(md5($"doc_id".cast("string")), 1, 1).as("b"))
    (d.filter($"b" < "8").drop("b"), d.filter($"b" >= "8").drop("b"))
  }

  private val incrementalOracle = Some("""
    WITH d AS (
      SELECT doc_id, source, md5(text) AS content_md5,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS b
      FROM documents
    ),
    hist AS (SELECT DISTINCT content_md5 FROM d WHERE b < '8'),
    fresh AS (SELECT doc_id, source, content_md5 FROM d WHERE b >= '8')
    SELECT MIN(doc_id) AS doc_id, content_md5,
           CAST(COUNT(*) AS BIGINT) AS n_batch_copies
    FROM fresh
    WHERE content_md5 NOT IN (SELECT content_md5 FROM hist)
    GROUP BY content_md5
    ORDER BY doc_id
  """)

  /** Admission core, exact form: the batch left-anti joined against
    * the historical fingerprint set, then deduped within the batch
    * (min doc_id survives, copies counted). Factored out so the specs
    * can drive it with synthetic frames that CONTAIN cross-batch and
    * in-batch duplicates — the shipped fixture's texts are all
    * distinct, so on fixture data the anti join is (correctly)
    * vacuous, exactly like `dedup_exact`'s n_copies. */
  private[graft] def admitNew(fresh: DataFrame, histMd5: DataFrame): DataFrame =
    fresh
      .join(histMd5, Seq("content_md5"), "left_anti")
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_batch_copies"))
      .select(col("doc_id"), col("content_md5"), col("n_batch_copies"))

  /** Admission core, Bloom-prefiltered: rows the sketch rejects are
    * provably new (no false negatives) and bypass the join; only the
    * might-contain slice — true dups plus the fpp tail, both bounded
    * by BATCH size, not history size — pays the exact check. That
    * check is shaped so history is scanned but NEVER exchanged: the
    * candidate fingerprint set (tiny) is broadcast INTO a semi probe
    * of history, and the hits (≤ candidates) are broadcast back into
    * the anti join. A naive `cands ANTI JOIN history` would have
    * re-shuffled the full history — the exact cost the sketch exists
    * to remove. Bit-identical to [[admitNew]] by construction. */
  private[graft] def admitNewBloom(
      fresh: DataFrame, histMd5: DataFrame, bloomBytes: Array[Byte]): DataFrame = {
    import org.apache.spark.sql.graftexpr.BloomFunctions.bloom_might_contain
    val mightBeDup = bloom_might_contain(col("content_md5"), bloomBytes)
    val definitelyNew = fresh.filter(!mightBeDup)
    val cands = fresh.filter(mightBeDup)
    val candKeys = cands.select(col("content_md5")).distinct()
    val histHits = histMd5.join(broadcast(candKeys), Seq("content_md5"), "left_semi")
    val admittedCands = cands.join(broadcast(histHits), Seq("content_md5"), "left_anti")
    definitelyNew.unionByName(admittedCands)
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_batch_copies"))
      .select(col("doc_id"), col("content_md5"), col("n_batch_copies"))
  }

  /** Incremental dedup, exact form: today's batch left-anti joined
    * against the historical fingerprint set, then deduped within the
    * batch (min doc_id survives). The admitted manifest is what an
    * ingest job appends to the corpus.
    *
    * Scale shape: one shuffle per side on the 128-bit fingerprint —
    * the anti join co-partitions history and batch, and the in-batch
    * dedup reuses the batch's partitioning (same key). Honest cost
    * note: the anti join re-shuffles the FULL historical fingerprint
    * set every run even though the daily batch is tiny — that is
    * exactly the term [[incrementalBloom]] removes. */
  val incremental: Q = Q(
    "dedup_incremental",
    (s, dir) => {
      import s.implicits._
      val (hist, fresh) = ingestSplit(s, dir)
      admitNew(fresh, hist.select($"content_md5").distinct()).orderBy($"doc_id")
    },
    incrementalOracle
  )

  /** Tree-reduce a string column into one Bloom filter on the driver.
    * Deterministic: bit positions depend only on the inserted values
    * and the sketch geometry, and merge is a commutative bit-OR, so
    * partitioning and arrival order don't matter. */
  private[graft] def bloomOf(
      s: SparkSession, col: DataFrame, expected: Long, fpp: Double): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    import s.implicits._
    val bf = col.as[String].rdd.treeAggregate(BloomFilter.create(expected, fpp))(
      (b, v) => { b.putString(v); b },
      (a, b) => a.mergeInPlace(b))
    org.apache.spark.sql.graftexpr.BloomFunctions.toBytes(bf)
  }

  /** Incremental dedup, Bloom-prefiltered scale form — same admitted
    * manifest as [[incremental]] (bit-identical, shared oracle), built
    * so the historical corpus is SCANNED but never SHUFFLED:
    *
    *  1. one pass over history tree-reduces its fingerprints into a
    *     Bloom filter (driver-merged, no exchange);
    *  2. the batch splits inside scan codegen
    *     ([[org.apache.spark.sql.graftexpr.BloomMightContainString]]):
    *     rows the filter rejects are PROVABLY new (no false negatives)
    *     and bypass the join entirely;
    *  3. only the might-contain slice — true dups plus the fpp tail —
    *     pays the exact check, and that check broadcasts the tiny
    *     candidate set against history (semi probe + anti join, both
    *     broadcast) rather than exchanging history's rows.
    *
    * At 100 TB: a daily batch against a 10⁹-fingerprint history costs
    * ~1.2 GB of sketch at 1% fpp (9.6 bits/key) — task-broadcast once
    * per run, vs re-shuffling ~3 TB of fingerprint rows every day in
    * the exact form; and the filter is mergeable, so production keeps
    * it warm by folding in each day's admitted fingerprints instead of
    * rebuilding. Past broadcastable sketch sizes (≳10¹⁰ keys), shard
    * the filter by fingerprint prefix or fall back to [[incremental]].
    * Sizing here is fixture-scaled (2¹⁶ expected keys); production
    * sizes from catalog stats. */
  val incrementalBloom: Q = Q(
    "dedup_incremental_bloom",
    (s, dir) => {
      import s.implicits._
      val (hist, fresh0) = ingestSplit(s, dir)
      val histMd5 = hist.select($"content_md5").distinct()
      val bloom = bloomOf(s, histMd5, expected = 1L << 16, fpp = 0.01)
      val fresh = fresh0.localCheckpoint() // one scan feeds both branches
      admitNewBloom(fresh, histMd5, bloom).orderBy($"doc_id")
    },
    incrementalOracle
  )

  /** (doc_id, text) frame → its 16×4 MinHash band rows (doc_id, b, bh)
    * — one kernel pass, the [[minhashLsh]] banding. Works on batch AND
    * streaming frames (the kernel is a stateless mapPartitions +
    * generator), which is how IncrementalMinhashStreamSpec probes a
    * static history band index with an arriving document stream. */
  private[graft] def minhashBandRows(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val minhashes = d.select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (doc, text) =>
        sketchText(text).map(mh => (doc, mh))
      })
      .toDF("doc_id", "mh")
    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("b"),
        xxhash64(element_at($"mh", 4 * b + 1), element_at($"mh", 4 * b + 2),
          element_at($"mh", 4 * b + 3), element_at($"mh", 4 * b + 4)).as("bh"))
    }
    minhashes
      .select($"doc_id", explode(array(bandStructs: _*)).as("band"))
      .select($"doc_id", $"band.b".as("b"), $"band.bh".as("bh"))
  }

  /** Incremental NEAR-dup: today's batch MinHash-banded against the
    * historical corpus — the [[minhashLsh]] semantics with the
    * [[incremental]] split. Candidates come from a band equi-join of
    * the batch's bands against history's (no in-batch pairs: the join
    * crosses the split by construction), then the exact integer-Jaccard
    * verify runs only on candidate docs.
    *
    * Scale shape: production persists history's band table once
    * (bucketed by (b, bh)), so a daily run sketches ONLY the batch —
    * one kernel pass over new text — and equi-joins ~16·|batch| band
    * rows against the stored index; history text is never re-read and
    * never re-sketched. The fixture form derives both sides from the
    * shared table so the driver can oracle it against the exact
    * cross-split Jaccard pair set (same 16×4 banding ⇒ a true j ≥ 2/3
    * pair misses with prob ≤ (1−(2/3)⁴)¹⁶ ≈ 3e-2 at the threshold and
    * ~4e-9 at the planted j ≈ 0.9; on this fixture the sets match
    * exactly, which the oracle hash-gates). */
  val incrementalMinhash: Q = Q(
    "dedup_incremental_minhash",
    (s, dir) => {
      import s.implicits._
      // sketched once, split after: referenced by both sides below
      val bands = minhashBandRows(s, docs(s, dir).select($"doc_id", $"text"))
        .withColumn("bk", substring(md5($"doc_id".cast("string")), 1, 1))
        .localCheckpoint()
      val hb = bands.filter($"bk" < "8").select($"doc_id".as("hist_id"), $"b", $"bh")
      val fb = bands.filter($"bk" >= "8").select($"doc_id".as("fresh_id"), $"b", $"bh")
      val cand = hb.join(fb, Seq("b", "bh"))
        .select($"hist_id", $"fresh_id").distinct()
        .localCheckpoint() // referenced three times below
      val candDocs = cand
        .select(explode(array($"hist_id", $"fresh_id")).as("doc_id")).distinct()
      val shCand = docs(s, dir)
        .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select($"doc_id", TextFns.shingleSet($"text").as("sh"))
        .localCheckpoint() // both verify sides
      cand
        .join(shCand.select($"doc_id".as("hist_id"), $"sh".as("sh1")), "hist_id")
        .join(shCand.select($"doc_id".as("fresh_id"), $"sh".as("sh2")), "fresh_id")
        .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
        .withColumn("n1", size($"sh1")).withColumn("n2", size($"sh2"))
        .filter($"inter" * 3 >= $"n1" + $"n2")
        .select($"hist_id", $"fresh_id", $"inter".cast("long").as("inter_size"),
          ($"n1" + $"n2" - $"inter").cast("long").as("union_size"))
        .orderBy($"hist_id", $"fresh_id")
    },
    Some(s"""
      WITH $shingleSetSql,
      ex AS (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bk,
                    unnest(shset) s, len(shset) n FROM sh),
      pairs AS (
        SELECT h.doc_id hist_id, f.doc_id fresh_id, COUNT(*) inter,
               ANY_VALUE(h.n) nh, ANY_VALUE(f.n) nf
        FROM ex h JOIN ex f ON h.s = f.s AND h.bk < '8' AND f.bk >= '8'
        GROUP BY 1, 2
      )
      SELECT hist_id, fresh_id, CAST(inter AS BIGINT) AS inter_size,
             CAST(nh + nf - inter AS BIGINT) AS union_size
      FROM pairs
      WHERE 3 * inter >= nh + nf
      ORDER BY hist_id, fresh_id
    """)
  )

  /** Asymmetric n-gram CONTAINMENT pairs: directed (contained →
    * container) pairs with |S_a ∩ S_b| ≥ 0.8·|S_a| — the partial-dup
    * relation symmetric Jaccard misses entirely (a short document
    * quoted whole inside a long one has Jaccard ≈ |S_a|/|S_b| → 0 but
    * containment 1.0). The reference's pipeline has no notion of this;
    * it's a first-class training-data curation primitive (quote/
    * boilerplate inclusion, article-in-digest).
    *
    * Scale shape: the prefix-filter machinery of [[ngramJaccard]]
    * adapted to the asymmetric threshold, PLUS the adaptive k-slack
    * count filter it needs to survive hub-heavy corpora (the
    * "adaptive prefix" idea of the set-similarity-join literature).
    * The minimal prefix — a's |S_a| − ⌈τ·|S_a|⌉ + 1 rarest shingles —
    * guarantees only ONE shared element for a qualifying pair, and on
    * a closed-vocabulary corpus a single shared "rare" shingle is
    * nearly meaningless: measured at 5× on the hub-heavy probe
    * corpus, one-shared-shingle candidates number 9.76M for 250 true
    * pairs, and shipping shingle arrays to 9.76M pairs costs ~94 s.
    * Enlarging the prefix by slack k (p′ = |S_a| − ⌈τ·|S_a|⌉ + k)
    * strengthens the guarantee: at most |S_a| − p′ = ⌈τ·|S_a|⌉ − k
    * intersection elements can rank beyond the prefix, so a
    * qualifying pair must share ≥ k PREFIX shingles. The candidate
    * stage therefore equi-joins a's enlarged prefix against the full
    * inverted index ([[cmsPositioned]]; the container side has no
    * prefix bound of its own, since τ constrains only |S_a|), counts
    * matches per directed pair — a partial-aggregating groupBy on the
    * narrow (d_in, d_out) stream, no arrays — and keeps pairs with
    * ≥ k matches. Lossless for any k ≤ ⌈τ·|S_a|⌉ by the bound above;
    * k = 3 cuts 5× probe candidates 9.76M → ~4k and total time
    * ~100 s → seconds for +30% join volume. The only per-row join
    * filter kept is 5·n2 ≥ 4·n1 (a container must be big enough to
    * hold ⌈τ·n1⌉ elements at all). No size-ratio upper bound applies
    * (that bound is Jaccard-only — containment is exactly the regime
    * where sizes diverge). Verification is exact and float-free:
    * 5·inter ≥ 4·|S_a| ⟺ containment ≥ 0.8 in integer arithmetic.
    * A ≥10-shingle floor keeps trivially-short documents from
    * flooding the directed pair set. */
  val containmentPairs: Q = Q(
    "dedup_containment",
    (s, dir) => {
      import s.implicits._
      val tau = 0.8
      val minSh = 10
      val k = 3
      val sh = shingleSets(s, dir).filter(size($"sh") >= minSh)
        .localCheckpoint() // positioned index + both verify sides
      val pos = cmsPositioned(s, sh)
      // a's k-slack prefix: pos ≤ n − ⌈τ·n⌉ + k ⟺ 5·(n + k − pos) ≥ 4·n
      val pre = pos.filter(($"n" + k - $"pos") * 5 >= $"n" * 4)
      val cand = pre.as("a")
        .join(pos.as("b"), $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id"
          && $"b.n" * 5 >= $"a.n" * 4) // container big enough for ⌈τ·n1⌉
        .groupBy($"a.doc_id".as("d_in"), $"b.doc_id".as("d_out"))
        .agg(count(lit(1)).as("m"))
        // ≥ k shared prefix shingles — lossless: ≤ ⌈τ·n1⌉ − k
        // intersection elements can rank beyond the enlarged prefix
        .filter($"m" >= k)
        .select($"d_in", $"d_out")
      val s1 = sh.select($"doc_id".as("d_in"), $"sh".as("sh1"))
      val s2 = sh.select($"doc_id".as("d_out"), $"sh".as("sh2"))
      cand.join(s1, "d_in").join(s2, "d_out")
        .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
        .withColumn("n1", size($"sh1"))
        .filter($"inter" * 5 >= $"n1" * 4)
        .select($"d_in".as("contained_id"), $"d_out".as("container_id"),
          $"inter".cast("long").as("inter_size"),
          $"n1".cast("long").as("n_contained"))
        .orderBy($"contained_id", $"container_id")
    },
    Some(s"""
      WITH $shingleSetSql,
      shf AS (SELECT doc_id, shset FROM sh WHERE len(shset) >= 10),
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM shf),
      pairs AS (
        SELECT a.doc_id d_in, b.doc_id d_out, COUNT(*) inter, ANY_VALUE(a.n) n1
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
      )
      SELECT d_in AS contained_id, d_out AS container_id,
             CAST(inter AS BIGINT) AS inter_size,
             CAST(n1 AS BIGINT) AS n_contained
      FROM pairs
      WHERE 5 * inter >= 4 * n1
      ORDER BY contained_id, container_id
    """)
  )

  /** Fuzzy dedup, edit-distance grade: the production cascade
    * candidates-by-similarity-join → verify-by-edit-distance. Set
    * similarity (Jaccard over shingles) is blind to token ORDER; edit
    * distance is the stricter, order-aware confirmation — a shuffled
    * bag of the same words passes the Jaccard gate but fails here.
    * Output: the exact j ≥ 0.5 pair set further filtered to
    * 5·levenshtein(a,b) ≤ max(len_a, len_b), i.e. char-level edit
    * ratio ≤ 0.2 — both gates in exact integer arithmetic, so the
    * DuckDB oracle (same two predicates verbatim) hash-matches.
    *
    * Scale shape: candidate generation is [[ngramJaccard]]'s CMS-
    * prefix machinery (never all-pairs); the O(L²/8) bit-parallel-free
    * Levenshtein DP runs ONLY on verified candidate pairs — a set
    * already reduced by prefix + size-ratio + Jaccard — and the text
    * payload for it is fetched by semi-joining the corpus down to
    * candidate docs first (the [[minhashLsh]] fetch pattern), so full
    * document text never rides through the pair join's shuffle. Pairs
    * below the Jaccard gate are out of contract by design: at edit
    * ratio ≤ 0.2 the surviving token multisets overlap far above the
    * j = 0.5 candidate floor. */
  val editDistance: Q = Q(
    "dedup_editdist",
    (s, dir) => {
      import s.implicits._
      val verified = ngramJaccardVerified(s, dir)
        .localCheckpoint() // pair frame referenced by fetch + final join
      val candDocs = verified
        .select(explode(array($"d1", $"d2")).as("doc_id")).distinct()
      val txt = docs(s, dir)
        .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select($"doc_id", $"text")
        .localCheckpoint() // both sides of the text join
      // BANDED verify: the keep rule 5·d ≤ max_len means any distance
      // past ⌊max_len/5⌋ is discarded anyway, so the DP only needs the
      // ±k diagonal band — levenshtein's threshold form computes
      // O(n·k) instead of O(n²) and returns −1 past the band, which is
      // exactly the filter. Output is bit-identical to the full-DP
      // form (the oracle keeps the unbanded formulation).
      verified
        .join(txt.select($"doc_id".as("d1"), $"text".as("t1")), "d1")
        .join(txt.select($"doc_id".as("d2"), $"text".as("t2")), "d2")
        .withColumn("max_len", greatest(length($"t1"), length($"t2")))
        .withColumn("edit_dist",
          expr("levenshtein(t1, t2, cast(max_len div 5 as int))"))
        .filter($"edit_dist" >= 0)
        .select($"d1", $"d2", $"edit_dist".cast("long").as("edit_dist"),
          $"max_len".cast("long").as("max_len"))
        .orderBy($"d1", $"d2")
    },
    Some(s"""
      WITH $shingleSetSql,
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      pairs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      ok AS (SELECT d1, d2 FROM pairs WHERE 3 * inter >= n1 + n2)
      SELECT k.d1, k.d2,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
             CAST(GREATEST(LENGTH(a.text), LENGTH(b.text)) AS BIGINT) AS max_len
      FROM ok k
      JOIN documents a ON a.doc_id = k.d1
      JOIN documents b ON b.doc_id = k.d2
      WHERE 5 * levenshtein(a.text, b.text)
              <= GREATEST(LENGTH(a.text), LENGTH(b.text))
      ORDER BY d1, d2
    """)
  )

  /** Cross-snapshot NEAR-dup diff — the versioned-corpus refresh
    * check: which docs that `corpus_snapshot_diff` reports as `added`
    * or `changed` in snapshot v2 are near-dups (exact shingle Jaccard
    * ≥ 2/3, MinHash-band candidates) of the PREVIOUS snapshot's
    * corpus. A `changed` doc near-dupping its own v1 version is a
    * trivial refresh (re-crawl/format churn — the dominant, expected
    * signal); a fresh doc near-dupping a DIFFERENT v1 doc is
    * cross-version content duplication that per-snapshot dedup alone
    * never sees. Snapshots are the same v1/v2 derivation
    * `corpus_snapshot_diff` uses (Pipeline.scala `snapshotDiff`):
    * v1 = docs with md5-bucket ≠ 'f', v2 revises buckets {1,2}
    * (" rev2" suffix) and drops bucket '0' — so `added` = bucket 'f',
    * `changed` = buckets {1,2}, and BOTH sides' texts differ for
    * changed docs (v1 original vs v2 revision).
    *
    * Scale shape: [[incrementalMinhash]]'s band-index pattern with the
    * fresh side swapped from an arriving batch to the diff's
    * added∪changed slice — production keeps v1's band table
    * persisted/bucketed by (b, bh) from when v1 was CURRENT, so a
    * snapshot refresh sketches only the ~3/16 fresh slice, equi-joins
    * its band rows against the stored index, and exact-verifies only
    * band-colliding pairs (shingle arrays fetched by semi-join, never
    * riding the band shuffle). The banding is the [[minhashLsh]]
    * 16×4 layout: miss prob ≤ 3e-2 at the j = 2/3 threshold, ~4e-9 at
    * planted near-dup similarity; on this fixture band candidates
    * cover the exact pair set and the DuckDB oracle (exact inverted-
    * index Jaccard join between the two snapshot texts) hash-matches. */
  val snapshotNeardup: Q = Q(
    "dedup_snapshot_neardup",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val h = substring(md5($"doc_id".cast("string")), 1, 1)
      val v1 = d.filter(h =!= "f").select($"doc_id", $"text")
      val fresh = d.filter(h.isin("f", "1", "2"))
        .select($"doc_id",
          when(h.isin("1", "2"), concat($"text", lit(" rev2")))
            .otherwise($"text").as("text"),
          when(h === "f", lit("added")).otherwise(lit("changed")).as("status"))
        .localCheckpoint()   // referenced by bands, verify, and status join
      val pb = minhashBandRows(s, v1).select($"doc_id".as("prev_id"), $"b", $"bh")
      val fb = minhashBandRows(s, fresh).select($"doc_id".as("new_id"), $"b", $"bh")
      val cand = fb.join(pb, Seq("b", "bh"))
        .select($"new_id", $"prev_id").distinct()
        .localCheckpoint()   // referenced by both semi-joins + verify
      val shPrev = v1
        .join(cand.select($"prev_id".as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
        .select($"doc_id".as("prev_id"), TextFns.shingleSet($"text").as("sh1"))
        .localCheckpoint()
      val shNew = fresh
        .join(cand.select($"new_id".as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
        .select($"doc_id".as("new_id"), $"status", TextFns.shingleSet($"text").as("sh2"))
        .localCheckpoint()
      cand.join(shPrev, "prev_id").join(shNew, "new_id")
        .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
        .withColumn("n1", size($"sh1")).withColumn("n2", size($"sh2"))
        .filter($"inter" * 3 >= $"n1" + $"n2")
        .select($"new_id", $"prev_id", $"status",
          $"inter".cast("long").as("inter_size"),
          ($"n1" + $"n2" - $"inter").cast("long").as("union_size"))
        .orderBy($"new_id", $"prev_id")
    },
    Some("""
      WITH v1 AS (
        SELECT doc_id, text FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'f'
      ),
      fresh AS (
        SELECT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('1', '2')
                    THEN text || ' rev2' ELSE text END AS text,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f'
                    THEN 'added' ELSE 'changed' END AS status
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('f', '1', '2')
      ),
      sh1 AS (
        SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
                       i -> array_to_string(toks[i+1:i+3], ' '))) AS shset
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
              FROM v1)
        WHERE len(toks) >= 3
      ),
      sh2 AS (
        SELECT doc_id, list_distinct(list_transform(range(len(toks)-2),
                       i -> array_to_string(toks[i+1:i+3], ' '))) AS shset
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
              FROM fresh)
        WHERE len(toks) >= 3
      ),
      ex1 AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh1),
      ex2 AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh2),
      pairs AS (
        SELECT f.doc_id new_id, p.doc_id prev_id, COUNT(*) inter,
               ANY_VALUE(p.n) n1, ANY_VALUE(f.n) n2
        FROM ex2 f JOIN ex1 p ON f.s = p.s
        GROUP BY 1, 2
      )
      SELECT pr.new_id, pr.prev_id, fr.status,
             CAST(inter AS BIGINT) AS inter_size,
             CAST(n1 + n2 - inter AS BIGINT) AS union_size
      FROM pairs pr JOIN fresh fr ON fr.doc_id = pr.new_id
      WHERE 3 * inter >= n1 + n2
      ORDER BY new_id, prev_id
    """)
  )

  /** LEAKAGE-SAFE train/val/test split: assignment is addressed by the
    * near-dup CLUSTER's canonical id, not the document id — so two
    * near-identical documents can never straddle train and test. A
    * doc-hash split (`split_assign`) leaks evaluation data through
    * every near-dup pair the corpus carries; this is the split a
    * training pipeline must actually use after dedup analysis, and the
    * reason the cluster labeling exists at all. Singletons (docs in no
    * near-dup pair) canonicalize to themselves, so their assignment is
    * IDENTICAL to the doc-hash split (pinned by spec) — cluster safety
    * costs nothing on the non-duplicated mass of the corpus.
    *
    * Scale shape: ONE left join of the corpus spine against the
    * materialized [[labelTable]] on doc_id (labels exist only for docs
    * IN pairs — a small fraction of the corpus), then a stateless md5
    * projection. The label side is a doc_id-bucketed scan contributing
    * ZERO exchanges (LabelStoreSpec pins it); the labeling itself is
    * paid once per corpus version by the `dedup_labels` job, not
    * here. */
  val splitLeakageSafe: Q = Q(
    "split_leakage_safe",
    (s, dir) => {
      import s.implicits._
      val labels = s.table(labelTable(s, dir))
        .select($"doc_id", $"canonical_id".as("cluster_lab"))
      val h2 = substring(md5($"canonical_id".cast("string")), 1, 2)
      docs(s, dir).select($"doc_id")
        .join(labels, Seq("doc_id"), "left")
        .withColumn("canonical_id", coalesce($"cluster_lab", $"doc_id"))
        .withColumn("split",
          when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test"))
        .select($"doc_id", $"canonical_id", $"split")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $shingleSetSql,
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      prs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      p AS (SELECT d1, d2 FROM prs WHERE 3 * inter >= n1 + n2),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v),
      spine AS (
        SELECT d.doc_id, COALESCE(cc.lab, d.doc_id) AS canonical_id
        FROM documents d LEFT JOIN cc ON cc.v = d.doc_id
      )
      SELECT doc_id, canonical_id,
             CASE WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                  WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM spine
      ORDER BY doc_id
    """)
  )

  /** SOFT-dedup training mix: the post-dedup manifest where each
    * cluster survivor is replicated ⌈√n_merged⌉ times — the standard
    * sub-linear duplication weighting (duplication count is a signal
    * of importance, but linear weighting would undo the dedup; √ keeps
    * the signal while bounding over-representation). Composes
    * [[survivors]]'s anti-join/broadcast shape with [[Pipeline]]'s
    * mix-explosion: one corpus scan → dup anti-join → broadcast size
    * join → stateless explode. √ and ⌈·⌉ of small exact integers are
    * correctly-rounded IEEE on both engines, so the oracle
    * hash-matches exactly.
    *
    * Scale shape: identical to [[survivors]] (its per-cluster size
    * frame is ≤ |clusters| rows — broadcast) plus a generator that
    * multiplies rows at most √max-cluster-size-fold; no new shuffle.
    * The label frame is read from the materialized corpus-version
    * [[labelTable]], never recomputed here. */
  val mixDedupWeighted: Q = Q(
    "mix_dedup_weighted",
    (s, dir) => {
      import s.implicits._
      val labT = s.table(labelTable(s, dir))
      val dupes = labT.filter($"doc_id" =!= $"canonical_id").select($"doc_id")
      val sizes = labT.groupBy($"canonical_id").agg(count(lit(1)).as("n_merged"))
        .withColumnRenamed("canonical_id", "doc_id")
      docs(s, dir).select($"doc_id", $"source")
        .join(dupes, Seq("doc_id"), "left_anti")
        .join(broadcast(sizes), Seq("doc_id"), "left")
        .withColumn("n_merged", coalesce($"n_merged", lit(1L)))
        .withColumn("n_copies", ceil(sqrt($"n_merged".cast("double"))).cast("long"))
        .select($"doc_id", $"source", $"n_merged",
          explode(sequence(lit(1L), $"n_copies")).as("copy_idx"))
        .orderBy($"doc_id", $"copy_idx")
    },
    Some(s"""
      WITH RECURSIVE $shingleSetSql,
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      prs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      p AS (SELECT d1, d2 FROM prs WHERE 3 * inter >= n1 + n2),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v),
      sz AS (SELECT lab, COUNT(*) AS n_merged FROM cc GROUP BY lab),
      surv AS (
        SELECT d.doc_id, d.source, COALESCE(sz.n_merged, 1) AS n_merged
        FROM documents d
        LEFT JOIN cc dup ON d.doc_id = dup.v AND dup.v <> dup.lab
        LEFT JOIN sz ON d.doc_id = sz.lab
        WHERE dup.v IS NULL
      )
      SELECT doc_id, source, CAST(n_merged AS BIGINT) AS n_merged,
             unnest(generate_series(1, CAST(CEIL(SQRT(n_merged)) AS BIGINT))) AS copy_idx
      FROM surv
      ORDER BY doc_id, copy_idx
    """)
  )

  /** NORMALIZATION-aware exact dedup: the casing/punctuation/whitespace
    * canonicalization every web-scale exact-dedup pass applies before
    * hashing (CCNet/C4-style) — raw `md5(text)` treats "Foo bar" and
    * "foo  bar !!" as distinct documents and silently halves the dedup
    * rate on crawl data. The fixture corpus carries no such variants
    * (500 byte-unique texts), so the crawl view is DERIVED content-
    * addressed, both engines identically: the corpus unioned with a
    * RE-CRAWL of the md5-bucket {a, b} slice whose pages came back with
    * formatting noise (bucket 'a' → upper-cased + "!!" suffix; 'b' →
    * leading/doubled whitespace + trailing " ."). The normalizer
    * (lower → strip non-[a-z0-9 ] → collapse runs of spaces → trim)
    * provably inverts the noise — every re-crawl groups with its
    * original (n_copies = 2, canonical = the original doc_id) while
    * raw hashing on the same view finds zero duplicates (pinned by
    * spec).
    *
    * Scale shape: identical to [[exact]] — normalization is a
    * stateless codegen'd projection at the scan, then ONE hash
    * aggregation on the 16-byte canonical digest; nothing else crosses
    * the wire. */
  val normalized: Q = Q(
    "dedup_normalized",
    (s, dir) => {
      import s.implicits._
      val bk = substring(md5($"doc_id".cast("string")), 1, 1)
      val recrawl = docs(s, dir).filter(bk.isin("a", "b"))
        .select(($"doc_id" + 100000L).as("doc_id"),
          when(bk === "a", concat(upper($"text"), lit("!!")))
            .otherwise(concat(lit("  "), regexp_replace($"text", lit(" "), lit("  ")), lit(" .")))
            .as("text"))
      val crawl = docs(s, dir).select($"doc_id", $"text").unionAll(recrawl)
      val norm = trim(regexp_replace(
        regexp_replace(lower($"text"), lit("[^a-z0-9 ]"), lit("")),
        lit(" +"), lit(" ")))
      crawl
        .groupBy(md5(norm).as("norm_md5"))
        .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .select($"canonical_id", $"n_copies", $"norm_md5")
        .orderBy($"canonical_id")
    },
    Some("""
      WITH crawl AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000,
               CASE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                 WHEN 'a' THEN upper(text) || '!!'
                 ELSE '  ' || regexp_replace(text, ' ', '  ', 'g') || ' .' END
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('a', 'b')
      ),
      norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS ntext
        FROM crawl
      )
      SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies, md5(ntext) AS norm_md5
      FROM norm
      GROUP BY md5(ntext)
      ORDER BY canonical_id
    """)
  )

  def queries: Seq[Q] =
    Seq(exact, normalized, ngramJaccard, minhashLsh, minhashLshLww, simhash, embeddingCosine, clusters,
      clustersStar, labelsQ, clusterStats, contamination, survivors, embeddingLsh, substringDetect,
      substringClean, semantic, boilerplate, incremental, incrementalBloom,
      incrementalMinhash, containmentPairs, editDistance, snapshotNeardup,
      splitLeakageSafe, mixDedupWeighted, imagePhash, crossModal, labelsIncremental,
      thresholdCurve)
}
