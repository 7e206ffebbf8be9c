package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted cell-balance row (Update-mode style: consumers keep the
  * highest `version`). `load_factor_pct` is 100 at perfect balance —
  * the `vector_cell_profile` rule re-evaluated live. */
case class CellLoad(cell: Int, version: Long, n: Long, share_ppm: Long,
                    load_factor_pct: Long, breached: Boolean)

/** STREAMING IVF CELL-BALANCE MONITOR — the live form of
  * `vector_cell_profile` (operators/VectorSearch.scala), watching the
  * assumption every within-cell operator rests on AS VECTORS ARRIVE:
  * each arriving embedding is assigned to its nearest coarse cell
  * (the serving path's collected-codebook assignment,
  * [[VectorServeStream.probeWithCorpus]] at nprobe=1 — bit-identical
  * scores to the batch `ivfFlatAssign`), per-cell populations
  * accumulate in state, and the ±load-factor rule re-evaluates at
  * every micro-batch — so an ingest burst crowding one cell fires a
  * `breached` report MID-INGEST, the cue to run `vector_ivf_retrain`
  * BEFORE the n²/C pair-volume bound collapses, instead of discovering
  * the hot cell at the next batch profile.
  *
  * Scale shape: assignment is a stateless mapPartitions over a
  * driver-sized codebook (no shuffle); counts pre-reduce PER PARTITION
  * to ≤ C rows each before the single monitor group (the classic
  * pre-aggregate + tiny-state design: C counters of 8 bytes — the
  * profile is dimension-sized by construction, exactly why the batch
  * operator broadcasts it too). */
object IvfBalanceStream {

  /** whole-monitor state: per-cell arrival counts. */
  case class BalanceState(cells: Map[Int, Long], version: Long)

  /** `vectors` must carry (vec_id, embedding); `dir` supplies the
    * static codebook. A cell's load factor breaches at
    * `breachPct` (default 200 = 2x the balanced population). */
  def monitor(vectors: DataFrame, dir: String,
      breachPct: Long = 200L): Dataset[CellLoad] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // nCells comes from the collected codebook itself, not a re-stated
    // dial: if ivfFlatAssign's cell count ever changes, the load factor
    // and breach rule scale with it instead of silently mis-scaling.
    val (assigned: Dataset[ProbedQuery], _, nCells: Int) =
      VectorServeStream.probeWithCorpus(vectors, dir, nprobe = 1)
    assigned
      .mapPartitions { it =>
        // stateless per-partition pre-reduce: <= C tiny rows cross
        val m = scala.collection.mutable.Map.empty[Int, Long]
        it.foreach(p => m(p.cell) = m.getOrElse(p.cell, 0L) + 1L)
        m.iterator.map { case (c, n) => (c, n) }
      }
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Int, incs: Iterator[(Int, Long)], state: GroupState[BalanceState]) =>
          val prior = state.getOption.getOrElse(BalanceState(Map.empty, 0L))
          val cells = incs.foldLeft(prior.cells) { case (m, (c, n)) =>
            m.updated(c, m.getOrElse(c, 0L) + n)
          }
          val next = BalanceState(cells, prior.version + 1L)
          state.update(next)
          val total = cells.values.sum
          cells.toSeq.sortBy(_._1).iterator.map { case (c, n) =>
            val load = n * nCells * 100L / total
            CellLoad(c, next.version, n, n * 1000000L / total, load,
              load > breachPct)
          }
      }
  }
}
