package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** EPOCH-POINTER READ connector for [[IndexSinkProvider]]-written trees
  * — the consumer half of the chain's directory handoffs, replacing the
  * raw file-source glob listing (round-19 verdict ask 1b).
  *
  * The sink's commit protocol already gives every epoch an atomic
  * visibility point: `batch=<e>/` appears wholesale with `_SUCCESS`
  * inside (rename mode), or `_manifests/epoch=<e>.manifest` names the
  * committed files (S3-class manifest mode). Epochs from one writer
  * commit SERIALLY (micro-batch e+1 starts only after e's checkpoint
  * commit), so the committed set is always a gap-free prefix — which
  * makes the consumer's whole discovery problem a CURSOR: the offset is
  * the last consumed epoch number, and `latestOffset` advances it by
  * PROBING `e+1, e+2, …` for their commit markers. Per trigger that is
  * O(newly-committed epochs + 1) existence checks and ZERO directory
  * listings — the raw-glob file source instead re-lists every
  * `batch=*` dir every trigger, a cost that grows with TOTAL epoch
  * count forever (the extended soak's one residual rising term: ~2,600
  * files at 3.5–4 s per listing by the late window; on an object store
  * the same walk is LIST pages per 1,000 keys).
  *
  * Epoch-granular consumption also CLOSES the raw-listing residual the
  * docs-store publish documents honestly: an upstream crash between
  * sink write and checkpoint commit replays its epoch, REPLACING the
  * dir content under fresh part-file names — a file-tracking consumer
  * that already consumed the first attempt re-reads the replacement as
  * brand-new files (duplicate rows downstream). Here the replayed
  * epoch's number is at or below the consumer's cursor, so the
  * replacement is simply never re-read (replayed content is identical
  * by the exactly-once replay contract — same batch id, same
  * checkpointed input).
  *
  * RETENTION (ask 1a): the consumer's own commit is the definition of
  * "consumed", and [[MicroBatchStream.commit]] is exactly that hook —
  * Spark calls it once a batch's offset is durably committed, after
  * which epochs at or below it can never be replanned. With
  * `retention=archive` each consumed epoch dir is MOVED (one rename)
  * under `<archiveDir>/batch=<e>` — out of the probed namespace, still
  * on disk (the oplog index is the reference's O12 PRODUCT, not scratch
  * — post-hoc readers glob the archive); `retention=delete` removes it
  * (pure protocol traffic, e.g. the gate's band-message rendezvous).
  * `retainEpochs` keeps a tail of consumed epochs in place for
  * operator forensics. Retention presumes a SINGLE streaming consumer
  * per tree — the chain's handoffs are all point-to-point; a second
  * reader of a retained tree must read the archive union.
  *
  * Loud-failure contract: a MISSING epoch below a COMMITTED later one
  * cannot occur under the serial-commit protocol (a replay's transient
  * swap absence only affects epochs already consumed) — observing one
  * means the writer was restarted with a FRESH checkpoint onto an old
  * tree (its epoch numbering reset), and the source throws with the
  * remedy instead of silently skipping data.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.EpochSourceProvider")
  *     .option("path", dir)                   // the IndexSink tree root
  *     .option("maxEpochsPerTrigger", "64")   // admission control
  *     .option("retention", "archive")        // off | delete | archive
  *     .option("retainEpochs", "2")
  *     .load()
  * }}}
  * Output schema: one `value STRING` column (the sink's line schema);
  * consumers apply `from_json` exactly as they would over the raw
  * json-lines glob. */
class EpochSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IndexSink.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EpochTable(new CaseInsensitiveStringMap(properties))
}

object EpochSource {
  /** a committed epoch under `root`: rename-mode `_SUCCESS` or a
    * manifest object (whichever mode wrote the tree). */
  private[sources] def committed(root: String, e: Long): Boolean =
    new java.io.File(root, s"batch=$e/_SUCCESS").isFile ||
      IndexSink.manifestFile(root, e).isFile

  /** a committed epoch's data files: the manifest's exact list when one
    * exists, else the visible files of the epoch dir (a rename-mode
    * epoch is complete by visibility). */
  private[sources] def epochFiles(root: String, e: Long): Seq[String] = {
    val m = IndexSink.manifestFile(root, e)
    if (m.isFile)
      scala.util.Using.resource(scala.io.Source.fromFile(m)) { src =>
        src.getLines().filter(_.nonEmpty)
          .map(rel => new java.io.File(root, rel).getPath).toList
      }
    else
      Option(IndexSink.epochDir(root, e).listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(_.getPath).sorted.toSeq
  }

  /** smallest committed epoch under `root` (one listing, used ONCE per
    * query lifetime to seed the probe cursor — a fresh consumer may
    * attach to a tree whose early epochs another life's retention
    * already moved). */
  private[sources] def minCommitted(root: String): Option[Long] = {
    val Batch = """batch=(-?\d+)""".r
    val Manifest = """epoch=(-?\d+)\.manifest""".r
    val dirs = Option(new java.io.File(root).listFiles).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case Batch(e) if committed(root, e.toLong) => Some(e.toLong)
        case _ => None
      })
    val manifests = Option(new java.io.File(root, "_manifests").listFiles)
      .getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case Manifest(e) => Some(e.toLong)
        case _ => None
      })
    val all = dirs ++ manifests
    if (all.isEmpty) None else Some(all.min)
  }
}

class EpochTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft epoch source requires option 'path'")
    p
  }
  override def name(): String = s"graft-epochs($path)"
  override def schema(): StructType = IndexSink.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ caseInsensitiveOptions.asScala).asJava)
    new ScanBuilder {
      override def build(): Scan = new EpochScan(merged)
    }
  }
}

class EpochScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = IndexSink.schema
  override def description(): String =
    s"graft-epochs(${options.get("path")})"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EpochMicroBatchStream(options)
}

/** the consumed-epoch cursor. */
case class EpochOffset(epoch: Long) extends Offset {
  override def json(): String = s"""{"epoch":$epoch}"""
}

object EpochOffset {
  def fromJson(json: String): EpochOffset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(node != null && node.isObject && node.hasNonNull("epoch") &&
      node.get("epoch").isIntegralNumber,
      s"epoch offset is not {\"epoch\":N}: $json")
    EpochOffset(node.get("epoch").asLong())
  }
}

class EpochMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {
  import EpochSource._

  private val root = options.get("path")
  private val maxEpochs: Option[Int] =
    Option(options.get("maxEpochsPerTrigger")).map(_.toInt)
  private val retention = Option(options.get("retention")).getOrElse("off")
  require(Seq("off", "delete", "archive").contains(retention),
    s"retention must be off|delete|archive, got '$retention'")
  private val retainEpochs =
    Option(options.get("retainEpochs")).map(_.toLong).getOrElse(0L)
  private val archiveDir = Option(options.get("archiveDir"))
    .getOrElse(new java.io.File(new java.io.File(root).getParentFile,
      new java.io.File(root).getName + "_archive").getPath)
  /** how far past a missing epoch the gap guard looks for a committed
    * later one (the loud writer-restart detector). */
  private val GapLookahead = 64L
  // retention progress, this stream's own (idempotent across restarts:
  // re-archiving an absent epoch is a no-op)
  private var swept: Long = Long.MinValue

  override def getDefaultReadLimit: ReadLimit =
    maxEpochs.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** the probe cursor seed: one listing, once — epoch -1 on a virgin
    * tree, else just below the smallest committed epoch (early epochs
    * may have been retained away by a previous life). */
  override def initialOffset(): Offset =
    EpochOffset(minCommitted(root).map(_ - 1L).getOrElse(-1L))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    var e = start.asInstanceOf[EpochOffset].epoch
    var budget = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _ => Int.MaxValue
    }
    while (budget > 0 && committed(root, e + 1L)) {
      e += 1L
      budget -= 1
    }
    if (budget > 0) {
      // frontier stopped on an uncommitted epoch: the gap guard — a
      // committed LATER epoch means the writer's numbering reset (a
      // fresh-checkpoint restart onto an old tree); skipping would be
      // silent data loss, so refuse with the remedy
      val jumped = (e + 2L to e + GapLookahead).find(committed(root, _))
      jumped.foreach { j =>
        throw new IllegalStateException(
          s"graft epoch source: $root has committed epoch $j but epoch " +
            s"${e + 1} is missing. Writer epochs commit serially, so a " +
            "gap means the writer was restarted with a FRESH checkpoint " +
            "onto this tree (epoch numbering reset). Start the consumer " +
            "from a fresh checkpoint over a fresh tree; refusing to " +
            "skip or re-order epochs.")
      }
    }
    EpochOffset(e)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset =
    EpochOffset.fromJson(json)

  /** one InputPartition per committed data file of the planned epochs
    * — files per epoch are trigger-bounded (and writer-bounded by the
    * sinkCoalesce dial), so the plan is small; readers parallelize per
    * file. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EpochOffset].epoch
    val e = end.asInstanceOf[EpochOffset].epoch
    (s + 1L to e).flatMap(epochFiles(root, _))
      .map(f => EpochInputPartition(Array(f)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EpochReaderFactory

  /** consumed-epoch retention: everything at or below the committed
    * cursor (minus the `retainEpochs` forensic tail) leaves the probed
    * namespace. Failures are non-fatal — retention is idempotent and
    * retried at the next commit. */
  override def commit(end: Offset): Unit = {
    if (retention == "off") return
    val upTo = end.asInstanceOf[EpochOffset].epoch - retainEpochs
    if (swept == Long.MinValue)
      swept = minCommitted(root).map(_ - 1L).getOrElse(upTo)
    while (swept < upTo) {
      val e = swept + 1L
      try {
        val dir = IndexSink.epochDir(root, e)
        if (retention == "archive" && dir.isDirectory) {
          val target = new java.io.File(archiveDir, s"batch=$e")
          target.getParentFile.mkdirs()
          if (!dir.renameTo(target))
            System.err.println(s"[epoch-source] archive of $dir failed, will retry")
        } else if (retention == "delete" && dir.isDirectory)
          IndexSink.deleteRecursively(dir)
        val m = IndexSink.manifestFile(root, e)
        if (m.isFile) {
          if (retention == "archive") {
            val tm = new java.io.File(new java.io.File(archiveDir, "_manifests"),
              m.getName)
            tm.getParentFile.mkdirs()
            m.renameTo(tm)
          } else m.delete()
          ()
        }
      } catch {
        case ex: Exception =>
          System.err.println(s"[epoch-source] retention of epoch $e failed, will retry: $ex")
          return
      }
      swept = e
    }
  }

  override def stop(): Unit = ()
}

case class EpochInputPartition(files: Array[String]) extends InputPartition

class EpochReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EpochPartitionReader(partition.asInstanceOf[EpochInputPartition])
}

/** reads the partition's committed line files in order; each handle is
  * closed as soon as its lines are exhausted (descriptor hygiene for
  * long-running streams over many small epochs). */
class EpochPartitionReader(partition: EpochInputPartition)
    extends PartitionReader[InternalRow] {
  private val fileIter = partition.files.iterator
  private var src: scala.io.Source = _
  private var lines: Iterator[String] = Iterator.empty
  private var current: InternalRow = _

  private def advance(): Boolean = {
    while (!lines.hasNext) {
      if (src != null) { src.close(); src = null }
      if (!fileIter.hasNext) return false
      src = scala.io.Source.fromFile(fileIter.next(), "UTF-8")
      lines = src.getLines().filter(_.nonEmpty)
    }
    true
  }

  override def next(): Boolean = {
    if (!advance()) return false
    current = InternalRow(UTF8String.fromString(lines.next()))
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = if (src != null) { src.close(); src = null }
}
