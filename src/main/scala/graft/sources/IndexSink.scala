package graft.sources

import java.util
import java.io.{BufferedWriter, File, FileWriter}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Native DSv2 WRITE connector for the index sink — the reference's
  * Elasticsearch sink (reference:
  * src/main/java/org/flinkmon/elastic/ElasticsearchEmbeddedNodeSink.java:44-52,
  * a per-record bulk flush with no replay protection) re-expressed as a
  * first-class `SupportsWrite` table with EXACTLY-ONCE epoch commits:
  *
  *  - each task writes its partition to a private temp file
  *    (`_tmp/epoch=<e>/part-<p>-<t>`) and reports it in its commit
  *    message — nothing is visible until the driver commits;
  *  - `commit(epoch, msgs)` REPLACES `batch=<epoch>/` wholesale via a
  *    stage-then-rename swap (assemble the complete epoch INCLUDING
  *    `_SUCCESS` under `_tmp/`, retire any previous attempt, take its
  *    name with one directory rename — see [[IndexCommit.publish]]) —
  *    so a replayed epoch after a crash between sink write and
  *    checkpoint commit REWRITES instead of appending, a crash
  *    MID-COMMIT never exposes a partial directory, and stale `_tmp`
  *    scratch from zombie tasks is swept at each commit;
  *  - `abort` deletes the temp files, leaving committed epochs intact.
  *
  * Readers treat `batch=<id>` as a hive-style partition column, so the
  * committed index is one `spark.read.text(path)` away. Supports batch
  * writes with the same epoch discipline (epoch = -1).
  *
  * TWO COMMIT MODES (`option("commitMode", ...)`):
  *
  *  - `rename` (default): the stage-then-rename swap above — correct
  *    wherever directory rename is atomic (local FS, HDFS).
  *  - `manifest`: the S3-CLASS protocol, for stores with NO atomic
  *    rename. Tasks write straight to UNIQUE final keys under
  *    `_data/epoch=<e>/` (a single-object PUT is atomic on S3, and
  *    the underscore prefix hides the dir from Spark's listing, so an
  *    unlisted object is invisible either way); the driver then
  *    publishes by (re)writing ONE small manifest object,
  *    `_manifests/epoch=<e>.manifest`, listing exactly the committed
  *    files — last-writer-wins replace, so a replayed epoch swaps its
  *    whole file list, and data objects orphaned by the earlier
  *    attempt are swept after publish. Visibility = presence in a
  *    manifest, nothing else; readers go through
  *    [[IndexSink.readCommitted]], which resolves manifests to file
  *    paths (and falls back to the partition-dir layout in rename
  *    mode).
  *
  * Usage: `df.writeStream.format("graft.sources.IndexSinkProvider")
  *          .option("path", dir)` — input schema: one string column. */
class IndexSinkProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IndexSink.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new IndexSinkTable(new CaseInsensitiveStringMap(properties))
}

object IndexSink {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  private[sources] def epochDir(root: String, epoch: Long): File =
    new File(root, s"batch=$epoch")

  private[sources] def manifestFile(root: String, epoch: Long): File =
    new File(root, s"_manifests/epoch=$epoch.manifest")

  private[sources] def deleteRecursively(f: File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  /** Every committed line of the index at `root`, whichever commit mode
    * wrote it: manifest mode resolves the `.manifest` files under
    * `_manifests/` to the exact committed file set (an unlisted `_data/` object is
    * uncommitted by definition); rename mode reads the partition-dir
    * layout, where visibility itself implies a complete epoch. */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      root: String): org.apache.spark.sql.DataFrame = {
    val manifests = Option(new File(root, "_manifests").listFiles)
      .getOrElse(Array.empty).filter(_.getName.endsWith(".manifest"))
    if (manifests.nonEmpty) {
      val files = manifests.flatMap { m =>
        // Using closes the Source — a long-running streaming driver
        // commits every micro-batch, so a leaked handle per manifest
        // read accumulates into descriptor exhaustion
        scala.util.Using.resource(scala.io.Source.fromFile(m)) { src =>
          src.getLines().filter(_.nonEmpty)
            .map(rel => new File(root, rel).getPath).toList
        }
      }
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).text(files.toIndexedSeq: _*)
    } else spark.read.schema(schema).text(root)
  }
}

class IndexSinkTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  private val path = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft index sink requires option 'path'")
    p
  }
  override def name(): String = s"graft-index($path)"
  override def schema(): StructType = IndexSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.length == 1 &&
      info.schema().fields.head.dataType == StringType,
      s"graft index sink expects one string column, got ${info.schema().simpleString}")
    // batch-path epoch override: lets a foreachBatch caller route each
    // micro-batch through the connector's replace-wholesale commit with
    // the batch id as the epoch (idempotent replay from ONE query)
    val batchEpoch = Option(options.get("epoch")).map(_.toLong).getOrElse(-1L)
    val mode = Option(options.get("commitMode")).getOrElse("rename")
    require(mode == "rename" || mode == "manifest",
      s"commitMode must be 'rename' or 'manifest', got '$mode'")
    new WriteBuilder {
      override def build(): Write = new IndexWrite(path, batchEpoch, mode)
    }
  }
}

class IndexWrite(path: String, batchEpoch: Long = -1L,
    mode: String = "rename") extends Write {
  override def toBatch: BatchWrite = new IndexBatchWrite(path, batchEpoch, mode)
  override def toStreaming: StreamingWrite = new IndexStreamingWrite(path, mode)
}

/** One committed-file report from a task. */
case class IndexFileMessage(tmpPath: String) extends WriterCommitMessage

class IndexStreamingWrite(path: String, mode: String = "rename")
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new IndexWriterFactory(path, mode)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    if (mode == "manifest") IndexCommit.publishManifest(path, epochId, messages)
    else IndexCommit.publish(path, epochId, messages)

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    IndexCommit.discard(messages)
}

class IndexBatchWrite(path: String, epoch: Long = -1L,
    mode: String = "rename") extends BatchWrite {
  // the batch path must stage under ITS epoch, not the -1 default: in
  // manifest mode the data files' final keys live under
  // `_data/epoch=<e>` and the NEXT epoch's commit sweeps manifest-less
  // dirs below itself — batch epochs staged under epoch=-1 were
  // deleted by the following commit (caught by EpochSourceSpec's
  // manifest-mode case)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new IndexWriterFactory(path, mode, epoch)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (mode == "manifest") IndexCommit.publishManifest(path, epoch, messages)
    else IndexCommit.publish(path, epoch, messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    IndexCommit.discard(messages)
}

object IndexCommit {
  /** Driver-side publish, ATOMIC to readers: assemble the COMPLETE
    * epoch (task files + `_SUCCESS`) in a staging dir under `_tmp/`
    * (Spark's file listing ignores underscore-prefixed paths, so
    * nothing staged is ever visible), then swap it in with directory
    * renames — a previously-committed attempt moves wholesale to a
    * trash entry before the stage dir takes its name, so readers see
    * either the old complete epoch, a transient absence, or the new
    * complete epoch, NEVER a partial directory, and every visible
    * `batch=<id>` dir contains `_SUCCESS` by construction. A replayed
    * epoch therefore rewrites, never appends. Afterwards, stale
    * `_tmp` entries of EARLIER epochs (zombie-task leftovers, crashed
    * attempts) are swept — micro-batch epochs commit serially, so
    * anything below the committing epoch is dead. */
  def publish(root: String, epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val target = IndexSink.epochDir(root, epochId)
    val stage = new File(root, s"_tmp/stage-epoch=$epochId")
    val trash = new File(root, s"_tmp/trash-epoch=$epochId")
    if (stage.exists()) IndexSink.deleteRecursively(stage)
    require(stage.mkdirs(), s"cannot create ${stage.getPath}")
    messages.collect { case IndexFileMessage(tmp) => new File(tmp) }
      .filter(_.exists())
      .foreach { f =>
        val dest = new File(stage, f.getName)
        require(f.renameTo(dest), s"cannot stage ${f.getPath} -> ${dest.getPath}")
      }
    require(new File(stage, "_SUCCESS").createNewFile(),
      s"cannot mark ${stage.getPath}")
    if (trash.exists()) IndexSink.deleteRecursively(trash)
    if (target.exists())
      require(target.renameTo(trash), s"cannot retire ${target.getPath}")
    require(stage.renameTo(target),
      s"cannot publish ${stage.getPath} -> ${target.getPath}")
    IndexSink.deleteRecursively(trash)
    sweepStaleTmp(root, epochId)
  }

  /** Drop `_tmp` entries at or below the epoch just committed:
    * `epoch=<e>` writer scratch (the committed epoch's own dir is
    * spent — its winning files were staged out, and a same-epoch
    * zombie task's files are abandoned output by definition) and
    * `stage-`/`trash-` leftovers of crashed earlier commits. Bounded
    * work (one listing), run on the driver at each commit, so `_tmp`
    * never accumulates. */
  private def sweepStaleTmp(root: String, epochId: Long): Unit = {
    val Entry = """(?:stage-|trash-)?epoch=(-?\d+)""".r
    Option(new File(root, "_tmp").listFiles).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case Entry(e) if e.toLong <= epochId => IndexSink.deleteRecursively(f)
        case _ => ()
      }
    }
  }

  /** S3-class publish: visibility is a MANIFEST OBJECT, not a rename.
    * The winning tasks' files (already at their final unique keys
    * under `_data/epoch=<e>/`) are listed, root-relative and sorted,
    * into `_manifests/epoch=<e>.manifest`, written via tmp + rename —
    * the local stand-in for S3's atomic single-object PUT, the ONLY
    * primitive this protocol needs. A replayed epoch overwrites the
    * manifest (last writer wins), atomically swapping the whole file
    * list; data objects the new manifest no longer references (the
    * earlier attempt's) are deleted after publish, as are epoch data
    * dirs below the committing epoch that never got a manifest
    * (crashed, superseded attempts). */
  def publishManifest(root: String, epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val rootPath = new File(root).getCanonicalFile.toPath
    val committed = messages.collect { case IndexFileMessage(p) if p.nonEmpty =>
      new File(p).getCanonicalFile }
    val rel = committed.map(f => rootPath.relativize(f.toPath).toString).sorted
    val manifest = IndexSink.manifestFile(root, epochId)
    manifest.getParentFile.mkdirs()
    val tmp = new File(manifest.getParentFile, manifest.getName + ".tmp")
    val out = new BufferedWriter(new FileWriter(tmp))
    try rel.foreach { r => out.write(r); out.newLine() } finally out.close()
    if (manifest.exists()) manifest.delete()
    require(tmp.renameTo(manifest), s"cannot publish ${manifest.getPath}")
    // sweep: THIS epoch's orphaned attempt files, manifest-less earlier
    // epoch dirs (superseded before their commit), and — one epoch of
    // lag — files a ZOMBIE task PUT into the previous epoch's dir after
    // that epoch committed (its manifest is re-read here; a straggler
    // older than one epoch is the documented residual of keeping the
    // per-commit sweep O(1) in manifests rather than O(epochs))
    val keep = committed.map(_.getPath).toSet
    def unlisted(d: File, listed: Set[String]): Unit =
      Option(d.listFiles).getOrElse(Array.empty)
        .filterNot(f => listed.contains(f.getCanonicalFile.getPath))
        .foreach(_.delete())
    val EpochDir = """epoch=(-?\d+)""".r
    Option(new File(root, "_data").listFiles).getOrElse(Array.empty).foreach { d =>
      d.getName match {
        case EpochDir(e) if e.toLong == epochId => unlisted(d, keep)
        case EpochDir(e) if e.toLong < epochId &&
            !IndexSink.manifestFile(root, e.toLong).exists() =>
          IndexSink.deleteRecursively(d)
        case EpochDir(e) if e.toLong == epochId - 1 =>
          val m = IndexSink.manifestFile(root, e.toLong)
          val listed = scala.util.Using.resource(scala.io.Source.fromFile(m)) {
            src => src.getLines().filter(_.nonEmpty)
              .map(rel => new File(root, rel).getCanonicalFile.getPath).toSet
          }
          unlisted(d, listed)
        case _ => ()
      }
    }
  }

  def discard(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case IndexFileMessage(tmp) => new File(tmp) }
      .foreach(f => if (f.exists()) f.delete())
}

class IndexWriterFactory(path: String, mode: String = "rename",
    batchEpoch: Long = -1L)
    extends StreamingDataWriterFactory with DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new IndexDataWriter(path, partitionId, taskId, epochId, mode)
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new IndexDataWriter(path, partitionId, taskId, batchEpoch, mode)
}

class IndexDataWriter(root: String, partitionId: Int, taskId: Long, epochId: Long,
    mode: String = "rename")
    extends DataWriter[InternalRow] {
  // rename mode: private scratch, staged out at commit. manifest mode:
  // the FINAL unique key — one file per (partition, task attempt),
  // invisible until a manifest lists it (S3: a PUT that never raced).
  private val tmpDir =
    if (mode == "manifest") new File(root, s"_data/epoch=$epochId")
    else new File(root, s"_tmp/epoch=$epochId")
  tmpDir.mkdirs()
  private val tmpFile = new File(tmpDir, f"part-$partitionId%05d-$taskId")
  private lazy val out = new BufferedWriter(new FileWriter(tmpFile))
  private var wrote = false

  override def write(record: InternalRow): Unit = {
    out.write(record.getString(0))
    out.newLine()
    wrote = true
  }
  override def commit(): WriterCommitMessage = {
    if (wrote) out.close()
    IndexFileMessage(if (wrote) tmpFile.getPath else "")
  }
  override def abort(): Unit = {
    if (wrote) { out.close(); tmpFile.delete(); () }
  }
  override def close(): Unit = ()
}
