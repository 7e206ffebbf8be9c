package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull, IsNull, Not}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.OplogEntry
import graft.streaming.ShardTopology

/** Native DataSource V2 connector for the (file-modeled) sharded oplog —
  * the engine-level rendition of the reference's source architecture:
  *
  *  - topology discovery (O2, `reference:.../ShardSetFinder.java:44-78`):
  *    the `topology` option carries `"s0/h1:p1,h2:p2;s1/..."` descriptors;
  *    each replica member maps to a directory of json-lines files under
  *    `path/<shard>/<host>_<port>/`.
  *  - one tailable cursor per member (O1, `MongoOplogTailMapper.java:75-78`):
  *    `planInputPartitions` emits ONE InputPartition PER MEMBER — the
  *    exact parallelism the reference hand-builds with its Rx thread
  *    pool, here scheduled by Spark across executors.
  *  - server-side predicate pushdown (O3, `MongoOplogTailMapper.java:90-94`):
  *    `SupportsPushDownFilters` accepts the O3 filter shapes
  *    (`Not(EqualTo(op|ns, _))`, `EqualTo`, `IsNull(fromMigrate)`) and
  *    evaluates them inside the partition reader — rows are dropped at
  *    the "cursor", exactly like the Bson filter the reference sends to
  *    mongod, and never cross the source boundary.
  *  - resumable offsets (O4/O8, `MongoDBOplogSource.java:130-139`): the
  *    streaming Offset is a per-member log position (file index), so a
  *    restarted query replans precisely the unread suffix per member —
  *    the `ts > lastSeen` resume predicate, made exact.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.OplogSourceProvider")
  *     .option("topology", "s0/h1:27018,h2:27019,h3:27020")
  *     .load("/data/oplog")
  * }}}
  */
class OplogSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = OplogEntry.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OplogTable(new CaseInsensitiveStringMap(properties))
}

object OplogConnector {
  /** member id / directory layout shared by writer-side fixtures. */
  def memberDir(root: String, shard: String, host: String, port: Int): String =
    s"$root/$shard/${host}_$port"

  private[sources] def members(options: CaseInsensitiveStringMap): Seq[(String, String)] = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("oplog connector requires a path"))
    val topology = Option(options.get("topology")).getOrElse(
      throw new IllegalArgumentException("oplog connector requires a topology option"))
    topology.split(";").toSeq.map(ShardTopology.parseDescriptor).flatMap { ss =>
      ss.members.map(m => (s"${ss.shard}/${m.host}:${m.port}",
        memberDir(root, ss.shard, m.host, m.port)))
    }
  }

  private[sources] def listFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().filter(f => f.isFile && f.getName.endsWith(".json"))
      .map(_.getAbsolutePath).sorted.toSeq
  }
}

class OplogTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"oplog(${options.get("path")})"
  override def schema(): StructType = OplogEntry.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ caseInsensitiveOptions.asScala).asJava)
    new OplogScanBuilder(merged)
  }
}

class OplogScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  /** O3 filter shapes the "server side" (reader) evaluates. */
  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => a == "op" || a == "ns"
    case Not(EqualTo(a, _: String)) => a == "op" || a == "ns"
    case IsNull("fromMigrate") | IsNotNull("fromMigrate") => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(supported)
    pushed = accepted
    rejected   // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new OplogScan(options, pushed)
}

class OplogScan(options: CaseInsensitiveStringMap, pushed: Array[Filter]) extends Scan {
  override def readSchema(): StructType = OplogEntry.schema
  override def description(): String =
    s"graft-oplog pushed=[${pushed.mkString(", ")}]"
  override def toBatch: Batch = new OplogBatch(options, pushed)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new OplogMicroBatchStream(options, pushed)
}

/** bounded read: every member, full file list. */
class OplogBatch(options: CaseInsensitiveStringMap, pushed: Array[Filter]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    OplogConnector.members(options).map { case (id, dir) =>
      OplogInputPartition(id, OplogConnector.listFiles(dir).toArray)
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new OplogReaderFactory(pushed)
}

/** per-member log position (files fully read so far). */
case class OplogOffset(positions: Map[String, Int]) extends Offset {
  override def json(): String =
    positions.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${k.replace("\"", "\\\"")}":$v""" }
      .mkString("{", ",", "}")
}

object OplogOffset {
  def fromJson(json: String): OplogOffset = {
    val entries = "\"((?:[^\"\\\\]|\\\\.)*)\":(\\d+)".r
      .findAllMatchIn(json)
      .map(m => m.group(1).replace("\\\"", "\"") -> m.group(2).toInt)
      .toMap
    OplogOffset(entries)
  }
}

class OplogMicroBatchStream(options: CaseInsensitiveStringMap, pushed: Array[Filter])
    extends MicroBatchStream {
  private val memberDirs = OplogConnector.members(options)

  override def initialOffset(): Offset =
    OplogOffset(memberDirs.map { case (id, _) => id -> 0 }.toMap)

  override def latestOffset(): Offset =
    OplogOffset(memberDirs.map { case (id, dir) =>
      id -> OplogConnector.listFiles(dir).size
    }.toMap)

  override def deserializeOffset(json: String): Offset = OplogOffset.fromJson(json)

  /** one InputPartition per replica member with its unread file slice —
    * the reference's per-replica tailable cursor, replayable exactly. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[OplogOffset].positions
    val e = end.asInstanceOf[OplogOffset].positions
    memberDirs.flatMap { case (id, dir) =>
      val from = s.getOrElse(id, 0)
      val to = e.getOrElse(id, 0)
      if (to > from) {
        val files = OplogConnector.listFiles(dir).slice(from, to)
        Some(OplogInputPartition(id, files.toArray))
      } else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OplogReaderFactory(pushed)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class OplogInputPartition(memberId: String, files: Array[String]) extends InputPartition

class OplogReaderFactory(pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OplogPartitionReader(partition.asInstanceOf[OplogInputPartition], pushed)
}

/** reads a member's json-lines files in order, applying the pushed O3
  * predicate before a row ever leaves the "cursor". */
class OplogPartitionReader(partition: OplogInputPartition, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val lines: Iterator[String] = partition.files.iterator.flatMap { f =>
    scala.io.Source.fromFile(f, "UTF-8").getLines()
  }.filter(_.nonEmpty)
  private var current: InternalRow = _

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def passes(op: String, ns: String, fromMigrate: java.lang.Boolean): Boolean =
    pushed.forall {
      case EqualTo("op", v: String) => op == v
      case EqualTo("ns", v: String) => ns == v
      case Not(EqualTo("op", v: String)) => op != v
      case Not(EqualTo("ns", v: String)) => ns != v
      case IsNull("fromMigrate") => fromMigrate == null
      case IsNotNull("fromMigrate") => fromMigrate != null
      case _ => true
    }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val node = mapper.readTree(lines.next())
      val op = node.get("op").asText()
      val ns = node.get("ns").asText()
      val fm: java.lang.Boolean =
        if (node.hasNonNull("fromMigrate")) Boolean.box(node.get("fromMigrate").asBoolean())
        else null
      if (passes(op, ns, fm)) {
        val inst = java.time.Instant.parse(node.get("ts").asText())
        val micros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        val o2 = if (node.hasNonNull("o2")) UTF8String.fromString(node.get("o2").asText()) else null
        current = InternalRow(
          micros,
          node.get("tsInc").asInt(),
          node.get("h").asLong(),
          UTF8String.fromString(op),
          UTF8String.fromString(ns),
          if (fm == null) null else fm.booleanValue(),
          UTF8String.fromString(node.get("o").asText()),
          o2,
          UTF8String.fromString(partition.memberId))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
