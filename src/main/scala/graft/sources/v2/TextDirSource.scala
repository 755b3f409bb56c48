package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 `TableProvider` for a directory of plain-text files —
  * the reference's scan (`sendFileByFile.cpp:422-444`) re-expressed as
  * a first-class Spark connector instead of a `spark.read.textFile`
  * call, demonstrating the custom-source extension surface end to end:
  *
  *  - schema `(file, line_no, line)` — the provenance columns the
  *    reference's per-file processing implies;
  *  - **partition pruning via filter pushdown**: `EqualTo` /
  *    `StringStartsWith` on `file` are accepted in `pushFilters` and
  *    applied to the FILE LIST at planning time — a pruned file never
  *    becomes an `InputPartition`, the connector-level analogue of
  *    parquet partition pruning (and exact, so the filter is NOT
  *    re-evaluated post-scan);
  *  - **column pruning**: `pruneColumns` narrows the reader's emitted
  *    schema, so a `select(line)` never materializes file paths.
  *
  * One `InputPartition` per file mirrors the reference's file-grained
  * pull scheduling; Spark's task scheduler supplies the dynamic load
  * balancing (SURVEY §2 row 2). At 100 TB the same shape holds —
  * listing is driver-side metadata (as with every file source) and
  * splittable formats would subdivide files; plain text lines keep
  * file granularity.
  *
  * Usage: `spark.read.format("graft.sources.v2.TextDirSource")
  * .load(dir)`.
  */
class TextDirSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TextDirTable.schema
  // writes pass the incoming DataFrame's schema (word, cnt) as external
  // metadata; reads infer the fixed (file, line_no, line) shape
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TextDirTable(
      new CaseInsensitiveStringMap(properties).get("path"), schema)
}

object TextDirTable {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))
}

class TextDirTable(path: String, tableSchema: StructType) extends Table
    with SupportsRead with SupportsWrite {
  require(path != null, "graft-textdir needs a path: .load(dir)/.save(dir)")
  override def name(): String = s"graft_textdir($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TextDirScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TextDirWriteBuilder(path, info.schema())
}

class TextDirScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = TextDirTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // file-level predicates prune whole partitions and are EXACT
    // (every row of a surviving file satisfies them), so they are
    // consumed here; everything else stays post-scan
    val (accepted, rejected) = filters.partition {
      case EqualTo("file", _: String) => true
      case StringStartsWith("file", _) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TextDirScan(path, required, pushed)
}

class TextDirScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-textdir path=$path pushed=[${pushed.mkString(", ")}]"

  private def survivingFiles: Array[java.io.File] = {
    val all = Option(new java.io.File(path).listFiles()).getOrElse(Array())
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .sortBy(_.getAbsolutePath)
    all.filter(f => pushed.forall {
      case EqualTo("file", v: String) => f.getAbsolutePath == v
      case StringStartsWith("file", p) => f.getAbsolutePath.startsWith(p)
      case _ => true
    })
  }

  /** POST-PRUNING size estimate: joins against a filtered textdir scan
    * see the surviving bytes, not the whole directory — so AQE/the
    * planner can broadcast a pruned side it would otherwise
    * sort-merge. Row count stays unknown (line counts need a scan);
    * sizeInBytes is what join planning keys on.
    */
  override def estimateStatistics(): Statistics = {
    val bytes = survivingFiles.map(_.length).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    survivingFiles.map(f => TextFilePartition(f.getAbsolutePath): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new TextDirReaderFactory(required)
}

case class TextFilePartition(file: String) extends InputPartition

/** Write path — the reference's sink layout (`sendFileByFile.cpp:376-392`)
  * as a V2 `BatchWrite`: each task writes `word count` lines and
  * two-phase-commits them into `Rank_<partition>_Thread_0.txt`
  * (the reference's Rank×Thread naming at one logical thread per
  * Spark task). Tasks write to a `.tmp_` staging name and rename on
  * task commit — a failed/speculative task aborts its temp file and
  * never publishes, the same visibility contract FileOutputCommitter
  * gives the classic sinks. Overwrite mode (`SupportsTruncate`)
  * clears prior `Rank_*` files at write planning, before any task
  * runs.
  */
class TextDirWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      require(schema.length == 2 &&
        schema.head.dataType == StringType &&
        schema(1).dataType == LongType,
        s"graft-textdir sink expects (word string, cnt long), got $schema")
      new TextDirBatchWrite(path, doTruncate)
    }
  }
}

class TextDirBatchWrite(path: String, doTruncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    if (doTruncate)
      Option(dir.listFiles()).getOrElse(Array()).foreach { f =>
        if (f.getName.startsWith("Rank_") || f.getName.startsWith(".tmp_"))
          f.delete()
      }
    new TextDirWriterFactory(path)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class TextDirWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val tmp = new java.io.File(path, s".tmp_${partitionId}_$taskId")
      private val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(
          new java.io.FileOutputStream(tmp), "UTF-8"))
      override def write(row: InternalRow): Unit =
        out.println(s"${row.getUTF8String(0)} ${row.getLong(1)}")
      override def commit(): WriterCommitMessage = {
        out.close()
        val dst = new java.io.File(path, s"Rank_${partitionId}_Thread_0.txt")
        if (!tmp.renameTo(dst))
          throw new java.io.IOException(s"commit rename failed: $tmp -> $dst")
        new WriterCommitMessage {}
      }
      override def abort(): Unit = { out.close(); tmp.delete(): Unit }
      override def close(): Unit = out.close()
    }
}

class TextDirReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[TextFilePartition].file
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(file, "UTF-8")
      private val lines = src.getLines()
      private var lineNo = 0L
      private var current: String = _
      override def next(): Boolean =
        if (lines.hasNext) { current = lines.next(); lineNo += 1; true }
        else false
      override def get(): InternalRow = {
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          required.fields(i).name match {
            case "file" => row.update(i, UTF8String.fromString(file))
            case "line_no" => row.update(i, lineNo)
            case "line" => row.update(i, UTF8String.fromString(current))
          }
          i += 1
        }
        row
      }
      override def close(): Unit = src.close()
    }
  }
}
