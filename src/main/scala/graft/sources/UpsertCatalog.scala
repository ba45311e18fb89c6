package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.RowDeltaUtils
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Copy-on-write upsert catalog (SURVEY.md §2 E, B43): the DSv2
  * row-level-operations contract implemented end-to-end so `MERGE INTO`
  * runs through Spark's real analyzer → `RewriteMergeIntoTable` →
  * `ReplaceData` pipeline — a COMMITTED upsert with write-side
  * all-or-nothing semantics, graduating the b35 merge-preview join
  * (which could only ever SHOW the post-merge rows) to an actual
  * mutable table.
  *
  * Group granularity is the whole table: the row-level operation's scan
  * has no runtime group filter, so Spark's group-based rewrite reads
  * every row and the ReplaceData write delivers the COMPLETE post-merge
  * contents, which `commit` swaps in atomically (one volatile write).
  * That is exactly Delta/Iceberg copy-on-write at one-group
  * granularity; a production store shards groups into files and adds
  * `SupportsRuntimeV2Filtering` so only affected groups rewrite — the
  * planning/commit PROTOCOL, which is what this connector proves, is
  * unchanged by that sharding.
  *
  * Storage is an in-JVM row store (the same stand-in Spark's own
  * reference row-level-operation table uses): rows live on the driver,
  * ship to tasks inside `InputPartition`s, and come back through
  * `WriterCommitMessage`s. Single-JVM local mode by design — the
  * declared §3 non-goal boundary covers durable storage, not the
  * connector contract.
  *
  * Registered in [[graft.GraftSession]] as catalog `graft`
  * (`spark.sql.catalog.graft`), so plain SQL works:
  * {{{
  *   CREATE TABLE graft.t (k BIGINT, v STRING);
  *   INSERT INTO graft.t SELECT ...;
  *   MERGE INTO graft.t USING updates ON t.k = updates.k
  *   WHEN MATCHED THEN UPDATE SET ... WHEN NOT MATCHED THEN INSERT ...;
  * }}}
  */
class UpsertCatalog extends TableCatalog {
  private var catName = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  private def key(ident: Identifier): String =
    (catName +: ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(ns: Array[String]): Array[Identifier] =
    UpsertStore.tables.keys.toArray.filter(_.startsWith(catName + "."))
      .map(k => Identifier.of(Array.empty[String], k.stripPrefix(catName + ".")))
      .sortBy(_.name())

  override def loadTable(ident: Identifier): Table =
    UpsertStore.tables.get(key(ident)) match {
      case Some(st) => new UpsertTable(key(ident), st)
      case None => throw new NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val props = {
      import scala.jdk.CollectionConverters._
      properties.asScala.toMap
    }
    if (UpsertStore.tables.putIfAbsent(key(ident),
        new UpsertStore.State(schema, props)).isDefined)
      throw new TableAlreadyExistsException(ident)
    loadTable(ident)
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    createTable(ident,
      StructType(columns.map(c => StructField(c.name, c.dataType, c.nullable))),
      partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("upsert catalog tables are schema-fixed")

  override def dropTable(ident: Identifier): Boolean =
    UpsertStore.tables.remove(key(ident)).isDefined

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("rename is not supported")
}

/** Driver-side table states, keyed by `<catalog>.<ident>`. */
object UpsertStore {
  final class State(val schema: StructType,
      val props: Map[String, String] = Map.empty) {
    @volatile var rows: Array[InternalRow] = Array.empty
  }
  val tables: TrieMap[String, State] = TrieMap.empty
}

private[sources] class UpsertTable(tableKey: String, state: UpsertStore.State)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  override def name(): String = tableKey
  override def schema(): StructType = state.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new UpsertScanBuilder(state)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new UpsertWriteBuilder(state)

  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () =>
      if (state.props.get("write.mode").contains("delta"))
        new UpsertDeltaOperation(state, info.command(),
          state.props.getOrElse("rowid",
            throw new IllegalArgumentException(
              "delta-mode table requires a 'rowid' table property")))
      else new UpsertRowLevelOperation(state, info.command())
}

private[sources] class UpsertScanBuilder(state: UpsertStore.State) extends ScanBuilder {
  override def build(): Scan = new UpsertScan(state)
}

private[sources] class UpsertScan(state: UpsertStore.State) extends Scan with Batch {
  override def readSchema(): StructType = state.schema
  override def toBatch: Batch = this
  // one partition per ~8k rows so a larger table still parallelizes
  override def planInputPartitions(): Array[InputPartition] = {
    val rows = state.rows
    if (rows.isEmpty) Array(UpsertPartition(Array.empty))
    else rows.grouped(8192).map(g => UpsertPartition(g): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = UpsertReaderFactory
}

private[sources] final case class UpsertPartition(rows: Array[InternalRow])
    extends InputPartition

private[sources] object UpsertReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[UpsertPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

/** Plain writes: INSERT appends; INSERT OVERWRITE / the row-level
  * ReplaceData truncate-and-swap.
  */
private[sources] class UpsertWriteBuilder(state: UpsertStore.State,
    private var replace: Boolean = false) extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new UpsertBatchWrite(state, replace, state.schema)
  }
}

private[sources] class UpsertBatchWrite(state: UpsertStore.State, replace: Boolean,
    schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new UpsertWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val delivered = messages.flatMap(_.asInstanceOf[UpsertCommit].rows)
    // the atomic swap: readers see the old snapshot until this line
    state.synchronized {
      state.rows = if (replace) delivered else state.rows ++ delivered
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] final case class UpsertCommit(rows: Array[InternalRow])
    extends WriterCommitMessage

/** Task-side writer. Two row shapes arrive, per the DSv2 write
  * contracts:
  *
  *  - plain appends/overwrites: rows match the table schema verbatim;
  *  - group-based row-level rewrites (ReplaceData): Spark's MergeRows
  *    operator prefixes every row with the int `__row_operation` column
  *    ([[RowDeltaUtils.OPERATION_COLUMN]]) — WRITE(5) for rewritten
  *    rows, WRITE_WITH_METADATA(6) for carried-over rows (whose
  *    metadata attrs follow the data columns; this table requests
  *    none). Either way the data columns are positions 1..n and are
  *    projected off through a codegen'd UnsafeProjection; DELETE(1)
  *    never reaches a group-based write (deleted rows are simply
  *    omitted) but is dropped defensively rather than corrupting the
  *    table if a future Spark version changes that.
  */
private[sources] class UpsertWriterFactory(schema: StructType)
    extends DataWriterFactory with Serializable {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[InternalRow]
      private lazy val dropOp = UnsafeProjection.create(
        schema.fields.zipWithIndex.map { case (f, i) =>
          BoundReference(i + 1, f.dataType, f.nullable): Expression
        }.toIndexedSeq)
      override def write(row: InternalRow): Unit =
        if (row.numFields == schema.length) {
          buf += row.copy()
        } else {
          require(row.numFields == schema.length + 1,
            s"unexpected row width ${row.numFields} for schema of ${schema.length}")
          if (row.getInt(0) != RowDeltaUtils.DELETE_OPERATION) buf += dropOp(row).copy()
        }
      override def commit(): WriterCommitMessage = UpsertCommit(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

/** The row-level operation: scan = the plain table scan (no group
  * filter → the rewrite covers the whole single group), write =
  * truncate-and-swap with the full post-operation contents.
  */
private[sources] class UpsertRowLevelOperation(state: UpsertStore.State,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new UpsertScanBuilder(state)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new UpsertWriteBuilder(state, replace = true)
}

/** The DELTA (merge-on-read-style) write path — the scale counterpart
  * of the group-based rewrite above: where copy-on-write delivers the
  * FULL post-merge contents of every affected group, a `SupportsDelta`
  * operation receives only the CHANGED rows, each through a typed
  * callback (`delete(meta, id)` / `update(meta, id, row)` /
  * `insert(row)`), keyed by the declared `rowId` columns. At 100 TB
  * this is the difference between rewriting a partition because one
  * row changed and shipping one tombstone — exactly Iceberg/Delta's
  * MoR write side. Enabled per table with
  * `TBLPROPERTIES ('write.mode'='delta', 'rowid'='<col>')`.
  *
  * Commit applies the deltas to the keyed store: deletes remove the
  * key, updates replace it (the rowId itself is immutable under
  * UPDATE, which Spark guarantees when `representUpdateAsDeleteAndInsert`
  * is false), inserts append. The apply is one driver-side hash pass —
  * the stand-in for a log/compaction scheme, same boundary as the rest
  * of this connector's storage.
  */
private[sources] class UpsertDeltaOperation(state: UpsertStore.State,
    cmd: RowLevelOperation.Command, rowIdCol: String)
    extends RowLevelOperation with SupportsDelta {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new UpsertScanBuilder(state)
  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(rowIdCol))
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new UpsertDeltaBatchWrite(state, rowIdCol)
      }
    }
}

/** One buffered (op, row) pair per callback; DELETE keeps only the id
  * projection, UPDATE/INSERT the full row.
  */
private[sources] final case class UpsertDeltaCommit(
    ops: Array[(Byte, InternalRow)]) extends WriterCommitMessage

private[sources] class UpsertDeltaBatchWrite(state: UpsertStore.State, rowIdCol: String)
    extends DeltaBatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new UpsertDeltaWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val keyIdx = state.schema.fieldIndex(rowIdCol)
    val keyType = state.schema(keyIdx).dataType
    state.synchronized {
      // keyed apply over the current snapshot
      val byKey = scala.collection.mutable.LinkedHashMap.empty[Any, InternalRow]
      state.rows.foreach(r => byKey(r.get(keyIdx, keyType)) = r)
      messages.foreach { m =>
        m.asInstanceOf[UpsertDeltaCommit].ops.foreach { case (op, row) =>
          op match {
            case UpsertDeltaBatchWrite.Del =>
              byKey.remove(row.get(0, keyType)): Unit // id projection: rowId at 0
            case UpsertDeltaBatchWrite.Upd | UpsertDeltaBatchWrite.Ins =>
              byKey(row.get(keyIdx, keyType)) = row
          }
        }
      }
      state.rows = byKey.values.toArray
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] object UpsertDeltaBatchWrite {
  val Del: Byte = 1
  val Upd: Byte = 2
  val Ins: Byte = 3
}

private[sources] class UpsertDeltaWriterFactory extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val ops = ArrayBuffer.empty[(Byte, InternalRow)]
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        ops += ((UpsertDeltaBatchWrite.Del, id.copy()))
      override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit =
        ops += ((UpsertDeltaBatchWrite.Upd, row.copy()))
      override def insert(row: InternalRow): Unit =
        ops += ((UpsertDeltaBatchWrite.Ins, row.copy()))
      override def commit(): WriterCommitMessage = UpsertDeltaCommit(ops.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
