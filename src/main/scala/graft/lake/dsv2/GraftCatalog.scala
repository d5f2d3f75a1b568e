package graft.lake.dsv2

import java.util.{Iterator => JIterator}

import graft.lake.{LakeTable, Maintenance, MaterializedView, ViewDef}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ProcedureCatalog}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surfaced table maintenance via Spark 4 stored procedures:
  *
  * {{{
  *   spark.sql.catalog.graft = graft.lake.dsv2.GraftCatalog
  *
  *   CALL graft.system.compact(path => '/lake/t', max_files_per_bucket => 4)
  *   CALL graft.system.vacuum('/lake/t', 86400000)
  *   CALL graft.system.rebucket('/lake/t', 64)
  *   CALL graft.system.refresh_view('/lake/t', 'per_repo', 'repo',
  *                                  'bytes:length(content)')
  * }}}
  *
  * Each procedure runs the same engine entry point the Scala API exposes
  * (`Maintenance.compact/vacuum/rebucket`, `MaterializedView.refresh`)
  * and returns a one-row result set. `refresh_view` takes the grouping
  * columns comma-separated and the summed measures as
  * `name:sql-expression` pairs separated by `;` — the sum-class
  * (self-maintainable) aggregate surface of [[ViewDef]] in SQL form. */
class GraftCatalog extends CatalogPlugin with ProcedureCatalog {
  private var catalogName: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val procNames = Array("compact", "vacuum", "rebucket", "refresh_view")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    procNames.map(Identifier.of(Array("system"), _))

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    val n = ident.name.toLowerCase
    require(procNames.contains(n),
      s"unknown procedure $n (have: ${procNames.mkString(", ")})")
    new GraftProcedure(n)
  }
}

private final class GraftProcedure(procName: String)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = procName
  override def description(): String = procName match {
    case "compact" => "rewrite buckets exceeding max_files_per_bucket into one file each"
    case "vacuum" => "delete unreferenced data/manifest artifacts older than retention_ms"
    case "rebucket" => "rewrite the table into a new hash-bucket count"
    case "refresh_view" => "create or incrementally refresh a sum-class materialized view"
  }
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  private def in(n: String, t: DataType) = ProcedureParameter.in(n, t).build()
  private def inDefault(n: String, t: DataType, default: String) =
    ProcedureParameter.in(n, t).defaultValue(default).build()

  override def parameters(): Array[ProcedureParameter] = procName match {
    case "compact" => Array(in("path", StringType),
      inDefault("max_files_per_bucket", IntegerType, "4"))
    case "vacuum" => Array(in("path", StringType),
      inDefault("retention_ms", LongType, (24L * 3600 * 1000).toString))
    case "rebucket" => Array(in("path", StringType), in("num_buckets", IntegerType))
    case "refresh_view" => Array(in("path", StringType), in("view", StringType),
      in("group_cols", StringType), in("measures", StringType))
  }

  override def call(input: InternalRow): JIterator[Scan] = {
    val spark = SparkSession.active
    def table = new LakeTable(spark, input.getString(0))
    val (schema, row): (StructType, Seq[Any]) = procName match {
      case "compact" =>
        val nBuckets = Maintenance.compact(table, input.getInt(1))
        (StructType(Seq(StructField("compacted_buckets", IntegerType))), Seq(nBuckets))
      case "vacuum" =>
        val removed = Maintenance.vacuum(table, input.getLong(1))
        (StructType(Seq(StructField("removed_artifacts", IntegerType))), Seq(removed.size))
      case "rebucket" =>
        val version = Maintenance.rebucket(table, input.getInt(1))
        (StructType(Seq(StructField("version", LongType))), Seq(version))
      case "refresh_view" =>
        val groupCols = input.getString(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val sums = input.getString(3).split(';').map(_.trim).filter(_.nonEmpty).toSeq
          .map { m =>
            val i = m.indexOf(':')
            require(i > 0, s"measure must be name:expression, got '$m'")
            m.substring(0, i).trim -> expr(m.substring(i + 1))
          }
        val stats = MaterializedView.refresh(table,
          ViewDef(input.getString(1), groupCols, sums))
        (StructType(Seq(
          StructField("from_version", LongType),
          StructField("to_version", LongType),
          StructField("initial_full", BooleanType),
          StructField("no_op", BooleanType))),
          Seq(stats.fromVersion.map(Long.box).orNull, stats.toVersion,
            stats.initialFull, stats.noOp))
    }
    val values = row.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    }.toArray[Any]
    java.util.Collections.singletonList[Scan](
      new GraftResultScan(schema, Array(new GenericInternalRow(values)))).iterator()
  }
}

private final class GraftResultScan(schema: StructType, rs: Array[InternalRow])
    extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = rs
}
