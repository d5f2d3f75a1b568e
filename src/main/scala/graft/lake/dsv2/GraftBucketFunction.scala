package graft.lake.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The engine's bucket function — `pmod(xxhash64(repo), numBuckets)`,
  * the same kernel `MergeInto.bucketExpr` writes with and
  * `GraftScanBuilder.bucketOf` prunes with — exposed as a catalog V2
  * function. This is what lets Spark RECOGNIZE two graft scans as
  * co-partitioned: each scan reports a `bucket(n, repo)` transform in
  * its `outputPartitioning`, Spark resolves that transform through the
  * table's FunctionCatalog to this bound function, and two sides whose
  * bound functions share `canonicalName` (and bucket count) are
  * storage-partition-join compatible — the join runs with ZERO shuffle
  * on either side, the DSv2 equivalent of co-located bucketed tables.
  *
  * `produceResult` must agree bit-for-bit with the write path: Spark
  * evaluates it when it needs a partition value outside a scan (e.g.
  * partially-clustered distribution for skew).
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, repo): pmod(xxhash64(repo), numBuckets) — the graft table layout"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets INT, repo STRING), got $inputType")
    val ok = inputType.fields(0).dataType == IntegerType &&
      inputType.fields(1).dataType == StringType
    if (!ok) throw new UnsupportedOperationException(
      s"bucket expects (INT, STRING), got $inputType")
    Bound
  }

  private object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    // null repo → null bucket (Iceberg's bucket-transform convention):
    // Spark may evaluate the bound function over the OTHER side of a
    // storage-partitioned join, whose key can be nullable — an NPE here
    // would fail the job for a row an equi-join drops anyway
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(1)) return null
      val n = input.getInt(0)
      val repo = input.getUTF8String(1)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(repo.getBaseObject, repo.getBaseOffset, repo.numBytes(), 42L)
      val m = (h % n).toInt
      if (m < 0) m + n else m
    }
  }
}
