package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Storage-partitioned-join plumbing for bucketized graft tables
  * ([[graft.lake.IncrementalTable.bucketize]]): the scan groups its
  * file partitions by the `__jbucket=<k>` directory each file lives
  * under and reports `KeyGroupedPartitioning(bucket(n, col))`, so an
  * equi-join of two same-bucketed tables on the bucket column runs
  * with NO shuffle on either side — the DSv2 mechanism behind
  * Iceberg's bucket joins, served here from graft's own layout.
  */
private[sources] final case class GraftBucketSpec(
    n: Int, column: String, typeToken: String)

/** One bucket's files as a key-grouped input partition. The inner
  * [[FilePartition]] is what the parquet reader factory consumes;
  * the partition KEY (the bucket id) is what Spark's key-grouped
  * planner groups and matches across the join.
  */
private[sources] final case class GraftBucketedPartition(
    bucket: Int, inner: FilePartition)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Delegates to the parquet reader factory with the bucket wrapper
  * stripped (the factory pattern-matches on [[FilePartition]]).
  */
private[sources] final class GraftUnwrapReaderFactory(
    inner: PartitionReaderFactory) extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case b: GraftBucketedPartition => b.inner
    case other => other
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}

/** The key-grouped batch: one input partition per PRESENT bucket,
  * every file of a bucket in that partition. Reader bytes still come
  * from the inner parquet batch's factory.
  */
private[sources] final class GraftBucketedBatch(
    val inner: Batch, val groups: Seq[(Int, FilePartition)]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    groups.map { case (b, fp) => GraftBucketedPartition(b, fp) }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftUnwrapReaderFactory(inner.createReaderFactory())
  // scan/exchange reuse compares batches: same inner scan + same
  // bucket ids = same data in the same groups
  override def equals(other: Any): Boolean = other match {
    case o: GraftBucketedBatch =>
      inner == o.inner && groups.map(_._1) == o.groups.map(_._1)
    case _ => false
  }
  override def hashCode(): Int = (inner, groups.map(_._1)).hashCode()
}

/** The catalog-served `bucket(n, col)` function Spark resolves when
  * translating the scan-reported bucket transform — REQUIRED to be
  * byte-identical to the write side
  * ([[graft.lake.IncrementalTable.bucketize]] uses
  * `pmod(hash(col), n)`, i.e. murmur3 seed 42 mod n) or two tables
  * would "agree" on groups that hold different keys.
  */
private[sources] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3_hash(col), n) — graft join-bucket id"
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2)
      throw new UnsupportedOperationException(
        s"graft bucket expects (numBuckets, column), got $inputType")
    val keyType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
      override def resultType(): DataType = IntegerType
      override def isResultNullable: Boolean = false
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val v = input.get(1, keyType)
        // null hashes to the seed, exactly like the write side's
        // hash(col) (Spark's hash() leaves the seed untouched for a
        // null child) — spelled out rather than trusting the
        // interpreted hasher's null dispatch
        val h = if (v == null) 42
          else org.apache.spark.sql.catalyst.expressions
            .Murmur3HashFunction.hash(v, keyType, 42L).toInt
        Integer.valueOf(((h % n) + n) % n)
      }
    }
  }
}
