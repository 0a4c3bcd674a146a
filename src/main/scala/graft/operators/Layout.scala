package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Physical-layout writers — the WRITE side of the layout story the read
  * paths exploit. Each layout trades one write-time shuffle/sort for
  * every future read skipping work:
  *
  *  - [[writeBucketed]]: hash-bucketed + sorted table. Every later
  *    equi-join or aggregation on the bucket key plans with ZERO input
  *    exchanges (BucketingSpec pins the plan) — the daily fact-fact-join
  *    pattern at 100 TB, where the join shuffle would otherwise dominate.
  *  - [[writePartitioned]]: Hive-style directory partitioning. Filters on
  *    the partition columns prune whole directories at file-listing time
  *    (PartitionFilters in the scan) — nothing is opened, let alone read.
  *  - [[writeZOrdered]]: range-partition + in-file sort on an interleaved
  *    (Morton) key, the persisted twin of q56_zorder_key: per-file
  *    min/max stats become tight on BOTH interleaved dimensions, so
  *    point/range predicates on either column skip most files.
  */
object Layout {

  /** Persist `df` as a bucketed (and optionally sorted) managed table.
    * `buckets` should track expected data volume per bucket at the
    * target scale, not core count — a bucket is the co-location unit
    * for every future join on `key`. */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, key: String,
      sortKeys: Seq[String] = Nil): Unit = {
    val w = df.write.bucketBy(buckets, key)
    (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*)
     else w)
      .mode("overwrite").saveAsTable(table)
  }

  /** Hive-style directory partitioning by low-cardinality columns. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)

  /** Cluster `df` into `files` parquet files by a z-order key: global
    * range partitioning on the key (one shuffle — sampled boundaries, no
    * global sort) + an in-partition sort, so file-level min/max ranges
    * are disjoint and tight. LayoutSpec pins the disjointness. */
  def writeZOrdered(
      df: DataFrame, path: String, files: Int, zkey: Column): Unit = {
    require(!df.columns.contains("__zkey"),
      "writeZOrdered: input must not contain the working column __zkey")
    df.withColumn("__zkey", zkey)
      .repartitionByRange(files, org.apache.spark.sql.functions.col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
