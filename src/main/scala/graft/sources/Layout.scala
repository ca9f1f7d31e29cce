package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Write-side data layout: the half of scan pruning that happens before any
  * query runs. A 100 TB corpus laid out as `lang=.../date=...` partitions with
  * sorted row groups lets every downstream query in this engine skip
  * irrelevant files at the DIRECTORY level (partition pruning) and
  * irrelevant row groups at the FOOTER level (min/max statistics on the
  * sort column) — the difference between scanning 100 TB and scanning the
  * slice a filter actually needs.
  *
  * Recipe (the standard scalable layout):
  *   1. `repartition(partitionCols)` — each partition value lands wholly in
  *      one task, so a directory gets ONE file per write instead of one
  *      file per (task × value) — the small-files explosion that kills
  *      object-store listings.
  *   2. `sortWithinPartitions(sortCols)` — clusters each file's row groups
  *      by the sort key, making parquet min/max stats selective.
  *   3. `partitionBy(partitionCols)` on the writer — hive-style directory
  *      layout, discoverable by any engine.
  *
  * `maxRecordsPerFile` bounds file size for very hot partition values
  * (0 = no bound).
  *
  * `mode` defaults to [[SaveMode.Overwrite]] — the full-rebuild layout job
  * this recipe describes. **That default is destructive**: pointing it at
  * an existing dataset root replaces ALL prior data. For incremental loads
  * into an existing layout pass `SaveMode.Append` (and dedup upstream), or
  * `SaveMode.ErrorIfExists` to refuse to touch a non-empty root.
  */
object Layout {

  import org.apache.spark.sql.SaveMode

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned needs at least one partition column")
    val clustered = df.repartition(partitionCols.map(col): _*)
    val sorted =
      if (sortCols.nonEmpty) clustered.sortWithinPartitions(sortCols.map(col): _*)
      else clustered
    val writer = sorted.write.mode(mode).partitionBy(partitionCols: _*)
    val bounded =
      if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
      else writer
    bounded.parquet(path)
  }

  /** Bucketed-table layout: the CO-LOCATION half of write-side planning.
    * Partitioning (above) prunes scans; bucketing pre-shuffles — two
    * tables bucketed on the same key with the same bucket count satisfy a
    * join's distribution requirement AT WRITE TIME, so the recurring join
    * (fact ⋈ fact, daily batch ⋈ corpus signatures, doc grams ⋈ doc
    * grams) runs with NO exchange on either side, every day, forever. At
    * 100 TB the one-time bucketed write replaces a per-run shuffle of the
    * whole corpus — the single biggest recurring cost a scheduled
    * pipeline pays. `sortBy` additionally pre-sorts buckets so sort-merge
    * joins skip their sort.
    *
    * Bucketing requires the table catalog (`saveAsTable`); pass `path` to
    * keep the data at an external location. Asserted in ScalaTest: the
    * bucketed self-join plan contains no Exchange.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(numBuckets > 0, "writeBucketed: numBuckets must be positive")
    var w = df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(tableName)
  }
}
