package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, pmod, shiftleft, shiftright}

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

  /** Result of a [[compact]] run — before/after file census for the
    * maintenance job's own observability.
    */
  final case class CompactStats(
      filesBefore: Int, bytesBefore: Long, filesAfter: Int, bytesAfter: Long, rows: Long)

  /** Small-files compaction: rewrite one parquet leaf directory into
    * ~`targetBytes`-sized files. Streaming ingest (one file per
    * micro-batch per partition) and over-parallel writes fragment a
    * dataset into thousands of KB-scale files; every subsequent scan then
    * pays per-file open/footer/list costs that dwarf the data read — on
    * object stores the LISTING alone can dominate. Compaction is the
    * recurring maintenance job that keeps the read path healthy.
    *
    * Plan shape: `coalesce(n)` by default — collapsing file count needs NO
    * shuffle (n writer tasks each read a slice of input files and stream
    * rows through). Pass `rebalance = true` to pay one round-robin shuffle
    * when input files are skewed enough that coalesce's merge-by-position
    * would produce lopsided outputs. `sortCols` re-sorts within each
    * output file (local sort, no exchange) to restore footer min/max
    * selectivity after the merge.
    *
    * Swap protocol (plain-parquet stand-in for a table format's atomic
    * commit): write to `<dir>.compact-tmp`, optionally verify row counts,
    * rename old → `.compact-old`, tmp → dir, drop backup. A crash between
    * the renames leaves the data recoverable at one of the two names —
    * never half-overwritten. Readers racing the swap can fail one listing
    * (document `ignoreMissingFiles` on hot paths, as the retention job
    * does); production systems wanting fully-transactional compaction use
    * a table format — this is the everything-else recipe.
    *
    * Compacts ONE leaf directory; for hive-partitioned layouts run it per
    * partition directory (the partition values that actually fragmented).
    *
    * Do NOT compact a directory being consumed as a Structured Streaming
    * file SOURCE: the file source tracks progress by file NAME, so the
    * rewritten files all look like fresh input and every row is re-ingested
    * as a duplicate. Compact sinks, history tables, and batch-read buffers
    * — never a live source directory (pause the consumer and reset its
    * checkpoint if a source dir truly must be rewritten).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil,
      rebalance: Boolean = false,
      verifyCounts: Boolean = true): CompactStats = {
    require(targetBytes > 0, "compact: targetBytes must be positive")
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = fs.listStatus(dir).filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val before = dataFiles
    require(before.nonEmpty, s"compact: no data files under $path (leaf directories only)")
    val bytesBefore = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    val rowsBefore = if (verifyCounts) df.count() else -1L
    val shaped = if (rebalance) df.repartition(nOut) else df.coalesce(nOut)
    val sorted =
      if (sortCols.nonEmpty) shaped.sortWithinPartitions(sortCols.map(col): _*) else shaped
    val tmp = new Path(dir.getParent, dir.getName + ".compact-tmp")
    fs.delete(tmp, true)
    sorted.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (verifyCounts) {
      val rowsAfter = spark.read.parquet(tmp.toString).count()
      require(rowsAfter == rowsBefore,
        s"compact: row count changed during rewrite ($rowsBefore -> $rowsAfter); " +
          s"original untouched at $path, rewrite left at $tmp")
    }
    val bak = new Path(dir.getParent, dir.getName + ".compact-old")
    fs.delete(bak, true)
    require(fs.rename(dir, bak), s"compact: could not move $dir aside to $bak")
    require(fs.rename(tmp, dir), s"compact: could not move $tmp into place; data is at $bak")
    fs.delete(bak, true)
    val after = dataFiles
    CompactStats(before.length, bytesBefore, after.length, after.map(_.getLen).sum, rowsBefore)
  }

  /** Recursive [[compact]] over a hive-partitioned tree: walks to the leaf
    * directories (those holding data files), compacts ONLY the fragmented
    * ones (file count above `minFilesToCompact`), leaves the rest
    * untouched. The maintenance loop a micro-batch-ingested corpus runs
    * nightly — per-leaf granularity means a year-old cold partition is
    * never rewritten just because yesterday's is fragmented.
    *
    * Returns (leaves examined, leaves compacted).
    */
  def compactTree(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil,
      minFilesToCompact: Int = 2): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
      val (dirs, files) = entries.partition(_.isDirectory)
      if (files.exists(f => !f.getPath.getName.startsWith("."))) Seq(p)
      else dirs.flatMap(d => leaves(d.getPath)).toSeq
    }
    val ls = leaves(root)
    var done = 0
    for (leaf <- ls) {
      val nFiles = fs.listStatus(leaf).count(s =>
        s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      if (nFiles >= minFilesToCompact) {
        compact(spark, leaf.toString, targetBytes, sortCols)
        done += 1
      }
    }
    (ls.length, done)
  }

  final case class TakedownStats(
      nPartitionsTotal: Int,
      nPartitionsRewritten: Int,
      rowsDeleted: Long)

  /** Targeted deletion from a hive-partitioned corpus — the takedown /
    * right-to-be-forgotten operation every LLM training corpus eventually
    * needs. Rows whose `keyCol` appears in `keys` are removed by rewriting
    * ONLY the partitions that contain a hit; every other partition's files
    * are untouched byte-for-byte (spec-asserted), so a 100 TB corpus pays
    * IO proportional to the takedown's partition locality, not its size.
    *
    * Locating the affected partitions: if `keys` carries `partitionCol`
    * (the caller knows where the rows live — the usual case, the key store
    * records it), NO corpus scan happens at all; otherwise one
    * broadcast-join scan over `keyCol` finds them.
    *
    * Each affected leaf rewrites via the same tmp → backup → swap rename
    * protocol as [[compact]], with a row-count proof (after == before −
    * deleted) BEFORE the original is touched — a failed rewrite leaves the
    * corpus exactly as it was.
    */
  def deleteByKey(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      partitionCol: String,
      keyCol: String,
      keys: DataFrame): TakedownStats = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.broadcast
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val allParts = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      .map(_.getPath.getName.stripPrefix(s"$partitionCol="))
    val keySet = keys.select(col(keyCol)).distinct().persist()
    val affected: Array[String] =
      if (keys.columns.contains(partitionCol))
        keys.select(col(partitionCol).cast("string")).distinct()
          .collect().map(_.getString(0)).filter(allParts.contains)
      else
        spark.read.parquet(path)
          .join(broadcast(keySet), keyCol)
          .select(col(partitionCol).cast("string")).distinct()
          .collect().map(_.getString(0))
    var deleted = 0L
    var rewritten = 0
    for (p <- affected.sorted) {
      val leaf = new Path(root, s"$partitionCol=$p")
      val before = spark.read.parquet(leaf.toString)
      val nBefore = before.count()
      val kept = before.join(broadcast(keySet), Seq(keyCol), "left_anti")
      val tmp = new Path(root, s"$partitionCol=$p.takedown-tmp")
      fs.delete(tmp, true)
      kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val nAfter = spark.read.parquet(tmp.toString).count()
      val nHit = nBefore - nAfter
      require(nHit >= 0 && nAfter <= nBefore,
        s"deleteByKey: rewrite grew partition $p ($nBefore -> $nAfter); " +
          s"original untouched, rewrite left at $tmp")
      if (nHit == 0) { fs.delete(tmp, true) } // false-positive partition: no rewrite
      else {
        val bak = new Path(root, s"$partitionCol=$p.takedown-old")
        fs.delete(bak, true)
        require(fs.rename(leaf, bak), s"deleteByKey: could not move $leaf aside")
        require(fs.rename(tmp, leaf), s"deleteByKey: could not swap in $tmp; data at $bak")
        fs.delete(bak, true)
        deleted += nHit
        rewritten += 1
      }
    }
    keySet.unpersist()
    TakedownStats(allParts.length, rewritten, deleted)
  }

  /** Z-order (Morton) interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Pure integer shift/mask arithmetic (codegen'd, no UDF), identical
    * in any engine that has `>> << & %` — which is what makes the layout
    * oracle-checkable. Inputs are taken mod 2^bits, so callers can pass raw
    * keys; negative inputs should be pmod'ed by the caller first.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: bits must be in [1,31], got $bits")
    val side = 1L << bits
    val xb = pmod(x, org.apache.spark.sql.functions.lit(side)).cast("long")
    val yb = pmod(y, org.apache.spark.sql.functions.lit(side)).cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _) // disjoint bit positions, so + is |
  }

  /** Multi-dimensional clustering layout: range-partition and sort the data
    * by the Z-order value of two filter columns, so EVERY file's parquet
    * footer carries tight min/max bounds on BOTH dimensions at once.
    *
    * Sorting by a single column gives perfect skipping on that column and
    * none on any other; Z-ordering trades a little per-column tightness for
    * bounded spans on both — a contiguous Z range is a spatial block, so a
    * selective predicate on EITHER column (or both) prunes most files at
    * the footer level. This is the standard big-table layout for the
    * two-filter-column scan pattern (e.g. corpus scans filtered by
    * source-bucket and length-bucket) and is exactly what Delta/Iceberg
    * `OPTIMIZE ZORDER BY` does — here as a plain-parquet write any engine
    * can read.
    *
    * Scale shape: one range shuffle (sampled bounds, no hot reducer — Z
    * values of real keys are near-uniform), per-partition sort, one file
    * per partition. The Z expression itself is ~2·bits codegen'd integer
    * ops per row. Locality bound (asserted in ScalaTest): with F files,
    * each file's span in each dimension is ~side/2^floor(log4(F)) — both
    * dimensions shrink as F grows, vs. one dimension stuck at full span
    * under single-column sort.
    */
  def zorderWrite(
      df: DataFrame,
      x: Column,
      y: Column,
      bits: Int,
      path: String,
      numFiles: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numFiles > 0, "zorderWrite: numFiles must be positive")
    val z = zValue(x, y, bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode(mode).parquet(path)
  }
}
