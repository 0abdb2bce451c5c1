package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Table maintenance: small-file compaction. Streaming/incremental
  * writers leave many small parquet files; scans then pay per-file open
  * + footer costs and lose row-group locality — at warehouse scale the
  * dominant silent tax. Compaction rewrites a directory into
  * ceil(bytes / targetBytes) files via one repartition (a single
  * round-robin shuffle, no data skew risk), staged next to the target
  * and swapped in so readers never observe a half-written directory.
  */
object Maintenance {

  final case class CompactStats(
      filesBefore: Int, filesAfter: Int, bytes: Long)

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  private def deleteTree(dir: Path): Unit =
    Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  /** Hive partition columns, in nesting order, inferred from the first
    * leaf file's `key=value` path segments (empty → unpartitioned). */
  private def partitionCols(dir: Path, leaves: Seq[Path]): Seq[String] =
    leaves.headOption.toSeq.flatMap { leaf =>
      dir.relativize(leaf).iterator().asScala.toSeq
        .map(_.toString).filter(_.contains('='))
        .map(_.takeWhile(_ != '='))
    }

  def compactParquet(
      spark: SparkSession,
      path: String,
      targetBytes: Long): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dir = Paths.get(path)
    val before = parquetFiles(dir)
    val totalBytes = before.map(Files.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val partCols = partitionCols(dir, before)

    val stage = Paths.get(path + "__compact")
    // Partitioned tables keep their layout: hash-repartition on the
    // partition columns co-locates each partition value in one task, so
    // every partition dir is rewritten as one file. Unpartitioned tables
    // get a round-robin repartition into ceil(bytes/target) files.
    val src = spark.read.option("basePath", path).parquet(path)
    val writer =
      if (partCols.nonEmpty)
        src.repartition(nFiles, partCols.map(org.apache.spark.sql.functions.col): _*)
          .write.partitionBy(partCols: _*)
      else src.repartition(nFiles).write
    writer.mode("overwrite").parquet(stage.toString)

    // Swap via two atomic renames so a crash never strands the table with
    // no live copy: move the old dir aside, move the staged dir into
    // place, then drop the old copy. A reader can race only into the
    // instant between the two renames — never into a half-deleted tree.
    val old = Paths.get(path + "__old")
    if (Files.exists(old)) deleteTree(old)
    Files.move(dir, old)
    Files.move(stage, dir)
    deleteTree(old)
    CompactStats(before.size, parquetFiles(dir).size, totalBytes)
  }

  final case class VacuumStats(
      manifestFiles: Int, listedFiles: Int, orphansDeleted: Int)

  /** Data files under `path`, as `path`-relative strings — the listing
    * a write commit records into its manifest (and what vacuum diffs
    * that manifest against later).
    */
  def listDataFiles(path: String): Seq[String] = {
    val dir = Paths.get(path)
    parquetFiles(dir).map(p => dir.relativize(p).toString).sorted
  }

  /** Delete data files a table's MANIFEST does not reference — the
    * Delta `VACUUM` / Iceberg `remove_orphan_files` maintenance action.
    * Orphans are what failed or uncommitted writes strand in a table
    * directory; a path-listing reader (plain `spark.read.parquet(dir)`)
    * then silently DOUBLE-COUNTS rows the transaction log never
    * committed — vacuuming restores listing ≡ manifest, which is the
    * committed table content. `manifest` entries are paths relative to
    * `path`. Files IN the manifest are never touched (deleting a
    * referenced file corrupts the table — this direction is checked
    * first); files missing from disk that the manifest references fail
    * loudly rather than vacuum a half-lost table.
    */
  def vacuumOrphans(
      path: String,
      manifest: Seq[String]): VacuumStats = {
    val dir = Paths.get(path)
    val listed = parquetFiles(dir)
    val byRel = listed.map(p => dir.relativize(p).toString -> p).toMap
    val missing = manifest.filterNot(byRel.contains)
    require(missing.isEmpty,
      s"manifest references files absent on disk: ${missing.take(3).mkString(", ")}")
    val keep = manifest.toSet
    val orphans = byRel.filterNot { case (rel, _) => keep(rel) }
    orphans.values.foreach(Files.delete)
    VacuumStats(manifest.size, listed.size, orphans.size)
  }
}
