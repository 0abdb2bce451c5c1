// Profiling scratch (r16) — NOT part of the engine. Times the phases of
// graph_ktruss_peel in isolation to localize its 32-core anti-scaling.
// Run:  cp tools/ProfPhases.scala src/main/scala/graft/ProfPhases.scala
//       SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProfPhases"
// then delete the copy. Kept under tools/ so the main build stays clean.
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProfPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val s = spark
    for (round <- 1 to 2) {
      println(s"== pass $round ==")
      val io = Tables.load(s, sfDir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      val e0 = t("e0 build+checkpoint") {
        val d = io.alias("x")
          .join(io.alias("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b"))
          .distinct()
          .localCheckpoint()
        println(s"  |E| = ${d.count()}")
        d
      }
      graft.functions.SketchFunctions.register(s)
      def support(ed: DataFrame): DataFrame = {
        val adj = ed.select($"a".as("n"), $"b".as("m"))
          .union(ed.select($"b".as("n"), $"a".as("m")))
          .groupBy($"n").agg(sort_array(collect_list($"m")).as("nbrs"))
        ed.join(adj.select($"n".as("a"), $"nbrs".as("na")).hint("shuffle_hash"), "a")
          .join(adj.select($"n".as("b"), $"nbrs".as("nb")).hint("shuffle_hash"), "b")
          .select($"a", $"b",
            graft.functions.SketchFunctions
              .sortedIntersectCount($"na", $"nb").as("sup"))
      }
      val sup0 = t("sup0 pass+checkpoint") { support(e0).localCheckpoint() }
      val sup1 = t("sup1 pass+checkpoint") {
        support(sup0.filter($"sup" >= 12L).select($"a", $"b")).localCheckpoint()
      }
      val sup2 = t("sup2 pass+checkpoint") {
        support(sup1.filter($"sup" >= 12L).select($"a", $"b")).localCheckpoint()
      }
      t("stats union + noop") {
        def stats(sup: DataFrame, r: Long): DataFrame =
          sup.agg(count(lit(1)).as("n_edges"),
            min($"sup").as("min_support"), max($"sup").as("max_support"))
            .select(lit(r).as("round"), $"n_edges", $"min_support", $"max_support")
        stats(sup0, 0L).unionByName(stats(sup1, 1L)).unionByName(stats(sup2, 2L))
          .orderBy($"round")
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
