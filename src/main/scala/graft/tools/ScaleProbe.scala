package graft.tools

import graft.oracle.{Registry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth probe (round-8 verdict Next #3): the 2× bench gate runs at
  * sf0.1, so the 100 TB claims otherwise rest on plan shapes alone. This
  * harness synthesizes ~3× and ~10× sf0.1 corpora (self-union with
  * hash-perturbed keys/content — copy i shifts doc_id/vec_id by i·10⁹,
  * appends a per-copy token to text, and adds a per-copy epsilon to
  * embeddings, so exact-dup collapse can't fake sub-linear growth while
  * near-dup structure inside each copy survives), then times the most
  * expensive registered queries at 1×/3×/10× and asserts runtime growth
  * stays ≤ ~1.5× data growth. A hidden quadratic (pair expansion without a
  * cap) or a census that silently became corpus-sized (a "bounded"
  * collect whose bound tracks n) shows up here as g10 ≫ 15 — the exact
  * failure class PlanSpec's shape pins cannot see.
  *
  *   SPARK_GRAFT_PROBE_REPS=2 sbt "runMain graft.tools.ScaleProbe"
  *
  * Emits one JSON line per query — {"query","t1","t3","t10","g3","g10",
  * "exp"} with exp = log(t10/t1)/log 10 (1.0 = perfectly linear) — and a
  * closing summary with any violations (g3 > 4.5 or g10 > 15). Exit 1 on
  * violation so the probe can gate.
  *
  * The 10-copy corpus makes every document a member of a ~10-doc
  * near-duplicate cluster — ALSO a stress test of the banded-LSH caps and
  * the CC label-propagation depth at realistic duplication rates.
  */
object ScaleProbe {

  /** Most expensive registered queries by recorded floor (Floors.sf01) —
    * all documents/embeddings-bound, the two tables the probe scales. */
  val TopQueries: Seq[String] = Seq(
    "q52_curation_dag", "q61_vector_curation", "q99_ivfpq_search",
    "q98_pq_codebook", "q76_dsir_resample", "q62_cluster_topics",
    "q117_cluster_histogram", "q38_dedup_clusters", "q80_dedup_sweep",
    "q85_bigram_surprisal")

  private val Scales = Seq(1, 3, 10)

  /** documents self-union: copy i shifts doc_id and appends ` probe<i>`
    * so copies are near- but not exact-duplicates. */
  private def scaleDocs(base: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
        (if (i == 0) col("text") else concat(col("text"), lit(s" probe$i"))).as("text"),
        col("lang"), col("source"),
        (if (i == 0) col("n_chars") else col("n_chars") + lit(6 + i.toString.length)).as("n_chars"))
    }.reduce(_ unionByName _)

  /** embeddings self-union: copy i shifts vec_id and nudges every
    * component by i·0.001 (cluster structure survives; exact-vector
    * dedup cannot collapse the copies). */
  private def scaleEmbeds(base: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      base.select(
        (col("vec_id") + lit(i.toLong * 1000000000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else expr(s"transform(embedding, v -> CAST(v + ${i * 0.001} AS FLOAT))")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

  /** Build the probe dir for one scale: scaled documents/embeddings
    * written as parquet, every other fixture table symlinked at 1×.
    * A `_COMPLETE` sentinel (recording the source dir) is written LAST:
    * a dir without it is a partial build (crash mid-write), and one whose
    * sentinel names a different srcDir was scaled from other data —
    * either would silently corrupt the growth ratios if reused, so both
    * are torn down and rebuilt. */
  private def buildDir(spark: SparkSession, srcDir: String, root: String, k: Int): String = {
    val dir = s"$root/x$k"
    val p = java.nio.file.Paths.get(dir)
    val sentinel = p.resolve("_COMPLETE")
    if (java.nio.file.Files.exists(sentinel) &&
        new String(java.nio.file.Files.readAllBytes(sentinel), "UTF-8") == srcDir)
      return dir // verified complete build from the same source — reuse
    if (java.nio.file.Files.exists(p)) {
      System.err.println(s"[probe] $dir incomplete or from a different source — rebuilding")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    java.nio.file.Files.createDirectories(p)
    val scaledTables = Set("documents", "embeddings")
    graft.oracle.Views.TableNames.filterNot(scaledTables).foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        p.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"))
    }
    scaleDocs(Tables.table(spark, srcDir, "documents"), k)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    scaleEmbeds(Tables.table(spark, srcDir, "embeddings"), k)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    java.nio.file.Files.write(sentinel, srcDir.getBytes("UTF-8"))
    dir
  }

  private def timeCold(spark: SparkSession, name: String, dir: String, reps: Int): Double = {
    val fn = Registry.byName(name).run
    var best = Double.MaxValue
    (0 until reps).foreach { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      Tables.releasePersisted()
      spark.catalog.clearCache()
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    val root = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/graft_scale_probe")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs = Scales.map(k => k -> buildDir(spark, srcDir, root, k)).toMap
    Scales.foreach { k =>
      val n = spark.read.parquet(s"${dirs(k)}/documents.parquet").count()
      System.err.println(s"[probe] x$k: $n documents")
    }

    // warmup at the smallest fixture so JIT cost doesn't land on x1
    TopQueries.foreach { q =>
      try Registry.byName(q).run(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    Tables.releasePersisted(); spark.catalog.clearCache()

    val results = TopQueries.map { q =>
      val ts = Scales.map(k => k -> timeCold(spark, q, dirs(k), reps)).toMap
      val g3 = ts(3) / ts(1)
      val g10 = ts(10) / ts(1)
      val exp = math.log(g10) / math.log(10.0)
      println(f"""{"query":"$q","t1":${ts(1)}%.3f,"t3":${ts(3)}%.3f,"t10":${ts(10)}%.3f,"g3":$g3%.2f,"g10":$g10%.2f,"exp":$exp%.2f}""")
      (q, g3, g10, exp)
    }
    val violations = results.filter { case (_, g3, g10, _) => g3 > 4.5 || g10 > 15.0 }
    val worst = results.maxBy(_._4)
    println(f"""{"metric":"scale_probe","queries":${results.size},"violations":${violations.size},"worst_exp":["${worst._1}",${worst._4}%.2f]}""")
    violations.foreach { case (q, g3, g10, e) =>
      System.err.println(f"[probe] VIOLATION $q: g3=$g3%.2f g10=$g10%.2f exp=$e%.2f")
    }
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
