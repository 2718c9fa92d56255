package graft

import org.apache.spark.sql.SaveMode

/** Empty-input totality: every registered query must return an empty (or
  * degenerate-but-valid) result on empty tables, never throw. At scale an
  * empty slice is routine — a date partition with no data, a filter that
  * matches nothing, a cold-start topic — and an operator that NPEs or
  * div-by-zeros on it takes the whole job down. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      graft.oracle.Tables.table(spark, sf0001, t).limit(0)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query is total on empty tables") {
    val failures = graft.oracle.Registry.all.flatMap { q =>
      try { q.run(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries not total on empty input:\n${failures.mkString("\n")}")
  }
}
