import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileQ12 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    // warmup
    graft.ext.TextOps.dedupMinhashLsh(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    val sh = t("shingles distinct")(graft.ext.TextOps.shingles(spark, sf).cache())
    t("shingles count")(println("  n=" + sh.count()))
    t("distinct shingle strings")(println("  uniq=" + sh.select("s").distinct().count()))
    val sigCols = (0 until 12).map(i => min(md5(concat_ws("", col("s"), lit("#"), lit(i)))).as(s"mh$i"))
    val sigs = t("signatures agg")(sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*).cache())
    t("sigs count")(sigs.count())
    val bandCols = (0 until 4).map(b => s"$b, concat_ws('|', mh${3*b}, mh${3*b+1}, mh${3*b+2})").mkString(", ")
    val bands = sigs.select(col("doc_id"), expr(s"stack(4, $bandCols)").as(Seq("band","bk"))).cache()
    t("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band")===col("b.band") && col("a.bk")===col("b.bk") && col("a.doc_id")<col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct().cache()
    t("candidates")(println("  cand=" + cand.count()))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val res = t("verify join")(cand
      .join(sh.as("sa"), col("doc_a")===col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b")===col("sb.doc_id") && col("sa.s")===col("sb.s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(counts.as("ca"), col("doc_a")===col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b")===col("cb.doc_id"))
      .filter(col("inter")/(col("ca.n")+col("cb.n")-col("inter")) >= 0.5).count())
    println("  verified=" + res)
    spark.stop()
  }
}
