package graft

import graft.ops.Curriculum
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {

  private def mkDocs = {
    import spark.implicits._
    // rare words raise surprisal: doc difficulty rises with id here
    (1L to 12L).map { i =>
      val common = Seq.fill(12 - i.toInt max 1)("common").mkString(" ")
      val rare = (1 to i.toInt).map(j => s"rare_${i}_$j").mkString(" ")
      (i, s"$common $rare")
    }.toDF("doc_id", "text")
  }

  test("q79: each shard is internally easy->hard with contiguous 1-based positions") {
    val out = Curriculum.curriculumShardsOf(mkDocs, numShards = 3).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.length == 12)
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val byPos = rows.sortBy(_._2)
      assert(byPos.map(_._2).toSeq == (1 to rows.length).toSeq,
        s"shard $shard positions not contiguous: ${byPos.toSeq}")
      assert(byPos.map(_._3).toSeq == byPos.map(_._3).sorted.toSeq,
        s"shard $shard not easy->hard: ${byPos.toSeq}")
    }
  }

  test("q79: re-keying the epoch re-deals shards, difficulty order invariant holds in both") {
    val e1 = Curriculum.curriculumShardsOf(mkDocs, numShards = 3, epoch = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val e2 = Curriculum.curriculumShardsOf(mkDocs, numShards = 3, epoch = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(e1 != e2, "epochs must decorrelate shard assignment")
    // determinism: same epoch -> same deal
    val e1b = Curriculum.curriculumShardsOf(mkDocs, numShards = 3, epoch = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(e1 == e1b, "same epoch must re-deal identically")
  }

  test("q79 plan: shard-local sort only — one hash exchange on shard, no global range sort") {
    val df = Curriculum.q79(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(shard"),
      s"window must partition by shard:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"a global sort crept in (curriculum only needs per-reader order):\n$p")
  }
}
