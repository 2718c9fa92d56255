package graft.oracle

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark DataFrame program plus (where SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. Column
  * names/aliases MUST match between the two — the driver's compare sorts
  * columns by name before hashing values. */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  lazy val all: Seq[QueryDef] =
    CoreQueries.defs ++ OlapQueries.defs ++ graft.ext.TextOps.defs ++ graft.ext.CurationOps.defs ++ graft.ext.ScrubOps.defs ++ graft.ext.KMeans.defs ++ graft.ext.Pq.defs ++ graft.ext.SemDeDup.defs ++ graft.ext.ClusterSample.defs ++ graft.ext.OutlierPrune.defs ++ graft.ext.BowDedup.defs ++ graft.ext.BudgetSelect.defs ++ graft.ext.Novelty.defs ++ graft.ext.HardNeg.defs ++ graft.ext.TopicLabel.defs ++ graft.ext.SubstrScrub.defs ++ graft.ext.DeltaDedup.defs ++ graft.ext.RobustOutlier.defs ++ graft.ext.DomainCap.defs ++ graft.ext.Canonical.defs ++ graft.ext.ThresholdSweep.defs ++ graft.ext.Chunker.defs ++ graft.ext.BpePairs.defs ++ graft.ext.DatasetCard.defs ++ graft.ext.Bm25.defs ++ graft.ext.Pca.defs ++ graft.ext.Dsir.defs ++ graft.ext.Calibrate.defs ++ graft.ext.ContextSweep.defs ++ graft.ext.DedupSweep.defs ++ graft.ext.Dispersion.defs ++ graft.ext.Separation.defs ++ graft.ext.WeightedSample.defs ++ graft.ext.FeatureHash.defs ++ graft.ext.BigramLm.defs ++ graft.ext.Containment.defs ++ graft.ext.PhraseMine.defs ++ graft.ext.NgramDiversity.defs ++ graft.ext.Winsorize.defs ++ graft.ext.KsDrift.defs ++ graft.ext.EvalSpanScrub.defs ++ graft.ext.VocabGrowth.defs ++ graft.ext.QualityDeciles.defs ++ graft.ext.GridCoverage.defs ++ graft.ext.CorrAudit.defs ++ graft.ext.MarginAudit.defs ++ graft.ext.MediaSniff.defs ++ graft.ext.HeaderDims.defs ++ graft.ext.SemanticDecontam.defs ++ graft.ext.ContextFit.defs ++ graft.ext.SourceAffinity.defs ++ graft.ext.ClusterAgreement.defs ++ graft.ext.KeeperQuality.defs ++ graft.ext.JvmHeaderDecode.defs ++ graft.ops.ModalityCoverage.defs ++ graft.ext.EmbedDrift.defs ++ graft.ext.DecileMatrix.defs ++ graft.ext.DupSources.defs ++ graft.ext.Skyline.defs ++ graft.ext.Similarity.defs ++
      graft.ext.Multimodal.defs ++ graft.ops.ScaleOps.defs ++ graft.ops.AsOfJoin.defs ++ graft.ops.RangeJoin.defs ++ graft.ops.SequencePack.defs ++ graft.ops.CorpusPipeline.defs ++ graft.ops.CurationPipeline.defs ++ graft.ops.HeavyHitters.defs ++ graft.ops.Components.defs ++ graft.ops.EpochShuffle.defs ++ graft.ops.Curriculum.defs ++ graft.ops.Funnel.defs ++ graft.ops.Cohort.defs ++ graft.ops.DecayedCount.defs ++ graft.ops.HistQuantiles.defs ++ graft.ops.EventsProfile.defs ++ graft.ops.Transitions.defs ++ graft.ops.VectorPipeline.defs ++ graft.ops.KmvSketch.defs ++ graft.ops.ZOrder.defs ++ graft.ops.Waterfill.defs ++ graft.ops.SnapshotDiff.defs ++ graft.ops.RateAnomaly.defs ++ graft.ops.PropsProfile.defs ++ graft.ops.ShardBalance.defs ++ graft.ext.RollupCard.defs ++ graft.ops.Sessionize.defs ++ graft.ops.SessionPack.defs ++ graft.ops.KAnonymity.defs ++ graft.ops.TemporalLeakage.defs ++ graft.ops.QuotaAudit.defs ++ graft.ops.YieldCensus.defs ++ graft.ops.JoinSize.defs ++ graft.ops.CoEngagement.defs ++ graft.ops.Churn.defs ++ graft.ops.PageRank.defs ++ graft.ops.Triangles.defs ++ graft.ext.FuzzyMatch.defs ++ graft.ext.HybridRrf.defs ++ graft.ops.KCore.defs ++ graft.ops.LinkPredict.defs ++ graft.ops.Harmonic.defs ++ graft.ops.Lpa.defs ++ graft.ops.Backbone.defs ++ graft.ops.Modularity.defs ++ graft.ops.BackboneDrift.defs ++ graft.ops.WalkPairs.defs ++ graft.ops.CensusDelta.defs ++ graft.ops.WalkPmi.defs ++ graft.ops.SpectralEmbed.defs
  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
