package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{AdvAnn, AdvCorpus, Ann, Cdc, Composite, Corpus, CorpusAnalytics, Dedup, Graph, MultiDim, Multimodal, PartSupp, Profile, QualityFilters, Relational, Retrieval, Sketch, StarJoin, Temporal, TextAnalysis, TrainPrep, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes every implemented operator from SURVEY.md §2 (plus
  * the LLM-data-pipeline extensions) as a named query over the testdata
  * parquet tables; `oracleSql` carries the DuckDB-equivalent SQL for
  * the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship: the reference's full analytical shape (SURVEY.md §3.2)
    * replayed over the synthetic star schema — dimension-enriched panel
    * (entity = nation x returnflag, time = epoch-day bucket), per-panel
    * lag deltas (W1), and within-cohort ranks (W3). One broadcast join,
    * one agg shuffle, two window shuffles — same stage shape the ASPEP
    * pipeline needs (SURVEY.md §4.4).
    */
  def entry(spark: SparkSession): DataFrame =
    Composite.panelPipeline(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Ann.queries ++ Multimodal.queries ++ Composite.queries ++ Corpus.queries ++
      Temporal.queries ++ MultiDim.queries ++ QualityFilters.queries ++
      TrainPrep.queries ++ Sketch.queries ++ Graph.queries ++ Cdc.queries ++
      StarJoin.queries ++ Profile.queries ++ CorpusAnalytics.queries ++ VectorOps.queries ++
      PartSupp.queries ++ AdvCorpus.queries ++ Retrieval.queries ++ AdvAnn.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalysis.oracleSql ++ Dedup.oracleSql ++
      Ann.oracleSql ++ Multimodal.oracleSql ++ Composite.oracleSql ++ Corpus.oracleSql ++
      Temporal.oracleSql ++ MultiDim.oracleSql ++ QualityFilters.oracleSql ++
      TrainPrep.oracleSql ++ Sketch.oracleSql ++ Graph.oracleSql ++ Cdc.oracleSql ++
      StarJoin.oracleSql ++ Profile.oracleSql ++ CorpusAnalytics.oracleSql ++ VectorOps.oracleSql ++
      PartSupp.oracleSql ++ AdvCorpus.oracleSql ++ Retrieval.oracleSql ++ AdvAnn.oracleSql
}
