package graft

import graft.queries._

/** All declared queries. SparkEntry exposes these to the driver's
  * correctness (DuckDB oracle) and bench harnesses. */
object QueryRegistry {
  val all: Seq[Q] =
    RelationalQueries.all ++
    MessageQueries.all ++
    DedupQueries.all ++
    SimilarityQueries.all ++
    TextQueries.all ++
    MultimodalQueries.all ++
    StreamingQueries.all ++
    MiscQueries.all ++
    PipelineQueries.all ++
    AnalyticsQueries.all

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in registry")
    m
  }
}
