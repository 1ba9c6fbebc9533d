package graft.queries

/** Single assembly point for every declared engine capability. SparkEntry
  * exposes this to the driver; Bench picks the headline subset. */
object Registry {
  def all: Seq[QueryDef] =
    RelationalQueries.all ++ WindowQueries.all ++ PipelineQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ AnalyticsQueries.all

  def byName: Map[String, QueryDef] =
    all.map(q => q.name -> q).toMap
}
