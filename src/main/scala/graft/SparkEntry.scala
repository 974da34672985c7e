package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-family registries (one `OpQuery` per
  * operator in SURVEY.md §2's inventory); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible operator.
  */
object SparkEntry {

  /** Every operator the engine exposes, keyed by stable query id. */
  def registry: Seq[OpQuery] =
    graft.operators.Relational.registry ++
      graft.operators.Functions.registry ++
      graft.pipelines.Analog.registry ++
      graft.pipelines.Analog.envelopeRegistry ++
      graft.llm.TextStats.registry ++
      graft.llm.Dedup.registry ++
      graft.llm.Similarity.registry ++
      graft.llm.Multimodal.registry ++
      graft.streaming.Streams.registry ++
      graft.sources.RemoteLookup.registry

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * EP1 — the reference's core order-approval dataflow as one Spark plan.
    */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "ep1_order_approval").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
