package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Q, Relational, Scalars}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All verification queries live in `graft.queries.*` packs; this object is
  * only the registry the driver harness reads. Every Q with an oracle gets a
  * DuckDB-comparable entry; Qs without one get the weaker rows-only check.
  */
object SparkEntry {

  private def packs: Seq[Q] =
    Relational.queries ++ Scalars.queries ++
      graft.queries.Fts.queries ++ graft.queries.Pipeline.queries ++
      graft.queries.Sources.queries ++ graft.queries.Extensibility.queries ++
      graft.queries.Temporal.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * BM25 full-text top-k — the end-to-end slice that exercises scan →
    * tokenize → explode → agg → join → top-k (SURVEY.md §7 step 2). */
  def entry(spark: SparkSession): DataFrame =
    graft.fts.Search.bm25TopK(
      graft.core.Tables(spark, "/root/testdata/sf0.001", "documents"),
      Seq("data", "query"), k = 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
