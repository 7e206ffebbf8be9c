package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL
  * over the same parquet tables. Queries without an oracle get the
  * driver's weaker rows-only check and are covered by ScalaTest instead.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Catalog {
  /** Everything the engine exposes, keyed by name. */
  def all: Seq[Q] =
    Relational.queries ++ Advanced.queries ++ CdcBatch.queries ++
      CdcApply.queries ++ Dedup.queries ++
      VectorSearch.queries ++ Pipeline.queries ++ TextAnalysis.queries ++
      Quality.queries ++ graft.multimodal.Multimodal.queries
}
