package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One checkable operator demonstration: a Spark implementation plus the
  * DuckDB oracle SQL that must hash-match it on the same parquet tables.
  *
  * Conventions that make cross-engine hash-equality hold:
  *  - every query ends in ORDER BY a full deterministic key;
  *  - aggregates over doubles are cast to DECIMAL *before* SUM (decimal
  *    addition is exact, so shuffle/merge order can't change the result);
  *  - column names are aliased identically on both sides;
  *  - regexp_replace in DuckDB gets the 'g' flag (Spark replaces all
  *    occurrences by default, DuckDB only the first).
  */
final case class Q(name: String,
                   run: (SparkSession, String) => DataFrame,
                   oracle: Option[String],
                   /** Fixture construction hoisted OUT of the timed
                     * body — Bench runs it before starting the clock
                     * (round-2 verdict: cdc07 charged its WAL fixture
                     * write to the query). */
                   prepare: Option[(SparkSession, String) => Unit] = None,
                   /** Post-materialization hook — e.g. unpersist a
                     * cache the query pinned (round-2 verdict: llm09
                     * leaked its shingle cache across the session). */
                   cleanup: Option[SparkSession => Unit] = None)

object Queries {
  def all: Seq[Q] = QueriesRelational.all ++ QueriesCdc.all ++ QueriesLlm.all

  def byName: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
