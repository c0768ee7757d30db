package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.operators.{Graph, Materialize}

/** Link-graph domain authority — the crawl-quality prior CCNet /
  * RefinedWeb-style pipelines weight sources by: domains that the rest
  * of the web links into heavily are kept at looser quality
  * thresholds, link-farm islands fall out. Composes the HTML outlink
  * primitive ([[Html.extractLinks]]) with the integer random-walk
  * mass engine ([[graft.operators.Graph.massPropagate]]) at DOMAIN
  * grain.
  *
  * Reference scope: the reference engine ships no corpus analytics;
  * this is the web-curation surface next to robots filtering (llm103)
  * and URL quotas (llm76).
  *
  * Scale shape (100 TB of crawl): pages reduce to (src domain, dst
  * domain) edge rows AT THE SCAN (link extraction is string algebra in
  * the projection; page HTML never crosses an exchange) — the graph
  * that leaves the scan is domain-grain, millions of nodes where the
  * corpus has billions of pages. Node ids are the 8-byte portable hash
  * of the domain, so every superstep join/aggregate keys on longs; the
  * (id, domain) dictionary — distinct domains only — joins the labels
  * back at output. Mass propagation is q24's superstep protocol: one
  * edge join + one aggregate per round over persisted blocks, bounded
  * rounds, truncating integer division for cross-engine determinism.
  * Parallel edge rows ARE the weighting: a domain linked 3× from one
  * page receives 3 shares — no separate weight column needed.
  */
object LinkGraph {

  /** Rank domains by in-link mass.
    *
    * @param pages    one row per page
    * @param domainCol the page's own domain
    * @param linksCol array<struct<href,anchor>> outlinks ([[Html.extractLinks]])
    * @return one row per domain reached by any link:
    *   (domain, n_inlinks, n_anchors, mass) — in-link row count,
    *   distinct anchor texts, and walk mass after `rounds`. */
  def domainAuthority(pages: DataFrame, domainCol: Column, linksCol: Column,
                      rounds: Int = 3, initMass: Long = 1000000L,
                      tracker: Option[Materialize.Tracker] = None): DataFrame = {
    val links = pages
      .select(domainCol.as("src_domain"), explode(linksCol).as("__l"))
      .select(col("src_domain"),
        Html.urlHost(col("__l.href")).as("dst_domain"),
        col("__l.anchor").as("anchor"))
      .where(col("dst_domain").isNotNull && length(col("dst_domain")) > 0)
    val edges = links.select(
      Portable.hash64(col("src_domain")).as("src"),
      Portable.hash64(col("dst_domain")).as("dst"))
    val mass = Graph.massPropagate(edges, col("src"), col("dst"),
      rounds = rounds, initMass = initMass, tracker = tracker)
    val inStats = links.groupBy(col("dst_domain").as("domain"))
      .agg(count(lit(1)).as("n_inlinks"),
        countDistinct(col("anchor")).as("n_anchors"))
    inStats
      .join(mass.withColumnRenamed("id", "__nid"),
        Portable.hash64(col("domain")) === col("__nid"), "left")
      .select(col("domain"), col("n_inlinks"), col("n_anchors"),
        coalesce(col("mass"), lit(0L)).as("mass"))
  }
}
