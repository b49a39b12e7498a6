package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation (SURVEY §2c).
  *
  * PageRank here is the INTEGER-EXACT formulation: ranks are "random
  * surfer units" (longs), an iteration ships
  * floor(floor(rank·85/100)/outdeg) along every edge and tops up a
  * constant floor(S·15/100) teleport. Double-precision PageRank
  * cannot be certified cross-engine (sum associativity drifts);
  * integer floors are deterministic everywhere, and the fixed
  * iteration count keeps the whole recurrence ONE declarative plan —
  * no convergence action, nothing through the driver.
  */
object Graphs {

  val Hosts = 97L
  val StartUnits = 1000000000000L
  val Teleport: Long = StartUnits * 15L / 100L

  /** Deterministic host link graph off the doc_id column (the T24
    * synthesis convention — both engines derive the identical graph):
    * two out-links per doc, self-loops bumped to the next host so
    * every appearing src keeps out-degree ≥ 1. */
  def hostEdges(docs: DataFrame): DataFrame =
    docs
      .select((col("doc_id") % Hosts).as("src"),
        ((col("doc_id") * 31L + 7L) % Hosts).as("d1"),
        ((col("doc_id") * 17L + 3L) % Hosts).as("d2"))
      .select(col("src"), explode(array(col("d1"), col("d2"))).as("dst"))
      .withColumn("dst", when(col("dst") === col("src"),
        (col("dst") + 1L) % Hosts).otherwise(col("dst")))
      .distinct()

  /** Fixed-iteration integer PageRank over an (src, dst) edge table:
    * the rank vector is a TABLE keyed by host, the edge list a table
    * keyed by src — one src-keyed join + one dst-keyed aggregate per
    * iteration. The GRAPH (edges, out-degrees, hosts) materializes
    * ONCE up front (localCheckpoint — the d20/e5 iterative-operator
    * convention): without it Catalyst re-derives the edge table from
    * the source scan inside EVERY iteration's subplan (measured: a
    * 281-node plan with five redundant scan+distinct chains), which
    * at 10^9 hosts means five corpus re-derivations. The five-
    * iteration rank RECURRENCE itself stays one lazy unrolled plan
    * over the materialized graph — no convergence action, nothing
    * data-sized through the driver. Hosts without in-edges settle at
    * the teleport floor; dangling hosts cannot exist by [[hostEdges]]
    * construction — a caller supplying its own edges owns that
    * invariant or accepts dropped mass. */
  def pagerank(edges0: DataFrame, iterations: Int = 5): DataFrame = {
    val edges = edges0.localCheckpoint()
    val outd = edges.groupBy("src").agg(count(lit(1)).as("outd"))
      .localCheckpoint()
    val hosts = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct()
      .localCheckpoint()
    var r = hosts.select(col("host"), lit(StartUnits).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(r.withColumnRenamed("host", "src"), Seq("src"))
        .join(outd, Seq("src"))
        .select(col("dst"), expr("((rank * 85) DIV 100) DIV outd").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inmass"))
      r = hosts
        .join(contrib.withColumnRenamed("dst", "host"), Seq("host"), "left")
        .select(col("host"),
          (lit(Teleport) + coalesce(col("inmass"), lit(0L))).as("rank"))
    }
    r
  }
}
