package graft.graph

import graft.core.CheckpointBay.Checkpointable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation — the community-structure leg of the
  * graph family (rank = [[PageRank]], cohesion = [[Triangles]],
  * structure = this): nodes repeatedly adopt their neighborhood's most
  * frequent label, which floods dense regions with one label and
  * leaves sparse cuts as community boundaries — the standard cheap
  * community detector for web/link-graph curation (deduplicating
  * mirror clusters, spotting link farms).
  *
  * Every update rule is DETERMINISTIC so the run is SQL-replayable:
  * synchronous rounds (all nodes update from the round-(i−1) labels),
  * neighbor-majority with ties broken to the SMALLEST label, a fixed
  * round count (no data-dependent convergence test), and min-id
  * initial labels. Sync LPA can oscillate on bipartite structures —
  * the fixed-round contract sidesteps the nondeterminism a
  * convergence test would introduce.
  *
  * Scale shape: each round is one edges⋈labels equi-join, one
  * (node, label) count aggregate, and one per-node argmax — spelled as
  * `max(struct(c, −label))`, a PARTIAL-AGGREGATABLE two-level
  * aggregation rather than a rank window, so the majority vote
  * map-side combines. No driver state; each round eagerly
  * `localCheckpoint`s — measured FASTER than running the fixed-round
  * chain as one deep DAG (6.7 s vs 12.6 s at sf0.1): the checkpoint
  * gives every round a materialized input instead of a 12-stage plan
  * AQE must re-plan wholesale, the same trade [[PageRank]] makes. */
object Communities {

  val LpaRounds = 4

  /** (part, community, csize) after [[LpaRounds]] synchronous rounds
    * over canonical `(a, b)` edges. */
  def labelPropagation(edges: DataFrame,
      rounds: Int = LpaRounds): DataFrame =
    labelPropagationUnd(
      graft.core.CacheBay.register(Triangles.undirected(edges)), rounds)

  /** [[labelPropagation]] over an ALREADY-EXPANDED (and caller-
    * persisted) undirected edge frame `(u, v)` — the registry passes
    * [[Triangles.sharedUndirectedEdges]] so the expansion is built
    * once per sweep, not once per graph query. */
  def labelPropagationUnd(e: DataFrame,
      rounds: Int = LpaRounds): DataFrame = {
    var labels = e.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    var i = 0
    while (i < rounds) {
      // max(struct(c, -label)) = the (count desc, label asc) winner:
      // struct comparison is lexicographic, so the vote combines
      // map-side instead of sorting per node in a window
      labels = e
        .join(labels.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).cast("long").as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("node"), (-col("m.nl")).as("label"))
        .trackedCheckpoint()
      i += 1
    }
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("csize"))
    labels.join(sizes, Seq("label"))
      .select(col("node").as("part"), col("label").as("community"),
        col("csize"))
  }
}
