package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Link-graph operators for crawl curation (beyond-reference surface).
  *
  * A web-scale training corpus carries an implicit hyperlink graph, and
  * link authority is a classic curation signal: pages nobody links to are
  * disproportionately spam/boilerplate, and domain-level PageRank is a
  * standard quality prior for crawl sampling (the Common-Crawl era
  * pipelines rank hosts this way before content filters ever run).
  */
object Graph {

  /** Deterministic integer fixed-point PageRank (power iteration).
    *
    * Semantics — every quantity is integral, so the result is defined
    * exactly and is independent of partitioning and merge order:
    * {{{
    *   rank_0(v)     = 1_000_000                                (micro-units)
    *   share_t(u)    = floor(rank_t(u) * dampMicro / (1_000_000 * outdeg(u)))
    *   rank_{t+1}(v) = (1_000_000 - dampMicro) + Σ_{u→v} share_t(u)
    * }}}
    * Dangling mass evaporates (no redistribution) — the usual batch
    * simplification; floor-shares already make total mass non-conserved,
    * and the contract that matters here is exact replayability: double
    * PageRank is summation-order flaky by construction, integer sums are
    * associative, so a SQL engine can replay every iteration bit-for-bit
    * (the driver oracle unrolls the k iterations as chained CTEs).
    *
    * Numeric headroom: the share numerator `rank * dampMicro` is computed
    * in DECIMAL(38,0) — at web scale a hub's rank can approach the total
    * mass n×10⁶, and n beyond ~10⁷ would overflow the int64 product (the
    * oracle's HUGEINT twin has the same headroom). The floor division is
    * the exact `(a - pmod(a, b)) / b` form, never a rounded decimal
    * divide (Spark decimal division HALF_UP-rounds at the result scale,
    * which can cross an integer boundary; the pmod form divides exactly).
    *
    * Scale design: `edges ⋈ outdeg` is materialized ONCE, partitioned by
    * source; each round is one equi-join (the per-node rank frame — the
    * SMALL side — shuffles to the edges' layout) plus one map-side-
    * combined sum on the destination: the canonical distributed power
    * iteration, cost k × (|E| scan + |V| shuffle). Loop hygiene follows
    * [[Dedup.clusterPairs]]: fixed iteration count (no convergence
    * action), localCheckpoint every 3 rounds bounds lineage, superseded
    * frames unpersist, and the returned frame is self-contained.
    *
    * Returns (node BIGINT, rank_micro BIGINT).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampMicro: Long = 850000L,
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"pageRank iterations must be in [1, 50], got $iterations")
    require(dampMicro > 0L && dampMicro < 1000000L,
      s"dampMicro must be in (0, 1e6), got $dampMicro")
    val e = edges.select(col(srcCol).cast("long").as("__src__"),
        col(dstCol).cast("long").as("__dst__"))
      .where(col("__src__").isNotNull && col("__dst__").isNotNull)
    val deg = e.groupBy(col("__src__")).agg(count(lit(1)).as("__d__"))
    val ed = e.join(deg, "__src__")
      .repartition(col("__src__"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("__src__").as("__id__"))
      .union(e.select(col("__dst__").as("__id__")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = 1000000L - dampMicro

    // exact positive floor division: numerator made divisible first, so
    // the decimal divide is integral (no result-scale rounding)
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val dec = DecimalType(38, 0)

    var rank = nodes.withColumn("__r__", lit(1000000L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (i <- 1 to iterations) {
      val share = idiv(
        col("__r__").cast(dec) * lit(dampMicro),
        (lit(1000000L) * col("__d__")).cast(dec))
      val contrib = ed.join(rank, ed("__src__") === rank("__id__"))
        .select(col("__dst__").as("__id__"), share.as("__s__"))
        .groupBy(col("__id__"))
        .agg(sum(col("__s__")).as("__c__"))
      val next = nodes.join(contrib, Seq("__id__"), "left")
        .select(col("__id__"),
          (lit(base) + coalesce(col("__c__"), lit(0L))).as("__r__"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val prev = rank
      rank = if (i < iterations && i % 3 == 0) {
        val cp = next.localCheckpoint(true)
        next.unpersist(blocking = false)
        cp
      } else next
      prev.unpersist(blocking = false)
    }
    val out = rank
      .select(col("__id__").as("node"), col("__r__").as("rank_micro"))
      .localCheckpoint(true)
    rank.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ed.unpersist(blocking = false)
    out
  }
}
