package graft.dedup

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Large-star / small-star connected components (Kiveris et al. 2014,
  * "Connected Components in MapReduce and Beyond") — the alternative to
  * [[Dedup.connectedComponents]]' min-label propagation whose round count
  * is O(log n) in the NODE COUNT rather than O(diameter). On the bounded
  * near-dup graphs the engine's dedup tier produces, the two give identical
  * answers (the spec proves it); the reason this operator exists is the
  * 100 TB failure mode of label propagation: a duplicate CHAIN (a template
  * evolving over crawl snapshots) has diameter proportional to its length,
  * and propagation pays one full edge-shuffle per diameter step. Star
  * contraction pays per round too — but needs exponentially fewer rounds on
  * exactly those graphs.
  *
  * Both phases are single self-contained shuffle rounds over the edge list:
  *
  *   large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
  *   small-star(u): over (hi → lo) edges: S = smaller neighbors of u,
  *                  m = min(S); emit (v, m) for v ∈ (S ∪ {u}) \ {m}
  *
  * Edges stay canonical (hi > lo) by construction — large-star's m ≤ u < v
  * and small-star's m < v — and every step is min/groupBy arithmetic over
  * BIGINT ids: fully deterministic, so the final labels (component minima,
  * the same answer `componentOracleCtes` computes by transitive closure)
  * are hash-checkable. Convergence = edge-set fixpoint: both frames are
  * distinct sets, so `next == edges` ⟺ equal counts plus an empty
  * `next ∖ edges` (one anti-join probe per round; the iteration cap throws
  * rather than returning a wrong answer, the
  * [[Dedup.connectedComponents]] contract).
  */
object StarComponents {

  /** Run star contraction on a (doc_a, doc_b) pair frame; returns
    * (id, label) for every node that appears in an edge, label = the
    * component's minimum id.
    *
    * Small-graph fast path (the [[Dedup.connectedComponents]] measured
    * gate, same threshold, same bounded-collect budget): below
    * `smallGraphThreshold` edges the rounds' fixed cost (plan + codegen +
    * checkpoint + fixpoint probe per round, ~0.4 s each) dwarfs the work,
    * so the labels come from driver-side union-find. Larger graphs take
    * the distributed star-contraction loop unchanged — both paths produce
    * identical min-id labels (StarComponentsSpec differentials the FORCED
    * distributed path against union-find and against label propagation).
    */
  def starComponents(pairs: DataFrame, maxIters: Int = 25,
      smallGraphThreshold: Long = 100000L): DataFrame = {
    if (pairs.count() <= smallGraphThreshold)
      // self-loops filtered to mirror the distributed loop exactly: it
      // drops (u,u) edges up front, so a node with ONLY self-edges gets no
      // label from either path
      return Dedup.smallGraphLabels(
        pairs.filter(col("doc_a") =!= col("doc_b")))
    // Every round references the previous edge frame ~a dozen times (both
    // phases read it through unions and joins), so carrying lineage across
    // rounds would grow the LOGICAL plan exponentially even with the data
    // cached — the analyzer still walks the whole tree. localCheckpoint
    // (eager) materializes each round AND truncates the plan to the stored
    // blocks; on a cluster the reliable-checkpoint variant is the same one
    // line. (Label propagation gets away with plain persist because its
    // round references the frame only twice.)
    var edges = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct().localCheckpoint()
    var edgeCnt = edges.count()
    var iter = 0
    var changed = true
    while (changed && iter < maxIters) {
      // LARGE-STAR: gather Γ(u) over both directions, attach strictly
      // larger neighbors to the neighborhood minimum
      val nbrs = edges.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = nbrs.filter(col("v") > col("u"))
        .join(mins, Seq("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // SMALL-STAR: at each hi, link the smaller neighborhood (and hi
      // itself) to its minimum
      val ssMin = ls.groupBy(col("hi").as("u")).agg(min(col("lo")).as("m"))
      val ssLeaves = ls.join(ssMin, ls("hi") === ssMin("u"))
        .select(ls("lo").as("hi"), ssMin("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
      val ssCenters = ssMin.select(col("u").as("hi"), col("m").as("lo"))
      val next = ssLeaves.unionAll(ssCenters).distinct().localCheckpoint()
      // fixpoint check on DISTINCT sets: next == edges ⟺ |next| == |edges|
      // and next ∖ edges = ∅ (equal-cardinality containment of finite
      // sets). One anti-join count + one metadata-cheap count of the
      // checkpointed frame, replacing the two-sided exceptAll — which ran
      // TWO jobs per round, each hash-exchanging both full edge frames
      // (guide §2.4: remove shuffles outright; measured 2 jobs × 2
      // exchanges → 1 job × 1 broadcast per round).
      val nextCnt = next.count()
      changed = nextCnt != edgeCnt ||
        next.join(edges, Seq("hi", "lo"), "left_anti").limit(1).count() > 0
      edges.unpersist()
      edges = next
      edgeCnt = nextCnt
      iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"starComponents did not converge within $maxIters rounds — " +
          "raise maxIters")
    // fixpoint edges form stars (child, root); fold both roles into labels
    edges.select(col("hi").as("id"), col("lo").as("lbl"))
      .unionAll(edges.select(col("lo").as("id"), col("lo").as("lbl")))
      .groupBy("id").agg(min(col("lbl")).as("label"))
  }

  /** The dedup-cluster readout computed by star contraction — same pair
    * graph, same oracle, same answer as `q_dedup_clusters`, different (and
    * at 100 TB, safer) distributed algorithm.
    */
  object CcStars extends GraftQuery {
    val name = "q_cc_stars"
    val MinEstJaccard = 0.5
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val pairs = Dedup.minhashCandidatePairs(
        Graft.table(spark, sfDir, "documents"), MinEstJaccard)
        .persist(StorageLevel.MEMORY_AND_DISK)
      starComponents(pairs)
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .orderBy("cluster_id")
    }
    val oracle = Some(
      s"""WITH RECURSIVE ${Dedup.minhashPairOracleCtes("documents")},
         |${Dedup.componentOracleCtes(MinEstJaccard)}
         |SELECT label AS cluster_id, count(*) AS cluster_size
         |FROM labels GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(CcStars)
}
