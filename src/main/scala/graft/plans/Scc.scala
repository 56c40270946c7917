package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Strongly connected components of a DIRECTED graph — the missing
  * member of the graph family (CC/closure/PageRank/label-prop/
  * triangles/k-core are undirected or degree-based). On a KG the
  * directed statement graph's SCCs are the mutually-reachable entity
  * clusters (redirect/duplicate rings, category cycles); on a web/link
  * corpus they are the link farms a crawler-derived training set wants
  * collapsed or dropped.
  *
  * Algorithm: trim + forward-max coloring (the standard distributed
  * SCC formulation — Orzan's coloring / FW-BW family; see also Hong et
  * al., "On fast parallel detection of strongly connected components",
  * which this follows in spirit: no per-node DFS, only joins and
  * partial-aggregable maxes, so every step is a plain shuffled
  * hash-agg/join that scales horizontally):
  *
  *  1. TRIM: a node with no in-edges or no out-edges in the remaining
  *     subgraph cannot lie on a cycle → it is a singleton SCC; assign
  *     and remove, repeat to fixpoint. This disposes of the acyclic
  *     bulk (most of a web graph) in O(longest trimmable chain) cheap
  *     rounds.
  *  2. COLOR: propagate `color(v) = max(v, max over in-edges u→v of
  *     color(u))` to fixpoint — color(v) is then the MAX node id that
  *     reaches v. Each round is one equi-join (edges × colors) + one
  *     partial-aggregable max — the exact shuffle shape of
  *     [[ConnectedComponents]]'s small-star step.
  *  3. HARVEST: for each root r (color(r) == r), the SCC of r is
  *     exactly the color-r nodes that can reach r through color-r
  *     nodes — a backward BFS from the roots restricted to same-color
  *     nodes (one join + one distinct per round). Every harvested SCC
  *     is labeled by its root; since the root is the max id reaching
  *     the SCC and belongs to it, the label equals the SCC's max
  *     member id — giving the SQL-oracle-able contract
  *     `scc_id(u) = max{v : u →* v and v →* u}`.
  *  4. Remove harvested nodes and repeat. Each phase harvests at least
  *     the SCC containing the largest remaining id, so the loop
  *     terminates; with trimming, phases ≈ number of *nontrivial* SCC
  *     "layers", small on real graphs.
  *
  * Determinism: every fixpoint runs to convergence, so the output is
  * independent of round scheduling — exact, not approximate. Lineage
  * is truncated per round (localCheckpoint / checkpoint toggle, same
  * as [[ConnectedComponents]]).
  *
  * Scale: nodes/edges only ever shrink; all joins are equi-joins on
  * node ids; colors and members are (id, long) pairs — 16 bytes/node.
  * No step materializes reachability PAIRS (the O(n²) trap the
  * DuckDB oracle uses is fine at test scale only).
  */
object Scc {

  /** Fresh-leaf materialization (same rationale as [[Closure.materialize]]:
    * repeated self-referential unions need fresh attribute ids). */
  private def mat(df: DataFrame): DataFrame = {
    val chk = df.localCheckpoint()
    chk.sparkSession.createDataFrame(chk.rdd, chk.schema)
  }

  /** Per-phase telemetry: inner-round counts of the three fixpoints
    * plus how many nodes the phase disposed of. Emitted through the
    * `telemetry` callback after every phase — the operational handle
    * for the algorithm's one genuine hazard: coloring is hop-per-round,
    * so rounds grow with the REMAINING subgraph's diameter (a
    * 10^6-hop path cycle = 10^6 color rounds). Watch `colorRounds`;
    * if it climbs, either raise `maxRounds` knowingly or pre-shrink
    * the graph (run [[ConnectedComponents]] first and SCC each weak
    * component separately — SCCs never span weak components, and the
    * per-component diameter is what actually bounds the rounds). */
  final case class PhaseStats(phase: Int, trimRounds: Int, colorRounds: Int,
                              harvestRounds: Int, assignedThisPhase: Long)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private def logStats(s: PhaseStats): Unit =
    log.info(s"Scc phase ${s.phase}: trim=${s.trimRounds} color=${s.colorRounds} " +
      s"harvest=${s.harvestRounds} assigned=${s.assignedThisPhase}")

  /** @param edges two columns (src, dst), one row per directed edge.
    * @param maxPhases cap on trim+color+harvest PHASES (each phase
    *        harvests ≥1 SCC, so this bounds nontrivial SCC "layers").
    * @param maxRounds total budget of INNER fixpoint rounds (trim +
    *        color + harvest, summed across phases) — the guard against
    *        the O(diameter) coloring on a deep remaining subgraph.
    * @param telemetry per-phase stats hook (defaults to log.info).
    * @return (id, scc_id) for every node appearing in `edges`;
    *         scc_id = max member id of the node's SCC. */
  def run(edges: DataFrame, maxPhases: Int = 64, maxRounds: Int = 10000,
          telemetry: PhaseStats => Unit = logStats): DataFrame = {
    require(maxPhases >= 1, s"maxPhases=$maxPhases")
    require(maxRounds >= 1, s"maxRounds=$maxRounds")
    var roundsUsed = 0
    def spendRound(kind: String, phase: Int): Unit = {
      roundsUsed += 1
      if (roundsUsed > maxRounds) throw new IllegalStateException(
        s"Scc exceeded maxRounds=$maxRounds during $kind (phase $phase). " +
          "Coloring is hop-per-round, so round count grows with the remaining " +
          "subgraph's diameter. Either raise maxRounds (the state per round is " +
          "bounded — only wall-clock grows), or pre-partition the graph by weak " +
          "component (ConnectedComponents.run) and SCC each component separately: " +
          "SCCs never span weak components, and per-component diameters are smaller.")
    }
    val spark = edges.sparkSession
    val sch = StructType(Seq(StructField("id", LongType), StructField("scc_id", LongType)))
    var assigned = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sch)

    var e = mat(edges.toDF("src", "dst")
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst")).distinct())
    // self-loop-only nodes are singletons; track every node seen so they
    // (and isolated endpoints of dropped self-loops) still get a row
    val allNodes = mat(edges.toDF("src", "dst")
      .select(col("src").cast("long").as("id"))
      .union(edges.toDF("src", "dst").select(col("dst").cast("long").as("id")))
      .distinct())
    var active = allNodes

    var phase = 0
    while (active.limit(1).count() > 0 && phase < maxPhases) {
      var trimRounds = 0
      var colorRounds = 0
      var harvestRounds = 0
      var assignedThisPhase = 0L
      // ---- 1. TRIM to fixpoint: no-in or no-out ⇒ singleton SCC
      var trimming = true
      while (trimming) {
        spendRound("trim", phase)
        trimRounds += 1
        val srcs = e.select(col("src").as("id")).distinct()
        val dsts = e.select(col("dst").as("id")).distinct()
        val cyclic = mat(srcs.intersect(dsts)) // has both in- and out-edges
        val trimmed = mat(active.join(cyclic, Seq("id"), "left_anti"))
        val nTrim = trimmed.count()
        trimming = nTrim > 0
        if (nTrim > 0) {
          assigned = assigned.union(trimmed.select(col("id"), col("id").as("scc_id")))
          assignedThisPhase += nTrim
          active = cyclic
          e = mat(e
            .join(trimmed.withColumnRenamed("id", "t1"), col("src") === col("t1"), "left_anti")
            .join(trimmed.withColumnRenamed("id", "t2"), col("dst") === col("t2"), "left_anti"))
        }
      }

      if (active.limit(1).count() > 0) {
        // ---- 2. COLOR: forward max propagation to fixpoint. Colors
        // only ever increase, so Σcolor strictly increases until the
        // fixpoint — change detection is a one-row aggregate instead of
        // a next⨝old join (halves the per-round job count; sums of ≤2^31
        // ids fit a long far beyond any realistic node count)
        var color = mat(active.select(col("id"), col("id").as("color")))
        def colorSum(c: DataFrame): Long =
          c.agg(sum(col("color"))).head.getLong(0)
        var prevSum = colorSum(color)
        var changed = true
        while (changed) {
          spendRound("color", phase)
          colorRounds += 1
          val msgs = e.join(color.withColumnRenamed("id", "cs"), col("src") === col("cs"))
            .select(col("dst").as("id"), col("color"))
          val next = mat(color.union(msgs).groupBy("id").agg(max("color").as("color")))
          val s = colorSum(next)
          changed = s != prevSum
          prevSum = s
          color = next
        }

        // ---- 3. HARVEST: backward BFS from roots within each color class
        var members = mat(color.where(col("id") === col("color"))
          .select(col("id"), col("color").as("scc_id")))
        var nMembers = members.count()
        var growing = true
        while (growing) {
          spendRound("harvest", phase)
          harvestRounds += 1
          val grow = e.join(members.withColumnRenamed("id", "w"), col("dst") === col("w"))
            .select(col("src").as("id"), col("scc_id"))
            .join(color.withColumnRenamed("id", "ci"),
              col("id") === col("ci") && col("color") === col("scc_id"), "left_semi")
          val next = mat(members.union(grow).distinct())
          val n = next.count()
          growing = n > nMembers
          nMembers = n
          members = next
        }

        // ---- 4. assign + shrink
        assigned = assigned.union(members)
        assignedThisPhase += nMembers
        active = mat(active.join(members, Seq("id"), "left_anti"))
        e = mat(e
          .join(members.withColumnRenamed("id", "m1"), col("src") === col("m1"), "left_anti")
          .join(members.withColumnRenamed("id", "m2"), col("dst") === col("m2"), "left_anti"))
      }
      // truncate the accumulated-union lineage once per phase — plain
      // unions across ~100-round phases otherwise grow the plan tree
      // with phase count (slow analysis / driver stack risk)
      assigned = mat(assigned)
      phase += 1
      telemetry(PhaseStats(phase, trimRounds, colorRounds, harvestRounds, assignedThisPhase))
    }
    require(active.limit(1).count() == 0,
      s"Scc did not converge in $maxPhases phases — raise maxPhases")
    assigned
  }
}
