"""Graph value-type read surface (SURVEY.md §1.1 value types).

The reference stores graph snapshots as ``{'v': [{'i': id, ...}],
'e': [{'f': from, 't': to, ...}]}`` per datapoint (api.py:~280 value
type registry [HIGH]; graph storage mongodb.py:~900 [MED]) but exposes
them only as opaque dicts. Here the snapshots become first-class
relational data: typed vertex / edge DataFrames and per-snapshot
topology stats, all set-oriented (``from_json`` + ``explode`` — one
plan for any number of snapshots, no driver-side JSON parsing).

Contract fields (``i`` / ``f`` / ``t``) are surfaced as typed columns;
remaining attributes ride along as a MAP<STRING,STRING> (scalar JSON
values are coerced to strings by ``from_json``), so schema evolution
in attrs never breaks the scan.

Scale: narrow transforms over the date-partitioned datapoints table —
pruning and pushdown behave exactly like any other raw read; explode
fan-out is bounded by snapshot size, and per-snapshot aggregates
reduce map-side before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

#: JSON schema of one stored snapshot (canonical JSON from ingest)
GRAPH_JSON_SCHEMA = "v array<map<string,string>>, e array<map<string,string>>"


def parse_snapshots(df: DataFrame, json_col: str = "value_json") -> DataFrame:
    """(stream_id, ts, vertices, edges) — one row per snapshot."""
    g = F.from_json(F.col(json_col), GRAPH_JSON_SCHEMA)
    return df.select(
        "stream_id",
        "ts",
        F.coalesce(g["v"], F.array()).alias("vertices"),
        F.coalesce(g["e"], F.array()).alias("edges"),
    )


def graph_vertices(df: DataFrame, json_col: str = "value_json") -> DataFrame:
    """One row per vertex per snapshot: (stream_id, ts, vertex_id,
    attrs) with the contract key ``i`` lifted out of the attr map."""
    snaps = parse_snapshots(df, json_col)
    v = snaps.select(
        "stream_id", "ts", F.explode("vertices").alias("_v")
    )
    return v.select(
        "stream_id",
        "ts",
        F.col("_v")["i"].alias("vertex_id"),
        F.map_filter(F.col("_v"), lambda k, _: k != "i").alias("attrs"),
    )


def graph_edges(df: DataFrame, json_col: str = "value_json") -> DataFrame:
    """One row per edge per snapshot: (stream_id, ts, src, dst, attrs)
    with the contract keys ``f``/``t`` lifted out of the attr map."""
    snaps = parse_snapshots(df, json_col)
    e = snaps.select("stream_id", "ts", F.explode("edges").alias("_e"))
    return e.select(
        "stream_id",
        "ts",
        F.col("_e")["f"].alias("src"),
        F.col("_e")["t"].alias("dst"),
        F.map_filter(
            F.col("_e"), lambda k, _: (k != "f") & (k != "t")
        ).alias("attrs"),
    )


def graph_stats(df: DataFrame, json_col: str = "value_json") -> DataFrame:
    """Per-snapshot topology stats, one aggregation-free pass:
    (stream_id, ts, n_vertices, n_edges, max_out_degree,
    n_self_loops). Degree is computed inside the arrays (higher-order
    functions), so snapshots never shuffle — the row count equals the
    snapshot count going in and out."""
    snaps = parse_snapshots(df, json_col)
    edges = F.col("edges")
    srcs = F.transform(edges, lambda e: e["f"])
    max_out = F.array_max(
        F.transform(
            F.array_distinct(srcs),
            lambda s: F.size(F.filter(srcs, lambda x: x == s)),
        )
    )
    return snaps.select(
        "stream_id",
        "ts",
        F.size("vertices").cast("long").alias("n_vertices"),
        F.size(edges).cast("long").alias("n_edges"),
        F.coalesce(max_out, F.lit(0)).cast("long").alias("max_out_degree"),
        F.size(F.filter(edges, lambda e: e["f"] == e["t"]))
        .cast("long")
        .alias("n_self_loops"),
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over an edge DataFrame (the graph
    value type's analytics surface beyond topology stats). Returns
    (vertex_id, rank).

    Power method with dangling-mass redistribution: each iteration is
    ``r' = (1-d)/N + d * (sum_in r/outdeg + dangling_mass/N)`` — one
    shuffle on the edge source join, one on the destination
    aggregation, and the scalar dangling mass rides a broadcast
    cross-join (never a collect). Multigraph semantics: parallel edges
    contribute once each (dedup upstream for simple-graph ranks).
    Fixed iteration count keeps the operator deterministic and
    SQL-replayable (q_gr2 replays the identical arithmetic as chained
    CTEs); at cluster scale insert a checkpoint every few iterations
    to cut lineage growth — the loop body is checkpoint-agnostic.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    d = float(damping)
    # Materialize the loop-invariant frames once and truncate lineage
    # per iteration: without this, iteration k's plan replays
    # iterations 1..k-1 AND re-derives edges/vertices/degrees from the
    # source scan each time — O(n_iter^2) plan depth (measured 5.7 s
    # -> ~2 s for 5 iterations on the q_gr2 probe). localCheckpoint
    # keeps blocks on executors; on a real cluster swap for a
    # reliable checkpoint directory if executor loss matters.
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint(eager=False)
    verts = (
        e.select(F.col("_src").alias("id"))
        .union(e.select(F.col("_dst").alias("id")))
        .distinct()
    ).localCheckpoint(eager=False)
    outdeg = e.groupBy(F.col("_src").alias("id")).agg(
        F.count("*").alias("_deg")
    ).localCheckpoint(eager=False)
    # lazy checkpoints: the count below materializes e+verts in ONE
    # job (outdeg rides the first iteration); eager ones cost a
    # separate job apiece for the same blocks (guide §1.2: fewer
    # passes). AQE still executes each checkpointed subtree's shuffle
    # stages at .rdd-conversion time, so plans stay flat either way.
    n = verts.count()
    if n == 0:
        return verts.select(
            F.col("id").alias("vertex_id"), F.lit(0.0).alias("rank")
        )
    base, dn = (1.0 - d) / n, d
    ranks = verts.withColumn("_r", F.lit(1.0 / n))
    for it in range(n_iter):
        wd = ranks.join(outdeg, "id", "left")
        dang = wd.where(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("_r"), F.lit(0.0)).alias("_m")
        )
        contrib = (
            e.join(
                wd.where(F.col("_deg").isNotNull()).select(
                    F.col("id").alias("_src"), "_r", "_deg"
                ),
                "_src",
            )
            .groupBy(F.col("_dst").alias("id"))
            .agg(F.sum(F.col("_r") / F.col("_deg")).alias("_c"))
        )
        ranks = verts.join(contrib, "id", "left").crossJoin(
            F.broadcast(dang)
        ).select(
            "id",
            (
                F.lit(base)
                + F.lit(dn)
                * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_m") / n)
            ).alias("_r"),
        )
        # checkpoint every SECOND iteration (and the last): a 2-deep
        # iteration plan analyzes fine, and halving the barrier count
        # drops the per-barrier AQE stage executions (measured on
        # q_gr2: 1.6 s -> 1.3 s for 5 iterations, rank parity exact)
        if it % 2 == 1 or it == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        F.col("id").alias("vertex_id"), F.col("_r").alias("rank")
    )


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts via the degree-oriented wedge join
    (the "compact-forward" formulation — orient every undirected edge
    from its lower-(degree, id) endpoint to the higher one, enumerate
    wedges only between a vertex's oriented out-neighbors, and close
    them against the oriented edge set).

    Why this shape at scale: without orientation the wedge join fans
    out as sum(deg^2) and a single hub vertex dominates the stage;
    orientation bounds every out-degree by O(sqrt(m)), so the wedge
    count is within a constant of the optimum for any degree
    distribution — the standard skew defense for distributed triangle
    enumeration (same family as the salted-join treatment in skew.py,
    but exact, not probabilistic). Three hash joins + one aggregation,
    no UDFs; every triangle is enumerated exactly once (rank-ordered
    u < v < w).

    Returns (vertex_id, n_triangles) for every vertex of the
    undirected, self-loop-free, deduplicated graph (vertices in no
    triangle included with 0 — isolated vertices of the edge set still
    appear).
    """
    a, b = F.col(src_col), F.col(dst_col)
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # Materialize the oriented edge list ONCE: it feeds THREE
    # consumers (both wedge legs + the closure side) and the final
    # vertex list, so an unmaterialized lineage re-executes the whole
    # dedup+degree+join pipeline per consumer — the captured q_gr3
    # plan held 66 Exchange nodes before this barrier (guide §3.3:
    # materialize to truncate duplicated subtrees). Edge-list-sized,
    # exactly the frame a 100 TB run would stage to storage anyway.
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1")
    )
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2")
    )
    rank_lt = (F.col("dv1") < F.col("dv2")) | (
        (F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2"))
    )
    wedges = o1.join(o2, "u").where(rank_lt).select("u", "v1", "v2")
    closer = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tris = wedges.join(closer, ["v1", "v2"], "left_semi")
    per_vertex = (
        tris.select(F.explode(F.array("u", "v1", "v2")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # Every vertex of e appears in the oriented edge list (e is
    # self-loop-free), so the vertex universe reads from the
    # checkpointed frame instead of re-deriving `deg`.
    vertices = (
        oriented.select(F.col("u").alias("v"))
        .unionAll(oriented.select(F.col("v").alias("v")))
        .distinct()
    )
    return (
        vertices
        .join(per_vertex, "v", "left")
        .select(
            F.col("v").alias("vertex_id"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
    )


def bfs_distances(
    edges: DataFrame,
    sources: list,
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distances over an edge DataFrame — the
    reachability verb the graph surface lacked (PageRank ranks,
    triangles count, connected components cluster; none answers "how
    FAR is every vertex from this set"). Returns (vertex_id,
    dist BIGINT) for every vertex within ``max_hops`` of any source
    (sources at 0; unreached vertices absent).

    Level-synchronous frontier expansion: round h joins ONLY the
    newly-discovered frontier (never the full visited set) against
    the edge frame — one shuffle per hop, each bounded by the
    frontier×degree product — then anti-joins the visited set so a
    vertex's distance is fixed the first time it is seen (which is
    what makes BFS distance exact with no min-agg over paths).
    Undirected graphs expand both edge orientations. Distances are
    pure INTEGERS, so the q_gr4 oracle (a hop-bounded recursive CTE)
    replays them with no float doctrine at all.

    Loop mechanics follow pagerank's lesson: the edge frame
    localCheckpoints once, each round's frontier localCheckpoints
    (the plan would otherwise double per hop), and the early-exit
    check is one bounded count() per hop — a justified control-plane
    action, same class as the connected-components driver gate.
    """
    if max_hops < 1:
        raise ValueError("bfs_distances: max_hops must be >= 1")
    if not sources:
        raise ValueError("bfs_distances: need at least one source vertex")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).where(F.col("_s") != F.col("_d"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
    # lazy: materializes inside hop 1's expansion instead of as its
    # own up-front job; the driver-created source frame is already
    # flat, so checkpointing it bought nothing (two fewer jobs per
    # call, exact same frames)
    e = e.distinct().localCheckpoint(eager=False)

    src_df = spark.createDataFrame(
        [(s,) for s in sources], ["v"]
    ).distinct()
    # Seed only sources that exist as endpoints? No — a source is at
    # distance 0 by definition even if isolated.
    #
    # The seed MUST be RDD-backed (localCheckpoint), not a raw
    # LocalRelation: the seed is unioned into the visited set, and a
    # LocalRelation branch there defeats AQE coalescing of every
    # later hop's anti-join exchange — measured per-hop 32-task stage
    # materializations (q_gr4: 193 tasks / 35 s summed task run vs
    # 67 tasks / 9.2 s with the checkpointed seed, event-log counts —
    # the round-10 quiet-window audit, OPTIMIZATION_r10.md).
    frontier = src_df.localCheckpoint()
    # dist is only ever a UNION of already-checkpointed frontiers, so
    # its plan stays flat without its own checkpoint — re-checkpointing
    # the cumulative visited set each hop would rewrite O(V) blocks
    # per round for zero plan-depth benefit.
    dist = frontier.withColumn("dist", F.lit(0).cast("long"))

    for h in range(1, int(max_hops) + 1):
        # The early-exit count rides the checkpoint's materializing
        # action as an Observation (the dedup.py cc_round idiom) —
        # one job per hop, not checkpoint-then-isEmpty.
        obs = Observation(f"bfs_hop_{h}")
        nxt = (
            frontier.join(e, frontier["v"] == e["_s"], "inner")
            .select(F.col("_d").alias("v"))
            .distinct()
            .join(dist.select("v"), "v", "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if obs.get["n"] == 0:
            break
        dist = dist.unionByName(
            nxt.withColumn("dist", F.lit(h).cast("long"))
        )
        frontier = nxt
    return dist.select(F.col("v").alias("vertex_id"), "dist")
