"""Iterative graph operators: PageRank and connected components.

Spark has no built-in iterative-graph operator; the idiomatic shape is
a bounded loop of join+aggregate rounds over an edge DataFrame, with
each round's result persisted so lineage stays linear (and, at real
scale, checkpointed every ~10 rounds to truncate the plan). Both
operators here follow that shape — no driver-side collects, no Python
row work; each round is one shuffle keyed by node id.

At 100 TB: pre-partition ``edges`` by ``src`` (bucketed write) and the
per-round join inherits the partitioning — rounds become zero-Exchange
on the edge side, shuffling only the (node, rank/label) frame.

Public algorithms: PageRank (Brin/Page), label-propagation connected
components (the min-label hashmin variant used by e.g. GraphFrames).

Cache contract (uniform across the iterative ops): the RETURNED frame
is persisted and already materialized; every internal cache — the
co-partitioned adjacency, loop invariants, per-round checkpoints and
frontiers — is unpersisted before return, on the error paths too. The
caller owns the single remaining cache and may ``result.unpersist()``
when done; ``tests/test_graph.py`` asserts the persistent-RDD ledger
returns to baseline after that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# subclass the CLASSIC DataFrame: pyspark.sql.DataFrame is a
# classic/connect dispatcher in 4.x whose __new__ would not honor a
# plain subclass (this engine always runs a classic local JVM session)
from pyspark.sql.classic.dataframe import (  # noqa: E402
    DataFrame as _ClassicDataFrame,
)


class _TruncatedFrame(_ClassicDataFrame):
    """A localCheckpoint-backed materialized frame whose ``unpersist()``
    releases the pinned checkpoint blocks. After unpersist the frame is
    NOT recomputable (its lineage was truncated away) — callers only
    ever unpersist superseded or fully-consumed iteration frames."""

    def __init__(self, df: DataFrame, jrdd) -> None:
        super().__init__(df._jdf, df.sparkSession)
        self._ckpt_jrdd = jrdd

    def unpersist(self, blocking: bool = False) -> DataFrame:
        self._ckpt_jrdd.unpersist(blocking)
        return self


def _materialize_truncated(df: DataFrame) -> DataFrame:
    """Materialize an iteration checkpoint AND truncate its lineage:
    a plain persist caches the data but Catalyst still re-analyzes the
    full N-round logical plan on every later action, so planning cost
    grows with rounds — measured 2.4x on a 10-round PageRank whose
    final frame was persisted but not truncated (and 95 s of pure
    planning on an untruncated component loop at sf0.1).

    Default mechanism: ``localCheckpoint(eager=True)`` — ONE job that
    computes the segment once and pins the blocks executor-local, no
    second write pass and no round-trip through the checkpoint
    filesystem. That is the right trade for iteration checkpoints at
    any scale: losing an executor mid-loop just re-runs the loop job,
    and the per-round latency the reliable path adds (a full second
    materialization job + a distributed-FS write + read-back) is paid
    EVERY round on EVERY graph. Blocks are freed by the context
    cleaner when the frame becomes unreachable
    (``spark.cleaner.referenceTracking`` is on by default).

    ``SPARK_GRAFT_RELIABLE_CKPT=1`` restores reliable
    ``checkpoint(eager=True)`` for deployments whose loops are so long
    that recomputing a lost segment costs more than the per-round
    write tax (the frame then survives executor loss). Deployments
    point ``setCheckpointDir`` at durable shared storage; when unset a
    per-process tempdir is installed (correct in local mode), with an
    atexit sweep so files never outlive the process."""
    import os

    if os.environ.get("SPARK_GRAFT_RELIABLE_CKPT", "") not in ("1", "true"):
        lc = df.localCheckpoint(eager=True)
        try:
            # DataFrame.unpersist only clears CacheManager entries, and
            # a localCheckpoint never registers one — its blocks are
            # pinned on the RDD itself. Grab that RDD (the LogicalRDD
            # leaf the checkpoint produced) so the returned frame's
            # unpersist() actually releases the blocks and the
            # persistent-RDD ledger returns to baseline (the iterative
            # ops' cache contract, pinned by tests/test_graph.py).
            jrdd = lc._jdf.queryExecution().analyzed().rdd()
        except Exception:
            return lc  # plan shape changed underneath us: keep blocks,
            #            the context cleaner frees them on GC
        return _TruncatedFrame(lc, jrdd)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        import atexit
        import shutil
        import tempfile

        ckpt = tempfile.mkdtemp(prefix=f"spark_graft_ckpt_{os.getpid()}_")
        sc.setCheckpointDir(ckpt)
        atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    # classic checkpoint gotcha: the checkpoint-write job re-runs the
    # RDD from lineage, so an unpersisted eager checkpoint computes
    # the segment TWICE (measured ~2x on the 10-round PageRank).
    # Persist first so the write job reads the cache, then drop the
    # cache — the files hold the data from here.
    df = df.persist()
    df.count()
    out = df.checkpoint(eager=True)
    df.unpersist()
    return out


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
    symmetric: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list (make edges
    symmetric for undirected graphs — that also removes dangling-node
    mass loss, since every node then has out-degree ≥ 1).

    ``edges_distinct=True`` skips the defensive dedup shuffle when the
    caller guarantees no duplicate edges; ``symmetric=True`` derives
    the node set from sources alone (every node of a symmetric graph
    is a source) — together they remove two |E|-sized shuffles from
    the setup on graphs built from an already-distinct pair list.

    Returns (node, rank) after ``iters`` rounds from a uniform start.
    Simplified update (no dangling redistribution):
    ``r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/outdeg(u)``.
    """
    # loop invariants: persist once, CO-PARTITIONED ON THE JOIN KEY —
    # `distinct` leaves edges hash-partitioned on (src, dst), which
    # does NOT satisfy the per-round join on src alone, so without the
    # explicit repartition every round re-shuffles all |E| edges. With
    # it, the only per-round exchange is the |V|-sized contribution
    # aggregate (ranks arrive already hash-partitioned on the key via
    # attribute lineage from the previous round's groupBy). The
    # out-degree join is loop-invariant too: fold deg into the edge
    # frame ONCE so each round is a single join + one aggregate.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    # materialize the partitioned edge frame ONCE before anything is
    # derived from it: nodes, outdeg and e_deg all reference ``e``, and
    # Spark re-evaluates repeated unpersisted subtrees — with a real
    # join feeding the edge list (op_pagerank: orders⋈lineitem +
    # distinct) the input pipeline ran up to 4× across those
    # materializations. localCheckpoint preserves the hash partitioning
    # on src, so the per-round join still needs no exchange.
    e = _materialize_truncated(e.repartition("src"))
    if symmetric:
        nodes = e.select(F.col("src").alias("node")).distinct().persist()
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(outdeg, "src").persist()
    # |V| is one bounded scalar action over the persisted node set —
    # riding it as a literal keeps a 1-row broadcast join out of every
    # round's plan (planning cost dominates small-graph rounds)
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    prev_ckpt: DataFrame | None = None
    for i in range(iters):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("__c"))
        )
        if symmetric:
            # every node of a symmetric graph has an in-edge, so the
            # contribution aggregate already covers the whole node set
            # — the |V| left join below would be a no-op exchange+join
            # per round (verified: identical ranks with/without)
            ranks = contrib.select(
                F.col("dst").alias("node"),
                (
                    F.lit((1.0 - damping) / n) + damping * F.col("__c")
                ).alias("rank"),
            )
        else:
            ranks = nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            ).select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("rank"),
            )
        # persist only every 4th round: a per-round persist forces a
        # materialization barrier each iteration (measured 5× slower
        # at 1.2M edges × 3 rounds), while UNBOUNDED lineage makes
        # planning superlinear past a handful of rounds — periodic
        # truncation is the middle that scales to both axes. (Skipping
        # the mid-loop checkpoint for short runs was measured and
        # REJECTED: 5-iteration PageRank ran 4.66 s → 5.43 s without it
        # — re-analyzing the deeper plan at every AQE stage costs more
        # than the one barrier saves.)
        if (i + 1) % 4 == 0 and i + 1 < iters:
            # materialize the new checkpoint WITH lineage truncation
            # (planning cost would otherwise grow superlinearly with
            # rounds), then drop the previous one — a long run must
            # not accumulate one cached frame per 4 rounds
            ranks = _materialize_truncated(ranks)
            if prev_ckpt is not None:
                prev_ckpt.unpersist()
            prev_ckpt = ranks
    # cache contract (uniform across the iterative graph ops): the
    # RETURNED frame is materialized with truncated lineage; every
    # internal cache — loop invariants and the last periodic
    # checkpoint — is dropped here. The caller owns the one remaining
    # cache and may result.unpersist() when done.
    ranks = _materialize_truncated(ranks)
    if prev_ckpt is not None:
        prev_ckpt.unpersist()
    nodes.unpersist()
    e_deg.unpersist()
    e.unpersist()
    return ranks


def connected_components(
    edges: DataFrame,
    max_iters: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Min-label propagation (hashmin): every node's label converges to
    the smallest node id in its component. Returns (node, component).

    Rounds needed = graph diameter; raises if ``max_iters`` rounds do
    not reach a fixpoint (silent partial labels would be wrong answers
    — same contract as ``dedup.dedup_clusters``). Deliberately NO
    pointer jumping here (unlike ``dedup.dedup_clusters``): on the
    dense low-diameter graphs this op serves, the jump's extra
    |V|-keyed join per round measured strictly slower (2.5 s vs 1.8 s
    at sf0.1) because it cannot cut a round count that is already ~4.
    """
    # Evaluate the edge frame EXACTLY ONCE (same restructure as
    # dedup.dedup_clusters): the old spelling (edges ∪ edges-reversed,
    # nodes derived from that union, self-loops unioned back)
    # referenced the input subtree four times inside the first
    # materialization, and Spark does not reuse repeated unpersisted
    # subtrees — a window- or join-derived edge list re-ran that many
    # times. Both directions come from one explode over a single pass.
    sym_raw = _materialize_truncated(
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("a"), F.col(dst).alias("b")
                    ),
                    F.struct(
                        F.col(dst).alias("a"), F.col(src).alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
    )
    # SELF-LOOP FOLD (same restructure as dedup.dedup_clusters): one
    # (node, node) row per node lets the per-round min aggregate see
    # the node's OWN label through its self-loop — min over neighbors
    # ∪ self IS least(own, neighbor-min), so the |V|-sized left join
    # against the label frame disappears from every round, and round 1
    # (identity labels) needs no join at all. The old label for the
    # convergence probe is min(label WHERE b = a) — the self-loop row
    # — one extra aggregate buffer instead of a join. Both invariants
    # are checkpointed (lineage-truncated) and the per-round edge frame
    # is their LAZY union — no second |E|-sized copy, and every later
    # round's plan stays two LogicalRDD leaves instead of re-printing
    # the whole input pipeline per reference.
    loops = _materialize_truncated(
        sym_raw.select(F.col("a").alias("n")).distinct().select(
            F.col("n").alias("a"), F.col("n").alias("b")
        )
    )
    sym = sym_raw.unionByName(loops)
    labels: DataFrame | None = None  # None ⇒ identity (round 1)
    prev_mat: DataFrame | None = None
    for _ in range(max_iters):
        # each node adopts min(own label, neighbors' labels); the OLD
        # label rides along as __prev so convergence is a filter over
        # the just-materialized frame — not a separate shuffle join of
        # two cached rounds
        if labels is None:
            mat = (
                sym.groupBy("a")
                .agg(
                    F.min("b").alias("component"),
                    F.min(F.when(F.col("b") == F.col("a"), F.col("b"))).alias(
                        "__prev"
                    ),
                )
                .withColumnRenamed("a", "node")
                .persist()
            )
        else:
            mat = (
                sym.join(
                    labels.select(
                        F.col("node").alias("b"),
                        F.col("component").alias("__lb"),
                    ),
                    "b",
                )
                .groupBy("a")
                .agg(
                    F.min("__lb").alias("component"),
                    F.min(F.when(F.col("b") == F.col("a"), F.col("__lb"))).alias(
                        "__prev"
                    ),
                )
                .withColumnRenamed("a", "node")
                .persist()
            )
        changed = (
            mat.where(F.col("component") != F.col("__prev")).limit(1).count()
        )
        # the probe materialized `mat`; the superseded round's cache is
        # dead weight from here — drop it (long runs would otherwise
        # hold one cached frame per round)
        if prev_mat is not None:
            prev_mat.unpersist()
        prev_mat = mat
        labels = mat.select("node", "component")
        if changed == 0:
            # cache contract: the RETURNED frame must own the one
            # remaining cache (callers unpersist it directly), so
            # re-persist the two-column projection — materializing it
            # only re-reads the final round's cached blocks — then
            # drop that round's cache and the loop-invariant adjacency
            out = labels.persist()
            out.count()
            mat.unpersist()
            sym_raw.unpersist()
            loops.unpersist()
            return out
    sym_raw.unpersist()
    loops.unpersist()
    if prev_mat is not None:
        prev_mat.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(component diameter exceeds max_iters)"
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    edges_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (community density, spam-ring detection).

    Compact-forward algorithm: canonicalize each undirected edge to
    (lo, hi) once, so every triangle {a<b<c} is enumerated exactly once
    as wedge (a-b, b-c) closed by edge (a-c) — two equi joins, no
    direction blow-up, no CartesianProduct. Cost is Σ wedges per
    mid-node; at scale, cap or salt super-node hubs the same way the
    dedup family caps hot LSH buckets.

    Returns (node, n_triangles) for every node in at least one
    triangle. ``edges_canonical=True`` skips the canonicalize +
    distinct shuffle when the caller already guarantees lo<hi,
    loop-free, deduplicated edges (``clustering_coefficient`` builds
    exactly that frame — re-dedup would be a wasted |E| shuffle).
    """
    if edges_canonical:
        e = edges.select(F.col(src).alias("lo"), F.col(dst).alias("hi"))
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("lo"),
                F.greatest(F.col(src), F.col(dst)).alias("hi"),
            )
            .where(F.col("lo") != F.col("hi"))
            .distinct()
        )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # a < b < c by construction
    per_corner = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return per_corner.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def link_predict_common_neighbors(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
    k: int = 100,
) -> DataFrame:
    """Link prediction by neighborhood overlap: for node pairs NOT
    already connected, count common neighbors and score with Jaccard
    |Γ(a)∩Γ(b)| / |Γ(a)∪Γ(b)| — the classic similarity baseline for
    recommending missing edges (entity linkage, knowledge-graph
    completion).

    Inverted-index shape (same family as the n-gram Jaccard dedup):
    symmetrize once, self-join adjacency on the shared NEIGHBOR — the
    join key is the mid-node, so cost is Σ deg(n)² over mid-nodes, not
    |V|². ``max_degree`` drops super-hub mid-nodes from the index (a
    hub is a weak similarity signal anyway — same reasoning as the
    document-frequency cap in dedup.py); degrees for the Jaccard
    denominator are computed BEFORE the cap so scores stay exact.
    Existing edges are removed with a broadcast-free anti-join on the
    canonical (lo, hi) form. Top-k by score desc, then (a, b) asc —
    deterministic.

    Returns (a, b, n_common, score) with a < b.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    adj = und.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionAll(
        und.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    index = adj
    if max_degree is not None:
        hubs = deg.where(F.col("deg") > max_degree).select(
            F.col("node").alias("nbr")
        )
        index = adj.join(F.broadcast(hubs), "nbr", "left_anti")
    left = index.select(F.col("node").alias("a"), "nbr")
    right = index.select(F.col("node").alias("b"), "nbr")
    pairs = (
        left.join(right, "nbr")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    non_edges = pairs.join(
        und.select(F.col("lo").alias("a"), F.col("hi").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    return (
        non_edges.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")),
                6,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "a", "b")
        .limit(k)
    )


def bfs_distances(
    edges: DataFrame,
    source: int,
    max_depth: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Unweighted shortest-path distances from ``source`` over the
    undirected graph, breadth-first to ``max_depth`` hops — the
    bounded-iteration answer to a recursive CTE (which Spark lacks;
    the oracle twin IS one).

    Frontier form: each round expands only the newly-discovered nodes
    (frontier ⋈ adjacency, anti-join against everything seen), so a
    round's cost tracks the frontier size, not the visited set — on a
    high-diameter graph the per-round joins stay proportional to the
    BFS wavefront. Early exit when the frontier empties; the emptiness
    probe is one tiny action per round, the price of not running
    max_depth dead rounds.

    Returns (node, dist) including (source, 0)."""
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    adj = (
        und.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("lo").alias("node"), F.col("hi").alias("nbr")
                    ),
                    F.struct(
                        F.col("hi").alias("node"), F.col("lo").alias("nbr")
                    ),
                )
            ).alias("e")
        )
        .select("e.node", "e.nbr")
        .repartition("node")
        .persist()
    )
    dist = spark.createDataFrame([(source, 0)], "node bigint, dist int")
    frontier = dist
    # (A lazy probe-free variant for small depths was measured and
    # REJECTED: each round references the previous frontier and the
    # accumulator more than once, and AQE does NOT reuse the repeated
    # subtrees across its runtime query stages, so the depth-3 op
    # recomputed early rounds exponentially — 10.4 s vs 3.9 s, 54 jobs
    # vs 26. The per-round persist + emptiness probe below is what
    # keeps every round computed exactly once.)
    frontiers: list[DataFrame] = []
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(adj, "node")
            .select(F.col("nbr").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(d).alias("dist"))
            .persist()
        )
        frontiers.append(nxt)
        if nxt.isEmpty():
            break
        # no per-round persist on the accumulator: it is a union of
        # ALREADY-persisted frontiers, so recompute on reuse just
        # reads cached blocks — a per-round persist here only adds a
        # materialization barrier (measured 5× slower in pagerank)
        dist = dist.unionByName(nxt)
        frontier = nxt
    # cache contract: persist + materialize the returned accumulator,
    # then drop every per-round frontier and the adjacency — the
    # caller owns the single remaining cache
    dist = dist.persist()
    dist.count()
    for f in frontiers:
        f.unpersist()
    adj.unpersist()
    return dist


def sssp_bounded(
    edges: DataFrame,
    source: int,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Single-source shortest path costs over the undirected weighted
    graph, restricted to paths of at most ``rounds`` edges —
    Bellman-Ford relaxation rounds, the bounded-iteration form of the
    weighted recursive CTE. Parallel edges are kept (min picks the
    lightest); prefer integer-valued weights when hash-attesting so
    path sums are exact.

    Each round is one join (current dists ⋈ adjacency) + one min-agg —
    both shuffles keyed by node; adjacency is co-partitioned once.
    Returns (node, dist) for nodes reachable within ``rounds`` hops."""
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    adj = (
        und.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("lo").alias("node"),
                        F.col("hi").alias("nbr"),
                        F.col("w"),
                    ),
                    F.struct(
                        F.col("hi").alias("node"),
                        F.col("lo").alias("nbr"),
                        F.col("w"),
                    ),
                )
            ).alias("e")
        )
        .select("e.node", "e.nbr", "e.w")
        .repartition("node")
        .persist()
    )
    dist = spark.createDataFrame([(source, 0.0)], "node bigint, dist double")
    prev: DataFrame | None = None
    for i in range(rounds):
        cand = dist.join(adj, "node").select(
            F.col("nbr").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .persist()
        )
        # materialize the new round, then drop the superseded cache —
        # the relaxation only ever reads the latest dist frame, so
        # keeping old rounds pinned is pure leak (same hygiene as
        # pagerank's periodic checkpoints); EVERY round now, so the
        # penultimate frame no longer outlives the loop. (A lazy
        # no-materialization variant was measured and REJECTED: each
        # round references the previous dist twice — join + union — and
        # AQE does NOT reuse the repeated subtree across its runtime
        # query stages, so the 3-round op recomputed early rounds
        # exponentially: 5.4 s vs 2.8 s, 29 jobs vs 21.)
        dist.count()
        if prev is not None:
            prev.unpersist()
        prev = dist
    # cache contract: the returned final-round frame is the only cache
    # left — drop the adjacency (callers only read the dist frame)
    adj.unpersist()
    return dist


def kcore(
    edges: DataFrame,
    k: int,
    max_iters: int = 30,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition (membership): iteratively peel nodes with
    degree < k until a fixpoint; survivors form the k-core — the dense
    subgraph used for community seeds and spam/bot cluster mining.

    Returns (node, deg) for nodes in the k-core, with their degree
    INSIDE the core. Each round is one symmetric-adjacency semi-join +
    a grouped degree count — cost tracks the surviving edge set, which
    only shrinks. Deterministic: the peel order doesn't affect the
    fixpoint (k-core is unique). Raises on non-convergence like
    ``connected_components`` — a silent partial peel would answer with
    a supergraph of the core.

    Self-loops are dropped (a self-loop would let an isolated node
    keep itself alive forever); parallel edges collapse."""
    sym = (
        edges.where(F.col(src) != F.col(dst))
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.where(F.col(src) != F.col(dst)).select(
                F.col(dst).alias("a"), F.col(src).alias("b")
            )
        )
        .distinct()
        .persist()
    )
    cur = sym
    prev_edges = cur.count()
    for _ in range(max_iters):
        deg = cur.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("a").persist()
        nxt = (
            cur.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .persist()
        )
        n_edges = nxt.count()
        # nxt is materialized; the peeled-away round's caches are dead
        # weight from here (cur may be sym on round one — sym is only
        # read through cur, so dropping it then is safe too)
        keep.unpersist()
        if cur.is_cached:
            cur.unpersist()
        if n_edges == prev_edges:
            # cache contract: materialize the final degree agg as the
            # returned cache, then drop the fixpoint edge set it reads
            out = (
                nxt.groupBy("a")
                .agg(F.count(F.lit(1)).alias("deg"))
                .select(F.col("a").alias("node"), "deg")
                .orderBy("node")
                .persist()
            )
            out.count()
            nxt.unpersist()
            return out
        cur, prev_edges = nxt, n_edges
    if cur.is_cached:
        cur.unpersist()
    raise RuntimeError(
        f"kcore did not reach a fixpoint in {max_iters} rounds"
    )


def personalized_pagerank(
    edges: DataFrame,
    sources: list[int],
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
    symmetric: bool = False,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to the SOURCE SET
    instead of spreading uniformly, so ranks measure proximity to the
    sources — the related-items / trust-propagation variant of
    ``pagerank`` ("what's near THESE nodes", not "what's central").

    ``sources`` ride the plan as literals (the IVF-centroid pattern);
    per-round cost and co-partitioning match ``pagerank`` exactly.
    Nodes unreachable from the sources legitimately converge to 0."""
    if not sources:
        raise ValueError("personalized_pagerank needs a non-empty source set")
    # dedupe BEFORE sizing the teleport weight: isin() dedups
    # implicitly, so [5, 5] would otherwise give node 5 mass 1/2 and
    # silently lose the rest
    srcs = sorted({int(x) for x in sources})
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    # single-eval edge materialization — same rationale as ``pagerank``
    e = _materialize_truncated(e.repartition("src"))
    if symmetric:
        nodes = e.select(F.col("src").alias("node")).distinct().persist()
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
    # a source absent from the graph would likewise leak teleport mass
    # (all-zero ranks with no signal) — fail loudly instead; one small
    # count over the already-persisted node set
    n_found = nodes.where(F.col("node").isin(srcs)).count()
    if n_found != len(srcs):
        nodes.unpersist()  # error path: don't leak the invariant caches
        e.unpersist()
        raise ValueError(
            f"{len(srcs) - n_found} source id(s) absent from the edge list"
        )
    # fold the loop-invariant out-degree into the edge frame once —
    # same round shape as ``pagerank``
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(outdeg, "src").persist()
    def teleport_of(col):
        return F.when(
            col.isin(srcs), F.lit(1.0 / len(srcs))
        ).otherwise(F.lit(0.0))

    teleport = teleport_of(F.col("node"))
    ranks = nodes.select("node", teleport.alias("rank"))
    prev_ckpt: DataFrame | None = None
    for i in range(iters):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("__c"))
        )
        if symmetric:
            # symmetric ⇒ contrib covers every node; see ``pagerank``
            ranks = contrib.select(
                F.col("dst").alias("node"),
                (
                    (1.0 - damping) * teleport_of(F.col("dst"))
                    + damping * F.col("__c")
                ).alias("rank"),
            )
        else:
            ranks = nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            ).select(
                "node",
                (
                    (1.0 - damping) * teleport
                    + damping * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("rank"),
            )
        # periodic truncated checkpoint — see ``pagerank``
        if (i + 1) % 4 == 0 and i + 1 < iters:
            ranks = _materialize_truncated(ranks)
            if prev_ckpt is not None:
                prev_ckpt.unpersist()
            prev_ckpt = ranks
    # same cache contract as ``pagerank``: returned frame materialized
    # with truncated lineage, all internal caches dropped
    ranks = _materialize_truncated(ranks)
    if prev_ckpt is not None:
        prev_ckpt.unpersist()
    nodes.unpersist()
    e_deg.unpersist()
    e.unpersist()
    return ranks


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Undirected degree-distribution histogram: ``(deg, n_nodes)``
    rows, one per distinct degree — the first diagnostic run on any
    new graph (power-law tail ⇒ hub-salting / cap decisions for the
    join-based ops above; see ``op_key_skew`` for the relational
    twin).

    Shape: canonical-pair distinct (``least/greatest``) collapses
    parallel and reverse edges, one symmetric union derives neighbor
    lists, then two hash aggregates (node→deg, deg→n_nodes) — both
    map-side combinable, no windows, no joins. At 100 TB the edge
    distinct is the only real shuffle; everything after it works on
    the much smaller node set."""
    lo, hi = F.col(src), F.col(dst)
    canon = (
        edges.where(lo != hi)
        .select(
            F.least(lo, hi).alias("a"), F.greatest(lo, hi).alias("b")
        )
        .distinct()
    )
    sym = canon.select(F.col("a").alias("node")).unionByName(
        canon.select(F.col("b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("deg")
    )


def reciprocity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Directed-graph reciprocity: the fraction of distinct non-loop
    edges (a→b) whose reverse (b→a) also exists — a one-row summary
    (bot/broadcast graphs sit near 0, social graphs 0.3-0.7).

    The reverse-existence test is a self semi-join on the distinct
    edge set (equi keys, shuffle-partitioned both sides the same way);
    the two counts are map-side-combined 1-row aggregates crossed at
    the end — nothing here materializes on the driver."""
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    n_all = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_rec = e.join(rev, ["s", "d"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    return n_all.crossJoin(n_rec).select(
        "n_edges",
        "n_reciprocal",
        F.round(
            F.col("n_reciprocal").cast("double")
            / F.col("n_edges").cast("double"),
            6,
        ).alias("reciprocity"),
    )


def assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity: Pearson correlation between the degrees
    at the two ends of each undirected edge (one row: n_edges, r).
    Positive ⇒ hubs attach to hubs (social nets); negative ⇒ hub-leaf
    structure (the shape that wants hub-salting in the join ops).

    Shape: canonical-pair distinct → degree table (hash agg) → degree
    joined to both endpoints (two equi joins against the |V|-sized
    deg frame) → one corr aggregate over both edge orientations.
    corr is spelled covar/(σ·σ) under try_divide so a degree-regular
    graph (zero variance) yields NULL, matching ANSI engines instead
    of raising."""
    lo, hi = F.col(src), F.col(dst)
    canon = (
        edges.where(lo != hi)
        .select(F.least(lo, hi).alias("a"), F.greatest(lo, hi).alias("b"))
        .distinct()
    )
    sym = canon.unionByName(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    paired = (
        sym.join(deg, "a")
        .withColumnRenamed("deg", "dx")
        .join(deg.select(F.col("a").alias("b"), F.col("deg").alias("dy")), "b")
        .select(F.col("dx").cast("double"), F.col("dy").cast("double"))
    )
    from ..functions.numeric import safe_corr, snap_zero

    r = safe_corr(F.col("dx"), F.col("dy"))
    return paired.agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
        snap_zero(r).alias("assortativity"),
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: triangles(v) /
    C(deg(v), 2) — what fraction of a node's neighbor pairs are
    themselves connected (≈1 inside cliques/communities, ≈0 on trees
    and star spam). Composes :func:`triangle_count` with the degree
    table; nodes of degree < 2 get coefficient 0.

    Shape: the triangle enumeration dominates (see triangle_count);
    the degree join adds one |V|-sized frame. Output: (node, deg,
    n_triangles, coeff) for every node of the graph."""
    lo, hi = F.col(src), F.col(dst)
    canon = (
        edges.where(lo != hi)
        .select(F.least(lo, hi).alias("a"), F.greatest(lo, hi).alias("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_count(canon, "a", "b", edges_canonical=True)
    pairs = (F.col("deg") * (F.col("deg") - 1) / 2.0).cast("double")
    coeff = F.when(
        F.col("deg") >= 2,
        F.round(F.coalesce(F.col("n_triangles"), F.lit(0)) / pairs, 6),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            coeff.alias("coeff"),
        )
    )
