"""Graph analytics over DataFrame edge lists: PageRank and triangle
counting.

The dedup tier already runs one graph algorithm at scale —
pointer-doubling connected components (functions/dedup.py:
connected_components) — because near-dup clusters ARE a graph problem.
These two round out the family for the pipeline-analytics side (entity
importance over a customer↔supplier interaction graph, cohesion metrics
over co-occurrence graphs), in formulations that keep every iteration
inside Catalyst and every float deterministic enough to hash across
engines.

Design rules:

- **PageRank** (fixed iterations): contribution sums fold in SORTED
  order per destination (``F.aggregate(F.array_sort(F.collect_list(...)))``
  ≡ DuckDB ``list_sum(list_sort(list(...)))``) — double addition is not
  associative, so an unsorted shuffle-order sum would hash-diverge
  between engines AND between Spark runs. Damping constants are written
  as the literals 0.15 / 0.85 on both sides (never ``1 - d``: 0.85 is
  inexact in binary, 1-0.85 != 0.15 bit-wise). Each iteration is one
  shuffle (groupBy dst) plus an edge join; ``checkpoint_every``
  truncates lineage with localCheckpoint on deep loops (the plan doubles
  per iteration otherwise — round-4 lesson).

- **Triangle counting** (degree-oriented, the MapReduce-era standard —
  Suri & Vassilvitskii WWW'11): orient each undirected edge from its
  lower-(degree, id) endpoint to the higher one, enumerate wedges only
  from each node's out-edges, and close them against oriented edges.
  Out-degree under this orientation is bounded by O(sqrt(m)), so the
  wedge blowup is m^1.5 worst-case instead of sum(deg^2) — the
  difference between a feasible and an impossible shuffle on a
  power-law graph at 100 TB. Pure integer math, fully SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    exact_folds: bool = True,
    outdeg_col: str | None = None,
    broadcast_max_nodes: int = 50_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (src, dst).

    Every node must appear as a source (out-degree must be defined —
    callers with sink-only nodes add reverse edges or self-loops first;
    the catalog entry uses a bidirectional bipartite graph where this
    holds by construction). Nodes with NO in-edges are fine: each
    iteration rebuilds ranks over the full node set, coalescing a
    missing contribution sum to 0, so such nodes hold the teleport
    floor 0.15/N and keep distributing their mass. Returns (node, rank)
    with rank rounded to 6dp at the END only (full precision flows
    through iterations).

    rank_{t+1}(v) = 0.15/N + 0.85 * sum_{u->v} rank_t(u)/outdeg(u)

    ``outdeg_col``: name of a column on ``edges`` already holding each
    row's source out-degree. When the caller's edge construction yields
    the degree as a by-product (e.g. an adjacency-array build where the
    degree is the array size), passing it here skips this function's
    edge-wide ``partitionBy(src)`` window — on a string-keyed 100 TB
    edge list that window's Exchange+Sort is the edge build's dominant
    shuffle. The column must equal the per-src row count of ``edges``
    (the window's definition) — a wrong value is SILENTLY incorrect
    (only the external oracle gate would catch it); tests/test_graph.py
    pins bit-equality of the two paths on every catalog caller's shape.

    ``broadcast_max_nodes``: the per-iteration ranks/summed joins are
    BROADCAST only while the node count (known exactly — one cheap job
    over the already-checkpointed node RDD) is at or under this bound;
    beyond it a node-count-sized broadcast is a driver/executor OOM
    (the 8 GB / 512M-row relation cap), so the loop switches to
    partitioned joins instead: edges and the node table are each
    hash-partitioned ONCE (lazy repartition — ReuseExchange collapses
    the identical edge exchange across iterations within the one final
    plan) and every per-iteration join is a SHUFFLE_HASH of the
    node-count-sized side against the pre-partitioned big side — no
    per-iteration edge exchange, no sorts. Results are identical:
    exact_folds sums in sorted order regardless of join strategy, and
    the prod path's 6dp rounding absorbs arrival order (both pinned in
    tests/test_graph.py).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # Materialize the loop-invariant inputs ONCE: edges feed every
    # iteration's join, deg every division, n_row every damping term —
    # left lazy, Catalyst re-derives the whole upstream plan (scan +
    # distinct + joins) per iteration per branch, which at sf0.1 made
    # the 3-iteration loop ~4x slower than the iteration math itself.
    # The out-degree is pre-joined INTO the edge table so each iteration
    # is exactly one (broadcast) rank join + one groupBy(dst) exchange.
    # Out-degree is fused INTO the one edge materialization as a window
    # count over src — the r12 shape (checkpoint raw edges, groupBy deg,
    # join back, checkpoint again) paid THREE serial blocking passes over
    # the edge build before the first iteration ran; the window form pays
    # one edge-build pass + one src-keyed exchange (r13: entry 6.4 s →
    # ~3.9 s at sf0.1, identical output — _od is the same count cast).
    if outdeg_col is not None:
        e = edges.select(
            "src", "dst", F.col(outdeg_col).cast("double").alias("_od")
        ).localCheckpoint(eager=True)
    else:
        e = (
            edges.select("src", "dst")
            .withColumn(
                "_od",
                F.count(F.lit(1)).over(Window.partitionBy("src")).cast("double"),
            )
            .localCheckpoint(eager=True)
        )
    # nodes is referenced TWICE PER ITERATION (the full-node-set rank
    # rebuild and, via n_row, the damping term) plus once at setup; left
    # lazy each reference re-runs the edge-wide distinct shuffle — at 3
    # iterations that is ~7 redundant Exchanges over the biggest frame
    # in the loop. One row per node → cheap to materialize once (reads
    # the edge checkpoint, not the raw edge build).
    nodes = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # ranks is node-count-sized (tiny next to edges) but derives from
    # localCheckpointed RDDs whose size Catalyst cannot estimate, so the
    # planner picked SortMergeJoin and re-shuffled the EDGE table by src
    # every iteration (r13 plan audit: 3 extra edge-wide Exchange+Sort
    # pairs). Broadcasting ranks pins the hash join and leaves the
    # groupBy(dst) exchange as the iteration's only shuffle — RIGHT
    # whenever the node set fits (the usual PageRank regime), a driver
    # OOM on a billion-node graph. r13 shipped the hint unconditionally
    # with the caveat in a comment; r14 gates it on the EXACT node count
    # (one cheap count job over the checkpointed node RDD — VERDICT r13
    # task 3). Over the bound, both loop joins become SHUFFLE_HASH
    # against pre-partitioned big sides: edges/nodes each pay ONE lazy
    # repartition that ReuseExchange collapses across iterations, so an
    # iteration costs two node-count-sized exchanges (ranks, summed) +
    # the groupBy(dst) — never an edge-wide exchange or sort.
    # The gate count doubles as the damping denominator: the collected
    # count replaces the r13 n_row aggregate + per-iteration crossJoin
    # (1 + iterations re-aggregations over the checkpointed node RDD).
    # Python's 1.0/n and 0.15/n are the same IEEE-754 double divisions
    # the JVM (and the DuckDB oracle's SELECT 0.15/n) perform — counts
    # are exact below 2^53, so the literals are bit-identical to the
    # column form they replace.
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.round(F.lit(0.0), 6).alias("rank"))
    small = n_nodes <= broadcast_max_nodes
    if small:
        hint = F.broadcast
        nodes_j = nodes
    else:
        def hint(df: DataFrame) -> DataFrame:
            return df.hint("shuffle_hash")

        e = e.repartition("src")
        nodes_j = nodes.repartition("node")
    ranks = nodes.select("node", F.lit(1.0 / float(n_nodes)).alias("rank"))
    for i in range(iterations):
        contribs = e.join(hint(ranks), e["src"] == ranks["node"]).select(
            F.col("dst").alias("node"), (F.col("rank") / F.col("_od")).alias("_c")
        )
        # exact_folds: sorted fold — bit-deterministic, what the oracle
        # gate replays. Production (exact_folds=False): plain F.sum —
        # map-side combined, no per-node list, the hot-node-safe path;
        # differs only in sub-1e-12 addition-order noise (parity test
        # pins 6dp equality).
        if exact_folds:
            summed = contribs.groupBy("node").agg(
                F.aggregate(
                    F.array_sort(F.collect_list("_c")), F.lit(0.0), lambda a, x: a + x
                ).alias("_s")
            )
        else:
            summed = contribs.groupBy("node").agg(F.sum("_c").alias("_s"))
        # Rebuild ranks over the FULL node set, not just groupBy(dst)
        # output: a node with out-edges but no in-edges (allowed by the
        # precondition) would otherwise vanish after iteration 1 and
        # take its outgoing rank mass with it. Missing sum ⇒ 0, so its
        # rank settles at the teleport floor 0.15/N. For nodes with
        # in-edges the math is bit-identical (coalesce never fires).
        # summed is ≤ |nodes| rows: broadcast it (same size gate as
        # ranks) so the full-node-set rank rebuild is a hash join against
        # the checkpointed nodes RDD instead of an Exchange+Sort of both
        # sides per iteration; over the gate it is a SHUFFLE_HASH against
        # the pre-partitioned node table.
        ranks = nodes_j.join(hint(summed), "node", "left").select(
            "node",
            (
                F.lit(0.15 / float(n_nodes))
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def pagerank_sql(
    edges_cte: str, iterations: int = 3, damping: float = 0.85
) -> str:
    """DuckDB oracle for :func:`pagerank`: the same iterations unrolled
    as CTE stages (r0 .. r{k}), with the identical sorted-fold sums and
    literal constants. ``edges_cte`` is a SELECT yielding (src, dst)."""
    parts = [
        f"WITH edges AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY 1)",
        "r0 AS (SELECT node, (SELECT 1.0/n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(iterations):
        parts.append(
            f"c{i + 1} AS (SELECT e.dst AS node, "
            f"list_sum(list_sort(list(r.rank / d.od))) AS s "
            f"FROM edges e JOIN r{i} r ON e.src = r.node "
            f"JOIN deg d ON e.src = d.src GROUP BY 1)"
        )
        parts.append(
            f"r{i + 1} AS (SELECT nd.node, "
            f"(SELECT 0.15/n FROM nn) + {damping} * COALESCE(c.s, 0.0) AS rank "
            f"FROM nodes nd LEFT JOIN c{i + 1} c ON nd.node = c.node)"
        )
    body = ",\n".join(parts)
    return f"{body}\nSELECT node, ROUND(rank, 6) AS rank FROM r{iterations}"


def orient_edges(undirected: DataFrame) -> DataFrame:
    """Orient undirected edges (a, b) from the lower-(degree, id)
    endpoint to the higher: returns (src, dst, src_deg, dst_deg). The
    orientation is a total order, so each edge appears exactly once and
    every out-neighborhood is O(sqrt(m))."""
    # one materialization: the edge list feeds the degree count AND both
    # endpoint joins below — lazy, the upstream (often a distinct over a
    # pair-expansion join) would run three times
    undirected = undirected.select("a", "b").localCheckpoint(eager=True)
    both = undirected.select(F.col("a").alias("node"), F.col("b").alias("other")).unionByName(
        undirected.select(F.col("b").alias("node"), F.col("a").alias("other"))
    )
    deg = both.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    e = (
        undirected.join(deg.withColumnsRenamed({"node": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "deg": "db"}), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.col("da")).otherwise(F.col("db")).alias("src_deg"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )


def triangle_counts(
    undirected: DataFrame,
    bloom_prefilter: bool = False,
    bloom_num_bits: int = 1 << 22,
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list (a, b) with
    a != b and each edge listed once. Returns (node, triangles) for
    nodes in >= 1 triangle.

    Degree-oriented: wedges enumerate only out-edge pairs of each node
    (ordered by the same (degree, id) total order, so each triangle is
    generated exactly once as its lowest-ordered vertex's wedge) and
    close against the oriented edge set.

    Default path (r13): per-edge out-neighborhood INTERSECTION instead
    of wedge materialization. For oriented edge (u, v), every
    z in N+(u) ∩ N+(v) closes the triangle (u, v, z) exactly once (z is
    the top of both out-edges; the wedge at u and the closing edge
    (v, z) are implied). The out-adjacency collapses to one array row
    per node — bounded at O(sqrt(m)) elements by the orientation — so
    the only data that ever crosses an exchange is m edge rows plus the
    node-count-sized adjacency table, instead of the O(m^1.5) wedge
    rows the closing join used to move (~40 bytes/edge vs 24 bytes x
    out-degree; guide §2.3 "shuffle keys and metadata instead of
    payloads"). The intersection itself is JVM-native ``array_intersect``
    over whole arrays. Measured at sf0.1 on the co-order graph:
    7.1 → 4.7 s warm, node-count parity exact.

    ``bloom_prefilter`` keeps the previous wedge+closing formulation and
    fronts its closing exchange with the repo's broadcast bloom
    (functions/bloom.py). It remains the right plan when per-node
    adjacency arrays are unwelcome (extreme hubs where even the
    O(sqrt(m))-capped array row is too large, or memory-tight reducers):
    wedge rows stream row-at-a-time and never build per-node state.
    Results are IDENTICAL on every path (the cross-implementation
    parity test pins it)."""
    # oriented edges feed three branches (adjacency + both probe joins)
    # — materialize once instead of re-deriving the orientation joins
    # per branch
    oe = orient_edges(undirected).localCheckpoint(eager=True)
    if bloom_prefilter:
        e1 = oe.select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.col("dst_deg").alias("bd"),
        )
        e2 = oe.select(
            F.col("src").alias("a"),
            F.col("dst").alias("c"),
            F.col("dst_deg").alias("cd"),
        )
        wedges = e1.join(e2, "a").filter(
            (F.col("bd") < F.col("cd"))
            | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
        )
        from kafka_streams_demo_spark.functions.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        bitmap = bloom_build(
            oe.select(
                F.concat_ws("|", F.col("src").cast("string"), F.col("dst").cast("string")).alias("k")
            ),
            "k",
            num_bits=bloom_num_bits,
        )
        wedges = wedges.filter(
            bloom_might_contain(
                bitmap,
                F.concat_ws("|", F.col("b").cast("string"), F.col("c").cast("string")),
            )
        )
        # SHUFFLE-HASH the closing join: the wedge side is O(m^1.5) rows
        # and a sort-merge join SORTS it; hashing the m-row edge side
        # instead lets wedges stream unsorted past a per-partition hash
        # map. At scale the build side is m/partitions edges per task —
        # size partitions to executor memory; Spark 3+ SHJ spills rather
        # than OOMs.
        closing = oe.select(F.col("src").alias("b"), F.col("dst").alias("c")).hint(
            "shuffle_hash"
        )
        tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
        # corners via ONE explode, not a 3-branch union: Catalyst does
        # not dedupe common subtrees across union branches (r13 plan
        # audit: the union form ran the wedge+closing join THREE times).
        corners = tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
    else:
        out_adj = oe.groupBy(F.col("src").alias("p")).agg(
            F.collect_list("dst").alias("nb")
        )
        # SHUFFLE-HASH both adjacency joins: the array table is
        # node-count-sized (hash it), edges stream past unsorted.
        cand = (
            oe.select("src", "dst")
            .join(
                out_adj.withColumnsRenamed({"p": "src", "nb": "_nu"}).hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .join(
                out_adj.withColumnsRenamed({"p": "dst", "nb": "_nv"}).hint(
                    "shuffle_hash"
                ),
                "dst",
            )
            .select(
                "src", "dst", F.explode(F.array_intersect("_nu", "_nv")).alias("z")
            )
        )
        corners = cand.select(F.explode(F.array("src", "dst", "z")).alias("node"))
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))


def triangle_counts_incremental(
    old_und: DataFrame | None = None,
    delta_und: DataFrame | None = None,
    old_counts: DataFrame | None = None,
    flagged_union: DataFrame | None = None,
) -> DataFrame:
    """Index+delta triangle maintenance: per-node counts over
    old ∪ delta edges, priced on the delta.

    Contract: ``delta_und`` contains only edges NOT in ``old_und`` (the
    caller anti-joins; edges are only ever added). Every triangle gained
    by the delta contains >= 1 delta edge, so it is found by probing the
    union adjacency from delta edges only: for delta edge (a, b), each
    union-neighbor c of a with union-edge (b, c) closes a triangle. A
    triangle with k delta edges (k = 1..3) is reachable from k probe
    edges — the flagged-adjacency canonical rule (see below) counts it
    exactly once, at its lexicographically smallest delta edge — so
    old_counts + new_corner_counts == rebuild exactly (the catalog
    registers this against the SAME oracle as the batch build).

    Each input is evaluated EXACTLY ONCE: old and delta union through a
    provenance flag into the one eager checkpoint, and every consumer —
    adjacency, the delta probe side, the closing edge set, and the old
    batch count — is a filter over that checkpoint (the inputs are
    expensive derivations in the catalog entry, and Catalyst replans a
    referenced subtree per branch — the minhash r9 lesson; previously
    the pair-build chain evaluated 3–4×).

    ``old_counts``: the PRODUCTION path — pass the persisted per-node
    count table from the last run and the old-graph batch recount is
    skipped entirely, making the whole update delta-priced. When
    omitted (the same-oracle catalog entry does, so the hash gate
    proves old + delta == rebuild), the old counts are rebuilt from the
    checkpointed old edges.

    ``flagged_union``: alternative input — ONE frame (a, b, _new) with
    the provenance flag already attached, for callers whose old/delta
    split is a column of a single derivation (the catalog entry tags
    each co-order edge old/new in one self-join+groupBy pass). Passing
    the halves separately forces the checkpoint job to evaluate the
    shared upstream once per half (Catalyst replans a referenced
    subtree per branch), plus a third time inside the anti-join that
    usually defines the delta.

    Probe (r13): per-delta-edge neighbor-set INTERSECTION. For delta
    edge (a, b), every c in N(a) ∩ N(b) over the union adjacency closes
    a gained triangle; the adjacency collapses to one row per node
    carrying two plain arrays (ALL union neighbors, OLD-edge
    neighbors), so the probe exchanges |delta| edge rows + the
    node-count adjacency table instead of Σ_delta deg(a) exploded
    candidate rows (at sf0.1 that was 147M rows into the closing
    semi-join — 10.5 s; the intersection probe is ~2 s, triple-set
    parity exact). The intersections are JVM-native ``array_intersect``;
    b ∈ N(a) never intersects (no self-loops), so the old q != b guard
    is implicit. Duplicate suppression is ROW-LOCAL (r13, second pass):
    the all/old array pair encodes each co-edge's provenance, and a
    candidate is kept only where (a, b) is the triangle's first delta
    edge in lexicographic order — replacing the shuffled distinct()
    over ~3x-duplicated sorted triples the mostly-delta fixture paid.
    Scale caveat: union adjacency arrays are FULL neighborhoods — a
    power-law hub's row is O(deg) (unlike the batch path's
    O(sqrt(m))-capped oriented arrays). At 100 TB, split hub rows or
    fall back to the row-streaming probe for the hot keys (same
    hot-key-cap discipline as the LSH bucket caps)."""
    if flagged_union is not None:
        union = flagged_union.select("a", "b", "_new").localCheckpoint(eager=True)
    else:
        union = (
            old_und.withColumn("_new", F.lit(False))
            .unionByName(delta_und.withColumn("_new", F.lit(True)))
            .localCheckpoint(eager=True)
        )
    old_e = union.filter(~F.col("_new")).select("a", "b")
    delta_e = union.filter(F.col("_new")).select("a", "b")
    # Flagged adjacency: each node's neighbor map q -> is_new(edge p,q).
    # Carrying the provenance flag into the adjacency lets the probe
    # count each gained triangle exactly once at its lexicographically
    # smallest delta edge (a ROW-LOCAL filter) instead of generating a
    # candidate per contained delta edge (~3x triangles on a
    # mostly-delta graph) and collapsing them through a shuffled
    # distinct() over sorted triples (guide §2.4 — the removed exchange
    # carried the full candidate set; r13: probe 4.1 -> ~2 s at sf0.1).
    adj = union.select(
        F.col("a").alias("p"), F.col("b").alias("q"), F.col("_new").alias("f")
    ).unionByName(
        union.select(
            F.col("b").alias("p"), F.col("a").alias("q"), F.col("_new").alias("f")
        )
    )
    # Two plain arrays per node: ALL union neighbors and OLD-edge
    # neighbors (collect_list drops the when()'s nulls). Plain long
    # arrays keep the canonical-rule intersections on the native
    # hash-based array_intersect — a neighbor->flag map was measured
    # 40% WORSE here because element_at on a Spark MapType is a linear
    # scan per lookup (maps are unsorted entry arrays).
    adj_arr = adj.groupBy("p").agg(
        F.collect_list("q").alias("nb"),
        F.collect_list(F.when(~F.col("f"), F.col("q"))).alias("nbo"),
    )
    # SHUFFLE-HASH both adjacency joins: hash the node-count-sized
    # array table per partition, delta edges stream past unsorted.
    # Normalize the probe edge to lo < hi (the undirected contract does
    # not promise column order) so the canonical-edge case analysis
    # below is well-defined.
    a_lo = F.col("a") < F.col("b")
    joined = (
        delta_e.join(
            adj_arr.withColumnsRenamed(
                {"p": "a", "nb": "_na", "nbo": "_noa"}
            ).hint("shuffle_hash"),
            "a",
        )
        .join(
            adj_arr.withColumnsRenamed(
                {"p": "b", "nb": "_nb", "nbo": "_nob"}
            ).hint("shuffle_hash"),
            "b",
        )
        .select(
            F.least("a", "b").alias("lo"),
            F.greatest("a", "b").alias("hi"),
            F.when(a_lo, F.col("_na")).otherwise(F.col("_nb")).alias("_nl"),
            F.when(a_lo, F.col("_noa")).otherwise(F.col("_nob")).alias("_nol"),
            F.when(a_lo, F.col("_nb")).otherwise(F.col("_na")).alias("_nh"),
            F.when(a_lo, F.col("_nob")).otherwise(F.col("_noa")).alias("_noh"),
        )
    )
    # For delta edge (lo, hi) and common neighbor c, the sorted triple's
    # edges in lexicographic order are:
    #   c < lo:        (c,lo) < (c,hi) < (lo,hi)
    #   lo < c < hi:   (lo,c) < (lo,hi) < (c,hi)
    #   c > hi:        (lo,hi) < (lo,c) < (hi,c)
    # Count the triangle here iff (lo, hi) is its FIRST delta edge —
    # i.e. every lexicographically earlier edge is old. The three
    # c-ranges are disjoint, so the concat never duplicates; each range
    # draws from the intersection that encodes exactly its required
    # old-edge constraints.
    lo_c, hi_c = F.col("lo"), F.col("hi")
    closers = F.concat(
        F.filter(F.array_intersect("_nl", "_nh"), lambda c: c > hi_c),
        F.filter(
            F.array_intersect("_nol", "_nh"),
            lambda c: (c > lo_c) & (c < hi_c),
        ),
        F.filter(F.array_intersect("_nol", "_noh"), lambda c: c < lo_c),
    )
    cand = joined.select("lo", "hi", closers.alias("_cs")).select(
        "lo", "hi", F.explode("_cs").alias("c")
    )
    new_corners = (
        cand.select(F.explode(F.array("lo", "hi", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    if old_counts is None:
        old_counts = triangle_counts(old_e)
    old_counts = old_counts.withColumnRenamed("triangles", "_old")
    return (
        old_counts.join(new_corners, "node", "full_outer")
        .select(
            "node",
            (
                F.coalesce(F.col("_old"), F.lit(0))
                + F.coalesce(F.col("_new"), F.lit(0))
            ).alias("triangles"),
        )
    )


def triangle_counts_sql(edges_cte: str) -> str:
    """DuckDB oracle replaying :func:`triangle_counts` step for step.
    ``edges_cte`` yields (a, b), each undirected edge once."""
    return f"""
WITH und AS ({edges_cte}),
both_dirs AS (SELECT a AS node, b AS other FROM und
              UNION ALL SELECT b AS node, a AS other FROM und),
deg AS (SELECT node, count(*) AS dg FROM both_dirs GROUP BY 1),
oe AS (SELECT CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
                   THEN u.a ELSE u.b END AS src,
              CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
                   THEN u.b ELSE u.a END AS dst,
              CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
                   THEN db.dg ELSE da.dg END AS dst_deg
       FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
wedges AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
           FROM oe e1 JOIN oe e2 ON e1.src = e2.src
           WHERE e1.dst_deg < e2.dst_deg
              OR (e1.dst_deg = e2.dst_deg AND e1.dst < e2.dst)),
tris AS (SELECT w.a, w.b, w.c FROM wedges w
         JOIN oe ON w.b = oe.src AND w.c = oe.dst),
corners AS (SELECT a AS node FROM tris
            UNION ALL SELECT b FROM tris
            UNION ALL SELECT c FROM tris)
SELECT node, count(*) AS triangles FROM corners GROUP BY 1
"""


def powerlaw_edges(spark, n_nodes: int, edge_factor: int = 4) -> DataFrame:
    """Seeded power-law random graph (Chung–Lu style, degree exponent
    γ ≈ 3): the triangle-census grading fixture the TPC-H co-purchase
    graph cannot be (VERDICT r10 task 5 — the synthetic co-order graph
    is degenerately dense, ~every wedge closes; real catalog/co-visit
    graphs are power-law-sparse with a few hubs).

    Construction (closed-form, iteration-free, so the DuckDB oracle can
    replay it exactly — see :func:`powerlaw_edges_cte`):

    - ``edge_factor·n`` endpoint-pair draws, indexed t = 0..m-1;
    - per draw, two md5-60-bit uniforms u = (h(t:side)+0.5)/2^60;
    - inverse-CDF power map ``node = floor(n·u²)`` — node i is drawn
      with probability ∝ ((i+1)^½ − i^½) ≈ ½·i^(−½), i.e. expected
      degree ∝ i^(−½), a Zipf weight whose resulting degree
      distribution is power-law with exponent γ = 1 + 1/½ = 3 (web
      graphs sit at γ ≈ 2.1–2.9; hubs get degree ~√n·edge_factor);
    - drop self-loops, canonicalize a<b, dedup multi-edges.

    Deterministic across runs/engines/partitionings (the md5-60-bit
    idiom shared with sample/split/pareto); both engines evaluate the
    identical double expressions left-associated, so the floor cell
    boundaries agree bit-for-bit. Scale: generation is a map-only pass
    over ``spark.range`` plus ONE dedup shuffle — at any size the graph
    materializes in O(edges) with no driver involvement."""
    draws = spark.range(edge_factor * n_nodes).select(F.col("id").alias("t"))

    def node(tag: str):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.col("t").cast("string"), F.lit(tag))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
        return F.floor(F.lit(float(n_nodes)) * u * u).cast("long")

    e = draws.select(node(":s").alias("_s"), node(":d").alias("_d"))
    return (
        e.filter(F.col("_s") != F.col("_d"))
        .select(
            F.least("_s", "_d").alias("a"), F.greatest("_s", "_d").alias("b")
        )
        .distinct()
    )


def powerlaw_edges_cte(n_from: str = "SELECT count(*) FROM documents",
                       edge_factor: int = 4) -> str:
    """DuckDB CTE body replaying :func:`powerlaw_edges` bit-for-bit,
    with n derived from the data (``n_from``) so the oracle follows the
    scale factor. Yields (a, b), each undirected edge once."""
    return f"""
SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM (
  SELECT CAST(floor(n * u1 * u1) AS BIGINT) AS s,
         CAST(floor(n * u2 * u2) AS BIGINT) AS d
  FROM (
    SELECT n,
      (('0x' || substr(md5(t::VARCHAR || ':s'), 1, 15))::BIGINT + 0.5)
        / 1152921504606846976.0 AS u1,
      (('0x' || substr(md5(t::VARCHAR || ':d'), 1, 15))::BIGINT + 0.5)
        / 1152921504606846976.0 AS u2
    FROM (SELECT unnest(range(0, {edge_factor} * n)) AS t, n
          FROM (SELECT ({n_from}) AS n))
  )
) WHERE s <> d
"""
