"""Distributed graph primitives for dedup clustering.

Connected components — the map-reduce CC used to turn near-duplicate
PAIRS (MinHash-LSH / SimHash / Jaccard candidates) into keep/drop
CLUSTERS keyed by the minimum member id.

Two algorithms, one contract ((vertex, label = component min)):

- :func:`connected_components` (the DEFAULT, round 9): alternating
  LARGE-STAR / SMALL-STAR (Kiveris et al., "Connected Components in
  MapReduce and Beyond") — each phase rewires edges toward local
  minima, converging in O(log n) rounds REGARDLESS of diameter.  A
  100 TB web-ish near-dup graph can have diameter far beyond any
  sane fixed round budget; min-label propagation needs
  diameter-many rounds, star-contraction does not (verdict r8 ask
  #5).
- :func:`connected_components_minlabel`: the O(diameter) min-label
  propagation kept as the independent reference twin (pytest
  compares the two on fuzzed graphs).

Scale notes (100 TB):
- Each round is a constant number of edge-keyed shuffles (uniform
  keys, no skew beyond the graph's own degree distribution, which
  the upstream pair generators already cap).
- Every round localCheckpoints the edge/label frontier (breaking the
  O(rounds) lineage that would otherwise recompute every prior join
  on each action), and the loop EXITS ONLY on a measured fixpoint.
  ``max_rounds`` is a safety valve that raises rather than returning
  a partially contracted labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ConvergenceError(RuntimeError):
    """Label propagation hit max_rounds before reaching a fixpoint."""


def _local_union_find(canon: DataFrame) -> DataFrame:
    """Driver-side finish: union-find over a BOUNDED collected edge
    set (the caller guarantees the count), labels = component min.
    Returns the same (vertex, label) contract with the edge columns'
    type preserved."""
    rows = canon.collect()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r.hi), find(r.lo)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from pyspark.sql import types as T

    vt = canon.schema["hi"].dataType
    schema = T.StructType(
        [T.StructField("vertex", vt, True), T.StructField("label", vt, True)]
    )
    spark = canon.sparkSession
    return spark.createDataFrame(
        [(v, find(v)) for v in parent], schema
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    local_finish_edges: int = 100_000,
) -> DataFrame:
    """(vertex, label) with label = min vertex id in the component,
    via alternating large-star/small-star contraction (O(log n)
    rounds; see module docstring).

    HYBRID finish: star contraction shrinks the edge set
    geometrically, and once the (canonicalized, contracted) edge
    count is <= ``local_finish_edges`` the remaining work is a
    driver-side union-find over a bounded collect — the standard
    production shape (each distributed round costs several fixed
    jobs; paying them to contract a graph that already fits in one
    task is pure overhead).  At 100 TB the banding/candidate caps
    upstream bound pair counts long before vertex counts, so most
    dedup graphs take the local path immediately and adversarial
    giants contract first.  Pass ``local_finish_edges=0`` to force
    the pure-distributed path (the fuzz/diameter tests do).

    ``edges`` is treated as undirected; isolated vertices (absent from
    ``edges``) are absent from the result — callers union them back if
    singleton clusters matter.  Self-loops and duplicate edges are
    tolerated.

    Semantics anchor: the reference keeps ONE row per duplicate group
    during ingest (reference ingest.py ON CONFLICT keep-first); this
    generalizes that to transitive near-dup groups, same min-id
    representative rule.

    Round shape: LARGE-STAR attaches every neighbor v > u to
    m = min(N(u) + {u}); SMALL-STAR attaches u and its smaller
    neighbors to m = min(smaller neighbors + {u}).  Both preserve
    connectivity and only move edges toward smaller ids; at the
    fixpoint every component is a star centered on its minimum.  The
    edge set is kept canonical (hi > lo) between rounds.
    """
    canon = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .distinct()
        .localCheckpoint(eager=False)  # materialized by the count below
    )
    # singleton-edge-set graphs converge in round 1; the loop always
    # runs at least once so the star property is established.
    # n_canon is carried between rounds so the fixpoint check costs
    # one count job + (only on count equality) one anti-join probe —
    # never a recount of the already-materialized previous frontier.
    n_canon = canon.count()
    for _ in range(max_rounds):
        if n_canon <= local_finish_edges:
            return _local_union_find(canon)
        # LARGE-STAR over the symmetric adjacency
        nbr = canon.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionAll(
            canon.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = (
            nbr.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", "u").alias("m"))
        )
        after_large = (
            nbr.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # SMALL-STAR over the high->low orientation
        smins = after_large.groupBy("hi").agg(F.min("lo").alias("m"))
        after_small = (
            after_large.join(smins, "hi")
            .select(F.col("lo").alias("x"), F.col("m"))
            .unionAll(smins.select(F.col("hi").alias("x"), F.col("m")))
            .filter(F.col("x") != F.col("m"))
            .select(F.greatest("x", "m").alias("hi"), F.least("x", "m").alias("lo"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # fixpoint: the canonical edge set is unchanged (both sides
        # are distinct, so equal cardinality + subset <=> equal sets).
        # count() both materializes the lazy checkpoint and yields the
        # cardinality — one job instead of two per round.
        n_new = after_small.count()
        unchanged = (
            n_new == n_canon
            and after_small.join(canon, ["hi", "lo"], "left_anti").limit(1).count() == 0
        )
        canon, n_canon = after_small, n_new
        if unchanged:
            return (
                canon.select(F.col("hi").alias("vertex"), F.col("lo").alias("label"))
                .unionAll(
                    canon.select(F.col("lo").alias("vertex"), F.col("lo").alias("label"))
                )
                .distinct()
            )
    # Last-chance local finish: the threshold is tested at the TOP of
    # each round, so when the max_rounds-th contraction shrinks the edge
    # set under the bound the loop exhausts with a graph a bounded
    # driver-side union-find can still finish — do that before failing.
    if n_canon <= local_finish_edges:
        return _local_union_find(canon)
    raise ConvergenceError(
        f"connected_components: no fixpoint after {max_rounds} rounds "
        "(star contraction is O(log n) rounds; raise max_rounds)"
    )


def connected_components_minlabel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """(vertex, label) via min-label propagation — O(diameter) rounds.

    Kept as the independent reference twin for the star-contraction
    default (different algorithm, same contract); prefer
    :func:`connected_components` everywhere diameter is not known to
    be small.
    """
    nbr = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .distinct()
        # eager: round 1's probe job reads nbr through TWO legs (the
        # labels derivation and the nbr_min join scan) and each later
        # round adds another independent scan leg — a lazy mark
        # recomputes the symmetric-adjacency distinct per leg
        .localCheckpoint(eager=True)
    )
    labels = (
        nbr.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=False)  # lazy: round 1's two legs may
        # each run the vertex distinct once, but over the MATERIALIZED
        # nbr that duplicate is one cheap shuffle — not worth an eager
        # round-trip; from round 2 on the frame is persisted
    )
    for _ in range(max_rounds):
        nbr_min = (
            nbr.join(labels.select(F.col("vertex").alias("dst"), "label"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.vertex == nbr_min.src, "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint(eager=False)  # one materialization serves both
        )
        # the count below materializes the checkpoint (full compute of
        # the lazily-marked RDD) AND probes the fixpoint in one job
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise ConvergenceError(
        f"connected_components_minlabel: no fixpoint after {max_rounds} "
        "rounds (graph diameter exceeds the safety valve; raise "
        "max_rounds, or use connected_components — star contraction "
        "is O(log n) rounds)"
    )


def cluster_summary(labels: DataFrame) -> DataFrame:
    """Per-cluster (cluster_id, n_members, min_doc, max_doc) rollup."""
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").alias("n_members"),
            F.min("vertex").alias("min_doc"),
            F.max("vertex").alias("max_doc"),
        )
        .select(F.col("label").alias("cluster_id"), "n_members", "min_doc", "max_doc")
    )


#: Fixed-point scale for PageRank mass: the total rank of 1.0 is
#: SCALE integer units, so per-node ranks keep ~6 significant digits
#: even at a billion nodes while every sum stays an exact BIGINT.
PAGERANK_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, in EXACT
    integer fixed-point arithmetic.

    Every float formulation of PageRank is hash-gate-hostile: the
    per-vertex incoming sum is order-dependent in double arithmetic.
    Here rank is BIGINT units of PAGERANK_SCALE (total mass 1.0), all
    divisions are integer DIV (truncation — identical in Spark and
    DuckDB for the non-negative values involved), and sums are exact,
    so any partitioning and any engine produces bit-identical ranks.
    Truncation leaks ~1 unit of mass per division — a 1e-12 relative
    signal loss, irrelevant to ranking and a price worth paying for
    reproducibility.

    Per iteration:
        contrib(u->v) = rank[u] DIV out_deg[u]
        rank'[v] = (100-d)% * (SCALE DIV N) DIV 100
                 + d% * (sum_in(v) + dangling DIV N) DIV 100
    where dangling = total rank of vertices with no out-edges (a
    1-row aggregate probe, the standard mass patch — collected to the
    driver and folded back as a literal).

    Scale: each iteration is one join on src (uniform vertex key), one
    shuffle-agg on dst, and one 1-row scalar probe — O(E) rows moved
    per round, never materializing anything wider than (vertex,
    BIGINT).  The (rank, out_deg) frontier localCheckpoints per round
    so lineage stays O(1) across iterations (the connected_components
    discipline), and the probe job doubles as its materializer.
    ``iterations`` is fixed, not converged: PageRank-as-a-feature
    (quality weighting for domain graphs) wants a deterministic cost,
    and the oracle unrolls the same fixed count.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    if not assume_distinct:
        # multi-edges would double-count contributions; dedup unless
        # the caller certifies distinctness (skips a full edge-list
        # shuffle — at 1e9 edges the single biggest avoidable cost
        # here, since everything after moves only vertex-scale rows
        # plus one contribution row per edge)
        e = e.distinct()
    # e MUST be eager: a lazily-marked frame read by several concurrent
    # stage legs of its first job is recomputed per leg (the two union
    # scans of `nodes` below, plus every iteration's contribution-join
    # map stage — all independent, all schedulable at job start).
    # Measured: lazy-e pagerank paid the edge distinct multiple times.
    # nodes stays lazy: its single consumer is the count below, which
    # materializes it in one fused job (was a second eager round-trip).
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_units", F.lit(0).cast("bigint"))
    base = (100 - damping_pct) * (PAGERANK_SCALE // n) // 100
    # lazy: first (and only) computed leg is iteration 1's dangling
    # probe job below, which materializes it for every later round
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(
        eager=False
    )
    rank = nodes.withColumn(
        "rank_units", F.lit(PAGERANK_SCALE // n).cast("bigint")
    )
    for _ in range(iterations):
        # The (rank, out_deg) frame feeds BOTH the dangling scalar and
        # the contribution join.  Checkpoint it lazily and read the
        # dangling mass with a driver collect: the probe job is the
        # single first toucher, so it materializes the cache AND
        # answers the scalar in one job (the r13 probe-fusion rule) —
        # the r13 form broadcast the scalar instead, and the broadcast
        # job raced the main action's contribution leg over the
        # unmaterialized rank frontier, recomputing a leg per
        # iteration (measured +7% task time; r14 fix).
        ranked = (
            rank.join(deg, rank.node == deg.src, "left")
            .select("node", "rank_units", "out_deg")
            .localCheckpoint(eager=False)
        )
        dang = int(
            ranked.agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("out_deg").isNull(), F.col("rank_units"))
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("_dang")
            ).collect()[0][0]
        )
        per_src = ranked.filter(F.col("out_deg").isNotNull()).select(
            F.col("node").alias("src"),
            F.expr("rank_units DIV out_deg").alias("_c"),
        )
        contrib = (
            e.join(per_src, "src")
            .select(F.col("dst").alias("node"), "_c")
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # dang DIV n in exact Python integer arithmetic (both
        # non-negative), folded into the expression as a literal —
        # bit-identical to the former broadcast column
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_pct} * (coalesce(_in, 0) "
                    f"+ {dang // n})) DIV 100"
                )
            )
            .cast("bigint")
            .alias("rank_units"),
        )
        # rank needs no checkpoint of its own: its single consumer is
        # the next round's probe job (or the caller's one action),
        # and its lineage is already O(1) — two cached inputs deep
    return rank


def k_core(
    edges: DataFrame,
    k: int,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every vertex keeps degree >= k, found by iterative peeling —
    repeatedly drop sub-k vertices until a measured fixpoint.

    Returns (v, core_degree) with degree counted INSIDE the core.

    Scale notes: each peel round is one degree aggregate plus two
    semi-joins on vertex keys (the surviving-edge filter) — O(E) rows
    per round, uniform keys.  Rounds needed = peel depth (the
    degeneracy ordering's layer count), which is small for the
    power-law graphs this targets; the edge frontier localCheckpoints
    per round so lineage stays O(1) (the connected_components
    discipline), and the loop exits only when a round drops zero
    vertices.  ``max_rounds`` raises rather than silently returning a
    partially peeled graph.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    nbr = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        .distinct()
        # lazily marked: the first action over a descendant computes
        # (once — shared RDD) and persists it; an eager checkpoint here
        # was a whole extra driver round-trip per call
        .localCheckpoint(eager=False)
    )
    n_live = nbr.select("src").distinct().count()
    for _ in range(max_rounds):
        deg = nbr.groupBy("src").agg(F.count("*").alias("d"))
        # fused: count() materializes the lazily-marked checkpoint and
        # answers the fixpoint probe in ONE job (was two round-trips)
        keep = deg.filter(F.col("d") >= k).select("src").localCheckpoint(
            eager=False
        )
        n_keep = keep.count()
        if n_keep == n_live:
            return (
                nbr.groupBy("src")
                .agg(F.count("*").cast("bigint").alias("core_degree"))
                .select(F.col("src").alias("v"), "core_degree")
            )
        nbr = (
            nbr.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=False)  # next round's probe computes it
        )
        n_live = n_keep
        if n_live == 0:
            return nbr.select(
                F.col("src").alias("v"),
                F.lit(0).cast("bigint").alias("core_degree"),
            )
    raise ConvergenceError(
        f"k_core: no fixpoint after {max_rounds} peel rounds"
    )


def bfs_distances(
    edges: DataFrame,
    source: int,
    a: str = "a",
    b: str = "b",
    max_depth: int = 12,
) -> DataFrame:
    """Unweighted BFS hop distances from ``source`` over an undirected
    edge list, up to ``max_depth`` hops.  Returns (v, dist).

    The frontier-expansion form: each round joins the current frontier
    against the adjacency list (one shuffle on the frontier key),
    dedups the discovered vertices, and anti-joins the settled set so
    every vertex is labeled with its FIRST (minimum) hop count — the
    classic BSP BFS, O(E) work per level, frontier materialized with
    localCheckpoint so lineage is O(1) across levels.  ``max_depth``
    is a semantic cap (n-hop reachability), not a convergence valve:
    the loop also exits early the moment a frontier comes back empty.
    """
    nbr = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        .distinct()
        # lazily marked: the first action over a descendant computes
        # (once — shared RDD) and persists it; an eager checkpoint here
        # was a whole extra driver round-trip per call
        .localCheckpoint(eager=False)
    )
    spark = edges.sparkSession
    settled = spark.createDataFrame(
        [(source, 0)], "v: bigint, dist: int"
    ).localCheckpoint(eager=False)
    frontier = settled.select(F.col("v").alias("src"))
    # the dedup target per level: in an UNDIRECTED graph (nbr is
    # symmetric by construction above) any neighbor of a distance-
    # (d-1) vertex has distance in {d-2, d-1, d}, so a candidate can
    # only collide with the last TWO levels — the anti-join runs
    # against those O(frontier)-sized frames instead of the whole
    # settled union, turning O(depth x |settled|) total anti-join
    # build input into O(|V|) across the run (§2.3: shuffle fewer
    # bytes).  `settled` still accumulates every level for the return.
    recent = settled.select("v")
    prev: DataFrame | None = None
    for depth in range(1, max_depth + 1):
        # ONE job per level: eager=False + count() materializes the
        # checkpoint AND answers the emptiness probe in the same job
        # (eager=True ran an internal count, then limit(1).count() was
        # a SECOND driver round-trip — guide §1.2: per-level job count
        # is the scheduling overhead that dominates BSP loops).  The
        # settled set stays a union of the already-materialized level
        # RDDs — re-checkpointing the union copied every settled row
        # once per level for no lineage benefit (each leaf is O(1)).
        anti = recent if prev is None else prev.unionByName(recent)
        discovered = (
            nbr.join(frontier, "src")
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(anti, "v", "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
            .localCheckpoint(eager=False)
        )
        if discovered.count() == 0:
            break
        settled = settled.unionByName(discovered)
        frontier = discovered.select(F.col("v").alias("src"))
        prev, recent = recent, discovered.select("v")
    return settled


def copurchase_pairs(
    items: DataFrame,
    order_col: str = "l_orderkey",
    part_col: str = "l_partkey",
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Co-occurrence pairs (lo < hi) of ``part_col`` values sharing an
    ``order_col`` group — one row per (group, pair), duplicates within
    a group removed.  The co-purchase edge generator behind the graph
    queries.

    Replaces the orderkey self-join formulation (two aliased scans,
    exchange + two sorts + merge join): groupBy collects each group's
    DISTINCT sorted part set in ONE exchange of the input projection
    (no sort — hash aggregate), and the pair expansion runs map-side
    as array ops, quadratic only within a group (the same fan-out the
    join produced).  Measured at sf0.1 (A/B, min-of-3 warm, identical
    count + position-weighted checksum): 2.55 s -> 1.85 s for the
    isolated subtree.  At scale the saving is the self-join's
    O(E log E) per-side sort and its second scan; the remaining
    shuffles (one group exchange here, whatever dedup/count the
    caller adds) match the algorithm's floor.

    Callers needing the distinct edge SET add .distinct() (unchanged
    from the self-join form); support-counting callers group the
    per-order rows directly — collect_set already provides the
    per-group dedup the old form got from an up-front
    ``items.distinct()``.  Groups with one part yield no rows
    (explode of an empty array), matching the self-join.

    Group-size bound assumption: "same fan-out as the join" covers
    ROW COUNT, not peak per-row memory — the flatten materializes one
    group's full O(k^2) pair array in a single row before the explode,
    where the merge join streamed its output.  Fine for the bounded
    group sizes of this data model (orders hold tens of parts); a hub
    group with k in the tens of thousands would build a k^2-struct
    array in one task row and should fall back to the self-join (or a
    posexplode + per-row slice expansion) for that key class.
    """
    for name in (order_col, part_col, lo, hi):
        if not name.isidentifier():
            # the names are interpolated into an F.expr SQL string
            # below; a space/keyword/hyphen would parse wrong there
            raise ValueError(f"column name {name!r} is not a plain identifier")
    return (
        items.groupBy(order_col)
        .agg(F.sort_array(F.collect_set(part_col)).alias("_ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(_ps, (x, i) -> "
                    "transform(slice(_ps, i + 2, size(_ps)), "
                    f"y -> struct(x AS `{lo}`, y AS `{hi}`))))"
                )
            ).alias("_e")
        )
        .select(f"_e.{lo}", f"_e.{hi}")
    )


def triangle_counts(
    edges: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Per-vertex triangle counts over an UNDIRECTED distinct edge
    list — the clustering/community signal (and the classic test of
    join discipline at scale).

    The naive triangle join explodes on hub vertices (fan-out =
    deg^2 on the wedge pivot).  The standard fix (Chiba-Nishizeki /
    Suri-Vassilvitskii): orient every edge from the (degree, id)-
    smaller endpoint to the larger, so every wedge pivots on its
    LOWEST-degree vertex — per-vertex fan-out is bounded by
    arboricity^2, not degree^2, and each triangle is generated
    exactly once (its orientation under a total order is unique).
    Three shuffles total: degree agg, wedge self-join on the pivot,
    closing-edge semi-join.  Orientation changes WHICH joins run,
    never the result — an id-ordered brute force (the oracle) yields
    the identical triangle set.
    """
    und = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        # eager: the orientation job reads und through THREE stage
        # legs (deg's two union scans + keyed's join spine), and the
        # caller's `edges` is often an expensive un-persisted subtree
        # (the co-purchase queries pass a lineitem self-join).  Within
        # one job ReusedExchange already dedups the shuffle WRITE, but
        # each consuming stage re-runs the reduce-side distinct, and a
        # non-exchange parent subtree would be recomputed whole.
        # Measured at sf0.1 (steal-bracketed min-of-3):
        # triangle_count_copurchase task time 109 s -> 96 s.
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("lo").alias("v"))
        .unionAll(und.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # orientation key: (degree, id) compared lexicographically — exact
    # at ANY id range (packing into d*1e9+id would collide or misorder
    # once vertex ids reach 1e9, exactly the scale this module
    # targets).  The comparison is written out field-wise over plain
    # BIGINT columns instead of materializing (d, i) STRUCTs: the id
    # field would duplicate the vertex column already carried, so the
    # struct form stored 6 longs + struct headers per checkpointed row
    # and shipped a 2-long struct per wedge-join side where one
    # degree column suffices (§2.3 shuffle fewer bytes / narrower
    # types).  (dlo, lo) < (dhi, hi) field-wise IS the struct order —
    # bit-identical orientation, wedge set unchanged.
    keyed = (
        und.join(deg.withColumnRenamed("v", "lo").withColumnRenamed("d", "dlo"), "lo")
        .join(deg.withColumnRenamed("v", "hi").withColumnRenamed("d", "dhi"), "hi")
    )
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = keyed.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lo_first, F.col("dhi")).otherwise(F.col("dlo")).alias("dv"),
    ).localCheckpoint(eager=True)  # feeds the wedge join twice +
    # closure — THREE concurrent stage legs of the same first job.  A
    # lazy mark here is NOT computed once: un-materialized RDD legs
    # race and each recomputes the orientation (degree agg + two
    # joins).  Measured at sf0.1: lazy cost +48% task time on
    # triangle_count_copurchase; the one eager round-trip is cheap
    # insurance.
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = (
        e1.join(e2, "u")
        # (dx, x) < (dy, y): same lexicographic wedge-ordering test the
        # struct comparison ran, on the narrow columns
        .filter(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
        .select("u", "x", "y")
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"])
    per_vertex = (
        tris.select(F.explode(F.array("u", "x", "y")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    return per_vertex


def bellman_ford(
    edges: DataFrame,
    source,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Cheapest-path costs from ``source`` within ``rounds`` hops by
    synchronous min-plus relaxation (distributed Bellman-Ford) over a
    DIRECTED edge list with non-negative BIGINT weights.  Returns
    (v, dist) for every vertex reachable in <= rounds hops.

    Integer weights make every min() exact — no float path-sum ties
    to diverge between engines or partitionings (the pagerank
    fixed-point discipline applied to shortest paths).  Each round is
    one frontier-edge join + one min-aggregate on the vertex key:
    O(E) rows moved, localCheckpoint keeps lineage O(1).  ``rounds``
    is semantic (cheapest path USING AT MOST k hops — run V-1 rounds
    for the unrestricted answer); BFS (bfs_distances) is this
    operator with unit weights, kept separate because its
    settled-set anti-join prunes work that weighted relaxation must
    redo when a cheaper longer path arrives late.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(w).cast("bigint").alias("w"),
        )
        .filter(F.col("src") != F.col("dst"))
        # eager: with fixed rounds and no probes the whole relaxation
        # is ONE job, and every round's frontier-edge-join map stage
        # scans e independently (all schedulable at job start) — a
        # lazy mark would recompute e once per round
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(source, 0)], schema=e.select("src").schema.add("dist", "long")
    ).withColumnsRenamed({"src": "v"}).localCheckpoint(eager=False)
    for _ in range(rounds):
        cand = (
            dist.join(e, dist.v == e.src)
            .select(
                F.col("dst").alias("v"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("v")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            # lazy: rounds are FIXED (no per-round probe), so the whole
            # relaxation executes as ONE multi-stage job at the
            # caller's action; each round's frame still persists (and
            # truncates lineage) as that job computes it
            .localCheckpoint(eager=False)
        )
    return dist


def label_propagation(
    edges: DataFrame,
    rounds: int,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Synchronous label-propagation community detection (LPA): every
    vertex simultaneously adopts the most frequent label among its
    neighbors, ties to the SMALLEST label, for a FIXED number of
    rounds.  Returns (v, label).

    Fixed rounds, not convergence: synchronous LPA can oscillate on
    bipartite structures, so a fixpoint test would hang — a fixed
    count is deterministic in both result and cost (the pagerank
    discipline), and the caller picks rounds ~ diameter of the
    communities sought.  Determinism inside a round: the adopted
    label is argmax over (count, -label) — an exact integer
    comparison, no hash-partition order dependence.  Per round: one
    edge-label join + one (vertex, label) count + one per-vertex
    max-struct aggregate, O(E) rows, localCheckpoint O(1) lineage.
    Unlike connected_components (which finds CONNECTIVITY classes),
    LPA finds DENSITY classes — two communities joined by one bridge
    edge stay separate here but merge under CC.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    nbr = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        .distinct()
        # eager: fixed rounds, no probes — the caller's ONE job holds
        # every round's nbr-scan map stage plus the labels derivation,
        # all independent legs; a lazy mark recomputes the symmetric
        # adjacency per leg instead of once
        .localCheckpoint(eager=True)
    )
    labels = (
        nbr.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=False)  # single consumer (round 1's
        # join) over the materialized nbr
    )
    for _ in range(rounds):
        counted = (
            nbr.join(
                labels.select(F.col("v").alias("dst"), "label"), "dst"
            )
            .groupBy(F.col("src").alias("v"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            counted.groupBy("v")
            .agg(
                F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))
                .alias("_top")
            )
            .select("v", (-F.col("_top.nl")).alias("label"))
            # lazy: fixed rounds, no probe — the caller's one action
            # runs the whole propagation as one multi-stage job
            .localCheckpoint(eager=False)
        )
    return labels


#: Fixed-point scale for HITS scores: after each normalization every
#: hub/authority score is <= HITS_SCALE, so the next round's raw sums
#: are bounded by HITS_SCALE * max_degree — exact BIGINTs far below
#: 2^63 at any realistic degree.
HITS_SCALE = 1_000_000


def hits(
    edges: DataFrame,
    iterations: int = 2,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg's hubs-and-authorities) over a
    directed edge list in EXACT integer fixed-point arithmetic —
    returns (node, hub_units, auth_units).

    Same reproducibility stance as :func:`pagerank`: float HITS is
    hash-gate-hostile (order-dependent double sums, an L2 norm), so
    scores are BIGINT units and each half-step max-normalizes with an
    exact ceiling divisor ``s = max(1, ceil(raw_max / HITS_SCALE))``
    and integer DIV — any partitioning and any engine produces
    bit-identical scores (max-normalization is a standard HITS
    variant; only the scale of the scores differs from the L2 form,
    never the ranking for uniform divisors).

    Per iteration: auth_raw(v) = sum of hub(u) over in-edges, then
    normalize; hub_raw(u) = sum of the NEW auth(v) over out-edges,
    then normalize — the standard Gauss-Seidel ordering.  Each
    half-step is one join on a vertex key plus one shuffle-agg and a
    1-row max broadcast; O(E) rows per round, localCheckpoint keeping
    lineage O(1).  ``iterations`` is fixed, not converged, for a
    deterministic cost; the oracle unrolls the same fixed count.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    if not assume_distinct:
        e = e.distinct()
    # BOTH eager: `nodes`' two union scans read e concurrently, and
    # round 1's a_max job reads nodes through two legs (the hub seed
    # and the left-join spine) while every round's e-scan map stage is
    # schedulable at job start — lazy marks here recompute the
    # distincts per leg instead of once (see pagerank's e note).
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    norm_expr = (
        f"_raw DIV greatest(CAST(1 AS BIGINT), "
        f"(_max + {HITS_SCALE - 1}) DIV {HITS_SCALE})"
    )
    hub = nodes.withColumn("hub_units", F.lit(HITS_SCALE).cast("bigint"))
    auth = None
    # NOTE (r14 ask #8 A/B): the pagerank-style probe-fused collect
    # was trialled here and REVERTED — in hits the Gauss-Seidel chain
    # makes every max broadcast a sequential dependency of the next
    # half-step, so the single final action computes each score frame
    # once with ReusedExchange (measured: 43 jobs / 115 TASKS under
    # both forms — no duplicate work to remove, unlike pagerank's
    # racing dangling leg), and the collect form only added 4 driver
    # sync points (task_sec median 14.6 vs 13.9 here).
    for _ in range(iterations):
        a_raw = (
            e.join(hub.select(F.col("node").alias("src"), "hub_units"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_units").cast("bigint").alias("_raw"))
        )
        a_all = nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce("_raw", F.lit(0)).cast("bigint").alias("_raw")
        )
        a_max = a_all.agg(F.max("_raw").cast("bigint").alias("_max"))
        auth = (
            a_all.crossJoin(F.broadcast(a_max))
            .select("node", F.expr(norm_expr).cast("bigint").alias("auth_units"))
            # lazy: the h_max broadcast job (which scans auth) or the
            # final join materializes it — no eager round-trip
            .localCheckpoint(eager=False)
        )
        h_raw = (
            e.join(auth.select(F.col("node").alias("dst"), "auth_units"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_units").cast("bigint").alias("_raw"))
        )
        h_all = nodes.join(h_raw, "node", "left").select(
            "node", F.coalesce("_raw", F.lit(0)).cast("bigint").alias("_raw")
        )
        h_max = h_all.agg(F.max("_raw").cast("bigint").alias("_max"))
        hub = (
            h_all.crossJoin(F.broadcast(h_max))
            .select("node", F.expr(norm_expr).cast("bigint").alias("hub_units"))
            .localCheckpoint(eager=False)
        )
    return hub.join(auth, "node")


def personalized_pagerank(
    edges: DataFrame,
    seed_nodes: DataFrame,
    iterations: int = 2,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank: identical exact-integer machinery to
    :func:`pagerank`, with the teleport distribution concentrated on
    ``seed_nodes`` (one ``node`` column) instead of uniform — the
    random walker restarts AT the seeds, so rank measures proximity
    to them (the related-entities / recommendation form of PageRank).

    Differences from the global walk, all seed-masked:
    - initial rank: SCALE DIV |S| on seeds, 0 elsewhere;
    - the (100-d)% teleport term pays out only to seeds;
    - dangling mass returns to the seeds, not to every vertex.

    Seeds not present in the graph are ignored (inner join against
    the vertex set); |S| counts only present seeds so mass is
    conserved.  Scale shape is pagerank's: per iteration one join on
    src, one shuffle-agg on dst, one scalar broadcast, rank frontier
    localCheckpointed.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).distinct().localCheckpoint(eager=True)  # eager: seeds.count()'s
    # job reaches e through `nodes`' two union scans (concurrent legs
    # — a lazy mark recomputes the edge distinct per leg), and every
    # fixed round's contribution-join leg scans e independently
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
    )
    seeds = nodes.join(
        seed_nodes.select(F.col("node")).distinct(), "node"
    ).localCheckpoint(eager=False)
    n_s = seeds.count()  # one job: materializes e + seeds, returns |S|
    if n_s == 0:
        raise ValueError("no seed node present in the graph")
    nodes = nodes.join(
        seeds.select("node", F.lit(1).alias("_is_seed")), "node", "left"
    ).select(
        "node", F.coalesce(F.col("_is_seed"), F.lit(0)).alias("is_seed")
    ).localCheckpoint(eager=False)  # round 1's dangling probe computes it
    unit = PAGERANK_SCALE // n_s
    base = (100 - damping_pct) * unit // 100
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(
        eager=False  # materialized by round 1's dangling probe job
    )
    rank = nodes.withColumn(
        "rank_units",
        (F.col("is_seed") * F.lit(unit)).cast("bigint"),
    )
    for _ in range(iterations):
        # pagerank's probe-fused shape (see there): the lazily
        # checkpointed (rank, out_deg) frame is materialized by the
        # dangling collect — one job, one toucher, no broadcast-leg
        # race — and the scalar folds into the update as a literal
        ranked = (
            rank.join(deg, rank.node == deg.src, "left")
            .select("node", "is_seed", "rank_units", "out_deg")
            .localCheckpoint(eager=False)
        )
        dang = int(
            ranked.agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("out_deg").isNull(), F.col("rank_units"))
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("_dang")
            ).collect()[0][0]
        )
        per_src = ranked.filter(F.col("out_deg").isNotNull()).select(
            F.col("node").alias("src"),
            F.expr("rank_units DIV out_deg").alias("_c"),
        )
        contrib = (
            e.join(per_src, "src")
            .select(F.col("dst").alias("node"), "_c")
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            "is_seed",
            (
                F.col("is_seed") * F.lit(base)
                + F.expr(
                    f"({damping_pct} * (coalesce(_in, 0) "
                    f"+ is_seed * {dang // n_s})) DIV 100"
                )
            )
            .cast("bigint")
            .alias("rank_units"),
        )
    return rank.select("node", "rank_units")


def edge_supports(
    edges: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Per-EDGE triangle counts ("support") over an undirected edge
    list: (lo, hi, support) for every canonical edge, 0 for edges in
    no triangle — the edge-level companion of
    :func:`triangle_counts` and the inner pass of k-truss peeling.

    Same Chiba-Nishizeki orientation discipline: wedges pivot on the
    (degree, id)-smallest vertex so fan-out is arboricity^2-bounded
    and each triangle is generated once; the triangle's three edges
    are then re-canonicalized by VALUE (least/greatest) and counted —
    one extra edge-key shuffle over triangle_counts.
    """
    und = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        # eager for the same three-leg reason as triangle_counts' und;
        # k_truss skips this path on purpose (its `cur` is a cheap
        # projection over the already-materialized support frame)
        .localCheckpoint(eager=True)
    )
    return _edge_supports_canon(und)


def _edge_supports_canon(und: DataFrame) -> DataFrame:
    """edge_supports inner: input MUST be canonical (lo < hi) and
    distinct (k_truss maintains that invariant between rounds and
    skips the re-canonicalization shuffle)."""
    deg = (
        und.select(F.col("lo").alias("v"))
        .unionAll(und.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # field-wise (degree, id) orientation — same narrowing as
    # triangle_counts: no (d, i) structs checkpointed or shuffled, one
    # degree column per wedge side instead (§2.3); bit-identical
    # wedge set (see the proof comment there)
    keyed = (
        und.join(deg.withColumnRenamed("v", "lo").withColumnRenamed("d", "dlo"), "lo")
        .join(deg.withColumnRenamed("v", "hi").withColumnRenamed("d", "dhi"), "hi")
    )
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = keyed.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lo_first, F.col("dhi")).otherwise(F.col("dlo")).alias("dv"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = (
        e1.join(e2, "u")
        .filter(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
        .select("u", "x", "y")
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"])
    tri_edges = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("p"), F.col("x").alias("q")),
                F.struct(F.col("u").alias("p"), F.col("y").alias("q")),
                F.struct(F.col("x").alias("p"), F.col("y").alias("q")),
            )
        ).alias("t")
    ).select(
        F.least(F.col("t.p"), F.col("t.q")).alias("lo"),
        F.greatest(F.col("t.p"), F.col("t.q")).alias("hi"),
    )
    supc = tri_edges.groupBy("lo", "hi").agg(
        F.count("*").cast("bigint").alias("support")
    )
    return und.join(supc, ["lo", "hi"], "left").select(
        "lo",
        "hi",
        F.coalesce("support", F.lit(0)).cast("bigint").alias("support"),
    )


def k_truss(
    edges: DataFrame,
    k: int,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 50,
) -> DataFrame:
    """The k-truss of an undirected graph (Cohen 2008): the maximal
    subgraph where every EDGE participates in >= k-2 triangles — the
    cohesion notion between k-core (degree-based, which hubs satisfy
    trivially) and cliques (which don't scale).  Returns
    (lo, hi, support) with support counted INSIDE the truss.

    Iterative peeling to a measured fixpoint: compute per-edge
    supports (:func:`edge_supports`), drop sub-threshold edges,
    repeat until a round drops nothing; ``max_rounds`` raises rather
    than returning a partially peeled graph (the k_core contract).

    Scale notes: each round is one oriented triangle enumeration
    (arboricity^2-bounded wedge join) + one edge-key count + one
    edge-key left join — all uniform-key shuffles; the surviving edge
    frontier localCheckpoints per round so lineage stays O(1).
    Rounds needed = truss peel depth, small for the sparse
    support-filtered graphs this targets.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (k-2 triangles per edge)")
    thresh = k - 2
    cur = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)  # materialized by the count below
    )
    n_cur = cur.count()
    for _ in range(max_rounds):
        if n_cur == 0:
            return cur.select(
                "lo", "hi", F.lit(0).cast("bigint").alias("support")
            )
        # fused per round: the filtered count materializes the support
        # frame's lazy checkpoint AND probes the fixpoint (one job was
        # three: sup checkpoint, keep count, cur re-checkpoint).  cur
        # needs no checkpoint of its own — it is a filter+project over
        # the already-materialized sup RDD, so its lineage is O(1).
        sup = _edge_supports_canon(cur).localCheckpoint(eager=False)
        keep = sup.filter(F.col("support") >= thresh)
        n_keep = keep.count()
        if n_keep == n_cur:
            return keep
        cur = keep.select("lo", "hi")
        n_cur = n_keep
    raise ConvergenceError(
        f"k_truss: no fixpoint after {max_rounds} peel rounds"
    )


def multi_source_bfs(
    edges: DataFrame,
    sources: list[int],
    a: str = "a",
    b: str = "b",
    max_depth: int = 12,
) -> DataFrame:
    """Unweighted BFS hop distances from EVERY source simultaneously —
    (landmark, v, dist) — the landmark-distance extractor behind
    approximate shortest paths, harmonic-centrality estimates, and
    graph features for ML (Potamias et al. 2009 landmark sketches).

    One BSP sweep carries ALL landmarks: the frontier and settled set
    are keyed by (landmark, vertex), so k landmarks cost ONE pass of
    k-way-wider frontiers rather than k sequential BFS runs — at 100 TB
    the per-level join count (the scheduling overhead that dominates
    iterative graph work) is paid once, and the widened frontier rows
    shuffle on the same uniform vertex key.  Same discipline as
    :func:`bfs_distances`: dedup then anti-join the settled set per
    level (first label = minimum hop), localCheckpoint per level for
    O(1) lineage, early exit on an empty frontier, ``max_depth`` as
    the semantic n-hop cap.
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    nbr = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        .distinct()
        # lazily marked: the first action over a descendant computes
        # (once — shared RDD) and persists it; an eager checkpoint here
        # was a whole extra driver round-trip per call
        .localCheckpoint(eager=False)
    )
    spark = edges.sparkSession
    settled = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sorted(set(sources))],
        "landmark: bigint, v: bigint, dist: int",
    ).localCheckpoint(eager=False)
    frontier = settled.select("landmark", F.col("v").alias("src"))
    # undirected two-level collision bound per landmark cone (see
    # bfs_distances): the anti-join needs only the last two levels,
    # not the whole settled union
    recent = settled.select("landmark", "v")
    prev: DataFrame | None = None
    for depth in range(1, max_depth + 1):
        # one fused job per level (checkpoint + emptiness probe) and a
        # never-recopied settled union — see bfs_distances
        anti = recent if prev is None else prev.unionByName(recent)
        discovered = (
            nbr.join(frontier, "src")
            .select("landmark", F.col("dst").alias("v"))
            .distinct()
            .join(anti, ["landmark", "v"], "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
            .localCheckpoint(eager=False)
        )
        if discovered.count() == 0:
            break
        settled = settled.unionByName(discovered)
        frontier = discovered.select("landmark", F.col("v").alias("src"))
        prev, recent = recent, discovered.select("landmark", "v")
    return settled


def betweenness_sampled(
    edges: DataFrame,
    sources: list[int],
    a: str = "a",
    b: str = "b",
    max_depth: int = 3,
) -> DataFrame:
    """Landmark-sampled, hop-bounded betweenness centrality (Brandes
    2001 dependency accumulation; Brandes & Pich 2007 pivot sampling):
    (v, betweenness_micro) — the exact-integer dependency sum over the
    sampled sources, restricted to shortest paths of length
    <= ``max_depth``.

    The two BSP phases of Brandes' algorithm, both level-synchronous:

    - FORWARD: the multi-source BFS frontier additionally carries
      sigma(v) — the NUMBER of shortest source->v paths — as an exact
      BIGINT (sigma of a newly settled vertex = sum of its settled
      predecessors' sigmas: one uniform (landmark, vertex)-keyed
      aggregate per level).
    - BACKWARD: levels unwind deepest-first; a vertex's dependency is

          delta(v) = sum over successors w (dist_w = dist_v + 1):
                     (sigma_v * (SCALE + delta_w)) // sigma_w

      — Brandes' (sigma_v/sigma_w)*(1+delta_w) in micro fixed-point,
      evaluated with a single BIGINT floor-division per edge so the
      whole accumulation is exact-integer (the hash-gate convention:
      no float sums; the snap-per-level is deterministic in any
      execution order).  Per level: one join onto the successor
      level's delta frame, one vertex-keyed sum, localCheckpoint.

    Betweenness(v) = sum over sampled sources of delta(v) (the source
    itself excluded, dist > 0 rows only).  At 100 TB the per-level
    frontier rows shuffle on the same uniform (landmark, vertex) key
    as multi_source_bfs — k pivots pay the per-level scheduling
    overhead once — and the backward pass touches only the settled
    BFS cone.  Hop bound = the semantic cap (Brandes-Pich estimates
    converge with small pivot counts; bounded-depth dependencies are
    the k-bounded betweenness variant).

    Row-set contract: one row per vertex that appears at depth
    1..len-2 of at least one landmark's cone (zero deltas included);
    deepest-level-only vertices and the sources themselves are never
    emitted — bit-equal, rows included, to
    :func:`betweenness_sampled_py`.
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    scale = 1_000_000
    nbr = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        .distinct()
        # lazily marked: the first action over a descendant computes
        # (once — shared RDD) and persists it; an eager checkpoint here
        # was a whole extra driver round-trip per call
        .localCheckpoint(eager=False)
    )
    spark = edges.sparkSession
    levels: list[DataFrame] = [
        spark.createDataFrame(
            [(int(s), int(s), 1) for s in sorted(set(sources))],
            "landmark: bigint, v: bigint, sigma: bigint",
        ).localCheckpoint(eager=False)
    ]
    # undirected two-level collision bound per landmark cone (see
    # bfs_distances): a candidate at depth d can only collide with
    # levels d-1 / d-2, so the anti-join needs only those frames
    recent = levels[0].select("landmark", "v")
    prev: DataFrame | None = None
    frontier = levels[0]
    for _depth in range(1, max_depth + 1):
        # one fused job per level (checkpoint + emptiness probe) and a
        # never-recopied settled union — see bfs_distances
        anti = recent if prev is None else prev.unionByName(recent)
        discovered = (
            nbr.join(frontier.withColumnRenamed("v", "src"), "src")
            .select("landmark", F.col("dst").alias("v"), "sigma")
            .join(anti, ["landmark", "v"], "left_anti")
            .groupBy("landmark", "v")
            .agg(F.sum("sigma").cast("bigint").alias("sigma"))
            .localCheckpoint(eager=False)
        )
        if discovered.count() == 0:
            break
        levels.append(discovered)
        frontier = discovered
        prev, recent = recent, discovered.select("landmark", "v")
    # backward dependency accumulation: the DEEPEST level has no
    # successors inside the cone, so its delta is 0; every shallower
    # level folds its successor level's deltas in
    deltas: DataFrame = levels[-1].select(
        "landmark", "v", F.lit(0).cast("bigint").alias("delta")
    )
    # the deepest level's deltas are all zero AND have no successor
    # fold, so they are NOT accumulated — exactly like the twin, whose
    # backward loop only adds cur_delta for levels len-2 .. 1.  A
    # vertex that is deepest under one landmark can still earn rows
    # from another landmark's shallower cone.
    acc: DataFrame | None = None
    for lvl in range(len(levels) - 2, -1, -1):
        cur = levels[lvl]
        succ = deltas.join(
            levels[lvl + 1].select("landmark", "v", "sigma"),
            ["landmark", "v"],
        ).select(
            "landmark",
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        contrib = (
            cur.join(
                nbr.withColumnRenamed("src", "v")
                .withColumnRenamed("dst", "w"),
                "v",
            )
            .join(succ, ["landmark", "w"])
            .select(
                "landmark",
                "v",
                F.expr(
                    f"(sigma * ({scale} + delta_w)) DIV sigma_w"
                ).alias("t"),
            )
            .groupBy("landmark", "v")
            .agg(F.sum("t").cast("bigint").alias("delta"))
        )
        delta_cur = (
            cur.select("landmark", "v")
            .join(contrib, ["landmark", "v"], "left")
            .select(
                "landmark",
                "v",
                F.coalesce("delta", F.lit(0))
                .cast("bigint")
                .alias("delta"),
            )
        ).localCheckpoint(eager=True)
        if lvl > 0:  # sources (level 0) are excluded from betweenness
            acc = (
                delta_cur
                if acc is None
                else acc.unionByName(delta_cur)
            )
        deltas = delta_cur
    if acc is None:
        return spark.createDataFrame(
            [], "v: bigint, betweenness_micro: bigint"
        )
    return acc.groupBy("v").agg(
        F.sum("delta").cast("bigint").alias("betweenness_micro")
    )


def betweenness_sampled_py(
    edge_set: set[tuple[int, int]],
    sources: list[int],
    max_depth: int = 3,
) -> dict[int, int]:
    """Sparkless twin of :func:`betweenness_sampled` — identical
    integer arithmetic (BIGINT sigma sums, per-edge micro floor-div,
    per-level accumulation) AND identical row set: only vertices at
    depth 1..len-2 of some landmark's cone get an entry (zeros
    included); deepest-level-only vertices never do."""
    import collections

    scale = 1_000_000
    adj: dict[int, set[int]] = collections.defaultdict(set)
    for lo, hi in edge_set:
        if lo != hi:
            adj[lo].add(hi)
            adj[hi].add(lo)
    out: dict[int, int] = collections.defaultdict(int)
    for s in sorted(set(sources)):
        levels: list[dict[int, int]] = [{s: 1}]
        seen = {s}
        for _d in range(1, max_depth + 1):
            nxt: dict[int, int] = collections.defaultdict(int)
            for v, sig in levels[-1].items():
                for w in adj[v]:
                    if w not in seen:
                        nxt[w] += sig
            if not nxt:
                break
            seen |= set(nxt)
            levels.append(dict(nxt))
        delta: dict[int, int] = {v: 0 for v in levels[-1]}
        for lvl in range(len(levels) - 2, -1, -1):
            cur_delta: dict[int, int] = {}
            for v, sig in levels[lvl].items():
                t = 0
                for w in adj[v]:
                    if w in levels[lvl + 1]:
                        t += (sig * (scale + delta[w])) // levels[
                            lvl + 1
                        ][w]
                cur_delta[v] = t
            if lvl > 0:
                for v, d in cur_delta.items():
                    out[v] += d
            delta = cur_delta
    return dict(out)


def boruvka_msf(
    edges: DataFrame,
    a: str = "lo",
    b: str = "hi",
    w: str = "w",
    max_rounds: int = 20,
) -> DataFrame:
    """Minimum spanning forest via distributed Boruvka.

    Returns the exact MSF edge set as (lo, hi, w) under the strict
    total edge order (w, lo, hi) — the tie-break makes the forest
    UNIQUE, so the result is hash-gateable against a sequential
    Kruskal twin.

    Round shape (O(log V) rounds — components at least halve):
      1. every live edge carries its endpoints' component ids; edges
         inside one component are dropped PERMANENTLY (they can never
         re-cross),
      2. each component selects its lightest incident edge (one
         min_by aggregate over the doubled incidence list — map-side
         combinable, keyed by component id),
      3. the selected edges (all provably in the MSF, classic Boruvka
         invariant under a strict total order) contract via
         :func:`connected_components` on the COMPONENT-ID graph,
         whose size is <= the component count and shrinks
         geometrically — the star-contraction machinery is reused
         rather than re-derived, and its hybrid local finish makes
         late rounds one driver union-find over a bounded set,
      4. live edges relabel through the (broadcastable) contraction
         map; localCheckpoint pins each frontier so lineage stays
         O(1) across rounds.

    At 100 TB the cost is dominated by step 2's one shuffle of the
    live edge set per round; the live set only shrinks (intra-
    component drops are permanent), so total work is O(E log V) with
    geometrically falling constants.  ``max_rounds`` raises rather
    than returning a partial forest.
    """
    live = (
        edges.select(
            F.col(a).alias("lo"), F.col(b).alias("hi"), F.col(w).alias("w")
        )
        .filter(F.col("lo") != F.col("hi"))
        .groupBy("lo", "hi")
        .agg(F.min("w").alias("w"))
        .select(
            "lo", "hi", "w",
            F.col("lo").alias("ca"), F.col("hi").alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    # the count fuses the checkpoint materialization with the
    # emptiness probe (one job per round instead of two); n_live is
    # carried so the loop head never recounts a materialized frontier
    n_live = live.count()
    picked: list[DataFrame] = []
    for _ in range(max_rounds):
        if n_live == 0:
            if not picked:
                return live.select("lo", "hi", "w")
            out = picked[0]
            for p in picked[1:]:
                out = out.unionAll(p)
            return out
        incident = live.select(F.col("ca").alias("c"), "lo", "hi", "w", "cb").unionAll(
            live.select(F.col("cb").alias("c"), "lo", "hi", "w", "ca").select(
                "c", "lo", "hi", "w", F.col("ca").alias("cb")
            )
        )
        sel = (
            incident.groupBy("c")
            .agg(
                F.min_by(
                    F.struct("lo", "hi", "w"), F.struct("w", "lo", "hi")
                ).alias("e")
            )
            .select("e.lo", "e.hi", "e.w")
            .distinct()
            # lazy: nothing in the loop reads sel — only the final
            # union does, and every parent (the round's live RDD) is
            # already materialized, so deferring costs no recompute
            .localCheckpoint(eager=False)
        )
        picked.append(sel)
        # contract on COMPONENT ids: selected edges keyed by the
        # component labels their endpoints carried this round
        sel_comp = (
            incident.groupBy("c")
            .agg(
                F.min_by(F.col("cb"), F.struct("w", "lo", "hi")).alias("c2")
            )
            .select(F.col("c").alias("x"), F.col("c2").alias("y"))
        )
        merge = connected_components(sel_comp, src="x", dst="y").select(
            F.col("vertex").alias("_c"), F.col("label").alias("_nc")
        )
        live = (
            live.join(merge.withColumnRenamed("_c", "ca"), "ca", "left")
            .withColumn("ca", F.coalesce("_nc", F.col("ca")))
            .drop("_nc")
            .join(
                merge.select(
                    F.col("_c").alias("cb"), F.col("_nc").alias("_ncb")
                ),
                "cb",
                "left",
            )
            .withColumn("cb", F.coalesce("_ncb", F.col("cb")))
            .drop("_ncb")
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=False)
        )
        n_live = live.count()
    raise ConvergenceError(
        f"boruvka_msf: live edges remain after {max_rounds} rounds "
        "(components at least halve per round; raise max_rounds)"
    )


def hyperanf(
    edges: DataFrame,
    a: str = "lo",
    b: str = "hi",
    hops: int = 3,
    hll_b: int = 6,
) -> DataFrame:
    """HyperANF (Boldi, Rosa & Vigna 2011): the approximate
    neighborhood function via per-vertex HLL counters.

    Every vertex carries an m = 2^``hll_b``-register HLL sketch of
    its ball B(v, h); one BSP round replaces each sketch with the
    register-wise MAX of its own and its neighbors' sketches, so
    after h rounds the sketch summarizes exactly the h-hop ball —
    max-merge is the HLL union, and union of neighbor balls IS the
    next ball.  This is how distance distributions / effective
    diameter are computed on graphs where exact BFS per vertex
    (O(V*E)) is unthinkable: O(E * m/row-width) work per hop, all
    shuffles keyed by vertex.

    Returns (hop, v, s_scaled): for every hop 0..``hops`` and vertex,
    the EXACT BIGINT estimator denominator
    s_scaled = sum_buckets 2^(shift - M_j) (empty buckets contribute
    2^shift), from which the caller derives the float estimate with
    sketches.hll_coefficient — keeping this operator's output pure
    integers makes the whole sweep hash-gateable.

    Register semantics are shared with the scalar HLL
    (sketches.hll_sql_parts: mid-square finalizer, window-bias
    coefficient), so a HyperANF ball estimate at h -> infinity
    converges to the plain HLL distinct-count of the component.
    """
    from . import sketches

    m = 1 << hll_b
    shift = (sketches.HLL_HASH_BITS - hll_b) + 1
    parts = sketches.hll_sql_parts("CAST(v AS STRING)", hll_b, "spark")
    und = edges.select(F.col(a).alias("s"), F.col(b).alias("d")).unionAll(
        edges.select(F.col(b).alias("s"), F.col(a).alias("d"))
    )
    verts = und.select(F.col("s").alias("v")).distinct()
    state = verts.selectExpr(
        "v",
        f"CAST({parts['bucket']} AS BIGINT) AS bucket",
        f"CAST({parts['rank']} AS BIGINT) AS mr",
    ).localCheckpoint(eager=False)

    def s_scaled(st: DataFrame, hop: int) -> DataFrame:
        return st.groupBy("v").agg(
            (
                F.sum(
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), CAST({shift} - mr AS INT))"
                    )
                )
                + (F.lit(m) - F.count("*"))
                * F.lit(1 << shift)
            )
            .cast("bigint")
            .alias("s_scaled")
        ).select(F.lit(hop).cast("bigint").alias("hop"), "v", "s_scaled")

    out = [s_scaled(state, 0)]
    for h in range(1, hops + 1):
        merged = (
            und.join(state, und.d == state.v)
            .select(F.col("s").alias("v"), "bucket", "mr")
            .unionAll(state.select("v", "bucket", "mr"))
            .groupBy("v", "bucket")
            .agg(F.max("mr").alias("mr"))
            # lazy: hops are FIXED — the caller's one action runs the
            # whole sweep as one multi-stage job; each hop's register
            # frame persists (shared by its s_scaled leg and the next
            # hop) as that job computes it
            .localCheckpoint(eager=False)
        )
        state = merged
        out.append(s_scaled(state, h))
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res


def _local_kosaraju(live: DataFrame) -> DataFrame:
    """Driver-side finish: iterative Kosaraju over a BOUNDED
    collected edge set (the caller guarantees the count), labels =
    max member id — the same (v, scc_id) contract."""
    import collections

    adj: dict = collections.defaultdict(set)
    radj: dict = collections.defaultdict(set)
    verts: set = set()
    for r in live.collect():
        u, v = int(r.u), int(r.v)
        adj[u].add(v)
        radj[v].add(u)
        verts.update((u, v))
    order: list = []
    seen: set = set()
    for s in sorted(verts):
        if s in seen:
            continue
        stack = [(s, iter(sorted(adj[s])))]
        seen.add(s)
        while stack:
            node, it = stack[-1]
            advanced = False
            for nxt in it:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append((nxt, iter(sorted(adj[nxt]))))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    comp: dict = {}
    for s in reversed(order):
        if s in comp:
            continue
        comp[s] = s
        st = [s]
        while st:
            x = st.pop()
            for y in radj[x]:
                if y not in comp:
                    comp[y] = s
                    st.append(y)
    groups: dict = collections.defaultdict(list)
    for v, root in comp.items():
        groups[root].append(v)
    rows = [
        (v, max(vs)) for vs in groups.values() for v in vs
    ]
    return live.sparkSession.createDataFrame(
        rows, "v: bigint, scc_id: bigint"
    )


def scc_coloring(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_outer: int = 30,
    max_prop: int = 60,
    local_finish_edges: int = 100_000,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph via
    trim + forward-max coloring + color-restricted backward BFS
    (Orzan 2004; Slota, Rajamanickam & Madduri 2014) — the standard
    shared-nothing SCC recipe, since Tarjan's stack is inherently
    sequential.  Returns (v, scc_id) with scc_id = MAX vertex id in
    the SCC (the coloring's natural representative: a root c has
    color[c] = c iff no larger id reaches it, and every SCC member
    reaches c, so c IS the max member).

    Per outer round, on the still-unassigned subgraph:

    - TRIM fixpoint: peel vertices missing an in- or out-edge — each
      is a singleton SCC (assign scc_id = v).  Trim alone dissolves
      the DAG portion entirely, which is what bounds the outer loop
      on real graphs (a directed path would otherwise cost one
      coloring round per vertex).
    - COLOR: flood the max vertex id FORWARD along edges to a
      measured fixpoint — color[v] = max id with a path to v.  Each
      level is one uniform vertex-key shuffle (join colors to edge
      sources, max-merge into targets), localCheckpoint per level.
    - CARVE: roots are vertices with color[v] == v; one multi-root
      BACKWARD BFS restricted to each root's color class marks
      exactly the root's SCC (any v->..->c path through a c-colored
      endpoint stays c-colored: every vertex on it is reached by c
      and cannot be reached by anything larger without contradicting
      color[c] = c).  Assign, drop every edge touching an assigned
      vertex, repeat.

    HYBRID finish (the :func:`connected_components` shape): the
    coloring flood costs one level per hop of the deepest SCC's
    max-id eccentricity — a giant sparse SCC pays tens of fixed-cost
    BSP levels to label a subgraph that fits in one task.  So after
    each trim fixpoint, if the surviving edge count is
    <= ``local_finish_edges`` the remainder is finished driver-side
    by a bounded-collect Kosaraju (:func:`_local_kosaraju`).  At
    100 TB the support filter upstream bounds the cyclic core long
    before the raw data does — DAG periphery trims distributedly,
    and only an adversarially giant cyclic core pays the flood.
    Pass ``local_finish_edges=0`` to force the pure-distributed path
    (the fuzz tests do).

    Scale notes: all joins key on vertex ids (uniform after the
    support filter upstream); frontier/settled frames localCheckpoint
    per level so lineage stays O(1); every level exits early on an
    empty delta.  ``max_outer`` bounds root generations (each round
    retires at least every current root's SCC), ``max_prop`` bounds
    flood/BFS depth; both raise :class:`ConvergenceError` rather than
    return a partial labeling.
    """
    spark = edges.sparkSession
    live = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    assigned = spark.createDataFrame([], "v: bigint, scc_id: bigint")
    n_live = live.count()  # one job: materializes live + counts it
    for _ in range(max_outer):
        # --- TRIM: peel vertices without both an in- and an out-edge
        for _t in range(max_prop):
            if n_live == 0:
                break
            verts = (
                live.select("u").unionByName(
                    live.select(F.col("v").alias("u"))
                ).distinct()
            )
            keep = (
                live.select("u").distinct()
                .join(live.select(F.col("v").alias("u")).distinct(), "u")
                # lazy: the dropped-probe's anti-join (next action)
                # computes and persists it
                .localCheckpoint(eager=False)
            )
            dropped = verts.join(keep, "u", "left_anti")
            if dropped.limit(1).count() == 0:
                break
            # plain union: every leaf is a projection over already-
            # checkpointed RDDs, so re-checkpointing `assigned` each
            # round only recopied the accumulated labels
            assigned = assigned.unionByName(
                dropped.select(
                    F.col("u").cast("bigint").alias("v"),
                    F.col("u").cast("bigint").alias("scc_id"),
                )
            )
            live = (
                live.join(keep, "u")
                .join(keep.select(F.col("u").alias("v")), "v")
                .select("u", "v")
                .localCheckpoint(eager=False)
            )
            n_live = live.count()  # fused materialize + count
            # a keep vertex whose every in-edge came FROM a dropped
            # vertex and every out-edge went TO one loses all its
            # edges in the filter and would otherwise vanish
            # unlabeled; any such orphan is in no surviving cycle
            # (an intact cycle keeps all its edges), so it is a
            # singleton SCC
            survivors = (
                live.select("u")
                .unionByName(live.select(F.col("v").alias("u")))
                .distinct()
            )
            orphans = keep.join(survivors, "u", "left_anti")
            if orphans.limit(1).count() > 0:
                assigned = assigned.unionByName(
                    orphans.select(
                        F.col("u").cast("bigint").alias("v"),
                        F.col("u").cast("bigint").alias("scc_id"),
                    )
                )
        if n_live == 0:
            return assigned
        if n_live <= local_finish_edges:
            return assigned.unionByName(_local_kosaraju(live))
        # --- COLOR: forward max-id flood to fixpoint
        colors = (
            live.select("u").unionByName(live.select(F.col("v").alias("u")))
            .distinct()
            .select(F.col("u").alias("cv"), F.col("u").alias("color"))
            # eager: flood round 1 reads colors through THREE
            # concurrent legs (the flood join, the unionByName seed,
            # and the moved-probe's old-color join) — a lazy mark
            # recomputes the vertex distinct per leg
            .localCheckpoint(eager=True)
        )
        for _p in range(max_prop + 1):
            if _p == max_prop:
                raise ConvergenceError(
                    f"scc_coloring: color flood still moving after "
                    f"{max_prop} levels"
                )
            flooded = (
                live.join(colors, live.u == colors.cv)
                .select(F.col("v").alias("cv"), "color")
                .unionByName(colors)
                .groupBy("cv")
                .agg(F.max("color").alias("color"))
                # lazy: the moved-probe below scans flooded through a
                # join, so its map stages compute and persist every
                # partition — one job where eager + probe was two
                .localCheckpoint(eager=False)
            )
            moved = (
                flooded.join(
                    colors.withColumnRenamed("color", "old"), "cv"
                )
                .filter(F.col("color") != F.col("old"))
                .limit(1)
                .count()
            )
            colors = flooded
            if moved == 0:
                break
        # --- CARVE: backward BFS from each root within its color class
        settled = (
            colors.filter(F.col("cv") == F.col("color"))
            .select(F.col("color").alias("c"), F.col("cv").alias("v"))
            .localCheckpoint(eager=False)
        )
        frontier = settled
        for _b in range(max_prop + 1):
            if _b == max_prop:
                raise ConvergenceError(
                    f"scc_coloring: backward sweep still moving after "
                    f"{max_prop} levels"
                )
            disc = (
                live.join(
                    frontier.select("c", F.col("v").alias("dst")),
                    live.v == F.col("dst"),
                )
                .select("c", F.col("u").alias("v"))
                .distinct()
                .join(
                    colors.select(
                        F.col("cv").alias("v"), F.col("color").alias("c")
                    ),
                    ["v", "c"],
                )
                .join(settled, ["c", "v"], "left_anti")
                .localCheckpoint(eager=False)
            )
            # fused materialize + emptiness probe (see bfs_distances);
            # settled stays a union of materialized level RDDs
            if disc.count() == 0:
                break
            settled = settled.unionByName(disc)
            frontier = disc
        assigned = assigned.unionByName(
            settled.select(
                F.col("v").cast("bigint").alias("v"),
                F.col("c").cast("bigint").alias("scc_id"),
            )
        )
        done = settled.select("v").distinct()
        live = (
            live.join(done.select(F.col("v").alias("u")), "u", "left_anti")
            .join(done, "v", "left_anti")
            .localCheckpoint(eager=False)
        )
        n_live = live.count()  # fused materialize + count
        # same orphan rule as the trim filter: an uncarved vertex
        # whose every edge touched a carved SCC has no surviving
        # cycle (a cycle through it would live entirely inside one
        # SCC, which was carved whole) — label it a singleton rather
        # than letting it vanish from the edge set unlabeled
        survivors = (
            live.select(F.col("u").alias("cv"))
            .unionByName(live.select(F.col("v").alias("cv")))
            .distinct()
        )
        orphans = (
            colors.select("cv")
            .join(done.select(F.col("v").alias("cv")), "cv", "left_anti")
            .join(survivors, "cv", "left_anti")
        )
        if orphans.limit(1).count() > 0:
            assigned = assigned.unionByName(
                orphans.select(
                    F.col("cv").cast("bigint").alias("v"),
                    F.col("cv").cast("bigint").alias("scc_id"),
                )
            )
        if n_live == 0:
            return assigned
    raise ConvergenceError(
        f"scc_coloring: live edges remain after {max_outer} outer rounds"
    )
