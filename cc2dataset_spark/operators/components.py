"""Connected components over a near-dup pair graph (the step between
pairwise similarity and actual deduplication: pairs -> clusters -> one
survivor per cluster). No reference implementation — the reference
only ever dedups on exact uid equality (main.py:256); transitive
near-dup clustering is the scale extension.

Algorithm: iterative min-label propagation (the DataFrame-native
formulation of the classic parallel connected-components loop, same
convergence shape as GraphX/small-star): every node starts labeled
with its own id; each round, every node takes the min of its label and
its neighbors' labels; converged when no label changes. Rounds needed
~ graph diameter (near-dup clusters are small and dense, so typically
2-3); each round is one equi-join + one groupBy — both keyed shuffles
with map-side combine, no single-partition ops. The label of a
component is its minimum node id, which doubles as the deterministic
survivor choice.

Scale caveat: min-label propagation needs O(diameter) rounds. That is
the right trade for near-dup graphs (diameter 2-3 in practice —
threshold-verified similarity edges form dense clique-ish clusters),
and the loop RAISES rather than return wrong labels if a component's
diameter exceeds the round budget. For graphs whose components can be
long paths (web-link graphs, follow chains), use
:func:`connected_components_twophase` — the alternating
large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond"), O(log^2 n) rounds of the same
join+groupBy shape, implemented below and union-find-verified in
tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ceiling (in label ROWS) under which the driver-union-find labels
# frame gets a forced broadcast hint. ~100 bytes/row of framed
# broadcast is a conservative estimate for two ids, so 1M labels is
# ~100 MB built on the driver and resident per executor — past that,
# the frame returns unhinted and the planner sizes the join itself
# (a forced hint bypasses autoBroadcastJoinThreshold up to the 8 GB
# hard cap, which at the default driver_threshold's ~2M-row worst
# case could pressure small executors — r13 ADVICE).
BROADCAST_LABEL_BOUND = 1_000_000


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``;
    component == min node id reachable.

    Adaptive execution, same argument as broadcast-join selection: the
    near-dup EDGE set is normally orders of magnitude smaller than the
    corpus (only threshold-verified duplicate candidates appear), so
    when it fits comfortably on the driver (<= ``driver_threshold``
    edges, known exactly because the persisted edge set must be counted
    anyway) the components come from a driver-side union-find — one
    collect instead of O(diameter) join+checkpoint+count rounds
    (measured ~3 s of fixed per-round cost on a 256-edge graph at
    local[32]). Larger graphs take the distributed min-label
    propagation loop with one action per round. Both paths produce the
    identical (id, component=min reachable id) labeling.

    The distributed loop RAISES if ``max_iter`` rounds don't converge
    (labels travel one hop per round, so a component with diameter >
    max_iter would otherwise return silently-wrong labels — measured:
    44 of 65 nodes mislabeled on a 64-edge path at the default budget);
    use :func:`connected_components_twophase` for long-path graphs at
    scale.
    """
    from pyspark.storagelevel import StorageLevel

    # Persist the symmetrized edge set BEFORE looping: the edges
    # lineage is typically an expensive similarity join (e.g. the
    # capped Jaccard self-join), and every propagation round plus every
    # convergence count would otherwise recompute it from scratch
    # (measured 25 s vs 7 s warm at sf0.1 for the registered query).
    # persist, NOT localCheckpoint, for the edges: an eager checkpoint
    # materializes through the RDD path and loses AQE for the whole
    # expensive join (measured 4.6x slower warm); the labels below DO
    # use localCheckpoint because there the enemy is per-round lineage
    # growth, and their plans are trivial.
    from cc2dataset_spark import caching

    both = caching.track(
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if both.count() <= 2 * driver_threshold:  # both is the 2x symmetrization
        return _driver_union_find(both)
    nodes = both.select(F.col("src").alias("id")).distinct()
    # localCheckpoint (not just persist): each round's labels must
    # TRUNCATE lineage, or the logical plan doubles per round and
    # optimizer/codegen time dominates the actual joins.
    labels = nodes.select("id", F.col("id").alias("component")).localCheckpoint()

    changed = -1  # -1 = loop never ran (max_iter <= 0)
    for _ in range(max_iter):
        nbr_min = (
            both.join(labels, both.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # The convergence signal rides along as a flag column instead of
        # a separate join-old-vs-new pass: the flag is derivable from
        # the same nbr_min already in flight, so each round costs one
        # materializing action (the localCheckpoint) plus a count over
        # the just-cached blocks — not a second join.
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                (
                    F.coalesce("nbr_component", F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where("_changed").count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"({changed} labels still changing): the graph has components "
        "with diameter > max_iter. Raise max_iter or use "
        "connected_components_twophase (O(log^2 n) rounds)."
    )


def _driver_union_find(both: DataFrame) -> DataFrame:
    """Union-find over a collected (src, dst) edge list; returns the
    same (id, component=min reachable id) frame as the distributed
    loop. Path-halving find + min-root union keeps it near-linear; the
    caller guarantees the edge count fits on the driver.

    Only one direction of the symmetrized frame is collected: union is
    commutative, so (b, a) adds nothing over (a, b) — and a self-loop
    (a, a) survives the filter as src == dst. Halving the transfer
    doubles the edge budget the driver_threshold guard can afford.

    The returned frame carries an explicit broadcast hint (guide §3.1):
    a createDataFrame-backed plan has no size statistics, so the
    planner never auto-broadcasts it and every downstream join against
    the labels (universe labeling in cluster_survivors /
    cluster_best_survivors, plus their aggregate join-backs) planned as
    a full sort-merge join — shuffling and sorting the corpus-sized
    side to meet a frame we just PROVED fits on the driver (the
    union-find only runs under the <= driver_threshold edge guard, so
    the labels are bounded by 2x threshold rows of two ids each).
    Because the rows were just collected, the size is KNOWN, so the
    hint is applied only under a measured-size bound (r14, r13 ADVICE):
    a forced-broadcast hint bypasses autoBroadcastJoinThreshold up to
    the 8 GB hard cap, and at the default driver_threshold the labels
    can reach ~2M rows of wide string ids — enough to pressure small
    executors. Past the bound the frame returns unhinted and the
    planner sizes the join itself."""
    rows = both.where(F.col("src") <= F.col("dst")).collect()
    parent: dict = {}

    def find(x):
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        # path-halve from x too
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        ra, rb = find(row.src), find(row.dst)
        if ra != rb:
            # min id becomes the root, so the root IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    labels = [(n, find(n)) for n in parent]
    schema = both.select(
        F.col("src").alias("id"), F.col("src").alias("component")
    ).schema
    out = both.sparkSession.createDataFrame(labels, schema)
    if len(labels) <= BROADCAST_LABEL_BOUND:
        out = F.broadcast(out)
    return out


def cluster_survivors(
    universe: DataFrame,
    edges: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components_fn=None,
) -> DataFrame:
    """Every row of ``universe`` labeled with its near-dup component
    (singletons form their own) and the deterministic survivor flag
    (component representative = min id). This is the complete dedup
    decision: keep rows where is_survivor. ``components_fn`` swaps the
    clustering algorithm (default min-label propagation; pass
    :func:`connected_components_twophase` for long-path graphs) —
    the labeling contract is identical."""
    comp = (components_fn or connected_components)(edges, id_a, id_b)
    labeled = (
        universe.select(F.col(id_col))
        .join(comp, universe[id_col] == comp["id"], "left")
        .select(
            universe[id_col],
            F.coalesce("component", universe[id_col]).alias("component_id"),
        )
    )
    # Survivor = min id AMONG UNIVERSE MEMBERS of the component, not
    # "id == component_id": when edges span a wider set than universe
    # (e.g. quality-filtered docs vs corpus-wide near-dup edges) a
    # component whose min-id node was filtered out would otherwise
    # elect NO survivor and every copy would be dropped — the same
    # hole cluster_best_survivors guards explicitly. Identical output
    # whenever the min is present (every in-repo catalog caller).
    surv = labeled.groupBy("component_id").agg(
        F.min(id_col).alias("_surv_id")
    )
    return (
        labeled.join(surv, "component_id")
        .withColumn("is_survivor", F.col(id_col) == F.col("_surv_id"))
        .drop("_surv_id")
        .select(id_col, "component_id", "is_survivor")
    )


def connected_components_twophase(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond") — converges
    in O(log^2 n) rounds regardless of component DIAMETER, where
    min-label propagation needs O(diameter) rounds.

    Use this variant when components can be long paths (link graphs,
    follow chains); for dense near-dup clusters (diameter 2-3) plain
    propagation does fewer shuffles per round and wins. Output contract
    matches :func:`connected_components` — (id, component) with
    component == min reachable id — for every node incident to a real
    (non-self-loop) edge; nodes appearing ONLY in self-loop edges are
    dropped here, so route universe labeling through
    :func:`cluster_survivors`, which coalesces absent nodes to their
    own id. Raises on non-convergence like the propagation variant.

    Each phase is one groupBy (neighborhood min) + one join — the same
    keyed-shuffle shape as propagation; the edge set it rewrites stays
    bounded by the input size (stars only ever re-point edges at
    component minima).
    """

    def _sym(e: DataFrame) -> DataFrame:
        return e.select(F.col("a"), F.col("b")).union(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )

    def _star(e_sym: DataFrame, large: bool) -> DataFrame:
        mins = e_sym.groupBy("a").agg(F.min("b").alias("mn"))
        m = F.least(F.col("a"), F.col("mn"))
        with_m = e_sym.join(mins, "a").select(
            "a", "b", m.alias("m")
        )
        cond = F.col("b") > F.col("a") if large else F.col("b") <= F.col("a")
        out = with_m.where(cond).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        if not large:
            # small-star also re-points each center at its min, keeping
            # every node attached to its (possibly new) root
            out = out.union(
                with_m.select(F.col("a"), F.col("m").alias("b")).distinct()
            )
        return out.where(F.col("a") != F.col("b")).distinct()

    cur = (
        edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    changed = -1  # -1 = loop never ran (max_iter <= 0)
    for _ in range(max_iter):
        # checkpoint between the two phases as well: _sym references
        # its input twice and _star another twice, so an unmaterialized
        # large-star output would recompute its shuffle ~4x inside the
        # small-star pass
        after_large = _star(_sym(cur), large=True).localCheckpoint()
        after_small = _star(_sym(after_large), large=False).localCheckpoint()
        # converged when the (set-valued) edge relation stopped
        # changing. Both sides are distinct sets, so the symmetric
        # difference is one full-outer join on the edge key — a single
        # keyed shuffle, where the previous two exceptAll passes
        # shuffled both sides twice.
        changed = (
            after_small.withColumn("_l", F.lit(1))
            .join(cur.withColumn("_r", F.lit(1)), ["a", "b"], "full_outer")
            .where(F.col("_l").isNull() | F.col("_r").isNull())
            .count()
        )
        cur = after_small
        if changed == 0:
            # at convergence every edge points a node at its component
            # root: label = min(neighborhood ∪ self)
            return _sym(cur).groupBy(F.col("a").alias("id")).agg(
                F.least(F.min("b"), F.first("a")).alias("component")
            )
    raise RuntimeError(
        f"connected_components_twophase did not converge in {max_iter} "
        f"rounds ({changed} edge changes in the last round); raise "
        "max_iter — the alternating contraction needs O(log^2 n) rounds."
    )


def cluster_best_survivors(
    universe: DataFrame,
    edges: DataFrame,
    id_col: str,
    score,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components_fn=None,
) -> DataFrame:
    """:func:`cluster_survivors` with QUALITY-AWARE survivorship: the
    representative of each near-dup component is its highest-``score``
    member (ties on the score break to the smallest id), not the
    smallest id. This is what a production dedup actually keeps — when
    a page and its mirror differ in boilerplate, the min-id rule keeps
    whichever crawled first; the argmax rule keeps the better copy.
    ``score`` is a Column evaluated against ``universe`` rows and must
    be deterministic and cross-engine exact (round floats to 6 before
    they reach this, per the house discipline).

    Plan: component labeling as in :func:`cluster_survivors`; the
    argmax is a per-component ``max(struct(score, -id))`` AGGREGATE
    joined back on component_id — two component-keyed hash shuffles
    with map-side partials, never a per-component window, so a
    pathological mega-component (every doc a near-dup of one template)
    costs a skewed reduce task, not a single-task sort."""
    scored = universe.select(
        F.col(id_col), score.alias("_score")
    )
    comp = (components_fn or connected_components)(edges, id_a, id_b)
    labeled = (
        scored.join(comp, scored[id_col] == comp["id"], "left")
        .select(
            scored[id_col],
            "_score",
            F.coalesce("component", scored[id_col]).alias("component_id"),
        )
    )
    # Two-stage argmax that works for ANY orderable id type (string
    # ids included — a unary-minus tiebreak would implicitly cast a
    # string id to double, yield NULL, and silently mark NO survivor):
    # per-component max score, then min id among the max-score rows.
    # Both stages are component-keyed hash aggregates that reuse one
    # partitioning with map-side partials.
    best_score = labeled.groupBy("component_id").agg(
        F.max("_score").alias("_best_score")
    )
    scored_max = labeled.join(best_score, "component_id")
    # eqNullSafe: a component whose scores are ALL NULL (max ignores
    # nulls -> _best_score NULL) must still elect a survivor (min id
    # among its members) — a plain == would produce no survivor row
    # and the inner join below would silently DELETE the whole
    # component from the labeling, breaking the every-row contract.
    survivor = (
        scored_max.where(F.col("_score").eqNullSafe(F.col("_best_score")))
        .groupBy("component_id")
        .agg(F.min(id_col).alias("_survivor_id"))
    )
    return (
        labeled.join(survivor, "component_id")
        .withColumn("is_survivor", F.col(id_col) == F.col("_survivor_id"))
        .select(
            id_col,
            "component_id",
            F.col("_score").alias("quality"),
            "is_survivor",
        )
    )
