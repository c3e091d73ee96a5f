"""Iterations (SURVEY.md §3.11 last row).

Reference parity: DataSet bulk iterations (flink-java operators/
IterativeDataSet) and delta iterations (operators/DeltaIteration.java).
Spark has no native iteration operator; the idiomatic realization is a
driver-side loop over DataFrames.  The scale-critical detail this module
pins down: ``localCheckpoint`` every iteration to TRUNCATE LINEAGE —
without it the plan doubles per round and the job dies of analysis time
long before data size matters.

``delta_iterate`` carries Flink's workset/solution-set split: only the
changed keys (workset) feed the next step, and the solution set is
updated by key — the asymptotically-right formulation for convergent
graph algorithms at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bulk_iterate(
    initial: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iterations: int,
    converged: Callable[[DataFrame, DataFrame], bool] | None = None,
) -> DataFrame:
    """Bulk iteration: feed the full result to the next step.

    ``converged(prev, cur)`` may stop early (it runs an action — budget
    one job per round for it, like Flink's convergence criterion).
    """
    cur = initial.localCheckpoint(eager=True)
    for i in range(max_iterations):
        nxt = step(cur, i).localCheckpoint(eager=True)
        if converged is not None and converged(cur, nxt):
            return nxt
        cur = nxt
    return cur


def delta_iterate(
    solution: DataFrame,
    workset: DataFrame,
    keys: Sequence[str],
    step: Callable[[DataFrame, DataFrame, int], DataFrame],
    max_iterations: int,
    updates_are_changed: bool = False,
) -> DataFrame:
    """Delta iteration: ``step`` returns candidate updates (same schema
    as ``solution``); rows that actually changed become the next workset
    and are merged into the solution set by key.  Terminates when the
    workset is empty (Flink's natural delta-iteration termination).

    ``updates_are_changed=True`` declares that ``step`` already emits
    ONLY rows that differ from the current solution — AND at most one
    distinct row per key (Flink's native delta contract, where the step
    produces the next workset itself): the generic ``subtract`` diff —
    two full-solution-set shuffles per round — is skipped and the
    updates feed the merge directly.  The subtract path's implicit
    DISTINCT is skipped with it, so duplicate keys would fan out the
    left-join merge and persist into later rounds (ADVICE r14).  The
    caller owns both guarantees; a step that re-emits an unchanged row
    under this flag would loop until max_iterations, and one that emits
    two rows for a key silently corrupts the solution set (add
    ``.dropDuplicates(keys)`` in the step if uniqueness is not
    structural — both in-repo callers aggregate per key).
    """
    keys = list(keys)
    same = workset is solution
    solution = solution.localCheckpoint(eager=True)
    workset = solution if same else workset.localCheckpoint(eager=True)
    cols = list(solution.columns)
    val_cols = [c for c in cols if c not in keys]
    for i in range(max_iterations):
        # normalize to the solution's column ORDER by name: subtract is
        # positional, and the final toDF(*cols) re-mint is a positional
        # rename — a step() returning value-columns-first would
        # otherwise silently mislabel (round-13 review; latent, every
        # in-repo caller happens to pass keys-first)
        updates = step(solution, workset, i).select(*cols)
        # changed = updates that differ from the current solution row.
        # toDF() mints fresh attribute ids for the checkpointed frame:
        # solution and changed otherwise share exprIds through the
        # subtract lineage, and Spark 4.1's attribute rewrite dies with
        # "key not found: <attr>" when an anti-join + union of two
        # checkpoint scans is itself checkpointed.  The merge below is
        # therefore a left-join + coalesce (update-in-place by key)
        # plus a union only for genuinely-new keys — same semantics,
        # planner-safe (verified over the failing co-order graph).
        changed = (
            (updates if updates_are_changed else updates.subtract(solution))
            .localCheckpoint(eager=True)
            .toDF(*updates.columns)
        )
        if not changed.take(1):
            break
        renamed = changed
        for c in val_cols:
            renamed = renamed.withColumnRenamed(c, f"_new_{c}")
        updated = solution.join(renamed, keys, "left").select(
            *keys,
            *[F.coalesce(f"_new_{c}", c).alias(c) for c in val_cols],
        )
        new_rows = changed.join(solution.select(*keys), keys, "left_anti")
        solution = (
            updated.select(*cols)  # name-ordered before the positional re-mint
            .unionByName(new_rows.select(*cols))
            .localCheckpoint(eager=True)
            .toDF(*cols)
        )
        workset = changed
    return solution


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iterations: int = 20
) -> DataFrame:
    """Label-propagation connected components — the canonical iteration
    demo (Flink Gelly's ConnectedComponents example re-expressed).

    Returns (vertex, component) where component = min vertex id reachable.
    """
    # every iteration joins against the edge set: checkpoint it ONCE so
    # an expensive edge lineage (e.g. dedup_clusters' LSH+verify
    # pipeline) is not re-executed per iteration (measured: the whole
    # MinHash pipeline re-ran in each of ~5 label-propagation rounds)
    sym = edges.select(src, dst).unionByName(
        edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    ).localCheckpoint(eager=False)
    labels = (
        sym.select(F.col(src).alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )

    # Delta formulation (round 14, guide §2.3/§2.4): only vertices whose
    # label improved last round propagate, and the step emits ONLY
    # strictly-improved rows, so the generic subtract diff (two
    # full-vertex-set shuffles per round) is skipped.  Equivalence with
    # the bulk form: after round k a vertex's label is the minimum
    # vertex id within k hops under either schedule (an improvement can
    # only arrive through a neighbor that improved the round before),
    # and both terminate exactly when a round changes nothing — pinned
    # by tests/test_operators.py::test_connected_components_delta_matches_bulk.
    def step(solution: DataFrame, workset: DataFrame, _i: int) -> DataFrame:
        neighbor_min = (
            sym.join(workset, sym[src] == workset["vertex"])
            .groupBy(F.col(dst).alias("vertex"))
            .agg(F.min("component").alias("nc"))
        )
        return (
            solution.alias("s")
            .join(neighbor_min, "vertex")
            .where(F.col("nc") < F.col("s.component"))
            .select("vertex", F.col("nc").alias("component"))
        )

    return delta_iterate(
        labels, labels, ["vertex"], step, max_iterations, updates_are_changed=True
    )


def triangle_enumeration(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct triangles (a < b < c) in an undirected graph given
    canonical edges (src < dst) — Flink Gelly's TriangleEnumerator
    (gelly library/TriangleEnumerator.java) re-expressed as the
    node-iterator join: wedge build (e1.dst = e2.src) then closing-edge
    hash join.  Canonical edge direction makes each triangle appear
    exactly once and bounds wedge count by sum(out_deg * in_deg) —
    the standard distributed formulation; at 100 TB you additionally
    orient edges by degree (low->high) to cap the skew of hub nodes.
    """
    # e feeds all three legs of the wedge + closing-edge joins: the lazy
    # checkpoint runs the canonicalize+distinct (and whatever edge
    # lineage the caller passes) once instead of three times (round 14)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    return (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
        .join(
            e.alias("e3"),
            (F.col("a") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst")),
        )
        .select("a", "b", "c")
    )


PR_SCALE = 1_000_000_000  # ranks as integer micro-units: engine-exact


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank with damping 0.85 over DIRECTED edges, computed entirely
    in scaled-integer arithmetic — Flink Gelly's PageRank example
    re-expressed, made engine-exact: ranks are BIGINT micro-units
    (PR_SCALE total mass), each step is integer division + integer
    sums, so two engines produce bit-identical ranks (float PageRank
    diverges across engines through summation order).  Fixed iteration
    count (the Gelly example's termination mode).

    new_rank = floor(0.15 * init) + floor(0.85 * sum(contrib)) with
    contrib = rank div out_degree — rounding loss stays in the dropped
    remainders (bounded by out_degree units per node per round).
    """
    e = edges.select(src, dst).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    init = PR_SCALE // n_nodes
    base = (15 * init) // 100
    # (edge, out-degree) is loop-invariant: join it ONCE and checkpoint,
    # instead of re-running the degree aggregation + edge join in every
    # rank round (round 14, guide §2.4 — one exchange shared by all
    # iterations; only the rank join + contribution sum remain per round)
    deg = e.groupBy(src).agg(F.count("*").alias("deg"))
    e_deg = e.join(deg, src).localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank", F.lit(init).cast("long"))
    for _ in range(iterations):
        contrib = (
            e_deg.join(ranks, F.col(src) == F.col("node"))
            .select(F.col(dst).alias("node"), F.expr("rank div deg").alias("c"))
        )
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                (
                    F.lit(base) + F.expr("(85 * coalesce(s, 0L)) div 100")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


SSSP_INF = 10**9


def shortest_paths(
    edges: DataFrame,
    source: int,
    max_iterations: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source shortest hop counts over directed edges — Flink
    Gelly's SingleSourceShortestPaths example via the engine's DELTA
    iteration: only the frontier (vertices whose distance improved)
    joins the edge set each round, the solution set merges by key —
    the asymptotically-right formulation (work tracks the frontier,
    not the vertex set).  Returns (node, dist) for reached vertices.
    """
    # The frontier joins e while the vertex set ALSO derives from e —
    # two scans of one checkpointed plan share exprIds, and Spark
    # 4.1's self-join attribute dedup can fail planning with
    # "key not found: <attr>".  Materialize once, then derive the
    # vertex side from a re-aliased copy (toDF mints fresh ids) so the
    # two sides never collide.
    e = edges.select(src, dst).localCheckpoint(eager=True)
    e_v = e.toDF(src, dst)
    vertices = (
        e_v.select(F.col(src).alias("v"))
        .unionByName(e_v.select(F.col(dst).alias("v")))
        .distinct()
        .withColumn(
            "dist",
            F.when(F.col("v") == source, F.lit(0)).otherwise(F.lit(SSSP_INF)),
        )
    )
    work = vertices.where(F.col("dist") == 0)

    # The step emits ONLY strictly-improved vertices (round 14, guide
    # §2.3): the old form returned the full least()-merged solution —
    # O(|V|) rows per round — and paid delta_iterate's generic subtract
    # (two more full-solution shuffles) just to re-derive the frontier.
    # Emitting `cand.dist < s.dist` rows is exactly that frontier (BFS
    # min-merge: any other candidate row equals the solution row), so
    # updates_are_changed=True is sound and the per-round shuffles carry
    # frontier-sized data; the tiny changed side then broadcast-joins in
    # the merge.  Measured at sf0.1 (x_graph_sssp): 6.7 -> 4.2 s
    # same-session min-of-3; row-identical output.
    def step(solution: DataFrame, workset: DataFrame, _i: int) -> DataFrame:
        cand = (
            e.join(workset, e[src] == workset["v"])
            .select(F.col(dst).alias("v"), (F.col("dist") + 1).alias("dist"))
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
        )
        return (
            solution.alias("s")
            .join(cand.alias("c"), "v")
            .where(F.col("c.dist") < F.col("s.dist"))
            .select("v", F.col("c.dist").alias("dist"))
        )

    out = delta_iterate(
        vertices, work, ["v"], step, max_iterations, updates_are_changed=True
    )
    return out.where(F.col("dist") < SSSP_INF).select(
        F.col("v").alias("node"), "dist"
    )
