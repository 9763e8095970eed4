"""Graph operators over edge Datasets (crawl-prioritization analytics).

PageRank is THE canonical computation a crawl frontier's priority policy
wants at scale (rank-ordered fetch scheduling); the reference's BFS loop
has no equivalent, so this is a beyond-reference capability in the same
family as the priority-policy plug (SURVEY §2.10 O-48).

Scale shape: ranks and edges are both Datasets — nothing node- or
edge-proportional ever lands on the driver. Each iteration is
  edges ⋈ ranks (hash shuffle on src)  →  per-edge contribution
  →  groupby(dst).sum                   →  damping + dangling fold
with map-side combine inside the groupby and a single O(1) aggregate for
the dangling mass. 10^10-node graphs run exactly this loop; the only
driver state is the scalar dangling sum per iteration.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum


def _node_ranks_init(edges: ray.data.Dataset, src: str, dst: str):
    """(node, rank=1/N, outdeg) dataset + node count N. Node set = union of
    both endpoint columns; out-degrees from one groupby count."""
    nodes = (
        edges.select_columns([src])
        .rename_columns(["node"])
        .union(edges.select_columns([dst]).rename_columns(["node"]))
        .groupby("node")
        .count()
        .select_columns(["node"])
        .materialize()
    )
    n = nodes.count()
    deg = (
        edges.groupby(src)
        .aggregate(Count(alias_name="outdeg"))
        .rename_columns({src: "node"})
    )
    from crawlray.ops.relational import shuffle_join

    withdeg = shuffle_join(
        nodes, deg, on=["node"], join_type="left_outer"
    )

    def _init(batch: pa.Table) -> pa.Table:
        outdeg = pc.fill_null(pc.cast(batch.column("outdeg"), pa.int64()), 0)
        rank = pa.array([1.0 / n] * batch.num_rows, pa.float64())
        return pa.table(
            {"node": batch.column("node"), "rank": rank, "outdeg": outdeg}
        )

    return withdeg.map_batches(_init, batch_format="pyarrow").materialize(), n


def pagerank(
    edges: ray.data.Dataset,
    n_iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Distributed PageRank over an edge Dataset → (node, rank).

    Standard formulation with uniform teleport and dangling-mass
    redistribution:
        r'(v) = (1-d)/N + d·( Σ_{(u,v)∈E} r(u)/outdeg(u) + D/N )
    where D = Σ r(u) over dangling nodes (outdeg 0). Each iteration is one
    shuffle join (edges ⋈ ranks on the source) + one groupby(dst) sum +
    one O(1) dangling aggregate; ranks materialize per iteration so the
    join's upstream never re-executes. Deterministic: float sums combine
    through Ray's tree aggregation per iteration, parity-tested against a
    dense numpy reference to 1e-9 on every node.
    """
    from crawlray.ops.relational import shuffle_join, single_row_agg

    edges = edges.select_columns([src_col, dst_col]).materialize()
    ranks, n = _node_ranks_init(edges, src_col, dst_col)
    teleport = (1.0 - damping) / n

    for _ in range(n_iters):
        dang_tbl = single_row_agg(
            ranks.filter(expr="outdeg == 0"), [Sum("rank", alias_name="s")]
        )
        dang = dang_tbl.column("s")[0].as_py() or 0.0

        joined = shuffle_join(
            edges, ranks, on=[src_col], right_on=["node"]
        )

        def _contrib(batch: pa.Table) -> pa.Table:
            w = pc.divide(
                batch.column("rank"),
                pc.cast(batch.column("outdeg"), pa.float64()),
            )
            return pa.table({"node": batch.column(dst_col), "w": w})

        sums = (
            joined.map_batches(_contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("w", alias_name="in_sum"))
        )
        # nodes with NO in-edges still need (teleport + dangling) mass:
        # left-join the full node set against the contribution sums
        base = teleport + damping * dang / n
        merged = shuffle_join(
            ranks.select_columns(["node", "outdeg"]), sums,
            on=["node"], join_type="left_outer",
        )

        def _apply(batch: pa.Table) -> pa.Table:
            in_sum = pc.fill_null(
                pc.cast(batch.column("in_sum"), pa.float64()), 0.0
            )
            rank = pc.add(pc.multiply(in_sum, damping), base)
            return pa.table(
                {
                    "node": batch.column("node"),
                    "rank": rank,
                    "outdeg": batch.column("outdeg"),
                }
            )

        ranks = merged.map_batches(_apply, batch_format="pyarrow").materialize()

    return ranks.select_columns(["node", "rank"])


def connected_components(
    pairs: ray.data.Dataset,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 50,
) -> ray.data.Dataset:
    """Connected components over an undirected pair Dataset → (node,
    component) where component = the smallest node id in the component.

    THE standard finale of corpus near-dup dedup: pair emitters
    (minhash/simhash/cosine/SRP) give EDGES; keeping one document per
    duplicate CLUSTER needs the transitive closure. Min-label propagation:
    every node starts labeled with itself; each round, labels flow across
    edges (one shuffle join + one groupby-min) and a node takes the min of
    its own and its neighbors' labels. Converges in O(component diameter)
    rounds — near-dup clusters are shallow (diameter ≤ ~bands), so a few
    rounds suffice; convergence is detected with a single O(1) changed-count
    aggregate per round, nothing node-proportional on the driver.
    """
    from ray.data.aggregate import Min, Sum
    from crawlray.ops.relational import shuffle_join

    # undirected: propagate both ways
    fwd = pairs.select_columns([a_col, b_col]).rename_columns(["u", "v"])
    rev = pairs.select_columns([b_col, a_col]).rename_columns(["u", "v"])
    edges = fwd.union(rev).materialize()

    labels = (
        edges.select_columns(["u"])
        .groupby("u")
        .count()
        .select_columns(["u"])
        .map_batches(
            lambda b: pa.table({"node": b.column("u"), "label": b.column("u")}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(max_iters):
        # neighbor labels: edge (u,v) carries label(u) to v
        carried = shuffle_join(
            edges, labels, on=["u"], right_on=["node"]
        ).map_batches(
            lambda b: pa.table({"node": b.column("v"), "nl": b.column("label")}),
            batch_format="pyarrow",
        )
        neigh_min = carried.groupby("node").aggregate(Min("nl", alias_name="nl"))
        merged = shuffle_join(labels, neigh_min, on=["node"], join_type="left_outer")

        def _take_min(batch: pa.Table) -> pa.Table:
            nl = pc.fill_null(batch.column("nl"), pc.max(batch.column("label")))
            new = pc.min_element_wise(batch.column("label"), nl)
            changed = pc.cast(
                pc.not_equal(new, batch.column("label")), pa.int64()
            )
            return pa.table(
                {"node": batch.column("node"), "label": new, "chg": changed}
            )

        labels = merged.map_batches(_take_min, batch_format="pyarrow").materialize()
        from crawlray.ops.relational import single_row_agg

        n_changed = single_row_agg(labels, [Sum("chg", alias_name="c")]).column(
            "c"
        )[0].as_py() or 0
        labels = labels.select_columns(["node", "label"]).materialize()
        if n_changed == 0:
            break

    return labels.rename_columns({"label": "component"})
