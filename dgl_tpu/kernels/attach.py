"""Attach lane-SpMM execution plans to a Graph.

``attach_lane_plans(g)`` precomputes the Pallas lane plan for the forward
graph and (for backward) its transpose, stores them on the Graph (pytree
field ``lane``), and returns the augmented Graph. ``gspmm`` then dispatches
``copy_u × sum/mean`` to the fused kernel automatically when the plan's
padding expansion is acceptable and the shape qualifies.

Tip: relabel nodes by a locality partition first (``partition_assignment``
+ contiguous renumbering) — the plan's expansion factor, printed by this
function, is the thing to optimize.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.graph import Graph, from_edges
from .lane_spmm import LanePlan, build_plan

__all__ = ["LaneAttachment", "attach_lane_plans"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LaneAttachment:
    plan: LanePlan
    remainder: Optional[Graph]  # sparse-tile edges for the XLA path
    # VMEM-resident feature dtype for the kernel (None → bf16 default;
    # pass jnp.float32 to keep full precision at 2x the VMEM footprint)
    compute_dtype: Optional[object] = None
    # canonical (forward-order) edge id per remainder-graph edge slot —
    # the attention hybrid keys its dropout mask on these
    rem_eid: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (self.plan, self.remainder, self.rem_eid), (self.compute_dtype,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], leaves[1], aux[0], leaves[2])


def _attach_one(g: Graph, dense_threshold: int, max_expansion: float,
                compute_dtype=None, eid: Optional[np.ndarray] = None
                ) -> Optional[LaneAttachment]:
    src, dst = g.edges_numpy()
    plan = build_plan(src, dst, g.num_src_nodes, g.num_dst_nodes,
                      dense_threshold=dense_threshold, eid=eid)
    rem_frac = len(plan.rem_src) / max(g.num_edges, 1)
    print(
        f"[dgl_tpu.kernels] lane plan: expansion={plan.expansion:.2f} "
        f"remainder={rem_frac:.1%} chunks={plan.num_chunks}",
        file=sys.stderr,
    )
    if plan.expansion > max_expansion:
        return None
    rem = None
    rem_eid = None
    if len(plan.rem_src):
        rem = from_edges(
            plan.rem_src, plan.rem_dst, g.num_src_nodes, g.num_dst_nodes,
            build_reverse=False,
        )
        # canonical eids permuted into the remainder graph's dst-sorted
        # edge order (rem.eid maps its slots back to rem input order)
        pos = np.asarray(rem.eid)
        arr = np.full(len(pos), 2**31 - 1, np.int32)
        ok = pos < len(plan.rem_eid)
        arr[ok] = plan.rem_eid[pos[ok]].astype(np.int32)
        rem_eid = jnp.asarray(arr)
    return LaneAttachment(plan=plan, remainder=rem,
                          compute_dtype=compute_dtype, rem_eid=rem_eid)


def attach_lane_plans(
    g: Graph, *, dense_threshold: int = 48, max_expansion: float = 2.5,
    compute_dtype=None,
) -> Graph:
    """Returns ``g`` with lane plans attached to it and its reverse (when
    profitable); returns ``g`` unchanged if the graph tiles too sparsely.

    ``compute_dtype`` sets the kernel's VMEM feature dtype (None → bf16,
    ~1e-2 relative error; ``jnp.float32`` keeps full precision at double
    the VMEM footprint — only viable for small D x N).
    """
    fwd = _attach_one(g, dense_threshold, max_expansion, compute_dtype)
    if fwd is None:
        return g
    rev = g.reverse
    if rev is not None:
        # the reverse plan's eid slots carry FORWARD-canonical edge ids
        # (rev.eid maps reverse-canonical → forward-canonical) so that
        # plan-layout edge data — attention dropout masks, u_mul_e weights —
        # refers to the same edge in both layouts
        rev_eid = np.asarray(rev.eid)[: rev.num_edges]
        rev_att = _attach_one(rev, dense_threshold, max_expansion,
                              compute_dtype, eid=rev_eid)
        rev = dataclasses.replace(rev, lane=rev_att)
    return dataclasses.replace(g, lane=fwd, reverse=rev)
