"""Data-parallel sampled-minibatch training over the ``data`` mesh axis.

SURVEY §7 step 7(a): the reference trains minibatches on one GPU; here each
device consumes its own sampled minibatch (identical static shapes — the
static-shape sampler makes this free) and gradients are mean-reduced across
the axis. Implemented with shard_map + psum so it composes with the
``graph`` axis (edge partition) on a 2-D mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..sampling.neighbor import MiniBatch

__all__ = ["stack_minibatches", "make_dp_train_step"]


def stack_minibatches(mbs: Sequence[MiniBatch]) -> MiniBatch:
    """Stack R same-shape minibatches along a new leading replica dim."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *mbs)


def make_dp_train_step(
    loss_fn: Callable,  # (params, minibatch, *consts) -> scalar loss
    optimizer,
    mesh: Mesh,
    axis: str = "data",
):
    """Build a jitted DP train step.

    ``loss_fn`` sees ONE replica's minibatch (leading replica dim stripped);
    parameters are replicated, gradients are ``pmean``-ed over ``axis``.
    Extra positional args (e.g. the device-resident feature matrix) are
    treated as replicated constants.
    """

    def step(params, opt_state, stacked_mb, *consts):
        def per_replica(params, mb, *consts):
            mb1 = jax.tree_util.tree_map(lambda x: x[0], mb)
            loss, grads = jax.value_and_grad(loss_fn)(params, mb1, *consts)
            loss = jax.lax.pmean(loss, axis)
            grads = jax.lax.pmean(grads, axis)
            return loss, grads

        in_specs = (P(), jax.tree_util.tree_map(lambda _: P(axis), stacked_mb), *(P() for _ in consts))
        loss, grads = shard_map(
            per_replica,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_rep=False,
        )(params, stacked_mb, *consts)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)
