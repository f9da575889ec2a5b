"""GAT networks.

Architecture parity target: ``main_dgl_citation_gat.py:14-64`` — first layer
without feat/attn dropout, hidden layers with elu activation and head
concat, output layer averages heads. Works over one graph or per-layer
sampled blocks (``ns-gat-dgl.py:22-60``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..nn import GATConv


class GAT(nn.Module):
    hidden_feats: int
    out_feats: int
    heads: Sequence[int]  # one entry per layer, e.g. (8, 8, 1)
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    activation: Callable = nn.elu
    residual: bool = False

    @nn.compact
    def __call__(self, graphs, x, *, deterministic: bool = True):
        num_layers = len(self.heads)
        blocks = graphs if isinstance(graphs, (list, tuple)) else [graphs] * num_layers
        if len(blocks) != num_layers:
            raise ValueError(f"expected {num_layers} blocks, got {len(blocks)}")
        h = x
        for i, g in enumerate(blocks):
            last = i == num_layers - 1
            conv = GATConv(
                out_feats=self.out_feats if last else self.hidden_feats,
                num_heads=self.heads[i],
                feat_drop=0.0 if i == 0 else self.feat_drop,
                attn_drop=0.0 if i == 0 else self.attn_drop,
                negative_slope=self.negative_slope,
                residual=self.residual,
                activation=None if last else self.activation,
                name=f"gat_{i}",
            )
            feat = (h, h[: g.num_dst_nodes]) if g.is_block else h
            h = conv(g, feat, deterministic=deterministic)
            # concat heads on hidden layers, average on the output layer
            h = jnp.mean(h, axis=1) if last else h.reshape(h.shape[0], -1)
        return h
