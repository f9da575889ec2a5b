"""Real-dataset loaders (activate when files are on disk).

The reference gets data via ``dgl.data.load_data`` / OGB loaders
(``main_dgl_citation_sage.py:153``, ``main_dgl_arxiv_sage.py``); this module
reads the same public on-disk formats *independently* (no dgl/ogb deps):

* Planetoid pickles (cora/pubmed): ``ind.<name>.{x,tx,allx,y,ty,ally,graph,test.index}``
* DGL Reddit: ``reddit_data.npz`` + ``reddit_graph.npz``
* OGB node-prop: ``<root>/<name>/raw/edge.csv.gz`` + ``node-feat.csv.gz`` …
* canonical npz: ``<root>/<name>.npz`` with keys
  src, dst, x, y, train, val, test (our own cache/interchange format)

Search order per dataset: canonical npz → public raw format → synthetic
fallback (``synthetic.py``). Data root: ``$DGL_TPU_DATA_DIR`` or
``<repo>/.data_cache``.
"""

from __future__ import annotations

import gzip
import os
import pickle
import sys
from typing import Optional

import numpy as np

from .synthetic import (
    NODE_DATASET_STATS,
    NodeClassificationData,
    synthetic_node_classification,
)

__all__ = ["data_root", "load_node_dataset"]


def data_root() -> str:
    return os.environ.get(
        "DGL_TPU_DATA_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".data_cache"),
    )


def _load_canonical_npz(path: str, name: str) -> NodeClassificationData:
    z = np.load(path)
    return NodeClassificationData(
        name=name,
        src=z["src"],
        dst=z["dst"],
        num_nodes=int(z["x"].shape[0]),
        features=z["x"],
        labels=z["y"],
        train_mask=z["train"],
        val_mask=z["val"],
        test_mask=z["test"],
        num_classes=int(z["y"].max()) + 1 if z["y"].ndim == 1 else z["y"].shape[1],
        edge_feat=z["ef"] if "ef" in z.files else None,
        synthetic=False,
    )


def _parse_planetoid(root: str, name: str) -> NodeClassificationData:
    def rd(suffix):
        with open(os.path.join(root, f"ind.{name}.{suffix}"), "rb") as f:
            if suffix == "test.index":
                return np.array([int(l) for l in f.read().split()])
            return pickle.load(f, encoding="latin1")

    x, tx, allx = rd("x"), rd("tx"), rd("allx")
    y, ty, ally = rd("y"), rd("ty"), rd("ally")
    graph = rd("graph")
    test_idx = rd("test.index")

    import scipy.sparse as sp

    features = sp.vstack((allx, tx)).tolil()
    test_sorted = np.sort(test_idx)
    features[test_idx, :] = features[test_sorted, :]
    labels_oh = np.vstack((ally, ty))
    labels_oh[test_idx, :] = labels_oh[test_sorted, :]
    labels = labels_oh.argmax(axis=1)

    n = features.shape[0]
    src = np.concatenate([[u] * len(vs) for u, vs in graph.items()]).astype(np.int64)
    dst = np.concatenate([list(vs) for vs in graph.values()]).astype(np.int64)
    keep = (src < n) & (dst < n)
    src, dst = src[keep], dst[keep]

    train_mask = np.zeros(n, bool)
    train_mask[: len(y)] = True
    val_mask = np.zeros(n, bool)
    val_mask[len(y) : len(y) + 500] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_sorted] = True
    return NodeClassificationData(
        name, src, dst, n, np.asarray(features.todense(), dtype=np.float32),
        labels.astype(np.int64), train_mask, val_mask, test_mask,
        int(labels.max()) + 1, None, synthetic=False,
    )


def _parse_reddit(root: str) -> NodeClassificationData:
    import scipy.sparse as sp

    data = np.load(os.path.join(root, "reddit_data.npz"))
    g = sp.load_npz(os.path.join(root, "reddit_graph.npz")).tocoo()
    labels = data["label"].astype(np.int64)
    types = data["node_types"]
    return NodeClassificationData(
        "reddit", g.col.astype(np.int64), g.row.astype(np.int64), g.shape[0],
        data["feature"].astype(np.float32), labels,
        types == 1, types == 2, types == 3,
        int(labels.max()) + 1, None, synthetic=False,
    )


def _parse_ogb_node(root: str, name: str) -> NodeClassificationData:
    """OGB raw csv.gz layout under <root>/<name_with_underscores>/."""
    d = os.path.join(root, name.replace("-", "_"))
    raw = os.path.join(d, "raw")

    def rd_csv(fn, dtype):
        with gzip.open(os.path.join(raw, fn), "rt") as f:
            return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)

    edges = rd_csv("edge.csv.gz", np.int64)
    x = rd_csv("node-feat.csv.gz", np.float32)
    y = rd_csv("node-label.csv.gz", np.int64)[:, 0]
    split_dir = os.path.join(d, "split")
    # ogb split dirs vary by dataset (time/sales_ranking/species)
    sub = os.listdir(split_dir)[0]

    def rd_split(fn):
        with gzip.open(os.path.join(split_dir, sub, fn), "rt") as f:
            return np.loadtxt(f, dtype=np.int64, ndmin=1)

    n = x.shape[0]
    masks = {}
    for part in ("train", "valid", "test"):
        m = np.zeros(n, bool)
        m[rd_split(f"{part}.csv.gz")] = True
        masks[part] = m
    return NodeClassificationData(
        name, edges[:, 0], edges[:, 1], n, x, y,
        masks["train"], masks["valid"], masks["test"],
        int(y.max()) + 1, None, synthetic=False,
    )


def load_node_dataset(
    name: str, root: Optional[str] = None, seed: int = 0, scale: float = 1.0
) -> NodeClassificationData:
    """Load by search order: canonical npz → public raw → synthetic.

    ``scale`` (< 1) is honored only by the synthetic fallback — real data is
    never subsampled silently.
    """
    root = root or data_root()
    npz = os.path.join(root, f"{name}.npz")
    if os.path.exists(npz):
        return _load_canonical_npz(npz, name)
    try:
        if name in ("cora", "pubmed") and os.path.exists(
            os.path.join(root, name, f"ind.{name}.x")
        ):
            return _parse_planetoid(os.path.join(root, name), name)
        if name == "reddit" and os.path.exists(os.path.join(root, "reddit", "reddit_data.npz")):
            return _parse_reddit(os.path.join(root, "reddit"))
        if name.startswith("ogbn-") and os.path.isdir(
            os.path.join(root, name.replace("-", "_"), "raw")
        ):
            return _parse_ogb_node(root, name)
    except Exception as exc:  # fall back, but tell the user
        print(f"[dgl_tpu.data] failed to parse on-disk {name}: {exc!r}; "
              "falling back to synthetic", file=sys.stderr)
    # DGL_TPU_SYNTH_STRUCTURAL=1 switches the synthetic fallback to the
    # structure-required construction (features alone ≈ chance) — the
    # hardened e2e gates run drivers under this env
    return synthetic_node_classification(
        name, seed=seed, cache_dir=root, scale=scale,
        structure_required=bool(os.environ.get("DGL_TPU_SYNTH_STRUCTURAL")),
    )
