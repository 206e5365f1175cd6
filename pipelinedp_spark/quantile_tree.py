"""Hierarchical-histogram ("quantile tree") DP quantile sketch.

Matches the semantics of the reference's QuantileCombiner (reference:
pipeline_dp/combiners.py:629-719), which wraps Google's C++ quantile-tree
(height 4, branching 16): every value increments one node per level on its
root-to-leaf path; quantiles are computed by a noisy root-to-leaf descent
where every *visited* node's count gets fresh noise (zero-count nodes
included) with the per-level budget eps/height, and all requested quantiles
share one set of noise draws. This file is a from-scratch reimplementation
of that public algorithm — no PyDP, no serialized-tree state.

Spark-first shape: the mergeable sketch state is simply the per-(pk, leaf)
exact count histogram — a native map-side-combinable groupBy, identical to
the bin histogram the fast path uses but at leaf resolution b^h. The noisy
descent then runs per partition key in an Arrow-batched applyInPandas over
those (at most b^h, in practice #distinct-leaves) rows. Level counts are
derived from leaf counts on the fly (node = leaf // b^(h-level)), so no
per-level shuffle is needed.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

DEFAULT_TREE_HEIGHT = 4
DEFAULT_BRANCHING_FACTOR = 16


def num_leaves(height: int = DEFAULT_TREE_HEIGHT,
               branching: int = DEFAULT_BRANCHING_FACTOR) -> int:
    return branching ** height


def compute_tree_quantiles(
        leaf_ids: np.ndarray,
        leaf_counts: np.ndarray,
        quantiles: Sequence[float],
        lo: float,
        hi: float,
        noise_fn: Callable[[], float],
        height: int = DEFAULT_TREE_HEIGHT,
        branching: int = DEFAULT_BRANCHING_FACTOR,
        return_total: bool = False):
    """Noisy root-to-leaf descent over a sparse leaf histogram.

    ``noise_fn()`` draws one fresh noise value; it is called once per
    visited node (memoized), so all quantiles share the same noisy tree —
    the property that makes the reference combiner's multi-quantile
    answers mutually consistent.

    ``return_total=True`` returns ``(values, level1_total)`` where the
    total is the sum of the level-1 noisy children — the noisy entry
    count the descent itself ranks against. It reuses the descent's own
    draws, so reading it consumes no extra budget.
    """
    if hi <= lo:
        vals = [lo for _ in quantiles]
        return (vals, 0.0) if return_total else vals
    order = np.argsort(leaf_ids)
    leaf_ids = np.asarray(leaf_ids, dtype=np.int64)[order]
    leaf_counts = np.asarray(leaf_counts, dtype=np.float64)[order]

    def exact_count(level: int, node: int) -> float:
        """Sum of leaf counts under `node` at `level` (leaves are level
        `height`). Contiguous leaf range -> two searchsorted calls."""
        span = branching ** (height - level)
        a = node * span
        i = np.searchsorted(leaf_ids, a, side="left")
        j = np.searchsorted(leaf_ids, a + span, side="left")
        return float(leaf_counts[i:j].sum())

    noisy_cache: Dict[Tuple[int, int], float] = {}

    def noisy_count(level: int, node: int) -> float:
        key = (level, node)
        if key not in noisy_cache:
            noisy_cache[key] = max(
                0.0, exact_count(level, node) + noise_fn())
        return noisy_cache[key]

    results = []
    level1_total = None
    for q in quantiles:
        frac = min(max(q / 100.0, 0.0), 1.0)
        node = 0
        node_lo, node_hi = float(lo), float(hi)
        rank = None
        chosen_count = 0.0
        for level in range(1, height + 1):
            children = [noisy_count(level, node * branching + j)
                        for j in range(branching)]
            total = sum(children)
            if level == 1:
                rank = frac * total
                if level1_total is None:
                    level1_total = total
            rank = min(max(rank, 0.0), total)
            cum = 0.0
            chosen = branching - 1
            for j, c in enumerate(children):
                if cum + c >= rank:
                    chosen = j
                    break
                cum += c
            else:
                # float-roundoff guard: rank == total but the incremental
                # sum fell one ulp short. Land in the last child.
                cum -= children[-1]
            rank -= cum
            chosen_count = children[chosen]
            node = node * branching + chosen
            width = (node_hi - node_lo) / branching
            node_lo, node_hi = (node_lo + chosen * width,
                                node_lo + (chosen + 1) * width)
        if chosen_count > 0:
            inner = min(max(rank / chosen_count, 0.0), 1.0)
        else:
            inner = 0.5
        results.append(node_lo + (node_hi - node_lo) * inner)
    if return_total:
        return results, float(level1_total or 0.0)
    return results


def make_noise_fn(noise_mode: str, kind: str, scale: float,
                  rng: "np.random.Generator" = None) -> Callable[[], float]:
    """One draw per visited node. `scale` is the per-node noise parameter
    (Laplace b or Gaussian sigma) already calibrated for eps/height per
    level and per-level L1/L2 sensitivity l0*linf."""
    if noise_mode == "zero" or scale == 0.0:
        return lambda: 0.0
    rng = rng or np.random.default_rng()
    if kind == "laplace":
        return lambda: float(rng.laplace(0.0, scale))
    return lambda: float(rng.normal(0.0, scale))
