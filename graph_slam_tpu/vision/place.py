"""Global place recognition: one-matmul loop-closure proposals.

The reference only ever attempts loop closures against the last
``m_lookback_nodes`` (5-7) keyframes (``gtsam_graph.cpp:1716-1753``) — a
revisit after a longer excursion is never closed. This adds the missing
global tier, shaped for the TPU:

- every keyframe's local descriptors aggregate into ONE global descriptor
  (VLAD-lite: soft assignment of the frame's descriptors to a fixed
  pseudo-random codebook on the unit sphere, residual aggregation,
  intra-normalization — two matmuls, batched over all features);
- the keyframe bank is a padded (capacity, Dg) matrix; querying a new
  frame against every previous place is a single matvec + ``top_k`` —
  the thousand-keyframe version of the reference's thread-pool fan-out.

Proposals feed the existing pairwise matcher + gates; geometry still
decides. ``OnlineSlam(global_loop_k=...)`` wires it in, and GNC
(graph/gnc.py) is the natural downstream guard for false positives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .features import FeatureFrame

__all__ = ["PlaceIndex", "global_descriptor"]

_codebook_cache: dict = {}


def _codebook(desc_dim: int, n_centers: int, seed: int):
    key = (desc_dim, n_centers, seed)
    if key not in _codebook_cache:
        # plain NumPy: building this under an active trace would cache a
        # tracer and poison later calls
        r = np.random.default_rng(seed)
        c = r.normal(size=(n_centers, desc_dim)).astype(np.float32)
        _codebook_cache[key] = c / np.linalg.norm(c, axis=1, keepdims=True)
    return jnp.asarray(_codebook_cache[key])


@partial(jax.jit, static_argnames=("n_centers", "seed"))
def global_descriptor(frame: FeatureFrame, n_centers: int = 16,
                      seed: int = 0):
    """Aggregate a frame's local descriptors into one (n_centers * D,)
    L2-normalized global descriptor (VLAD with a fixed random codebook:
    hard nearest-center assignment, residual aggregation, signed-sqrt
    power normalization against burstiness, intra + global L2).

    Soft assignment is useless here — random unit centers give cosine
    sims ~N(0, 1/sqrt(D)), so any softmax temperature that stays stable
    is near-uniform and every frame collapses to the same descriptor
    (measured 0.99 cross-SCENE similarity). Hard argmax assignment
    measured 0.94 same-place vs 0.84 different-scene."""
    d = jnp.asarray(frame.desc, jnp.float32)
    centers = _codebook(d.shape[1], n_centers, seed)
    w = frame.valid.astype(jnp.float32)
    sim = d @ centers.T                               # (M, C)
    # dtype pinned: one_hot defaults to float64 under x64, which would
    # poison the descriptor and trip the f64->f32 scatter deprecation in
    # PlaceIndex.add
    a = jax.nn.one_hot(jnp.argmax(sim, axis=1), n_centers,
                       dtype=d.dtype) * w[:, None]
    # residual aggregation: V[c] = sum_{i -> c} (d_i - center_c)
    V = a.T @ d - (jnp.sum(a, axis=0)[:, None] * centers)   # (C, D)
    V = jnp.sign(V) * jnp.sqrt(jnp.abs(V))
    V = V / jnp.maximum(jnp.linalg.norm(V, axis=1, keepdims=True), 1e-8)
    v = V.reshape(-1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-8)


class PlaceIndex:
    """Append-only bank of global descriptors with top-k cosine queries.

    The bank lives as a padded device matrix; ``query`` is one matvec.
    """

    def __init__(self, n_centers: int = 16, seed: int = 0,
                 capacity: int = 256):
        self.n_centers = n_centers
        self.seed = seed
        self._rows: list[np.ndarray] = []
        self._bank = None          # (cap, Dg) device matrix
        self._cap = capacity

    def __len__(self) -> int:
        return len(self._rows)

    def describe(self, frame: FeatureFrame):
        return global_descriptor(frame, n_centers=self.n_centers,
                                 seed=self.seed)

    def add(self, frame: FeatureFrame) -> int:
        """Describe + append; returns the new row id."""
        g = np.asarray(self.describe(frame))
        self._rows.append(g)
        n = len(self._rows)
        if self._bank is None or n > self._bank.shape[0]:
            while self._cap < n:
                self._cap *= 2
            bank = np.zeros((self._cap, g.shape[0]), np.float32)
            bank[:n] = np.stack(self._rows)
            self._bank = jnp.asarray(bank)
        else:
            self._bank = self._bank.at[n - 1].set(jnp.asarray(g))
        return n - 1

    def query(self, frame: FeatureFrame, top_k: int = 3,
              max_id: int | None = None):
        """(ids, sims) of the most similar banked places, best first.

        ``max_id``: only consider rows with id < max_id (exclude recent
        keyframes so proposals don't duplicate the lookback window).
        """
        n = len(self._rows) if max_id is None else min(max_id,
                                                       len(self._rows))
        if n <= 0 or self._bank is None:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        g = self.describe(frame)
        sims = self._bank @ g                       # (cap,)
        mask = jnp.arange(self._bank.shape[0]) < n
        sims = jnp.where(mask, sims, -jnp.inf)
        k = min(top_k, n)
        top, idx = jax.lax.top_k(sims, k)
        keep = np.isfinite(np.asarray(top))
        return np.asarray(idx)[keep], np.asarray(top)[keep]
