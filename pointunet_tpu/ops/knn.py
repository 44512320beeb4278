"""On-device K-nearest-neighbor search.

The reference calls a host-side nanoflann KD-tree through tf.py_func on every
batch (reference PointSegment/helper_tool.py:84-94, utils/nearest_neighbors/
knn_.cxx). KD-trees are pointer-chasing structures that map terribly onto the
MXU/VPU, so the TPU-native design is different:

* ``knn`` — tiled brute force. Squared distances are computed as a matmul
  (MXU work: ``-2 q s^T + |q|^2 + |s|^2``) over support chunks, with a running
  top-k merge per query block. Exact, static shapes, O(Nq * Ns).
* A grid-bucketed variant (ops/knn_grid.py) prunes candidates to neighboring
  spatial cells for the large pyramid levels.

Both include the query point itself as its own nearest neighbor when the
query and support sets coincide — matching the reference's self-KNN use in
the pyramid build (reference PointSegment/runBraTS.py:148-151).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_to_multiple(x: jax.Array, block: int, axis: int, fill) -> jax.Array:
    n = x.shape[axis]
    rem = (-n) % block
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=fill)


def pad_k_columns(idx: jax.Array, k_req: int) -> jax.Array:
    """Widen (Nq, k_eff) neighbor indices to (Nq, k_req) by repeating the
    last valid column — keeps the static k-column contract when the
    support had fewer than k points (all KNN entry points use this)."""
    k_eff = idx.shape[1]
    if k_eff >= k_req:
        return idx
    return jnp.concatenate(
        [idx, jnp.repeat(idx[:, -1:], k_req - k_eff, axis=1)], axis=1
    )


def _block_knn(
    query: jax.Array,        # (Q, 3) f32
    support: jax.Array,      # (Ns, 3) f32
    k: int,
    support_chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact KNN of one query block against all support points.

    Scans over support chunks keeping a running (Q, k) best set. The merge is
    a top-k over (k + chunk) candidates using negated squared distances.
    """
    ns = support.shape[0]
    support_chunk = min(support_chunk, ns)
    # Pad with zeros (finite!) and mask padded columns below — padding with
    # inf would produce inf*0 NaNs inside the distance matmul.
    padded = _pad_to_multiple(support, support_chunk, axis=0, fill=0.0)
    n_chunks = padded.shape[0] // support_chunk
    chunks = padded.reshape(n_chunks, support_chunk, support.shape[1])

    q_sq = jnp.sum(query * query, axis=-1, keepdims=True)  # (Q, 1)

    def step(carry, inp):
        best_negd, best_idx = carry                      # (Q, k)
        chunk, base = inp                                # (C, 3), ()
        s_sq = jnp.sum(chunk * chunk, axis=-1)           # (C,)
        # -d^2 = 2 q.s - |q|^2 - |s|^2 ; larger is closer. HIGHEST precision:
        # the inner dim is 3, so exact f32 here costs nothing and avoids
        # bf16 MXU rounding flipping near-tie neighbor ranks.
        negd = (
            2.0
            * jnp.dot(
                query,
                chunk.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            - q_sq
            - s_sq[None, :]
        )                                                # (Q, C)
        idx = base + jax.lax.broadcasted_iota(
            jnp.int32, negd.shape, dimension=1
        )
        negd = jnp.where(idx < ns, negd, -jnp.inf)
        cand_negd = jnp.concatenate([best_negd, negd], axis=1)
        cand_idx = jnp.concatenate([best_idx, idx], axis=1)
        top_negd, top_pos = jax.lax.top_k(cand_negd, k)
        top_idx = jnp.take_along_axis(cand_idx, top_pos, axis=1)
        return (top_negd, top_idx), None

    init = (
        jnp.full((query.shape[0], k), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((query.shape[0], k), dtype=jnp.int32),
    )
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * support_chunk
    (negd, idx), _ = jax.lax.scan(step, init, (chunks, bases))
    return idx, -negd


@functools.partial(
    jax.jit, static_argnames=("k", "query_block", "support_chunk")
)
def knn(
    support: jax.Array,      # (Ns, 3)
    query: jax.Array,        # (Nq, 3)
    k: int,
    query_block: int = 8192,
    support_chunk: int = 8192,
) -> jax.Array:
    """Exact brute-force KNN. Returns (Nq, k) int32 indices into ``support``.

    Always k columns: when the support has fewer than k points, the search
    runs at k_eff = Ns and the trailing columns repeat the k_eff-th
    neighbor (valid indices, non-decreasing distance) — callers can rely
    on the static (Nq, k) shape.

    Argument order (support first) matches the reference
    ``DP.knn_search(support_pts, query_pts, k)`` (helper_tool.py:85).
    """
    support = support.astype(jnp.float32)
    query = query.astype(jnp.float32)
    nq = query.shape[0]
    k_req, k = k, min(k, support.shape[0])

    query_block = min(query_block, max(nq, 1))
    padded_q = _pad_to_multiple(query, query_block, axis=0, fill=0.0)
    n_blocks = padded_q.shape[0] // query_block
    blocks = padded_q.reshape(n_blocks, query_block, query.shape[1])

    def run_block(qb):
        idx, _ = _block_knn(qb, support, k, support_chunk)
        return idx

    idx = jax.lax.map(run_block, blocks)
    return pad_k_columns(idx.reshape(-1, k)[:nq], k_req)


@functools.partial(
    jax.jit, static_argnames=("k", "query_block", "support_chunk")
)
def knn_with_distances(
    support: jax.Array,
    query: jax.Array,
    k: int,
    query_block: int = 8192,
    support_chunk: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """As ``knn`` but also returns squared distances (Nq, k); when
    Ns < k the trailing columns repeat the last valid neighbor."""
    support = support.astype(jnp.float32)
    query = query.astype(jnp.float32)
    nq = query.shape[0]
    k_req, k = k, min(k, support.shape[0])

    query_block = min(query_block, max(nq, 1))
    padded_q = _pad_to_multiple(query, query_block, axis=0, fill=0.0)
    n_blocks = padded_q.shape[0] // query_block
    blocks = padded_q.reshape(n_blocks, query_block, query.shape[1])

    def run_block(qb):
        return _block_knn(qb, support, k, support_chunk)

    idx, d2 = jax.lax.map(run_block, blocks)
    idx, d2 = idx.reshape(-1, k)[:nq], d2.reshape(-1, k)[:nq]
    return pad_k_columns(idx, k_req), pad_k_columns(d2, k_req)


def knn_batch(support: jax.Array, query: jax.Array, k: int, **kw) -> jax.Array:
    """Batched KNN (B, Ns, 3) x (B, Nq, 3) -> (B, Nq, k).

    Drop-in analog of the reference's ``nearest_neighbors.knn_batch``
    (utils/nearest_neighbors/knn.pyx:71).
    """
    return jax.vmap(lambda s, q: knn(s, q, k, **kw))(support, query)
