"""Masked log-space Sinkhorn optimal transport with a dustbin.

Reference: log_optimal_transport / log_sinkhorn_iterations
(`src/models/utils/track4d_utils.py:405-434`) — the SuperGlue-style OT with
a learnable bin score α, run for 500 iterations on the (m+1)×(n+1)
coupling matrix.

This version works on a fixed (K+1)×(K+1) matrix with the first m rows /
n cols valid (slots are compacted by construction) and the dustbin pinned
at index K. Invalid rows/cols carry -1e9 scores and -1e9 log-marginals:
exp(-1e9 + anything_reasonable) underflows to exactly 0 in f32, so they
contribute nothing to the log-sum-exps and the valid sub-block reproduces
the reference computation bit-for-bit up to padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1e9)

# test hook: route the fixed-iteration path through the fused Pallas
# solver on CPU (interpret mode); on TPU it is used whenever enabled
FORCE_FUSED_ON_CPU = False
#: master switch for the fused-loop kernel (ops/pallas_sinkhorn.py).
#: Default OFF — measured a WASH on the real chip (bench eval
#: 3179 fps / 0.287 ms-frame device fused vs 3244 / 0.285 XLA loop):
#: inside the one compiled scan program the XLA per-iteration fusions
#: have no launch cost to save, and both forms are bound by the same
#: 2×(B,K+1,K+1) exp per iteration. Kept (tested, interpret-mode
#: bit-exact) as the recorded negative so it isn't re-tried.
USE_FUSED_KERNEL = False


def _fused_available() -> bool:
    return USE_FUSED_KERNEL and (jax.default_backend() == "tpu"
                                 or FORCE_FUSED_ON_CPU)


def _lse(a, axis):
    amax = jnp.max(a, axis=axis, keepdims=True)
    amax = jnp.maximum(amax, _NEG)  # guard all -NEG rows
    return jnp.squeeze(amax, axis) + jnp.log(
        jnp.sum(jnp.exp(a - amax), axis=axis))


def _lse_bounded(a, axis):
    """Log-sum-exp WITHOUT the max-subtraction pass.

    Safe for THIS OT instance by construction, not in general: valid
    entries of c are sigmoid affinities in (0, 1) (models/affinity.py)
    or the bin α; the Sinkhorn potentials obey |u|, |v| ≤ ‖c‖∞ +
    max|log marginal| + log(K+1) ≈ 10 — so every finite operand is in
    [-20, 20], where exp neither overflows nor loses the sum. Masked
    entries are exactly -1e9 → exp underflows to exactly 0, identical to
    the guarded path. All-masked rows sum to 0; the clamp turns log(0)
    into a large-negative (≈ -1e9 + 69 after the outer subtraction),
    which downstream treats as -inf just like the guarded path's ≈ 0
    potentials (only the valid block of Z is ever consumed).

    Why: the two-pass lse is TWO tiny reduce fusions per axis per
    iteration; at the reference's fixed 500 iterations those 2000
    dispatches per 32-frame scan dominate the association cost on TPU.
    This form halves them (measured ~25 µs/frame at the bench workload).
    Rounding differs from the two-pass form at ~1e-6 — the same rounding
    class as the XLA-vs-CUDA freedom documented for every other stage.
    """
    return jnp.log(jnp.maximum(jnp.sum(jnp.exp(a), axis=axis),
                               jnp.float32(1e-30)))


def log_optimal_transport_masked(scores: jnp.ndarray, m: jnp.ndarray,
                                 n: jnp.ndarray, alpha: jnp.ndarray,
                                 iters: int,
                                 tol: float = 0.0,
                                 safe_lse: bool = True) -> jnp.ndarray:
    """Masked log-OT.

    Args:
      scores: (K, K) affinities; rows = prev objects, cols = curr objects;
        only [0:m, 0:n] is meaningful.
      m, n: traced scalar counts of valid rows / cols.
      alpha: scalar learnable bin score (reference bin α = 0.9 passed at
        call sites; the module also registers a learnable bin_score).
      iters: Sinkhorn iterations (static; reference 500).
      tol: > 0 enables convergence early-exit (stop when max|Δu| < tol);
        the update is sequential and latency-bound, and the (K+1) system
        typically converges in tens of iterations — the reference's fixed
        500 burn most of the step's wall clock. 0 keeps exact reference
        iteration-count parity.
      safe_lse: True (default) = the two-pass max-subtracted log-sum-exp,
        safe for arbitrary score magnitudes. False = the bounded
        single-pass LSE (see _lse_bounded), valid only when finite scores
        are O(1) (sigmoid affinities + a modest bin α) — the
        affinity-scored association call site opts in explicitly.
    Returns:
      (K+1, K+1) log-coupling Z with the dustbin at index K; invalid
      entries ≈ -1e9.
    """
    k = scores.shape[0]
    row_ok = jnp.arange(k) < m
    col_ok = jnp.arange(k) < n

    mf = jnp.maximum(m.astype(jnp.float32), 1.0)
    nf = jnp.maximum(n.astype(jnp.float32), 1.0)
    norm = -jnp.log(mf + nf)

    c = jnp.where(row_ok[:, None] & col_ok[None, :], scores, _NEG)
    c = jnp.pad(c, ((0, 1), (0, 1)), constant_values=_NEG)
    c = c.at[:k, k].set(jnp.where(row_ok, alpha, _NEG))
    c = c.at[k, :k].set(jnp.where(col_ok, alpha, _NEG))
    c = c.at[k, k].set(alpha)

    log_mu = jnp.concatenate(
        [jnp.where(row_ok, norm, _NEG), (jnp.log(nf) + norm)[None]])
    log_nu = jnp.concatenate(
        [jnp.where(col_ok, norm, _NEG), (jnp.log(mf) + norm)[None]])

    lse = _lse if safe_lse else _lse_bounded

    def step(u, v):
        u_new = log_mu - lse(c + v[None, :], axis=1)
        v_new = log_nu - lse(c + u_new[:, None], axis=0)
        return u_new, v_new

    if tol > 0.0:
        def cond(state):
            i, _, _, delta = state
            return (i < iters) & (delta > tol)

        def body(state):
            i, u, v, _ = state
            u_new, v_new = step(u, v)
            # ignore padded entries (pinned at ±_NEG) in the residual
            delta = jnp.max(jnp.where(jnp.abs(u_new) < 1e8,
                                      jnp.abs(u_new - u), 0.0))
            return i + 1, u_new, v_new, delta

        _, u, v, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros(k + 1), jnp.zeros(k + 1),
             jnp.float32(jnp.inf)))
    elif not safe_lse and _fused_available():
        # fused-loop Pallas solver: all `iters` iterations inside ONE
        # kernel (the XLA lowering is 2 tiny reduce fusions + copies per
        # iteration — ~1000 launches/frame of pure overhead at this
        # shape). Same bounded-LSE expression; reduce-order ulps only.
        # Primal-only (nothing differentiates through Z — the loss
        # consumes raw affinities; Z feeds argmax matching).
        from ..ops.pallas_sinkhorn import sinkhorn_uv
        u, v = sinkhorn_uv(c, log_mu, log_nu, iters)
    else:
        u, v = jax.lax.fori_loop(
            0, iters, lambda _, uv: step(*uv),
            (jnp.zeros(k + 1), jnp.zeros(k + 1)))
    return c + u[:, None] + v[None, :] - norm
