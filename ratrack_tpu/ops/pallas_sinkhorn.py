"""Fused Sinkhorn potential solver: all iterations inside ONE kernel.

MEASURED NEGATIVE — kept as the record, default OFF
(`tracker/sinkhorn.USE_FUSED_KERNEL`). Hypothesis was that the XLA
lowering of the 500-iteration loop (2 tiny (B, K+1) reduce fusions +
staging copies per iteration, ~26 µs/frame of the 0.287 ms/frame eval
step) carried per-iteration launch overhead a single kernel would
eliminate. Real-chip A/B (bench.py, 512-pt 8-stream eval scan): fused
3179 fps / 0.287 ms-frame device vs XLA loop 3244 / 0.285 — a wash.
Inside the one compiled scan program the per-iteration fusions have no
launch cost to save; both forms are bound by the same 2×(B,K+1,K+1)
exp per iteration on the VPU.

The reference runs 500 fixed log-Sinkhorn iterations per frame
(`src/models/utils/track4d_utils.py:405-434`). This kernel keeps the
(B, K+1, K+1) cost matrix in VMEM and runs the whole iteration loop on
the VPU. The math is the bounded single-pass LSE
(`tracker/sinkhorn._lse_bounded`) — identical expression, so results
differ from the XLA loop only by reduce-order ulps (the documented
cross-backend rounding class; the mutual-max matching consuming Z is
tested stable under it).

Gradient note: nothing differentiates through Z — the association loss
consumes the raw affinities, and Z only feeds argmax-based discrete
matching (tracker/association.py:155-165) — so the kernel is primal-only
by design (no custom VJP; differentiating it raises, which is the
correct loud failure for a caller that changes that contract).

Batching: `sinkhorn_uv` is a jax.custom_batching.custom_vmap — the eval
scan's per-stream vmap dispatches ONE kernel over the stacked (B, K+1,
K+1) block instead of B sequential grid programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(c_ref, mu_ref, nu_ref, u_ref, v_ref, *, iters: int):
    c = c_ref[...]                                 # (B, K1, K1)
    mu = mu_ref[...]                               # (B, K1)
    nu = nu_ref[...]

    def lse_rows(a):                               # (B, K1, K1) -> (B, K1)
        return jnp.log(jnp.maximum(jnp.sum(jnp.exp(a), axis=2),
                                   jnp.float32(1e-30)))

    def lse_cols(a):
        return jnp.log(jnp.maximum(jnp.sum(jnp.exp(a), axis=1),
                                   jnp.float32(1e-30)))

    def body(state):
        i, u, v = state
        u_new = mu - lse_rows(c + v[:, None, :])
        v_new = nu - lse_cols(c + u_new[:, :, None])
        return i + 1, u_new, v_new

    # while_loop, NOT fori_loop: Mosaic fully unrolls static-trip-count
    # fori loops and would stack 500 iterations of temporaries
    _, u, v = jax.lax.while_loop(
        lambda s: s[0] < iters, body,
        (jnp.int32(0), jnp.zeros_like(mu), jnp.zeros_like(nu)))
    u_ref[...] = u
    v_ref[...] = v


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def _uv_batched(c, log_mu, log_nu, iters: int, interpret: bool):
    b, k1 = log_mu.shape
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        in_specs=[full, full, full],
        out_specs=(full, full),
        out_shape=(jax.ShapeDtypeStruct((b, k1), jnp.float32),
                   jax.ShapeDtypeStruct((b, k1), jnp.float32)),
        interpret=interpret,
    )(c.astype(jnp.float32), log_mu.astype(jnp.float32),
      log_nu.astype(jnp.float32))


def make_sinkhorn_uv(iters: int, interpret: bool):
    """(c (K1,K1), log_mu (K1,), log_nu (K1,)) → (u, v) potentials.

    custom_vmap: a vmap over streams runs ONE batched kernel."""

    @jax.custom_batching.custom_vmap
    def uv(c, log_mu, log_nu):
        u, v = _uv_batched(c[None], log_mu[None], log_nu[None], iters,
                           interpret)
        return u[0], v[0]

    @uv.def_vmap
    def _uv_vmap(axis_size, in_batched, c, log_mu, log_nu):
        bc = lambda x, bt: (x if bt else jnp.broadcast_to(  # noqa: E731
            x[None], (axis_size,) + x.shape))
        u, v = _uv_batched(bc(c, in_batched[0]), bc(log_mu, in_batched[1]),
                           bc(log_nu, in_batched[2]), iters, interpret)
        return (u, v), (True, True)

    # primal-only: the train graph TRACES through this op (jax.grad
    # linearizes the whole graph before pruning) even though no loss
    # consumes Z's gradient — a bare pallas_call fails linearization.
    # The custom_vjp gives linearization a defined rule; the bwd raises
    # loudly if a caller ever routes a cotangent here.
    @jax.custom_vjp
    def uv_primal(c, log_mu, log_nu):
        return uv(c, log_mu, log_nu)

    def _fwd(c, log_mu, log_nu):
        return uv_primal(c, log_mu, log_nu), None

    def _bwd(_, cot):
        raise NotImplementedError(
            "pallas_sinkhorn is primal-only: nothing in the model "
            "differentiates through the OT coupling (the association "
            "loss consumes raw affinities); use the XLA loop "
            "(USE_FUSED_KERNEL=False) if that contract changes")

    uv_primal.defvjp(_fwd, _bwd)
    return uv_primal


@functools.lru_cache(maxsize=None)
def _cached_uv(iters: int, interpret: bool):
    return make_sinkhorn_uv(iters, interpret)


def sinkhorn_uv(c, log_mu, log_nu, iters: int,
                interpret: bool | None = None):
    """Fused-loop Sinkhorn potentials for one (K+1, K+1) problem."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _cached_uv(iters, interpret)(c, log_mu, log_nu)
