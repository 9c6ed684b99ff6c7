"""MXU one-hot row gather: the hot op of the grouped point pipeline.

Profiling the full Track4D step on a v5e shows XLA's row gathers dominate
device time (~0.9 ms for a (8·512·32, 64) grouped-feature gather — TPU
gathers issue row-at-a-time DMA, ~40× off bandwidth). For point-cloud
grouping the source table is tiny ((N≤2k, C≤512) — fits VMEM), so a
gather is better spelled as a one-hot matmul: per output tile, build the
(TR, N) one-hot selection matrix in VMEM and let the MXU do
one_hot @ table. One-hot × value is exact in f32/bf16 (each output element
is 1.0·row + 0·rest), so results are bit-identical to jnp.take.

Backward is the transpose: dtable = one_hotᵀ @ dout, accumulated across
row tiles into a VMEM scratch and flushed on the last grid step (a pure
matmul scatter-add, again MXU work instead of row DMA).

`gather_rows` carries a custom VJP wired to both kernels; `take_rows` is
the public dispatcher that falls back to jnp.take off-TPU / for large
tables / when the index count is too small to pay off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(idx_ref, tbl_ref, out_ref, *, n: int):
    idx = idx_ref[:]                                    # (TR, 1) int32
    tr = idx.shape[0]
    onehot = (idx == jax.lax.broadcasted_iota(
        jnp.int32, (tr, n), 1)).astype(tbl_ref.dtype)
    # HIGHEST: the default MXU pass truncates operands to bf16, making
    # 1.0*x lossy; bf16x3 emulation keeps the one-hot product bit-exact
    out_ref[:] = jax.lax.dot_general(
        onehot, tbl_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(idx_ref, g_ref, dtbl_ref, acc_ref, *, n: int):
    step = pl.program_id(0)
    idx = idx_ref[:]                                    # (TR, 1)
    tr = idx.shape[0]
    onehot = (idx == jax.lax.broadcasted_iota(
        jnp.int32, (tr, n), 1)).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        onehot, g_ref[:].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),     # one_hotᵀ @ g
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += contrib

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        dtbl_ref[:] = acc_ref[:].astype(dtbl_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("tr", "interpret"))
def _gather_fwd(table, idx, tr=512, interpret=False):
    m = idx.shape[0]
    n, c = table.shape
    m_pad = _round_up(max(m, 8), tr)
    idx2 = jnp.zeros((m_pad, 1), jnp.int32).at[:m, 0].set(idx)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n=n),
        grid=(m_pad // tr,),
        in_specs=[
            pl.BlockSpec((tr, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), table.dtype),
        interpret=interpret,
    )(idx2, table)
    return out[:m]


@functools.partial(jax.jit, static_argnames=("n", "tr", "interpret"))
def _gather_bwd(idx, g, n, tr=512, interpret=False):
    m, c = g.shape
    m_pad = _round_up(max(m, 8), tr)
    idx2 = jnp.full((m_pad, 1), -1, jnp.int32).at[:m, 0].set(idx)
    gp = jnp.zeros((m_pad, c), g.dtype).at[:m].set(g)
    dtbl = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n),
        grid=(m_pad // tr,),
        in_specs=[
            pl.BlockSpec((tr, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), g.dtype),
        scratch_shapes=[pltpu.VMEM((n, c), jnp.float32)],
        interpret=interpret,
    )(idx2, gp)
    return dtbl


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """(N, C) × (M,) int32 → (M, C), bit-identical to jnp.take(table, idx, 0).

    Requires the table to fit VMEM (N·C ≲ 1M elements) and in-range idx.
    """
    return _gather_fwd(table, idx, interpret=interpret)


def _gather_rows_fwd(table, idx, interpret):
    return _gather_fwd(table, idx, interpret=interpret), (idx, table.shape[0])


def _gather_rows_bwd(interpret, res, g):
    idx, n = res
    return _gather_bwd(idx, g, n, interpret=interpret), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


# dispatcher bounds: table must fit VMEM alongside the one-hot tile
_MAX_TABLE_ELEMS = 1 << 20          # N*C
_MAX_TABLE_ROWS = 4096              # one-hot tile width
_MIN_GATHER_ROWS = 1024             # below this jnp.take wins on overhead


def take_rows(table: jnp.ndarray, idx: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """Gather rows: Pallas one-hot matmul when profitable, jnp.take else.

    idx may have any shape; gathers flatten to (M,) and reshape back,
    mirroring jnp.take(table, idx, axis=0).
    """
    n, = table.shape[:1]
    c = table.shape[1] if table.ndim == 2 else None
    m = int(idx.size)
    on_tpu = jax.default_backend() == "tpu"
    if (c is None or not (on_tpu or interpret) or n > _MAX_TABLE_ROWS
            or n * c > _MAX_TABLE_ELEMS or m < _MIN_GATHER_ROWS
            or idx.dtype not in (jnp.int32, jnp.int64)):
        return jnp.take(table, idx, axis=0)
    flat = gather_rows(table, idx.reshape(-1).astype(jnp.int32), interpret)
    return flat.reshape(idx.shape + (table.shape[1],))
