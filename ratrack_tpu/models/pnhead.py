"""PointNet++-MSG backbone head (set abstraction + feature propagation).

TPU re-design of the reference PNHead (`src/utils/model_utils/model_utils.py:393-424`)
and PointnetSAModuleMSG / PointnetFPModule (`src/lib/pointnet2_modules.py:19-158`).

Differences from the reference by design:
  * points-major (N, C) layout; all MLPs are channel Dense ops → MXU matmuls;
  * fixed padded size with masks instead of variable N;
  * when `npoint == N` (the live config: npoint=512 == pad budget), FPS is
    replaced by `identity_sample` — FPS at npoint >= N selects every valid
    point anyway, and every downstream consumer is order-invariant over the
    center set (see ops/sampling.py). `exact_fps=True` restores true FPS.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops import (furthest_point_sample, identity_sample,
                   identity_gather, gather,
                   query_and_group, three_nn, three_interpolate,
                   three_interpolate_weights)
from ..ops import pallas_sa
from ..ops.pallas_sa import TILE_M, fold_bn_params, fused_sa_scale
from ..ops.pallas_sa_train import fused_sa_scale_train, fused_sa_pair_train
from ..ops.pallas_fp import fused_three_interpolate
from .layers import PointwiseMLP


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping set abstraction.

    Reference: PointnetSAModuleMSG (pointnet2_modules.py:19-94): FPS centers,
    per-scale ball query + group → SharedMLP → max-pool over samples, concat
    scales over channels.

    Eval path (`train=False`, `fused_eval`): each scale runs as ONE fused
    Pallas kernel (ops/pallas_sa.py) — selection mask, exact one-hot slot
    gather, BN-folded MLP and max-pool never leave VMEM, replacing the
    sort + gather + small-fusion chain that dominates the profiled step.
    Train keeps the unfused path: its BN batch statistics include the
    CUDA first-hit duplicate padding slots, which the fused formulation
    deliberately never materializes.
    """
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]   # per-scale output channels (input inferred)
    exact_fps: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_eval: bool = True
    fused_train: bool = True

    @nn.compact
    def __call__(self, xyz, features, mask=None, train: bool = True):
        """xyz (N,3), features (N,C) or None, mask (N,) → new_xyz (npoint,3),
        new_feats (npoint, sum(mlp[-1]))."""
        n = xyz.shape[0]
        if self.npoint == n and not self.exact_fps and not train:
            # identity indices: the gather is a row select (bit-identical
            # to gather(xyz, identity_sample(...)), ~10x cheaper on TPU).
            # Eval-only: under grad the single seed-row take lowers to a
            # pathological ~0.15 ms fusion per call (57% of the profiled
            # train step); the full row gather fuses fine in train.
            new_xyz = identity_gather(xyz, mask)
        elif self.npoint == n and not self.exact_fps:
            idx = identity_sample(n, self.npoint, mask)
            new_xyz = gather(xyz, idx)
        else:
            idx = furthest_point_sample(xyz, self.npoint, mask)
            new_xyz = gather(xyz, idx)

        c_in = 3 + (features.shape[-1] if features is not None else 0)
        fused = (not train and self.fused_eval and pallas_sa.fused_available()
                 and n % 128 == 0 and self.npoint % TILE_M == 0)
        if fused and len(self.radii) == 2:
            # both scales of the level in ONE kernel (shared distances,
            # one dispatch) — bit-identical to two single-scale calls
            folded = []
            for s, mlp in enumerate(self.mlps):
                module = PointwiseMLP(mlp, bn=True, dtype=self.dtype,
                                      name=f"mlp_{s}")
                _ = module(jnp.zeros((1, 1, c_in), self.dtype), train=False)
                folded.append(fold_bn_params(module.variables))
            out_a, out_b = pallas_sa.fused_sa_pair(
                xyz, new_xyz, features, mask,
                tuple(folded[0][0]), tuple(folded[0][1]),
                tuple(folded[1][0]), tuple(folded[1][1]),
                radius_a=self.radii[0], radius_b=self.radii[1],
                nsample_a=self.nsamples[0], nsample_b=self.nsamples[1],
                compute_dtype=self.dtype)
            return new_xyz, jnp.concatenate(
                [out_a.astype(self.dtype), out_b.astype(self.dtype)],
                axis=-1)
        # TRAIN path: one fused custom-VJP kernel per scale
        # (ops/pallas_sa_train.py) replacing ball_query + one-hot
        # gathers + Dense/train-BN stack + max-pool; BN running stats
        # are registered via the module's override_stats dummy apply so
        # the param/stat tree stays bit-compatible with the unfused path
        fused_t = (train and self.fused_train
                   and pallas_sa.fused_available()
                   and n % 128 == 0 and self.npoint % 128 == 0
                   and n <= 1024 and self.npoint <= 1024)
        if fused_t:
            modules, wss, scss, bsss = [], [], [], []
            for s, mlp in enumerate(self.mlps):
                module = PointwiseMLP(mlp, bn=True, dtype=self.dtype,
                                      name=f"mlp_{s}")
                _ = module(jnp.zeros((1, 1, c_in), self.dtype),
                           train=False)
                p = module.variables["params"]
                modules.append(module)
                wss.append([p[f"dense_{i}"]["kernel"]
                            for i in range(len(mlp))])
                scss.append([p[f"bn_{i}"]["scale"]
                             for i in range(len(mlp))])
                bsss.append([p[f"bn_{i}"]["bias"]
                             for i in range(len(mlp))])
            # both scales of the level in ONE custom-VJP kernel (shared
            # selection + dispatch) whenever the pair is structurally
            # mergeable — same MLP depth, same layer-0 width (always
            # true here: same input channels); else per-scale kernels
            pair = (len(self.radii) == 2
                    and len(self.mlps[0]) == len(self.mlps[1]))
            if pair:
                (pa, mus_a, vrs_a), (pb, mus_b, vrs_b) = \
                    fused_sa_pair_train(
                        xyz, new_xyz, features, mask,
                        wss[0], scss[0], bsss[0],
                        wss[1], scss[1], bsss[1],
                        radius_a=self.radii[0],
                        nsample_a=self.nsamples[0],
                        radius_b=self.radii[1],
                        nsample_b=self.nsamples[1])
                results = [(pa, mus_a, vrs_a), (pb, mus_b, vrs_b)]
            else:
                results = [fused_sa_scale_train(
                    xyz, new_xyz, features, mask, wss[s], scss[s],
                    bsss[s], radius=r, nsample=ns_s)
                    for s, (r, ns_s) in enumerate(
                        zip(self.radii, self.nsamples))]
            outs = []
            for s, (pooled, mus, vrs) in enumerate(results):
                modules[s](jnp.zeros((1, 1, c_in), self.dtype),
                           train=True,
                           override_stats=(mus, vrs,
                                           float(self.npoint
                                                 * self.nsamples[s])))
                outs.append(pooled.astype(self.dtype))
            return new_xyz, jnp.concatenate(outs, axis=-1)

        outs = []
        for s, (r, ns, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            module = PointwiseMLP(mlp, bn=True, dtype=self.dtype,
                                  name=f"mlp_{s}")
            if fused:
                # materialize the (identical) param tree, then read it for
                # BN folding; XLA dead-code-eliminates the dummy apply
                _ = module(jnp.zeros((1, 1, c_in), self.dtype), train=False)
                ws, bs = fold_bn_params(module.variables)
                # default MXU precision in all dtypes: the unfused path's
                # f32 Dense dots also run at default (bf16-pass) precision,
                # so this matches its numerics class at bf16 speed
                outs.append(fused_sa_scale(
                    xyz, new_xyz, features, mask, tuple(ws), tuple(bs),
                    radius=r, nsample=ns, compute_dtype=self.dtype,
                    ).astype(self.dtype))
                continue
            g = query_and_group(r, ns, xyz, new_xyz, features, mask)
            # (npoint, nsample, 3+C) -> MLP -> max over samples.
            # BN statistics run over (npoint, nsample); centers are all real
            # points (possibly duplicated), matching the reference which also
            # keeps npoint centers regardless of the raw point count.
            g = module(g, mask=None, train=train)
            outs.append(jnp.max(g, axis=1))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN feature propagation.

    Reference: PointnetFPModule (pointnet2_modules.py:118-158).
    Eval path (`fused_eval`): the three_nn sort + gather chain runs as one
    fused min-extraction Pallas kernel (ops/pallas_fp.py).
    """
    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    fused_eval: bool = True

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 unknown_mask=None, train: bool = True):
        fused = (not train and self.fused_eval
                 and pallas_sa.fused_available()
                 and unknown_xyz.shape[0] % TILE_M == 0)
        if fused:
            interp = fused_three_interpolate(
                unknown_xyz, known_xyz, known_feats,
                compute_dtype=self.dtype).astype(self.dtype)
        else:
            dist, idx = three_nn(unknown_xyz, known_xyz)
            w = three_interpolate_weights(dist)
            interp = three_interpolate(known_feats, idx, w)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return PointwiseMLP(self.mlp, bn=True, dtype=self.dtype,
                            name="mlp")(interp, mask=unknown_mask, train=train)


class PNHead(nn.Module):
    """3-level SA-MSG encoder + 3-level FP decoder → 128-d per-point features.

    Reference PNHead (model_utils.py:393-424). Channel flow:
      sa1: scales [(in→16,16,32), (in→16,16,32)] → 64 → linear1 → 32
      sa2: [(35→32,32), (35→32,64)] → 96 → linear2 → 64
      sa3: [(67→64,64), (67→64,64)] → 128 → linear3 → 64
      fp3 [128,128] → fp2 [160→128] → fp1 [128→128]
    (the "in" of each SA scale is 3 + feature channels of its level).
    """
    npoint: int
    exact_fps: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_eval: bool = True
    fused_train: bool = True

    @nn.compact
    def __call__(self, xyz, features, mask=None, train: bool = True):
        sa1 = SetAbstractionMSG(self.npoint, [2., 4.], [4, 8],
                                [[16, 16, 32], [16, 16, 32]],
                                self.exact_fps, self.dtype,
                                self.fused_eval, self.fused_train,
                                name="sa1")
        sa2 = SetAbstractionMSG(self.npoint, [4., 8.], [8, 16],
                                [[32, 32], [32, 64]],
                                self.exact_fps, self.dtype,
                                self.fused_eval, self.fused_train,
                                name="sa2")
        sa3 = SetAbstractionMSG(self.npoint, [8., 16.], [16, 32],
                                [[64, 64], [64, 64]],
                                self.exact_fps, self.dtype,
                                self.fused_eval, self.fused_train,
                                name="sa3")

        l1_xyz, l1 = sa1(xyz, features, mask, train)
        l1 = nn.Dense(32, dtype=self.dtype, name="linear1")(l1)
        l2_xyz, l2 = sa2(l1_xyz, l1, None, train)
        l2 = nn.Dense(64, dtype=self.dtype, name="linear2")(l2)
        l3_xyz, l3 = sa3(l2_xyz, l2, None, train)
        l3 = nn.Dense(64, dtype=self.dtype, name="linear3")(l3)

        # reference FP mlps are single layers: [128,128] / [160,128] /
        # [128,128] in torch spec = one Conv(in→128) each.
        l2 = FeaturePropagation([128], self.dtype, self.fused_eval,
                                name="fp3")(l2_xyz, l3_xyz, l2, l3, None,
                                            train)
        l1 = FeaturePropagation([128], self.dtype, self.fused_eval,
                                name="fp2")(l1_xyz, l2_xyz, l1, l2, None,
                                            train)
        l0 = FeaturePropagation([128], self.dtype, self.fused_eval,
                                name="fp1")(xyz, l1_xyz, None, l1, mask,
                                            train)
        return l3_xyz, l0
