"""Reference-checkpoint converter: torch Track4D state_dict → flax variables.

The reference distributes pretrained weights as a torch state_dict
(`checkpoint/track4d_radar/models/model.last.t7`, README.md:150-154, saved
by src/main.py:83-98). Every weight-bearing reference module maps 1:1 onto
this framework (GRU gate order, BatchNorm statistics, conv1x1→Dense — all
pinned by tests/test_torch_parity.py), so a user can bring the published
checkpoint across.

Key-name sources in the reference:
  * Track4D root: pn_head / fc_layer / fd_layer / affinity / bin_score
    (src/models/track4d.py:25-42)
  * PNHead: sa{1..3}.mlps.{scale}.layer{i}.conv|bn.bn, linear{1..3},
    fp{1..3}.mlp.layer{i} (model_utils.py:393-406; SharedMLP/_ConvBase
    child naming, src/lib/pytorch_utils.py)
  * FeatureCorrelator: mlp_convs.{i}, weightnet{1,2}.mlp_convs.{i}
    (model_utils.py:166-190; bn=False in the live path)
  * FlowDecoder: mse (PNHead), fp/cp.sf_mlp.{i}.0|1 + conv2 (+ cp.linear),
    torchGRU.{weight,bias}_{ih,hh}_l{0..4} (model_utils.py:255-279)
  * Affinity: affinity.{0,2,4,6,8} Linear chain (track4d.py:226-240)

Dead reference modules (cls_mlp, mlp2, gru2, pnnGru, weightnet BN lists,
dbscan-free params) are ignored. Unconsumed keys are returned for
inspection so silent drops are visible.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

# (scales, per-scale layer count) per SA level; FP levels have one layer
_SA_LAYERS = {"sa1": 3, "sa2": 2, "sa3": 2}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


class _Reader:
    """Tracks which state_dict keys were consumed."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.used = set()

    def __call__(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def leftover(self):
        return sorted(set(self.sd) - self.used)


def _conv_w(w: np.ndarray) -> np.ndarray:
    """Conv2d 1x1 (O, I, 1, 1) → Dense kernel (I, O)."""
    return w[:, :, 0, 0].T


def _lin_w(w: np.ndarray) -> np.ndarray:
    """Linear (O, I) → Dense kernel (I, O)."""
    return w.T


def _shared_mlp(r: _Reader, prefix: str, n_layers: int):
    """SharedMLP (conv+BN per layer) → (params, batch_stats)."""
    params, stats = {}, {}
    for i in range(n_layers):
        params[f"dense_{i}"] = {
            "kernel": _conv_w(r(f"{prefix}.layer{i}.conv.weight"))}
        params[f"bn_{i}"] = {
            "scale": r(f"{prefix}.layer{i}.bn.bn.weight"),
            "bias": r(f"{prefix}.layer{i}.bn.bn.bias")}
        stats[f"bn_{i}"] = {
            "mean": r(f"{prefix}.layer{i}.bn.bn.running_mean"),
            "var": r(f"{prefix}.layer{i}.bn.bn.running_var")}
    return params, stats


def _plain_mlp(r: _Reader, prefix: str, n_layers: int, biased=True):
    """Conv stack without BN (FeatureCorrelator / WeightNet style)."""
    params = {}
    for i in range(n_layers):
        p = {"kernel": _conv_w(r(f"{prefix}.{i}.weight"))}
        if biased:
            p["bias"] = r(f"{prefix}.{i}.bias")
        params[f"dense_{i}"] = p
    return params


def _bn_mlp_seq(r: _Reader, prefix: str, n_layers: int):
    """FlowPredictor/ClsPredictor sf_mlp: Sequential(Conv,BN,ReLU) list."""
    params, stats = {}, {}
    for i in range(n_layers):
        params[f"dense_{i}"] = {
            "kernel": _conv_w(r(f"{prefix}.{i}.0.weight"))}
        params[f"bn_{i}"] = {"scale": r(f"{prefix}.{i}.1.weight"),
                             "bias": r(f"{prefix}.{i}.1.bias")}
        stats[f"bn_{i}"] = {"mean": r(f"{prefix}.{i}.1.running_mean"),
                            "var": r(f"{prefix}.{i}.1.running_var")}
    return params, stats


def _pnhead(r: _Reader, prefix: str):
    params, stats = {}, {}
    for sa, n_layers in _SA_LAYERS.items():
        sp, ss = {}, {}
        for scale in (0, 1):
            mp, ms = _shared_mlp(r, f"{prefix}.{sa}.mlps.{scale}", n_layers)
            sp[f"mlp_{scale}"] = mp
            ss[f"mlp_{scale}"] = ms
        params[sa] = sp
        stats[sa] = ss
    for i in (1, 2, 3):
        params[f"linear{i}"] = {
            "kernel": _lin_w(r(f"{prefix}.linear{i}.weight")),
            "bias": r(f"{prefix}.linear{i}.bias")}
    for fp in ("fp1", "fp2", "fp3"):
        mp, ms = _shared_mlp(r, f"{prefix}.{fp}.mlp", 1)
        params[fp] = {"mlp": mp}
        stats[fp] = {"mlp": ms}
    return params, stats


def _weightnet(r: _Reader, prefix: str):
    """WeightNet hidden (8, 8) + out: mlp_convs.{0,1,2} → dense_0/1/out."""
    p = _plain_mlp(r, f"{prefix}.mlp_convs", 3)
    return {"dense_0": p["dense_0"], "dense_1": p["dense_1"],
            "dense_out": p["dense_2"]}


def _gru(r: _Reader, prefix: str, layers: int = 5):
    params = {}
    for l in range(layers):
        params[f"cell_{l}"] = {
            "ih": {"kernel": _lin_w(r(f"{prefix}.weight_ih_l{l}")),
                   "bias": r(f"{prefix}.bias_ih_l{l}")},
            "hh": {"kernel": _lin_w(r(f"{prefix}.weight_hh_l{l}")),
                   "bias": r(f"{prefix}.bias_hh_l{l}")},
        }
    return params


def convert_reference_state_dict(
        state_dict: Dict[str, np.ndarray],
        n_cost_mlp: int = 3,
        n_sf_mlp: int = 3) -> Tuple[Dict, list]:
    """Reference torch Track4D state_dict → {"params", "batch_stats"}.

    Returns (variables, leftover_keys). Leftovers should only be the
    reference's dead modules (cls_mlp, mlp2, gru2, pnnGru, weightnet BN
    running stats, num_batches_tracked counters).
    """
    r = _Reader(state_dict)
    params: Dict = {}
    stats: Dict = {}

    params["pn_head"], stats["pn_head"] = _pnhead(r, "pn_head")

    params["fc_layer"] = {
        "mlp": _plain_mlp(r, "fc_layer.mlp_convs", n_cost_mlp),
        "weightnet1": _weightnet(r, "fc_layer.weightnet1"),
        "weightnet2": _weightnet(r, "fc_layer.weightnet2"),
    }

    fd_p: Dict = {}
    fd_s: Dict = {}
    fd_p["mse"], fd_s["mse"] = _pnhead(r, "fd_layer.mse")
    for name, tname in (("fp", "fp"), ("cp", "cp")):
        mp, ms = _bn_mlp_seq(r, f"fd_layer.{tname}.sf_mlp", n_sf_mlp)
        fd_p[name] = {"mlp": mp}
        fd_s[name] = {"mlp": ms}
    fd_p["fp"]["out"] = {
        "kernel": _conv_w(r("fd_layer.fp.conv2.weight"))}
    fd_p["cp"]["conv_out"] = {
        "kernel": _conv_w(r("fd_layer.cp.conv2.weight"))}
    fd_p["cp"]["linear"] = {
        "kernel": _lin_w(r("fd_layer.cp.linear.weight")),
        "bias": r("fd_layer.cp.linear.bias")}
    fd_p["gru"] = _gru(r, "fd_layer.torchGRU")
    params["fd_layer"] = fd_p
    stats["fd_layer"] = fd_s

    aff = {}
    for i, t_idx in enumerate((0, 2, 4, 6)):
        aff[f"dense_{i}"] = {
            "kernel": _lin_w(r(f"affinity.affinity.{t_idx}.weight")),
            "bias": r(f"affinity.affinity.{t_idx}.bias")}
    aff["dense_out"] = {
        "kernel": _lin_w(r("affinity.affinity.8.weight")),
        "bias": r("affinity.affinity.8.bias")}
    params["affinity"] = aff

    if "bin_score" in r.sd:
        params["bin_score"] = r("bin_score").reshape(())

    import jax.numpy as jnp
    to_jnp = lambda tree: {
        k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v)
        for k, v in tree.items()}
    return ({"params": to_jnp(params), "batch_stats": to_jnp(stats)},
            r.leftover())


def _inv_conv_w(k: np.ndarray) -> np.ndarray:
    """Dense kernel (I, O) → Conv2d 1x1 weight (O, I, 1, 1)."""
    return np.asarray(k).T[:, :, None, None]


def _export_shared_mlp(out, prefix, params, stats):
    n = len([k for k in params if k.startswith("dense_")])
    for i in range(n):
        out[f"{prefix}.layer{i}.conv.weight"] = _inv_conv_w(
            params[f"dense_{i}"]["kernel"])
        out[f"{prefix}.layer{i}.bn.bn.weight"] = np.asarray(
            params[f"bn_{i}"]["scale"])
        out[f"{prefix}.layer{i}.bn.bn.bias"] = np.asarray(
            params[f"bn_{i}"]["bias"])
        out[f"{prefix}.layer{i}.bn.bn.running_mean"] = np.asarray(
            stats[f"bn_{i}"]["mean"])
        out[f"{prefix}.layer{i}.bn.bn.running_var"] = np.asarray(
            stats[f"bn_{i}"]["var"])
        out[f"{prefix}.layer{i}.bn.bn.num_batches_tracked"] = np.asarray(
            0, dtype=np.int64)


def _export_pnhead(out, prefix, params, stats):
    for sa, n_layers in _SA_LAYERS.items():
        for scale in (0, 1):
            _export_shared_mlp(out, f"{prefix}.{sa}.mlps.{scale}",
                               params[sa][f"mlp_{scale}"],
                               stats[sa][f"mlp_{scale}"])
    for i in (1, 2, 3):
        out[f"{prefix}.linear{i}.weight"] = np.asarray(
            params[f"linear{i}"]["kernel"]).T
        out[f"{prefix}.linear{i}.bias"] = np.asarray(
            params[f"linear{i}"]["bias"])
    for fp in ("fp1", "fp2", "fp3"):
        _export_shared_mlp(out, f"{prefix}.{fp}.mlp",
                           params[fp]["mlp"], stats[fp]["mlp"])


def _export_plain_mlp(out, prefix, params, order):
    for i, name in enumerate(order):
        out[f"{prefix}.{i}.weight"] = _inv_conv_w(params[name]["kernel"])
        if "bias" in params[name]:
            out[f"{prefix}.{i}.bias"] = np.asarray(params[name]["bias"])


def export_reference_state_dict(variables) -> Dict[str, np.ndarray]:
    """flax Track4D variables → reference torch state_dict (numpy values).

    Exact inverse of convert_reference_state_dict: TPU-trained weights
    load into the reference harness's torch model
    (`/root/reference/src/models/model.py:28-37` restores a state_dict
    onto its Track4D) with `strict=False` — the reference's dead modules
    (cls_mlp, mlp2, gru2, pnnGru) have no counterpart here and keep
    their torch init. BatchNorm `num_batches_tracked` counters are
    emitted as 0 (torch only consults them for the momentum=None mode,
    which the reference never uses). Values are numpy; wrap with
    `torch.from_numpy` via save_reference_checkpoint for a .t7 file.
    """
    params = jax.tree_util.tree_map(
        np.asarray, _unfreeze(variables["params"]))
    stats = jax.tree_util.tree_map(
        np.asarray, _unfreeze(variables.get("batch_stats", {})))
    out: Dict[str, np.ndarray] = {}

    _export_pnhead(out, "pn_head", params["pn_head"], stats["pn_head"])

    fc = params["fc_layer"]
    _export_plain_mlp(out, "fc_layer.mlp_convs", fc["mlp"],
                      [f"dense_{i}" for i in range(len(fc["mlp"]))])
    for wn in ("weightnet1", "weightnet2"):
        _export_plain_mlp(out, f"fc_layer.{wn}.mlp_convs", fc[wn],
                          ["dense_0", "dense_1", "dense_out"])

    fd_p, fd_s = params["fd_layer"], stats["fd_layer"]
    _export_pnhead(out, "fd_layer.mse", fd_p["mse"], fd_s["mse"])
    for name in ("fp", "cp"):
        mp, ms = fd_p[name]["mlp"], fd_s[name]["mlp"]
        n = len([k for k in mp if k.startswith("dense_")])
        for i in range(n):
            out[f"fd_layer.{name}.sf_mlp.{i}.0.weight"] = _inv_conv_w(
                mp[f"dense_{i}"]["kernel"])
            out[f"fd_layer.{name}.sf_mlp.{i}.1.weight"] = np.asarray(
                mp[f"bn_{i}"]["scale"])
            out[f"fd_layer.{name}.sf_mlp.{i}.1.bias"] = np.asarray(
                mp[f"bn_{i}"]["bias"])
            out[f"fd_layer.{name}.sf_mlp.{i}.1.running_mean"] = (
                np.asarray(ms[f"bn_{i}"]["mean"]))
            out[f"fd_layer.{name}.sf_mlp.{i}.1.running_var"] = (
                np.asarray(ms[f"bn_{i}"]["var"]))
            out[f"fd_layer.{name}.sf_mlp.{i}.1.num_batches_tracked"] = (
                np.asarray(0, dtype=np.int64))
    out["fd_layer.fp.conv2.weight"] = _inv_conv_w(
        fd_p["fp"]["out"]["kernel"])
    out["fd_layer.cp.conv2.weight"] = _inv_conv_w(
        fd_p["cp"]["conv_out"]["kernel"])
    out["fd_layer.cp.linear.weight"] = np.asarray(
        fd_p["cp"]["linear"]["kernel"]).T
    out["fd_layer.cp.linear.bias"] = np.asarray(
        fd_p["cp"]["linear"]["bias"])
    for l in range(5):
        cell = fd_p["gru"][f"cell_{l}"]
        out[f"fd_layer.torchGRU.weight_ih_l{l}"] = np.asarray(
            cell["ih"]["kernel"]).T
        out[f"fd_layer.torchGRU.bias_ih_l{l}"] = np.asarray(
            cell["ih"]["bias"])
        out[f"fd_layer.torchGRU.weight_hh_l{l}"] = np.asarray(
            cell["hh"]["kernel"]).T
        out[f"fd_layer.torchGRU.bias_hh_l{l}"] = np.asarray(
            cell["hh"]["bias"])

    aff = params["affinity"]
    for i, t_idx in enumerate((0, 2, 4, 6)):
        out[f"affinity.affinity.{t_idx}.weight"] = np.asarray(
            aff[f"dense_{i}"]["kernel"]).T
        out[f"affinity.affinity.{t_idx}.bias"] = np.asarray(
            aff[f"dense_{i}"]["bias"])
    out["affinity.affinity.8.weight"] = np.asarray(
        aff["dense_out"]["kernel"]).T
    out["affinity.affinity.8.bias"] = np.asarray(
        aff["dense_out"]["bias"])

    if "bin_score" in params:
        out["bin_score"] = np.asarray(params["bin_score"]).reshape(())
    return out


def _unfreeze(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    return {k: _unfreeze(v) if isinstance(v, dict) or hasattr(v, "items")
            else v for k, v in dict(tree).items()}


def save_reference_checkpoint(variables, path: str) -> None:
    """Export TPU-trained variables as a torch-loadable .t7 state_dict.

    The file round-trips through the reference's restore
    (`torch.load` + `load_state_dict(strict=False)` — the dead modules
    keep their init, exactly as when the reference loads its own
    published checkpoint into a freshly built model)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_reference_state_dict(variables).items()}
    torch.save(sd, path)


def load_reference_checkpoint(path: str):
    """Load a reference .t7/.pt checkpoint file and convert it."""
    import torch
    # weights_only=False: torch >= 2.6 defaults to True, which refuses
    # whole-module pickles before the state_dict fallback could run; the
    # reference checkpoint is explicitly trusted input here
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_reference_state_dict(sd)
