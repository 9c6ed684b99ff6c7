"""Cross-framework parity: pin reference PyTorch semantics with real torch.

The reference is a torch 2.x codebase; these tests validate that the JAX
re-implementations reproduce torch's exact math (not just a NumPy port of
it): nn.GRU gate equations, BatchNorm2d statistics/momentum, sklearn's
DBSCAN labels, and torch.topk neighbor selection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")


class TestGRUParity:
    """models.layers.StackedGRU vs torch.nn.GRU(128, 128, num_layers=L)
    driven one timestep at a time (reference model_utils.py:279,294-297)."""

    @pytest.mark.parametrize("layers", [1, 5])
    def test_matches_torch_gru(self, rng, layers):
        from ratrack_tpu.models.layers import StackedGRU

        hidden = 32
        tg = torch.nn.GRU(hidden, hidden, num_layers=layers)
        sg = StackedGRU(hidden, layers)
        x0 = jnp.asarray(rng.randn(1, hidden).astype(np.float32))
        h0 = jnp.asarray(rng.randn(layers, 1, hidden).astype(np.float32))
        variables = sg.init(jax.random.PRNGKey(0), x0, h0)

        # copy torch weights into the flax params (torch packs r|z|n rows)
        params = {}
        for l in range(layers):
            w_ih = tg.state_dict()[f"weight_ih_l{l}"].numpy()   # (3H, in)
            w_hh = tg.state_dict()[f"weight_hh_l{l}"].numpy()
            b_ih = tg.state_dict()[f"bias_ih_l{l}"].numpy()
            b_hh = tg.state_dict()[f"bias_hh_l{l}"].numpy()
            params[f"cell_{l}"] = {
                "ih": {"kernel": jnp.asarray(w_ih.T),
                       "bias": jnp.asarray(b_ih)},
                "hh": {"kernel": jnp.asarray(w_hh.T),
                       "bias": jnp.asarray(b_hh)},
            }
        variables = {"params": params}

        x = rng.randn(1, hidden).astype(np.float32)
        h = rng.randn(layers, 1, hidden).astype(np.float32)
        # torch: input (seq=1, batch=1, H)
        with torch.no_grad():
            t_out, t_h = tg(torch.from_numpy(x[None]),
                            torch.from_numpy(h))
        j_out, j_h = sg.apply(variables, jnp.asarray(x), jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.numpy()[0], atol=2e-6)
        np.testing.assert_allclose(np.asarray(j_h),
                                   t_h.numpy(), atol=2e-6)


class TestBatchNormParity:
    """models.layers.MaskedBatchNorm (mask=None) vs torch BatchNorm2d:
    normalization, running-stat momentum, and eval mode."""

    def test_train_and_eval_match_torch(self, rng):
        from ratrack_tpu.models.layers import MaskedBatchNorm

        c, n, s = 8, 64, 4
        x1 = rng.randn(n, s, c).astype(np.float32) * 2 + 0.5
        x2 = rng.randn(n, s, c).astype(np.float32)

        tb = torch.nn.BatchNorm2d(c)           # momentum 0.1, eps 1e-5
        mb = MaskedBatchNorm()
        variables = mb.init(jax.random.PRNGKey(0), jnp.asarray(x1))

        def torch_apply(x, train):
            tb.train(train)
            # (N, S, C) → (1, C, N, S)
            t = torch.from_numpy(x).permute(2, 0, 1)[None]
            with torch.no_grad():
                return tb(t)[0].permute(1, 2, 0).numpy()

        stats = variables.get("batch_stats", {})
        for x in (x1, x2):
            want = torch_apply(x, True)
            got, mut = mb.apply(
                {"params": variables["params"], "batch_stats": stats},
                jnp.asarray(x), mutable=["batch_stats"])
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
            stats = mut["batch_stats"]

        np.testing.assert_allclose(np.asarray(stats["mean"]),
                                   tb.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(stats["var"]),
                                   tb.running_var.numpy(), atol=1e-4)

        want = torch_apply(x1, False)          # eval: running stats
        got = mb.apply({"params": variables["params"],
                        "batch_stats": stats}, jnp.asarray(x1),
                       use_running_average=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestSklearnDBSCANParity:
    """tracker.dbscan vs sklearn.cluster.DBSCAN — the exact library the
    reference calls on host (track4d.py:36,111)."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_labels_match_sklearn(self, seed):
        sklearn_cluster = pytest.importorskip("sklearn.cluster")
        from ratrack_tpu.tracker import dbscan

        rng = np.random.RandomState(seed)
        # blobs + scattered noise, same scale as the clustering features
        centers = rng.uniform(-10, 10, (4, 5))
        pts = np.concatenate(
            [c + rng.randn(rng.randint(3, 9), 5) * 0.3 for c in centers]
            + [rng.uniform(-20, 20, (10, 5))]).astype(np.float32)
        n = pts.shape[0]
        want = sklearn_cluster.DBSCAN(eps=1.5, min_samples=2).fit(
            pts).labels_
        got = np.asarray(dbscan(jnp.asarray(pts), jnp.ones(n, bool),
                                1.5, 2, 64))
        # identical noise set and identical partition; label numbering is
        # first-occurrence order in both (sklearn visits points in order)
        np.testing.assert_array_equal(got == -1, want == -1)
        for lbl in np.unique(want[want >= 0]):
            members = got[want == lbl]
            assert len(set(members.tolist())) == 1, (lbl, members)
        np.testing.assert_array_equal(got, want)


class TestTopkParity:
    """ops knn neighbor selection vs torch.topk (reference knn_point,
    model_utils.py:85-99 uses torch.topk(largest=False))."""

    def test_knn_matches_torch_topk(self, rng):
        from ratrack_tpu.ops import knn, square_distance

        q = rng.randn(50, 3).astype(np.float32) * 5
        p = rng.randn(80, 3).astype(np.float32) * 5
        d = np.asarray(square_distance(jnp.asarray(q), jnp.asarray(p)))
        t_idx = torch.topk(torch.from_numpy(d), 8, dim=-1,
                           largest=False, sorted=True).indices.numpy()
        _, j_idx = knn(8, jnp.asarray(q), jnp.asarray(p))
        np.testing.assert_array_equal(np.asarray(j_idx), t_idx)
