"""Pure-NumPy oracles reproducing the reference CUDA kernel semantics.

These are independent re-derivations of the algorithm described by the
reference kernels (cited per function), used only to validate the masked
JAX ops under padding.
"""

import numpy as np


def np_fps(xyz, npoint):
    """sampling_gpu.cu:94-251 — iterative FPS seeded at index 0."""
    n = xyz.shape[0]
    temp = np.full((n,), 1e10, dtype=np.float64)
    out = np.zeros((npoint,), dtype=np.int64)
    old = 0
    for j in range(1, npoint):
        d = np.sum((xyz - xyz[old]) ** 2, axis=-1)
        temp = np.minimum(temp, d)
        old = int(np.argmax(temp))
        out[j] = old
    return out


def np_ball_query(radius, nsample, xyz, centers):
    """ball_query_gpu.cu:9-46 — first-nsample hits, first-hit padding, 0 if none."""
    m = centers.shape[0]
    idx = np.zeros((m, nsample), dtype=np.int64)
    r2 = radius * radius
    for i in range(m):
        cnt = 0
        for k in range(xyz.shape[0]):
            d2 = np.sum((centers[i] - xyz[k]) ** 2)
            if d2 < r2:
                if cnt == 0:
                    idx[i, :] = k
                idx[i, cnt] = k
                cnt += 1
                if cnt >= nsample:
                    break
    return idx


def np_knn(k, query, points):
    """model_utils.py:85-99 — topk smallest squared distances."""
    d = np.sum((query[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def np_three_interpolate(features, idx, weight):
    """interpolate_gpu.cu:149-193."""
    return np.sum(features[idx] * weight[..., None], axis=1)


def np_dbscan(x, eps, min_samples):
    """Plain DBSCAN (sklearn semantics: min_samples counts the point itself).

    Labels assigned in order of first core point visited, noise = -1.
    """
    n = x.shape[0]
    d = np.sqrt(np.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1))
    nbrs = d <= eps
    core = nbrs.sum(axis=1) >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS over core connectivity
        stack = [i]
        labels[i] = cluster
        while stack:
            j = stack.pop()
            if not core[j]:
                continue
            for k in np.where(nbrs[j])[0]:
                if labels[k] == -1:
                    labels[k] = cluster
                    stack.append(k)
        cluster += 1
    return labels


def np_log_sinkhorn(scores, alpha, iters):
    """track4d_utils.py:405-434 — log optimal transport with dustbin."""
    m, n = scores.shape
    couplings = np.zeros((m + 1, n + 1))
    couplings[:m, :n] = scores
    couplings[:m, n] = alpha
    couplings[m, :n] = alpha
    couplings[m, n] = alpha
    norm = -np.log(m + n)
    log_mu = np.concatenate([np.full(m, norm), [np.log(n) + norm]])
    log_nu = np.concatenate([np.full(n, norm), [np.log(m) + norm]])
    u = np.zeros(m + 1)
    v = np.zeros(n + 1)

    def lse(a, axis):
        amax = a.max(axis=axis, keepdims=True)
        return np.squeeze(amax, axis) + np.log(
            np.sum(np.exp(a - amax), axis=axis))

    for _ in range(iters):
        u = log_mu - lse(couplings + v[None, :], axis=1)
        v = log_nu - lse(couplings + u[:, None], axis=0)
    return couplings + u[:, None] + v[None, :] - norm
