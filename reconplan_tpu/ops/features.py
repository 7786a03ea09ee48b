"""FPFH features and RANSAC global registration.

The reference computed FPFH features in ``preprocess_point_cloud``
(``stitcher.py:67-69``) but never consumed them (its registration used
colored-ICP + point-to-point only). Here FPFH is a usable capability:
feature matching + RANSAC provides the global (initialization-free)
registration the reference lacked, vectorized on device — hypothesis
transforms evaluate in parallel under vmap instead of a serial C++ loop.

FPFH (Rusu et al., ICRA 2009): per point, histogram the Darboux-frame
angles (alpha, phi, theta) over its k-NN (11 bins each -> 33-D SPFH), then
re-weight by neighbor SPFHs: FPFH(p) = SPFH(p) + mean_i SPFH(i) / d_i.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from reconplan_tpu.ops.nn import knn
from reconplan_tpu.ops.pointcloud import PointCloud

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("k",))
def fpfh(cloud: PointCloud, k: int = 32):
    """(N, 33) FPFH features (cloud must carry normals)."""
    pts = cloud.points
    nrm = cloud.normals
    d, idx = knn(pts, pts, k + 1, valid=cloud.valid)
    d, idx = d[:, 1:], idx[:, 1:]  # drop self

    p = pts[:, None, :]  # (N, 1, 3)
    q = pts[idx]  # (N, k, 3)
    n_p = nrm[:, None, :]
    n_q = nrm[idx]

    diff = q - p
    dist = jnp.maximum(jnp.linalg.norm(diff, axis=-1), 1e-9)
    du = diff / dist[..., None]

    # Darboux frame at p: u = n_p, v = du x u, w = u x v
    u = jnp.broadcast_to(n_p, n_q.shape)
    v = jnp.cross(du, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)

    alpha = jnp.sum(v * n_q, axis=-1)  # [-1, 1]
    phi = jnp.sum(u * du, axis=-1)  # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n_q, axis=-1), jnp.sum(u * n_q, axis=-1))

    def hist11(x, lo, hi):
        bins = jnp.clip(((x - lo) / (hi - lo) * 11).astype(jnp.int32), 0, 10)
        return jax.nn.one_hot(bins, 11, dtype=jnp.float32).sum(axis=1)

    spfh = jnp.concatenate(
        [
            hist11(alpha, -1.0, 1.0),
            hist11(phi, -1.0, 1.0),
            hist11(theta, -jnp.pi, jnp.pi),
        ],
        axis=-1,
    )  # (N, 33)
    spfh = spfh / jnp.maximum(jnp.sum(spfh, axis=-1, keepdims=True), 1e-9)

    # neighborhood re-weighting
    w_nbr = 1.0 / jnp.maximum(dist, 1e-6)  # (N, k)
    nbr_spfh = spfh[idx]  # (N, k, 33)
    agg = jnp.sum(nbr_spfh * w_nbr[..., None], axis=1) / jnp.maximum(
        jnp.sum(w_nbr, axis=1, keepdims=True), 1e-9
    )
    feat = spfh + agg
    return feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-9)


@partial(jax.jit, static_argnames=("n_hypotheses",))
def _ransac_core(src_pts, dst_pts, corr_idx, corr_valid, key,
                 inlier_threshold, n_hypotheses,
                 src_cols=None, dst_cols=None, color_threshold=0.25):
    from reconplan_tpu.ops.icp import register_kabsch

    # color-gate the correspondences when both clouds carry colors: on
    # repetitive/featureless geometry (a tabletop plane) FPFH matches are
    # arbitrary, but color agreement keeps only tile-to-same-tile pairs
    if src_cols is not None and dst_cols is not None:
        cdist = jnp.linalg.norm(src_cols - dst_cols[corr_idx], axis=-1)
        corr_valid = corr_valid & (cdist < color_threshold)
    # sample 3 correspondence indices per hypothesis, biased to VALID
    # correspondences (uniform over all slots wasted ~90% of hypotheses
    # on padded/non-mutual rows when the valid fraction was low)
    keys = jax.random.split(key, n_hypotheses)
    logits = jnp.where(corr_valid, 0.0, -1e9)
    any_valid = jnp.any(corr_valid)

    def hypothesis(k):
        sel = jax.random.categorical(k, logits, shape=(3,))
        T = register_kabsch(
            src_pts[sel], dst_pts[corr_idx[sel]],
            corr_valid[sel].astype(jnp.float32) + 1e-3,
        )
        moved = jnp.matmul(src_pts, T[:3, :3].T, precision=_HI) + T[:3, 3]
        err = jnp.linalg.norm(moved - dst_pts[corr_idx], axis=-1)
        inliers = jnp.sum((err < inlier_threshold) & corr_valid)
        return T, inliers

    Ts, scores = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    # no valid correspondences at all -> identity with score 0, never a
    # categorical over all -1e9 logits silently picking slot 0
    return (
        jnp.where(any_valid, Ts[best], jnp.eye(4, dtype=Ts.dtype)),
        jnp.where(any_valid, scores[best], 0),
    )


def ransac_global_registration(
    source: PointCloud,
    target: PointCloud,
    source_features,
    target_features,
    inlier_threshold=0.05,
    n_hypotheses=512,
    mutual=True,
    seed=0,
):
    """Feature-matched RANSAC alignment source -> target.

    Returns (T (4,4), inlier_count). Matches are nearest neighbors in
    feature space (optionally mutual); hypotheses are evaluated in one vmap.
    """
    import numpy as np

    from reconplan_tpu.ops.nn import nearest_neighbor

    _, fwd = nearest_neighbor(source_features, target_features,
                              valid=jnp.asarray(target.valid))
    corr_valid = jnp.asarray(source.valid)
    if mutual:
        _, bwd = nearest_neighbor(target_features, source_features,
                                  valid=jnp.asarray(source.valid))
        mutual_ok = jnp.arange(source.points.shape[0]) == bwd[fwd]
        corr_valid = corr_valid & mutual_ok
    T, score = _ransac_core(
        source.points, target.points, fwd, corr_valid,
        jax.random.PRNGKey(seed), inlier_threshold, n_hypotheses,
    )
    return np.asarray(T), int(score)
