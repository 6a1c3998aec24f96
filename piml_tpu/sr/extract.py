"""Symbolic-regression data preparation: edge messages + polar features.

Reference: src/models/simulators.py:840-923 and the filters in
src/symbolic_regression.py:55-115.  Produces (features, labels) arrays where

- features = ``(r, θ_r, v, θ_v, θ_r², coll_pred)`` per neighbor edge —
  heading-aligned polar relative position/velocity plus the global-frame
  angle and the 1-second collision forecast;
- labels = per-edge message: for bottleneck models the polar magnitude /
  direction of the predicted 2-D force; otherwise the two highest-variance
  message dimensions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piml_tpu.data.views import PointwiseData
from piml_tpu.physics import collision_label, heading_direction, polar as polar_mod


def prepare_symbolic_regression_data(
    params, apply_fn, data: PointwiseData
) -> Tuple[np.ndarray, np.ndarray]:
    """(features (R·k, 6), labels (R·k, 2)) — reference simulators.py:840-896."""
    polar_base = heading_direction(data.self_features[..., -5:-3], time_axis=False)
    k = data.ped_features.shape[-2]
    base_k = jnp.broadcast_to(
        polar_base[..., None, :], data.ped_features.shape[:-1] + (2,)
    ).reshape(-1, 2)

    feats = data.ped_features.reshape(-1, data.ped_features.shape[-1])
    coll = collision_label(feats).reshape(-1, 1)

    x_axis = jnp.zeros_like(base_k).at[:, 0].set(1.0)
    r_thetar = polar_mod.cart_to_polar(feats[:, :2], base_k)
    v_thetav = polar_mod.cart_to_polar(feats[:, 2:4], base_k)
    v_thetav = jnp.where(v_thetav > 4.5, 0.0, v_thetav)
    theta_r2 = polar_mod.cart_to_polar(feats[:, :2], x_axis)[..., 1:2] + 3.1415926
    theta_r2 = jnp.where(theta_r2 > 3.1415926, theta_r2 - 2 * 3.1415926, theta_r2)
    features = jnp.concatenate([r_thetar, v_thetav, theta_r2, coll], axis=-1)

    out = apply_fn(params, data.ped_features, data.obs_features,
                   data.self_features)
    p_msg = out.ped_msgs.reshape(-1, out.ped_msgs.shape[-1])

    # The reference filters on the POLAR features (simulators.py:883-886),
    # but zero-padded neighbor slots map to θ_r² = π there, so ~60% of the
    # extracted "edges" are padding with r = 0 and |F| ≈ 0 — they poison
    # any magnitude fit (the analytic law explodes as r → 0).  Filter on
    # the RAW feature row instead: an all-zero row is "no neighbor", never
    # a physical contact at distance 0.
    raw_keep = jnp.sum(jnp.abs(feats), axis=-1) > 0
    keep = (jnp.sum(jnp.abs(features), axis=-1) > 0) & raw_keep
    features = np.asarray(features)[np.asarray(keep)]
    p_msg = np.asarray(p_msg)[np.asarray(keep)]

    if p_msg.shape[-1] > 2:
        # non-bottleneck: regress the two highest-variance message dims
        order = np.argsort(-p_msg.std(axis=0))
        labels = p_msg[:, order]
    else:
        # bottleneck: polar magnitude/direction of the 2-D force
        x_axis_np = np.zeros_like(p_msg)
        x_axis_np[:, 0] = 1.0
        labels = np.asarray(
            polar_mod.cart_to_polar(jnp.asarray(p_msg), jnp.asarray(x_axis_np))
        )
    return features, labels


def prepare_vector_regression_data(
    params, apply_fn, data: PointwiseData
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(dr (E, 2), dv (E, 2), F (E, 2)) raw per-edge triples for the joint
    vector force-law fit (sr.fit.fit_vector_force_law) — bottleneck models
    only (per-edge 2-D forces).  Padding edges (all-zero raw rows) dropped."""
    out = apply_fn(params, data.ped_features, data.obs_features,
                   data.self_features)
    feats = data.ped_features.reshape(-1, data.ped_features.shape[-1])
    p_msg = out.ped_msgs.reshape(-1, out.ped_msgs.shape[-1])
    assert p_msg.shape[-1] == 2, (
        "vector regression needs a bottleneck model (per-edge 2-D forces)"
    )
    keep = np.asarray(jnp.sum(jnp.abs(feats), axis=-1) > 0)
    feats = np.asarray(feats)[keep]
    return feats[:, 0:2], feats[:, 2:4], np.asarray(p_msg)[keep]


def prepare_symbolic_regression_data_polar(
    params, apply_fn, data: PointwiseData
) -> Tuple[np.ndarray, np.ndarray]:
    """Polar-trained variant (reference: simulators.py:898-923)."""
    feats = data.ped_features.reshape(-1, data.ped_features.shape[-1])[:, :4]
    out = apply_fn(params, data.ped_features, data.obs_features,
                   data.self_features)
    p_msg = out.ped_msgs.reshape(-1, out.ped_msgs.shape[-1])
    keep = np.asarray(feats[:, 0] > 1e-8)
    return np.asarray(feats)[keep], np.asarray(p_msg)[keep]


# ---------------------------------------------------------------------------
# filters (reference: symbolic_regression.py:55-115)
# ---------------------------------------------------------------------------

def post_filter(features: np.ndarray, labels: np.ndarray, seed: int,
                n_bin: int = 200, min_sampling_points: int = 40):
    """Histogram rebalancing sampler over the label distribution."""
    if labels.size == 0:
        return features, labels
    lmax, lmin = labels.max(), labels.min()
    interval = np.floor((labels - lmin) * n_bin / max(lmax - lmin, 1e-12))
    interval = np.clip(interval, 0, n_bin - 1).astype(int)
    hist, _ = np.histogram(labels, bins=n_bin)
    with np.errstate(divide="ignore", invalid="ignore"):
        threshold = (min_sampling_points / hist) * (np.log10(hist) + 1) ** 2
    threshold = np.nan_to_num(threshold, posinf=1.0)
    threshold[threshold > 1] = 1
    prob = threshold[interval]
    rng = np.random.RandomState(seed)
    keep = rng.uniform(0, 1, labels.shape) < prob
    return features[keep], labels[keep]


def direction_filter(features: np.ndarray, labels: np.ndarray,
                     percentile: int = 75):
    """Keep only edges with large force magnitude for direction fitting."""
    magnitude = labels[:, 0]
    direction = labels[:, 1]
    thr = np.percentile(magnitude, percentile)
    keep = magnitude > thr
    return features[keep], direction[keep]
