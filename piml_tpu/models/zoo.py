"""The model zoo: physics-infused PINNSF family + GNS-style Base ablations.

All models share the call signature
``(ped_features (..., k1, 6), obs_features (..., k2, 6), self_features (..., 7))
→ ModelOutput(pred_acc (..., 2), ped_msgs, obs_msgs, coll_pred)``
(reference: src/models/model.py:762-792) and the encoder → processor →
decoder → predictor MLP skeleton.  ``self_features`` is
``[dest_vec(2), hist_velocity(2h), cur_acc(2), desired_speed(1)]``.

Registry names match the reference CLI (src/models/simulators.py:40-106):
``base, base1..base7, base_nd, base_test, pinnsf, pinnsf2, pinnsf_polar,
pinnsf_bottleneck, pinnsf_pb, pinnsf_pbc, pinnsf_bm, pinnsf_m, pinnsf_res``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from piml_tpu.models.blocks import MLP, AttnPooling, ResDNN, activation_fn
from piml_tpu.physics import heading_direction, polar as polar_mod


class ModelOutput(NamedTuple):
    pred_acc: jax.Array
    ped_msgs: Optional[jax.Array] = None
    obs_msgs: Optional[jax.Array] = None
    coll_pred: Optional[jax.Array] = None


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static hyper-parameters shared across the zoo (hashable for flax)."""

    name: str = "pinnsf_m"
    ped_feature_dim: int = 6
    obs_feature_dim: int = 6
    self_feature_dim: int = 7
    encoder_hidden_size: int = 128
    encoder_hidden_layers: int = 3
    processor_hidden_size: int = 128
    processor_hidden_layers: int = 16
    decoder_hidden_size: int = 64
    decoder_hidden_layers: int = 2
    res_hidden_layers: int = 3
    correction_hidden_layers: int = 1
    activation: str = "relu"
    dropout: float = 0.5
    tau: float = 2.0
    time_unit: float = 0.08
    collision_threshold: float = 0.5
    resdnn_chain: bool = False        # True = fixed residual chain (non-compat)
    dest_norm_axis1: bool = False     # reproduce torch.norm(dim=1) on 3-D input
    # NN-branch compute dtype ('bfloat16' routes the edge MLPs through the
    # bf16 MXU path; params stay f32 and the analytic goal force + output
    # sum stay f32 — the TPU-native precision split the torch reference
    # cannot express).  None = full f32.
    compute_dtype: Optional[str] = None

    @classmethod
    def from_config(cls, cfg: Any, name: Optional[str] = None) -> "ModelSpec":
        return cls(
            name=name or cfg.model,
            ped_feature_dim=cfg.ped_feature_dim,
            obs_feature_dim=cfg.obs_feature_dim,
            self_feature_dim=cfg.self_feature_dim,
            encoder_hidden_size=cfg.encoder_hidden_size,
            encoder_hidden_layers=cfg.encoder_hidden_layers,
            processor_hidden_size=cfg.processor_hidden_size,
            processor_hidden_layers=cfg.processor_hidden_layers,
            decoder_hidden_size=cfg.decoder_hidden_size,
            decoder_hidden_layers=cfg.decoder_hidden_layers,
            res_hidden_layers=cfg.res_hidden_layers,
            correction_hidden_layers=cfg.correction_hidden_layers,
            activation=cfg.activation,
            dropout=cfg.dropout,
            tau=cfg.tau,
            time_unit=cfg.time_unit,
            collision_threshold=cfg.collision_threshold,
            resdnn_chain=not cfg.compat_resdnn_last_block_only,
            dest_norm_axis1=cfg.compat_dest_norm_axis1,
            compute_dtype=getattr(cfg, "compute_dtype", None) or None,
        )

    @property
    def nn_dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    # layer-size helpers
    @property
    def enc_units(self):
        return tuple(self.encoder_hidden_size for _ in range(self.encoder_hidden_layers))

    @property
    def proc_units(self):
        return tuple((self.processor_hidden_size,) for _ in range(self.processor_hidden_layers))

    @property
    def dec_units(self):
        return tuple(self.decoder_hidden_size for _ in range(self.decoder_hidden_layers))


def goal_acceleration(self_features: jax.Array, tau, dest_norm_axis1: bool) -> jax.Array:
    """Analytic goal force from self features (reference: model.py:780-787)."""
    desired_speed = self_features[..., -1:]
    dest = self_features[..., :2]
    axis = 1 if (dest_norm_axis1 and self_features.ndim == 3) else -1
    norm = jnp.linalg.norm(dest, axis=axis, keepdims=True)
    norm = jnp.where(norm == 0, norm + 0.1, norm)
    direction = dest / norm
    velocity = self_features[..., 2:4]
    return (desired_speed * direction - velocity) / tau


# ---------------------------------------------------------------------------
# PINNSF family
# ---------------------------------------------------------------------------

class PINNSF(nn.Module):
    """Configurable physics-infused model covering the whole PINNSF family.

    Variant axes (reference classes in src/models/model.py):

    - ``bottleneck``: per-edge 2-D force prediction before pooling
      (PINNSF_bottleneck:1062; messages are interpretable forces).
    - ``polar``: decode in heading-aligned polar coordinates, converting back
      per-edge (pinnsf_pb:1452) or per-node (pinnsf_polar:795 / pbc:1307).
    - ``collision_head``: per-edge sigmoid collision predictor
      (pinnsf_bm:1138 on decoder embeddings; pinnsf_m:1224 on processor msgs).
    - ``collision_rules``: hard rule-based collision handling (pbc:1307).
    - ``corrector``: residual attention-pooled corrector branch
      (PINNSF_residual:973).
    - ``learnable_tau``: PINNSF2's ``2 + zeros-init scalar`` (model.py:888) —
      actually trainable here, unlike the reference where the tensor is
      created outside the module and never optimized.
    """

    spec: ModelSpec
    bottleneck: bool = False
    polar: Optional[str] = None  # None | 'edge' | 'node'
    collision_head: Optional[str] = None  # None | 'decoder' | 'processor'
    collision_rules: bool = False
    corrector: bool = False
    learnable_tau: bool = False

    @nn.compact
    def __call__(self, ped_features, obs_features, self_features,
                 deterministic: bool = True) -> ModelOutput:
        s = self.spec
        assert self_features.shape[-1] == 7, (
            "PINN models do not accept historical-velocity inputs (model.py:763)"
        )
        act = activation_fn(s.activation)

        polar_base = None
        if self.polar is not None or self.collision_rules:
            polar_base = heading_direction(self_features[..., -5:-3])

        # ---- pedestrian branch -------------------------------------------
        ped_encoder = MLP(s.enc_units, dtype=s.nn_dtype, name="ped_encoder")
        ped_enc_out = ped_encoder(ped_features)
        ped_emb = ResDNN(s.proc_units, act, s.dropout, s.resdnn_chain,
                         dtype=s.nn_dtype, name="ped_processor")(ped_enc_out, deterministic)
        coll_src = None
        if self.bottleneck:
            ped_emb = MLP(s.dec_units, dtype=s.nn_dtype, name="ped_decoder")(ped_emb)
            if self.collision_head == "decoder":
                coll_src = ped_emb
            acc_edge = MLP((2,), dtype=s.nn_dtype, name="ped_predictor")(ped_emb)  # ..., k, 2
            if self.polar == "edge":
                base_k = jnp.broadcast_to(polar_base[..., None, :], acc_edge.shape)
                acc_edge = polar_mod.polar_to_cart(acc_edge, base_k)
            ped_msgs = acc_edge
            pred_acc_ped = jnp.sum(acc_edge, axis=-2)
            if self.polar == "node":
                pred_acc_ped = polar_mod.polar_to_cart(pred_acc_ped, polar_base)
        else:
            ped_msgs = ped_emb
            pooled = jnp.sum(ped_emb, axis=-2)
            pooled = MLP(s.dec_units, dtype=s.nn_dtype, name="ped_decoder")(pooled)
            pred_acc_ped = MLP((2,), dtype=s.nn_dtype, name="ped_predictor")(pooled)
            if self.polar == "node":
                pred_acc_ped = polar_mod.polar_to_cart(pred_acc_ped, polar_base)

        # ---- obstacle branch ---------------------------------------------
        obs_msgs = None
        if s.obs_feature_dim > 0:
            obs_emb = MLP(s.enc_units, dtype=s.nn_dtype, name="obs_encoder")(obs_features)
            obs_emb = ResDNN(s.proc_units, act, s.dropout, s.resdnn_chain,
                             dtype=s.nn_dtype, name="obs_processor")(obs_emb, deterministic)
            if self.bottleneck:
                obs_emb = MLP(s.dec_units, dtype=s.nn_dtype, name="obs_decoder")(obs_emb)
                acc_obs_edge = MLP((2,), dtype=s.nn_dtype, name="obs_predictor")(obs_emb)
                if self.polar == "edge":
                    base_k = jnp.broadcast_to(polar_base[..., None, :], acc_obs_edge.shape)
                    acc_obs_edge = polar_mod.polar_to_cart(acc_obs_edge, base_k)
                obs_msgs = acc_obs_edge
                pred_acc_obs = jnp.sum(acc_obs_edge, axis=-2)
                if self.polar == "node":
                    pred_acc_obs = polar_mod.polar_to_cart(pred_acc_obs, polar_base)
            else:
                obs_msgs = obs_emb
                pooled = jnp.sum(obs_emb, axis=-2)
                pooled = MLP(s.dec_units, dtype=s.nn_dtype, name="obs_decoder")(pooled)
                pred_acc_obs = MLP((2,), dtype=s.nn_dtype, name="obs_predictor")(pooled)
                if self.polar == "node":
                    pred_acc_obs = polar_mod.polar_to_cart(pred_acc_obs, polar_base)
            pred_acc_ped = pred_acc_ped + pred_acc_obs

        # ---- analytic goal force -----------------------------------------
        # bf16 stops at the NN branches: interaction sums, the goal force and
        # everything downstream accumulate in f32
        pred_acc_ped = pred_acc_ped.astype(jnp.float32)
        if self.learnable_tau:
            tau = 2.0 + self.param("tau_delta", nn.initializers.zeros, ())
        else:
            tau = s.tau
        pred_acc_dest = goal_acceleration(self_features, tau, s.dest_norm_axis1)
        predictions = pred_acc_ped + pred_acc_dest

        # ---- residual corrector (pinnsf_res finetune; model.py:1016-1054) --
        if self.corrector:
            # The corrector consumes the shared ped encoder output
            # (model.py:1027-1028: res_embeddings = post-encoder embeddings).
            res_units = tuple((self.spec.processor_hidden_size,)
                              for _ in range(s.res_hidden_layers))
            res = ResDNN(res_units, act, s.dropout, s.resdnn_chain,
                         name="corrector_resdnn")(ped_enc_out, deterministic)
            res = AttnPooling(res_units[-1][-1], name="corrector_attn")(res)
            half = res_units[-1][-1] // 2
            res = MLP((half, 2), name="corrector_head")(res)
            predictions = predictions + res

        # ---- hard collision rules (pbc; model.py:1383-1444) ---------------
        if self.collision_rules:
            predictions = apply_collision_rules(
                predictions, ped_features, self_features,
                s.collision_threshold, s.time_unit
            )

        # ---- collision prediction head ------------------------------------
        coll_pred = None
        if self.collision_head == "decoder":
            coll_pred = MLP((s.dec_units[-1], 1), name="collision_head")(coll_src)
            coll_pred = jax.nn.sigmoid(coll_pred)[..., 0]
        elif self.collision_head == "processor":
            coll_pred = MLP((s.dec_units[-1], 1), name="collision_head")(ped_msgs)
            coll_pred = jax.nn.sigmoid(coll_pred)[..., 0]

        f32 = lambda x: None if x is None else x.astype(jnp.float32)
        return ModelOutput(predictions, f32(ped_msgs), f32(obs_msgs),
                           f32(coll_pred))


def apply_collision_rules(predictions, ped_features, self_features,
                          collision_threshold, time_unit):
    """Hard rule-based collision handling (reference: model.py:1383-1444).

    Classifies the nearest predicted-contact neighbor as head-on vs chasing,
    projects out acceleration components toward the collision normal and
    injects a braking term ``-(v·n)n/Δt``.
    """
    reaction_radius = collision_threshold + 1.34 * 2 * time_unit
    pji = jnp.where(jnp.isnan(ped_features[..., :2]), 0.0, ped_features[..., :2])
    norm_pji = jnp.linalg.norm(pji, axis=-1) + 1e-6  # ..., k
    nji = pji / norm_pji[..., None]
    vi = self_features[..., 2:4]  # ..., 2
    vji = ped_features[..., 2:4]  # ..., k, 2
    vi_k = jnp.broadcast_to(vi[..., None, :], vji.shape)
    vj = vji + vi_k

    collision_flag = ((reaction_radius >= norm_pji) & (norm_pji > 1e-4)).astype(
        predictions.dtype
    )
    inter = jnp.sum(vi_k * pji, axis=-1) * jnp.sum(vj * (-pji), axis=-1)
    inter = jnp.where(jnp.isnan(inter), 0.0, inter)
    inter = (inter > 0).astype(predictions.dtype)
    encounter = collision_flag * inter
    chasing = collision_flag * (1.0 - inter)

    def nearest(flag):
        masked = norm_pji * flag
        masked = jnp.where(masked < 1e-4, masked + 100.0, masked)
        idx = jnp.argmin(masked, axis=-1)  # ...,
        take = lambda arr: jnp.take_along_axis(
            arr, idx[..., None, None], axis=-2
        )[..., 0, :]
        return take(nji), take(vji)

    # head-on encounters: brake along the collision normal
    nji_c, _ = nearest(encounter)
    has_enc = (jnp.sum(encounter, axis=-1, keepdims=True) > 0)
    ai_c = -jnp.sum(vi * nji_c, axis=-1, keepdims=True) * nji_c / time_unit
    ai_c = ai_c * has_enc
    pred_e = predictions * has_enc
    ai_nji = jnp.sum(pred_e * nji_c, axis=-1, keepdims=True)
    ai_nji = ai_nji * (ai_nji > 0)
    predictions = predictions + (pred_e - ai_nji * nji_c + ai_c)

    # chasing: decelerate only if approaching
    nji_c, vji_c = nearest(chasing)
    has_cha = (jnp.sum(chasing, axis=-1, keepdims=True) > 0)
    ai_c = jnp.sum(vji_c * nji_c, axis=-1, keepdims=True)
    approaching = ai_c < 0
    ai_c_ = ai_c * approaching * nji_c / time_unit * has_cha
    pred_c = predictions * has_cha
    ai_nji = jnp.sum(pred_c * nji_c, axis=-1, keepdims=True)
    ai_nji = ai_nji * (ai_nji > 0) * approaching
    predictions = predictions + (pred_c - ai_nji * nji_c + ai_c_)

    return predictions


class BaseTest(nn.Module):
    """Goal-force-only baseline (reference: model.py:1538-1609) — builds the
    NN branches but uses only the analytic goal force for prediction."""

    spec: ModelSpec

    @nn.compact
    def __call__(self, ped_features, obs_features, self_features,
                 deterministic: bool = True) -> ModelOutput:
        s = self.spec
        pred_acc_dest = goal_acceleration(self_features, s.tau, s.dest_norm_axis1)
        # The reference also runs the NN branches and *adds* them; Base_test
        # keeps them (model.py:1581-1606) — reproduce faithfully.
        act = activation_fn(s.activation)
        ped_emb = MLP(s.enc_units, dtype=s.nn_dtype, name="ped_encoder")(ped_features)
        ped_emb = ResDNN(s.proc_units, act, s.dropout, s.resdnn_chain,
                         dtype=s.nn_dtype, name="ped_processor")(ped_emb, deterministic)
        pooled = jnp.sum(ped_emb, axis=-2)
        pooled = MLP(s.dec_units, dtype=s.nn_dtype, name="ped_decoder")(pooled)
        pred_acc_ped = MLP((2,), dtype=s.nn_dtype, name="ped_predictor")(pooled)
        if s.obs_feature_dim > 0:
            obs_emb = MLP(s.enc_units, dtype=s.nn_dtype, name="obs_encoder")(obs_features)
            obs_emb = ResDNN(s.proc_units, act, s.dropout, s.resdnn_chain,
                             dtype=s.nn_dtype, name="obs_processor")(obs_emb, deterministic)
            pooled = jnp.sum(obs_emb, axis=-2)
            pooled = MLP(s.dec_units, dtype=s.nn_dtype, name="obs_decoder")(pooled)
            pred_acc_ped = pred_acc_ped + MLP((2,), dtype=s.nn_dtype, name="obs_predictor")(pooled)
        predictions = pred_acc_ped + pred_acc_dest
        return ModelOutput(predictions, pred_acc_dest)


# ---------------------------------------------------------------------------
# GNS-style Base ablations (reference: model.py:122-717)
# ---------------------------------------------------------------------------

class BaseSim(nn.Module):
    """The 9 Base ablations as one configurable module.

    Variant axes mirror model.py:122-717:

    - ``dest_mode``: how self_features[:2] (dest vector) is treated —
      'raw' (base/base6), 'split' (base1: separate dest/rest encoders),
      'unit' (base3/base4/base5: normalized), 'unit_norm' (base7: unit + |d|).
    - ``fuse``: 'node' (self branch processed separately, concatenated before
      the decoder) or 'edge' (base2/base5: self embedding broadcast onto each
      edge and processed jointly).
    - ``abs_dist``: base6 prepends |rel_pos| to each edge feature row.
    - ``corrector``: BaseNDSimModel's extra ResDNN before the predictor
      (model.py:649-717), used as the finetune variant of ``base``.
    """

    spec: ModelSpec
    dest_mode: str = "raw"   # raw | split | unit | unit_norm
    fuse: str = "node"       # node | edge
    abs_dist: bool = False
    corrector: bool = False

    @nn.compact
    def __call__(self, ped_features, obs_features, self_features,
                 deterministic: bool = True) -> ModelOutput:
        s = self.spec
        act = activation_fn(s.activation)
        half_units = tuple(s.encoder_hidden_size // 2
                           for _ in range(s.encoder_hidden_layers))

        if self.abs_dist:
            dist = jnp.linalg.norm(ped_features[..., :2], axis=-1, keepdims=True)
            ped_features = jnp.concatenate([dist, ped_features], axis=-1)

        ped_emb = MLP(s.enc_units, dtype=s.nn_dtype, name="ped_encoder")(ped_features)
        if s.obs_feature_dim > 0:
            obs_emb = MLP(s.enc_units, dtype=s.nn_dtype, name="obs_encoder")(obs_features)
            ped_emb = jnp.concatenate([ped_emb, obs_emb], axis=-2)

        # ---- self embedding ----------------------------------------------
        dest = self_features[..., :2]
        rest = self_features[..., 2:]
        if self.dest_mode in {"unit", "unit_norm"}:
            axis = 1 if (s.dest_norm_axis1 and self_features.ndim == 3) else -1
            norm = jnp.linalg.norm(dest, axis=axis, keepdims=True)
            unit = dest / norm
        if self.dest_mode == "raw":
            self_emb = MLP(s.enc_units, name="self_encoder")(self_features)
        elif self.dest_mode == "split":
            e1 = MLP(half_units, name="self_encoder1")(dest)
            e2 = MLP(half_units, name="self_encoder2")(rest)
            self_emb = jnp.concatenate([e1, e2], axis=-1)
        elif self.dest_mode == "unit":
            if self.fuse == "edge" or self.spec.name in {"base4", "base5"}:
                sf = jnp.concatenate([unit, rest], axis=-1)
                self_emb = MLP(s.enc_units, name="self_encoder")(sf)
            else:  # base3: split encoders on unit dest
                e1 = MLP(half_units, name="self_encoder1")(unit)
                e2 = MLP(half_units, name="self_encoder2")(rest)
                self_emb = jnp.concatenate([e1, e2], axis=-1)
        elif self.dest_mode == "unit_norm":
            sf = jnp.concatenate([unit, norm, rest], axis=-1)
            self_emb = MLP(s.enc_units, name="self_encoder")(sf)
        else:
            raise NotImplementedError(self.dest_mode)

        # ---- processors ---------------------------------------------------
        if self.fuse == "edge":
            # edge fusion widens the processor ×2 (base2/base5, model.py:272,471)
            self_b = jnp.broadcast_to(
                self_emb[..., None, :], ped_emb.shape[:-1] + self_emb.shape[-1:]
            )
            joint = jnp.concatenate([ped_emb, self_b], axis=-1)
            width = s.processor_hidden_size * 2
            proc_units = tuple((width,) for _ in range(s.processor_hidden_layers))
            joint = ResDNN(proc_units, act, s.dropout, s.resdnn_chain,
                           name="ped_processor")(joint, deterministic)
            pooled = jnp.sum(joint, axis=-2)
        else:
            proc_units = tuple((s.processor_hidden_size,)
                               for _ in range(s.processor_hidden_layers))
            ped_emb = ResDNN(proc_units, act, s.dropout, s.resdnn_chain,
                             name="ped_processor")(ped_emb, deterministic)
            self_emb = ResDNN(proc_units, act, s.dropout, s.resdnn_chain,
                              name="self_processor")(self_emb, deterministic)
            pooled = jnp.concatenate([jnp.sum(ped_emb, axis=-2), self_emb], axis=-1)

        pooled = MLP(s.dec_units, dtype=s.nn_dtype, name="ped_decoder")(pooled)
        if self.corrector:
            cor_units = tuple((s.decoder_hidden_size, s.decoder_hidden_size)
                              for _ in range(s.correction_hidden_layers))
            pooled = ResDNN(cor_units, act, s.dropout, s.resdnn_chain,
                            name="corrector")(pooled, deterministic)
        predictions = MLP((2,), name="predictor")(pooled)
        return ModelOutput(predictions)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def build_model(spec: ModelSpec) -> nn.Module:
    """Model registry by reference name (src/models/simulators.py:40-63)."""
    name = spec.name
    if name == "base":
        return BaseSim(spec)
    if name == "base1":
        return BaseSim(spec, dest_mode="split")
    if name == "base2":
        return BaseSim(spec, dest_mode="split", fuse="edge")
    if name == "base3":
        return BaseSim(spec, dest_mode="unit")
    if name == "base4":
        return BaseSim(spec, dest_mode="unit")
    if name == "base5":
        return BaseSim(spec, dest_mode="unit", fuse="edge")
    if name == "base6":
        return BaseSim(spec, abs_dist=True)
    if name == "base7":
        return BaseSim(spec, dest_mode="unit_norm")
    if name == "base_nd":
        return BaseSim(spec, corrector=True)
    if name == "base_test":
        return BaseTest(spec)
    if name in {"pinnsf"}:
        return PINNSF(spec)
    if name == "pinnsf2":
        return PINNSF(spec, learnable_tau=True)
    if name == "pinnsf_polar":
        return PINNSF(spec, polar="node")
    if name == "pinnsf_bottleneck":
        return PINNSF(spec, bottleneck=True)
    if name == "pinnsf_pb":
        return PINNSF(spec, bottleneck=True, polar="edge")
    if name == "pinnsf_pbc":
        return PINNSF(spec, bottleneck=True, polar="node", collision_rules=True)
    if name == "pinnsf_bm":
        return PINNSF(spec, bottleneck=True, collision_head="decoder")
    if name == "pinnsf_m":
        return PINNSF(spec, collision_head="processor")
    if name == "pinnsf_res":
        return PINNSF(spec, corrector=True)
    raise NotImplementedError(name)


def build_finetune_model(spec: ModelSpec) -> nn.Module:
    """Finetune registry (src/models/simulators.py:78-102): ``base`` swaps to
    the corrector-equipped BaseND; ``pinnsf`` (pretrained as plain PINNSF under
    the ``pinnsf_res`` name) swaps to the residual-corrector PINNSF."""
    name = spec.name
    if name == "base":
        return BaseSim(spec, corrector=True)
    if name == "pinnsf_res":
        return PINNSF(spec, corrector=True)
    return build_model(spec)


def pretrain_model_name(name: str) -> str:
    """Pretraining uses plain PINNSF when the CLI asks for pinnsf_res
    (src/models/simulators.py:44-45)."""
    return "pinnsf" if name == "pinnsf_res" else name
