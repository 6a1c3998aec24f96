"""The closed PIML iteration loop.

Reference workflow (SURVEY.md §3.4): pretrain with analytic-SF message
supervision (``pinnsf_interaction='loss'``, v0 constants) → finetune on real
data → extract per-edge messages → fit the symbolic force law → feed the
fitted v2 constants back as supervision for the next iteration
(src/models/simulators.py:333-341, src/symbolic_regression.py,
src/utils/utils.py:76-100).  The reference runs this loop by hand across
shell invocations (``iter_flag``, ``*_iter0`` datasets); here it is one
driver function.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from piml_tpu.config import PIMLConfig
from piml_tpu.data import PointwiseDataset
from piml_tpu.models import MLAPMParams
from piml_tpu.sr import (
    direction_filter,
    fit_force_law,
    fit_force_law_mse,
    post_filter,
    prepare_symbolic_regression_data,
)
from piml_tpu.train import Trainer
from piml_tpu.utils import MetricLogger


@dataclasses.dataclass
class IterationResult:
    iteration: int
    val_loss: float
    fit_A: float
    fit_B: float
    fit_C: float
    fit_D: float
    fit_r2: float
    gp_expression: Optional[str] = None  # free-form SR cross-check
    gp_loss: Optional[float] = None

    def mlapm_params(self, tau: float = 0.5, theta: float = 10.0) -> MLAPMParams:
        return MLAPMParams(version="GC", tau=tau, A=self.fit_A, B=self.fit_B,
                           C=self.fit_C, D=self.fit_D, theta=theta)


def run_iteration(
    cfg: PIMLConfig,
    dataset: PointwiseDataset,
    logger: Optional[MetricLogger] = None,
    gp_check: bool = False,
) -> Tuple[IterationResult, object]:
    """One loop turn: train → extract messages → fit the force family.

    ``gp_check=True`` additionally runs the free-form symbolic-regression
    search (reference symbolic_regression.py:38-52; PySR when installed,
    the native GP engine otherwise) on the same filtered (r, cosθ) data and
    records the discovered expression alongside the closed-form fit."""
    logger = logger or MetricLogger()
    trainer = Trainer(cfg, logger)
    state = trainer.train_pointwise(dataset.train_data, dataset.valid_data)

    apply_fn = lambda p, pf, of, sf: trainer.model.apply(p, pf, of, sf)
    features, labels = prepare_symbolic_regression_data(
        state.params, apply_fn, dataset.train_data
    )
    # features = (r, θ_r, v, θ_v, θ_r², coll); labels = (|F|, θ_F)
    r = features[:, 0]
    cos = np.cos(features[:, 1] - features[:, 3])
    magnitude = labels[:, 0]
    feats_f, mag_f = post_filter(
        np.stack([r, cos], 1), magnitude, seed=cfg.seed
    )
    # log-linear seed → robust direct-MSE fit (the log fit is floored by
    # small-magnitude edges; see sr/fit.py::fit_force_law_mse)
    seed_fit = fit_force_law(feats_f[:, 0], feats_f[:, 1], mag_f)
    fit = fit_force_law_mse(feats_f[:, 0], feats_f[:, 1], mag_f, init=seed_fit)
    logger.log(fit_A=fit.A, fit_B=fit.B, fit_C=fit.C, fit_D=fit.D, fit_r2=fit.r2)

    gp_expr, gp_loss = None, None
    if gp_check:
        from piml_tpu.sr import symbolic_regression

        model = symbolic_regression(feats_f, mag_f, seed=cfg.seed)
        best = model.best()
        gp_expr, gp_loss = best.expression, float(best.loss)
        logger.log(gp_expression=gp_expr, gp_loss=gp_loss)

    result = IterationResult(
        iteration=1 if not cfg.iter_flag else 2,
        val_loss=state.best_val,
        fit_A=fit.A, fit_B=fit.B, fit_C=fit.C, fit_D=fit.D, fit_r2=fit.r2,
        gp_expression=gp_expr, gp_loss=gp_loss,
    )
    return result, state.params


def piml_loop(
    cfg: PIMLConfig,
    data_config: str,
    iterations: int = 2,
    logger: Optional[MetricLogger] = None,
) -> List[IterationResult]:
    """Full loop: iteration 1 uses the v0 analytic supervision; later
    iterations flip ``iter_flag`` so the v2 fitted family supervises."""
    logger = logger or MetricLogger()
    results = []
    for it in range(iterations):
        cfg_it = cfg.replace(
            iter_flag=it > 0,
            pinnsf_interaction="loss" if cfg.pinnsf_interaction == "loss" else cfg.pinnsf_interaction,
            model_name_suffix=f"{cfg.model_name_suffix}_iter{it}",
        )
        dataset = PointwiseDataset(polar=cfg.training_mode == "polar")
        dataset.load_data(data_config)
        cfg_it = dataset.build_dataset(cfg_it)
        result, _ = run_iteration(cfg_it, dataset, logger)
        result = dataclasses.replace(result, iteration=it)
        results.append(result)
        logger.log(iteration=it, val_loss=result.val_loss)
    return results
