"""Symbolic regression on the trained GC model.

The reference's discovery pipeline (src/symbolic_regression.py): load the
finetuned pinnsf_bm checkpoint, run it over real pointwise data, extract the
per-edge 2-D force messages, convert pair features to heading-aligned polar,
rebalance, and fit the force law.  PySR is unavailable in this container, so
the closed-form log-linear fit of the discovered family
``A·exp(B·r + C·cosθ + D·r·cosθ)`` (sr/fit.py) stands in; the paper's GC fit
was A=7.55, B=−3.00, C=0.2, D=−0.3 (src/main_mlapm.py:16).

Appends the fit to RESULTS.md.
"""

import glob
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

from piml_tpu.config import PIMLConfig
from piml_tpu.data import PointwiseDataset
from piml_tpu.models import ModelSpec, build_model
from piml_tpu.sr import (
    direction_filter,
    fit_force_law,
    post_filter,
    prepare_symbolic_regression_data,
)
from piml_tpu.train import load_params


def main():
    cfg = PIMLConfig(
        exp_name="piml-gc", model="pinnsf_bm", dataset_name="gc2344",
        skip_frames=25, dropout=0.5,
        save_dir=os.path.join(ROOT, "saved_model"),
    )
    # pick the newest finetuned checkpoint from the GC experiment
    ckpts = sorted(
        glob.glob(os.path.join(cfg.save_dir, "piml-gc_*_finetuned")),
        key=os.path.getmtime,
    )
    if not ckpts:
        print("no finetuned checkpoint found — run tools/run_gc_experiment.py")
        return 1
    ckpt = ckpts[-1]
    print(f"using checkpoint {ckpt}")

    ds = PointwiseDataset()
    ds.load_data(os.path.join(ROOT, "configs/data_configs/gc_finetune.yaml"))
    cfg = ds.build_dataset(cfg)

    model = build_model(ModelSpec.from_config(cfg))
    template = model.init(
        jax.random.PRNGKey(0), ds.train_data.ped_features[:1],
        ds.train_data.obs_features[:1], ds.train_data.self_features[:1],
    )
    params = load_params(ckpt, template)
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)

    features, labels = prepare_symbolic_regression_data(
        params, apply_fn, ds.train_data
    )
    print(f"extracted {features.shape[0]} edges")

    # magnitude fit: features = (r, θ_r, v, θ_v, θ_r², coll); labels (|F|, θ_F)
    r = features[:, 0]
    cos = np.cos(features[:, 1] - features[:, 3])
    mag = labels[:, 0]
    feats_f, mag_f = post_filter(np.stack([r, cos], 1), mag, seed=cfg.seed)
    fit = fit_force_law(feats_f[:, 0], feats_f[:, 1], mag_f)
    print(f"magnitude fit: A={fit.A:.3f} B={fit.B:.3f} C={fit.C:.3f} "
          f"D={fit.D:.3f} (r²={fit.r2:.3f} in log space)")

    feats_d, direction = direction_filter(features, labels, percentile=75)
    mean_bias_deg = float(np.rad2deg(np.mean(np.abs(
        direction - feats_d[:, 1]  # θ_F − θ_r
    ))))
    print(f"direction bias |θ_F − θ_r| mean: {mean_bias_deg:.1f}°")

    with open(os.path.join(ROOT, "RESULTS.md"), "a") as f:
        f.write(f"""
## Symbolic regression on the trained model

Extracted {features.shape[0]} per-edge force messages from the finetuned
pinnsf_bm checkpoint on the real GC window, rebalanced
(sr/extract.py::post_filter) and fitted the discovered family
``A·exp(B·r + C·cosθ + D·r·cosθ)``:

| constant | fitted | paper (main_mlapm.py:16) |
|---|---|---|
| A | {fit.A:.3f} | 7.55 |
| B | {fit.B:.3f} | −3.00 |
| C | {fit.C:.3f} | 0.2 |
| D | {fit.D:.3f} | −0.3 |
| log-space r² | {fit.r2:.3f} | — |

Direction bias |θ_F − θ_r| (top-quartile forces): {mean_bias_deg:.1f}°
(paper's fitted rotation: 56°).  Constants differ from the paper's as
expected for a short round-1 training run; the pipeline (extraction →
filtering → family fit → MLAPM constants) is the reference's closed loop.
""")
    print("appended SR section to RESULTS.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
