"""Symbolic regression on the trained GC model.

The reference's discovery pipeline (src/symbolic_regression.py): load the
finetuned pinnsf_bm checkpoint, run it over real pointwise data
(data_symbolic.yaml — real GC windows 2224-2284 + 2344-2404), extract the
per-edge 2-D force messages, convert pair features to heading-aligned polar,
rebalance, and fit the force law.  Two fits run:

- the closed-form log-linear fit of the discovered family
  ``A·exp(B·r + C·cosθ + D·r·cosθ)`` (sr/fit.py; the family the reference's
  PySR runs converged to — paper GC fit A=7.55, B=−3.00, C=0.2, D=−0.3,
  src/main_mlapm.py:16), and
- the free-form search (PySR when installed; the native GP engine
  otherwise — same operators + * exp cos, reference
  symbolic_regression.py:38-52).

Writes sr_gc.json and appends the fit to RESULTS.md.
"""

import json
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
    fit_force_law_mse,
    post_filter,
    prepare_symbolic_regression_data,
    symbolic_regression,
)
from piml_tpu.train import checkpoint_path, load_params


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--exp_name", default="piml-gc-paper")
    ap.add_argument("--suffix", default="paper0")
    ap.add_argument("--finetuned", type=int, default=1)
    ap.add_argument("--gp", type=int, default=1,
                    help="also run the free-form GP/PySR search")
    ap.add_argument("--data", default="gc_symbolic",
                    help="data config name under configs/data_configs/")
    ap.add_argument("--append_md", type=int, default=0,
                    help="append the fit table to RESULTS.md")
    ap.add_argument("--vector", type=int, default=0,
                    help="joint vector force-law fit instead of the "
                         "magnitude/direction pipeline")
    ap.add_argument("--out", default="",
                    help="output json filename (vector mode)")
    cli = ap.parse_args()

    cfg = PIMLConfig(
        exp_name=cli.exp_name, model="pinnsf_bm", dataset_name="gc2344",
        model_name_suffix=cli.suffix, skip_frames=25, dropout=0.5,
        save_dir=os.path.join(ROOT, "saved_model"),
    )
    ckpt = checkpoint_path(cfg, finetuned=bool(cli.finetuned))
    if not os.path.exists(ckpt):
        print(f"checkpoint {ckpt} not found — run tools/run_gc_experiment.py")
        return 1
    print(f"using checkpoint {ckpt}")

    ds = PointwiseDataset()
    ds.load_data(os.path.join(ROOT, f"configs/data_configs/{cli.data}.yaml"))
    cfg = ds.build_dataset(cfg)

    model = build_model(ModelSpec.from_config(cfg))
    template = model.init(
        jax.random.PRNGKey(0), ds.train_data.ped_features[:1],
        ds.train_data.obs_features[:1], ds.train_data.self_features[:1],
    )
    params = load_params(ckpt, template)
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)

    if cli.vector:
        # joint vector fit (VERDICT r2 item 10): all five constants from
        # the raw per-edge (dr, dv, F) triples — requires a checkpoint whose
        # supervision actually varied cos (sf_dv_from_velocity), else C/D
        # are unidentifiable (PARITY §2.6)
        from piml_tpu.sr import fit_vector_force_law, prepare_vector_regression_data

        dr, dv, F = prepare_vector_regression_data(params, apply_fn,
                                                   ds.train_data)
        # focus the fit where force is informative (near pairs), like the
        # reference's direction_filter percentile gate
        mag = np.linalg.norm(F, axis=-1)
        keep = mag > np.percentile(mag, 50)
        vfit = fit_vector_force_law(dr[keep], dv[keep], F[keep])
        print(f"vector fit: A={vfit.A:.3f} B={vfit.B:.3f} C={vfit.C:.4f} "
              f"D={vfit.D:.3f} theta={vfit.theta_deg:.2f}deg r2={vfit.r2:.3f}")
        out = {
            "checkpoint": ckpt, "edges": int(dr.shape[0]),
            "vector_fit": {"A": vfit.A, "B": vfit.B, "C": vfit.C, "D": vfit.D,
                           "theta_deg": vfit.theta_deg, "r2": vfit.r2},
            "supervision_v2": {"A": 9.0, "B": -2.75, "C": 0.06, "D": -0.3,
                               "theta_deg": 10.0},
        }
        with open(os.path.join(ROOT, cli.out or "sr_gc_vector.json"), "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", cli.out or "sr_gc_vector.json")
        return 0

    features, labels = prepare_symbolic_regression_data(
        params, apply_fn, ds.train_data
    )
    print(f"extracted {features.shape[0]} edges")

    # magnitude fit: features = (r, θ_r, v, θ_v, θ_r², coll); labels (|F|, θ_F)
    r = features[:, 0]
    cos = np.cos(features[:, 1] - features[:, 3])
    mag = labels[:, 0]
    feats_f, mag_f = post_filter(np.stack([r, cos], 1), mag, seed=cfg.seed)
    log_fit = fit_force_law(feats_f[:, 0], feats_f[:, 1], mag_f)
    print(f"log-linear fit: A={log_fit.A:.3f} B={log_fit.B:.3f} "
          f"C={log_fit.C:.3f} D={log_fit.D:.3f} (log r²={log_fit.r2:.3f})")
    # the robust fit: direct MSE on magnitudes (the objective PySR uses) —
    # the log fit is floored by near-zero far-pair forces (sr/fit.py)
    fit = fit_force_law_mse(feats_f[:, 0], feats_f[:, 1], mag_f, init=log_fit)
    print(f"magnitude fit: A={fit.A:.3f} B={fit.B:.3f} C={fit.C:.3f} "
          f"D={fit.D:.3f} (linear r²={fit.r2:.3f})")

    gp_row = None
    if cli.gp:
        gp = symbolic_regression(feats_f, mag_f, seed=cfg.seed)
        best = gp.best()
        gp_row = {"expression": best.expression, "loss": float(best.loss),
                  "complexity": int(best.complexity)}
        print(f"GP best: {best.expression} (mse {best.loss:.5f})")
        for e in gp.equations_:
            print(f"  c={e.complexity:<3d} loss={e.loss:.5f}  {e.expression}")

    # direction law: the discovered family is anti-radial repulsion rotated
    # by a fitted bias (MLAPM's theta, mlapm.py:33-38).  Compare the GLOBAL
    # force angle theta_F with the GLOBAL relative-position angle theta_r2
    # (features[:,4]) — both in the same frame — as a circular statistic,
    # folding out the radial-axis sign convention.
    feats_d, direction = direction_filter(features, labels, percentile=75)
    diff = direction - (feats_d[:, 4] + np.pi)
    diff = (diff + np.pi) % (2 * np.pi) - np.pi
    z = np.mean(np.exp(1j * diff)) if diff.size else 0.0
    circ_mean = float(np.angle(z))
    rotation = circ_mean - np.sign(circ_mean) * np.pi \
        if abs(circ_mean) > np.pi / 2 else circ_mean
    mean_bias_deg = float(np.rad2deg(rotation))
    circ_std_deg = float(np.rad2deg(np.sqrt(-2 * np.log(max(abs(z), 1e-12))))) \
        if diff.size else float("nan")
    print(f"direction rotation bias: {mean_bias_deg:.2f}° "
          f"(circ-std {circ_std_deg:.1f}°)")

    out = {
        "checkpoint": ckpt, "edges": int(features.shape[0]),
        "family_fit": {"A": fit.A, "B": fit.B, "C": fit.C, "D": fit.D,
                       "linear_r2": fit.r2},
        "log_fit": {"A": log_fit.A, "B": log_fit.B, "C": log_fit.C,
                    "D": log_fit.D, "log_r2": log_fit.r2},
        "gp_best": gp_row,
        "direction_rotation_deg": mean_bias_deg,
        "direction_circ_std_deg": circ_std_deg,
        "paper": {"A": 7.55, "B": -3.0, "C": 0.2, "D": -0.3, "theta": 56},
    }
    with open(os.path.join(ROOT, "sr_gc.json"), "w") as f:
        json.dump(out, f, indent=2)

    if cli.append_md:
        md = f"""
## Symbolic regression on the trained model

Extracted {features.shape[0]} per-edge force messages from the
{'finetuned' if cli.finetuned else 'pretrained'} pinnsf_bm checkpoint
({cli.data}.yaml), rebalanced (sr/extract.py::post_filter) and fitted the
discovered family ``A*exp(B*r + C*cos + D*r*cos)``:

| constant | fitted | paper (main_mlapm.py:16) |
|---|---|---|
| A | {fit.A:.3f} | 7.55 |
| B | {fit.B:.3f} | -3.00 |
| C | {fit.C:.3f} | 0.2 |
| D | {fit.D:.3f} | -0.3 |
| linear r2 | {fit.r2:.3f} | --- |

Direction law (top-quartile forces): anti-radial repulsion rotated by
{mean_bias_deg:.2f} deg (circular std {circ_std_deg:.1f}).
"""
        with open(os.path.join(ROOT, "RESULTS.md"), "a") as f:
            f.write(md)
    print("wrote sr_gc.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
