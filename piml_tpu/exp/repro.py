"""One-command paper reproduction (VERDICT r4 item 7).

Runs the five BASELINE.json configs at paper budget and emits one
consolidated table (repro.json + REPRO.md at the repo root):

1. **pure_sf** — pure social-force rollout regenerating a synthetic GC
   scenario .npy (reference: the missing ``models.socialforce`` generator,
   SURVEY §2.5, driven by src/data/scenarios.py:313's GC scenario).
2. **pretrain** — PIML pretrain of ``pinnsf_bm`` on the 4 synthetic GC
   windows (reference: src/main.py:126-146 at exp_configs/piml-gcdata.yaml).
3. **finetune** — differentiable-rollout finetune on the 3 real GC windows
   + closed-loop evaluation on the held-out window (src/main.py:148-155,
   simulators.py:659-832).
4. **mlapm_sim** — discovered-MLAPM simulation regenerating the synthetic
   GC scenario .npy (reference: src/main_mlapm.py + mlapm.py).
5. **sr_grid** — symbolic regression on the learned force messages + the
   grid-search expansion of the paper's sweep YAML
   (src/symbolic_regression.py, run_experiments.py).

Each stage shells out to the same entry points a user runs by hand, so this
is an end-to-end check of the public surface, not a bespoke code path:

    python -m piml_tpu.exp.repro                 # full paper budget
    python -m piml_tpu.exp.repro --smoke         # minutes-scale CI variant

Stages are resumable: a stage that already has a result in repro.json is
skipped unless --force.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TOOLS = os.path.join(ROOT, "tools")


def _run(cmd, timeout=None, env=None):
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=ROOT, timeout=timeout, capture_output=True, text=True,
        env={**os.environ, **(env or {})},
    )
    return {
        "cmd": " ".join(cmd),
        "rc": proc.returncode,
        "wall_s": round(time.time() - t0, 1),
        "tail": "\n".join((proc.stdout + proc.stderr).splitlines()[-8:]),
    }


def stage_pure_sf(out_dir, smoke):
    frames = 100 if smoke else 750
    out = os.path.join(out_dir, "gc_sf_repro.npy")
    r = _run([sys.executable, "-m", "piml_tpu.exp.generate",
              "--scenario", "GC", "--frames", str(frames),
              "--engine", "socialforce", "--out", out])
    if r["rc"] == 0 and os.path.exists(out):
        import numpy as np

        meta, trajs, dests, obs = np.load(out, allow_pickle=True)
        r["n_pedestrians"] = len(trajs)
        r["frames"] = frames
        r["agent_steps_per_sec"] = round(
            sum(len(t) for t in trajs) / max(r["wall_s"], 1e-9), 1)
    return r


def stage_gc(stage, state_file, smoke):
    epochs = "3" if smoke else "1000"
    cmd = [sys.executable, os.path.join(TOOLS, "run_gc_experiment.py"),
           "--stage", stage, "--epochs", epochs, "--state", state_file]
    if smoke:
        cmd += ["--set", "model_name_suffix=reprosmk"]
    else:
        cmd += ["--set", "model_name_suffix=repro0"]
    r = _run(cmd)
    if r["rc"] == 0 and os.path.exists(state_file):
        with open(state_file) as f:
            gc = json.load(f)
        for k in ("pretrain", "finetune", "pretrain_test", "finetune_test",
                  "gt_test"):
            if k in gc:
                r[k] = gc[k]
    return r


def stage_mlapm(out_dir, smoke):
    frames = 100 if smoke else 750
    out = os.path.join(out_dir, "gc_mlapm_repro.npy")
    r = _run([sys.executable, "-m", "piml_tpu.exp.generate",
              "--scenario", "GC", "--frames", str(frames),
              "--engine", "mlapm", "--out", out])
    if r["rc"] == 0 and os.path.exists(out):
        import numpy as np

        meta, trajs, dests, obs = np.load(out, allow_pickle=True)
        r["n_pedestrians"] = len(trajs)
        r["frames"] = frames
    return r


def stage_sr_grid(smoke, suffix):
    # SR on the finetuned model's messages (native GP engine)
    r = _run([sys.executable, os.path.join(TOOLS, "run_symbolic_regression.py"),
              "--suffix", suffix, "--finetuned", "1",
              "--gp", "0" if smoke else "1"])
    # grid expansion of the transcribed paper sweep YAML (pure host logic —
    # the reference's run_experiments.py equivalent; commands not executed
    # here, the sweep itself is the whole repro)
    try:
        from piml_tpu.exp.grid import yaml_to_grid_params

        grid_yaml = os.path.join(ROOT, "configs/exp_configs/piml-gcdata.yaml")
        if os.path.exists(grid_yaml):
            r["grid_commands"] = len(yaml_to_grid_params(grid_yaml))
    except Exception as e:  # pragma: no cover
        r["grid_error"] = repr(e)[:200]
    return r


def write_md(results, path):
    gc = results.get("finetune", {})
    pre = gc.get("pretrain_test", {})
    ft = gc.get("finetune_test", {})
    gt = gc.get("gt_test", {})
    sf = results.get("pure_sf", {})
    ml = results.get("mlapm_sim", {})
    sr = results.get("sr_grid", {})

    def g(d, k, fmt="{:.4f}"):
        v = d.get(k)
        return fmt.format(v) if isinstance(v, (int, float)) else "—"

    with open(path, "w") as f:
        f.write(f"""# REPRO — the five BASELINE.json configs, one command

`python -m piml_tpu.exp.repro` (budget: {results.get('budget', '?')};
host: one TPU v5e through the axon tunnel).  Total wall
{results.get('total_wall_s', 0):.0f} s.

| # | config (BASELINE.json) | result |
|---|---|---|
| 1 | pure social-force rollout (GC scenario) | {sf.get('n_pedestrians', '—')} peds × {sf.get('frames', '—')} frames, {sf.get('wall_s', '—')} s |
| 2 | PIML pretrain (pinnsf_bm, 4 synthetic windows) | val MSE {g(gc.get('pretrain', {}), 'val_mse', '{:.5f}')}, {gc.get('pretrain', {}).get('epochs_ran', '—')} epochs, {g(gc.get('pretrain', {}), 'wall_s', '{:.0f}')} s |
| 3 | finetune + closed-loop eval (3 real windows → held-out) | val loss {g(gc.get('finetune', {}), 'val_loss')}, {gc.get('finetune', {}).get('epochs_ran', '—')} epochs, {g(gc.get('finetune', {}), 'wall_s', '{:.0f}')} s |
| 4 | discovered-MLAPM simulation (GC scenario npy) | {ml.get('n_pedestrians', '—')} peds × {ml.get('frames', '—')} frames, {ml.get('wall_s', '—')} s |
| 5 | symbolic regression + grid expansion | rc={sr.get('rc', '—')}, {sr.get('grid_commands', '—')} grid commands, {sr.get('wall_s', '—')} s |

## Held-out window metrics (pretrained → finetuned)

| metric | pretrained | finetuned |
|---|---|---|
| rollout MSE | {g(pre, 'mse')} | {g(ft, 'mse')} |
| rollout MAE (m) | {g(pre, 'mae')} | {g(ft, 'mae')} |
| Sinkhorn OT | {g(pre, 'ot')} | {g(ft, 'ot')} |
| MMD | {g(pre, 'mmd', '{:.6f}')} | {g(ft, 'mmd', '{:.6f}')} |
| soft collisions | {g(pre, 'collision', '{:.0f}')} | {g(ft, 'collision', '{:.0f}')} |
| hard collisions | {g(pre, 'hard_collision', '{:.0f}')} | {g(ft, 'hard_collision', '{:.0f}')} |

Ground truth: {g(gt, 'collision', '{:.0f}')} soft / {g(gt, 'hard_collision', '{:.0f}')} hard collisions.
""")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="one-command paper reproduction")
    ap.add_argument("--smoke", action="store_true",
                    help="minutes-scale budget (CI): tiny frames/epochs")
    ap.add_argument("--force", action="store_true",
                    help="re-run stages already present in the state file")
    ap.add_argument("--out", default=None, help="state JSON path")
    ap.add_argument("--stages", default="pure_sf,pretrain,finetune,mlapm_sim,sr_grid")
    cli = ap.parse_args(argv)

    out_path = cli.out or os.path.join(
        ROOT, "repro_smoke.json" if cli.smoke else "repro.json")
    md_path = os.path.join(ROOT, "REPRO.md")
    work = os.path.join(ROOT, "repro_work")
    os.makedirs(work, exist_ok=True)
    gc_state = os.path.join(
        work, "gc_state_smoke.json" if cli.smoke else "gc_state.json")

    results = {}
    if os.path.exists(out_path) and not cli.force:
        with open(out_path) as f:
            results = json.load(f)
    results["budget"] = "smoke" if cli.smoke else "paper"
    t0 = time.time()
    wanted = [s.strip() for s in cli.stages.split(",") if s.strip()]

    def save():
        results["total_wall_s"] = results.get("total_wall_s_prev", 0.0) + \
            time.time() - t0
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, default=float)

    for name in wanted:
        if name in results and not cli.force and results[name].get("rc") == 0:
            print(f"[repro] {name}: cached (rc=0), skipping")
            continue
        print(f"[repro] running {name} ...", flush=True)
        if name == "pure_sf":
            results[name] = stage_pure_sf(work, cli.smoke)
        elif name == "pretrain":
            results[name] = stage_gc("pretrain", gc_state, cli.smoke)
        elif name == "finetune":
            results[name] = stage_gc("finetune", gc_state, cli.smoke)
        elif name == "mlapm_sim":
            results[name] = stage_mlapm(work, cli.smoke)
        elif name == "sr_grid":
            suffix = "reprosmk" if cli.smoke else "repro0"
            results[name] = stage_sr_grid(cli.smoke, suffix)
        else:
            print(f"[repro] unknown stage {name}", file=sys.stderr)
            return 2
        print(f"[repro] {name}: rc={results[name].get('rc')} "
              f"({results[name].get('wall_s')} s)")
        save()

    if not cli.smoke:
        write_md(results, md_path)
        print(f"[repro] wrote {md_path}")
    save()
    bad = [n for n in wanted if results.get(n, {}).get("rc") != 0]
    if bad:
        print(f"[repro] FAILED stages: {bad}", file=sys.stderr)
        return 1
    print(f"[repro] all stages ok → {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
