"""Attribute the finetune one-time setup/compile term (VERDICT r4 item 1).

epoch_breakdown.json showed the 6-epoch GC paper finetune is ~96 s of
setup/compile + ~11.5 s of training, *with the persistent compile cache
warm*.  This tool splits that term into the phases the jax.monitoring
stream exposes — Python tracing, jaxpr->MLIR lowering, XLA backend compile
(which on axon includes the tunnel compile-helper round trip), and
persistent-cache hit/miss/deserialize — per trainer phase and per program.

Run twice to separate cold-cache from warm-cache behavior:

    PIML_COMPILE_CACHE=/tmp/attrib_cache python tools/profile_compile_attribution.py --tag cold
    PIML_COMPILE_CACHE=/tmp/attrib_cache python tools/profile_compile_attribution.py --tag warm

Writes compile_attrib_{tag}.json.  Needs the shared1 pretrain checkpoint
(tools/run_gc_experiment.py --stage pretrain --set model_name_suffix=shared1).

CAVEAT (r5, measured): on the tunneled axon platform, REGISTERING the
jax.monitoring listeners can itself induce a multi-minute unattributed
stall at the first blocking host sync (6/6 attribution runs stalled
250-1216 s; the identical phases in listener-free processes — the official
CLI runs, bench.py, tools/probe_validate_stall.py — never stall; the
faulthandler trace shows the main thread parked in jax Array._value while
the platform's C++ callback threads presumably contend on the GIL-holding
listener).  Treat per-phase walls from this tool as upper bounds; take
headline walls from a listener-free run.
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    # PIML_STALL_TRACE=1: dump all thread stacks to stderr every 60 s —
    # catches the unattributed multi-minute stall (compile_attrib_r5new_cold
    # .json: 873 s in ft_baseline_validate with ~0 s of compile/trace/cache
    # events) in the act.
    if os.environ.get("PIML_STALL_TRACE"):
        import faulthandler

        faulthandler.dump_traceback_later(60, repeat=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="warm")
    ap.add_argument("--suffix", default="shared1")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--unroll", type=int, default=0,
                    help="override cfg.bptt_unroll (0 = auto policy); "
                         "--unroll 1 forces the scanned BPTT form")
    ap.add_argument("--remat", type=int, default=-1,
                    help="-1 = auto, 0/1 force remat_features off/on")
    cli = ap.parse_args()

    from piml_tpu.data import FinetuneDataset
    from piml_tpu.train import Trainer
    from piml_tpu.utils import MetricLogger
    from piml_tpu.utils.compile_attrib import CompileAttribution

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from run_gc_experiment import load_pretrained, paper_cfg

    logger = MetricLogger(stream=io.StringIO())
    with CompileAttribution() as attrib:
        cfg = paper_cfg(epochs=cli.epochs).replace(
            model_name_suffix=cli.suffix, resume=False)
        if cli.unroll:
            cfg = cfg.replace(bptt_unroll=cli.unroll)
        if cli.remat >= 0:
            cfg = cfg.replace(remat_features=bool(cli.remat))
        t0 = time.time()
        real = FinetuneDataset()
        real.load_data(cfg.ft_data_config)
        attrib.mark("dataset_load")
        cfg = real.build_dataset(cfg)
        attrib.mark("dataset_build_dispatch")
        import jax

        jax.block_until_ready(
            [jax.tree_util.tree_leaves(x)
             for x in (real.train_data, real.valid_data, real.test_data)])
        data_s = time.time() - t0
        attrib.mark("dataset_build_execute")
        trainer = Trainer(cfg, logger)
        pretrained = load_pretrained(cfg, trainer)
        attrib.mark("load_pretrained")
        trainer.finetune(None, real.valid_data, None, pretrained=pretrained,
                         train_scenes=real.train_data)
    out = attrib.summary()
    out["dataset_build_s"] = round(data_s, 3)
    out["epochs"] = cli.epochs
    out["bptt_unroll"] = cli.unroll
    out["remat"] = cli.remat
    out["cache_dir"] = os.environ.get("PIML_COMPILE_CACHE", "(default)")
    print(json.dumps(out, indent=2))
    path = os.path.join(ROOT, f"compile_attrib_{cli.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
