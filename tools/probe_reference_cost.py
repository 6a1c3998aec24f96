"""Probe the reference pipeline's per-stage cost on this machine (1 CPU core)
to size the shared-budget accuracy run (VERDICT r2 item 2).

Loads one synthetic pretrain scene + one real finetune scene through the
actual reference code (/root/reference/src, imported in place, nothing
copied), times RawData.load + make_dataset, and reports tensor shapes.
"""

import os
import sys
import time

sys.path.insert(0, "/root/reference/src")
os.chdir("/root/reference/src")

import torch  # noqa: E402

torch.set_num_threads(1)

import argparse  # noqa: E402

import data.data as DATA  # noqa: E402


def probe(path, tag):
    t0 = time.time()
    raw = DATA.RawData()
    raw.load_trajectory_data(path)
    t_load = time.time() - t0
    T, N = raw.position.shape[:2]
    print(f"[{tag}] {os.path.basename(path)}: T={T} N={N} "
          f"obstacles={tuple(raw.obstacles.shape)} load={t_load:.1f}s", flush=True)

    args = argparse.Namespace(
        topk_ped=6, topk_obs=10, sight_angle_ped=90, sight_angle_obs=90,
        dist_threshold_ped=4, dist_threshold_obs=4, num_history_velocity=1,
        skip_frames=25, device="cpu", collision_threshold=0.5,
        dataset_name="gc2344",
    )
    t0 = time.time()
    ds = DATA.TimeIndexedPedData()
    ds.make_dataset(args, raw)
    t_make = time.time() - t0
    print(f"[{tag}] make_dataset={t_make:.1f}s ped_features="
          f"{tuple(ds.ped_features.shape)} obs={tuple(ds.obs_features.shape)} "
          f"self={tuple(ds.self_features.shape)}", flush=True)

    t0 = time.time()
    pw = ds.to_pointwise_data()
    print(f"[{tag}] to_pointwise={time.time()-t0:.1f}s rows="
          f"{tuple(pw.ped_features.shape)}", flush=True)
    return T, N, t_load, t_make


if __name__ == "__main__":
    probe("../data/synthetic_data/GC_Dataset_ped1-12685_time2104-2164_"
          "interp9_xrange5-25_yrange15-35_simulation.npy", "pretrain")
    probe("../data/GC_dataset/GC_Dataset_ped1-12685_time2344-2404_"
          "interp9_xrange5-25_yrange15-35.npy", "real")
