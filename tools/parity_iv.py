"""IV-pipeline parity vs the reference oracle (VERDICT r2 item #4).

Round 2 proved trajectory parity against the in-container reference build
in VANILLA mode only; the IV half — per-feature scoring -> GP heatmaps ->
dataset files (feature_evaluator.cpp:2512-2752,647-698,
dataset_creator.cpp:39-57) — had never been compared. This tool runs BOTH
systems in training-data-generation mode on the identical synthetic
sequence with exact GT poses and compares the generated datasets:

  * bad_region_heatmap/*.png — per-image Pearson correlation + mean
    absolute intensity difference (the heatmaps are GP posteriors over
    per-feature quality scores; tracking state diverges between
    implementations, so agreement is statistical, not bitwise)
  * bad_region_heatmap_mask coverage agreement (IoU)
  * keypoints.json score distributions (count, epipolar-error quantiles)

Usage:
  /opt/venv/bin/python tools/parity_iv.py --work /tmp/parity_iv \
      --reference_bin /tmp/refbuild/stereo_kitti
Results land in PARITY_ATE.md §introspection.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def generate(work: str):
    """seqA from parity_reference + GT poses in the KITTI 12-number
    format LoadImagesWithGT parses (stereo_kitti.cc:755-770)."""
    import parity_reference as pr

    pr.generate(work)
    pr.train_vocab(work)
    for name, _seed, _n in pr.SEQUENCES:
        gt = np.load(os.path.join(work, name, "gt_twc.npy"))
        rows = gt[:, :3, :].reshape(len(gt), 12)
        np.savetxt(os.path.join(work, name, "gt_kitti.txt"), rows,
                   fmt="%.9f")


def run_reference(work: str, seq: str, ref_bin: str) -> str:
    out = os.path.join(work, f"ref_iv_{seq}")
    os.makedirs(out, exist_ok=True)
    subprocess.run(
        [ref_bin,
         f"--vocab_path={work}/voc.txt",
         f"--settings_path={work}/settings.yaml",
         f"--data_path={work}/{seq}",
         f"--ground_truth_path={work}/{seq}/gt_kitti.txt",
         f"--out_visualization_path={out}",
         f"--out_dataset_path={out}/ds",
         "--ivslam_enabled=true", "--create_ivslam_dataset=true",
         "--gt_pose_available=true",
         "--enable_viewer=false", "--run_single_threaded=true"],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # the reference nests the session dir; find generated_training_data
    for root, dirs, _files in os.walk(out):
        if "generated_training_data" in dirs:
            return os.path.join(root, "generated_training_data")
    raise SystemExit(f"reference produced no dataset under {out}")


def run_ours(work: str, seq: str) -> str:
    out = os.path.join(work, f"our_iv_{seq}")
    code = (
        "import jax, runpy, sys;"
        "jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache');"
        f"sys.argv = ['run_stereo.py', '--dataset', 'kitti',"
        f" '--data_path', '{work}/{seq}',"
        f" '--ground_truth_path', '{work}/{seq}/gt_kitti.txt',"
        f" '--settings_path', '{work}/settings.yaml',"
        f" '--out_visualization_path', '{out}',"
        f" '--out_dataset_path', '{out}/ds',"
        f" '--vocab_path', '{work}/voc.npz',"
        " '--ivslam_enabled', '--create_ivslam_dataset',"
        " '--gt_pose_available'];"
        f"runpy.run_path('{REPO}/examples/run_stereo.py',"
        " run_name='__main__')"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   stderr=subprocess.DEVNULL)
    for root, dirs, _files in os.walk(out):
        if "generated_training_data" in dirs:
            return os.path.join(root, "generated_training_data")
    raise SystemExit(f"ours produced no dataset under {out}")


def compare(ref_ds: str, our_ds: str) -> dict:
    import imageio.v3 as iio

    res = {}
    # --- heatmaps: correlation + mean abs diff over common images ----
    rdir = os.path.join(ref_ds, "bad_region_heatmap")
    odir = os.path.join(our_ds, "bad_region_heatmap")
    common = sorted(
        set(os.listdir(rdir)) & set(os.listdir(odir))
    ) if os.path.isdir(rdir) and os.path.isdir(odir) else []
    corrs, mads = [], []
    for name in common:
        a = iio.imread(os.path.join(rdir, name)).astype(np.float64)
        b = iio.imread(os.path.join(odir, name)).astype(np.float64)
        if a.ndim == 3:
            a = a.mean(-1)
        if b.ndim == 3:
            b = b.mean(-1)
        if a.shape != b.shape:
            continue
        mads.append(float(np.abs(a - b).mean()))
        sa, sb = a.std(), b.std()
        if sa > 1e-6 and sb > 1e-6:
            corrs.append(float(((a - a.mean()) * (b - b.mean())).mean()
                               / (sa * sb)))
    res["heatmaps_ref"] = len(os.listdir(rdir)) if os.path.isdir(rdir) else 0
    res["heatmaps_ours"] = len(os.listdir(odir)) if os.path.isdir(odir) else 0
    res["heatmaps_common"] = len(common)
    if corrs:
        res["heatmap_corr_median"] = round(float(np.median(corrs)), 3)
        res["heatmap_corr_mean"] = round(float(np.mean(corrs)), 3)
        res["heatmap_mad_median"] = round(float(np.median(mads)), 2)

    # --- masks: IoU ---------------------------------------------------
    rm = os.path.join(ref_ds, "bad_region_heatmap_mask")
    om = os.path.join(our_ds, "bad_region_heatmap_mask")
    ious = []
    if os.path.isdir(rm) and os.path.isdir(om):
        for name in sorted(set(os.listdir(rm)) & set(os.listdir(om))):
            a = iio.imread(os.path.join(rm, name)) > 127
            b = iio.imread(os.path.join(om, name)) > 127
            if a.shape != b.shape:
                continue
            u = (a | b).sum()
            if u:
                ious.append(float((a & b).sum() / u))
    if ious:
        res["mask_iou_median"] = round(float(np.median(ious)), 3)

    # --- keypoints.json score distributions ---------------------------
    for tag, ds in (("ref", ref_ds), ("ours", our_ds)):
        kp_path = os.path.join(ds, "keypoints.json")
        if not os.path.exists(kp_path):
            continue
        with open(kp_path) as f:
            kp = json.load(f)
        err = np.asarray(kp.get("epipolar_err", []), np.float64)
        res[f"kp_count_{tag}"] = int(len(err))
        if len(err):
            res[f"kp_err_q50_{tag}"] = round(float(np.median(err)), 4)
            res[f"kp_err_q90_{tag}"] = round(
                float(np.percentile(err, 90)), 4)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/parity_iv")
    ap.add_argument("--reference_bin", required=True)
    ap.add_argument("--seq", default="seqA")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--skip_ref", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)
    generate(args.work)
    ref_ds = (run_reference(args.work, args.seq, args.reference_bin)
              if not args.skip_ref
              else os.path.join(args.work, f"ref_iv_{args.seq}"))
    our_ds = (run_ours(args.work, args.seq) if not args.skip_ours
              else os.path.join(args.work, f"our_iv_{args.seq}"))
    print(json.dumps(compare(ref_ds, our_ds), indent=1))


if __name__ == "__main__":
    main()
