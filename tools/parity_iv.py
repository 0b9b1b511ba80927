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
sys.path.insert(0, os.path.join(REPO, "tests"))


def generate(work: str):
    """Sequences + GT poses in the KITTI 12-number format
    LoadImagesWithGT parses (stereo_kitti.cc:755-770).

    seqA/seqB come from parity_reference (the ATE-parity fixtures).
    seqC adds camera-height oscillation: the ATE fixtures translate
    EXACTLY parallel to the image plane (camera-frame t.z == 0), which
    puts the epipole at infinity and makes the reference's normalized
    epipolar error NaN on every pair (feature_evaluator.cpp
    CalculateEpipolarErrorVec) — a degenerate case of the synthetic
    world, not of either system. The IV comparison runs on seqC."""
    import cv2

    import parity_reference as pr
    import synth_world

    pr.generate(work)
    pr.train_vocab(work)
    seqc = os.path.join(work, "seqC")
    if not os.path.exists(os.path.join(seqc, "gt_twc.npy")):
        os.makedirs(seqc + "/image_0", exist_ok=True)
        os.makedirs(seqc + "/image_1", exist_ok=True)
        rng = np.random.default_rng(7)
        world = synth_world.PlaneWorld(rng)
        n = 100
        gt = []
        for i in range(n):
            t = np.array(
                [i * 0.12, 0.02 * np.sin(i * 0.4), 0.0], np.float32
            )
            Twc = synth_world.camera_pose(
                t, height=10.0 + 0.15 * np.sin(i * 0.5),
                yaw=0.02 * np.sin(i * 0.3),
            )
            L, R = world.render_stereo(Twc)
            cv2.imwrite(f"{seqc}/image_0/{i:06d}.png", L)
            cv2.imwrite(f"{seqc}/image_1/{i:06d}.png", R)
            gt.append(Twc)
        np.savetxt(f"{seqc}/times.txt", [i * 0.1 for i in range(n)],
                   fmt="%.6f")
        np.save(f"{seqc}/gt_twc.npy", np.stack(gt))
    for name in ("seqA", "seqB", "seqC"):
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
    return _find_dataset(out, "reference")


def run_ours(work: str, seq: str) -> str:
    out = os.path.join(work, f"our_iv_{seq}")
    code = (
        "import jax, runpy, sys;"
        "jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache');"
        # mirror the oracle build's relaxed good-for-training gate
        # (kMinBadMatchPercent_ = -1): heatmaps on every tracked frame
        "import iv_slam_tpu.introspection.feature_evaluator as fe;"
        "fe.MIN_BAD_PERCENT = -1.0;"
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
    return _find_dataset(out, "ours")


def _find_dataset(out: str, who: str) -> str:
    """The dataset root is wherever bad_region_heatmap/ lives (the
    reference writes straight under --out_dataset_path; ours nests a
    generated_training_data session dir)."""
    for root, dirs, _files in os.walk(out):
        if "bad_region_heatmap" in dirs:
            return root
    raise SystemExit(f"{who} produced no dataset under {out}")


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
    # frame-level intensity agreement: mean heat per image, both sides
    if common:
        ma, mb = [], []
        for name in common:
            a = iio.imread(os.path.join(rdir, name)).astype(np.float64)
            b = iio.imread(os.path.join(odir, name)).astype(np.float64)
            ma.append(float(a.mean()))
            mb.append(float(b.mean()))
        ma, mb = np.asarray(ma), np.asarray(mb)
        res["heatmap_mean_ref"] = round(float(ma.mean()), 2)
        res["heatmap_mean_ours"] = round(float(mb.mean()), 2)
        if ma.std() > 1e-9 and mb.std() > 1e-9:
            res["frame_mean_corr"] = round(float(np.corrcoef(ma, mb)[0, 1]),
                                           3)

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
        if not isinstance(kp, dict):
            # the reference writes "null" unless enforce_supervised_
            # feature_eval filled the keypoints object
            continue
        err = np.asarray(kp.get("epipolar_err", []), np.float64)
        res[f"kp_count_{tag}"] = int(len(err))
        if len(err):
            res[f"kp_err_q50_{tag}"] = round(float(np.median(err)), 4)
            res[f"kp_err_q90_{tag}"] = round(
                float(np.percentile(err, 90)), 4)
    res.update(compare_pairs(ref_ds, our_ds))
    return res


def _per_image_keypoints(ds: str):
    """{img_name: (x, y, err)} from keypoints.json + img_names.json.
    Keypoint groups are matched to images by append order; the reference
    appends img_name twice per frame (SaveKeypoints + SaveDescriptors,
    dataset_creator.cpp) so the name list is deduped positionally."""
    with open(os.path.join(ds, "keypoints.json")) as f:
        kp = json.load(f)
    with open(os.path.join(ds, "img_names.json")) as f:
        names = json.load(f)
    if not isinstance(kp, dict) or not isinstance(names, dict):
        return {}
    x = np.asarray(kp.get("x_coord", []), np.float64)
    y = np.asarray(kp.get("y_coord", []), np.float64)
    err = np.asarray(kp.get("epipolar_err", []), np.float64)
    groups = names.get("corresponding_keypt_id", [])
    imgs = names.get("img_name", [])
    # positional dedup: n names per group entry (1 or 2)
    if groups and len(imgs) >= 2 * len(groups):
        imgs = imgs[:: len(imgs) // len(groups)]
    out = {}
    for name, grp in zip(imgs, groups):
        ids = np.asarray(grp.get("keypt_id", []), np.int64)
        ids = ids[(ids >= 0) & (ids < len(err))]
        if len(ids):
            out[os.path.basename(name)] = (x[ids], y[ids], err[ids])
    return out


def compare_pairs(ref_ds: str, our_ds: str, radius: float = 2.0) -> dict:
    """Matched-KEYPOINT-PAIR comparison (VERDICT r3 #6 / r4 #2): for
    every image both systems scored, pair keypoints detected at the same
    pixel (nearest neighbour within `radius` px, mutual) and correlate
    the per-pair normalized epipolar errors
    (feature_evaluator.cpp:1341-1512 vs introspection/feature_evaluator
    .py). Distribution-level agreement can mask per-point disagreement;
    this is the per-point check."""
    try:
        ref = _per_image_keypoints(ref_ds)
        ours = _per_image_keypoints(our_ds)
    except (OSError, json.JSONDecodeError):
        return {}
    ra, oa = [], []
    n_imgs = 0
    for name in sorted(set(ref) & set(ours)):
        rx, ry, re = ref[name]
        ox, oy, oe = ours[name]
        ok_r = np.isfinite(re)
        ok_o = np.isfinite(oe)
        rx, ry, re = rx[ok_r], ry[ok_r], re[ok_r]
        ox, oy, oe = ox[ok_o], oy[ok_o], oe[ok_o]
        if not (len(re) and len(oe)):
            continue
        d2 = (rx[:, None] - ox[None, :]) ** 2 + \
             (ry[:, None] - oy[None, :]) ** 2
        fwd = np.argmin(d2, axis=1)
        bwd = np.argmin(d2, axis=0)
        mutual = bwd[fwd] == np.arange(len(rx))
        close = d2[np.arange(len(rx)), fwd] <= radius * radius
        sel = mutual & close
        if sel.any():
            n_imgs += 1
            ra.extend(re[sel])
            oa.extend(oe[fwd[sel]])
    if len(ra) < 10:
        return {"pair_count": len(ra)}
    ra = np.asarray(ra)
    oa = np.asarray(oa)
    out = {"pair_count": int(len(ra)), "pair_images": n_imgs}
    out["pair_pearson"] = round(float(np.corrcoef(ra, oa)[0, 1]), 3)
    # log-space + rank correlations: epipolar errors span decades, so
    # plain Pearson is dominated by the tail
    lr = np.log10(np.maximum(ra, 1e-6))
    lo = np.log10(np.maximum(oa, 1e-6))
    out["pair_log_pearson"] = round(float(np.corrcoef(lr, lo)[0, 1]), 3)
    rr = np.argsort(np.argsort(ra)).astype(np.float64)
    ro = np.argsort(np.argsort(oa)).astype(np.float64)
    out["pair_spearman"] = round(float(np.corrcoef(rr, ro)[0, 1]), 3)
    out["pair_med_abs_rel_diff"] = round(float(np.median(
        np.abs(ra - oa) / np.maximum(np.maximum(ra, oa), 1e-9))), 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/parity_iv")
    ap.add_argument("--reference_bin", required=True)
    ap.add_argument("--seq", default="seqC")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--skip_ref", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)
    generate(args.work)
    ref_ds = (run_reference(args.work, args.seq, args.reference_bin)
              if not args.skip_ref
              else _find_dataset(
                  os.path.join(args.work, f"ref_iv_{args.seq}"), "reference"))
    our_ds = (run_ours(args.work, args.seq) if not args.skip_ours
              else _find_dataset(
                  os.path.join(args.work, f"our_iv_{args.seq}"), "ours"))
    print(json.dumps(compare(ref_ds, our_ds), indent=1))


if __name__ == "__main__":
    main()
