#!/usr/bin/env python
"""Batch session runner (scripts/run_stereo_jackal_batch_inference.bash +
run_stereo_jackal_train_data_gen.bash roles).

Runs run_stereo.py over a list of sessions in one of the reference's
canonical configurations and lays out results for evaluate_batch.py:

  inference:  vanilla tracking (+ optional introspection model)
  datagen:    training-data generation (heatmaps + keypoints datasets)

  python examples/run_batch.py --mode inference \
      --sessions_root /data/jackal --sessions 00019 00020 \
      --settings settings/jackal_stereo.yaml --out results/IV_SLAM \
      --introspection_model ckpt/best
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["inference", "datagen"], required=True)
    p.add_argument("--sessions_root", required=True)
    p.add_argument("--sessions", nargs="+", required=True)
    p.add_argument("--settings", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--dataset", default="jackal")
    p.add_argument("--introspection_model", default="")
    p.add_argument("--gt_root", default="")
    args = p.parse_args()

    for sess in args.sessions:
        out_dir = os.path.join(args.out, sess)
        cmd = [
            sys.executable, os.path.join(REPO, "examples", "run_stereo.py"),
            "--dataset", args.dataset,
            "--data_path", os.path.join(args.sessions_root, sess),
            "--settings_path", args.settings,
            "--out_visualization_path", out_dir,
        ]
        if args.gt_root:
            cmd += ["--ground_truth_path",
                    os.path.join(args.gt_root, sess + ".txt")]
        if args.mode == "datagen":
            cmd += [
                "--ivslam_enabled", "--create_ivslam_dataset",
                "--gt_pose_available",
                "--out_dataset_path",
                os.path.join(out_dir, "generated_training_data"),
            ]
        elif args.introspection_model:
            cmd += [
                "--ivslam_enabled", "--inference_mode",
                "--introspection_func_enabled",
                "--introspection_model_path", args.introspection_model,
            ]
        print(">>", " ".join(cmd))
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            print(f"session {sess} FAILED (rc={rc})")
    print("batch complete; evaluate with examples/evaluate_batch.py")


if __name__ == "__main__":
    main()
