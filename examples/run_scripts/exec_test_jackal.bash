#!/bin/bash
# Evaluate a trained FCN on held-out Jackal sessions (the reference's
# testing/run_scripts/exec_test_modular_jackal.bash analogue).
cd "$(dirname "$0")/../.." || exit 1
python examples/eval_introspection.py --mode eval \
  --ckpt checkpoints/jackal_mobilenetv2_c1deepsup \
  --data_root "${IVSLAM_DATA_ROOT:?set IVSLAM_DATA_ROOT}" \
  --raw_img_root "${IVSLAM_RAW_ROOT:?set IVSLAM_RAW_ROOT}" \
  --sessions 3 --out_dir fcn_eval "$@"
