#!/usr/bin/env bash
# Example end-to-end run (parity: reference scripts/run.sh).
set -euo pipefail
PROJ=${1:?usage: run.sh PROJECT_DIR [PIPELINE]}
PIPE=${2:-superpoint+lightglue}
python -m deep_image_matching_tpu --dir "$PROJ" --pipeline "$PIPE" \
    --strategy matching_lowres --force
