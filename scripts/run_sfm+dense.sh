#!/bin/bash
# Sparse SfM then dense matching + triangulation (parity: reference
# scripts/run_sfm+dense.sh). Runs a feature-based pipeline to recover camera
# poses, a detector-free pipeline for dense correspondences, then triangulates
# the dense matches against the sparse poses.
set -e

DATA_DIR=assets
DATASET=example_cyprus

SFM_CONFIG=superpoint+lightglue
STRATEGY=bruteforce
DENSE_CONFIG=loftr

SKIP_SFM=false
DEBUG=false

INPUT_DIR=$DATA_DIR/$DATASET
if [ "$DEBUG" = true ]; then
    db_key="-V"
fi

# 1. sparse SfM for camera poses
if [ "$SKIP_SFM" = false ]; then
    python -m deep_image_matching_tpu --dir "$INPUT_DIR" \
        --pipeline $SFM_CONFIG --strategy $STRATEGY \
        --quality high --tiling preselection --force $db_key
fi

# 2. dense matching, reconstruction skipped
python -m deep_image_matching_tpu --dir "$INPUT_DIR" \
    --pipeline $DENSE_CONFIG --strategy sequential --overlap 3 \
    --quality medium --tiling preselection --skip_reconstruction --force $db_key

# 3. triangulate dense correspondences against the sparse poses
python ./scripts/dense_matching.py "$INPUT_DIR" \
    --sfm_results "$INPUT_DIR/results_${SFM_CONFIG}_${STRATEGY}_quality_high" \
    --dense_results "$INPUT_DIR/results_${DENSE_CONFIG}_sequential_quality_medium"
