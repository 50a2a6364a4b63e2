#!/bin/sh
# Canonical CGC-Net training configuration (reference parallel_train.sh:2-3):
# fold 1, fuse sampling at ratio 0.5, <=8 neighbours, 18-dim 'ca' features,
# assign ratio 0.10, batch 4, norm_adj, SAGE, lr 1e-3, StepLR(10, 0.1),
# dropout 0.2, jumping knowledge. All of these are the framework defaults —
# only the data root is required.
#
# Usage: sh scripts/train_canonical.sh /path/to/data [extra overrides...]
# compute_dtype: bf16 halves the step time (9.6 vs 13.1 ms on v5e) and the
# f32-protected norms/softmax/BN-stats keep convergence at f32 level
# (on-chip check, BASELINE.md); pass model.compute_dtype=float32 for exact
# reference numerics.
set -e
ROOT=${1:?usage: train_canonical.sh <data-root> [overrides...]}
shift
exec python -m cgcnet_tpu.cli.train \
    "data.root=$ROOT" \
    data.cross_val=1 \
    model.compute_dtype=bfloat16 \
    "$@"
