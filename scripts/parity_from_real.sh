#!/bin/bash
# One-command real-data parity vs BASELINE.md (VERDICT r4 item 9).
#
#   bash scripts/parity_from_real.sh ROOT [extra args]
#
# ROOT/datasets/          on-disk layouts (egc_tpu.data.ondisk)
# ROOT/checkpoints/<dataset>_<key>.pt   reference torch checkpoints
#
# CI dry run on fabricated artifacts:
#   bash scripts/parity_from_real.sh /tmp/parity_dryrun --fabricate
set -e
cd "$(dirname "$0")/.."
exec python scripts/parity_from_real.py "$@"
