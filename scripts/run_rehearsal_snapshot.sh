#!/bin/bash
# Run the corpus-scale rehearsal from an rsync snapshot of the repo so that
# development edits in /root/repo cannot be imported mid-run by a later
# pipeline stage (each stage is a fresh subprocess interpreter).
# Usage: bash scripts/run_rehearsal_snapshot.sh [extra rehearsal args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SNAP=/tmp/rehearsal_snapshot
OUT="$REPO/artifacts/rehearsal_v2_r4.json"

rm -rf "$SNAP"
mkdir -p "$SNAP"
# tracked files only (the committed state is what the artifact should attest)
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
echo "snapshot: $(git -C "$REPO" rev-parse --short HEAD) -> $SNAP"

cd "$SNAP"
python scripts/rehearsal_v2.py --out "$OUT" "$@"
echo "artifact: $OUT"
