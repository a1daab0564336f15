#!/usr/bin/env bash
# Cross-validate this checker against the reference binary, bit for bit.
# Requires the reference sources (default /root/reference) and python with
# the fast_artistic_videos_tpu package importable (for test-data generation).
set -euo pipefail
REF=${1:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

make -C "$HERE" >/dev/null
g++ -O2 -w -o "$WORK/ref_checker" \
    "$REF/consistencyChecker/consistencyChecker.cpp" \
    "$REF/consistencyChecker/NMath.cpp" -I"$REF/consistencyChecker"

python - "$WORK" <<'EOF'
import os, sys
import numpy as np
sys.path.insert(0, os.environ.get("FAV_REPO", os.getcwd()))
from fast_artistic_videos_tpu.core import io
work = sys.argv[1]
rng = np.random.default_rng(0)
def smooth(a, it=12):
    for _ in range(it):
        a = 0.25*(np.roll(a,1,0)+np.roll(a,-1,0)+np.roll(a,1,1)+np.roll(a,-1,1))
    return a
H, W = 96, 128
f1 = np.stack([smooth(rng.normal(size=(H,W)))*8, smooth(rng.normal(size=(H,W)))*8], -1).astype(np.float32)
f1[:, 60:, 0] += 6.0
f2 = (-f1 + rng.normal(size=f1.shape)*0.05).astype(np.float32)
img = (smooth(rng.normal(size=(H,W)))[...,None]*0.3+0.5).clip(0,1).repeat(3,2).astype(np.float32)
io.write_flo(f"{work}/f1.flo", f1); io.write_flo(f"{work}/f2.flo", f2)
io.save_image(f"{work}/frame.ppm", img)
EOF

for args in "" "$WORK/frame.ppm"; do
  "$WORK/ref_checker" "$WORK/f1.flo" "$WORK/f2.flo" "$WORK/ref.pgm" $args >/dev/null
  "$HERE/consistency_checker" "$WORK/f1.flo" "$WORK/f2.flo" "$WORK/ours.pgm" $args
  if cmp -s "$WORK/ref.pgm" "$WORK/ours.pgm"; then
    echo "PARITY OK (${args:-no structure image}): outputs identical"
  else
    echo "PARITY FAIL (${args:-no structure image})"; exit 1
  fi
done
