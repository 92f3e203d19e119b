#!/usr/bin/env bash
# Run AlphaPose + PoseFlow on one clip and emit the tracked-person JSON
# this framework's legacy path consumes (docs/annotations.md format 2).
# Usage: extract.sh <video> <out_dir>
set -euo pipefail
video="$1"; out="$2"
name="$(basename "${video%.*}")"
mkdir -p "$out/$name"

cd /opt/AlphaPose
# ResNet-50 256x192 config, YOLOv3 detector, FastRes-50 checkpoint —
# the same estimator settings the upstream annotations used.
python3 scripts/demo_inference.py \
    --cfg configs/coco/resnet/256x192_res50_lr1e-3_1x.yaml \
    --checkpoint pretrained_models/fast_res50_256x192.pth \
    --detector yolo \
    --video "$video" \
    --outdir "$out/$name" \
    --posebatch 20 --detbatch 1 \
    --pose_track

# PoseFlow emits alphapose-results.json with per-frame person identities;
# reshape it to {person -> frame -> keypoints} tracked-person layout
python3 - "$out/$name/alphapose-results.json" \
          "$out/${name}_alphapose_tracked_person.json" <<'PY'
import json, sys
src, dst = sys.argv[1], sys.argv[2]
tracked = {}
for det in json.load(open(src)):
    pid = str(det.get('idx', 0))
    frame = str(int(det['image_id'].split('.')[0]))
    tracked.setdefault(pid, {})[frame] = {'keypoints': det['keypoints']}
json.dump(tracked, open(dst, 'w'))
print('wrote', dst)
PY
