#!/bin/sh
# Decode a .dsv to Y4M and package as mp4 via ffmpeg (interop convenience,
# mirrors the reference's dsv2mp4.sh). usage: dsv2mp4.sh video.dsv out.mp4
set -e
SRC="$1"
OUT="${2:-out.mp4}"
python -m dsv2_tpu d -y -inp="$SRC" -out=- -y4m=1 | \
    ffmpeg -loglevel quiet -nostats -hide_banner -y -i - -c:v libx264 \
        -qp 0 -preset fast "$OUT"
