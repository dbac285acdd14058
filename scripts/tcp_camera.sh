#!/bin/sh
# Live camera -> TCP H.264 source for the "av" decoder (picamera.sh-class
# demo: a Raspberry Pi or any ffmpeg host streams codec motion vectors).
#
# Consume with:
#   python -m ofps_tpu.apps.cli run-config cfg.json
# where cfg.json's decoder input is  "tcp://<this-host>:8888"
# (or run this with '?listen=1' semantics reversed: the av decoder also
# accepts "tcp://@:8888" to listen itself).
#
# Long GoP keeps I-frames rare so almost every frame carries motion vectors
# (the reference streams GoP 240 at 1080p30).

HOST=${1:-0.0.0.0}
PORT=${2:-8888}
DEV=${3:-/dev/video0}

if command -v libcamera-vid >/dev/null 2>&1; then
    # Raspberry Pi camera stack (hardware H.264 encoder).
    exec libcamera-vid -t 0 --width 1920 --height 1080 --framerate 30 \
        --intra 240 --inline --listen -o "tcp://$HOST:$PORT"
else
    # Generic V4L2 webcam via ffmpeg's software encoder.
    exec ffmpeg -f v4l2 -framerate 30 -video_size 1920x1080 -i "$DEV" \
        -c:v libx264 -preset ultrafast -tune zerolatency -g 240 -bf 0 \
        -f mpegts "tcp://$HOST:$PORT?listen=1"
fi
