#!/bin/sh
# Build the reference DSV2 codec (test oracle only — NOT part of this framework).
# Produces:
#   build/ref/dsv2        - reference CLI binary
#   build/ref/libref.so   - reference compiled as a shared library for ctypes
#   build/ref/d28dec      - single-header conformance decoder driver
set -e
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference
OUT="$ROOT/build/ref"
mkdir -p "$OUT"
if [ ! -x "$OUT/dsv2" ] || [ "$REF/src/dsv.h" -nt "$OUT/dsv2" ]; then
    cc -O2 -o "$OUT/dsv2" "$REF"/src/*.c
fi
if [ ! -e "$OUT/libref.so" ] || [ "$REF/src/dsv.h" -nt "$OUT/libref.so" ]; then
    cc -O2 -shared -fPIC -o "$OUT/libref.so" \
        "$REF"/src/bs.c "$REF"/src/sbt.c "$REF"/src/hzcc.c "$REF"/src/bmc.c \
        "$REF"/src/frame.c "$REF"/src/dsv.c "$REF"/src/util.c \
        "$REF"/src/dsv_encoder.c "$REF"/src/dsv_decoder.c "$REF"/src/hme.c
fi
if [ ! -x "$OUT/d28dec" ] || [ "$REF/single-header-decoder/dsv28dec.h" -nt "$OUT/d28dec" ]; then
    cc -O2 -I"$REF/single-header-decoder" -o "$OUT/d28dec" \
        "$REF/single-header-decoder/d28_dec_main.c"
fi
echo "$OUT"
