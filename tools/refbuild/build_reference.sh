#!/bin/bash
# Build the reference's CPU-only host tools out-of-tree for
# cross-validation (tests/test_reference_parity.py).
#
# The reference tree is read-only; objects and binaries go to BUILD_DIR
# (default /tmp/ref_build).  Only the fst-free subset is buildable in
# this environment (no OpenFst source, zero egress): featbin/* and
# decoderbin/compute-wer, which cover the feature frontend and scoring
# cross-checks.  Math comes from the system CBLAS/LAPACK
# (libblas.so.3 carries the CBLAS interface; liblapack.so.3 the f77
# LAPACK symbols the f2c-style clapack.h declares).
#
# Usage: bash tools/refbuild/build_reference.sh [BUILD_DIR]
set -euo pipefail

export REF=${REF:-/root/reference}
export SRC="$REF/src"
OUT=${1:-/tmp/ref_build}
export OUT
JOBS=${JOBS:-$(nproc)}

export CXX=${CXX:-g++}
export CXXFLAGS="-std=c++11 -O2 -w -DHAVE_CLAPACK -DHAVE_POSIX_MEMALIGN -DKALDI_DOUBLEPRECISION=0 -I$SRC -I$REF/tools/CLAPACK -msse -msse2 -pthread"
# no -dev symlinks in this image: link the versioned sonames directly
LIBDIR=/usr/lib/x86_64-linux-gnu
LIBS="$LIBDIR/liblapack.so.3 $LIBDIR/libblas.so.3 -lm -lpthread -ldl"

mkdir -p "$OUT/obj" "$OUT/bin"

# library translation units (fst-free subset)
LIB_SRCS=(
  base/kaldi-error.cc base/kaldi-math.cc base/kaldi-utils.cc
  base/io-funcs.cc
  util/kaldi-io.cc util/kaldi-holder.cc util/kaldi-table.cc
  util/parse-options.cc util/text-utils.cc util/simple-io-funcs.cc
  util/kaldi-semaphore.cc util/kaldi-thread.cc
  cpucompute/matrix.cc cpucompute/vector.cc
  cpucompute/matrix-functions.cc cpucompute/compressed-matrix.cc
  feat/feature-fbank.cc feat/feature-mfcc.cc feat/feature-plp.cc
  feat/feature-spectrogram.cc feat/feature-functions.cc
  feat/mel-computations.cc feat/srfft.cc feat/wave-reader.cc
  feat/cmvn.cc feat/pitch-functions.cc feat/resample.cc
  feat/online-feature.cc
)

# binaries: every featbin tool + the fst-free decoderbin scorers
BIN_SRCS=(
  featbin/compute-fbank-feats.cc featbin/compute-mfcc-feats.cc
  featbin/compute-plp-feats.cc featbin/compute-cmvn-stats.cc
  featbin/apply-cmvn.cc featbin/add-deltas.cc featbin/splice-feats.cc
  featbin/subsample-feats.cc featbin/copy-feats.cc
  featbin/paste-feats.cc featbin/extract-segments.cc
  featbin/feat-to-dim.cc featbin/feat-to-len.cc
  featbin/compute-kaldi-pitch-feats.cc
  featbin/process-kaldi-pitch-feats.cc
  decoderbin/compute-wer.cc
)

compile_one() {
  local src="$1"
  local obj="$OUT/obj/$(echo "$src" | tr / _ | sed 's/\.cc$/.o/')"
  if [ ! -f "$obj" ] || [ "$SRC/$src" -nt "$obj" ]; then
    $CXX $CXXFLAGS -c "$SRC/$src" -o "$obj"
  fi
}
export -f compile_one

lib_existing=()
for s in "${LIB_SRCS[@]}"; do
  [ -f "$SRC/$s" ] && lib_existing+=("$s")
done

echo "compiling ${#lib_existing[@]} library TUs with $JOBS jobs..."
printf '%s\n' "${lib_existing[@]}" \
  | xargs -P "$JOBS" -n 1 bash -c 'compile_one "$0"'

OBJS=$(ls "$OUT"/obj/*.o)

echo "linking ${#BIN_SRCS[@]} binaries..."
for s in "${BIN_SRCS[@]}"; do
  [ -f "$SRC/$s" ] || { echo "skip (missing) $s"; continue; }
  bin="$OUT/bin/$(basename "$s" .cc)"
  if [ ! -f "$bin" ] || [ "$SRC/$s" -nt "$bin" ]; then
    $CXX $CXXFLAGS "$SRC/$s" $OBJS $LIBS -o "$bin" &
  fi
done
wait

# ---- net chain (net-output-extract etc.; CuMatrix falls back to CPU
# without HAVE_CUDA) ----
NET_SRCS=(
  gpucompute/cuda-common.cc gpucompute/cuda-device.cc
  gpucompute/cuda-math.cc gpucompute/cuda-matrix.cc
  gpucompute/cuda-rand.cc gpucompute/cuda-vector.cc
  net/layer.cc net/net.cc net/ctc-loss.cc net/ce-loss.cc
  net/class-prior.cc
)
for s in "${NET_SRCS[@]}"; do
  [ -f "$SRC/$s" ] || continue
  obj="$OUT/obj/$(echo "$s" | tr / _ | sed 's/\.cc$/.o/')"
  if [ ! -f "$obj" ] || [ "$SRC/$s" -nt "$obj" ]; then
    $CXX $CXXFLAGS -c "$SRC/$s" -o "$obj" &
  fi
done
wait

NET_BINS=(
  netbin/net-output-extract.cc netbin/net-initialize.cc
  netbin/net-copy.cc netbin/net-average.cc netbin/net-model-info.cc
  netbin/format-to-nonparallel.cc
)
for s in "${NET_BINS[@]}"; do
  [ -f "$SRC/$s" ] || continue
  bin="$OUT/bin/$(basename "$s" .cc)"
  if [ ! -f "$bin" ] || [ "$SRC/$s" -nt "$bin" ]; then
    $CXX $CXXFLAGS "$SRC/$s" $(ls "$OUT"/obj/*.o) $LIBS -o "$bin" &
  fi
done
wait

# ---- decoder chain (latgen-faster) via the mini-OpenFst shim ----
# tools/refbuild/shim provides a from-scratch subset of the OpenFst API
# (no OpenFst source exists here); -Ishim shadows fst/ + fstext-lib.h.
SHIM="$(cd "$(dirname "$0")" && pwd)/shim"
SHIMFLAGS="-I$SHIM $CXXFLAGS"

# shim headers are a build input: a newer shim than an object means the
# object may have a stale vtable layout — rebuild it (a mixed link
# segfaults)
newest_shim=$(ls -t "$SHIM"/fst/*.h "$SHIM"/fst/script/*.h "$SHIM"/fstext/*.h | head -1)

DEC_SRCS=(
  decoder/lattice-faster-decoder.cc
  decoder/decoder-wrappers.cc
  lat/kaldi-lattice.cc
  lat/determinize-lattice-pruned.cc
  lat/lattice-functions.cc
  lat/minimize-lattice.cc
  lat/push-lattice.cc
)
for s in "${DEC_SRCS[@]}"; do
  [ -f "$SRC/$s" ] || continue
  obj="$OUT/obj/$(echo "$s" | tr / _ | sed 's/\.cc$/.o/')"
  if [ ! -f "$obj" ] || [ "$SRC/$s" -nt "$obj" ] \
      || [ "$newest_shim" -nt "$obj" ]; then
    $CXX $SHIMFLAGS -c "$SRC/$s" -o "$obj" &
  fi
done
wait

bin="$OUT/bin/latgen-faster"
if [ ! -f "$bin" ] || [ "$SRC/decoderbin/latgen-faster.cc" -nt "$bin" ] \
    || [ "$newest_shim" -nt "$bin" ]; then
  $CXX $SHIMFLAGS "$SRC/decoderbin/latgen-faster.cc" \
    $(ls "$OUT"/obj/*.o) $LIBS -o "$bin"
fi

echo "OK: $(ls "$OUT/bin" | wc -l) binaries in $OUT/bin"
ls "$OUT/bin"
