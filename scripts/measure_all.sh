#!/usr/bin/env bash
# One relay window -> all on-device artifacts. The axon relay comes and goes;
# when it answers, this captures (in dependency order, cheapest first):
#   1. compiled-kernel parity (scripts/tpu_parity.py — hard gate)
#   2. per-frame ablation at the two serving buckets (benchmarks/ablate.py)
#   3. kernel microbenchmark variants (benchmarks/kernel_micro.py)
#   4. the headline bench (bench.py)
# Outputs land in measurements/<UTC stamp>/ as separate logs.
set -u
cd "$(dirname "$0")/.."
stamp=$(date -u +%Y%m%dT%H%M%S)
out="measurements/$stamp"
mkdir -p "$out"
echo "writing to $out"

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "${MEASURE_TIMEOUT:-1200}" "$@" 2>&1 | tee "$out/$name.log"
  # tee's status would mask the command's — report the pipeline head.
  echo "exit=${PIPESTATUS[0]} (see $out/$name.log)"
}

run parity      python scripts/tpu_parity.py --steps 6
run ablate_512  python benchmarks/ablate.py --capacity 512
run ablate_1024 python benchmarks/ablate.py --capacity 1024
run micro_512   python benchmarks/kernel_micro.py --capacity 512
run micro_1024  python benchmarks/kernel_micro.py --capacity 1024
run bench       python bench.py
# A/B: the whole-segment kernel (opt-in, routes through the production
# make_segment_fn dispatch — bench.py exercises it; ablate.py builds its
# own stubbed segment and would not).
run bench_seg env POCKET_TTS_FUSED_SEGMENT=1 python bench.py
run bench_seg_tri env POCKET_TTS_FUSED_SEGMENT=1 POCKET_TTS_FUSED_SEGMENT_BLOCK=tri python bench.py
run seg_micro python benchmarks/segment_micro.py --capacity 512
echo "done: $out"
