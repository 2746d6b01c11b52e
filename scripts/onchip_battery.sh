#!/bin/bash
# One-command on-chip measurement battery for a (possibly short) tunnel
# window. Runs everything SEQUENTIALLY — one TPU process at a time (a
# second TPU-attached process hard-wedges the first; see
# memory/axon-tpu-quirks.md). Artifacts land in bench_runs/ with timestamps.
#
#   bash scripts/onchip_battery.sh [outdir]
#
# Outer timeouts sit WELL above the worst measured throttled draw chain
# (round-2 init alone hit 1100 s); bench.py's internal stall watchdog is
# the real guard — an outer kill mid-draw would lose the JSON entirely.
# Order is by value-per-minute: the headline bench first (the deliverable),
# then the warm-start A/B, then the 4K row, then the bf16-c1 A/B.
set -u
cd "$(dirname "$0")/.."
out="${1:-bench_runs}"
mkdir -p "$out"
stamp() { date +%Y-%m-%dT%H%M; }

echo "[battery] 1/6 headline 2K bench (median of 3 draws)"
timeout 7200 python bench.py > "$out/battery_bench2k_$(stamp).json" 2> "$out/battery_bench2k_$(stamp).log"
echo "[battery] bench exit: $?"

echo "[battery] 2/6 warm-start A/B (2 interleaved pairs)"
timeout 3600 python scripts/exp_warm.py --pairs 2 \
    > "$out/battery_warmAB_$(stamp).jsonl" 2>&1
echo "[battery] exp_warm exit: $?"

echo "[battery] 3/6 4K atlas draw (BASELINE.md pending row; ref=65,028 tex/s)"
timeout 7200 env BENCH_ATLAS=4096 BENCH_DRAWS=3 python bench.py \
    > "$out/battery_bench4k_$(stamp).json" 2> "$out/battery_bench4k_$(stamp).log"
echo "[battery] 4K exit: $?"

echo "[battery] 4/6 bf16 c1-band A/B (1 interleaved pair)"
timeout 3600 python scripts/exp_warm.py --pairs 1 --toggle mg_c1_bf16 \
    > "$out/battery_c1bf16_$(stamp).jsonl" 2>&1
echo "[battery] c1bf16 exit: $?"

echo "[battery] 5/6 tunnel transfer parallelism probe (~2 min)"
timeout 900 python scripts/exp_fetch.py \
    > "$out/battery_fetch_$(stamp).jsonl" 2>&1
echo "[battery] fetch exit: $?"

echo "[battery] 6/6 Spectrum bench (demo mesh, k=20, TPU Lanczos vs scipy/ARPACK)"
timeout 3600 python scripts/bench_spectrum.py --reps 2 \
    > "$out/battery_spectrum_$(stamp).jsonl" 2>&1
echo "[battery] spectrum exit: $?"

echo "[battery] done; artifacts in $out/"
