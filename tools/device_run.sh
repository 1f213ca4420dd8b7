#!/bin/bash
# One-shot on-device validation + bench ladder. Run when the TPU tunnel
# is healthy (first compiles of new shapes take 5-10 min each; the
# persistent cache makes repeats fast).
#
#   bash tools/device_run.sh            # full: validate, tune, bench
#   bash tools/device_run.sh quick      # just validate + headline bench
set -u
cd "$(dirname "$0")/.."
MODE="${1:-full}"

echo "== tunnel probe =="
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL DOWN — aborting"; exit 2; }

echo "== bit-exact squaring chains (n=2^17; row-carry + block-carry) =="
timeout 3000 python tools/test_pallas_step.py 17 || exit 1

echo "== PRP fast-3 chain at the smallest fused shape (n=2^15, a=3) =="
timeout 3000 python tools/test_pallas_step.py 15 3 || exit 1

if [ "$MODE" = full ]; then
  echo "== tune ladder (persists prmers_tune.json) =="
  timeout 6000 python -m prmers_tpu -tune || echo "(tune failed; continuing)"

  echo "== GL-window smoke across the ladder =="
  timeout 6000 python tools/gl_smoke.py || echo "(gl_smoke failures above)"
fi

if [ "$MODE" = full ]; then
  echo "== MM31 P-1 golden (n=5*2^25 radix-5 shape; expect 295257526626031) =="
  # the reference's exact validation form (README.md:628-636):
  # ultralowmem keeps the register footprint at 1-2 slabs of 1.34 GiB
  timeout 6000 python -m prmers_tpu 2147483647 -pm1 -b1 100 -b2 5000 \
      -pm1-ultralowmem -nogcd-stage1 2>&1 | tee /tmp/mm31.log | tail -5
  grep -q 295257526626031 /tmp/mm31.log \
    && echo "MM31 GOLDEN OK" || echo "MM31 GOLDEN MISSING (check /tmp/mm31.log)"
fi

echo "== headline bench =="
timeout 3000 python bench.py

echo "== bench fallback sanity (no-rowcarry pipeline still correct) =="
PRMERS_NO_ROWCARRY=1 PRMERS_BENCH_ITERS=64 timeout 3000 python bench.py

if [ "$MODE" = full ]; then
  echo "== A/B variant ladder at the flagship exponent =="
  timeout 9000 python tools/ab_ladder.py || echo "(ab_ladder failed)"
fi
