#!/usr/bin/env bash
# Round-5 device campaign, in priority order (VERDICT r4 next 2/3/4/7).
# Each stage is independently resumable; artifacts land in the repo root.
# Usage: bash tools/device_campaign_r5.sh [stage...]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=device_campaign_r5.log
stamp() { date "+%H:%M:%S"; }
run() {
    echo "== [$(stamp)] $*" | tee -a "$LOG"
    timeout "${STAGE_TIMEOUT:-3600}" "$@" 2>&1 | tee -a "$LOG"
    echo "== [$(stamp)] rc=$? : $*" | tee -a "$LOG"
}

stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(probe verify lanecarry mesh tune golden bench)

for st in "${stages[@]}"; do
  case "$st" in
    probe)      # bounded tunnel probe (it hangs indefinitely when down)
        run python -c "from prmers_tpu import jaxconf; import jax; print(jax.devices())" || exit 2 ;;
    verify)     # kernel-change drive: n=2^17 chains, both carry pipelines
        run python tools/test_pallas_step.py 17 ;;
    lanecarry)  # C=8192 lane-tiled carry ON DEVICE: short chain at 600M
                # class + rate vs the r4 xla-carry hybrid (PRMERS_XLA_CARRY=1)
        run python tools/lanecarry_device_check.py ;;
    mesh)       # VERDICT next #4: mesh vs single-chip at 2^19/2^21/2^23
        run python tools/mesh_engine_device_check.py 19 256
        run python tools/mesh_engine_device_check.py 21 128
        run python tools/mesh_engine_device_check.py 23 64 ;;
    tune)       # persist rates (now incl. MeshPallasEngine per size)
        run python -m prmers_tpu -tune ;;
    golden)     # DEVICE_r05: the full 10-row ladder incl. the MM31 P-1
                # golden (stage 2 rides the lane-tiled carry now)
        STAGE_TIMEOUT=5400 run python tools/device_golden.py full r05 ;;
    bench)
        run python bench.py ;;
    *) echo "unknown stage $st"; exit 1 ;;
  esac
done
