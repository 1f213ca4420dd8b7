#!/usr/bin/env bash
# Chain P-1 stage 1 by B1 steps (port of the reference chainpm1.sh):
# first run writes resume_p<p>_B1_<b1>.save via -resume; every later run
# extends it with -b1old <curr> -b1 <next>. Stops on a stage-1 factor.
# Usage: tools/chainpm1.sh <exponent> <start_B1> <step> [max_B1]
set -euo pipefail

if [ $# -lt 3 ]; then
  echo "Usage: $0 <exponent> <start_B1> <step> [max_B1]" >&2
  exit 1
fi

PROG="${PRMERS_BIN:-python -m prmers_tpu}"
p="$1"; curr="$2"; step="$3"; max="${4:-}"

run() {  # run <b1> [extra args...]
  local b1="$1"; shift
  local log="pm1_p${p}_B1_${b1}.log"
  echo "[INFO] ${PROG} ${p} -pm1 -b1 ${b1} -resume $*"
  set +e
  ${PROG} "${p}" -pm1 -b1 "${b1}" -resume "$@" | tee "${log}"
  set -e
  if grep -q "factor stage 1 found" "${log}"; then
    factor=$(sed -n 's/.*factor stage 1 found: \([0-9][0-9]*\).*/\1/p' \
             "${log}" | head -n1)
    echo "[FOUND] Factor ${factor} at B1=${b1}"
    exit 0
  fi
}

run "${curr}"
while :; do
  next=$(( curr + step ))
  if [ -n "${max}" ] && [ "${next}" -gt "${max}" ]; then
    echo "[STOP] Reached max_B1=${max}. No factor found."
    exit 1
  fi
  run "${next}" -b1old "${curr}"
  curr="${next}"
done
