#!/usr/bin/env bash
# Round-5 serialized TPU run queue (one client at a time — CLAUDE.md).
#
# Order is highest-verdict-value first so a tunnel incident costs the
# least: (1) e2e numbers for the round-4 input-path features (verdict
# item #3), (2) MT operating-point probes (item #2b), (3) the labeled=32
# midpoint sweep + GCT/CCT tuned runs (item #4).
#
# Usage: bash tools/round5_queue.sh [phase...]   (default: all phases)
set -u
cd "$(dirname "$0")/.."
ROOT=${ROOT:-/tmp/gain_scenes}
LOG=${LOG:-/tmp/round5}
mkdir -p "$LOG"

guard() { python tools/tunnel_guard.py || exit 1; }

gain() { # gain <labeled> <algo> [extra args...]
  local labeled=$1 algo=$2; shift 2
  local tag="" prev=""
  for a in "$@"; do
    [ "$prev" = "--tag" ] && tag=$a
    prev=$a
  done
  echo "=== $(date +%H:%M:%S) l$labeled $algo $* ==="
  timeout 2400 python tools/ssl_gain_bench.py run "$algo" \
    --root "$ROOT" --labeled "$labeled" --backbone resnet10 \
    --lr 0.005 --im 128 \
    "$@" > "$LOG/${algo}${tag:+_$tag}_l${labeled}.log" 2>&1
  local rc=$?
  echo "=== rc=$rc ==="
  if [ $rc -ne 0 ]; then
    tail -5 "$LOG/${algo}${tag:+_$tag}_l${labeled}.log"
    guard
  fi
}

phase_e2e() {
  # verdict item #3: the two round-4 input-path features, measured.
  # uint8 labels are automatic inside --u8 since 5260b6c; --eager adds
  # loader-thread materialization of the lazy device_put.
  make -C pixelssl_tpu/native >/dev/null || exit 1
  guard
  for eager in 0 1; do
    echo "=== $(date +%H:%M:%S) e2e u8 eager=$eager ==="
    timeout 3000 python tools/e2e_tpu_bench.py --u8 1 --eager $eager \
      > "$LOG/e2e_u8_eager${eager}.log" 2>&1
    rc=$?
    echo "=== rc=$rc ==="
    tail -2 "$LOG/e2e_u8_eager${eager}.log"
    [ $rc -ne 0 ] && guard
  done
}

phase_mt() {
  # verdict item #2b: MT operating-point probes. Extra-gentle at l16
  # (cons_scale 0.05, rampup half the run) and the same at l32 where
  # SupOnly isn't saturated-but-not-starved.
  guard
  gain 16 ssl_mt --tag gentle --delta cons_scale=0.05 \
    --delta ema_decay=0.996 --delta gaussian_noise_std=0.05 \
    --delta cons_rampup_epochs=7
  gain 32 ssl_null
  gain 32 ssl_mt --tag gentle --delta cons_scale=0.05 \
    --delta ema_decay=0.996 --delta gaussian_noise_std=0.05 \
    --delta cons_rampup_epochs=7
}

phase_l32() {
  # verdict item #4: the labeled=32 midpoint sweep (reference-default
  # scales; ssl_null already run in phase_mt)
  guard
  gain 32 ssl_cutmix
  gain 32 ssl_adv
  gain 32 ssl_s4l
  gain 32 ssl_cct
  gain 32 ssl_gct
}

phase_tuned() {
  # verdict item #4: GCT/CCT a fair shot at l16 — lower the SSL pressure
  # for a from-scratch resnet10 whose predictions start out bad.
  guard
  gain 16 ssl_gct --tag gentle --delta dc_ssl_scale=10.0 \
    --delta dc_threshold=0.4 --delta fd_scale=1.0
  gain 16 ssl_cct --tag gentle --delta cons_scale=5.0 \
    --delta cons_rampup_epochs=7
  gain 32 ssl_gct --tag gentle --delta dc_ssl_scale=10.0 \
    --delta dc_threshold=0.4 --delta fd_scale=1.0
  gain 32 ssl_cct --tag gentle --delta cons_scale=5.0 \
    --delta cons_rampup_epochs=7
}

phases=${*:-e2e mt l32 tuned}
for ph in $phases; do
  "phase_$ph"
done
echo "=== queue done $(date +%H:%M:%S) ==="
python tools/ssl_gain_bench.py report
