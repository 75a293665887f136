#!/usr/bin/env bash
# Serialized labeled=16 SSL-gain sweep on the real chip (round 4).
#
# Why labeled=16: the committed labeled=64 sweep (tools/
# ssl_gain_results.jsonl) is an honest negative — 64 labels SATURATE
# SupOnly on the synthetic scenes (52.4 mIoU best), leaving SSL no
# headroom, and every algorithm lands 0.5-5 points BELOW the baseline.
# The reference benchmark regime is label-starved (1/16-1/8 VOC); 16
# labels of 512 reproduces that starvation so the unlabeled pool can
# matter. MT additionally collapsed to all-background at 64 labels the
# moment its rampup finished (cons_scale 1.0 too hot for from-scratch
# resnet10); the tuned variant here lowers the consistency pressure and
# slows the teacher.
#
# One TPU client at a time (CLAUDE.md: simultaneous clients wedge the
# tunnel); tunnel_guard runs first; per-run timeout is generous because
# killing an active client also wedges the tunnel.
set -u
cd "$(dirname "$0")/.."
ROOT=${ROOT:-/tmp/gain_scenes}
LOG=${LOG:-/tmp/gain_l16}
mkdir -p "$LOG"

python tools/tunnel_guard.py || exit 1

# scenes are ephemeral under /tmp — regenerate on a fresh host so the
# per-run 'run gen first' assert doesn't silently no-op the whole sweep
[ -f "$ROOT/sublabeled_16.txt" ] || \
  python tools/ssl_gain_bench.py gen --root "$ROOT" || exit 1

run() { # run <algo> [--tag NAME] [extra args...]
  local algo=$1; shift
  # log name carries the --tag value so two tuned variants of one algo
  # in a single queue don't overwrite each other's logs
  local tag="" prev=""
  for a in "$@"; do
    [ "$prev" = "--tag" ] && tag=$a
    prev=$a
  done
  echo "=== $(date +%H:%M:%S) $algo $* ==="
  timeout 2400 python tools/ssl_gain_bench.py run "$algo" \
    --root "$ROOT" --labeled "${LABELED:-16}" --backbone resnet10 \
    --lr 0.005 --im 128 \
    "$@" > "$LOG/${algo}${tag:+_$tag}_l${LABELED:-16}.log" 2>&1
  local rc=$?
  echo "=== rc=$rc ==="
  if [ $rc -ne 0 ]; then
    # ANY unclean client death (timeout SIGKILL=124/137, stuck-detector
    # SIGABRT=134, crash) must be assumed to wedge the tunnel
    # (CLAUDE.md) — wait it out before the next run
    python tools/tunnel_guard.py || exit 1
  fi
}

run ssl_null
run ssl_cutmix
run ssl_cct
run ssl_adv
run ssl_gct
run ssl_mt --tag tuned --delta cons_scale=0.2 --delta ema_decay=0.996 \
    --delta gaussian_noise_std=0.05 --delta cons_rampup_epochs=6
run ssl_s4l
echo "=== queue done $(date +%H:%M:%S) ==="
python tools/ssl_gain_bench.py report
