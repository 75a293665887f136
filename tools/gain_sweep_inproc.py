"""Run many SSL-gain benchmark runs inside ONE process / ONE TPU client.

Round-5 operational finding: on this host the TPU tunnel wedges after
EVERY client exit (even rc=0 — observed 09:12 and 09:44 on 2026-08-20),
costing a ~8-15 min quiet-probe recovery between consecutive
single-run `ssl_gain_bench.py run` invocations. Twelve queued runs
would burn ~2h of dead tunnel-recovery time. This driver instead calls
`ssl_gain_bench.run_one` repeatedly in-process: one jax client, zero
inter-run exits, the persistent compile cache shared across runs.

Specs are the round-5 verdict items #2b/#4 (tools/round5_queue.sh
phases mt/l32/tuned). Runs already recorded in the results jsonl
(matched on labeled + algo[/tag] + deltas) are skipped, so the sweep is
resumable after a crash: completed runs were appended on the spot.

Usage: python tools/gain_sweep_inproc.py [--dry]
"""

import json
import os
import sys
import time
import traceback

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

import ssl_gain_bench  # noqa: E402  (sibling module, reuse parser+run_one)

ROOT = os.environ.get('ROOT', '/tmp/gain_scenes')
RESULTS = os.path.join(_HERE, 'ssl_gain_results.jsonl')

BASE = ['--root', ROOT, '--backbone', 'resnet10', '--lr', '0.005',
        '--im', '128']

MT_GENTLE = ['--tag', 'gentle', '--delta', 'cons_scale=0.05',
             '--delta', 'ema_decay=0.996',
             '--delta', 'gaussian_noise_std=0.05',
             '--delta', 'cons_rampup_epochs=7']
GCT_GENTLE = ['--tag', 'gentle', '--delta', 'dc_ssl_scale=10.0',
              '--delta', 'dc_threshold=0.4', '--delta', 'fd_scale=1.0']
CCT_GENTLE = ['--tag', 'gentle', '--delta', 'cons_scale=5.0',
              '--delta', 'cons_rampup_epochs=7']

SPECS = [
    # verdict item #2b: MT operating-point probes
    ['ssl_mt', '--labeled', '16'] + MT_GENTLE,
    ['ssl_null', '--labeled', '32'],
    ['ssl_mt', '--labeled', '32'] + MT_GENTLE,
    # verdict item #4: labeled=32 midpoint sweep (reference-default scales)
    ['ssl_cutmix', '--labeled', '32'],
    ['ssl_adv', '--labeled', '32'],
    ['ssl_s4l', '--labeled', '32'],
    ['ssl_cct', '--labeled', '32'],
    ['ssl_gct', '--labeled', '32'],
    # verdict item #4: GCT/CCT with lowered SSL pressure
    ['ssl_gct', '--labeled', '16'] + GCT_GENTLE,
    ['ssl_cct', '--labeled', '16'] + CCT_GENTLE,
    ['ssl_gct', '--labeled', '32'] + GCT_GENTLE,
    ['ssl_cct', '--labeled', '32'] + CCT_GENTLE,
]

# seed-variance legs for the headline labeled=16 rows: 3 seeds each for
# the baseline and the two clearly-positive algorithms, so the gains can
# be reported as mean +- spread instead of a hand-waved noise estimate
_SEEDS = tuple(os.environ.get('GAIN_SEEDS', '2,3').split(','))
SEED_SPECS = [
    # --out per seed: the exp_id tag is not seed-suffixed, so sharing
    # out_path would append to the seed-1 run's metrics.jsonl and the
    # harvest would mix curves across seeds
    ['ssl_null', '--labeled', '16', '--seed', s,
     '--out', ROOT + '/result_s' + s] for s in _SEEDS
] + [
    ['ssl_cutmix', '--labeled', '16', '--seed', s,
     '--out', ROOT + '/result_s' + s] for s in _SEEDS
] + [
    ['ssl_cct', '--labeled', '16', '--seed', s,
     '--out', ROOT + '/result_s' + s] + CCT_GENTLE for s in _SEEDS
]

# tuning-effect legs: the gentle-vs-default comparisons are paired at a
# fixed seed, so replicating BOTH arms at seeds 2/3 turns the "regime
# tuning moves algorithms beyond seed noise" claim into a 3-seed paired
# statistic (CCT default arm; MT tuned + gentle arms)
TUNING_SPECS = [
    ['ssl_cct', '--labeled', '16', '--seed', s,
     '--out', ROOT + '/result_s' + s] for s in ('2', '3')
] + [
    ['ssl_mt', '--labeled', '16', '--seed', s,
     '--out', ROOT + '/result_s' + s] + MT_GENTLE for s in ('2', '3')
] + [
    ['ssl_mt', '--labeled', '16', '--seed', s, '--tag', 'tuned',
     '--out', ROOT + '/result_s' + s,
     '--delta', 'cons_scale=0.2', '--delta', 'ema_decay=0.996',
     '--delta', 'gaussian_noise_std=0.05',
     '--delta', 'cons_rampup_epochs=6'] for s in ('2', '3')
]


# final replication legs: MT arms to n=5 (the robust "MT below SupOnly"
# claim gets 10 negative-or-not draws) and GCT-gentle to n=3 (removing
# the last n=1 anecdote from the tuned table)
FINAL_SPECS = [
    ['ssl_mt', '--labeled', '16', '--seed', s,
     '--out', ROOT + '/result_s' + s] + MT_GENTLE for s in ('4', '5')
] + [
    ['ssl_mt', '--labeled', '16', '--seed', s, '--tag', 'tuned',
     '--out', ROOT + '/result_s' + s,
     '--delta', 'cons_scale=0.2', '--delta', 'ema_decay=0.996',
     '--delta', 'gaussian_noise_std=0.05',
     '--delta', 'cons_rampup_epochs=6'] for s in ('4', '5')
] + [
    ['ssl_gct', '--labeled', '16', '--seed', s,
     '--out', ROOT + '/result_s' + s] + GCT_GENTLE
    for s in ('2', '3', '4', '5')
]


def _done_keys():
    keys = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                r = json.loads(line)
                keys.add((r['labeled'], r['algo'], r.get('seed', 1)))
    return keys


def main():
    dry = '--dry' in sys.argv
    specs = (FINAL_SPECS if '--final' in sys.argv
             else TUNING_SPECS if '--tuning' in sys.argv
             else SEED_SPECS if '--seeds' in sys.argv else SPECS)
    parser_argv = lambda spec: ['run'] + spec + BASE  # noqa: E731
    done = _done_keys()
    todo = []
    for spec in specs:
        algo = spec[0]
        labeled = int(spec[spec.index('--labeled') + 1])
        tag = spec[spec.index('--tag') + 1] if '--tag' in spec else ''
        seed = int(spec[spec.index('--seed') + 1]) if '--seed' in spec else 1
        key = (labeled, algo + ('/' + tag if tag else ''), seed)
        if key in done:
            print('skip (recorded):', key)
            continue
        todo.append((key, spec))
    print('%d/%d specs to run' % (len(todo), len(specs)), flush=True)
    if dry:
        return

    failures = []
    for i, (key, spec) in enumerate(todo):
        t0 = time.time()
        print('=== [%d/%d] %s %s ===' % (i + 1, len(todo), time.strftime(
            '%H:%M:%S'), key), flush=True)
        opts = ssl_gain_bench.build_parser().parse_args(parser_argv(spec))
        try:
            ssl_gain_bench.run_one(opts)
        except Exception:
            traceback.print_exc()
            failures.append(key)
        print('=== [%d/%d] %s done in %.0fs ===' % (
            i + 1, len(todo), key, time.time() - t0), flush=True)
    print('sweep done; failures: %s' % (failures or 'none'), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
