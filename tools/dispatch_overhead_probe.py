"""Per-dispatch overhead decomposition for the chunked multi-step path.

The e2e phase profiler shows an 8-step _multi_step dispatch costs ~0.9 s
while the same 8 steps inside bench.py's scan cost 0.13 s + ~0.1 s RPC.
This probe isolates the suspects on the real chip, same model/batch:

  A. bench-style: scan reusing ONE device-resident batch, no donation
  B. chunk scan ([8,batch,...] chunk input), no donation
  C. chunk scan, donate_argnums=(0,)  (the production _multi_step)
  D. C but fed a freshly device_put chunk each call (production pattern)

Prints one JSON line with seconds/dispatch for each variant.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, '..'))

import numpy as np

N_STEPS = 8
REPS = 5


def main():
    import jax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from pixelssl_tpu import harness, parallel
    from pixelssl_tpu.utils import env as _env

    _env.enable_compile_cache(os.path.join(_HERE, '..', '.jax_cache'))

    mesh = parallel.make_mesh()
    args = harness.default_args(
        'ssl_mt', backbone='resnet101', im_size=321, num_classes=21,
        batch_size=8, unlabeled_batch_size=4, ignore_unlabeled=False,
        cons_scale=1.0, cons_rampup_epochs=3, ema_decay=0.99,
        lr=0.00025, momentum=0.9, weight_decay=0.0005, epochs=20)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=100)
    batch = harness.synthetic_batch(args, mesh)

    rng = np.random.default_rng(0)
    chunk_np = {
        'inp': (rng.standard_normal((N_STEPS, 12, 321, 321, 3))
                .astype(np.float32),),
        'gt': (rng.integers(0, 21, (N_STEPS, 12, 321, 321))
               .astype(np.int32),)}
    chunk = parallel.shard_step_chunk(chunk_np, mesh)

    def timeit(fn, *fargs):
        out = fn(*fargs)          # warm/compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        o = None
        for _ in range(REPS):
            o = fn(*fargs)
            jax.block_until_ready(o)
        return (time.perf_counter() - t0) / REPS

    # A: bench-style reuse-one-batch scan, no donation
    def multi_reuse(state, b):
        def body(s, _):
            s2, m = algo._step_fn(s, b)
            return s2, m
        s, ms = jax.lax.scan(body, state, None, length=N_STEPS)
        return s, jax.tree.map(lambda x: x[-1], ms)

    stepA = jax.jit(shard_map(multi_reuse, mesh=mesh,
                              in_specs=(P(), P(parallel.DATA_AXIS)),
                              out_specs=(P(), P()), check_vma=False))
    tA = timeit(lambda: stepA(algo.state, batch))

    # B: chunk scan, no donation
    stepB = parallel.parallel_multi_step(algo._step_fn, mesh, N_STEPS,
                                         donate_state=False)
    tB = timeit(lambda: stepB(algo.state, chunk))

    # C: chunk scan, donated state (production _multi_step)
    stepC = parallel.parallel_multi_step(algo._step_fn, mesh, N_STEPS)
    state = algo.state

    def runC():
        nonlocal state
        out = stepC(state, chunk)
        state = out[0]
        return out
    tC = timeit(runC)

    # D: C + fresh host->device chunk each call (production loop pattern)
    def runD():
        nonlocal state
        dev = parallel.shard_step_chunk(chunk_np, mesh)
        out = stepC(state, dev)
        state = out[0]
        return out
    tD = timeit(runD)

    # E: D but device_put with the COMPILED program's expected input
    # Format — if D's 3.2 s overhead is a host-side relayout of the
    # default-layout chunk, matching the layout at put time removes it.
    tE = fmt_err = None
    try:
        from jax.experimental.layout import Format
        comp = stepC.lower(state, chunk).compile()
        fmts, _ = comp.input_formats
        chunk_fmts = jax.tree.map(lambda f: f, fmts[1])

        def put_fmt(np_tree, fmt_tree):
            return jax.tree.map(
                lambda x, f: jax.device_put(x, f), np_tree, fmt_tree)

        def runE():
            nonlocal state
            dev = put_fmt(chunk_np, chunk_fmts)
            out = stepC(state, dev)
            state = out[0]
            return out
        tE = timeit(runE)
    except Exception as e:
        fmt_err = repr(e)

    print(json.dumps({
        'metric': 'chunk_dispatch_overhead_probe',
        'n_steps': N_STEPS,
        'A_reuse_batch_no_donate_s': round(tA, 3),
        'B_chunk_no_donate_s': round(tB, 3),
        'C_chunk_donate_s': round(tC, 3),
        'D_chunk_donate_fresh_put_s': round(tD, 3),
        'E_fresh_put_matched_layout_s': (round(tE, 3) if tE else None),
        'E_error': fmt_err,
    }), flush=True)


if __name__ == '__main__':
    main()
