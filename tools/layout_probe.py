"""NHWC-vs-NCHW conv layout probe on the tunnel compiler (verdict r4 #8).

The framework is NHWC everywhere (CLAUDE.md invariant); XLA:TPU is free
to relayout internally, and round-1 profiling showed ~30% of device
time in bf16 layout copies from the space-to-batch pass. This probe
measures whether feeding the SAME convolutions as NCHW (torch-style,
what the reference's CUDA path uses) would compile to anything faster
on this tunnel's compiler — i.e. whether the NHWC invariant costs
anything. It times the dominant conv shapes of the flagship
DeepLab-v2/R101@321 OS16 two-stream step (b8+4 = 12 images: stem,
res2-res5 3x3 cores incl. the dilated res5, and the widest 1x1) in both
layouts, each as K chained forwards inside ONE lax.scan dispatch
(pattern of tools/infer_bench.py — output->input feedback defeats DCE,
one RPC per measurement).

Results go to stdout as JSON lines; record the conclusion in
BASELINE.md. Usage: python tools/layout_probe.py [--scan 32]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, N,H,W,Cin, kh,kw,Cout, stride, dilation, repeats_in_model)
SHAPES = [
    ('stem7x7s2', 12, 321, 321, 3, 7, 7, 64, 2, 1, 1),
    ('res2_3x3', 12, 81, 81, 64, 3, 3, 64, 1, 1, 3),
    ('res3_3x3', 12, 41, 41, 128, 3, 3, 128, 1, 1, 4),
    ('res4_3x3', 12, 21, 21, 256, 3, 3, 256, 1, 1, 23),
    ('res5_3x3_d2', 12, 21, 21, 512, 3, 3, 512, 1, 2, 3),
    ('res4_1x1_wide', 12, 21, 21, 1024, 1, 1, 256, 1, 1, 23),
]


def time_one(name, n, h, w, cin, kh, kw, cout, stride, dil, reps, layout,
             scan_len):
    if layout == 'NHWC':
        dn = jax.lax.conv_dimension_numbers(
            (n, h, w, cin), (kh, kw, cin, cout), ('NHWC', 'HWIO', 'NHWC'))
        x = jnp.asarray(np.random.rand(n, h, w, cin), jnp.bfloat16)
        k = jnp.asarray(np.random.rand(kh, kw, cin, cout) - 0.5,
                        jnp.bfloat16)
    else:
        dn = jax.lax.conv_dimension_numbers(
            (n, cin, h, w), (cout, cin, kh, kw), ('NCHW', 'OIHW', 'NCHW'))
        x = jnp.asarray(np.random.rand(n, cin, h, w), jnp.bfloat16)
        k = jnp.asarray(np.random.rand(cout, cin, kh, kw) - 0.5,
                        jnp.bfloat16)

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(stride, stride),
        padding='SAME', rhs_dilation=(dil, dil), dimension_numbers=dn,
        preferred_element_type=jnp.bfloat16)

    def make_run(length):
        @jax.jit
        def run(x, k):
            def body(carry, _):
                y = conv(carry, k)
                # feedback keeps iterations data-dependent; mean keeps
                # the carry shape equal to the input shape regardless of
                # stride
                return carry + jnp.bfloat16(1e-6) * jnp.mean(y), \
                    jnp.mean(y)
            _, ys = jax.lax.scan(body, x, None, length=length)
            return ys
        return run

    # axon quirk: block_until_ready on this tunnel platform returns
    # without gating on device completion (measured sub-RPC walls), so
    # force sync with a host transfer of the LAST scan element (data-
    # dependent on every iteration), and cancel the fixed per-dispatch
    # RPC cost (~70-130 ms) by differencing two scan lengths.
    def timed(length):
        run = make_run(length)
        t0 = time.perf_counter()
        np.asarray(run(x, k)[-1:])          # compile + first exec
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(x, k)[-1:])          # timed exec, host-synced
        return time.perf_counter() - t0, compile_s

    dt_short, c1 = timed(scan_len)
    dt_long, c2 = timed(scan_len * 5)
    per_conv = (dt_long - dt_short) / (scan_len * 4)

    flops = 2.0 * n * (h // stride) * (w // stride) * cin * cout * kh * kw
    return dict(shape=name, layout=layout, ms_per_conv=round(
        1e3 * per_conv, 4), tflops=round(flops / per_conv / 1e12, 2),
        model_reps=reps, compile_s=round(c1 + c2, 1),
        dispatch_walls_ms=[round(1e3 * dt_short, 1),
                           round(1e3 * dt_long, 1)])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--scan', type=int, default=256,
                    help='short scan length; the long leg is 5x this — '
                         'big enough that the 4x compute delta dwarfs '
                         'the +-30 ms RPC jitter')
    opts = ap.parse_args()
    print('platform:', jax.devices()[0].platform, flush=True)
    totals = {'NHWC': 0.0, 'NCHW': 0.0}
    for spec in SHAPES:
        for layout in ('NHWC', 'NCHW'):
            r = time_one(*spec, layout=layout, scan_len=opts.scan)
            totals[layout] += r['ms_per_conv'] * r['model_reps']
            print(json.dumps(r), flush=True)
    print(json.dumps({'weighted_fwd_ms': {k: round(v, 3)
                                          for k, v in totals.items()},
                      'nchw_vs_nhwc': round(
                          totals['NCHW'] / totals['NHWC'], 3)}))


if __name__ == '__main__':
    main()
