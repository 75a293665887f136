"""Host->TPU transfer bandwidth probe at the e2e dispatch-chunk shapes.

Quantifies the tunnel-attached host's device_put cost for one
--steps-per-dispatch 8 chunk of the 321px b8+4 benchmark in both wire
formats: float32+int32 (105 MB) vs --u8-transfer uint8+int16 (33 MB).
The e2e loop is transfer-bound on this host (tools/e2e_tpu_bench.py:
~0.25 s/step = ~2 s/dispatch against 0.13 s of device compute), so this
number IS the throughput model. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np


def main():
    import jax

    from pixelssl_tpu import parallel

    mesh = parallel.make_mesh()
    n, b, s = 8, 8, 321
    rng = np.random.default_rng(0)

    def probe(img_dtype, lbl_dtype, reps=5):
        # FRESH buffers each rep: re-putting the same numpy array measures
        # a cached/dedup path on the tunnel (0.078 s for 105 MB — 1.35
        # GB/s — while a consuming dispatch shows the real ~3 s cost,
        # tools/dispatch_overhead_probe.py variant D). Unique bytes per
        # rep force the actual upload.
        imgs = [rng.integers(0, 255, (n, b, s, s, 3)).astype(img_dtype)
                for _ in range(reps)]
        lbls = [rng.integers(0, 21, (n, b, s, s)).astype(lbl_dtype)
                for _ in range(reps)]
        nbytes = imgs[0].nbytes + lbls[0].nbytes
        # warm: allocator + tunnel path
        out = parallel.shard_step_chunk(
            {'inp': (imgs[0],), 'gt': (lbls[0],)}, mesh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(reps):
            out = parallel.shard_step_chunk(
                {'inp': (imgs[i],), 'gt': (lbls[i],)}, mesh)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        return nbytes / 1e6, dt

    f_mb, f_s = probe(np.float32, np.int32)
    u_mb, u_s = probe(np.uint8, np.int16)
    print(json.dumps({
        'metric': 'host_to_tpu_dispatch_chunk_transfer',
        'chunk': '8 steps x b8+4 @321',
        'float32_int32_mb': round(f_mb, 1),
        'float32_int32_s': round(f_s, 3),
        'uint8_int16_mb': round(u_mb, 1),
        'uint8_int16_s': round(u_s, 3),
        'mb_per_s_float': round(f_mb / f_s, 1),
        'mb_per_s_u8': round(u_mb / u_s, 1),
    }), flush=True)


if __name__ == '__main__':
    main()
