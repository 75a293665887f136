"""Export a trained model's inference forward as a serialized StableHLO
artifact (jax.export) for serving.

The reference has no deployment story beyond torch checkpoints; here the
eval forward (activated predictions at a fixed input shape) is exported
as a self-contained, version-stable StableHLO blob that any JAX-free
serving runtime with a StableHLO loader (or a later jax.export.deserialize)
can execute — weights baked in, no Python model code needed at load time.

Usage::

    python tools/export_serving.py --ckpt result/<exp>/ckpt/checkpoint_N \
        --algo ssl_mt --backbone resnet101 --im-size 321 [--num-classes 21] \
        --out model.stablehlo [--batch 1] [--platform tpu]

Round-trip check is built in: the artifact is deserialized and executed
on the local backend, and its output compared against the live model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', default='', help='orbax checkpoint dir '
                    '(omit for random init — smoke/testing)')
    ap.add_argument('--algo', default='ssl_mt')
    ap.add_argument('--model-key', default='model',
                    help='which model in the algorithm state to export '
                         '(e.g. model / teacher / l_model)')
    ap.add_argument('--backbone', default='resnet101')
    ap.add_argument('--im-size', type=int, default=321)
    ap.add_argument('--num-classes', type=int, default=21)
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--out', default='model.stablehlo')
    ap.add_argument('--platform', default='',
                    help='lowering platform (default: local backend)')
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from pixelssl_tpu import harness, parallel

    mesh = parallel.make_mesh(1)
    args = harness.default_args(
        opts.algo, backbone=opts.backbone, im_size=opts.im_size,
        num_classes=opts.num_classes, batch_size=2, unlabeled_batch_size=0,
        ignore_unlabeled=True, lr=0.01, momentum=0.9, epochs=1)
    algo = harness.build_algorithm(args, mesh=mesh)
    if opts.ckpt:
        algo.load_checkpoint(opts.ckpt)

    mstate = algo.state[opts.model_key]
    model = {mk: m for mk, m in (
        (k, getattr(algo, a)) for k, a in (
            ('model', 'model'), ('teacher', 't_model'),
            ('l_model', 'l_model'), ('r_model', 'r_model'))
        if hasattr(algo, a))}.get(opts.model_key)
    if model is None:  # fall back: single-model algorithms name it `model`
        model = getattr(algo, 'model', None) or algo.ctx.models['model']

    variables = {'params': jax.device_get(mstate['params']),
                 'batch_stats': jax.device_get(mstate['batch_stats'])}

    def forward(x):
        resulter, _ = model.apply(variables, (x,), train=False)
        return resulter['activated_pred'][0]

    x_spec = jax.ShapeDtypeStruct(
        (opts.batch, opts.im_size, opts.im_size, 3), jnp.float32)
    platforms = [opts.platform] if opts.platform else None
    exported = jexport.export(jax.jit(forward), platforms=platforms)(x_spec)
    blob = exported.serialize()
    with open(opts.out, 'wb') as f:
        f.write(blob)

    # round-trip: deserialize and compare against the live forward
    rng = np.random.default_rng(0)
    x = rng.standard_normal(x_spec.shape).astype(np.float32)
    restored = jexport.deserialize(blob)
    got = np.asarray(restored.call(x))
    want = np.asarray(forward(jnp.asarray(x)))
    # bf16 conv compute: two independently-compiled programs may fuse
    # differently, so agreement is to bf16 rounding, not bit-exact
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=2e-2)
    print('exported {0} ({1:.1f} MB), round-trip max|diff| = {2:.2e}'.format(
        opts.out, len(blob) / 1e6, float(np.abs(got - want).max())))


if __name__ == '__main__':
    main()
