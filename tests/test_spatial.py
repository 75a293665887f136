"""Spatial (H-axis) sharding: GSPMD-partitioned forward must match the
unsharded forward (halo exchanges inserted by XLA, not by us)."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelssl_tpu import parallel
from pixelssl_tpu.parallel.spatial import spatial_forward, spatial_image_sharding
from pixelssl_tpu.models.deeplab_v2 import DeepLabV2


def test_spatial_sharded_forward_matches_unsharded():
    mesh = parallel.make_mesh()
    net = DeepLabV2(backbone='resnet10', output_stride=16, num_classes=5)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    ref, _ = net.apply(variables, jnp.asarray(x), train=False)

    fwd = spatial_forward(
        lambda v, img: net.apply(v, img, train=False)[0], mesh)
    x_sharded = jax.device_put(x, spatial_image_sharding(mesh))
    out = fwd(variables, x_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
