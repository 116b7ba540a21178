"""Pallas kernel tests (interpreter mode on CPU) vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_slam_tpu.planes.pallas_grow import (
    region_grow_pallas,
    region_grow_xla,
)


def _scene(seed=0, h=60, w=90):
    r = np.random.default_rng(seed)
    member = r.random((h, w)) < 0.7
    seed_m = np.zeros((h, w), bool)
    seed_m[h // 2 - 2:h // 2 + 2, w // 2 - 2:w // 2 + 2] = True
    sm = [r.random((h, w)) < 0.95 for _ in range(4)]
    return (jnp.asarray(seed_m), jnp.asarray(member),
            *[jnp.asarray(s) for s in sm])


class TestRegionGrowKernel:
    def test_matches_xla_reference(self):
        args = _scene()
        ref = region_grow_xla(*args, steps=40)
        out = region_grow_pallas(*args, steps=40, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_fixed_point_containment(self):
        args = _scene(seed=1)
        out = region_grow_pallas(*args, steps=64, interpret=True)
        seed_m, member = args[0], args[1]
        out = np.asarray(out)
        # grown region contains the (member-gated) seed and stays in member
        assert np.all(out[np.asarray(seed_m) & np.asarray(member)])
        assert not np.any(out & ~np.asarray(member))

    def test_no_edge_wraparound(self):
        h, w = 24, 40
        member = np.ones((h, w), bool)
        seed = np.zeros((h, w), bool)
        seed[:, 0] = True       # left edge seeded
        # block everything except wrap-adjacent smoothness
        sm = [np.zeros((h, w), bool) for _ in range(4)]
        out = region_grow_pallas(jnp.asarray(seed), jnp.asarray(member),
                                 *[jnp.asarray(s) for s in sm],
                                 steps=8, interpret=True)
        # with all smoothness gates closed, nothing beyond the seed column
        assert not np.any(np.asarray(out)[:, 1:])
        ref = region_grow_xla(jnp.asarray(seed), jnp.asarray(member),
                              *[jnp.asarray(s) for s in sm], steps=8)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
