"""Dense threefry RNG: correctness vs the reference algorithm, stream
properties, shard invariance."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerpython_tpu.ops import rng


def _ref_threefry2x32(k, x):
    """Pure-python reference implementation (Salmon et al. 2011)."""
    M = 0xFFFFFFFF
    R = (13, 15, 26, 6, 17, 29, 16, 24)
    ks = (k[0], k[1], k[0] ^ k[1] ^ 0x1BD11BDA)
    x0, x1 = (x[0] + ks[0]) & M, (x[1] + ks[1]) & M
    for block in range(5):
        rots = R[0:4] if block % 2 == 0 else R[4:8]
        for r in rots:
            x0 = (x0 + x1) & M
            x1 = (((x1 << r) | (x1 >> (32 - r))) & M) ^ x0
        x0 = (x0 + ks[(block + 1) % 3]) & M
        x1 = (x1 + ks[(block + 2) % 3] + block + 1) & M
    return x0, x1


def test_threefry_matches_reference_algorithm():
    rs = np.random.RandomState(0)
    for _ in range(20):
        k = tuple(int(v) for v in rs.randint(0, 2**32, 2, dtype=np.uint64))
        x = tuple(int(v) for v in rs.randint(0, 2**32, 2, dtype=np.uint64))
        y0, y1 = rng.threefry2x32(
            jnp.uint32(k[0]), jnp.uint32(k[1]),
            jnp.uint32(x[0]), jnp.uint32(x[1]),
        )
        e0, e1 = _ref_threefry2x32(k, x)
        assert (int(y0), int(y1)) == (e0, e1)


def test_uniforms_range_and_determinism():
    k0, k1 = rng.key_from_seed(7)
    c = jnp.arange(4096, dtype=jnp.uint32)
    u = rng.uniforms(k0, k1, c, 5)
    assert u.shape == (5, 4096)
    a = np.asarray(u)
    assert (a >= 0).all() and (a < 1).all()
    assert abs(a.mean() - 0.5) < 0.01
    b = np.asarray(rng.uniforms(k0, k1, c, 5))
    np.testing.assert_array_equal(a, b)


def test_uniforms_shard_invariant():
    """Drawing for a slice of global counters gives the slice of the
    full draw — the property that makes sharded renders bit-identical."""
    k0, k1 = rng.key_from_seed(3)
    c = jnp.arange(1024, dtype=jnp.uint32)
    full = np.asarray(rng.uniforms(k0, k1, c, 3))
    part = np.asarray(rng.uniforms(k0, k1, c[256:512], 3))
    np.testing.assert_array_equal(part, full[:, 256:512])


def test_distinct_keys_and_salts_decorrelate():
    k0, k1 = rng.key_from_seed(1)
    s0 = rng.fold(k0, k1, 0)
    s1 = rng.fold(k0, k1, 1)
    c = jnp.arange(8192, dtype=jnp.uint32)
    a = np.asarray(rng.uniforms(s0[0], s0[1], c, 1))[0]
    b = np.asarray(rng.uniforms(s1[0], s1[1], c, 1))[0]
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.05
    assert not np.array_equal(a, b)


def test_key_from_seed_accepts_prngkey():
    k0, k1 = rng.key_from_seed(jax.random.PRNGKey(42))
    assert k0.dtype == jnp.uint32 and k1.dtype == jnp.uint32
