"""bf16-prefilter premise probe (VERDICT r3 task 3).

The proposal: a conservative bf16 Möller–Trumbore pre-test (widened
epsilons, never rejects a true hit) with f32 re-solve on survivors could
~double the sparse sweeps' throughput IF bf16 MT runs ~2x f32 on the
hardware. This probe measures that premise directly: one standalone
Pallas kernel sweeping a 512-triangle VMEM-resident tile against a ray
wavefront, in f32 and in bf16 (identical op structure, operands cast at
load), reporting G MT-pairs/s each.

If bf16 is not decisively faster the pre-filter cannot pay — it ADDS the
bf16 pass on every tile and only removes the f32 pass on tiles no lane
could hit (plus @pl.when predication, the measured sub-tiling negative).

Usage: python scripts/bf16_probe.py [n_rays_log2]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BLK = 512
R_BLK = 512
DET_EPS = 1e-8
T_MIN = 1e-4


def make_kernel(dtype):
    def kernel(tri_ref, o_ref, d_ref, out_ref):
        col = lambda c: tri_ref[:, c:c + 1].astype(dtype)
        row = lambda ref, c: ref[c:c + 1, :].astype(dtype)
        ox, oy, oz = row(o_ref, 0), row(o_ref, 1), row(o_ref, 2)
        dx, dy, dz = row(d_ref, 0), row(d_ref, 1), row(d_ref, 2)
        v0x, v0y, v0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3) - v0x, col(4) - v0y, col(5) - v0z
        e2x, e2y, e2z = col(6) - v0x, col(7) - v0y, col(8) - v0z

        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        # arithmetic select (no i1 masks in the bf16 domain — Mosaic
        # rejects their relayout at 16-bit lane width)
        m = (jnp.abs(det.astype(jnp.float32)) > DET_EPS).astype(dtype)
        inv_det = dtype(1.0) / (det * m + (dtype(1.0) - m))
        not_par = m

        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        # compare in f32: Mosaic rejects the bf16-lane i1 mask relayout
        # ("Invalid relayout ... vector<512x512xi1>"); the arithmetic
        # above — the premise under test — stays in ``dtype``
        uf, vf, tf = (u.astype(jnp.float32), v.astype(jnp.float32),
                      t.astype(jnp.float32))
        hit = (
            (not_par.astype(jnp.float32) > 0.5)
            & (uf >= 0.0) & (vf >= 0.0) & (uf + vf <= 1.0) & (tf > T_MIN)
        )
        out_ref[:] = jnp.sum(
            jnp.where(hit, 1.0, 0.0), axis=0, keepdims=True,
        )

    return kernel


def sweep_fn(dtype, n):
    kernel = make_kernel(dtype)

    def sweep(tripack, o3, d3):
        return pl.pallas_call(
            kernel,
            grid=(n // R_BLK,),
            in_specs=[
                pl.BlockSpec((T_BLK, 12), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, R_BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, R_BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R_BLK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(tripack, o3, d3)

    return sweep


def main() -> None:
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    key = jax.random.PRNGKey(0)
    tripack = jax.random.uniform(key, (T_BLK, 12), minval=-2, maxval=2)
    o3 = jax.random.uniform(jax.random.fold_in(key, 1), (3, n),
                            minval=-2, maxval=2)
    d3 = jax.random.normal(jax.random.fold_in(key, 2), (3, n))
    eps = jax.device_put(jnp.arange(4, dtype=jnp.float32) * 1e-7)
    jax.block_until_ready((tripack, o3, d3, eps))
    reps = 8

    results = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        sweep = sweep_fn(dtype, n)

        @jax.jit
        def run(e, sweep=sweep):
            def body(acc, i):
                out = sweep(tripack, o3 + e + i * 1e-8, d3)
                return acc + jnp.sum(out), None
            return lax.scan(body, 0.0,
                            jnp.arange(reps, dtype=jnp.float32))[0]

        float(run(eps[0]))  # compile
        best = float("inf")
        for i in range(1, 4):
            t0 = time.perf_counter()
            float(run(eps[i]))
            best = min(best, time.perf_counter() - t0)
        dt = (best - 0.03) / reps
        pairs = n * T_BLK
        results[name] = pairs / dt / 1e9
        print(json.dumps({
            "what": "bf16_probe", "impl": name, "platform":
            jax.default_backend(), "rays": n, "tris": T_BLK,
            "ms": round(dt * 1e3, 3),
            "gpairs_per_s": round(pairs / dt / 1e9, 2),
        }), flush=True)
    print(json.dumps({
        "what": "bf16_probe_verdict",
        "bf16_over_f32": round(results["bf16"] / results["f32"], 3),
    }))


if __name__ == "__main__":
    main()
