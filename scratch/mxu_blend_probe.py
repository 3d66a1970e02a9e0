"""MXU-blend probe (VERDICT r2 item 2): can the 8-term corner/plane
blend run on the MXU as a batched contraction, and does it beat the
VPU elementwise chain?

The stage value is vals[n, c] = sum_i w[n, i] * v[n, i, c] with i over 8
(4 corners x 2 planes): a PER-RAY (1x8)@(8xC) matvec. The MXU multiplies
128x128 tiles of SHARED operands; here both operands vary per ray, so a
dot_general formulation has batch dim N=millions and contraction depth 8
— the systolic array cannot amortise weight loading. This probe measures
a jnp.einsum('ni,nic->nc') formulation (XLA is free to map it to MXU or
VPU) against the manual fma chain used by the march.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
C = 3
REPS = 200


def main():
    key = jax.random.PRNGKey(0)
    w = jax.random.uniform(key, (N, 8))
    v = jax.random.uniform(jax.random.fold_in(key, 1), (N, 8, C),
                           dtype=jnp.bfloat16)

    @jax.jit
    def chain(w, v):
        vf = v.astype(w.dtype)
        out = 0.0
        for i in range(8):
            out = out + w[:, i:i + 1] * vf[:, i, :]
        # fold a scan-like dependency so REPS iterations don't collapse
        return out

    @jax.jit
    def einsum(w, v):
        return jnp.einsum("ni,nic->nc", w, v.astype(w.dtype))

    def timed(f):
        o = f(w, v)
        o.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(REPS):
                o = f(w, v)
            o.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts) / REPS

    t_chain = timed(chain)
    t_einsum = timed(einsum)
    print(json.dumps({
        "N": N, "C": C,
        "us_chain": round(t_chain * 1e6, 1),
        "us_einsum": round(t_einsum * 1e6, 1),
        "einsum_over_chain": round(t_einsum / t_chain, 3),
    }))


if __name__ == "__main__":
    main()
