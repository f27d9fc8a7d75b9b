"""One-off probe: the per-program-seed-tile RNG kernel must (a) lower and run
on the real chip, (b) be deterministic per seed, (c) compose with jax.vmap
(VERDICT r1 item 4), (d) give distinct streams per program and per batch
element. Run on the real TPU; prints PASS/FAIL lines."""

import numpy as np
import jax
import jax.numpy as jnp

from cudasbmp_tpu.config import Scenario
from cudasbmp_tpu.ops.rollout_pallas import sample_and_rollout_pallas
from cudasbmp_tpu.systems.registry import get_system

system = get_system("bicycle")
sc = Scenario.demo()
obstacles = jnp.asarray(sc.obstacles)
B = 1 << 14  # 2 programs at the default 8192-lane block
key = jax.random.key(0)
x0 = jax.random.uniform(key, (B, system.state_dim), minval=1.0, maxval=19.0)
x0 = x0.at[:, 2:].set(0.0)

kw = dict(num_disc=10, width=20.0, height=20.0)

x1a, ca, va = jax.block_until_ready(
    sample_and_rollout_pallas(system, jnp.int32(7), x0, obstacles, **kw))
x1b, cb, vb = jax.block_until_ready(
    sample_and_rollout_pallas(system, jnp.int32(7), x0, obstacles, **kw))
x1c, cc, vc = jax.block_until_ready(
    sample_and_rollout_pallas(system, jnp.int32(8), x0, obstacles, **kw))
print("PASS single-call lowers; valid frac", float(va.mean()))
assert 0.5 < float(va.mean()) < 0.99, "valid fraction implausible"
assert np.array_equal(np.asarray(ca), np.asarray(cb)), "not deterministic"
print("PASS deterministic per seed")
assert not np.array_equal(np.asarray(ca), np.asarray(cc)), "seed ignored"
print("PASS different seed -> different stream")
half = B // 2
assert not np.array_equal(np.asarray(ca[:half]), np.asarray(ca[half:])), \
    "programs share a stream"
print("PASS distinct per-program streams")

# the headline of this change: vmap lowers and runs
vm = jax.vmap(
    lambda s, x: sample_and_rollout_pallas(system, s, x, obstacles, **kw)
)
seeds = jnp.arange(4, dtype=jnp.int32)
x0v = jnp.stack([x0[: B // 4]] * 4)
x1v, cv, vv = jax.block_until_ready(vm(seeds, x0v))
print("PASS vmap lowers and runs; shapes", x1v.shape, cv.shape, vv.shape)
assert not np.array_equal(np.asarray(cv[0]), np.asarray(cv[1])), \
    "batch elements share a stream"
print("PASS distinct per-batch-element streams")

# uniform-marginal sanity on a sampled control column (accel in [-5, 5])
acc = np.asarray(ca[:, 0])
assert -5.0 <= acc.min() and acc.max() <= 5.0
assert abs(acc.mean()) < 0.1 and abs(np.percentile(acc, 25) + 2.5) < 0.1
print("PASS control marginals look uniform")
print("ALL PASS")
