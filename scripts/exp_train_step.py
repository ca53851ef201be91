"""On-chip timing of the production train step (vision_tpu.train).

Fine-tunes depth-anything-small (random weights, B=4 @ 518x518) on the
single real chip: full-params adamw and head-only variants, loop-method
timing (K steps inside one jitted fori_loop, t_K - t_1 differencing to
cancel the tunnel RPC floor — NOTES.md round-1 measurement caveat).

NOTE: this times the step MATH (forward+backward+adamw update) chained
inside one program — the loop-method requirement. make_train_step's
per-dispatch program differs only in buffer donation (irrelevant inside
a fori_loop, where XLA reuses buffers anyway) and pays the per-dispatch
RPC on top; the grad-dtype cast below matches make_train_step exactly.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from vision_tpu.core.params import Params
from vision_tpu.models.depth_anything import DepthAnythingParams, depthany_predict
from vision_tpu.models.random_weights import random_depth_anything_params
from vision_tpu.train import _split, _trainable_pred, create_train_state

B, SIZE = 4, 518
K = 8


def main():
    dp = DepthAnythingParams(image_size=SIZE)
    params = random_depth_anything_params("small")
    rng = np.random.default_rng(0)
    img = rng.normal(size=(B, SIZE, SIZE, 3)).astype(np.float32)
    tgt = rng.uniform(0.2, 0.8, size=(B, SIZE, SIZE, 1)).astype(np.float32)

    def loss_fn(p, batch):
        x, y = batch
        return jnp.mean((depthany_predict(Params(p), x, dp) - y) ** 2)

    opt = optax.adamw(1e-4)

    for label, trainable in (("head-only", r"^head\."), ("full", None)):
        pred = _trainable_pred(trainable)
        state = create_train_state(params, opt, trainable=trainable)

        def one_step(state, batch):
            train, frozen = _split(state.params, pred)

            def loss_of_trainable(t, b):
                return loss_fn({**t, **frozen}, b)

            loss, grads = jax.value_and_grad(loss_of_trainable)(train, batch)
            grads = jax.tree_util.tree_map(lambda g, p: g.astype(p.dtype), grads, train)
            updates, new_opt = opt.update(grads, state.opt_state, train)
            new_train = optax.apply_updates(train, updates)
            return type(state)(state.step + 1, {**frozen, **new_train}, new_opt), loss

        def run_k(k):
            def fn(state, batch):
                def body(i, carry):
                    s, _ = carry
                    return one_step(s, batch)

                s, loss = jax.lax.fori_loop(0, k, body, (state, jnp.zeros((), jnp.float32)))
                return loss

            return jax.jit(fn)

        f1, fk = run_k(1), run_k(K)
        batch = (jnp.asarray(img), jnp.asarray(tgt))
        # warm both programs
        for f in (f1, fk):
            t0 = time.perf_counter()
            float(f(state, batch))
            print(f"  [{label}] compile+run {time.perf_counter() - t0:.1f}s", flush=True)
        times = {}
        for name, f in (("t1", f1), ("tK", fk)):
            best = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(state, batch))
                best.append(time.perf_counter() - t0)
            times[name] = min(best)
        per_step = (times["tK"] - times["t1"]) / (K - 1) * 1000
        print(
            f"{label}: per-step {per_step:.1f} ms (t1 {times['t1']*1e3:.0f} ms, "
            f"tK {times['tK']*1e3:.0f} ms, K={K}, B={B} @ {SIZE}^2)",
            flush=True,
        )


if __name__ == "__main__":
    main()
