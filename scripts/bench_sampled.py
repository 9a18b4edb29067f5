"""Sampled-MAG training-epoch benchmark: fused plans + prefetch threads.

Measures a mag-scale synthetic sampled training epoch three ways:
synchronous XLA (round-1 behavior), plans without prefetch (host plan
cost exposed), plans + 4 prefetch threads (production path). Also times
the vectorized sampler alone.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/bench_sampled.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.data.sampling import NeighborSampler, SampledNodeLoader
from egc_tpu.models.nets import ConvSpec, ArxivNet
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=500_000, avg_degree=12, num_classes=40, num_features=128,
        seed=0)
    n = raw["x"].shape[0]
    sampler = NeighborSampler(raw["senders"], raw["receivers"], n,
                              fanouts=(15, 10), seed=0)
    seeds = raw["train_idx"][:16 * 1024]

    t0 = time.time()
    for i in range(4):
        sampler.sample(seeds[i * 1024:(i + 1) * 1024])
    print(f"sampler: {(time.time()-t0)/4*1e3:.1f} ms / 1024-seed batch",
          flush=True)

    net = ArxivNet(conv=ConvSpec(kind="egc", heads=4, bases=4,
                                 aggrs=("symnorm", "max", "mean")),
                   hidden_dim=128, num_layers=2, dropout=0.0,
                   residual=True, num_features=128, num_classes=40)

    x_full = jnp.asarray(raw["x"])

    def run_epoch(kernel_plans, prefetch, tag, dev_gather=True):
        loader = SampledNodeLoader(sampler, raw["x"], raw["y"], seeds,
                                   batch_size=1024, shuffle=True,
                                   rng_seed=1, kernel_plans=kernel_plans,
                                   prefetch=prefetch,
                                   gather_on_device=dev_gather)
        item0 = next(iter(loader))
        g0, y0, m0 = item0[:3]
        g0j = jax.tree.map(jnp.asarray, g0)
        if dev_gather:
            g0j = g0j.replace(nodes=jnp.take(x_full, jnp.asarray(item0[3]),
                                             axis=0))
        variables = jax.jit(net.init, static_argnames=("train",))(
            jax.random.key(0), g0j, train=False)
        state = TrainState.create(params=variables["params"],
                                  batch_stats=variables["batch_stats"],
                                  tx=make_optimizer(1e-2, 0.0))

        @jax.jit
        def step(state, g, gids, y, m, rng):
            if gids is not None:
                g = g.replace(nodes=jnp.take(x_full, gids, axis=0))
            def loss_fn(params, bs):
                out, mut = net.apply(
                    {"params": params, "batch_stats": bs}, g, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                y1h = jax.nn.one_hot(y, 40)
                nll = -jnp.sum(out * y1h, axis=1)
                mm = m.astype(out.dtype)
                return jnp.sum(nll * mm) / jnp.maximum(jnp.sum(mm), 1.0), \
                    mut["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats)
            return state.apply_gradients(grads, new_batch_stats=bs), loss

        # warm the jit (g0j already has gathered nodes -> pass gids=None
        # would retrace; warm with the real signature instead)
        t0 = time.time()
        nb = 0
        for item in loader:
            g, y, m = item[:3]
            gids = jnp.asarray(item[3]) if dev_gather else None
            if dev_gather:
                g = g.replace(nodes=np.zeros((g.nodes.shape[0], 0),
                                             np.float32))
            g = jax.tree.map(jnp.asarray, g)
            state, loss = step(state, g, gids, jnp.asarray(y),
                               jnp.asarray(m), jax.random.key(nb))
            if nb == 0:
                jax.block_until_ready(state)
                t0 = time.time()   # exclude compile
            nb += 1
        jax.block_until_ready(state)
        dt = time.time() - t0
        timed = max(nb - 1, 1)    # batch 0 excluded (compile)
        print(f"{tag}: epoch {dt:.2f}s ({dt/timed*1e3:.1f} ms/batch, "
              f"{timed} timed batches) loss={float(loss):.3f}", flush=True)

    def run_device_epoch(tag, device_plans=False):
        """Fully on-device sampling (device_sampling; VERDICT r4 item 6):
        sampling is FUSED INTO the train step — one jitted call per batch
        (separate sample/gather/step calls each pay the remote tunnel's
        per-dispatch latency; measured 94 ms/batch as 3 calls vs the host
        path's 63). The host contributes only the shuffled seed stream."""
        from egc_tpu.data import device_sampling as ds

        dsamp = ds.DeviceNeighborSampler(raw["senders"], raw["receivers"],
                                         n, fanouts=(15, 10))
        # device plans need geometry-aligned node budgets
        node_mult = 4096 if device_plans else 8
        sample_raw = dsamp.raw(1024, node_mult)
        y_full = jnp.asarray(raw["y"])

        # big arrays (CSR, features, labels) as jit ARGUMENTS — closure
        # constants ship in the remote-compile request (HTTP 413)
        @jax.jit
        def step(state, seeds_b, key, rowptr, in_senders, x_full, y_full):
            gids, s, r, em, nm, _ = sample_raw(key, seeds_b, rowptr,
                                               in_senders)
            gidc = jnp.minimum(gids, n - 1)
            # pad-row features zeroed (masked rows must not leak the
            # clamped gather); where() fuses into the gather
            nodes = jnp.where(nm[:, None], jnp.take(x_full, gidc, axis=0),
                              0.0)
            g = ds.as_graph(gids, s, r, em, nm).replace(nodes=nodes)
            if device_plans:
                # per-batch kernel plan built ON DEVICE inside the step:
                # the fused sweeps replace the XLA scatter path (narrow
                # layout skipped — 3-primitive sets ride plan.bwd).
                # Plan pad row sits one aligned block BEYOND the model
                # rows (build_kernel_plan_jax contract) so every layer's
                # pad aggregation sees zero-padded values.
                from egc_tpu.ops.dispatch import build_kernel_plan_jax
                npp = nm.shape[0] + 4096
                s_p = jnp.where(em, s, npp - 1)
                r_p = jnp.where(em, r, npp - 1)
                g = g.replace(senders=s_p, receivers=r_p,
                              kernel_plan=build_kernel_plan_jax(
                                  s_p, r_p, npp,
                                  bwd_narrow_window_rows=None))
            y = jnp.take(y_full, gidc)
            m = (jnp.arange(nm.shape[0]) < 1024) & nm

            def loss_fn(params, bs):
                out, mut = net.apply(
                    {"params": params, "batch_stats": bs}, g, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                nll = -jnp.sum(out * jax.nn.one_hot(y, 40), axis=1)
                mm = m.astype(out.dtype)
                return jnp.sum(nll * mm) / jnp.maximum(jnp.sum(mm), 1.0), \
                    mut["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats)
            return state.apply_gradients(grads, new_batch_stats=bs), loss

        # init off one sampled batch
        g0, gid0 = dsamp.sample_graph(jax.random.key(9),
                                      jnp.asarray(seeds[:1024]))
        g0x = g0.replace(nodes=jnp.take(x_full, jnp.minimum(gid0, n - 1),
                                        axis=0))
        variables = jax.jit(net.init, static_argnames=("train",))(
            jax.random.key(0), g0x, train=False)
        state = TrainState.create(params=variables["params"],
                                  batch_stats=variables["batch_stats"],
                                  tx=make_optimizer(1e-2, 0.0))

        rowptr, in_senders = dsamp.csr
        order = np.random.default_rng(1).permutation(seeds)
        import sys as _sys
        if "profile" in _sys.argv:
            # device self-time separates real compute from the remote
            # tunnel's per-dispatch latency (absent on a real host)
            s1, _ = step(state, jnp.asarray(order[:1024]),
                         jax.random.key(99), rowptr, in_senders,
                         x_full, y_full)
            jax.block_until_ready(s1)
            from egc_tpu.utils.profiling import print_op_table
            with jax.profiler.trace("/tmp/samptrace"):
                s1, _ = step(s1, jnp.asarray(order[:1024]),
                             jax.random.key(98), rowptr, in_senders,
                             x_full, y_full)
                jax.block_until_ready(s1)
            print_op_table("/tmp/samptrace", top=15)
        t0 = time.time()
        nb = 0
        for i in range(0, len(order) - 1023, 1024):
            state, loss = step(state, jnp.asarray(order[i:i + 1024]),
                               jax.random.key(nb), rowptr, in_senders,
                               x_full, y_full)
            if nb == 0:
                jax.block_until_ready(state)
                t0 = time.time()   # exclude sample+step compile
            nb += 1
        jax.block_until_ready(state)
        dt = time.time() - t0
        timed = max(nb - 1, 1)
        print(f"{tag}: epoch {dt:.2f}s ({dt/timed*1e3:.1f} ms/batch, "
              f"{timed} timed batches) loss={float(loss):.3f}", flush=True)

    import sys
    if "quick" in sys.argv:
        run_epoch(False, 0, "XLA devgather sync   ")
        run_epoch(False, 4, "XLA devgather pre4   ")
        run_device_epoch("device sampler       ")
        run_device_epoch("device sampler+plans ", device_plans=True)

        # isolate the in-jit plan-build cost (the viability question)
        from egc_tpu.ops.dispatch import build_kernel_plan_jax
        from egc_tpu.data import device_sampling as ds
        dsamp2 = ds.DeviceNeighborSampler(raw["senders"],
                                          raw["receivers"], n,
                                          fanouts=(15, 10))
        g0, _ = dsamp2.sample_graph(jax.random.key(0),
                                    jnp.asarray(seeds[:1024]))
        nb_pad = ((g0.node_mask.shape[0] + 4095) // 4096) * 4096
        pb = jax.jit(lambda s, r: build_kernel_plan_jax(
            s, r, nb_pad, bwd_narrow_window_rows=None))
        sa = jnp.minimum(g0.senders, nb_pad - 1)
        ra = jnp.minimum(g0.receivers, nb_pad - 1)
        out = pb(sa, ra)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(10):
            out = pb(sa, ra)
        jax.block_until_ready(out)
        print(f"plan-build (jit, 2 layouts): "
              f"{(time.time()-t0)/10*1e3:.1f} ms", flush=True)
    else:
        run_epoch(False, 0, "XLA host-gather sync ", dev_gather=False)
        run_epoch(False, 0, "XLA devgather sync   ")
        run_epoch(False, 4, "XLA devgather pre4   ")
        run_epoch(True, 0, "plans devgather sync ")
        run_epoch(True, 4, "plans devgather pre4 ")
        run_device_epoch("device sampler       ")


if __name__ == "__main__":
    main()
