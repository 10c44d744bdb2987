"""Microbenchmark: fused score-kernel variants vs the XLA forward on real
hardware. Times ms/step at the production batch (N*S rows) across tile sizes
and GroupNorm matmul dtypes; run serialized with everything else on the
single-tenant TPU.

    python tools/bench_kernel.py [--rows 44300] [--iters 200]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from zedo_tpu.utils.config import cli_int_arg, enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from zedo_tpu.models import score_mlp
    from zedo_tpu.ops.pallas import score_kernel as sk

    rows = cli_int_arg(sys.argv, "--rows", 44300)
    iters = cli_int_arg(sys.argv, "--iters", 200)
    cfg = score_mlp.ScoreMLPConfig()
    params32 = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)
    io = cfg.n_joints * cfg.joint_dim
    io_pad = ((io + sk.LANE - 1) // sk.LANE) * sk.LANE
    temb = score_mlp.time_embedding(params, cfg, jnp.full((1,), 42.0))[0]

    def time_fn(fn, x):
        out = jax.jit(fn)(x)
        float(jnp.sum(out))  # compile + materialize (block_until_ready is
        # unreliable on axon)
        t0 = time.time()
        out = jax.jit(fn)(x)
        s = float(jnp.sum(out))
        dt = (time.time() - t0) / iters * 1000.0
        assert np.isfinite(s)
        return dt

    results = {}
    for tile in (256, 512, 1024):
        b_pad = ((rows + tile - 1) // tile) * tile
        x = jax.random.normal(jax.random.PRNGKey(1), (b_pad, io_pad), jnp.float32)
        for gn_name, gn_dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            packed = sk.pack_weights(params, cfg, gn_dtype=gn_dt)
            vecs = sk.step_vectors(packed, temb)

            def loop(x0, packed=packed, vecs=vecs, tile=tile):
                def body(h, _):
                    out = sk.fused_score_forward(h, packed, vecs, tile=tile)
                    return out * 0.999, None  # dependency chain

                return jax.lax.scan(body, x0, None, length=iters)[0]

            key = f"pallas tile={tile} gn={gn_name}"
            results[key] = time_fn(loop, x)
            print(f"{key}: {results[key]:.3f} ms/step", flush=True)

    if "--split" in sys.argv:
        # experiment: two independent half-tile chains inside one kernel body
        # so Mosaic can overlap one half's GN/SiLU (VPU) with the other
        # half's dense (MXU)
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _kernel_split(x_ref, wpre_ref, wb1_ref, wb2_ref, wb3_ref,
                          wb4_ref, wpost_ref, vecs_ref, gnbias_ref,
                          biaspost_ref, ind_ref, bcastsc_ref, out_ref):
            compute_dt = wpre_ref.dtype
            ind = ind_ref[:]
            half = x_ref.shape[0] // 2

            def dense(h, w_ref, vec_row):
                acc = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
                return acc + vecs_ref[vec_row, :][None, :]

            def gn(h, li):
                return sk._gn_silu(h, ind, bcastsc_ref[li],
                                   gnbias_ref[li, :][None])

            xs = [x_ref[:half].astype(compute_dt),
                  x_ref[half:].astype(compute_dt)]
            hs = [dense(x, wpre_ref, 0) for x in xs]
            hs = [gn(h, 0) for h in hs]
            for blk, (wa, wb) in enumerate(((wb1_ref, wb2_ref),
                                            (wb3_ref, wb4_ref))):
                h1s = [dense(h.astype(compute_dt), wa, 1 + 2 * blk) for h in hs]
                h1s = [gn(h1, 1 + 2 * blk) for h1 in h1s]
                h2s = [dense(h1.astype(compute_dt), wb, 2 + 2 * blk) for h1 in h1s]
                h2s = [gn(h2, 2 + 2 * blk) for h2 in h2s]
                hs = [h + h2 for h, h2 in zip(hs, h2s)]
            outs = [jnp.dot(h.astype(compute_dt), wpost_ref[:],
                            preferred_element_type=jnp.float32) for h in hs]
            out_ref[:half] = (outs[0] + biaspost_ref[:][None, :]).astype(out_ref.dtype)
            out_ref[half:] = (outs[1] + biaspost_ref[:][None, :]).astype(out_ref.dtype)

        @functools.partial(jax.jit, static_argnames=("tile",))
        def fwd_split(x_pad, packed, vecs, tile=512):
            b_pad, iop = x_pad.shape
            h = packed.w_pre.shape[1]
            full = lambda shape: pl.BlockSpec(
                shape, lambda i: tuple(0 for _ in shape),
                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                _kernel_split,
                grid=(b_pad // tile,),
                in_specs=[
                    pl.BlockSpec((tile, iop), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    full((iop, h)),
                    full((h, h)), full((h, h)), full((h, h)), full((h, h)),
                    full((h, iop)),
                    full((5, h)), full((5, h)),
                    full((iop,)),
                    full((h, sk.LANE)), full((5, sk.LANE, h)),
                ],
                out_specs=pl.BlockSpec((tile, iop), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b_pad, iop), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(x_pad, packed.w_pre, *packed.w_b, packed.w_post, vecs,
              packed.gn_bias, packed.bias_post, packed.ind,
              packed.bcast_scaled)

        for tile in (256, 512):
            b_pad = ((rows + tile - 1) // tile) * tile
            x = jax.random.normal(jax.random.PRNGKey(1), (b_pad, io_pad),
                                  jnp.float32)
            packed = sk.pack_weights(params, cfg)
            vecs = sk.step_vectors(packed, temb)

            def loop(x0, tile=tile, packed=packed, vecs=vecs):
                def body(h, _):
                    return fwd_split(h, packed, vecs, tile=tile) * 0.999, None

                return jax.lax.scan(body, x0, None, length=iters)[0]

            dt = time_fn(loop, x)
            print(f"split tile={tile}: {dt:.3f} ms/step", flush=True)
        # correctness vs the shipped kernel
        packed = sk.pack_weights(params, cfg)
        vecs = sk.step_vectors(packed, temb)
        x = jax.random.normal(jax.random.PRNGKey(3), (1024, io_pad), jnp.float32)
        a = np.asarray(fwd_split(x, packed, vecs, tile=256))
        b = np.asarray(sk.fused_score_forward(x, packed, vecs, tile=512))
        print("split max |diff| vs shipped:", np.abs(a - b).max())
        return

    if "--probe" in sys.argv:
        # decomposition probes: where does the time go inside the kernel?
        tile = 512
        b_pad = ((rows + tile - 1) // tile) * tile
        x = jax.random.normal(jax.random.PRNGKey(1), (b_pad, io_pad), jnp.float32)
        packed = sk.pack_weights(params, cfg)
        vecs = sk.step_vectors(packed, temb)
        orig = sk._gn_silu

        def no_silu(c, ind, bc, bias, eps=1e-5):
            sq = c * c
            var_g = jnp.dot(sq.astype(ind.dtype), ind,
                            preferred_element_type=jnp.float32)
            rstd = jax.lax.rsqrt(var_g + eps)
            rs = jnp.dot(rstd.astype(bc.dtype), bc,
                         preferred_element_type=jnp.float32)
            return c * rs + bias

        def no_gn(c, ind, bc, bias, eps=1e-5):
            xn = c + bias
            return xn * jax.nn.sigmoid(xn)

        def nothing(c, ind, bc, bias, eps=1e-5):
            return c

        def tanh_silu(c, ind, bc, bias, eps=1e-5):
            sq = c * c
            var_g = jnp.dot(sq.astype(ind.dtype), ind,
                            preferred_element_type=jnp.float32)
            rstd = jax.lax.rsqrt(var_g + eps)
            rs = jnp.dot(rstd.astype(bc.dtype), bc,
                         preferred_element_type=jnp.float32)
            xn = c * rs + bias
            return xn * (0.5 * jnp.tanh(0.5 * xn) + 0.5)

        def bf16_silu(c, ind, bc, bias, eps=1e-5):
            sq = c * c
            var_g = jnp.dot(sq.astype(ind.dtype), ind,
                            preferred_element_type=jnp.float32)
            rstd = jax.lax.rsqrt(var_g + eps)
            rs = jnp.dot(rstd.astype(bc.dtype), bc,
                         preferred_element_type=jnp.float32)
            xn = (c * rs + bias).astype(jnp.bfloat16)
            sig = 1.0 / (1.0 + jnp.exp(-xn))
            return (xn * sig).astype(jnp.float32)

        def gn_vpu(c, ind, bc, bias, eps=1e-5):
            # both GN stages on the VPU: variance via reshape + lane-group
            # sum, broadcast via reshape (no MXU). Channel scale approximated
            # by one extra multiply (the real impl would carry a [H] scale
            # vector). Timing probe for replacing the two GN matmuls.
            # MEASURED round 5: Mosaic rejects the [T,H]->[T,G,size] reshape
            # ("infer-vector-layout: unsupported shape cast"), and the VPU
            # arithmetic would lose anyway — the 10 GN matmuls are 117
            # GFLOP/step running AT full MXU rate (0.59 ms analytic = the
            # measured full-vs-no_gn delta), while ~12 VPU passes over
            # [44544,1024] f32 cost ~0.7 ms at the ~3.8 TFLOP/s VPU. The
            # MXU-GN design is optimal; kept as the recorded negative.
            t, h = c.shape
            g, size = 32, h // 32
            sq = (c * c).reshape(t, g, size)
            var_g = jnp.sum(sq, axis=-1) * (1.0 / size)  # [T, g]
            rstd = jax.lax.rsqrt(var_g + eps)
            rs = jnp.broadcast_to(rstd[:, :, None], (t, g, size)).reshape(t, h)
            xn = c * rs * 1.01 + bias
            return xn * (0.5 * jnp.tanh(0.5 * xn) + 0.5)

        def gn_bcast_vpu(c, ind, bc, bias, eps=1e-5):
            # stats on the MXU (as shipped), broadcast via VPU reshape
            t, h = c.shape
            g, size = 32, h // 32
            sq = c * c
            var_g = jnp.dot(sq.astype(ind.dtype), ind,
                            preferred_element_type=jnp.float32)  # [T, 128]
            rstd = jax.lax.rsqrt(var_g[:, :g] + eps)
            rs = jnp.broadcast_to(rstd[:, :, None], (t, g, size)).reshape(t, h)
            xn = c * rs * 1.01 + bias
            return xn * (0.5 * jnp.tanh(0.5 * xn) + 0.5)

        for name, fn in (("full", orig), ("no_silu", no_silu),
                         ("no_gn", no_gn), ("dense_only", nothing),
                         ("tanh_silu", tanh_silu), ("bf16_silu", bf16_silu),
                         ("gn_vpu", gn_vpu), ("gn_bcast_vpu", gn_bcast_vpu)):
            sk._gn_silu = fn

            def loop(x0):
                def body(h, _):
                    out = sk.fused_score_forward.__wrapped__(
                        h, packed, vecs, tile=tile)
                    return out * 0.999, None

                return jax.lax.scan(body, x0, None, length=iters)[0]

            try:
                dt = time_fn(loop, x)
                print(f"probe {name}: {dt:.3f} ms/step", flush=True)
            except Exception as e:  # a variant Mosaic can't lower is a
                # recorded result, not a harness crash
                msg = str(e).splitlines()[0][:100]
                print(f"probe {name}: FAILED TO COMPILE ({msg})", flush=True)
        sk._gn_silu = orig
        return

    # XLA forward baseline at the same batch
    x3 = jax.random.normal(jax.random.PRNGKey(2), (rows, cfg.n_joints, 3), jnp.float32)

    def xla_loop(x0):
        def body(h, _):
            out = score_mlp.apply_with_temb(
                params, cfg, h.astype(jnp.bfloat16), temb
            )
            return out.astype(jnp.float32) * 0.999, None

        return jax.lax.scan(body, x0, None, length=iters)[0]

    results["xla bf16"] = time_fn(xla_loop, x3)
    print(f"xla bf16: {results['xla bf16']:.3f} ms/step", flush=True)

    best = min(results, key=results.get)
    print(f"\nBEST: {best} at {results[best]:.3f} ms/step "
          f"({rows} rows, {jax.devices()[0].device_kind})")


if __name__ == "__main__":
    main()
