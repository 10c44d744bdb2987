"""Fused score kernel vs the reference XLA forward (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from zedo_tpu.models import score_mlp
from zedo_tpu.ops.pallas import score_kernel as sk


def _setup(dtype=jnp.float32):
    cfg = score_mlp.ScoreMLPConfig()  # full-size: 17j, 1024h, 512e, 2 blocks
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    packed = sk.pack_weights(params, cfg, dtype=dtype)
    return cfg, params, packed


def test_fused_forward_matches_xla_f32(rng):
    cfg, params, packed = _setup(jnp.float32)
    b = 256
    x = jnp.asarray(rng.randn(b, 17, 3).astype(np.float32))
    t_labels = jnp.full((b,), 47.3, jnp.float32)

    want = np.asarray(score_mlp.apply(params, cfg, x, t_labels))

    temb = score_mlp.time_embedding(params, cfg, t_labels[:1])[0]
    vecs = sk.step_vectors(packed, temb)
    x_pad = sk.pad_rows(
        jnp.pad(x.reshape(b, -1), ((0, 0), (0, 128 - 51))), tile=128
    )
    got = sk.fused_score_forward(x_pad, packed, vecs, tile=128, interpret=True)
    got = np.asarray(got[:b, :51]).reshape(b, 17, 3)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_fused_forward_bf16_close(rng):
    cfg, params, packed = _setup(jnp.bfloat16)
    b = 128
    x = jnp.asarray(rng.randn(b, 17, 3).astype(np.float32))
    t_labels = jnp.full((b,), 12.0, jnp.float32)
    want = np.asarray(score_mlp.apply(params, cfg, x, t_labels))

    temb = score_mlp.time_embedding(params, cfg, t_labels[:1])[0]
    vecs = sk.step_vectors(packed, temb)
    x_pad = jnp.pad(x.reshape(b, -1), ((0, 0), (0, 128 - 51)))
    got = sk.fused_score_forward(x_pad, packed, vecs, tile=128, interpret=True)
    got = np.asarray(got[:b, :51]).reshape(b, 17, 3)
    # bf16 weights: expect ~1% relative agreement on O(1-10) outputs
    err = np.abs(got - want) / (np.abs(want) + 1e-2)
    assert np.median(err) < 0.02, np.median(err)


def test_pad_rows():
    x = jnp.ones((100, 7))
    assert sk.pad_rows(x, 64).shape == (128, 7)
    assert sk.pad_rows(jnp.ones((128, 7)), 64).shape == (128, 7)


def test_fused_forward_bf16_gn_fp32_tighter(rng):
    """gn_dtype=f32 (OILConfig.gn_fp32 / --override ZeDO.gn_fp32=True): bf16
    matmuls with exact-GN statistics must land strictly between full-bf16 and
    the f32 XLA oracle."""
    cfg = score_mlp.ScoreMLPConfig()
    params = score_mlp.init_params(jax.random.PRNGKey(0), cfg)
    b = 128
    x = jnp.asarray(rng.randn(b, 17, 3).astype(np.float32))
    t_labels = jnp.full((b,), 12.0, jnp.float32)
    want = np.asarray(score_mlp.apply(params, cfg, x, t_labels))

    def run(packed):
        temb = score_mlp.time_embedding(params, cfg, t_labels[:1])[0]
        vecs = sk.step_vectors(packed, temb)
        x_pad = jnp.pad(x.reshape(b, -1), ((0, 0), (0, 128 - 51)))
        out = sk.fused_score_forward(x_pad, packed, vecs, tile=128,
                                     interpret=True)
        return np.asarray(out[:b, :51]).reshape(b, 17, 3)

    got_bf16 = run(sk.pack_weights(params, cfg, dtype=jnp.bfloat16))
    got_gn32 = run(sk.pack_weights(params, cfg, dtype=jnp.bfloat16,
                                   gn_dtype=jnp.float32))
    err_bf16 = np.abs(got_bf16 - want).mean()
    err_gn32 = np.abs(got_gn32 - want).mean()
    assert err_gn32 <= err_bf16 * 1.05  # exact-GN never hurts
    assert np.isfinite(got_gn32).all()
    # and the gn tensors really are f32 in the packed weights
    packed32 = sk.pack_weights(params, cfg, dtype=jnp.bfloat16,
                               gn_dtype=jnp.float32)
    assert packed32.ind.dtype == jnp.float32
    assert packed32.bcast_scaled.dtype == jnp.float32
